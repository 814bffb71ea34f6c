package graft.streaming

import graft.SparkTestBase
import graft.gen.InputTable
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class StreamingExtractSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("file-source stream: incremental batches, exactly-once across restarts") {
    val in = Files.createTempDirectory("stream-in").toString
    val out = Files.createTempDirectory("stream-out").toString
    val cp = Files.createTempDirectory("stream-cp").toString

    // drop 1
    InputTable.generate(spark, 30L, seed = 21L).write.mode("append").parquet(in)
    val q1 = StreamingExtract.start(spark, in, out, cp)
    q1.awaitTermination()
    val n1 = spark.read.parquet(out).count()
    assert(n1 == 30)

    // drop 2 arrives (new part files appended in place, disjoint docId
    // range so urls are distinct); restart consumes ONLY the new files
    InputTable.generateRange(spark, 30L, 50L, seed = 21L).write.mode("append").parquet(in)
    val q2 = StreamingExtract.start(spark, in, out, cp)
    q2.awaitTermination()
    val df = spark.read.parquet(out)
    assert(df.count() == 50)
    assert(df.select("url").distinct().count() == 50)

    // a third restart with nothing new processes nothing
    val q3 = StreamingExtract.start(spark, in, out, cp)
    q3.awaitTermination()
    assert(spark.read.parquet(out).count() == 50)
  }
}
