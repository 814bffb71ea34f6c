package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class StreamingDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def inputRows(rows: Seq[(String, Long, String, String)]) = {
    // (url, warc_ts millis, text, lang) → north-rule schema frame
    val s = spark
    import s.implicits._
    rows.toDF("url", "ts", "text", "lang")
      .select(col("url"),
        timestamp_millis(col("ts")).as("warc_ts"),
        lit(null).cast("binary").as("html"),
        col("text"), col("lang"))
  }

  test("exact dedup on arrival: within-batch and cross-batch duplicates dropped, state survives restart") {
    val in = Files.createTempDirectory("sdedup-in").toString
    val out = Files.createTempDirectory("sdedup-out").toString
    val cp = Files.createTempDirectory("sdedup-cp").toString

    // drop 1: b+c share text (within-batch dup); c is earlier → survivor
    inputRows(Seq(
      ("http://a", 2000L, "alpha text", "en"),
      ("http://b", 3000L, "shared body", "en"),
      ("http://c", 1000L, "shared body", "en")
    )).write.mode("append").parquet(in)
    StreamingDedup.start(spark, in, out, cp).awaitTermination()
    val r1 = spark.read.parquet(out).select("url").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().sorted
    assert(r1.toSeq == Seq("http://a", "http://c"))

    // drop 2: d repeats drop-1 content (cross-batch dup, dropped even after
    // restart — state came back from the checkpoint); e is new
    inputRows(Seq(
      ("http://d", 4000L, "shared body", "en"),
      ("http://e", 5000L, "epsilon text", "en")
    )).write.mode("append").parquet(in)
    StreamingDedup.start(spark, in, out, cp).awaitTermination()
    val r2 = spark.read.parquet(out).select("url").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().sorted
    assert(r2.toSeq == Seq("http://a", "http://c", "http://e"))

    // idle restart emits nothing
    StreamingDedup.start(spark, in, out, cp).awaitTermination()
    assert(spark.read.parquet(out).count() == 3)
  }

  test("near-identity mode: simhash-identical reorderings deduped, exact mode keeps them") {
    val rows = Seq(
      ("http://x", 1000L, "the quick brown fox jumps over the lazy dog", "en"),
      // same token multiset, different order → same simhash, different xxhash64
      ("http://y", 2000L, "lazy dog the quick brown fox jumps over the", "en"))

    val exact = StreamingDedup.dedupStream(inputRows(rows)).collect()
    assert(exact.map(_.url).sorted.toSeq == Seq("http://x", "http://y"))

    val in = Files.createTempDirectory("sdedup-near-in").toString
    val out = Files.createTempDirectory("sdedup-near-out").toString
    val cp = Files.createTempDirectory("sdedup-near-cp").toString
    inputRows(rows).write.mode("append").parquet(in)
    StreamingDedup.start(spark, in, out, cp, byNearIdentity = true).awaitTermination()
    val near = spark.read.parquet(out).select("url")
      .as[String](org.apache.spark.sql.Encoders.STRING).collect()
    assert(near.toSeq == Seq("http://x")) // earliest warc_ts survives
  }
}
