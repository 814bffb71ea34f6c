package graft.sources

import graft.SparkTestBase
import graft.gen.InputTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** The Spark surface of the WARC source: directory ingest via the
  * binaryFile reader and the map-only (no-shuffle) parse plan. */
class WarcSparkSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("readWarcDirectory: .warc.gz files on disk parse back to the generated table") {
    import spark.implicits._
    val docs = InputTable.generate(spark, 40L, seed = 9L)
      .select(col("url"), unix_millis(col("warc_ts")).as("ms"), col("html"))
      .as[(String, Long, Array[Byte])].collect().toVector.sortBy(_._1)
    val dir = Files.createTempDirectory("warc-src")
    docs.grouped(16).zipWithIndex.foreach { case (g, i) =>
      Files.write(dir.resolve(f"part-$i%05d.warc.gz"),
        Warc.buildFile(g, gzip = true, filename = s"part-$i.warc.gz"))
    }
    val parsed = Warc.readWarcDirectory(spark, dir.toString)
      .select(col("url"), unix_millis(col("warc_ts")).as("ms"), col("html"))
      .as[(String, Long, Array[Byte])].collect().toVector.sortBy(_._1)
    assert(parsed.map(_._1) == docs.map(_._1))
    assert(parsed.map(_._2) == docs.map(_._2))
    assert(parsed.map(_._3.toSeq) == docs.map(_._3.toSeq))
  }

  test("readWarcTable plan is map-only: no exchange anywhere") {
    val files = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(
        Warc.buildFile(Seq(("https://x.example/doc0", 0L, Array[Byte](1, 2))),
          gzip = false))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("data",
          org.apache.spark.sql.types.BinaryType))))
    val plan = Warc.readWarcTable(files).queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), plan)
  }
}
