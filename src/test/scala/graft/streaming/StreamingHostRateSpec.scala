package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class StreamingHostRateSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val H = 3600L * 1000L // one hour in millis

  private def inputRows(rows: Seq[(String, Long, String)]) = {
    // (url, warc_ts millis, payload) → north-rule schema frame
    val s = spark
    import s.implicits._
    rows.toDF("url", "ts", "p")
      .select(col("url"),
        timestamp_millis(col("ts")).as("warc_ts"),
        encode(col("p"), "UTF-8").as("html"),
        lit("").as("text"), lit("en").as("lang"))
  }

  test("batch mode: epoch-aligned hour windows, per-host counts and bytes, nulls filtered") {
    val s = spark
    import s.implicits._
    val in = inputRows(Seq(
      ("https://a.example/1", 1 * H + 5000L, "xx"),     // hour 1
      ("https://a.example/2", 1 * H + 65000L, "yyy"),   // hour 1
      ("https://a.example/3", 2 * H + 1000L, "z"),      // hour 2
      ("https://b.example/1", 1 * H + 5000L, "wwww")))
      .unionByName(Seq(("https://c.example/1", "q")).toDF("url", "p")
        .select(col("url"), lit(null).cast("timestamp").as("warc_ts"),
          encode(col("p"), "UTF-8").as("html"),
          lit("").as("text"), lit("en").as("lang")))
    val r = StreamingHostRate.hostRate(in).orderBy("host", "window_start")
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq == Seq(
      ("a.example", 3600L, 2L, 5L),
      ("a.example", 7200L, 1L, 1L),
      ("b.example", 3600L, 1L, 4L)))
  }

  test("streaming: window emits once when watermark passes, late rows beyond the delay dropped") {
    val in = Files.createTempDirectory("srate-in").toString
    val out = Files.createTempDirectory("srate-out").toString
    val cp = Files.createTempDirectory("srate-cp").toString
    def read() = spark.read.parquet(out)
      .select("host", "window_start", "n_fetches", "n_bytes")
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
      .sortBy(x => (x._1, x._2))

    // drop 1: hostA at 01:30, hostB at 05:10 → watermark 03:10 after the
    // batch; the hour-1 window finalizes and emits, hour-5 stays open
    inputRows(Seq(
      ("https://a.example/1", 1 * H + 30 * 60000L, "xx"),
      ("https://b.example/1", 5 * H + 10 * 60000L, "yyy")))
      .write.mode("append").parquet(in)
    StreamingHostRate.start(spark, in, out, cp).awaitTermination()
    assert(read().toSeq == Seq(("a.example", 3600L, 1L, 2L)))

    // drop 2 (restart from checkpoint): a LATE hostA row at 01:45 — its
    // window already finalized, watermark (03:10) is past it → dropped
    // forever; hostC at 09:00 advances the watermark to 07:00 → the
    // hour-5 hostB window emits. The late row never appears anywhere.
    inputRows(Seq(
      ("https://a.example/2", 1 * H + 45 * 60000L, "zzzz"),
      ("https://c.example/1", 9 * H, "w")))
      .write.mode("append").parquet(in)
    StreamingHostRate.start(spark, in, out, cp).awaitTermination()
    assert(read().toSeq == Seq(
      ("a.example", 3600L, 1L, 2L),
      ("b.example", 18000L, 1L, 3L)))

    // drop 3: 12:00 → watermark 10:00 → the hour-9 hostC window emits
    inputRows(Seq(("https://d.example/1", 12 * H, "vv")))
      .write.mode("append").parquet(in)
    StreamingHostRate.start(spark, in, out, cp).awaitTermination()
    assert(read().toSeq == Seq(
      ("a.example", 3600L, 1L, 2L),
      ("b.example", 18000L, 1L, 3L),
      ("c.example", 32400L, 1L, 1L)))
  }
}
