package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

/** WET (extracted-text `conversion` record) archive surface: round trips
  * incl. multibyte UTF-8 (Content-Length counts BYTES), record-type
  * isolation between parseAll and parseAllWet on a mixed file, the
  * torn-tail contract, and writer determinism. */
class WetSpec extends AnyFunSuite {

  private val rows = Seq(
    ("https://a.example/doc1", 1704067200000L, "First page text.\n\nSecond paragraph."),
    ("https://a.example/doc2", 1704067337000L, "múltibyte — 中文テキスト × ±5µm"),
    ("https://b.example/doc3", 1704067474000L, ""))

  test("plain round-trip: urls, timestamps (millis), exact text incl. multibyte; warcinfo skipped") {
    val file = Warc.buildWetFile(rows, gzip = false)
    val parsed = Warc.parseAllWet(file)
    assert(parsed.map(_.url) == rows.map(_._1))
    assert(parsed.map(_.warc_ts.getTime) == rows.map(_._2))
    assert(parsed.map(_.text) == rows.map(_._3))
  }

  test("gzip member-per-record round-trip") {
    val file = Warc.buildWetFile(rows, gzip = true)
    assert((file(0) & 0xff) == 0x1f && (file(1) & 0xff) == 0x8b)
    val parsed = Warc.parseAllWet(file)
    assert(parsed.map(_.url) == rows.map(_._1))
    assert(parsed.map(_.text) == rows.map(_._3))
  }

  test("writer is deterministic byte-for-byte") {
    assert(Warc.buildWetFile(rows, gzip = false).toSeq == Warc.buildWetFile(rows, gzip = false).toSeq)
    assert(Warc.buildWetFile(rows, gzip = true).toSeq == Warc.buildWetFile(rows, gzip = true).toSeq)
  }

  test("mixed file: parseAllWet yields only conversion records, parseAll only responses") {
    val mixed = Warc.warcinfo("mixed.warc") ++
      Warc.record("https://x.example/resp", 1000L, "<html>r</html>".getBytes(UTF_8)) ++
      Warc.conversionRecord("https://x.example/resp", 1000L, "r") ++
      Warc.record("https://x.example/resp2", 2000L, "<html>s</html>".getBytes(UTF_8))
    val wet = Warc.parseAllWet(mixed)
    assert(wet.map(w => (w.url, w.text)) == Seq(("https://x.example/resp", "r")))
    val responses = Warc.parseAll(mixed)
    assert(responses.map(_.url) ==
      Seq("https://x.example/resp", "https://x.example/resp2"))
    assert(new String(responses.head.html, UTF_8) == "<html>r</html>")
  }

  test("torn tails: parsed prefix kept, never throws; garbage/null empty") {
    val full = Warc.buildWetFile(rows, gzip = false)
    val cut = java.util.Arrays.copyOfRange(full, 0, full.length - 6)
    assert(Warc.parseAllWet(cut).map(_.url) == rows.map(_._1).dropRight(1))
    assert(Warc.parseAllWet("plain text, not warc".getBytes(UTF_8)).isEmpty)
    assert(Warc.parseAllWet(null).isEmpty)
  }

  test("unparsable WARC-Date yields the epoch-0 sentinel (shared parse path)") {
    val bad = ("WARC/1.0\r\nWARC-Type: conversion\r\n" +
      "WARC-Target-URI: https://x.example/bad\r\n" +
      "WARC-Date: never\r\n" +
      "Content-Type: text/plain\r\n" +
      "Content-Length: 2\r\n\r\nok\r\n\r\n").getBytes(UTF_8)
    val p = Warc.parseAllWet(bad)
    assert(p.map(w => (w.warc_ts.getTime, w.text)) == Seq((0L, "ok")))
  }

  test("spark write/read: table -> WET files -> table round-trips on both layouts; file assignment is xxhash64(url) mod nFiles") {
    val spark = graft.SparkTestBase.spark
    import spark.implicits._
    val pages = rows.toDF("url", "ms", "text")
      .select($"url", ($"ms" / 1000).cast("timestamp").as("warc_ts"), $"text")
    val files = Warc.writeWetTable(pages, nFiles = 2).cache()
    try {
      val fids = files.select("file_id").as[Long].collect().toSet
      val expectFids = pages.select(org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.xxhash64($"url"),
          org.apache.spark.sql.functions.lit(2L)))
        .as[Long].collect().toSet
      assert(fids == expectFids)
      for (dataCol <- Seq("data", "data_gz")) {
        val back = Warc.readWetTable(files, dataCol)
          .as[(String, java.sql.Timestamp, String)].collect().sortBy(_._1)
        assert(back.map(_._1).toSeq == rows.map(_._1))
        assert(back.map(_._2.getTime).toSeq == rows.map(_._2))
        assert(back.map(_._3).toSeq == rows.map(_._3))
      }
    } finally files.unpersist()
  }

  test("spark write: null url rows dropped, null text/ts coalesce — the writer never throws") {
    val spark = graft.SparkTestBase.spark
    import spark.implicits._
    val pages = Seq(
      (null.asInstanceOf[String], Some(1000L), Some("gone")),
      ("https://k.example/t", None, None)).toDF("url", "ms", "text")
      .select($"url", ($"ms" / 1000).cast("timestamp").as("warc_ts"), $"text")
    val back = Warc.readWetTable(Warc.writeWetTable(pages, nFiles = 1))
      .as[(String, java.sql.Timestamp, String)].collect()
    assert(back.map(r => (r._1, r._2.getTime, r._3)).toSeq ==
      Seq(("https://k.example/t", 0L, "")))
  }
}
