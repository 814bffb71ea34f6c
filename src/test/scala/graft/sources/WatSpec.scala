package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

/** WAT (metadata sidecar) archive surface: envelope JSON escaping, the
  * one-parse title+links kernel pass, round trips on both layouts,
  * record-type isolation across all three readers, torn tails. */
class WatSpec extends AnyFunSuite {

  test("watJson: deterministic field order, full JSON escaping, empty links") {
    // title exercises quote, backslash, newline, tab and a raw 0x01
    // control char (built with toChar -- a unicode escape in source would
    // be processed by the Scala lexer even in triple quotes)
    val title = "Quote \" back\\slash\nnewline\ttab " + 1.toChar + "ctl"
    val j = Warc.watJson("https://x.example/a", 1704067200000L,
      title, Seq("https://y.example/b"))
    val expectedTitle =
      """"Title":"Quote \" back\\slash\nnewline\ttab """ + "\\" + """u0001ctl""""
    assert(j.contains(expectedTitle))
    assert(j.contains(""""Links":[{"url":"https://y.example/b"}]"""))
    assert(j == Warc.watJson("https://x.example/a", 1704067200000L,
      title, Seq("https://y.example/b")))
    val empty = Warc.watJson("u", 0L, "", Nil)
    assert(empty.contains(""""Links":[]"""))
  }

  test("round-trip both layouts; torn tail keeps prefix") {
    val rows = Seq(
      ("https://a.example/1", 1704067200000L, Warc.watJson("https://a.example/1", 1704067200000L, "T1", Seq("https://b/x"))),
      ("https://a.example/2", 1704067300000L, Warc.watJson("https://a.example/2", 1704067300000L, "Tïtle 中", Nil)))
    for (gzip <- Seq(false, true)) {
      val file = Warc.buildWatFile(rows, gzip)
      val parsed = Warc.parseAllWat(file)
      assert(parsed.map(_.url) == rows.map(_._1))
      assert(parsed.map(_.warc_ts.getTime) == rows.map(_._2))
      assert(parsed.map(_.json) == rows.map(_._3))
    }
    val cut = java.util.Arrays.copyOfRange(Warc.buildWatFile(rows, gzip = false),
      0, Warc.buildWatFile(rows, gzip = false).length - 6)
    assert(Warc.parseAllWat(cut).map(_.url) == Seq(rows.head._1))
  }

  test("record-type isolation: the three readers each see only their type in a mixed file") {
    val mixed = Warc.warcinfo("m.warc") ++
      Warc.record("https://x/r", 1000L, "<html>r</html>".getBytes(UTF_8)) ++
      Warc.conversionRecord("https://x/r", 1000L, "text") ++
      Warc.metadataRecord("https://x/r", 1000L, Warc.watJson("https://x/r", 1000L, "T", Nil))
    assert(Warc.parseAll(mixed).map(_.url) == Seq("https://x/r"))
    assert(Warc.parseAllWet(mixed).map(_.text) == Seq("text"))
    assert(Warc.parseAllWat(mixed).map(_.json) ==
      Seq(Warc.watJson("https://x/r", 1000L, "T", Nil)))
  }

  test("watOf: ONE parse harvests title + resolved links; non-HTML payloads yield the empty envelope") {
    import graft.ops.LinkOps
    val html = ("""<html><head><title> A &amp; B </title><base href="https://base.example/d/">""" +
      """</head><body><a href="x">go</a><a href="mailto:z">no</a></body></html>""").getBytes(UTF_8)
    val j = LinkOps.watOf("https://page.example/p", 5000L, html)
    assert(j.contains(""""Title":"A & B""""))
    assert(j.contains(""""Links":[{"url":"https://base.example/d/x"}]"""))
    val garbled = Array[Byte](0x7f, 0x03, 0x04, 0x05)
    val g = LinkOps.watOf("https://page.example/g", 5000L, garbled)
    assert(g.contains(""""Title":""""") && g.contains(""""Links":[]"""))
  }
}
