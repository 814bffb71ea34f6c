package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

/** CDX capture index: SURT subset, the (offset, length) random-access
  * slice contract on both archive layouts, gzip member boundaries, and
  * the never-throw/torn-tail discipline. */
class CdxSpec extends AnyFunSuite {

  private def doc(url: String, ms: Long, body: String) =
    (url, ms, body.getBytes(UTF_8))

  private val rows = Seq(
    doc("https://a.example/doc1", 1704067200000L, "<html><p>one</p></html>"),
    doc("https://b.example/doc2", 1704067337000L, "second body"),
    doc("https://b.example/doc3", 1704067474000L, ""))

  test("surt: documented canonicalization subset") {
    assert(Warc.surt("https://WWW.News.Example:443/a/b?q=1#top") == "example,news)/a/b?q=1")
    assert(Warc.surt("http://host0.example/garbled/doc1") == "example,host0)/garbled/doc1")
    assert(Warc.surt("http://A.B.C:80/") == "c,b,a)/")
    assert(Warc.surt("https://x.example") == "example,x)/")          // no path -> /
    assert(Warc.surt("https://x.example?q=2") == "example,x)/?q=2")  // query-only -> /?q
    assert(Warc.surt("https://x.example/p#frag") == "example,x)/p")  // fragment dropped
    assert(Warc.surt("http://single/p") == "single)/p")              // one-label host
    assert(Warc.surt("http://www.x.example/p") == "example,x)/p")    // www stripped
    assert(Warc.surt("http://x.example:8080/p") == "x.example:8080".split("\\.", -1)
      .reverse.mkString(",") + ")/p")                                // non-default port kept
  }

  test("ts14 + digest conventions: UTC yyyyMMddHHmmss; md5 of UPPERCASE hex") {
    val file = Warc.buildFile(Seq(doc("https://a.example/d", 1717560182000L, "xy")), gzip = false)
    val Seq(r) = Warc.cdxOf(file)
    assert(r.ts14 == "20240605040302")
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("7879".toUpperCase.getBytes(UTF_8)) // "xy" -> hex 7879 -> upper
    assert(r.digest == md.map(b => f"${b & 0xff}%02x").mkString)
    assert(Warc.payloadDigest(Array.emptyByteArray) ==
      "d41d8cd98f00b204e9800998ecf8427e") // md5("")
  }

  test("plain .warc: file order, warcinfo skipped, slice contract, strictly increasing offsets") {
    val file = Warc.buildFile(rows, gzip = false)
    val idx = Warc.cdxOf(file)
    assert(idx.map(_.url) == rows.map(_._1))
    assert(idx.head.offset > 0) // warcinfo precedes, indexed as no row
    assert(idx.map(_.offset) == idx.map(_.offset).sorted)
    assert(idx.sliding(2).forall { case Seq(a, b) => a.offset + a.length <= b.offset; case _ => true })
    idx.zip(rows).foreach { case (r, (u, ms, body)) =>
      val slice = java.util.Arrays.copyOfRange(file, r.offset.toInt, (r.offset + r.length).toInt)
      val parsed = Warc.parseAll(slice)
      assert(parsed.map(_.url) == Seq(u))
      assert(parsed.head.warc_ts.getTime == ms)
      assert(parsed.head.html.toSeq == body.toSeq)
    }
  }

  test(".warc.gz: offsets at member boundaries (gzip magic), slice re-inflates to the capture") {
    val file = Warc.buildFile(rows, gzip = true)
    val idx = Warc.cdxOf(file)
    assert(idx.map(_.url) == rows.map(_._1))
    idx.foreach { r =>
      assert((file(r.offset.toInt) & 0xff) == 0x1f && (file(r.offset.toInt + 1) & 0xff) == 0x8b)
      val slice = java.util.Arrays.copyOfRange(file, r.offset.toInt, (r.offset + r.length).toInt)
      assert(Warc.parseAll(slice).map(_.url) == Seq(r.url))
    }
    // members tile the file exactly: warcinfo member + one per record
    val members = Warc.gzipMemberScan(file)
    assert(members.size == rows.size + 1)
    assert(members.map { case (o, l, _) => o + l }.max == file.length.toLong)
    // both layouts agree on the indexed content
    val plain = Warc.cdxOf(Warc.buildFile(rows, gzip = false))
    assert(idx.map(r => (r.urlkey, r.ts14, r.url, r.digest)) ==
      plain.map(r => (r.urlkey, r.ts14, r.url, r.digest)))
  }

  test("torn tails never throw: truncated plain record and corrupt gzip member keep the prefix") {
    val plain = Warc.buildFile(rows, gzip = false)
    val cutP = Warc.cdxOf(java.util.Arrays.copyOf(plain, plain.length - 10))
    assert(cutP.map(_.url) == rows.init.map(_._1))
    val gz = Warc.buildFile(rows, gzip = true)
    val members = Warc.gzipMemberScan(gz)
    // corrupt the LAST member's deflate stream mid-way
    val corrupt = gz.clone()
    val lastOff = members.last._1.toInt
    corrupt(lastOff + 15) = (corrupt(lastOff + 15) ^ 0x55).toByte
    val cutG = Warc.cdxOf(corrupt)
    assert(cutG.map(_.url) == rows.init.map(_._1))
    assert(Warc.cdxOf(Array.emptyByteArray).isEmpty)
    assert(Warc.cdxOf(null).isEmpty)
  }

  test("cdxTable plan is map-only: no exchange anywhere") {
    val spark = graft.SparkTestBase.spark
    val files = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(0L,
        Warc.buildFile(Seq(("https://x.example/doc0", 0L, Array[Byte](1, 2))), gzip = true))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("file_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("data", org.apache.spark.sql.types.BinaryType))))
    val cdx = Warc.cdxTable(files)
    val plan = cdx.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), plan)
    val got = cdx.collect().map(r => (r.getString(1), r.getString(3))).toSeq
    assert(got == Seq(("example,x)/doc0", "https://x.example/doc0")))
  }
}
