package graft.kernel

import graft.core.{PageDoc, PromptMode}
import graft.ops.LinkOps
import graft.pipeline.WebPipeline
import graft.sources.Warc
import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

/** Transparent Content-Encoding: gzip-wrapped payloads must behave
  * byte-identically to their inflated twins across EVERY byte-level entry
  * point — kernel dispatch, web-graph harvest, fused pass. */
class GzipPayloadSpec extends AnyFunSuite {

  private def doc(bytes: Array[Byte]) =
    PageDoc("https://h.example/doc0", new java.sql.Timestamp(0L), bytes, "", "en")

  private val html = ("<html><head><title>T</title></head><body>" +
    "<h1>Head</h1><p>Body text.</p><a href=\"/x\">x</a></body></html>").getBytes(UTF_8)

  test("decodePayload: identity for plain bytes, inflate for gzip, nested up to the bound") {
    assert(ExtractKernel.decodePayload(html).toOption.get eq html)
    assert(ExtractKernel.decodePayload(null).toOption.get == null)
    val gz = Warc.gzipMember(html)
    assert(ExtractKernel.decodePayload(gz).toOption.get.toSeq == html.toSeq)
    val doubled = Warc.gzipMember(Warc.gzipMember(html))
    assert(ExtractKernel.decodePayload(doubled).toOption.get.toSeq == html.toSeq)
    val tooDeep = (1 to 5).foldLeft(html)((b, _) => Warc.gzipMember(b))
    assert(ExtractKernel.decodePayload(tooDeep).isLeft)
  }

  test("corrupt gzip is strict: Left from decode, typed error row from fanOut") {
    val gz = Warc.gzipMember(html)
    gz(gz.length - 3) = (gz(gz.length - 3) ^ 0x55).toByte // break the CRC
    assert(ExtractKernel.decodePayload(gz).isLeft)
    val pages = ExtractKernel.fanOut(doc(gz))
    assert(pages.length == 1 && pages.head.payload_kind == "error")
    assert(new String(pages.head.page_bytes, UTF_8).contains("gzip"))
  }

  test("kernel extraction of a gzipped doc is byte-identical to the plain doc (html + pdf + garbled)") {
    val payloads = Seq(
      html,
      graft.gen.InputGen.generate(5L, 3L).html,   // whatever kind doc 3 is
      graft.gen.InputGen.generate(5L, 13L).html,
      "just some garbled text output".getBytes(UTF_8))
    for (p <- payloads) {
      val plain = ExtractKernel.parseDoc(doc(p), PromptMode.LayoutAll)
      val gzd = ExtractKernel.parseDoc(doc(Warc.gzipMember(p)), PromptMode.LayoutAll)
      assert(gzd == plain)
    }
  }

  test("web-graph harvest sees through gzip: outlinks, anchors, robots, page meta") {
    val page = ("<html><head><title>G</title>" +
      "<meta name=\"robots\" content=\"noindex\"></head>" +
      "<body><a href=\"/a\">A</a><a href=\"https://o.example/b\">B</a></body></html>")
      .getBytes(UTF_8)
    val gz = Warc.gzipMember(page)
    val u = "https://h.example/p"
    assert(LinkOps.outlinksOf(u, gz) == LinkOps.outlinksOf(u, page))
    assert(LinkOps.outlinksOf(u, gz).nonEmpty)
    assert(LinkOps.anchorsOf(u, gz) == LinkOps.anchorsOf(u, page))
    assert(LinkOps.metaRobots(gz) == Seq("noindex"))
    assert(LinkOps.pageMetaOf(u, gz) == LinkOps.pageMetaOf(u, page))
    // corrupt gzip: no artifacts, like any non-HTML payload
    val bad = gz.clone(); bad(bad.length - 1) = 7
    assert(LinkOps.outlinksOf(u, bad).isEmpty && LinkOps.metaRobots(bad).isEmpty)
  }

  test("fused pass on a gzipped payload equals the fused pass on the plain payload") {
    val plain = WebPipeline.parseFused(doc(html), PromptMode.LayoutAll)
    val gzd = WebPipeline.parseFused(doc(Warc.gzipMember(html)), PromptMode.LayoutAll)
    assert(gzd == plain)
  }
}
