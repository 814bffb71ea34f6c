package graft.pipeline

import graft.SparkTestBase
import graft.core.{PageDoc, PromptMode}
import graft.gen.InputTable
import graft.ops.LinkOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fused single-DOM-parse web pass must be indistinguishable from the
  * per-op composition — extraction ≡ ExtractPipeline.run, links/anchors ≡
  * LinkOps.extractLinks/extractAnchors, robots ≡ LinkOps.metaRobots —
  * on every dispatch branch (HTML, UTF-16 HTML, planted metas, PDF,
  * image, garbled, empty). */
class WebPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def doc(url: String, payload: Array[Byte], lang: String = "en") =
    PageDoc(url, null, payload, "", lang)

  private val htmlWithEverything = ("<html><head>" +
    "<meta name=\"RoBoTs\" content=\"NOINDEX,  nofollow\">" +
    "<title>t</title></head><body>" +
    "<p>A paragraph with enough words to classify as body text content here.</p>" +
    "<a href=\"/rel\">rel &amp; text</a>" +
    "<a href=\"https://other.example/x?q=1#frag\"><img src=\"i.png\"></a>" +
    "<a href=\"mailto:x@example.com\">dropped</a>" +
    "<a href=\"../up/./path\">dots</a>" +
    "</body></html>").getBytes("UTF-8")

  test("parseFused ≡ (parseDoc, outlinksOf, anchorsOf, metaRobots) per branch — exact sequences") {
    val utf16 = ("﻿<html><body><p>utf sixteen body paragraph with words</p>" +
      "<a href=\"/u16\">anchor</a></body></html>")
      .getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
    val cases = Seq(
      doc("https://h.example/a/b/c", htmlWithEverything),
      doc("https://h.example/u16", utf16),
      doc("https://h.example/empty", Array.emptyByteArray),
      doc("https://h.example/garbled", "{\"bbox\": junk".getBytes("UTF-8")),
      doc("https://h.example/null", null))
    for (d <- cases; mode <- Seq[PromptMode](PromptMode.LayoutAll, PromptMode.Ocr)) {
      val fused = WebPipeline.parseFused(d, mode)
      val sep = graft.kernel.ExtractKernel.parseDoc(d, mode)
      val asm = ExtractPipeline.assembleDoc(d.url, sep)
      assert(fused.md == asm.md && fused.md_nohf == asm.md_nohf &&
        fused.extracted_text == asm.extracted_text &&
        fused.cells_json == asm.cells_json && fused.error == asm.error &&
        fused.filtered == asm.filtered && fused.n_pages == asm.n_pages.toLong,
        s"extraction drift for ${d.url} / $mode")
      assert(fused.links == LinkOps.outlinksOf(d.url, d.html).toVector,
        s"links drift for ${d.url}")
      assert(fused.anchors.map(a => (a.dst, a.anchor)) ==
        LinkOps.anchorsOf(d.url, d.html).toVector, s"anchors drift for ${d.url}")
      assert(fused.robots == LinkOps.metaRobots(d.html).toVector,
        s"robots drift for ${d.url}")
    }
    // content sanity on the rich page: resolution, entity decode, robots split
    val f = WebPipeline.parseFused(doc("https://h.example/a/b/c", htmlWithEverything),
      PromptMode.LayoutAll)
    assert(f.links == Vector("https://h.example/rel",
      "https://other.example/x?q=1", "https://h.example/a/up/path"))
    assert(f.anchors.map(_.anchor) == Vector("rel & text", "", "dots"))
    assert(f.robots == Vector("noindex", "nofollow"))
  }

  test("WebPipeline.run ≡ runSeparate over a mixed synthetic corpus (Spark-level, all columns)") {
    val input = InputTable.generate(spark, 150L, seed = 7L).cache()
    val norm = (df: org.apache.spark.sql.DataFrame) => df.select(
      col("url"), col("n_pages").cast("long").as("n_pages"), col("md"),
      col("md_nohf"), col("extracted_text"), col("cells_json"),
      col("filtered"), col("error"),
      sort_array(col("links")).as("links"),
      sort_array(transform(col("anchors"),
        a => concat(a.getField("dst"), lit("\u0001"), a.getField("anchor")))).as("anchors"),
      col("robots"))
    val fused = norm(WebPipeline.run(input)).orderBy("url").collect()
    val sep = norm(WebPipeline.runSeparate(input)).orderBy("url").collect()
    assert(fused.length == 150 && fused.sameElements(sep),
      "fused and separate-pass outputs must be row-identical")
    input.unpersist()
  }

  test("WebPipeline.run is a map-only plan: zero exchanges, pruned scan") {
    val d = "/tmp/graft_webpipe_plan_input"
    InputTable.generate(spark, 40L, seed = 5L).write.mode("overwrite").parquet(d)
    val plan = WebPipeline.run(spark.read.parquet(d)).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"fused pass must not shuffle:\n$plan")
    val read = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!read.contains("warc_ts") && !read.contains("text"),
      s"warc_ts/text must be pruned from the scan: $read")
  }
}
