package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

class MiscTextSpec extends AnyFunSuite {

  test("parse_json_flex: strict, span-extracted, and failure cases") {
    val strict = MiscText.parseJsonFlex("""  {"a": 1}  """)
    assert(strict.exists(r => !r.extracted && r.value == JObject("a" -> JInt(1))))
    val arr = MiscText.parseJsonFlex("""[1, 2]""")
    assert(arr.exists(r => !r.extracted))
    val embedded = MiscText.parseJsonFlex("""noise before {"k": "v"} noise after""")
    assert(embedded.exists(r => r.extracted && r.value == JObject("k" -> JString("v"))))
    assert(MiscText.parseJsonFlex("no json here at all").isEmpty)
    assert(MiscText.parseJsonFlex("broken { not json }").isEmpty)
  }

  test("remove_think_blocks: iterative excision, unmatched opener kept") {
    assert(MiscText.removeThinkBlocks("a<think>x</think>b") == "ab")
    assert(MiscText.removeThinkBlocks("<think>1</think>mid<think>2</think>") == "mid")
    assert(MiscText.removeThinkBlocks("a<think>unclosed") == "a<think>unclosed")
    assert(MiscText.removeThinkBlocks("nested<think>a<think>b</think>c</think>") == "nestedc</think>")
    assert(MiscText.removeThinkBlocks("plain") == "plain")
  }

  test("filter_json_blocks drops exactly Page-header/Page-footer") {
    val cells = Vector(
      JObject("category" -> JString("Text"), "text" -> JString("keep")),
      JObject("category" -> JString("Page-header"), "text" -> JString("drop")),
      JObject("category" -> JString("Page-footer")),
      JObject("text" -> JString("no category, kept")),
      JString("not a dict, kept"))
    val out = MiscText.filterHfCells(cells)
    assert(out.length == 3)
  }

  test("P16 fix_streamlit_formulas matches the reference's own outputs") {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/golden/fix_streamlit_formulas.json"), "UTF-8").mkString
    val JArray(cases) = PyJson.parse(src)
    assert(cases.length >= 10)
    cases.foreach { c =>
      val o = c.asInstanceOf[JObject]
      val in = o.get("in").get.asInstanceOf[JString].value
      val want = o.get("out").get.asInstanceOf[JString].value
      assert(MdRender.fixStreamlitFormulas(in) == want, s"input: $in")
    }
  }

  test("P18 extract_and_save_images: rewrite, sniff, duplicate-collapse, bad-b64 kept") {
    val png = graft.ops.MultimodalOps.Codec.encodePng(
      graft.ops.MultimodalOps.patternImage(8, 8, 3L))
    val b64 = java.util.Base64.getEncoder.encodeToString(png)
    val md = s"intro ![fig](data:image/png;base64,$b64) middle " +
      s"![no-type](data:image;base64,$b64) end"
    val (out, imgs) = MiscText.extractMdImages(md, pageNum = 7)
    assert(imgs.length == 2)
    assert(imgs(0).filename == "page_007_image_1.png")
    assert(imgs(1).filename == "page_007_image_2.png") // sniffed from magic
    assert(out == "intro ![fig](page_007_image_1.png) middle ![no-type](page_007_image_2.png) end")
    imgs.foreach(i => assert(graft.ops.MultimodalOps.Codec.decodeImage(i.bytes).getWidth == 8))

    // duplicate identical URIs: str.replace collapses both onto file 1,
    // but one file per match is still emitted (reference quirk mirrored)
    val dup = s"![a](data:image/png;base64,$b64) ![a](data:image/png;base64,$b64)"
    val (outDup, imgsDup) = MiscText.extractMdImages(dup, 1)
    assert(imgsDup.length == 2)
    assert(outDup == "![a](page_001_image_1.png) ![a](page_001_image_1.png)")

    // undecodable base64 keeps the original link
    val bad = "x ![b](data:image/png;base64,@@notb64@@) y"
    val (outBad, imgsBad) = MiscText.extractMdImages(bad, 1)
    assert(outBad == bad && imgsBad.isEmpty)
  }
}
