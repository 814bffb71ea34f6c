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
}
