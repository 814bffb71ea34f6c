package graft.kernel

import java.util.regex.Pattern

/** Small per-row text utilities from the reference's mac tooling. */
object MiscText {

  // parse_json_flex patterns (/root/reference/mac/run_ocr_batch.py:90-101):
  // strict parse when the stripped string is {...} or [...], else the first
  // greedy {...} span, else the greedy up-to-']' span.
  private val objSpan = Pattern.compile("\\{[\\s\\S]*\\}")
  private val arrSpan = Pattern.compile("[\\s\\S]*]")

  final case class FlexResult(value: JValue, extracted: Boolean)

  /** P17 `parse_json_flex`: strict parse, else first JSON-looking span.
    * Returns None where the reference raises (no span / span unparsable). */
  def parseJsonFlex(raw: String): Option[FlexResult] = {
    val s = PyStr.strip(raw)
    if ((s.startsWith("{") && s.endsWith("}")) || (s.startsWith("[") && s.endsWith("]")))
      return PyJson.parseOpt(s).map(FlexResult(_, extracted = false))
    val mo = objSpan.matcher(s)
    val span =
      if (mo.find()) Some(mo.group())
      else {
        val ma = arrSpan.matcher(s)
        if (ma.find()) Some(ma.group()) else None
      }
    span.flatMap(g => PyJson.parseOpt(g)).map(FlexResult(_, extracted = true))
  }

  /** P21 `remove_think_blocks_simple`
    * (/root/reference/mac/demo_gradio_m1.py:92-115): iterative string
    * excision of `<think>…</think>` spans, exact loop semantics (an
    * unmatched opener is left in place). */
  def removeThinkBlocks(text: String): String = {
    var result = text
    var done = false
    while (!done) {
      val start = result.indexOf("<think>")
      if (start == -1) done = true
      else {
        val end = result.indexOf("</think>", start)
        if (end == -1) done = true
        else result = result.substring(0, start) + result.substring(end + 8)
      }
    }
    result
  }

  /** `filter_json_blocks` (/root/reference/mac/run_ocr_batch.py:80-88):
    * drop header/footer cells from a parsed cell list (P19 as a standalone
    * kernel function; the pipeline applies the same rule relationally). */
  def filterHfCells(cells: Vector[JValue]): Vector[JValue] =
    cells.filter {
      case o: JObject =>
        o.get("category") match {
          case Some(JString(c)) => !MdRender.PageHf.contains(c)
          case _                => true
        }
      case _ => true
    }
}
