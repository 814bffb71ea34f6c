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

  final case class ExtractedImage(filename: String, bytes: Array[Byte])

  /** P18 `extract_and_save_images` (/root/reference/mac/
    * run_ocr_batch.py:152-177): rewrite base64 data-URI images embedded in
    * markdown into per-page files + relative links.
    *
    * Deviations from the reference, both deliberate:
    *   - the reference regex is double-escaped inside a raw string
    *     (run_ocr_batch.py:153: `r'!\\\\[...'`) and can never match its own
    *     `![](data:image...)` markdown — we implement the evident intent;
    *   - file writing is left to the caller (we return the rewritten md
    *     plus the decoded images) so the operator stays a pure function
    *     usable inside a distributed job; undecodable base64 keeps the
    *     original link instead of throwing (never-throw kernel contract).
    * Faithfully mirrored quirks: subtype sniffed from payload magic when
    * the URI omits it ('jpeg' fallback), and the literal string
    * replacement replaces ALL identical occurrences (Python str.replace),
    * so duplicate identical data URIs collapse onto the first filename
    * while still emitting one file per match. */
  private val MdImageRe =
    java.util.regex.Pattern.compile("!\\[(.*?)\\]\\(data:image(?:/(\\w+))?;base64,([^)]+)\\)")

  def extractMdImages(md: String, pageNum: Int): (String, Vector[ExtractedImage]) = {
    val m = MdImageRe.matcher(md)
    var out = md
    val images = Vector.newBuilder[ExtractedImage]
    var i = 0
    while (m.find()) {
      val whole = m.group(0)
      val alt = m.group(1)
      val declared = Option(m.group(2))
      try {
        val bytes = java.util.Base64.getDecoder.decode(m.group(3))
        val imgType = declared.getOrElse(sniffImageType(bytes))
        val filename = f"page_$pageNum%03d_image_${i + 1}.$imgType"
        images += ExtractedImage(filename, bytes)
        out = out.replace(whole, s"![$alt]($filename)")
      } catch { case _: IllegalArgumentException => () } // keep original link
      i += 1
    }
    (out, images.result())
  }

  /** Magic-byte subtype sniff (the reference asks PIL; 'jpeg' fallback
    * mirrors run_ocr_batch.py:166). */
  def sniffImageType(bytes: Array[Byte]): String =
    if (bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' &&
        bytes(2) == 'N' && bytes(3) == 'G') "png"
    else if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) "jpeg"
    else if (bytes.length >= 6 && bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F') "gif"
    else "jpeg"
}
