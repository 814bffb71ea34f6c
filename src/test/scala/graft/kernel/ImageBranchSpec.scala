package graft.kernel

import graft.core.{PageDoc, PromptMode}
import graft.ops.MultimodalOps
import org.scalatest.funsuite.AnyFunSuite

/** S1 image branch: PNG/JPEG payloads route through a first-class
  * single-page image path (reference: parser.py:252-256 dispatch
  * parser.py:294-312, extensions consts.py:5, fetch image_utils.py:84-140)
  * instead of falling into the garbled-repair chain. The deterministic
  * classifier stand-in for a pure raster is one full-bleed Picture cell
  * backed by the image itself (real crop embed). */
class ImageBranchSpec extends AnyFunSuite {

  private def doc(bytes: Array[Byte], url: String = "https://h.example/image/x") =
    PageDoc(url, java.sql.Timestamp.valueOf("2025-01-01 00:00:00"), bytes, "", "en")

  private def png(w: Int, h: Int, seed: Long = 7L): Array[Byte] =
    MultimodalOps.Codec.encodePng(MultimodalOps.patternImage(w, h, seed))

  private def jpeg(w: Int, h: Int, seed: Long = 7L): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(MultimodalOps.patternImage(w, h, seed), "jpg", bos)
    bos.toByteArray
  }

  test("PNG payload dispatches to the image branch: one Picture cell, real crop, no error") {
    val bytes = png(300, 400)
    assert(ExtractKernel.isImage(bytes))
    val pages = ExtractKernel.fanOut(doc(bytes))
    assert(pages.length == 1 && pages.head.payload_kind == "image")
    val parsed = ExtractKernel.parsePage(pages.head, PromptMode.LayoutAll)
    assert(parsed.error.isEmpty && !parsed.filtered)
    assert(parsed.origin_width == 300 && parsed.origin_height == 400)
    val (ih, iw) = Geometry.smartResize(400L, 300L)
    assert(parsed.input_width == iw.toInt && parsed.input_height == ih.toInt)
    assert(parsed.cells_json == """[{"bbox": [0, 0, 300, 400], "category": "Picture"}]""")
    assert(parsed.extracted_text == "", "Picture cells carry no text (prompts.py:11)")
    // md embeds a REAL crop of the image itself, pixel-identical
    val b64 = "data:image/png;base64,"
    val at = parsed.md.indexOf(b64)
    assert(at >= 0, s"expected a real data URI in md, got: ${parsed.md.take(80)}")
    val uri = parsed.md.substring(at + b64.length, parsed.md.indexOf(')', at))
    val crop = Raster.decode(java.util.Base64.getDecoder.decode(uri))
    val orig = Raster.decode(bytes)
    assert(crop.getWidth == 300 && crop.getHeight == 400)
    val same = (0 until 400).forall(y => (0 until 300).forall(x =>
      (crop.getRGB(x, y) & 0xffffff) == (orig.getRGB(x, y) & 0xffffff)))
    assert(same, "crop pixels must equal the source image")
  }

  test("JPEG payload dispatches to the image branch too") {
    val bytes = jpeg(280, 210)
    assert(ExtractKernel.isImage(bytes))
    val pages = ExtractKernel.fanOut(doc(bytes))
    assert(pages.head.payload_kind == "image")
    val parsed = ExtractKernel.parsePage(pages.head, PromptMode.LayoutAll)
    assert(parsed.error.isEmpty)
    assert(parsed.cells_json == """[{"bbox": [0, 0, 280, 210], "category": "Picture"}]""")
    // full-bleed fast path reuses the source container: jpeg in, jpeg embed
    assert(parsed.md.contains("data:image/jpeg;base64,"))
  }

  test("tiny image upscales through smart_resize's min_pixels branch") {
    val parsed = ExtractKernel.parsePage(
      ExtractKernel.fanOut(doc(png(30, 40))).head, PromptMode.LayoutAll)
    assert(parsed.error.isEmpty)
    val (ih, iw) = Geometry.smartResize(40L, 30L)
    assert(ih * iw >= 3136, "min_pixels lower bound")
    assert(parsed.input_width == iw.toInt && parsed.input_height == ih.toInt)
    // bboxes still come back in ORIGINAL pixel space
    assert(parsed.cells_json == """[{"bbox": [0, 0, 30, 40], "category": "Picture"}]""")
  }

  test("truncated/undecodable image magic → typed error row (never-throw)") {
    val junk = png(50, 50).take(12) // valid magic, truncated body
    assert(ExtractKernel.isImage(junk))
    val parsed = ExtractKernel.parsePage(
      ExtractKernel.fanOut(doc(junk)).head, PromptMode.LayoutAll)
    assert(parsed.error.startsWith("unsupported_format: image payload"))
    assert(parsed.md == "" && !parsed.filtered)
  }

  test("OCR / grounding / layout-only modes on an image: no text anywhere") {
    val page = ExtractKernel.fanOut(doc(png(120, 90))).head
    val ocr = ExtractKernel.parsePage(page, PromptMode.Ocr)
    assert(ocr.md == "" && ocr.error.isEmpty)
    val grounding = ExtractKernel.parsePage(page, PromptMode.GroundingOcr((0L, 0L, 120L, 90L)))
    assert(grounding.md == "" && grounding.error.isEmpty)
    val lo = ExtractKernel.parsePage(page, PromptMode.LayoutOnly)
    assert(lo.md == "" && lo.cells_json == """[{"bbox": [0, 0, 120, 90], "category": "Picture"}]""")
  }

  test("fitz-preprocess dpi renorm: input dims derive from the 200-dpi render, bboxes stay original") {
    // 300×400 px → fitz makes a 300×400 pt PDF → 200-dpi pixmap is
    // ceil(px · 200/72) (doc_utils.py:20-39 via parser.py:158-160)
    val layout = ExtractKernel.imageToLayout(png(300, 400), fitzPreprocess = true)
    assert(layout.width == 300 && layout.height == 400)
    assert(layout.renderDims.contains((math.ceil(300 * 200.0 / 72).toLong,
      math.ceil(400 * 200.0 / 72).toLong)))
    // >4500-px render on either side falls back to the original dims
    val big = ExtractKernel.imageToLayout(png(1700, 80), fitzPreprocess = true)
    assert(big.renderDims.contains((1700L, 80L)))
    // without the flag: no renorm
    assert(ExtractKernel.imageToLayout(png(300, 400)).renderDims.isEmpty)
  }

  test("garbled payloads under OCR/grounding modes pass the raw response through (parser.py:175,240-248)") {
    val raw = "not json at all é中"
    val d = doc(raw.getBytes(java.nio.charset.StandardCharsets.UTF_8), "https://h.example/garbled/x")
    val page = ExtractKernel.fanOut(d).head
    assert(page.payload_kind == "garbled")
    val ocr = ExtractKernel.parsePage(page, PromptMode.Ocr)
    assert(ocr.md == raw && ocr.md_nohf == raw && ocr.extracted_text == raw)
    assert(!ocr.filtered && ocr.error.isEmpty && ocr.cells_json == "")
    val g = ExtractKernel.parsePage(page, PromptMode.GroundingOcr((0L, 0L, 10L, 10L)))
    assert(g.md == raw && !g.filtered)
    // layout modes still take the repair chain
    val layoutMode = ExtractKernel.parsePage(page, PromptMode.LayoutAll)
    assert(layoutMode.filtered || layoutMode.cells_json.nonEmpty)
  }

  test("JPEG header scan tolerates 0xFF fill bytes before markers (T.81 B.1.1.2)") {
    val orig = jpeg(280, 210)
    // inject two legal fill bytes before the first post-SOI segment marker
    val padded = orig.take(2) ++ Array[Byte](0xff.toByte, 0xff.toByte) ++ orig.drop(2)
    assert(Raster.headerInfo(padded).map { case (w, h, _) => (w, h) }.contains((280, 210)),
      "fill bytes must be skipped, not parsed as a marker with a bogus length")
    // and the desync class the fix closes: without the skip, the scan read
    // the next marker's bytes as a segment length — dims came out wrong or
    // the scan ran off the segment chain
  }

  test("truncated image payloads yield a typed error row, not a Picture row embedding broken bytes") {
    for (bytes <- Seq(png(300, 400), jpeg(280, 210))) {
      val cut = bytes.take(bytes.length / 2) // valid magic + header, broken body
      assert(ExtractKernel.isImage(cut), "truncation preserves the magic")
      assert(!Raster.trailerOk(cut), "structural check must catch the truncation")
      val page = ExtractKernel.fanOut(doc(cut)).head
      val parsed = ExtractKernel.parsePage(page, PromptMode.LayoutAll)
      assert(parsed.error.nonEmpty && parsed.md.isEmpty,
        s"expected typed error row for truncated payload, got md=${parsed.md.take(60)}")
    }
    // intact payloads still pass the structural gate (fast path preserved)
    assert(Raster.trailerOk(png(30, 40)) && Raster.trailerOk(jpeg(30, 40)))
  }
}
