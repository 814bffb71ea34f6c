package graft.kernel

import graft.core._
import java.nio.charset.StandardCharsets

/** Per-page extraction kernel — the deterministic stand-in for the
  * reference's model call, wrapped in the reference's exact pre/post flow
  * (/root/reference/dots_ocr/parser.py:140-250):
  *
  *   payload → branch (HTML-DOM | PDF-layout | raw-response)
  *           → smart_resize input dims (parser.py:163)
  *           → "model response" = classifier cells serialized in INPUT space
  *           → post_process_output (strict parse + rescale | repair chain)
  *           → layoutjson2md ×2 (md, md_nohf; parser.py:223-224)
  *           → per-page result record
  *
  * Everything after the response string is byte-identical to the reference
  * (golden-tested); the classifier branch defines the response contents.
  * Designed to run inside `mapPartitions` — stateless, allocation-light.
  */
object ExtractKernel {

  /** Document fan-out: one input row → pages (reference analog:
    * `load_images_from_pdf` + per-page tasks, parser.py:258-271). */
  def fanOut(doc: PageDoc): Vector[RawPage] = fanOut(doc, 0, -1)

  /** Page-range variant (reference `load_images_from_pdf(start_page_id,
    * end_page_id)`, doc_utils.py:42-58): inclusive [start, end], end < 0 →
    * last page, end clamped to page count; page_no restarts at 0 relative
    * to the slice (parser.py:262-271 enumerates the sliced image list).
    * Pruning happens HERE, before any page is parsed — skipped pages cost
    * nothing (the kernel analog of partition pruning). */
  def fanOut(doc: PageDoc, startPageId: Int, endPageId: Int): Vector[RawPage] = {
    val bytes = decodePayload(doc.html) match {
      case Right(b) => b
      case Left(err) =>
        // transparent Content-Encoding, strict: a corrupt/truncated gzip
        // body (or a decompression bomb past the cap) must become a TYPED
        // error row, never a partial document — the byte-identity
        // discipline (a browser refuses a bad CRC the same way)
        return Vector(RawPage(doc.url, 0, 1, "error",
          err.getBytes(StandardCharsets.UTF_8), doc.lang))
    }
    if (bytes == null || bytes.isEmpty) {
      Vector(RawPage(doc.url, 0, 1, "error", "empty payload".getBytes(StandardCharsets.UTF_8), doc.lang))
    } else if (isRealPdf(bytes) || PdfLite.isPdfLite(bytes)) {
      pdfDocOf(bytes) match {
        case Left(err) =>
          Vector(RawPage(doc.url, 0, 1, "error", err.getBytes(StandardCharsets.UTF_8), doc.lang))
        case Right(pdf) =>
          val slice = slicePages(pdf, startPageId, endPageId)
          val total = slice.length
          if (total == 0)
            Vector(RawPage(doc.url, 0, 1, "error",
              s"empty page range [$startPageId, $endPageId]".getBytes(StandardCharsets.UTF_8), doc.lang))
          else slice.zipWithIndex.map { case (p, i) =>
            RawPage(doc.url, i, total, "pdf", PdfLite.serialize(PdfLite.PdfDoc(Vector(p))), doc.lang)
          }
      }
    } else if (isImage(bytes)) {
      // image payload → a single-page document whose page IS the raster
      // (reference: .jpg/.jpeg/.png route through parse_image,
      // parser.py:252-256 + :294-312, extensions consts.py:5; page ranges
      // apply to PDFs only — parse_image takes none — matching the HTML
      // branch here)
      Vector(RawPage(doc.url, 0, 1, "image", bytes, doc.lang))
    } else if (looksLikeHtml(bytes)) {
      Vector(RawPage(doc.url, 0, 1, "html", bytes, doc.lang))
    } else {
      // neither HTML nor PDF-lite nor image: treat the decoded payload as a
      // raw model response — drives the OutputCleaner repair path end-to-end
      Vector(RawPage(doc.url, 0, 1, "garbled", bytes, doc.lang))
    }
  }

  /** gzip magic (RFC 1952) — a crawl table can carry
    * Content-Encoding-compressed bodies verbatim. */
  def isGzip(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 2 &&
      (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b

  /** Inflation cap per payload (decompression-bomb guard): 256 MiB —
    * far above any real page body, far below executor memory. */
  val MaxInflatedPayload: Int = 1 << 28

  /** Nested-gzip dispatch bound (a gzip quine exists; real bodies are
    * at most double-wrapped by misconfigured proxies). */
  val MaxGzipDepth: Int = 4

  /** Transparent Content-Encoding: gzip payloads (sniffed, not
    * header-driven — the table stores no response headers) inflate
    * before S1 dispatch, so a compressed crawl table extracts
    * byte-identically to its inflated twin. Identity for everything
    * else. STRICT on the payload path: corrupt bytes, a bad CRC, or a
    * body past [[MaxInflatedPayload]] yield Left → the kernel's typed
    * error row (unlike the WARC file parser's parsed-prefix tolerance —
    * there a torn tail loses records; here it would silently truncate a
    * document). */
  def decodePayload(bytes: Array[Byte]): Either[String, Array[Byte]] = {
    var cur = bytes
    var depth = 0
    while (isGzip(cur)) {
      if (depth >= MaxGzipDepth)
        return Left(s"nested gzip deeper than $MaxGzipDepth")
      gunzipStrict(cur) match {
        case Right(r) => cur = r; depth += 1
        case left => return left
      }
    }
    Right(cur)
  }

  private def gunzipStrict(bytes: Array[Byte]): Either[String, Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(math.min(bytes.length * 4, 1 << 20))
    try {
      val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(bytes))
      val tmp = new Array[Byte](64 * 1024)
      var n = in.read(tmp)
      while (n >= 0) {
        out.write(tmp, 0, n)
        if (out.size() > MaxInflatedPayload)
          return Left(s"gzip payload exceeds $MaxInflatedPayload inflated bytes")
        n = in.read(tmp)
      }
      Right(out.toByteArray)
    } catch {
      case e: java.io.IOException => Left(s"undecodable gzip payload: ${e.getMessage}")
    }
  }

  /** Real-PDF magic (`%PDF-`, consts.py:5 routes .pdf first-class). */
  def isRealPdf(bytes: Array[Byte]): Boolean =
    bytes.length >= 5 && bytes(0) == '%' && bytes(1) == 'P' &&
      bytes(2) == 'D' && bytes(3) == 'F' && bytes(4) == '-'

  /** PNG (`\x89PNG`) / JPEG (`\xFF\xD8\xFF`) magic — the reference's
    * supported image extensions (consts.py:5: .jpg/.jpeg/.png), detected
    * by content since a crawl table has no filename. */
  def isImage(bytes: Array[Byte]): Boolean =
    (bytes.length >= 4 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' &&
      bytes(2) == 'N' && bytes(3) == 'G') ||
    (bytes.length >= 3 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8 &&
      (bytes(2) & 0xff) == 0xff)

  /** Image payload → page layout (reference `fetch_image` + to_rgb +
    * classifier over the raster, image_utils.py:84-140). The deterministic
    * classifier stand-in for a pure raster is ONE full-bleed Picture cell
    * (no text — prompts.py:11) backed by the image itself, so md embeds a
    * REAL crop. `fitzPreprocess` reproduces parser.py:158-160: the image
    * becomes a 1-page 72-dpi PDF rendered at target dpi, so the INPUT dims
    * derive from the dpi-scaled render (Geometry.renderedPageDims) while
    * bboxes stay in original pixel space. Throws on undecodable bytes —
    * [[parsePage]] converts that into the typed error row. */
  def imageToLayout(bytes: Array[Byte], fitzPreprocess: Boolean = false): HtmlExtract.PageLayout = {
    // header-only dims probe (hot path: no pixel decode), gated by a
    // structural trailer check (Raster.trailerOk): a sniffed-but-TRUNCATED
    // payload must not yield a successful Picture row whose full-bleed md
    // embeds broken bytes — the reference's fetch_image decode raises
    // there (PIL errors on truncated files at load), so a missing trailer
    // THROWS here → parsePage's typed error row. (It must throw, not fall
    // back to ImageIO: ImageIO silently returns the partial pixels of a
    // truncated JPEG.) Residual weakening vs the reference: pixel-data
    // corruption BEHIND an intact trailer still embeds verbatim (as a
    // browser would render it) — accepted and documented; catching it
    // would need the 8×-wall full decode per image that the fast path
    // exists to avoid. Formats the sniffer doesn't cover take the full
    // decode, which throws on undecodable bytes → same typed error row.
    val (w, h) = Raster.headerInfo(bytes) match {
      case Some((wi, hi, _)) =>
        if (!Raster.trailerOk(bytes))
          throw new IllegalArgumentException("truncated raster: missing trailer")
        (wi.toLong, hi.toLong)
      case None =>
        val img = Raster.decode(bytes)
        (img.getWidth.toLong, img.getHeight.toLong)
    }
    val cell = JObject(
      "bbox" -> JArray(Vector(JInt(0), JInt(0), JInt(w), JInt(h))),
      "category" -> JString(graft.core.Categories.Picture))
    HtmlExtract.PageLayout(w, h, Vector(cell),
      raster = Some(scala.collection.immutable.ArraySeq.unsafeWrapArray(bytes)),
      renderDims = if (fitzPreprocess) Some(Geometry.renderedPageDims(w.toDouble, h.toDouble)) else None)
  }

  /** Parse a PDF payload of either flavor into the shared page model:
    * real `%PDF-` files go through the [[PdfReal]] text-layer parser
    * (reference parses real PDFs first-class via PyMuPDF,
    * doc_utils.py:42-60); PDF-lite goes through [[PdfLite.parse]]. A
    * payload outside the supported slice (encrypted, non-Flate filters,
    * no text layer, truncated) becomes a typed error message, NOT junk
    * for the garbled-repair branch. Caller guarantees one of the two
    * magics matched. */
  private def pdfDocOf(bytes: Array[Byte]): Either[String, PdfLite.PdfDoc] =
    if (isRealPdf(bytes)) {
      try Right(PdfReal.parse(bytes))
      catch {
        case e: PdfReal.PdfRealError =>
          Left(s"unsupported_format: real PDF payload (${e.getMessage}); " +
            "this build parses the text layer of uncompressed/Flate PDFs, PDF-lite, and HTML")
        case scala.util.control.NonFatal(e) =>
          // I3 never-throw contract: at corpus scale every byte pattern
          // arrives eventually, and an escaped exception fails the task
          // 4x then kills the job — any unanticipated parser path
          // degrades to the same typed error row (FuzzSpec)
          Left(s"unsupported_format: real PDF parse failure (${e.getClass.getSimpleName})")
      }
    } else {
      try Right(PdfLite.parse(bytes))
      catch {
        case e: PdfLite.PdfLiteError            => Left(e.getMessage)
        case scala.util.control.NonFatal(e)     =>
          Left(s"pdf-lite parse failure (${e.getClass.getSimpleName})")
      }
    }

  /** Inclusive [start, end] page slice; end < 0 → last page (reference
    * `load_images_from_pdf` range semantics, doc_utils.py:42-58). */
  private def slicePages(pdf: PdfLite.PdfDoc, startPageId: Int, endPageId: Int): Vector[PdfLite.PdfPage] =
    if (startPageId == 0 && endPageId < 0) pdf.pages
    else {
      val last = pdf.pages.length - 1
      val end = if (endPageId >= 0) math.min(endPageId, last) else last
      pdf.pages.slice(startPageId, end + 1)
    }

  def looksLikeHtml(bytes: Array[Byte]): Boolean = {
    // decode the prefix charset-aware (BOM/meta sniff) so e.g. a UTF-16
    // page still dispatches to the HTML branch instead of garbled-repair
    val prefix = java.util.Arrays.copyOfRange(bytes, 0, math.min(bytes.length, 1024))
    val head = HtmlDom.decodeBytes(prefix).toLowerCase.dropWhile(_.isWhitespace)
    head.startsWith("<!doctype") || head.startsWith("<html") || head.contains("<body") ||
      head.startsWith("<head") || head.contains("<html")
  }

  /** Classifier cells in smart-resized INPUT coordinate space (what the
    * VLM would emit), for the layout modes. */
  def classifierCells(
      layout: HtmlExtract.PageLayout,
      mode: PromptMode,
      inputW: Long,
      inputH: Long): Vector[JValue] = {
    val sx = inputW.toDouble / layout.width
    val sy = inputH.toDouble / layout.height
    def toInput(cell: JObject): JObject = {
      val JArray(b) = cell.get("bbox").get
      val scaled = Vector(
        BboxScale.pyIntOfDouble(BboxScale.pyFloatOf(b(0)) * sx),
        BboxScale.pyIntOfDouble(BboxScale.pyFloatOf(b(1)) * sy),
        BboxScale.pyIntOfDouble(BboxScale.pyFloatOf(b(2)) * sx),
        BboxScale.pyIntOfDouble(BboxScale.pyFloatOf(b(3)) * sy))
      cell.updated("bbox", JArray(scaled.map(JInt(_))))
    }
    mode match {
      case PromptMode.LayoutOnly =>
        // "Do not output the corresponding text" (prompts.py:23)
        layout.cells.map { c =>
          toInput(JObject(c.fields.filter { case (k, _) => k != "text" }))
        }
      case _ =>
        layout.cells.map(toInput)
    }
  }

  /** The classifier "model": emit the response string the pre/post dataflow
    * consumes, in smart-resized INPUT coordinate space (as the VLM does). */
  def classifierResponse(
      layout: HtmlExtract.PageLayout,
      mode: PromptMode,
      inputW: Long,
      inputH: Long): String = {
    val sx = inputW.toDouble / layout.width
    val sy = inputH.toDouble / layout.height
    mode match {
      case PromptMode.LayoutAll | PromptMode.LayoutOnly =>
        PyJson.dumps(JArray(classifierCells(layout, mode, inputW, inputH)))
      case PromptMode.Ocr =>
        cellTexts(layout.cells, includeHf = true).mkString("\n\n")
      case PromptMode.GroundingOcr((qx1, qy1, qx2, qy2)) =>
        // query bbox is in ORIGINAL space; reference pre-processes it into
        // input space and the model answers for that region (parser.py:130-137)
        val q = BboxScale.preProcessBboxes(
          layout.width, layout.height,
          Vector(Vector(JInt(qx1), JInt(qy1), JInt(qx2), JInt(qy2))),
          inputW, inputH).head
        val hits = layout.cells.filter { c =>
          val JArray(b) = c.get("bbox").get
          val cx = (BboxScale.pyFloatOf(b(0)) + BboxScale.pyFloatOf(b(2))) / 2 * sx
          val cy = (BboxScale.pyFloatOf(b(1)) + BboxScale.pyFloatOf(b(3))) / 2 * sy
          cx >= q(0).toDouble && cx <= q(2).toDouble && cy >= q(1).toDouble && cy <= q(3).toDouble
        }
        cellTexts(hits, includeHf = true).mkString("\n\n")
    }
  }

  /** Grounding-oracle dump: one row per join-eligible cell (cells carrying
    * a `text` key — exactly [[cellTexts]]'s eligibility) with its
    * input-space center and the page's pre-processed query bbox, plus one
    * anchor row (ord = -1) per page so zero-hit and error pages still form
    * an (url, page_no) group whose replayed response is "". The center and
    * query-bbox math mirrors [[classifierResponse]]'s GroundingOcr branch
    * term-for-term; the containment filter + ordered join is what the
    * DuckDB oracle replays independently (parser.py:130-137). */
  def groundingCellRows(doc: PageDoc,
      qbox: (Long, Long, Long, Long)): Vector[GroundingCellRow] =
    fanOut(doc).flatMap { page =>
      val anchor = GroundingCellRow(page.url, page.page_no, -1, "",
        Double.MaxValue, Double.MaxValue, 0L, 0L, 0L, 0L)
      try {
        val layoutOpt = page.payload_kind match {
          case "pdf"  => Some(PdfLite.pageToLayout(PdfLite.parse(page.page_bytes).pages.head))
          case "html" => Some(HtmlExtract.extract(page.page_bytes))
          case _      => None // error rows ⇒ md == "" ⇒ anchor only
        }
        layoutOpt match {
          case None => Vector(anchor)
          case Some(layout) =>
            val (ih, iw) = Geometry.smartResize(layout.height, layout.width)
            val sx = iw.toDouble / layout.width
            val sy = ih.toDouble / layout.height
            val q = BboxScale.preProcessBboxes(
              layout.width, layout.height,
              Vector(Vector(JInt(qbox._1), JInt(qbox._2), JInt(qbox._3), JInt(qbox._4))),
              iw, ih).head
            val cellRows = layout.cells.zipWithIndex.collect {
              case (o: JObject, ord) if o.has("text") =>
                val JArray(b) = o.get("bbox").get
                val cx = (BboxScale.pyFloatOf(b(0)) + BboxScale.pyFloatOf(b(2))) / 2 * sx
                val cy = (BboxScale.pyFloatOf(b(1)) + BboxScale.pyFloatOf(b(3))) / 2 * sy
                val text = o.get("text").get match {
                  case JString(s) => s
                  case v          => PyJson.pyStr(v)
                }
                GroundingCellRow(page.url, page.page_no, ord, text, cx, cy,
                  q(0).toLong, q(1).toLong, q(2).toLong, q(3).toLong)
            }
            anchor +: cellRows
        }
      } catch {
        case _: Exception => Vector(anchor)
      }
    }

  def cellTexts(cells: Vector[JValue], includeHf: Boolean): Vector[String] =
    cells.collect {
      case o: JObject if o.has("text") &&
        (includeHf || !o.get("category").exists {
          case JString(c) => MdRender.PageHf.contains(c)
          case _          => false
        }) =>
        o.get("text").get match { case JString(s) => s; case v => PyJson.pyStr(v) }
    }

  /** Full per-page parse (reference `_parse_single_image`). Never throws:
    * failures become error rows (the reference writes page_NNN_error.txt,
    * mac/run_ocr_batch.py:405-448). */
  def parsePage(page: RawPage, mode: PromptMode): ParsedPage = {
    try {
      page.payload_kind match {
        case "error" =>
          ParsedPage(page.url, page.page_no, 0, 0, 0, 0, "", "", "", "",
            filtered = false, error = new String(page.page_bytes, StandardCharsets.UTF_8))
        case "garbled" =>
          val response = new String(page.page_bytes, StandardCharsets.UTF_8)
          mode match {
            case PromptMode.Ocr | _: PromptMode.GroundingOcr =>
              // non-layout prompt modes pass the raw response through
              // untouched — the reference only post-processes the layout
              // trio (parser.py:175,240-242); prompt_ocr md IS the response
              ParsedPage(page.url, page.page_no, 960, 1280, 960, 1280,
                cells_json = "", md = response, md_nohf = response,
                extracted_text = response, filtered = false, error = "")
            case _ =>
              // response that never parses cleanly → repair chain → filtered row
              finishLayout(page, mode, response, 1280, 960, 1280, 960)
          }
        case kind =>
          val layout = kind match {
            case "pdf"   => PdfLite.pageToLayout(PdfLite.parse(page.page_bytes).pages.head)
            case "image" =>
              try imageToLayout(page.page_bytes)
              catch {
                case scala.util.control.NonFatal(e) =>
                  // truncated/undecodable image magic → typed error row
                  // (never-throw kernel contract, same class as PDF errors)
                  return ParsedPage(page.url, page.page_no, 0, 0, 0, 0, "", "", "", "",
                    filtered = false,
                    error = s"unsupported_format: image payload (${e.getClass.getSimpleName})")
              }
            case _       => HtmlExtract.extract(page.page_bytes)
          }
          parseLayout(page, mode, layout)
      }
    } catch {
      case e: Exception =>
        ParsedPage(page.url, page.page_no, 0, 0, 0, 0, "", "", "", "",
          filtered = false, error = s"${e.getClass.getSimpleName}: ${e.getMessage}")
    }
  }

  /** Fused fan-out + parse for the map-only default path: a multi-page
    * PDF-lite payload is parsed ONCE and each page's in-memory layout goes
    * straight to the kernel — skipping the per-page serialize→reparse
    * round-trip the RawPage byte schema requires when pages cross a
    * shuffle (spreadPages). Element-wise identical to
    * `fanOut(...).map(parsePage(_, mode))` (the round-trip is a pinned
    * identity: PdfLiteSpec `parse(serialize(doc)) == doc`; equivalence
    * also covered end-to-end by PipelineE2ESpec's spread≡default test). */
  def parseDoc(doc: PageDoc, mode: PromptMode,
      startPageId: Int = 0, endPageId: Int = -1): Vector[ParsedPage] = {
    val bytes = doc.html
    def viaRawPages(): Vector[ParsedPage] =
      fanOut(doc, startPageId, endPageId).map(parsePage(_, mode))
    if (bytes == null || bytes.isEmpty || !(isRealPdf(bytes) || PdfLite.isPdfLite(bytes))) {
      // non-PDF branches carry no redundant work — share fanOut verbatim
      viaRawPages()
    } else {
      val pdf = pdfDocOf(bytes) match {
        case Right(d) => d
        case Left(_)  => return viaRawPages() // error-row path
      }
      val slice = slicePages(pdf, startPageId, endPageId)
      if (slice.isEmpty) viaRawPages() // empty-range error row
      else slice.zipWithIndex.map { case (p, i) =>
        val rp = RawPage(doc.url, i, slice.length, "pdf", null, doc.lang)
        try parseLayout(rp, mode, PdfLite.pageToLayout(p))
        catch {
          case e: Exception =>
            ParsedPage(doc.url, i, 0, 0, 0, 0, "", "", "", "",
              filtered = false, error = s"${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      }
    }
  }

  /** HTML-branch parse from an already-built DOM — the fused web-pipeline
    * entry (graft.pipeline.WebPipeline): one `HtmlDom.parse` feeds
    * extraction AND the link/anchor/robots harvest. Element-wise identical
    * to `parsePage(RawPage(url, 0, 1, "html", bytes, lang), mode)` when
    * `root = HtmlDom.parse(HtmlDom.decodeBytes(bytes))` — same layout
    * pipeline, same generic-catch error row (pinned by WebPipelineSpec).
    * Caller guarantees the payload dispatched to the HTML branch. */
  def parseHtmlDoc(doc: PageDoc, mode: PromptMode, root: HtmlDom.Element): ParsedPage = {
    val page = RawPage(doc.url, 0, 1, "html", null, doc.lang)
    try parseLayout(page, mode, HtmlExtract.extractFromDom(root))
    catch {
      case e: Exception =>
        ParsedPage(doc.url, 0, 0, 0, 0, 0, "", "", "", "",
          filtered = false, error = s"${e.getClass.getSimpleName}: ${e.getMessage}")
    }
  }

  /** Mode dispatch + render from an already-built page layout
    * (the shared tail of parsePage and parseDoc). */
  private def parseLayout(page: RawPage, mode: PromptMode,
      layout: HtmlExtract.PageLayout): ParsedPage = {
    // fitz-preprocessed pages derive INPUT dims from the dpi-scaled render
    // (parser.py:158-160); bboxes still rescale to the original dims below
    val (srcH, srcW) = layout.renderDims.getOrElse((layout.height, layout.width))
    val (ih, iw) = Geometry.smartResize(srcH, srcW)
    mode match {
      case PromptMode.Ocr =>
        val response = classifierResponse(layout, mode, iw, ih)
        // prompt_ocr responses pass through untouched (layout_utils.py:203)
        ParsedPage(page.url, page.page_no, ih.toInt, iw.toInt,
          layout.height.toInt, layout.width.toInt,
          cells_json = "", md = response, md_nohf = response,
          extracted_text = response, filtered = false, error = "")
      case g: PromptMode.GroundingOcr =>
        val response = classifierResponse(layout, g, iw, ih)
        ParsedPage(page.url, page.page_no, ih.toInt, iw.toInt,
          layout.height.toInt, layout.width.toInt,
          cells_json = "", md = response, md_nohf = response,
          extracted_text = response, filtered = false, error = "")
      case m =>
        // trusted path: our classifier's output round-trips the
        // serializer exactly (ints + strings only), so the reference's
        // json.loads(response) is the identity here — skip the
        // dumps→parse of the full cell array (hot-path allocation;
        // equivalence pinned by ExtractKernelSpec). Repair-needing
        // responses (garbled payloads) still take the string path.
        val cells = classifierCells(layout, m, iw, ih)
        finishLayoutTrusted(page, m, cells, layout.width, layout.height, iw, ih, layout.raster)
    }
  }

  /** Trusted-cells variant of [[finishLayout]]: identical semantics to
    * `postProcessOutput(dumps(cells), …)` when every value is a canonical
    * int/string (our classifier's contract). */
  private def finishLayoutTrusted(
      page: RawPage,
      mode: PromptMode,
      inputCells: Vector[JValue],
      originW: Long,
      originH: Long,
      inputW: Long,
      inputH: Long,
      raster: Option[scala.collection.immutable.ArraySeq[Byte]] = None): ParsedPage = {
    try {
      val cells = BboxScale.postProcessCells(originW, originH, inputCells, inputW, inputH)
      renderParsed(page, mode, cells, originW, originH, inputW, inputH, raster)
    } catch {
      case _: BboxScale.KernelError | _: Geometry.AspectRatioError =>
        // mirror the reference fallback: repair over the serialized form
        finishLayout(page, mode, PyJson.dumps(JArray(inputCells)), originW, originH, inputW, inputH, raster)
    }
  }

  private def renderParsed(
      page: RawPage,
      mode: PromptMode,
      cells: Vector[JValue],
      originW: Long,
      originH: Long,
      inputW: Long,
      inputH: Long,
      raster: Option[scala.collection.immutable.ArraySeq[Byte]] = None): ParsedPage = {
    val cellsJson = PyJson.dumps(JArray(cells))
    val (md, mdNohf) =
      if (mode == PromptMode.LayoutOnly) ("", "")
      else {
        // render each cell once; md and md_nohf share the segments
        val segs = MdRender.renderSegments(cells, raster = raster)
        (MdRender.segmentsToMd(segs, noPageHf = false), MdRender.segmentsToMd(segs, noPageHf = true))
      }
    val extracted = cellTexts(cells, includeHf = false).mkString("\n\n")
    ParsedPage(page.url, page.page_no, inputH.toInt, inputW.toInt,
      originH.toInt, originW.toInt, cellsJson, md, mdNohf, extracted,
      filtered = false, error = "")
  }

  /** Layout-mode post-processing + rendering (parser.py:175-234). */
  private def finishLayout(
      page: RawPage,
      mode: PromptMode,
      response: String,
      originW: Long,
      originH: Long,
      inputW: Long,
      inputH: Long,
      raster: Option[scala.collection.immutable.ArraySeq[Byte]] = None): ParsedPage = {
    OutputRepair.postProcessOutput(response, originW, originH, inputW, inputH) match {
      case OutputRepair.ParsedCells(cells) =>
        renderParsed(page, mode, cells, originW, originH, inputW, inputH, raster)
      case OutputRepair.Filtered(text) =>
        // reference: raw response saved as the json artifact, cleaned text as
        // md (parser.py:184-204)
        ParsedPage(page.url, page.page_no, inputH.toInt, inputW.toInt,
          originH.toInt, originW.toInt,
          cells_json = PyJson.dumps(JString(response)),
          md = text, md_nohf = text, extracted_text = text,
          filtered = true, error = "")
    }
  }
}
