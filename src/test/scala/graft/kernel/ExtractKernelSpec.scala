package graft.kernel

import graft.core.PromptMode
import graft.gen.InputGen
import org.scalatest.funsuite.AnyFunSuite

/** Pins the trusted-path optimization: for classifier output (canonical
  * ints/strings), skipping the dumps→json.loads round-trip must be
  * semantics-preserving against the reference flow. */
class ExtractKernelSpec extends AnyFunSuite {

  test("trusted cells path ≡ response-string path on 100 generated docs") {
    (0 until 100).foreach { i =>
      val row = InputGen.generate(seed = 11L, docId = i.toLong)
      val doc = graft.core.PageDoc(row.url, row.warc_ts, row.html, row.text, row.lang)
      ExtractKernel.fanOut(doc).foreach { page =>
        if (page.payload_kind == "html" || page.payload_kind == "pdf") {
          val layout =
            if (page.payload_kind == "pdf") PdfLite.pageToLayout(PdfLite.parse(page.page_bytes).pages.head)
            else HtmlExtract.extract(page.page_bytes)
          val (ih, iw) = Geometry.smartResize(layout.height, layout.width)
          Seq(PromptMode.LayoutAll, PromptMode.LayoutOnly).foreach { mode =>
            val trusted = ExtractKernel.parsePage(page, mode)
            // reference-faithful path: serialize then full postProcessOutput
            val response = ExtractKernel.classifierResponse(layout, mode, iw, ih)
            val viaString = OutputRepair.postProcessOutput(
              response, layout.width, layout.height, iw, ih) match {
              case OutputRepair.ParsedCells(cells) => PyJson.dumps(JArray(cells))
              case OutputRepair.Filtered(t)        => s"FILTERED:$t"
            }
            assert(trusted.cells_json == viaString,
              s"mismatch for ${page.url} page ${page.page_no} mode $mode")
            assert(!trusted.filtered && trusted.error.isEmpty)
          }
        }
      }
    }
  }
}
