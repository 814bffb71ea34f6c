package graft.gen

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.Deflater

/** Deterministic writer of minimal-but-well-formed REAL PDFs (header,
  * catalog/pages tree, per-page Flate or raw content streams, xref table,
  * trailer). Test-input generator for the [[graft.kernel.PdfReal]]
  * text-layer parser — NOT a general PDF library. Text is written with
  * Tf/Td/TL/T-star/Tj operators only, in WinAnsi-safe Latin-1. */
object PdfWrite {

  /** One positioned text line, PDF device coords (origin bottom-left). */
  final case class TextLine(x: Double, y: Double, fontSize: Double, text: String)
  /** `scanned` = a raster-only page: no text layer, content stream paints
    * one image XObject full-bleed (the scanned-document shape PdfReal's
    * Picture fallback handles); `lines` are ignored for such pages. */
  final case class Page(widthPts: Double, heightPts: Double, lines: Vector[TextLine],
      scanned: Boolean = false)

  private def escape(s: String): String =
    s.flatMap {
      case '('  => "\\("
      case ')'  => "\\)"
      case '\\' => "\\\\"
      case c    => c.toString
    }

  /** Locale-pinned "%.1f": the f-interpolator uses the JVM default locale,
    * and a comma-decimal locale (de_DE, nl_NL) would render `756,0` —
    * invalid PDF numbers that PdfReal skips, degrading every generated doc
    * to an error row and breaking the cross-JVM output digest. */
  private def f1(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.1f", v: java.lang.Double)

  private def contentStream(p: Page): Array[Byte] = {
    val sb = new StringBuilder
    sb ++= "BT\n"
    var lastFs = -1.0
    p.lines.foreach { l =>
      if (l.fontSize != lastFs) { sb ++= s"/F1 ${f1(l.fontSize)} Tf\n"; lastFs = l.fontSize }
      sb ++= s"1 0 0 1 ${f1(l.x)} ${f1(l.y)} Tm\n"
      sb ++= s"(${escape(l.text)}) Tj\n"
    }
    sb ++= "ET\n"
    sb.toString.getBytes(StandardCharsets.ISO_8859_1)
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.BEST_SPEED)
    try {
      d.setInput(data); d.finish()
      val out = new ByteArrayOutputStream(data.length / 2 + 64)
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }

  /** Serialize. `compress` = use /FlateDecode on the content streams
    * (exercises the inflate path); raw streams otherwise. */
  def serialize(pages: Vector[Page], compress: Boolean): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    def beginObj(n: Int): Unit = { offsets += out.size(); w(s"$n 0 obj\n") }

    // object numbering: 1 catalog, 2 pages root, 3 font, [4 image xobject
    // when any page is scanned], then per page i: (base+2i) page dict,
    // (base+1+2i) content stream. Numbering only shifts when a scan exists
    // so text-only docs stay byte-identical to the pre-scan writer.
    val nPages = pages.length
    val hasScan = pages.exists(_.scanned)
    val base = if (hasScan) 5 else 4
    w("%PDF-1.4\n%âãÏÓ\n")
    beginObj(1); w("<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    beginObj(2)
    val kids = (0 until nPages).map(i => s"${base + 2 * i} 0 R").mkString(" ")
    w(s"<< /Type /Pages /Count $nPages /Kids [ $kids ] >>\nendobj\n")
    beginObj(3); w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")
    if (hasScan) {
      // opaque raster stand-in (DCT bytes are never decoded by PdfReal)
      val img = "ÿØscan".getBytes(StandardCharsets.ISO_8859_1)
      beginObj(4)
      w(s"<< /Subtype /Image /Width 16 /Height 16 /ColorSpace /DeviceRGB" +
        s" /BitsPerComponent 8 /Filter /DCTDecode /Length ${img.length} >>\nstream\n")
      out.write(img)
      w("\nendstream\nendobj\n")
    }
    pages.zipWithIndex.foreach { case (p, i) =>
      beginObj(base + 2 * i)
      val resources =
        if (p.scanned) "/Resources << /XObject << /Im1 4 0 R >> >>"
        else "/Resources << /Font << /F1 3 0 R >> >>"
      w(s"<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 ${f1(p.widthPts)} ${f1(p.heightPts)} ]" +
        s" $resources /Contents ${base + 1 + 2 * i} 0 R >>\nendobj\n")
      val raw =
        if (p.scanned)
          s"q ${f1(p.widthPts)} 0 0 ${f1(p.heightPts)} 0 0 cm /Im1 Do Q\n"
            .getBytes(StandardCharsets.ISO_8859_1)
        else contentStream(p)
      val data = if (compress) deflate(raw) else raw
      beginObj(base + 1 + 2 * i)
      val filter = if (compress) " /Filter /FlateDecode" else ""
      w(s"<< /Length ${data.length}$filter >>\nstream\n")
      out.write(data)
      w("\nendstream\nendobj\n")
    }
    val xrefPos = out.size()
    val nObjs = offsets.length + 1
    w(s"xref\n0 $nObjs\n0000000000 65535 f \n")
    offsets.foreach(o =>
      w(String.format(java.util.Locale.ROOT, "%010d 00000 n \n", o: java.lang.Integer)))
    w(s"trailer\n<< /Size $nObjs /Root 1 0 R >>\nstartxref\n$xrefPos\n%%EOF\n")
    out.toByteArray
  }
}
