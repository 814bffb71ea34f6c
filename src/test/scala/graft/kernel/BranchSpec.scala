package graft.kernel

import graft.core.Categories
import org.scalatest.funsuite.AnyFunSuite

class HtmlExtractSpec extends AnyFunSuite {

  val page: String =
    """<!DOCTYPE html>
      |<html><head><title>Doc</title><style>p{color:red}</style>
      |<script>var a = "<p>fake</p>";</script></head>
      |<body>
      |<header><a href="/">Home</a> <a href="/x">X</a></header>
      |<nav><ul><li><a href="/a">A</a></li><li><a href="/b">B</a></li></ul></nav>
      |<main>
      |<h1>Main&nbsp;Title</h1>
      |<h2>Section &amp; One</h2>
      |<p>First paragraph with <b>bold</b> and <a href="/ref">one link</a> inside a longer sentence that is clearly content.</p>
      |<ul><li>item one</li><li>item two</li></ul>
      |<table id="t"><thead><tr><th>k</th><th>v</th></tr></thead><tbody><tr><td>a</td><td>1</td></tr></tbody></table>
      |<p class="math display">$$E = mc^2$$</p>
      |<figure><img src="/i.png"><figcaption>A caption</figcaption></figure>
      |<blockquote>quoted wisdom</blockquote>
      |<pre>code {
      |  block
      |}</pre>
      |<p class="footnote">[1] a note</p>
      |<aside><a href="/m">more</a> <a href="/n">links</a></aside>
      |</main>
      |<footer>© 2024 <a href="/legal">legal</a></footer>
      |</body></html>""".stripMargin

  lazy val layout: HtmlExtract.PageLayout = HtmlExtract.extractFromString(page)
  lazy val cats: Vector[String] =
    layout.cells.map(_.get("category").get.asInstanceOf[JString].value)
  def textOf(i: Int): String =
    layout.cells(i).get("text").map(_.asInstanceOf[JString].value).getOrElse("")

  test("categories in document order with boilerplate stripped") {
    assert(cats == Vector(
      Categories.PageHeader, Categories.PageHeader, // header, nav
      Categories.Title, Categories.SectionHeader, Categories.Text,
      Categories.ListItem, Categories.ListItem, Categories.Table,
      Categories.Formula, Categories.Picture, Categories.Caption,
      Categories.Text, // blockquote
      Categories.Text, // pre
      Categories.Footnote,
      // aside dropped (link-density boilerplate)
      Categories.PageFooter))
  }

  test("entity decode and markdown prefixes") {
    assert(textOf(2) == "# Main Title")
    assert(textOf(3) == "## Section & One")
    assert(textOf(5) == "- item one")
    assert(textOf(11).startsWith("> quoted"))
  }

  test("table serialized as structural HTML") {
    val t = textOf(7)
    assert(t == "<table><thead><tr><th>k</th><th>v</th></tr></thead><tbody><tr><td>a</td><td>1</td></tr></tbody></table>")
  }

  test("script/style/title content never leaks into cells") {
    val all = layout.cells.flatMap(_.get("text")).collect { case JString(s) => s }.mkString(" ")
    assert(!all.contains("fake"))
    assert(!all.contains("color:red"))
  }

  test("picture has no text key; bboxes are monotone and legal") {
    val pic = layout.cells(9)
    assert(!pic.has("text"))
    assert(BboxScale.isLegalBbox(layout.cells))
    val ys = layout.cells.map(_.get("bbox").get.asInstanceOf[JArray].items(1).asInstanceOf[JInt].value)
    assert(ys == ys.sorted)
  }

  test("malformed html never throws") {
    val uglies = Seq("<p>unclosed", "<<<>>>", "", "<table><tr><td>x", "</div></div>",
      "<a href='x>y</a>", "<p>&#xZZ; &unknown; &#100;</p>", "text only, no tags",
      "<div><div><div>" * 200 + "deep")
    uglies.foreach { u =>
      val l = HtmlExtract.extractFromString(u)
      assert(l.width > 0 && l.height > 0)
    }
  }

  test("deterministic") {
    val a = HtmlExtract.extractFromString(page)
    val b = HtmlExtract.extractFromString(page)
    assert(PyJson.dumps(JArray(a.cells)) == PyJson.dumps(JArray(b.cells)))
  }

  test("charset sniffing: meta-declared windows-1251/latin-1 and utf-16 BOM decode correctly") {
    val ruDoc = "<html><head><meta charset=\"windows-1251\"></head>" +
      "<body><p>Привет мир, это длинное предложение с настоящим содержанием страницы.</p></body></html>"
    val ruBytes = ruDoc.getBytes("windows-1251")
    val ruText = HtmlExtract.extract(ruBytes).cells
      .flatMap(_.get("text")).collect { case JString(s) => s }.mkString(" ")
    assert(ruText.contains("Привет мир"), ruText)

    val deDoc = "<html><head><meta http-equiv=\"Content-Type\" content=\"text/html; charset=iso-8859-1\"></head>" +
      "<body><p>Größe und Straße — ein längerer Satz mit echtem Inhalt für die Seite.</p></body></html>"
    val deText = HtmlExtract.extract(deDoc.getBytes("ISO-8859-1")).cells
      .flatMap(_.get("text")).collect { case JString(s) => s }.mkString(" ")
    assert(deText.contains("Größe und Straße"), deText)

    val zhDoc = "<html><body><p>这是一个包含真实内容的较长中文句子，用于测试页面解码。</p></body></html>"
    val bom = Array[Byte](0xff.toByte, 0xfe.toByte)
    val zhBytes = bom ++ zhDoc.getBytes("UTF-16LE")
    assert(ExtractKernel.looksLikeHtml(zhBytes), "utf-16le page must dispatch to the html branch")
    val zhText = HtmlExtract.extract(zhBytes).cells
      .flatMap(_.get("text")).collect { case JString(s) => s }.mkString(" ")
    assert(zhText.contains("中文句子"), zhText)

    // undeclared, pure utf-8 stays byte-identical to the old path
    val utf8 = "<html><body><p>plain utf-8 content with ünïcode — 日本語のテキスト。</p></body></html>"
    assert(HtmlDom.decodeBytes(utf8.getBytes("UTF-8")) == utf8)
  }
}

class PdfLiteSpec extends AnyFunSuite {
  import PdfLite._

  def block(x1: Float, y1: Float, x2: Float, y2: Float, cat: String = Categories.Text,
      text: String = "t"): PdfBlock = PdfBlock(x1, y1, x2, y2, cat, text)

  test("serialize/parse round-trip incl multilingual text") {
    val doc = PdfDoc(Vector(
      PdfPage(612f, 792f, Vector(
        block(54, 72, 300, 100, Categories.Title, "# 标题"),
        block(54, 120, 300, 200, Categories.Text, "Привет мир"),
        block(54, 220, 300, 260, Categories.Formula, "\\alpha"))),
      PdfPage(612f, 792f, Vector(block(54, 72, 558, 100, Categories.Text, "p2")))))
    val bytes = serialize(doc)
    assert(parse(bytes) == doc)
  }

  test("truncated payload raises PdfLiteError") {
    val doc = PdfDoc(Vector(PdfPage(612f, 792f, Vector(block(54, 72, 300, 100)))))
    val bytes = serialize(doc)
    intercept[PdfLiteError](parse(bytes.take(bytes.length / 2)))
    intercept[PdfLiteError](parse("nonsense".getBytes))
  }

  test("v2 raster round-trip; raster-less docs stay byte-identical v1") {
    import scala.collection.immutable.ArraySeq
    val plain = PdfDoc(Vector(PdfPage(612f, 792f, Vector(block(54, 72, 300, 100)))))
    val plainBytes = serialize(plain)
    assert(plainBytes(4) == 1, "raster-less serialization must remain version 1")
    assert(parse(plainBytes) == plain)

    val png = graft.ops.MultimodalOps.Codec.encodePng(
      graft.ops.MultimodalOps.patternImage(40, 30, 7L))
    val mixed = PdfDoc(Vector(
      PdfPage(612f, 792f, Vector(block(54, 72, 300, 100)),
        Some(ArraySeq.unsafeWrapArray(png))),
      PdfPage(612f, 792f, Vector(block(54, 72, 558, 100, Categories.Text, "p2")))))
    val v2Bytes = serialize(mixed)
    assert(v2Bytes(4) == 2)
    val back = parse(v2Bytes)
    assert(back == mixed, "v2 round-trip (incl raster bytes + raster-less page)")
    intercept[PdfLiteError](parse(v2Bytes.take(v2Bytes.length - 10)))
  }

  test("XY-cut reading order: title band, then left column, then right") {
    val title = block(54, 40, 558, 70, Categories.Title, "title")
    val l1 = block(54, 100, 290, 200, text = "L1")
    val l2 = block(54, 220, 290, 320, text = "L2")
    val r1 = block(322, 100, 558, 200, text = "R1")
    val r2 = block(322, 220, 558, 320, text = "R2")
    val footer = block(54, 740, 558, 760, Categories.PageFooter, "f")
    val shuffledIn = Vector(r2, l1, footer, title, r1, l2)
    val ordered = readingOrder(shuffledIn)
    assert(ordered.map(_.text) == Vector("title", "L1", "L2", "R1", "R2", "f"))
  }

  test("real %PDF- payload → typed unsupported_format error row, never junk md") {
    import graft.core._
    val doc = PageDoc("https://a.example/real.pdf",
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      "%PDF-1.7\n1 0 obj\n<< /Type /Catalog >>\nendobj\ntrailer".getBytes("UTF-8"),
      "", "en")
    assert(ExtractKernel.isRealPdf(doc.html))
    val pages = ExtractKernel.fanOut(doc)
    assert(pages.length == 1 && pages.head.payload_kind == "error")
    val parsed = ExtractKernel.parsePage(pages.head, graft.core.PromptMode.LayoutAll)
    assert(parsed.error.contains("unsupported_format"))
    assert(!parsed.filtered && parsed.md == "" && parsed.cells_json == "")
  }

  test("dpi scale 200/72 with 4500-px clamp fallback") {
    val normal = PdfPage(612f, 792f, Vector(block(72, 72, 144, 144)))
    val ln = pageToLayout(normal)
    assert(ln.width == math.ceil(612 * 200.0 / 72).toLong)
    val JArray(b) = ln.cells.head.get("bbox").get
    assert(b(0).asInstanceOf[JInt].value.toLong == (72 * 200.0 / 72).toLong)
    // oversized: 1700pts * 200/72 = 4722 > 4500 → falls back to 72 dpi
    val big = PdfPage(1700f, 2200f, Vector(block(72, 72, 144, 144)))
    val lb = pageToLayout(big)
    assert(lb.width == 1700L && lb.height == 2200L)
    val JArray(b2) = lb.cells.head.get("bbox").get
    assert(b2(0).asInstanceOf[JInt].value.toLong == 72L)
  }
}
