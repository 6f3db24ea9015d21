package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.PdfParse

/** Type0/CID composite-font tests: 2-byte show strings decoded through a
  * /ToUnicode CMap (bfchar, both bfrange destination forms), the Identity
  * fallback without a CMap, a 1-byte simple font with a CMap, and font
  * switching via Tf.
  */
class PdfFontSpec extends AnyFunSuite {

  /** Build a one-page PDF whose /Resources declares the given font objects
    * (`name -> dict body`, with an optional CMap stream per font) and whose
    * content stream is given verbatim. */
  private def fontPdf(content: String,
                      fonts: Seq[(String, String, Option[String])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    // 1 catalog, 2 pages, 3 page, 4 content, then fonts (5,7,…) + cmaps (6,8,…)
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    w("2 0 obj\n<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>\nendobj\n")
    val fontRefs = fonts.zipWithIndex.map { case ((name, _, _), i) =>
      s"/$name ${5 + 2 * i} 0 R"
    }.mkString(" ")
    w(s"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
      s"/Resources << /Font << $fontRefs >> >> >>\nendobj\n")
    w(s"4 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n")
    fonts.zipWithIndex.foreach { case ((_, dict, cmap), i) =>
      val fNum = 5 + 2 * i
      val cRef = cmap.map(_ => s" /ToUnicode ${fNum + 1} 0 R").getOrElse("")
      w(s"$fNum 0 obj\n<< $dict$cRef >>\nendobj\n")
      cmap.foreach { c =>
        w(s"${fNum + 1} 0 obj\n<< /Length ${c.length} >>\nstream\n$c\nendstream\nendobj\n")
      }
    }
    w("%%EOF\n")
    out.toByteArray
  }

  private val type0Dict =
    "/Type /Font /Subtype /Type0 /BaseFont /Fake-Identity-H /Encoding /Identity-H"

  test("Type0 + bfrange CMap: 2-byte codes map through the range") {
    // codes 0x0001..0x001A -> 'A'..'Z'; 0x001B -> space (bfchar)
    val cmap =
      """/CIDInit /ProcSet findresource begin
        |begincmap
        |1 beginbfchar
        |<001b> <0020>
        |endbfchar
        |1 beginbfrange
        |<0001> <001a> <0041>
        |endbfrange
        |endcmap end""".stripMargin
    def enc(s: String): String =
      s.map(c => if (c == ' ') f"${0x1b}%04x" else f"${c - 'A' + 1}%04x").mkString
    val content = s"BT /F1 12 Tf 72 720 Td <${enc("HELLO WORLD")}> Tj ET"
    val pages = PdfParse.parse(fontPdf(content, Seq(("F1", type0Dict, Some(cmap))))).get
    assert(pages.head.text == "HELLO WORLD")
  }

  test("bfrange array destination form and multi-unit bfchar destination") {
    val cmap =
      """begincmap
        |1 beginbfchar
        |<0040> <00660069>
        |endbfchar
        |1 beginbfrange
        |<0030> <0032> [<0058> <0059> <005A>]
        |endbfrange
        |endcmap""".stripMargin
    // 0x30,0x31,0x32 -> X,Y,Z ; 0x40 -> "fi" ligature expansion
    val content = "BT /F1 12 Tf 72 720 Td <0030003100320040> Tj ET"
    val pages = PdfParse.parse(fontPdf(content, Seq(("F1", type0Dict, Some(cmap))))).get
    assert(pages.head.text == "XYZfi")
  }

  test("Type0 without ToUnicode: Identity codepoint fallback") {
    val content = "BT /F1 12 Tf 72 720 Td <00480049> Tj ET" // U+0048 U+0049
    val pages = PdfParse.parse(fontPdf(content, Seq(("F1", type0Dict, None)))).get
    assert(pages.head.text == "HI")
  }

  test("Identity-V without ToUnicode: raw CID codes decode, no stub") {
    val dict = "/Type /Font /Subtype /Type0 /BaseFont /Fake-Identity-V /Encoding /Identity-V"
    val content = "BT /F1 12 Tf 72 720 Td <004A004B> Tj ET" // U+004A U+004B
    val pages = PdfParse.parse(fontPdf(content, Seq(("F1", dict, None)))).get
    assert(pages.head.text == "JK")
  }

  test("predefined non-Identity CMap without ToUnicode: 2-byte Identity approximation") {
    // the UniJIS glyph-order table isn't shipped; the documented behavior is
    // raw 2-byte CID codes under Identity mapping — NOT the stub path
    val dict = "/Type /Font /Subtype /Type0 /BaseFont /Fake-Mincho /Encoding /UniJIS-UCS2-H"
    val content = "BT /F1 12 Tf 72 720 Td <30423044> Tj ET" // U+3042 U+3044
    val pages = PdfParse.parse(fontPdf(content, Seq(("F1", dict, None)))).get
    assert(pages.head.text == "あい")
  }

  test("non-BMP destination: surrogate-pair CMap entry survives") {
    val cmap =
      """begincmap
        |1 beginbfchar
        |<0001> <D83DDE00>
        |endbfchar
        |endcmap""".stripMargin // U+1F600
    val content = "BT /F1 12 Tf 72 720 Td <0001> Tj ET"
    val pages = PdfParse.parse(fontPdf(content, Seq(("F1", type0Dict, Some(cmap))))).get
    assert(pages.head.text == new String(Character.toChars(0x1F600)))
  }

  test("simple 1-byte font with ToUnicode maps through the CMap") {
    val cmap =
      """begincmap
        |2 beginbfchar
        |<41> <03B1>
        |<42> <03B2>
        |endbfchar
        |endcmap""".stripMargin // A -> α, B -> β
    val dict = "/Type /Font /Subtype /Type1 /BaseFont /Helvetica"
    val content = "BT /F1 12 Tf 72 720 Td (AB c) Tj ET"
    val pages = PdfParse.parse(fontPdf(content, Seq(("F1", dict, Some(cmap))))).get
    assert(pages.head.text == "αβ c")
  }

  test("Tf switches decoding mid-stream: simple then Type0 then simple") {
    val cmap =
      """begincmap
        |1 beginbfrange
        |<0001> <001a> <0061>
        |endbfrange
        |endcmap""".stripMargin // 2-byte 0x0001.. -> 'a'..
    val simple = "/Type /Font /Subtype /Type1 /BaseFont /Helvetica"
    val content = "BT /F1 12 Tf 72 720 Td (plain) Tj " +
      "/F2 12 Tf <000300090004> Tj " + // c i d
      "/F1 12 Tf ( tail) Tj ET"
    val pages = PdfParse.parse(fontPdf(content,
      Seq(("F1", simple, None), ("F2", type0Dict, Some(cmap))))).get
    assert(pages.head.text == "plaincid tail")
  }

  test("Tf issued between text objects persists into the next BT") {
    val cmap =
      """begincmap
        |1 beginbfrange
        |<0001> <001a> <0041>
        |endbfrange
        |endcmap""".stripMargin
    val content = "BT /F2 12 Tf 72 720 Td <0001> Tj ET " +
      "q 1 0 0 1 0 -20 cm Q /F2 10 Tf " +
      "BT 72 700 Td <0002> Tj ET"
    val pages = PdfParse.parse(fontPdf(content,
      Seq(("F2", type0Dict, Some(cmap))))).get
    assert(pages.head.text == "A\nB") // Td in the second block breaks the line
  }

  test("parseToUnicode is robust to junk and empty sections") {
    assert(PdfParse.parseToUnicode("no cmap here at all") == Map.empty)
    assert(PdfParse.parseToUnicode("beginbfchar endbfchar beginbfrange endbfrange") == Map.empty)
    assert(PdfParse.parseToUnicode("beginbfchar <0001> <0042> endbfchar") == Map(1 -> "B"))
  }
}
