package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Pdf, PdfParse}

/** Real-PDF extraction tests: the spec builds genuine PDF byte streams
  * (classic layout: catalog → pages → page + content streams, optionally
  * Flate-compressed) and asserts the parser recovers text, page order,
  * image counts, and link URIs.
  */
class PdfSpec extends AnyFunSuite {

  /** Minimal valid-enough PDF builder (no xref — the parser scans objects,
    * like every repair-mode reader). One content stream per page.
    */
  private def buildPdf(pageContents: Seq[String], compress: Boolean,
                       withImage: Boolean = false,
                       withLink: Option[String] = None): Array[Byte] = {
    val n = pageContents.length
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    // 1: catalog, 2: pages, 3..2+n: page objs, 3+n..2+2n: content streams,
    // then optional image xobject / annot
    val imgNum = 3 + 2 * n
    val annotNum = imgNum + 1
    w(s"1 0 obj\n<< /Type /Catalog /Root 1 0 R /Pages 2 0 R >>\nendobj\n")
    val kids = (0 until n).map(i => s"${3 + i} 0 R").mkString(" ")
    w(s"2 0 obj\n<< /Type /Pages /Kids [ $kids ] /Count $n >>\nendobj\n")
    (0 until n).foreach { i =>
      val extra = new StringBuilder
      if (withImage && i == 0)
        extra ++= s" /Resources << /XObject << /Im0 $imgNum 0 R >> >>"
      if (withLink.isDefined && i == 0)
        extra ++= s" /Annots [ $annotNum 0 R ]"
      w(s"${3 + i} 0 obj\n<< /Type /Page /Parent 2 0 R /Contents ${3 + n + i} 0 R$extra >>\nendobj\n")
    }
    (0 until n).foreach { i =>
      val content = pageContents(i).getBytes("ISO-8859-1")
      val (data, filter) =
        if (compress) {
          val d = new java.util.zip.Deflater()
          d.setInput(content); d.finish()
          val buf = new Array[Byte](content.length * 2 + 64)
          val len = d.deflate(buf); d.end()
          (java.util.Arrays.copyOf(buf, len), " /Filter /FlateDecode")
        } else (content, "")
      w(s"${3 + n + i} 0 obj\n<< /Length ${data.length}$filter >>\nstream\n")
      out.write(data)
      w("\nendstream\nendobj\n")
    }
    if (withImage)
      w(s"$imgNum 0 obj\n<< /Subtype /Image /Width 8 /Height 8 /Length 0 >>\nstream\n\nendstream\nendobj\n")
    withLink.foreach { uri =>
      w(s"$annotNum 0 obj\n<< /Type /Annot /Subtype /Link /A << /S /URI /URI ($uri) >> >>\nendobj\n")
    }
    w("%%EOF\n")
    out.toByteArray
  }

  private def bt(lines: String*): String =
    "BT /F1 12 Tf 72 720 Td " +
      lines.map(l => s"($l) Tj T*").mkString(" ") + " ET"

  test("uncompressed single page: Tj text recovered") {
    val pdf = buildPdf(Seq(bt("Hello PDF world")), compress = false)
    val pages = PdfParse.parse(pdf).get
    assert(pages.length == 1)
    assert(pages.head.text == "Hello PDF world")
  }

  test("flate-compressed multi-page: page order + per-page text") {
    val pdf = buildPdf(Seq(
      bt("first page alpha", "second line"),
      bt("second page beta")), compress = true)
    val pages = PdfParse.parse(pdf).get
    assert(pages.length == 2)
    assert(pages(0).text == "first page alpha\nsecond line")
    assert(pages(1).text == "second page beta")
  }

  test("TJ arrays, escapes, hex strings, quote operator") {
    val content = """BT /F1 10 Tf 50 700 Td [(kerned ) -120 (array)] TJ T* """ +
      """(escaped \(parens\) and \\slash) Tj T* <48455821> Tj (next via quote) ' ET"""
    val pdf = buildPdf(Seq(content), compress = false)
    val pages = PdfParse.parse(pdf).get
    assert(pages.head.text ==
      "kerned array\nescaped (parens) and \\slash\nHEX!\nnext via quote")
  }

  test("image xobjects counted; annot URIs extracted as links") {
    val pdf = buildPdf(Seq(bt("with media")), compress = true,
      withImage = true, withLink = Some("http://ref.example.com/linked"))
    val pages = PdfParse.parse(pdf).get
    assert(pages.head.nImages == 1)
    assert(pages.head.links == Seq("http://ref.example.com/linked"))
  }

  test("non-PDF bytes fall back to the deterministic stub kernel") {
    val junk = Pdf.PdfBinary("f.bin", 64, Array.tabulate(64)(_.toByte))
    assert(PdfParse.parse(junk.content).isEmpty)
    val pages = Pdf.extractPages(junk)
    assert(pages.nonEmpty && pages.forall(_.text.nonEmpty)) // stub path
  }

  test("real parse flows through the Spark page pipeline into span docs") {
    import SparkTestSession.spark
    import spark.implicits._
    val pdf = buildPdf(Seq(bt("spark page one"), bt("spark page two")), compress = true)
    val ds = Seq(Pdf.PdfBinary("/tmp/a.pdf", pdf.length.toLong, pdf)).toDS()
    val pages = Pdf.pages(ds).collect().sortBy(_.page_no)
    assert(pages.map(_.text).toSeq == Seq("spark page one", "spark page two"))
    val spans = Pdf.toSpanDocs(Pdf.pages(ds).toDF()).collect()
    assert(spans.length == 1)
  }
}
