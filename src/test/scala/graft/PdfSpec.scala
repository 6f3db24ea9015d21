package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Pdf, PdfParse}

/** Real-PDF extraction tests: the spec builds genuine PDF byte streams
  * (classic layout: catalog → pages → page + content streams, optionally
  * Flate-compressed) and asserts the parser recovers text, page order,
  * image counts, and link URIs.
  */
class PdfSpec extends AnyFunSuite {

  private def buildPdf(pageContents: Seq[String], compress: Boolean,
                       withImage: Boolean = false,
                       withLink: Option[String] = None): Array[Byte] =
    PdfFixtures.buildPdf(pageContents, compress, withImage, withLink)

  private def bt(lines: String*): String = PdfFixtures.bt(lines: _*)

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

  private def deflate(content: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(content); d.finish()
    val buf = new Array[Byte](content.length * 2 + 64)
    val len = d.deflate(buf); d.end()
    java.util.Arrays.copyOf(buf, len)
  }

  test("object-stream PDF (PDF 1.5 layout: ObjStm + xref stream) parses fully") {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.5\n")
    // obj 4: top-level content stream (ObjStm objects never hold streams)
    val content = "BT /F1 12 Tf 72 720 Td (packed object stream text) Tj ET"
    val off4 = out.size()
    w(s"4 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n")
    // obj 5: /ObjStm packing catalog, pages, and the page dict
    val o1 = "<< /Type /Catalog /Pages 2 0 R >>"
    val o2 = "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>"
    val o3 = "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"
    val header = s"1 0 2 ${o1.length + 1} 3 ${o1.length + o2.length + 2} "
    val payload = (header + o1 + " " + o2 + " " + o3).getBytes("ISO-8859-1")
    val stm = deflate(payload)
    val off5 = out.size()
    w(s"5 0 obj\n<< /Type /ObjStm /N 3 /First ${header.length} /Length ${stm.length} /Filter /FlateDecode >>\nstream\n")
    out.write(stm)
    w("\nendstream\nendobj\n")
    // obj 6: cross-reference STREAM, /W [1 2 1] binary rows for objects 0-6
    val off6 = out.size()
    def row(t: Int, f2: Int, f3: Int): Array[Byte] =
      Array(t.toByte, ((f2 >> 8) & 0xff).toByte, (f2 & 0xff).toByte, f3.toByte)
    val rows = Array(
      row(0, 0, 0),          // 0: free head
      row(2, 5, 0),          // 1 → ObjStm 5, index 0
      row(2, 5, 1),          // 2 → ObjStm 5, index 1
      row(2, 5, 2),          // 3 → ObjStm 5, index 2
      row(1, off4, 0),       // 4: top-level offset
      row(1, off5, 0),       // 5
      row(1, off6, 0)).flatten // 6 (self)
    val xr = deflate(rows)
    w(s"6 0 obj\n<< /Type /XRef /Size 7 /W [ 1 2 1 ] /Index [ 0 7 ] /Root 1 0 R /Length ${xr.length} /Filter /FlateDecode >>\nstream\n")
    out.write(xr)
    w("\nendstream\nendobj\n")
    w(s"startxref\n$off6\n%%EOF\n")
    val pdf = out.toByteArray

    // the xref stream resolves: type-2 placements + type-1 offsets
    val xref = PdfParse.readXref(pdf).get
    assert(xref.inStreams == Map(1 -> (5, 0), 2 -> (5, 1), 3 -> (5, 2)))
    assert(xref.offsets.get(4).contains(off4.toLong))
    assert(xref.trailer.contains("/Root 1 0 R"))
    // the packed page tree is recovered and drives extraction
    val pages = PdfParse.parse(pdf).get
    assert(pages.length == 1)
    assert(pages.head.text == "packed object stream text")
  }

  test("classic xref table with /Prev incremental update resolves newest-first") {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    def pad10(n: Int): String = f"$n%010d"
    w("%PDF-1.4\n")
    val offs = new Array[Int](6)
    offs(1) = out.size(); w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    offs(2) = out.size(); w("2 0 obj\n<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>\nendobj\n")
    offs(3) = out.size(); w("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n")
    val c0 = "BT (original revision) Tj ET"
    offs(4) = out.size(); w(s"4 0 obj\n<< /Length ${c0.length} >>\nstream\n$c0\nendstream\nendobj\n")
    val xref0 = out.size()
    w("xref\n0 5\n" + pad10(0) + " 65535 f \n" +
      (1 to 4).map(i => pad10(offs(i)) + " 00000 n \n").mkString)
    w(s"trailer\n<< /Size 5 /Root 1 0 R >>\nstartxref\n$xref0\n%%EOF\n")
    // incremental update: replace the content stream, chain via /Prev
    val c1 = "BT (updated revision) Tj ET"
    val off4b = out.size()
    w(s"4 0 obj\n<< /Length ${c1.length} >>\nstream\n$c1\nendstream\nendobj\n")
    val xref1 = out.size()
    w("xref\n4 1\n" + pad10(off4b) + " 00000 n \n")
    w(s"trailer\n<< /Size 5 /Root 1 0 R /Prev $xref0 >>\nstartxref\n$xref1\n%%EOF\n")
    val pdf = out.toByteArray

    val xref = PdfParse.readXref(pdf).get
    assert(xref.offsets(4) == off4b.toLong)      // newest revision wins
    assert(xref.offsets(1) == offs(1).toLong)    // older entries still resolve
    assert(PdfParse.parse(pdf).get.head.text == "updated revision")
  }

  test("synthetic PDF generator: real parse round-trips the generator intent (both layouts)") {
    val text = "Alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    // ids cover: modern ObjStm layout (0, 7, 14, 35), image (even),
    // link (0, 5, 10, 35), AES-128-encrypted (1, 4, 10 — id%3==1, id%7!=0;
    // 10 is encrypted+image+link)
    Seq(0L, 1L, 2L, 4L, 5L, 7L, 10L, 14L, 35L).foreach { id =>
      assert(Seq(1L, 4L, 10L).forall(Pdf.syntheticEncrypted) &&
        !Pdf.syntheticEncrypted(id = 0L))
      val bytes = Pdf.syntheticPdf(id, text)
      if (Pdf.syntheticEncrypted(id))
        assert(!new String(bytes, "ISO-8859-1").contains("alpha"),
          s"id=$id claims encryption but carries plaintext")
      val parsed = PdfParse.parse(bytes).get
      val intent = Pdf.syntheticPdfIntent(id, text)
      assert(parsed.length == intent.length, s"id=$id page count")
      parsed.zip(intent).foreach { case (p, want) =>
        assert(p.text == want.text, s"id=$id page=${want.page_no} text")
        assert(p.nImages == want.n_images, s"id=$id page=${want.page_no} images")
        assert(p.links == want.links, s"id=$id page=${want.page_no} links")
      }
    }
  }

  // ---- stream filter chain ---------------------------------------------------

  private def hexEncode(b: Array[Byte]): Array[Byte] =
    (b.map("%02x".format(_)).mkString + ">").getBytes("ISO-8859-1")

  private def a85Encode(b: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    var i = 0
    while (i < b.length) {
      val n = math.min(4, b.length - i)
      var v = 0L
      (0 until 4).foreach(j => v = (v << 8) | (if (i + j < b.length) b(i + j) & 0xff else 0))
      if (n == 4 && v == 0) sb += 'z'
      else {
        val cs = new Array[Char](5)
        var x = v
        (4 to 0 by -1).foreach { j => cs(j) = ('!' + (x % 85).toInt).toChar; x /= 85 }
        sb ++= new String(cs, 0, n + 1)
      }
      i += 4
    }
    (sb.toString + "~>").getBytes("ISO-8859-1")
  }

  private def rlEncode(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < b.length) {
      var run = 1
      while (i + run < b.length && b(i + run) == b(i) && run < 128) run += 1
      if (run >= 2) { out.write(257 - run); out.write(b(i)); i += run }
      else {
        var lit = 1
        while (i + lit < b.length && lit < 128 &&
               (i + lit + 1 >= b.length || b(i + lit) != b(i + lit + 1))) lit += 1
        out.write(lit - 1); out.write(b, i, lit); i += lit
      }
    }
    out.write(128)
    out.toByteArray
  }

  test("filter primitives: spec LZW vector, A85/AHx/RL round-trips, predictors") {
    // the worked example from the PDF spec §7.4.4.2: "-----A---B"
    val lzwBytes = Array(0x80, 0x0B, 0x60, 0x50, 0x22, 0x0C, 0x0C, 0x85, 0x01).map(_.toByte)
    assert(PdfParse.lzwDecode(lzwBytes).map(new String(_, "ISO-8859-1")) ==
      Some("-----A---B"))
    val payloads = Seq(
      "hello pdf filters".getBytes("ISO-8859-1"),
      Array.fill(300)(7.toByte),
      (0 until 256).map(_.toByte).toArray,
      Array.empty[Byte])
    payloads.foreach { p =>
      assert(PdfParse.asciiHexDecode(hexEncode(p)).map(_.toSeq) == Some(p.toSeq), "AHx")
      assert(PdfParse.ascii85Decode(a85Encode(p)).map(_.toSeq) == Some(p.toSeq), "A85")
      assert(PdfParse.runLengthDecode(rlEncode(p)).map(_.toSeq) == Some(p.toSeq), "RL")
    }
    // odd trailing hex digit pads with 0
    assert(PdfParse.asciiHexDecode("414 >".getBytes("ISO-8859-1")).map(_.toSeq) ==
      Some(Seq[Byte](0x41, 0x40)))
    // PNG predictors: filter rows manually (sub/up/paeth/none), unpredict recovers
    val rowLen = 6; val rows = 4
    val plain = Array.tabulate(rows * rowLen)(i => ((i * 37 + 11) % 251).toByte)
    val filtered = new java.io.ByteArrayOutputStream()
    val fts = Seq(1, 2, 4, 0)
    (0 until rows).foreach { r =>
      val ft = fts(r); filtered.write(ft)
      (0 until rowLen).foreach { j =>
        val cur = plain(r * rowLen + j) & 0xff
        val left = if (j >= 1) plain(r * rowLen + j - 1) & 0xff else 0
        val up = if (r >= 1) plain((r - 1) * rowLen + j) & 0xff else 0
        val ul = if (r >= 1 && j >= 1) plain((r - 1) * rowLen + j - 1) & 0xff else 0
        val pred = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
            if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
        }
        filtered.write((cur - pred) & 0xff)
      }
    }
    assert(PdfParse.unpredict(filtered.toByteArray, 12, columns = rowLen).map(_.toSeq) ==
      Some(plain.toSeq))
    // TIFF predictor 2
    val tiffRow = Array[Byte](10, 5, 3, 2) // deltas
    assert(PdfParse.unpredict(tiffRow, 2, columns = 4).map(_.toSeq) ==
      Some(Seq[Byte](10, 15, 18, 20)))
  }

  test("filtered content streams parse through every filter and chained filters") {
    val text = "Filter chain page"
    val content = bt(text).getBytes("ISO-8859-1")
    def pdfWith(filter: String, data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
      w("%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
      w("2 0 obj\n<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>\nendobj\n")
      w("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n")
      w(s"4 0 obj\n<< /Length ${data.length} /Filter $filter >>\nstream\n")
      out.write(data); w("\nendstream\nendobj\n%%EOF\n")
      out.toByteArray
    }
    val cases = Seq(
      "/ASCIIHexDecode" -> hexEncode(content),
      "/ASCII85Decode" -> a85Encode(content),
      "/RunLengthDecode" -> rlEncode(content),
      "[ /ASCII85Decode /FlateDecode ]" -> a85Encode(deflate(content)),
      "[ /AHx /RL ]" -> hexEncode(rlEncode(content)))
    cases.foreach { case (f, data) =>
      val pages = PdfParse.parse(pdfWith(f, data)).get
      assert(pages.nonEmpty && pages.head.text.contains(text), s"filter $f")
    }
    // unknown filter in the chain → parse yields no text (stub fallback path)
    val bad = PdfParse.parse(pdfWith("/DCTDecode", content)).toSeq.flatten
    assert(bad.isEmpty || bad.head.text.isEmpty)
  }

  test("xref stream with PNG up-predictor (the layout pdflatex emits) resolves") {
    // same ObjStm layout as the PDF-1.5 test but the xref stream rows are
    // PNG predictor-12 filtered before deflate
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.5\n")
    val off4 = out.size()
    w("4 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>\nendobj\n")
    val off5 = out.size()
    val content = bt("Predicted xref page").getBytes("ISO-8859-1")
    val flate = deflate(content)
    w(s"5 0 obj\n<< /Length ${flate.length} /Filter /FlateDecode >>\nstream\n")
    out.write(flate); w("\nendstream\nendobj\n")
    val off1 = out.size()
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    val off2 = out.size()
    w("2 0 obj\n<< /Type /Pages /Kids [ 4 0 R ] /Count 1 >>\nendobj\n")
    val xrefOff = out.size()
    // W [1 4 1]; rows for objects 0..5, type-1 offsets
    def row(t: Int, f2: Int, f3: Int): Array[Byte] =
      Array(t.toByte, (f2 >> 24).toByte, (f2 >> 16).toByte, (f2 >> 8).toByte, f2.toByte, f3.toByte)
    val rows = Seq(row(0, 0, 255), row(1, off1, 0), row(1, off2, 0),
      row(1, xrefOff, 0), row(1, off4, 0), row(1, off5, 0))
    val rowLen = 6
    // PNG predictor 2 (up) per row, type byte 2
    val filtered = new java.io.ByteArrayOutputStream()
    var prior = new Array[Byte](rowLen)
    rows.foreach { r =>
      filtered.write(2)
      (0 until rowLen).foreach(j => filtered.write((r(j) - prior(j)) & 0xff))
      prior = r
    }
    val xrefData = deflate(filtered.toByteArray)
    w(s"3 0 obj\n<< /Type /XRef /Size 6 /W [ 1 4 1 ] /Root 1 0 R " +
      s"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 6 >> " +
      s"/Length ${xrefData.length} >>\nstream\n")
    out.write(xrefData)
    w(s"\nendstream\nendobj\nstartxref\n$xrefOff\n%%EOF\n")
    val pages = PdfParse.parse(out.toByteArray).get
    assert(pages.length == 1 && pages.head.text.contains("Predicted xref page"))
  }

  test("non-PDF bytes fall back to the deterministic stub kernel") {
    val junk = Pdf.PdfBinary("f.bin", 64, Array.tabulate(64)(_.toByte))
    assert(PdfParse.parse(junk.content).isEmpty)
    val pages = Pdf.extractPages(junk)
    assert(pages.nonEmpty && pages.forall(_.text.nonEmpty)) // stub path
  }

  test("embedded JPEG decode: bitstream dims win over a lying /Width dict") {
    // take a synthetic image PDF (real 21x22 JPEG for id=1, k=0) and
    // corrupt its dict to claim 1x1 — the decoded dims must come from the
    // JPEG SOF, so a dict-echoing fake cannot pass
    val honest = Pdf.syntheticImagePdf(1L)
    val pages = PdfParse.parse(honest, decodeImages = true).get
    val imgs = pages.head.images
    assert(imgs.map(i => (i.width, i.height)) ==
      Seq((20 + (1 + 0) % 30, 15 + (7 + 0) % 25),
          (20 + (1 + 13) % 30, 15 + (7 + 11) % 25)))
    assert(imgs.forall(_.filter == "dct"))
    val lying = new String(honest, java.nio.charset.StandardCharsets.ISO_8859_1)
      .replaceFirst("/Width \\d+ /Height \\d+", "/Width 1 /Height 1")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val lied = PdfParse.parse(lying, decodeImages = true).get.head.images.head
    assert((lied.width, lied.height) == (imgs.head.width, imgs.head.height),
      "decoded dims must come from the JPEG bitstream, not the dict")
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
