package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Ccitt, Jbig2, Pdf}

/** CCITT G3/G4 fax codec tests (TIFF-container bridge to the JDK codec).
  * Round-trip equality through the same public codec pins the container
  * plumbing; the polarity test additionally pins the coded domain against
  * the PUBLISHED T.4 code sequence, so "bit 1 = black-coded" is anchored
  * to the spec, not merely self-consistent.
  */
class CcittSpec extends AnyFunSuite {

  private def patternBitmap(w: Int, h: Int, f: (Int, Int) => Boolean): Jbig2.Bitmap = {
    val bits = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w) if (f(x, y)) bits(y * w + x) = 1
    Jbig2.Bitmap(w, h, bits)
  }

  test("G4 round-trip (K<0)") {
    for (seed <- 0 until 4) {
      val rnd = new scala.util.Random(seed)
      val w = 30 + seed * 7; val h = 20 + seed * 3
      val bm = patternBitmap(w, h, (_, _) => rnd.nextInt(5) < 2)
      val raw = Ccitt.encode(bm, "CCITT T.6")
      val back = Ccitt.decode(raw, w, h, k = -1).get
      assert(java.util.Arrays.equals(back.bits, bm.bits), s"seed=$seed")
    }
  }

  test("Modified Huffman round-trip (K=0 + EncodedByteAlign)") {
    val bm = patternBitmap(37, 22, (x, y) => (x / 3 + y / 2) % 2 == 0)
    val raw = Ccitt.encode(bm, "CCITT RLE")
    val back = Ccitt.decode(raw, 37, 22, k = 0, byteAlign = true).get
    assert(java.util.Arrays.equals(back.bits, bm.bits))
  }

  test("G3 2-D with EOLs round-trip (K>0, CCITT T.4)") {
    val bm = patternBitmap(41, 19, (x, y) => (5 * x + 3 * y) % 11 < 4)
    // the JDK T.4 writer emits mixed 1-D/2-D EOL-tagged lines (T4Options=1),
    // which is exactly the PDF K>0 stream shape
    val raw = Ccitt.encode(bm, "CCITT T.4")
    val back = Ccitt.decode(raw, 41, 19, k = 4, endOfLine = true).get
    assert(java.util.Arrays.equals(back.bits, bm.bits))
  }

  test("polarity pinned to the published T.4 code sequence") {
    // an all-black row under G4 (all-white reference line) must open with
    // horizontal mode (001) + white run 0 (00110101, T.4 table 2) + a
    // black run code (black codes all start 0000…): the first two bytes
    // are exactly 0010 0110 1010 0000 = 26 A0. A polarity-flipped encoder
    // would instead code white 40 and produce different bytes — so this
    // anchors bit 1 = BLACK-coded against the spec, not just round-trip.
    val bm = patternBitmap(40, 1, (_, _) => true)
    val raw = Ccitt.encode(bm, "CCITT T.6")
    assert((raw(0) & 0xff) == 0x26 && (raw(1) & 0xff) == 0xA0,
      raw.take(3).map(b => f"${b & 0xff}%02x").mkString(" "))
    val back = Ccitt.decode(raw, 40, 1, k = -1).get
    assert(back.bits.forall(_ == 1))
  }

  test("TIFF-inexpressible parameter combinations return None") {
    val bm = patternBitmap(16, 8, (x, _) => x % 2 == 0)
    val raw = Ccitt.encode(bm, "CCITT T.6")
    // K=0 with neither byte alignment nor EOLs has no TIFF expression
    assert(Ccitt.decode(raw, 16, 8, k = 0).isEmpty)
    // K>0 without EOLs likewise
    assert(Ccitt.decode(raw, 16, 8, k = 4).isEmpty)
    // bad geometry
    assert(Ccitt.decode(raw, 0, 8, k = -1).isEmpty)
    assert(Ccitt.decode(raw, 16, 0, k = -1).isEmpty)
  }

  test("garbage payloads never throw") {
    assert(Ccitt.decode(Array[Byte](1, 2, 3, 4), 16, 8, k = -1).forall(_ => true))
    val rnd = new scala.util.Random(9)
    val junk = Array.fill[Byte](64)(rnd.nextInt(256).toByte)
    Ccitt.decode(junk, 32, 16, k = -1) // must not throw; value irrelevant
  }

  test("JBIG2 MMR generic region round-trip") {
    val rnd = new scala.util.Random(5)
    val bm = patternBitmap(33, 21, (_, _) => rnd.nextInt(7) < 3)
    val (page, region) = Jbig2.encodeSegments(bm, mmr = true)
    val r = Jbig2.decodeFirstGenericRegion(page ++ region).get
    assert(java.util.Arrays.equals(r.bitmap.bits, bm.bits))
  }

  test("synthetic CCITT PDFs: dims and dark count are bitstream-authoritative") {
    for (id <- 0L until 12L) {
      val rows = Pdf.extractImages(Pdf.PdfBinary(id.toString, 0, Pdf.syntheticCcittPdf(id)))
      assert(rows.size == 1, s"id=$id")
      val r = rows.head
      val w0 = 20 + (id % 25).toInt
      val h0 = 14 + ((5 * id) % 19).toInt
      val dark = (for (y <- 0 until h0; x <- 0 until w0
                       if (5 * x + 3 * y + 2 * id) % 11 < 4) yield 1).size.toLong
      assert(r.filter == "ccitt", s"id=$id: ${r.filter}")
      // the dict's lying /Width cannot leak: /Columns is the coded geometry
      assert(r.width == w0 && r.height == h0, s"id=$id: ${r.width}x${r.height}")
      assert(r.dark == dark, s"id=$id: dark=${r.dark} expected $dark")
    }
  }

  test("a Flate predecessor's /DecodeParms cannot shadow the codec's") {
    // /DecodeParms [<</Predictor 1 /Columns 999>> <</K -1 ...>>]: the fax
    // parameters must come from the LAST filter's dict — indexOf over the
    // unsplit array string would find the predictor's /Columns 999 first
    val bm = patternBitmap(26, 15, (x, y) => (x + 2 * y) % 5 < 2)
    val raw = Ccitt.encode(bm, "CCITT T.6")
    val flated = {
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](raw.length * 2 + 64)
      val n = d.deflate(buf); d.end()
      java.util.Arrays.copyOf(buf, n)
    }
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    w("2 0 obj\n<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>\nendobj\n")
    w("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
      "/Resources << /XObject << /Im0 5 0 R >> >> >>\nendobj\n")
    w("4 0 obj\n<< /Length 2 >>\nstream\nBT\nendstream\nendobj\n")
    w(s"5 0 obj\n<< /Subtype /Image /Width 26 /Height 15 /BitsPerComponent 1 " +
      "/Filter [ /FlateDecode /CCITTFaxDecode ] " +
      "/DecodeParms [ << /Predictor 1 /Columns 999 >> << /K -1 /Columns 26 /Rows 15 >> ] " +
      s"/Length ${flated.length} >>\nstream\n")
    out.write(flated)
    w("\nendstream\nendobj\n%%EOF\n")
    val rows = Pdf.extractImages(Pdf.PdfBinary("p", 0, out.toByteArray))
    val dark = bm.bits.count(_ != 0).toLong
    assert(rows.head.filter == "ccitt" && rows.head.width == 26 &&
      rows.head.height == 15 && rows.head.dark == dark, rows.head)
  }

  test("synthetic JBIG2 PDFs now cover the MMR variant (id%5==4)") {
    for (id <- Seq(4L, 9L)) {
      val rows = Pdf.extractImages(Pdf.PdfBinary(id.toString, 0, Pdf.syntheticJbig2Pdf(id)))
      val r = rows.head
      val w0 = 24 + (id % 20).toInt
      val h0 = 16 + ((3 * id) % 14).toInt
      val dark = (for (y <- 0 until h0; x <- 0 until w0
                       if (3 * x + 5 * y + id) % 7 < 3) yield 1).size.toLong
      assert(r.filter == "jbig2" && r.width == w0 && r.height == h0 && r.dark == dark,
        s"id=$id: $r")
    }
  }
}
