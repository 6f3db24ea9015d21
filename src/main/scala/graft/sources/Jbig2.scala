package graft.sources

import scala.collection.mutable.ArrayBuffer

/** JBIG2 (ITU-T T.88) — the bi-level image codec PDF embeds behind
  * /JBIG2Decode (ISO 32000 §7.4.7), which the reference consumes through
  * its PDF processor's image extraction (processors/pdf/processor.py:57-430
  * hands rasterised pages to PIL; scanned-text PDFs are overwhelmingly
  * CCITT/JBIG2 inside). Everything here is the published algorithm set:
  *
  *  - the MQ arithmetic coder (T.88 Annex E): the 47-state probability
  *    estimation table and the software-conventions DECODE/BYTEIN and
  *    ENCODE/BYTEOUT/FLUSH procedures (the encoder exists so the test
  *    corpus can be generated forward, exactly like [[PdfCrypt]]'s
  *    encryptor — round-trip equality is the testable property);
  *  - generic region decoding (T.88 §6.2.5.7) for GBTEMPLATE 0 — the
  *    16-bit context template with its four movable AT pixels — including
  *    TPGDON typical-prediction row copying (context 0x9B25);
  *  - the EMBEDDED segment stream organisation PDF uses (T.88 Annex;
  *    no file header): segment headers with short/long referred-segment
  *    forms, page information segments, and immediate (lossless) generic
  *    region segments.
  *
  * MMR-coded generic regions (T.6 coding, MMR=1) decode through [[Ccitt]]
  * (T.88 §6.2.6 defers to the T.4/T.6 run-length decoder). Out of scope
  * (returns None; the caller labels the image unsupported): GBTEMPLATE
  * 1-3 and symbol/text/halftone/refinement segments — a stream that uses
  * them falls back rather than guessing.
  */
object Jbig2 {

  // ---- MQ probability estimation table (T.88 Table E.1) ---------------------
  // columns: Qe, NMPS, NLPS, SWITCH
  private val Qe = Array(
    0x5601, 0x3401, 0x1801, 0x0AC1, 0x0521, 0x0221, 0x5601, 0x5401,
    0x4801, 0x3801, 0x3001, 0x2401, 0x1C01, 0x1601, 0x5601, 0x5401,
    0x5101, 0x4801, 0x3801, 0x3401, 0x3001, 0x2801, 0x2401, 0x2201,
    0x1C01, 0x1801, 0x1601, 0x1401, 0x1201, 0x1101, 0x0AC1, 0x09C1,
    0x08A1, 0x0521, 0x0441, 0x02A1, 0x0221, 0x0141, 0x0111, 0x0085,
    0x0049, 0x0025, 0x0015, 0x0009, 0x0005, 0x0001, 0x5601)
  private val Nmps = Array(
    1, 2, 3, 4, 5, 38, 7, 8, 9, 10, 11, 12, 13, 29, 15, 16, 17, 18, 19, 20,
    21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35, 36, 37, 38,
    39, 40, 41, 42, 43, 44, 45, 45, 46)
  private val Nlps = Array(
    1, 6, 9, 12, 29, 33, 6, 14, 14, 14, 17, 18, 20, 21, 14, 14, 15, 16, 17,
    18, 19, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34,
    35, 36, 37, 38, 39, 40, 41, 42, 43, 46)
  private val Switch = Array(
    1, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)

  /** Adaptive context state: index into the estimation table + current MPS
    * sense, one per context value. */
  final class Contexts(n: Int) {
    val idx = new Array[Byte](n)
    val mps = new Array[Byte](n)
  }

  // ---- MQ decoder (T.88 E.3.2-E.3.5, software conventions) -------------------

  final class MqDecoder(data: Array[Byte]) {
    private var bp = 0
    private var c: Long = 0L
    private var a: Int = 0
    private var ct: Int = 0

    // INITDEC
    c = (byteAt(0).toLong << 16)
    bytein()
    c = (c << 7) & 0xFFFFFFFFL
    ct -= 7
    a = 0x8000

    private def byteAt(i: Int): Int =
      if (i < data.length) data(i) & 0xff else 0xff // past the end: marker bytes

    private def bytein(): Unit = {
      if (byteAt(bp) == 0xff) {
        if (byteAt(bp + 1) > 0x8f) { c += 0xff00L; ct = 8 }
        else { bp += 1; c += byteAt(bp).toLong << 9; ct = 7 }
      } else { bp += 1; c += byteAt(bp).toLong << 8; ct = 8 }
    }

    /** DECODE one bit under context `cx` of `ctx`. */
    def decode(ctx: Contexts, cx: Int): Int = {
      val i = ctx.idx(cx) & 0xff
      val qe = Qe(i)
      var d = 0
      a -= qe
      if (((c >>> 16) & 0xffff) < qe) {
        // LPS subinterval selected (before conditional exchange)
        if (a < qe) { d = ctx.mps(cx); ctx.idx(cx) = Nmps(i).toByte }
        else {
          d = 1 - ctx.mps(cx)
          if (Switch(i) == 1) ctx.mps(cx) = (1 - ctx.mps(cx)).toByte
          ctx.idx(cx) = Nlps(i).toByte
        }
        a = qe
        renorm()
      } else {
        c -= qe.toLong << 16
        if ((a & 0x8000) == 0) {
          if (a < qe) {
            d = 1 - ctx.mps(cx)
            if (Switch(i) == 1) ctx.mps(cx) = (1 - ctx.mps(cx)).toByte
            ctx.idx(cx) = Nlps(i).toByte
          } else { d = ctx.mps(cx); ctx.idx(cx) = Nmps(i).toByte }
          renorm()
        } else d = ctx.mps(cx)
      }
      d
    }

    private def renorm(): Unit = {
      while ({
        if (ct == 0) bytein()
        a <<= 1
        c = (c << 1) & 0xFFFFFFFFL
        ct -= 1
        (a & 0x8000) == 0
      }) ()
    }
  }

  // ---- MQ encoder (T.88 E.3.6-E.3.9) — forward direction for the test corpus

  final class MqEncoder {
    private var a: Int = 0x8000
    private var c: Long = 0L
    private var ct: Int = 12
    private var b: Int = 0 // pending byte; virtual until first push
    private var started = false
    private val out = new ArrayBuffer[Byte]()

    private def push(): Unit = {
      // the initial pending byte is a carry guard outside the codestream:
      // dropped when it stayed 0, emitted when a carry made it real
      if (started || b != 0) out += b.toByte
      started = true
    }

    private def byteout(): Unit = {
      if (b == 0xff) { push(); b = (c >>> 20).toInt; c &= 0xFFFFFL; ct = 7 }
      else if (c < 0x8000000L) { push(); b = (c >>> 19).toInt; c &= 0x7FFFFL; ct = 8 }
      else {
        // carry: fold bit 27 into the pending byte, then CLEAR it before
        // extracting the next byte — leaving it set would leak the carry
        // into b a second time (visible only near flush on short streams)
        b += 1
        c &= 0x7FFFFFFL
        if (b == 0xff) { push(); b = (c >>> 20).toInt; c &= 0xFFFFFL; ct = 7 }
        else { push(); b = (c >>> 19).toInt; c &= 0x7FFFFL; ct = 8 }
      }
    }

    private def renorm(): Unit = {
      while ({
        if (ct == 0) byteout()
        a <<= 1
        c = (c << 1) & 0xFFFFFFFFL
        ct -= 1
        (a & 0x8000) == 0
      }) ()
    }

    /** ENCODE one bit under context `cx` of `ctx`. */
    def encode(ctx: Contexts, cx: Int, bit: Int): Unit = {
      val i = ctx.idx(cx) & 0xff
      val qe = Qe(i)
      if (bit == ctx.mps(cx)) { // CODEMPS
        a -= qe
        if ((a & 0x8000) == 0) {
          if (a < qe) a = qe else c += qe
          ctx.idx(cx) = Nmps(i).toByte
          renorm()
        } else c += qe
      } else { // CODELPS
        a -= qe
        if (a < qe) c += qe else a = qe
        if (Switch(i) == 1) ctx.mps(cx) = (1 - ctx.mps(cx)).toByte
        ctx.idx(cx) = Nlps(i).toByte
        renorm()
      }
    }

    /** FLUSH: SETBITS + two byteouts + the FF AC terminator. */
    def finish(): Array[Byte] = {
      // SETBITS: raise the low 16 bits, stepping back half an interval if
      // that overshoots [C, C+A) — always lands inside because A >= 0x8000
      // after renormalisation
      val temp = c + a
      c |= 0xFFFFL
      if (c >= temp) c -= 0x8000L
      c = (c << ct) & 0xFFFFFFFFL
      byteout()
      c = (c << ct) & 0xFFFFFFFFL
      byteout()
      push() // commit the last pending byte
      if (out.isEmpty || (out.last & 0xff) != 0xff) out += 0xff.toByte
      out += 0xac.toByte
      out.toArray
    }
  }

  // ---- Generic region, GBTEMPLATE 0 (T.88 §6.2.5.7) --------------------------

  /** A 1-bpp bitmap, row-major, one byte per pixel (0/1) for simplicity —
    * region decode is a parse-time operation, never a per-row Spark kernel. */
  final case class Bitmap(width: Int, height: Int, bits: Array[Byte]) {
    def get(x: Int, y: Int): Int =
      if (x < 0 || y < 0 || x >= width || y >= height) 0 else bits(y * width + x)
    def set(x: Int, y: Int, v: Int): Unit = bits(y * width + x) = v.toByte
    /** Packed 1-bpp MSB-first rows — the /JBIG2Decode output PDF expects. */
    def packed: Array[Byte] = {
      val stride = (width + 7) / 8
      val out = new Array[Byte](stride * height)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          if (bits(y * width + x) != 0)
            out(y * stride + (x >> 3)) = (out(y * stride + (x >> 3)) | (0x80 >> (x & 7))).toByte
          x += 1
        }
        y += 1
      }
      out
    }
  }

  /** Template-0 AT pixel positions (dx, dy); nominal values per the spec
    * figure: A1=(+3,-1), A2=(-3,-1), A3=(+2,-2), A4=(-2,-2). */
  final case class AtPixels(a1: (Int, Int) = (3, -1), a2: (Int, Int) = (-3, -1),
                            a3: (Int, Int) = (2, -2), a4: (Int, Int) = (-2, -2))

  /** The 16-bit template-0 context at (x, y): the spec figure read MSB-first,
    * top row to bottom row, left to right, each slot keeping its bit position
    * when its AT pixel moves. */
  private def context0(bm: Bitmap, x: Int, y: Int, at: AtPixels): Int = {
    var cx = bm.get(x + at.a4._1, y + at.a4._2)
    cx = (cx << 1) | bm.get(x - 1, y - 2)
    cx = (cx << 1) | bm.get(x, y - 2)
    cx = (cx << 1) | bm.get(x + 1, y - 2)
    cx = (cx << 1) | bm.get(x + at.a3._1, y + at.a3._2)
    cx = (cx << 1) | bm.get(x + at.a2._1, y + at.a2._2)
    cx = (cx << 1) | bm.get(x - 2, y - 1)
    cx = (cx << 1) | bm.get(x - 1, y - 1)
    cx = (cx << 1) | bm.get(x, y - 1)
    cx = (cx << 1) | bm.get(x + 1, y - 1)
    cx = (cx << 1) | bm.get(x + 2, y - 1)
    cx = (cx << 1) | bm.get(x + at.a1._1, y + at.a1._2)
    cx = (cx << 1) | bm.get(x - 4, y)
    cx = (cx << 1) | bm.get(x - 3, y)
    cx = (cx << 1) | bm.get(x - 2, y)
    cx = (cx << 1) | bm.get(x - 1, y)
    cx
  }

  /** TPGDON pseudo-pixel context for template 0 (T.88 §6.2.5.7). */
  private val TpgdCx0 = 0x9B25

  /** Decode a template-0 generic region bitmap of w×h from MQ data. */
  def decodeGenericRegion(data: Array[Byte], w: Int, h: Int, tpgdon: Boolean,
                          at: AtPixels = AtPixels()): Bitmap = {
    val dec = new MqDecoder(data)
    val ctx = new Contexts(1 << 16)
    val bm = Bitmap(w, h, new Array[Byte](w * h))
    var ltp = 0
    var y = 0
    while (y < h) {
      if (tpgdon) ltp ^= dec.decode(ctx, TpgdCx0)
      if (tpgdon && ltp == 1) {
        // typical row: copy the row above (row 0 copies the all-0 border)
        if (y > 0) System.arraycopy(bm.bits, (y - 1) * w, bm.bits, y * w, w)
      } else {
        var x = 0
        while (x < w) {
          bm.set(x, y, dec.decode(ctx, context0(bm, x, y, at)))
          x += 1
        }
      }
      y += 1
    }
    bm
  }

  /** Encode a bitmap as a template-0 generic region (test-corpus forward
    * direction; the decoder must reproduce it exactly). */
  def encodeGenericRegion(bm: Bitmap, tpgdon: Boolean,
                          at: AtPixels = AtPixels()): Array[Byte] = {
    val enc = new MqEncoder
    val ctx = new Contexts(1 << 16)
    var ltp = 0
    var y = 0
    while (y < bm.height) {
      val typical = tpgdon && y > 0 &&
        java.util.Arrays.equals(
          java.util.Arrays.copyOfRange(bm.bits, (y - 1) * bm.width, y * bm.width),
          java.util.Arrays.copyOfRange(bm.bits, y * bm.width, (y + 1) * bm.width))
      if (tpgdon) {
        val want = if (typical) 1 else 0
        enc.encode(ctx, TpgdCx0, ltp ^ want)
        ltp = want
      }
      if (!(tpgdon && typical)) {
        var x = 0
        while (x < bm.width) {
          enc.encode(ctx, context0(bm, x, y, at), bm.get(x, y))
          x += 1
        }
      }
      y += 1
    }
    enc.finish()
  }

  // ---- Embedded segment stream (T.88 §7; the PDF organisation) ---------------

  final case class Segment(number: Long, segType: Int, page: Long,
                           data: Array[Byte])

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  /** Parse the embedded (no file header) segment stream. Returns None on a
    * malformed header or an unknown-length segment. Trailing CR/LF bytes
    * after the last segment are tolerated — a PDF scanner that delimits
    * streams by the endstream keyword over-captures the EOL before it, and
    * the explicit segment lengths make the padding unambiguous. */
  def parseSegments(data: Array[Byte]): Option[Seq[Segment]] = {
    val out = new ArrayBuffer[Segment]()
    var i = 0
    while (i < data.length) {
      if (data.length - i <= 2 &&
          (i until data.length).forall(k => data(k) == '\n' || data(k) == '\r'))
        return Some(out.toSeq)
      if (i + 11 > data.length) return None
      val number = be32(data, i)
      val flags = data(i + 4) & 0xff
      val segType = flags & 0x3f
      val pageAssoc4 = (flags & 0x40) != 0
      var j = i + 5
      val refHead = data(j) & 0xff
      var refCount = refHead >>> 5
      if (refCount == 7) {
        if (j + 4 > data.length) return None
        refCount = (be32(data, j) & 0x1FFFFFFFL).toInt
        j += 4 + (refCount + 8) / 8 // long form: 4-byte count + retain bits
      } else j += 1
      // referred segment numbers: sized by THIS segment's number
      val refSize = if (number <= 256) 1 else if (number <= 65536) 2 else 4
      j += refCount * refSize
      val page = if (pageAssoc4) { val p = be32(data, j); j += 4; p }
                 else { val p = (data(j) & 0xffL); j += 1; p }
      if (j + 4 > data.length) return None
      val len = be32(data, j)
      j += 4
      if (len == 0xFFFFFFFFL || j + len > data.length) return None
      out += Segment(number, segType, page,
        java.util.Arrays.copyOfRange(data, j, j + len.toInt))
      i = j + len.toInt
    }
    Some(out.toSeq)
  }

  /** A decoded generic region with its placement on the page. */
  final case class Region(x: Int, y: Int, bitmap: Bitmap)

  /** Decode the FIRST immediate generic region in an embedded JBIG2 stream:
    * segment types 36/38/39, arithmetic template 0 or MMR (T.6 via
    * [[Ccitt]]) — templates 1-3 return None, as do symbol/text-region-only
    * streams. */
  def decodeFirstGenericRegion(data: Array[Byte]): Option[Region] =
    parseSegments(data).flatMap(firstGenericRegion)

  /** Same, with a PDF /JBIG2Globals stream: the globals are their OWN
    * segment stream (ISO 32000 §7.4.7), so each parses separately — byte
    * concatenation would put one stream's trailing EOL padding between
    * segments of the other. */
  def decodeFirstGenericRegion(globals: Array[Byte], data: Array[Byte]): Option[Region] =
    for {
      gsegs <- if (globals.isEmpty) Some(Seq.empty[Segment]) else parseSegments(globals)
      segs  <- parseSegments(data)
      r     <- firstGenericRegion(gsegs ++ segs)
    } yield r

  private def firstGenericRegion(segs: Seq[Segment]): Option[Region] = {
    segs.find(s => s.segType == 36 || s.segType == 38 || s.segType == 39)
      .flatMap { seg =>
        val d = seg.data
        if (d.length < 18) return None
        val w = be32(d, 0).toInt
        val h = be32(d, 4).toInt
        val x = be32(d, 8).toInt
        val y = be32(d, 12).toInt
        // d(16) = external combination operator (placement only)
        val flags = d(17) & 0xff
        val mmr = (flags & 1) != 0
        val template = (flags >> 1) & 3
        val tpgdon = (flags & 8) != 0
        if (w <= 0 || h <= 0 || w.toLong * h > 64L * 1024 * 1024) return None
        if (mmr) {
          // MMR regions are T.6-coded, full-width, no AT bytes in the
          // header (T.88 §7.4.6.2) and no typical prediction (§6.2.6)
          if (tpgdon) return None
          val data = java.util.Arrays.copyOfRange(d, 18, d.length)
          Ccitt.decodeG4(data, w, h).map(Region(x, y, _))
        } else if (template != 0) None
        else {
          if (d.length < 18 + 8) return None
          val at = AtPixels(
            (d(18), d(19)), (d(20), d(21)), (d(22), d(23)), (d(24), d(25)))
          val mq = java.util.Arrays.copyOfRange(d, 26, d.length)
          try Some(Region(x, y, decodeGenericRegion(mq, w, h, tpgdon, at)))
          catch { case _: Exception => None }
        }
      }
  }

  // ---- Embedded-stream writer (test corpus) ----------------------------------

  private def be32b(v: Long): Array[Byte] = Array(
    ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
    ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def segmentBytes(number: Long, segType: Int, page: Int,
                           payload: Array[Byte]): Array[Byte] = {
    val out = new ArrayBuffer[Byte]()
    out ++= be32b(number)
    out += segType.toByte // flags: short page assoc, not deferred
    out += 0x00.toByte    // 0 referred segments, short form
    out += page.toByte
    out ++= be32b(payload.length.toLong)
    out ++= payload
    out.toArray
  }

  /** The two embedded-stream segments for `bm`: the page information
    * segment (type 48) and an immediate lossless generic region segment
    * (type 39; arithmetic template 0, or T.6-coded when `mmr`) —
    * separately, so a caller can ship the page info in a PDF
    * /JBIG2Globals stream and the region in the image stream (the split
    * organisation ISO 32000 §7.4.7 allows). */
  def encodeSegments(bm: Bitmap, tpgdon: Boolean = false,
                     at: AtPixels = AtPixels(),
                     mmr: Boolean = false): (Array[Byte], Array[Byte]) = {
    // page information segment: width, height, xres, yres, flags, striping
    val pageInfo = be32b(bm.width.toLong) ++ be32b(bm.height.toLong) ++
      be32b(0) ++ be32b(0) ++ Array(0x01.toByte) ++ Array(0x00.toByte, 0x00.toByte)
    val regionFlags = (if (mmr) 1 else 0) | (if (tpgdon && !mmr) 8 else 0)
    val coded =
      if (mmr) Ccitt.encode(bm) // T.6, no AT bytes in the header
      else Array(at.a1._1, at.a1._2, at.a2._1, at.a2._2,
        at.a3._1, at.a3._2, at.a4._1, at.a4._2).map(_.toByte) ++
        encodeGenericRegion(bm, tpgdon, at)
    val regionInfo = be32b(bm.width.toLong) ++ be32b(bm.height.toLong) ++
      be32b(0) ++ be32b(0) ++ Array(0x00.toByte) ++ // combOp OR
      Array(regionFlags.toByte) ++ coded
    (segmentBytes(0, 48, 1, pageInfo), segmentBytes(1, 39, 1, regionInfo))
  }

  /** Write a minimal embedded JBIG2 stream: page info + one immediate
    * lossless generic region carrying `bm` (template 0). */
  def encodeEmbedded(bm: Bitmap, tpgdon: Boolean = false,
                     at: AtPixels = AtPixels()): Array[Byte] = {
    val (page, region) = encodeSegments(bm, tpgdon, at)
    page ++ region
  }
}
