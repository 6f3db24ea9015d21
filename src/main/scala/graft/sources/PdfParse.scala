package graft.sources

/** Minimal REAL PDF parser for the classic text-PDF subset — replaces the
  * round-1 stub for actual PDF bytes (the reference extracts text, images,
  * and links per page with pypdf, processors/pdf/processor.py:57-430).
  *
  * Supported subset (everything a simple text PDF produced by common
  * generators uses):
  *  - object scanning without xref (sequential `N 0 obj … endobj`), PLUS
  *    startxref/xref resolution when present: classic xref tables with
  *    /Prev-chained incremental updates, AND PDF-1.5 cross-reference STREAMS
  *    (/Type /XRef, /W field widths, /Index subsections, type-2 entries);
  *  - compressed object streams (/Type /ObjStm): the /First-offset header of
  *    (objnum, offset) pairs is parsed out of the inflated payload and every
  *    packed object joins the object table — the layout modern generators
  *    emit by default;
  *  - stream filter chains (/Filter name or array, in order): FlateDecode
  *    (java.util.zip.Inflater), LZWDecode (from the spec, §7.4.4),
  *    ASCIIHexDecode, ASCII85Decode, RunLengthDecode, plus PNG/TIFF
  *    /DecodeParms predictors on Flate/LZW stages (xref streams included);
  *  - page tree via /Root → /Pages → /Kids (document order fallback);
  *  - text from BT…ET blocks: `(…) Tj`, quote, `[…] TJ` with literal-string
  *    escapes (backslash, parens, n/r/t, octal) and hex strings; the Td, TD,
  *    T-star, and quote operators start a new line;
  *  - per-page image counts via /Resources /XObject → /Subtype /Image;
  *  - links via /Annots → /URI.
  *
  *  - encrypted documents via the standard security handler ([[PdfCrypt]]):
  *    RC4 (V1/V2), AES-128 (/AESV2), AES-256 (/AESV3 R6) with an empty (or
  *    caller-supplied) user password — streams and dict strings are
  *    decrypted before any other processing; a failed /U check (a real
  *    password we don't have) falls back to the stub;
  *  - Type0/CID composite fonts: per-page /Resources /Font tracking through
  *    the `Tf` operator, 2-byte codes decoded through the font's /ToUnicode
  *    CMap (bfchar + bfrange, both destination forms), Identity fallback;
  *    simple fonts with a /ToUnicode CMap map through it too. A Type0 font
  *    whose /Encoding names a PREDEFINED CMap (Identity-H/V, UniJIS-…)
  *    without an embedded /ToUnicode decodes its raw 2-byte CID codes under
  *    Identity mapping — exact for Identity-*, a stated approximation for
  *    other predefined names (the glyph-order tables aren't shipped) — so
  *    such documents stay out of the stub path.
  *
  *  - embedded images: /DCTDecode (JPEG) XObjects decode through the JDK
  *    codec — alone or behind a Flate chain — with BITSTREAM-authoritative
  *    dimensions; /JBIG2Decode XObjects (with or without a /JBIG2Globals
  *    stream) decode through the [[Jbig2]] MQ + generic-region decoder
  *    (arithmetic template 0 and T.6-coded MMR); /CCITTFaxDecode XObjects
  *    decode through [[Ccitt]] (JDK TIFF codec behind a container bridge);
  *    /JPXDecode XObjects decode through the [[Jpx]] JPEG 2000 codec
  *    (lossless reversible subset) — dims AND the content statistic
  *    (dark-pixel count / sample sum) taken from the decoded bitmap; raw
  *    bitmaps behind the standard filter chain keep their dict dims only
  *    when the decoded payload length matches the declared geometry.
  *
  * Out of scope (returns what it can, never throws): JBIG2 coding modes
  * beyond generic regions (symbol/text/halftone/refinement), CCITT
  * parameter sets TIFF cannot express (K ≥ 0 with neither EOLs nor byte
  * alignment), and JPX streams outside the lossless single-tile grayscale
  * subset — those fall back to the deterministic stub kernel in [[Pdf]]
  * or a -1-dim row. A supplied password is tried in BOTH roles (user
  * via Algorithm 6/2.A, owner via Algorithm 7 / the R6 /OE unwrap); only
  * a document whose passwords are both unknown falls back.
  */
object PdfParse {

  final case class Obj(num: Int, dict: String, stream: Option[Array[Byte]])

  /** One image XObject on a page. `width`/`height` are BITSTREAM-
    * authoritative: for /DCTDecode the JDK JPEG codec's decoded dimensions
    * (the dict is not trusted — a lying /Width cannot leak through); for
    * /JBIG2Decode the decoded generic-region dimensions from [[Jbig2]];
    * for raw bitmaps behind the standard filter chain the dict dims,
    * accepted only when the decoded payload length matches the declared
    * geometry (w·h·components·bpc/8). `width = -1` marks an undecodable
    * payload (JPX — no JVM codec — or a JBIG2 coding mode outside the
    * generic-region decoder). `dark` is the sum of decoded sample values
    * (bi-level: the black-pixel count; JPX grayscale: the sum of 8-bit
    * samples; -1 where the codec doesn't produce samples) — the content
    * statistic only a true entropy decode can reproduce. */
  final case class PdfImage(name: String, filter: String, width: Int, height: Int,
                            dark: Long = -1L)

  final case class Page(text: String, nImages: Int, links: Seq[String],
                        images: Seq[PdfImage] = Nil)

  private def latin(bytes: Array[Byte], from: Int, until: Int): String =
    new String(bytes, from, until - from, java.nio.charset.StandardCharsets.ISO_8859_1)

  /** Scan all `N G obj … endobj` objects; stream payloads delimited by the
    * stream/endstream keywords (no xref needed). */
  def scanObjects(bytes: Array[Byte]): Map[Int, Obj] = {
    val s = latin(bytes, 0, bytes.length)
    val p = java.util.regex.Pattern.compile("""(\d+)\s+\d+\s+obj\b""")
    val m = p.matcher(s)
    val out = scala.collection.mutable.Map.empty[Int, Obj]
    var from = 0
    var going = true
    while (going && from < s.length && m.find(from)) {
      val num = m.group(1).toInt
      val bodyStart = m.end
      val streamKw = s.indexOf("stream", bodyStart)
      val endObj0 = s.indexOf("endobj", bodyStart)
      if (endObj0 < 0) going = false
      else if (streamKw >= 0 && streamKw < endObj0) {
        val dict = s.substring(bodyStart, streamKw)
        // data begins after "stream" + EOL
        var dataStart = streamKw + "stream".length
        if (dataStart < s.length && s.charAt(dataStart) == '\r') dataStart += 1
        if (dataStart < s.length && s.charAt(dataStart) == '\n') dataStart += 1
        val endStream = s.indexOf("endstream", dataStart)
        val dataEnd = if (endStream < 0) dataStart else endStream
        out(num) = Obj(num, dict,
          Some(java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd)))
        val endObj = s.indexOf("endobj", dataEnd)
        from = if (endObj < 0) s.length else endObj + "endobj".length
      } else {
        out(num) = Obj(num, s.substring(bodyStart, endObj0), None)
        from = endObj0 + "endobj".length
      }
    }
    out.toMap
  }

  // ---- xref / startxref -----------------------------------------------------

  /** Resolved cross-reference info: byte offsets of live top-level objects
    * (type-1 entries) and compressed placements objnum → (objstm, index)
    * (type-2), plus the newest trailer dict. Incremental updates resolve
    * newest-first: an entry already seen on the /Prev chain is never
    * overridden by an older revision.
    */
  final case class Xref(offsets: Map[Int, Long], inStreams: Map[Int, (Int, Int)],
                        trailer: String)

  /** The `startxref` offset recorded at EOF, if any. */
  def readStartxref(bytes: Array[Byte]): Option[Long] = {
    val tail = latin(bytes, math.max(0, bytes.length - 2048), bytes.length)
    val i = tail.lastIndexOf("startxref")
    if (i < 0) None
    else """\d+""".r.findFirstIn(tail.substring(i + "startxref".length)).map(_.toLong)
  }

  /** Single object anchored at a byte offset (used to read xref streams). */
  private def objAt(bytes: Array[Byte], offset: Long): Option[Obj] = {
    if (offset < 0 || offset >= bytes.length) return None
    val s = latin(bytes, offset.toInt, math.min(bytes.length, offset.toInt + (1 << 20)))
    val m = java.util.regex.Pattern.compile("""^\s*(\d+)\s+\d+\s+obj\b""").matcher(s)
    if (!m.find()) return None
    val num = m.group(1).toInt
    val bodyStart = m.end
    val streamKw = s.indexOf("stream", bodyStart)
    val endObj = s.indexOf("endobj", bodyStart)
    if (streamKw >= 0 && (endObj < 0 || streamKw < endObj)) {
      var dataStart = streamKw + "stream".length
      if (dataStart < s.length && s.charAt(dataStart) == '\r') dataStart += 1
      if (dataStart < s.length && s.charAt(dataStart) == '\n') dataStart += 1
      val endStream = s.indexOf("endstream", dataStart)
      val dataEnd = if (endStream < 0) s.length else endStream
      Some(Obj(num, s.substring(bodyStart, streamKw),
        Some(java.util.Arrays.copyOfRange(bytes,
          offset.toInt + dataStart, offset.toInt + dataEnd))))
    } else if (endObj >= 0) Some(Obj(num, s.substring(bodyStart, endObj), None))
    else None
  }

  private def intsIn(s: String): Seq[Long] =
    """-?\d+""".r.findAllIn(s).map(_.toLong).toSeq

  /** Follow the startxref → /Prev chain, merging classic tables and xref
    * streams; None when no parsable xref exists (repair-mode scan then
    * carries the document alone).
    */
  def readXref(bytes: Array[Byte]): Option[Xref] = {
    val offsets = scala.collection.mutable.Map.empty[Int, Long]
    val inStreams = scala.collection.mutable.Map.empty[Int, (Int, Int)]
    var trailer = ""
    var next = readStartxref(bytes)
    var hops = 0
    val seenOffsets = scala.collection.mutable.Set.empty[Long]
    while (next.isDefined && hops < 64 && seenOffsets.add(next.get)) {
      val at = next.get
      next = None
      if (at >= 0 && at < bytes.length) {
        val head = latin(bytes, at.toInt, math.min(bytes.length, at.toInt + 8))
        if (head.startsWith("xref")) {
          // classic table: sections of "start count" + 20-byte entries
          val s = latin(bytes, at.toInt, bytes.length)
          var i = "xref".length
          var inSections = true
          while (inSections) {
            while (i < s.length && s.charAt(i).isWhitespace) i += 1
            if (i >= s.length || !s.charAt(i).isDigit) inSections = false
            else {
              val secM = java.util.regex.Pattern.compile("""\G(\d+)\s+(\d+)\s*""").matcher(s)
              secM.region(i, s.length)
              if (!secM.find()) inSections = false
              else {
                val start = secM.group(1).toInt
                val count = secM.group(2).toInt
                i = secM.end
                val entryRe = java.util.regex.Pattern.compile(
                  """\G(\d{10})\s+(\d{5})\s+([nf])\s*""")
                var e = 0
                var ok = true
                while (e < count && ok) {
                  val em = entryRe.matcher(s)
                  em.region(i, s.length)
                  if (!em.find()) ok = false
                  else {
                    if (em.group(3) == "n" && !offsets.contains(start + e) &&
                        !inStreams.contains(start + e))
                      offsets(start + e) = em.group(1).toLong
                    i = em.end; e += 1
                  }
                }
                if (!ok) inSections = false
              }
            }
          }
          val tIdx = s.indexOf("trailer", i)
          if (tIdx >= 0) {
            val dStart = s.indexOf("<<", tIdx)
            if (dStart >= 0) {
              var depth = 0; var k = dStart; var dEnd = -1
              while (k + 1 < s.length && dEnd < 0) {
                if (s.charAt(k) == '<' && s.charAt(k + 1) == '<') { depth += 1; k += 2 }
                else if (s.charAt(k) == '>' && s.charAt(k + 1) == '>') {
                  depth -= 1; k += 2; if (depth == 0) dEnd = k
                } else k += 1
              }
              if (dEnd > 0) {
                val d = s.substring(dStart, dEnd)
                if (trailer.isEmpty) trailer = d
                next = """/Prev\s+(\d+)""".r.findFirstMatchIn(d).map(_.group(1).toLong)
              }
            }
          }
        } else {
          // xref STREAM: an object whose Flate payload holds binary rows of
          // /W-wide fields over the /Index subsections
          for (o <- objAt(bytes, at) if o.dict.contains("/XRef");
               data <- decodedStream(o)) {
            val w = dictValue(o.dict, "/W").map(intsIn).getOrElse(Seq(1L, 1L, 1L))
              .map(_.toInt)
            val size = """/Size\s+(\d+)""".r.findFirstMatchIn(o.dict)
              .map(_.group(1).toInt).getOrElse(0)
            val index = dictValue(o.dict, "/Index").map(intsIn)
              .filter(_.nonEmpty).getOrElse(Seq(0L, size.toLong)).map(_.toInt)
            val rowLen = w.sum
            var pos = 0
            index.grouped(2).foreach {
              case Seq(start, count) =>
                var e = 0
                while (e < count && pos + rowLen <= data.length) {
                  def field(fi: Int): Long = {
                    val off = pos + w.take(fi).sum
                    var v = 0L
                    (0 until w(fi)).foreach(b => v = (v << 8) | (data(off + b) & 0xffL))
                    v
                  }
                  val typ = if (w(0) == 0) 1L else field(0)
                  val num = start + e
                  if (!offsets.contains(num) && !inStreams.contains(num)) typ match {
                    case 1L => offsets(num) = field(1)
                    case 2L => inStreams(num) = (field(1).toInt, field(2).toInt)
                    case _ => // free
                  }
                  pos += rowLen; e += 1
                }
              case _ =>
            }
            if (trailer.isEmpty) trailer = o.dict
            next = """/Prev\s+(\d+)""".r.findFirstMatchIn(o.dict).map(_.group(1).toLong)
          }
        }
      }
      hops += 1
    }
    if (offsets.isEmpty && inStreams.isEmpty) None
    else Some(Xref(offsets.toMap, inStreams.toMap, trailer))
  }

  // ---- object streams (/ObjStm) ---------------------------------------------

  /** Unpack a /Type /ObjStm object: the inflated payload starts with /First
    * bytes of whitespace-separated (objnum, offset) pairs (/N of them), the
    * packed objects (dicts — never streams, per spec) follow at
    * First + offset. */
  def objStmObjects(o: Obj): Map[Int, Obj] = {
    if (!o.dict.contains("/ObjStm")) return Map.empty
    decodedStream(o) match {
      case None => Map.empty
      case Some(data) =>
        val s = latin(data, 0, data.length)
        val n = """/N\s+(\d+)""".r.findFirstMatchIn(o.dict).map(_.group(1).toInt).getOrElse(0)
        val first = """/First\s+(\d+)""".r.findFirstMatchIn(o.dict)
          .map(_.group(1).toInt).getOrElse(0)
        if (n <= 0 || first <= 0 || first > s.length) return Map.empty
        val header = intsIn(s.substring(0, first))
        val pairs = header.grouped(2).collect { case Seq(a, b) => (a.toInt, b.toInt) }
          .take(n).toSeq
        pairs.zipWithIndex.map { case ((num, off), i) =>
          val start = math.min(first + off, s.length)
          val end =
            if (i + 1 < pairs.length) math.min(first + pairs(i + 1)._2, s.length)
            else s.length
          num -> Obj(num, s.substring(start, math.max(start, end)), None)
        }.toMap
    }
  }

  def inflate(data: Array[Byte]): Option[Array[Byte]] = {
    try {
      val inf = new java.util.zip.Inflater()
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(data.length * 4)
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (n == 0 && inf.needsDictionary()) return None
      }
      inf.end()
      Some(out.toByteArray)
    } catch { case _: Exception => None }
  }

  // ---- stream filter chain --------------------------------------------------

  /** ASCIIHexDecode (PDF 32000-1 §7.4.2): hex pairs, whitespace ignored,
    * `>` is EOD, a trailing odd digit is padded with 0. */
  def asciiHexDecode(data: Array[Byte]): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 1)
    var hi = -1; var i = 0; var done = false
    while (i < data.length && !done) {
      val c = data(i).toChar
      if (c == '>') done = true
      else if (!c.isWhitespace) {
        val v = Character.digit(c, 16)
        if (v < 0) return None
        if (hi < 0) hi = v else { out.write(hi * 16 + v); hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) out.write(hi * 16)
    Some(out.toByteArray)
  }

  /** ASCII85Decode (§7.4.3): base-85 groups of 5 chars → 4 bytes, `z` for a
    * zero group, `~>` EOD, partial final group of n chars yields n-1 bytes. */
  def ascii85Decode(data: Array[Byte]): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 4 / 5 + 4)
    val grp = new Array[Int](5)
    var gn = 0; var i = 0
    // optional <~ leader (Adobe convention)
    if (data.length >= 2 && data(0) == '<' && data(1) == '~') i = 2
    def flush(n: Int): Unit = { // n group chars present (2..5)
      var v = 0L
      var j = 0
      while (j < 5) { v = v * 85 + (if (j < n) grp(j) else 84); j += 1 }
      val bs = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
                     ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
      out.write(bs, 0, n - 1)
    }
    var done = false
    while (i < data.length && !done) {
      val c = data(i).toChar
      if (c == '~') done = true
      else if (c == 'z' && gn == 0) out.write(Array[Byte](0, 0, 0, 0), 0, 4)
      else if (!c.isWhitespace) {
        val v = c - '!'
        if (v < 0 || v > 84) return None
        grp(gn) = v; gn += 1
        if (gn == 5) { flush(5); gn = 0 }
      }
      i += 1
    }
    if (gn == 1) return None // a 1-char final group is invalid
    if (gn > 1) flush(gn)
    Some(out.toByteArray)
  }

  /** RunLengthDecode (§7.4.5): length byte L — 0..127 copies the next L+1
    * bytes, 129..255 repeats the next byte 257−L times, 128 is EOD. */
  def runLengthDecode(data: Array[Byte]): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 2)
    var i = 0
    while (i < data.length) {
      val l = data(i) & 0xff
      if (l == 128) return Some(out.toByteArray)
      else if (l < 128) {
        if (i + 1 + l + 1 > data.length) return None
        out.write(data, i + 1, l + 1); i += l + 2
      } else {
        if (i + 1 >= data.length) return None
        var r = 257 - l
        while (r > 0) { out.write(data(i + 1)); r -= 1 }
        i += 2
      }
    }
    Some(out.toByteArray) // EOD marker is optional in practice
  }

  /** LZWDecode (§7.4.4): MSB-first variable-width codes 9→12 bits, 256 =
    * clear table, 257 = EOD; code width grows when the NEXT entry index
    * reaches 2^width − earlyChange (earlyChange defaults to 1). */
  def lzwDecode(data: Array[Byte], earlyChange: Int = 1): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 3)
    val table = new scala.collection.mutable.ArrayBuffer[Array[Byte]](4096)
    def reset(): Unit = {
      table.clear()
      var b = 0
      while (b < 256) { table += Array(b.toByte); b += 1 }
      table += Array.emptyByteArray // 256: clear
      table += Array.emptyByteArray // 257: EOD
    }
    reset()
    var width = 9
    var bitBuf = 0L; var bitCnt = 0; var i = 0
    var prev: Array[Byte] = null
    while (true) {
      while (bitCnt < width && i < data.length) {
        bitBuf = (bitBuf << 8) | (data(i) & 0xff); bitCnt += 8; i += 1
      }
      if (bitCnt < width) return Some(out.toByteArray) // ran off the end
      val code = ((bitBuf >> (bitCnt - width)) & ((1 << width) - 1)).toInt
      bitCnt -= width
      if (code == 257) return Some(out.toByteArray)
      else if (code == 256) { reset(); width = 9; prev = null }
      else {
        val entry: Array[Byte] =
          if (code < table.length) table(code)
          else if (code == table.length && prev != null) prev :+ prev(0)
          else return None
        out.write(entry, 0, entry.length)
        if (prev != null) table += (prev :+ entry(0))
        prev = entry
        if (table.length + earlyChange >= (1 << width) && width < 12) width += 1
      }
    }
    None // unreachable
  }

  /** PNG (predictor ≥ 10) and TIFF (predictor 2, 8-bit) unprediction of a
    * Flate/LZW payload per /DecodeParms (§7.4.4.4). Identity for ≤ 1. */
  def unpredict(data: Array[Byte], predictor: Int, columns: Int,
                colors: Int = 1, bpc: Int = 8): Option[Array[Byte]] = {
    if (predictor <= 1) return Some(data)
    val bpp = math.max(1, colors * bpc / 8)
    val rowLen = (columns * colors * bpc + 7) / 8
    if (predictor == 2) { // TIFF horizontal differencing, 8-bit components
      if (bpc != 8 || rowLen == 0 || data.length % rowLen != 0) return None
      val out = data.clone()
      var r = 0
      while (r < out.length) {
        var j = bpp
        while (j < rowLen && r + j < out.length) {
          out(r + j) = ((out(r + j) + out(r + j - bpp)) & 0xff).toByte; j += 1
        }
        r += rowLen
      }
      return Some(out)
    }
    // PNG predictors: each row prefixed by a filter-type byte
    if (rowLen == 0 || data.length % (rowLen + 1) != 0) return None
    val rows = data.length / (rowLen + 1)
    val out = new Array[Byte](rows * rowLen)
    val prior = new Array[Byte](rowLen)
    var r = 0
    while (r < rows) {
      val ft = data(r * (rowLen + 1)) & 0xff
      val src = r * (rowLen + 1) + 1
      val dst = r * rowLen
      var j = 0
      while (j < rowLen) {
        val raw = data(src + j) & 0xff
        val left = if (j >= bpp) out(dst + j - bpp) & 0xff else 0
        val up = prior(j) & 0xff
        val ul = if (j >= bpp) prior(j - bpp) & 0xff else 0
        val v = ft match {
          case 0 => raw
          case 1 => raw + left
          case 2 => raw + up
          case 3 => raw + (left + up) / 2
          case 4 => // Paeth
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
            raw + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
          case _ => return None
        }
        out(dst + j) = (v & 0xff).toByte
        j += 1
      }
      System.arraycopy(out, dst, prior, 0, rowLen)
      r += 1
    }
    Some(out)
  }

  private val nameRe = """/([A-Za-z0-9]+)""".r
  private val intRe = """-?\d+""".r

  private def parmInt(parms: String, key: String, dflt: Int): Int =
    dictValue(parms, key).flatMap(v => intRe.findFirstIn(v)).map(_.toInt).getOrElse(dflt)

  private def parmBool(parms: String, key: String, dflt: Boolean): Boolean =
    dictValue(parms, key).map(_.trim.startsWith("true")).getOrElse(dflt)

  /** Split an array-of-dicts /DecodeParms value into one dict string per
    * element (`null` elements become empty strings). */
  private def splitParms(v: String): Seq[String] = {
    val inner = v.trim.stripPrefix("[").stripSuffix("]")
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < inner.length) {
      val c = inner.charAt(i)
      if (c == '<' && i + 1 < inner.length && inner.charAt(i + 1) == '<') {
        var depth = 0; val start = i
        var j = i
        var end = -1
        while (j < inner.length - 1 && end < 0) {
          if (inner.charAt(j) == '<' && inner.charAt(j + 1) == '<') { depth += 1; j += 2 }
          else if (inner.charAt(j) == '>' && inner.charAt(j + 1) == '>') {
            depth -= 1; j += 2; if (depth == 0) end = j
          } else j += 1
        }
        out += inner.substring(start, if (end < 0) inner.length else end)
        i = if (end < 0) inner.length else end
      } else {
        if (inner.regionMatches(i, "null", 0, 4)) { out += ""; i += 4 }
        else i += 1
      }
    }
    out.toSeq
  }

  /** Decode a stream through its full /Filter chain (name or array), applying
    * /DecodeParms predictors to Flate/LZW stages. Unknown filters (DCT, JBIG2,
    * JPX, Crypt) return None → the caller's stub fallback. */
  private def decodedStream(o: Obj): Option[Array[Byte]] = o.stream.flatMap { raw =>
    val filterVal = dictValue(o.dict, "/Filter")
    val filters = filterVal.toSeq.flatMap(v => nameRe.findAllMatchIn(v).map(_.group(1)))
    if (filters.isEmpty) {
      if (o.dict.contains("/Filter")) None else Some(raw)
    } else {
      val parmsVal = dictValue(o.dict, "/DecodeParms")
        .orElse(dictValue(o.dict, "/DP")).getOrElse("")
      val parmsSeq: Seq[String] =
        if (parmsVal.trim.startsWith("[")) splitParms(parmsVal)
        else if (parmsVal.nonEmpty) Seq(parmsVal)
        else Seq.empty
      filters.zipWithIndex.foldLeft(Option(raw)) { case (acc, (f, idx)) =>
        acc.flatMap { d =>
          val parms = parmsSeq.lift(idx).getOrElse("")
          def predicted(dec: Option[Array[Byte]]): Option[Array[Byte]] =
            dec.flatMap(b => unpredict(b, parmInt(parms, "/Predictor", 1),
              parmInt(parms, "/Columns", 1), parmInt(parms, "/Colors", 1),
              parmInt(parms, "/BitsPerComponent", 8)))
          f match {
            case "FlateDecode" | "Fl"     => predicted(inflate(d))
            case "LZWDecode" | "LZW"      =>
              predicted(lzwDecode(d, parmInt(parms, "/EarlyChange", 1)))
            case "ASCIIHexDecode" | "AHx" => asciiHexDecode(d)
            case "ASCII85Decode" | "A85"  => ascii85Decode(d)
            case "RunLengthDecode" | "RL" => runLengthDecode(d)
            case _                        => None // DCT/JBIG2/JPX/Crypt: stub fallback
          }
        }
      }
    }
  }

  /** Black-pixel count of a decoded bi-level bitmap. */
  private def darkOf(bm: Jbig2.Bitmap): Long = {
    var n = 0L; var i = 0
    while (i < bm.bits.length) { if (bm.bits(i) != 0) n += 1; i += 1 }
    n
  }

  private def dictInt(dict: String, key: String): Int =
    dictValue(dict, key).flatMap(v =>
      """-?\d+""".r.findFirstIn(v.trim)).map(_.toInt).getOrElse(0)

  /** Decode one image XObject to its bitstream-authoritative dimensions.
    * /DCTDecode payloads (optionally behind Flate) go to the JDK JPEG codec;
    * raw bitmaps go through the standard filter chain and keep the dict
    * dims only when the payload length matches the declared geometry. */
  /** Unwrap the predecessor chain ahead of an image codec that sits LAST
    * in /Filter: only Flate predecessors are unwrappable, each with its
    * own /DecodeParms predictor applied per stage. Returns None for a
    * chain with a non-Flate predecessor — an unsupported CHAIN, distinct
    * from a codec decode failure — otherwise the payload (None when a
    * Flate stage failed) and the LAST filter's own parms dict (indexed
    * into an array-form /DecodeParms, so a predecessor's /Columns can
    * never shadow the codec's). */
  private def unwrapChain(o: Obj, filters: List[String]): Option[(Option[Array[Byte]], String)] = {
    if (filters.dropRight(1).exists(f => f != "FlateDecode" && f != "Fl")) return None
    val parmsVal = dictValue(o.dict, "/DecodeParms")
      .orElse(dictValue(o.dict, "/DP")).getOrElse("")
    val parmsSeq: Seq[String] =
      if (parmsVal.trim.startsWith("[")) splitParms(parmsVal)
      else if (parmsVal.nonEmpty) Seq(parmsVal)
      else Seq.empty
    val payload = filters.dropRight(1).zipWithIndex.foldLeft(o.stream) {
      case (acc, (_, idx)) => acc.flatMap { d =>
        val parms = parmsSeq.lift(idx).getOrElse("")
        inflate(d).flatMap(b => unpredict(b, parmInt(parms, "/Predictor", 1),
          parmInt(parms, "/Columns", 1), parmInt(parms, "/Colors", 1),
          parmInt(parms, "/BitsPerComponent", 8)))
      }
    }
    Some((payload, parmsSeq.lift(filters.length - 1).getOrElse("")))
  }

  private def imageOf(name: String, o: Obj, objs: Map[Int, Obj]): PdfImage = {
    val filters = dictValue(o.dict, "/Filter").toSeq
      .flatMap(v => nameRe.findAllMatchIn(v).map(_.group(1))).toList
    val dictW = dictInt(o.dict, "/Width")
    val dictH = dictInt(o.dict, "/Height")
    if (filters.lastOption.exists(f => f == "DCTDecode" || f == "DCT")) {
      unwrapChain(o, filters) match {
        case None => PdfImage(name, "unsupported", -1, -1)
        case Some((payload, _)) =>
          val dims =
            try payload.flatMap(b => Option(javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(b))))
              .map(i => (i.getWidth, i.getHeight))
            catch { case _: Exception => None }
          dims match {
            case Some((w, h)) => PdfImage(name, "dct", w, h)
            case None => PdfImage(name, "dct", -1, -1)
          }
      }
    } else if (filters.lastOption.contains("JBIG2Decode")) {
      unwrapChain(o, filters) match {
        case None => PdfImage(name, "unsupported", -1, -1)
        case Some((payload, parms)) =>
          // /JBIG2Globals N 0 R — a shared segment stream the embedded
          // stream's segments may refer into; parsed as its own segment
          // stream ahead of the image's per ISO 32000 §7.4.7
          val globals: Array[Byte] = (for {
            gv    <- dictValue(parms, "/JBIG2Globals")
            ref   <- refsIn(gv).headOption
            gobj  <- objs.get(ref)
            gdata <- decodedStream(gobj)
          } yield gdata).getOrElse(Array.emptyByteArray)
          payload.flatMap(Jbig2.decodeEmbedded(globals, _)) match {
            case Some(r) =>
              PdfImage(name, "jbig2", r.bitmap.width, r.bitmap.height, darkOf(r.bitmap))
            case None => PdfImage(name, "jbig2", -1, -1)
          }
      }
    } else if (filters.lastOption.exists(f => f == "CCITTFaxDecode" || f == "CCF")) {
      unwrapChain(o, filters) match {
        case None => PdfImage(name, "unsupported", -1, -1)
        case Some((payload, parms)) =>
          val k = parmInt(parms, "/K", 0)
          val columns = parmInt(parms, "/Columns", 1728)
          val rows = parmInt(parms, "/Rows", 0) match {
            case 0 => dictH // Rows unspecified: the image dict height
            case r => r
          }
          val byteAlign = parmBool(parms, "/EncodedByteAlign", dflt = false)
          val endOfLine = parmBool(parms, "/EndOfLine", dflt = false)
          payload.flatMap(Ccitt.decode(_, columns, rows, k, byteAlign, endOfLine)) match {
            case Some(bm) => PdfImage(name, "ccitt", bm.width, bm.height, darkOf(bm))
            case None => PdfImage(name, "ccitt", -1, -1)
          }
      }
    } else if (filters.lastOption.contains("JPXDecode")) {
      unwrapChain(o, filters) match {
        case None => PdfImage(name, "unsupported", -1, -1)
        case Some((payload, _)) =>
          payload.flatMap(Jpx.decode) match {
            case Some(d) =>
              var sum = 0L; var i = 0
              while (i < d.samples.length) { sum += d.samples(i); i += 1 }
              PdfImage(name, "jpx", d.width, d.height, sum)
            case None => PdfImage(name, "jpx", -1, -1)
          }
      }
    } else if (filters.exists(_ == "JPXDecode")) {
      PdfImage(name, "unsupported", -1, -1) // JPXDecode mid-chain: unwrappable
    } else {
      val bpc = math.max(1, dictInt(o.dict, "/BitsPerComponent") match {
        case 0 => 8; case b => b })
      val cs = dictValue(o.dict, "/ColorSpace").getOrElse("")
      val comps = if (cs.contains("RGB")) 3 else if (cs.contains("CMYK")) 4 else 1
      val expect = (dictW.toLong * dictH * comps * bpc + 7) / 8
      decodedStream(o) match {
        case Some(b) if dictW > 0 && dictH > 0 && b.length == expect =>
          PdfImage(name, "raw", dictW, dictH)
        case _ => PdfImage(name, "raw", -1, -1)
      }
    }
  }

  private val refRe = """(\d+)\s+\d+\s+R""".r

  private def refsIn(s: String): Seq[Int] =
    refRe.findAllMatchIn(s).map(_.group(1).toInt).toSeq

  /** The VALUE span of `key` only — bounded at the next top-level name
    * token or the dict's end, tracking array/dict nesting. (Returning the
    * raw remainder would let refsIn() capture refs belonging to the
    * FOLLOWING keys — /Parent, /Thumb, /Metadata — and feed e.g. a
    * thumbnail stream into the page-text scan.) */
  private def dictValue(dict: String, key: String): Option[String] = {
    val i = dict.indexOf(key)
    if (i < 0) return None
    var j = i + key.length
    val n = dict.length
    while (j < n && dict.charAt(j).isWhitespace) j += 1
    val start = j
    var depth = 0
    var first = true
    var k = j
    var end = -1
    while (k < n && end < 0) {
      val c = dict.charAt(k)
      if (c == '[') { depth += 1; first = false; k += 1 }
      else if (c == ']') {
        depth -= 1; k += 1
        if (depth <= 0 && start < n && dict.charAt(start) == '[') end = k
      }
      else if (c == '<' && k + 1 < n && dict.charAt(k + 1) == '<') { depth += 1; first = false; k += 2 }
      else if (c == '>' && k + 1 < n && dict.charAt(k + 1) == '>') {
        if (depth == 0) end = k else { depth -= 1; k += 2 }
      }
      else if (c == '/') {
        if (depth == 0 && !first) end = k else { first = false; k += 1 }
      }
      else { if (!c.isWhitespace) first = false; k += 1 }
    }
    if (end < 0) end = n
    Some(dict.substring(start, end))
  }

  // ---- fonts / ToUnicode ------------------------------------------------------

  /** What text extraction needs to know about one page font: whether show
    * strings carry 2-byte codes (Type0/Identity-H composite fonts) and the
    * /ToUnicode code → text mapping when present. */
  final case class FontInfo(twoByte: Boolean, toUni: Option[Map[Int, String]])

  /** Resolve a dict VALUE that is either inline `<< … >>` or an indirect
    * reference to a dict object. */
  private def resolveDictVal(v: String, objs: Map[Int, Obj]): Option[String] = {
    val t = v.trim
    if (t.startsWith("<<")) Some(t)
    else refsIn(t).headOption.flatMap(objs.get).map(_.dict)
  }

  private val fontRefRe = """/([^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R""".r

  /** Per-page font table from /Resources → /Font (either may be inline or a
    * reference). A font is two-byte when it is a /Subtype /Type0 composite
    * (the Identity-H encoding every CID generator emits); its /ToUnicode
    * CMap stream, when present, is parsed for code → Unicode mapping. */
  def fontsOf(pageDict: String, objs: Map[Int, Obj]): Map[String, FontInfo] = {
    val res = dictValue(pageDict, "/Resources").flatMap(resolveDictVal(_, objs))
    val fd = res.flatMap(dictValue(_, "/Font")).flatMap(resolveDictVal(_, objs))
    fd.toSeq.flatMap { d =>
      fontRefRe.findAllMatchIn(d).map { m =>
        val fobj = objs.get(m.group(2).toInt)
        // any Type0 composite is two-byte — including /Encoding naming a
        // PREDEFINED CMap (Identity-V, UniJIS-UCS2-H, …): without the CMap
        // resource we still decode the raw 2-byte CID codes under Identity
        // mapping (spec-correct for Identity-*, a documented approximation
        // for other predefined names) instead of stubbing the document
        val twoByte = fobj.exists(o =>
          o.dict.contains("/Type0") || o.dict.contains("Identity-H") ||
          o.dict.contains("Identity-V"))
        val toUni = fobj.flatMap(o => dictValue(o.dict, "/ToUnicode"))
          .flatMap(v => refsIn(v).headOption).flatMap(objs.get)
          .flatMap(decodedStream)
          .map(b => parseToUnicode(latin(b, 0, b.length)))
          .filter(_.nonEmpty)
        m.group(1) -> FontInfo(twoByte, toUni)
      }.toSeq
    }.toMap
  }

  private val cmapHexRe = """<([0-9a-fA-F\s]+)>""".r

  /** Parse a /ToUnicode CMap: `beginbfchar` pairs and `beginbfrange`
    * triples, with both destination forms (`<dst>` consecutive-increment
    * and `[<d0> <d1> …]` explicit). Destinations are UTF-16BE; range
    * increments apply to the destination's final code unit (§9.10.3). */
  def parseToUnicode(cmap: String): Map[Int, String] = {
    val out = scala.collection.mutable.Map.empty[Int, String]
    def utf16(hex: String): String = new String(
      PdfCrypt.StdSecurityHandler.hexBytes(hex),
      java.nio.charset.StandardCharsets.UTF_16BE)
    def codeOf(hex: String): Int =
      try java.lang.Long.parseLong(hex.filterNot(_.isWhitespace), 16).toInt
      catch { case _: Exception => -1 }
    for (m <- """(?s)beginbfchar(.*?)endbfchar""".r.findAllMatchIn(cmap)) {
      cmapHexRe.findAllMatchIn(m.group(1)).map(_.group(1)).grouped(2).foreach {
        case Seq(src, dst) if codeOf(src) >= 0 => out(codeOf(src)) = utf16(dst)
        case _ =>
      }
    }
    for (m <- """(?s)beginbfrange(.*?)endbfrange""".r.findAllMatchIn(cmap)) {
      val sec = m.group(1)
      // tokenize: hex strings and [ … ] arrays, in order
      val toks = scala.collection.mutable.ArrayBuffer.empty[Either[String, Seq[String]]]
      var i = 0
      while (i < sec.length) {
        sec.charAt(i) match {
          case '<' =>
            val c = sec.indexOf('>', i)
            if (c < 0) i = sec.length
            else { toks += Left(sec.substring(i + 1, c)); i = c + 1 }
          case '[' =>
            val c = sec.indexOf(']', i)
            if (c < 0) i = sec.length
            else {
              toks += Right(cmapHexRe.findAllMatchIn(sec.substring(i, c))
                .map(_.group(1)).toSeq)
              i = c + 1
            }
          case _ => i += 1
        }
      }
      var t = 0
      while (t + 1 < toks.length) {
        (toks(t), toks(t + 1), toks.lift(t + 2)) match {
          case (Left(loH), Left(hiH), Some(Left(dstH))) =>
            val lo = codeOf(loH); val hi = codeOf(hiH)
            val dst = utf16(dstH)
            if (lo >= 0 && hi >= lo && hi - lo < 65536 && dst.nonEmpty) {
              var k = 0
              while (k <= hi - lo) {
                val units = dst.toCharArray
                units(units.length - 1) = (units(units.length - 1) + k).toChar
                out(lo + k) = new String(units)
                k += 1
              }
            }
            t += 3
          case (Left(loH), Left(hiH), Some(Right(arr))) =>
            val lo = codeOf(loH); val hi = codeOf(hiH)
            if (lo >= 0 && hi >= lo)
              arr.zipWithIndex.foreach { case (d, k) =>
                if (lo + k <= hi) out(lo + k) = utf16(d)
              }
            t += 3
          case _ => t += 1
        }
      }
    }
    out.toMap
  }

  /** Decode one shown string's raw bytes through the current font: 2-byte
    * codes via /ToUnicode (Identity codepoint fallback), 1-byte codes via
    * /ToUnicode when present, Latin-1 otherwise (the classic simple-font
    * path). */
  private def decodeShown(bytes: Array[Byte], font: Option[FontInfo]): String =
    font match {
      case Some(f) if f.twoByte =>
        val sb = new StringBuilder
        var i = 0
        while (i + 1 < bytes.length) {
          val code = ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)
          sb ++= f.toUni.flatMap(_.get(code)).getOrElse(
            if (Character.isValidCodePoint(code)) new String(Character.toChars(code))
            else "")
          i += 2
        }
        if (i < bytes.length) sb += (bytes(i) & 0xff).toChar
        sb.toString
      case Some(f) if f.toUni.isDefined =>
        val m = f.toUni.get
        bytes.map(b => m.getOrElse(b & 0xff, (b & 0xff).toChar.toString)).mkString
      case _ =>
        new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    }

  private val tfRe = """/([^\s/<>\[\]()]+)\s+[\d.+-]+\s+Tf""".r

  /** Text of one content stream: literal/hex strings inside BT…ET, with
    * line breaks at the Td, TD, T-star, and quote operators. */
  def textOf(content: Array[Byte]): String = textOf(content, Map.empty)

  /** Font-aware variant: `Tf` operators switch the active [[FontInfo]] and
    * shown strings decode through it (2-byte CID codes, /ToUnicode). */
  def textOf(content: Array[Byte], fonts: Map[String, FontInfo]): String = {
    val s = latin(content, 0, content.length)
    val sb = new StringBuilder
    var i = 0
    var inText = false
    var lastShowStart = -1 // sb offset where the most recent string began
    var curFont: Option[FontInfo] = None
    var pendingName = ""
    def prevOpIs(j: Int, op: String): Boolean = s.regionMatches(j, op, 0, op.length)
    def show(raw: Array[Byte]): Unit = {
      lastShowStart = sb.length
      sb ++= decodeShown(raw, curFont)
    }
    while (i < s.length) {
      if (!inText) {
        val bt = s.indexOf("BT", i)
        if (bt < 0) i = s.length
        else {
          // text state persists across text objects — honor a Tf that was
          // issued between ET and the next BT
          if (fonts.nonEmpty)
            tfRe.findAllMatchIn(s.substring(i, bt)).toSeq.lastOption
              .foreach(m => curFont = fonts.get(m.group(1)))
          inText = true; i = bt + 2
        }
      } else s.charAt(i) match {
        case '(' => // literal string
          val (raw, next) = PdfCrypt.StdSecurityHandler.literalBytes(s, i)
          show(raw)
          i = next
        case '<' if i + 1 < s.length && s.charAt(i + 1) != '<' => // hex string
          val close = s.indexOf('>', i)
          if (close < 0) i = s.length
          else {
            show(PdfCrypt.StdSecurityHandler.hexBytes(s.substring(i + 1, close)))
            i = close + 1
          }
        case '/' => // name token — remembered for a following Tf
          var j = i + 1
          while (j < s.length && !s.charAt(j).isWhitespace &&
                 "/<>[]()".indexOf(s.charAt(j)) < 0) j += 1
          pendingName = s.substring(i + 1, j)
          i = j
        case 'E' if prevOpIs(i, "ET") => inText = false; i += 2
        case 'T' if prevOpIs(i, "Tf") =>
          curFont = fonts.get(pendingName)
          i += 2
        case 'T' if prevOpIs(i, "T*") || prevOpIs(i, "Td") || prevOpIs(i, "TD") =>
          if (sb.nonEmpty && sb.last != '\n') sb += '\n'
          i += 2
        case '\'' =>
          // quote = T* + Tj with the string BEFORE the operator: the line
          // break belongs in front of the just-shown string
          if (lastShowStart > 0 && lastShowStart <= sb.length &&
              sb.charAt(lastShowStart - 1) != '\n')
            sb.insert(lastShowStart, '\n')
          i += 1
        case _ => i += 1
      }
    }
    sb.toString.linesIterator.map(_.trim).filter(_.nonEmpty).mkString("\n")
  }

  /** First file ID from a trailer's `/ID [<…> <…>]` array (hex form — the
    * form every writer emits; it feeds MD5 so raw bytes are all we need). */
  private def idFirst(trailer: String): Array[Byte] = {
    val i = trailer.indexOf("/ID")
    if (i < 0) Array.emptyByteArray
    else cmapHexRe.findFirstMatchIn(trailer.substring(i))
      .map(m => PdfCrypt.StdSecurityHandler.hexBytes(m.group(1)))
      .getOrElse(Array.emptyByteArray)
  }

  /** Decrypt every top-level object's stream and dict strings in place. The
    * /Encrypt dict itself and xref streams are exempt (§7.6.2: never
    * encrypted); objects INSIDE object streams need nothing — their
    * container stream is what's encrypted. None = the document needs a
    * password we don't have, or an unsupported scheme → stub fallback. */
  private def decryptAll(scanned: Map[Int, Obj], trailer: String,
                         password: Array[Byte]): Option[Map[Int, Obj]] = {
    val encNum = """/Encrypt\s+(\d+)\s+\d+\s+R""".r
      .findFirstMatchIn(trailer).map(_.group(1).toInt).getOrElse(return None)
    val encObj = scanned.getOrElse(encNum, return None)
    val h = PdfCrypt.StdSecurityHandler
      .forDocument(encObj.dict, idFirst(trailer), password).getOrElse(return None)
    Some(scanned.map { case (num, o) =>
      val isXrefStm = o.dict.contains("/XRef")
      if (num == encNum || isXrefStm) num -> o
      else num -> Obj(num,
        PdfCrypt.decryptDictStrings(o.dict, num, 0, h),
        o.stream.map(s => try h.decrypt(num, 0, s) catch { case _: Exception => s }))
    })
  }

  /** Parse a full document. None when the bytes are not a PDF, the page
    * tree cannot be resolved, or the file is encrypted with a password the
    * caller didn't supply. `decodeImages = true` additionally runs the
    * embedded-image codecs ([[imageOf]]) — off by default so the shared
    * text-extraction hot path (crawl/seeder/q_pdf_pages) never pays JPEG
    * decode for image rows it discards. */
  def parse(bytes: Array[Byte],
            password: Array[Byte] = Array.emptyByteArray,
            decodeImages: Boolean = false): Option[Seq[Page]] = {
    if (bytes.length < 5 || latin(bytes, 0, 5) != "%PDF-") return None
    val objs = {
      val scanned0 =
        try scanObjects(bytes)
        catch { case _: Exception => return None }
      val xref = try readXref(bytes) catch { case _: Exception => None }
      // encryption: the newest trailer names /Encrypt; without an xref the
      // trailer keyword near EOF carries it
      val trailer = xref.map(_.trailer).filter(_.contains("/Encrypt")).orElse {
        val s = latin(bytes, math.max(0, bytes.length - 4096), bytes.length)
        val t = s.lastIndexOf("trailer")
        if (t >= 0) Some(s.substring(t)) else None
      }
      val scanned = trailer.filter(_.contains("/Encrypt")) match {
        case Some(tr) => decryptAll(scanned0, tr, password) match {
          case Some(dec) => dec
          case None      => return None
        }
        case None => scanned0
      }
      // unpack every object stream (xref type-2 targets plus any scanned
      // /ObjStm); top-level definitions win on collision, except where the
      // xref explicitly places the live object inside a stream
      val stmNums = xref.map(_.inStreams.values.map(_._1).toSet).getOrElse(Set.empty) ++
        scanned.values.filter(_.dict.contains("/ObjStm")).map(_.num)
      val fromStms = stmNums.toSeq.sorted.flatMap(n => scanned.get(n))
        .flatMap(o => try objStmObjects(o) catch { case _: Exception => Map.empty[Int, Obj] })
        .toMap
      val merged = fromStms ++ scanned
      xref match {
        case Some(x) =>
          merged ++ x.inStreams.keys.flatMap(n => fromStms.get(n).map(n -> _))
        case None => merged
      }
    }
    if (objs.isEmpty) return None

    def isPage(o: Obj) =
      (o.dict.contains("/Type /Page") || o.dict.contains("/Type/Page")) &&
        !o.dict.contains("/Type /Pages") && !o.dict.contains("/Type/Pages")

    // page order: /Pages → /Kids when present, else document order
    val pagesObj = objs.values.find(o =>
      o.dict.contains("/Type /Pages") || o.dict.contains("/Type/Pages"))
    val kidOrder = pagesObj.flatMap(o => dictValue(o.dict, "/Kids")).map(refsIn)
      .getOrElse(Seq.empty)
    val pageObjs0 = objs.values.filter(isPage).toSeq.sortBy(_.num)
    val pageObjs =
      if (kidOrder.nonEmpty) kidOrder.flatMap(objs.get).filter(isPage)
      else pageObjs0
    if (pageObjs.isEmpty) return None

    val pages = pageObjs.map { p =>
      val contentRefs = dictValue(p.dict, "/Contents").map(refsIn)
        .getOrElse(Seq.empty)
      val fonts = try fontsOf(p.dict, objs) catch { case _: Exception => Map.empty[String, FontInfo] }
      val text = contentRefs.flatMap(objs.get).flatMap(decodedStream)
        .map(textOf(_, fonts)).filter(_.nonEmpty).mkString("\n")
      // images: /Resources /XObject refs that are /Subtype /Image —
      // counted AND decoded (bitstream-authoritative dims, see PdfImage)
      val xobjRefs = dictValue(p.dict, "/XObject").map(refsIn)
        .getOrElse(Seq.empty)
      val imageObjs = xobjRefs.flatMap(objs.get).filter(o =>
        o.dict.contains("/Subtype /Image") || o.dict.contains("/Subtype/Image"))
      val images =
        if (!decodeImages) Nil
        else imageObjs.zipWithIndex.map { case (o, i) =>
          try imageOf(s"Im$i", o, objs)
          catch { case _: Exception => PdfImage(s"Im$i", "error", -1, -1) }
        }
      val nImages = imageObjs.size
      // links: /Annots → /URI ( … )
      val annotRefs = dictValue(p.dict, "/Annots").map(refsIn)
        .getOrElse(Seq.empty)
      val uriRe = """/URI\s*\(([^)]*)\)""".r
      val links = annotRefs.flatMap(objs.get).flatMap(o =>
        uriRe.findAllMatchIn(o.dict).map(_.group(1)).toSeq)
      Page(text, nImages, links, images)
    }
    Some(pages)
  }
}
