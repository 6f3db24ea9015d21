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
  *  - streams raw or /FlateDecode (java.util.zip.Inflater — in the JDK);
  *  - page tree via /Root → /Pages → /Kids (document order fallback);
  *  - text from BT…ET blocks: `(…) Tj`, quote, `[…] TJ` with literal-string
  *    escapes (backslash, parens, n/r/t, octal) and hex strings; the Td, TD,
  *    T-star, and quote operators start a new line;
  *  - per-page image counts via /Resources /XObject → /Subtype /Image;
  *  - links via /Annots → /URI.
  *
  * Out of scope (returns what it can, never throws): CID/Type0 composite
  * fonts, encrypted files, non-Flate filters — those fall back to the
  * deterministic stub kernel in [[Pdf]].
  */
object PdfParse {

  final case class Obj(num: Int, dict: String, stream: Option[Array[Byte]])
  final case class Page(text: String, nImages: Int, links: Seq[String])

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

  private def decodedStream(o: Obj): Option[Array[Byte]] = o.stream.flatMap { raw =>
    if (o.dict.contains("FlateDecode")) inflate(raw)
    else if (o.dict.contains("/Filter")) None // unsupported filter
    else Some(raw)
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

  /** Text of one content stream: literal/hex strings inside BT…ET, with
    * line breaks at the Td, TD, T-star, and quote operators. */
  def textOf(content: Array[Byte]): String = {
    val s = latin(content, 0, content.length)
    val sb = new StringBuilder
    var i = 0
    var inText = false
    var lastShowStart = -1 // sb offset where the most recent string began
    def prevOpIs(j: Int, op: String): Boolean = s.regionMatches(j, op, 0, op.length)
    while (i < s.length) {
      if (!inText) {
        val bt = s.indexOf("BT", i)
        if (bt < 0) i = s.length
        else { inText = true; i = bt + 2 }
      } else s.charAt(i) match {
        case '(' => // literal string
          lastShowStart = sb.length
          i += 1
          var depth = 1
          while (i < s.length && depth > 0) {
            s.charAt(i) match {
              case '\\' if i + 1 < s.length =>
                s.charAt(i + 1) match {
                  case 'n' => sb += '\n'; i += 2
                  case 'r' => sb += '\r'; i += 2
                  case 't' => sb += '\t'; i += 2
                  case 'b' => sb += '\b'; i += 2
                  case 'f' => sb += '\f'; i += 2
                  case '(' => sb += '('; i += 2
                  case ')' => sb += ')'; i += 2
                  case '\\' => sb += '\\'; i += 2
                  case d if d >= '0' && d <= '7' =>
                    var code = 0; var k = 0
                    i += 1
                    while (k < 3 && i < s.length && s.charAt(i) >= '0' && s.charAt(i) <= '7') {
                      code = code * 8 + (s.charAt(i) - '0'); i += 1; k += 1
                    }
                    sb += code.toChar
                  case _ => i += 1 // line continuation etc.
                }
              case '(' => depth += 1; sb += '('; i += 1
              case ')' =>
                depth -= 1
                if (depth > 0) sb += ')'
                i += 1
              case c => sb += c; i += 1
            }
          }
        case '<' if i + 1 < s.length && s.charAt(i + 1) != '<' => // hex string
          lastShowStart = sb.length
          val close = s.indexOf('>', i)
          if (close < 0) i = s.length
          else {
            val hex = s.substring(i + 1, close).filterNot(_.isWhitespace)
            val padded = if (hex.length % 2 == 1) hex + "0" else hex
            padded.grouped(2).foreach { h =>
              try sb += Integer.parseInt(h, 16).toChar catch { case _: Exception => }
            }
            i = close + 1
          }
        case 'E' if prevOpIs(i, "ET") => inText = false; i += 2
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

  /** Parse a full document. None when the bytes are not a PDF or the page
    * tree cannot be resolved. */
  def parse(bytes: Array[Byte]): Option[Seq[Page]] = {
    if (bytes.length < 5 || latin(bytes, 0, 5) != "%PDF-") return None
    val objs = {
      val scanned =
        try scanObjects(bytes)
        catch { case _: Exception => return None }
      val xref = try readXref(bytes) catch { case _: Exception => None }
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
      val text = contentRefs.flatMap(objs.get).flatMap(decodedStream)
        .map(textOf).filter(_.nonEmpty).mkString("\n")
      // image count: /Resources /XObject refs that are /Subtype /Image
      val xobjRefs = dictValue(p.dict, "/XObject").map(refsIn)
        .getOrElse(Seq.empty)
      val nImages = xobjRefs.flatMap(objs.get).count(o =>
        o.dict.contains("/Subtype /Image") || o.dict.contains("/Subtype/Image"))
      // links: /Annots → /URI ( … )
      val annotRefs = dictValue(p.dict, "/Annots").map(refsIn)
        .getOrElse(Seq.empty)
      val uriRe = """/URI\s*\(([^)]*)\)""".r
      val links = annotRefs.flatMap(objs.get).flatMap(o =>
        uriRe.findAllMatchIn(o.dict).map(_.group(1)).toSeq)
      Page(text, nImages, links)
    }
    Some(pages)
  }
}
