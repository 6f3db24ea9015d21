package graft

/** Shared test-side PDF builders (used by PdfSpec, PdfCryptSpec,
  * PdfFontSpec): a minimal valid-enough classic-layout writer — no xref;
  * the parser scans objects like every repair-mode reader.
  */
object PdfFixtures {

  /** One content stream per page; optional Flate compression, one image
    * XObject and one /Annots URI on the first page. */
  def buildPdf(pageContents: Seq[String], compress: Boolean,
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

  /** A simple-font text block: each line shown with Tj + T*. */
  def bt(lines: String*): String =
    "BT /F1 12 Tf 72 720 Td " +
      lines.map(l => s"($l) Tj T*").mkString(" ") + " ET"

  import graft.sources.{PdfCrypt, PdfParse}
  import graft.sources.PdfCrypt.StdSecurityHandler.{hexBytes, literalBytes}

  val id0: Array[Byte] = Array.tabulate(16)(i => ((i * 17 + 3) & 0xff).toByte)
  private def hexs(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02x").mkString
  def ivFor(num: Int): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("MD5")
    java.util.Arrays.copyOf(d.digest(s"iv$num".getBytes("US-ASCII")), 16)
  }

  /** Re-emit `dict` with every string token encrypted (hex form). */
  def encryptStringsInDict(dict: String, enc: Array[Byte] => Array[Byte]): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < dict.length) {
      val c = dict.charAt(i)
      if (c == '(') {
        val (raw, next) = literalBytes(dict, i)
        sb ++= PdfCrypt.emitString(enc(raw)); i = next
      } else if (c == '<' && i + 1 < dict.length && dict.charAt(i + 1) == '<') {
        sb ++= "<<"; i += 2 // dict open — NOT a hex string
      } else if (c == '>' && i + 1 < dict.length && dict.charAt(i + 1) == '>') {
        sb ++= ">>"; i += 2
      } else if (c == '<' && i + 1 < dict.length) {
        val close = dict.indexOf('>', i)
        if (close < 0) { sb += c; i += 1 }
        else { sb ++= PdfCrypt.emitString(enc(hexBytes(dict.substring(i + 1, close)))); i = close + 1 }
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  /** Encrypt a scan-parseable plaintext PDF: every top-level object's
    * stream and dict strings, an /Encrypt dict appended, trailer keyword
    * carrying /Encrypt + /ID (xref-stream objects are dropped — their byte
    * offsets are stale after re-serialization and §7.6.2 exempts them from
    * encryption anyway). /O is the REAL Algorithm 3 value (R6: the real
    * owner hash + /OE key wrap), so the parser's owner-password path is
    * exercised against spec-faithful entries; an empty `ownerPassword`
    * falls back to the user password per Algorithm 3 step (a). */
  def encryptPdf(plain: Array[Byte], variant: String,
                 password: Array[Byte] = Array.emptyByteArray,
                 ownerPassword: Array[Byte] = Array.emptyByteArray): Array[Byte] = {
    val objs = PdfParse.scanObjects(plain).toSeq.sortBy(_._1)
    val encNum = objs.map(_._1).max + 1
    val p = -44

    val (encDict, encFn): (String, (Int, Array[Byte]) => Array[Byte]) = variant match {
      case "rc4-40" =>
        val oVal = PdfCrypt.computeO(ownerPassword, password, r = 2, lengthBits = 40)
        val key = PdfCrypt.fileKeyClassic(password, oVal, p, id0, r = 2, lengthBits = 40)
        val u = PdfCrypt.computeU(key, id0, 2)
        (s"<< /Filter /Standard /V 1 /R 2 /P $p /O <${hexs(oVal)}> /U <${hexs(u)}> >>",
          (n, d) => PdfCrypt.rc4(PdfCrypt.objectKey(key, n, 0, aes = false), d))
      case "rc4-128" =>
        val oVal = PdfCrypt.computeO(ownerPassword, password, r = 3, lengthBits = 128)
        val key = PdfCrypt.fileKeyClassic(password, oVal, p, id0, r = 3, lengthBits = 128)
        val u = PdfCrypt.computeU(key, id0, 3)
        (s"<< /Filter /Standard /V 2 /R 3 /Length 128 /P $p /O <${hexs(oVal)}> /U <${hexs(u)}> >>",
          (n, d) => PdfCrypt.rc4(PdfCrypt.objectKey(key, n, 0, aes = false), d))
      case "aes-128" =>
        val oVal = PdfCrypt.computeO(ownerPassword, password, r = 4, lengthBits = 128)
        val key = PdfCrypt.fileKeyClassic(password, oVal, p, id0, r = 4, lengthBits = 128)
        val u = PdfCrypt.computeU(key, id0, 4)
        (s"<< /Filter /Standard /V 4 /R 4 /Length 128 /P $p /O <${hexs(oVal)}> /U <${hexs(u)}> " +
          "/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> /StmF /StdCF /StrF /StdCF >>",
          (n, d) => PdfCrypt.aesEncrypt(PdfCrypt.objectKey(key, n, 0, aes = true), ivFor(n), d))
      case "aes-256" =>
        val fileKey = Array.tabulate(32)(i => ((i * 53 + 11) & 0xff).toByte)
        val vSalt = Array.tabulate(8)(i => (i + 1).toByte)
        val kSalt = Array.tabulate(8)(i => (i + 101).toByte)
        val oVSalt = Array.tabulate(8)(i => (i + 51).toByte)
        val oKSalt = Array.tabulate(8)(i => (i + 151).toByte)
        val pw = java.util.Arrays.copyOf(password, math.min(password.length, 127))
        val opw0 = if (ownerPassword.isEmpty) password else ownerPassword
        val opw = java.util.Arrays.copyOf(opw0, math.min(opw0.length, 127))
        val u = PdfCrypt.hash2B(pw, vSalt) ++ vSalt ++ kSalt
        val ue = PdfCrypt.aesCbcNoPad(encrypt = true,
          PdfCrypt.hash2B(pw, kSalt), new Array[Byte](16), fileKey)
        val oVal = PdfCrypt.hash2B(opw, oVSalt, u) ++ oVSalt ++ oKSalt
        val oe = PdfCrypt.aesCbcNoPad(encrypt = true,
          PdfCrypt.hash2B(opw, oKSalt, u), new Array[Byte](16), fileKey)
        (s"<< /Filter /Standard /V 5 /R 6 /Length 256 /P $p /O <${hexs(oVal)}> /U <${hexs(u)}> " +
          s"/UE <${hexs(ue)}> /OE <${hexs(oe)}> " +
          "/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> /StmF /StdCF /StrF /StdCF >>",
          (n, d) => PdfCrypt.aesEncrypt(fileKey, ivFor(n), d))
      case other => throw new IllegalArgumentException(s"unknown variant $other")
    }

    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.6\n")
    objs.foreach { case (num, o) =>
      if (!o.dict.contains("/XRef")) {
        val dict2 = encryptStringsInDict(o.dict, encFn(num, _)).trim
        o.stream match {
          case Some(data) =>
            val edata = encFn(num, data)
            val dict3 = dict2.replaceAll("""/Length\s+\d+""", s"/Length ${edata.length}")
            w(s"$num 0 obj\n$dict3\nstream\n"); out.write(edata); w("\nendstream\nendobj\n")
          case None =>
            w(s"$num 0 obj\n$dict2\nendobj\n")
        }
      }
    }
    w(s"$encNum 0 obj\n$encDict\nendobj\n")
    w(s"trailer\n<< /Size ${encNum + 1} /Root 1 0 R /Encrypt $encNum 0 R " +
      s"/ID [<${hexs(id0)}> <${hexs(id0)}>] >>\n%%EOF\n")
    out.toByteArray
  }

}
