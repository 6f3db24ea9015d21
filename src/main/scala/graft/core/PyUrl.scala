package graft.core

import java.nio.charset.StandardCharsets

/** Minimal re-implementation of the public `urllib.parse` semantics that the
  * reference's URL normalizers are built on (see /root/reference/crawl4ai/
  * utils.py:2122-2253). Pure functions, no I/O — safe inside codegen'd UDFs.
  *
  * Only the subset the crawl engine needs: urlparse/urlunparse, RFC-3986
  * reference resolution (urljoin), percent-(de/en)coding with Python's
  * default `safe` sets, and query-string split/encode.
  */
object PyUrl {

  /** urlparse equivalent (params collapsed into path — the engine never uses
    * `;`-params, and both normalizers pass them through untouched).
    */
  final case class Parts(scheme: String, netloc: String, path: String,
                         query: String, fragment: String) {
    def unparse: String = {
      val sb = new StringBuilder
      if (scheme.nonEmpty) { sb ++= scheme; sb += ':' }
      if (netloc.nonEmpty || (path.startsWith("//")) || scheme.nonEmpty) {
        // python urlunparse emits '//' when netloc present OR url had authority
        if (netloc.nonEmpty) { sb ++= "//"; sb ++= netloc }
      }
      sb ++= path
      if (query.nonEmpty) { sb += '?'; sb ++= query }
      if (fragment.nonEmpty) { sb += '#'; sb ++= fragment }
      sb.toString
    }
  }

  private def isSchemeChar(c: Char): Boolean =
    c.isLetterOrDigit || c == '+' || c == '-' || c == '.'

  def parse(url: String): Parts = {
    var rest = url
    var fragment = ""
    val hash = rest.indexOf('#')
    if (hash >= 0) { fragment = rest.substring(hash + 1); rest = rest.substring(0, hash) }
    var scheme = ""
    val colon = rest.indexOf(':')
    if (colon > 0 && rest.charAt(0).isLetter && rest.substring(1, colon).forall(isSchemeChar)) {
      scheme = rest.substring(0, colon).toLowerCase
      rest = rest.substring(colon + 1)
    }
    var netloc = ""
    if (rest.startsWith("//")) {
      var i = 2
      while (i < rest.length && rest.charAt(i) != '/' && rest.charAt(i) != '?' && rest.charAt(i) != '#') i += 1
      netloc = rest.substring(2, i)
      rest = rest.substring(i)
    }
    var query = ""
    val qm = rest.indexOf('?')
    if (qm >= 0) { query = rest.substring(qm + 1); rest = rest.substring(0, qm) }
    Parts(scheme, netloc, rest, query, fragment)
  }

  /** RFC 3986 §5.2.4 remove_dot_segments (Python urljoin discards leading
    * `..` above root the same way).
    */
  def removeDotSegments(path: String): String = {
    if (path.isEmpty) return path
    val segs = path.split("/", -1)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val absolute = path.startsWith("/")
    var i = 0
    while (i < segs.length) {
      val s = segs(i)
      s match {
        case "." => // drop; trailing handled below
        case ".." => if (out.nonEmpty && out.last != "..") out.remove(out.length - 1)
                     else if (!absolute) out += ".."
        case other => out += other
      }
      i += 1
    }
    // restore trailing slash if last segment was . or .. or empty
    val trailing = segs.last == "." || segs.last == ".." || segs.last.isEmpty
    val body = out.mkString("/")
    val prefix = if (absolute) "/" else ""
    val joined = prefix + (if (absolute && body.startsWith("/")) body.drop(1) else body)
    if (trailing && !joined.endsWith("/")) joined + "/" else joined
  }

  /** Python `urllib.parse.urljoin` for http(s) URLs. */
  def urljoin(base: String, ref: String): String = {
    if (ref.isEmpty) return base
    if (base.isEmpty) return ref
    val b = parse(base)
    val r = parse(ref)
    if (r.scheme.nonEmpty && r.scheme != b.scheme) return ref
    val scheme = if (r.scheme.nonEmpty) r.scheme else b.scheme
    if (r.scheme.nonEmpty && r.netloc.nonEmpty)
      return Parts(scheme, r.netloc, removeDotSegments(r.path), r.query, r.fragment).unparse
    if (r.netloc.nonEmpty)
      return Parts(scheme, r.netloc, removeDotSegments(r.path), r.query, r.fragment).unparse
    if (r.path.isEmpty) {
      val q = if (r.query.nonEmpty) r.query else b.query
      return Parts(scheme, b.netloc, b.path, q, r.fragment).unparse
    }
    val mergedPath =
      if (r.path.startsWith("/")) removeDotSegments(r.path)
      else {
        val basePath =
          if (b.netloc.nonEmpty && b.path.isEmpty) "/"
          else b.path.substring(0, b.path.lastIndexOf('/') + 1)
        removeDotSegments(basePath + r.path)
      }
    Parts(scheme, b.netloc, mergedPath, r.query, r.fragment).unparse
  }

  private val hex = "0123456789ABCDEF"

  /** Python `quote(s, safe='/')`: never encodes unreserved (alnum `_.-~`) or safe chars. */
  def quote(s: String, safe: String = "/"): String = {
    val bytes = s.getBytes(StandardCharsets.UTF_8)
    val sb = new StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      val c = b.toChar
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
          c == '_' || c == '.' || c == '-' || c == '~' || safe.indexOf(c) >= 0)
        sb += c
      else { sb += '%'; sb += hex(b >> 4); sb += hex(b & 0xf) }
      i += 1
    }
    sb.toString
  }

  /** Python `quote_plus`: like quote(safe='') but space → '+'. */
  def quotePlus(s: String): String = {
    if (s.indexOf(' ') < 0) quote(s, "")
    else quote(s, " ").replace(' ', '+')
  }

  /** Python `unquote`: %XX → bytes → UTF-8 (invalid sequences → U+FFFD like Python). */
  def unquote(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val out = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length && isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        out.write(Integer.parseInt(s.substring(i + 1, i + 3), 16))
        i += 3
      } else {
        val bs = c.toString.getBytes(StandardCharsets.UTF_8)
        out.write(bs, 0, bs.length)
        i += 1
      }
    }
    new String(out.toByteArray, StandardCharsets.UTF_8)
  }

  /** Python `unquote_plus`: '+' → ' ' then unquote. */
  def unquotePlus(s: String): String = unquote(s.replace('+', ' '))

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  /** Python `parse_qsl(query, keep_blank_values=...)`. Splits on '&' only (py3.10+). */
  def parseQsl(query: String, keepBlank: Boolean): Seq[(String, String)] = {
    if (query.isEmpty) return Nil
    query.split("&", -1).toIndexedSeq.flatMap { pair =>
      if (pair.isEmpty) None
      else {
        val eq = pair.indexOf('=')
        val (k, v) = if (eq >= 0) (pair.substring(0, eq), pair.substring(eq + 1)) else (pair, "")
        if (v.isEmpty && !keepBlank) None
        else Some((unquotePlus(k), unquotePlus(v)))
      }
    }
  }

  /** Python `urlencode(params, doseq=True)` over a (k,v) sequence. */
  def urlencode(params: Seq[(String, String)]): String =
    params.map { case (k, v) => quotePlus(k) + "=" + quotePlus(v) }.mkString("&")
}
