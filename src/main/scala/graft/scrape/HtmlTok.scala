package graft.scrape

/** Tolerant streaming HTML tokenizer. The engine defines and generates its
  * own synthetic corpus (FIXTURES.md §2), so the grammar subset is closed,
  * but the tokenizer is written defensively: unclosed tags, bare attributes,
  * comments, and the common entities all parse.
  *
  * Produces a flat event stream; tree semantics (skip-subtrees, block
  * boundaries) live in [[Scrape]].
  */
object HtmlTok {

  sealed trait Tok
  final case class Open(tag: String, attrs: Map[String, String], selfClosing: Boolean) extends Tok
  final case class Close(tag: String) extends Tok
  final case class Text(s: String) extends Tok

  private val voidTags = Set("img", "br", "hr", "input", "meta", "link", "source", "area", "base", "col", "embed", "track", "wbr")

  def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val ent = s.substring(i + 1, semi)
          val rep: String = ent match {
            case "amp" => "&"
            case "lt" => "<"
            case "gt" => ">"
            case "quot" => "\""
            case "apos" => "'"
            case "nbsp" => " "
            case e if e.startsWith("#x") || e.startsWith("#X") =>
              try new String(Character.toChars(Integer.parseInt(e.substring(2), 16))) catch { case _: Exception => null }
            case e if e.startsWith("#") =>
              try new String(Character.toChars(Integer.parseInt(e.substring(1)))) catch { case _: Exception => null }
            case _ => null
          }
          if (rep != null) { sb ++= rep; i = semi + 1 }
          else { sb += c; i += 1 }
        } else { sb += c; i += 1 }
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  /** Tokenize; raw text of <script>/<style> is consumed as a single Text
    * token (their content must never leak into spans).
    *
    * `keepWhitespaceText = true` also emits whitespace-only text nodes —
    * required by the markdown generator, whose inter-element spacing model
    * (space-pending flag) depends on seeing them; the span scraper drops
    * them (its own buffer collapse makes them irrelevant).
    */
  def tokenize(html: String): Iterator[Tok] = tokenize(html, keepWhitespaceText = false)

  def tokenize(html: String, keepWhitespaceText: Boolean): Iterator[Tok] = new Iterator[Tok] {
    private var pos = 0
    private var pending: Tok = _
    private var rawMode: String = null // inside script/style: scan to closing tag
    private lazy val lowerHtml = html.toLowerCase // computed once, raw-mode scans only

    advance()

    private def advance(): Unit = {
      pending = null
      while (pending == null && pos < html.length) {
        if (rawMode != null) {
          val closeIdx = lowerHtml.indexOf("</" + rawMode, pos)
          val end = if (closeIdx < 0) html.length else closeIdx
          val tag = rawMode
          // swallow raw content silently, then emit the close
          pos = end
          rawMode = null
          if (closeIdx >= 0) {
            val gt = html.indexOf('>', pos)
            pos = if (gt < 0) html.length else gt + 1
            pending = Close(tag)
          }
        } else if (html.charAt(pos) == '<') {
          if (html.startsWith("<!--", pos)) {
            val end = html.indexOf("-->", pos + 4)
            pos = if (end < 0) html.length else end + 3
          } else if (html.startsWith("<!", pos) || html.startsWith("<?", pos)) {
            val end = html.indexOf('>', pos)
            pos = if (end < 0) html.length else end + 1
          } else if (html.startsWith("</", pos)) {
            val end = html.indexOf('>', pos)
            if (end < 0) { pos = html.length }
            else {
              val tag = html.substring(pos + 2, end).trim.toLowerCase
              pos = end + 1
              pending = Close(tag)
            }
          } else {
            val end = html.indexOf('>', pos)
            if (end < 0) { pos = html.length }
            else {
              val inner0 = html.substring(pos + 1, end)
              val selfClose = inner0.endsWith("/")
              val inner = if (selfClose) inner0.dropRight(1) else inner0
              pos = end + 1
              val sp = inner.indexWhere(Character.isWhitespace)
              val tag = (if (sp < 0) inner else inner.substring(0, sp)).toLowerCase
              val attrs = if (sp < 0) Map.empty[String, String] else parseAttrs(inner.substring(sp))
              if (tag.nonEmpty && tag.head.isLetter) {
                if ((tag == "script" || tag == "style") && !selfClose) rawMode = tag
                pending = Open(tag, attrs, selfClose || voidTags.contains(tag))
              }
            }
          }
        } else {
          val next = html.indexOf('<', pos)
          val end = if (next < 0) html.length else next
          val raw = html.substring(pos, end)
          pos = end
          if (keepWhitespaceText || raw.exists(!Character.isWhitespace(_)))
            pending = Text(decodeEntities(raw))
        }
      }
    }

    override def hasNext: Boolean = pending != null
    override def next(): Tok = { val t = pending; advance(); t }
  }

  def parseAttrs(s: String): Map[String, String] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
      if (i < n) {
        val nameStart = i
        while (i < n && !Character.isWhitespace(s.charAt(i)) && s.charAt(i) != '=') i += 1
        val name = s.substring(nameStart, i).toLowerCase
        while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
        if (i < n && s.charAt(i) == '=') {
          i += 1
          while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
          if (i < n && (s.charAt(i) == '"' || s.charAt(i) == '\'')) {
            val q = s.charAt(i); i += 1
            val vStart = i
            while (i < n && s.charAt(i) != q) i += 1
            if (name.nonEmpty) m(name) = decodeEntities(s.substring(vStart, i))
            if (i < n) i += 1
          } else {
            val vStart = i
            while (i < n && !Character.isWhitespace(s.charAt(i))) i += 1
            if (name.nonEmpty) m(name) = decodeEntities(s.substring(vStart, i))
          }
        } else if (name.nonEmpty) m(name) = ""
      }
    }
    m.toMap
  }

  /** Collapse runs of whitespace to single spaces, trim. */
  def normSpace(s: String): String = s.replaceAll("\\s+", " ").trim
}
