package graft.scrape

import graft.core.PyUrl
import scala.collection.mutable.ArrayBuffer

/** HTML → markdown with html2text fidelity — the string-emission semantics of
  * the reference's markdown pipeline (/root/reference/crawl4ai/
  * markdown_generation_strategy.py:178-214 driving the vendored html2text
  * package with body_width=0, single_line_break, inline links, and the
  * CustomHTML2Text pre/code overrides, crawl4ai/html2text/__init__.py:
  * 1035-1150). Behavior re-derived from the PUBLIC html2text library's
  * emission rules and pinned by goldens captured from the reference converter
  * (MarkdownSpec).
  *
  * Emission summary: `#`-headings, `  * ` / `  1. ` list items (nested
  * indentation per CommonMark), `_em_` / `**strong**` / `~~del~~` emphasis,
  * backtick inline code, ``` fenced pre blocks, `> ` blockquotes, `* * *`
  * rules, `[text](url "title")` inline links with `<url>` automatic links,
  * `![alt](src)` images, pipe-delimited table rows with a `---|---` header
  * underline, one newline between blocks (single_line_break), whitespace
  * collapsed with a pending-space flag.
  *
  * Pure per-row string function: runs inside a typed `Dataset.map`, no
  * shuffle, no driver involvement.
  */
object Html2Md {

  def convert(html: String, baseUrl: String = ""): String = {
    val h = new Html2Md(baseUrl)
    HtmlTok.tokenize(html, keepWhitespaceText = true).foreach {
      case HtmlTok.Open(tag, attrs, selfClosing) =>
        h.handleTag(tag, attrs, isStart = true)
        // explicitly self-closed non-void tags get an immediate close event
        if (selfClosing && !voidTags.contains(tag)) h.handleTag(tag, Map.empty, isStart = false)
      case HtmlTok.Close(tag) => h.handleTag(tag, Map.empty, isStart = false)
      case HtmlTok.Text(s) => h.handleData(s)
    }
    // strategy-level post-step (markdown_generation_strategy.py:214)
    h.finish().replace("    ```", "```")
  }

  private val voidTags = Set("img", "br", "hr", "input", "meta", "link",
    "source", "area", "base", "col", "embed", "track", "wbr")

  /** The cleaned_html content source: strip `<script>/<style>/<noscript>`,
    * `<head>`, and `display:none` subtrees before conversion (the reference
    * scraping strategy's element pruning, content_scraping_strategy.py:
    * 598-843, reduced to the pieces that affect markdown emission). Pure
    * string → string; tolerant of unclosed tags like the tokenizer itself.
    */
  def cleaned(html: String): String = {
    val dropTags = Set("script", "style", "noscript", "head")
    val sb = new StringBuilder(html.length)
    var skipDepth = 0 // >0: inside a dropped subtree
    var skipStack = List.empty[String]
    def attrStr(attrs: Map[String, String]): String =
      attrs.map { case (k, v) =>
        if (v.isEmpty) s" $k"
        else s""" $k="${v.replace("&", "&amp;").replace("\"", "&quot;")}""""
      }.mkString
    HtmlTok.tokenize(html, keepWhitespaceText = true).foreach {
      case HtmlTok.Open(tag, attrs, selfClosing) =>
        val hidden = attrs.get("style")
          .exists(_.replaceAll("\\s", "").toLowerCase.contains("display:none"))
        if (tag == "body") { // an unclosed <head> must never swallow the body
          skipDepth = 0; skipStack = Nil
          sb ++= s"<body${attrStr(attrs)}>"
        } else if (skipDepth > 0) {
          if (!selfClosing && !voidTags.contains(tag)) { skipDepth += 1; skipStack = tag :: skipStack }
        } else if (dropTags.contains(tag) || hidden) {
          if (!selfClosing && !voidTags.contains(tag)) { skipDepth = 1; skipStack = tag :: Nil }
        } else {
          sb ++= s"<$tag${attrStr(attrs)}${if (selfClosing && !voidTags.contains(tag)) "/" else ""}>"
        }
      case HtmlTok.Close(tag) =>
        if (skipDepth > 0) {
          // tolerant: any close matching a frame in the skip stack pops to it
          val idx = skipStack.indexOf(tag)
          if (idx >= 0) { skipDepth -= (idx + 1); skipStack = skipStack.drop(idx + 1) }
        } else sb ++= s"</$tag>"
      case HtmlTok.Text(s) =>
        if (skipDepth == 0)
          sb ++= s.replace("&", "&amp;").replace("<", "&lt;")
    }
    sb.toString
  }

  private val absUrlRe = "^[a-zA-Z+]+://".r

  /** Backslash-escape \ [ ] ( ) — applied to URLs/alt/titles inside markdown
    * constructs. */
  def escapeMd(s: String): String =
    s.replaceAll("""([\\\[\]()])""", """\\$1""")

  /** Section-level escaping with the strategy defaults (escape_snob /
    * dot / plus / dash all off): only a literal backslash that precedes a
    * markdown-special character is doubled. */
  private def escapeMdSection(s: String): String =
    s.replaceAll("""\\(?=[\\`*_{}\[\]()#+\-.!])""", """\\\\""")

  private def headerLevel(tag: String): Int =
    if (tag.length == 2 && tag.charAt(0) == 'h' && tag.charAt(1) >= '1' && tag.charAt(1) <= '6')
      tag.charAt(1) - '0'
    else 0

  private val punctuation = "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~"

  private final class ListEl(val name: String, var num: Int)

  /** One conversion's mutable emitter state (mirrors the html2text
    * o()/p()/pbr() whitespace machine, __init__.py:752-876). */
  private final class Html2Md(baseUrl: String) {
    private val outList = ArrayBuffer.empty[String]
    private var quiet = 0
    private var pP = 0
    private var space = false
    private var start = true
    private var lastWasNL = false
    private var brToggle = ""
    private var blockquote = 0
    private var insidePre = false
    private var insideCode = false
    private var code = false // kbd/tt toggle
    private val list = ArrayBuffer.empty[ListEl]
    private var lastWasList = false
    private var astack = List.empty[Option[Map[String, String]]]
    private var maybeAutomaticLink: String = null
    private var emptyLink = false
    private var insideLink = false
    private var stressed = false
    private var precedingStressed = false
    private var precedingData = ""
    private var currentTag = ""
    private var tableStart = false
    private var splitNextTd = false
    private var tdCount = 0
    private var quote = false

    private def out(s: String): Unit = {
      outList += s
      if (s.nonEmpty) lastWasNL = s.last == '\n'
    }

    private def p(): Unit = pP = 1 // single_line_break
    private def pbr(): Unit = if (pP == 0) pP = 1
    private def softBr(): Unit = { pbr(); brToggle = "  " }

    /** force: 0 none, 1 true, 2 "end" */
    private def o(data: String, puredata: Boolean = false, force: Int = 0): Unit = {
      if (quiet != 0) return
      var d = data
      if (puredata && !insidePre) {
        d = d.replaceAll("\\s+", " ")
        if (d.nonEmpty && d.charAt(0) == ' ') { space = true; d = d.substring(1) }
      }
      if (d.isEmpty && force == 0) return
      var bq = ">" * blockquote
      if (!(force != 0 && d.nonEmpty && d.charAt(0) == '>') && blockquote > 0) bq += " "
      if (start) { space = false; pP = 0; start = false }
      if (force == 2) { pP = 0; out("\n"); space = false }
      if (pP > 0) {
        out((brToggle + "\n" + bq) * pP)
        space = false; brToggle = ""
      }
      if (space) {
        if (!lastWasNL) out(" ")
        space = false
      }
      pP = 0
      out(d)
    }

    def handleTag(tag: String, attrs: Map[String, String], isStart: Boolean): Unit = {
      currentTag = tag

      // first thing inside an anchor is another output-producing tag
      if (isStart && maybeAutomaticLink != null &&
          !Set("p", "div", "style", "dl", "dt").contains(tag) && tag != "img") {
        o("["); maybeAutomaticLink = null; emptyLink = false
      }

      val hl = headerLevel(tag)
      if (hl > 0) {
        if (astack.nonEmpty) {
          if (isStart) {
            if (outList.nonEmpty && outList.last == "[") {
              outList.remove(outList.length - 1)
              space = false
              o("#" * hl + " ")
              o("[")
            }
          } else { pP = 0; return }
        } else {
          p()
          if (isStart) o("#" * hl + " ") else return
        }
      }

      if (tag == "p" || tag == "div") {
        if (astack.isEmpty && !splitNextTd) p()
      }

      if (tag == "br" && isStart)
        o(if (blockquote > 0) "  \n> " else "  \n")

      if (tag == "hr" && isStart) { p(); o("* * *"); p() }

      if (tag == "head" || tag == "style" || tag == "script") {
        if (isStart) quiet += 1 else quiet -= 1
      }
      if (tag == "body") quiet = 0

      if (tag == "blockquote") {
        if (isStart) {
          p(); o("> ", force = 1); start = true; blockquote += 1
        } else { blockquote -= 1; p() }
      }

      if (tag == "em" || tag == "i" || tag == "u") {
        val mark =
          if (isStart && precedingData.nonEmpty &&
              !precedingData.last.isWhitespace &&
              !punctuation.contains(precedingData.last)) {
            precedingData += " "; " _"
          } else "_"
        o(mark)
        if (isStart) stressed = true
      }

      if (tag == "strong" || tag == "b") {
        val mark =
          if (isStart && precedingData.nonEmpty && precedingData.last == '*') {
            precedingData += " "; " **"
          } else "**"
        o(mark)
        if (isStart) stressed = true
      }

      if (tag == "del" || tag == "strike" || tag == "s") {
        val mark =
          if (isStart && precedingData.nonEmpty && precedingData.last == '~') {
            precedingData += " "; " ~~"
          } else "~~"
        o(mark)
        if (isStart) stressed = true
      }

      if (tag == "kbd" || tag == "tt") { o("`"); code = !code }

      if (tag == "code") {
        if (!insidePre) {
          if (!insideLink) o("`")
          insideCode = isStart
          if (insideLink) { o("`"); code = !code } // parent fallback inside links
        }
      }

      if (tag == "q") {
        o("\"")
        quote = !quote
      }

      if (tag == "a") {
        if (isStart) {
          insideLink = true
          val href = attrs.get("href")
          if (href.isDefined && !href.get.startsWith("mailto:")) {
            astack = Some(attrs) :: astack
            maybeAutomaticLink = href.get
            emptyLink = true
          } else astack = None :: astack
        } else {
          insideLink = false
          if (astack.nonEmpty) {
            val a = astack.head; astack = astack.tail
            if (maybeAutomaticLink != null && !emptyLink) {
              maybeAutomaticLink = null
            } else a match {
              case Some(at) =>
                if (emptyLink) { o("["); emptyLink = false; maybeAutomaticLink = null }
                pP = 0
                val title = at.get("title").filter(_.trim.nonEmpty)
                  .map(t => " \"" + escapeMd(t) + "\"").getOrElse("")
                o("](" + escapeMd(PyUrl.urljoin(baseUrl, at("href"))) + title + ")")
              case None =>
            }
          }
        }
      }

      if (tag == "img" && isStart && attrs.get("src").exists(_ != null)) {
        val src = attrs("src")
        val alt = attrs.getOrElse("alt", "")
        if (maybeAutomaticLink != null) { o("["); maybeAutomaticLink = null; emptyLink = false }
        o("![" + escapeMd(alt) + "]")
        o("(" + escapeMd(PyUrl.urljoin(baseUrl, src)) + ")")
      }

      if (tag == "dl" && isStart) { p(); pP = 0 }
      else if (tag == "dt" && isStart) { if (pP == 0) o("\n\n"); pP = 0 }
      else if (tag == "dt" && !isStart) o("\n")
      else if (tag == "dd" && isStart) o("    ")
      else if (tag == "dd" && !isStart) pP = 0

      if (tag == "ol" || tag == "ul") {
        if (list.isEmpty && !lastWasList) p()
        if (isStart) list += new ListEl(tag, 0)
        else if (list.nonEmpty) {
          list.remove(list.length - 1)
          if (list.isEmpty) o("\n")
        }
        lastWasList = true
      } else lastWasList = false

      if (tag == "li") {
        pbr()
        if (isStart) {
          val li = if (list.nonEmpty) list.last else new ListEl("ul", 0)
          // two spaces per enclosing list; three for a ul nested in an ol
          var parent: String = null
          list.foreach { l =>
            o(if (parent == "ol" && l.name == "ul") "   " else "  ")
            parent = l.name
          }
          if (li.name == "ul") o("* ")
          else { li.num += 1; o(li.num.toString + ". ") }
          start = true
        }
      }

      if (tag == "table" || tag == "tr" || tag == "td" || tag == "th") {
        if (tag == "table") {
          if (isStart) tableStart = true
        }
        if ((tag == "td" || tag == "th") && isStart) {
          if (splitNextTd) o("| ")
          splitNextTd = true
        }
        if (tag == "tr" && isStart) tdCount = 0
        if (tag == "tr" && !isStart) {
          splitNextTd = false
          softBr()
          if (tableStart) {
            o(Seq.fill(tdCount)("---").mkString("|"))
            softBr()
            tableStart = false
          }
        }
        if ((tag == "td" || tag == "th") && isStart) tdCount += 1
      }

      if (tag == "pre") {
        if (isStart) { o("```\n"); insidePre = true }
        else { o("\n```\n"); insidePre = false }
      }
    }

    def handleData(data: String): Unit = {
      if (data.isEmpty) return
      if (insidePre) { o(data); return }
      if (insideCode) { o(data.replace("\n", " ")); return }

      var d = data
      if (stressed) {
        d = d.trim
        stressed = false
        precedingStressed = true
      } else if (precedingStressed) {
        if (d.nonEmpty && !"][(){}.!?".contains(d.charAt(0)) && !d.charAt(0).isWhitespace &&
            headerLevel(currentTag) == 0 &&
            currentTag != "a" && currentTag != "code" && currentTag != "pre")
          d = " " + d
        precedingStressed = false
      }

      if (maybeAutomaticLink != null) {
        val href = maybeAutomaticLink
        if (href == d && absUrlRe.findFirstIn(href).isDefined) {
          o("<" + d + ">"); emptyLink = false; return
        } else { o("["); maybeAutomaticLink = null; emptyLink = false }
      }

      if (!code) d = escapeMdSection(d)
      precedingData = d
      o(d, puredata = true)
    }

    def finish(): String = {
      pbr()
      o("", force = 2)
      outList.mkString
    }
  }
}
