package graft.scrape

/** Head/metadata extraction + fit-html preprocessing — per-document string
  * functions used by the seed head-peek stage and the scrape map.
  *
  *  - extractMetadata — title/description/keywords/author plus og: and
  *    twitter: properties from `<head>` (re-expressed from
  *    /root/reference/crawl4ai/utils.py:1497-1644).
  *  - headPeek — the seeder's bounded head fetch: stop at `</head>` or
  *    64 KB, whichever first (async_url_seeder.py:1032-1130).
  *  - pageContextTerms — tokenized title + headlines + meta description,
  *    words > 2 chars (utils.py:3078-3120); feeds link scoring.
  *  - isDocsSite — docs-site heuristic over url + title (utils.py:3095-3105
  *    shape).
  *  - fitHtml — preprocess_html_for_schema condensed (utils.py:2863-3007):
  *    drop script/style/noscript, truncate text runs > 500 chars, cap the
  *    whole output at 300 KB, preserving structure.
  */
object Meta {

  val HeadPeekBytes = 64 * 1024
  val FitTextCap = 500
  val FitTotalCap = 300 * 1024

  /** Title + meta name/property map from the head. */
  def extractMetadata(html: String): Map[String, String] = {
    val root = Dom.parse(headPeek(html))
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    root.descendants.foreach { n =>
      n.tag match {
        case "title" if !out.contains("title") =>
          out("title") = n.allText
        case "meta" =>
          val key = n.attrs.get("name").orElse(n.attrs.get("property")).map(_.toLowerCase)
          val content = n.attrs.getOrElse("content", "")
          key match {
            case Some(k)
              if k == "description" || k == "keywords" || k == "author" ||
                 k.startsWith("og:") || k.startsWith("twitter:") =>
              if (!out.contains(k)) out(k) = content
            case _ =>
          }
        case "link" if n.attrs.get("rel").contains("canonical") =>
          if (!out.contains("canonical")) out("canonical") = n.attrs.getOrElse("href", "")
        case _ =>
      }
    }
    out.toMap
  }

  /** First `</head>` or 64 KB of the page, whichever comes first. */
  def headPeek(html: String, cap: Int = HeadPeekBytes): String = {
    if (html == null) return ""
    val idx = html.toLowerCase.indexOf("</head>")
    val end = if (idx >= 0) math.min(idx + 7, html.length) else math.min(cap, html.length)
    html.substring(0, math.min(end, html.length))
  }

  /** Page context terms: title + h1/h2 + meta description words, lowercased,
    * length > 2, punctuation-stripped, deduped.
    */
  def pageContextTerms(html: String): Set[String] = {
    val root = Dom.parse(html)
    val meta = extractMetadata(html)
    val sb = new StringBuilder
    meta.get("title").foreach(t => sb ++= t += ' ')
    meta.get("description").foreach(t => sb ++= t += ' ')
    root.descendants.filter(n => n.tag == "h1" || n.tag == "h2")
      .foreach(n => { sb ++= n.allText; sb += ' ' })
    sb.toString.toLowerCase.split("\\s+")
      .map(_.replaceAll("^[.,!?;:\"()\\[\\]{}]+|[.,!?;:\"()\\[\\]{}]+$", ""))
      .filter(_.length > 2)
      .toSet
  }

  /** Docs-site heuristic: url path or title mentions docs/documentation/api
    * reference material.
    */
  def isDocsSite(url: String, title: String): Boolean = {
    val u = Option(url).getOrElse("").toLowerCase
    val t = Option(title).getOrElse("").toLowerCase
    Seq("docs.", "/docs", "/documentation", "developer.", "/api").exists(u.contains) ||
      Seq("documentation", "api reference", "developer guide").exists(t.contains)
  }

  /** Structure-preserving HTML shrink for schema generation. */
  def fitHtml(html: String): String = {
    val sb = new StringBuilder
    val toks = HtmlTok.tokenize(html)
    var skipDepth = 0
    while (toks.hasNext && sb.length < FitTotalCap) {
      toks.next() match {
        case HtmlTok.Open(tag, attrs, selfClosing) =>
          if (tag == "script" || tag == "style" || tag == "noscript") {
            if (!selfClosing) skipDepth += 1
          } else if (skipDepth == 0) {
            sb += '<'; sb ++= tag
            attrs.foreach { case (k, v) => sb ++= s""" $k="$v"""" }
            if (selfClosing) sb ++= "/"
            sb += '>'
          }
        case HtmlTok.Close(tag) =>
          if (tag == "script" || tag == "style" || tag == "noscript") {
            if (skipDepth > 0) skipDepth -= 1
          } else if (skipDepth == 0) { sb ++= "</"; sb ++= tag; sb += '>' }
        case HtmlTok.Text(s) =>
          if (skipDepth == 0)
            sb ++= (if (s.length > FitTextCap) s.substring(0, FitTextCap) + "…" else s)
      }
    }
    sb.toString
  }
}
