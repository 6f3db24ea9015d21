package graft.scrape

import graft.core.PyUrl

/** Markdown generation — the re-expression of the reference's
  * DefaultMarkdownGenerator (/root/reference/crawl4ai/
  * markdown_generation_strategy.py): html2text-fidelity raw markdown
  * ([[Html2Md]], goldens-pinned against the reference converter), then the
  * inline `[text](url)` → `text⟨n⟩` citation rewrite (:82-146) with per-URL
  * first-seen numbering — the same href reused anywhere in the document gets
  * ONE number and ONE references line.
  *
  * Runs as a typed map — one row in, one row out, no shuffle.
  */
object Markdown {

  final case class MarkdownResult(
      raw_markdown: String,
      markdown_with_citations: String,
      references_markdown: String)

  /** The reference's LINK_PATTERN (markdown_generation_strategy.py:11):
    * inline links and images, optional quoted title. */
  private val LinkPattern =
    """!?\[([^\]]+)\]\(([^)]+?)(?:\s+"([^"]*)")?\)""".r

  /** fast_urljoin (markdown_generation_strategy.py:14-23) — including its
    * keep-the-base-path quirk for absolute paths. */
  private def fastUrljoin(base: String, url: String): String =
    if (url.startsWith("http://") || url.startsWith("https://") ||
        url.startsWith("mailto:") || url.startsWith("//")) url
    else if (url.startsWith("/")) {
      if (base.endsWith("/")) base.dropRight(1) + url else base + url
    } else PyUrl.urljoin(base, url)

  /** Inline links → citations. Numbering is per unique URL in first-seen
    * order; the references block lists each URL once, annotated with its
    * title/text description (`⟨n⟩ url: title - text`).
    */
  def convertLinksToCitations(markdown: String, baseUrl: String = ""): (String, String) = {
    val linkMap = scala.collection.mutable.LinkedHashMap.empty[String, (Int, String)]
    var counter = 1
    val sb = new StringBuilder
    var last = 0
    for (m <- LinkPattern.findAllMatchIn(markdown)) {
      sb.append(markdown.substring(last, m.start))
      val text = m.group(1)
      var url = m.group(2)
      val title = Option(m.group(3)).getOrElse("")
      if (baseUrl.nonEmpty && !url.startsWith("http://") &&
          !url.startsWith("https://") && !url.startsWith("mailto:"))
        url = fastUrljoin(baseUrl, url)
      if (!linkMap.contains(url)) {
        val desc = Seq(title).filter(_.nonEmpty) ++
          Seq(text).filter(t => t.nonEmpty && t != title)
        linkMap(url) = (counter, if (desc.nonEmpty) ": " + desc.mkString(" - ") else "")
        counter += 1
      }
      val num = linkMap(url)._1
      sb.append(
        if (m.matched.startsWith("!")) s"![$text⟨$num⟩]" else s"$text⟨$num⟩")
      last = m.end
    }
    sb.append(markdown.substring(last))
    val refs = new StringBuilder("\n\n## References\n\n")
    linkMap.toSeq.sortBy(_._2._1).foreach { case (url, (num, desc)) =>
      refs ++= s"⟨$num⟩ $url$desc\n"
    }
    (sb.toString, refs.toString)
  }

  /** Full markdown generation for one page: clean (drop script/style/
    * noscript/head + display:none subtrees — the cleaned_html content source)
    * → html2text-fidelity raw markdown → citation rewrite.
    */
  final case class FitResult(
      raw_markdown: String,
      markdown_with_citations: String,
      references_markdown: String,
      fit_html: String,
      fit_markdown: String)

  /** The full MarkdownGenerationResult surface incl. fit_html/fit_markdown
    * (markdown_generation_strategy.py:227-248): the content filter
    * (PruningContentFilter by default, :233) reduces the page to its
    * significant chunks, and fit_markdown is the html2text conversion of
    * that filtered HTML.
    */
  def fromHtmlFit(html: String, baseUrl: String = "",
                  prune: ContentFilter.PruneConfig = ContentFilter.PruneConfig())
      : FitResult = {
    val base = fromHtml(html, baseUrl)
    val fitHtml = ContentFilter.pruneHtml(html, prune).mkString("\n")
    val fitMd = Html2Md.convert(fitHtml, baseUrl)
    FitResult(base.raw_markdown, base.markdown_with_citations,
      base.references_markdown, fitHtml, fitMd)
  }

  def fromHtml(html: String, baseUrl: String = "", clean: Boolean = true): MarkdownResult = {
    val input = if (clean) Html2Md.cleaned(html) else html
    val raw = Html2Md.convert(input, baseUrl)
    val (cited, refs) = convertLinksToCitations(raw, baseUrl)
    MarkdownResult(raw, cited, refs)
  }
}
