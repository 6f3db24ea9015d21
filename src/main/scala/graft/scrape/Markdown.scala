package graft.scrape

import graft.core.{LinkOut, ScrapedDoc, Span}

/** Markdown generation over span documents — the string-ops tail of the
  * pipeline (re-expressed from /root/reference/crawl4ai/
  * markdown_generation_strategy.py: raw markdown emission :148-226 and the
  * link→citation rewrite :82-146: per-URL first-seen numbering, `text⟨n⟩`
  * markers, a `## References` block sorted by citation number).
  *
  * Runs as a typed map over `Dataset[ScrapedDoc]` — one row in, one row out,
  * no shuffle.
  */
object Markdown {

  final case class MarkdownResult(
      raw_markdown: String,
      markdown_with_citations: String,
      references_markdown: String)

  /** Raw markdown: text spans as paragraphs, media spans as image/link
    * markers in emission order (the span sequence IS the markdown order).
    */
  def raw(spans: Seq[Span]): String = {
    val sb = new StringBuilder
    spans.foreach { s =>
      if (sb.nonEmpty) sb ++= "\n\n"
      if (s.kind == "media") {
        sb ++= "!["; sb ++= s.text; sb ++= "]("; sb ++= s.media_ref; sb += ')'
      } else sb ++= s.text
    }
    sb.toString
  }

  /** Citation rewrite: each link becomes `text⟨n⟩` with n assigned in
    * first-seen link order; references block lists `⟨n⟩ href` sorted by n.
    * Link text occurrences in the raw markdown are annotated at their first
    * occurrence (the reference rewrites the inline `[text](url)` markers;
    * span docs carry links out-of-band, so annotation anchors on the text).
    */
  def withCitations(rawMd: String, links: Seq[LinkOut]): (String, String) = {
    val numbered = links.zipWithIndex.map { case (l, i) => (l, i + 1) }
    var md = rawMd
    numbered.foreach { case (l, n) =>
      if (l.text.nonEmpty) {
        val idx = md.indexOf(l.text)
        if (idx >= 0) {
          md = md.substring(0, idx + l.text.length) + s"⟨$n⟩" +
            md.substring(idx + l.text.length)
        }
      }
    }
    val refs = new StringBuilder("## References\n\n")
    numbered.foreach { case (l, n) => refs ++= s"⟨$n⟩ ${l.href}\n" }
    (md, refs.toString)
  }

  def fromDoc(doc: ScrapedDoc): MarkdownResult = {
    val rawMd = raw(doc.spans)
    val (cited, refs) = withCitations(rawMd, doc.links)
    MarkdownResult(rawMd, cited, refs)
  }
}
