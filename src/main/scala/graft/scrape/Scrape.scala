package graft.scrape

import graft.core.{LinkOut, PyUrl, ScrapedDoc, Span, Urls}
import graft.scrape.HtmlTok._

/** HTML → interleaved span document + links. One page in, one ScrapedDoc out —
  * a pure per-row map, executed as a typed `Dataset.map` (no RDD).
  *
  * Span-emission contract (re-expressed from the reference's scrape+markdown
  * pipeline — content_scraping_strategy.py:598-843 element pruning,
  * :420-566 image scoring, :1044-1049 base64 stripping,
  * markdown_generation_strategy.py:148-226 DOM-order emission):
  *
  *  1. `<script>/<style>/<noscript>` subtrees and any element with inline
  *     `display:none` are dropped entirely; `<head>` produces no spans
  *     (the `<title>` text is captured as metadata).
  *  2. Text accumulates in document order; the buffer flushes to ONE text span
  *     at every block-element boundary (open or close), whitespace-collapsed.
  *     Spans with fewer than `minWords` words are dropped
  *     (word_count_threshold semantics).
  *  3. `<img>` flushes the text buffer, then emits a media span at the
  *     current position if it survives the icon-context rejection (parent
  *     button/input; button/icon/logo in parent class, src, or alt) AND its
  *     score STRICTLY exceeds `imageScoreThreshold`: +1 width>150, +1
  *     height>150, +1 non-empty alt, +1 early position (index/total < 0.5),
  *     +1 raster-format mention in any source, +1 srcset/data-srcset, +1
  *     inside `<picture>` (reference scoring, content_scraping_strategy.py:
  *     420-566). `data:` URIs are blanked (media_ref = "") but keep their
  *     position. Span text = alt.
  *  4. `<video>/<audio>` emit one media span from their first `src` (inline or
  *     first nested `<source>`).
  *  5. `<tr>` rows flush as one text span with cells joined by " | "
  *     (html2text table emission shape); tables are additionally extracted
  *     structurally (is_data_table path, content_scraping_strategy.py:201-347).
  *  6. `offset` = global emission index (0-based) — the per-row ordering key of
  *     the span-sequence-equality invariant.
  *  7. Links: every `<a href>` is canonicalized with the deep-crawl normalizer
  *     (the visited-set key), deduped first-wins per canonical URL, split
  *     internal/external by base domain.
  */
object Scrape {

  final case class Config(
      minWords: Int = 1,
      imageScoreThreshold: Int = 2,
      excludedTags: Set[String] = Set.empty,
      /** Slice the page to the matching elements' outerHTML (comma-separated
        * selectors, concatenated per selector) BEFORE any processing —
        * everything downstream sees only the slice
        * (async_crawler_strategy.py:1022-1041). */
      cssSelector: Option[String] = None,
      /** Restrict CONTENT (spans) to the selected subtrees; links and title
        * still come from the whole page (content_scraping_strategy.py:
        * 914-927 + :1053 — cleaned_html is the targeted content, link
        * extraction walks the full body). */
      targetElements: Seq[String] = Nil,
      /** Remove matching elements before processing
        * (content_scraping_strategy.py:902-912). */
      excludedSelector: Option[String] = None,
      /** Link/image domain exclusions (content_scraping_strategy.py:655-755):
        * excluded `<a>`/`<img>` elements are DECOMPOSED — the anchor text
        * disappears from content too, exactly like the reference's
        * element.decompose(). Social flag merges [[Scrape.socialMediaDomains]]
        * into excludeDomains (:929-935). */
      excludeExternalLinks: Boolean = false,
      excludeInternalLinks: Boolean = false,
      excludeSocialMediaLinks: Boolean = false,
      excludeDomains: Set[String] = Set.empty,
      excludeExternalImages: Boolean = false,
      /** remove_forms sugar: drops `<form>` subtrees
        * (content_scraping_strategy.py kwargs). */
      removeForms: Boolean = false) {
    def effectiveExcludeDomains: Set[String] =
      if (excludeSocialMediaLinks) excludeDomains ++ Scrape.socialMediaDomains
      else excludeDomains
    def hasLinkExclusions: Boolean =
      excludeExternalLinks || excludeInternalLinks || excludeSocialMediaLinks ||
        excludeDomains.nonEmpty
  }

  /** SOCIAL_MEDIA_DOMAINS (config.py:74-84). */
  val socialMediaDomains: Set[String] = Set(
    "facebook.com", "twitter.com", "x.com", "linkedin.com", "instagram.com",
    "pinterest.com", "tiktok.com", "snapchat.com", "reddit.com")

  private val alwaysExcluded = Set("script", "style", "noscript")
  private val blockTags = Set(
    "html", "body", "div", "section", "article", "main", "aside",
    "h1", "h2", "h3", "h4", "h5", "h6", "p", "li", "ul", "ol",
    "table", "thead", "tbody", "tr", "caption", "nav", "blockquote",
    "pre", "header", "footer", "figure", "figcaption", "form", "br", "hr")
  // reference constants (content_scraping_strategy.py:446-448)
  private val imageFormats = Seq("jpg", "jpeg", "png", "webp", "avif", "gif")
  private val iconContextWords = Seq("button", "icon", "logo")
  private val iconParentTags = Set("button", "input")

  def wordCount(s: String): Int = s.split("\\s+").count(_.nonEmpty)

  /** Icon-context rejection (content_scraping_strategy.py:463-470): an image
    * is dropped outright when its parent is a button/input, when the parent's
    * class — or its own src or alt — mentions button/icon/logo, or when its
    * own style hides it.
    */
  def imageRejected(attrs: Map[String, String], parentTag: String,
                    parentClass: String): Boolean = {
    val src = attrs.getOrElse("src", "")
    val alt = attrs.getOrElse("alt", "")
    attrs.get("style").exists(_.replaceAll("\\s", "").toLowerCase.contains("display:none")) ||
      iconParentTags.contains(parentTag) ||
      iconContextWords.exists(parentClass.contains) ||
      iconContextWords.exists(src.contains) ||
      iconContextWords.exists(alt.contains)
  }

  /** Usefulness score (content_scraping_strategy.py:473-509): +1 width>150,
    * +1 height>150, +1 non-empty alt, +1 early position (index/total < 0.5),
    * +1 any source (src/data-src/srcset/data-srcset) mentioning a raster
    * format, +1 srcset/data-srcset present, +1 inside `<picture>`. Emission
    * requires score STRICTLY greater than the threshold (:522).
    */
  def imageScore(attrs: Map[String, String], inPicture: Boolean,
                 index: Int, totalImages: Int): Int = {
    var score = 0
    def dim(a: String): Int =
      attrs.get(a).flatMap(v => scala.util.Try(v.trim.toInt).toOption).getOrElse(0)
    if (dim("width") > 150) score += 1
    if (dim("height") > 150) score += 1
    if (attrs.get("alt").exists(_.nonEmpty)) score += 1
    if (totalImages > 0 && index.toDouble / totalImages < 0.5) score += 1
    val sources = Seq("src", "data-src", "srcset", "data-srcset")
      .flatMap(attrs.get).map(_.toLowerCase)
    if (sources.exists(s => imageFormats.exists(s.contains))) score += 1
    if (attrs.contains("srcset") || attrs.contains("data-srcset")) score += 1
    if (inPicture) score += 1
    score
  }

  /** Serialize `html` minus every element matching `selector`. */
  private def removeMatching(html: String, selector: String): String = {
    val root = Dom.parse(html)
    val doomed = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[Dom.Node, java.lang.Boolean]())
    selector.split(',').map(_.trim).filter(_.nonEmpty)
      .foreach(s => CssExtract.select(root, s).foreach(doomed.add))
    def prune(n: Dom.Node): Unit = {
      n.children = n.children.filterNot(doomed.contains)
      n.children.foreach(prune)
    }
    prune(root)
    root.children.map(c => if (c.isText) Dom.escapeText(c.text) else c.outerHtml).mkString
  }

  def scrape(url: String, html: String, cfg: Config = Config()): ScrapedDoc = {
    if (cfg.cssSelector.isEmpty && cfg.targetElements.isEmpty &&
        cfg.excludedSelector.isEmpty)
      return scrapeTokens(url, html, cfg)
    // selector preprocessing runs on the parsed Dom; the token scraper then
    // consumes the re-serialized slice (per-row work, still one typed map)
    val sliced = cfg.cssSelector match {
      case Some(sel) =>
        val root = Dom.parse(html)
        val parts = sel.split(',').map(_.trim).filter(_.nonEmpty)
          .flatMap(s => CssExtract.select(root, s).map(_.outerHtml))
        s"<div class='crawl4ai-result'>\n${parts.mkString("\n")}\n</div>"
      case None => html
    }
    val cleaned = cfg.excludedSelector match {
      case Some(sel) => removeMatching(sliced, sel)
      case None => sliced
    }
    if (cfg.targetElements.isEmpty) scrapeTokens(url, cleaned, cfg)
    else {
      val root = Dom.parse(cleaned)
      val content = cfg.targetElements
        .flatMap(s => CssExtract.select(root, s).map(_.outerHtml))
      val contentDoc =
        scrapeTokens(url, s"<div>${content.mkString("\n")}</div>", cfg)
      // links+title only — span/media emission skipped, so the second walk
      // over the full page does not repeat the content work
      val full = scrapeTokens(url, cleaned, cfg, emitSpans = false)
      contentDoc.copy(links = full.links, title = full.title)
    }
  }

  private def scrapeTokens(url: String, html: String, cfg: Config,
                           emitSpans: Boolean = true): ScrapedDoc = {
    val excluded = alwaysExcluded ++ cfg.excludedTags ++
      (if (cfg.removeForms) Set("form") else Set.empty)
    val excludeDoms = cfg.effectiveExcludeDomains
    val base = Urls.baseDomain(url)
    val spans = scala.collection.mutable.ArrayBuffer.empty[Span]
    val links = scala.collection.mutable.LinkedHashMap.empty[String, LinkOut]
    val buf = new StringBuilder
    val title = new StringBuilder
    var nWords = 0

    // element stack: (tag, skipped, classAttr) — skipped covers excluded
    // tags + display:none; classAttr feeds the icon-context image rejection
    var stack = List.empty[(String, Boolean, String)]
    def skipping: Boolean = stack.exists(_._2)
    def inside(tag: String): Boolean = stack.exists(_._1 == tag)

    var anchorText: StringBuilder = null
    var anchorHref: String = null
    var mediaSrcPending: String = null // inside <video>/<audio> awaiting <source>
    var inTr = false
    var rowHadCell = false
    // image position scoring needs (index, total): total from a cheap
    // case-INSENSITIVE pre-pass (the tokenizer lowercases tags, so `<IMG`
    // must count too or the denominator diverges from imgIndex); index
    // counts EVERY <img> open (including rejected/hidden — reference indexes
    // the full select('img') list). Known edge vs the reference's parsed
    // select('img'): occurrences inside comments still count here.
    val totalImages = {
      var c = 0; var i = 0
      val n = html.length - 4
      while (i <= n) {
        if (html.charAt(i) == '<' && html.regionMatches(true, i + 1, "img", 0, 3)) c += 1
        i += 1
      }
      c
    }
    var imgIndex = 0

    def flushText(): Unit = {
      if (!emitSpans) { buf.clear(); return }
      val text = HtmlTok.normSpace(buf.toString)
      buf.clear()
      if (text.nonEmpty) {
        val wc = wordCount(text)
        if (wc >= cfg.minWords) {
          spans += Span("text", text, "", spans.length)
          nWords += wc
        }
      }
    }

    def emitMedia(src: String, alt: String): Unit = {
      if (!emitSpans) return
      flushText()
      val ref =
        if (src == null || src.isEmpty) ""
        else if (src.startsWith("data:")) "" // base64 stripped, position kept
        else PyUrl.urljoin(url, src.trim)
      spans += Span("media", alt, ref, spans.length)
    }

    /** decompose-equivalent exclusion, decided at `<a>` open so the anchor's
      * subtree (text included) is suppressed (reference :655-690). */
    def linkExcluded(href: String): Boolean = {
      if (!cfg.hasLinkExclusions) return false
      val lower = href.toLowerCase
      if (Seq("mailto:", "tel:", "javascript:", "data:").exists(lower.startsWith)) return false
      val canon = Urls.canonicalizeDeep(href, url)
      if (canon == null) return false
      if (Urls.isExternal(canon, base)) {
        if (cfg.excludeExternalLinks) true
        else excludeDoms.nonEmpty && excludeDoms.contains(Urls.baseDomain(canon))
      } else cfg.excludeInternalLinks
    }

    /** Image exclusion (reference :715-755): internal/relative src kept;
      * external src dropped under excludeExternalImages or excludeDomains. */
    def imageExcluded(src: String): Boolean = {
      if (src == null || src.isEmpty || src.startsWith("data:")) return false
      if (!cfg.excludeExternalImages && excludeDoms.isEmpty) return false
      val abs = PyUrl.urljoin(url, src.trim)
      if (!Urls.isExternal(abs, base)) return false
      val srcDomain = Urls.baseDomain(abs)
      val externalAbs = src.startsWith("http") || src.startsWith("//")
      (cfg.excludeExternalImages && externalAbs && srcDomain.nonEmpty &&
        base.nonEmpty && srcDomain != base) ||
        (excludeDoms.nonEmpty && excludeDoms.contains(srcDomain))
    }

    def addLink(href: String, text: String): Unit = {
      val lower = href.toLowerCase
      val special = Seq("mailto:", "tel:", "javascript:", "data:").exists(lower.startsWith)
      if (!special) {
        val canon = Urls.canonicalizeDeep(href, url)
        if (canon != null && !links.contains(canon)) {
          val internal = !Urls.isExternal(canon, base)
          links(canon) = LinkOut(canon, HtmlTok.normSpace(text), internal, links.size)
        }
      }
    }

    val toks = HtmlTok.tokenize(html)
    while (toks.hasNext) {
      toks.next() match {
        case Open(tag, attrs, selfClosing) =>
          val skipThis = excluded.contains(tag) ||
            attrs.get("style").exists(_.replaceAll("\\s", "").toLowerCase.contains("display:none")) ||
            (tag == "a" && attrs.contains("href") && linkExcluded(attrs("href")))
          val skipped = skipping || skipThis
          if (blockTags.contains(tag) && !skipped) {
            if (tag == "tr") { inTr = true; rowHadCell = false }
            flushText()
          }
          if ((tag == "td" || tag == "th") && !skipped && inTr) {
            if (rowHadCell) buf ++= " | "
            rowHadCell = true
          }
          val thisImgIndex = if (tag == "img") { val x = imgIndex; imgIndex += 1; x } else -1
          if (!skipped) tag match {
            case "img" =>
              val parentTag = stack.headOption.map(_._1).getOrElse("")
              val parentClass = stack.headOption.map(_._3).getOrElse("")
              val score = imageScore(attrs, inside("picture"), thisImgIndex, totalImages)
              if (!imageRejected(attrs, parentTag, parentClass) &&
                  score > cfg.imageScoreThreshold &&
                  !imageExcluded(attrs.getOrElse("src", "")))
                emitMedia(attrs.getOrElse("src", ""), attrs.getOrElse("alt", ""))
            case "video" | "audio" =>
              if (attrs.contains("src")) emitMedia(attrs("src"), attrs.getOrElse("alt", ""))
              else if (!selfClosing) mediaSrcPending = tag
            case "source" =>
              if (mediaSrcPending != null && attrs.contains("src")) {
                emitMedia(attrs("src"), "")
                mediaSrcPending = null
              }
            case "a" =>
              if (attrs.contains("href") && !selfClosing) {
                anchorHref = attrs("href")
                anchorText = new StringBuilder
              } else if (attrs.contains("href")) addLink(attrs("href"), "")
            case _ =>
          }
          if (!selfClosing) stack = (tag, skipThis, attrs.getOrElse("class", "")) :: stack

        case Close(tag) =>
          // tolerant pop: drop frames up to and including the matching tag
          val idx = stack.indexWhere(_._1 == tag)
          if (idx >= 0) stack = stack.drop(idx + 1)
          if (!skipping) {
            if (tag == "a" && anchorHref != null) {
              addLink(anchorHref, anchorText.toString)
              anchorHref = null; anchorText = null
            }
            if (tag == "video" || tag == "audio") mediaSrcPending = null
            if (tag == "tr") { flushText(); inTr = false }
            else if (blockTags.contains(tag)) flushText()
          }

        case Text(s) =>
          if (!skipping) {
            if (inside("title")) title ++= s
            else if (!inside("head")) {
              buf ++= s
              if (anchorText != null) anchorText ++= s
            }
          }
      }
    }
    flushText()

    ScrapedDoc(
      doc_id = url,
      url = url,
      spans = spans.toSeq,
      links = links.values.toSeq,
      title = HtmlTok.normSpace(title.toString),
      nWords = nWords)
  }
}
