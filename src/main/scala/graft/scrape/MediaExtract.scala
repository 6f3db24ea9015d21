package graft.scrape

import graft.scrape.Dom.Node

/** Structural media-variant extraction — the reference's `process_image`
  * output shape (/root/reference/crawl4ai/content_scraping_strategy.py:
  * 420-566): per surviving image, one record per UNIQUE source variant
  * (src → data-src → srcset entries → data-srcset entries → parent
  * `<picture>` sources → framework data-attrs), sharing a `group_id` (the
  * image's index), with alt, closest-ancestor description
  * (find_closest_parent_with_useful_text, :369-392), score, and the first
  * detected raster format. `data:` URIs never become variants (:539), so an
  * image with only a data URI yields no records — exactly the reference's
  * `return None`.
  *
  * This is the media-table side of image handling; the SPAN/markdown side
  * (one media span per image, position preserved) lives in [[Scrape]]. Like
  * [[Tables]], this runs as a pure per-row map over page HTML.
  */
object MediaExtract {

  final case class MediaVariant(
      group_id: Int,
      src: String,
      width: Option[Int],
      alt: String,
      desc: String,
      score: Int,
      format: String)

  private val imageFormats = Seq("jpg", "jpeg", "png", "webp", "avif", "gif")

  /** The reference's parse_srcset (content_scraping_strategy.py:42-59):
    * comma-separated `url [descriptor]` entries; width only from a `…w`
    * descriptor (integer part). */
  def parseSrcset(s: String): Seq[(String, Option[Int])] =
    if (s == null || s.isEmpty) Seq.empty
    else s.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map { part =>
      val ps = part.split("\\s+")
      val width =
        if (ps.length > 1 && ps(1).endsWith("w"))
          scala.util.Try(ps(1).stripSuffix("w").split("\\.")(0).toInt).toOption
        else None
      (ps(0), width)
    }

  private def detectedFormat(attrs: Map[String, String]): String =
    Seq("src", "data-src", "srcset", "data-srcset")
      .flatMap(attrs.get).map(_.toLowerCase)
      .flatMap(u => imageFormats.find(u.contains))
      .headOption.getOrElse("")

  /** First ancestor whose whitespace-normalized text has ≥ minWords words. */
  private def closestUsefulText(ancestors: List[Node], minWords: Int): String =
    ancestors.iterator.map(_.allText)
      .find(t => t.split("\\s+").count(_.nonEmpty) >= minWords)
      .getOrElse("")

  def extract(html: String, imageScoreThreshold: Int = 2,
              descMinWords: Int = 1): Seq[MediaVariant] = {
    val root = Dom.parse(html)
    // collect (img, ancestors nearest-first) in document order
    val imgs = Vector.newBuilder[(Node, List[Node])]
    def walk(n: Node, ancestors: List[Node]): Unit =
      n.children.foreach { ch =>
        if (!ch.isText) {
          if (ch.tag == "img") imgs += ((ch, n :: ancestors))
          walk(ch, n :: ancestors)
        }
      }
    walk(root, Nil)
    val all = imgs.result()
    val total = all.length

    all.zipWithIndex.flatMap { case ((img, ancestors), index) =>
      val attrs = img.attrs
      val parentTag = ancestors.headOption.map(_.tag).getOrElse("")
      val parentClass = ancestors.headOption.flatMap(_.attrs.get("class")).getOrElse("")
      val inPicture = ancestors.exists(_.tag == "picture")
      if (Scrape.imageRejected(attrs, parentTag, parentClass)) Seq.empty
      else {
        val score = Scrape.imageScore(attrs, inPicture, index, total)
        if (score <= imageScoreThreshold) Seq.empty
        else {
          val alt = attrs.getOrElse("alt", "")
          val desc = closestUsefulText(ancestors, descMinWords)
          val format = detectedFormat(attrs)
          val seen = scala.collection.mutable.LinkedHashSet.empty[String]
          val out = Seq.newBuilder[MediaVariant]
          def add(src: String, width: Option[Int]): Unit =
            if (src != null && src.nonEmpty && !src.startsWith("data:") && seen.add(src))
              out += MediaVariant(index, src, width, alt, desc, score, format)
          attrs.get("src").foreach(add(_, None))
          attrs.get("data-src").foreach(add(_, None))
          attrs.get("srcset").foreach(parseSrcset(_).foreach { case (u, w) => add(u, w) })
          attrs.get("data-srcset").foreach(parseSrcset(_).foreach { case (u, w) => add(u, w) })
          // parent <picture> sources
          ancestors.find(_.tag == "picture").toSeq
            .flatMap(_.elementChildren.filter(_.tag == "source"))
            .flatMap(_.attrs.get("srcset"))
            .foreach(parseSrcset(_).foreach { case (u, w) => add(u, w) })
          // framework-specific data attributes carrying absolute sources
          attrs.foreach { case (k, v) =>
            if (k.startsWith("data-") && (k.contains("src") || k.contains("srcset")) &&
                v.contains("http"))
              add(v, None)
          }
          out.result()
        }
      }
    }
  }
}
