package graft.scrape

import graft.ops.TextAnalysis
import graft.scrape.Dom.Node
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Content filters producing `fit_html` / fit chunks — re-expressed from
  * /root/reference/crawl4ai/content_filter_strategy.py.
  *
  * Pruning filter (:533-777): recursive tree prune by a composite score
  *   0.4·text_density + 0.2·(1 − link_density) + 0.2·tag_weight
  * + 0.1·max(0, class_id_weight) + 0.1·ln(text_len + 1)
  * normalized by total weight; fixed threshold (default 0.48) or dynamic
  * (tag-importance scales the threshold ×0.8 / ×0.9 / ×1.2). Runs inside the
  * per-document map — a tree walk, not a relational op.
  *
  * BM25 chunk filter (:381-530): chunk candidates → BM25 vs query → tag
  * priority weighting → threshold → reassemble in document order. The
  * corpus-stats variant is relational (graft.ops.Bm25); this one is the
  * per-document form used for fit_markdown.
  */
object ContentFilter {

  final case class PruneConfig(
      threshold: Double = 0.48,
      dynamic: Boolean = false,
      minWords: Int = 0)

  private val tagWeights = Map(
    "div" -> 0.5, "p" -> 1.0, "article" -> 1.5, "section" -> 1.0,
    "span" -> 0.3, "li" -> 0.5, "ul" -> 0.5, "ol" -> 0.5,
    "h1" -> 1.2, "h2" -> 1.1, "h3" -> 1.0, "h4" -> 0.9, "h5" -> 0.8, "h6" -> 0.7)

  private val tagImportance = Map(
    "article" -> 1.5, "main" -> 1.4, "section" -> 1.3, "p" -> 1.2,
    "h1" -> 1.4, "h2" -> 1.3, "h3" -> 1.2, "div" -> 0.7, "span" -> 0.6)

  private val negativePattern =
    "(?i).*(nav|footer|header|sidebar|ads|comment|promo|advert|social|share).*".r

  private val excludedTags = Set("script", "style", "noscript", "nav", "footer", "header")

  private def compositeScore(n: Node, cfg: PruneConfig): Double = {
    val text = n.allText
    val textLen = text.replaceAll("\\s", "").length // get_text(strip) length-ish
    if (cfg.minWords > 0 && text.count(_ == ' ') + 1 < cfg.minWords) return -1.0
    val tagLen = math.max(n.outerHtml.length, 1)
    val linkTextLen = n.elementChildren.filter(_.tag == "a")
      .map(_.allText.trim.length).sum
    var score = 0.0
    score += 0.4 * (textLen.toDouble / tagLen)
    score += 0.2 * (1.0 - (if (textLen > 0) linkTextLen.toDouble / textLen else 0.0))
    score += 0.2 * tagWeights.getOrElse(n.tag, 0.5)
    val classId = {
      var s = 0.0
      if (n.attrs.get("class").exists(c => negativePattern.matches(c))) s -= 0.5
      if (n.attrs.get("id").exists(c => negativePattern.matches(c))) s -= 0.5
      math.max(0.0, s)
    }
    score += 0.1 * classId
    score += 0.1 * math.log(textLen + 1.0)
    score / 1.0 // total weight = 0.4+0.2+0.2+0.1+0.1
  }

  private def effectiveThreshold(n: Node, cfg: PruneConfig): Double =
    if (!cfg.dynamic) cfg.threshold
    else {
      val text = n.allText
      val textLen = text.replaceAll("\\s", "").length
      val tagLen = math.max(n.outerHtml.length, 1)
      val linkTextLen = n.elementChildren.filter(_.tag == "a").map(_.allText.trim.length).sum
      var t = cfg.threshold
      if (tagImportance.getOrElse(n.tag, 0.7) > 1) t *= 0.8
      if (textLen.toDouble / tagLen > 0.4) t *= 0.9
      if (textLen > 0 && linkTextLen.toDouble / textLen > 0.6) t *= 1.2
      t
    }

  /** Prune a parsed tree in place (returns surviving top-level blocks'
    * HTML — the reference's content_blocks list).
    */
  def pruneHtml(html: String, cfg: PruneConfig = PruneConfig()): Seq[String] = {
    val root = Dom.parse(html)
    val body = root.descendants.find(_.tag == "body").getOrElse(root)

    def strip(n: Node): Unit = {
      n.children = n.children.filterNot(c => !c.isText && excludedTags.contains(c.tag))
      n.children.foreach(c => if (!c.isText) strip(c))
    }
    strip(body)

    def prune(n: Node): Boolean = { // true = keep
      val score = compositeScore(n, cfg)
      if (score < effectiveThreshold(n, cfg)) false
      else {
        n.children = n.children.filter(c => c.isText || prune(c))
        true
      }
    }
    body.children = body.children.filter(c => c.isText || prune(c))
    body.elementChildren.filter(_.allText.nonEmpty).map(_.outerHtml)
  }

  /** Per-document BM25 chunk filter: score text chunks (block elements)
    * against the query with the simplified in-document BM25 the head filter
    * uses (filters.py:554-573 shape), weight by tag priority, keep chunks ≥
    * threshold, reassemble in document order.
    */
  final case class ChunkScore(index: Int, tag: String, text: String, score: Double)

  private val priorityTags = Map(
    "h1" -> 5.0, "h2" -> 4.0, "h3" -> 3.0, "title" -> 4.0, "strong" -> 2.0,
    "b" -> 1.5, "em" -> 1.5, "blockquote" -> 2.0, "code" -> 2.0, "pre" -> 1.5)
  private val chunkTags = Set("p", "article", "section", "li", "td", "pre",
    "blockquote", "h1", "h2", "h3", "h4", "h5", "h6", "div")

  /** `useStemming` mirrors the reference default: BM25ContentFilter stems
    * every corpus/query token with Snowball english before scoring
    * (content_filter_strategy.py:408,485-494).
    */
  def bm25Chunks(html: String, query: Seq[String], threshold: Double = 1.0,
                 k1: Double = 1.2, b: Double = 0.75,
                 useStemming: Boolean = true): Seq[ChunkScore] = {
    val root = Dom.parse(html)
    val body = root.descendants.find(_.tag == "body").getOrElse(root)
    val chunks = body.descendants
      .filter(n => chunkTags.contains(n.tag))
      .map(n => (n.tag, n.ownText))
      .filter(_._2.nonEmpty)
      .toVector
    if (chunks.isEmpty) return Nil
    def norm(t: String) =
      if (useStemming) graft.ops.Stem.snowball(t.toLowerCase) else t.toLowerCase
    val qTerms = query.map(norm).distinct
    def toks(s: String) =
      s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).map(norm).toSeq
    val docs = chunks.map { case (_, t) => toks(t) }
    val nDocs = docs.size
    val avgdl = docs.map(_.size).sum.toDouble / nDocs
    val dfMap = qTerms.map(q => q -> docs.count(_.contains(q))).toMap
    chunks.zipWithIndex.flatMap { case ((tag, text), i) =>
      val d = docs(i)
      val score = qTerms.map { q =>
        val tf = d.count(_ == q).toDouble
        val df = dfMap(q)
        if (tf == 0 || df == 0) 0.0
        else {
          val idf = math.log((nDocs - df + 0.5) / (df + 0.5) + 1.0)
          idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * d.size / avgdl))
        }
      }.sum * priorityTags.getOrElse(tag, 1.0)
      if (score >= threshold) Some(ChunkScore(i, tag, text, score)) else None
    }
  }

  /** Relational chunk-filter pipeline over a docs table (SURVEY.md §2.7):
    * explode chunks → score → filter → reassemble per doc in chunk order
    * via collect_list over a sorted window.
    */
  def bm25ChunkPipeline(docs: DataFrame, idCol: String, chunksCol: String,
                        query: Seq[String], threshold: Double): DataFrame = {
    val exploded = docs.select(col(idCol).as("doc_id"),
      posexplode(col(chunksCol)).as(Seq("chunk_index", "chunk")))
    val qTerms = query.map(_.toLowerCase).distinct
    val hits = qTerms.map(q =>
      size(filter(TextAnalysis.tokens(col("chunk")), t => t === q)))
      .reduce(_ + _)
    val scored = exploded.withColumn("score", hits.cast("double"))
      .where(col("score") >= threshold)
    scored
      .withColumn("kept", collect_list(col("chunk")).over(
        Window.partitionBy("doc_id").orderBy("chunk_index")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .groupBy("doc_id")
      .agg(first("kept").as("fit_chunks"), count(lit(1)).as("n_kept"))
  }
}
