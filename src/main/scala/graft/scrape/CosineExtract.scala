package graft.scrape

import graft.ops.{Embed, Embedder}

/** Semantic-cluster extraction — the re-expression of the reference's
  * CosineStrategy (/root/reference/crawl4ai/extraction_strategy.py:121-461):
  *
  *  1. chunks = the page's text sections (span texts in our model);
  *  2. semantic pre-filter: cosine(query, chunk) ≥ simThreshold, backfilled
  *     to at_least_k = min(20, n/2) best-remaining by similarity (:227-280);
  *  3. agglomerative clustering over pairwise cosine distances with a
  *     Lance-Williams linkage update (ward default, like scipy's
  *     linkage+fcluster), cut at cophenetic distance maxDist (:339-362);
  *  4. clusters grouped in input order, dropped under wordCountThreshold,
  *     emitted sorted by cluster label (:364-432).
  *
  * The reference's final multilabel classifier tags come from an external
  * model; here tags are the cluster's topKTags most frequent non-stopword
  * tokens (clearly-marked stand-in, same output shape). Embeddings come from
  * the [[graft.ops.Embedder]] seam (deterministic hashed-BoW stub by
  * default; a real model drops in via `Config.embedder`).
  *
  * Per-document chunk counts are bounded (page sections), so the O(n³)
  * driver-free clustering runs inside a typed map — one row in, one cluster
  * list out, no shuffle; at corpus scale documents parallelize per-row.
  */
object CosineExtract {

  final case class Cluster(index: Int, tags: Seq[String], content: String)

  final case class Config(
      semanticFilter: Option[String] = None,
      wordCountThreshold: Int = 10,
      maxDist: Double = 0.2,
      linkage: String = "ward",
      simThreshold: Double = 0.3,
      topKTags: Int = 3,
      /** The embedding kernel ([[graft.ops.Embedder]] seam); a real model
        * drops in here without touching the strategy. */
      embedder: Embedder = Embedder.default)

  // ---- semantic pre-filter (filter_documents_embeddings) --------------------

  def filterBySimilarity(chunks: Seq[String], query: String, cfg: Config): Seq[String] =
    filterBySimilarityEmb(chunks, query, cfg, cfg.embedder.embed)

  private def filterBySimilarityEmb(chunks: Seq[String], query: String,
      cfg: Config, emb: String => Array[Float]): Seq[String] = {
    if (chunks.isEmpty) return chunks
    val atLeastK = if (chunks.length < 20) chunks.length / 2 else 20
    val q = cfg.embedder.embed(query)
    val sims = chunks.map(c => Embed.cosine(q, emb(c)))
    val zipped = chunks.zip(sims)
    val kept = zipped.filter(_._2 >= cfg.simThreshold)
    val result =
      if (kept.length < atLeastK)
        kept ++ zipped.filter(_._2 < cfg.simThreshold)
          .sortBy(-_._2).take(atLeastK - kept.length)
      else kept
    result.map(_._1).take(atLeastK)
  }

  // ---- agglomerative clustering (linkage + fcluster twin) -------------------

  /** Flat cluster labels from agglomerative clustering of a condensed
    * distance matrix, cutting merges at height `t` (scipy
    * fcluster(criterion="distance") on a monotone linkage). Labels are
    * assigned by first appearance in input order (deterministic).
    */
  def agglomerate(dist: Array[Array[Double]], method: String, t: Double): Array[Int] = {
    val n = dist.length
    if (n == 0) return Array.empty
    val active = scala.collection.mutable.LinkedHashSet(0 until n: _*)
    val size = Array.fill(n)(1)
    val members = Array.tabulate(n)(i => List(i))
    val d = Array.tabulate(n, n)((i, j) => dist(i)(j))

    var done = false
    while (!done && active.size > 1) {
      var bi = -1; var bj = -1; var best = Double.MaxValue
      val act = active.toArray
      var x = 0
      while (x < act.length) {
        var y = x + 1
        while (y < act.length) {
          val dij = d(act(x))(act(y))
          if (dij < best) { best = dij; bi = act(x); bj = act(y) }
          y += 1
        }
        x += 1
      }
      if (best > t) done = true
      else {
        // Lance-Williams update of every other active cluster's distance to
        // the merged cluster (stored at slot bi)
        val ni = size(bi).toDouble; val nj = size(bj).toDouble
        active.foreach { k =>
          if (k != bi && k != bj) {
            val nk = size(k).toDouble
            val dik = d(bi)(k); val djk = d(bj)(k); val dij = d(bi)(bj)
            val nd = method match {
              case "single" => math.min(dik, djk)
              case "complete" => math.max(dik, djk)
              case "average" => (ni * dik + nj * djk) / (ni + nj)
              case _ => // ward (scipy's formula on a precomputed dissimilarity)
                math.sqrt(((ni + nk) * dik * dik + (nj + nk) * djk * djk
                  - nk * dij * dij) / (ni + nj + nk))
            }
            d(bi)(k) = nd; d(k)(bi) = nd
          }
        }
        size(bi) += size(bj)
        members(bi) = members(bi) ++ members(bj)
        active -= bj
      }
    }

    val labels = new Array[Int](n)
    // label clusters by their smallest member index, numbered in that order
    val clusters = active.toSeq.map(c => members(c)).sortBy(_.min)
    clusters.zipWithIndex.foreach { case (ms, lbl) => ms.foreach(labels(_) = lbl + 1) }
    labels
  }

  def cosineDistances(embs: Seq[Array[Float]]): Array[Array[Double]] = {
    val n = embs.length
    Array.tabulate(n, n)((i, j) =>
      if (i == j) 0.0 else 1.0 - Embed.cosine(embs(i), embs(j)))
  }

  // ---- the full strategy ----------------------------------------------------

  private val tagStopwords = TextAnalysisStopwords.en

  def extract(sections: Seq[String], cfg: Config = Config()): Seq[Cluster] = {
    // one embedding per distinct chunk for BOTH the pre-filter and the
    // clustering pass (the embedder may be a real model — the dominant cost)
    val embCache = scala.collection.mutable.HashMap.empty[String, Array[Float]]
    def emb(c: String): Array[Float] = embCache.getOrElseUpdate(c, cfg.embedder.embed(c))
    val chunks = cfg.semanticFilter match {
      case Some(q) => filterBySimilarityEmb(sections, q, cfg, emb)
      case None => sections
    }
    if (chunks.isEmpty) return Nil
    val labels =
      if (chunks.length == 1) Array(1)
      else agglomerate(cosineDistances(chunks.map(emb)), cfg.linkage, cfg.maxDist)
    val grouped = scala.collection.mutable.LinkedHashMap.empty[Int, List[String]]
    chunks.zip(labels).foreach { case (c, l) =>
      grouped(l) = grouped.getOrElse(l, Nil) :+ c
    }
    grouped.toSeq
      .map { case (l, texts) => (l, texts.mkString(" ")) }
      .filter { case (_, content) => content.split("\\s+").count(_.nonEmpty) >= cfg.wordCountThreshold }
      .sortBy(_._1)
      .map { case (l, content) => Cluster(l, topTokens(content, cfg.topKTags), content) }
  }

  /** Classifier-tag stand-in: the cluster's most frequent non-stopword
    * tokens (ties broken alphabetically). */
  def topTokens(content: String, k: Int): Seq[String] =
    Embed.tokens(content).filterNot(tagStopwords)
      .groupBy(identity).view.mapValues(_.size).toSeq
      .sortBy { case (t, c) => (-c, t) }.take(k).map(_._1)
}

/** Stopword set shared with TextAnalysis (kept tiny and public-knowledge). */
private[scrape] object TextAnalysisStopwords {
  val en: Set[String] = Set("the", "a", "and", "of", "to", "in", "is", "it",
    "that", "was", "for", "on", "with", "as", "at", "by", "an", "be", "this",
    "are", "or", "from")
}
