package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Knobs for [[Curate.curateCorpus]]. Defaults are the common
  * Gopher/C4-family settings; every gate can be disabled by setting it
  * past its domain (fraction gates to 1.0, `fuzzy = "none"`, `spanK = 0`,
  * `sampleFraction = 1.0`).
  *
  * @param fuzzy near-dup stage: "minhash" (MinHash+LSH banding — the scale
  *              path), "jaccard" (exact n-gram Jaccard over an inverted
  *              index — fully SQL-oracle-able), "embedding" (semantic
  *              near-dup through the Embedder seam; fuzzyThreshold is the
  *              cosine floor), or "none"
  * @param spanK corpus-level substring dedup gram size (Lee et al. 2021);
  *              when > 0 the text column is REPLACED by the normalized
  *              reassembled `clean_text` (lowercased, letter tokens)
  * @param c4Lines when true, stage 0 applies the C4 line rules
  *                ([[TextAnalysis.c4Clean]]): boilerplate lines are stripped
  *                from the text (which all later gates then see) and
  *                lorem-ipsum/brace/too-few-line documents are dropped —
  *                a pure scan-stage projection, fused into the gate scan
  */
final case class CurateConfig(
    c4Lines: Boolean = false,
    c4MinWordsPerLine: Int = 5,
    c4MinLines: Int = 3,
    blockTerms: Seq[String] = Nil,
    minQuality: Double = 0.5,
    maxDupLineFrac: Double = 0.5,
    maxTopGramFrac: Double = 0.3,
    maxDupGramFrac: Double = 0.3,
    fuzzy: String = "minhash",
    fuzzyThreshold: Double = 0.8,
    fuzzyN: Int = 3,
    /** MinHash signature basis: "xxh64" (production) or "md5" (the
      * SQL-derivable twin — lets a whole minhash pipeline be oracled). */
    minhashBasis: String = "xxh64",
    /** Independent sign-bucket plane families for the embedding fuzzy path:
      * recall = 1 − (1 − r^planes)^bands, so more bands close the LSH
      * recall gap at the cost of that many more bucket joins. */
    embeddingBands: Int = 3,
    spanK: Int = 0,
    benchK: Int = 13,
    sampleFraction: Double = 1.0,
    salt: String = "graft")

/** The end-to-end training-corpus curation pipeline, composed from the
  * individually-oracled operators in declared order:
  *
  *   0. optional blocklist drop (per-token membership, C4's word-boundary
  *      rule) + optional C4 line cleaning — boilerplate lines stripped,
  *      code/lorem docs dropped (scan-stage projections, fused with stage 1)
  *   1. scan gates — quality score + Gopher repetition signals
  *      (dup-line / top-2-gram / dup-10-gram char fractions)
  *   2. exact dedup — smallest id per identical content survives
  *   3. fuzzy dedup — near-dup clustering, canonical (min-id) doc survives
  *   4. optional corpus span dedup — repeated k-gram spans removed
  *   5. optional benchmark decontamination — any doc sharing a benchK-gram
  *      with the eval corpus is dropped
  *   6. deterministic hash-fraction sample
  *
  * `idCol` must be castable to a 64-bit integer (the engine's
  * content-addressing convention — `xxhash64` of the canonical URL for
  * crawled docs): component labeling runs over long node ids.
  *
  * Stage boundaries with more than one downstream consumer are
  * materialized (lazy `localCheckpoint`): the gate+exact-dedup survivor
  * set feeds the fuzzy pair generator, the cluster labeler, AND the
  * survivor semi-join — left lazy, Spark would re-run the quality gates
  * over the full corpus once per consumer, which at 100 TB turns a
  * one-pass pipeline into four corpus scans. Within a stage everything
  * stays one lazy plan so Catalyst still fuses the scan-stage gates.
  */
object Curate {

  /** Stage 0 as a reusable scan-stage projection: blocklist drop + optional
    * C4 line cleaning (dropped docs filter out, kept lines rebuild the text
    * column in place). Shared by the batch pipeline AND the streaming gate
    * ([[graft.streaming.StreamCurate]]) so the two can never drift — all
    * stateless Columns, safe on a streaming DataFrame. */
  def stage0(docs: DataFrame, textCol: String, cfg: CurateConfig): DataFrame = {
    val blocked =
      if (cfg.blockTerms.nonEmpty)
        docs.where(!TextAnalysis.blocklistHit(col(textCol), cfg.blockTerms))
      else docs
    if (cfg.c4Lines) {
      val kept = TextAnalysis.c4KeptLines(col(textCol), cfg.c4MinWordsPerLine)
      blocked.withColumn("__c4_kept", kept)
        .where(!TextAnalysis.c4DocDropped(col(textCol), col("__c4_kept"),
          cfg.c4MinLines))
        .withColumn(textCol, array_join(col("__c4_kept"), "\n"))
        .drop("__c4_kept")
    } else blocked
  }

  def curateCorpus(docs: DataFrame, idCol: String, textCol: String,
                   bench: Option[DataFrame] = None,
                   benchTextCol: String = "text",
                   cfg: CurateConfig = CurateConfig(),
                   embedder: Embedder = Embedder.default): DataFrame = {
    // 0. blocklist + optional C4 line cleaning — a projection, not a join,
    // fused by Catalyst with the stage-1 gates (shared with the stream)
    val base = stage0(docs, textCol, cfg)

    // 1. scan-stage gates
    val rep = TextAnalysis.repetitionSignals(base, idCol, textCol,
        topNs = Seq(2), dupNs = Seq(10))
      .select(col(idCol), col("dup_line_frac"), col("top2_gram_frac"),
        col("dup10_gram_frac"))
    val gated = base
      .withColumn("quality", TextAnalysis.qualityScore(col(textCol)))
      .join(rep, Seq(idCol))
      .where(col("quality") >= cfg.minQuality &&
             col("dup_line_frac") <= cfg.maxDupLineFrac &&
             col("top2_gram_frac") <= cfg.maxTopGramFrac &&
             col("dup10_gram_frac") <= cfg.maxDupGramFrac)

    // 2. exact dedup. Materialized (lazy checkpoint, computed once on first
    // action) because every later stage — fuzzy pairs, cluster labels, the
    // canonical semi-join, span dedup, decontamination — re-reads this
    // survivor set; without it the gate subplan re-executes per consumer.
    val exactKept = gated.join(
        Dedup.exact(gated, idCol, textCol).select(idCol), Seq(idCol), "left_semi")
      .localCheckpoint(false)

    // 3. fuzzy dedup — canonical survivor per near-dup component
    val fuzzyKept = cfg.fuzzy match {
      case "none" => exactKept
      case kind =>
        val pairs = kind match {
          case "jaccard" => Dedup.ngramJaccardPairs(exactKept, idCol, textCol,
            n = cfg.fuzzyN, minJaccard = cfg.fuzzyThreshold)
          case "minhash" => Dedup.minHashLsh(exactKept, idCol, textCol,
            shingleLen = cfg.fuzzyN, minEstJaccard = cfg.fuzzyThreshold,
            basis = cfg.minhashBasis)
          // semantic near-dup via the pluggable Embedder seam: vectors are
          // computed in-plan, blocked by banded sign-buckets, verified by
          // exact cosine at fuzzyThreshold
          case "embedding" => Dedup.embeddingNearDupText(exactKept, idCol,
            textCol, embedder, minCosine = cfg.fuzzyThreshold,
            bands = cfg.embeddingBands, targetBucketSize = 64)
            .select(col("id_a"), col("id_b"))
          case other => throw new IllegalArgumentException(
            s"unknown fuzzy stage '$other' (minhash | jaccard | embedding | none)")
        }
        val canonical = Dedup.clusterLabels(exactKept, idCol, pairs)
          .where(col("is_canonical")).select(col(idCol))
        exactKept.join(canonical, Seq(idCol), "left_semi")
    }
    // same multi-consumer shape downstream: span dedup / decontamination
    // each join the survivor set back to itself
    val fuzzyMat =
      if (cfg.fuzzy != "none" && (cfg.spanK > 0 || bench.isDefined))
        fuzzyKept.localCheckpoint(false)
      else fuzzyKept

    // 4. corpus span dedup (optional): text becomes the cleaned normalized form
    val spanned =
      if (cfg.spanK > 0) {
        val sd = Dedup.spanDedup(fuzzyMat, idCol, textCol, cfg.spanK)
          .select(col(idCol), col("n_removed"), col("clean_text"))
        fuzzyMat.drop(textCol).join(sd, Seq(idCol))
          .withColumnRenamed("clean_text", textCol)
      } else fuzzyMat.withColumn("n_removed", lit(0L))

    // 5. benchmark decontamination (optional). The span-deduped text is
    // consumed by the contamination scan AND the survivor semi-join.
    val spannedMat =
      if (cfg.spanK > 0 && bench.isDefined) spanned.localCheckpoint(false)
      else spanned
    val cleaned = bench match {
      case Some(b) =>
        val clean = Dedup.contamination(spannedMat, idCol, textCol, b,
            benchTextCol, cfg.benchK)
          .where(!col("is_contaminated")).select(col(idCol))
        spannedMat.join(clean, Seq(idCol), "left_semi")
      case None => spannedMat
    }

    // 6. deterministic sample
    Sampling.hashFraction(cleaned, idCol, cfg.sampleFraction, cfg.salt)
  }
}
