package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed n-gram language model with STUPID BACKOFF (Brants et al.
  * 2007, "Large Language Models in Machine Translation") — the canonical
  * web-scale LM used to quality-score training corpora when Kneser-Ney
  * normalization is too expensive to distribute:
  *
  *   S(w | w₋₂w₋₁) = c(w₋₂w₋₁w)/c(w₋₂w₋₁)          if the trigram was seen
  *                  = 0.4·S(w | w₋₁)                otherwise
  *   S(w | w₋₁)    = c(w₋₁w)/c(w₋₁)                 if the bigram was seen
  *                  = 0.4·S(w)                      otherwise
  *   S(w)          = c(w)/N, floor 1/N for OOV
  *
  * Training is one explode + one partial-aggregated groupBy per order;
  * scoring is five equi-joins of position rows against the count table
  * (at 100 TB the count table is the small side for orders ≥ 2 after
  * frequency pruning, and AQE handles the hot-gram skew on order 1).
  *
  * EXACT-ORACLE DESIGN: per-token scores are quantized to integer
  * billionths — `floor(S·10⁹)` — and summed as longs, so the result is
  * bit-exact across engines and partition orders. S itself uses only IEEE
  * division and multiplication by the 0.4 literal (no transcendental
  * functions), so any engine computing the same formula over the same
  * counts produces the identical integer. No float-sum nondeterminism.
  */
object NgramLm {

  /** Count tables for orders 1..maxOrder: one row per (order, gram, cnt).
    * Order-1 grams are single tokens; the corpus token total N is the row
    * (0, "", N) so the model ships as ONE dataframe.
    */
  def train(df: DataFrame, textCol: String, maxOrder: Int = 3): DataFrame = {
    require(maxOrder >= 1 && maxOrder <= 3, "orders 1..3 supported")
    val toks = TextAnalysis.tokens(col(textCol))
    val perOrder = (1 to maxOrder).map { n =>
      df.select(explode(TextAnalysis.wordGrams(col(textCol), n)).as("gram"))
        .groupBy("gram").agg(count(lit(1)).as("cnt"))
        .select(lit(n).as("order"), col("gram"), col("cnt"))
    }
    val total = df.select(coalesce(sum(size(toks)), lit(0)).cast("long").as("cnt"))
      .select(lit(0).as("order"), lit("").as("gram"), col("cnt"))
    (perOrder :+ total).reduce(_ unionByName _)
  }

  /** Score every document of `df` against a trained count table: stupid
    * backoff from the trigram down, each token's S quantized to
    * `floor(S·10⁹)` and summed exactly.
    *
    * @return (id, n_tokens, n_tri_hits, n_oov, score_q9) — integers only;
    *         avg per-token score = score_q9 / n_tokens / 10⁹
    */
  def scoreStupidBackoff(df: DataFrame, idCol: String, textCol: String,
                         counts: DataFrame): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    // sequence(1, 0) DESCENDS in Spark — guard the empty-doc case explicitly
    val idxs = when(size(toks) >= 1, sequence(lit(1), size(toks)))
      .otherwise(slice(array(lit(1)), 1, 0))
    val pos = df.select(col(idCol).as("id"),
        explode(transform(idxs, i => struct(
          element_at(toks, i).as("w"),
          when(i >= 2, element_at(toks, i - 1)).as("prev"),
          when(i >= 2, concat_ws(" ", element_at(toks, i - 1),
            element_at(toks, i))).as("g2"),
          when(i >= 3, concat_ws(" ", element_at(toks, i - 2),
            element_at(toks, i - 1))).as("ctx3"),
          when(i >= 3, concat_ws(" ", element_at(toks, i - 2),
            element_at(toks, i - 1), element_at(toks, i))).as("g3")))).as("p"))
      .select(col("id"), col("p.w"), col("p.prev"), col("p.g2"),
        col("p.ctx3"), col("p.g3"))
    // each lookup table gets uniquely-named columns: five left joins of the
    // SAME count table would otherwise trip Spark's self-join ambiguity
    def cnts(n: Int, as: String) = counts.where(col("order") === n)
      .select(col("gram").as(s"gram_$as"), col("cnt").as(as))
    val nTotal = counts.where(col("order") === 0)
      .select(col("cnt").as("n_total"))
    val joined = pos
      .join(cnts(1, "c1"), col("w") === col("gram_c1"), "left")
      .join(cnts(1, "cprev"), col("prev") === col("gram_cprev"), "left")
      .join(cnts(2, "c2"), col("g2") === col("gram_c2"), "left")
      .join(cnts(2, "cctx3"), col("ctx3") === col("gram_cctx3"), "left")
      .join(cnts(3, "c3"), col("g3") === col("gram_c3"), "left")
      .crossJoin(broadcast(nTotal))
    // the arithmetic below is mirrored EXACTLY by the SQL oracle — IEEE
    // division + literal multiplication only, fixed parenthesization
    val s1 = when(coalesce(col("c1"), lit(0L)) > 0,
        col("c1").cast("double") / col("n_total").cast("double"))
      .otherwise(lit(1.0) / col("n_total").cast("double"))
    val s2 = when(coalesce(col("c2"), lit(0L)) > 0,
        col("c2").cast("double") / col("cprev").cast("double"))
      .otherwise(lit(0.4) * s1)
    val s3 = when(coalesce(col("c3"), lit(0L)) > 0,
        col("c3").cast("double") / col("cctx3").cast("double"))
      .otherwise(lit(0.4) * s2)
    val s = when(col("g3").isNotNull, s3)
      .when(col("g2").isNotNull, s2)
      .otherwise(s1)
    val perDoc = joined
      .select(col("id"),
        floor(s * lit(1000000000.0)).as("q9"),
        when(col("g3").isNotNull && coalesce(col("c3"), lit(0L)) > 0, 1L)
          .otherwise(0L).as("tri_hit"),
        when(coalesce(col("c1"), lit(0L)) === 0, 1L).otherwise(0L).as("oov"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("tri_hit")).as("n_tri_hits"),
        sum(col("oov")).as("n_oov"), sum(col("q9")).as("score_q9"))
    df.select(col(idCol).as("id"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_tri_hits"), lit(0L)).as("n_tri_hits"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        coalesce(col("score_q9"), lit(0L)).as("score_q9"))
  }

  /** CCNet-style quality bucketing (Wenzek et al. 2020, "CCNet: Extracting
    * High Quality Monolingual Datasets from Web Crawl Data"): split a
    * scored corpus into head / middle / tail by per-token LM score, with
    * the two cutoffs computed on a deterministic hash-sample — exactly how
    * CCNet derives its perplexity percentiles from a held-out slice rather
    * than globally sorting the corpus (a global sort of 10^11 docs is the
    * thing this avoids; the bucket assignment itself is a scan-stage
    * comparison against two broadcast scalars).
    *
    * Per-doc metric: `avg_q9 = score_q9 div n_tokens` (integer division of
    * the quantized stupid-backoff total — exact in any engine). Cutoffs:
    * within the sample ordered by (avg_q9 DESC, id), the avg at rank
    * ceil(m·headFrac) opens `middle` and the avg at rank ceil(m·tailFrac)
    * opens `tail`; ties widen `head`/`middle` (fixed cutoff values, CCNet's
    * approximate-proportion semantics). An empty sample puts every doc in
    * `tail`.
    *
    * @param scored output of [[scoreStupidBackoff]] (or any frame with
    *               idCol, n_tokens, score_q9)
    * @return (idCol, avg_q9, bucket)
    */
  def ccnetBuckets(scored: DataFrame, idCol: String,
                   sampleFraction: Double = 0.1, salt: String = "graft",
                   headFrac: Double = 1.0 / 3,
                   tailFrac: Double = 2.0 / 3): DataFrame = {
    val av = scored.select(col(idCol),
      when(col("n_tokens") > 0, expr("score_q9 div n_tokens"))
        .otherwise(lit(0L)).as("avg_q9"))
    val samp = Sampling.hashFraction(av, idCol, sampleFraction, salt)
    // the sample is bounded by construction (CCNet uses a held-out slice);
    // the partitionless rank window runs over it, never the corpus
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("avg_q9").desc, col(idCol))
    val ranked = samp.select(col("avg_q9"),
      row_number().over(w).cast("long").as("rn"),
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy()).as("m"))
    val th = ranked.agg(
      max(when(col("rn") === ceil(col("m") * lit(headFrac)).cast("long"),
        col("avg_q9"))).as("t_head"),
      max(when(col("rn") === ceil(col("m") * lit(tailFrac)).cast("long"),
        col("avg_q9"))).as("t_tail"))
    av.crossJoin(broadcast(th))
      .select(col(idCol), col("avg_q9"),
        when(col("avg_q9") >= col("t_head"), lit("head"))
          .when(col("avg_q9") >= col("t_tail"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }
}
