package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for corpus-mixture curation (domain balancing,
  * ablation subsets, eval holdouts). No RNG anywhere: selection is a pure
  * function of (salt, row key), so a re-run — or a job resumed from
  * checkpoint on different partitioning — picks the identical sample. That
  * reproducibility is the property a 100 TB pipeline actually needs, and it
  * is what `df.sample()` (seeded per-partition XORShift, partitioning-
  * dependent) cannot give.
  */
object Sampling {

  /** md5 of salt|key as a 32-hex-char string: a uniform 128-bit value whose
    * LEXICOGRAPHIC order equals its numeric order — comparable bit-for-bit
    * in any engine (the DuckDB oracle twins compare the same strings).
    */
  private def hashOf(keyCol: Column, salt: String): Column =
    md5(concat_ws("|", lit(salt), keyCol.cast("string")))

  /** Per-stratum quota sample: the `quota` rows of each stratum ranking
    * first by md5(salt|key) — uniform within the stratum, deterministic,
    * exact quota (never the expected-count approximation of fraction
    * sampling). One shuffle on the stratum key; the rank filter is pushed
    * into the sort as WindowGroupLimit, so a billion-row stratum keeps a
    * bounded per-partition heap instead of a full sort.
    *
    * @return input rows of the sample with `sample_rank` (1-based within
    *         stratum) appended
    */
  def stratifiedQuota(df: DataFrame, stratumCol: String, keyCol: String,
                      quota: Int, salt: String = ""): DataFrame = {
    require(quota >= 1, "quota must be >= 1")
    val rank = row_number().over(
      Window.partitionBy(col(stratumCol))
        .orderBy(hashOf(col(keyCol), salt), col(keyCol).cast("string")))
    df.withColumn("sample_rank", rank).where(col("sample_rank") <= quota)
  }

  /** Deterministic Bernoulli sample: keep rows whose 128-bit key hash falls
    * below fraction·2^128 (hash-threshold sampling). A pure filter — no
    * shuffle, no state — and membership is stable across runs and across
    * datasets sharing the key space, so derived tables sampled with the
    * same salt stay join-consistent (the trick behind consistent sampling
    * in large pipelines).
    */
  def hashFraction(df: DataFrame, keyCol: String, fraction: Double,
                   salt: String = ""): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0,1]")
    if (fraction >= 1.0) df
    else {
      // fraction·2^128 as a 32-hex-char string, 62 bits of precision
      val t = ((BigInt((fraction * (1L << 62)).toLong) << 128) >> 62).toString(16)
      val threshold = "0" * (32 - t.length) + t
      df.where(hashOf(col(keyCol), salt) < lit(threshold))
    }
  }

  /** Temperature-controlled mixture resampling over a stratum column — the
    * domain-mixing step of corpus assembly (the Pile / LLaMA-family source
    * weighting; CCNet's per-language balancing). Stratum s with n_s rows is
    * kept with per-row probability f_s = min(1, fraction·N·q_s/n_s), where
    * q_s ∝ n_s^τ: τ = 1 preserves the natural mixture, τ = 0 equalizes
    * strata, τ ∈ (0,1) flattens toward rare domains. Down-sampling only
    * (f_s caps at 1; repetition-based upsampling is a separate decision).
    *
    * Selection is the same deterministic hash filter as [[hashFraction]]
    * with a per-stratum cutoff: keep iff the 60-bit md5(salt|key) prefix
    * < floor(f_s·2^60). One count aggregation, a driver-side weight table
    * (strata cardinality is a mixture config — bounded), a broadcast join,
    * and a scan-stage compare — the corpus itself never shuffles.
    *
    * ENGINE-EXACT at τ = 0.5 (the common flattening choice): stratum
    * weights quantize to integers (floor(√n_s·2^20), IEEE sqrt is
    * correctly rounded everywhere), their sum is an exact integer in any
    * order, and the threshold arithmetic is fixed-parenthesization IEEE —
    * the DuckDB twin reproduces every kept row bit-for-bit. Other τ use
    * StrictMath.pow (JVM-reproducible; cross-engine only to libm's pow).
    */
  def temperatureSample(df: DataFrame, stratumCol: String, keyCol: String,
                        temperature: Double, fraction: Double,
                        salt: String = ""): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0,1]")
    require(temperature >= 0.0 && temperature <= 1.0, "temperature in [0,1]")
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.groupBy(col(stratumCol).cast("string").as("__s"))
      .agg(count(lit(1)).as("__n"))
      .as[(String, Long)].collect().sortBy(_._1)
    val wq = counts.map { case (_, n) =>
      math.floor(StrictMath.pow(n.toDouble, temperature) * (1L << 20)).toLong }
    val nTotal = counts.map(_._2).sum
    val wTotal = wq.sum
    val thresholds = counts.zip(wq).map { case ((s, n), w) =>
      // fixed parenthesization, mirrored by the SQL twin
      val f = math.min(1.0,
        fraction * ((nTotal.toDouble * w.toDouble) / (wTotal.toDouble * n.toDouble)))
      (s, math.floor(f * 1152921504606846976.0 /* 2^60 */).toLong)
    }.toSeq.toDF("__s", "__t")
    df.join(broadcast(thresholds), col(stratumCol).cast("string") === col("__s"))
      .where(conv(substring(hashOf(col(keyCol), salt), 1, 15), 16, 10)
        .cast("long") < col("__t"))
      .drop("__s", "__t")
  }

  /** Deterministic repeat-factor upsampling — the other half of mixture
    * weighting ([[temperatureSample]] only down-samples): stratum s with
    * repeat factor w_s emits floor(w_s) copies of every row plus one more
    * with probability frac(w_s) (the Pile/LLaMA-family "epoch multiplier"
    * for high-quality domains). Each copy carries a `copy_id` so downstream
    * shuffling can interleave copies instead of clustering them.
    *
    * Arithmetic is integer-exact across engines: factors quantize to
    * wq = floor(w·2^20); base copies = wq div 2^20; the fractional copy
    * keeps iff the row's 60-bit md5(salt|key) prefix < (wq mod 2^20)·2^40.
    * Shape: broadcast factor table + scan-stage explode — the corpus never
    * shuffles, output size is Σ n_s·w_s by construction.
    */
  def upsampleRepeat(df: DataFrame, stratumCol: String, keyCol: String,
                     factors: Map[String, Double], salt: String = ""): DataFrame = {
    require(factors.values.forall(w => w >= 0.0 && w < 1024.0),
      "repeat factors must be in [0, 1024)")
    val spark = df.sparkSession
    import spark.implicits._
    val fq = factors.toSeq.sortBy(_._1)
      .map { case (s, w) => (s, math.floor(w * 1048576.0).toLong) }
      .toDF("__s", "__wq")
    val h60 = conv(substring(hashOf(col(keyCol), salt), 1, 15), 16, 10).cast("long")
    df.join(broadcast(fq), col(stratumCol).cast("string") === col("__s"), "left")
      .withColumn("__wq", coalesce(col("__wq"), lit(1048576L))) // absent: w = 1
      .withColumn("__n",
        (col("__wq") / 1048576L).cast("long") +
          when(h60 < (col("__wq") % 1048576L) * 1099511627776L, 1L).otherwise(0L))
      .where(col("__n") > 0)
      .withColumn("copy_id", explode(sequence(lit(0L), col("__n") - 1)))
      .drop("__s", "__wq", "__n")
  }

  /** Deterministic train/validation/test splitting: each row gets the label
    * of the hash-range bucket its 60-bit md5(salt|key) prefix falls in,
    * with bucket widths ∝ the requested weights. A pure projection — no
    * shuffle, no state — and, like [[hashFraction]], membership depends
    * only on (salt, key), so every derived table splits consistently (a
    * document's features can never leak from train to test because some
    * job re-split differently).
    */
  def splitByHash(df: DataFrame, keyCol: String,
                  splits: Seq[(String, Double)], salt: String = ""): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 >= 0.0), "weights must be >= 0")
    val total = splits.map(_._2).sum
    // all-zero weights would make every cut NaN and silently label every row
    // with the last split name
    require(total > 0.0, "split weights must sum to > 0")
    val cuts = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }.tail
    val h60 = conv(substring(hashOf(col(keyCol), salt), 1, 15), 16, 10).cast("long")
    // fixed parenthesization: floor(cum · 2^60), mirrored by SQL twins
    val label = splits.map(_._1).zip(cuts).init.foldRight(
        lit(splits.last._1)) { case ((name, cum), rest) =>
      when(h60 < math.floor(cum * 1152921504606846976.0).toLong, name).otherwise(rest)
    }
    df.withColumn("split", label)
  }

  /** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
    * arXiv:2302.03169): pick the `k` raw documents that look most like a
    * TARGET corpus, by importance weight under bag-of-hashed-ngram language
    * models. Features are words hashed into 16^`hexChars` buckets (the md5
    * hex prefix — engine-portable, the paper hashes into 10^4 buckets);
    * each corpus gets an add-λ-smoothed unigram model over buckets;
    * log w(x) = Σ_w [ln p̂_target(b(w)) − ln p̂_raw(b(w))]; selection is
    * Gumbel top-k (g = −ln(−ln u) with u a deterministic md5 hash of the
    * id — so "sampling without replacement ∝ w" is a pure function of the
    * salt, the paper's resampling made reproducible).
    *
    * Scale shape: two passes over the raw corpus (model fit, then scoring —
    * DSIR is two-pass by construction) and one over the target. The bucket
    * count tables (≤ 16^hexChars rows) are materialized once and broadcast
    * into the scoring pass; per-doc weights are one partial-aggregated
    * shuffle on the doc id; selection is TakeOrdered, never a global sort.
    * Nothing driver-side exceeds the bucket-table size.
    *
    * @return the selected rows: (id, log_weight rounded to 4 — the noised
    *         Gumbel key itself is selection state, not output)
    */
  def dsirResample(raw: DataFrame, target: DataFrame, idCol: String,
                   textCol: String, k: Int, hexChars: Int = 2,
                   lambda: Double = 1.0, salt: String = ""): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(hexChars >= 1 && hexChars <= 6, "hexChars in [1,6]")
    val nBuckets = math.pow(16.0, hexChars) // exact integer for hexChars <= 6
    def words(c: Column) = filter(split(lower(c), "[^a-z]+"), w => w =!= "")
    def bucket(w: Column) = substring(md5(w), 1, hexChars)

    val rawWords = raw.select(col(idCol).as("id"),
      explode(words(col(textCol))).as("w"))
    val rb = rawWords.groupBy(bucket(col("w")).as("b"))
      .agg(count(lit(1)).as("cr")).localCheckpoint(false)
    val tb = target.select(explode(words(col(textCol))).as("w"))
      .groupBy(bucket(col("w")).as("b"))
      .agg(count(lit(1)).as("ct")).localCheckpoint(false)
    val tot = rb.agg(sum(col("cr")).cast("double").as("nr"))
      .crossJoin(tb.agg(sum(col("ct")).cast("double").as("nt")))
    val model = rb.join(tb, Seq("b"), "full_outer")
      .crossJoin(broadcast(tot))
      .select(col("b"),
        (log((coalesce(col("ct"), lit(0L)) + lambda) / (col("nt") + lambda * nBuckets))
          - log((coalesce(col("cr"), lit(0L)) + lambda) / (col("nr") + lambda * nBuckets)))
          .as("lw"))
    val docWeights = rawWords
      .join(broadcast(model), bucket(col("w")) === col("b"))
      .groupBy("id").agg(sum(col("lw")).as("logw"))
    // deterministic Gumbel noise from the 60-bit hash prefix, u ∈ (0,1)
    val u = (conv(substring(hashOf(col("id"), salt + "|g"), 1, 15), 16, 10)
      .cast("long").cast("double") + 0.5) / 1152921504606846976.0
    raw.select(col(idCol).as("id"))
      .join(docWeights, Seq("id"), "left")
      .select(col("id"), coalesce(col("logw"), lit(0.0)).as("logw"),
        (-log(-log(u))).as("g"))
      .orderBy((col("logw") + col("g")).desc, col("id"))
      .limit(k)
      .select(col("id").as(idCol), round(col("logw"), 4).as("log_weight"))
  }
}
