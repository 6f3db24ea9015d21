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
}
