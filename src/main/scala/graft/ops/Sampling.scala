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
}
