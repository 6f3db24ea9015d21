package graft.frontier

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom pre-filter for the URL-seen set (reference's experimental bloom
  * frontier, /root/reference/crawl4ai/deep_crawling/crazy.py:102-165,
  * re-expressed on Spark's sketch library).
  *
  * Exact dedup stays a `left_anti` join on `url_hash`; the bloom filter's job
  * is to keep DEFINITELY-NEW candidates out of that join's shuffle: at
  * 10^10-URL scale most discovered links are new, so the anti-join only
  * shuffles the (small) maybe-seen fraction plus false positives (~fpp).
  */
object BloomSeen {

  /** Build a bloom over a LongType column (distributed treeAggregate —
    * `DataFrame.stat.bloomFilter` — no driver-side row collection).
    */
  def build(df: DataFrame, colName: String, expectedItems: Long,
            fpp: Double = 0.03): BloomFilter =
    df.stat.bloomFilter(colName, math.max(expectedItems, 64L), fpp)

  /** Split `candidates` into (definitelyNew, maybeSeen) by the bloom. The
    * filter object rides to executors as a broadcast task binary; the
    * predicate is a cheap deterministic UDF over the hash column.
    */
  def split(candidates: DataFrame, hashCol: String, bloom: BloomFilter)
      : (DataFrame, DataFrame) = {
    val mightContain = udf((h: Long) => bloom.mightContainLong(h)).asNondeterministic()
    val flagged = candidates.withColumn("__maybe_seen", mightContain(col(hashCol)))
    (flagged.where(!col("__maybe_seen")).drop("__maybe_seen"),
      flagged.where(col("__maybe_seen")).drop("__maybe_seen"))
  }

  /** Bloom-accelerated anti-join: rows of `candidates` whose `hashCol` is not
    * present in `seen` — equivalent to a plain left_anti join, but only the
    * maybe-seen slice shuffles.
    */
  def antiJoin(candidates: DataFrame, seen: DataFrame, hashCol: String,
               bloom: BloomFilter): DataFrame = {
    val (definitelyNew, maybeSeen) = split(candidates, hashCol, bloom)
    val survivors = maybeSeen.join(seen, Seq(hashCol), "left_anti")
    definitelyNew.unionByName(survivors)
  }
}
