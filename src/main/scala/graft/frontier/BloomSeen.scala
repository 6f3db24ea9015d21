package graft.frontier

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter
import java.nio.file.{Files, Path}

/** Bloom pre-filter for the URL-seen set (reference's experimental bloom
  * frontier, /root/reference/crawl4ai/deep_crawling/crazy.py:102-165,
  * re-expressed on Spark's sketch library).
  *
  * Exact dedup stays a `left_anti` join on `url_hash`; the bloom filter's job
  * is to keep DEFINITELY-NEW candidates out of that join's shuffle: at
  * 10^10-URL scale most discovered links are new, so the anti-join only
  * shuffles the (small) maybe-seen fraction plus false positives (~fpp).
  *
  * Blooms are INCREMENTAL: each epoch builds a bloom over that epoch's seen
  * DELTA only (never re-aggregating history), and the check consults the
  * vector of per-epoch blooms. Every `seenCompactEvery` epochs the crawl loop
  * compacts the deltas and replaces the vector with one full-set bloom, which
  * bounds both the vector length and the effective false-positive rate
  * (k deltas at fpp each ≈ k·fpp combined — acceptable for a pre-filter whose
  * misses only cost anti-join shuffle volume, never correctness).
  */
object BloomSeen {

  /** Build a bloom over a LongType column (distributed treeAggregate —
    * `DataFrame.stat.bloomFilter` — no driver-side row collection).
    */
  def build(df: DataFrame, colName: String, expectedItems: Long,
            fpp: Double = 0.03): BloomFilter =
    df.stat.bloomFilter(colName, math.max(expectedItems, 64L), fpp)

  /** An empty bloom (used for epochs whose seen delta has no rows). */
  def empty(fpp: Double = 0.03): BloomFilter = BloomFilter.create(64L, fpp)

  def save(bloom: BloomFilter, path: Path): Unit = {
    val tmp = path.resolveSibling("." + path.getFileName.toString + ".tmp")
    val os = Files.newOutputStream(tmp)
    try bloom.writeTo(os) finally os.close()
    Files.move(tmp, path, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  def load(path: Path): BloomFilter = {
    val is = Files.newInputStream(path)
    try BloomFilter.readFrom(is) finally is.close()
  }

  /** Split `candidates` into (definitelyNew, maybeSeen) by a vector of
    * per-epoch blooms — one implementation lives in [[SeenFilters]] (the
    * broadcast/split/anti-join machinery is filter-family-agnostic); these
    * delegating forms keep the bloom-typed surface for tests.
    */
  def split(spark: SparkSession, candidates: DataFrame, hashCol: String,
            blooms: Seq[BloomFilter]): (DataFrame, DataFrame) = {
    val (a, b, _) = SeenFilters.splitTracked(spark, candidates, hashCol,
      blooms.map(new BloomDelta(_)))
    (a, b)
  }

  /** Bloom-accelerated anti-join: rows of `candidates` whose `hashCol` is not
    * present in `seen` — equivalent to a plain left_anti join, but only the
    * maybe-seen slice shuffles. Delegates to [[SeenFilters.antiJoinTracked]].
    */
  def antiJoin(spark: SparkSession, candidates: DataFrame, seen: DataFrame,
               hashCol: String, blooms: Seq[BloomFilter]): DataFrame =
    SeenFilters.antiJoinTracked(spark, candidates, seen, hashCol,
      blooms.map(new BloomDelta(_)))._1

  /** Single-bloom convenience overload (kept for the property suite). */
  def antiJoin(candidates: DataFrame, seen: DataFrame, hashCol: String,
               bloom: BloomFilter): DataFrame =
    antiJoin(candidates.sparkSession, candidates, seen, hashCol, Seq(bloom))
}
