package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bit-reproducible distributed PageRank over the crawl link graph — the
  * authority/centrality signal a web-corpus curation pipeline ranks hosts and
  * pages with (Common Crawl publishes exactly this kind of link-graph rank;
  * the reference approximates authority with URL heuristics in
  * `link_preview.py`'s scorer family, which we also implement in
  * `functions/Scorers` — this is that signal computed from the actual graph).
  *
  * All arithmetic is QUANTIZED INTEGER math, like [[QualityClassifier]]'s
  * gradient sums: ranks live in fixed-point units of 2^-massBits, the damping
  * factor is the exact rational 85/100, and every division is integral. Long
  * addition is associative and commutative, so the distributed per-node sums
  * equal the sequential implementation BIT-FOR-BIT at any partitioning — the
  * oracle compare is exact, with no float-tolerance escape hatch.
  *
  * Per-iteration semantics (synchronous PageRank, Page et al. 1999):
  * {{{
  *   rank'(v) = teleport + Σ_{(u,v) ∈ E} damp(rank(u)) div outdeg(u)
  *                       + damp(Σ_{dangling u} rank(u)) div N
  *   teleport = unit - damp(unit),  damp(x) = (x div 100)·85 + ((x mod 100)·85) div 100
  * }}}
  * Dangling mass (nodes with no out-links — at web scale a third of the
  * frontier tips are dangling) is redistributed uniformly, the standard
  * correction. Integral flooring leaks ≤ 1 unit of mass per edge per
  * iteration; both sides of the oracle floor identically, so the compare is
  * still exact, and with unit = 2^32 the leak is ≤ 2^-32 of a page's rank.
  *
  * Scale shape: `edges` is deduplicated and both derived tables (node set,
  * out-degrees) are lazily checkpointed ONCE; each iteration is exactly one
  * shuffle — the rank exchange onto edge sources followed by a map-side
  * partial-aggregated groupBy(dst) — plus two broadcast one-row aggregates
  * (dangling total, node count), never a driver action: the WHOLE operator
  * is one lazy plan (checkpoints materialize inside the caller's first
  * action, each round's plan truncating to a leaf exactly like
  * [[Dedup.connectedComponents]]). Nothing is quadratic; per-iteration
  * exchange is O(|E| + |V|), the synchronous-PageRank minimum.
  *
  * @param massBits per-node initial mass = 2^massBits. Long-sum safety needs
  *                 |V| · 2^massBits < 2^62: the default 32 covers 10^9 nodes;
  *                 pass 20 for a 10^10-node frontier (rank granularity 2^-20).
  * @return one row per node appearing in `edges`: (id, rank) with rank in
  *         2^-massBits fixed-point units (a rank of ~2^massBits ≈ average)
  */
object PageRank {

  /** damp(x) = floor(x · 85/100) computed without overflow for any x ≥ 0 —
    * the compiled twin of the in-plan Column expression below (OpsSpec
    * asserts the sequential oracle through this exact function). */
  def damp(x: Long): Long = (x / 100L) * 85L + ((x % 100L) * 85L) / 100L

  private val dampExpr = "(rank div 100) * 85 + ((rank % 100) * 85) div 100"

  def ranks(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
            iters: Int = 10, massBits: Int = 32): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    require(massBits >= 1 && massBits <= 40, "massBits must be in [1, 40]")
    val unit = 1L << massBits
    val teleport = unit - damp(unit)
    // parallel edges count once; self-loops are legal (a page linking itself
    // feeds its own rank, same as the matrix formulation)
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .distinct()
      .localCheckpoint(false)
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id")))
      .distinct()
      .localCheckpoint(false)
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("deg")).localCheckpoint(false)
    val nRow = nodes.agg(count(lit(1)).as("n"))

    var ranks = nodes.withColumn("rank", lit(unit)).localCheckpoint(false)
    var it = 0
    while (it < iters) {
      ranks = step(e, nodes, outDeg, nRow, ranks, teleport).localCheckpoint(false)
      it += 1
    }
    ranks
  }

  /** One synchronous iteration as a single lazy plan — package-visible so
    * PlanSpec can pin its physical shape (one rank shuffle + map-side
    * partial-aggregated groupBy(dst); dangling/teleport as broadcast one-row
    * aggregates; never a cartesian product). */
  private[graft] def step(e: DataFrame, nodes: DataFrame, outDeg: DataFrame,
                          nRow: DataFrame, ranks: DataFrame,
                          teleport: Long): DataFrame = {
    val damped = ranks
      .join(outDeg, ranks("id") === outDeg("src"), "left")
      .select(col("id"), col("deg"), expr(dampExpr).as("damped"))
    // dangling mass: one-row aggregate, broadcast-joined back in-plan (no
    // driver action — the operator stays a single lazy plan)
    val dangShare = damped.where(col("deg").isNull)
      .agg(coalesce(sum(col("damped")), lit(0L)).as("dang_total"))
      .crossJoin(nRow)
      .select(expr("dang_total div n").as("dang_share"))
    val inMass = e
      .join(damped.where(col("deg").isNotNull).withColumnRenamed("id", "src"), Seq("src"))
      .select(col("dst").as("id"), expr("damped div deg").as("c"))
      .groupBy("id").agg(sum(col("c")).as("in_mass"))
    nodes
      .join(inMass, Seq("id"), "left")
      .crossJoin(broadcast(dangShare))
      .select(col("id"),
        (lit(teleport) + coalesce(col("in_mass"), lit(0L)) + col("dang_share"))
          .as("rank"))
  }
}
