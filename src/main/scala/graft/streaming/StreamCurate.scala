package graft.streaming

import graft.ops.{CurateConfig, Dedup, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** CONTINUOUS corpus curation — the streaming twin of
  * [[graft.ops.Curate.curateCorpus]] for a crawl that never stops: each
  * micro-batch of fetched documents passes the scan gates, exact dedup
  * against everything ever accepted, and NEAR-dup dedup against the
  * persisted MinHash LSH index, then extends that state on disk.
  *
  * State is three parquet ledgers under `stateDir` — `hashes/` (accepted
  * content hashes), `band_index/` + `sigs/` (the [[Dedup.MinHashIndex]] of
  * accepted documents) — each laid out as one `batch=<id>` partition per
  * micro-batch. Per-batch work is O(batch) probes against them —
  * accepted-corpus TEXT is never re-scanned, the same property as
  * [[Dedup.dedupIncremental]] (the batch-mode cross-snapshot path). With
  * `compactEvery` set, every K-th batch folds the delta run into one full
  * partition per ledger and older partitions are retired one batch later, so
  * a forever-running stream holds at most K+1 partitions per ledger instead
  * of one per batch it ever processed.
  *
  * Replay safety (foreachBatch only guarantees at-least-once): every write a
  * batch makes — the three state deltas AND the curated output — goes to
  * that batch's own `batch=<id>` directory in OVERWRITE mode, and state
  * probes read only partitions with id < the current batch. A replayed batch
  * therefore sees exactly the pre-batch state (its own partial writes from
  * the failed attempt are invisible to the probes and clobbered by the
  * rewrite), recomputes the identical survivor set (selection is a pure
  * function of content + prior state), and lands exactly-once output — the
  * idempotent-sink pattern, not append-and-hope.
  *
  * The scan gates run as a stateless projection
  * ([[TextAnalysis.repetitionSignalsFast]] — the compiled per-row twin of
  * the batch op), so no watermark or state store is involved before the
  * dedup joins.
  */
object StreamCurate {

  /** Stream-safe scan gates: the batch pipeline's stage 0 (blocklist drop +
    * C4 line cleaning — dropped docs filter out, kept lines rebuild the text
    * column the later gates see) followed by stage 1 (quality score +
    * per-row Gopher repetition signals), same thresholds and order as
    * [[graft.ops.Curate.curateCorpus]]. All stateless scan-stage columns, so
    * they work on a streaming OR batch DataFrame (pure projection + filter).
    */
  def gate(docs: DataFrame, textCol: String, cfg: CurateConfig): DataFrame = {
    // stage 0 is the SAME code the batch pipeline runs (Curate.stage0), so
    // the stream and batch gates cannot drift
    val base = graft.ops.Curate.stage0(docs, textCol, cfg)
    val rep = udf((t: String) =>
      TextAnalysis.repetitionSignalsFast(t, topNs = Seq(2), dupNs = Seq(10)))
    base
      .withColumn("__rep", rep(col(textCol)))
      .withColumn("quality", TextAnalysis.qualityScore(col(textCol)))
      .where(col("quality") >= cfg.minQuality &&
             col("__rep").getItem(0) <= cfg.maxDupLineFrac &&
             col("__rep").getItem(1) <= cfg.maxTopGramFrac &&
             col("__rep").getItem(2) <= cfg.maxDupGramFrac)
      .drop("__rep")
  }

  /** Marker file naming a `batch=<id>` partition as COMPACTED: it holds the
    * full union of every ledger row accepted up to and including its own
    * batch, so readers start there instead of unioning the whole history.
    * Leading underscore → invisible to the parquet reader. */
  private val CompactedMarker = "_compacted"

  private def fsOf(spark: org.apache.spark.sql.SparkSession, dir: String) = {
    val path = new org.apache.hadoop.fs.Path(dir)
    (path.getFileSystem(spark.sparkContext.hadoopConfiguration), path)
  }

  /** (id, path) of every `batch=<id>` partition of `dir` with id < batchId —
    * the state a replayed batch is allowed to see (streaming batch ids are
    * monotonic, so "before" is an id compare; the current batch's own partial
    * partition from a failed attempt is excluded by construction). Listed
    * through the Hadoop FileSystem of the path's scheme, so the state can
    * live on HDFS/S3 like any production checkpoint dir, not only local
    * disk.
    */
  private def priorBatches(spark: org.apache.spark.sql.SparkSession,
                           dir: String, batchId: Long): Seq[(Long, org.apache.hadoop.fs.Path)] = {
    val (fs, path) = fsOf(spark, dir)
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .flatMap { p =>
        if (p.getName.startsWith("batch="))
          p.getName.stripPrefix("batch=").toLongOption
            .filter(_ < batchId).map(_ -> p)
        else None
      }
  }

  /** The compaction BASE for `dir` as seen by `batchId`: the highest prior
    * partition carrying the [[CompactedMarker]], or -1 when none exists
    * (read the whole history). A replayed batch can only ever see a base
    * written by a batch strictly before it, so replay determinism holds
    * across a compaction boundary. */
  private def compactionBase(spark: org.apache.spark.sql.SparkSession,
                             dir: String, batchId: Long): Long = {
    val (fs, _) = fsOf(spark, dir)
    priorBatches(spark, dir, batchId)
      .filter { case (_, p) => fs.exists(new org.apache.hadoop.fs.Path(p, CompactedMarker)) }
      .map(_._1).maxOption.getOrElse(-1L)
  }

  /** Prior-batch dirs a probe at `batchId` must read: everything from the
    * compaction base (inclusive — the base partition IS the folded history)
    * up to batchId-1. Bounded by compactEvery instead of the stream's age.
    */
  private def priorBatchDirs(spark: org.apache.spark.sql.SparkSession,
                             dir: String, batchId: Long): Seq[String] = {
    val base = compactionBase(spark, dir, batchId)
    priorBatches(spark, dir, batchId)
      .filter(_._1 >= base).map(_._2.toString)
  }

  /** RETENTION: drop partitions strictly below the compaction base — their
    * rows live inside the base partition. Safe whenever a batch LATER than
    * the compacting one is running: Structured Streaming replays at most the
    * single latest uncommitted batch, so once batch B+1 executes, batch B
    * (which wrote the marker) is committed and nothing can ever again probe
    * below it. Called at the START of a batch, before any state read. */
  private def retainFromBase(spark: org.apache.spark.sql.SparkSession,
                             dir: String, batchId: Long): Unit = {
    val (fs, _) = fsOf(spark, dir)
    val base = compactionBase(spark, dir, batchId)
    if (base >= 0)
      priorBatches(spark, dir, batchId)
        .filter(_._1 < base)
        .foreach { case (_, p) => fs.delete(p, true) }
  }

  private def ledger(spark: org.apache.spark.sql.SparkSession,
                     dir: String, schema: String, batchId: Long): DataFrame = {
    val parts = priorBatchDirs(spark, dir, batchId)
    if (parts.nonEmpty) spark.read.parquet(parts: _*)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(schema))
  }

  /** One micro-batch acceptance step (the foreachBatch body, exposed so
    * tests and batch replays can drive it directly): gate → exact dedup
    * (in-batch min-id + anti-join vs the hash ledger) → near-dup dedup
    * (in-batch clusters + probe vs the persisted index) → survivors
    * returned AND absorbed into the on-disk state under this batch's own
    * `batch=<batchId>` partitions (overwrite — replaying the same batch id
    * self-heals a partial attempt instead of double-appending).
    *
    * `compactEvery` bounds state growth: every K batches the delta run is
    * folded into ONE full partition per ledger (written, like every state
    * write, under the folding batch's own id + a [[CompactedMarker]]), and
    * partitions below the previous fold are deleted at the start of the NEXT
    * batch — so probes union at most K+1 partitions and retention is
    * amortized 1/K per batch, the same scheme as the crawl's seen-delta
    * compaction ([[graft.frontier.Crawl]]). Default = never (pure deltas).
    */
  def acceptBatch(batch: DataFrame, idCol: String, textCol: String,
                  cfg: CurateConfig, stateDir: String, batchId: Long,
                  compactEvery: Int = Int.MaxValue): DataFrame = {
    val spark = batch.sparkSession
    val hashDir = s"$stateDir/hashes"
    val bandDir = s"$stateDir/band_index"
    val sigDir = s"$stateDir/sigs"
    // retention first: anything below the established compaction base is
    // folded into the base partition and can never be probed again
    Seq(hashDir, bandDir, sigDir).foreach(d => retainFromBase(spark, d, batchId))

    val gated = gate(batch, textCol, cfg)
      .withColumn("__h", xxhash64(col(textCol)))
    // exact: one survivor per content in-batch (min id), nothing already accepted
    val seen = ledger(spark, hashDir, "h BIGINT", batchId)
    val exactKept = gated
      .join(gated.groupBy("__h").agg(min(col(idCol)).as(idCol)),
        Seq("__h", idCol), "left_semi")
      .join(seen, col("__h") === col("h"), "left_anti")
      .localCheckpoint(false) // feeds near-dup pair gen + semi-join + state writes

    // near-dup: within the batch, then against the persisted index
    val survivors = {
      val inBatch = {
        val pairs = Dedup.minHashLsh(exactKept, idCol, textCol,
          shingleLen = cfg.fuzzyN, minEstJaccard = cfg.fuzzyThreshold,
          basis = cfg.minhashBasis)
        val canonical = Dedup.clusterLabels(exactKept, idCol, pairs)
          .where(col("is_canonical")).select(col(idCol))
        exactKept.join(canonical, Seq(idCol), "left_semi")
      }
      val priorBands = priorBatchDirs(spark, bandDir, batchId)
      if (priorBands.nonEmpty) {
        val index = Dedup.MinHashIndex(
          spark.read.parquet(priorBands: _*),
          spark.read.parquet(priorBatchDirs(spark, sigDir, batchId): _*))
        val crossIds = Dedup.minHashLshAgainst(inBatch, idCol, textCol, index,
            shingleLen = cfg.fuzzyN, minEstJaccard = cfg.fuzzyThreshold,
            basis = cfg.minhashBasis)
          .select(col("new_id").as(idCol)).distinct()
        inBatch.join(crossIds, Seq(idCol), "left_anti")
      } else inBatch
    }.localCheckpoint(true) // materialize BEFORE extending the state it reads

    // absorb: this batch's state deltas, overwrite-idempotent per batch id.
    // On a compaction batch the delta write becomes a FOLD: prior partitions
    // (base..batchId-1) union this delta, one full partition per ledger,
    // marked compacted — identical probe state, bounded partition fan-in.
    val base = compactionBase(spark, hashDir, batchId)
    val compacting = compactEvery != Int.MaxValue &&
      batchId - math.max(base, 0L) >= compactEvery
    def absorb(delta: DataFrame, dir: String): Unit = {
      val prior = priorBatchDirs(spark, dir, batchId)
      // partitions are disjoint by construction (hashes anti-joined against
      // history; band/sig rows keyed by never-reaccepted ids) → plain union
      val out =
        if (compacting && prior.nonEmpty)
          spark.read.parquet(prior: _*).unionByName(delta)
        else delta
      out.write.mode("overwrite").parquet(s"$dir/batch=$batchId")
      if (compacting) {
        val (fs, _) = fsOf(spark, dir)
        fs.create(new org.apache.hadoop.fs.Path(
          s"$dir/batch=$batchId/$CompactedMarker"), true).close()
      }
    }
    val newIndex = Dedup.minHashIndex(survivors, idCol, textCol,
      shingleLen = cfg.fuzzyN, basis = cfg.minhashBasis)
    absorb(newIndex.bandIndex, bandDir)
    absorb(newIndex.sigs, sigDir)
    absorb(survivors.select(col("__h").as("h")).distinct(), hashDir)
    survivors.drop("__h")
  }

  /** Wire a streaming document source through [[acceptBatch]]: survivors of
    * micro-batch B land exactly-once at `outDir/batch=B` (read the root —
    * the batch id surfaces as a partition column, per-micro-batch lineage
    * for free), curation state lives under `stateDir`, stream progress under
    * `checkpointDir`.
    */
  def curateStream(docs: DataFrame, idCol: String, textCol: String,
                   cfg: CurateConfig, stateDir: String, outDir: String,
                   checkpointDir: String,
                   compactEvery: Int = Int.MaxValue): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        acceptBatch(batch, idCol, textCol, cfg, stateDir, batchId, compactEvery)
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        ()
      }
      .start()
}
