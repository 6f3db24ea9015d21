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
  * [[Dedup.dedupIncremental]] (the batch-mode cross-snapshot path).
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

  /** `batch=<id>` partitions of `dir` committed BEFORE `batchId` — the state
    * a replayed batch is allowed to see. Streaming batch ids are monotonic,
    * so "before" is a simple id compare; the current batch's own partial
    * partition from a failed attempt is excluded by construction. Listed
    * through the Hadoop FileSystem of the path's scheme, so the state can
    * live on HDFS/S3 like any production checkpoint dir, not only local
    * disk.
    */
  private def priorBatchDirs(spark: org.apache.spark.sql.SparkSession,
                             dir: String, batchId: Long): Seq[String] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter { p =>
        p.getName.startsWith("batch=") &&
          p.getName.stripPrefix("batch=").toLongOption.exists(_ < batchId)
      }
      .map(_.toString)
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
    */
  def acceptBatch(batch: DataFrame, idCol: String, textCol: String,
                  cfg: CurateConfig, stateDir: String, batchId: Long): DataFrame = {
    val spark = batch.sparkSession
    val hashDir = s"$stateDir/hashes"
    val bandDir = s"$stateDir/band_index"
    val sigDir = s"$stateDir/sigs"

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

    // absorb: this batch's state deltas, overwrite-idempotent per batch id
    val newIndex = Dedup.minHashIndex(survivors, idCol, textCol,
      shingleLen = cfg.fuzzyN, basis = cfg.minhashBasis)
    newIndex.bandIndex.write.mode("overwrite").parquet(s"$bandDir/batch=$batchId")
    newIndex.sigs.write.mode("overwrite").parquet(s"$sigDir/batch=$batchId")
    survivors.select(col("__h").as("h")).distinct()
      .write.mode("overwrite").parquet(s"$hashDir/batch=$batchId")
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
                   checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        acceptBatch(batch, idCol, textCol, cfg, stateDir, batchId)
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        ()
      }
      .start()
}
