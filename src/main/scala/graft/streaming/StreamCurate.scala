package graft.streaming

import java.nio.file.{Files, Paths}

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
  * State is three append-only parquet ledgers under `stateDir`:
  * `hashes/` (accepted content hashes), `band_index/` + `sigs/` (the
  * [[Dedup.MinHashIndex]] of accepted documents). Per-batch work is
  * O(batch) probes against them — accepted-corpus TEXT is never re-scanned,
  * the same property as [[Dedup.dedupIncremental]] (the batch-mode
  * cross-snapshot path). Selection is a pure function of content, so a
  * replayed micro-batch (streaming's at-least-once foreachBatch contract)
  * converges: already-accepted content hash-collides with the ledger and is
  * dropped on replay.
  *
  * The scan gates run as a stateless projection
  * ([[TextAnalysis.repetitionSignalsFast]] — the compiled per-row twin of
  * the batch op), so no watermark or state store is involved before the
  * dedup joins.
  */
object StreamCurate {

  /** Stream-safe scan gates: quality score + per-row Gopher repetition
    * signals, same thresholds as the batch pipeline's stage 1. Works on a
    * streaming OR batch DataFrame (pure projection + filter).
    */
  def gate(docs: DataFrame, textCol: String, cfg: CurateConfig): DataFrame = {
    val rep = udf((t: String) =>
      TextAnalysis.repetitionSignalsFast(t, topNs = Seq(2), dupNs = Seq(10)))
    docs
      .withColumn("__rep", rep(col(textCol)))
      .withColumn("quality", TextAnalysis.qualityScore(col(textCol)))
      .where(col("quality") >= cfg.minQuality &&
             col("__rep").getItem(0) <= cfg.maxDupLineFrac &&
             col("__rep").getItem(1) <= cfg.maxTopGramFrac &&
             col("__rep").getItem(2) <= cfg.maxDupGramFrac)
      .drop("__rep")
  }

  private def ledger(spark: org.apache.spark.sql.SparkSession,
                     dir: String, schema: String): DataFrame =
    if (Files.isDirectory(Paths.get(dir))) spark.read.parquet(dir)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(schema))

  /** One micro-batch acceptance step (the foreachBatch body, exposed so
    * tests and batch replays can drive it directly): gate → exact dedup
    * (in-batch min-id + anti-join vs the hash ledger) → near-dup dedup
    * (in-batch clusters + probe vs the persisted index) → survivors
    * returned AND absorbed into the on-disk state.
    */
  def acceptBatch(batch: DataFrame, idCol: String, textCol: String,
                  cfg: CurateConfig, stateDir: String): DataFrame = {
    val spark = batch.sparkSession
    val hashDir = s"$stateDir/hashes"
    val bandDir = s"$stateDir/band_index"
    val sigDir = s"$stateDir/sigs"

    val gated = gate(batch, textCol, cfg)
      .withColumn("__h", xxhash64(col(textCol)))
    // exact: one survivor per content in-batch (min id), nothing already accepted
    val seen = ledger(spark, hashDir, "h BIGINT")
    val exactKept = gated
      .join(gated.groupBy("__h").agg(min(col(idCol)).as(idCol)),
        Seq("__h", idCol), "left_semi")
      .join(seen, col("__h") === col("h"), "left_anti")
      .localCheckpoint(false) // feeds near-dup pair gen + semi-join + state writes

    // near-dup: within the batch, then against the persisted index
    val survivors = {
      val inBatch = {
        val pairs = Dedup.minHashLsh(exactKept, idCol, textCol,
          shingleLen = cfg.fuzzyN, minEstJaccard = cfg.fuzzyThreshold)
        val canonical = Dedup.clusterLabels(exactKept, idCol, pairs)
          .where(col("is_canonical")).select(col(idCol))
        exactKept.join(canonical, Seq(idCol), "left_semi")
      }
      if (Files.isDirectory(Paths.get(bandDir))) {
        val index = Dedup.MinHashIndex(
          spark.read.parquet(bandDir), spark.read.parquet(sigDir))
        val crossIds = Dedup.minHashLshAgainst(inBatch, idCol, textCol, index,
            shingleLen = cfg.fuzzyN, minEstJaccard = cfg.fuzzyThreshold)
          .select(col("new_id").as(idCol)).distinct()
        inBatch.join(crossIds, Seq(idCol), "left_anti")
      } else inBatch
    }.localCheckpoint(true) // materialize BEFORE extending the state it reads

    // absorb: extend the ledgers with the survivors
    val newIndex = Dedup.minHashIndex(survivors, idCol, textCol,
      shingleLen = cfg.fuzzyN)
    newIndex.bandIndex.write.mode("append").parquet(bandDir)
    newIndex.sigs.write.mode("append").parquet(sigDir)
    survivors.select(col("__h").as("h")).distinct()
      .write.mode("append").parquet(hashDir)
    survivors.drop("__h")
  }

  /** Wire a streaming document source through [[acceptBatch]]: survivors of
    * every micro-batch append to `outDir`, curation state lives under
    * `stateDir`, stream progress under `checkpointDir`.
    */
  def curateStream(docs: DataFrame, idCol: String, textCol: String,
                   cfg: CurateConfig, stateDir: String, outDir: String,
                   checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        acceptBatch(batch, idCol, textCol, cfg, stateDir)
          .write.mode("append").parquet(outDir)
        ()
      }
      .start()
}
