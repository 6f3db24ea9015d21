package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStream
import graft.streaming.EventStream.{SessionEvent, SessionOut}
import java.sql.Timestamp

class StreamingSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  test("windowed counts with watermark over a real stream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val q = EventStream.windowedCounts(events, "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("complete").start()
    try {
      mem.addData((ts(1), "click", 1.0), (ts(2), "click", 2.0), (ts(11), "view", 5.0),
        (ts(3), "click", 3.0)) // out of order but inside watermark
      q.processAllAvailable()
      val rows = spark.table("win_counts")
        .select("window_start", "event_type", "n", "sum_value")
        .collect().map(r => (r.getTimestamp(0).getTime / 60000, r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(rows == Set((0L, "click", 3L, 6.0), (10L, "view", 1L, 5.0)))
    } finally q.stop()
  }

  test("stateful sessionization over a stream (flatMapGroupsWithState)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    val q = EventStream.sessionize(mem.toDS(), gapMs = 10 * 60000L)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: two sessions separated by a 30-min gap; user 2: one session
      mem.addData(
        SessionEvent(1L, ts(0), 1.0), SessionEvent(1L, ts(5), 2.0),
        SessionEvent(1L, ts(40), 3.0),
        SessionEvent(2L, ts(0), 9.0))
      q.processAllAvailable()
      val done = spark.table("sessions").as[SessionOut].collect()
      // only user 1's FIRST session is closed (the rest are still open state)
      assert(done.length == 1)
      val s = done.head
      assert(s.user_id == 1L && s.n_events == 2 && s.total_value == 3.0)
      assert(s.session_start == ts(0) && s.session_end == ts(5))
    } finally q.stop()
  }

  test("streaming exact dedup: first content hash survives across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val docs = mem.toDF().toDF("ts", "content_hash", "doc_id")
    val q = EventStream.streamingDedup(docs, lateness = "30 minutes")
      .writeStream.format("memory").queryName("dedup_docs")
      .outputMode("append").start()
    try {
      mem.addData((ts(1), 100L, "a"), (ts(2), 200L, "b"), (ts(3), 100L, "a-dup"))
      q.processAllAvailable()
      mem.addData((ts(4), 100L, "a-dup2"), (ts(5), 300L, "c")) // dup from an earlier batch
      q.processAllAvailable()
      val rows = spark.table("dedup_docs").select("content_hash", "doc_id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(rows == Set((100L, "a"), (200L, "b"), (300L, "c")))
    } finally q.stop()
  }

  test("streaming URL-seen: first arrival per hash emitted once, exact across batches") {
    import graft.streaming.EventStream.UrlArrival
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[UrlArrival]
    val q = EventStream.streamingUrlSeen(mem.toDS())
      .writeStream.format("memory").queryName("url_seen")
      .outputMode("append").start()
    try {
      // batch 1: hash 1 arrives twice in ONE batch — lexicographic first wins
      mem.addData(
        UrlArrival(1L, "http://a.com/z"), UrlArrival(1L, "http://a.com/a"),
        UrlArrival(2L, "http://b.com/x"))
      q.processAllAvailable()
      // batch 2: both hashes recur (state dedup), one genuinely new
      mem.addData(
        UrlArrival(1L, "http://a.com/again"), UrlArrival(2L, "http://b.com/x"),
        UrlArrival(3L, "http://c.com/new"))
      q.processAllAvailable()
      val rows = spark.table("url_seen").as[UrlArrival].collect()
        .map(u => (u.url_hash, u.url)).toSet
      assert(rows == Set(
        (1L, "http://a.com/a"), (2L, "http://b.com/x"), (3L, "http://c.com/new")))
    } finally q.stop()
  }

  test("streaming curation: gates + exact + near-dup dedup across micro-batches") {
    import graft.ops.CurateConfig
    import graft.streaming.StreamCurate
    implicit val sqlCtx = spark.sqlContext
    val good1 = "the quick brown fox jumps over the lazy dog and it was a " +
      "good day in the forest for everyone involved all things considered"
    val good2 = "a completely separate article describing gardens with flowers " +
      "and trees that bloom in the spring when the weather is warm and bright"
    val cfg = CurateConfig(minQuality = 0.3, maxDupLineFrac = 0.5,
      maxTopGramFrac = 0.5, maxDupGramFrac = 0.5,
      fuzzy = "minhash", fuzzyThreshold = 0.5, fuzzyN = 2)
    val stateDir = java.nio.file.Files.createTempDirectory("scur_state").toString
    val outDir = java.nio.file.Files.createTempDirectory("scur_out").toString
    val ckptDir = java.nio.file.Files.createTempDirectory("scur_ckpt").toString
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val q = StreamCurate.curateStream(docs, "doc_id", "text", cfg,
      stateDir, outDir, ckptDir)
    try {
      // batch 1: two distinct docs + an in-batch exact copy + a gate reject
      mem.addData((1L, good1), (2L, good2), (3L, good1), (4L, "x"))
      q.processAllAvailable()
      // batch 2: exact dup of an ACCEPTED doc, near-dup of an accepted doc,
      // one genuinely new doc
      mem.addData((10L, good1), (11L, good1 + " extra trailing marker"),
        (12L, "meanwhile the mountain villages prepare their winter stores " +
              "of grain and wood while the river slowly freezes along the banks"))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.read.parquet(outDir)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 2L, 12L), s"got $out")
    // the state ledgers absorbed exactly the accepted docs
    assert(spark.read.parquet(s"$stateDir/hashes").count() == 3)
    assert(spark.read.parquet(s"$stateDir/sigs").count() == 3)
    // at-least-once replay of batch 1 (same id, same content — the streaming
    // contract): identical survivor set, state self-heals by overwrite, so
    // the ledgers do NOT grow — exactly-once effective semantics
    val replay = StreamCurate.acceptBatch(
      Seq((10L, good1), (11L, good1 + " extra trailing marker"),
        (12L, "meanwhile the mountain villages prepare their winter stores " +
              "of grain and wood while the river slowly freezes along the banks"))
        .toDF("doc_id", "text"), "doc_id", "text", cfg, stateDir, batchId = 1L)
    assert(replay.select("doc_id").as[Long].collect().toSet == Set(12L))
    assert(spark.read.parquet(s"$stateDir/hashes").count() == 3)
    assert(spark.read.parquet(s"$stateDir/sigs").count() == 3)
    // a LATER batch re-carrying already-accepted content adds nothing
    val later = StreamCurate.acceptBatch(
      Seq((20L, good1)).toDF("doc_id", "text"),
      "doc_id", "text", cfg, stateDir, batchId = 2L)
    assert(later.count() == 0)
  }

  test("streaming curation: ledger compaction preserves the accepted set; replay safe across the boundary") {
    import graft.ops.CurateConfig
    import graft.streaming.StreamCurate
    val good1 = "the quick brown fox jumps over the lazy dog and it was a " +
      "good day in the forest for everyone involved all things considered"
    val good2 = "a completely separate article describing gardens with flowers " +
      "and trees that bloom in the spring when the weather is warm and bright"
    val good3 = "meanwhile the mountain villages prepare their winter stores " +
      "of grain and wood while the river slowly freezes along the banks"
    val good4 = "sailors charted the southern passage by the winter stars and " +
      "kept careful logs of currents tides and the changing color of the water"
    val good5 = "the committee published its annual report on road maintenance " +
      "covering bridges tunnels and the schedule of repairs for the coming year"
    val cfg = CurateConfig(minQuality = 0.3, maxDupLineFrac = 0.5,
      maxTopGramFrac = 0.5, maxDupGramFrac = 0.5,
      fuzzy = "minhash", fuzzyThreshold = 0.5, fuzzyN = 2)
    // batch 3 carries a NEAR-dup of a batch-0 doc: its rejection after the
    // fold proves the compacted partition preserved the band index
    val batches: Seq[Seq[(Long, String)]] = Seq(
      Seq((1L, good1), (2L, good2), (4L, "x")),
      Seq((10L, good3)),
      Seq((20L, good1), (21L, good4)), // compacting batch (2 - 0 >= 2)
      Seq((30L, good1 + " extra trailing marker"), (31L, good5)))
    val dirC = java.nio.file.Files.createTempDirectory("scur_cmp").toString
    val dirU = java.nio.file.Files.createTempDirectory("scur_unc").toString
    def run(stateDir: String, every: Int): Seq[Set[Long]] =
      batches.zipWithIndex.map { case (b, i) =>
        StreamCurate.acceptBatch(b.toDF("doc_id", "text"), "doc_id", "text",
          cfg, stateDir, batchId = i.toLong, compactEvery = every)
          .select("doc_id").as[Long].collect().toSet
      }
    // interleave so the compacted run's boundary replay happens at the right
    // point: batches 0..2 compacted, then REPLAY batch 2 (the folding batch —
    // at-least-once contract) before batch 3 ever runs
    val accU = run(dirU, Int.MaxValue)
    val acc01 = batches.take(3).zipWithIndex.map { case (b, i) =>
      StreamCurate.acceptBatch(b.toDF("doc_id", "text"), "doc_id", "text",
        cfg, dirC, batchId = i.toLong, compactEvery = 2)
        .select("doc_id").as[Long].collect().toSet
    }
    val replay2 = StreamCurate.acceptBatch(batches(2).toDF("doc_id", "text"),
      "doc_id", "text", cfg, dirC, batchId = 2L, compactEvery = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(replay2 == acc01(2), "replaying the folding batch must be idempotent")
    val acc3 = StreamCurate.acceptBatch(batches(3).toDF("doc_id", "text"),
      "doc_id", "text", cfg, dirC, batchId = 3L, compactEvery = 2)
      .select("doc_id").as[Long].collect().toSet
    val accC = acc01 :+ acc3
    assert(accC == accU, s"compacted $accC vs uncompacted $accU")
    assert(accC == Seq(Set(1L, 2L), Set(10L), Set(21L), Set(31L)), s"$accC")
    // retention ran at batch 3: pre-fold partitions gone, fold + delta remain
    def parts(d: String): Set[String] =
      new java.io.File(d).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(parts(s"$dirC/hashes") == Set("batch=2", "batch=3"), parts(s"$dirC/hashes"))
    assert(parts(s"$dirC/band_index") == Set("batch=2", "batch=3"))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dirC/hashes/batch=2/_compacted")))
    // the folded state equals the full uncompacted state
    assert(spark.read.parquet(s"$dirC/hashes").select("h").as[Long].collect().toSet ==
      spark.read.parquet(s"$dirU/hashes").select("h").as[Long].collect().toSet)
    // replay of the post-boundary batch: probes the folded base, identical set
    val replay3 = StreamCurate.acceptBatch(batches(3).toDF("doc_id", "text"),
      "doc_id", "text", cfg, dirC, batchId = 3L, compactEvery = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(replay3 == acc3)
  }

  test("text-analysis operators run unchanged on a stream (batch parity)") {
    // the pipeline operators are pure Column expressions, so the SAME code
    // path serves batch backfill and streaming ingest — parity asserted
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.TextAnalysis
    val texts = Seq(
      (1L, "The quick brown fox jumps over the lazy dog and keeps running"),
      (2L, "le chat et le chien sont dans la maison avec les enfants"),
      (3L, "short"),
      (4L, "Spark structured streaming shares the Catalyst planner with batch"))
    def analyze(df: org.apache.spark.sql.DataFrame) = df.select(
      col("doc_id"),
      TextAnalysis.langId(col("text")).as("lang"),
      TextAnalysis.qualityScore(col("text")).as("quality"),
      TextAnalysis.tokenCount(col("text")).as("tokens"),
      TextAnalysis.fingerprint(col("text")).as("fp"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3), r.getString(4))
    val batch = analyze(texts.toDF("doc_id", "text")).collect().map(key).toSet
    val mem = MemoryStream[(Long, String)]
    val q = analyze(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("ta_stream")
      .outputMode("append").start()
    try {
      mem.addData(texts.take(2): _*)
      q.processAllAvailable()
      mem.addData(texts.drop(2): _*)
      q.processAllAvailable()
      val streamed = spark.table("ta_stream").collect().map(key).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("batch sessionization twin: gap split and aggregates") {
    val df = Seq(
      (1L, ts(0), 1.0), (1L, ts(5), 2.0), (1L, ts(60), 4.0),
      (2L, ts(0), 7.0)).toDF("user_id", "ts", "value")
    val out = EventStream.sessionizeBatch(df, gapMs = 30 * 60000L)
      .orderBy("user_id", "session_start").collect()
    assert(out.length == 3)
    val first = out(0)
    assert(first.getAs[Long]("user_id") == 1L)
    assert(first.getAs[Long]("n_events") == 2L)
    assert(first.getAs[Double]("total_value") == 3.0)
    assert(out(1).getAs[Long]("n_events") == 1L) // the t=60 singleton
    assert(out(2).getAs[Long]("user_id") == 2L)
  }

  test("windowed counts transform also runs in plain batch mode") {
    val df = Seq((ts(1), "a", 1.0), (ts(2), "a", 1.0), (ts(15), "b", 2.0))
      .toDF("ts", "event_type", "value")
    val rows = EventStream.windowedCounts(df, "10 minutes", "5 minutes")
      .orderBy("window_start", "event_type").collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(2) == 2L)
  }
}
