package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan assertions: the optimizations the 100 TB design depends on
  * must actually appear in the plans Catalyst produces — predicate pushdown
  * into the parquet scan, column pruning, broadcast joins for dimension
  * tables, partial (map-side) aggregation, and whole-stage codegen.
  */
class PlanSpec extends AnyFunSuite {
  import SparkTestSession.spark

  // sf0.01, not sf0.001: OpsSpec caches sf0.001 tables in the shared
  // session, and the cache manager would substitute InMemoryRelation for the
  // parquet scans these assertions inspect
  val sf = "/root/testdata/sf0.01"

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("filter pushdown reaches the parquet scan (anti-join right side)") {
    val p = plan(SparkEntry.queries("q_anti_join")(spark, sf))
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("GreaterThan(o_totalprice,400000.0)"), p)
  }

  test("column pruning: token stats scan reads only doc_id + text") {
    val p = plan(SparkEntry.queries("q_token_stats")(spark, sf))
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(readSchema.contains("doc_id"), readSchema)
    assert(readSchema.contains("text"), readSchema)
    // lang/source/n_chars must NOT be read
    assert(!readSchema.contains("lang"), readSchema)
    assert(!readSchema.contains("n_chars"), readSchema)
  }

  test("dimension joins broadcast (robots/nation-shaped tables)") {
    val p = plan(SparkEntry.queries("q_dim_join")(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("epoch metrics aggregate has map-side partial aggregation") {
    val p = plan(SparkEntry.queries("q_epoch_metrics")(spark, sf))
    // two HashAggregate nodes around the exchange = partial + final
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
    assert(p.contains("hashpartitioning"), p)
  }

  test("top-k compiles to TakeOrderedAndProject, not a global sort") {
    val p = plan(SparkEntry.queries("q_topk_capacity")(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("scan-shaped operators are one shuffle-free stage over a pruned scan") {
    val p = plan(SparkEntry.queries("q_quality_score")(spark, sf))
    // higher-order-function lambdas (filter/aggregate over arrays) are not
    // whole-stage-codegen-supported in Spark 4 — the projection evaluates
    // interpreted, which is why the hot frontier path avoids HOFs. What
    // matters at scale: a single stage, no exchange, pruned scan.
    assert(!p.contains("Exchange"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("admission window: one shuffle on the host key, rank-limit pushed below it") {
    val p = plan(SparkEntry.queries("q_admission_window")(spark, sf))
    assert("\\bExchange\\b".r.findAllIn(p).length <= 2, p) // data + AQE final
    assert(p.contains("hashpartitioning(user_id"), p)
    // Spark pushes the rank<=k filter below the exchange (WindowGroupLimit):
    // each map task keeps only its local top-k before shuffling — exactly the
    // per-host admission shape we want at 10^10 scale
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("bm25: query-term filter below the explode; only hits shuffle") {
    val p = plan(SparkEntry.queries("q_bm25")(spark, sf))
    // the explode's input is the query-term-filtered array — the generate
    // operator sits above a projection that already applied the filter HOF,
    // so shuffled rows ∝ query hits, not corpus tokens
    assert(p.contains("Generate ("), p)
    assert(p.contains("qtk"), p)
    // corpus scalars ride as a broadcast 1-row aggregate, not a collect
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    // the doc-length lens join on doc_id is GONE (dl rides with the rows):
    // every remaining shuffle is an aggregate exchange, none a join on doc_id
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("lsh ANN: kernel bucket probe is scan → filter → TakeOrdered (no shuffle)") {
    val q = (0 until 64).map(_.toFloat / 64)
    val df = spark.read.parquet(s"$sf/embeddings.parquet")
    val p = plan(graft.ops.Similarity.lshTopK(df, "vec_id", "embedding", q, 10, planes = 8))
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("brute-force ANN is scan → project → TakeOrdered (no shuffle)") {
    val p = plan(SparkEntry.queries("q_embedding_topk")(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("minhash LSH: band exchange carries ids only, signatures join back post-dedup") {
    // force the shuffled form (at sf0.01 the band join broadcasts; at corpus
    // scale it shuffles — THAT exchange's payload is what matters)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
      // inspect the lazy candidate-pair plan: minHashLsh localCheckpoints it
      // (the pair set feeds three consumers), which truncates lineage in the
      // final plan — the band exchange is only visible pre-checkpoint
      val p = plan(graft.ops.Dedup.minHashCandidatePairs(
        df, "doc_id", "text", k = 32, bands = 8, shingleLen = 3))
      // the band join's exchanges partition on (band, band_hash) and their
      // payload is just the id — no `sig` array may ride through them (sig
      // columns exist only in the post-dedup id-keyed joins)
      val nodes = p.split("\\n\\(\\d+\\) ").toSeq
      val bandExchanges = nodes.filter(n =>
        n.startsWith("Exchange") && n.contains("hashpartitioning(band"))
      assert(bandExchanges.nonEmpty, p)
      assert(bandExchanges.forall(!_.contains("sig")), bandExchanges.mkString("\n---\n"))
      // and the full pipeline never re-shuffles on band keys post-checkpoint
      val full = plan(graft.ops.Dedup.minHashLsh(df, "doc_id", "text", k = 32, bands = 8))
      assert(!full.contains("hashpartitioning(band"), full)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("incremental minhash probe: band exchanges carry ids only") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
      val idx = graft.ops.Dedup.minHashIndex(
        df.where(org.apache.spark.sql.functions.col("doc_id") < 150), "doc_id", "text")
      val p = plan(graft.ops.Dedup.minHashLshAgainst(
        df.where(org.apache.spark.sql.functions.col("doc_id") >= 150),
        "doc_id", "text", idx))
      val nodes = p.split("\\n\\(\\d+\\) ").toSeq
      val bandExchanges = nodes.filter(n =>
        n.startsWith("Exchange") && n.contains("hashpartitioning(band"))
      assert(bandExchanges.nonEmpty, p)
      assert(bandExchanges.forall(!_.contains("sig")), bandExchanges.mkString("\n---\n"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("cosine pre-filter: one shuffle-free typed-map stage over a pruned scan") {
    val p = plan(SparkEntry.queries("q_cosine_filter")(spark, sf))
    assert(!p.contains("Exchange"), p)
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(readSchema.contains("doc_id") && readSchema.contains("text"), readSchema)
    assert(!readSchema.contains("lang") && !readSchema.contains("n_chars"), readSchema)
  }

  test("xpath extraction: shuffle-free map, scan pruned to the consumed columns") {
    val p = plan(SparkEntry.queries("q_xpath_extract")(spark, sf))
    assert(!p.contains("Exchange"), p)
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(readSchema.contains("c_custkey") && readSchema.contains("c_mktsegment"), readSchema)
    // untouched wide columns must not be read
    assert(!readSchema.contains("c_address") && !readSchema.contains("c_comment"), readSchema)
  }

  test("stratified quota sample: rank-limit below one exchange on the stratum") {
    val p = plan(SparkEntry.queries("q_stratified_sample")(spark, sf))
    assert(p.contains("WindowGroupLimit"), p) // per-partition top-k heap, never a full sort
    assert(p.contains("hashpartitioning(o_orderpriority"), p)
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("o_totalprice"), readSchema) // untouched columns pruned
  }

  test("hash-fraction sample is a pure filter: no exchange, no aggregation") {
    val p = plan(SparkEntry.queries("q_hash_sample")(spark, sf))
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Aggregate"), p)
  }

  test("decontamination: no cartesian product, partial aggregation on hit counts") {
    val p = plan(SparkEntry.queries("q_decontaminate")(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    assert(p.contains("partial_count"), p) // map-side combine before the id shuffle
  }

  test("PII redaction is a single shuffle-free projection over a pruned scan") {
    val p = plan(SparkEntry.queries("q_redact")(spark, sf))
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Aggregate"), p)
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("c_address") && !readSchema.contains("c_comment"),
      readSchema) // only the columns the constructed text consumes are read
  }

  test("pack manifest: one shard exchange, streaming window, no global sort") {
    val p = plan(SparkEntry.queries("q_pack_sequences")(spark, sf))
    assert(p.contains("hashpartitioning(source"), p) // shard is the parallel unit
    assert(p.contains("Window"), p)
    // exactly one Exchange node (formatted mode prints each node twice:
    // once in the tree, once in the detail block)
    assert("Exchange".r.findAllIn(p).length == 2, p)
    assert(!p.contains("SinglePartition"), p)        // never a global window
  }

  test("upsample: broadcast factor join + scan-stage explode, corpus never shuffles") {
    val p = plan(SparkEntry.queries("q_upsample")(spark, sf))
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("Generate"), p) // the copy explode
  }

  test("hash split is a pure projection: no exchange, no aggregation") {
    val p = plan(SparkEntry.queries("q_split")(spark, sf))
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Aggregate"), p)
  }

  test("dsir: broadcast model join, partial-agg weights, TakeOrdered selection") {
    val p = plan(SparkEntry.queries("q_dsir_sample")(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p)   // top-k, never a global sort
    assert(p.contains("BroadcastHashJoin"), p)       // bucket model broadcast into scoring
    assert(p.contains("partial_sum"), p)             // map-side combine of per-word weights
    assert(!p.contains("CartesianProduct"), p)
  }

  test("semdedup: within-cell equi-join, no cartesian pair generation") {
    val p = plan(SparkEntry.queries("q_semdedup")(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    assert(p.contains("cell"), p) // the pair join is keyed on the quantizer cell
  }

  test("pagerank step: partial-agg in-mass, broadcast dangling scalar, no cartesian") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .where(col("doc_id") < 100)
      .select(col("doc_id").cast("long").as("src"),
        ((col("doc_id") * 7 + 1) % 100).as("dst"))
    val nodes = docs.select(col("src").as("id")).distinct()
    val outDeg = docs.groupBy("src").agg(count(lit(1)).as("deg"))
    val nRow = nodes.agg(count(lit(1)).as("n"))
    val ranks = nodes.withColumn("rank", lit(1L << 32))
    val p = plan(graft.ops.PageRank.step(docs, nodes, outDeg, nRow, ranks,
      teleport = 1L))
    // the in-mass reduction combines map-side before the dst shuffle
    assert(p.contains("partial_sum"), p)
    // the dangling/teleport scalars enter as a broadcast one-row join, and
    // nothing in the iteration is a cartesian pair generation
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("BPE word counting: map-side combine before the word shuffle") {
    val p = plan(graft.ops.Bpe.wordCounts(
      spark.read.parquet(s"$sf/documents.parquet"), "text"))
    assert("HashAggregate".r.findAllIn(p).length >= 2, p) // partial + final
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(readSchema.contains("text") && !readSchema.contains("lang"), readSchema)
  }

  test("sliding-window chunks: one shuffle-free projection over a pruned scan") {
    import org.apache.spark.sql.functions._
    val p = plan(spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        graft.ops.TextAnalysis.slidingWindowChunks(col("text"), 12, 5).as("c")))
    assert(!p.contains("Exchange"), p)
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(readSchema.contains("text") && !readSchema.contains("lang"), readSchema)
  }

  test("pq search over encoded codes: scan → project → TakeOrdered, no shuffle") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val cb = graft.ops.Similarity.trainPq(e, "vec_id", "embedding",
      m = 8, k = 8, iters = 1, trainFraction = 0.25)
    val codes = graft.ops.Similarity.pqEncode(e, "vec_id", "embedding", cb)
    val q = e.where(col("vec_id") === 0).select("embedding")
      .as[Seq[Float]].head()
    val p = plan(graft.ops.Similarity.pqTopKEncoded(codes, "vec_id", q, 10, cb))
    // the encoded search structure never shuffles: ADC scoring is a
    // projection and the top-k is TakeOrdered, not a global sort
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("ivf-pq persisted index: probe scan is partition-pruned to the probed cells") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-idx").toString
    val model = graft.ops.Similarity.writeIvfPqIndex(e, "vec_id", "embedding",
      dir, cells = 8, m = 8, cbk = 8, iters = 1, trainFraction = 0.25)
    val q = e.where(col("vec_id") === 0).select("embedding").as[Seq[Float]].head()
    val nProbe = 3
    val probe = graft.ops.Similarity.ivfPqProbeIndex(spark, dir, model,
      "vec_id", q, k = 10, nProbe = nProbe)
    // the cell membership predicate must be a PARTITION filter (listing-time
    // pruning), not a data filter evaluated after reading every cell
    val p = plan(probe)
    assert(p.contains("PartitionFilters"), p)
    // execute THIS queryExecution (count() would plan a separate query and
    // leave the inspected scan's metrics untouched)
    assert(probe.collect().length == 10)
    // after execution the scan's own metric proves it: exactly nProbe of the
    // 8 cell directories were read
    val scan = probe.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.getOrElse(fail(s"no FileSourceScanExec in\n${probe.queryExecution.executedPlan}"))
    assert(scan.metrics.contains("numPartitions"), scan.metrics.keys.mkString(","))
    assert(scan.metrics("numPartitions").value == nProbe,
      s"expected $nProbe partitions read, got ${scan.metrics("numPartitions").value}")
  }

  test("link-head enrichment: equi-joins only, BM25 scalars broadcast, no cartesian") {
    val p = plan(SparkEntry.queries("q_link_head")(spark, sf))
    // every head-store/score/enrich join keys on the url/href column —
    // a cartesian anywhere here would be quadratic in the link table
    assert(!p.contains("CartesianProduct"), p)
    // the BM25 corpus scalars (n_docs, avgdl) and idf table enter broadcast
    assert(p.contains("BroadcastExchange"), p)
    // the only sort sits under the max-links LIMIT (TakeOrdered), nothing global
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("codec/container queries are shuffle-free scan-stage kernels") {
    // every decode query is generate-in-kernel → flatMap → project: the
    // archive/codec bytes never shuffle, and the doc_id scan is pruned to
    // the one driving column. At 100 TB the same shape holds with the blob
    // column read from parquet instead of synthesized — still no exchange.
    for (q <- Seq("q_pdf_jbig2", "q_pdf_ccitt", "q_pdf_jpx", "q_audio_flac",
        "q_video_mp4", "q_video_webm", "q_archive_members", "q_image_exif")) {
      val p = plan(SparkEntry.queries(q)(spark, sf))
      assert(!p.contains("Exchange"), s"$q shuffles:\n$p")
      val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
      assert(readSchema.contains("doc_id") && !readSchema.contains("text"),
        s"$q scan not pruned: $readSchema")
    }
  }
}
