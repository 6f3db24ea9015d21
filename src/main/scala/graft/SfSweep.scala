package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-factor sweep (VERDICT r3 #8): run the headline UNCAPPED operator
  * pipelines at sf0.1 and at a deterministic 10× replica of it, and report
  * per-operator wall ratios — the in-sandbox answer to "does per-query cost
  * scale linearly with data", catching constant factors that hide quadratic
  * behavior at sf0.1.
  *
  * The 10× replica is synthesized (BASELINE.json mandates no external data):
  * replica r offsets every id by r·10⁷ and suffixes every document token
  * with "x$r", so replicas are textually DISJOINT from the base corpus
  * (near-dup operators scale on data volume, not on an artificial 10×
  * blow-up of true duplicate pairs); embeddings rotate by r elements
  * (norm-preserving, direction-changing); events offset user ids.
  *
  * Timing protocol: per operator, one warm pass at sf0.1, then two timed
  * passes at each scale (min reported). Run EXCLUSIVELY — see BENCH.md's
  * credit-state notes; the RATIO is the robust statistic here.
  *
  * `runMain graft.SfSweep [replicaDir]` — prints one JSON line per operator
  * plus a final summary line.
  */
object SfSweep {

  private val Factor = 10

  private def buildReplica(s: SparkSession, src: String, dst: String): Unit = {
    val fs = java.nio.file.Paths.get(dst)
    // resume check keys on the LAST table written: a crash mid-build must
    // rebuild, not silently sweep a partial replica
    if (java.nio.file.Files.exists(fs.resolve("lineitem.parquet/_SUCCESS"))) return
    java.nio.file.Files.createDirectories(fs)
    val docs = s.read.parquet(s"$src/documents.parquet")
    (0 until Factor).map { r =>
      if (r == 0) docs
      else docs.select(
        (col("doc_id") + r * 10000000L).as("doc_id"),
        array_join(transform(split(col("text"), "\\s+"),
          t => concat(t, lit(s"x$r"))), " ").as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")
    val emb = s.read.parquet(s"$src/embeddings.parquet")
    (0 until Factor).map { r =>
      if (r == 0) emb
      else emb.select(
        (col("vec_id") + r * 10000000L).as("vec_id"),
        concat(slice(col("embedding"), r + 1, 10000),
          slice(col("embedding"), 1, r)).as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
    val ev = s.read.parquet(s"$src/events.parquet")
    (0 until Factor).map { r =>
      if (r == 0) ev
      else ev.select((col("event_id") + r * 100000000L).as("event_id"),
        col("ts"), (col("user_id") + r * 10000000L).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dst/events.parquet")
    val li = s.read.parquet(s"$src/lineitem.parquet")
    (0 until Factor).map { r =>
      if (r == 0) li
      else li.withColumn("l_orderkey", col("l_orderkey") + r * 100000000L)
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dst/lineitem.parquet")
  }

  /** Each op is an UNCAPPED pipeline over full tables, forced with count.
    * `scale` = the replica factor of `dir` (1 for the base sf), so derived
    * structures (the pagerank graph's node space) scale WITH the data
    * instead of concentrating 10x the edges on a fixed hub set. */
  private def ops(s: SparkSession, dir: String, scale: Int): Seq[(String, () => Long)] = {
    def docs = s.read.parquet(s"$dir/documents.parquet")
    def emb = s.read.parquet(s"$dir/embeddings.parquet")
    def events = s.read.parquet(s"$dir/events.parquet")
    def lineitem = s.read.parquet(s"$dir/lineitem.parquet")
    import graft.ops._
    Seq(
      "scan_gates" -> (() => docs.select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("q"),
        TextAnalysis.langId(col("text")).as("l"),
        TextAnalysis.tokenCount(col("text")).as("n"))
        .where(col("q") >= 0.0).count()),
      "exact_dedup" -> (() => Dedup.exact(docs, "doc_id", "text").count()),
      "minhash_lsh" -> (() => Dedup.minHashLsh(docs, "doc_id", "text",
        shingleLen = 3, minEstJaccard = 0.5).count()),
      "simhash_pairs" -> (() => Dedup.simHashPairs(docs, "doc_id", "text",
        maxDist = 3).count()),
      "bm25" -> (() => Bm25.score(docs, "doc_id", "text",
        Seq("spark", "window")).count()),
      "repetition" -> (() => TextAnalysis.repetitionSignals(docs, "doc_id",
        "text", topNs = Seq(2), dupNs = Seq(10)).count()),
      "ngram_lm" -> (() => {
        val c = NgramLm.train(docs, "text")
        NgramLm.scoreStupidBackoff(docs, "doc_id", "text", c).count()
      }),
      "pagerank" -> (() => {
        val src = docs.select(col("doc_id").cast("long").as("src"))
        val n = 500L * scale
        val edges = src.select(col("src"), ((col("src") * 7 + 1) % n).as("dst"))
          .unionByName(src.select(col("src"), ((col("src") * 13 + 3) % n).as("dst")))
        PageRank.ranks(edges, iters = 8).count()
      }),
      "dsir_sample" -> (() => Sampling.dsirResample(docs,
        docs.where(col("lang") === "en"), "doc_id", "text", k = 100).count()),
      "pack_sequences" -> (() => Pack.packSequences(docs, "source", "doc_id",
        "text", 512).count()),
      "ann_brute_topk" -> (() => {
        import s.implicits._
        val q = emb.orderBy("vec_id").select("embedding")
          .as[Seq[Float]].head()
        Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10).count()
      }),
      "sessionize" -> (() => graft.streaming.EventStream.sessionizeBatch(
        events.select("user_id", "ts", "value"), gapMs = 30 * 60 * 1000L).count()),
      "lineitem_agg" -> (() => lineitem
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity"), avg("l_extendedprice"), count(lit(1))).count()),
      "curate_e2e" -> (() => Curate.curateCorpus(docs, "doc_id", "text",
        None, "text", CurateConfig(minQuality = 0.3, maxDupLineFrac = 0.9,
          maxTopGramFrac = 0.9, maxDupGramFrac = 0.9,
          fuzzy = "minhash", fuzzyThreshold = 0.5, fuzzyN = 3,
          spanK = 0, sampleFraction = 1.0)).count()),
    )
  }

  def main(args: Array[String]): Unit = {
    val src = "/root/testdata/sf0.1"
    val dst = args.headOption.getOrElse("/tmp/graft_sf10x")
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    buildReplica(s, src, dst)
    def time(f: () => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val rows = ops(s, src, 1).zip(ops(s, dst, Factor)).map {
      case ((name, at01), (_, at1)) =>
        at01() // warm (JIT + parquet footer cache)
        val s1 = math.min(time(at01)._1, time(at01)._1)
        val (w1a, n10) = time(at1)
        val w1 = math.min(w1a, time(at1)._1)
        println(f"""{"op":"$name","sec_sf01":$s1%.2f,"sec_10x":$w1%.2f,"ratio":${w1 / s1}%.2f,"rows_10x":$n10}""")
        (name, s1, w1, w1 / s1)
    }
    val med = rows.map(_._4).sorted.apply(rows.size / 2)
    println(f"""{"sweep":"sf0.1 vs 10x replica","ops":${rows.size},"median_ratio":$med%.2f}""")
    s.stop()
  }
}
