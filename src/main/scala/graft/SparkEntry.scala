package graft

import graft.core.{PageRec, Synth, Urls}
import graft.frontier.{Crawl, CrawlConfig}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` exposes one entry per implemented operator (SURVEY.md §2);
  * each SQL-expressible one has a DuckDB twin in `oracleSql` over the same
  * parquet tables. Crawl-native operators (span scrape, frontier loop) run on
  * the in-repo deterministic synthetic site (BASELINE.json mandates no
  * external data) and are verified by the ScalaTest oracle suite instead.
  */
object SparkEntry {

  // deterministic synthetic site used by the crawl-native queries
  private val siteCfg = Synth.SiteCfg(seed = 42L, nHosts = 3, cats = 2, subs = 2, prods = 3)

  private def synthPages(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.range(Synth.pageCount(siteCfg))
      .map { i => val p = Synth.pageAt(siteCfg, i); PageRec(p.url, 0L, p.host, p.html, 200, 0) }
      .toDF()
      .withColumn("url_hash", xxhash64(col("url")))
  }

  private def runCrawl(spark: SparkSession, tag: String,
                       cfg: CrawlConfig = CrawlConfig(hostBudget = 8, maxEpochs = 40)): String = {
    import spark.implicits._
    val runDir = java.nio.file.Files.createTempDirectory(s"graft-$tag").toString
    Crawl.run(spark, Synth.seeds(siteCfg).toDF(), synthPages(spark),
      Synth.robots(siteCfg).toDF(), runDir, cfg)
    runDir
  }

  private def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Flagship: full BFS crawl of the synthetic site → interleaved span docs.
    * Driver smoke-checks rows > 0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame = {
    val runDir = runCrawl(spark, "entry")
    Crawl.docs(spark, runDir)
      .select(col("doc_id"), col("spans"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- crawl-native (synthetic site; ScalaTest-verified, rows-only here) --
    "crawl_docs_spans" -> ((s, _) => {
      val runDir = runCrawl(s, "docs")
      Crawl.docs(s, runDir)
        .select(col("doc_id"), explode(col("spans")).as("span"))
        .select(col("doc_id"), col("span.kind").as("kind"), col("span.text").as("text"),
          col("span.media_ref").as("media_ref"), col("span.offset").as("offset"))
        .orderBy("doc_id", "offset")
    }),
    "crawl_visit_order" -> ((s, _) => {
      val runDir = runCrawl(s, "visits")
      Crawl.visits(s, runDir).select("epoch", "visit_rank", "url", "depth")
    }),

    // ---- frontier relational operators, DuckDB-oracled on the shared tables
    // per-host politeness admission window: top-3 events per user by value
    // (row_number over partitionBy ~ per-host budget, SURVEY.md §2.5)
    "q_admission_window" -> ((s, dir) => {
      val e = table(s, dir, "events")
      e.withColumn("rk", row_number().over(
          Window.partitionBy("user_id").orderBy(col("value").desc, col("event_id"))))
        .where(col("rk") <= 3)
        .select(col("user_id"), col("event_id"), col("rk"))
    }),
    // frontier dedup: anti-join (customers with no high-value order ~ URLs
    // absent from the seen set; filter pushed below the join)
    "q_anti_join" -> ((s, dir) => {
      val c = table(s, dir, "customer")
      val o = table(s, dir, "orders").where(col("o_totalprice") > 400000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),
    // capacity top-k (score-desc truncation, bfs_strategy.py:124-131)
    "q_topk_capacity" -> ((s, dir) => {
      table(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(25)
        .select(col("o_orderkey"), col("o_totalprice"))
    }),
    // epoch metrics aggregate (TraversalStats ~ groupBy().agg)
    "q_epoch_metrics" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n"),
          min(col("l_shipdate")).as("first_ship"),
          max(col("l_shipdate")).as("last_ship"))
        .orderBy("l_returnflag", "l_linestatus")
    }),
    // broadcast dimension join (robots/domain-state shape)
    "q_dim_join" -> ((s, dir) => {
      val c = table(s, dir, "customer"); val n = table(s, dir, "nation")
      val r = table(s, dir, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name")).agg(count(lit(1)).as("n_customers"))
        .orderBy("r_name")
    }),
    // union + first-wins dedup (seeder source union, SURVEY.md §2.10)
    "q_union_firstwins" -> ((s, dir) => {
      val o = table(s, dir, "orders")
      val a = o.select(col("o_custkey").as("k"), lit(1).as("src_rank"), col("o_orderkey"))
      val b = o.select(col("o_custkey").as("k"), lit(2).as("src_rank"), col("o_orderkey"))
      a.unionByName(b)
        .withColumn("rk", row_number().over(
          Window.partitionBy("k").orderBy(col("src_rank"), col("o_orderkey"))))
        .where(col("rk") === 1)
        .select(col("k"), col("src_rank"), col("o_orderkey"))
    }),
    // URL canonicalization at scale, oracle-checkable restricted shape
    "q_canonicalize" -> ((s, dir) => {
      import s.implicits._
      val canon = udf((u: String) => Urls.canonicalize(u, ""))
      table(s, dir, "part")
        .withColumn("raw_url",
          concat(lit("HTTP://Example.COM/Part/"), col("p_partkey"),
            lit("?utm_source=x&b=2&a=1#frag")))
        .withColumn("canonical", canon(col("raw_url")))
        .select(col("p_partkey"), col("canonical"))
    }),
  )

  /** DuckDB twins (driver-run at sf0.01). Column names match the Spark side
    * exactly — the driver sorts columns by name before hashing.
    */
  def oracleSql: Map[String, String] = Map(
    "q_admission_window" ->
      """SELECT user_id, event_id, CAST(rk AS INTEGER) AS rk FROM (
        |  SELECT user_id, event_id,
        |         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rk
        |  FROM events) WHERE rk <= 3""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN
        |  (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)""".stripMargin,
    "q_topk_capacity" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin,
    "q_epoch_metrics" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        |       count(*) AS n, min(l_shipdate) AS first_ship, max(l_shipdate) AS last_ship
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_dim_join" ->
      """SELECT r_name, count(*) AS n_customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q_union_firstwins" ->
      """SELECT k, CAST(src_rank AS INTEGER) AS src_rank, o_orderkey FROM (
        |  SELECT k, src_rank, o_orderkey,
        |         row_number() OVER (PARTITION BY k ORDER BY src_rank, o_orderkey) AS rk
        |  FROM (SELECT o_custkey AS k, 1 AS src_rank, o_orderkey FROM orders
        |        UNION ALL
        |        SELECT o_custkey AS k, 2 AS src_rank, o_orderkey FROM orders))
        |WHERE rk = 1""".stripMargin,
    "q_canonicalize" ->
      """SELECT p_partkey,
        |       'http://example.com/Part/' || p_partkey || '?a=1&b=2' AS canonical
        |FROM part""".stripMargin,
  )
}
