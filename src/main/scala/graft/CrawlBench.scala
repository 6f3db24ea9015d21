package graft

import graft.core.Synth
import graft.frontier.{Crawl, CrawlConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Full crawl-LOOP benchmark (distinct from `Bench`'s single-epoch kernel):
  * runs `Crawl.run` end-to-end — admission windows, robots gate, scrape,
  * expansion, bloom+anti-join dedup, per-epoch parquet snapshots with
  * manifests — over a generated site and reports sustained pages/sec
  * including all durability I/O, plus per-epoch walls from the manifests.
  *
  *   sbt "runMain graft.CrawlBench [hosts] [hostBudget] [cores]"
  *
  * Defaults: 300 hosts × 103 pages = 30 900 pages, budget 150, local[32].
  */
object CrawlBench {
  def main(args: Array[String]): Unit = {
    val hosts = args.headOption.map(_.toInt).getOrElse(300)
    val budget = args.lift(1).map(_.toInt).getOrElse(150)
    val cores = args.lift(2).map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val site = Synth.SiteCfg(seed = 42L, nHosts = hosts, cats = 3, subs = 2, prods = 5)
    val nPages = Synth.pageCount(site)
    val pages = spark.range(nPages)
      .map(i => Synth.pageRecAt(site, i))
      .toDF()
    val seeds = (0 until hosts).map(h => (s"${Synth.hostRoot(site, h)}/", "sitemap"))
      .toDF("url", "source")
    val robots = Seq.empty[(String, String, Long, String)]
      .toDF("host", "rules", "fetch_time", "rules_md5")
    val runDir = java.nio.file.Files.createTempDirectory("crawlbench").toString

    val seenFilter = args.lift(3).getOrElse("bloom")
    val cfg = CrawlConfig(strategy = "bfs", hostBudget = budget, maxEpochs = 40,
      seenFilter = seenFilter)
    val t0 = System.nanoTime()
    val summary = Crawl.run(spark, seeds, pages, robots, runDir, cfg)
    val sec = (System.nanoTime() - t0) / 1e9

    val walls = Crawl.metrics(spark, runDir)
      .select("epoch", "fetched", "new_frontier", "wall_ms")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    println(f"""{"pages":$nPages,"hosts":$hosts,"host_budget":$budget,"cores":$cores,"seen_filter":"$seenFilter",""" +
      f""""fetched":${summary.fetched},"seen":${summary.seen},"epochs":${summary.epochs},""" +
      f""""wall_sec":$sec%.2f,"pages_per_sec":${summary.fetched / sec}%.1f,""" +
      s""""epoch_walls_ms":[${walls.map(_._4).mkString(",")}]}""")
    spark.stop()
  }
}
