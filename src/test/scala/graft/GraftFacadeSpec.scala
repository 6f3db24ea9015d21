package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Synth
import graft.frontier.CrawlConfig
import graft.scrape.CssExtract

/** The public facade: the one-object surface a crawl4ai user lands on
  * (API.md mapping). Smoke-drives every facade method.
  */
class GraftFacadeSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  lazy val g = new Graft(spark)
  val site = Synth.SiteCfg(seed = 7L, nHosts = 1, cats = 1, subs = 1, prods = 1)

  test("crawl + docs + visits through the facade") {
    val pages = (0L until Synth.pageCount(site)).map { i =>
      val p = Synth.pageAt(site, i)
      graft.core.PageRec(p.url, 0L, p.host, p.html, 200, 0)
    }.toDF().withColumn("url_hash", xxhash64(col("url")))
    val runDir = java.nio.file.Files.createTempDirectory("facade").toString
    val summary = g.crawl(Synth.seeds(site).toDF(), pages,
      Synth.robots(site).toDF(), runDir, CrawlConfig(hostBudget = 10, maxEpochs = 20))
    assert(summary.fetched == Synth.pageCount(site))
    assert(g.docs(runDir).count() == summary.fetched)
    assert(g.visits(runDir).count() == summary.fetched)
  }

  test("scrape + markdown + metadata + tables through the facade") {
    val p = Synth.pageAt(site, 0L)
    val doc = g.scrapeHtml(p.url, p.html)
    assert(doc.spans == p.expectedSpans)
    val md = g.markdown(p.html, p.url)
    assert(md.raw_markdown.nonEmpty &&
      md.references_markdown.startsWith("\n\n## References"))
    assert(g.metadata(p.html)("title") == p.title)
    val sub = Synth.pageAt(site, 2L) // the sub page carries the data table
    assert(g.extractTables(sub.html).nonEmpty)
  }

  test("css extraction + seeding through the facade") {
    val json = g.extractCss(
      """<div class="x"><span class="v">42</span></div>""",
      CssExtract.Schema(".x", Seq(CssExtract.Field("v", ".v", CssExtract.TextF))))
    assert(json == """[{"v":"42"}]""")
    val seeds = g.seedUrls(Seq("sitemap" -> Seq("http://a.com/x").toDF("url")))
    assert(seeds.count() == 1)
  }

  test("chunking strategies") {
    import graft.ops.TextAnalysis
    val df = Seq("para one here\n\npara two there", "w1 w2 w3 w4 w5 w6 w7").toDF("text")
    val rx = df.select(TextAnalysis.regexChunks(col("text")).as("c"))
      .as[Seq[String]].collect()
    assert(rx(0) == Seq("para one here", "para two there"))
    val sw = df.select(TextAnalysis.slidingWindowChunks(col("text"), 4, 2).as("c"))
      .as[Seq[String]].collect()
    assert(sw(1).head == "w1 w2 w3 w4")
    assert(sw(1)(1) == "w3 w4 w5 w6")
    assert(sw(1).last.contains("w7"))
  }
}
