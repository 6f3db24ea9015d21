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

  test("curateCorpus: each stage drops exactly what it should") {
    import graft.ops.CurateConfig
    val good1 = "the quick brown fox jumps over the lazy dog and it was a " +
      "good day in the forest for everyone involved"
    val docs = Seq(
      (1L, good1),                               // survives (canonical)
      (2L, good1),                               // exact copy → exact dedup
      (3L, good1 + " extra trailing marker"),    // light edit → fuzzy dedup
      (4L, "x"),                                 // → quality gate
      (5L, Seq.fill(40)("spam spam").mkString(" ")), // → repetition gate
      (6L, "we found the unique marker phrase hidden inside a long and " +
           "mostly ordinary paragraph about nothing in particular that " +
           "was still quite readable"),          // → decontamination
      (7L, "a completely separate article describing gardens with flowers " +
           "and trees that bloom in the spring when the weather is warm")
    ).toDF("doc_id", "text")
    val bench = Seq("this benchmark contains the unique marker phrase within it")
      .toDF("text")
    val cfg = CurateConfig(minQuality = 0.3, maxDupLineFrac = 0.5,
      maxTopGramFrac = 0.5, maxDupGramFrac = 0.5,
      fuzzy = "jaccard", fuzzyThreshold = 0.5, fuzzyN = 2,
      benchK = 3, sampleFraction = 1.0)
    val out = g.curateCorpus(docs, "doc_id", "text", Some(bench), "text", cfg)
    assert(out.select("doc_id").as[Long].collect().toSet == Set(1L, 7L))
    // minhash path agrees on this corpus
    val mh = g.curateCorpus(docs, "doc_id", "text", Some(bench), "text",
      cfg.copy(fuzzy = "minhash"))
    assert(mh.select("doc_id").as[Long].collect().toSet == Set(1L, 7L))
    // deterministic sample subsets the survivors identically across runs
    val s1 = g.curateCorpus(docs, "doc_id", "text", Some(bench), "text",
      cfg.copy(sampleFraction = 0.5)).select("doc_id").as[Long].collect().toSet
    val s2 = g.curateCorpus(docs, "doc_id", "text", Some(bench), "text",
      cfg.copy(sampleFraction = 0.5)).select("doc_id").as[Long].collect().toSet
    assert(s1 == s2 && s1.subsetOf(Set(1L, 7L)))
    // the optional C4 stage-0 gate: a lorem-ipsum doc is dropped before the
    // gates, a javascript boilerplate line is stripped from the text the
    // later stages see, and terminal-punctuation/word-count rules bind
    val c4docs = Seq(
      (1L, "This article has a proper first sentence for the corpus here.\n" +
           "please enable javascript to continue reading this page.\n" +
           "It also keeps a second real sentence with enough words.\n" +
           "And finally a third good sentence closes the document here."),
      (2L, "Lorem ipsum dolor sit amet consectetur adipiscing elit today.\n" +
           "A fine sentence with plenty of words to pass the gate.\n" +
           "Another fine sentence with plenty of words right here.\n" +
           "And one more full sentence to clear the line minimum.")
    ).toDF("doc_id", "text")
    val c4out = g.curateCorpus(c4docs, "doc_id", "text", None, "text",
      cfg.copy(c4Lines = true, fuzzy = "none"))
    val kept = c4out.select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(kept.keySet == Set(1L))
    assert(!kept(1L).toLowerCase.contains("javascript"))
    assert(kept(1L).linesIterator.size == 3)
  }

  test("curateCorpus: embedding fuzzy stage dedups semantically via the Embedder seam") {
    import graft.ops.CurateConfig
    val good1 = "the quick brown fox jumps over the lazy dog and it was a " +
      "good day in the forest for everyone involved"
    val docs = Seq(
      (1L, good1),
      (3L, good1 + " extra"), // one appended word: near-identical bag of words
      (7L, "a completely separate article describing gardens with flowers " +
           "and trees that bloom in the spring when the weather is warm")
    ).toDF("doc_id", "text")
    val cfg = CurateConfig(minQuality = 0.3, maxDupLineFrac = 0.5,
      maxTopGramFrac = 0.5, maxDupGramFrac = 0.5,
      fuzzy = "embedding", fuzzyThreshold = 0.9, sampleFraction = 1.0)
    val out = g.curateCorpus(docs, "doc_id", "text", None, "text", cfg)
    assert(out.select("doc_id").as[Long].collect().toSet == Set(1L, 7L))
  }

  test("crawl → curate: the crawled corpus flows end-to-end into curation") {
    import graft.ops.CurateConfig
    val pages = (0L until Synth.pageCount(site)).map { i =>
      val p = Synth.pageAt(site, i)
      graft.core.PageRec(p.url, 0L, p.host, p.html, 200, 0)
    }.toDF().withColumn("url_hash", xxhash64(col("url")))
    val runDir = java.nio.file.Files.createTempDirectory("crawl2curate").toString
    val summary = g.crawl(Synth.seeds(site).toDF(), pages,
      Synth.robots(site).toDF(), runDir, CrawlConfig(hostBudget = 10, maxEpochs = 20))
    // assemble one text document per crawled URL from its ordered spans
    // doc ids entering curation follow the engine's content-addressing
    // convention: 64-bit xxhash64 of the canonical URL (Curate requires
    // integer-castable ids for component labeling)
    val corpus = g.docs(runDir)
      .select(xxhash64(col("doc_id")).as("doc_id"), explode(col("spans")).as("span"))
      .where(col("span.kind") === "text")
      .groupBy("doc_id")
      .agg(concat_ws(" ", transform(
        array_sort(collect_list(struct(col("span.offset").as("offset"),
          col("span.text").as("text")))),
        s => s.getField("text"))).as("text"))
    val cfg = CurateConfig(minQuality = 0.0, maxDupLineFrac = 1.0,
      maxTopGramFrac = 1.0, maxDupGramFrac = 1.0,
      fuzzy = "minhash", fuzzyThreshold = 0.9, sampleFraction = 1.0)
    val curated = g.curateCorpus(corpus, "doc_id", "text", None, "text", cfg)
    // synthetic pages are pairwise distinct: everything crawled survives
    assert(curated.count() == summary.fetched)
  }

  test("curateCorpus: span dedup stage rewrites text and counts removals") {
    import graft.ops.CurateConfig
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "x alpha beta y"))
      .toDF("doc_id", "text")
    val cfg = CurateConfig(minQuality = 0.0, maxDupLineFrac = 1.0,
      maxTopGramFrac = 1.0, maxDupGramFrac = 1.0, fuzzy = "none",
      spanK = 2, sampleFraction = 1.0)
    val byId = g.curateCorpus(docs, "doc_id", "text", None, "text", cfg)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("text"), r.getAs[Long]("n_removed")))).toMap
    assert(byId(1L) == (("alpha beta gamma delta", 0L)))
    assert(byId(2L) == (("x y", 2L)))
  }

  test("chunking strategies") {
    import graft.ops.TextAnalysis
    val df = Seq("para one here\n\npara two there", "w1 w2 w3 w4 w5 w6 w7").toDF("text")
    val rx = df.select(TextAnalysis.regexChunks(col("text")).as("c"))
      .as[Seq[String]].collect()
    assert(rx(0) == Seq("para one here", "para two there"))
    val sw = df.select(TextAnalysis.slidingWindowChunks(col("text"), 4, 2).as("c"))
      .as[Seq[String]].collect()
    // reference-exact: misaligned end appends the LAST `window` words
    assert(sw(1) == Seq("w1 w2 w3 w4", "w3 w4 w5 w6", "w4 w5 w6 w7"))
    // 6 words in a 4-window: two step-aligned windows, aligned end -> no tail
    assert(sw(0) == Seq("para one here para", "here para two there"))
    val ow = df.select(TextAnalysis.overlappingWindowChunks(col("text"), 3, 1).as("c"))
      .as[Seq[String]].collect()
    // starts advance by window-overlap=2; final chunk is the short remainder
    assert(ow(1) == Seq("w1 w2 w3", "w3 w4 w5", "w5 w6 w7"))
    assert(ow(0) == Seq("para one here", "here para two", "two there"))
    // a text of <= window words comes back whole, whitespace preserved
    val whole = Seq("one\n\ntwo three").toDF("text")
    assert(whole.select(TextAnalysis.slidingWindowChunks(col("text"), 4, 2).as("c"))
      .as[Seq[String]].head() == Seq("one\n\ntwo three"))
    assert(whole.select(TextAnalysis.overlappingWindowChunks(col("text"), 3, 1).as("c"))
      .as[Seq[String]].head() == Seq("one\n\ntwo three"))
    // aligned end: no extra tail window
    val aligned = Seq("a b c d e f").toDF("text")
    val swa = aligned.select(TextAnalysis.slidingWindowChunks(col("text"), 4, 2).as("c"))
      .as[Seq[String]].collect()
    assert(swa(0) == Seq("a b c d", "c d e f"))
    val owa = aligned.select(TextAnalysis.overlappingWindowChunks(col("text"), 4, 2).as("c"))
      .as[Seq[String]].collect()
    assert(owa(0) == Seq("a b c d", "c d e f"))
  }
}
