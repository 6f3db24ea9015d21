package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.scrape.{ContentFilter, CssExtract, Dom}
import graft.scrape.CssExtract._

class ExtractSpec extends AnyFunSuite {

  val html =
    """<html><body>
      |<div id="main">
      |  <div class="product featured" id="p1">
      |    <h2 class="name">Widget <b>Pro</b></h2>
      |    <span class="price">$19.99</span>
      |    <a href="/p/1" class="buy">Buy now</a>
      |    <ul class="tags"><li>red</li><li>large</li></ul>
      |  </div>
      |  <div class="product" id="p2">
      |    <h2 class="name">Gadget</h2>
      |    <span class="price">$5.00</span>
      |    <a href="/p/2" class="buy">Buy</a>
      |    <ul class="tags"><li>blue</li></ul>
      |  </div>
      |  <div class="ad">Buy stuff!</div>
      |</div>
      |</body></html>""".stripMargin

  test("dom: parse, text, selectors") {
    val root = Dom.parse(html)
    assert(CssExtract.select(root, ".product").length == 2)
    assert(CssExtract.select(root, "div.product.featured").length == 1)
    assert(CssExtract.select(root, "#p2 .price").head.allText == "$5.00")
    assert(CssExtract.select(root, "div > h2").length == 2)
    assert(CssExtract.select(root, "ul > li").length == 3)
    assert(CssExtract.select(root, ".name, .price").length == 4)
    // child combinator is strict: li is not a direct child of .product
    assert(CssExtract.select(root, ".product > li").isEmpty)
    assert(CssExtract.select(root, ".product li").length == 3)
  }

  test("schema extraction: text/attr/regex/list fields") {
    val schema = Schema(".product", Seq(
      Field("name", ".name", TextF),
      Field("price", ".price", TextF),
      Field("price_value", ".price", RegexF("\\$([0-9.]+)")),
      Field("link", "a.buy", AttrF("href")),
      Field("tags", ".tags li", ListF(Seq(Field("tag", "", TextF))))))
    val items = CssExtract.extract(html, schema)
    assert(items.length == 2)
    assert(items(0)("name") == SV("Widget Pro"))
    assert(items(0)("price_value") == SV("19.99"))
    assert(items(0)("link") == SV("/p/1"))
    assert(items(0)("tags") == LV(Seq(MV(Map("tag" -> SV("red"))), MV(Map("tag" -> SV("large"))))))
    assert(items(1)("name") == SV("Gadget"))
    assert(items(1)("link") == SV("/p/2"))
    val json = CssExtract.toJson(items)
    assert(json.startsWith("[{"))
    assert(json.contains("\"name\":\"Widget Pro\""))
  }

  test("pruning filter: boilerplate dropped, content kept") {
    val page =
      """<html><body>
        |<nav class="nav"><a href="/">Home</a><a href="/x">X</a></nav>
        |<article>
        |  <h1>A Long Informative Title About Things</h1>
        |  <p>This is a long paragraph with plenty of meaningful text content that
        |  goes on and on about the topic at hand giving lots of information to the
        |  reader in complete sentences with real substance and many many words.</p>
        |</article>
        |<div class="sidebar-ads"><a href="/ad">ad</a></div>
        |</body></html>""".stripMargin
    val kept = ContentFilter.pruneHtml(page)
    val keptText = kept.mkString(" ")
    assert(keptText.contains("long paragraph"))
    assert(!keptText.contains("sidebar-ads") || !keptText.contains(">ad<"))
    // nav is excluded structurally before scoring
    assert(!kept.exists(_.contains("<nav")))
  }

  test("bm25 chunk filter: query-relevant chunks survive, others pruned") {
    val page =
      """<body>
        |<p>spark query engines process data with spark executors and spark tasks</p>
        |<p>cooking recipes for pasta involve tomatoes basil and olive oil dishes</p>
        |<h2>spark performance tuning</h2>
        |</body>""".stripMargin
    val chunks = ContentFilter.bm25Chunks(page, Seq("spark"), threshold = 0.1)
    val texts = chunks.map(_.text)
    assert(texts.exists(_.contains("spark query engines")))
    assert(texts.exists(_.contains("performance tuning")))
    assert(!texts.exists(_.contains("cooking recipes")))
    // heading priority boost: h2 score > p score per occurrence count
    val h2 = chunks.find(_.tag == "h2").get
    assert(h2.score > 0)
  }

  test("bm25 chunk pipeline (relational form)") {
    import SparkTestSession.spark
    import org.apache.spark.sql.functions._
    val df = spark.createDataFrame(Seq(
      (1L, Seq("spark is fast", "cooking pasta", "more spark tuning")),
      (2L, Seq("nothing relevant here", "just cooking")))).toDF("doc_id", "chunks")
    val out = ContentFilter.bm25ChunkPipeline(df, "doc_id", "chunks", Seq("spark"), 1.0)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 1L)
    assert(r.getAs[scala.collection.Seq[String]]("fit_chunks").toSeq ==
      Seq("spark is fast", "more spark tuning"))
  }
}
