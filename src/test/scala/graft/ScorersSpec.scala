package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.functions.{Filters, Scorers}

/** Golden scores per URL, mirroring the reference scorer truth tables
  * (deep_crawling/scorers.py lookup tables; tests/general/
  * test_deep_crawl_scorers.py expected values).
  */
class ScorersSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def eval(urls: Seq[String], c: org.apache.spark.sql.Column): Seq[Double] =
    urls.toDF("url").select(c.cast("double").as("v")).collect().map(_.getDouble(0)).toSeq

  test("keyword relevance = matched/total, case-insensitive") {
    val urls = Seq(
      "http://x.com/python-guide",            // 1 of 2
      "http://x.com/PYTHON-spark-tutorial",   // 2 of 2
      "http://x.com/other")                   // 0
    assert(eval(urls, Scorers.keywordRelevance(col("url"), Seq("python", "spark")))
      == Seq(0.5, 1.0, 0.0))
  }

  test("path depth score lookup [1, .5, 1/3, .25], else 1/(1+d)") {
    val urls = Seq(
      "http://x.com/a/b/c",       // depth 3 == optimal → 1.0
      "http://x.com/a/b",         // |2-3|=1 → 0.5
      "http://x.com/a",           // 2 → 1/3
      "http://x.com",             // 3 → 0.25
      "http://x.com/a/b/c/d/e/f/g/h") // |8-3|=5 → 1/6
    val got = eval(urls, Scorers.pathDepthScore(col("url"), 3))
    val exp = Seq(1.0, 0.5, 1.0 / 3.0, 0.25, 1.0 / 6.0)
    got.zip(exp).foreach { case (g, e) => assert(math.abs(g - e) < 1e-9, s"$g != $e") }
  }

  test("freshness: year table then decay, 0.5 default") {
    val urls = Seq(
      "http://x.com/blog/2024/01/post",  // current → 1.0
      "http://x.com/blog/2023-05-01",    // 1y → 0.9
      "http://x.com/blog/2019/post",     // 5y → 0.5
      "http://x.com/blog/2010/post",     // 14y → max(0.1, 1-1.4) = 0.1
      "http://x.com/2014/x-2022",        // latest 2022 → 0.8
      "http://x.com/plain")              // none → 0.5
    val got = eval(urls, Scorers.freshnessScore(col("url"), 2024))
    val exp = Seq(1.0, 0.9, 0.5, 0.1, 0.8, 0.5)
    got.zip(exp).foreach { case (g, e) => assert(math.abs(g - e) < 1e-9, s"$g != $e") }
  }

  test("content type score: extension → weight, default 0") {
    val w = Map("html" -> 1.0, "pdf" -> 0.8, "jpg" -> 0.2)
    val urls = Seq("http://x.com/a.html", "http://x.com/b.pdf?x=1",
      "http://x.com/c.jpg#frag", "http://x.com/d.exe", "http://x.com/none")
    assert(eval(urls, Scorers.contentTypeScore(col("url"), w))
      == Seq(1.0, 0.8, 0.2, 0.0, 0.0))
  }

  test("domain authority: host map with default") {
    val w = Map("python.org" -> 1.0, "github.com" -> 0.9)
    val urls = Seq("http://python.org/doc", "https://github.com/x/y",
      "http://unknown.io/z")
    assert(eval(urls, Scorers.domainAuthority(col("url"), w, 0.5))
      == Seq(1.0, 0.9, 0.5))
  }

  test("composite: normalized weighted mean") {
    val urls = Seq("http://x.com/python/2024/post")
    val c = Scorers.composite(Seq(
      (Scorers.keywordRelevance(col("url"), Seq("python")), 1.0),
      (Scorers.freshnessScore(col("url"), 2024), 1.0)))
    assert(math.abs(eval(urls, c).head - 1.0) < 1e-9)
  }

  test("pattern filter fast paths + globs") {
    val urls = Seq("http://x.com/a/page.html", "http://x.com/blog/post",
      "http://x.com/img.png")
    assert(eval(urls, Filters.patternFilter(col("url"), Seq("*.html")).cast("int").cast("double"))
      == Seq(1.0, 0.0, 0.0))
    assert(eval(urls, Filters.patternFilter(col("url"), Seq("http://x.com/blog/*")).cast("int").cast("double"))
      == Seq(0.0, 1.0, 0.0))
    assert(eval(urls, Filters.patternFilter(col("url"), Seq("*blog*", "*.png")).cast("int").cast("double"))
      == Seq(0.0, 1.0, 1.0))
    assert(eval(urls, Filters.patternFilter(col("url"), Seq("*.html"), reverse = true).cast("int").cast("double"))
      == Seq(0.0, 1.0, 1.0))
  }

  test("domain filter: subdomains, block wins") {
    val urls = Seq("http://docs.python.org/x", "http://python.org/x",
      "http://evil.com/x", "http://sub.evil.com/x", "http://other.net/x")
    assert(eval(urls, Filters.domainFilter(col("url"), blocked = Seq("evil.com")).cast("int").cast("double"))
      == Seq(1.0, 1.0, 0.0, 0.0, 1.0))
    assert(eval(urls, Filters.domainFilter(col("url"), allowed = Seq("python.org")).cast("int").cast("double"))
      == Seq(1.0, 1.0, 0.0, 0.0, 0.0))
  }

  test("content type filter: extension-less passes") {
    val urls = Seq("http://x.com/a.html", "http://x.com/b.css",
      "http://x.com/api/data", "http://x.com/c.pdf")
    assert(eval(urls, Filters.contentTypeFilter(col("url"), Seq("text/html", "application/pdf")).cast("int").cast("double"))
      == Seq(1.0, 0.0, 1.0, 1.0))
  }
}
