package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.LinkScore
import graft.ops.Stem
import graft.scrape.{Meta, Tables}

class MetaSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  val page =
    """<html><head>
      |  <title>Spark Guide — Tuning</title>
      |  <meta name="description" content="How to tune Spark jobs for scale">
      |  <meta name="keywords" content="spark,tuning">
      |  <meta name="author" content="Data Team">
      |  <meta property="og:title" content="Spark Guide">
      |  <meta property="twitter:card" content="summary">
      |  <link rel="canonical" href="https://x.com/guide">
      |  <script>var noise = 1;</script>
      |</head><body>
      |  <h1>Tuning Spark</h1>
      |  <h2>Shuffle partitions</h2>
      |  <p>Body text.</p>
      |</body></html>""".stripMargin

  test("metadata extraction: title, meta, og/twitter, canonical") {
    val m = Meta.extractMetadata(page)
    assert(m("title") == "Spark Guide — Tuning")
    assert(m("description") == "How to tune Spark jobs for scale")
    assert(m("keywords") == "spark,tuning")
    assert(m("author") == "Data Team")
    assert(m("og:title") == "Spark Guide")
    assert(m("twitter:card") == "summary")
    assert(m("canonical") == "https://x.com/guide")
  }

  test("head peek stops at </head> or cap") {
    val peek = Meta.headPeek(page)
    assert(peek.endsWith("</head>"))
    val noHead = "x" * 100000
    assert(Meta.headPeek(noHead).length == Meta.HeadPeekBytes)
  }

  test("page context terms from title + headlines + description") {
    val terms = Meta.pageContextTerms(page)
    assert(terms.contains("spark"))
    assert(terms.contains("tuning"))
    assert(terms.contains("shuffle"))
    assert(!terms.contains("to")) // length ≤ 2 dropped
  }

  test("fit html: scripts dropped, long text truncated, structure kept") {
    val long = "<html><body><script>bad()</script><p>" + ("word " * 300) + "</p></body></html>"
    val fit = Meta.fitHtml(long)
    assert(!fit.contains("bad()"))
    assert(fit.contains("<p>"))
    assert(fit.length < long.length)
    assert(fit.contains("…"))
  }

  test("data table detection + extraction") {
    val tableHtml =
      """<html><body>
        |<table summary="prices">
        |  <caption>Products</caption>
        |  <thead><tr><th>Name</th><th>Price</th></tr></thead>
        |  <tbody>
        |    <tr><td>Widget</td><td>19</td></tr>
        |    <tr><td>Gadget</td><td>5</td></tr>
        |  </tbody>
        |</table>
        |<table role="presentation"><tr><td>layout</td><td>grid</td></tr></table>
        |</body></html>""".stripMargin
    val tables = Tables.extract(tableHtml)
    assert(tables.length == 1) // layout table filtered out
    val t = tables.head
    assert(t.caption == "Products")
    assert(t.summary == "prices")
    assert(t.headers == Seq("Name", "Price"))
    assert(t.rows == Seq(Seq("Widget", "19"), Seq("Gadget", "5")))
  }

  test("link intrinsic score: quality signals ranked sensibly") {
    val df = Seq(
      // good: docs path, https, descriptive multi-word text, nav class
      ("Complete API Reference Guide", "https://x.com/docs/api", "API docs", "nav-primary", "", true),
      // bad: tracking path, generic text, ad class, nofollow
      ("click here", "http://x.com/track/click/z9", "", "ad-banner", "nofollow", false)
    ).toDF("text", "url", "title_attr", "class_attr", "rel_attr", "is_docs")
      .withColumn("terms", typedLit(Seq("api", "reference", "spark")))
    val scores = df.select(LinkScore.intrinsic(col("text"), col("url"),
        col("title_attr"), col("class_attr"), col("rel_attr"),
        col("terms"), col("is_docs")).as("s"))
      .collect().map(_.getDouble(0))
    assert(scores(0) > 6.0, s"good link scored ${scores(0)}")
    assert(scores(1) < 2.0, s"bad link scored ${scores(1)}")
    assert(scores.forall(s => s >= 0.0 && s <= 10.0))
  }

  test("porter stemmer: classic vectors") {
    val cases = Map(
      "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
      "caress" -> "caress", "cats" -> "cat", "feed" -> "feed",
      "agreed" -> "agre", "plastered" -> "plaster", "motoring" -> "motor",
      "sing" -> "sing", "conflated" -> "conflat", "troubling" -> "troubl",
      "sized" -> "size", "hopping" -> "hop", "falling" -> "fall",
      "happy" -> "happi", "relational" -> "relat", "conditional" -> "condit",
      "vietnamization" -> "vietnam", "predication" -> "predic",
      "feudalism" -> "feudal", "hopefulness" -> "hope",
      "triplicate" -> "triplic", "formative" -> "form", "formalize" -> "formal",
      "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
      "adjustment" -> "adjust", "probate" -> "probat", "rate" -> "rate",
      "cease" -> "ceas", "controll" -> "control", "roll" -> "roll")
    cases.foreach { case (in, exp) =>
      assert(Stem.porter(in) == exp, s"porter($in) = ${Stem.porter(in)}, want $exp")
    }
  }

  test("snowball english (Porter2) stems per the published spec") {
    val cases = Seq(
      // exceptional forms + invariants (spec tables)
      "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
      "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
      "early" -> "earli", "only" -> "onli", "singly" -> "singl",
      "sky" -> "sky", "news" -> "news", "atlas" -> "atlas", "bias" -> "bias",
      // post-step-1a invariants
      "inning" -> "inning", "herring" -> "herring", "proceed" -> "proceed",
      "exceed" -> "exceed", "succeed" -> "succeed", "proceeding" -> "proceed",
      // step 1a
      "caresses" -> "caress", "ponies" -> "poni", "ties" -> "tie",
      "cries" -> "cri", "dies" -> "die", "gaps" -> "gap", "gas" -> "gas",
      "kiwis" -> "kiwi", "caress" -> "caress", "cats" -> "cat",
      // step 1b incl. short-word +e, doubles, R1 gate on eed
      "agreed" -> "agre", "feed" -> "feed", "plastered" -> "plaster",
      "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
      "hopping" -> "hop", "hoping" -> "hope", "tanned" -> "tan",
      "falling" -> "fall", "hissing" -> "hiss", "failing" -> "fail",
      "filing" -> "file", "knitting" -> "knit",
      // step 1c + consonant-Y prelude
      "cry" -> "cri", "crying" -> "cri", "by" -> "by", "say" -> "say",
      "saying" -> "say", "enjoying" -> "enjoy", "flying" -> "fli",
      "gypsy" -> "gypsi", "happily" -> "happili",
      // steps 2-5 chains
      "conditional" -> "condit", "rational" -> "ration", "national" -> "nation",
      "generously" -> "generous", "generate" -> "generat",
      "communication" -> "communic", "beautiful" -> "beauti",
      "beautifully" -> "beauti", "happiness" -> "happi",
      "electricity" -> "electr", "sensational" -> "sensat",
      "replacement" -> "replac", "argument" -> "argument",
      "adjustment" -> "adjust", "allowance" -> "allow", "inference" -> "infer")
    cases.foreach { case (in, exp) =>
      assert(Stem.snowball(in) == exp, s"snowball($in) = ${Stem.snowball(in)}, want $exp")
    }
  }

  test("url relevance: 3-gram overlap favors matching paths") {
    val r1 = Stem.urlRelevance("http://x.com/spark-tuning-guide", "spark tuning")
    val r2 = Stem.urlRelevance("http://x.com/cooking/pasta", "spark tuning")
    assert(r1 > 0.5)
    assert(r2 < 0.2)
    assert(Stem.urlRelevance(null, "q") == 0.0)
  }
}
