package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Urls
import graft.plans.GraftExtensions

/** The native CanonicalizeUrl expression: SQL + Column access, equivalence
  * with the Scala function and the UDF path, codegen participation.
  */
class ExpressionSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  GraftExtensions.install(spark)

  val urls = Seq(
    "HTTP://Example.COM/A/b/?utm_source=x&b=2&a=1#frag",
    "https://site.org/path/page.html?q=1",
    "http://x.com/",
    "http://x.com/a%2Fb?z=2&y=1")

  test("sql function matches the Scala canonicalizer (deep)") {
    val got = urls.toDF("u")
      .selectExpr("canonicalize_url(u) AS c")
      .as[String].collect().toSeq
    assert(got == urls.map(Urls.canonicalizeDeep(_, "")))
  }

  test("two-arg form selects the extended canonicalizer") {
    val got = urls.toDF("u")
      .selectExpr("canonicalize_url(u, false) AS c")
      .as[String].collect().toSeq
    assert(got == urls.map(Urls.canonicalize(_, "")))
  }

  test("column helper + nulls + empties") {
    val got = (urls :+ null).toDF("u")
      .select(GraftExtensions.canonicalizeUrl(col("u")).as("c"))
      .as[String].collect().toSeq
    assert(got.last == null)
    assert(got.init == urls.map(Urls.canonicalizeDeep(_, "")))
    // empty string canonicalizes to null (reference returns falsy)
    val empty = Seq("").toDF("u")
      .selectExpr("canonicalize_url(u) AS c").as[String].head()
    assert(empty == null)
  }

  test("expression participates in whole-stage codegen") {
    // LocalRelation plans bypass codegen — use a range source so the
    // projection actually compiles
    val df = spark.range(100)
      .selectExpr("canonicalize_url(concat('HTTP://X.com/p/', id, '?b=2&a=1#f')) AS c")
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(p.contains("Found 1 WholeStageCodegen subtrees"), p.take(400))
    assert(p.contains(".compute("), "generated code should call the kernel")
    // and it evaluates correctly inside the generated code
    assert(df.limit(1).as[String].head() == "http://x.com/p/0?b=2&a=1")
  }

  test("hash-equivalence with the plan-side xxhash64 path") {
    // the frontier contract: xxhash64(canonicalize_url(u)) computable fully
    // inside one codegen'd projection
    val got = urls.toDF("u")
      .selectExpr("xxhash64(canonicalize_url(u)) AS h")
      .as[Long].collect().toSeq
    assert(got == urls.map(u => graft.core.Xxh64.hashString(Urls.canonicalizeDeep(u, ""))))
  }
}
