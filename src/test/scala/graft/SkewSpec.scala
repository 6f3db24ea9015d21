package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Hot-domain skew: the north rule requires per-host politeness WITHOUT one
  * hot host serializing onto one task. The engine's answer (Crawl.run fetch
  * stage) is the salted repartition: partition by (host, url_hash % S). This
  * spec pins the distribution property itself.
  */
class SkewSpec extends AnyFunSuite {
  import SparkTestSession.spark

  test("salted repartition spreads a 90%-hot host; plain host partitioning does not") {
    val n = 20000
    val salt = 16
    // 90% of URLs on one host — the hot-domain shape
    val frontier = spark.range(n).select(
      when(col("id") % 10 < 9, "hot.com").otherwise(concat(lit("cold"), col("id") % 50)).as("host"),
      col("id").as("url_hash"))

    def maxShare(df: org.apache.spark.sql.DataFrame): Double = {
      val counts = df.groupBy(spark_partition_id()).count()
        .collect().map(_.getLong(1))
      counts.max.toDouble / counts.sum
    }

    val plain = frontier.repartition(16, col("host"))
    val salted = frontier.repartition(16, col("host"), pmod(col("url_hash"), lit(salt)))

    val plainShare = maxShare(plain)
    val saltedShare = maxShare(salted)
    // plain: the hot host's 90% lands in ONE partition
    assert(plainShare >= 0.85, s"plain share $plainShare")
    // salted: no partition holds more than ~2/16 of the data
    assert(saltedShare <= 0.20, s"salted share $saltedShare")
  }

  test("politeness is enforced BEFORE salting (budget on host, spread after)") {
    // order of operations (SURVEY.md §7.4.3): admission window on the raw
    // host first, salting only for the fetch/scrape stage — verify a salted
    // frontier still yields exact per-host admission counts
    import org.apache.spark.sql.expressions.Window
    val frontier = spark.range(1000).select(
      when(col("id") % 5 < 4, "hot.com").otherwise("cold.com").as("host"),
      col("id").as("url_hash"), col("id").as("ord"))
    val admitted = frontier.withColumn("rk",
        org.apache.spark.sql.functions.row_number().over(
          Window.partitionBy("host").orderBy("ord")))
      .where(col("rk") <= 7)
      .repartition(16, col("host"), pmod(col("url_hash"), lit(8)))
    val perHost = admitted.groupBy("host").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perHost("hot.com") == 7)
    assert(perHost("cold.com") == 7)
  }
}
