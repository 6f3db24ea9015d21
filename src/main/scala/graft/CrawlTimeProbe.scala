package graft

/** Scratch: time one shared crawl run + per-epoch wall from manifests. */
object CrawlTimeProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.map(_.toInt).getOrElse(8)
    val s = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", args.lift(1).map(_.toInt).getOrElse(32))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val df = SparkEntry.entry(s)
    val n = df.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"CRAWL rows=$n wall=$sec%.2f")
    graft.frontier.Crawl.metrics(s, SparkEntry.debugRunDir)
      .select("epoch", "fetched", "new_frontier", "wall_ms").collect()
      .foreach(r => println(s"EPOCH ${r.mkString(" ")}"))
    s.stop()
  }
}
