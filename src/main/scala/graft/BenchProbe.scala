package graft

import graft.core.Synth
import graft.scrape.Scrape

/** Spark epoch-job probe at one parallelism level: `runMain graft.SparkProbe
  * <cores> <pages>` — isolates the scaling measurement for diagnosis.
  */
object SparkProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val pages = args(1).toLong
    val s = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", math.max(cores, 8))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    Bench.probeEpoch(s, 8000)
    val t0 = System.nanoTime()
    val r = Bench.probeEpoch(s, pages)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"PROBE cores=$cores pages=$pages sec=$sec%.2f thr=${pages / sec}%.0f r=$r")
    s.stop()
  }
}

/** Scratch single-thread probe: ms/page for generate+scrape (no Spark). */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val cfg = Synth.SiteCfg(seed = 42L, nHosts = n / 100, cats = 3, subs = 2, prods = 5)
    // warmup
    (0 until 5000).foreach { i => Scrape.scrape(s"u$i", Synth.pageAt(cfg, i % 1000).html) }
    var t0 = System.nanoTime()
    var spans = 0L
    (0 until n).foreach { i =>
      val p = Synth.pageAt(cfg, i.toLong)
      spans += Scrape.scrape(p.url, p.html).spans.size
    }
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"single-thread: $n pages in $sec%.2f s = ${n / sec}%.0f pages/s (${sec * 1e3 / n}%.3f ms/page), $spans spans")
    // threads scaling probe (no Spark): 8 vs 32 plain threads
    for (threads <- Seq(8, 32)) {
      t0 = System.nanoTime()
      val per = n / threads
      val ts = (0 until threads).map { t =>
        val th = new Thread(() => {
          var i = t * per
          while (i < (t + 1) * per) {
            val p = Synth.pageAt(cfg, i.toLong)
            Scrape.scrape(p.url, p.html)
            i += 1
          }
        })
        th.start(); th
      }
      ts.foreach(_.join())
      val tsec = (System.nanoTime() - t0) / 1e9
      println(f"$threads%2d threads: ${per * threads} pages in $tsec%.2f s = ${per * threads / tsec}%.0f pages/s")
    }
  }
}
