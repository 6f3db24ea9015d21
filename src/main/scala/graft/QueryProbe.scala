package graft

/** Per-query timing probe: `runMain graft.QueryProbe <sfDir> <name>...` —
  * runs each named SparkEntry query several times in one JVM so first-run
  * (planning + JIT + codegen) cost separates from steady-state, for
  * diagnosing driver-record drift (BENCH.md).
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
                else Seq("q_lang_id", "q_canonicalize")
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val times = (0 until 5).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(s, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $n first=${times.head}%.3f steady=${times.tail.min}%.3f all=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    s.stop()
  }
}
