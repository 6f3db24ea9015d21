package graft

import java.lang.management.ManagementFactory
import scala.jdk.CollectionConverters._

/** In-JVM scaling diagnostic: interleaved trials at two parallelism levels
  * with per-trial wall, GC time, and process-CPU utilization. Run:
  * `runMain graft.ScaleProbe [ppc] [trials]`.
  */
object ScaleProbe {
  private def gcMs(): Long =
    ManagementFactory.getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum

  private def cpuNs(): Long =
    ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean].getProcessCpuTime

  def main(args: Array[String]): Unit = {
    val ppc = args.headOption.map(_.toLong).getOrElse(30000L)
    val trials = args.lift(1).map(_.toInt).getOrElse(4)
    val pin = args.lift(2).contains("pin")
    val levels = Seq(2, 8)
    for (t <- 0 until trials; cores <- levels) {
      if (pin) Bench.pinCpus(cores)
      val s = org.apache.spark.sql.SparkSession.builder()
        .master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", math.max(cores, 8))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      Bench.probeEpoch(s, 8000) // warm
      val n = ppc * cores
      val (g0, c0, t0) = (gcMs(), cpuNs(), System.nanoTime())
      Bench.probeEpoch(s, n)
      val wall = (System.nanoTime() - t0) / 1e9
      val cpu = (cpuNs() - c0) / 1e9
      val gc = (gcMs() - g0) / 1e3
      println(f"TRIAL $t cores=$cores pages=$n wall=$wall%.2f thr=${n / wall}%.0f " +
        f"cpuUtil=${cpu / wall}%.2f gcSec=$gc%.2f")
      s.stop()
    }
  }
}
