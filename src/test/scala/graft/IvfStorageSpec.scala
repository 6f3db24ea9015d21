package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Similarity
import java.nio.file.Files

/** The ANN scale path: vectors written PARTITIONED BY their IVF cell, so a
  * probe reads only nProbe directories — partition pruning does the
  * candidate selection, no full scan. At 100 TB this is the difference
  * between touching ~nProbe/cells of the data and all of it.
  */
class IvfStorageSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("cell-partitioned embeddings: probe scans only its partitions (pruned)") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cells = 8
    val dir = Files.createTempDirectory("ivf").toString + "/table"
    embs.withColumn("cell", Similarity.ivfCell(col("embedding"), cells))
      .write.partitionBy("cell").parquet(dir)

    val stored = spark.read.parquet(dir)
    // the probe: filter on two cells
    val probe = stored.where(col("cell").isin(1, 3))
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("cell"), plan)
    // pruning is real: scanned file partitions < total
    val scannedCells = probe.select("cell").distinct().as[Int].collect().toSet
    assert(scannedCells.subsetOf(Set(1, 3)))

    // correctness: probed top-k within the two cells equals brute force
    // restricted to those cells
    val q = embs.where(col("vec_id") === 5).select("embedding").as[Seq[Float]].head()
    val got = probe
      .select(col("vec_id"), Similarity.cosine(col("embedding"), typedLit(q)).as("sim"))
      .orderBy(col("sim").desc, col("vec_id")).limit(5)
      .as[(Long, Double)].collect().toSeq
    val exp = embs.withColumn("cell", Similarity.ivfCell(col("embedding"), cells))
      .where(col("cell").isin(1, 3))
      .select(col("vec_id"), Similarity.cosine(col("embedding"), typedLit(q)).as("sim"))
      .orderBy(col("sim").desc, col("vec_id")).limit(5)
      .as[(Long, Double)].collect().toSeq
    assert(got.map(_._1) == exp.map(_._1))
  }

  test("bucketed LSH table: sign-bucket column partitions the near-dup join") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(100)
    val bucketed = embs.withColumn("bucket", Similarity.signBucket(col("embedding"), 6))
    val nBuckets = bucketed.select("bucket").distinct().count()
    assert(nBuckets > 4, s"only $nBuckets buckets") // hashing actually spreads
    // every vector lands in exactly one bucket — the join key is total
    assert(bucketed.where(col("bucket").isNull).count() == 0)
  }
}
