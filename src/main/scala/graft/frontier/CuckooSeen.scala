package graft.frontier

import graft.core.Xxh64
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path}

/** Cuckoo filter for the URL-seen set — the DELETABLE alternative to
  * [[BloomSeen]] (the north-star names "bloom/cuckoo-filter URL-seen"; the
  * reference's cache layer supports TTL-based invalidation, utils.py cache
  * semantics + async_url_seeder.py TTL refresh, which a bloom cannot express
  * without a rebuild).
  *
  * Standard partial-key cuckoo filter (Fan, Andersen, Kaminsky, Mitzenmacher,
  * "Cuckoo Filter: Practically Better Than Bloom", CoNEXT 2014 — public
  * algorithm): buckets of 4 × 16-bit fingerprints, candidate buckets
  * i1 = h(x) mod m and i2 = i1 XOR (h(fp) mod m) (self-inverse, so either
  * bucket derives the other), bounded evict-and-kick insertion.
  *
  *  - no false negatives for present keys; FP rate ≈ 2·4/2^16 ≈ 1.2e-4
  *  - `delete` removes one copy of a fingerprint → TTL-expired URLs can be
  *    EVICTED so the crawler refetches them, with no full-filter rebuild
  *  - the epoch protocol is the same as BloomSeen's: one filter per seen
  *    DELTA, vector consulted at candidate time, compaction merges — plus
  *    delta-level eviction when a recrawl TTL expires an epoch.
  *
  * Capacity: `m` buckets × 4 slots; sized for ~0.95 load factor. At 10^10
  * URLs the filter is partitioned exactly like the seen deltas themselves
  * (one per epoch delta, bounded by compaction) — a single monolithic filter
  * is never built.
  */
final class CuckooFilter private (val numBuckets: Int,
                                  private val table: Array[Short],
                                  private val stash: scala.collection.mutable.ArrayBuffer[(Int, Short)] =
                                    scala.collection.mutable.ArrayBuffer.empty) extends Serializable {
  import CuckooFilter._

  private[frontier] def slots: Array[Short] = table

  /** Count of occupied slots (fingerprint 0 = empty) + stashed orphans. */
  def size: Int = { var c = 0; var i = 0; while (i < table.length) { if (table(i) != 0) c += 1; i += 1 }; c + stash.size }

  // numBuckets is a power of two: i2 = i1 XOR (h(fp) & mask) is then
  // self-inverse, so either bucket derives the other — the property the
  // kick loop's relocation depends on (a plain modulo breaks it and
  // manufactures false negatives after evictions).
  private val mask = numBuckets - 1

  private def bucketIndex(h: Long): Int = (h & mask).toInt

  private def altIndex(i: Int, fp: Short): Int =
    i ^ (Xxh64.hashInt(fp & 0xffff, AltSeed) & mask).toInt

  private def tryInsertAt(i: Int, fp: Short): Boolean = {
    val base = i * SlotsPerBucket
    var s = 0
    while (s < SlotsPerBucket) {
      if (table(base + s) == 0) { table(base + s) = fp; return true }
      s += 1
    }
    false
  }

  private def bucketContains(i: Int, fp: Short): Boolean = {
    val base = i * SlotsPerBucket
    var s = 0
    while (s < SlotsPerBucket) {
      if (table(base + s) == fp) return true
      s += 1
    }
    false
  }

  /** Insert a key; false when the filter is at capacity (kick budget spent). */
  def insert(key: Long): Boolean = {
    val fp = fingerprint(key)
    val i1 = bucketIndex(Xxh64.hashLong(key, IndexSeed))
    val i2 = altIndex(i1, fp)
    if (tryInsertAt(i1, fp) || tryInsertAt(i2, fp)) return true
    // evict loop: kick a random-ish (deterministic) resident fingerprint
    var i = if ((Xxh64.hashLong(key, KickSeed) & 1L) == 0L) i1 else i2
    var f = fp
    var kicks = 0
    while (kicks < MaxKicks) {
      val slot = (Xxh64.hashLong(key + kicks, KickSeed) & 0x7fffffffL).toInt % SlotsPerBucket
      val base = i * SlotsPerBucket
      val displaced = table(base + slot)
      table(base + slot) = f
      f = displaced
      i = altIndex(i, f)
      if (tryInsertAt(i, f)) return true
      kicks += 1
    }
    // kick budget spent: the last displaced fingerprint would otherwise be
    // ORPHANED — a silent false negative for a previously-inserted key,
    // breaking the no-false-negative contract antiJoin's definitely-new fast
    // path depends on. Park it in a bounded stash instead (consulted by
    // contains/delete); only a full stash reports failure.
    if (stash.size < StashCap) { stash += ((i, f)); true } else false
  }

  def contains(key: Long): Boolean = {
    val fp = fingerprint(key)
    val i1 = bucketIndex(Xxh64.hashLong(key, IndexSeed))
    if (bucketContains(i1, fp)) return true
    val i2 = altIndex(i1, fp)
    if (bucketContains(i2, fp)) return true
    // a stashed orphan's bucket pair is {b, alt(b, fp)} == {i1, i2} iff b hits
    stash.exists { case (b, f) => f == fp && (b == i1 || b == i2) }
  }

  /** Remove one copy of the key's fingerprint; false if absent. */
  def delete(key: Long): Boolean = {
    val fp = fingerprint(key)
    val i1 = bucketIndex(Xxh64.hashLong(key, IndexSeed))
    val i2 = altIndex(i1, fp)
    for (i <- Seq(i1, i2)) {
      val base = i * SlotsPerBucket
      var s = 0
      while (s < SlotsPerBucket) {
        if (table(base + s) == fp) { table(base + s) = 0; return true }
        s += 1
      }
    }
    val si = stash.indexWhere { case (b, f) => f == fp && (b == i1 || b == i2) }
    if (si >= 0) { stash.remove(si); true } else false
  }

  def serialize(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + table.length * 2 + stash.size * 6)
    bb.putInt(numBuckets)
    table.foreach(bb.putShort)
    bb.putInt(stash.size)
    stash.foreach { case (b, f) => bb.putInt(b); bb.putShort(f) }
    bb.array()
  }
}

object CuckooFilter {
  final val SlotsPerBucket = 4
  final val MaxKicks = 500
  final val StashCap = 32
  private final val IndexSeed = 0x51ab1e5eedL
  private final val AltSeed = 0xa17e4a7eL
  private final val KickSeed = 0x6b1c6b1cL

  /** Nonzero 16-bit fingerprint of a key. */
  def fingerprint(key: Long): Short = {
    val h = (Xxh64.hashLong(key, 42L) & 0xffffL).toShort
    if (h == 0) 1.toShort else h
  }

  /** Sized for `expectedItems` at ≤ ~0.95 load, rounded up to a power of two
    * (required by the self-inverse alternate-bucket derivation). */
  def create(expectedItems: Long): CuckooFilter = {
    val want = math.max(8L, math.ceil(expectedItems / (SlotsPerBucket * 0.95)).toLong)
    require(want <= (1L << 29),
      s"single cuckoo partition too large ($expectedItems items); shard it")
    val buckets = java.lang.Long.highestOneBit(want * 2 - 1).toInt
    new CuckooFilter(buckets, new Array[Short](buckets * SlotsPerBucket))
  }

  def deserialize(bytes: Array[Byte]): CuckooFilter = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buckets = bb.getInt
    val table = new Array[Short](buckets * SlotsPerBucket)
    var i = 0
    while (i < table.length) { table(i) = bb.getShort; i += 1 }
    val stash = scala.collection.mutable.ArrayBuffer.empty[(Int, Short)]
    if (bb.remaining() >= 4) {
      val n = bb.getInt
      (0 until n).foreach(_ => stash += ((bb.getInt, bb.getShort)))
    }
    new CuckooFilter(buckets, table, stash)
  }
}

/** Hash-sharded cuckoo filter: shard s owns keys with floorMod(key, n) == s.
  * The 10^10-scale form — each shard is bounded, built executor-side, and a
  * lookup touches exactly one shard. Supports the same delete-for-recrawl
  * path per shard.
  */
final class ShardedCuckoo(val shardArr: Array[CuckooFilter]) extends Serializable {
  private def shardOf(key: Long): Int =
    ((key % shardArr.length).toInt + shardArr.length) % shardArr.length
  def contains(key: Long): Boolean = shardArr(shardOf(key)).contains(key)
  def delete(key: Long): Boolean = shardArr(shardOf(key)).delete(key)
  def size: Int = shardArr.map(_.size).sum
}

/** Seen-set protocol over cuckoo filters — mirrors [[BloomSeen]]'s delta
  * vector, adding eviction ([[evictDelta]]) for TTL-based recrawl.
  */
object CuckooSeen {

  /** Build a filter over a LongType column. The per-partition hash arrays
    * reduce via treeAggregate-style combining on executors: each partition
    * inserts its keys into a local filter sized for the full delta... a
    * cuckoo table cannot union by OR (evictions differ per path), so the
    * build COLLECTS the distinct hash column per delta instead — acceptable
    * because deltas are bounded by compaction and the hash column is 8
    * bytes/row; the 10^10-scale path shards deltas into multiple filters
    * (one per seen-delta file group) exactly like the parquet itself.
    */
  def build(df: DataFrame, colName: String, expectedItems: Long): CuckooFilter = {
    val cf = CuckooFilter.create(math.max(expectedItems, 64L))
    df.select(col(colName)).distinct().collect().foreach { r =>
      if (!r.isNullAt(0))
        require(cf.insert(r.getLong(0)),
          s"cuckoo filter over capacity (expectedItems=$expectedItems too low)")
    }
    cf
  }

  /** Distributed build: the delta is hash-sharded, each shard's filter is
    * built inside ONE executor task (`mapGroups` over the shard key), and
    * only the compact filters come back to the driver — no row collect at
    * any scale. A key's shard is `floorMod(key, shards)`; lookups consult
    * exactly one shard ([[ShardedCuckoo.contains]]), so the probe cost does
    * not grow with shard count.
    */
  def buildSharded(df: DataFrame, colName: String, expectedItems: Long,
                   shards: Int = 32): ShardedCuckoo = {
    val spark = df.sparkSession
    import spark.implicits._
    val perShard = math.max(64L, expectedItems / shards + expectedItems / (4 * shards))
    val built = df.select(col(colName).cast("long")).distinct().as[Long]
      .groupByKey(h => ((h % shards).toInt + shards) % shards)
      .mapGroups { (shard, keys) =>
        val cf = CuckooFilter.create(perShard)
        var overflow = 0L
        keys.foreach { k => if (!cf.insert(k)) overflow += 1 }
        (shard, cf.serialize(), overflow)
      }
      .collect()
    require(built.forall(_._3 == 0L),
      s"cuckoo shard overflow — raise shards or expectedItems ($expectedItems/$shards)")
    val arr = new Array[CuckooFilter](shards)
    built.foreach { case (s, bytes, _) => arr(s) = CuckooFilter.deserialize(bytes) }
    // empty shards (no keys hashed there) get minimal filters
    (0 until shards).foreach(s => if (arr(s) == null) arr(s) = CuckooFilter.create(64))
    new ShardedCuckoo(arr)
  }

  /** Evict every key of an expired delta (TTL'd epoch) from the filter: the
    * crawler then treats those URLs as unseen and refetches them. O(delta),
    * no rebuild of surviving epochs' state.
    */
  def evictDelta(cf: CuckooFilter, expired: DataFrame, colName: String): Long = {
    var removed = 0L
    expired.select(col(colName)).distinct().collect().foreach { r =>
      if (!r.isNullAt(0) && cf.delete(r.getLong(0))) removed += 1
    }
    removed
  }

  def save(cf: CuckooFilter, path: Path): Unit = {
    val tmp = path.resolveSibling("." + path.getFileName.toString + ".tmp")
    Files.write(tmp, cf.serialize())
    Files.move(tmp, path, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  def load(path: Path): CuckooFilter = CuckooFilter.deserialize(Files.readAllBytes(path))

  /** Cuckoo-accelerated anti-join, identical contract to
    * [[BloomSeen.antiJoin]]: only the maybe-seen slice shuffles into the
    * exact left_anti join, so correctness never depends on the filter.
    */
  def antiJoin(spark: SparkSession, candidates: DataFrame, seen: DataFrame,
               hashCol: String, filters: Seq[CuckooFilter]): DataFrame = {
    val bc = spark.sparkContext.broadcast(filters.toArray)
    val mightContain = udf { (h: Long) =>
      val fs = bc.value; var i = 0; var hit = false
      while (i < fs.length && !hit) { hit = fs(i).contains(h); i += 1 }
      hit
    }.asNondeterministic()
    val flagged = candidates.withColumn("__maybe_seen", mightContain(col(hashCol)))
    val definitelyNew = flagged.where(!col("__maybe_seen")).drop("__maybe_seen")
    val maybeSeen = flagged.where(col("__maybe_seen")).drop("__maybe_seen")
    definitelyNew.unionByName(maybeSeen.join(seen, Seq(hashCol), "left_anti"))
  }
}
