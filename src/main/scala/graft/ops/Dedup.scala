package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline, each shaped for
  * 100 TB inputs:
  *
  *  - exact          — hash-groupBy on a content hash (one shuffle on the
  *    64-bit key; the payload column never shuffles). Mirrors the reference's
  *    content-addressed store dedup (async_database.py:527-541, xxh64).
  *  - minHashLsh     — shingle → k-minhash signature → banding → bucket
  *    join. Candidate generation is an equi-join on (band, band_hash): only
  *    same-bucket pairs shuffle, never the O(n²) cross product.
  *  - simHash        — 64-bit weighted bit-vote fingerprint; near-dup =
  *    Hamming ≤ 3 found via 4×16-bit band blocking (pigeonhole: any pair
  *    within distance 3 shares at least one exact 16-bit band).
  *  - ngramJaccard   — exact Jaccard over distinct word shingles via an
  *    inverted-index self-join (explode → join on shingle → count ∩ / sizes).
  *
  * All hashing uses Spark's built-in xxhash64 (seeded per-function via a
  * literal prefix column) — codegen'd, no UDFs in the candidate paths.
  */
object Dedup {

  /** Exact dedup: keep the smallest `idCol` per identical `textCol` content.
    * Returns (id, content_hash) of survivors.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), md5(col(textCol)).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(min(col(idCol)).as(idCol))
      .select(col(idCol), col("content_hash"))

  /** k-minhash signature as an array column: sig[i] = min over shingles of
    * xxhash64(i, shingle).
    */
  def minHashSignature(shingles: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => aggregate(shingles, lit(Long.MaxValue),
        (acc, s) => least(acc, xxhash64(i, s))))

  /** md5-keyed minhash signature: sig[i] = lexicographic min over shingles
    * of md5(i + "|" + shingle). Slower than the xxhash64 path (hex-string
    * compares) but expressible identically in ANSI-ish SQL — the
    * oracle-checkable twin of [[minHashSignature]].
    */
  def minHashSignatureMd5(shingles: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shingles, s => md5(concat(i, lit("|"), s)))))

  /** MinHash+LSH near-duplicate candidate pairs.
    *
    * @param df     input with an id column and a text column
    * @param k      signature length (bands × rowsPerBand must equal k)
    * @param bands  number of LSH bands
    * @return pairs (id_a < id_b, est_jaccard) whose signatures collide in at
    *         least one band, with the signature-estimated Jaccard attached
    */
  def minHashLsh(df: DataFrame, idCol: String, textCol: String,
                 k: Int = 32, bands: Int = 8, shingleLen: Int = 3,
                 minEstJaccard: Double = 0.5): DataFrame = {
    val rowsPerBand = k / bands
    require(bands * rowsPerBand == k, "bands must divide k")
    val sigs = df.select(col(idCol).as("id"),
        minHashSignature(TextAnalysis.shingles(col(textCol), shingleLen), k).as("sig"))
    // band rows: (band, band_hash, id, sig)
    val banded = sigs.select(col("id"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(b, concat_ws(",",
            slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))))))
          .as(Seq("band", "band_hash")))
    val a = banded.select(col("band"), col("band_hash"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("band_hash"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    val pairs = a.join(b, Seq("band", "band_hash"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .dropDuplicates("id_a", "id_b")
    pairs
      .withColumn("est_jaccard",
        aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / lit(k.toDouble))
      .where(col("est_jaccard") >= minEstJaccard)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
  }

  /** 64-bit SimHash over word tokens: bit j of the result is the sign of the
    * sum over tokens of ±1 votes from bit j of xxhash64(token). Expressed as
    * a 64-slot vote-vector aggregate (pure columns, codegen'd).
    */
  def simHash(text: Column): Column = {
    val toks = TextAnalysis.tokens(text)
    val votes = aggregate(
      toks,
      array_repeat(lit(0), 64),
      (acc, t) => {
        val h = xxhash64(t)
        zip_with(acc, sequence(lit(0), lit(63)),
          (a, j) => a + when(call_function("shiftright", h, j).bitwiseAND(1) === 1, 1).otherwise(-1))
      })
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)),
        (v, j) => when(v > 0, call_function("shiftleft", lit(1L), j)).otherwise(lit(0L))),
      lit(0L), (acc, bit) => acc.bitwiseOR(bit))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist, via 16-bit band
    * blocking (4 bands of a 64-bit hash; pigeonhole guarantees recall for
    * maxDist ≤ 3).
    */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxDist: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol).as("id"), simHash(col(textCol)).as("sim"))
    val banded = sigs.select(col("id"), col("sim"),
      posexplode(transform(sequence(lit(0), lit(3)),
        b => call_function("shiftright", col("sim"), b * 16).bitwiseAND(0xffffL)))
        .as(Seq("band", "band_val")))
    val a = banded.select(col("band"), col("band_val"), col("id").as("id_a"), col("sim").as("sim_a"))
    val b = banded.select(col("band"), col("band_val"), col("id").as("id_b"), col("sim").as("sim_b"))
    a.join(b, Seq("band", "band_val"))
      .where(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .where(col("hamming") <= maxDist)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Exact n-gram Jaccard similarity pairs via inverted-index self-join:
    * explode distinct shingles, equi-join on shingle, count intersections,
    * join back the set sizes. Only same-shingle pairs ever shuffle.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, minJaccard: Double = 0.8): DataFrame = {
    val sets = df.select(col(idCol).as("id"),
        array_distinct(TextAnalysis.shingles(col(textCol), n)).as("sh"))
      .withColumn("sz", size(col("sh")))
    val inv = sets.select(col("id"), col("sz"), explode(col("sh")).as("shingle"))
    val ab = inv.as("a").join(inv.as("b"), Seq("shingle"))
      .where(col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sz").as("sz_a"), col("b.sz").as("sz_b"))
      .agg(count(lit(1)).as("inter"))
    ab.withColumn("jaccard",
        col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")).cast("double"))
      .where(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold, candidates blocked
    * by random-hyperplane LSH sign-buckets (see [[Similarity.signBucket]]),
    * verified by exact cosine.
    */
  def embeddingNearDup(df: DataFrame, idCol: String, vecCol: String,
                       planes: Int = 8, minCosine: Double = 0.95): DataFrame = {
    val bucketed = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", Similarity.signBucket(col("v"), planes))
    val a = bucketed.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = bucketed.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .withColumn("cosine", Similarity.cosine(col("v_a"), col("v_b")))
      .where(col("cosine") >= minCosine)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
