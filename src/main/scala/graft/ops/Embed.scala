package graft.ops

import graft.core.Xxh64

/** Deterministic STUB text embeddings — hashed signed bag-of-words.
  *
  * The reference embeds chunks with a sentence-transformers model
  * (/root/reference/crawl4ai/extraction_strategy.py:283-337); no model runs
  * in this container, so the embedding kernel is a clearly-marked
  * deterministic stand-in with the same contract (text → unit vector, shared
  * vocabulary ⇒ high cosine): each token hashes to a slot and a ±1 sign,
  * occurrences accumulate, the vector is L2-normalized. Everything built on
  * top (cosine pre-filter, hierarchical clustering, ANN, near-dup) exercises
  * real geometry over these vectors and is agnostic to the kernel.
  *
  * Two hash bases, same pattern as MinHash (ops/Dedup.scala): xxh64 for the
  * production path, an md5-derived twin whose slot/sign derivation is
  * reproducible in DuckDB SQL for the driver oracle.
  */
object Embed {

  def tokens(text: String): Seq[String] =
    text.toLowerCase(java.util.Locale.ROOT).split("[^a-z]+").filter(_.nonEmpty).toSeq

  /** Production kernel: xxh64 slot/sign. */
  def stub(text: String, dim: Int = 64): Array[Float] = {
    val v = new Array[Float](dim)
    tokens(text).foreach { t =>
      val h = Xxh64.hashString(t)
      val slot = java.lang.Math.floorMod(h, dim.toLong).toInt
      v(slot) += (if (((h >>> 32) & 1L) == 0L) 1f else -1f)
    }
    normalize(v)
  }

  /** Oracle twin: slot and sign from the md5 HEX digits, so DuckDB can derive
    * them with string ops — slot = (hex[0]*16 + hex[1]) mod dim,
    * sign = +1 if hex[2] < '8'. */
  def stubMd5(text: String, dim: Int = 64): Array[Float] =
    normalize(stubMd5Raw(text, dim))

  /** Unnormalized md5 slot sums as floats (integer-valued, so cosine over
    * them is EXACT double arithmetic — the engine and a SQL oracle compute
    * bit-identical cosines; normalization is cosine-invariant but its float
    * rounding is not reproducible in SQL). */
  def stubMd5Raw(text: String, dim: Int = 64): Array[Float] = {
    val v = new Array[Float](dim)
    val md = java.security.MessageDigest.getInstance("MD5")
    tokens(text).foreach { t =>
      val h = md.digest(t.getBytes("UTF-8"))
      val c0 = (h(0) >> 4) & 0xf; val c1 = h(0) & 0xf; val c2 = (h(1) >> 4) & 0xf
      v((c0 * 16 + c1) % dim) += (if (c2 < 8) 1f else -1f)
    }
    v
  }

  private def normalize(v: Array[Float]): Array[Float] = {
    var ss = 0.0
    var i = 0
    while (i < v.length) { ss += v(i).toDouble * v(i); i += 1 }
    if (ss > 0) {
      val n = math.sqrt(ss)
      i = 0
      while (i < v.length) { v(i) = (v(i) / n).toFloat; i += 1 }
    }
    v
  }

  /** Unnormalized md5-twin slot sums in DOUBLE (integer ±1 accumulation) —
    * bit-reproducible against the DuckDB oracle, which derives the same
    * slot/sign from md5 hex digits with string ops. */
  def slotSumsMd5(toks: Seq[String], dim: Int): Array[Double] = {
    val v = new Array[Double](dim)
    val md = java.security.MessageDigest.getInstance("MD5")
    toks.foreach { t =>
      val h = md.digest(t.getBytes("UTF-8"))
      md.reset()
      val c0 = (h(0) >> 4) & 0xf; val c1 = h(0) & 0xf; val c2 = (h(1) >> 4) & 0xf
      v((c0 * 16 + c1) % dim) += (if (c2 < 8) 1.0 else -1.0)
    }
    v
  }

  def cosineD(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Per-10-token-window cosine to a query under the md5 twin — the oracled
    * relational skeleton of the CosineStrategy pre-filter. */
  def chunkQueryCosinesMd5(text: String, query: String, window: Int, dim: Int): Seq[(Int, Double)] = {
    val q = slotSumsMd5(tokens(query), dim)
    tokens(text).grouped(window).zipWithIndex
      .map { case (ch, i) => (i, cosineD(slotSumsMd5(ch, dim), q)) }
      .toSeq
  }

  def cosine(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { d += a(i).toDouble * b(i); i += 1 }
    d
  }
}
