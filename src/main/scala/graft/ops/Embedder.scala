package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** The embedding-kernel seam: text → unit vector. Every consumer of text
  * embeddings ([[graft.scrape.CosineExtract]], [[AdaptiveEmbedding]],
  * [[Dedup.embeddingNearDupText]], the driver queries) goes through this
  * trait, so a real model drops in without touching any operator — the same
  * boundary the reference draws at its sentence-transformers `load_*` calls
  * (/root/reference/crawl4ai/extraction_strategy.py:186-247): everything
  * above the model is geometry over vectors, agnostic to the kernel.
  *
  * Implementations must be Serializable (instances ride into executor
  * closures) and deterministic per instance (a vector for a text must not
  * depend on the executor that computed it, or dedup/ANN results become
  * nondeterministic across retries). A JVM-hosted model (ONNX Runtime /
  * TF-Java session) should hold its session lazily/transient and re-open it
  * per executor.
  */
trait Embedder extends Serializable {
  /** Output dimensionality (constant per instance). */
  def dim: Int
  def embed(text: String): Array[Float]
}

object Embedder {

  /** The deterministic default: hashed signed bag-of-words ([[Embed.stub]]).
    * No model weights exist in this environment; this stand-in keeps the
    * contract (unit vector; shared vocabulary ⇒ high cosine) so the
    * operators' geometry is exercised for real.
    */
  final case class HashedBow(dim: Int = 64) extends Embedder {
    override def embed(text: String): Array[Float] = Embed.stub(text, dim)
  }

  /** The md5-derived oracle twin ([[Embed.stubMd5]]) — same contract, with
    * slot/sign derivable in DuckDB SQL for driver-side verification. */
  final case class Md5Bow(dim: Int = 64) extends Embedder {
    override def embed(text: String): Array[Float] = Embed.stubMd5(text, dim)
  }

  /** [[Md5Bow]] without the unit-norm step: integer-valued slot sums, so
    * every downstream cosine is EXACT double arithmetic — bit-identical to
    * a SQL oracle computing dot/(√Σa²·√Σb²) from the same integer sums
    * (cosine is scale-invariant, but float normalization rounding is not
    * SQL-reproducible). Use wherever an oracle compares cosines at a
    * threshold. */
  final case class Md5BowExact(dim: Int = 64) extends Embedder {
    override def embed(text: String): Array[Float] = Embed.stubMd5Raw(text, dim)
  }

  val default: Embedder = HashedBow()

  /** Column form for DataFrame pipelines: `embedCol(e)(col("text"))`. A
    * plain (non-codegen) UDF is the right tool here — the kernel is opaque
    * JVM code by design (it may be a real model). */
  def embedCol(e: Embedder): Column => Column = {
    val u = udf((text: String) => if (text == null) null else e.embed(text))
    c => u(c)
  }
}
