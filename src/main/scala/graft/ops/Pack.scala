package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the corpus-assembly step that turns curated documents
  * into fixed-length training sequences (the GPT-family "concatenate and
  * chunk" scheme: the shard's token stream is laid end-to-end and cut every
  * `seqLen` tokens, so a document may span a chunk boundary; T5/LLaMA-family
  * data loaders all consume this layout). The output is the pack MANIFEST —
  * where each document's tokens land — which is what a distributed writer
  * needs to emit the actual token shards.
  */
object Pack {

  /** Lay out each shard's documents end-to-end in (shard, id) order and
    * compute, per document: its global token offset within the shard and the
    * first/last `seqLen`-token pack it occupies. Token counts use the
    * pipeline's BPE-ish pre-tokenizer count ([[TextAnalysis.tokenCount]]:
    * `\w+|[^\w\s]`).
    *
    * Packing is inherently sequential WITHIN a stream, so the unit of
    * parallelism is the shard: one shuffle on `shardCol`, then a streaming
    * running-sum window per shard (O(1) window state — never a
    * partitionless global window, which would serialize the corpus through
    * one task). At 100 TB you pack per output shard (thousands of them, one
    * per writer task), exactly this shape. Offsets stay below 2^53 per
    * shard, so the floor-division pack arithmetic is exact IEEE.
    *
    * Empty documents (zero tokens) occupy no pack: their pack bounds are
    * null, their offset is still well-defined.
    *
    * @return one row per doc: (id, shard, n_tokens, start_off, pack_first,
    *         pack_last)
    */
  def packSequences(df: DataFrame, shardCol: String, idCol: String,
                    textCol: String, seqLen: Int): DataFrame = {
    require(seqLen >= 1, "seqLen must be >= 1")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val n = TextAnalysis.tokenCount(col(textCol)).cast("long")
    df.select(col(idCol), col(shardCol), n.as("n_tokens"))
      .withColumn("start_off", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("pack_first",
        when(col("n_tokens") > 0,
          floor(col("start_off").cast("double") / seqLen.toDouble).cast("long")))
      .withColumn("pack_last",
        when(col("n_tokens") > 0,
          floor((col("start_off") + col("n_tokens") - 1).cast("double") / seqLen.toDouble)
            .cast("long")))
  }
}
