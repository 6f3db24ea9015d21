package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding vocabulary learning (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") — the
  * tokenizer-training step of a training-data pipeline, Spark-first:
  *
  *  1. ONE corpus-wide shuffle builds the distinct-word count table
  *     ([[wordCounts]]). At 100 TB the corpus collapses to 10⁷–10⁸ distinct
  *     words — still a distributed table, never a driver structure. Every
  *     later step runs on this table, so cost is independent of corpus size.
  *  2. Each merge round is one partial-aggregated pair count over the word
  *     table (map-side combine → tiny shuffle keyed by symbol pair) plus a
  *     single collected top-1 row (a bounded driver scalar, like every other
  *     round-loop scalar in this repo), then a narrow map rewriting symbol
  *     arrays through a compiled kernel. Lineage is truncated with an eager
  *     localCheckpoint every [[CheckpointEvery]] rounds — the connected-
  *     components pattern from [[Dedup]].
  *
  * Determinism contract (oracle equality): the winning pair is
  * (count DESC, left ASC, right ASC) — ties broken lexicographically, so
  * any engine replaying the same counts learns the identical merge table.
  *
  * Applying a learned table ([[segment]]) broadcasts the merge ranks (≤
  * vocab-size rows) and greedily merges the lowest-rank adjacent pair per
  * word — the standard BPE apply — with a per-partition word→pieces memo so
  * each DISTINCT word is segmented once per task, not once per occurrence.
  */
object Bpe {

  /** Word-end marker appended as its own symbol (the original formulation:
    * "we append '</w>' to every word" — makes suffix merges distinct from
    * interior merges). */
  final val EndMark = "</w>"

  private final val CheckpointEvery = 8

  /** One shuffle: (word, cnt) over the lowercased letter-run tokens. */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** COMPILED KERNEL: left-to-right non-overlapping merge of one adjacent
    * pair inside a symbol sequence. */
  def mergePair(syms: Array[String], l: String, r: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += l + r; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Learn `merges` BPE merges from the corpus. Output: one row per learned
    * merge, (rank, left, right, pair_cnt) with rank 0 = first merge. Stops
    * early when no adjacent pair remains (fully merged corpus).
    */
  def train(df: DataFrame, textCol: String, merges: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    var words: Dataset[(Array[String], Long)] = wordCounts(df, textCol)
      .as[(String, Long)]
      .map { case (w, c) => (w.map(_.toString).toArray :+ EndMark, c) }
      .localCheckpoint(true)

    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 0
    var exhausted = false
    while (rank < merges && !exhausted) {
      // pair count: flatMap kernel → partial-aggregated groupBy; top-1 is a
      // bounded driver scalar with the deterministic tiebreak
      val top = words.flatMap { case (syms, c) =>
          (0 until syms.length - 1).iterator.map(i => (syms(i), syms(i + 1), c))
        }
        .toDF("l", "r", "c")
        .groupBy("l", "r").agg(sum("c").as("cnt"))
        .orderBy(desc("cnt"), asc("l"), asc("r"))
        .limit(1)
        .as[(String, String, Long)]
        .collect()
      top.headOption match {
        case None => exhausted = true
        case Some((l, r, cnt)) =>
          learned += ((rank, l, r, cnt))
          words = words.map { case (syms, c) => (mergePair(syms, l, r), c) }
          if ((rank + 1) % CheckpointEvery == 0)
            words = words.localCheckpoint(true)
          rank += 1
      }
    }
    learned.toSeq.toDF("rank", "left", "right", "pair_cnt")
  }

  /** COMPILED KERNEL: standard BPE apply — repeatedly merge the lowest-rank
    * adjacent pair until none of the learned pairs is present. */
  def applyMerges(word: String, ranks: Map[(String, String), Int]): Array[String] = {
    var syms: Array[String] = word.map(_.toString).toArray :+ EndMark
    var going = syms.length > 1
    while (going) {
      var best = Int.MaxValue
      var at = -1
      var i = 0
      while (i < syms.length - 1) {
        val rk = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (rk < best) { best = rk; at = i }
        i += 1
      }
      if (at < 0) going = false
      else syms = mergePair(syms, syms(at), syms(at + 1))
      if (syms.length < 2) going = false
    }
    syms
  }

  /** Tokenize a corpus with a learned merge table: (<idCol>, pos, piece) —
    * pos is the piece index within the document's token stream. The merge
    * table is collected (≤ merges rows, bounded by construction) and
    * broadcast; each task memoizes distinct words.
    */
  def segment(df: DataFrame, idCol: String, textCol: String,
              mergesDf: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ranks: Map[(String, String), Int] = mergesDf
      .select("left", "right", "rank").as[(String, String, Int)]
      .collect().map { case (l, r, k) => (l, r) -> k }.toMap
    val bc = spark.sparkContext.broadcast(ranks)
    df.select(col(idCol).cast("long"), TextAnalysis.tokens(col(textCol)).as("toks"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val rk = bc.value
        val memo = scala.collection.mutable.Map.empty[String, Array[String]]
        it.flatMap { case (id, toks) =>
          var pos = -1
          toks.iterator.flatMap { w =>
            memo.getOrElseUpdate(w, applyMerges(w, rk)).iterator.map { p =>
              pos += 1; (id, pos, p)
            }
          }
        }
      }
      .toDF(idCol, "pos", "piece")
  }
}
