package graft.oracle

import scala.collection.mutable

/** SEQUENTIAL, Spark-free BPE (Sennrich et al. 2016) — the independent
  * oracle for `q_bpe_merges` / `q_bpe_tokens`: plain in-memory maps and
  * loops over the collected corpus, sharing no code with [[graft.ops.Bpe]]
  * beyond the published algorithm and the determinism contract
  * (count DESC, left ASC, right ASC tiebreak; left-to-right non-overlapping
  * replacement; '</w>' terminal symbol).
  */
object SeqBpe {

  private def tokensOf(text: String): Seq[String] =
    text.toLowerCase(java.util.Locale.ROOT).split("[^a-z]+").toSeq.filter(_.nonEmpty)

  private def replacePair(syms: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Learn the merge table: (rank, left, right, pair_cnt). */
  def train(texts: Seq[String], merges: Int): Seq[(Int, String, String, Long)] = {
    val wc = mutable.LinkedHashMap.empty[String, Long]
    texts.flatMap(tokensOf).foreach(w => wc(w) = wc.getOrElse(w, 0L) + 1L)
    var words: Vector[(Vector[String], Long)] =
      wc.toVector.map { case (w, c) => (w.map(_.toString).toVector :+ "</w>", c) }
    val out = mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 0
    var done = false
    while (rank < merges && !done) {
      val pc = mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pc(k) = pc.getOrElse(k, 0L) + c
          i += 1
        }
      }
      if (pc.isEmpty) done = true
      else {
        val ((l, r), cnt) = pc.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((rank, l, r, cnt))
        words = words.map { case (s, c) => (replacePair(s, l, r), c) }
        rank += 1
      }
    }
    out.toSeq
  }

  /** Apply a merge table: (doc_id, pos, piece) rows in token-stream order. */
  def segment(docs: Seq[(Long, String)],
              merges: Seq[(Int, String, String)]): Seq[(Long, Int, String)] = {
    val ranks: Map[(String, String), Int] =
      merges.map { case (k, l, r) => (l, r) -> k }.toMap
    def pieces(word: String): Vector[String] = {
      var syms = word.map(_.toString).toVector :+ "</w>"
      var going = syms.length > 1
      while (going) {
        var best = Int.MaxValue
        var bl = ""; var br = ""
        var i = 0
        while (i < syms.length - 1) {
          val rk = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
          if (rk < best) { best = rk; bl = syms(i); br = syms(i + 1) }
          i += 1
        }
        if (best == Int.MaxValue) going = false
        else syms = replacePair(syms, bl, br)
        if (syms.length < 2) going = false
      }
      syms
    }
    docs.flatMap { case (id, text) =>
      var pos = -1
      tokensOf(text).flatMap { w =>
        pieces(w).map { p => pos += 1; (id, pos, p) }
      }
    }
  }
}
