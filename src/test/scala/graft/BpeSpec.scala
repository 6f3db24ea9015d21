package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Bpe
import graft.oracle.SeqBpe

/** BPE trainer/segmenter tests: kernel behavior, distributed == sequential
  * oracle equality on a real corpus slice, and the reconstruction property
  * (pieces concatenate back to the word + terminal marker).
  */
class BpeSpec extends AnyFunSuite {

  test("mergePair kernel: non-overlapping left-to-right replacement") {
    assert(Bpe.mergePair(Array("a", "a", "a"), "a", "a").toSeq == Seq("aa", "a"))
    assert(Bpe.mergePair(Array("a", "b", "a", "b"), "a", "b").toSeq == Seq("ab", "ab"))
    assert(Bpe.mergePair(Array("x"), "a", "b").toSeq == Seq("x"))
    assert(Bpe.mergePair(Array.empty[String], "a", "b").isEmpty)
  }

  test("classic corpus: learned merges match the published example shape") {
    // Sennrich's toy corpus: low/lower/newest/widest — with 'e s' then
    // 'es t' among the first merges (newest+widest dominate pair counts)
    import SparkTestSession.spark
    import spark.implicits._
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val df = Seq((1L, corpus)).toDF("doc_id", "text")
    val merges = Bpe.train(df, "text", merges = 4)
      .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
    assert(merges.head._2 == "e" && merges.head._3 == "s" && merges.head._4 == 9L)
    assert(merges(1)._2 == "es" && merges(1)._3 == "t" && merges(1)._4 == 9L)
    // and the sequential oracle agrees exactly
    assert(merges == SeqBpe.train(Seq(corpus), merges = 4))
  }

  test("distributed train == sequential oracle on multi-doc corpus with ties") {
    import SparkTestSession.spark
    import spark.implicits._
    val texts = Seq(
      "the cat sat on the mat", "the bat and the rat", "cat mat bat rat",
      "on and on and on", "zz zz zz yy yy xx")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = Bpe.train(df, "text", merges = 25)
      .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
    assert(got == SeqBpe.train(texts, merges = 25))
  }

  test("early stop: corpus fully merged before the merge budget") {
    import SparkTestSession.spark
    import spark.implicits._
    val df = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    val merges = Bpe.train(df, "text", merges = 50)
      .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
    // 'ab' needs 2 merges (a+b, ab+</w>); then nothing is left to merge
    assert(merges.length == 2)
    assert(merges == SeqBpe.train(Seq("ab ab ab"), merges = 50))
  }

  test("segment == sequential oracle; pieces reconstruct each word") {
    import SparkTestSession.spark
    import spark.implicits._
    val texts = Seq("lower newest low widest lowest", "the newest low bar")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")
    val mergesDf = Bpe.train(df, "text", merges = 12)
    val got = Bpe.segment(df, "doc_id", "text", mergesDf)
      .as[(Long, Int, String)].collect().toSeq.sorted
    val seqMerges = SeqBpe.train(texts, merges = 12).map { case (k, l, r, _) => (k, l, r) }
    assert(got == SeqBpe.segment(docs, seqMerges).sorted)
    // reconstruction: concatenating a doc's pieces == its words + markers
    val byDoc = got.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).mkString).toMap
    docs.foreach { case (id, t) =>
      val want = t.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
        .map(_ + Bpe.EndMark).mkString
      assert(byDoc.getOrElse(id, "") == want, s"doc $id reconstruction")
    }
  }

  test("applyMerges is a no-op with an empty table and total with a full one") {
    assert(Bpe.applyMerges("cab", Map.empty).toSeq == Seq("c", "a", "b", Bpe.EndMark))
    val ranks = Map(("a", "b") -> 0, ("c", "ab") -> 1,
      ("cab", Bpe.EndMark) -> 2)
    assert(Bpe.applyMerges("cab", ranks).toSeq == Seq("cab" + Bpe.EndMark))
  }
}
