package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline: token counting,
  * language ID, quality scoring, document fingerprinting. All pure Column
  * expressions (codegen'd, no UDFs) so they run inside one projection over
  * the documents scan at any scale — and each is mirrorable in ANSI-ish SQL
  * for the DuckDB oracle.
  *
  * Reference anchors: token/stopword cleanup (/root/reference/crawl4ai/
  * utils.py:2405-2633), BM25 tokenization (content_filter_strategy.py:
  * 485-505), content-addressed hashing (async_database.py:527-541).
  */
object TextAnalysis {

  /** Word tokens: lowercase, split on non-letter runs, drop empties. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z]+"), t => t =!= "")

  /** Whitespace word count. */
  def wordCount(text: Column): Column =
    size(filter(split(text, "\\s+"), t => t =!= ""))

  /** BPE-ish token count: word pieces + single punctuation marks
    * (`\w+|[^\w\s]` — the standard pre-tokenizer shape).
    */
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\w+|[^\\w\\s]"), lit(0)))

  // Small per-language function-word lists (public common stopwords).
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it", "that", "was"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ich", "nicht", "ein", "zu", "mit"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "est", "que", "pour"),
    "es" -> Seq("el", "la", "los", "las", "un", "una", "es", "que", "por", "para"))

  /** Per-language evidence: DISTINCT token overlap with the language's
    * function words (n-gram-free heuristic language ID).
    */
  def langEvidence(text: Column, lang: String): Column =
    size(array_intersect(array_distinct(tokens(text)),
      typedLit(stopwords(lang))))

  /** Predicted language: argmax of evidence, ties broken by language-code
    * order, "und" (undetermined) when no evidence at all.
    */
  def langId(text: Column): Column = {
    val langs = stopwords.keys.toSeq.sorted
    val ev = langs.map(l => l -> langEvidence(text, l))
    val best = ev.map(_._2).reduce((a, b) => greatest(a, b))
    // when-chain in sorted-language order: first max wins ties
    ev.foldRight(lit("und")) { case ((l, e), acc) =>
      when(e === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  /** Punctuation fraction of all characters. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[^!?.,;:]", "")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Fraction of word tokens that are English function words (NON-distinct —
    * a frequency ratio, unlike [[langEvidence]]).
    */
  def stopwordRatio(text: Column, lang: String = "en"): Column = {
    val toks = tokens(text)
    size(filter(toks, t => t.isin(stopwords(lang): _*))).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  /** Mean word length over whitespace tokens. */
  def meanWordLength(text: Column): Column = {
    val toks = filter(split(text, "\\s+"), t => t =!= "")
    aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  /** Composite quality score in [0,1] — the length/punct/stopword-ratio
    * heuristic family used for pre-training corpus filtering:
    *   0.25·len_band + 0.25·word_band + 0.2·stopword_presence
    * + 0.15·punct_sanity + 0.15·word_len_sanity
    */
  def qualityScore(text: Column): Column = {
    val nChars = length(text)
    val nWords = wordCount(text)
    val lenBand = when(nChars.between(200, 20000), 1.0)
      .when(nChars.between(50, 199), 0.5).otherwise(0.0)
    val wordBand = when(nWords >= 30, 1.0)
      .when(nWords >= 10, 0.5).otherwise(0.0)
    val stopPresence = when(stopwordRatio(text) > 0.02, 1.0).otherwise(0.0)
    val punctSane = when(punctRatio(text) <= 0.2, 1.0).otherwise(0.0)
    val mwl = meanWordLength(text)
    val wordLenSane = when(mwl.between(3.0, 10.0), 1.0).otherwise(0.0)
    lenBand * 0.25 + wordBand * 0.25 + stopPresence * 0.2 +
      punctSane * 0.15 + wordLenSane * 0.15
  }

  /** Word k-shingles joined by single spaces: ["a b c", "b c d", ...]. */
  def shingles(text: Column, k: Int): Column = {
    val toks = tokens(text)
    when(size(toks) >= k,
      transform(sequence(lit(1), size(toks) - lit(k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k)))))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** Winnowing-style document fingerprint: lexicographic min of the md5
    * hashes of all word 3-shingles (content-defined, order-invariant to
    * shingle position, stable under whitespace normalization). SQL twin:
    * list_min(list_transform(shingles, md5)).
    */
  def fingerprint(text: Column, k: Int = 3): Column =
    array_min(transform(shingles(text, k), s => md5(s)))

  /** Rolling-hash sketch: the s smallest md5 shingle hashes (a bottom-s
    * MinHash over content shingles — near-dup docs share most of them).
    */
  def fingerprintSketch(text: Column, k: Int = 3, s: Int = 8): Column =
    slice(array_sort(transform(shingles(text, k), x => md5(x))), 1, s)

  // ---- chunking strategies (chunking_strategy.py re-expressed) -------------

  /** RegexChunking: split on a pattern (default blank lines), drop empties. */
  def regexChunks(text: Column, pattern: String = "\\n\\n"): Column =
    filter(split(text, pattern), c => trim(c) =!= "")

  /** SlidingWindowChunking: word windows of `window` tokens advancing by
    * `step` (overlapping when step < window).
    */
  def slidingWindowChunks(text: Column, window: Int = 100, step: Int = 50): Column = {
    val toks = filter(split(text, "\\s+"), t => t =!= "")
    when(size(toks) <= window, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(0), ((size(toks) - window + step - 1) / step).cast("int")),
        i => concat_ws(" ", slice(toks, i * step + 1, lit(window)))))
  }

  /** Compiled twin of the fixed-width chunking Column form
    * `transform(sequence(0, (size(tokens)-1)/w), i -> concat_ws(" ",
    * slice(tokens, i*w+1, w)))` — identical output including the single
    * empty chunk a token-less text produces there (Spark 4 interprets the
    * HOF lambdas; the kernel runs compiled). Equality asserted in OpsSpec.
    */
  def fixedChunksFast(text: String, words: Int): Seq[String] = {
    if (text == null) return null
    val t = text.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
    if (t.isEmpty) Seq("")
    else t.grouped(words).map(_.mkString(" ")).toSeq
  }
}
