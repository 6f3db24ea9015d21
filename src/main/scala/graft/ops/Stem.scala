package graft.ops

/** Porter stemming (the public algorithm the reference's Snowball "english"
  * stemmer extends — content_filter_strategy.py:485-505 stems BM25 tokens)
  * plus the seeder's character-3-gram URL relevance
  * (async_url_seeder.py:1196-1283).
  *
  * Pure string functions — registered as UDFs over token arrays
  * (`transform(tokens, stem)`) where pipelines need them.
  */
object Stem {

  private def isVowel(w: String, i: Int): Boolean = w.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => true
    case 'y' => i > 0 && !isVowel(w, i - 1)
    case _ => false
  }

  /** Measure m of [C](VC)^m[V]. */
  private def measure(w: String): Int = {
    var m = 0
    var i = 0
    val n = w.length
    while (i < n && !isVowel(w, i)) i += 1 // leading C
    while (i < n) {
      while (i < n && isVowel(w, i)) i += 1 // V run
      if (i < n) { m += 1; while (i < n && !isVowel(w, i)) i += 1 }
    }
    m
  }

  private def hasVowel(w: String): Boolean = (0 until w.length).exists(isVowel(w, _))
  private def endsDoubleC(w: String): Boolean =
    w.length >= 2 && w.charAt(w.length - 1) == w.charAt(w.length - 2) &&
      !isVowel(w, w.length - 1)
  private def endsCvc(w: String): Boolean = {
    val n = w.length
    n >= 3 && !isVowel(w, n - 3) && isVowel(w, n - 2) && !isVowel(w, n - 1) &&
      !"wxy".contains(w.charAt(n - 1))
  }

  /** Porter steps 1a-5b (standard definition). */
  def porter(word: String): String = {
    if (word == null || word.length <= 2) return word
    var w = word.toLowerCase
    // step 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ies")) w = w.dropRight(2)
    else if (w.endsWith("ss")) ()
    else if (w.endsWith("s")) w = w.dropRight(1)
    // step 1b
    var extra = false
    if (w.endsWith("eed")) { if (measure(w.dropRight(3)) > 0) w = w.dropRight(1) }
    else if (w.endsWith("ed") && hasVowel(w.dropRight(2))) { w = w.dropRight(2); extra = true }
    else if (w.endsWith("ing") && hasVowel(w.dropRight(3))) { w = w.dropRight(3); extra = true }
    if (extra) {
      if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w += "e"
      else if (endsDoubleC(w) && !"lsz".contains(w.last)) w = w.dropRight(1)
      else if (measure(w) == 1 && endsCvc(w)) w += "e"
    }
    // step 1c
    if (w.endsWith("y") && hasVowel(w.dropRight(1))) w = w.dropRight(1) + "i"
    // step 2
    val step2 = Seq("ational" -> "ate", "tional" -> "tion", "enci" -> "ence",
      "anci" -> "ance", "izer" -> "ize", "abli" -> "able", "alli" -> "al",
      "entli" -> "ent", "eli" -> "e", "ousli" -> "ous", "ization" -> "ize",
      "ation" -> "ate", "ator" -> "ate", "alism" -> "al", "iveness" -> "ive",
      "fulness" -> "ful", "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive",
      "biliti" -> "ble")
    step2.find { case (suf, _) => w.endsWith(suf) }.foreach { case (suf, rep) =>
      val stem = w.dropRight(suf.length)
      if (measure(stem) > 0) w = stem + rep
    }
    // step 3
    val step3 = Seq("icate" -> "ic", "ative" -> "", "alize" -> "al",
      "iciti" -> "ic", "ical" -> "ic", "ful" -> "", "ness" -> "")
    step3.find { case (suf, _) => w.endsWith(suf) }.foreach { case (suf, rep) =>
      val stem = w.dropRight(suf.length)
      if (measure(stem) > 0) w = stem + rep
    }
    // step 4
    val step4 = Seq("al", "ance", "ence", "er", "ic", "able", "ible", "ant",
      "ement", "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize")
    step4.find(w.endsWith).foreach { suf =>
      val stem = w.dropRight(suf.length)
      if (measure(stem) > 1) w = stem
    }
    if (w.endsWith("ion")) {
      val stem = w.dropRight(3)
      if (stem.nonEmpty && (stem.endsWith("s") || stem.endsWith("t")) && measure(stem) > 1)
        w = stem
    }
    // step 5a
    if (w.endsWith("e")) {
      val stem = w.dropRight(1)
      val m = measure(stem)
      if (m > 1 || (m == 1 && !endsCvc(stem))) w = stem
    }
    // step 5b
    if (measure(w) > 1 && endsDoubleC(w) && w.endsWith("l")) w = w.dropRight(1)
    w
  }

  /** Character 3-grams of a lowercased string. */
  def charNgrams(s: String, n: Int = 3): Set[String] = {
    val t = s.toLowerCase
    if (t.length < n) Set(t) else t.sliding(n).toSet
  }

  /** Seeder URL relevance: Jaccard-ish overlap of query vs URL path
    * character 3-grams (async_url_seeder.py:1196-1283 — scores the URL
    * string itself against the query without fetching).
    */
  def urlRelevance(url: String, query: String): Double = {
    if (url == null || query == null || query.isEmpty) return 0.0
    val path = {
      val p = graft.core.PyUrl.parse(url)
      (p.path + " " + p.query).replaceAll("[/_\\-?=&.]", " ")
    }
    val a = charNgrams(path.trim)
    val b = charNgrams(query.trim)
    if (a.isEmpty || b.isEmpty) 0.0
    else a.intersect(b).size.toDouble / b.size
  }
}
