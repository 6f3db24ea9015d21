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

  // ---- Snowball "english" (Porter2) --------------------------------------
  // The exact algorithm the reference loads via
  // snowballstemmer.stemmer('english') (content_filter_strategy.py:23,438),
  // implemented from the published Snowball specification
  // (snowballstem.org, "The English (Porter2) stemming algorithm").

  private val exceptional = Map(
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl",
    "sky" -> "sky", "news" -> "news", "howe" -> "howe", "atlas" -> "atlas",
    "cosmos" -> "cosmos", "bias" -> "bias", "andes" -> "andes")

  private val post1aInvariant = Set(
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed")

  private val doubles = Set("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
  private val liEnding = "cdeghkmnrt"

  @inline private def isV(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y'
  // after the prelude, consonant-y is marked 'Y' (not a vowel)

  /** Start index of R1 per the spec (with the gener/commun/arsen override). */
  private def r1Of(w: String): Int = {
    for (p <- Seq("gener", "commun", "arsen")) if (w.startsWith(p)) return p.length
    regionAfterVC(w, 0)
  }

  /** Position after the first vowel-followed-by-non-vowel at or after `from`. */
  private def regionAfterVC(w: String, from: Int): Int = {
    var i = from
    val n = w.length
    while (i < n && !isV(w.charAt(i))) i += 1
    while (i < n && isV(w.charAt(i))) i += 1
    if (i < n) i + 1 else n
  }

  /** Short syllable ending at position `end` (exclusive) of w. */
  private def endsShortSyllable(w: String): Boolean = {
    val n = w.length
    if (n >= 3) {
      val a = w.charAt(n - 3); val b = w.charAt(n - 2); val c = w.charAt(n - 1)
      if (!isV(a) && isV(b) && !isV(c) && c != 'w' && c != 'x' && c != 'Y') return true
    }
    if (n == 2 && isV(w.charAt(0)) && !isV(w.charAt(1))) return true
    false
  }

  /** Snowball Porter2 english stem of one lowercase token. */
  def snowball(word: String): String = {
    if (word == null) return word
    var w = word.toLowerCase
    if (w.startsWith("'")) w = w.substring(1)
    if (w.length <= 2) return w
    exceptional.get(w) match { case Some(r) => return r; case None => () }
    // prelude: mark consonant y as Y (initial y, or y after a vowel)
    val sb = new StringBuilder(w)
    if (sb.charAt(0) == 'y') sb.setCharAt(0, 'Y')
    var i = 1
    while (i < sb.length) {
      if (sb.charAt(i) == 'y' && isV(sb.charAt(i - 1))) sb.setCharAt(i, 'Y')
      i += 1
    }
    w = sb.toString
    val r1 = r1Of(w)
    val r2 = regionAfterVC(w, r1)
    @inline def inR1(suffixLen: Int): Boolean = w.length - suffixLen >= r1
    @inline def inR2(suffixLen: Int): Boolean = w.length - suffixLen >= r2
    @inline def set(s: String): Unit = { w = s }

    // step 0: longest of '  's  's'
    if (w.endsWith("'s'")) set(w.dropRight(3))
    else if (w.endsWith("'s")) set(w.dropRight(2))
    else if (w.endsWith("'")) set(w.dropRight(1))

    // step 1a (longest suffix wins)
    if (w.endsWith("sses")) set(w.dropRight(4) + "ss")
    else if (w.endsWith("ied") || w.endsWith("ies")) {
      val stem = w.dropRight(3)
      set(if (stem.length > 1) stem + "i" else stem + "ie")
    } else if (w.endsWith("us") || w.endsWith("ss")) ()
    else if (w.endsWith("s")) {
      // delete if the preceding part contains a vowel NOT immediately before s
      val stem = w.dropRight(1)
      if (stem.length >= 2 && (0 until stem.length - 1).exists(j => isV(w.charAt(j))))
        set(stem)
    }
    if (post1aInvariant.contains(w)) return w

    // step 1b (longest suffix wins)
    val suf1b = Seq("eedly", "ingly", "edly", "eed", "ing", "ed").find(w.endsWith)
    suf1b.foreach {
      case s @ ("eed" | "eedly") =>
        if (inR1(s.length)) set(w.dropRight(s.length) + "ee")
      case s =>
        val stem = w.dropRight(s.length)
        if (stem.exists(isV)) {
          set(stem)
          if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) set(w + "e")
          else if (w.length >= 2 && doubles.contains(w.takeRight(2))) set(w.dropRight(1))
          else if (r1 >= w.length && endsShortSyllable(w)) set(w + "e")
        }
    }

    // step 1c: y/Y -> i when preceded by a non-vowel that is not the first char
    if (w.length > 2 && (w.endsWith("y") || w.endsWith("Y")) &&
        !isV(w.charAt(w.length - 2)))
      set(w.dropRight(1) + "i")

    // step 2 (condition: suffix in R1; longest match wins, then its rule only)
    val step2 = Seq(
      "ization" -> "ize", "ational" -> "ate", "fulness" -> "ful",
      "ousness" -> "ous", "iveness" -> "ive", "tional" -> "tion",
      "biliti" -> "ble", "lessli" -> "less", "entli" -> "ent",
      "ation" -> "ate", "alism" -> "al", "aliti" -> "al", "ousli" -> "ous",
      "iviti" -> "ive", "fulli" -> "ful", "enci" -> "ence", "anci" -> "ance",
      "abli" -> "able", "izer" -> "ize", "ator" -> "ate", "alli" -> "al",
      "ogi" -> "og", "bli" -> "ble", "li" -> "")
    step2.find { case (s, _) => w.endsWith(s) }.foreach { case (s, rep) =>
      if (inR1(s.length)) s match {
        case "ogi" =>
          if (w.length > 3 && w.charAt(w.length - 4) == 'l') set(w.dropRight(3) + "og")
        case "li" =>
          if (w.length > 2 && liEnding.indexOf(w.charAt(w.length - 3)) >= 0)
            set(w.dropRight(2))
        case _ => set(w.dropRight(s.length) + rep)
      }
    }

    // step 3 (condition: in R1; ative additionally requires R2)
    val step3 = Seq("ational" -> "ate", "tional" -> "tion", "alize" -> "al",
      "icate" -> "ic", "iciti" -> "ic", "ative" -> "", "ical" -> "ic",
      "ful" -> "", "ness" -> "")
    step3.find { case (s, _) => w.endsWith(s) }.foreach { case (s, rep) =>
      if (inR1(s.length)) {
        if (s == "ative") { if (inR2(s.length)) set(w.dropRight(s.length)) }
        else set(w.dropRight(s.length) + rep)
      }
    }

    // step 4 (condition: in R2)
    val step4 = Seq("ement", "ance", "ence", "able", "ible", "ment", "ant",
      "ent", "ism", "ate", "iti", "ous", "ive", "ize", "ion", "al", "er", "ic")
    step4.find(w.endsWith).foreach { s =>
      if (inR2(s.length)) {
        if (s == "ion") {
          val c = if (w.length > 3) w.charAt(w.length - 4) else ' '
          if (c == 's' || c == 't') set(w.dropRight(3))
        } else set(w.dropRight(s.length))
      }
    }

    // step 5
    if (w.endsWith("e")) {
      if (inR2(1) || (inR1(1) && !endsShortSyllable(w.dropRight(1)))) set(w.dropRight(1))
    } else if (w.endsWith("l")) {
      if (inR2(1) && w.length >= 2 && w.charAt(w.length - 2) == 'l') set(w.dropRight(1))
    }

    w.replace('Y', 'y')
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
