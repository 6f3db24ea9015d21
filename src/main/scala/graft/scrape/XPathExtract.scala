package graft.scrape

import graft.scrape.Dom.Node

/** Schema-driven XPath extraction — the XPath twin of [[CssExtract]],
  * re-expressing the reference's JsonXPathExtractionStrategy
  * (/root/reference/crawl4ai/extraction_strategy.py:1612-1704): same typed
  * field model (text / attribute / html / regex / nested / list), base
  * elements selected by an XPath expression, field selectors accepted as
  * XPath or converted from basic CSS exactly like the reference's
  * `_basic_css_to_xpath` (:1648-1662).
  *
  * XPath subset (the shapes the reference documents and tests):
  * `//tag`, `/a/b`, `.//tag`, `./tag`, `*`, and predicates
  * `[@attr='v']`, `[@attr]`, `[contains(@attr,'v')]`, `[text()='v']`, `[N]`.
  * A positional predicate follows XPath semantics: `//div[2]` is a div that
  * is the 2nd div CHILD of its parent (the descendant axis expands to
  * descendant-or-self + child step, as in lxml).
  *
  * Compiled once per job, applied per document as a pure map — no shuffle.
  */
object XPathExtract {

  import CssExtract.{AttrF, Field, HtmlF, ListF, MV, NestedF, RegexF, SV, Schema, TextF, Value}

  // ---- parsing --------------------------------------------------------------

  sealed trait Pred
  final case class AttrEq(attr: String, v: String) extends Pred
  final case class AttrHas(attr: String) extends Pred
  final case class AttrContains(attr: String, v: String) extends Pred
  final case class TextEq(v: String) extends Pred
  final case class Pos(n: Int) extends Pred

  final case class Step(descendant: Boolean, test: String, preds: Seq[Pred])

  def parseXPath(xpath0: String): Seq[Step] = {
    var s = xpath0.trim
    if (s.startsWith(".")) s = s.substring(1)
    val steps = Seq.newBuilder[Step]
    var i = 0
    while (i < s.length) {
      var descendant = true
      if (s.startsWith("//", i)) { descendant = true; i += 2 }
      else if (s.charAt(i) == '/') { descendant = false; i += 1 }
      // bare leading name (tolerated) → descendant
      val nameStart = i
      while (i < s.length && s.charAt(i) != '/' && s.charAt(i) != '[') i += 1
      val test = s.substring(nameStart, i).trim
      val preds = Seq.newBuilder[Pred]
      while (i < s.length && s.charAt(i) == '[') {
        val close = s.indexOf(']', i)
        require(close > i, s"unterminated predicate in $xpath0")
        preds += parsePred(s.substring(i + 1, close).trim)
        i = close + 1
      }
      if (test.nonEmpty || s.startsWith("*", nameStart))
        steps += Step(descendant, if (test.isEmpty) "*" else test.toLowerCase, preds.result())
      else require(test.nonEmpty, s"empty step in $xpath0")
    }
    steps.result()
  }

  private val containsRe = """contains\(\s*@([\w-]+)\s*,\s*['"](.*)['"]\s*\)""".r
  private val attrEqRe = """@([\w-]+)\s*=\s*['"](.*)['"]""".r
  private val attrHasRe = """@([\w-]+)""".r
  private val textEqRe = """text\(\)\s*=\s*['"](.*)['"]""".r
  private val posFnRe = """position\(\)\s*=\s*(\d+)""".r

  private def parsePred(p: String): Pred = p match {
    case s if s.forall(_.isDigit) && s.nonEmpty => Pos(s.toInt)
    case containsRe(a, v) => AttrContains(a.toLowerCase, v)
    case attrEqRe(a, v) => AttrEq(a.toLowerCase, v)
    case textEqRe(v) => TextEq(v)
    case posFnRe(n) => Pos(n.toInt)
    case attrHasRe(a) => AttrHas(a.toLowerCase)
    case other => sys.error(s"unsupported XPath predicate [$other]")
  }

  // ---- evaluation -----------------------------------------------------------

  def select(context: Node, xpath: String): Vector[Node] = {
    val steps = parseXPath(xpath)
    var current: Vector[Node] = Vector(context)
    steps.foreach { st =>
      val seen = new java.util.IdentityHashMap[Node, Boolean]()
      val next = Vector.newBuilder[Node]
      current.foreach { c =>
        // descendant axis = descendant-or-self contexts, then a child step
        val parents: Iterator[Node] =
          if (st.descendant) Iterator(c) ++ c.descendants else Iterator(c)
        parents.foreach { pc =>
          var fil = pc.elementChildren
            .filter(n => st.test == "*" || n.tag == st.test)
          st.preds.foreach {
            case Pos(k) =>
              fil = if (k >= 1 && k <= fil.length) Vector(fil(k - 1)) else Vector.empty
            case AttrEq(a, v) => fil = fil.filter(_.attrs.get(a).contains(v))
            case AttrHas(a) => fil = fil.filter(_.attrs.contains(a))
            case AttrContains(a, v) => fil = fil.filter(_.attrs.get(a).exists(_.contains(v)))
            case TextEq(v) => fil = fil.filter(_.allText == v)
          }
          fil.foreach { n =>
            if (!seen.containsKey(n)) { seen.put(n, true); next += n }
          }
        }
      }
      current = next.result()
    }
    current
  }

  /** The reference's `_css_to_xpath` + leading-dot contextualization for
    * field selectors (extraction_strategy.py:1648-1668). */
  def fieldXPath(selector: String): String = {
    val xp =
      if (selector.contains("/")) selector
      else if (selector.contains(" > ")) "//" + selector.split(" > ").mkString("/")
      else if (selector.contains(" ")) "//" + selector.split(" ").mkString("//")
      else "//" + selector
    if (xp.startsWith(".")) xp else "." + xp
  }

  // ---- schema application ---------------------------------------------------

  private def extractField(scope: Node, f: Field): Option[Value] = {
    val targets =
      if (f.selector.isEmpty) Vector(scope) else select(scope, fieldXPath(f.selector))
    f.fieldType match {
      case TextF => targets.headOption.map(n => SV(n.allText))
      case HtmlF => targets.headOption.map(n => SV(n.outerHtml))
      case AttrF(a) => targets.headOption.flatMap(_.attrs.get(a)).map(SV)
      case RegexF(p) =>
        targets.headOption.flatMap { n =>
          p.r.findFirstMatchIn(n.allText).map(m =>
            SV(if (m.groupCount >= 1) m.group(1) else m.matched))
        }
      case NestedF(fields) =>
        targets.headOption.map(n => MV(extractItem(n, fields)))
      case ListF(fields) =>
        Some(CssExtract.LV(targets.map(n => MV(extractItem(n, fields)))))
    }
  }

  def extractItem(scope: Node, fields: Seq[Field]): Map[String, Value] =
    fields.flatMap(f => extractField(scope, f).map(f.name -> _)).toMap

  /** Apply a schema: one output item per base element (baseSelector is raw
    * XPath, exactly like the reference's `_get_base_elements`). */
  def extract(html: String, schema: Schema): Seq[Map[String, Value]] = {
    val root = Dom.parse(html)
    select(root, schema.baseSelector).map(base => extractItem(base, schema.fields))
  }

  def toJson(items: Seq[Map[String, Value]]): String = CssExtract.toJson(items)
}
