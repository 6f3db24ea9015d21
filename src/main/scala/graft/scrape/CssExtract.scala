package graft.scrape

import graft.scrape.Dom.Node

/** Schema-driven CSS extraction: baseSelector + typed fields, the
  * re-expression of the reference's JsonCssExtractionStrategy
  * (/root/reference/crawl4ai/extraction_strategy.py:804-1196 — same schema
  * shape: baseSelector, fields with type ∈ {text, attribute, html, regex,
  * nested, list, nested_list}; compiled once per job, applied per document
  * as a pure map).
  *
  * Selector subset (covers the reference's own example schemas): compound
  * simple selectors `tag.class#id`, descendant combinator (space), child
  * combinator (`>`), comma-separated alternatives.
  */
object CssExtract {

  // ---- selectors ------------------------------------------------------------

  final case class Simple(tag: Option[String], classes: Seq[String], id: Option[String]) {
    def matches(n: Node): Boolean =
      tag.forall(_ == n.tag) &&
        classes.forall(n.classes.contains) &&
        id.forall(i => n.attrs.get("id").contains(i))
  }
  final case class Compound(parts: Seq[(Simple, Boolean)]) // (selector, isChildCombinator)

  def parseSelector(sel: String): Seq[Compound] =
    sel.split(",").map(_.trim).filter(_.nonEmpty).toSeq.map { alt =>
      // tokenize on whitespace, keeping '>' as its own token
      val toks = alt.replace(">", " > ").split("\\s+").filter(_.nonEmpty)
      val parts = Seq.newBuilder[(Simple, Boolean)]
      var childNext = false
      toks.foreach {
        case ">" => childNext = true
        case t => parts += ((parseSimple(t), childNext)); childNext = false
      }
      Compound(parts.result())
    }

  private def parseSimple(s: String): Simple = {
    var tag: Option[String] = None
    var id: Option[String] = None
    val classes = Seq.newBuilder[String]
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val start = i + (if (c == '.' || c == '#') 1 else 0)
      var j = start
      while (j < s.length && s.charAt(j) != '.' && s.charAt(j) != '#') j += 1
      val name = s.substring(start, j)
      c match {
        case '.' => classes += name
        case '#' => id = Some(name)
        case _ => if (name != "*") tag = Some(name.toLowerCase)
      }
      i = j
    }
    Simple(tag, classes.result(), id)
  }

  /** All descendants of `root` matching the selector (document order).
    * `parts(i)._2` is the combinator BETWEEN part i-1 and part i
    * (true = child `>`, false = descendant).
    */
  def select(root: Node, selector: String): Vector[Node] = {
    val alts = parseSelector(selector)
    val out = Vector.newBuilder[Node]
    // parts(idx) matched at n with ancestor stack `parents` (nearest first)
    def matchesUp(c: Compound, idx: Int, parents: List[Node]): Boolean = {
      if (idx == 0) true
      else {
        val childComb = c.parts(idx)._2
        val prev = c.parts(idx - 1)._1
        if (childComb) parents match {
          case p :: more => prev.matches(p) && matchesUp(c, idx - 1, more)
          case Nil => false
        } else parents.zipWithIndex.exists { case (a, i) =>
          prev.matches(a) && matchesUp(c, idx - 1, parents.drop(i + 1))
        }
      }
    }
    def hit(n: Node, parents: List[Node]): Boolean = alts.exists { c =>
      val lastIdx = c.parts.length - 1
      lastIdx >= 0 && c.parts(lastIdx)._1.matches(n) && matchesUp(c, lastIdx, parents)
    }
    def walk(n: Node, parents: List[Node]): Unit =
      n.children.foreach { ch =>
        if (!ch.isText) {
          if (hit(ch, n :: parents)) out += ch
          walk(ch, n :: parents)
        }
      }
    walk(root, Nil)
    out.result()
  }

  // ---- schema ---------------------------------------------------------------

  sealed trait FieldType
  case object TextF extends FieldType
  case object HtmlF extends FieldType
  final case class AttrF(attribute: String) extends FieldType
  final case class RegexF(pattern: String) extends FieldType
  final case class NestedF(fields: Seq[Field]) extends FieldType
  final case class ListF(fields: Seq[Field]) extends FieldType

  final case class Field(name: String, selector: String, fieldType: FieldType)
  final case class Schema(baseSelector: String, fields: Seq[Field])

  sealed trait Value
  final case class SV(s: String) extends Value
  final case class MV(m: Map[String, Value]) extends Value
  final case class LV(l: Seq[Value]) extends Value

  private def extractField(scope: Node, f: Field): Option[Value] = {
    val targets = if (f.selector.isEmpty) Vector(scope) else select(scope, f.selector)
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
        Some(LV(targets.map(n => MV(extractItem(n, fields)))))
    }
  }

  def extractItem(scope: Node, fields: Seq[Field]): Map[String, Value] =
    fields.flatMap(f => extractField(scope, f).map(f.name -> _)).toMap

  /** Apply a schema to a document: one output item per base element. */
  def extract(html: String, schema: Schema): Seq[Map[String, Value]] = {
    val root = Dom.parse(html)
    select(root, schema.baseSelector).map(base => extractItem(base, schema.fields))
  }

  /** JSON rendering of extracted items (the reference returns a JSON string,
    * extraction_strategy.py `run`).
    */
  def toJson(items: Seq[Map[String, Value]]): String = {
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    def render(v: Value): String = v match {
      case SV(s) => "\"" + esc(s) + "\""
      case MV(m) => m.toSeq.sortBy(_._1)
        .map { case (k, x) => "\"" + esc(k) + "\":" + render(x) }
        .mkString("{", ",", "}")
      case LV(l) => l.map(render).mkString("[", ",", "]")
    }
    items.map(m => render(MV(m))).mkString("[", ",", "]")
  }
}
