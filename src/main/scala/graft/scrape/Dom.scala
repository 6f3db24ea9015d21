package graft.scrape

import graft.scrape.HtmlTok._

/** Minimal DOM built from the [[HtmlTok]] event stream — enough tree
  * structure for CSS-schema extraction ([[CssExtract]]) and the pruning
  * content filter ([[ContentFilter]]). Tolerant of unclosed tags (close pops
  * to the nearest matching open, like the scraper's stack).
  */
object Dom {

  final class Node(
      val tag: String, // "" for text nodes
      val attrs: Map[String, String],
      var children: Vector[Node],
      val text: String) { // text-node content

    def isText: Boolean = tag.isEmpty

    /** Concatenated descendant text, whitespace-normalized. */
    def allText: String = {
      val sb = new StringBuilder
      def walk(n: Node): Unit = {
        if (n.isText) { sb += ' '; sb ++= n.text }
        else n.children.foreach(walk)
      }
      walk(this)
      HtmlTok.normSpace(sb.toString)
    }

    /** Direct text (own text children only). */
    def ownText: String =
      HtmlTok.normSpace(children.filter(_.isText).map(_.text).mkString(" "))

    /** Re-serialized HTML of this subtree. Text nodes and attribute values
      * were entity-decoded at parse time ([[HtmlTok.decodeEntities]]), so both
      * are re-escaped here — otherwise decoded `<`/`>` in content would parse
      * as real markup on the re-tokenize, and a `>` or `"` inside an attribute
      * would truncate/corrupt the tag (the tokenizer's tag scan is a naive
      * `indexOf('>')`).
      */
    def outerHtml: String = {
      val sb = new StringBuilder
      def walk(n: Node): Unit = {
        if (n.isText) sb ++= Dom.escapeText(n.text)
        else {
          sb += '<'; sb ++= n.tag
          n.attrs.foreach { case (k, v) => sb ++= s""" $k="${Dom.escapeAttr(v)}"""" }
          sb += '>'
          n.children.foreach(walk)
          sb ++= s"</${n.tag}>"
        }
      }
      walk(this)
      sb.toString
    }

    def classes: Set[String] =
      attrs.get("class").map(_.split("\\s+").filter(_.nonEmpty).toSet).getOrElse(Set.empty)

    /** Preorder traversal of element descendants (self excluded). */
    def descendants: Iterator[Node] =
      children.iterator.filterNot(_.isText).flatMap(c => Iterator(c) ++ c.descendants)

    def elementChildren: Vector[Node] = children.filterNot(_.isText)
  }

  /** Escape a decoded text node for re-serialization (inverse of the
    * tokenizer's entity decode for the characters that affect parsing). */
  def escapeText(s: String): String =
    if (s.indexOf('&') < 0 && s.indexOf('<') < 0 && s.indexOf('>') < 0) s
    else s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Escape a decoded attribute value for double-quoted re-serialization. */
  def escapeAttr(s: String): String =
    if (s.indexOf('&') < 0 && s.indexOf('"') < 0 && s.indexOf('<') < 0 && s.indexOf('>') < 0) s
    else s.replace("&", "&amp;").replace("\"", "&quot;")
      .replace("<", "&lt;").replace(">", "&gt;")

  /** Parse HTML to a synthetic root node (tag "#root"). */
  def parse(html: String): Node = {
    val root = new Node("#root", Map.empty, Vector.empty, "")
    var stack = List(root)
    val toks = HtmlTok.tokenize(html)
    while (toks.hasNext) {
      toks.next() match {
        case Open(tag, attrs, selfClosing) =>
          val n = new Node(tag, attrs, Vector.empty, "")
          stack.head.children :+= n
          if (!selfClosing) stack = n :: stack
        case Close(tag) =>
          val idx = stack.indexWhere(_.tag == tag)
          if (idx >= 0 && idx < stack.length - 1) stack = stack.drop(idx + 1)
        case Text(s) =>
          stack.head.children :+= new Node("", Map.empty, Vector.empty, s)
      }
    }
    root
  }
}
