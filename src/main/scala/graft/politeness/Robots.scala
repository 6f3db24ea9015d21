package graft.politeness

import graft.core.PyUrl

/** robots.txt parsing + enforcement.
  *
  * Semantics re-expressed from the reference's `RobotsParser.can_fetch`
  * (/root/reference/crawl4ai/utils.py:313-365), which delegates rule matching
  * to Python's stdlib `urllib.robotparser.RobotFileParser`:
  *  - groups of `User-agent:` lines followed by `Allow:`/`Disallow:` rules;
  *  - an agent matches a group if any group agent is "*" or is a substring of
  *    the lowercased agent (first path component before "/");
  *  - within the matching group, rules are checked IN FILE ORDER and the
  *    first rule whose (percent-normalized) path is a prefix of the request
  *    path decides; `Disallow:` with an empty path means allow-all;
  *  - unparseable / missing rules fail OPEN (utils.py:348-365).
  *
  * The parse is pure (String => Vector[Rule]); enforcement runs as a UDF over
  * a broadcast-joined robots dimension table: the rules text for a host is
  * tiny and per-host cardinality is low, so a broadcast hash join + codegen'd
  * predicate is the Spark-scale shape (no per-row network I/O, ever).
  */
object Robots {

  /** One rule line: allowance + percent-normalized path prefix. */
  final case class Rule(allow: Boolean, path: String)

  /** One user-agent group. */
  final case class Group(agents: Vector[String], rules: Vector[Rule])

  /** Percent-normalize a robots path the way urllib's RuleLine does:
    * quote(unquote(path)) — keeps %-escapes canonical, preserves "/", "*", "$".
    */
  private def normPath(p: String): String =
    PyUrl.quote(PyUrl.unquote(p), safe = "/*%$")

  /** Parse robots.txt text into user-agent groups (stdlib robotparser shape:
    * a blank line or a new User-agent after rules starts a new group).
    */
  def parse(rules: String): Vector[Group] = {
    val groups = Vector.newBuilder[Group]
    var agents = Vector.empty[String]
    var lines = Vector.empty[Rule]
    var sawRule = false
    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents, lines)
      agents = Vector.empty; lines = Vector.empty; sawRule = false
    }
    if (rules == null) return Vector.empty
    rules.split("\n").foreach { raw =>
      val noComment = {
        val i = raw.indexOf('#')
        if (i >= 0) raw.substring(0, i) else raw
      }
      val line = noComment.trim
      if (line.isEmpty) { if (sawRule) flush() }
      else {
        val colon = line.indexOf(':')
        if (colon > 0) {
          val key = line.substring(0, colon).trim.toLowerCase
          val value = line.substring(colon + 1).trim
          key match {
            case "user-agent" =>
              if (sawRule) flush()
              agents :+= value.toLowerCase
            case "disallow" if agents.nonEmpty =>
              sawRule = true
              // empty Disallow == allow everything (no-op rule is kept so an
              // empty-path prefix matches all and allows)
              lines :+= Rule(allow = value.isEmpty, path = normPath(value))
            case "allow" if agents.nonEmpty =>
              sawRule = true
              lines :+= Rule(allow = true, path = normPath(value))
            case _ => // crawl-delay / sitemap / unknown: ignored
          }
        }
      }
    }
    flush()
    groups.result()
  }

  private def groupFor(groups: Vector[Group], userAgent: String): Option[Group] = {
    val ua = userAgent.split("/")(0).toLowerCase
    groups.find(g => g.agents.exists(a => a != "*" && ua.contains(a)))
      .orElse(groups.find(_.agents.contains("*")))
  }

  /** First-match rule check over the matching group's rules, file order.
    * "*" matches any path (stdlib treats a lone "*" specially; embedded
    * wildcards are literal, matching urllib semantics the reference uses).
    */
  def canFetchParsed(groups: Vector[Group], userAgent: String, url: String): Boolean =
    groupFor(groups, userAgent) match {
      case None => true
      case Some(g) =>
        val rawPath = {
          val p = PyUrl.parse(url)
          val withQuery = if (p.query.nonEmpty) p.path + "?" + p.query else p.path
          val n = normPath(withQuery)
          if (n.isEmpty) "/" else n
        }
        g.rules.collectFirst {
          case Rule(allow, path) if path == "*" || rawPath.startsWith(path) => allow
        }.getOrElse(true)
    }

  /** One-shot check (parse + match). Null/empty rules fail open. */
  def canFetch(rules: String, url: String, userAgent: String = "*"): Boolean =
    if (rules == null || rules.trim.isEmpty) true
    else canFetchParsed(parse(rules), userAgent, url)
}
