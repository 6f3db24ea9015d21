package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Link intrinsic-quality scoring as pure Column arithmetic — re-expressed
  * from calculate_link_intrinsic_score (/root/reference/crawl4ai/
  * utils.py:3123-3235): attribute quality + URL structure + text quality +
  * page-term overlap + docs-site bonus, clamped to [0, 10]. Combined with a
  * contextual score by [[Scorers.totalLinkScore]] (utils.py:3238-3283).
  *
  * Everything is a `when`-chain over the link row's columns, so scoring a
  * trillion-link table is one codegen'd projection.
  */
object LinkScore {

  private def containsAny(c: Column, needles: Seq[String]): Column =
    needles.map(n => c.contains(n)).reduce(_ || _)

  /** @param linkText    anchor text
    * @param url         link target
    * @param titleAttr   title attribute
    * @param classAttr   class attribute
    * @param relAttr     rel attribute
    * @param pageTerms   array column of page context terms (lowercased)
    * @param isDocsSite  whether the page looks like a documentation site
    */
  def intrinsic(linkText: Column, url: Column, titleAttr: Column,
                classAttr: Column, relAttr: Column,
                pageTerms: Column, isDocsSite: Column): Column = {
    val classStr = lower(coalesce(classAttr, lit("")))
    val relStr = lower(coalesce(relAttr, lit("")))
    val urlLower = lower(coalesce(url, lit("")))
    val text = trim(coalesce(linkText, lit("")))

    val attrQuality =
      when(length(trim(coalesce(titleAttr, lit("")))) > 3, 1.0).otherwise(0.0) +
      when(containsAny(classStr, Seq("nav", "menu", "primary", "main", "important")), 1.5).otherwise(0.0) +
      when(containsAny(classStr, Seq("ad", "sponsor", "track", "promo", "banner")), -1.0).otherwise(0.0) +
      when(containsAny(relStr, Seq("canonical", "next", "prev", "chapter")), 1.0).otherwise(0.0) +
      when(containsAny(relStr, Seq("nofollow", "sponsored", "ugc")), -0.5).otherwise(0.0)

    val urlQuality =
      when(containsAny(urlLower, Seq("/docs/", "/api/", "/guide/", "/tutorial/", "/reference/", "/manual/")), 2.0)
        .when(containsAny(urlLower, Seq("/blog/", "/article/", "/post/", "/news/")), 1.0)
        .otherwise(0.0) +
      when(containsAny(urlLower, Seq("/admin/", "/login/", "/cart/", "/checkout/", "/track/", "/click/")), -1.5).otherwise(0.0)

    // url depth = '/'-count − 2 (protocol + domain)
    val depth = length(urlLower) - length(regexp_replace(urlLower, "/", "")) - lit(2)
    val depthScore = when(depth <= 2, 1.0).when(depth > 5, -0.5).otherwise(0.0)
    val httpsBonus = when(urlLower.startsWith("https://"), 0.5).otherwise(0.0)

    val words = filter(split(text, "\\s+"), w => w =!= "")
    val textQuality =
      when(length(text) > 3, 1.0).otherwise(0.0) +
      when(size(words) >= 2, 0.5).otherwise(0.0) +
      when(size(words) >= 4, 0.5).otherwise(0.0) +
      when(lower(text).isin("click here", "read more", "more info", "link", "here"), -1.0).otherwise(0.0)

    // term overlap: words of the link text (len > 2, punct-stripped) vs page terms
    val linkWords = array_distinct(filter(
      transform(words, w => lower(regexp_replace(w, "^[.,!?;:\"()\\[\\]{}]+|[.,!?;:\"()\\[\\]{}]+$", ""))),
      w => length(w) > 2))
    val overlap = size(array_intersect(linkWords, coalesce(pageTerms, array())))
    val relevance = when(size(linkWords) > 0 && overlap > 0,
      overlap.cast("double") / least(size(linkWords), lit(10)).cast("double") * 2.0)
      .otherwise(0.0)

    val docsBonus = when(coalesce(isDocsSite, lit(false)) &&
      containsAny(lower(text), Seq("api", "reference", "guide", "tutorial", "example")), 1.0)
      .otherwise(0.0)

    val total = attrQuality + urlQuality + depthScore + httpsBonus +
      textQuality + relevance + docsBonus
    greatest(lit(0.0), least(total, lit(10.0)))
  }
}
