package graft.scrape

import graft.scrape.Dom.Node

/** Data-table detection + structural extraction — re-expressed from the
  * reference's is_data_table / extract_table_data
  * (/root/reference/crawl4ai/content_scraping_strategy.py:201-347): a
  * layout-vs-data score over thead/tbody/th presence, nesting, role,
  * column-count variance, caption/summary, text density, data-* attributes
  * and size, thresholded at `table_score_threshold` (default 7,
  * async_configs.py:959-960); extraction yields {headers, rows, caption,
  * summary}. Runs inside the per-document scrape map.
  */
object Tables {

  final case class TableData(
      headers: Seq[String],
      rows: Seq[Seq[String]],
      caption: String,
      summary: String)

  private def selectAll(n: Node, tag: String): Vector[Node] =
    n.descendants.filter(_.tag == tag).toVector

  /** The data-table score (reference weights). */
  def dataTableScore(table: Node): Double = {
    var score = 0.0
    val hasThead = selectAll(table, "thead").nonEmpty
    val hasTbody = selectAll(table, "tbody").nonEmpty
    if (hasThead) score += 2
    if (hasTbody) score += 1
    val thCount = selectAll(table, "th").size
    val rows = selectAll(table, "tr")
    if (thCount > 0) {
      score += 2
      val firstRowTh = rows.headOption.exists(r => r.descendants.exists(_.tag == "th"))
      if (hasThead || firstRowTh) score += 1
    }
    if (selectAll(table, "table").nonEmpty) score -= 3 // nested tables
    val role = table.attrs.getOrElse("role", "").toLowerCase
    if (role == "presentation" || role == "none") score -= 3
    if (rows.isEmpty) return Double.NegativeInfinity
    val colCounts = rows.map(r => r.descendants.count(c => c.tag == "td" || c.tag == "th"))
    val avgCols = colCounts.sum.toDouble / colCounts.size
    val variance = colCounts.map(c => (c - avgCols) * (c - avgCols)).sum / colCounts.size
    if (variance < 1) score += 2
    if (selectAll(table, "caption").nonEmpty) score += 2
    if (table.attrs.get("summary").exists(_.nonEmpty)) score += 1
    val totalText = rows.flatMap(_.descendants.filter(c => c.tag == "td" || c.tag == "th"))
      .map(_.allText.length).sum
    val totalTags = table.descendants.size
    val textRatio = totalText.toDouble / (totalTags + 1e-5)
    if (textRatio > 20) score += 3 else if (textRatio > 10) score += 2
    score += table.attrs.keys.count(_.startsWith("data-")) * 0.5
    if (avgCols >= 2 && rows.size >= 2) score += 2
    score
  }

  def isDataTable(table: Node, threshold: Double = 7.0): Boolean =
    dataTableScore(table) >= threshold

  /** Structural extraction: headers from the first th-row (or first row),
    * body rows as cell-text lists.
    */
  def extractTableData(table: Node): TableData = {
    val caption = selectAll(table, "caption").headOption.map(_.allText).getOrElse("")
    val summary = table.attrs.getOrElse("summary", "").trim
    val rows = selectAll(table, "tr")
    val headerRow = rows.find(r => r.descendants.exists(_.tag == "th"))
    val headers = headerRow.map(
      _.descendants.filter(c => c.tag == "th" || c.tag == "td").map(_.allText).toSeq)
      .getOrElse(Seq.empty)
    val bodyRows = rows.filterNot(r => headerRow.contains(r)).map(
      _.descendants.filter(c => c.tag == "td" || c.tag == "th").map(_.allText).toSeq)
    TableData(headers, bodyRows.toSeq, caption, summary)
  }

  /** All data tables of a document. */
  def extract(html: String, threshold: Double = 7.0): Seq[TableData] = {
    val root = Dom.parse(html)
    root.descendants.filter(_.tag == "table")
      .filter(t => isDataTable(t, threshold))
      .map(extractTableData)
      .toSeq
  }
}
