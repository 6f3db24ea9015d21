package graft.core

/** Core record types of the engine (SURVEY.md §1). Case classes double as
  * Dataset encoders and as the schema contract for the snapshot tables.
  */

/** One interleaved span of a document: the engine's primary payload
  * (BASELINE.json input_hint). `kind` ∈ {"text","media"}; `offset` is the
  * DOM/markdown emission order (reference: media group_id = DOM index,
  * content_scraping_strategy.py:522; markdown emission order,
  * markdown_generation_strategy.py:148-226).
  */
final case class Span(kind: String, text: String, media_ref: String, offset: Int)

/** The contract table row: docs(doc_id, spans). */
final case class SpanDoc(doc_id: String, spans: Seq[Span])

/** An extracted link, post-canonicalization. */
final case class LinkOut(href: String, text: String, internal: Boolean, linkIndex: Int)

/** A fetched+scraped page (intermediate between fetch join and doc write). */
final case class ScrapedDoc(
    doc_id: String,
    url: String,
    spans: Seq[Span],
    links: Seq[LinkOut],
    title: String,
    nWords: Int)

/** Frontier row — the priority queue element (models.py:39-57 status enum;
  * bff_strategy.py:141-143 priority tuple; crazy.py:76 FIFO tiebreaker).
  * Narrow columns only: frontier arithmetic at 10^10 scale never touches HTML.
  *
  * `path` is the discovery path encoded as fixed-width hex digits per level
  * (parentPath + "%04x" of the in-page link index): plain string ordering on
  * it IS DFS preorder, (depth, path) is BFS level order, and it is computed
  * locally from the parent row — no global sequence shuffle at any scale.
  */
final case class FrontierEntry(
    url_hash: Long,
    url: String,
    host: String,
    depth: Int,
    score: Double,
    priority: Double,
    parent: String,
    path: String,
    enqueue_epoch: Int,
    retry_count: Int,
    epoch: Int,
    status: String)

object CrawlStatus {
  val Queued = "QUEUED"
  val InProgress = "IN_PROGRESS"
  val Completed = "COMPLETED"
  val Failed = "FAILED"
  val Skipped = "SKIPPED"
}

/** Synthetic page-store row (replaces network fetch; FIXTURES.md §2). */
final case class PageRec(
    url: String,
    url_hash: Long,
    host: String,
    html: String,
    status_code: Int,
    fetched_epoch: Int)

/** Robots dimension row (reference cache schema, utils.py:267-275). */
final case class RobotsRec(host: String, rules: String, fetch_time: Long, rules_md5: String)

/** Per-host politeness state (models.py:15-19), evolved deterministically
  * per epoch (async_dispatcher.py:63-83 minus RNG jitter — documented
  * divergence, SURVEY.md §7.4.4).
  */
final case class DomainState(host: String, current_delay: Double, fail_count: Int)

/** Seed-list row (FIXTURES.md §3; seeder output async_url_seeder.py:990-1006). */
final case class SeedRec(url: String, source: String)

/** Per-epoch metrics row (TraversalStats models.py:100-109 + dispatch metrics). */
final case class EpochMetrics(
    epoch: Int,
    fetched: Long,
    failed: Long,
    skipped_robots: Long,
    deferred: Long,
    discovered: Long,
    new_frontier: Long,
    seen_total: Long,
    wall_ms: Long)
