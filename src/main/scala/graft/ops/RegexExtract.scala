package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Regex extraction catalog: finds emails, phones, URLs, dates, money, etc.
  * with pre-compiled patterns, emitting (id, label, value) rows — the
  * relational re-expression of the reference's RegexExtractionStrategy
  * (/root/reference/crawl4ai/extraction_strategy.py:1706-1812; same label
  * set and pattern intent, re-authored for Java regex).
  *
  * Execution shape: one `regexp_extract_all` per label inside a single
  * projection (codegen'd), then one `posexplode` per label unioned — no UDF,
  * no per-row Python. Labels not requested are pruned from the plan.
  */
object RegexExtract {

  /** Pattern catalog (Java regex; case-insensitive flag inline where the
    * reference compiles with IGNORECASE).
    */
  val patterns: Map[String, String] = Map(
    "email" -> "[\\w.+-]+@[\\w-]+\\.[\\w.-]+",
    "phone_intl" -> "\\+?\\d[\\d .()-]{7,}\\d",
    "phone_us" -> "\\(?\\d{3}\\)?[ -.]?\\d{3}[ -.]?\\d{4}",
    "url" -> "https?://[^\\s\"'<>]+",
    "ipv4" -> "(?:\\d{1,3}\\.){3}\\d{1,3}",
    "ipv6" -> "(?i)[A-F0-9]{1,4}(?::[A-F0-9]{1,4}){7}",
    "uuid" -> "(?i)[0-9a-f]{8}-[0-9a-f]{4}-[1-5][0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}",
    "currency" -> "(?:USD|EUR|RM|\\$|€|£)\\s?\\d+(?:[.,]\\d{2})?",
    "percentage" -> "\\d+(?:\\.\\d+)?%",
    "number" -> "\\b\\d{1,3}(?:[,.\\s]\\d{3})*(?:\\.\\d+)?\\b",
    "date_iso" -> "\\d{4}-\\d{2}-\\d{2}",
    "date_us" -> "\\d{1,2}/\\d{1,2}/\\d{2,4}",
    "time_24h" -> "\\b(?:[01]?\\d|2[0-3]):[0-5]\\d(?:[:.][0-5]\\d)?\\b",
    "postal_us" -> "\\b\\d{5}(?:-\\d{4})?\\b",
    "postal_uk" -> "\\b[A-Z]{1,2}\\d[A-Z\\d]? ?\\d[A-Z]{2}\\b",
    "html_color_hex" -> "#[0-9A-Fa-f]{6}\\b",
    "twitter_handle" -> "@\\w{1,15}",
    "hashtag" -> "#[\\w-]+",
    "mac_addr" -> "(?:[0-9A-Fa-f]{2}:){5}[0-9A-Fa-f]{2}",
    "iban" -> "[A-Z]{2}\\d{2}[A-Z0-9]{11,30}",
    "credit_card" -> "\\b(?:4\\d{12}(?:\\d{3})?|5[1-5]\\d{14}|3[47]\\d{13}|6(?:011|5\\d{2})\\d{12})\\b")

  /** Default PII-redaction chain, in application order. Order matters and is
    * part of the contract: structured identifiers go first so a later, looser
    * pattern cannot eat a prefix of them (phone_intl's digit-run pattern
    * overlaps dotted IPv4s and the digit runs inside UUIDs/cards, so it is
    * applied last, after those have been replaced by digit-free tokens). */
  val piiLabels: Seq[String] = Seq(
    "email", "credit_card", "iban", "mac_addr", "ipv6", "ipv4", "uuid",
    "phone_intl")

  /** Column expression replacing every match of each label (in order) with
    * its `[LABEL]` token — a chain of codegen'd `regexp_replace`s inside one
    * projection: a single scan-stage pass, no UDF, no extra stage at any
    * scale. */
  def redactExpr(text: Column, labels: Seq[String] = piiLabels): Column =
    labels.foldLeft(text) { (c, l) =>
      val re = patterns.getOrElse(l,
        throw new IllegalArgumentException(s"unknown pattern label: $l"))
      regexp_replace(c, lit(re), lit(s"[${l.toUpperCase}]"))
    }

  /** PII scrubbing over a corpus: (<idCol>, redacted_text). The exact same
    * replacement chain is expressible in ANSI SQL as nested
    * regexp_replace(…, 'g') — see [[redactSql]], the DuckDB oracle twin. */
  def redact(df: DataFrame, idCol: String, textCol: String,
             labels: Seq[String] = piiLabels): DataFrame =
    df.select(col(idCol), redactExpr(col(textCol), labels).as("redacted_text"))

  /** The SQL twin of [[redactExpr]] for an engine with RE2-style
    * regexp_replace(text, pattern, replacement, 'g') — same patterns, same
    * order, built from the same catalog so the two can never drift. */
  def redactSql(textExpr: String, labels: Seq[String] = piiLabels): String =
    labels.foldLeft(textExpr) { (e, l) =>
      val re = patterns(l).replace("'", "''")
      s"regexp_replace($e, '$re', '[${l.toUpperCase}]', 'g')"
    }

  /** Extract all matches of the selected labels from `textCol`.
    * Output: (<idCol>, label, value, match_pos) — match_pos is the index of
    * the match within its label's match list (document order).
    */
  def extract(df: DataFrame, idCol: String, textCol: String,
              labels: Seq[String] = patterns.keys.toSeq.sorted): DataFrame = {
    val perLabel = labels.map { label =>
      val re = patterns.getOrElse(label,
        throw new IllegalArgumentException(s"unknown pattern label: $label"))
      df.select(col(idCol),
          posexplode(regexp_extract_all(col(textCol), lit(re), lit(0)))
            .as(Seq("match_pos", "value")))
        .withColumn("label", lit(label))
        .select(col(idCol), col("label"), col("value"), col("match_pos"))
    }
    perLabel.reduce(_ unionByName _)
  }
}
