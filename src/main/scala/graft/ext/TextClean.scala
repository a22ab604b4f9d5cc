package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text cleaning / PII redaction for training-data pipelines: HTML
  * stripping, whitespace normalization, and email/phone redaction.
  *
  * Pure `regexp_replace` chains — codegen'd per-row projections, zero
  * shuffle, and every pattern is RE2-compatible so the DuckDB oracle runs
  * the identical regex (no backreferences, no lookaround).
  */
object TextClean {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "[+(]?[0-9][0-9()\\s.-]{7,}[0-9]"
  val HtmlTagRe = "<[^>]*>"

  /** Remove HTML/XML tags. */
  def stripHtml(c: Column): Column = regexp_replace(c, HtmlTagRe, " ")

  /** Collapse runs of whitespace, trim ends. */
  def normalizeWhitespace(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** Replace emails/phones with typed placeholders. */
  def redactPii(c: Column): Column =
    regexp_replace(regexp_replace(c, EmailRe, "[EMAIL]"), PhoneRe, "[PHONE]")

  /** Full cleaning pipeline: strip tags → redact PII → normalize space. */
  def clean(c: Column): Column = normalizeWhitespace(redactPii(stripHtml(c)))
}
