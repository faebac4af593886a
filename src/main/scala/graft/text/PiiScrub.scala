package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora — the redaction stage every
  * public-web pipeline runs before text reaches a tokenizer (emails,
  * phone-shaped numbers, bare IPv4s → typed placeholders), kept
  * deliberately relational: per-type match counts for the audit trail
  * and one chained `regexp_replace` projection for the rewrite, both
  * codegen'd per-row work with no shuffle anywhere.
  *
  * The patterns are restricted to the Java-regex ∩ RE2 common dialect
  * (character classes, bounded repetition, `\b`) so the DuckDB oracle
  * executes the IDENTICAL pattern strings — one source of truth,
  * interpolated into both plans. No lookbehind/lookahead: Java has
  * them, RE2 does not, and a pattern only one engine can run cannot be
  * hash-gated.
  *
  * Replacement order matters and is fixed: emails first (an email
  * contains dots and digits that the IP pattern could partially claim
  * once the local part is gone), then IPs, then phones. [[scrub]] is
  * idempotent — placeholders contain no pattern-matchable characters
  * (spec-pinned).
  */
object PiiScrub {

  val EmailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val IpPattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhonePattern = "\\b[0-9]{3}-[0-9]{4}\\b"

  /** Matches of one pattern — the per-type audit count. */
  def count(c: Column, pattern: String): Column =
    regexp_count(c, lit(pattern)).cast("int")

  /** All three redactions in one chained projection. */
  def scrub(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailPattern, "<EMAIL>"),
        IpPattern, "<IP>"),
      PhonePattern, "<PHONE>")
}
