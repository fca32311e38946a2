package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection + redaction — the compliance pass every training-data
  * pipeline runs before a corpus ships (emails / IPv4 / SSN-shaped ids
  * here; the pattern set is the extension point, the plumbing is the op).
  *
  * Everything is `regexp_count`/`regexp_replace` — codegen'd Catalyst
  * expressions, map-side only, no shuffle, no UDFs — so the pass costs
  * one scan regardless of corpus size and composes with any downstream
  * filter (e.g. drop docs whose PII density exceeds a threshold rather
  * than redacting them).
  *
  * Pattern dialect: the subset common to Java regex (Spark) and RE2
  * (DuckDB oracle) — character classes, bounded repetition, `\b` word
  * boundaries; no lookarounds or backreferences, so the same literal
  * string is a valid, identically-behaving pattern in both engines.
  */
object Pii {

  val emailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern: String  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val ssnPattern: String   = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  /** Matches of `pattern` in `text`, as a long. */
  def countMatches(text: Column, pattern: String): Column =
    regexp_count(text, lit(pattern)).cast("long")

  /** All three PII classes replaced with typed placeholder tokens.
    * Order matters and is fixed: emails first (their local part may
    * contain digits and dots that the IPv4 pattern could then bite
    * into), then SSNs (dash-delimited, disjoint from IPv4's dots),
    * then IPv4. Replacement tokens contain no digits, so redaction is
    * idempotent — `redact(redact(x)) == redact(x)` (pinned in PiiSpec). */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailPattern, "<EMAIL>"),
        ssnPattern, "<SSN>"),
      ipv4Pattern, "<IP>")
}
