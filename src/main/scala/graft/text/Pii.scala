package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection/redaction over a text column — the scrubbing pass every
  * large-scale training-data pipeline runs before anything else sees the
  * corpus. Patterns are deliberately restricted to the regex subset that
  * means the same thing in Java regex and RE2 (no lookarounds, no
  * backreferences), so the operator is exactly statable as a SQL oracle
  * and behaves identically under Spark codegen.
  *
  * Everything is `regexp_replace`/`regexp_extract_all` over the scan —
  * whole-stage codegen, zero shuffles, scales embarrassingly: at 100 TB
  * this is a map-only pass whose cost is the scan itself.
  */
object Pii {

  /** RFC-5322-ish mailbox, the practical subset. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** Dotted-quad IPv4 (word-bounded; no octet-range check — scrubbing
    * favors recall). */
  val Ipv4Re = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  /** International-ish phone: leading `+`, 8–15 digits with optional
    * single space/dash separators. */
  val PhoneRe = "\\+\\d(?:[ -]?\\d){6,13}"

  private def count(c: Column, re: String): Column =
    size(regexp_extract_all(c, lit(re), lit(0)))

  /** Append `<out>` (redacted text) and per-category match counts.
    * Redaction order is fixed (emails, then IPs, then phones) — emails
    * contain dots and digits, so they must leave the text before the
    * narrower patterns run. */
  def redact(df: DataFrame, textCol: String, out: String = "redacted"): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_emails", count(t, EmailRe))
      .withColumn("n_ips", count(t, Ipv4Re))
      .withColumn("n_phones", count(t, PhoneRe))
      .withColumn(out,
        regexp_replace(
          regexp_replace(
            regexp_replace(t, EmailRe, "[EMAIL]"),
            Ipv4Re, "[IP]"),
          PhoneRe, "[PHONE]"))
  }
}
