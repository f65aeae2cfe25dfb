package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL hygiene for web-scale corpus curation: host extraction,
  * registrable-domain bucketing, normalization, and blocklist filtering —
  * the per-record gate that runs before any content-level quality pass.
  *
  * Like [[Pii]], everything stays in the Java-regex/RE2 common subset and
  * composes from codegen string functions, so each column is exactly
  * statable as a SQL oracle and the whole pass is map-only (no shuffle;
  * the blocklist filter broadcasts a tiny literal set).
  *
  * Registrable domain is the NAIVE last-two-labels rule — correct for
  * com/org/net-style TLDs, wrong for multi-label suffixes (co.uk). A
  * production deployment swaps in the Public Suffix List as a broadcast
  * table; the column shape and the filter join do not change.
  */
object Urls {

  private val HostRe = "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)"

  /** Lower-cased host (no scheme, userinfo, port, path). Empty string
    * for non-URLs — filters treat those as unblocked. */
  def host(url: Column): Column = lower(regexp_extract(url, HostRe, 1))

  /** Naive registrable domain: the last two dot-labels of the host. */
  def registrableDomain(url: Column): Column = {
    val h = host(url)
    when(h.contains("."),
      concat(element_at(split(h, "\\."), -2), lit("."),
        element_at(split(h, "\\."), -1)))
      .otherwise(h)
  }

  /** Normalized form: lower-cased scheme and host, fragment stripped,
    * trailing slash on the PATH stripped — but only when no query string
    * is present ("^([^?]*)/$"): a '?q=a/' value is content, and eating
    * its slash would conflate two genuinely different resources into one
    * dedup key. Query strings are KEPT (they distinguish content); use
    * [[host]] for grouping. */
  def normalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    // lower the scheme+authority prefix only (up to the first '/', '?')
    val prefix = regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    regexp_replace(concat(lower(prefix), rest), "^([^?]*)/$", "$1")
  }

  /** Add `host`/`domain`/`url_norm` columns and a `blocked` flag from a
    * literal domain blocklist (matches the registrable domain exactly or
    * any subdomain of it). */
  def classify(df: DataFrame, urlCol: String,
      blockedDomains: Seq[String]): DataFrame = {
    val u = col(urlCol)
    val withCols = df.withColumn("host", host(u))
      .withColumn("domain", registrableDomain(u))
      .withColumn("url_norm", normalize(u))
    val blocked = blockedDomains.map(_.toLowerCase)
    withCols.withColumn("blocked",
      if (blocked.isEmpty) lit(false)
      else blocked.map(d => col("domain") === d).reduce(_ || _))
  }
}
