package graft.entry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import scala.collection.immutable.ListMap

import graft.operators.IntervalJoin
import graft.graph.GraphOps
import graft.dedup.Dedup
import graft.enrich.Resolution
import graft.similarity.Ann
import graft.text.TextAnalysis
import graft.rdf.{Bgp, QuadStore, TpchQuads}
import graft.rdf.Bgp.Pattern

import graft.entry.EntryKit.{t, eventsAsObservations}

/** Core relational surface: scans, filters, joins, aggregations, windows, set operations and date/string kernels over the TPC-H-ish tables.
  *
  * One of the per-package query registries aggregated by
  * [[graft.SparkEntry]] — split out of the former 6k-LoC single object
  * so each registry compiles to a bounded class (static-init and
  * JIT/class-loading pressure were the bench's named suspect).
  * Query semantics, ids and oracle SQL are unchanged by the split.
  */
private[graft] object CoreSqlQueries {

  /** A1/Q6: grouped aggregation with exact sums (sum of integer-valued
    * doubles + an exact-cents trick for the price sum). */
  private def q01_agg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n_rows"),
        sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast("long")).as("revenue_cents"))

  /** Q1/Q5: filter + projection, pushed down to the parquet scan. */
  private def q02_filter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_quantity") > 45)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))

  /** Q2: multi-way equi-join with broadcast dims (nation/region tiny). */
  private def q03_join(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").alias("o")
      .join(t(s, dir, "customer").alias("c"), col("o.o_custkey") === col("c.c_custkey"))
      .join(broadcast(t(s, dir, "nation").alias("n")),
        col("c.c_nationkey") === col("n.n_nationkey"))
      .groupBy(col("n.n_name").as("n_name"))
      .agg(count(lit(1)).as("n_orders"))

  /** J6/Q10: left-semi join (EXISTS). */
  private def q04_semi_join(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(
        t(s, dir, "lineitem").where(col("l_quantity") > 49).select("l_orderkey"),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))

  /** J5: left-anti join (NOT EXISTS) — the negation-guard shape. */
  private def q05_anti_join(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders").where(col("o_totalprice") > 490000).select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))

  /** Q4/W5: UNION (bag semantics) then aggregate. */
  private def q06_union(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    o.where(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey"))
      .union(o.where(col("o_orderstatus") === "O").select(col("o_custkey").as("custkey")))
      .groupBy("custkey").agg(count(lit(1)).as("n"))
  }

  /** W3/A5: top-k per group via row_number window (deterministic tiebreak). */
  private def q07_topk(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("rk"))
  }

  /** W2/J7: lag over an ordered window — adjacent-row deltas (exact days). */
  private def q08_lag(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    t(s, dir, "lineitem")
      .withColumn("prev", lag(col("l_shipdate"), 1).over(w))
      .withColumn("gap_days",
        (unix_seconds(col("l_shipdate").cast("timestamp")) - unix_seconds(col("prev").cast("timestamp"))) / 86400L)
      .where(col("prev").isNotNull)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("gap_days").cast("long").as("gap_days"))
  }

  /** J1: point-in-interval range join + count. The generic binned join
    * (operators.IntervalJoin, exercised by q40) would materialize the full
    * pair expansion — ~250M rows at sf0.1, O(n²) at scale. Because the
    * aggregate only needs counts and ship dates are day-grained, the
    * aggregation is pushed below the join: pre-aggregate lineitem per day
    * (~|days| rows), explode each order into its 8 covered days, equi-join
    * on the date and sum partial counts. Exactly the oracle's semantics at
    * a fraction of the cost — and the shape survives a 100x scale-up. */
  private def q09_range_join(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "lineitem")
      .groupBy(col("l_shipdate")).agg(count(lit(1)).as("cnt"))
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderdate"),
        explode(sequence(lit(0), lit(7))).as("day_off"))
      .withColumn("ship_day",
        timestamp_seconds(unix_seconds(col("o_orderdate").cast("timestamp")) +
          col("day_off") * 86400L).cast("timestamp_ntz"))
      // broadcast the per-day aggregate: it is calendar-bounded (~2.4k
      // rows at ANY scale factor) while the exploded orders side grows
      // with the fact table — without the hint Spark builds the 8x-orders
      // side (stats see only the pre-explode scan size)
      .join(broadcast(daily), col("ship_day") === col("l_shipdate"))
      .groupBy(col("o_orderkey"))
      .agg(sum(col("cnt")).as("n_shipped"))
  }

  /** A1/Q6 + HAVING on events. */
  private def q10_having(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .where(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"))
      .where(col("n") >= 5)

  /** Q14/A10: DISTINCT projection. */
  private def q11_distinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").select(col("l_returnflag"), col("l_linestatus")).distinct()

  /** Q7/W1: global order-by + limit (totalprice read unmodified → exact). */
  private def q12_orderby_limit(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select(col("o_orderkey"), col("o_totalprice"))
      .limit(10)

  /** W2 + sessionization: 30-minute-gap sessions per user. */
  private def q20_sessionize(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev").isNull ||
          (unix_micros(col("ts")) - unix_micros(col("prev"))) > 30L * 60 * 1000000, 1L)
          .otherwise(0L))
      .withColumn("sess_id",
        sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("event_id"), col("user_id"), col("sess_id"))
  }

  /** String functions: regex extraction from customer names. */
  private def q22_regex_extract(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(col("c_custkey"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("cust_num"))

  /** F2 durationInMillis: exact epoch-millis difference across a join. */
  private def q23_duration_ms(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").alias("l")
      .join(t(s, dir, "orders").alias("o"), col("l.l_orderkey") === col("o.o_orderkey"))
      .select(col("l.l_orderkey").as("l_orderkey"), col("l.l_linenumber").as("l_linenumber"),
        (unix_millis(col("l.l_shipdate").cast("timestamp")) - unix_millis(col("o.o_orderdate").cast("timestamp"))).as("dur_ms"))

  /** F8: Levenshtein distance pairs over nation names (exact ints). */
  private def q24_levenshtein(s: SparkSession, dir: String): DataFrame = {
    val n = t(s, dir, "nation")
    // full self-cross, sound ONLY because nation is a fixed 25-row
    // dimension table at every SF — gate it at runtime so a table swap
    // can't silently turn this into the quadratic scale bug the scaladoc
    // warns about (token-blocked J3 / SetSimJoin are the scale paths)
    val rows = n.count()
    require(rows <= 1000,
      s"q24's exact cross join is a small-dimension baseline ($rows rows " +
        "> 1000); use token blocking (Resolution) or SetSimJoin at scale")
    n.select(col("n_name").as("name1"))
      .crossJoin(n.select(col("n_name").as("name2")))
      .where(col("name1") < col("name2"))
      .withColumn("dist", levenshtein(col("name1"), col("name2")))
      .where(col("dist") <= 4)
  }

  /** A6: histogram — 10-minute event-time buckets (exact bucket index). */
  private def q29_histogram(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy((floor(unix_seconds(col("ts")) / 600L) * 600L).as("bucket_start"))
      .agg(count(lit(1)).as("n"), sum(round(col("value") * 100).cast("long")).as("value_cents"))

  /** Q8: sub-select — orders above their customer's average price, compared
    * in exact cents (price_cents * n_orders > sum_cents). */
  private def q43_subselect(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
    val per = o.groupBy(col("o_custkey").as("ck"))
      .agg(sum(col("cents")).as("sum_cents"), count(lit(1)).as("n"))
    o.join(per, col("o_custkey") === col("ck"))
      .where(col("cents") * col("n") > col("sum_cents"))
      .select(col("o_orderkey"))
  }

  /** Q12: scalar COUNT(*) — one-row result. */
  private def q44_scalar_count(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").agg(count(lit(1)).as("n_rows"))

  /** A4: max-per-unordered-pair via least/greatest grouping. */
  private def q45_max_pair(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(
        least(col("l_suppkey"), col("l_partkey")).as("a"),
        greatest(col("l_suppkey"), col("l_partkey")).as("b"))
      .agg(max(col("l_quantity")).as("max_qty"))

  /** A2: per-user event-type distribution re-normalized to sum 1 (window
    * normalization; per-row IEEE division of exact ints -> deterministic). */
  private def q46_weighted_dist(s: SparkSession, dir: String): DataFrame = {
    val counts = t(s, dir, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("user_id"))
    counts
      .withColumn("weight",
        round(col("n").cast("double") / sum(col("n")).over(w).cast("double"), 9))
      .select(col("user_id"), col("event_type"), col("n"), col("weight"))
  }

  /** F11/F15: address fabrication + parse — local part and lowercased
    * domain split, exact strings. */
  private def q47_email_parse(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .withColumn("email",
        concat(regexp_replace(lower(col("c_name")), "[^a-z0-9]+", "."),
          lit("@Example"), col("c_nationkey") % 3, lit(".COM")))
      .select(col("c_custkey"),
        split(col("email"), "@").getItem(0).as("local_part"),
        lower(split(col("email"), "@").getItem(1)).as("domain"))

  /** COUNT(DISTINCT) — the expand-based distinct aggregation path. */
  private def q55_count_distinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"))

  /** ROLLUP grouping sets (beyond reference scope; native Catalyst). */
  private def q56_rollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))

  /** W7: INTERSECT — customers appearing in both order-status populations. */
  private def q60_intersect(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    o.where(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey"))
      .intersect(o.where(col("o_orderstatus") === "O").select(col("o_custkey").as("custkey")))
  }

  /** W6: EXCEPT — custkeys with F orders but no P orders. */
  private def q61_except(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    o.where(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey"))
      .except(o.where(col("o_orderstatus") === "P").select(col("o_custkey").as("custkey")))
  }

  /** String-function breadth: case, pad, substring, concat — exact. */
  private def q62_string_funcs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "nation").select(
      col("n_nationkey"),
      upper(col("n_name")).as("uname"),
      lower(col("n_name")).as("lname"),
      substring(col("n_name"), 1, 3).as("prefix3"),
      length(col("n_name")).as("len"),
      lpad(col("n_nationkey").cast("string"), 4, "0").as("padded"),
      concat_ws("-", col("n_name"), col("n_regionkey").cast("string")).as("tagged"))

  /** Date-function breadth: year/month/day extraction + month truncation. */
  private def q63_date_funcs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(
      col("o_orderkey"),
      year(col("o_orderdate")).as("y"),
      month(col("o_orderdate")).as("m"),
      dayofmonth(col("o_orderdate")).as("d"),
      unix_seconds(date_trunc("month", col("o_orderdate")).cast("timestamp")).as("month_start_s"))

  /** Running (cumulative) aggregates over an ordered frame — exact ints. */
  private def q64_running(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    t(s, dir, "events").select(
      col("event_id"), col("user_id"),
      count(lit(1)).over(w).as("running_n"),
      sum(round(col("value") * 100).cast("long")).over(w).as("running_cents"))
  }

  /** WARC round-trip: each document becomes a two-record WARC file
    * (warcinfo + an HTTP response carrying the text as UTF-8 HTML body),
    * half of them gzipped (the `.warc.gz` member form), then parsed back
    * through the strict [[graft.sources.Warc]] walker and the HTTP payload
    * splitter. One narrow per-partition pass — synthesis, (de)compression,
    * parse and field extraction never leave the task. The oracle restates
    * the recovered fields straight from `documents` (byte length via
    * UTF-8 `octet_length`, which is what the crawl-side Content-Length
    * carries — NOT the character count). */
  private def q110_warc(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val date = "2026-01-01T00:00:00Z"
    t(s, dir, "documents")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (docId, text) =>
        val info = graft.sources.Warc.writeRecord("warcinfo",
          s"<urn:uuid:info-$docId>", date, None,
          Some("application/warc-fields"),
          "software: graft\r\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val body = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val resp = graft.sources.Warc.writeRecord("response",
          s"<urn:uuid:resp-$docId>", date,
          Some(s"http://example.org/doc/$docId"),
          Some("application/http;msgtype=response"),
          graft.sources.Warc.httpResponse(body, "text/html"))
        val file = graft.sources.Warc.writeFile(Seq(info, resp))
        val bytes = if (docId % 2 == 0) graft.sources.Warc.gzip(file) else file
        val recs = graft.sources.Warc.parse(bytes).get
        val r = recs.find(_.warcType == "response").get
        val (codeN, _, bodyOut) = graft.sources.Warc.parseHttpPayload(r.content).get
        (docId, r.targetUri.get, codeN, recs.size.toLong,
          new String(bodyOut, java.nio.charset.StandardCharsets.UTF_8),
          bodyOut.length.toLong)
      })
      .toDF("doc_id", "uri", "http_status", "n_records", "body_text", "body_bytes")
  }

  /** HTML extraction: each document is wrapped in a deterministic page
    * (head/title, style+script junk, a link-only nav and footer, the text
    * as an escaped paragraph, and an entity-laden constant paragraph),
    * then recovered through the codegen'd `html_text` kernel — boilerplate
    * lines (link density > 0.5) drop, entities decode, escaping reverses.
    * Generation AND extraction are one narrow whole-stage-codegen pass;
    * the oracle restates the surviving lines from `documents` directly. */
  private def q111_html_extract(s: SparkSession, dir: String): DataFrame = {
    val escaped = regexp_replace(regexp_replace(regexp_replace(
      col("text"), "&", "&amp;"), "<", "&lt;"), ">", "&gt;")
    val html = concat(
      lit("<html><!-- generated --><head><title>Doc "), col("doc_id"),
      lit("</title><style>p { color: red }</style>" +
        "<script>if (1 < 2) { var s = '</p>'; }</script></head><body>" +
        "<nav><a href=\"/\">Home</a> <a href=\"/about\">About</a></nav>" +
        "<h1>Doc "), col("doc_id"),
      lit("</h1><p>"), escaped,
      lit("</p><p>&quot;Tom &amp; Jerry&quot; &#189; &lt;tag&gt;</p>" +
        "<footer><a href=\"/tos\">Terms</a> <a href=\"/priv\">Privacy</a>" +
        "</footer></body></html>"))
    t(s, dir, "documents")
      .select(col("doc_id"),
        call_function("html_text", html).as("extracted"))
  }

  /** Z-order layout key: Morton interleave of (user_id, ⌊value⌋) — the
    * multi-dimensional file-clustering key ([[graft.functions.ZOrder]]).
    * Pure bit arithmetic, so the oracle restates it as a generate_series
    * bit sum; the layout/pruning effect itself is ZOrderSpec's
    * files-touched assertion. */
  private def q112_zorder_key(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_id"),
        call_function("zorder_key", col("user_id"),
          floor(col("value")).cast("long")).as("zkey"))

  /** Blocklist curation gate: Aho–Corasick multi-pattern scan
    * ([[graft.text.Blocklist]]) — O(len) per document however long the
    * term list, vs O(terms·len) for per-term contains. The automaton
    * builds once at plan time from the pattern literal and rides into
    * codegen as a reference object. Matched terms report in pattern
    * order, which is what the oracle's `list_filter` restates. */
  private def q113_blocklist(s: SparkSession, dir: String): DataFrame = {
    val pats = array(Seq("spark", "join", "window", "stream").map(lit): _*)
    t(s, dir, "documents")
      .select(col("doc_id"),
        array_join(call_function("blocklist_hits", col("text"), pats), ",").as("hits"),
        size(call_function("blocklist_hits", col("text"), pats)).cast("long").as("n_hits"),
        call_function("blocklist_any", col("text"), pats).as("blocked"))
  }

  /** Pivot: per-user event-type count matrix — Spark's `pivot` with a
    * pinned column list (never an implicit distinct scan), zero-filled.
    * The oracle restates it as conditional counts. */
  private def q128_pivot(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    t(s, dir, "events").groupBy(col("user_id"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types)
  }

  /** Ordered funnel: view → click-after-view → purchase-after-click per
    * user, with the stage timestamps and the depth reached. Three
    * conditional min-aggregations chained on the previous stage's
    * timestamp — no event-level self-join survives to the output. */
  private def q129_funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("view_ts"))
    val c = ev.filter(col("event_type") === "click").join(v, "user_id")
      .where(col("ts") > col("view_ts"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("click_ts"))
    val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
      .where(col("ts") > col("click_ts"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("purchase_ts"))
    ev.select(col("user_id")).distinct()
      .join(v, Seq("user_id"), "left")
      .join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .withColumn("stage",
        when(col("purchase_ts").isNotNull, 3L)
          .when(col("click_ts").isNotNull, 2L)
          .when(col("view_ts").isNotNull, 1L).otherwise(0L))
  }

  /** Tumbling event-time windows via Spark's native `window()` — the
    * same construct the streaming aggregations use, exercised in batch
    * so the bucketing is oracle-checked (DuckDB `time_bucket`). Sum in
    * cents keeps the double aggregation exact. */
  private def q132_tumbling(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select(col("window.start").as("bucket_start"), col("event_type"),
        col("n"), col("value_cents"))

  /** Association rules over the order–part basket: directed rules
    * (ante → cons) for part pairs sharing ≥ 2 orders, confidence in
    * integer ppm (⌊10⁶·n_pair/n_ante⌋ — zero float). */
  private def q140_assoc_rules(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("item"))
      .distinct()
    val itemN = li.groupBy(col("item")).agg(count(lit(1)).as("n_item"))
    val pairs = li.alias("a")
      .join(li.alias("b"),
        col("a.ok") === col("b.ok") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("u"), col("b.item").as("v"))
      .agg(count(lit(1)).as("n_pair"))
      .where(col("n_pair") >= 2)
    val directed = pairs.select(col("u").as("ante"), col("v").as("cons"), col("n_pair"))
      .unionByName(pairs.select(col("v").as("ante"), col("u").as("cons"), col("n_pair")))
    directed
      .join(itemN.select(col("item").as("ante"), col("n_item").as("n_ante")), "ante")
      .select(col("ante"), col("cons"), col("n_pair"), col("n_ante"),
        expr("(1000000 * n_pair) div n_ante").as("conf_ppm"))
  }

  /** Robust outlier flags: median/MAD per event_type with every
    * comparison on scaled integers (med2 = 2·median of cents, M4 =
    * 4·MAD), so the 3-MAD rule |x−med| > 3·MAD becomes the exact
    * integer test 2·d > 3·M4. Spark `percentile` ≡ DuckDB
    * `quantile_cont` bit-for-bit (established by q118/q131).
    *
    * Scale boundary, stated: exact `percentile` buffers each group's
    * values in one aggregation buffer — the right tool at oracle scale
    * and for bounded groups, NOT for 10¹¹-row groups. The scale paths
    * are `approx_percentile` (t-digest, mergeable) or q131's
    * deterministic sampled-quantile sketch; the quantiles10M probe
    * quantifies the trade. */
  private def q142_mad_outliers(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select(col("event_id"), col("event_type"),
      round(col("value") * 100).cast("long").as("cents"))
    val med = ev.groupBy(col("event_type"))
      .agg(percentile(col("cents") * 2, lit(0.5)).cast("long").as("med2"))
    val dev = ev.join(med, "event_type")
      .withColumn("d", abs(col("cents") * 2 - col("med2")))
    val mad = dev.groupBy(col("event_type"))
      .agg((percentile(col("d"), lit(0.5)) * 2).cast("long").as("m4"))
    dev.join(mad, "event_type")
      .select(col("event_id"), col("event_type"), col("cents"),
        col("d"), (col("d") * 2 > col("m4") * 3).as("is_outlier"))
  }

  /** A13: grouped embedding centroids — the vector-aggregation
    * primitive under SemDeDup/cluster-summarization pipelines. Sums are
    * carried as integer micro-units per dimension (float addition does
    * not commute; integer sums do), so the centroid is exact under any
    * partitioning and the oracle can restate it. Shape: posexplode →
    * one (group, dim) aggregation → re-assemble with array_agg sorted
    * by dim. */
  private def q146_centroids(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select((col("vec_id") % 16).as("grp"),
        posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy(col("grp"), col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("x").cast("double") * 1000000).cast("long"))
          .as("sum_micro"))
      .select(col("grp"), col("dim").cast("long").as("dim"), col("n"),
        expr("sum_micro div n").as("c_micro"))

  /** W14: rank-family windows not yet covered head-on — ntile
    * (equi-depth binning), percent_rank and cume_dist (exact rationals
    * k/n, identical across engines) over cents per return flag. */
  private def q147_rank_windows(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("cents"), col("l_orderkey"), col("l_linenumber"))
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .withColumn("decile", ntile(10).over(w))
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
  }

  /** S15: semi-structured column (schema-on-read) — events.props is a
    * JSON string; `from_json` projects it against a declared schema
    * inside codegen (malformed rows become nulls, not failures), and
    * the aggregate treats absent keys as missing data. */
  private def q148_json_props(s: SparkSession, dir: String): DataFrame = {
    val schema = new org.apache.spark.sql.types.StructType()
      .add("k", org.apache.spark.sql.types.LongType)
    t(s, dir, "events")
      .select(col("event_type"),
        from_json(col("props"), schema).getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_k"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
  }

  /** A14: per-group OLS regression (slope/intercept) from the four
    * moment sums — in-database analytics with ZERO float: x and y are
    * bounded integers (x = event_id mod 1000, y = cents ≤ 10⁵), so
    * every moment and the normal-equation numerators stay inside Long,
    * and slope/intercept are stated in integer ppm with truncating
    * division both engines share. */
  private def q151_group_ols(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select(col("event_type"),
      (col("event_id") % 1000).cast("long").as("x"),
      round(col("value") * 100).cast("long").as("y"))
    ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      // slope_ppm in TWO steps (quotient·10⁶ + scaled remainder) so the
      // intermediate never exceeds Long even at 10⁵ rows/group; the
      // oracle restates the identical expression, so both engines agree
      // exactly whatever the rounding of the composite is
      .withColumn("num", expr("n * sxy - sx * sy"))
      .withColumn("den", expr("n * sxx - sx * sx"))
      .withColumn("slope_ppm",
        expr("(num div den) * 1000000 + ((num % den) * 1000000) div den"))
      .select(col("event_type"), col("n"), col("sx"), col("sy"),
        col("sxy"), col("sxx"), col("slope_ppm"),
        expr("((1000000 * sy) - slope_ppm * sx) div (1000000 * n)")
          .as("intercept_cents"))
  }

  /** A18: corpus concentration across sources — exact Gini (sorted
    * cumulative ranks on the per-source totals) and Herfindahl index,
    * both in integer ppm. The "is one domain eating the corpus" audit;
    * the rank window runs over SOURCE cardinality, not rows. */
  private def q156_concentration(s: SparkSession, dir: String): DataFrame = {
    val counts = t(s, dir, "documents")
      .groupBy(col("source")).agg(count(lit(1)).as("c"))
    val w = Window.orderBy(col("c"), col("source"))
    counts
      .withColumn("i", row_number().over(w))
      .agg(count(lit(1)).as("k"), sum(col("c")).as("total"),
        sum(col("c") * col("c")).as("sum_sq"),
        sum(col("i") * col("c")).as("rank_mass"))
      .select(col("k"), col("total"),
        // G = (2·Σi·c − (k+1)·Σc) / (k·Σc)
        expr("(1000000 * (2 * rank_mass - (k + 1) * total)) div (k * total)")
          .as("gini_ppm"),
        // HHI = Σc² / (Σc)²
        expr("(1000000 * sum_sq) div (total * total)").as("hhi_ppm"))
  }

  /** A19: thresholded-classifier evaluation — confusion counts plus
    * precision/recall/F1 and Cohen's κ, every ratio as exact integer
    * ppm (F1 = 2TP/(2TP+FP+FN); κ from the closed rational form), so
    * the whole report is one aggregation and hash-stable. */
  private def q157_confusion(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select((col("doc_id") % 3 === 0).as("label"),
        (col("n_chars") > 300).as("pred"))
      .agg(
        sum(when(col("label") && col("pred"), 1L).otherwise(0L)).as("tp"),
        sum(when(!col("label") && col("pred"), 1L).otherwise(0L)).as("fp"),
        sum(when(col("label") && !col("pred"), 1L).otherwise(0L)).as("fn"),
        sum(when(!col("label") && !col("pred"), 1L).otherwise(0L)).as("tn"))
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        expr("(1000000 * tp) div (tp + fp)").as("precision_ppm"),
        expr("(1000000 * tp) div (tp + fn)").as("recall_ppm"),
        expr("(1000000 * 2 * tp) div (2 * tp + fp + fn)").as("f1_ppm"),
        // κ = (N(TP+TN) − E) / (N² − E), E = (TP+FP)(TP+FN)+(FN+TN)(FP+TN)
        expr("(1000000 * ((tp + fp + fn + tn) * (tp + tn)" +
          " - ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn))))" +
          " div ((tp + fp + fn + tn) * (tp + fp + fn + tn)" +
          " - ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)))")
          .as("kappa_ppm"))

  /** q167: two-proportion χ² test in one aggregation — "does source A's
    * long-document rate differ from the rest" as an exact contingency
    * count plus the mirrored-shape statistic (round 6). */
  private def q167_chi2(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("source").isin((0 to 9).map(i => s"src$i"): _*).as("g"),
        (col("n_chars") > 300).as("succ"))
      .agg(
        sum(when(col("g") && col("succ"), 1L).otherwise(0L)).as("a"),
        sum(when(col("g") && !col("succ"), 1L).otherwise(0L)).as("b"),
        sum(when(!col("g") && col("succ"), 1L).otherwise(0L)).as("c"),
        sum(when(!col("g") && !col("succ"), 1L).otherwise(0L)).as("d"))
      .select(col("a"), col("b"), col("c"), col("d"),
        round(((col("a") + col("b") + col("c") + col("d")).cast("double") *
          pow(col("a").cast("double") * col("d") -
            col("b").cast("double") * col("c"), 2)) /
          ((col("a") + col("b")).cast("double") * (col("c") + col("d")) *
            (col("a") + col("c")) * (col("b") + col("d"))), 6).as("chi2"))

  /** q171: cohort retention — users bucketed by first-activity month,
    * counted in every month they return. */
  private def q171_cohort(s: SparkSession, dir: String): DataFrame = {
    val um = t(s, dir, "events")
      .select(col("user_id"),
        unix_seconds(date_trunc("month", col("ts")).cast("timestamp"))
          .as("month_s"))
      .distinct()
    val cohort = um.groupBy(col("user_id"))
      .agg(min(col("month_s")).as("cohort_s"))
    um.join(cohort, "user_id")
      .groupBy(col("cohort_s"), col("month_s"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** q172: Markov transition matrix — per-user ordered event-type
    * bigrams with exact ppm row-normalized probabilities. */
  private def q172_transitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .where(col("prev").isNotNull)
      .groupBy(col("prev"), col("event_type").as("cur"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("p_ppm", expr(
        "(1000000 * cnt) div sum(cnt) over (partition by prev)"))
  }

  /** q186: CUBE over (returnflag, linestatus) with the grouping id —
    * the full lattice q56's ROLLUP only walks one chain of. */
  private def q186_cube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().cast("long").as("gid"), count(lit(1)).as("n"),
        sum(col("l_quantity")).as("sum_qty"))
      .select(col("l_returnflag"), col("l_linestatus"), col("gid"),
        col("n"), col("sum_qty"))

  /** q195: explicit GROUPING SETS — the irregular lattice ROLLUP (q56)
    * and CUBE (q186) cannot state: (flag, status), (flag), (status). */
  private def q195_grouping_sets(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    s.sql(
      """SELECT l_returnflag, l_linestatus, count(1) AS n,
        |  sum(l_quantity) AS sum_qty
        |FROM lineitem_gs
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |  (l_returnflag), (l_linestatus))""".stripMargin)
  }

  /** q196: time-RANGE window frames — trailing 1-hour sum/count per
    * user (the feature-engineering staple ROWS frames can't state:
    * the frame is defined by event TIME, not row position). */
  private def q196_trailing_window(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val obs = t(s, dir, "events").select(col("event_id"), col("user_id"),
      unix_seconds(col("ts").cast("timestamp")).as("t"),
      round(col("value") * 100).cast("long").as("v"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("t"))
      .rangeBetween(-3600L, Window.currentRow)
    obs.select(col("event_id"), col("user_id"), col("t"), col("v"),
      sum(col("v")).over(w).as("trail_1h"),
      count(lit(1)).over(w).as("n_1h"))
  }

  /** q197: EXCEPT ALL — bag semantics (q61's EXCEPT collapses
    * multiplicity; here each F-order occurrence survives per unmatched
    * duplicate, the reconciliation-diff contract). */
  private def q197_except_all(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    o.where(col("o_orderstatus") === "F").select(col("o_custkey"))
      .exceptAll(
        o.where(col("o_orderstatus") === "O").select(col("o_custkey")))
  }

  private[graft] val queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "q01_agg" -> (q01_agg _),
    "q02_filter" -> (q02_filter _),
    "q03_join" -> (q03_join _),
    "q04_semi_join" -> (q04_semi_join _),
    "q05_anti_join" -> (q05_anti_join _),
    "q06_union" -> (q06_union _),
    "q07_topk" -> (q07_topk _),
    "q08_lag" -> (q08_lag _),
    "q09_range_join" -> (q09_range_join _),
    "q10_having" -> (q10_having _),
    "q11_distinct" -> (q11_distinct _),
    "q12_orderby_limit" -> (q12_orderby_limit _),
    "q20_sessionize" -> (q20_sessionize _),
    "q22_regex_extract" -> (q22_regex_extract _),
    "q23_duration_ms" -> (q23_duration_ms _),
    "q24_levenshtein" -> (q24_levenshtein _),
    "q29_histogram" -> (q29_histogram _),
    "q43_subselect" -> (q43_subselect _),
    "q44_scalar_count" -> (q44_scalar_count _),
    "q45_max_pair" -> (q45_max_pair _),
    "q46_weighted_dist" -> (q46_weighted_dist _),
    "q47_email_parse" -> (q47_email_parse _),
    "q55_count_distinct" -> (q55_count_distinct _),
    "q56_rollup" -> (q56_rollup _),
    "q60_intersect" -> (q60_intersect _),
    "q61_except" -> (q61_except _),
    "q62_string_funcs" -> (q62_string_funcs _),
    "q63_date_funcs" -> (q63_date_funcs _),
    "q64_running" -> (q64_running _),
    "q110_warc" -> (q110_warc _),
    "q111_html_extract" -> (q111_html_extract _),
    "q112_zorder_key" -> (q112_zorder_key _),
    "q113_blocklist" -> (q113_blocklist _),
    "q128_pivot" -> (q128_pivot _),
    "q129_funnel" -> (q129_funnel _),
    "q132_tumbling" -> (q132_tumbling _),
    "q140_assoc_rules" -> (q140_assoc_rules _),
    "q142_mad_outliers" -> (q142_mad_outliers _),
    "q146_centroids" -> (q146_centroids _),
    "q147_rank_windows" -> (q147_rank_windows _),
    "q148_json_props" -> (q148_json_props _),
    "q151_group_ols" -> (q151_group_ols _),
    "q156_concentration" -> (q156_concentration _),
    "q157_confusion" -> (q157_confusion _),
    "q167_chi2" -> (q167_chi2 _),
    "q171_cohort" -> (q171_cohort _),
    "q172_transitions" -> (q172_transitions _),
    "q186_cube" -> (q186_cube _),
    "q195_grouping_sets" -> (q195_grouping_sets _),
    "q196_trailing_window" -> (q196_trailing_window _),
    "q197_except_all" -> (q197_except_all _))

  private[graft] val oracleSql: ListMap[String, String] = ListMap(
    "q01_agg" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        | count(*) AS n_rows,
        | CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_quantity > 45""".stripMargin,
    "q03_join" ->
      """SELECT n_name, count(*) AS n_orders FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "q04_semi_join" ->
      """SELECT o_orderpriority, count(*) AS n FROM orders
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 49)
        |GROUP BY o_orderpriority""".stripMargin,
    "q05_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 490000)""".stripMargin,
    "q06_union" ->
      """SELECT custkey, count(*) AS n FROM (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        |  UNION ALL
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        |) GROUP BY custkey""".stripMargin,
    "q07_topk" ->
      """SELECT o_custkey, o_orderkey, rk FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders
        |) WHERE rk <= 3""".stripMargin,
    "q08_lag" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST((epoch(l_shipdate) - epoch(prev)) / 86400 AS BIGINT) AS gap_days
        |FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
        |    lag(l_shipdate) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber) AS prev
        |  FROM lineitem
        |) WHERE prev IS NOT NULL""".stripMargin,
    "q09_range_join" ->
      """SELECT o_orderkey, count(*) AS n_shipped FROM orders
        |JOIN lineitem ON l_shipdate >= o_orderdate
        |  AND l_shipdate <= o_orderdate + INTERVAL 7 DAY
        |GROUP BY o_orderkey""".stripMargin,
    "q10_having" ->
      """SELECT user_id, count(*) AS n FROM events WHERE event_type = 'purchase'
        |GROUP BY user_id HAVING count(*) >= 5""".stripMargin,
    "q11_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q12_orderby_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q20_sessionize" ->
      """SELECT event_id, user_id,
        |  CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
        |FROM (
        |  -- compare at micros precision to match the engine's storage
        |  -- resolution (events.parquet is TIMESTAMP(NANOS); the engine
        |  -- stores micros, so ordering and the gap test truncate ns -> us)
        |  SELECT event_id, user_id, epoch_ns(ts)//1000 AS tus,
        |    CASE WHEN lag(epoch_ns(ts)//1000) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts)//1000, event_id) IS NULL
        |      OR epoch_ns(ts)//1000 - lag(epoch_ns(ts)//1000) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts)//1000, event_id) > 1800000000
        |      THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |)""".stripMargin,
    "q22_regex_extract" ->
      """SELECT c_custkey, coalesce(regexp_extract(c_name, '([0-9]+)', 1), '') AS cust_num
        |FROM customer""".stripMargin,
    "q23_duration_ms" ->
      """SELECT l_orderkey, l_linenumber,
        |  epoch_ms(l_shipdate) - epoch_ms(o_orderdate) AS dur_ms
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin,
    "q24_levenshtein" ->
      """SELECT a.n_name AS name1, b.n_name AS name2,
        |  levenshtein(a.n_name, b.n_name) AS dist
        |FROM nation a JOIN nation b ON a.n_name < b.n_name
        |WHERE levenshtein(a.n_name, b.n_name) <= 4""".stripMargin,
    "q29_histogram" ->
      """SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS bucket_start,
        |  count(*) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1""".stripMargin,
    "q43_subselect" ->
      """SELECT o_orderkey FROM (
        |  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (PARTITION BY o_custkey) AS BIGINT) AS sum_cents,
        |    count(*) OVER (PARTITION BY o_custkey) AS n
        |  FROM orders
        |) WHERE cents * n > sum_cents""".stripMargin,
    "q44_scalar_count" ->
      "SELECT count(*) AS n_rows FROM lineitem",
    "q45_max_pair" ->
      """SELECT least(l_suppkey, l_partkey) AS a, greatest(l_suppkey, l_partkey) AS b,
        |  max(l_quantity) AS max_qty
        |FROM lineitem GROUP BY 1, 2""".stripMargin,
    "q46_weighted_dist" ->
      """SELECT user_id, event_type, n,
        |  round(CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY user_id) AS DOUBLE), 9) AS weight
        |FROM (
        |  SELECT user_id, event_type, count(*) AS n FROM events
        |  GROUP BY user_id, event_type
        |)""".stripMargin,
    "q47_email_parse" ->
      """SELECT c_custkey,
        |  string_split(email, '@')[1] AS local_part,
        |  lower(string_split(email, '@')[2]) AS domain
        |FROM (
        |  SELECT c_custkey,
        |    regexp_replace(lower(c_name), '[^a-z0-9]+', '.', 'g')
        |      || '@Example' || (c_nationkey % 3) || '.COM' AS email
        |  FROM customer
        |)""".stripMargin,
    "q55_count_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q56_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q60_intersect" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'""".stripMargin,
    "q61_except" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'""".stripMargin,
    "q62_string_funcs" ->
      """SELECT n_nationkey, upper(n_name) AS uname, lower(n_name) AS lname,
        |  substring(n_name, 1, 3) AS prefix3, length(n_name) AS len,
        |  lpad(CAST(n_nationkey AS VARCHAR), 4, '0') AS padded,
        |  concat_ws('-', n_name, CAST(n_regionkey AS VARCHAR)) AS tagged
        |FROM nation""".stripMargin,
    "q63_date_funcs" ->
      """SELECT o_orderkey, year(o_orderdate) AS y, month(o_orderdate) AS m,
        |  day(o_orderdate) AS d,
        |  CAST(epoch(date_trunc('month', o_orderdate)) AS BIGINT) AS month_start_s
        |FROM orders""".stripMargin,
    "q64_running" ->
      """SELECT event_id, user_id,
        |  count(*) OVER w AS running_n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) AS running_cents
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,
    // q110: the WARC writer/parser must be a faithful inverse pair — the
    // oracle restates every recovered field from the source table
    "q110_warc" ->
      """SELECT doc_id,
        |  'http://example.org/doc/' || CAST(doc_id AS VARCHAR) AS uri,
        |  200 AS http_status,
        |  CAST(2 AS BIGINT) AS n_records,
        |  text AS body_text,
        |  octet_length(encode(text)) AS body_bytes
        |FROM documents""".stripMargin,
    // q111: the surviving lines are title, h1, the escaped-then-decoded
    // text (identity round-trip), and the constant entity paragraph; the
    // link-only nav and footer die at the 0.5 link-density gate
    "q111_html_extract" ->
      """SELECT doc_id,
        |  'Doc ' || CAST(doc_id AS VARCHAR) || chr(10) ||
        |  'Doc ' || CAST(doc_id AS VARCHAR) || chr(10) ||
        |  text || chr(10) ||
        |  '"Tom & Jerry" ½ <tag>' AS extracted
        |FROM documents""".stripMargin,
    // q112: Morton interleave restated as a bit sum over the 21 bit
    // positions of each dimension
    "q112_zorder_key" ->
      """WITH k AS (
        |  SELECT event_id, user_id AS x, CAST(floor(value) AS BIGINT) AS y
        |  FROM events
        |)
        |SELECT event_id,
        |  CAST(sum((((x >> b) & 1) << (2*b)) + (((y >> b) & 1) << (2*b+1)))
        |    AS BIGINT) AS zkey
        |FROM k, generate_series(0, 20) g(b)
        |GROUP BY event_id""".stripMargin,
    // q113: substring semantics, matched terms in pattern-list order
    "q113_blocklist" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    list_filter(['spark','join','window','stream'],
        |      p -> contains(text, p)) AS hl
        |  FROM documents
        |)
        |SELECT doc_id, coalesce(array_to_string(hl, ','), '') AS hits,
        |  CAST(len(hl) AS BIGINT) AS n_hits, len(hl) > 0 AS blocked
        |FROM m""".stripMargin,
    // q128: pivot as conditional counts
    "q128_pivot" ->
      """SELECT user_id,
        |  CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS click,
        |  CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS error,
        |  CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
        |  CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
        |  CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS "view"
        |FROM events GROUP BY user_id""".stripMargin,
    // q129: chained conditional stage minima
    "q129_funnel" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS view_ts FROM events
        |  WHERE event_type = 'view' GROUP BY user_id
        |), c AS (
        |  SELECT e.user_id, min(e.ts) AS click_ts
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.view_ts
        |  GROUP BY e.user_id
        |), p AS (
        |  SELECT e.user_id, min(e.ts) AS purchase_ts
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
        |  GROUP BY e.user_id
        |)
        |SELECT u.user_id, v.view_ts, c.click_ts, p.purchase_ts,
        |  CAST(CASE WHEN p.purchase_ts IS NOT NULL THEN 3
        |       WHEN c.click_ts IS NOT NULL THEN 2
        |       WHEN v.view_ts IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS stage
        |FROM (SELECT DISTINCT user_id FROM events) u
        |LEFT JOIN v ON u.user_id = v.user_id
        |LEFT JOIN c ON u.user_id = c.user_id
        |LEFT JOIN p ON u.user_id = p.user_id""".stripMargin,
    // q132: Spark window(ts, '1 hour').start == time_bucket
    "q132_tumbling" ->
      """SELECT time_bucket(INTERVAL 1 HOUR, ts) AS bucket_start,
        |  event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |    AS value_cents
        |FROM events GROUP BY 1, 2""".stripMargin,
    // q140: basket counts + directed-rule confidence in integer ppm
    "q140_assoc_rules" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS item FROM lineitem
        |), itn AS (
        |  SELECT item, count(*) AS n_item FROM li GROUP BY item
        |), pr AS (
        |  SELECT a.item AS u, b.item AS v, CAST(count(*) AS BIGINT) AS n_pair
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.item < b.item
        |  GROUP BY 1, 2 HAVING count(*) >= 2
        |), directed AS (
        |  SELECT u AS ante, v AS cons, n_pair FROM pr
        |  UNION ALL
        |  SELECT v AS ante, u AS cons, n_pair FROM pr
        |)
        |SELECT ante, cons, n_pair, CAST(n_item AS BIGINT) AS n_ante,
        |  CAST((1000000 * n_pair) // n_item AS BIGINT) AS conf_ppm
        |FROM directed JOIN itn ON itn.item = directed.ante""".stripMargin,
    // q142: the integer-scaled median/MAD restated on quantile_cont
    "q142_mad_outliers" ->
      """WITH ev AS (
        |  SELECT event_id, event_type,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events
        |), med AS (
        |  SELECT event_type, CAST(quantile_cont(cents * 2, 0.5) AS BIGINT) AS med2
        |  FROM ev GROUP BY 1
        |), dev AS (
        |  SELECT ev.*, abs(cents * 2 - med2) AS d
        |  FROM ev JOIN med USING (event_type)
        |), mad AS (
        |  SELECT event_type, CAST(quantile_cont(d, 0.5) * 2 AS BIGINT) AS m4
        |  FROM dev GROUP BY 1
        |)
        |SELECT event_id, event_type, cents, d, (d * 2 > m4 * 3) AS is_outlier
        |FROM dev JOIN mad USING (event_type)""".stripMargin,
    // q146: per-(group, dimension) centroid in integer micro-units —
    // float sums don't commute, integer micro sums do
    "q146_centroids" ->
      """WITH ix AS (
        |  SELECT vec_id, embedding,
        |    unnest(generate_series(1, len(embedding))) AS i
        |  FROM embeddings
        |), e AS (
        |  SELECT vec_id % 16 AS grp, CAST(i - 1 AS BIGINT) AS dim,
        |    CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS micro
        |  FROM ix
        |)
        |SELECT grp, dim, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(micro) // count(*) AS BIGINT) AS c_micro
        |FROM e GROUP BY grp, dim""".stripMargin,
    // q147: ntile/percent_rank/cume_dist with a total order (ties broken
    // by key) so bin assignment is engine-independent
    "q147_rank_windows" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag,
        |  CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
        |  CAST(ntile(10) OVER w AS INTEGER) AS decile,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_returnflag
        |  ORDER BY CAST(round(l_extendedprice * 100) AS BIGINT),
        |    l_orderkey, l_linenumber)""".stripMargin,
    // q148: schema-on-read JSON projection + aggregate
    "q148_json_props" ->
      """SELECT event_type,
        |  CAST(count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS n_k,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
        |  CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,
    // q151: the normal equations verbatim; // and div both truncate
    // toward zero on BIGINT (established by q146)
    "q151_group_ols" ->
      """WITH m AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(event_id % 1000) AS BIGINT) AS sx,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sy,
        |    CAST(sum((event_id % 1000) * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sxy,
        |    CAST(sum((event_id % 1000) * (event_id % 1000)) AS BIGINT) AS sxx
        |  FROM events GROUP BY event_type
        |)
        |, s AS (
        |  SELECT m.*, (n * sxy - sx * sy) AS num, (n * sxx - sx * sx) AS den
        |  FROM m
        |)
        |SELECT event_type, n, sx, sy, sxy, sxx,
        |  CAST((num // den) * 1000000 + ((num % den) * 1000000) // den AS BIGINT) AS slope_ppm,
        |  CAST(((1000000 * sy) - ((num // den) * 1000000 + ((num % den) * 1000000) // den) * sx) // (1000000 * n) AS BIGINT) AS intercept_cents
        |FROM s""".stripMargin,
    // q156: Gini via sorted cumulative ranks + HHI, both exact ppm
    "q156_concentration" ->
      """WITH counts AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY source
        |), ranked AS (
        |  SELECT c, CAST(row_number() OVER (ORDER BY c, source) AS BIGINT) AS i
        |  FROM counts
        |)
        |SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(c) AS BIGINT) AS total,
        |  CAST((1000000 * (2 * sum(i * c) - (count(*) + 1) * sum(c)))
        |    // (count(*) * sum(c)) AS BIGINT) AS gini_ppm,
        |  CAST((1000000 * sum(c * c)) // (sum(c) * sum(c)) AS BIGINT) AS hhi_ppm
        |FROM ranked""".stripMargin,
    // q157: confusion counts + exact ppm ratios, formulas verbatim
    "q157_confusion" ->
      """WITH c AS (
        |  SELECT
        |    CAST(sum(CASE WHEN doc_id % 3 = 0 AND n_chars > 300 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(sum(CASE WHEN doc_id % 3 <> 0 AND n_chars > 300 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |    CAST(sum(CASE WHEN doc_id % 3 = 0 AND n_chars <= 300 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
        |    CAST(sum(CASE WHEN doc_id % 3 <> 0 AND n_chars <= 300 THEN 1 ELSE 0 END) AS BIGINT) AS tn
        |  FROM documents
        |)
        |SELECT tp, fp, fn, tn,
        |  CAST((1000000 * tp) // (tp + fp) AS BIGINT) AS precision_ppm,
        |  CAST((1000000 * tp) // (tp + fn) AS BIGINT) AS recall_ppm,
        |  CAST((1000000 * 2 * tp) // (2 * tp + fp + fn) AS BIGINT) AS f1_ppm,
        |  CAST((1000000 * ((tp + fp + fn + tn) * (tp + tn)
        |    - ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn))))
        |    // ((tp + fp + fn + tn) * (tp + fp + fn + tn)
        |    - ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn))) AS BIGINT) AS kappa_ppm
        |FROM c""".stripMargin,
    // q167: contingency counts + the χ² shape mirrored term by term
    "q167_chi2" ->
      """WITH c AS (
        |  SELECT
        |    CAST(sum(CASE WHEN source IN ('src0','src1','src2','src3','src4',
        |      'src5','src6','src7','src8','src9') AND n_chars > 300
        |      THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN source IN ('src0','src1','src2','src3','src4',
        |      'src5','src6','src7','src8','src9') AND n_chars <= 300
        |      THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN source NOT IN ('src0','src1','src2','src3','src4',
        |      'src5','src6','src7','src8','src9') AND n_chars > 300
        |      THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN source NOT IN ('src0','src1','src2','src3','src4',
        |      'src5','src6','src7','src8','src9') AND n_chars <= 300
        |      THEN 1 ELSE 0 END) AS BIGINT) AS d
        |  FROM documents
        |)
        |SELECT a, b, c, d,
        |  round((CAST(a + b + c + d AS DOUBLE) *
        |    pow(CAST(a AS DOUBLE) * d - CAST(b AS DOUBLE) * c, 2)) /
        |    (CAST(a + b AS DOUBLE) * (c + d) * (a + c) * (b + d)), 6) AS chi2
        |FROM c""".stripMargin,
    // q171: first-activity cohorts x active months
    "q171_cohort" ->
      """WITH um AS (
        |  SELECT DISTINCT user_id,
        |    CAST(epoch(date_trunc('month', ts)) AS BIGINT) AS month_s
        |  FROM events
        |), c AS (
        |  SELECT user_id, min(month_s) AS cohort_s FROM um GROUP BY user_id
        |)
        |SELECT cohort_s, month_s,
        |  CAST(count(DISTINCT um.user_id) AS BIGINT) AS n_users
        |FROM um JOIN c ON um.user_id = c.user_id
        |GROUP BY cohort_s, month_s""".stripMargin,
    // q172: lag bigrams + integer ppm row normalization
    "q172_transitions" ->
      """WITH o AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev
        |  FROM events
        |), t AS (
        |  SELECT prev, event_type AS cur, CAST(count(*) AS BIGINT) AS cnt
        |  FROM o WHERE prev IS NOT NULL GROUP BY prev, event_type
        |)
        |SELECT prev, cur, cnt,
        |  CAST((1000000 * cnt) // sum(cnt) OVER (PARTITION BY prev) AS BIGINT)
        |    AS p_ppm
        |FROM t""".stripMargin,
    // q186: same grouping-id bit order as Spark (first column = MSB)
    "q186_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus)
        |    AS BIGINT) AS gid,
        |  count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,
    // q195: the same irregular lattice
    "q195_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(1) AS n,
        |  sum(l_quantity) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |  (l_returnflag), (l_linestatus))""".stripMargin,
    // q196: integer-second RANGE frame (identical tie semantics: the
    // frame includes every row of equal t)
    "q196_trailing_window" ->
      """WITH obs AS (
        |  SELECT event_id, user_id,
        |    CAST(epoch_ms(ts) // 1000 AS BIGINT) AS t,
        |    CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events
        |)
        |SELECT event_id, user_id, t, v,
        |  CAST(sum(v) OVER (PARTITION BY user_id ORDER BY t
        |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS trail_1h,
        |  CAST(count(*) OVER (PARTITION BY user_id ORDER BY t
        |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS n_1h
        |FROM obs""".stripMargin,
    // q197: bag difference
    "q197_except_all" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT ALL
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'""".stripMargin
  )
}
