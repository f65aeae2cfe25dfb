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

/** Custom operator family (graft.operators): as-of/range/salted joins, sketches, drift and data-quality metrics, IVM, table diff, layout keys.
  *
  * One of the per-package query registries aggregated by
  * [[graft.SparkEntry]] — split out of the former 6k-LoC single object
  * so each registry compiles to a bounded class (static-init and
  * JIT/class-loading pressure were the bench's named suspect).
  * Query semantics, ids and oracle SQL are unchanged by the split.
  */
private[graft] object OperatorQueries {

  /** Skew pattern: two-stage salted aggregation — identical result to a
    * plain GROUP BY (the oracle), with hot keys spread over 16 partial
    * reducers. Exact cents so the double-summation order is irrelevant. */
  private def q54_salted_agg(s: SparkSession, dir: String): DataFrame =
    graft.operators.SkewedAgg.saltedSum(
        t(s, dir, "lineitem")
          .withColumn("qty_c", round(col("l_quantity") * 100).cast("long")),
        "l_returnflag", "qty_c", salts = 16)
      .select(col("l_returnflag"), col("sum").as("qty_cents"))

  /** W3 via a bounded typed Aggregator instead of a window sort: shuffle
    * volume O(groups*k), not O(rows) — same result as q07's window. */
  private def q59_topk_agg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(graft.functions.TopK.topK(3, col("o_totalprice"), col("o_orderkey")).as("top"))
      .select(col("o_custkey"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("o_custkey"), col("e._2").as("o_orderkey"),
        (col("pos") + 1).cast("int").as("rk"))

  /** Sketches (HLL): mergeable approximate-distinct registers, summarized
    * to integral engine-exact columns — the O(1)-state scale path for
    * COUNT(DISTINCT) at 100 TB. Register max gets map-side combine, so
    * the shuffle carries ≤1024 rows per group however large the input. */
  private def q107_hll_distinct(s: SparkSession, dir: String): DataFrame =
    graft.functions.Sketches.hllSummary(
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_orderkey").cast("string").as("k")),
      Seq("l_returnflag"), col("k"))

  /** Sketches (Count-Min): d×w counter table + min-over-rows frequency
    * estimates — heavy-hitter detection with a fixed 4096-row sketch that
    * broadcasts, instead of an exact per-key count shuffle. Deterministic
    * (counters are order-independent sums), so the oracle restates it. */
  private def q108_cms_heavy(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(col("l_partkey").cast("string").as("k"))
    val sketch = graft.functions.Sketches.cmsSketch(li, col("k"))
    graft.functions.Sketches.cmsEstimate(li, col("k"), sketch)
      .where(col("est") >= 60)
  }

  /** Bloom-pruned join: the selective dimension's keys ride to the fact
    * scan as 128 KiB of bloom bits inside a codegen'd filter, so fact rows
    * that cannot match die BEFORE the join shuffle. The join stays exact
    * (false positives are removed by the equi-join), which is why the
    * oracle is the plain SQL join. */
  private def q109_bloom_join(s: SparkSession, dir: String): DataFrame = {
    val urgent = t(s, dir, "orders")
      .where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_custkey"))
    graft.operators.BloomJoin
      .prunedJoin(t(s, dir, "lineitem"), "l_orderkey", urgent, "o_orderkey")
      .select(col("l_orderkey"), col("l_linenumber"), col("o_custkey"))
  }

  /** Backward as-of join ([[graft.operators.AsOfJoin]]): every click
    * matched to the user's most recent not-later view — the union+running-
    * window formulation (one exchange per side, no candidate blowup).
    * DuckDB's NATIVE `ASOF LEFT JOIN` is the oracle, so the exact
    * greatest-ts-≤ semantics (equal-ts inclusive, null on no match) are
    * checked term for term. */
  private def q120_asof_join(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"),
        col("event_id").as("view_event_id"), col("value").as("view_value"))
    graft.operators.AsOfJoin.backward(clicks, views, Seq("user_id"),
      leftTs = "ts", rightTs = "ts",
      payload = Seq("view_event_id", "view_value"))
  }

  /** Salted skew join ([[graft.operators.SaltedJoin]]): lineitem⋈part
    * with 8 salts, aggregated per brand. Semantics are the plain inner
    * join's — the oracle states exactly that — while a hot part key's
    * probe rows spread across 8 partitions. */
  private def q124_salted_join(s: SparkSession, dir: String): DataFrame = {
    val probe = t(s, dir, "lineitem")
      .select(col("l_partkey").as("p_partkey"), col("l_quantity"))
    val build = t(s, dir, "part").select(col("p_partkey"), col("p_brand"))
    graft.operators.SaltedJoin.inner(probe, build, Seq("p_partkey"), salts = 8)
      .groupBy(col("p_brand"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_rows"))
  }

  /** Time-grid gap-fill — the resample/forward-fill warehouse op,
    * COMPOSED from [[graft.operators.AsOfJoin]]: a per-user hourly grid
    * over day one, each bucket carrying the last event value at or
    * before the bucket instant (null before the first event). The grid
    * is a bounded explode (users × 24); the fill is the as-of join, so
    * the oracle is again DuckDB's native ASOF. */
  private def q127_gap_fill(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val grid = ev.select(col("user_id")).distinct()
      .withColumn("hour", explode(sequence(lit(0), lit(23))))
      .withColumn("bucket_ts",
        expr("timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,hour,0,0)"))
    val builds = ev.select(col("user_id"), col("ts"),
      col("event_id").as("last_event_id"), col("value").as("last_value"))
    graft.operators.AsOfJoin.backward(grid, builds, Seq("user_id"),
      leftTs = "bucket_ts", rightTs = "ts",
      payload = Seq("last_event_id", "last_value"))
      .select(col("user_id"), col("hour").cast("long").as("hour"),
        col("bucket_ts"), col("last_event_id"), col("last_value"))
  }

  /** Table profiling ([[graft.operators.Profile]]): per-column null
    * counts, cardinalities and ranges in ONE aggregation pass over
    * orders — int/string/timestamp columns only, so the stringified
    * ranges are engine-portable. */
  private def q130_profile(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profile.profile(t(s, dir, "orders"),
      Seq("o_orderkey", "o_orderstatus", "o_orderdate", "o_orderpriority"))

  /** J10: PPJoin-style prefix-filtered Jaccard join over document word
    * sets — the scale-correct threshold similarity join (rarity-ordered
    * prefixes bound candidates with no completeness-losing cap; length +
    * positional filters prune inside the join; native merge-scan verify
    * with threshold early-exit). The oracle states the brute-force
    * all-pairs threshold join it must equal. tau = 0.9, the realistic
    * near-dup band: the prefix filter's candidate volume shrinks toward
    * the true result as tau -> 1, and the driver corpus is near-dup
    * saturated (J > 1/2 admits 8.6M of the 12.5M possible pairs at
    * sf0.1 — output-bound by construction, no longer a join benchmark). */
  private def q133_setsim_join(s: SparkSession, dir: String): DataFrame =
    graft.operators.SetSimJoin.jaccardPairs(
      t(s, dir, "documents"), "text", "doc_id", num = 9, den = 10)

  /** SCD type-2 dimension build from the event log: per-user validity
    * intervals of the event_type state (episode compression + exclusive
    * upper bounds). Sentinel end 2200-01-01 keeps valid_to non-null and
    * inside pandas' datetime64[ns] range for the oracle compare. */
  private def q135_scd2(s: SparkSession, dir: String): DataFrame =
    graft.operators.Scd.type2(
      t(s, dir, "events"), keyCols = Seq("user_id"), tsCol = "ts",
      tieCol = "event_id", attrCols = Seq("event_type"),
      openEnd = "2200-01-01 00:00:00")

  /** J11: sorted-neighborhood blocking over case-folded customer names —
    * every pair within a 5-rank sliding window of the global (key, id)
    * sort. Parallel rank (range-sort + zipWithIndex), bounded explode —
    * never a single-task window. */
  private def q137_sorted_neighborhood(s: SparkSession, dir: String): DataFrame =
    graft.operators.SortedNeighborhood.pairs(
      t(s, dir, "customer").withColumn("k", lower(col("c_name"))),
      "c_custkey", "k", w = 5)

  /** CDC merge (MERGE INTO semantics): apply a changelog synthesized
    * from orders (upserts + every-7th tombstone, orderkey as sequence)
    * onto the customer snapshot — latest-wins per key, one window + one
    * full-outer join. */
  private def q139_cdc_merge(s: SparkSession, dir: String): DataFrame = {
    val snap = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
    val changes = t(s, dir, "orders").select(
      col("o_custkey").as("c_custkey"),
      concat(lit("cust-"), col("o_orderkey").cast("string")).as("c_name"),
      (col("o_orderkey") % 25).as("c_nationkey"),
      col("o_orderkey").as("seq"),
      when(col("o_orderkey") % 7 === 0, graft.operators.Merge.Delete)
        .otherwise(graft.operators.Merge.Upsert).as("op"))
    graft.operators.Merge(snap, changes, Seq("c_custkey"), "seq", "op")
  }

  /** Data-quality expectations report over customer: one scan, one
    * aggregate, integer-ppm verdicts. */
  private def q143_expectations(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Expectations._
    check(t(s, dir, "customer"), Seq(
      NotNull("c_name"),
      Unique("c_custkey"),
      InRange("c_acctbal", -999.99, 9999.99),
      InRange("c_nationkey", 0, 24),
      AcceptedValues("c_mktsegment",
        Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"),
        budgetPpm = 0)))
  }

  /** W13/IVM: maintain a per-customer (count, sum-cents) view under a
    * synthesized changelog — snapshot from ⅔ of orders, inserts for the
    * rest, deletes for every 7th snapshot row. The oracle aggregates the
    * FINAL row set directly; hash equality proves delta-merge ≡
    * recompute. */
  private def q144_ivm(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(col("o_custkey"), col("o_orderkey"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
    val base = o.where(col("o_orderkey") % 3 =!= 0)
    val snap = graft.operators.Ivm.snapshot(base, Seq("o_custkey"), Seq("cents"))
    val delta = o.where(col("o_orderkey") % 3 === 0)
      .withColumn("sign", lit(1L))
      .unionByName(base.where(col("o_orderkey") % 7 === 0)
        .withColumn("sign", lit(-1L)))
      .select(col("o_custkey"), col("sign"), col("cents"))
    graft.operators.Ivm.applyDelta(snap, delta, Seq("o_custkey"),
      Seq("cents"), "sign")
  }

  /** J12: asymmetric containment join over document word sets —
    * |x∩y|/|x| > 4/5 (quote / partial-copy detection; Jaccard misses a
    * small x inside a big y, containment flags it). */
  private def q149_containment(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents").select(
      col("doc_id").as("id"),
      array_distinct(filter(
        split(col("text"), "[\\s\\p{Punct}]+"), t => length(t) > 0))
        .as("toks"))
    graft.operators.SetSimJoin.containmentPairsTokens(
      toks, "id", "toks", num = 4, den = 5)
  }

  /** A15: exact Mann–Whitney AUC in integer ppm — does n_chars predict
    * the (synthetic, deterministic) label doc_id % 3 = 0? The point is
    * the exact tie-averaged rank identity, restated by the oracle. */
  private def q152_auc(s: SparkSession, dir: String): DataFrame =
    graft.operators.Auc.aucPpm(
      t(s, dir, "documents")
        .select(col("n_chars"), (col("doc_id") % 3 === 0).as("label")),
      "n_chars", "label")

  /** A16: exact two-sample Kolmogorov–Smirnov drift statistic in ppm —
    * value distribution of even- vs odd-user events (deterministic
    * split; ≈ no drift expected, the identity is what's verified). */
  private def q153_ks_drift(s: SparkSession, dir: String): DataFrame =
    graft.operators.Drift.ksPpm(
      t(s, dir, "events").select(
        round(col("value") * 100).cast("long").as("cents"),
        (col("user_id") % 2 === 0).as("even_user")),
      "cents", "even_user")

  /** S16: keyed snapshot diff — audit q139's CDC merge against the
    * original customer snapshot: every key classified added / removed /
    * changed / unchanged from 8-byte fingerprints, never full payloads
    * through the join. */
  private def q154_table_diff(s: SparkSession, dir: String): DataFrame = {
    val before = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
    graft.operators.TableDiff.diff(before, q139_cdc_merge(s, dir),
      Seq("c_custkey"))
  }

  /** A17: categorical drift (total variation distance) of the
    * event_type mix between even- and odd-user events — exact rational
    * in ppm, no ordered support needed. */
  private def q155_tvd_drift(s: SparkSession, dir: String): DataFrame =
    graft.operators.Drift.tvdPpm(
      t(s, dir, "events").select(col("event_type"),
        (col("user_id") % 2 === 0).as("even_user")),
      "event_type", "even_user")

  /** q159: exact heavy hitters over the token stream — per-partition
    * Misra–Gries candidates, exact verified counts, support 1/200. */
  private def q159_heavy_hitters(s: SparkSession, dir: String): DataFrame =
    graft.operators.HeavyHitters.frequentItems(
      t(s, dir, "documents")
        .select(explode(graft.text.TextAnalysis.tokens(col("text"))).as("tok")),
      "tok", 200)

  /** q166: broadcast range-lookup join — price-tier banding through the
    * codegen binary-search expression, zero probe-side exchanges. */
  private def q166_range_lookup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val probe = t(s, dir, "orders").select(col("o_orderkey"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
    val ranges = Seq(
      (0L, 9999999L, "low"), (10000000L, 19999999L, "mid"),
      (20000000L, 29999999L, "high"), (30000000L, 99999999999L, "vip"))
      .toDF("lo", "hi", "tag")
    graft.operators.RangeLookup.lookupJoin(probe, "cents", ranges, "lo", "hi")
      .select(col("o_orderkey"), col("cents"), col("tag"))
  }

  /** q168: broadcast geofence lookup — synthetic lon/lat grid from event
    * values, three disjoint rectangular fences whose bounds sit OFF the
    * grid, ray-cast containment ≡ the oracle's BETWEEN bands. */
  private def q168_geofence(s: SparkSession, dir: String): DataFrame = {
    val pts = t(s, dir, "events").select(col("event_id"),
      (lit(-74.0) + pmod(floor(col("value")).cast("long"), lit(100L)) * 0.01)
        .as("lon"),
      (lit(40.0) + pmod(floor(col("value") * 10).cast("long"), lit(100L)) * 0.01)
        .as("lat"))
    val fences = Seq(
      ("downtown", Seq((-73.995, 40.095), (-73.745, 40.095),
        (-73.745, 40.395), (-73.995, 40.395))),
      ("harbor", Seq((-73.695, 40.095), (-73.445, 40.095),
        (-73.445, 40.395), (-73.695, 40.395))),
      ("uptown", Seq((-73.995, 40.595), (-73.445, 40.595),
        (-73.445, 40.895), (-73.995, 40.895))))
    graft.operators.GeoFence.fenceJoin(pts, "lon", "lat", fences)
      .select(col("event_id"), col("lon"), col("lat"), col("fence_tag"))
  }

  /** q170: 2-D skyline — orders no other order beats on BOTH total
    * price and recency. */
  private def q170_pareto(s: SparkSession, dir: String): DataFrame =
    graft.operators.Skyline.pareto2D(
      t(s, dir, "orders").select(col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        expr("unix_seconds(cast(o_orderdate as timestamp)) div 86400")
          .as("day")),
      "o_orderkey", "cents", "day")

  /** q175: per-source winsorized document lengths
    * ([[graft.operators.FeaturePrep.winsorize]]) — clip bounds are exact
    * rank statistics (⌈n/10⌉-th / ⌈9n/10⌉-th smallest), integer-only. */
  private def q175_winsorize(s: SparkSession, dir: String): DataFrame =
    graft.operators.FeaturePrep.winsorize(
      t(s, dir, "documents").select(
        col("doc_id"), col("source"), col("n_chars")),
      "source", "n_chars")

  /** q176: leave-one-out target encoding
    * ([[graft.operators.FeaturePrep.looEncode]]) of customer order value
    * in exact integer cents (scale 100). */
  private def q176_loo_encode(s: SparkSession, dir: String): DataFrame =
    graft.operators.FeaturePrep.looEncode(
      t(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents")),
      "o_custkey", "cents", scale = 100L)

  /** q177: KMV sketch overlap ([[graft.operators.KmvSketch]]) — per
    * event-type distinct active user-days and pairwise union/intersection
    * estimates, all deterministic (md5 hash order + one IEEE division per
    * estimate) so the SKETCH ESTIMATES themselves hash-compare. */
  private def q177_kmv_overlap(s: SparkSession, dir: String): DataFrame =
    graft.operators.KmvSketch.overlap(
      t(s, dir, "events").select(col("event_type"),
        (col("user_id") * 1000000L + expr("unix_seconds(ts) div 86400"))
          .as("elem")),
      "event_type", col("elem"), k = 64)

  /** q182: seasonal-baseline anomaly flags ([[graft.operators.Seasonal]])
    * — per-(type, hour-of-day) integer-mean baseline, residuals, and a
    * mean-absolute-deviation threshold; all exact integers. */
  private def q182_seasonal(s: SparkSession, dir: String): DataFrame =
    graft.operators.Seasonal.residuals(
      t(s, dir, "events"), "event_id", "event_type",
      hour(col("ts")), round(col("value") * 100), mult = 3)

  /** q183: k-anonymity + l-diversity audit ([[graft.operators.Anonymity]])
    * over (nation, segment) quasi-identifiers with account balance as
    * the sensitive attribute. */
  private def q183_k_anonymity(s: SparkSession, dir: String): DataFrame =
    graft.operators.Anonymity.audit(
      t(s, dir, "customer").select(col("c_nationkey"), col("c_mktsegment"),
        round(col("c_acctbal") * 100).cast("long").as("bal_cents")),
      Seq("c_nationkey", "c_mktsegment"), "bal_cents", k = 5, l = 3)

  /** q185: Z-order layout keys ([[graft.operators.Layout]]) — lineitem
    * co-clustered on (partkey, suppkey) at 8 bits/dim into 256 target
    * buckets, the Delta/Iceberg `ZORDER BY` rewrite shape for
    * two-sided data skipping. */
  private def q185_zorder(s: SparkSession, dir: String): DataFrame =
    graft.operators.Layout.zOrder(
        t(s, dir, "lineitem"),
        Seq(col("l_partkey"), col("l_suppkey")), bits = 8, buckets = 256)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("q0").as("qx"), col("q1").as("qy"), col("zkey"), col("bucket"))

  /** q191: count-min sketch ([[graft.operators.CmSketch]]) — part-key
    * frequencies through a 3×256 sketch, estimates vs exact counts
    * side by side (est ≥ exact is the sketch's one-sided contract,
    * and with md5 rows both engines build the identical sketch). */
  private def q191_cms(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val sketch = graft.operators.CmSketch.build(li, "l_partkey", 3, 256)
    val probes = li.where(col("l_partkey") <= 60)
    val exact = li.where(col("l_partkey") <= 60)
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("exact"))
    graft.operators.CmSketch.estimate(sketch, probes, "l_partkey", 3, 256)
      .join(exact, Seq("l_partkey"), "left")
      .select(col("l_partkey"), col("est"),
        coalesce(col("exact"), lit(0L)).as("exact"))
  }

  /** q192: HyperLogLog registers ([[graft.operators.HllSketch]]) —
    * the 64-register table over order customer keys; the registers
    * are the exact-integer deliverable, the float estimate is a
    * driver postprocess (spec-gated for accuracy). */
  private def q192_hll(s: SparkSession, dir: String): DataFrame =
    graft.operators.HllSketch.registers(t(s, dir, "orders"), "o_custkey", 6)

  /** q193: fixed-point EWMA ([[graft.operators.Ewma]]) — per-user
    * smoothed level of event values (cents), alpha = 300/1024. */
  private def q193_ewma(s: SparkSession, dir: String): DataFrame =
    graft.operators.Ewma.smooth(t(s, dir, "events"), "user_id",
      col("ts"), col("event_id"), round(col("value") * 100),
      alphaNum = 300, k = 10)

  private[graft] val queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "q54_salted_agg" -> (q54_salted_agg _),
    "q59_topk_agg" -> (q59_topk_agg _),
    "q107_hll_distinct" -> (q107_hll_distinct _),
    "q108_cms_heavy" -> (q108_cms_heavy _),
    "q109_bloom_join" -> (q109_bloom_join _),
    "q120_asof_join" -> (q120_asof_join _),
    "q124_salted_join" -> (q124_salted_join _),
    "q127_gap_fill" -> (q127_gap_fill _),
    "q130_profile" -> (q130_profile _),
    "q133_setsim_join" -> (q133_setsim_join _),
    "q135_scd2" -> (q135_scd2 _),
    "q137_sorted_neighborhood" -> (q137_sorted_neighborhood _),
    "q139_cdc_merge" -> (q139_cdc_merge _),
    "q143_expectations" -> (q143_expectations _),
    "q144_ivm" -> (q144_ivm _),
    "q149_containment" -> (q149_containment _),
    "q152_auc" -> (q152_auc _),
    "q153_ks_drift" -> (q153_ks_drift _),
    "q154_table_diff" -> (q154_table_diff _),
    "q155_tvd_drift" -> (q155_tvd_drift _),
    "q159_heavy_hitters" -> (q159_heavy_hitters _),
    "q166_range_lookup" -> (q166_range_lookup _),
    "q168_geofence" -> (q168_geofence _),
    "q170_pareto" -> (q170_pareto _),
    "q175_winsorize" -> (q175_winsorize _),
    "q176_loo_encode" -> (q176_loo_encode _),
    "q177_kmv_overlap" -> (q177_kmv_overlap _),
    "q182_seasonal" -> (q182_seasonal _),
    "q183_k_anonymity" -> (q183_k_anonymity _),
    "q185_zorder" -> (q185_zorder _),
    "q191_cms" -> (q191_cms _),
    "q192_hll" -> (q192_hll _),
    "q193_ewma" -> (q193_ewma _))

  private[graft] val oracleSql: ListMap[String, String] = ListMap(
    "q54_salted_agg" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q59_topk_agg" ->
      """SELECT o_custkey, o_orderkey, rk FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders
        |) WHERE rk <= 3""".stripMargin,
    // q107: full HLL restated — 60-bit md5 hash, top-10-bit bucket,
    // rho = 51 - bit_length of the 50-bit window (length(bin(w)) is the
    // portable bit-length), register = max(rho). All compared columns are
    // integral except est_raw, which uses ONLY IEEE basic ops on the
    // pre-folded alpha·m²·2^51 literal, so floor() agrees bit-exactly.
    "q107_hll_distinct" ->
      """WITH h AS (
        |  SELECT l_returnflag,
        |    ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)),1,15))::BIGINT AS h
        |  FROM lineitem
        |), parts AS (
        |  SELECT l_returnflag, h >> 50 AS bucket,
        |    CASE WHEN (h & ((1::BIGINT << 50) - 1)) = 0 THEN 51
        |         ELSE 51 - length(bin(h & ((1::BIGINT << 50) - 1))) END AS rho
        |  FROM h
        |), regs AS (
        |  SELECT l_returnflag, bucket, max(rho) AS reg FROM parts GROUP BY 1, 2
        |)
        |SELECT l_returnflag,
        |  count(*) AS n_present,
        |  CAST(sum(reg) AS BIGINT) AS sum_reg,
        |  CAST(sum(1::BIGINT << (51 - reg)) AS BIGINT) AS inv_sum,
        |  CAST(floor(1.7013287633207432e+21 /
        |    CAST(CAST(sum(1::BIGINT << (51 - reg)) AS BIGINT)
        |      + (1024 - count(*)) * (1::BIGINT << 51) AS DOUBLE)) AS BIGINT) AS est_raw
        |FROM regs GROUP BY l_returnflag""".stripMargin,
    // q108: count-min restated — 4 row-salted md5 hashes mod 1024,
    // counters = per-(row,bucket) occurrence counts, estimate = min over
    // the 4 rows. Counters are sums, so the whole sketch is
    // order-independent and integral.
    "q108_cms_heavy" ->
      """WITH occ AS (
        |  SELECT CAST(l_partkey AS VARCHAR) AS k FROM lineitem
        |), bk AS (
        |  SELECT g.r,
        |    ('0x' || substr(md5(CAST(g.r AS VARCHAR) || ':' || k),1,15))::BIGINT % 1024 AS bucket
        |  FROM occ, generate_series(0,3) g(r)
        |), sk AS (
        |  SELECT r, bucket, count(*) AS cnt FROM bk GROUP BY r, bucket
        |), cand AS (SELECT DISTINCT k FROM occ), cb AS (
        |  SELECT k, g.r,
        |    ('0x' || substr(md5(CAST(g.r AS VARCHAR) || ':' || k),1,15))::BIGINT % 1024 AS bucket
        |  FROM cand, generate_series(0,3) g(r)
        |)
        |SELECT cb.k AS key, min(sk.cnt) AS est
        |FROM cb JOIN sk ON sk.r = cb.r AND sk.bucket = cb.bucket
        |GROUP BY cb.k
        |HAVING min(sk.cnt) >= 60""".stripMargin,
    // q109: the bloom pruning is invisible to the result — the oracle is
    // the plain join it accelerates
    "q109_bloom_join" ->
      """SELECT l_orderkey, l_linenumber, o_custkey
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'""".stripMargin,
    // q120: DuckDB's native ASOF join states the semantics directly
    "q120_asof_join" ->
      """WITH c AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
        |), v AS (
        |  SELECT user_id, ts, event_id AS view_event_id,
        |    value AS view_value
        |  FROM events WHERE event_type = 'view'
        |)
        |SELECT c.event_id, c.user_id, c.ts, v.view_event_id, v.view_value
        |FROM c ASOF LEFT JOIN v
        |  ON c.user_id = v.user_id AND c.ts >= v.ts""".stripMargin,
    // q124: salting is invisible in the semantics — the oracle is the
    // PLAIN inner join
    "q124_salted_join" ->
      """SELECT p.p_brand, sum(l.l_quantity) AS sum_qty,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |GROUP BY p.p_brand""".stripMargin,
    // q127: the grid is users x 24 hours; the fill is native ASOF again
    "q127_gap_fill" ->
      """WITH u AS (
        |  SELECT DISTINCT user_id FROM events
        |), g AS (
        |  SELECT u.user_id, h.h AS hour,
        |    TIMESTAMP '2024-01-01 00:00:00' + h.h * INTERVAL 1 HOUR
        |      AS bucket_ts
        |  FROM u, generate_series(0, 23) h(h)
        |), b AS (
        |  SELECT user_id, ts, event_id AS last_event_id,
        |    value AS last_value
        |  FROM events
        |)
        |SELECT g.user_id, CAST(g.hour AS BIGINT) AS hour, g.bucket_ts,
        |  b.last_event_id, b.last_value
        |FROM g ASOF LEFT JOIN b
        |  ON g.user_id = b.user_id AND g.bucket_ts >= b.ts""".stripMargin,
    // q130: one UNION ALL block per profiled column
    "q130_profile" ->
      """SELECT 'o_orderkey' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(*) - count(o_orderkey) AS BIGINT) AS n_null,
        |  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
        |  CAST(min(o_orderkey) AS VARCHAR) AS min_s,
        |  CAST(max(o_orderkey) AS VARCHAR) AS max_s
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
        |  CAST(count(*) - count(o_orderstatus) AS BIGINT),
        |  CAST(count(DISTINCT o_orderstatus) AS BIGINT),
        |  min(o_orderstatus), max(o_orderstatus)
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderdate', CAST(count(*) AS BIGINT),
        |  CAST(count(*) - count(o_orderdate) AS BIGINT),
        |  CAST(count(DISTINCT o_orderdate) AS BIGINT),
        |  CAST(min(o_orderdate) AS VARCHAR), CAST(max(o_orderdate) AS VARCHAR)
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderpriority', CAST(count(*) AS BIGINT),
        |  CAST(count(*) - count(o_orderpriority) AS BIGINT),
        |  CAST(count(DISTINCT o_orderpriority) AS BIGINT),
        |  min(o_orderpriority), max(o_orderpriority)
        |FROM orders""".stripMargin,
    // q133: brute-force all-pairs Jaccard threshold join the prefix-
    // filtered plan must exactly equal (distinct word sets, J > 9/10)
    "q133_setsim_join" ->
      """WITH tok AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_filter(regexp_split_to_array(text, '[\s[:punct:]]+'), x -> len(x) > 0)) AS tok
        |  FROM documents
        |), sizes AS (
        |  SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id
        |), ix AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, CAST(count(*) AS BIGINT) AS inter
        |  FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT id1, id2, inter,
        |  CAST(sa.n + sb.n - inter AS BIGINT) AS uni
        |FROM ix JOIN sizes sa ON sa.doc_id = id1 JOIN sizes sb ON sb.doc_id = id2
        |WHERE 10 * inter > 9 * (sa.n + sb.n - inter)""".stripMargin,
    // q135: episode compression (state-change rows) + lead() upper bound;
    // ties broken by event_id exactly as the engine does
    "q135_scd2" ->
      """WITH o AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events
        |), st AS (
        |  SELECT user_id, event_type, ts, event_id FROM o
        |  WHERE prev IS NULL OR prev <> event_type
        |)
        |SELECT user_id, event_type, ts AS valid_from,
        |  coalesce(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
        |    TIMESTAMP '2200-01-01 00:00:00') AS valid_to
        |FROM st""".stripMargin,
    // q137: the textbook formulation (global row_number) IS the oracle;
    // the engine computes the same total (key, id) rank in parallel
    "q137_sorted_neighborhood" ->
      """WITH r AS (
        |  SELECT c_custkey AS id,
        |    row_number() OVER (ORDER BY lower(c_name), c_custkey) - 1 AS rank
        |  FROM customer
        |)
        |SELECT a.id AS id1, b.id AS id2, CAST(b.rank - a.rank AS BIGINT) AS dist
        |FROM r a JOIN r b ON b.rank > a.rank AND b.rank <= a.rank + 4""".stripMargin,
    // q139: latest-wins changelog fold; the window's full tie order
    // (seq, op, image DESC) is restated so the merge is deterministic
    "q139_cdc_merge" ->
      """WITH ch AS (
        |  SELECT o_custkey AS c_custkey,
        |    'cust-' || CAST(o_orderkey AS VARCHAR) AS c_name,
        |    o_orderkey % 25 AS c_nationkey, o_orderkey AS seq,
        |    CASE WHEN o_orderkey % 7 = 0 THEN 'delete' ELSE 'upsert' END AS op
        |  FROM orders
        |), latest AS (
        |  SELECT c_custkey, c_name, c_nationkey, op FROM (
        |    SELECT ch.*, row_number() OVER (PARTITION BY c_custkey
        |      ORDER BY seq DESC, op DESC, c_name DESC, c_nationkey DESC) AS rn
        |    FROM ch) WHERE rn = 1
        |)
        |SELECT c_custkey,
        |  CASE WHEN l.op = 'upsert' THEN l.c_name ELSE s.c_name END AS c_name,
        |  CASE WHEN l.op = 'upsert' THEN l.c_nationkey ELSE s.c_nationkey END AS c_nationkey
        |FROM (SELECT c_custkey, c_name, c_nationkey FROM customer) s
        |FULL OUTER JOIN latest l USING (c_custkey)
        |WHERE l.op IS NULL OR l.op = 'upsert'""".stripMargin,
    // q143: every expectation metric restated as one aggregate + unpivot
    "q143_expectations" ->
      """WITH a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS total,
        |    CAST(sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v0,
        |    CAST(count(c_custkey) - count(DISTINCT c_custkey) AS BIGINT) AS v1,
        |    CAST(sum(CASE WHEN c_acctbal IS NOT NULL AND (c_acctbal < -999.99 OR c_acctbal > 9999.99) THEN 1 ELSE 0 END) AS BIGINT) AS v2,
        |    CAST(sum(CASE WHEN c_nationkey IS NOT NULL AND (c_nationkey < 0 OR c_nationkey > 24) THEN 1 ELSE 0 END) AS BIGINT) AS v3,
        |    CAST(sum(CASE WHEN c_mktsegment IS NOT NULL AND c_mktsegment NOT IN ('AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY') THEN 1 ELSE 0 END) AS BIGINT) AS v4
        |  FROM customer
        |), u AS (
        |  SELECT 'not_null' AS expectation, 'c_name' AS col_name, v0 AS violations, total FROM a
        |  UNION ALL SELECT 'unique', 'c_custkey', v1, total FROM a
        |  UNION ALL SELECT 'in_range', 'c_acctbal', v2, total FROM a
        |  UNION ALL SELECT 'in_range', 'c_nationkey', v3, total FROM a
        |  UNION ALL SELECT 'accepted_values', 'c_mktsegment', v4, total FROM a
        |)
        |SELECT expectation, col_name, violations, total,
        |  CAST((1000000 * violations) // total AS BIGINT) AS violation_ppm,
        |  CAST(0 AS BIGINT) AS budget_ppm,
        |  (1000000 * violations) <= 0 * total AS passed
        |FROM u""".stripMargin,
    // q144: the oracle aggregates the final row set directly —
    // (base \ deleted) ∪ inserted — proving delta-merge ≡ recompute
    "q144_ivm" ->
      """WITH rows_final AS (
        |  SELECT o_custkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders
        |  WHERE (o_orderkey % 3 <> 0 AND o_orderkey % 7 <> 0)
        |     OR o_orderkey % 3 = 0
        |)
        |SELECT o_custkey, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(cents) AS BIGINT) AS cents
        |FROM rows_final GROUP BY o_custkey""".stripMargin,
    // q149: brute-force directional containment the prefix-filtered
    // plan must equal exactly
    "q149_containment" ->
      """WITH tok AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_filter(regexp_split_to_array(text, '[\s[:punct:]]+'), x -> len(x) > 0)) AS tok
        |  FROM documents
        |), sizes AS (
        |  SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id
        |), ix AS (
        |  SELECT a.doc_id AS id_small, b.doc_id AS id_big,
        |    CAST(count(*) AS BIGINT) AS inter
        |  FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id <> b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT id_small, id_big, inter, CAST(s.n AS BIGINT) AS n_small
        |FROM ix JOIN sizes s ON s.doc_id = id_small
        |WHERE 5 * inter > 4 * s.n""".stripMargin,
    // q152: the doubled tie-averaged rank identity verbatim
    "q152_auc" ->
      """WITH hist AS (
        |  SELECT n_chars AS s, CAST(count(*) AS BIGINT) AS cnt,
        |    CAST(sum(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_pos
        |  FROM documents GROUP BY n_chars
        |), ranked AS (
        |  SELECT s, cnt, cnt_pos,
        |    (sum(cnt) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - cnt) * 2 + cnt + 1 AS rank2
        |  FROM hist
        |)
        |SELECT CAST(sum(cnt_pos) AS BIGINT) AS n_pos,
        |  CAST(sum(cnt) - sum(cnt_pos) AS BIGINT) AS n_neg,
        |  CAST((1000000 * (sum(cnt_pos * rank2) - sum(cnt_pos) * (sum(cnt_pos) + 1)))
        |    // (2 * sum(cnt_pos) * (sum(cnt) - sum(cnt_pos))) AS BIGINT) AS auc_ppm
        |FROM ranked""".stripMargin,
    // q153: the scaled KS numerator max|cum1*n2 - cum2*n1| verbatim
    "q153_ks_drift" ->
      """WITH hist AS (
        |  SELECT CAST(round(value * 100) AS BIGINT) AS v,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS c2
        |  FROM events GROUP BY 1
        |), cum AS (
        |  SELECT v, c1, c2,
        |    sum(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
        |    sum(c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2
        |  FROM hist
        |), t AS (SELECT sum(c1) AS n1, sum(c2) AS n2 FROM hist)
        |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
        |  CAST(max(abs(cum1 * n2 - cum2 * n1)) AS BIGINT) AS d_num,
        |  CAST((1000000 * max(abs(cum1 * n2 - cum2 * n1))) // (n1 * n2) AS BIGINT) AS d_ppm
        |FROM cum, t GROUP BY n1, n2""".stripMargin,
    // q154: the q139 merge restated, then a null-safe full-outer
    // classification (IS DISTINCT FROM == the engine's null-tagged hash)
    "q154_table_diff" ->
      """WITH ch AS (
        |  SELECT o_custkey AS c_custkey,
        |    'cust-' || CAST(o_orderkey AS VARCHAR) AS c_name,
        |    o_orderkey % 25 AS c_nationkey, o_orderkey AS seq,
        |    CASE WHEN o_orderkey % 7 = 0 THEN 'delete' ELSE 'upsert' END AS op
        |  FROM orders
        |), latest AS (
        |  SELECT c_custkey, c_name, c_nationkey, op FROM (
        |    SELECT ch.*, row_number() OVER (PARTITION BY c_custkey
        |      ORDER BY seq DESC, op DESC, c_name DESC, c_nationkey DESC) AS rn
        |    FROM ch) WHERE rn = 1
        |), merged AS (
        |  SELECT c_custkey,
        |    CASE WHEN l.op = 'upsert' THEN l.c_name ELSE s.c_name END AS c_name,
        |    CASE WHEN l.op = 'upsert' THEN l.c_nationkey ELSE s.c_nationkey END AS c_nationkey
        |  FROM (SELECT c_custkey, c_name, c_nationkey FROM customer) s
        |  FULL OUTER JOIN latest l USING (c_custkey)
        |  WHERE l.op IS NULL OR l.op = 'upsert'
        |)
        |SELECT c_custkey,
        |  CASE WHEN bef_present IS NULL THEN 'added'
        |       WHEN aft_present IS NULL THEN 'removed'
        |       WHEN bef.c_name IS NOT DISTINCT FROM aft.c_name
        |        AND bef.c_nationkey IS NOT DISTINCT FROM aft.c_nationkey
        |         THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM (SELECT c_custkey, c_name, c_nationkey, TRUE AS bef_present
        |      FROM customer) bef
        |FULL OUTER JOIN (SELECT merged.*, TRUE AS aft_present FROM merged) aft
        |USING (c_custkey)""".stripMargin,
    // q155: Σ|c1·n2 − c2·n1| / (2·n1·n2) verbatim
    "q155_tvd_drift" ->
      """WITH hist AS (
        |  SELECT event_type AS v,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS c2
        |  FROM events GROUP BY 1
        |), t AS (SELECT sum(c1) AS n1, sum(c2) AS n2 FROM hist)
        |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
        |  CAST((1000000 * sum(abs(c1 * n2 - c2 * n1))) // (2 * n1 * n2) AS BIGINT) AS tvd_ppm
        |FROM hist, t GROUP BY n1, n2""".stripMargin,
    // q159: exact heavy hitters — plain GROUP BY + integer HAVING; the
    // engine's MG candidate pass changes cost, never the answer
    "q159_heavy_hitters" ->
      """WITH v AS (
        |  SELECT unnest(list_filter(regexp_split_to_array(text, '[\s[:punct:]]+'),
        |    x -> len(x) > 0)) AS value
        |  FROM documents
        |), tot AS (SELECT count(*) AS n FROM v)
        |SELECT value, count(*) AS cnt
        |FROM v CROSS JOIN tot
        |GROUP BY value, n
        |HAVING count(*) * 200 >= n""".stripMargin,
    // q166: the banding theta-join the broadcast binary search replaces
    "q166_range_lookup" ->
      """WITH r(lo, hi, tag) AS (
        |  VALUES (0, 9999999, 'low'), (10000000, 19999999, 'mid'),
        |         (20000000, 29999999, 'high'), (30000000, 99999999999, 'vip')
        |), p AS (
        |  SELECT o_orderkey,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders
        |)
        |SELECT p.o_orderkey, p.cents, r.tag
        |FROM p LEFT JOIN r ON p.cents >= r.lo AND p.cents <= r.hi""".stripMargin,
    // q168: rectangle fences restated as BETWEEN bands (bounds sit off
    // the synthetic grid, so ray-cast strictness never shows)
    "q168_geofence" ->
      """WITH p AS (
        |  SELECT event_id,
        |    -74.0 + (CAST(floor(value) AS BIGINT) % 100) * 0.01 AS lon,
        |    40.0 + (CAST(floor(value * 10) AS BIGINT) % 100) * 0.01 AS lat
        |  FROM events
        |)
        |SELECT event_id, lon, lat,
        |  CASE
        |    WHEN lon BETWEEN -73.995 AND -73.745
        |     AND lat BETWEEN 40.095 AND 40.395 THEN 'downtown'
        |    WHEN lon BETWEEN -73.695 AND -73.445
        |     AND lat BETWEEN 40.095 AND 40.395 THEN 'harbor'
        |    WHEN lon BETWEEN -73.995 AND -73.445
        |     AND lat BETWEEN 40.595 AND 40.895 THEN 'uptown'
        |    ELSE NULL
        |  END AS fence_tag
        |FROM p""".stripMargin,
    // q170: the same two windows over the raw table — the engine's
    // local prefilter changes cost, never the set
    "q170_pareto" ->
      """WITH b AS (
        |  SELECT o_orderkey,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |    CAST(epoch(o_orderdate) // 86400 AS BIGINT) AS day
        |  FROM orders
        |), wins AS (
        |  SELECT o_orderkey, cents, day,
        |    max(day) OVER (ORDER BY cents DESC
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mx_gt,
        |    max(day) OVER (PARTITION BY cents) AS mx_eq
        |  FROM b
        |)
        |SELECT o_orderkey, cents, day FROM wins
        |WHERE (mx_gt IS NULL OR mx_gt < day) AND mx_eq = day""".stripMargin,
    // q175: winsorization at exact integer rank cut points
    "q175_winsorize" ->
      """WITH r AS (
        |  SELECT doc_id, source, n_chars,
        |    row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rn,
        |    count(*) OVER (PARTITION BY source) AS n
        |  FROM documents
        |), b AS (
        |  SELECT source,
        |    max(CASE WHEN rn = greatest(1, (n * 1 + 9) // 10) THEN n_chars END) AS lo,
        |    max(CASE WHEN rn = greatest(1, (n * 9 + 9) // 10) THEN n_chars END) AS hi
        |  FROM r GROUP BY source
        |)
        |SELECT d.source, d.doc_id, d.n_chars, b.lo, b.hi,
        |  least(greatest(d.n_chars, b.lo), b.hi) AS clipped
        |FROM documents d JOIN b USING (source)""".stripMargin,
    // q176: leave-one-out mean in integer cents (scale 100); singleton
    // groups fall back to the leave-one-out GLOBAL mean
    "q176_loo_encode" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders
        |), g AS (
        |  SELECT o_custkey, sum(cents) AS gs, count(*) AS gn
        |  FROM o GROUP BY o_custkey
        |), t AS (SELECT sum(gs) AS ts, sum(gn) AS tn FROM g)
        |SELECT o.o_custkey, o.o_orderkey, o.cents,
        |  CAST(CASE WHEN gn > 1 THEN ((gs - cents) * 100) // (gn - 1)
        |       ELSE ((ts - cents) * 100) // (tn - 1) END AS BIGINT) AS enc
        |FROM o JOIN g USING (o_custkey), t""".stripMargin,
    // q177: full KMV pipeline restated — 60-bit md5 hashes, k smallest
    // distinct per group (window form at oracle scale), merged re-cut
    // union sketches, floor of one double division per estimate
    "q177_kmv_overlap" ->
      """WITH el AS (
        |  SELECT event_type AS g,
        |    user_id * 1000000 + CAST(epoch(ts) AS BIGINT) // 86400 AS e
        |  FROM events
        |), h AS (
        |  SELECT DISTINCT g,
        |    ('0x' || substr(md5(CAST(e AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM el
        |), rk AS (
        |  SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn,
        |    count(*) OVER (PARTITION BY g) AS sz
        |  FROM h
        |), sk AS (SELECT g, h, rn, sz FROM rk WHERE rn <= 64
        |), st AS (
        |  SELECT g, least(sz, 64) AS sksz,
        |    max(CASE WHEN rn = 64 THEN h END) AS hk
        |  FROM sk GROUP BY g, sz
        |), est AS (
        |  SELECT g, CASE WHEN sksz < 64 THEN sksz
        |    ELSE CAST(floor(63 * CAST(1152921504606846976 AS DOUBLE) / hk) AS BIGINT)
        |    END AS est_n
        |  FROM st
        |), pr AS (SELECT a.g AS ga, b.g AS gb FROM st a JOIN st b ON a.g < b.g
        |), uh AS (
        |  SELECT DISTINCT pr.ga, pr.gb, sk.h
        |  FROM pr JOIN sk ON sk.g = pr.ga OR sk.g = pr.gb
        |), ur AS (
        |  SELECT ga, gb, h, row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS rn,
        |    count(*) OVER (PARTITION BY ga, gb) AS usz
        |  FROM uh
        |), us AS (
        |  SELECT ga, gb, least(min(usz), 64) AS usksz,
        |    max(CASE WHEN rn = 64 THEN h END) AS hk
        |  FROM ur WHERE rn <= 64 GROUP BY ga, gb
        |), ue AS (
        |  SELECT ga, gb, CASE WHEN usksz < 64 THEN usksz
        |    ELSE CAST(floor(63 * CAST(1152921504606846976 AS DOUBLE) / hk) AS BIGINT)
        |    END AS est_union
        |  FROM us
        |)
        |SELECT ga AS type_a, gb AS type_b, ea.est_n AS est_a, eb.est_n AS est_b,
        |  est_union, greatest(0, ea.est_n + eb.est_n - est_union) AS est_inter
        |FROM ue JOIN est ea ON ea.g = ga JOIN est eb ON eb.g = gb""".stripMargin,
    // q182: integer-mean hourly baseline, residuals, meanAD threshold
    "q182_seasonal" ->
      """WITH obs AS (
        |  SELECT event_id, event_type, CAST(hour(ts) AS BIGINT) AS slot,
        |    CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events
        |), prof AS (
        |  SELECT event_type, slot, CAST(sum(v) // count(*) AS BIGINT) AS baseline
        |  FROM obs GROUP BY event_type, slot
        |), sc AS (
        |  SELECT o.event_id, o.event_type, o.slot, o.v, p.baseline,
        |    o.v - p.baseline AS residual
        |  FROM obs o JOIN prof p USING (event_type, slot)
        |), sp AS (
        |  SELECT event_type,
        |    CAST(sum(abs(residual)) // count(*) AS BIGINT) AS mean_ad
        |  FROM sc GROUP BY event_type
        |)
        |SELECT sc.event_id, sc.event_type, sc.slot, sc.v, sc.baseline,
        |  CAST(sc.residual AS BIGINT) AS residual,
        |  CASE WHEN abs(sc.residual) > sp.mean_ad * 3 THEN 1 ELSE 0 END
        |    AS is_anomaly
        |FROM sc JOIN sp USING (event_type)""".stripMargin,
    // q183: quasi-identifier group sizes + sensitive diversity
    "q183_k_anonymity" ->
      """WITH c AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
        |  FROM customer
        |)
        |SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(DISTINCT bal_cents) AS BIGINT) AS n_sensitive,
        |  CASE WHEN count(*) >= 5 THEN 1 ELSE 0 END AS k_anonymous,
        |  CASE WHEN count(DISTINCT bal_cents) >= 3 THEN 1 ELSE 0 END
        |    AS l_diverse
        |FROM c GROUP BY c_nationkey, c_mktsegment""".stripMargin,
    // q185: Morton interleave restated as explicit shift-and-mask sums
    "q185_zorder" -> {
      val z = (0 until 8).map(i =>
        s"((qx >> $i) & 1) * ${1L << (2 * i + 1)}" +
          s" + ((qy >> $i) & 1) * ${1L << (2 * i)}").mkString(" + ")
      s"""WITH mm AS (
         |  SELECT min(l_partkey) AS nx, max(l_partkey) AS xx,
         |         min(l_suppkey) AS ny, max(l_suppkey) AS xy FROM lineitem
         |), q AS (
         |  SELECT l_orderkey, l_linenumber,
         |    CAST(((l_partkey - nx) * 256) // (xx - nx + 1) AS BIGINT) AS qx,
         |    CAST(((l_suppkey - ny) * 256) // (xy - ny + 1) AS BIGINT) AS qy
         |  FROM lineitem, mm
         |)
         |SELECT l_orderkey, l_linenumber, qx, qy,
         |  CAST($z AS BIGINT) AS zkey,
         |  CAST(($z) // 256 AS BIGINT) AS bucket
         |FROM q""".stripMargin
    },
    // q191: the identical md5-derived sketch rebuilt cell by cell
    "q191_cms" ->
      """WITH cells AS (
        |  SELECT j, ('0x' || substr(md5(CAST(j AS VARCHAR) || ':'
        |      || CAST(l_partkey AS VARCHAR)), 1, 15))::BIGINT % 256
        |    AS bucket
        |  FROM lineitem, (SELECT unnest([0, 1, 2]) AS j)
        |), sk AS (
        |  SELECT j, bucket, CAST(count(*) AS BIGINT) AS cnt
        |  FROM cells GROUP BY 1, 2
        |), probes AS (
        |  SELECT DISTINCT l_partkey AS key FROM lineitem
        |  WHERE l_partkey <= 60
        |), pb AS (
        |  SELECT key, j, ('0x' || substr(md5(CAST(j AS VARCHAR) || ':'
        |      || CAST(key AS VARCHAR)), 1, 15))::BIGINT % 256 AS bucket
        |  FROM probes, (SELECT unnest([0, 1, 2]) AS j)
        |), est AS (
        |  SELECT key, CAST(min(coalesce(cnt, 0)) AS BIGINT) AS est
        |  FROM pb LEFT JOIN sk USING (j, bucket) GROUP BY key
        |), exact AS (
        |  SELECT l_partkey AS key, CAST(count(*) AS BIGINT) AS exact
        |  FROM lineitem GROUP BY 1
        |)
        |SELECT est.key AS l_partkey, est, coalesce(exact, 0) AS exact
        |FROM est LEFT JOIN exact USING (key)""".stripMargin,
    // q192: bucket/suffix split of the 60-bit md5 prefix; rho via bin()
    "q192_hll" ->
      """WITH h AS (
        |  SELECT ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))
        |    ::BIGINT AS h
        |  FROM orders
        |)
        |SELECT CAST(h % 64 AS BIGINT) AS bucket,
        |  CAST(max(CASE WHEN h // 64 = 0 THEN 55
        |    ELSE 55 - length(bin(h // 64)) END) AS BIGINT) AS max_rho
        |FROM h GROUP BY 1""".stripMargin,
    // q193: the same integer recurrence as a list_reduce fold (DuckDB
    // seeds the accumulator with the first element = s_0 = v_0)
    "q193_ewma" ->
      """WITH obs AS (
        |  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS v,
        |    ts, event_id
        |  FROM events
        |)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_obs,
        |  CAST(list_reduce(list(v ORDER BY ts, event_id),
        |    (acc, x) -> (300 * x + 724 * acc) // 1024) AS BIGINT) AS ewma
        |FROM obs GROUP BY user_id""".stripMargin
  )
}
