package graft

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

/** Driver contract — every operator from SURVEY.md §2 exposed as a named
  * query over the driver's parquet tables, each paired (where ANSI-SQL
  * expressible) with a DuckDB oracle in [[oracleSql]].
  *
  * Determinism rules used throughout (so DuckDB hash-compare is stable):
  * output columns are integers, strings, or doubles that are either read
  * unmodified from parquet or exact-integer-valued; float math appears only
  * in predicates with safe margins; every computed column is aliased
  * identically here and in the oracle SQL.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Flagship query on sf=0.001; driver smoke-checks rows>0.
    * Pricing-summary style aggregate with an exact-cents revenue sum. */
  def entry(spark: SparkSession): DataFrame =
    q01_agg(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- queries

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

  /** Q9/G2: transitive closure by semi-naive fixpoint iteration. */
  private def q13_closure(s: SparkSession, dir: String): DataFrame = {
    val sup = t(s, dir, "supplier").select(
      concat(lit("S"), col("s_suppkey").cast("string")).as("src"),
      concat(lit("N"), col("s_nationkey").cast("string")).as("dst"))
    val nat = t(s, dir, "nation").select(
      concat(lit("N"), col("n_nationkey").cast("string")).as("src"),
      concat(lit("R"), col("n_regionkey").cast("string")).as("dst"))
    GraphOps.transitiveClosure(sup.union(nat))
  }

  /** G1: connected components (min-label + pointer jumping) over per-user
    * event chains; isolated events keep their own id as component. */
  private def q14_components(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val edges = ev.withColumn("prev", lag(col("event_id"), 1).over(w))
      .where(col("prev").isNotNull)
      .select(col("prev").as("src"), col("event_id").as("dst"))
    GraphOps.connectedComponents(edges,
        vertices = Some(ev.select(col("event_id").as("id"))))
      .select(col("id").as("event_id"), col("component"))
  }

  /** J4: inverse-functional-property pairs (shared (brand,size) ⇒ same). */
  private def q15_ifp_pairs(s: SparkSession, dir: String): DataFrame =
    Resolution.ifpPairs(t(s, dir, "part"), Seq("p_brand", "p_size"), "p_partkey")

  /** Dedup (exact): hash-group identical texts, keep min doc_id. */
  private def q16_dedup_exact(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(t(s, dir, "documents"), "text", "doc_id")

  /** Text analysis: exact token counts (whitespace/punct tokenizer). */
  private def q17_token_count(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n_tokens"))

  /** Text fingerprinting: md5 of normalized text (exact string). */
  private def q18_fingerprint(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))

  /** Dedup (n-gram Jaccard, exact): word-2-shingles, integer-exact
    * threshold jaccard > 1/3. */
  private def q19_ngram_jaccard(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(t(s, dir, "documents"), "text", "doc_id",
      k = 2, num = 1, den = 3)

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

  /** Similarity search: exact brute-force cosine top-1 for a probe set. */
  private def q21_ann_top1(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Ann.bruteForceTopK(emb, emb.where(col("vec_id") < 100), "vec_id", "embedding", k = 1)
      .select(col("probe_id"), col("neighbor_id"))
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

  /** Dedup (MinHash+LSH): banded signatures, candidates verified with
    * exact Jaccard. The verified output is exact; the banding only
    * bounds RECALL — and on this corpus (planted near-dups carry high
    * Jaccard, so every true pair collides in some band) recall is 1, so
    * the oracle states the FULL exact-Jaccard pair set (q19's). The
    * hash-compare therefore also guards the banding's recall: a silent
    * recall loss now fails the gate instead of hiding in a rows-only
    * count. */
  private def q25_minhash_lsh(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashLshPairs(t(s, dir, "documents"), "text", "doc_id",
      k = 2, numHashes = 32, bands = 8, num = 1, den = 3)

  /** Dedup (SimHash): 60-bit md5-family fingerprint, combinatorially
    * chunk-blocked Hamming pairs. Blocking guarantees full recall at
    * hamming <= maxHamming and verification is exact, so the output is
    * EXACTLY the Hamming ball — and with the md5 hash family the oracle
    * restates the whole fingerprint pipeline in SQL (DuckDB md5 + bit
    * ops) and hash-compares it. chunks pinned to the ≤500k-doc table
    * entry (what auto-detection picks at every driver SF) to skip the
    * sizing count on the bench path; the auto table and the xxhash64
    * family are exercised by DedupStrategySpec and the 500k probe. */
  private def q26_simhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairsMd5(t(s, dir, "documents"), "text", "doc_id", maxHamming = 3,
      chunks = 4)

  /** Embedding near-dup: cosine-threshold pairs (exact, margin-safe). */
  private def q27_cosine_pairs(s: SparkSession, dir: String): DataFrame =
    Ann.thresholdPairs(t(s, dir, "embeddings"), "vec_id", "embedding", 0.4)

  /** A3: IDF table over documents (log on exact ints; round to 9 places). */
  private def q28_idf(s: SparkSession, dir: String): DataFrame =
    Resolution.idf(t(s, dir, "documents"), "text", "doc_id")
      .select(col("tok"), col("df"), round(col("idf"), 9).as("idf"))

  /** A6: histogram — 10-minute event-time buckets (exact bucket index). */
  private def q29_histogram(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy((floor(unix_seconds(col("ts")) / 600L) * 600L).as("bucket_start"))
      .agg(count(lit(1)).as("n"), sum(round(col("value") * 100).cast("long")).as("value_cents"))

  /** J3: token-blocking similarity candidates over part names; tokens in
    * more than 20% of rows are pruned (the IDF/skew guard), so candidate
    * fan-out stays bounded as data grows. Exact semantics → SQL oracle. */
  private def q30_token_blocking(s: SparkSession, dir: String): DataFrame =
    Resolution.tokenBlockingCandidatesFrac(t(s, dir, "part"), "p_name", "p_partkey",
      maxDocFreqFraction = 0.2, maxBlockSize = Some(100))

  // ------------------------------------------------------------- RDF layer

  import graft.rdf.{Bgp, QuadStore, TpchQuads}
  import graft.rdf.Bgp.Pattern

  /** Q1/Q2: BGP chain over the quad view — customer name + nation name via
    * a 3-pattern join (the AgentMatchEnricher query shape). */
  private def q31_bgp(s: SparkSession, dir: String): DataFrame = {
    val quads = TpchQuads.quads(s, dir)
    Bgp.bgp(quads,
        Pattern("?c", "name", "?cname"),
        Pattern("?c", "nation", "?nat"),
        Pattern("?nat", "name", "?nname"))
      .select(col("c"), col("cname"), col("nname"))
  }

  /** Q3: OPTIONAL — all customers, left-joined to their orders; count
    * matched orders per customer (nulls count 0). */
  private def q32_optional(s: SparkSession, dir: String): DataFrame = {
    val quads = TpchQuads.quads(s, dir)
    val custs = Bgp.bgp(quads, Pattern("?c", "name", "?cname", g = Some("customer")))
    Bgp.optional(custs, quads, Pattern("?o", "cust", "?c"), Pattern("?o", "status", "F"))
      .groupBy(col("c"), col("cname"))
      .agg(count(col("o")).as("n_f_orders"))
  }

  /** Q11: GRAPH scoping — count statements per named graph. */
  private def q33_graph_count(s: SparkSession, dir: String): DataFrame =
    TpchQuads.quads(s, dir).groupBy(col("g")).agg(count(lit(1)).as("n"))

  /** W6/T2: replace-graph diff — old customer graph vs a new version where
    * customers of nations 0-11 changed segment case; added/removed tagged. */
  private def q34_store_diff(s: SparkSession, dir: String): DataFrame = {
    val old = TpchQuads.quads(s, dir)
    val cust = t(s, dir, "customer")
    val newSeg = cust.select(
      concat(lit("c:"), col("c_custkey").cast("string")).as("s"),
      lit("segment").as("p"),
      when(col("c_nationkey") < 12, lower(col("c_mktsegment")))
        .otherwise(col("c_mktsegment")).as("o"),
      lit(graft.rdf.Quad.LITERAL).as("oKind"),
      lit(null).cast("string").as("oDt"),
      lit(null).cast("string").as("oLang"),
      lit("customer").as("g"))
    val newGraph = old.where(col("g") === "customer" && col("p") =!= "segment")
      .unionByName(newSeg)
    val d = QuadStore.replaceGraphDiff(old, newGraph, "customer")
    d.added.select(col("s"), col("p"), col("o"), lit("added").as("op"))
      .union(d.removed.select(col("s"), col("p"), col("o"), lit("removed").as("op")))
  }

  /** J5: negation guard — inserting name quads is suppressed where a
    * negation statement exists (here: customers with custkey % 10 = 0). */
  private def q35_negation_guard(s: SparkSession, dir: String): DataFrame = {
    val quads = TpchQuads.quads(s, dir)
    val toAdd = quads.where(col("g") === "customer" && col("p") === "name")
    val negations = toAdd.where(expr("CAST(substr(s, 3) AS BIGINT) % 10 = 0"))
      .select(col("s"), col("p"), col("o"))
    QuadStore.guardAgainstNegations(toAdd, negations).select(col("s"), col("o"))
  }

  /** A5: primary-facet election — per nation, the customer with the most
    * orders (argmax via row_number; deterministic custkey tiebreak). */
  private def q36_primary_facet(s: SparkSession, dir: String): DataFrame = {
    val quads = TpchQuads.quads(s, dir)
    val counts = Bgp.bgp(quads,
        Pattern("?o", "cust", "?c"),
        Pattern("?c", "nation", "?nat"))
      .groupBy(col("nat"), col("c"))
      .agg(count(lit(1)).as("n_orders"))
    val w = Window.partitionBy(col("nat")).orderBy(col("n_orders").desc, col("c"))
    counts.withColumn("rk", row_number().over(w)).where(col("rk") === 1)
      .select(col("nat"), col("c").as("primary_c"), col("n_orders"))
  }

  /** Q4 over quads: UNION of two binding sets with var padding. */
  private def q37_bgp_union(s: SparkSession, dir: String): DataFrame = {
    val quads = TpchQuads.quads(s, dir)
    val f = Bgp.bgp(quads, Pattern("?o", "status", "F"), Pattern("?o", "cust", "?c"))
    val p = Bgp.bgp(quads, Pattern("?o", "priority", "1-URGENT"))
    Bgp.union(f, p).groupBy(col("c")).agg(count(lit(1)).as("n"))
  }

  // ---------------------------------------------------------------- spatial

  /** Synthetic lat/lon derived deterministically from events (the test data
    * has no GPS traces): 4 distinct "places" per the value bucket. */
  private def eventsAsObservations(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select(
      col("event_id"), col("user_id").as("user"), col("ts"),
      (lit(40.0) + floor(col("value") / 50) * 0.05).as("lat"),
      (lit(-74.0) + floor(col("value") / 50) * 0.05).as("lon"),
      lit(25.0).as("accuracy"))

  /** F3: codegen'd haversine expression in a margin-safe predicate. */
  private def q38_haversine(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GeoTimeFunctions.register(s)
    eventsAsObservations(s, dir)
      .where(graft.functions.GeoTimeFunctions.haversineMeters(
        col("lat"), col("lon"), lit(40.0), lit(-74.0)) < 9000.0)
      .select(col("event_id"))
  }

  /** A8/A9: time-sequential stay extraction, full output. Oracle-stated
    * like q58 (gaps-and-islands reduction on this geometry) extended to
    * the centroid columns: every island observation shares one site
    * coordinate with uniform accuracy, so the incremental Gaussian merge
    * returns that coordinate up to running-mean rounding — `(x·W + x·w)
    * / (W+w)` re-rounds per step, drifting ≤ a few ulp (≪ 1e-9°, i.e.
    * ≲ 0.1 µm) — and a 6-decimal round (0.1 m grid) restores the site
    * coordinate exactly on both engines (pinned by StaySpec's
    * centroid-rounding case). */
  private def q39_stays(s: SparkSession, dir: String): DataFrame =
    graft.spatial.StayExtraction.extractStaysDf(
        eventsAsObservations(s, dir), minStayMs = 10L * 60 * 1000)
      .select(col("user"), col("start_ms"), col("end_ms"),
        round(col("lat"), 6).as("lat"), round(col("lon"), 6).as("lon"),
        col("n_obs"))

  /** J1+J2: event-stay interval+distance matching over the extracted
    * stays. Oracle-stated end-to-end: on this geometry the stays are
    * q58's gaps-and-islands, the 1000 m distance gate reduces to site
    * equality (sites are ~5 km apart, a stay centroid of identical
    * coordinates is exact), and the overlap predicate/ratio are exact
    * integer epoch arithmetic restated verbatim (timestamp comparison at
    * micros, ratio on floor-second endpoints — identical IEEE division
    * in both engines). */
  private def q40_event_stay_match(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GeoTimeFunctions.register(s)
    val stays = q39_stays(s, dir).select(
      concat(col("user"), lit("_"), col("start_ms")).as("stay_id"),
      timestamp_millis(col("start_ms")).as("s_start"),
      timestamp_millis(col("end_ms")).as("s_end"),
      col("lat").as("s_lat"), col("lon").as("s_lon"))
    val events = eventsAsObservations(s, dir).select(
      col("event_id"), col("ts").as("e_start"),
      (col("ts") + expr("INTERVAL 30 MINUTES")).as("e_end"),
      col("lat").as("e_lat"), col("lon").as("e_lon"))
    graft.enrich.EventStayMatch.matchEvents(events, stays, bucketSeconds = 3600)
      .select(col("event_id"), col("stay_id"))
  }

  // ----------------------------------------------- resolution / inference

  /** J3+F9+F10+G6: full fuzzy agent matching over part names. At threshold
    * 0.999 only identical (lowercased) names survive: a pair differing in
    * one token scores at most idf_shared²/(idf²+idf_min²) — bounded well
    * under 0.999 — while identical token sets score exactly 1. The oracle
    * states that fixpoint directly; the operator still runs the whole
    * block → align (Hungarian) → soft-TF-IDF path. */
  private def q41_agent_match(s: SparkSession, dir: String): DataFrame =
    graft.enrich.AgentMatch.sameAsPairs(
        t(s, dir, "part"), "p_partkey", "p_name",
        threshold = 0.999, maxDocFreqFraction = 0.25,
        maxBlockSize = Some(200))
      .select(col("id1"), col("id2"))

  /** G3: forward-chaining inference — inverseOf + symmetric rules over the
    * orders 'cust' predicate (linear output, SQL-stated oracle). */
  private def q42_inference(s: SparkSession, dir: String): DataFrame = {
    val quads = graft.rdf.TpchQuads.quads(s, dir)
    graft.enrich.Inference.infer(quads,
        graft.enrich.Inference.Rules(inverseOf = Map("cust" -> "hasOrder")))
      .where(col("p") === "hasOrder")
      .select(col("s"), col("o"))
  }

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

  /** Text quality metrics: exact integer counts + BPE-ish piece count. */
  private def q48_quality(s: SparkSession, dir: String): DataFrame = {
    val m = TextAnalysis.qualityMetrics(col("text"),
      Seq("the", "a", "of", "and")).toMap
    t(s, dir, "documents").select(
      col("doc_id"),
      m("n_tokens").as("n_tokens"),
      m("n_distinct_tokens").as("n_distinct_tokens"),
      m("n_stopwords").as("n_stopwords"),
      m("max_token_len").as("max_token_len"),
      TextAnalysis.bpeishTokenCount(col("text")).as("n_pieces"))
  }

  /** Multimodal plumbing: text bytes as the opaque binary column, feature
    * extraction via the partition-batched kernel; byte count is the
    * oracle-checkable surface. */
  private def q49_multimodal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = t(s, dir, "documents").select(
        col("doc_id").as("media_id"), lit("text").as("kind"),
        encode(col("text"), "UTF-8").as("bytes"), lit("text/plain").as("mime"),
        lit(-1).as("width"), lit(-1).as("height"), lit(-1L).as("duration_ms"))
      .as[graft.multimodal.Multimodal.MediaRow]
    graft.multimodal.Multimodal.extractFeatures(media, dim = 8)
      .select(col("media_id").as("doc_id"), col("n_bytes"))
  }

  /** ANN scale path: IVF-routed top-3 (approximate, rows-only check). */
  private def q50_ann_ivf(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Ann.ivfTopK(emb, emb.where(col("vec_id") < 50), "vec_id", "embedding",
      k = 3, nlist = 16, nprobe = 4)
  }

  /** Embedding LSH near-dup path. The LCG-seeded hyperplanes are plain
    * integer arithmetic, so the oracle re-derives every bucket in SQL and
    * hash-compares the verified pair set exactly (sign margins on this
    * corpus: min |dot| ~1e-4, far above cross-engine summation error). */
  private def q51_lsh_pairs(s: SparkSession, dir: String): DataFrame =
    Ann.lshPairs(t(s, dir, "embeddings"), "vec_id", "embedding",
      threshold = 0.3, numPlanes = 10, tables = 4)

  /** G10/A7: PARIS alignment of the customer statement set against itself
    * (functional name evidence dominates; rows-only check, semantics
    * unit-tested). */
  private def q52_paris(s: SparkSession, dir: String): DataFrame = {
    // Full PARIS fixpoint (inv-functionality priors, positive AND negative
    // evidence, 10 iterations) on a dyadic-rational fixture whose result is
    // SQL-stateable: two "shared id" properties, grp (10-groups) and par
    // (20-groups, a superset), with fun/inv_fun in {1/4, 1/2, 3/4}. All
    // probability products stay exact dyadic doubles, so the DuckDB oracle
    // states the closed-form CASE result and hash-matches bit-for-bit.
    import s.implicits._
    val cust = t(s, dir, "customer")
    val stmts = cust.select(
        concat(lit("c:"), col("c_custkey")).as("x"), lit("grp").as("p"),
        concat(lit("g"), expr("c_custkey div 10")).as("o"),
        lit(false).as("oIsInstance"))
      .union(cust.select(
        concat(lit("c:"), col("c_custkey")).as("x"), lit("par").as("p"),
        concat(lit("q"), expr("c_custkey div 20")).as("o"),
        lit(false).as("oIsInstance")))
    val props = Seq(("grp", 0.5, 0.5), ("par", 0.75, 0.25))
      .toDF("p", "fun", "inv_fun")
    val noLitEq = Seq.empty[(String, String, Double)].toDF("o1", "o2", "prob")
    graft.enrich.Paris.resolve(stmts, noLitEq, props, iterations = 10)
      .where(col("x1") < col("x2"))
      .select(col("x1"), col("x2"), col("prob"))
  }

  /** G1+A5 composition: equivalence classes from IFP pairs (shared
    * brand+size ⇒ same), then primary-facet election inside each class by
    * lineitem reference count (the PrimaryFacetEnricher shape over a real
    * sameAs closure). */
  private def q53_class_primary(s: SparkSession, dir: String): DataFrame = {
    val part = t(s, dir, "part")
    val pairs = Resolution.ifpPairs(part, Seq("p_brand", "p_size"), "p_partkey")
    val classes = GraphOps.connectedComponents(
      pairs.select(col("s1").as("src"), col("s2").as("dst")),
      vertices = Some(part.select(col("p_partkey").as("id"))))
    val refs = t(s, dir, "lineitem").groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_refs"))
    val scored = classes
      .join(refs, col("id") === col("l_partkey"), "left_outer")
      .select(col("id"), col("component"),
        coalesce(col("n_refs"), lit(0L)).as("n_refs"))
    val w = Window.partitionBy(col("component"))
      .orderBy(col("n_refs").desc, col("id"))
    scored.withColumn("rk", row_number().over(w)).where(col("rk") === 1)
      .select(col("component"), col("id").as("primary_id"), col("n_refs"))
  }

  /** Skew pattern: two-stage salted aggregation — identical result to a
    * plain GROUP BY (the oracle), with hot keys spread over 16 partial
    * reducers. Exact cents so the double-summation order is irrelevant. */
  private def q54_salted_agg(s: SparkSession, dir: String): DataFrame =
    graft.operators.SkewedAgg.saltedSum(
        t(s, dir, "lineitem")
          .withColumn("qty_c", round(col("l_quantity") * 100).cast("long")),
        "l_returnflag", "qty_c", salts = 16)
      .select(col("l_returnflag"), col("sum").as("qty_cents"))

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

  /** The SPARQL front end end-to-end: parsed text → BGP plan → Catalyst.
    * Same semantics as q31, stated in SPARQL. */
  private def q57_sparql(s: SparkSession, dir: String): DataFrame =
    graft.rdf.Sparql.select(TpchQuads.quads(s, dir),
      """SELECT ?c ?cname ?nname WHERE {
        |  GRAPH <customer> { ?c <name> ?cname . ?c <nation> ?nat }
        |  GRAPH <nation> { ?nat <name> ?nname }
        |}""".stripMargin)

  /** A9 oracle-checked: on this synthetic geometry (4 distant sites, equal
    * per-site coordinates, 25 m sigma) the Hellinger clusterer provably
    * reduces to maximal same-site runs per user — which SQL states as a
    * gaps-and-islands query. The operator still runs the full
    * repartition+sort+stateful-scan path. Scale note: same-site pairs
    * have H = 0 and cross-site pairs H ≈ 1, so this closed form holds
    * under both the pre-round-12 H² ≤ λ acceptance and the corrected
    * reference scale H ≤ λ — the oracle did not move with that fix
    * (StaySpec pins the scale on a trace where the two disagree). */
  private def q58_stays_oracle(s: SparkSession, dir: String): DataFrame =
    graft.spatial.StayExtraction.extractStaysDf(
        eventsAsObservations(s, dir), minStayMs = 10L * 60 * 1000)
      .select(col("user"), col("start_ms"), col("end_ms"), col("n_obs"))

  /** W3 via a bounded typed Aggregator instead of a window sort: shuffle
    * volume O(groups*k), not O(rows) — same result as q07's window. */
  private def q59_topk_agg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(graft.functions.TopK.topK(3, col("o_totalprice"), col("o_orderkey")).as("top"))
      .select(col("o_custkey"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("o_custkey"), col("e._2").as("o_orderkey"),
        (col("pos") + 1).cast("int").as("rk"))

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

  /** Dedup decision step: near-dup pairs -> clusters -> representative per
    * document (min id; itself when unpaired). Composes q19's exact pairs
    * with connected components; oracle closes the pair graph recursively. */
  private def q65_dedup_keep(s: SparkSession, dir: String): DataFrame =
    Dedup.representatives(
      t(s, dir, "documents").select(col("doc_id")),
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), "text", "doc_id",
        k = 2, num = 1, den = 3))

  /** SPARQL front end, aggregate form (the AgentMatchEnricher message-count
    * shape, `AgentMatchEnricher.scala:101-112`): GROUP BY + COUNT over an
    * OPTIONAL-UNION group, parsed from SPARQL text and compiled onto the
    * aggregate builders. COUNT skips unbound (OPTIONAL-null) bindings. */
  private def q67_sparql_agg(s: SparkSession, dir: String): DataFrame =
    graft.rdf.Sparql.select(TpchQuads.quads(s, dir),
      """SELECT ?c ?cname (COUNT(?o) AS ?n_orders) WHERE {
        |  GRAPH <customer> { ?c <name> ?cname . }
        |  OPTIONAL {
        |    { ?o <cust> ?c . ?o <status> "F" } UNION { ?o <cust> ?c . ?o <status> "O" }
        |  }
        |} GROUP BY ?c ?cname""".stripMargin)

  /** SPARQL front end, property-path + sub-SELECT form (the
    * PrimaryFacetEnricher shape, `PrimaryFacetEnricher.scala:18-28`):
    * `succ*` reflexive-transitive closure inside a sub-select, outer
    * GROUP BY + COUNT. The succ chain links each nation to the next key in
    * its region, so the closure into n:24 is exactly the same-region
    * nations with key <= 24 — SQL-stateable without recursion. */
  private def q68_sparql_path(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("n_regionkey")).orderBy(col("n_nationkey"))
    val succ = t(s, dir, "nation")
      .select(col("n_nationkey"), col("n_regionkey"))
      .withColumn("nxt", lead(col("n_nationkey"), 1).over(w))
      .where(col("nxt").isNotNull)
      .select(
        concat(lit("n:"), col("n_nationkey").cast("string")).as("s"),
        lit("succ").as("p"),
        concat(lit("n:"), col("nxt").cast("string")).as("o"),
        lit(graft.rdf.Quad.IRI).as("oKind"),
        lit(null).cast("string").as("oDt"),
        lit(null).cast("string").as("oLang"),
        lit("succ").as("g"))
    val quads = TpchQuads.quads(s, dir).unionByName(succ)
    graft.rdf.Sparql.select(quads,
      """SELECT ?n (COUNT(?c) AS ?ncust) WHERE {
        |  {
        |    SELECT ?n ?start {
        |      ?n <succ>* ?start .
        |    }
        |  }
        |  VALUES ?start { <n:24> }
        |  ?c <nation> ?n .
        |} GROUP BY ?n""".stripMargin)
  }

  /** Multimodal REAL header decode: synthesize spec-valid PNG/JPEG/GIF
    * binaries per document (dimensions derived from doc_id), parse them
    * back with the pure-JVM header readers, and oracle-check the
    * round-trip closed-form. The parser itself is additionally pinned to
    * known byte fixtures in MultimodalSpec. */
  private def q69_image_meta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.multimodal.ImageHeaders
    val imgs = t(s, dir, "documents").select(col("doc_id").cast("long")).as[Long]
      .map { id =>
        val w = (id % 64 + 1).toInt
        val h = ((id * 7) % 64 + 1).toInt
        val bytes = (id % 3) match {
          case 0 => ImageHeaders.synthPng(w, h)
          case 1 => ImageHeaders.synthJpeg(w, h)
          case _ => ImageHeaders.synthGif(w, h)
        }
        (id, bytes)
      }.toDF("doc_id", "bytes")
    graft.multimodal.Multimodal.describeImages(imgs, "doc_id", "bytes")
  }

  /** Gopher-style quality filter signals + decision (public rule set) —
    * exact integer counts and an integer-arithmetic pass flag, fully
    * SQL-stateable. */
  private def q71_gopher_quality(s: SparkSession, dir: String): DataFrame = {
    // all 9 outputs are getFields off ONE native gopher_stats evaluation
    // (identical struct subtrees are subexpression-eliminated in codegen)
    val g = TextAnalysis.gopherStats(col("text"), Seq("the", "a", "of", "and"))
    t(s, dir, "documents").select(
      (Seq(col("doc_id")) ++
        Seq("n_words", "sum_word_len", "n_alpha_words", "n_symbol_words",
          "n_lines", "n_bullet_lines", "n_ellipsis_lines")
          .map(f => g.getField(f).as(f)) ++
        Seq(g.getField("n_stop_hits").as("n_stop_hits"),
          g.getField("passes").as("passes"))): _*)
  }

  /** Language identification (trigram-profile classifier, LangId): language
    * distribution over the documents corpus. Profile-defined output —
    * rows-only check; the classifier itself is pinned to 8-language
    * fixtures in TextAnalysisSpec. */
  private def q70_langid(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(graft.text.TextAnalysis.langId(col("text")).as("lang"))
      .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))

  /** A9 full fidelity: windowed multi-candidate stay extraction + trellis
    * smoothing (candidate clusters in a 60-min lookup window; Stationary
    * observations dropped by the min-cost state path; greedy re-cluster).
    * On q58's synthetic geometry (4 distant sites, identical per-site
    * coordinates, 25 m sigma) the windowed/Viterbi pass provably agrees
    * with the greedy clusterer — no observation is ever ambiguous, so the
    * trellis decode is the identity — and the q58 gaps-and-islands SQL
    * states the result exactly (float centroids stay out of the oracle
    * columns). Divergence between the two passes on ambiguous traces is
    * fixture-tested in WindowedStaysSpec. */
  private def q66_windowed_stays(s: SparkSession, dir: String): DataFrame =
    graft.spatial.WindowedStays.extractStaysDf(
        eventsAsObservations(s, dir), minFinalStayMs = 10L * 60 * 1000)
      .select(col("user"), col("start_ms"), col("end_ms"), col("n_obs"))

  /** SPARQL CONSTRUCT end-to-end: template instantiation over a BGP join,
    * the reference's GraphQuery front-door path
    * (`core/src/main/com/thymeflow/api/SparqlService.scala:107-112`). */
  private def q72_construct(s: SparkSession, dir: String): DataFrame =
    graft.rdf.Sparql.construct(TpchQuads.quads(s, dir),
      """CONSTRUCT { ?c <inNation> ?nname } WHERE {
        |  ?c <nation> ?n . ?n <name> ?nname
        |}""".stripMargin)
      .select(col("s"), col("p"), col("o"))

  /** FILTER NOT EXISTS + inverse path — the reference guard's negation
    * shape (`AbstractEnricher.scala:17-23`): customers with no finished
    * order pointing at them, stated with `^<cust>`. */
  private def q73_not_exists(s: SparkSession, dir: String): DataFrame =
    graft.rdf.Sparql.select(TpchQuads.quads(s, dir),
      """SELECT ?c ?cname WHERE {
        |  GRAPH <customer> { ?c <name> ?cname }
        |  FILTER NOT EXISTS { ?c ^<cust> ?ord . ?ord <status> "F" }
        |}""".stripMargin)

  /** Negated property set: every customer edge that is neither the name
    * nor the segment — exactly the nation edges. */
  private def q74_neg_prop(s: SparkSession, dir: String): DataFrame =
    graft.rdf.Sparql.select(TpchQuads.quads(s, dir),
      """SELECT ?c ?o WHERE { GRAPH <customer> { ?c !(<name>|<segment>) ?o } }""")

  /** SPARQL UPDATE text end-to-end: DELETE/INSERT WHERE parsed, evaluated
    * to a QuadDiff, applied via QuadStore.applyDiff (the reference's
    * prepareUpdate→execute, `SparqlService.scala:144-158`); inserts land
    * in the user graph per the write-back routing. */
  private def q75_sparql_update(s: SparkSession, dir: String): DataFrame =
    graft.rdf.Sparql.update(TpchQuads.quads(s, dir),
      """DELETE { ?c <segment> ?seg } INSERT { ?c <bucket> ?seg } WHERE {
        |  ?c <segment> ?seg . FILTER(?seg = "BUILDING")
        |}""".stripMargin)
      .where(col("p").isin("segment", "bucket"))
      .select(col("s"), col("p"), col("o"), col("g"))

  /** Where q76 emits its decoded-pixel oracle fixture: the PNG decode is
    * the one step DuckDB cannot restate, so the query dumps the decoder's
    * integer pixel grid (exact — gray decode is `v/255f`, and
    * `round(lum*255)` recovers v bit-for-bit) and the oracle recomputes
    * the ENTIRE embedding arithmetic (4x4 box means, mean-centering, L2
    * normalization, cosine top-3) in SQL over it. */
  val q76FixturePath = "/tmp/graft_fixtures/q76_pixels.parquet"

  /** Multimodal → ANN end-to-end: REAL grayscale PNGs (zlib-encoded pixel
    * patterns parameterized by doc_id) → [[graft.multimodal.ImagePixels]]
    * pixel decode → grid-luminance embeddings → IVF top-k neighbors.
    * Oracle-checked: the decoded pixel grid is emitted as a parquet
    * fixture from the same kernel (geometry trusted via MultimodalSpec's
    * synthetic round-trip) and the oracle SQL restates the grid-average
    * embedding + exhaustive cosine top-3 over it. IVF-vs-exhaustive
    * equality is guaranteed on this corpus: doc_ids congruent mod 77
    * share (freq, phase) and hence bit-identical pixels/embeddings, so
    * every probe's true top-3 are exact sim-1.0 ties resolved by the
    * shared (sim DESC, neighbor_id) order, and tied vectors route to the
    * probe's own IVF list by construction. */
  private def q76_image_embed(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val imgsDs = t(s, dir, "documents").select(col("doc_id").cast("long")).as[Long]
      .map { id =>
        val freq = (id % 7 + 1).toInt
        val phase = (id % 11).toInt
        (id, graft.multimodal.ImagePixels.encodeGrayPng(32, 32, (x, y) =>
          128 + (100 * math.sin((x + phase) * freq * 0.2) *
            math.cos(y * freq * 0.2)).toInt))
      }
    // oracle fixture: the kernel's decoded integer pixel grid
    imgsDs.flatMap { case (id, bytes) =>
      val g = graft.multimodal.ImagePixels.decode(bytes).get
      for {
        y <- 0 until g.height
        x <- 0 until g.width
      } yield (id, y, x, math.round(g.pix(y * g.width + x) * 255f))
    }.toDF("doc_id", "y", "x", "v")
      .write.mode("overwrite").parquet(q76FixturePath)
    val imgs = imgsDs.toDF("doc_id", "bytes")
    val emb = graft.multimodal.Multimodal.embedImages(imgs, "doc_id", "bytes", dim = 64)
      .select(col("doc_id").as("vec_id"), col("embedding"))
    Ann.ivfTopK(emb, emb.where(col("vec_id") < 10), "vec_id", "embedding",
      k = 3, nlist = 8, nprobe = 3)
  }

  /** Corpus-trained character-trigram LM statistics (the CCNet-style
    * quality dimension): exact rare-trigram counts per doc; the float
    * avg-logprob stays out of the oracle columns. */
  private def q77_lm_score(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val model = graft.text.CorpusLm.trigramCounts(docs, "text")
    graft.text.CorpusLm.scoreDocs(docs, "doc_id", "text", model, rareMax = 2)
      .select(col("doc_id"), col("n_tri"), col("n_distinct_tri"), col("n_rare"))
  }

  /** Gopher repetition signals: duplicate-line counts/chars + top word
    * bigram frequency — integer-exact. */
  private def q78_repetition(s: SparkSession, dir: String): DataFrame =
    graft.text.Repetition.signals(t(s, dir, "documents"), "doc_id", "text")

  /** Benchmark decontamination (GPT-3 §C n-gram rule, n=3 at test scale):
    * training docs (doc_id >= 20) flagged by distinct shingle collisions
    * with the benchmark slice (doc_id < 20). */
  private def q79_decontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    graft.dedup.Decontamination.overlapReport(
      docs.where(col("doc_id") >= 20), "doc_id", "text",
      docs.where(col("doc_id") < 20), "doc_id", "text", n = 3)
  }

  /** GPT-style concat-and-chunk sequence packing: token cumsum over
    * doc_id order, 512-token chunks, span/boundary bookkeeping — exact
    * integers via the distributed two-pass prefix sum. */
  private def q80_packing(s: SparkSession, dir: String): DataFrame =
    graft.text.Packing.concatChunks(
      t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n_tok")),
      "doc_id", "n_tok", capacity = 512)

  /** Exact-substring dedup profile at window granularity (Lee et al.
    * 2022): per document, distinct 8-token windows and how many also
    * occur verbatim in another document — one codegen shingle pass and
    * one hash-keyed shuffle, no self-join. */
  private def q82_span_dedup(s: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.spanDuplication(t(s, dir, "documents"), "text", "doc_id", w = 8)
      .select(col("id").as("doc_id"), col("total_windows"), col("dup_windows"))

  /** HAVING + multi-key ORDER BY through the SPARQL front end: nations
    * with at least 60 customers, most-populated first. */
  private def q89_having(s: SparkSession, dir: String): DataFrame =
    graft.rdf.Sparql.select(TpchQuads.quads(s, dir),
      """SELECT ?nat (COUNT(?c) AS ?n) WHERE {
        |  GRAPH <customer> { ?c <nation> ?nat }
        |} GROUP BY ?nat HAVING (COUNT(?c) >= 60)
        |ORDER BY DESC(COUNT(?c)) ?nat""".stripMargin)

  /** Okapi BM25 scoring of every document against a fixed term set —
    * reproducible float math, rounded to 6 places on both sides. */
  private def q88_bm25(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bm25(t(s, dir, "documents"), "text", "doc_id",
      Seq("spark", "table", "query"))
      .select(col("id").as("doc_id"), col("score"))

  /** GROUP_CONCAT through the SPARQL front end: nation names per region,
    * deterministic (sorted) concatenation. */
  private def q87_group_concat(s: SparkSession, dir: String): DataFrame =
    graft.rdf.Sparql.select(TpchQuads.quads(s, dir),
      """SELECT ?r (GROUP_CONCAT(?n; SEPARATOR="|") AS ?nations) WHERE {
        |  GRAPH <nation> { ?x <region> ?r . ?x <name> ?n }
        |} GROUP BY ?r""".stripMargin)

  /** Corpus vocabulary statistics: top-50 word bigrams by occurrence
    * count (every occurrence, not per-doc distinct), deterministic
    * tie-break — executes as TakeOrderedAndProject, no global sort. */
  private def q86_top_bigrams(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(TextAnalysis.tokens(col("text")).as("t"))
      .where(size(col("t")) >= 2) // sequence(0, n) descends when n < 0
      .select(explode(expr(
        "transform(sequence(0, size(t)-2), i -> concat(t[i], ' ', t[i+1]))"))
        .as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram").asc)
      .limit(50)

  /** Deterministic stratified corpus sampling (mixture weights): token-
    * count buckets sampled at 25%/50%/100% via the engine-independent
    * Knuth draw — kept set and uniforms are exact integers. */
  private def q85_stratified_sample(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n_tok"))
      .withColumn("bucket",
        when(col("n_tok") < 40, "short")
          .when(col("n_tok") < 70, "medium").otherwise("long"))
    graft.text.Sampling.stratifiedSample(d, "doc_id", "bucket",
        Map("short" -> 0.25, "medium" -> 0.5))
      .select(col("doc_id"), col("bucket"), col("u"))
  }

  /** SemDeDup semantic dedup over the embeddings table, in the EXACT
    * configuration (nlist = 1: the whole corpus is one cluster, so the
    * confined quadratic pass IS the all-pairs comparison) — the full
    * operator path still runs (centroid fit, broadcast-kernel
    * assignment, posexplode dot-product join, connected-components
    * representatives), and the oracle brute-forces the quadratic cosine
    * + min-id closure in SQL. This corpus is NOT cluster-separable at
    * threshold 0.4 (cross-cluster near-dup pairs exist at nlist = 16),
    * so the approximate configuration is deliberately not the oracle
    * query; cluster-confinement semantics are spec-covered in AnnSpec
    * and measured by the scaling probe. */
  private def q84_semantic_dedup(s: SparkSession, dir: String): DataFrame =
    Ann.semanticDedup(t(s, dir, "embeddings"), "vec_id", "embedding",
      threshold = 0.4, nlist = 1)
      .select(col("id"), col("keep_id"))

  /** SPARQL DESCRIBE through the front end: symmetric concise
    * description (subject rows + incoming IRI links) of every nation a
    * BUILDING-segment customer points at. */
  private def q83_describe(s: SparkSession, dir: String): DataFrame =
    graft.rdf.Sparql.describe(TpchQuads.quads(s, dir),
      """DESCRIBE ?n WHERE { ?c <segment> "BUILDING" . ?c <nation> ?n }""")
      .select(col("s"), col("p"), col("o"), col("g"))

  /** Property alternation + PREFIX through the SPARQL front end: every
    * order edge that is a status or a priority, one path pattern. */
  private def q81_alternation(s: SparkSession, dir: String): DataFrame =
    graft.rdf.Sparql.select(TpchQuads.quads(s, dir),
      """SELECT ?o ?v WHERE {
        |  GRAPH <orders> { ?o (<status>|<priority>) ?v }
        |}""".stripMargin)

  /** SPARQL expression surface end-to-end: language-tagged labels
    * (customer names, @en when custkey % 3 = 0, @fr otherwise), a
    * LANGMATCHES/LANG filter, and expression projections with STRLEN,
    * STRAFTER, arithmetic, FLOOR and IF — the §17.4 builtin remainder an
    * endpoint user hits first. */
  private def q90_sparql_expr(s: SparkSession, dir: String): DataFrame = {
    val labels = t(s, dir, "customer").select(
      concat(lit("c:"), col("c_custkey").cast("string")).as("s"),
      lit("label").as("p"),
      col("c_name").as("o"),
      lit(graft.rdf.Quad.LITERAL).as("oKind"),
      lit(null).cast("string").as("oDt"),
      when(col("c_custkey") % 3 === 0, "en").otherwise("fr").as("oLang"),
      lit("labels").as("g"))
    val quads = TpchQuads.quads(s, dir).unionByName(labels)
    graft.rdf.Sparql.select(quads,
      """SELECT ?c (STRLEN(?n) AS ?len) (STRAFTER(?c, ":") AS ?num)
        |  (IF(STRAFTER(?c, ":") / 2 - FLOOR(STRAFTER(?c, ":") / 2) = 0,
        |      "even", "odd") AS ?parity)
        |WHERE {
        |  GRAPH <labels> { ?c <label> ?n }
        |  FILTER(LANGMATCHES(LANG(?n), "en") && STRLEN(?n) + 2 > 10)
        |}""".stripMargin)
  }

  /** `{n,m}` path range quantifiers through the front end: nations within
    * 1..3 `succ` hops (the per-region key chain from q68), expanded
    * structurally into plain + optional steps. */
  private def q91_path_quant(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("n_regionkey")).orderBy(col("n_nationkey"))
    val succ = t(s, dir, "nation")
      .select(col("n_nationkey"), col("n_regionkey"))
      .withColumn("nxt", lead(col("n_nationkey"), 1).over(w))
      .where(col("nxt").isNotNull)
      .select(
        concat(lit("n:"), col("n_nationkey").cast("string")).as("s"),
        lit("succ").as("p"),
        concat(lit("n:"), col("nxt").cast("string")).as("o"),
        lit(graft.rdf.Quad.IRI).as("oKind"),
        lit(null).cast("string").as("oDt"),
        lit(null).cast("string").as("oLang"),
        lit("succ").as("g"))
    graft.rdf.Sparql.select(TpchQuads.quads(s, dir).unionByName(succ),
      """SELECT ?n ?m WHERE { GRAPH <succ> { ?n <succ>{1,3} ?m } }""")
  }

  /** G3 extension — RDFS entailment (the reference stacks a
    * ForwardChainingRDFSInferencer under its OWL one): a two-level
    * segment class hierarchy, a subPropertyOf edge and domain/range
    * declarations over the customer graph; the oracle enumerates the
    * closed-form inferred set (membership through the subclass chain,
    * locatedIn propagation, Agent/Place typing, the one transitive
    * subclass edge). */
  private def q92_rdfs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.rdf.Quad
    val cust = t(s, dir, "customer")
    def kinds(k: Byte, dt: Option[String]) = Seq(
      lit(k).as("oKind"),
      dt.map(lit(_)).getOrElse(lit(null)).cast("string").as("oDt"),
      lit(null).cast("string").as("oLang"))
    val inst = cust.select(
        concat(lit("c:"), col("c_custkey").cast("string")).as("s") +:
        lit("rdf:type").as("p") +:
        concat(lit("s:"), col("c_mktsegment")).as("o") +:
        kinds(Quad.IRI, None): _*)
      .union(cust.select(
        concat(lit("c:"), col("c_custkey").cast("string")).as("s") +:
        lit("nation").as("p") +:
        concat(lit("n:"), col("c_nationkey").cast("string")).as("o") +:
        kinds(Quad.IRI, None): _*))
      // literal-valued statements: rdfs7 must carry kind + datatype into
      // the derived (c label name) conclusions, and rdfs3's range typing
      // must NOT fire a literal into subject position
      .union(cust.select(
        concat(lit("c:"), col("c_custkey").cast("string")).as("s") +:
        lit("name").as("p") +: col("c_name").as("o") +:
        kinds(Quad.LITERAL, Some("xsd:string")): _*))
    val schema = Seq(
      ("s:BUILDING", "rdfs:subClassOf", "s:Any"),
      ("s:AUTOMOBILE", "rdfs:subClassOf", "s:Vehicle"),
      ("s:Vehicle", "rdfs:subClassOf", "s:Any"),
      ("nation", "rdfs:subPropertyOf", "locatedIn"),
      ("nation", "rdfs:domain", "s:Agent"),
      ("nation", "rdfs:range", "s:Place"),
      ("name", "rdfs:subPropertyOf", "label"),
      ("name", "rdfs:range", "s:Name")).toDF("s", "p", "o")
      .select(col("s") +: col("p") +: col("o") +: kinds(Quad.IRI, None): _*)
    graft.enrich.Inference.infer(inst.union(schema),
        graft.enrich.Inference.Rules(
          rdfs = Some(graft.enrich.Inference.RdfsVocab())))
      .select(col("s"), col("p"), col("o"),
        col("oKind").cast("int").as("okind"),
        coalesce(col("oDt"), lit("")).as("odt"))
  }

  /** Graph-management SPARQL UPDATE end-to-end (Q15 extension, round 6):
    * a `;`-sequenced request CLEARs the nation graph then re-INSERTs a
    * replacement row into it — the parser's graph-management ops
    * (CLEAR/DROP/CREATE/LOAD, `Sparql.singleUpdateDiff`) plus the
    * running-snapshot sequencing, net-diffed and applied. The oracle
    * states the surviving graphs closed-form. */
  private def q93_graph_mgmt(s: SparkSession, dir: String): DataFrame =
    graft.rdf.Sparql.update(TpchQuads.quads(s, dir),
      """CLEAR GRAPH <nation> ;
        |INSERT DATA { GRAPH <nation> { <n:0> <name> "RENAMED" } } ;
        |ADD GRAPH <nation> TO GRAPH <scratch> ;
        |MOVE GRAPH <scratch> TO GRAPH <archive>""".stripMargin)
      .where(col("g").isin("nation", "customer", "scratch", "archive"))
      .select(col("s"), col("p"), col("o"), col("g"))

  /** PII redaction (round 6): the scrubbing pass of a training-data
    * pipeline — emails/IPv4s/phones detected and replaced in one
    * map-only codegen pass ([[graft.text.Pii]]). The PII-bearing text is
    * derived from customer columns by the SAME concat stated in the
    * oracle, so the redaction itself is what parity-checks. */
  private def q94_pii_redact(s: SparkSession, dir: String): DataFrame = {
    val src = t(s, dir, "customer").select(
      col("c_custkey"),
      concat(col("c_name"), lit(" <u"), col("c_custkey").cast("string"),
        lit("@mail"), (col("c_custkey") % 7).cast("string"),
        lit(".org> tel +1-555-00"), col("c_custkey").cast("string"),
        lit(" at 10.0."), col("c_nationkey").cast("string"),
        lit("."), (col("c_custkey") % 256).cast("string")).as("text"))
    graft.text.Pii.redact(src, "text")
      .select(col("c_custkey"), col("redacted"),
        col("n_emails").cast("long").as("n_emails"),
        col("n_ips").cast("long").as("n_ips"),
        col("n_phones").cast("long").as("n_phones"))
  }

  /** URL hygiene (round 6): host/registrable-domain extraction, URL
    * normalization and blocklist flagging over derived URLs
    * ([[graft.text.Urls]]) — like q94, the derivation is stated
    * identically in the oracle so the classification itself is what
    * parity-checks. Map-only codegen; no shuffle. */
  private def q95_url_classify(s: SparkSession, dir: String): DataFrame = {
    val src = t(s, dir, "customer").select(
      col("c_custkey"),
      concat(lit("https://WWW.Site"), (col("c_custkey") % 50).cast("string"),
        lit(".com/item/"), col("c_custkey").cast("string"),
        when(col("c_custkey") % 3 === 0, lit("/#sec"))
          .otherwise(lit("?ref=mail"))).as("url"))
    graft.text.Urls.classify(src, "url", Seq("site7.com", "site13.com"))
      .select(col("c_custkey"), col("host"), col("domain"),
        col("url_norm"), col("blocked"))
  }

  /** End-to-end curation decision (round 6): the composed keep/drop gate
    * a training-data pipeline applies per document — token budget
    * (tokenCount), Gopher quality pass, exact-dup canonicalization
    * (min-id keeper over identical texts), and the final keep flag. Each
    * constituent is an existing oracle-checked operator; this entry
    * checks their COMPOSITION end-to-end. */
  private def q96_curation(s: SparkSession, dir: String): DataFrame = {
    // canonicalization key is sha2(text), NOT the text itself: the window
    // exchange then shuffles a 32-byte digest instead of writing every
    // full document into the shuffle as key AND payload (`text` is
    // dropped before the exchange), and hot exact-dup clusters hash-
    // spread instead of landing on one task
    val scored = t(s, dir, "documents").select(
      col("doc_id"), sha2(col("text"), 256).as("text_sha"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
      TextAnalysis.gopherStats(col("text"), Seq("the", "a", "of", "and"))
        .getField("passes").as("passes"))
    val byText = org.apache.spark.sql.expressions.Window.partitionBy(col("text_sha"))
    scored
      .withColumn("canonical", col("doc_id") === min(col("doc_id")).over(byText))
      .withColumn("keep", (col("passes") === 1) && col("canonical"))
      .select(col("doc_id"), col("n_tokens"), col("passes"),
        col("canonical"), col("keep"))
  }

  /** Nested property path through the driver gate (round 6): a closure
    * over a GROUPED SEQUENCE — `(cust/nation)+` — exercises the
    * recursive path compiler (PathTriple -> pair-relation evaluator),
    * not the linear lowering. On this data the composed relation has no
    * chains, so the closure equals one composition and the oracle states
    * the join closed-form. */
  private def q97_nested_path(s: SparkSession, dir: String): DataFrame =
    graft.rdf.Sparql.select(TpchQuads.quads(s, dir),
      "SELECT ?o ?n WHERE { ?o (<cust>/<nation>)+ ?n }")

  /** S10 end-to-end: chain EVERY serializer/parser pair — TriG → Turtle →
    * JSON-LD → RDF/XML — over real table-derived quads, per partition,
    * inside the distributed query; the oracle is the IDENTITY on the
    * source table, so any escaping, typing, or lang-tag bug in any of the
    * four round-trip legs lands as a red hash every round (this family is
    * where the round-6 advisor found its only corruption bugs). Each
    * document contributes a plain literal (text decorated with one
    * instance of every escape-sensitive class: quote, backslash, CR, LF,
    * TAB, angle brackets, ampersand, non-ASCII — stripped
    * after the chain, so a broken escaper corrupts the value and fails
    * the compare), an xsd:long, and a language-tagged literal. Other C0
    * controls are excluded by construction: XML 1.0 has NO representation
    * for them (not even character references), so the RDF/XML writer
    * rejects them loudly rather than emit a document no parser accepts. */
  private def q98_rdf_roundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.rdf.Quad
    import graft.sources.{JsonLd, RdfXml, Turtle}
    val deco = "\"\\\r\n\t<>&é中 "
    val quads = t(s, dir, "documents")
      .select(col("doc_id"), col("text"), col("n_chars"), col("source"), col("lang"))
      .as[(Long, String, Long, String, String)]
      .mapPartitions(_.flatMap { case (id, text, nChars, src, lang) =>
        val su = s"urn:doc:$id"
        val g = "urn:g:docs"
        Seq(
          Quad(su, "urn:p:text", deco + text, Quad.LITERAL, null, null, g),
          Quad(su, "urn:p:chars", nChars.toString, Quad.LITERAL, Quad.Xsd.long, null, g),
          Quad(su, "urn:p:src", src, Quad.LITERAL, null, lang, g))
      })
    val back = quads.mapPartitions { it =>
      val in = it.toList
      if (in.isEmpty) Iterator.empty
      else {
        val g = "urn:g:docs"
        val a = Turtle.parse(Turtle.serializeTrig(in), g) // TriG keeps graphs
        val b = Turtle.parse(Turtle.serialize(a), g)
        val c = JsonLd.parse(JsonLd.serialize(b), g)
        RdfXml.parse(RdfXml.serialize(c), g).iterator
      }
    }
    back.toDF()
      .groupBy(substring(col("s"), 9, 19).cast("long").as("doc_id"))
      .agg(
        // strip the decoration ONLY when it survived intact — a corrupted
        // round-trip keeps the mangled value and fails the hash compare
        max(when(col("p") === "urn:p:text",
          when(col("o").startsWith(deco),
            col("o").substr(lit(deco.length + 1), lit(Int.MaxValue)))
            .otherwise(col("o")))).as("text"),
        max(when(col("p") === "urn:p:chars", col("o").cast("long"))).as("n_chars"),
        max(when(col("p") === "urn:p:src", col("o"))).as("source"),
        max(when(col("p") === "urn:p:src", col("oLang"))).as("lang"))
  }

  /** Gopher repetition-removal signals (Rae et al. 2021 §A1.1 — a
    * training-pipeline extension, no reference counterpart): per document
    * the total and most-frequent 2-gram occurrence counts and the excess
    * (beyond-first) occurrences of repeated 3-grams, all exact integers.
    * Fully NARROW: the gram list is sorted per row and run-length scanned
    * with `aggregate` — zero shuffles, zero explodes; at 100 TB this is
    * embarrassingly parallel map work pipelined into the scan. */
  private def q99_repetition(s: SparkSession, dir: String): DataFrame = {
    val native = s.sessionState.functionRegistry.functionExists(
      org.apache.spark.sql.catalyst.FunctionIdentifier("repetition_profile"))
    if (native) {
      // one-pass codegen'd profile (exact string-keyed; bit-identical to
      // the column plan below, spec-enforced) — ~20x the column plan's
      // throughput at corpus scale
      t(s, dir, "documents")
        .select(col("doc_id"),
          call_function("repetition_profile", col("text")).as("p"))
        .select(col("doc_id"), col("p.n_2grams").as("n_2grams"),
          col("p.top_2gram_n").as("top_2gram_n"),
          col("p.dup_3gram_excess").as("dup_3gram_excess"))
    } else {
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("ts"))
      val grams = toks.select(col("doc_id"),
        array_sort(TextAnalysis.rawShingles(col("ts"), 2)).as("g2"),
        TextAnalysis.rawShingles(col("ts"), 3).as("g3"))
      grams.select(col("doc_id"),
        size(col("g2")).cast("long").as("n_2grams"),
        TextAnalysis.topRunCount(col("g2")).as("top_2gram_n"),
        (size(col("g3")) - size(array_distinct(col("g3")))).cast("long")
          .as("dup_3gram_excess"))
    }
  }

  /** Benchmark-contamination scan (training-pipeline extension): distinct
    * 5-gram overlap between every training document and a held-out eval
    * slice (doc_id ≡ 0 mod 97). The eval gram set is aggregated and
    * BROADCAST — eval suites are small by construction — so the scan-side
    * join is shuffle-free; at 100 TB the join key becomes the 8-byte
    * xxhash64 of the gram (string keys kept here for oracle parity). */
  private def q100_contamination(s: SparkSession, dir: String): DataFrame = {
    val native = s.sessionState.functionRegistry.functionExists(
      org.apache.spark.sql.catalyst.FunctionIdentifier("word_shingles"))
    val grams =
      if (native)
        // the native shingle pass; its one semantic divergence (a single
        // shorter tail gram when the doc has < 5 tokens) is cut off by
        // the token-count guard, after which the two formulations emit
        // identical distinct gram sets
        t(s, dir, "documents")
          .where(size(TextAnalysis.tokens(col("text"))) >= 5)
          .select(col("doc_id"),
            explode(call_function("word_shingles", col("text"), lit(5))).as("g"))
      else
        t(s, dir, "documents")
          .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("ts"))
          .select(col("doc_id"),
            explode(array_distinct(TextAnalysis.rawShingles(col("ts"), 5))).as("g"))
    val evalGrams = grams.where(col("doc_id") % 97 === 0)
      .select(col("g")).distinct()
    // Broadcast the eval side only while the eval SLICE is broadcast-
    // sized (input stats — the aggregated gram set has no reliable
    // estimate): real eval suites are tiny, but a fixed fraction of a
    // 100 TB corpus is not, and past the gate the plan falls back to a
    // shuffled join that AQE still converts to broadcast at runtime when
    // the actual built side turns out small.
    val evalSized =
      if (t(s, dir, "documents").where(col("doc_id") % 97 === 0)
          .queryExecution.optimizedPlan.stats.sizeInBytes < (1L << 26))
        broadcast(evalGrams.withColumn("hit", lit(1)))
      else evalGrams.withColumn("hit", lit(1))
    grams.where(col("doc_id") % 97 =!= 0)
      .join(evalSized, Seq("g"), "left")
      .groupBy(col("doc_id"))
      .agg(count(col("hit")).as("n_contaminated"))
  }

  /** End-to-end fuzzy-dedup keep list (the near-dup analogue of q96's
    * exact-dup canonicalization): MinHash+LSH candidate pairs (q25's
    * operator), connected components over the surviving edges, min-id
    * keeper per cluster, keep flag. Composes three oracle-checked
    * operators; the oracle restates the pair set exactly (LSH recall is
    * total on this corpus) and closes it with a recursive CTE. */
  private def q101_fuzzy_keeplist(s: SparkSession, dir: String): DataFrame =
    graft.dedup.FuzzyClusters.minhashClusters(
        t(s, dir, "documents"), "text", "doc_id",
        k = 2, numHashes = 32, bands = 8, num = 1, den = 3)
      .select(col("doc_id"), col("cluster_id").as("component"),
        col("is_keeper").as("keep"))

  /** Multimodal audio: REAL RIFF/WAVE round-trip. Each document synthesizes
    * a deterministic PCM-16 clip (LCG samples, length keyed to n_chars),
    * serializes it to actual WAVE bytes, and [[graft.multimodal.Multimodal
    * .analyzeAudio]] re-parses those bytes (chunk walk + sample decode) into
    * header metadata and integer-exact signal statistics. The oracle
    * restates the generating formula in SQL, so any writer/parser/stats bug
    * — header offsets, endianness, sign handling, chunk sizes — goes
    * hash-red. */
  private def q102_audio(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wav = t(s, dir, "documents")
      .select(col("doc_id"), least(greatest(col("n_chars"), lit(1L)), lit(1600L)).as("n"))
      .as[(Long, Long)]
      .mapPartitions(_.map { case (docId, n) =>
        val samples = new Array[Short](n.toInt)
        var i = 0
        while (i < samples.length) {
          samples(i) = (((docId * 7919L + i * 104729L) % 65536L) - 32768L).toShort
          i += 1
        }
        (docId, graft.multimodal.AudioWav.write(samples, sampleRate = 8000))
      })
      .toDF("doc_id", "bytes")
    // no side computation to join back: n_bytes rides inside the one
    // per-partition pass (a separate length() branch would re-synthesize
    // and join a document-proportional side)
    graft.multimodal.Multimodal.analyzeAudio(wav, "doc_id", "bytes")
  }

  /** Multimodal video: REAL ISO-BMFF round-trip. Each document synthesizes
    * a deterministic MP4 (mvhd duration keyed to n_chars, tkhd dims keyed
    * to doc_id, LCG mdat payload), and the query composes the two container
    * operators — [[graft.multimodal.Multimodal.describeVideo]] (box-walk
    * metadata) and [[graft.multimodal.Multimodal.sampleVideoFrames]]
    * (bounded frame explosion + proportional payload seek) — into per-clip
    * frame aggregates. The oracle restates the time grid and seek formula
    * in SQL. */
  private def q103_video(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val mp4 = t(s, dir, "documents")
      .select(col("doc_id"),
        (lit(500L) + col("n_chars") % 4000L).as("dur"),
        (lit(160) + (col("doc_id") % 16).cast("int") * 8).as("w"),
        (lit(120) + (col("doc_id") % 9).cast("int") * 8).as("h"),
        least(greatest(col("n_chars"), lit(1L)), lit(1200L)).as("m"))
      .as[(Long, Long, Int, Int, Long)]
      .mapPartitions(_.map { case (docId, dur, w, h, m) =>
        val payload = new Array[Byte](m.toInt)
        var j = 0
        while (j < payload.length) {
          payload(j) = ((docId * 31L + j * 17L) % 251L).toByte
          j += 1
        }
        (docId, graft.multimodal.VideoMp4.write(
          timescale = 1000L, duration = dur, width = w, height = h, payload))
      })
      .toDF("doc_id", "bytes")
    val meta = graft.multimodal.Multimodal.describeVideo(mp4, "doc_id", "bytes")
    val frames = graft.multimodal.Multimodal
      .sampleVideoFrames(mp4, "doc_id", "bytes", strideMs = 250L, maxFrames = 16)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_frames"),
        sum(col("payload_offset").cast("long")).as("sum_offsets"),
        sum(col("sample_value").cast("long")).as("sum_samples"))
    meta.join(frames, "doc_id")
  }

  /** Fractional-epoch source mixing (the upsampling half of mixture
    * weights): src0 runs 2.3 epochs, src1 0.4, src2 is dropped, the other
    * seventeen sources run 1 — one row per (document, epoch). The oracle
    * restates the exact integer thresholds and the bounded explode with
    * generate_series. */
  private def q104_epoch_mixture(s: SparkSession, dir: String): DataFrame =
    graft.text.Sampling.epochMixture(
        t(s, dir, "documents").select(col("doc_id"), col("source")),
        "doc_id", "source",
        Map("src0" -> 2.3, "src1" -> 0.4, "src2" -> 0.0))
      .select(col("doc_id"), col("source"), col("epoch"))

  /** Per-row-rate (quality-weighted) sampling: keep probability scales
    * with document length capped at 1 — the per-document generalization
    * of q85's bucket rates. Oracle restates the clamped IEEE threshold. */
  private def q105_rate_sample(s: SparkSession, dir: String): DataFrame =
    graft.text.Sampling.rateSample(
        t(s, dir, "documents").select(col("doc_id"), col("n_chars")),
        "doc_id", col("n_chars") / lit(800.0))
      .select(col("doc_id"), col("u"))

  /** Gate query for the round-13 NaN-rate fix: every fifth doc's rate is
    * NaN (the 0/0-quality-ratio class; stated as a literal because ANSI
    * mode raises on an actual double 0/0) — pre-fix Spark's NaN-largest
    * ordering made `least(greatest(NaN, 0), 1)` evaluate to 1.0 and
    * those rows were ALWAYS kept; the contract is NaN = drop, and the
    * oracle states it with an explicit isnan guard (cross-engine:
    * DuckDB's NaN ordering differs from Spark's, so only the guarded
    * form agrees). */
  private def q206_nan_rate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("n_chars"))
    val rate = when(col("doc_id") % 5 === 0, lit(Double.NaN))
      .otherwise(col("n_chars") / lit(800.0))
    graft.text.Sampling.rateSample(docs, "doc_id", rate)
      .select(col("doc_id"), col("u"))
  }

  /** RAG-style overlapping chunking: 64-token chunks at stride 40 over
    * every document; oracle restates the slice arithmetic with
    * generate_series and 1-based list slicing. */
  private def q106_chunking(s: SparkSession, dir: String): DataFrame =
    // maxChunks matches the oracle's generate_series(0, 255) bound — a
    // pathological >10k-token document diverges from the SQL otherwise
    TextAnalysis.chunkTokens(t(s, dir, "documents"), "doc_id", "text",
      chunkSize = 64, stride = 40, maxChunks = 256)

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

  /** CCNet-style segment-frequency boilerplate removal
    * ([[graft.dedup.Dedup.dedupSegments]]): segments whose corpus-wide
    * count exceeds 2 are dropped from every document and the text is
    * reconstructed in original segment order. The synthetic docs are
    * single-line, so the exercised separator is the token ` the ` —
    * at sf0.01 that yields 1266 segments of which 8 distinct (27
    * occurrences) cross the threshold, i.e. the gate genuinely bites. */
  private def q114_segment_dedup(s: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.dedupSegments(
      t(s, dir, "documents"), "text", "doc_id", " the ", maxFreq = 2)

  /** Deterministic training-order shuffle
    * ([[graft.text.Sampling.deterministicShuffle]]): md5-seeded sort key,
    * shard from ascii arithmetic on the key prefix, per-shard positions —
    * no global single-task sort. Oracle restates key, shard, and
    * row_number verbatim (md5 is engine-independent). */
  private def q115_det_shuffle(s: SparkSession, dir: String): DataFrame =
    graft.text.Sampling.deterministicShuffle(
      t(s, dir, "documents"), "doc_id", "epoch0", buckets = 8)

  /** fastText-style hashed-linear quality gate
    * ([[graft.text.Classifier]]): B=64 buckets, integer pseudo-weights
    * w(b) = b%7-3 so the oracle restates the full inference (bucket
    * arithmetic included) and the float sum is exact. One narrow
    * transform+aggregate pass, no shuffle. */
  private def q116_quality_classifier(s: SparkSession, dir: String): DataFrame = {
    val weights = (0 until 64).map(b => ((b % 7) - 3).toDouble)
    val score = graft.text.Classifier
      .hashedLinearScore(col("text"), weights, bias = 0.0)
    t(s, dir, "documents").select(col("doc_id"),
      score.cast("long").as("score"), (score > lit(0.0)).as("keep"))
  }

  /** Per-source document cap ([[graft.text.Sampling.capPerGroup]]) — the
    * C4/RefinedWeb anti-spam rule (no domain dominates the mix). Order:
    * longest documents first, doc_id tie-break; all rows returned with
    * (rnk, kept) so the drop is auditable. */
  private def q117_source_cap(s: SparkSession, dir: String): DataFrame =
    graft.text.Sampling.capPerGroup(
      t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens")),
      "source", Seq(col("n_tokens").desc, col("doc_id").asc), cap = 10)

  /** Corpus token-budget report: per-source doc count, token sum/mean and
    * p50/p95 token counts — the first table of any training-mix design
    * doc. percentile_cont semantics match Spark's `percentile` (both
    * interpolate at rank p·(n−1) in IEEE doubles, so the hash compare is
    * exact). One partial-agg shuffle on source. */
  private def q118_corpus_stats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("source"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("sum_tokens"),
        min(col("n")).as("min_tokens"), max(col("n")).as("max_tokens"),
        avg(col("n")).as("mean_tokens"),
        percentile(col("n"), lit(0.5)).as("p50_tokens"),
        percentile(col("n"), lit(0.95)).as("p95_tokens"))

  /** Integer-exact tf-idf keyword extraction: score = tf · ⌊10⁶/df⌋ (all
    * integer arithmetic, so rarity weighting is oracle-exact with no
    * float log), top 3 tokens per document, (score desc, token asc)
    * deterministic order. Shape: one (doc,tok) count shuffle, one df
    * count shuffle, broadcast-joined back, per-doc window. */
  private def q119_keywords(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
    val tf = toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    // top-3 via per-group BOUNDED sort (collect per doc, array_sort on
    // (-score, tok), slice) — no global window sort over every (doc,tok)
    // pair; the group payload is capped by the document's own vocabulary.
    // Same (score desc, tok asc) order the oracle's row_number states.
    tf.join(df_, "tok")
      .withColumn("score", col("tf") * (lit(1000000L) / col("df")).cast("long"))
      .groupBy(col("doc_id"))
      .agg(collect_list(struct((-col("score")).as("neg"), col("tok"),
        col("score"))).as("c"))
      .select(col("doc_id"),
        posexplode(slice(array_sort(col("c")), 1, 3)).as(Seq("pos0", "e")))
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("rnk"),
        col("e.tok").as("tok"), col("e.score").as("score"))
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

  /** Fixed-point PageRank ([[graft.graph.PageRank]]) on the order→part
    * bipartite graph, 3 iterations: the whole recurrence runs in scaled
    * integers, so the oracle unrolls it as three CTE blocks and the
    * hash compare is exact on every vertex — no float PageRank can make
    * that claim (summation order changes the bits). */
  private def q121_pagerank(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "lineitem").select(col("l_orderkey").as("src"),
      (col("l_partkey") + 10000000L).as("dst"))
    graft.graph.PageRank.fixedPoint(e, iterations = 3)
      .select(col("id"), col("rank").as("pr"))
  }

  /** Winnowing fingerprints ([[graft.text.Winnow]]) with k=4 shingles,
    * w=5 windows: the MOSS selection, min-md5 per complete window,
    * distinct per doc. The oracle restates shingling, the windowed
    * varchar min, and the complete-window cut verbatim. */
  private def q122_winnow(s: SparkSession, dir: String): DataFrame =
    graft.text.Winnow.fingerprints(
      t(s, dir, "documents"), "text", "doc_id", k = 4, w = 5)

  /** Uniform deterministic k-per-group sample: [[graft.text.Sampling
    * .capPerGroup]] ordered by an md5 priority instead of a quality
    * signal — reproducible reservoir-style sampling (eval-set carving,
    * per-source inspection samples) with an exact SQL restatement. */
  private def q123_group_sample(s: SparkSession, dir: String): DataFrame =
    graft.text.Sampling.capPerGroup(
      t(s, dir, "documents").select(col("doc_id"), col("source"),
        md5(concat(col("doc_id").cast("string"), lit(":sample0"))).as("pri")),
      "source", Seq(col("pri").asc, col("doc_id").asc), cap = 5)

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

  /** Vocabulary builder ([[TextAnalysis.vocab]]): top-50 tokens with a
    * count floor of 2 and dense ids — distributed count + top-K, the id
    * window only ever sees the bounded K rows. */
  private def q125_vocab(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.vocab(t(s, dir, "documents"), "text", topK = 50, minCount = 2)

  /** MOSS match step ([[graft.text.Winnow.candidatePairs]]): doc pairs
    * sharing ≥2 winnowing fingerprints via the inverted-index self-join —
    * output proportional to true overlap, never all-pairs. */
  private def q126_winnow_pairs(s: SparkSession, dir: String): DataFrame =
    graft.text.Winnow.candidatePairs(
      graft.text.Winnow.fingerprints(
        t(s, dir, "documents"), "text", "doc_id", k = 4, w = 5),
      "doc_id", minShared = 2)

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

  /** Table profiling ([[graft.operators.Profile]]): per-column null
    * counts, cardinalities and ranges in ONE aggregation pass over
    * orders — int/string/timestamp columns only, so the stringified
    * ranges are engine-portable. */
  private def q130_profile(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profile.profile(t(s, dir, "orders"),
      Seq("o_orderkey", "o_orderstatus", "o_orderdate", "o_orderpriority"))

  /** Mergeable deterministic quantile estimate: per group, the k rows
    * with the SMALLEST md5 priorities form a uniform sample (k-smallest
    * of a union = merge of k-smallest sets — the mergeability that makes
    * this a 100 TB sketch), and the exact interpolated quantile of that
    * sample estimates the group quantile. Selection AND quantile restate
    * verbatim in SQL, so unlike t-digest/KLL this sketch is hash-exact
    * against the oracle. */
  private def q131_sampled_quantile(s: SparkSession, dir: String): DataFrame = {
    val sampled = graft.text.Sampling.capPerGroup(
      t(s, dir, "lineitem").select(col("l_returnflag").as("grp"),
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        md5(concat(col("l_orderkey").cast("string"), lit(":"),
          col("l_linenumber").cast("string"))).as("pri")),
      "grp", Seq(col("pri").asc, col("l_orderkey").asc,
        col("l_linenumber").asc), cap = 200)
      .where(col("kept"))
    sampled.groupBy(col("grp")).agg(
      count(lit(1)).as("n_sample"),
      percentile(col("l_quantity"), lit(0.5)).as("p50_est"),
      percentile(col("l_quantity"), lit(0.9)).as("p90_est"))
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

  /** G12: per-vertex triangle counts on the part co-purchase graph
    * (edges = part pairs sharing ≥ 2 distinct orders), counted with
    * degree-ordered orientation — the O(m^1.5) skew-proof plan. */
  private def q134_triangles(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem")
    val edges = l.alias("a")
      .join(l.alias("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .agg(count_distinct(col("a.l_orderkey")).as("n_orders"))
      .where(col("n_orders") >= 2)
    graft.graph.Triangles.perVertex(edges, "u", "v")
  }

  /** SCD type-2 dimension build from the event log: per-user validity
    * intervals of the event_type state (episode compression + exclusive
    * upper bounds). Sentinel end 2200-01-01 keeps valid_to non-null and
    * inside pandas' datetime64[ns] range for the oracle compare. */
  private def q135_scd2(s: SparkSession, dir: String): DataFrame =
    graft.operators.Scd.type2(
      t(s, dir, "events"), keyCols = Seq("user_id"), tsCol = "ts",
      tieCol = "event_id", attrCols = Seq("event_type"),
      openEnd = "2200-01-01 00:00:00")

  /** F23: Unicode script-mix profile — per-doc counts by writing system
    * + dominant script. Map-only codegen pass; exact oracle. */
  private def q136_script_profile(s: SparkSession, dir: String): DataFrame =
    graft.text.Scripts.profile(t(s, dir, "documents"), "text", "doc_id")

  /** J11: sorted-neighborhood blocking over case-folded customer names —
    * every pair within a 5-rank sliding window of the global (key, id)
    * sort. Parallel rank (range-sort + zipWithIndex), bounded explode —
    * never a single-task window. */
  private def q137_sorted_neighborhood(s: SparkSession, dir: String): DataFrame =
    graft.operators.SortedNeighborhood.pairs(
      t(s, dir, "customer").withColumn("k", lower(col("c_name"))),
      "c_custkey", "k", w = 5)

  /** L33: BPE token budgeting — learn 200 merges from the corpus word
    * distribution, encode every document, count model-unit tokens.
    * Deterministic (tie rules stated in [[graft.text.Bpe]]) but not
    * SQL-expressible — no oracle entry; BpeSpec pins the algorithm to
    * the textbook example. */
  private def q138_bpe_tokens(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val merges = graft.text.Bpe.learn(docs, "text", numMerges = 200)
    graft.text.Bpe.tokenCounts(docs, "doc_id", "text", merges)
      .select(col("id").as("doc_id"), col("n_bpe_tokens"))
  }

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

  /** M6: EXIF build→parse round trip at scale — deterministic camera
    * metadata synthesized per customer row, wrapped in a real JPEG/APP1
    * EXIF block (alternating byte orders), parsed back by the strict
    * TIFF walker. The oracle states the synthesis formulas; hash
    * equality proves the byte-level round trip. */
  private def q141_exif(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer").select(col("c_custkey")).as[Long].map { k =>
      val make = s"cam-${k % 10}"
      val dt = f"2024:01:${k % 28 + 1}%02d 12:00:00"
      val orient = (k % 8 + 1).toInt
      val lat = (k * 37 % 180000000L) - 90000000L
      val lon = (k * 91 % 360000000L) - 180000000L
      val d = graft.multimodal.Exif.parse(graft.multimodal.Exif.buildJpeg(
        make, dt, orient, lat, lon, littleEndian = k % 2 == 0))
      (k, d.make.orNull, d.dateTime.orNull,
        d.orientation.map(_.toLong).getOrElse(-1L),
        d.latE6.getOrElse(Long.MinValue), d.lonE6.getOrElse(Long.MinValue))
    }.toDF("c_custkey", "make", "dt", "orientation", "lat_e6", "lon_e6")
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

  /** L36: compression-ratio quality signal (DEFLATE ppm per document) —
    * rows-only: zlib has no SQL restatement; CompressionSpec pins the
    * monotonicity contract (repetition < prose < noise). */
  private def q145_compression(s: SparkSession, dir: String): DataFrame =
    graft.text.Compression.profile(t(s, dir, "documents"), "doc_id", "text")
      .select(col("id").as("doc_id"), col("n_bytes"), col("n_deflated"),
        col("ratio_ppm"))

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

  /** F24: Unicode NFC dedup keys — canonical composition before
    * hashing, so composed/decomposed spellings of the same string land
    * in the same dedup bucket. Native `unicode_nfc` expression; NFC is
    * standard-defined, so DuckDB's nfc_normalize restates it exactly. */
  private def q150_nfc_keys(s: SparkSession, dir: String): DataFrame =
    graft.text.Normalize.nfcCol(t(s, dir, "documents"), "text", "text_nfc")
      .select(col("doc_id"),
        length(col("text_nfc")).cast("long").as("n_chars_nfc"),
        sha2(col("text_nfc"), 256).as("nfc_key"))

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

  /** q158: inverted-index BM25 top-k — the indexed retrieval sibling of
    * q88 (same scoring formula, term-pruned postings instead of a corpus
    * re-tokenize; rank-safe WAND-style candidate cut verified by spec to
    * change nothing). */
  private def q158_bm25_topk(s: SparkSession, dir: String): DataFrame = {
    val ix = graft.text.InvertedIndex.build(t(s, dir, "documents"), "doc_id", "text")
    graft.text.InvertedIndex.topK(ix, Seq("spark", "table", "query"), 20)
      .select(col("id").as("doc_id"), col("score"), col("rank").cast("long").as("rank"))
  }

  /** q159: exact heavy hitters over the token stream — per-partition
    * Misra–Gries candidates, exact verified counts, support 1/200. */
  private def q159_heavy_hitters(s: SparkSession, dir: String): DataFrame =
    graft.operators.HeavyHitters.frequentItems(
      t(s, dir, "documents")
        .select(explode(graft.text.TextAnalysis.tokens(col("text"))).as("tok")),
      "tok", 200)

  /** q160: Fellegi–Sunter record-linkage scoring — supervised m/u
    * estimation on a bounded labeled pair sample, log-likelihood-ratio
    * scores; all count arithmetic exact, ln shapes mirrored by the
    * oracle. */
  private def q160_fellegi_sunter(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").where(col("c_custkey") <= 300)
      .select(col("c_custkey"), col("c_nationkey"),
        floor(col("c_acctbal") / 1000).as("bkt"),
        (col("c_acctbal") > 0).as("pos"), col("c_mktsegment"))
    val pairs = c.as("a")
      .join(c.as("b"), col("a.c_custkey") < col("b.c_custkey"))
      .select(col("a.c_custkey").as("id1"), col("b.c_custkey").as("id2"),
        (col("a.c_mktsegment") === col("b.c_mktsegment")).cast("int").as("is_match"),
        (col("a.c_nationkey") === col("b.c_nationkey")).cast("int").as("a_nation"),
        (col("a.bkt") === col("b.bkt")).cast("int").as("a_bkt"),
        (col("a.pos") === col("b.pos")).cast("int").as("a_bal"))
    val fields = Seq("a_nation", "a_bkt", "a_bal")
    val w = graft.enrich.FellegiSunter.weights(pairs, fields, "is_match")
    graft.enrich.FellegiSunter.score(pairs, w, fields)
      .select(col("id1"), col("id2"), col("fs_score"))
  }

  /** q161: HITS hubs/authorities — 2 integer fixed-point iterations on
    * the order→part bipartite graph (same edge derivation as q121). */
  private def q161_hits(s: SparkSession, dir: String): DataFrame =
    graft.graph.Hits.fixedPoint(
      t(s, dir, "lineitem").select(col("l_orderkey").as("src"),
        (col("l_partkey") + 10000000L).as("dst")), 2)

  /** q162: k-core peel (k=3, 2 bounded rounds) on the order–part
    * bipartite graph — cascade-aware density filtering the plain degree
    * threshold can't express. */
  private def q162_kcore(s: SparkSession, dir: String): DataFrame =
    graft.graph.KCore.kCore(
      t(s, dir, "lineitem").select(col("l_orderkey").as("src"),
        (col("l_partkey") + 10000000L).as("dst")),
      k = 3, maxRounds = 2)

  /** q163: integer-exact Gram matrix XᵀX of the embedding corpus in
    * micro-units — the d×d reduction all dominant-direction and
    * whitening post-processing starts from. */
  private def q163_gram(s: SparkSession, dir: String): DataFrame =
    graft.similarity.Embeddings.gramMicro(t(s, dir, "embeddings"),
      "embedding", 1000L)
      .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
        col("s"))

  /** q164: multi-source BFS hop layers (3 hops) over the undirected
    * order–part graph from the smallest order. */
  private def q164_bfs(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val fwd = li.select(col("l_orderkey").as("src"),
      (col("l_partkey") + 10000000L).as("dst"))
    val edges = fwd.unionByName(
      fwd.select(col("dst").as("src"), col("src").as("dst")))
    val sources = li.agg(min(col("l_orderkey")).as("id"))
    graft.graph.Bfs.hopDistances(edges, sources, maxHops = 3)
      .select(col("id"), col("dist").cast("long").as("dist"))
  }

  /** q165: Efraimidis–Spirakis weighted sample — top-100 documents by
    * the deterministic ln(u)/w priority, inclusion ∝ n_chars. */
  private def q165_weighted_sample(s: SparkSession, dir: String): DataFrame =
    graft.text.Sampling.weightedSample(t(s, dir, "documents"), "doc_id",
      col("n_chars").cast("double"), k = 100)
      .select(col("doc_id"), col("u"), col("priority"))

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

  /** q169: bounded Bellman–Ford — cheapest ≤3-edge path weights
    * (w = quantity) over the undirected order–part graph from the
    * smallest order. */
  private def q169_sssp(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val fwd = li.select(col("l_orderkey").as("src"),
      (col("l_partkey") + 10000000L).as("dst"),
      col("l_quantity").cast("long").as("w"))
    val edges = fwd.unionByName(fwd.select(col("dst").as("src"),
      col("src").as("dst"), col("w")))
    val sources = li.agg(min(col("l_orderkey")).as("id"))
    graft.graph.Bfs.boundedShortestPaths(edges, sources, maxRounds = 3)
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

  /** q174: DSIR importance weights ([[graft.text.Dsir]]) — hashed-unigram
    * log-likelihood-ratio scores against the English slice as target,
    * fixed-point micro-nats so the per-doc sum is exact integers. */
  private def q174_dsir(s: SparkSession, dir: String): DataFrame =
    graft.text.Dsir.importanceWeights(
      t(s, dir, "documents"), "text", "doc_id",
      col("lang") === "en", buckets = 1024)

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

  /** q178: golden-record survivorship ([[graft.enrich.GoldenRecord]])
    * over the q101 near-dup clusters — argmax-by-length representative,
    * sorted distinct source union. */
  private def q178_golden_record(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val clustered = graft.dedup.FuzzyClusters
      .minhashClusters(docs, "text", "doc_id",
        k = 2, numHashes = 32, bands = 8, num = 1, den = 3)
      .select(col("doc_id"), col("cluster_id"))
    graft.enrich.GoldenRecord.collapse(clustered,
      docs.select(col("doc_id"), col("n_chars"), col("source")),
      "doc_id", "cluster_id", "n_chars", "source")
  }

  /** q179: classifier calibration report — decile buckets of a
    * ppm-mapped score vs the observed positive rate, with per-bucket
    * Brier in ppm. The score is q116's hashed-linear classifier (exact
    * integers), the label an exact length gate, so every column is an
    * integer the oracle restates verbatim. */
  private def q179_calibration(s: SparkSession, dir: String): DataFrame = {
    val weights = (0 until 64).map(b => ((b % 7) - 3).toDouble)
    val score = graft.text.Classifier
      .hashedLinearScore(col("text"), weights, bias = 0.0)
    t(s, dir, "documents")
      .select(col("doc_id"), score.cast("long").as("sc"),
        (col("n_chars") >= 300).cast("long").as("y"))
      .withColumn("p_ppm",
        least(lit(1000000L), greatest(lit(0L), lit(500000L) + col("sc") * 10000)))
      .withColumn("bucket", least(lit(9L), expr("p_ppm div 100000")))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("y")).as("n_pos"),
        expr("(1000000 * sum(y)) div count(1)").as("obs_ppm"),
        expr("sum(p_ppm) div count(1)").as("avg_p_ppm"),
        expr("sum((p_ppm - y * 1000000) * (p_ppm - y * 1000000)) div (count(1) * 1000000)")
          .as("brier_ppm"))
  }

  /** q180: known-item retrieval evaluation — each probe document's
    * 3-token prefix queries the q158 inverted index in ONE batch plan
    * ([[graft.text.InvertedIndex.topKBatch]]); the metric row per query
    * is the source document's rank in the top-10, reciprocal rank in
    * exact integer ppm, and hit@10. */
  private def q180_mrr(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val ix = graft.text.InvertedIndex.build(docs, "doc_id", "text")
    val queries = docs.where(col("doc_id") < 20)
      .select(col("doc_id").cast("long").as("qid"),
        array_distinct(slice(graft.text.TextAnalysis.tokens(col("text")), 1, 3))
          .as("terms"))
    val top = graft.text.InvertedIndex.topKBatch(ix, queries, "qid", "terms", k = 10)
    queries.select(col("qid"))
      .join(top.where(col("id") === col("qid"))
        .select(col("qid"), col("rank")), Seq("qid"), "left")
      .select(col("qid"),
        coalesce(col("rank"), lit(0)).cast("long").as("rank_in_top10"),
        coalesce(expr("1000000 div rank"), lit(0L)).as("rr_ppm"),
        col("rank").isNotNull.cast("int").as("hit10"))
  }

  /** q181: temperature-scaled source mixing (α = 0.3, the XLM-R
    * flattening) — per-source corpus share, tempered target share and
    * the q/p sampling-rate multiplier, in ppm. */
  private def q181_temperature_mix(s: SparkSession, dir: String): DataFrame =
    graft.text.Sampling.temperatureWeights(
      t(s, dir, "documents"), "source", alpha = 0.3)

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

  /** q184: filtered vector search ([[graft.similarity.Ann.filteredTopK]])
    * — top-3 neighbors restricted to a selective predicate (label 3,
    * even ids ≈ 6% of the corpus), which routes to the exact pre-filter
    * path; the oracle is q21's brute-force restated over the filtered
    * corpus. The broad-predicate IVF route is spec'd + probed. */
  private def q184_filtered_ann(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    graft.similarity.Ann.filteredTopK(
        emb, emb.where(col("vec_id") < 50), "vec_id", "embedding",
        col("label") === 3 && col("vec_id") % 2 === 0, k = 3)
      .select(col("probe_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
  }

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

  /** q186: CUBE over (returnflag, linestatus) with the grouping id —
    * the full lattice q56's ROLLUP only walks one chain of. */
  private def q186_cube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().cast("long").as("gid"), count(lit(1)).as("n"),
        sum(col("l_quantity")).as("sum_qty"))
      .select(col("l_returnflag"), col("l_linestatus"), col("gid"),
        col("n"), col("sum_qty"))

  /** q188: chi-square feature selection
    * ([[graft.text.FeatureSelect.chiSquare]]) — terms that most
    * distinguish source `src0` from the rest, exact centi-units. */
  private def q188_chi2(s: SparkSession, dir: String): DataFrame =
    graft.text.FeatureSelect.chiSquare(
      t(s, dir, "documents"), "doc_id", "text", col("source") === "src0")

  /** q189: modified n-gram precision ([[graft.text.Overlap]]) — each
    * even document scored as a candidate against the next document as
    * reference, unigram and bigram clipped precision in exact ppm. */
  private def q189_ngram_overlap(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val pairs = docs.select(col("doc_id").as("pair_id"), col("text").as("cand"))
      .where(col("pair_id") % 2 === 0)
      .join(docs.select((col("doc_id") - 1).as("pair_id"),
        col("text").as("ref")), Seq("pair_id"))
    val p1 = graft.text.Overlap.modifiedPrecision(pairs, "pair_id", "cand", "ref", 1)
      .withColumnsRenamed(Map("hit" -> "hit1", "tot" -> "tot1", "p_ppm" -> "p1_ppm"))
    val p2 = graft.text.Overlap.modifiedPrecision(pairs, "pair_id", "cand", "ref", 2)
      .withColumnsRenamed(Map("hit" -> "hit2", "tot" -> "tot2", "p_ppm" -> "p2_ppm"))
    p1.join(p2, Seq("pair_id"))
  }

  /** q190: reciprocal-rank fusion ([[graft.text.Rrf]]) — a lexical
    * ranking (term frequency of "spark") fused with a length prior,
    * each depth-100, the hybrid-retrieval combination shape. */
  private def q190_rrf(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = t(s, dir, "documents")
    val lex = docs
      .select(col("doc_id"),
        size(filter(split(col("text"), " "), _ === "spark")).as("tf"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("tf").desc, col("doc_id"))))
      .where(col("rank") <= 100)
    val len = docs
      .select(col("doc_id"), col("n_chars"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_chars").desc, col("doc_id"))))
      .where(col("rank") <= 100)
    graft.text.Rrf.fuse(Seq(lex.select("doc_id", "rank"),
      len.select("doc_id", "rank")), "doc_id", "rank", c = 60, k = 50)
  }

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

  /** q194: hard-negative mining ([[graft.similarity.Ann.hardNegatives]])
    * — top-5 negatives per probe with the near-duplicate band
    * (cos ≥ 0.35 here) excluded, the contrastive-training sampling
    * shape; oracle restates the banded ranking over exact cosines. */
  private def q194_hard_negatives(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    graft.similarity.Ann.hardNegatives(
        emb, emb.where(col("vec_id") < 30), "vec_id", "embedding",
        k = 5, maxSim = 0.35)
      .select(col("probe_id"), col("neighbor_id"),
        col("rank").cast("long").as("rank"))
  }

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

  /** q198: strongly connected components ([[graft.graph.Scc]]) — each
    * customer's orders chained by date and closed into a ring for
    * custkey < 300 (one SCC per such customer), left open for 300–399
    * (singleton SCCs); oracle states mutual reachability via a
    * recursive closure. */
  private def q198_scc(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = t(s, dir, "orders").where(col("o_custkey") < 400)
      .select(col("o_custkey").as("c"), col("o_orderkey").as("k"),
        col("o_orderdate"))
    val w = Window.partitionBy(col("c"))
      .orderBy(col("o_orderdate"), col("k"))
    val seq = o.withColumn("nxt", lead(col("k"), 1).over(w))
      .withColumn("rn", row_number().over(w))
    val chain = seq.where(col("nxt").isNotNull)
      .select(col("k").as("src"), col("nxt").as("dst"))
    val closing = seq.where(col("nxt").isNull && col("c") < 300)
      .select(col("c"), col("k").as("src"))
      .join(seq.where(col("rn") === 1).select(col("c"), col("k").as("dst")),
        Seq("c"))
      .select(col("src"), col("dst"))
    graft.graph.Scc.decompose(chain.union(closing))
      .select(col("id").as("o_orderkey"), col("scc"))
  }

  /** q202: q198's SCC FORCED through the distributed divide-and-conquer
    * path (`smallGraphThreshold = 0` disables the driver entry gate, so
    * round 1 runs the full distributed trim + pointer-cycle contraction
    * + B/F label fixpoint + pair split before the in-loop cutover may
    * collapse the remainder). Labels are min-member-id on EITHER path
    * and the output contract is one row per vertex, so the SAME
    * recursive-closure oracle as q198 must hash-match — the correctness
    * gate pins the distributed kernel itself (including the contraction
    * lift-back, whose row cardinality a rep-chain bug once broke), not
    * just the spec differential. */
  private def q202_scc_dist(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = t(s, dir, "orders").where(col("o_custkey") < 400)
      .select(col("o_custkey").as("c"), col("o_orderkey").as("k"),
        col("o_orderdate"))
    val w = Window.partitionBy(col("c"))
      .orderBy(col("o_orderdate"), col("k"))
    val seq = o.withColumn("nxt", lead(col("k"), 1).over(w))
      .withColumn("rn", row_number().over(w))
    val chain = seq.where(col("nxt").isNotNull)
      .select(col("k").as("src"), col("nxt").as("dst"))
    val closing = seq.where(col("nxt").isNull && col("c") < 300)
      .select(col("c"), col("k").as("src"))
      .join(seq.where(col("rn") === 1).select(col("c"), col("k").as("dst")),
        Seq("c"))
      .select(col("src"), col("dst"))
    graft.graph.Scc.decompose(chain.union(closing), smallGraphThreshold = 0)
      .select(col("id").as("o_orderkey"), col("scc"))
  }

  /** q203: PARIS with SPARSE entities — odd custkeys carry no `grp`
    * statement, so the functional-property penalty must NOT fire for
    * them (Suchanek §4 multiplies over statement pairs; silence is not
    * counter-evidence — the round-12 [[graft.enrich.Paris.resolve]]
    * semi-join guard). Closed form: both-even same-10-group pairs agree
    * on both properties (0.625); both-even different-10-group pairs
    * conflict on grp (0.25 · (1 − 0.5) = 0.125); any pair involving an
    * odd key has no grp pair to judge (0.25). All dyadic → hash-exact. */
  private def q203_paris_sparse(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = t(s, dir, "customer")
    val par = cust.select(
      concat(lit("c:"), col("c_custkey")).as("x"), lit("par").as("p"),
      concat(lit("q"), expr("c_custkey div 20")).as("o"),
      lit(false).as("oIsInstance"))
    val grp = cust.where(col("c_custkey") % 2 === 0).select(
      concat(lit("c:"), col("c_custkey")).as("x"), lit("grp").as("p"),
      concat(lit("g"), expr("c_custkey div 10")).as("o"),
      lit(false).as("oIsInstance"))
    val props = Seq(("grp", 0.5, 0.5), ("par", 0.75, 0.25))
      .toDF("p", "fun", "inv_fun")
    val noLitEq = Seq.empty[(String, String, Double)].toDF("o1", "o2", "prob")
    // literal-only fixture: the fixpoint is stable after round 1
    graft.enrich.Paris.resolve(grp.union(par), noLitEq, props, iterations = 3)
      .where(col("x1") < col("x2"))
      .select(col("x1"), col("x2"), col("prob"))
  }

  /** q204: SPARQL UPDATE with a VARIABLE GRAPH template position —
    * `INSERT { GRAPH ?g { … } }` binds the target graph per solution
    * (round-12 fix: the raw `?g` token used to become a literal graph
    * named "?g"). The store-kind join-back must classify the copied
    * segment literals as LITERAL (okind 2) and the nation IRIs the
    * second template copies as IRI (okind 0). */
  private def q204_update_graph_var(s: SparkSession, dir: String): DataFrame =
    graft.rdf.Sparql.update(TpchQuads.quads(s, dir),
      """INSERT { GRAPH ?g { ?c <flag> ?seg . ?c <flagNation> ?n } }
        |WHERE { GRAPH ?g { ?c <segment> ?seg . ?c <nation> ?n } }""".stripMargin)
      .where(col("p").isin("flag", "flagNation"))
      .select(col("s"), col("p"), col("o"), col("g"),
        col("oKind").cast("int").as("okind"))

  /** q205: two GRAPH groups binding the SAME variable in object position
    * under an isLiteral guard — the round-12 metadata-join-key fix in the
    * gate. Both sub-groups project ?seg's (__kind/__dt/__lang) side
    * columns; pre-fix those joined as keys and the null datatype matched
    * nothing, so this exact shape returned EMPTY. */
  private def q205_graph_meta(s: SparkSession, dir: String): DataFrame =
    graft.rdf.Sparql.select(TpchQuads.quads(s, dir),
      """SELECT ?c1 ?c2 ?seg WHERE {
        |  GRAPH <customer> { ?c1 <segment> ?seg }
        |  GRAPH <customer> { ?c2 <segment> ?seg . ?c2 <nation> <n:0> }
        |  FILTER(isLiteral(?seg) && ?c1 != ?c2)
        |}""".stripMargin)

  /** q199: distributed batch kNN join ([[Ann.knnJoin]]) with the probe
    * set = the FULL corpus — the corpus-as-probes shape the serving
    * kernels can't take. Routing is exhaustive here (nprobe = nlist), so
    * the co-partitioned cogroup is EXACT and the oracle restates it as
    * the full self top-3 in SQL. */
  private def q199_knn_join(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val index = Ann.ivfBuild(emb, "vec_id", "embedding", nlist = 8)
    Ann.knnJoin(index, emb, "vec_id", "embedding", k = 3, nprobe = 8)
  }

  /** q201: q199's exact batch kNN join FORCED through the hot-list
    * splitting path (tiny task caps → probe-salt × corpus-salt tiles on
    * every list). Salting is result-invariant by construction — each
    * probe in ONE probe-salt per list, each corpus row in ONE
    * corpus-salt, independent per-probe heaps, one cross-list/cross-salt
    * top-k merge — so the SAME exhaustive-routing oracle as q199 must
    * hash-match: the correctness gate itself pins the salted kernel,
    * not just the spec. */
  private def q201_knn_salted(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val index = Ann.ivfBuild(emb, "vec_id", "embedding", nlist = 8)
    Ann.knnJoin(index, emb, "vec_id", "embedding", k = 3, nprobe = 8,
      maxSim = Double.PositiveInfinity,
      maxPairsPerTask = 3000, maxProbesPerTask = 64)
  }

  /** q200: leakage-safe train/val/test split — whole near-duplicate
    * clusters (q101's components) assigned to splits so no cluster
    * straddles a boundary; split key pinned to the cluster id modulus
    * so the oracle restates it verbatim (production uses the avalanched
    * hash default — see Sampling.leakageSafeSplit's scaladoc). */
  private def q200_leakage_split(s: SparkSession, dir: String): DataFrame =
    graft.text.Sampling.leakageSafeSplit(
      graft.dedup.FuzzyClusters.minhashClusters(
          t(s, dir, "documents"), "text", "doc_id",
          k = 2, numHashes = 32, bands = 8, num = 1, den = 3)
        .select(col("doc_id"), col("cluster_id").as("component")),
      "component", Seq(7, 2, 1), splitKey = col("component"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = ListMap(
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
    "q13_closure" -> (q13_closure _),
    "q14_components" -> (q14_components _),
    "q15_ifp_pairs" -> (q15_ifp_pairs _),
    "q16_dedup_exact" -> (q16_dedup_exact _),
    "q17_token_count" -> (q17_token_count _),
    "q18_fingerprint" -> (q18_fingerprint _),
    "q19_ngram_jaccard" -> (q19_ngram_jaccard _),
    "q20_sessionize" -> (q20_sessionize _),
    "q21_ann_top1" -> (q21_ann_top1 _),
    "q22_regex_extract" -> (q22_regex_extract _),
    "q23_duration_ms" -> (q23_duration_ms _),
    "q24_levenshtein" -> (q24_levenshtein _),
    "q25_minhash_lsh" -> (q25_minhash_lsh _),
    "q26_simhash" -> (q26_simhash _),
    "q27_cosine_pairs" -> (q27_cosine_pairs _),
    "q28_idf" -> (q28_idf _),
    "q29_histogram" -> (q29_histogram _),
    "q30_token_blocking" -> (q30_token_blocking _),
    "q31_bgp" -> (q31_bgp _),
    "q32_optional" -> (q32_optional _),
    "q33_graph_count" -> (q33_graph_count _),
    "q34_store_diff" -> (q34_store_diff _),
    "q35_negation_guard" -> (q35_negation_guard _),
    "q36_primary_facet" -> (q36_primary_facet _),
    "q37_bgp_union" -> (q37_bgp_union _),
    "q38_haversine" -> (q38_haversine _),
    "q39_stays" -> (q39_stays _),
    "q40_event_stay_match" -> (q40_event_stay_match _),
    "q41_agent_match" -> (q41_agent_match _),
    "q42_inference" -> (q42_inference _),
    "q43_subselect" -> (q43_subselect _),
    "q44_scalar_count" -> (q44_scalar_count _),
    "q45_max_pair" -> (q45_max_pair _),
    "q46_weighted_dist" -> (q46_weighted_dist _),
    "q47_email_parse" -> (q47_email_parse _),
    "q48_quality" -> (q48_quality _),
    "q49_multimodal" -> (q49_multimodal _),
    "q50_ann_ivf" -> (q50_ann_ivf _),
    "q51_lsh_pairs" -> (q51_lsh_pairs _),
    "q52_paris" -> (q52_paris _),
    "q53_class_primary" -> (q53_class_primary _),
    "q54_salted_agg" -> (q54_salted_agg _),
    "q55_count_distinct" -> (q55_count_distinct _),
    "q56_rollup" -> (q56_rollup _),
    "q57_sparql" -> (q57_sparql _),
    "q58_stays_oracle" -> (q58_stays_oracle _),
    "q59_topk_agg" -> (q59_topk_agg _),
    "q60_intersect" -> (q60_intersect _),
    "q61_except" -> (q61_except _),
    "q62_string_funcs" -> (q62_string_funcs _),
    "q63_date_funcs" -> (q63_date_funcs _),
    "q64_running" -> (q64_running _),
    "q65_dedup_keep" -> (q65_dedup_keep _),
    "q66_windowed_stays" -> (q66_windowed_stays _),
    "q67_sparql_agg" -> (q67_sparql_agg _),
    "q68_sparql_path" -> (q68_sparql_path _),
    "q69_image_meta" -> (q69_image_meta _),
    "q70_langid" -> (q70_langid _),
    "q71_gopher_quality" -> (q71_gopher_quality _),
    "q72_construct" -> (q72_construct _),
    "q73_not_exists" -> (q73_not_exists _),
    "q74_neg_prop" -> (q74_neg_prop _),
    "q75_sparql_update" -> (q75_sparql_update _),
    "q76_image_embed" -> (q76_image_embed _),
    "q77_lm_score" -> (q77_lm_score _),
    "q78_repetition" -> (q78_repetition _),
    "q79_decontaminate" -> (q79_decontaminate _),
    "q80_packing" -> (q80_packing _),
    "q81_alternation" -> (q81_alternation _),
    "q82_span_dedup" -> (q82_span_dedup _),
    "q83_describe" -> (q83_describe _),
    "q84_semantic_dedup" -> (q84_semantic_dedup _),
    "q85_stratified_sample" -> (q85_stratified_sample _),
    "q86_top_bigrams" -> (q86_top_bigrams _),
    "q87_group_concat" -> (q87_group_concat _),
    "q88_bm25" -> (q88_bm25 _),
    "q89_having" -> (q89_having _),
    "q90_sparql_expr" -> (q90_sparql_expr _),
    "q91_path_quant" -> (q91_path_quant _),
    "q92_rdfs" -> (q92_rdfs _),
    "q93_graph_mgmt" -> (q93_graph_mgmt _),
    "q94_pii_redact" -> (q94_pii_redact _),
    "q95_url_classify" -> (q95_url_classify _),
    "q96_curation" -> (q96_curation _),
    "q97_nested_path" -> (q97_nested_path _),
    "q98_rdf_roundtrip" -> (q98_rdf_roundtrip _),
    "q99_repetition" -> (q99_repetition _),
    "q100_contamination" -> (q100_contamination _),
    "q101_fuzzy_keeplist" -> (q101_fuzzy_keeplist _),
    "q102_audio" -> (q102_audio _),
    "q103_video" -> (q103_video _),
    "q104_epoch_mixture" -> (q104_epoch_mixture _),
    "q105_rate_sample" -> (q105_rate_sample _),
    "q106_chunking" -> (q106_chunking _),
    "q107_hll_distinct" -> (q107_hll_distinct _),
    "q108_cms_heavy" -> (q108_cms_heavy _),
    "q109_bloom_join" -> (q109_bloom_join _),
    "q110_warc" -> (q110_warc _),
    "q111_html_extract" -> (q111_html_extract _),
    "q112_zorder_key" -> (q112_zorder_key _),
    "q113_blocklist" -> (q113_blocklist _),
    "q114_segment_dedup" -> (q114_segment_dedup _),
    "q115_det_shuffle" -> (q115_det_shuffle _),
    "q116_quality_classifier" -> (q116_quality_classifier _),
    "q117_source_cap" -> (q117_source_cap _),
    "q118_corpus_stats" -> (q118_corpus_stats _),
    "q119_keywords" -> (q119_keywords _),
    "q120_asof_join" -> (q120_asof_join _),
    "q121_pagerank" -> (q121_pagerank _),
    "q122_winnow" -> (q122_winnow _),
    "q123_group_sample" -> (q123_group_sample _),
    "q124_salted_join" -> (q124_salted_join _),
    "q125_vocab" -> (q125_vocab _),
    "q126_winnow_pairs" -> (q126_winnow_pairs _),
    "q127_gap_fill" -> (q127_gap_fill _),
    "q128_pivot" -> (q128_pivot _),
    "q129_funnel" -> (q129_funnel _),
    "q130_profile" -> (q130_profile _),
    "q131_sampled_quantile" -> (q131_sampled_quantile _),
    "q132_tumbling" -> (q132_tumbling _),
    "q133_setsim_join" -> (q133_setsim_join _),
    "q134_triangles" -> (q134_triangles _),
    "q135_scd2" -> (q135_scd2 _),
    "q136_script_profile" -> (q136_script_profile _),
    "q137_sorted_neighborhood" -> (q137_sorted_neighborhood _),
    "q138_bpe_tokens" -> (q138_bpe_tokens _),
    "q139_cdc_merge" -> (q139_cdc_merge _),
    "q140_assoc_rules" -> (q140_assoc_rules _),
    "q141_exif" -> (q141_exif _),
    "q142_mad_outliers" -> (q142_mad_outliers _),
    "q143_expectations" -> (q143_expectations _),
    "q144_ivm" -> (q144_ivm _),
    "q145_compression" -> (q145_compression _),
    "q146_centroids" -> (q146_centroids _),
    "q147_rank_windows" -> (q147_rank_windows _),
    "q148_json_props" -> (q148_json_props _),
    "q149_containment" -> (q149_containment _),
    "q150_nfc_keys" -> (q150_nfc_keys _),
    "q151_group_ols" -> (q151_group_ols _),
    "q152_auc" -> (q152_auc _),
    "q153_ks_drift" -> (q153_ks_drift _),
    "q154_table_diff" -> (q154_table_diff _),
    "q155_tvd_drift" -> (q155_tvd_drift _),
    "q156_concentration" -> (q156_concentration _),
    "q157_confusion" -> (q157_confusion _),
    "q158_bm25_topk" -> (q158_bm25_topk _),
    "q159_heavy_hitters" -> (q159_heavy_hitters _),
    "q160_fellegi_sunter" -> (q160_fellegi_sunter _),
    "q161_hits" -> (q161_hits _),
    "q162_kcore" -> (q162_kcore _),
    "q163_gram" -> (q163_gram _),
    "q164_bfs" -> (q164_bfs _),
    "q165_weighted_sample" -> (q165_weighted_sample _),
    "q166_range_lookup" -> (q166_range_lookup _),
    "q167_chi2" -> (q167_chi2 _),
    "q168_geofence" -> (q168_geofence _),
    "q169_sssp" -> (q169_sssp _),
    "q170_pareto" -> (q170_pareto _),
    "q171_cohort" -> (q171_cohort _),
    "q172_transitions" -> (q172_transitions _),
    "q174_dsir" -> (q174_dsir _),
    "q175_winsorize" -> (q175_winsorize _),
    "q176_loo_encode" -> (q176_loo_encode _),
    "q177_kmv_overlap" -> (q177_kmv_overlap _),
    "q178_golden_record" -> (q178_golden_record _),
    "q179_calibration" -> (q179_calibration _),
    "q180_mrr" -> (q180_mrr _),
    "q181_temperature_mix" -> (q181_temperature_mix _),
    "q182_seasonal" -> (q182_seasonal _),
    "q183_k_anonymity" -> (q183_k_anonymity _),
    "q184_filtered_ann" -> (q184_filtered_ann _),
    "q185_zorder" -> (q185_zorder _),
    "q186_cube" -> (q186_cube _),
    "q188_chi2" -> (q188_chi2 _),
    "q189_ngram_overlap" -> (q189_ngram_overlap _),
    "q190_rrf" -> (q190_rrf _),
    "q191_cms" -> (q191_cms _),
    "q192_hll" -> (q192_hll _),
    "q193_ewma" -> (q193_ewma _),
    "q194_hard_negatives" -> (q194_hard_negatives _),
    "q195_grouping_sets" -> (q195_grouping_sets _),
    "q196_trailing_window" -> (q196_trailing_window _),
    "q197_except_all" -> (q197_except_all _),
    "q198_scc" -> (q198_scc _),
    "q199_knn_join" -> (q199_knn_join _),
    "q201_knn_salted" -> (q201_knn_salted _),
    "q202_scc_dist" -> (q202_scc_dist _),
    "q203_paris_sparse" -> (q203_paris_sparse _),
    "q206_nan_rate" -> (q206_nan_rate _),
    "q204_update_graph_var" -> (q204_update_graph_var _),
    "q205_graph_meta" -> (q205_graph_meta _),
    "q200_leakage_split" -> (q200_leakage_split _)
  )

  val oracleSql: Map[String, String] = ListMap(
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
    "q13_closure" ->
      """WITH RECURSIVE edges(src, dst) AS (
        |  SELECT 'S' || s_suppkey, 'N' || s_nationkey FROM supplier
        |  UNION ALL
        |  SELECT 'N' || n_nationkey, 'R' || n_regionkey FROM nation
        |), reach(src, dst) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        |) SELECT src, dst FROM reach""".stripMargin,
    "q14_components" ->
      """SELECT event_id, min(event_id) OVER (PARTITION BY user_id) AS component
        |FROM events""".stripMargin,
    "q15_ifp_pairs" ->
      """SELECT a.p_partkey AS s1, b.p_partkey AS s2 FROM part a JOIN part b
        |ON a.p_brand = b.p_brand AND a.p_size = b.p_size
        |AND a.p_partkey < b.p_partkey""".stripMargin,
    "q16_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS dups
        |FROM documents GROUP BY text""".stripMargin,
    "q17_token_count" ->
      """SELECT doc_id,
        |  len(list_filter(regexp_split_to_array(text, '[\s[:punct:]]+'), x -> len(x) > 0)) AS n_tokens
        |FROM documents""".stripMargin,
    "q18_fingerprint" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |FROM documents""".stripMargin,
    "q19_ngram_jaccard" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '[\s[:punct:]]+'), x -> len(x) > 0) AS ts
        |  FROM documents
        |), idx AS (
        |  SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 1)) AS i
        |  FROM toks WHERE len(ts) >= 2
        |), sh AS (
        |  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] AS shingle FROM idx
        |), sizes AS (
        |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
        |), inter AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id
        |)
        |SELECT id1, id2 FROM inter
        |JOIN sizes sa ON sa.doc_id = id1 JOIN sizes sb ON sb.doc_id = id2
        |WHERE 3 * inter > 1 * (sa.n + sb.n - inter)""".stripMargin,
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
    "q21_ann_top1" ->
      """SELECT probe_id, neighbor_id FROM (
        |  SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY a.vec_id
        |      ORDER BY round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 9) DESC, b.vec_id) AS rk
        |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
        |  WHERE a.vec_id < 100
        |) WHERE rk = 1""".stripMargin,
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
    // q25: the LSH-banded pairs equal the full exact-Jaccard pair set on
    // this corpus (recall 1 — planted near-dups carry high Jaccard), so
    // the oracle is q19's; a banding recall loss now FAILS the gate.
    "q25_minhash_lsh" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '[\s[:punct:]]+'), x -> len(x) > 0) AS ts
        |  FROM documents
        |), idx AS (
        |  SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 1)) AS i
        |  FROM toks WHERE len(ts) >= 2
        |), sh AS (
        |  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] AS shingle FROM idx
        |), sizes AS (
        |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
        |), inter AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id
        |)
        |SELECT id1, id2 FROM inter
        |JOIN sizes sa ON sa.doc_id = id1 JOIN sizes sb ON sb.doc_id = id2
        |WHERE 3 * inter > 1 * (sa.n + sb.n - inter)""".stripMargin,
    // q26: full md5-family simhash restated in SQL — token hash = top 60
    // bits of md5 (first 15 hex chars), per-bit majority vote, exact
    // Hamming ball over the fingerprints (blocking guarantees recall).
    "q26_simhash" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[\s[:punct:]]+'), x -> len(x) > 0) AS ts
        |  FROM documents
        |), tok AS (
        |  SELECT doc_id, unnest(ts) AS t FROM toks
        |), th AS (
        |  SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h FROM tok
        |), votes AS (
        |  SELECT doc_id, b,
        |    sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
        |  FROM th, generate_series(0, 59) g(b)
        |  GROUP BY doc_id, b
        |), fp AS (
        |  SELECT doc_id, sum(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END) AS fp
        |  FROM votes GROUP BY doc_id
        |)
        |SELECT a.doc_id AS id1, b.doc_id AS id2,
        |  bit_count(xor(a.fp, b.fp)) AS hamming
        |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.fp, b.fp)) <= 3""".stripMargin,
    "q27_cosine_pairs" ->
      """SELECT a.vec_id AS id1, b.vec_id AS id2
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) > 0.4""".stripMargin,
    "q28_idf" ->
      """WITH toks AS (
        |  SELECT DISTINCT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '[\s[:punct:]]+'), x -> len(x) > 0)) AS tok
        |  FROM documents
        |), n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents)
        |SELECT tok, count(*) AS df, round(ln(n_docs / count(*)), 9) AS idf
        |FROM toks, n GROUP BY tok, n_docs""".stripMargin,
    "q29_histogram" ->
      """SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS bucket_start,
        |  count(*) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1""".stripMargin,
    "q30_token_blocking" ->
      """WITH toks AS (
        |  SELECT DISTINCT p_partkey, unnest(list_filter(regexp_split_to_array(lower(p_name), '[\s[:punct:]]+'), x -> len(x) > 0)) AS tok
        |  FROM part
        |), rare AS (
        |  SELECT tok FROM toks GROUP BY tok
        |  HAVING count(*) <= 0.2 * (SELECT count(*) FROM part)
        |), pruned AS (
        |  SELECT p_partkey, tok FROM (
        |    SELECT p_partkey, toks.tok,
        |      row_number() OVER (PARTITION BY toks.tok ORDER BY p_partkey) AS rk
        |    FROM toks JOIN rare ON toks.tok = rare.tok
        |  ) WHERE rk <= 100
        |)
        |SELECT a.p_partkey AS id1, b.p_partkey AS id2, count(*) AS shared_tokens
        |FROM pruned a JOIN pruned b ON a.tok = b.tok AND a.p_partkey < b.p_partkey
        |GROUP BY a.p_partkey, b.p_partkey""".stripMargin,
    "q31_bgp" ->
      """SELECT 'c:' || c_custkey AS c, c_name AS cname, n_name AS nname
        |FROM customer JOIN nation ON c_nationkey = n_nationkey""".stripMargin,
    "q32_optional" ->
      """SELECT 'c:' || c_custkey AS c, c_name AS cname,
        |  count(o_orderkey) AS n_f_orders
        |FROM customer LEFT JOIN orders
        |  ON o_custkey = c_custkey AND o_orderstatus = 'F'
        |GROUP BY 1, 2""".stripMargin,
    "q33_graph_count" ->
      """SELECT 'customer' AS g, 3 * count(*) AS n FROM customer
        |UNION ALL SELECT 'nation', 2 * count(*) FROM nation
        |UNION ALL SELECT 'orders', 3 * count(*) FROM orders""".stripMargin,
    "q34_store_diff" ->
      """SELECT 'c:' || c_custkey AS s, 'segment' AS p,
        |  lower(c_mktsegment) AS o, 'added' AS op
        |FROM customer WHERE c_nationkey < 12
        |UNION ALL
        |SELECT 'c:' || c_custkey, 'segment', c_mktsegment, 'removed'
        |FROM customer WHERE c_nationkey < 12""".stripMargin,
    "q35_negation_guard" ->
      """SELECT 'c:' || c_custkey AS s, c_name AS o FROM customer
        |WHERE c_custkey % 10 <> 0""".stripMargin,
    "q36_primary_facet" ->
      """SELECT nat, c AS primary_c, n_orders FROM (
        |  SELECT 'n:' || c_nationkey AS nat, 'c:' || c_custkey AS c,
        |    count(*) AS n_orders,
        |    row_number() OVER (PARTITION BY c_nationkey
        |      ORDER BY count(*) DESC, 'c:' || c_custkey) AS rk
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY c_nationkey, c_custkey
        |) WHERE rk = 1""".stripMargin,
    "q37_bgp_union" ->
      """SELECT c, count(*) AS n FROM (
        |  SELECT 'o:' || o_orderkey AS o, 'c:' || o_custkey AS c
        |  FROM orders WHERE o_orderstatus = 'F'
        |  UNION ALL
        |  SELECT 'o:' || o_orderkey, NULL FROM orders
        |  WHERE o_orderpriority = '1-URGENT'
        |) GROUP BY c""".stripMargin,
    // haversine predicate: derived places sit at ~0/7.2/14.4/21.6 km from
    // the anchor; the 9 km cut keeps exactly value-buckets 0 and 1, which
    // the oracle states directly (margin-safe independent of trig libm).
    "q38_haversine" ->
      "SELECT event_id FROM events WHERE floor(value / 50) <= 1",
    // identical-name pairs, but only those surviving the blocking prune:
    // tokens in more than 25% of parts generate no candidates, so a name
    // whose BOTH tokens are that frequent cannot be paired.
    "q41_agent_match" ->
      """WITH toks AS (
        |  SELECT DISTINCT p_partkey, unnest(list_filter(regexp_split_to_array(lower(p_name), '[\s[:punct:]]+'), x -> len(x) > 0)) AS tok
        |  FROM part
        |), rare AS (
        |  SELECT tok FROM toks GROUP BY tok
        |  HAVING count(*) <= 0.25 * (SELECT count(*) FROM part)
        |), pruned AS (
        |  SELECT p_partkey, tok FROM (
        |    SELECT p_partkey, toks.tok,
        |      row_number() OVER (PARTITION BY toks.tok ORDER BY p_partkey) AS rk
        |    FROM toks JOIN rare ON toks.tok = rare.tok
        |  ) WHERE rk <= 200
        |), blocked AS (
        |  SELECT DISTINCT a.p_partkey AS id1, b.p_partkey AS id2
        |  FROM pruned a JOIN pruned b ON a.tok = b.tok AND a.p_partkey < b.p_partkey
        |)
        |SELECT id1, id2 FROM blocked
        |JOIN part pa ON pa.p_partkey = id1
        |JOIN part pb ON pb.p_partkey = id2
        |WHERE lower(pa.p_name) = lower(pb.p_name)""".stripMargin,
    "q42_inference" ->
      "SELECT 'c:' || o_custkey AS s, 'o:' || o_orderkey AS o FROM orders",
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
    "q48_quality" ->
      """WITH toks AS (
        |  SELECT doc_id, text,
        |    list_filter(regexp_split_to_array(text, '[\s[:punct:]]+'), x -> len(x) > 0) AS ts
        |  FROM documents
        |)
        |SELECT doc_id,
        |  len(ts) AS n_tokens,
        |  len(list_distinct(list_transform(ts, x -> lower(x)))) AS n_distinct_tokens,
        |  len(list_filter(list_transform(ts, x -> lower(x)),
        |    x -> x IN ('the', 'a', 'of', 'and'))) AS n_stopwords,
        |  coalesce(list_max(list_transform(ts, x -> len(x))), 0) AS max_token_len,
        |  CAST(list_sum(list_transform(ts, w -> CAST(ceil(len(w) / 4.0) AS BIGINT))) AS BIGINT)
        |    + len(regexp_extract_all(text, '[[:punct:]]')) AS n_pieces
        |FROM toks""".stripMargin,
    "q49_multimodal" ->
      "SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes FROM documents",
    // q51: the LCG hyperplane family (31-bit mix, exact integer ops) is
    // restated verbatim; buckets agree bit-for-bit and the verified pair
    // set hash-compares. Sign margins: min |dot| ~1e-4 on this corpus.
    "q51_lsh_pairs" ->
      """WITH v AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        |), comp AS (
        |  SELECT t, p, d,
        |    (((1103515245::BIGINT * (t*1000003 + p*10007 + d) + 12345) % 2147483648)
        |      / 2147483648.0) * 2 - 1 AS c
        |  FROM generate_series(0, 3) gt(t), generate_series(0, 9) gp(p),
        |       generate_series(0, 63) gd(d)
        |), dots AS (
        |  SELECT vec_id, t, p, sum(e[d+1] * c) AS s
        |  FROM v, comp GROUP BY vec_id, t, p
        |), buckets AS (
        |  SELECT vec_id, t, sum(CASE WHEN s >= 0 THEN (1::BIGINT << p) ELSE 0 END) AS b
        |  FROM dots GROUP BY vec_id, t
        |), cands AS (
        |  SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
        |  FROM buckets a JOIN buckets b
        |    ON a.t = b.t AND a.b = b.b AND a.vec_id < b.vec_id
        |)
        |SELECT id1, id2 FROM cands
        |JOIN v va ON va.vec_id = id1 JOIN v vb ON vb.vec_id = id2
        |WHERE list_cosine_similarity(va.e, vb.e) > 0.3""".stripMargin,
    // IFP pairs over (brand,size) form cliques, so the component of a part
    // is min(p_partkey) within its (brand,size) group — stated directly.
    "q53_class_primary" ->
      """WITH classes AS (
        |  SELECT p_partkey AS id,
        |    min(p_partkey) OVER (PARTITION BY p_brand, p_size) AS component
        |  FROM part
        |), refs AS (
        |  SELECT l_partkey, count(*) AS n FROM lineitem GROUP BY l_partkey
        |), scored AS (
        |  SELECT component, id, coalesce(n, 0) AS n_refs,
        |    row_number() OVER (PARTITION BY component
        |      ORDER BY coalesce(n, 0) DESC, id) AS rk
        |  FROM classes LEFT JOIN refs ON id = l_partkey
        |)
        |SELECT component, id AS primary_id, n_refs FROM scored WHERE rk = 1""".stripMargin,
    "q54_salted_agg" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q55_count_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q56_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q57_sparql" ->
      """SELECT 'c:' || c_custkey AS c, c_name AS cname, n_name AS nname
        |FROM customer JOIN nation ON c_nationkey = n_nationkey""".stripMargin,
    // q39: q58's islands plus the 6-decimal-rounded centroid columns —
    // exact on this geometry (see q39's scaladoc; StaySpec pins the
    // centroid-rounding identity).
    "q39_stays" ->
      """WITH obs AS (
        |  SELECT user_id AS u, epoch_ms(ts) AS t, floor(value / 50) AS b
        |  FROM events
        |), ord AS (
        |  SELECT u, t, b,
        |    CASE WHEN lag(b) OVER (PARTITION BY u ORDER BY t) = b
        |      THEN 0 ELSE 1 END AS brk
        |  FROM obs
        |), isl AS (
        |  SELECT u, t, b, sum(brk) OVER (PARTITION BY u ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM ord
        |)
        |SELECT u AS user, min(t) AS start_ms, max(t) AS end_ms,
        |  round(40.0 + min(b) * 0.05, 6) AS lat,
        |  round(-74.0 + min(b) * 0.05, 6) AS lon,
        |  count(*) AS n_obs
        |FROM isl GROUP BY u, island
        |HAVING max(t) - min(t) >= 600000""".stripMargin,
    "q58_stays_oracle" ->
      """WITH obs AS (
        |  SELECT user_id AS u, epoch_ms(ts) AS t, floor(value / 50) AS b
        |  FROM events
        |), ord AS (
        |  SELECT u, t, b,
        |    CASE WHEN lag(b) OVER (PARTITION BY u ORDER BY t) = b
        |      THEN 0 ELSE 1 END AS brk
        |  FROM obs
        |), isl AS (
        |  SELECT u, t, sum(brk) OVER (PARTITION BY u ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM ord
        |)
        |SELECT u AS user, min(t) AS start_ms, max(t) AS end_ms,
        |  count(*) AS n_obs
        |FROM isl GROUP BY u, island
        |HAVING max(t) - min(t) >= 600000""".stripMargin,
    // q40: stays = q58's islands; distance gate = site equality; overlap
    // ratio = exact integer epoch arithmetic (see q40's scaladoc).
    "q40_event_stay_match" ->
      """WITH obs AS (
        |  SELECT user_id AS u, epoch_ms(ts) AS t, floor(value / 50) AS b
        |  FROM events
        |), ord AS (
        |  SELECT u, t, b,
        |    CASE WHEN lag(b) OVER (PARTITION BY u ORDER BY t) = b
        |      THEN 0 ELSE 1 END AS brk
        |  FROM obs
        |), isl AS (
        |  SELECT u, t, b, sum(brk) OVER (PARTITION BY u ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM ord
        |), stays AS (
        |  SELECT u, min(t) AS start_ms, max(t) AS end_ms, min(b) AS b
        |  FROM isl GROUP BY u, island
        |  HAVING max(t) - min(t) >= 600000
        |), ev AS (
        |  SELECT event_id, epoch_us(ts) AS es_us,
        |    epoch_us(ts) + 1800000000 AS ee_us, floor(value / 50) AS b
        |  FROM events
        |)
        |SELECT e.event_id, s.u || '_' || s.start_ms AS stay_id
        |FROM ev e JOIN stays s ON e.b = s.b
        |  AND e.es_us <= s.end_ms * 1000 AND s.start_ms * 1000 <= e.ee_us
        |WHERE CAST((least(e.ee_us, s.end_ms*1000) // 1000000)
        |      - (greatest(e.es_us, s.start_ms*1000) // 1000000) AS DOUBLE)
        |    / CAST((e.ee_us // 1000000) - (e.es_us // 1000000) AS DOUBLE) > 0.2""".stripMargin,
    // q66: on this geometry the windowed/Viterbi extractor provably
    // reduces to the greedy clusterer (see q66's scaladoc) — same
    // gaps-and-islands statement as q58.
    "q66_windowed_stays" ->
      """WITH obs AS (
        |  SELECT user_id AS u, epoch_ms(ts) AS t, floor(value / 50) AS b
        |  FROM events
        |), ord AS (
        |  SELECT u, t, b,
        |    CASE WHEN lag(b) OVER (PARTITION BY u ORDER BY t) = b
        |      THEN 0 ELSE 1 END AS brk
        |  FROM obs
        |), isl AS (
        |  SELECT u, t, sum(brk) OVER (PARTITION BY u ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM ord
        |)
        |SELECT u AS user, min(t) AS start_ms, max(t) AS end_ms,
        |  count(*) AS n_obs
        |FROM isl GROUP BY u, island
        |HAVING max(t) - min(t) >= 600000""".stripMargin,
    "q59_topk_agg" ->
      """SELECT o_custkey, o_orderkey, rk FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders
        |) WHERE rk <= 3""".stripMargin,
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
    "q65_dedup_keep" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '[\s[:punct:]]+'), x -> len(x) > 0) AS ts
        |  FROM documents
        |), idx AS (
        |  SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 1)) AS i
        |  FROM toks WHERE len(ts) >= 2
        |), sh AS (
        |  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] AS shingle FROM idx
        |), sizes AS (
        |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
        |), inter AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id
        |), pairs AS (
        |  SELECT id1, id2 FROM inter
        |  JOIN sizes sa ON sa.doc_id = id1 JOIN sizes sb ON sb.doc_id = id2
        |  WHERE 3 * inter > 1 * (sa.n + sb.n - inter)
        |), sym AS (
        |  SELECT id1 AS a, id2 AS b FROM pairs
        |  UNION SELECT id2, id1 FROM pairs
        |), reach(a, b) AS (
        |  SELECT a, b FROM sym
        |  UNION
        |  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
        |)
        |SELECT d.doc_id AS id,
        |  least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS keep_id
        |FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
        |GROUP BY d.doc_id""".stripMargin,
    "q52_paris" ->
      """SELECT 'c:' || a.c_custkey AS x1, 'c:' || b.c_custkey AS x2,
        |  CAST(CASE WHEN a.c_custkey // 10 = b.c_custkey // 10
        |    THEN 0.625 ELSE 0.125 END AS DOUBLE) AS prob
        |FROM customer a JOIN customer b
        |  ON a.c_custkey // 20 = b.c_custkey // 20
        |  AND 'c:' || a.c_custkey < 'c:' || b.c_custkey""".stripMargin,
    "q67_sparql_agg" ->
      """SELECT 'c:' || c_custkey AS c, c_name AS cname,
        |  (SELECT count(*) FROM orders o
        |   WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus IN ('F', 'O'))
        |    AS n_orders
        |FROM customer c""".stripMargin,
    "q68_sparql_path" ->
      """SELECT 'n:' || n.n_nationkey AS n, count(*) AS ncust
        |FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
        |WHERE n.n_regionkey = (SELECT n_regionkey FROM nation WHERE n_nationkey = 24)
        |  AND n.n_nationkey <= 24
        |GROUP BY 1""".stripMargin,
    "q69_image_meta" ->
      """SELECT doc_id,
        |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image/png'
        |    WHEN 1 THEN 'image/jpeg' ELSE 'image/gif' END AS mime,
        |  CAST(doc_id % 64 + 1 AS INT) AS width,
        |  CAST((doc_id * 7) % 64 + 1 AS INT) AS height
        |FROM documents""".stripMargin,
    "q71_gopher_quality" ->
      """WITH w AS (
        |  SELECT doc_id, text,
        |    list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0) AS words,
        |    string_split(text, chr(10)) AS lines,
        |    list_filter(regexp_split_to_array(text, '[\s[:punct:]]+'), x -> len(x) > 0) AS ts
        |  FROM documents
        |), c AS (
        |  SELECT doc_id,
        |    CAST(len(words) AS BIGINT) AS n_words,
        |    CAST(coalesce(list_sum(list_transform(words, x -> len(x))), 0) AS BIGINT) AS sum_word_len,
        |    CAST(len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS n_alpha_words,
        |    CAST(len(list_filter(words, x -> contains(x, '#') OR contains(x, '...'))) AS BIGINT) AS n_symbol_words,
        |    CAST(len(lines) AS BIGINT) AS n_lines,
        |    CAST(len(list_filter(lines, l -> starts_with(ltrim(l), '•')
        |      OR starts_with(ltrim(l), '- ') OR starts_with(ltrim(l), '* '))) AS BIGINT) AS n_bullet_lines,
        |    CAST(len(list_filter(lines, l -> ends_with(l, '...'))) AS BIGINT) AS n_ellipsis_lines,
        |    CAST(len(list_filter(list_transform(ts, x -> lower(x)),
        |      x -> x IN ('the', 'a', 'of', 'and'))) AS BIGINT) AS n_stop_hits
        |  FROM w
        |)
        |SELECT doc_id, n_words, sum_word_len, n_alpha_words, n_symbol_words,
        |  n_lines, n_bullet_lines, n_ellipsis_lines, n_stop_hits,
        |  CASE WHEN n_words >= 50 AND n_words <= 100000
        |    AND sum_word_len >= n_words * 3 AND sum_word_len <= n_words * 10
        |    AND n_symbol_words * 10 <= n_words
        |    AND n_bullet_lines * 10 <= n_lines * 9
        |    AND n_ellipsis_lines * 10 <= n_lines * 3
        |    AND n_alpha_words * 5 >= n_words * 4
        |    AND n_stop_hits >= 2 THEN 1 ELSE 0 END AS passes
        |FROM c""".stripMargin,
    "q72_construct" ->
      """SELECT 'c:' || c_custkey AS s, 'inNation' AS p, n_name AS o
        |FROM customer JOIN nation ON c_nationkey = n_nationkey""".stripMargin,
    "q73_not_exists" ->
      """SELECT 'c:' || c_custkey AS c, c_name AS cname FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""".stripMargin,
    "q74_neg_prop" ->
      """SELECT 'c:' || c_custkey AS c, 'n:' || c_nationkey AS o FROM customer""".stripMargin,
    "q75_sparql_update" ->
      """SELECT 'c:' || c_custkey AS s, 'segment' AS p, c_mktsegment AS o,
        |  'customer' AS g
        |FROM customer WHERE c_mktsegment <> 'BUILDING'
        |UNION ALL
        |SELECT 'c:' || c_custkey, 'bucket', c_mktsegment, 'graft:user'
        |FROM customer WHERE c_mktsegment = 'BUILDING'""".stripMargin,
    // the PNG decode is fixtured (see q76FixturePath scaladoc); everything
    // downstream of it — 4x4 box means, mean-centering, L2 norm, cosine
    // top-3 — is restated here. round(sim, 6) absorbs float64-vs-float32
    // noise: the true top-3 are EXACT mod-77 duplicates (sim 1.0 ties in
    // both engines) resolved by the shared (sim DESC, neighbor_id) order,
    // and the nearest non-duplicate sits far below 1 - 1e-6
    "q76_image_embed" ->
      s"""WITH px AS (
        |  SELECT doc_id, y, x, v
        |  FROM read_parquet('$q76FixturePath/*.parquet')
        |), grid AS (
        |  SELECT doc_id, (y // 4) * 8 + (x // 4) AS cell, avg(v / 255.0) AS g
        |  FROM px GROUP BY 1, 2
        |), cent AS (
        |  SELECT doc_id, cell, g - avg(g) OVER (PARTITION BY doc_id) AS c
        |  FROM grid
        |), nrm AS (
        |  SELECT doc_id, cell, c / sqrt(sum(c * c) OVER (PARTITION BY doc_id)) AS e
        |  FROM cent
        |), sims AS (
        |  SELECT p.doc_id AS probe_id, n.doc_id AS neighbor_id,
        |    round(sum(p.e * n.e), 6) AS sim
        |  FROM nrm p JOIN nrm n ON p.cell = n.cell AND n.doc_id <> p.doc_id
        |  WHERE p.doc_id < 10
        |  GROUP BY 1, 2
        |), ranked AS (
        |  SELECT probe_id, neighbor_id, row_number() OVER (
        |    PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rank
        |  FROM sims
        |)
        |SELECT probe_id, neighbor_id, rank FROM ranked WHERE rank <= 3""".stripMargin,
    "q77_lm_score" ->
      """WITH src AS (
        |  SELECT doc_id, regexp_replace(lower(text), '\s+', ' ', 'g') AS s
        |  FROM documents
        |), t AS (
        |  SELECT doc_id, unnest(list_filter(
        |    list_transform(generate_series(1, greatest(len(s) - 2, 1)),
        |      i -> substr(s, i, 3)),
        |    x -> len(x) = 3)) AS tri
        |  FROM src
        |), m AS (SELECT tri, count(*) AS cnt FROM t GROUP BY tri)
        |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tri,
        |  CAST(count(DISTINCT t.tri) AS BIGINT) AS n_distinct_tri,
        |  CAST(sum(CASE WHEN m.cnt <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare
        |FROM t JOIN m USING (tri) GROUP BY t.doc_id""".stripMargin,
    "q78_repetition" ->
      """WITH l AS (
        |  SELECT doc_id, trim(unnest(str_split(text, chr(10)))) AS line
        |  FROM documents
        |), lc AS (
        |  SELECT doc_id, line, count(*) AS c FROM l WHERE len(line) > 0
        |  GROUP BY doc_id, line
        |), ls AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_lines,
        |    CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS n_dup_lines,
        |    CAST(sum(CASE WHEN c > 1 THEN c * len(line) ELSE 0 END) AS BIGINT)
        |      AS n_chars_dup_lines
        |  FROM lc GROUP BY doc_id
        |), w AS (
        |  SELECT doc_id, list_filter(
        |    regexp_split_to_array(lower(text), '[\s[:punct:]]+'),
        |    x -> len(x) > 0) AS ws
        |  FROM documents
        |), bg AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) - 1),
        |    i -> ws[i] || ' ' || ws[i + 1])) AS bigram
        |  FROM w WHERE len(ws) >= 2
        |), bc AS (
        |  SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY doc_id, bigram
        |), bs AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
        |    CAST(max(c) AS BIGINT) AS top_bigram_n
        |  FROM bc GROUP BY doc_id
        |)
        |SELECT doc_id,
        |  coalesce(n_lines, 0) AS n_lines,
        |  coalesce(n_dup_lines, 0) AS n_dup_lines,
        |  coalesce(n_chars_dup_lines, 0) AS n_chars_dup_lines,
        |  coalesce(n_bigrams, 0) AS n_bigrams,
        |  coalesce(top_bigram_n, 0) AS top_bigram_n
        |FROM ls FULL JOIN bs USING (doc_id)""".stripMargin,
    "q79_decontaminate" ->
      """WITH d AS (
        |  SELECT doc_id, list_filter(
        |    regexp_split_to_array(lower(text), '[\s[:punct:]]+'),
        |    x -> len(x) > 0) AS ts
        |  FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id, array_to_string(ts[i:i+2], ' ') AS sh
        |  FROM (SELECT doc_id, ts,
        |          unnest(generate_series(1, greatest(len(ts) - 2, 1))) AS i
        |        FROM d WHERE len(ts) > 0)
        |  WHERE len(array_to_string(ts[i:i+2], ' ')) > 0
        |), tr AS (SELECT * FROM sh WHERE doc_id >= 20),
        |be AS (SELECT * FROM sh WHERE doc_id < 20)
        |SELECT tr.doc_id,
        |  CAST(count(DISTINCT tr.sh) AS BIGINT) AS n_hits,
        |  CAST(count(DISTINCT be.doc_id) AS BIGINT) AS n_bench_docs
        |FROM tr JOIN be ON tr.sh = be.sh
        |GROUP BY tr.doc_id""".stripMargin,
    "q80_packing" ->
      """WITH d AS (
        |  SELECT doc_id, CAST(len(list_filter(
        |    regexp_split_to_array(text, '[\s[:punct:]]+'),
        |    x -> len(x) > 0)) AS BIGINT) AS n_tok
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, n_tok,
        |    CAST(sum(n_tok) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tok_end
        |  FROM d WHERE n_tok > 0
        |)
        |SELECT doc_id,
        |  CAST(tok_end - n_tok AS BIGINT) AS tok_start,
        |  tok_end,
        |  CAST((tok_end - n_tok) // 512 AS BIGINT) AS first_chunk,
        |  CAST((tok_end - 1) // 512 AS BIGINT) AS last_chunk,
        |  CAST((tok_end - 1) // 512 - (tok_end - n_tok) // 512 + 1 AS BIGINT) AS n_chunks
        |FROM c""".stripMargin,
    "q81_alternation" ->
      """SELECT 'o:' || o_orderkey AS o, o_orderstatus AS v FROM orders
        |UNION ALL
        |SELECT 'o:' || o_orderkey, o_orderpriority FROM orders""".stripMargin,
    "q82_span_dedup" ->
      // window semantics mirror word_shingles: indices 1..max(n-8,0)+1,
      // slice capped at the tail (short docs emit one short window),
      // DISTINCT per doc; the engine groups by xxhash64(window) instead
      // of the window text (same partition modulo 2^-64 collisions)
      """WITH toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '[\s[:punct:]]+'), x -> len(x) > 0) AS ts
        |  FROM documents
        |), idx AS (
        |  SELECT doc_id, ts, unnest(generate_series(1, greatest(len(ts) - 8, 0) + 1)) AS i
        |  FROM toks WHERE len(ts) >= 1
        |), wins AS (
        |  SELECT DISTINCT doc_id, array_to_string(ts[i:least(i + 7, len(ts))], ' ') AS win FROM idx
        |), nd AS (
        |  SELECT win, count(*) AS n FROM wins GROUP BY win
        |)
        |SELECT w.doc_id,
        |  CAST(count(*) AS BIGINT) AS total_windows,
        |  CAST(sum(CASE WHEN nd.n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_windows
        |FROM wins w JOIN nd USING (win)
        |GROUP BY w.doc_id""".stripMargin,
    // q84: brute-force SemDeDup parity — quadratic cosine pairs at the
    // threshold, min-id reachability closure, identity for uniques
    // (nlist = 1 makes the operator's confined pass exactly all-pairs).
    "q84_semantic_dedup" ->
      """WITH RECURSIVE pairs AS (
        |  SELECT a.vec_id AS id1, b.vec_id AS id2
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |    CAST(b.embedding AS DOUBLE[])) > 0.4
        |), edges AS (
        |  SELECT id1 AS s, id2 AS d FROM pairs
        |  UNION ALL SELECT id2, id1 FROM pairs
        |), reach(id, r) AS (
        |  SELECT vec_id, vec_id FROM embeddings
        |  UNION
        |  SELECT reach.id, e.d FROM reach JOIN edges e ON reach.r = e.s
        |)
        |SELECT id, min(r) AS keep_id FROM reach GROUP BY id""".stripMargin,
    "q83_describe" ->
      // symmetric concise description of the target nations: their
      // subject rows (name, region) plus every incoming IRI link
      // (customer nation edges from ANY segment)
      """WITH res AS (
        |  SELECT DISTINCT 'n:' || c_nationkey AS r FROM customer
        |  WHERE c_mktsegment = 'BUILDING'
        |)
        |SELECT 'n:' || n_nationkey AS s, 'name' AS p, n_name AS o, 'nation' AS g
        |FROM nation JOIN res ON 'n:' || n_nationkey = r
        |UNION ALL
        |SELECT 'n:' || n_nationkey, 'region', 'r:' || n_regionkey, 'nation'
        |FROM nation JOIN res ON 'n:' || n_nationkey = r
        |UNION ALL
        |SELECT 'c:' || c_custkey, 'nation', 'n:' || c_nationkey, 'customer'
        |FROM customer JOIN res ON 'n:' || c_nationkey = r""".stripMargin,
    "q85_stratified_sample" ->
      // the Knuth draw is plain integer arithmetic, identical across
      // engines — both the kept set and the uniforms compare exactly
      """WITH d AS (
        |  SELECT doc_id, len(list_filter(regexp_split_to_array(text, '[\s[:punct:]]+'), x -> len(x) > 0)) AS n_tok
        |  FROM documents
        |), b AS (
        |  SELECT doc_id,
        |    CASE WHEN n_tok < 40 THEN 'short' WHEN n_tok < 70 THEN 'medium' ELSE 'long' END AS bucket,
        |    (doc_id * 2654435761) % 4294967296 AS u
        |  FROM d
        |)
        |SELECT doc_id, bucket, CAST(u AS BIGINT) AS u FROM b
        |WHERE u < CASE bucket WHEN 'short' THEN 1073741824
        |  WHEN 'medium' THEN 2147483648 ELSE 4294967296 END""".stripMargin,
    "q86_top_bigrams" ->
      """WITH toks AS (
        |  SELECT list_filter(regexp_split_to_array(text, '[\s[:punct:]]+'), x -> len(x) > 0) AS ts
        |  FROM documents
        |), bg AS (
        |  SELECT ts[i] || ' ' || ts[i+1] AS bigram
        |  FROM (SELECT ts, unnest(generate_series(1, len(ts) - 1)) AS i FROM toks WHERE len(ts) >= 2)
        |)
        |SELECT bigram, CAST(count(*) AS BIGINT) AS n FROM bg
        |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 50""".stripMargin,
    "q87_group_concat" ->
      """SELECT 'r:' || n_regionkey AS r,
        |  string_agg(n_name, '|' ORDER BY n_name) AS nations
        |FROM nation GROUP BY 1""".stripMargin,
    "q88_bm25" ->
      // expression shapes mirror the engine exactly (same literals, same
      // association) so the double math agrees to the last ulp; round(6)
      // absorbs any residual libm difference
      """WITH toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '[\s[:punct:]]+'), x -> len(x) > 0) AS ts
        |  FROM documents
        |), d AS (
        |  SELECT doc_id, len(ts) AS dl, ts FROM toks WHERE len(ts) > 0
        |), stats AS (
        |  SELECT count(*) AS n, avg(dl) AS avgdl FROM d
        |), tf AS (
        |  SELECT doc_id, dl, tok, count(*) AS tf
        |  FROM (SELECT doc_id, dl, unnest(ts) AS tok FROM d)
        |  WHERE tok IN ('spark', 'table', 'query')
        |  GROUP BY doc_id, dl, tok
        |), dfreq AS (
        |  SELECT tok, count(DISTINCT doc_id) AS df FROM tf GROUP BY tok
        |)
        |SELECT tf.doc_id,
        |  round(sum(
        |    ln((n - df + 0.5) / (df + 0.5) + 1.0) *
        |    (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 6) AS score
        |FROM tf JOIN dfreq USING (tok) CROSS JOIN stats
        |GROUP BY tf.doc_id""".stripMargin,
    "q89_having" ->
      """SELECT 'n:' || c_nationkey AS nat, count(*) AS n
        |FROM customer GROUP BY 1 HAVING count(*) >= 60
        |ORDER BY n DESC, nat""".stripMargin,
    "q90_sparql_expr" ->
      """SELECT 'c:' || c_custkey AS c, CAST(length(c_name) AS INT) AS len,
        |  CAST(c_custkey AS VARCHAR) AS num,
        |  CASE WHEN c_custkey % 2 = 0 THEN 'even' ELSE 'odd' END AS parity
        |FROM customer
        |WHERE c_custkey % 3 = 0 AND length(c_name) + 2 > 10""".stripMargin,
    "q91_path_quant" ->
      """WITH r AS (
        |  SELECT n_nationkey, n_regionkey,
        |    row_number() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS rk
        |  FROM nation
        |)
        |SELECT 'n:' || a.n_nationkey AS n, 'n:' || b.n_nationkey AS m
        |FROM r a JOIN r b ON a.n_regionkey = b.n_regionkey
        |  AND b.rk - a.rk BETWEEN 1 AND 3""".stripMargin,
    // q92: the RDFS closure stated in closed form — membership through
    // the 1- and 2-level subclass chains (rdfs9+rdfs11), locatedIn via
    // subPropertyOf (rdfs7), domain/range typing (rdfs2/rdfs3), and the
    // single inferred transitive subclass edge.
    // q92: okind 0 = IRI, 2 = literal; the label rows are the rdfs7
    // literal-propagation case (kind + datatype must survive the
    // fixpoint) and the absence of any (..., rdf:type, s:Name) row with
    // a literal subject pins the rdfs3 resource-subject guard
    "q92_rdfs" ->
      """SELECT 'c:' || c_custkey AS s, 'rdf:type' AS p, 's:Any' AS o,
        |  0 AS okind, '' AS odt
        |FROM customer WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
        |UNION
        |SELECT 'c:' || c_custkey, 'rdf:type', 's:Vehicle', 0, ''
        |FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        |UNION
        |SELECT 'c:' || c_custkey, 'rdf:type', 's:Agent', 0, '' FROM customer
        |UNION
        |SELECT 'c:' || c_custkey, 'locatedIn', 'n:' || c_nationkey, 0, ''
        |FROM customer
        |UNION
        |SELECT DISTINCT 'n:' || c_nationkey, 'rdf:type', 's:Place', 0, ''
        |FROM customer
        |UNION
        |SELECT 's:AUTOMOBILE', 'rdfs:subClassOf', 's:Any', 0, ''
        |UNION
        |SELECT 'c:' || c_custkey, 'label', c_name, 2, 'xsd:string'
        |FROM customer""".stripMargin,
    // q93: after CLEAR GRAPH <nation> ; INSERT, the only nation-graph row
    // is the inserted one; the customer graph is untouched. ADD copies
    // that row into <scratch> (source intact), MOVE relocates it to
    // <archive> leaving <scratch> empty — so the extra output is exactly
    // one archive row.
    "q93_graph_mgmt" ->
      """SELECT 'c:' || c_custkey AS s, 'name' AS p, c_name AS o,
        |  'customer' AS g FROM customer
        |UNION ALL
        |SELECT 'c:' || c_custkey, 'nation', 'n:' || c_nationkey, 'customer'
        |FROM customer
        |UNION ALL
        |SELECT 'c:' || c_custkey, 'segment', c_mktsegment, 'customer'
        |FROM customer
        |UNION ALL
        |SELECT 'n:0', 'name', 'RENAMED', 'nation'
        |UNION ALL
        |SELECT 'n:0', 'name', 'RENAMED', 'archive'""".stripMargin,
    // q94: the same derived text, the same three regexes (Java-regex /
    // RE2 common subset), the same replacement order; counts are over the
    // ORIGINAL text.
    "q94_pii_redact" ->
      """WITH src AS (
        |  SELECT c_custkey,
        |    c_name || ' <u' || c_custkey || '@mail' || (c_custkey % 7)
        |      || '.org> tel +1-555-00' || c_custkey
        |      || ' at 10.0.' || c_nationkey || '.' || (c_custkey % 256) AS text
        |  FROM customer
        |)
        |SELECT c_custkey,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |    '\b(?:\d{1,3}\.){3}\d{1,3}\b', '[IP]', 'g'),
        |    '\+\d(?:[ -]?\d){6,13}', '[PHONE]', 'g') AS redacted,
        |  len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |  len(regexp_extract_all(text,
        |    '\b(?:\d{1,3}\.){3}\d{1,3}\b')) AS n_ips,
        |  len(regexp_extract_all(text,
        |    '\+\d(?:[ -]?\d){6,13}')) AS n_phones
        |FROM src""".stripMargin,
    // q95: identical derivation, identical regex formulations (incl. the
    // lower-prefix-only normalization stated the same way).
    "q95_url_classify" ->
      """WITH src AS (
        |  SELECT c_custkey,
        |    'https://WWW.Site' || (c_custkey % 50) || '.com/item/' || c_custkey
        |      || CASE WHEN c_custkey % 3 = 0 THEN '/#sec' ELSE '?ref=mail' END AS url
        |  FROM customer
        |), f AS (
        |  SELECT c_custkey, url, regexp_replace(url, '#.*$', '') AS nofrag
        |  FROM src
        |)
        |SELECT c_custkey,
        |  lower(regexp_extract(url,
        |    '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)', 1)) AS host,
        |  regexp_extract(lower(regexp_extract(url,
        |    '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)', 1)),
        |    '([^.]+\.[^.]+)$', 1) AS domain,
        |  regexp_replace(
        |    lower(regexp_extract(nofrag, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1))
        |      || regexp_replace(nofrag, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', ''),
        |    '^([^?]*)/$', '\1') AS url_norm,
        |  regexp_extract(lower(regexp_extract(url,
        |    '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)', 1)),
        |    '([^.]+\.[^.]+)$', 1) IN ('site7.com', 'site13.com') AS blocked
        |FROM f""".stripMargin,
    // q96: q71's Gopher CTE + q17's token count + q16's min-id dedup,
    // composed into the keep/drop decision.
    "q96_curation" ->
      """WITH w AS (
        |  SELECT doc_id, text,
        |    list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0) AS words,
        |    string_split(text, chr(10)) AS lines,
        |    list_filter(regexp_split_to_array(text, '[\s[:punct:]]+'), x -> len(x) > 0) AS ts
        |  FROM documents
        |), c AS (
        |  SELECT doc_id,
        |    CAST(len(ts) AS BIGINT) AS n_tokens,
        |    CAST(len(words) AS BIGINT) AS n_words,
        |    CAST(coalesce(list_sum(list_transform(words, x -> len(x))), 0) AS BIGINT) AS sum_word_len,
        |    CAST(len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS n_alpha_words,
        |    CAST(len(list_filter(words, x -> contains(x, '#') OR contains(x, '...'))) AS BIGINT) AS n_symbol_words,
        |    CAST(len(lines) AS BIGINT) AS n_lines,
        |    CAST(len(list_filter(lines, l -> starts_with(ltrim(l), chr(8226))
        |      OR starts_with(ltrim(l), '- ') OR starts_with(ltrim(l), '* '))) AS BIGINT) AS n_bullet_lines,
        |    CAST(len(list_filter(lines, l -> ends_with(l, '...'))) AS BIGINT) AS n_ellipsis_lines,
        |    CAST(len(list_filter(list_transform(ts, x -> lower(x)),
        |      x -> x IN ('the', 'a', 'of', 'and'))) AS BIGINT) AS n_stop_hits
        |  FROM w
        |), p AS (
        |  SELECT doc_id, n_tokens,
        |    CASE WHEN n_words >= 50 AND n_words <= 100000
        |      AND sum_word_len >= n_words * 3 AND sum_word_len <= n_words * 10
        |      AND n_symbol_words * 10 <= n_words
        |      AND n_bullet_lines * 10 <= n_lines * 9
        |      AND n_ellipsis_lines * 10 <= n_lines * 3
        |      AND n_alpha_words * 5 >= n_words * 4
        |      AND n_stop_hits >= 2 THEN 1 ELSE 0 END AS passes
        |  FROM c
        |), canon AS (
        |  SELECT doc_id, doc_id = min(doc_id) OVER (PARTITION BY text) AS canonical
        |  FROM documents
        |)
        |SELECT p.doc_id, p.n_tokens, p.passes, canon.canonical,
        |  (p.passes = 1 AND canon.canonical) AS keep
        |FROM p JOIN canon USING (doc_id)""".stripMargin,
    "q97_nested_path" ->
      """SELECT 'o:' || o_orderkey AS o, 'n:' || c_nationkey AS n
        |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin,
    "q98_rdf_roundtrip" ->
      // the engine side is a four-format serialize→parse chain whose
      // composition must be the identity; the oracle states that identity
      "SELECT doc_id, text, n_chars, source, lang FROM documents",
    "q99_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '[\s[:punct:]]+'), x -> len(x) > 0) AS ts
        |  FROM documents
        |), g2 AS (
        |  SELECT doc_id, ts[i] || ' ' || ts[i+1] AS g
        |  FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 1)) AS i
        |        FROM toks WHERE len(ts) >= 2)
        |), g3 AS (
        |  SELECT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS g
        |  FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 2)) AS i
        |        FROM toks WHERE len(ts) >= 3)
        |), c2 AS (
        |  SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2
        |), a2 AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_2grams,
        |    CAST(max(c) AS BIGINT) AS top_2gram_n FROM c2 GROUP BY 1
        |), a3 AS (
        |  SELECT doc_id, CAST(count(*) - count(DISTINCT g) AS BIGINT) AS dup_3gram_excess
        |  FROM g3 GROUP BY 1
        |)
        |SELECT d.doc_id,
        |  CAST(COALESCE(a2.n_2grams, 0) AS BIGINT) AS n_2grams,
        |  CAST(COALESCE(a2.top_2gram_n, 0) AS BIGINT) AS top_2gram_n,
        |  CAST(COALESCE(a3.dup_3gram_excess, 0) AS BIGINT) AS dup_3gram_excess
        |FROM documents d LEFT JOIN a2 USING (doc_id) LEFT JOIN a3 USING (doc_id)""".stripMargin,
    "q100_contamination" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '[\s[:punct:]]+'), x -> len(x) > 0) AS ts
        |  FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id,
        |    ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3] || ' ' || ts[i+4] AS g
        |  FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 4)) AS i
        |        FROM toks WHERE len(ts) >= 5)
        |), ev AS (
        |  SELECT DISTINCT g FROM sh WHERE doc_id % 97 = 0
        |)
        |SELECT s.doc_id, CAST(count(e.g) AS BIGINT) AS n_contaminated
        |FROM sh s LEFT JOIN ev e ON s.g = e.g
        |WHERE s.doc_id % 97 <> 0
        |GROUP BY 1""".stripMargin,
    "q101_fuzzy_keeplist" ->
      // the engine runs LSH-banded candidates; recall is total on this
      // corpus, so the oracle states the exact-Jaccard pair set (q25's
      // oracle) and closes it into components with a recursive CTE
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '[\s[:punct:]]+'), x -> len(x) > 0) AS ts
        |  FROM documents
        |), idx AS (
        |  SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 1)) AS i
        |  FROM toks WHERE len(ts) >= 2
        |), sh AS (
        |  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] AS shingle FROM idx
        |), sizes AS (
        |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
        |), inter AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id
        |), pairs AS (
        |  SELECT id1, id2 FROM inter
        |  JOIN sizes sa ON sa.doc_id = id1 JOIN sizes sb ON sb.doc_id = id2
        |  WHERE 3 * inter > 1 * (sa.n + sb.n - inter)
        |), edges AS (
        |  SELECT id1 AS a, id2 AS b FROM pairs
        |  UNION SELECT id2, id1 FROM pairs
        |), reach(a, b) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
        |)
        |SELECT d.doc_id,
        |  CAST(LEAST(d.doc_id, COALESCE(MIN(r.b), d.doc_id)) AS BIGINT) AS component,
        |  CAST(LEAST(d.doc_id, COALESCE(MIN(r.b), d.doc_id)) = d.doc_id AS INT) AS keep
        |FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
        |GROUP BY d.doc_id""".stripMargin,
    // q102: the engine synthesizes PCM-16 from this exact LCG, serializes
    // real WAVE bytes, and re-parses them; the oracle recomputes every
    // field from the formula — all-integer, so the hash check is strict
    "q102_audio" ->
      """WITH d AS (
        |  SELECT doc_id, LEAST(GREATEST(n_chars, 1), 1600) AS n FROM documents
        |), s AS (
        |  SELECT d.doc_id, g.i,
        |    ((d.doc_id * 7919 + g.i * 104729) % 65536) - 32768 AS x
        |  FROM d JOIN generate_series(0, 1599) g(i) ON g.i < d.n
        |), lagged AS (
        |  SELECT doc_id, i, x,
        |    lag(x) OVER (PARTITION BY doc_id ORDER BY i) AS lx
        |  FROM s
        |), agg AS (
        |  SELECT doc_id,
        |    CAST(SUM(ABS(x)) AS BIGINT) AS sum_abs,
        |    CAST(SUM(x * x) AS BIGINT) AS sum_sq,
        |    CAST(MAX(ABS(x)) AS INT) AS peak,
        |    CAST(SUM(CASE WHEN lx IS NOT NULL AND (x < 0) <> (lx < 0)
        |                  THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
        |  FROM lagged GROUP BY doc_id
        |)
        |SELECT d.doc_id,
        |  CAST(44 + 2 * d.n AS BIGINT) AS n_bytes,
        |  CAST(1 AS INT) AS channels,
        |  CAST(8000 AS INT) AS sample_rate,
        |  CAST(d.n AS BIGINT) AS n_frames,
        |  CAST((d.n * 1000) // 8000 AS BIGINT) AS duration_ms,
        |  agg.sum_abs, agg.sum_sq, agg.peak, agg.zero_crossings
        |FROM d JOIN agg ON agg.doc_id = d.doc_id""".stripMargin,
    // q103: same contract for the MP4 container — time grid at 250 ms
    // stride capped at 16 frames, proportional payload seek, LCG payload
    "q103_video" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    500 + (n_chars % 4000) AS dur,
        |    CAST(160 + (doc_id % 16) * 8 AS INT) AS width,
        |    CAST(120 + (doc_id % 9) * 8 AS INT) AS height,
        |    LEAST(GREATEST(n_chars, 1), 1200) AS m
        |  FROM documents
        |), f AS (
        |  SELECT d.doc_id, d.m, g.i,
        |    ((g.i * 250 * d.m) // d.dur) AS off
        |  FROM d JOIN generate_series(0, 15) g(i) ON g.i * 250 < d.dur
        |)
        |SELECT d.doc_id, 'isom' AS brand,
        |  CAST(d.dur AS BIGINT) AS duration_ms,
        |  d.width, d.height, CAST(d.m AS INT) AS mdat_bytes,
        |  CAST(COUNT(*) AS BIGINT) AS n_frames,
        |  CAST(SUM(f.off) AS BIGINT) AS sum_offsets,
        |  CAST(SUM((d.doc_id * 31 + f.off * 17) % 251) AS BIGINT) AS sum_samples
        |FROM d JOIN f ON f.doc_id = d.doc_id
        |GROUP BY d.doc_id, d.dur, d.width, d.height, d.m""".stripMargin,
    // q104: thresholds are the engine's driver-computed exact integers
    // ((rate - floor(rate)) * 2^32 under IEEE doubles): 2.3 -> 1288490188,
    // 0.4 -> 1717986918; the epoch draw is (id * 2246822519) mod 2^32
    "q104_epoch_mixture" ->
      """WITH r AS (
        |  SELECT doc_id, source,
        |    CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 0 WHEN 'src2' THEN 0
        |      ELSE 1 END
        |    + CASE WHEN source = 'src0'
        |             AND (doc_id * 2246822519) % 4294967296 < 1288490188 THEN 1
        |           WHEN source = 'src1'
        |             AND (doc_id * 2246822519) % 4294967296 < 1717986918 THEN 1
        |           ELSE 0 END AS n
        |  FROM documents
        |)
        |SELECT doc_id, source, g.i AS epoch
        |FROM r JOIN generate_series(1, 3) g(i) ON g.i <= r.n""".stripMargin,
    // q105: same Knuth draw as q85; the per-row threshold is the engine's
    // exact column arithmetic (clamp, IEEE multiply, floor — DuckDB's
    // bare BIGINT cast rounds, so FLOOR comes first there too)
    "q105_rate_sample" ->
      """SELECT doc_id, (doc_id * 2654435761) % 4294967296 AS u
        |FROM documents
        |WHERE (doc_id * 2654435761) % 4294967296 <
        |  CAST(FLOOR(LEAST(GREATEST(n_chars / 800.0, 0.0), 1.0) * 4294967296)
        |    AS BIGINT)""".stripMargin,
    // NaN rates drop the row (isnan guard); every fifth doc carries a
    // NaN rate, the rest q105's length-derived rate
    "q206_nan_rate" ->
      """WITH r AS (
        |  SELECT doc_id, (doc_id * 2654435761) % 4294967296 AS u,
        |    CASE WHEN doc_id % 5 = 0 THEN CAST('nan' AS DOUBLE)
        |         ELSE n_chars / 800.0 END AS rate
        |  FROM documents
        |)
        |SELECT doc_id, u FROM r
        |WHERE u < CAST(FLOOR(LEAST(GREATEST(
        |    CASE WHEN isnan(rate) THEN 0.0 ELSE rate END, 0.0), 1.0)
        |  * 4294967296) AS BIGINT)""".stripMargin,
    // q106: same tokenizer as q17/q19's oracles; DuckDB list slicing is
    // 1-based inclusive, so chunk i covers ts[i*40+1 : i*40+64]
    "q106_chunking" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(text, '[\s[:punct:]]+'), x -> len(x) > 0) AS ts
        |  FROM documents
        |)
        |SELECT doc_id, g.i AS chunk_idx,
        |  array_to_string(ts[g.i*40 + 1 : g.i*40 + 64], ' ') AS chunk_text,
        |  CAST(LEAST(64, len(ts) - g.i*40) AS BIGINT) AS n_tokens
        |FROM toks JOIN generate_series(0, 255) g(i)
        |  ON len(ts) > 0 AND g.i <= (len(ts) - 1) // 40""".stripMargin,
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
    // q114: exact segment-frequency semantics (the engine counts on
    // xxhash64(segment) — collision-free at any realistic corpus size,
    // identical here)
    "q114_segment_dedup" ->
      """WITH l AS (
        |  SELECT doc_id,
        |    unnest(string_split(text, ' the ')) AS seg,
        |    unnest(generate_series(1, len(string_split(text, ' the ')))) AS pos
        |  FROM documents
        |), b AS (
        |  SELECT seg FROM l GROUP BY seg HAVING count(*) > 2
        |), k AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |    string_agg(seg, ' the ' ORDER BY pos) AS text_dedup
        |  FROM l WHERE seg NOT IN (SELECT seg FROM b)
        |  GROUP BY doc_id
        |)
        |SELECT d.doc_id,
        |  CAST(len(string_split(d.text, ' the ')) AS BIGINT) AS n_segments,
        |  coalesce(k.n_kept, 0) AS n_kept,
        |  coalesce(k.text_dedup, '') AS text_dedup
        |FROM documents d LEFT JOIN k ON d.doc_id = k.doc_id""".stripMargin,
    // q115: md5 sort key + ascii-arithmetic shard + per-shard row_number,
    // restated verbatim — both engines emit lowercase-hex md5 over UTF-8
    "q115_det_shuffle" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    md5(CAST(doc_id AS VARCHAR) || ':epoch0') AS skey
        |  FROM documents
        |), b AS (
        |  SELECT doc_id, skey,
        |    CAST((((ascii(substr(skey, 1, 1)) * 131 + ascii(substr(skey, 2, 1)))
        |        * 131 + ascii(substr(skey, 3, 1))) * 131 + ascii(substr(skey, 4, 1)))
        |      % 8 AS BIGINT) AS bucket
        |  FROM s
        |)
        |SELECT doc_id, skey, bucket,
        |  CAST(row_number() OVER (PARTITION BY bucket ORDER BY skey) AS BIGINT)
        |    AS pos
        |FROM b""".stripMargin,
    // q116: the ENTIRE inference restated — tokenize, md5-prefix bucket,
    // w(b)=b%7-3, sum — integer weights keep the float sum exact
    "q116_quality_classifier" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    list_transform(
        |      list_filter(regexp_split_to_array(text, '[\s[:punct:]]+'),
        |        x -> len(x) > 0),
        |      t -> (((ascii(substr(md5(t), 1, 1)) * 131
        |            + ascii(substr(md5(t), 2, 1))) * 131
        |            + ascii(substr(md5(t), 3, 1))) * 131
        |            + ascii(substr(md5(t), 4, 1))) % 64) AS bs
        |  FROM documents
        |), sc AS (
        |  SELECT doc_id,
        |    coalesce(list_sum(list_transform(bs, b -> (b % 7) - 3)), 0) AS s
        |  FROM tok
        |)
        |SELECT doc_id, CAST(s AS BIGINT) AS score, s > 0 AS keep
        |FROM sc""".stripMargin,
    // q117: per-source cap, longest-first with doc_id tie-break
    "q117_source_cap" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(len(list_filter(regexp_split_to_array(text, '[\s[:punct:]]+'),
        |      x -> len(x) > 0)) AS BIGINT) AS n_tokens
        |  FROM documents
        |)
        |SELECT doc_id, source, n_tokens,
        |  CAST(row_number() OVER (PARTITION BY source
        |    ORDER BY n_tokens DESC, doc_id ASC) AS BIGINT) AS rnk,
        |  row_number() OVER (PARTITION BY source
        |    ORDER BY n_tokens DESC, doc_id ASC) <= 10 AS kept
        |FROM t""".stripMargin,
    // q118: quantile_cont == Spark percentile (rank p·(n−1), linear
    // interpolation, IEEE doubles)
    "q118_corpus_stats" ->
      """WITH t AS (
        |  SELECT source,
        |    CAST(len(list_filter(regexp_split_to_array(text, '[\s[:punct:]]+'),
        |      x -> len(x) > 0)) AS BIGINT) AS n
        |  FROM documents
        |)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n) AS BIGINT) AS sum_tokens,
        |  min(n) AS min_tokens, max(n) AS max_tokens,
        |  avg(n) AS mean_tokens,
        |  quantile_cont(n, 0.5) AS p50_tokens,
        |  quantile_cont(n, 0.95) AS p95_tokens
        |FROM t GROUP BY source""".stripMargin,
    // q119: integer tf·⌊1e6/df⌋ scoring — rarity weighting with zero
    // float involvement
    "q119_keywords" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(
        |    regexp_split_to_array(text, '[\s[:punct:]]+'),
        |    x -> len(x) > 0)) AS tok
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
        |  FROM tok GROUP BY doc_id, tok
        |), dfreq AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok
        |), scored AS (
        |  SELECT tf.doc_id, tf.tok, tf.tf * (1000000 // dfreq.df) AS score
        |  FROM tf JOIN dfreq USING (tok)
        |)
        |SELECT doc_id,
        |  CAST(row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, tok ASC) AS BIGINT) AS rnk,
        |  tok, CAST(score AS BIGINT) AS score
        |FROM scored
        |QUALIFY rnk <= 3""".stripMargin,
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
    // q121: the integer recurrence unrolled — r0 = 10^6; r[k+1] =
    // 150000 + (85·Σ⌊r[k]/deg⌋)//100; dangling mass dropped
    "q121_pagerank" ->
      """WITH e AS (
        |  SELECT l_orderkey AS src, l_partkey + 10000000 AS dst FROM lineitem
        |), deg AS (
        |  SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src
        |), v AS (
        |  SELECT DISTINCT id
        |  FROM (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)
        |), r0 AS (
        |  SELECT id, CAST(1000000 AS BIGINT) AS pr FROM v
        |), s1 AS (
        |  SELECT e.dst AS id, sum(r0.pr // deg.deg) AS m
        |  FROM e JOIN r0 ON e.src = r0.id JOIN deg ON deg.src = e.src
        |  GROUP BY e.dst
        |), r1 AS (
        |  SELECT v.id,
        |    CAST(150000 + (85 * coalesce(s1.m, 0)) // 100 AS BIGINT) AS pr
        |  FROM v LEFT JOIN s1 ON v.id = s1.id
        |), s2 AS (
        |  SELECT e.dst AS id, sum(r1.pr // deg.deg) AS m
        |  FROM e JOIN r1 ON e.src = r1.id JOIN deg ON deg.src = e.src
        |  GROUP BY e.dst
        |), r2 AS (
        |  SELECT v.id,
        |    CAST(150000 + (85 * coalesce(s2.m, 0)) // 100 AS BIGINT) AS pr
        |  FROM v LEFT JOIN s2 ON v.id = s2.id
        |), s3 AS (
        |  SELECT e.dst AS id, sum(r2.pr // deg.deg) AS m
        |  FROM e JOIN r2 ON e.src = r2.id JOIN deg ON deg.src = e.src
        |  GROUP BY e.dst
        |), r3 AS (
        |  SELECT v.id,
        |    CAST(150000 + (85 * coalesce(s3.m, 0)) // 100 AS BIGINT) AS pr
        |  FROM v LEFT JOIN s3 ON v.id = s3.id
        |)
        |SELECT id, pr FROM r3""".stripMargin,
    // q122: winnowing restated — k=4 shingles, lexicographic min-md5 over
    // w=5 complete windows, distinct per doc
    "q122_winnow" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(text, '[\s[:punct:]]+'),
        |      x -> len(x) > 0) AS ts
        |  FROM documents
        |), p AS (
        |  SELECT doc_id, ts,
        |    unnest(generate_series(1, len(ts) - 3)) AS pos
        |  FROM t WHERE len(ts) >= 4
        |), h AS (
        |  SELECT doc_id, pos,
        |    md5(array_to_string(ts[pos:pos+3], ' ')) AS h,
        |    count(*) OVER (PARTITION BY doc_id) AS n_h
        |  FROM p
        |), w AS (
        |  SELECT doc_id,
        |    min(h) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS fp,
        |    pos, n_h
        |  FROM h
        |)
        |SELECT DISTINCT doc_id, fp FROM w WHERE pos <= n_h - 4""".stripMargin,
    // q123: md5 priority = engine-independent uniform draw
    "q123_group_sample" ->
      """WITH p AS (
        |  SELECT doc_id, source,
        |    md5(CAST(doc_id AS VARCHAR) || ':sample0') AS pri
        |  FROM documents
        |)
        |SELECT doc_id, source, pri,
        |  CAST(row_number() OVER (PARTITION BY source
        |    ORDER BY pri ASC, doc_id ASC) AS BIGINT) AS rnk,
        |  row_number() OVER (PARTITION BY source
        |    ORDER BY pri ASC, doc_id ASC) <= 5 AS kept
        |FROM p""".stripMargin,
    // q124: salting is invisible in the semantics — the oracle is the
    // PLAIN inner join
    "q124_salted_join" ->
      """SELECT p.p_brand, sum(l.l_quantity) AS sum_qty,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |GROUP BY p.p_brand""".stripMargin,
    // q125: count floor, top-K, dense ids in (cnt desc, tok) order
    "q125_vocab" ->
      """WITH tok AS (
        |  SELECT unnest(list_filter(
        |    regexp_split_to_array(text, '[\s[:punct:]]+'),
        |    x -> len(x) > 0)) AS tok
        |  FROM documents
        |), c AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS cnt
        |  FROM tok GROUP BY tok HAVING count(*) >= 2
        |), k AS (
        |  SELECT tok, cnt FROM c ORDER BY cnt DESC, tok ASC LIMIT 50
        |)
        |SELECT tok, cnt,
        |  CAST(row_number() OVER (ORDER BY cnt DESC, tok ASC) AS BIGINT)
        |    AS token_id
        |FROM k""".stripMargin,
    // q126: q122's fingerprints self-joined on fp, >=2 shared
    "q126_winnow_pairs" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(text, '[\s[:punct:]]+'),
        |      x -> len(x) > 0) AS ts
        |  FROM documents
        |), p AS (
        |  SELECT doc_id, ts,
        |    unnest(generate_series(1, len(ts) - 3)) AS pos
        |  FROM t WHERE len(ts) >= 4
        |), h AS (
        |  SELECT doc_id, pos,
        |    md5(array_to_string(ts[pos:pos+3], ' ')) AS h,
        |    count(*) OVER (PARTITION BY doc_id) AS n_h
        |  FROM p
        |), w AS (
        |  SELECT doc_id,
        |    min(h) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS fp,
        |    pos, n_h
        |  FROM h
        |), f AS (
        |  SELECT DISTINCT doc_id, fp FROM w WHERE pos <= n_h - 4
        |)
        |SELECT a.doc_id AS id1, b.doc_id AS id2,
        |  CAST(count(*) AS BIGINT) AS n_shared
        |FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY a.doc_id, b.doc_id
        |HAVING count(*) >= 2""".stripMargin,
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
    // q131: deterministic k-smallest-priority sample, exact quantile of it
    "q131_sampled_quantile" ->
      """WITH p AS (
        |  SELECT l_returnflag AS grp, l_orderkey, l_linenumber, l_quantity,
        |    md5(CAST(l_orderkey AS VARCHAR) || ':' ||
        |        CAST(l_linenumber AS VARCHAR)) AS pri
        |  FROM lineitem
        |), k AS (
        |  SELECT * FROM (
        |    SELECT grp, l_quantity,
        |      row_number() OVER (PARTITION BY grp
        |        ORDER BY pri ASC, l_orderkey ASC, l_linenumber ASC) AS rnk
        |    FROM p)
        |  WHERE rnk <= 200
        |)
        |SELECT grp, CAST(count(*) AS BIGINT) AS n_sample,
        |  quantile_cont(l_quantity, 0.5) AS p50_est,
        |  quantile_cont(l_quantity, 0.9) AS p90_est
        |FROM k GROUP BY grp""".stripMargin,
    // q132: Spark window(ts, '1 hour').start == time_bucket
    "q132_tumbling" ->
      """SELECT time_bucket(INTERVAL 1 HOUR, ts) AS bucket_start,
        |  event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |    AS value_cents
        |FROM events GROUP BY 1, 2""".stripMargin,
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
    // q134: triangles enumerated once as a<b<c over the canonical (u<v)
    // edge set; per-vertex counts by unnesting the three corners
    "q134_triangles" ->
      """WITH e AS (
        |  SELECT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(DISTINCT a.l_orderkey) >= 2
        |), tri AS (
        |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM e e1 JOIN e e2 ON e2.u = e1.u AND e1.v < e2.v
        |  JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
        |)
        |SELECT vertex, CAST(count(*) AS BIGINT) AS n_tri FROM (
        |  SELECT unnest([a, b, c]) AS vertex FROM tri
        |) GROUP BY vertex""".stripMargin,
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
    // q136: RE2 \p{Script} classes == Java \p{IsScript}; whitespace is
    // the explicit class (Java \s and RE2 \s disagree on \x0B); dominant
    // via the same (-count, name) struct-sort in both engines
    "q136_script_profile" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '\p{Latin}')) AS BIGINT) AS n_latin,
        |    CAST(len(regexp_extract_all(text, '\p{Cyrillic}')) AS BIGINT) AS n_cyrillic,
        |    CAST(len(regexp_extract_all(text, '\p{Greek}')) AS BIGINT) AS n_greek,
        |    CAST(len(regexp_extract_all(text, '\p{Han}')) AS BIGINT) AS n_han,
        |    CAST(len(regexp_extract_all(text, '\p{Arabic}')) AS BIGINT) AS n_arabic,
        |    CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digit,
        |    CAST(len(regexp_extract_all(text, '[ \t\n\r\f]')) AS BIGINT) AS n_space,
        |    CAST(length(text) AS BIGINT) AS n_chars
        |  FROM documents
        |)
        |SELECT doc_id, n_latin, n_cyrillic, n_greek, n_han, n_arabic,
        |  n_digit, n_space, n_chars,
        |  n_chars - n_latin - n_cyrillic - n_greek - n_han - n_arabic
        |    - n_digit - n_space AS n_other,
        |  CASE WHEN n_latin = 0 AND n_cyrillic = 0 AND n_greek = 0
        |    AND n_han = 0 AND n_arabic = 0 THEN 'none'
        |  ELSE list_sort([
        |    {'neg': -n_latin, 's': 'latin'},
        |    {'neg': -n_cyrillic, 's': 'cyrillic'},
        |    {'neg': -n_greek, 's': 'greek'},
        |    {'neg': -n_han, 's': 'han'},
        |    {'neg': -n_arabic, 's': 'arabic'}])[1].s END AS dominant
        |FROM c""".stripMargin,
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
    // q141: the synthesis formulas; matching hashes prove the EXIF
    // byte-level build→parse round trip was lossless
    "q141_exif" ->
      """SELECT c_custkey,
        |  'cam-' || CAST(c_custkey % 10 AS VARCHAR) AS make,
        |  '2024:01:' || lpad(CAST(c_custkey % 28 + 1 AS VARCHAR), 2, '0')
        |    || ' 12:00:00' AS dt,
        |  CAST(c_custkey % 8 + 1 AS BIGINT) AS orientation,
        |  CAST(c_custkey * 37 % 180000000 - 90000000 AS BIGINT) AS lat_e6,
        |  CAST(c_custkey * 91 % 360000000 - 180000000 AS BIGINT) AS lon_e6
        |FROM customer""".stripMargin,
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
    // q150: NFC is Unicode-standard-defined — both engines agree by
    // construction; the sha256 key proves byte-level equality
    "q150_nfc_keys" ->
      """SELECT doc_id,
        |  CAST(length(nfc_normalize(text)) AS BIGINT) AS n_chars_nfc,
        |  sha256(nfc_normalize(text)) AS nfc_key
        |FROM documents""".stripMargin,
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
    // q158: q88's BM25 restatement + rounded-score top-20 with the
    // (score DESC, doc_id) tie rule and a BIGINT rank
    "q158_bm25_topk" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '[\s[:punct:]]+'), x -> len(x) > 0) AS ts
        |  FROM documents
        |), d AS (
        |  SELECT doc_id, len(ts) AS dl, ts FROM toks WHERE len(ts) > 0
        |), stats AS (
        |  SELECT count(*) AS n, avg(dl) AS avgdl FROM d
        |), tf AS (
        |  SELECT doc_id, dl, tok, count(*) AS tf
        |  FROM (SELECT doc_id, dl, unnest(ts) AS tok FROM d)
        |  WHERE tok IN ('spark', 'table', 'query')
        |  GROUP BY doc_id, dl, tok
        |), dfreq AS (
        |  SELECT tok, count(DISTINCT doc_id) AS df FROM tf GROUP BY tok
        |), scores AS (
        |  SELECT tf.doc_id,
        |    round(sum(
        |      ln((n - df + 0.5) / (df + 0.5) + 1.0) *
        |      (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 6) AS score
        |  FROM tf JOIN dfreq USING (tok) CROSS JOIN stats
        |  GROUP BY tf.doc_id
        |)
        |SELECT doc_id, score,
        |  CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
        |FROM scores ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
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
    // q160: Fellegi–Sunter — m/u from exact half-offset counts, weights
    // and scores with the engine's formula shapes, round(6)
    "q160_fellegi_sunter" ->
      """WITH c AS (
        |  SELECT c_custkey, c_nationkey, floor(c_acctbal / 1000) AS bkt,
        |    c_acctbal > 0 AS pos, c_mktsegment
        |  FROM customer WHERE c_custkey <= 300
        |), p AS (
        |  SELECT a.c_custkey AS id1, b.c_custkey AS id2,
        |    CAST(a.c_mktsegment = b.c_mktsegment AS INT) AS is_match,
        |    CAST(a.c_nationkey = b.c_nationkey AS INT) AS a_nation,
        |    CAST(a.bkt = b.bkt AS INT) AS a_bkt,
        |    CAST(a.pos = b.pos AS INT) AS a_bal
        |  FROM c a JOIN c b ON a.c_custkey < b.c_custkey
        |), agg AS (
        |  SELECT
        |    sum(CASE WHEN is_match = 1 THEN a_nation END) AS n_mn,
        |    sum(CASE WHEN is_match = 1 THEN 1 END) AS md,
        |    sum(CASE WHEN is_match = 0 THEN a_nation END) AS n_un,
        |    sum(CASE WHEN is_match = 0 THEN 1 END) AS ud,
        |    sum(CASE WHEN is_match = 1 THEN a_bkt END) AS p_mn,
        |    sum(CASE WHEN is_match = 0 THEN a_bkt END) AS p_un,
        |    sum(CASE WHEN is_match = 1 THEN a_bal END) AS b_mn,
        |    sum(CASE WHEN is_match = 0 THEN a_bal END) AS b_un
        |  FROM p
        |), w AS (
        |  SELECT
        |    round(ln(((n_mn + 0.5) / (md + 1.0)) / ((n_un + 0.5) / (ud + 1.0))), 6) AS wn_a,
        |    round(ln((1.0 - (n_mn + 0.5) / (md + 1.0)) / (1.0 - (n_un + 0.5) / (ud + 1.0))), 6) AS wn_d,
        |    round(ln(((p_mn + 0.5) / (md + 1.0)) / ((p_un + 0.5) / (ud + 1.0))), 6) AS wp_a,
        |    round(ln((1.0 - (p_mn + 0.5) / (md + 1.0)) / (1.0 - (p_un + 0.5) / (ud + 1.0))), 6) AS wp_d,
        |    round(ln(((b_mn + 0.5) / (md + 1.0)) / ((b_un + 0.5) / (ud + 1.0))), 6) AS wb_a,
        |    round(ln((1.0 - (b_mn + 0.5) / (md + 1.0)) / (1.0 - (b_un + 0.5) / (ud + 1.0))), 6) AS wb_d
        |  FROM agg
        |)
        |SELECT id1, id2,
        |  round((CASE WHEN a_nation = 1 THEN wn_a ELSE wn_d END
        |       + CASE WHEN a_bkt = 1 THEN wp_a ELSE wp_d END)
        |       + CASE WHEN a_bal = 1 THEN wb_a ELSE wb_d END, 6) AS fs_score
        |FROM p CROSS JOIN w""".stripMargin,
    // q161: HITS unrolled — 2 iterations of the integer mutual
    // recurrence with max-normalization, term by term
    "q161_hits" ->
      """WITH e AS (
        |  SELECT l_orderkey AS src, l_partkey + 10000000 AS dst FROM lineitem
        |), v AS (
        |  SELECT DISTINCT id
        |  FROM (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)
        |), h0 AS (
        |  SELECT id, CAST(1000000 AS BIGINT) AS h FROM v
        |), a1r AS (
        |  SELECT e.dst AS id, sum(h0.h) AS a
        |  FROM e JOIN h0 ON e.src = h0.id GROUP BY e.dst
        |), a1 AS (
        |  SELECT id, (a * 1000000) // (SELECT max(a) FROM a1r) AS a FROM a1r
        |), h1r AS (
        |  SELECT e.src AS id, sum(a1.a) AS h
        |  FROM e JOIN a1 ON e.dst = a1.id GROUP BY e.src
        |), h1 AS (
        |  SELECT id, (h * 1000000) // (SELECT max(h) FROM h1r) AS h FROM h1r
        |), a2r AS (
        |  SELECT e.dst AS id, sum(h1.h) AS a
        |  FROM e JOIN h1 ON e.src = h1.id GROUP BY e.dst
        |), a2 AS (
        |  SELECT id, (a * 1000000) // (SELECT max(a) FROM a2r) AS a FROM a2r
        |), h2r AS (
        |  SELECT e.src AS id, sum(a2.a) AS h
        |  FROM e JOIN a2 ON e.dst = a2.id GROUP BY e.src
        |), h2 AS (
        |  SELECT id, (h * 1000000) // (SELECT max(h) FROM h2r) AS h FROM h2r
        |)
        |SELECT v.id, CAST(coalesce(a2.a, 0) AS BIGINT) AS auth,
        |  CAST(coalesce(h2.h, 0) AS BIGINT) AS hub
        |FROM v LEFT JOIN a2 ON v.id = a2.id LEFT JOIN h2 ON v.id = h2.id""".stripMargin,
    // q162: two unrolled peel rounds — degree, keep >= k, edge filter,
    // final degrees of the surviving subgraph
    "q162_kcore" ->
      """WITH und AS (
        |  SELECT DISTINCT least(l_orderkey, l_partkey + 10000000) AS u,
        |    greatest(l_orderkey, l_partkey + 10000000) AS v
        |  FROM lineitem WHERE l_orderkey <> l_partkey + 10000000
        |), e0 AS (
        |  SELECT u AS src, v AS dst FROM und
        |  UNION ALL SELECT v AS src, u AS dst FROM und
        |), d1 AS (
        |  SELECT src, count(*) AS deg FROM e0 GROUP BY src
        |), k1 AS (
        |  SELECT src AS id FROM d1 WHERE deg >= 3
        |), e1 AS (
        |  SELECT e0.src, e0.dst FROM e0
        |  JOIN k1 a ON e0.src = a.id JOIN k1 b ON e0.dst = b.id
        |), d2 AS (
        |  SELECT src, count(*) AS deg FROM e1 GROUP BY src
        |), k2 AS (
        |  SELECT src AS id FROM d2 WHERE deg >= 3
        |), e2 AS (
        |  SELECT e1.src, e1.dst FROM e1
        |  JOIN k2 a ON e1.src = a.id JOIN k2 b ON e1.dst = b.id
        |)
        |SELECT src AS id, CAST(count(*) AS BIGINT) AS deg
        |FROM e2 GROUP BY src""".stripMargin,
    // q163: the explode-join restatement of the outer-product kernel —
    // identical quantization, identical Long sums
    "q163_gram" ->
      """WITH ix AS (
        |  SELECT vec_id, embedding,
        |    unnest(generate_series(1, len(embedding))) AS i
        |  FROM embeddings
        |), q AS (
        |  SELECT vec_id, CAST(i - 1 AS BIGINT) AS i,
        |    CAST(round(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) AS q
        |  FROM ix
        |)
        |SELECT a.i AS i, b.i AS j, CAST(sum(a.q * b.q) AS BIGINT) AS s
        |FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i
        |GROUP BY a.i, b.i""".stripMargin,
    // q164: three unrolled BFS layers with left-anti settled guards
    "q164_bfs" ->
      """WITH fwd AS (
        |  SELECT l_orderkey AS src, l_partkey + 10000000 AS dst FROM lineitem
        |), e AS (
        |  SELECT DISTINCT src, dst FROM
        |  (SELECT src, dst FROM fwd UNION ALL SELECT dst AS src, src AS dst FROM fwd)
        |), s0 AS (
        |  SELECT min(l_orderkey) AS id FROM lineitem
        |), l0 AS (
        |  SELECT id, CAST(0 AS BIGINT) AS dist FROM s0
        |), f1 AS (
        |  SELECT DISTINCT e.dst AS id FROM e JOIN l0 ON e.src = l0.id
        |  WHERE e.dst NOT IN (SELECT id FROM l0)
        |), l1 AS (
        |  SELECT id, dist FROM l0
        |  UNION ALL SELECT id, CAST(1 AS BIGINT) FROM f1
        |), f2 AS (
        |  SELECT DISTINCT e.dst AS id FROM e JOIN f1 ON e.src = f1.id
        |  WHERE e.dst NOT IN (SELECT id FROM l1)
        |), l2 AS (
        |  SELECT id, dist FROM l1
        |  UNION ALL SELECT id, CAST(2 AS BIGINT) FROM f2
        |), f3 AS (
        |  SELECT DISTINCT e.dst AS id FROM e JOIN f2 ON e.src = f2.id
        |  WHERE e.dst NOT IN (SELECT id FROM l2)
        |)
        |SELECT id, dist FROM l2
        |UNION ALL SELECT id, CAST(3 AS BIGINT) FROM f3""".stripMargin,
    // q165: A-ES priorities restated — same Knuth draw, same ln shape,
    // same round(6) and tie rule
    "q165_weighted_sample" ->
      """WITH b AS (
        |  SELECT doc_id, CAST(n_chars AS DOUBLE) AS w,
        |    (doc_id * 2654435761) % 4294967296 AS u
        |  FROM documents WHERE n_chars > 0
        |)
        |SELECT doc_id, u,
        |  round(ln((u + 1) / 4294967296.0) / w, 6) AS priority
        |FROM b ORDER BY priority DESC, doc_id LIMIT 100""".stripMargin,
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
    // q169: three unrolled Bellman-Ford relaxation rounds
    "q169_sssp" ->
      """WITH fwd AS (
        |  SELECT l_orderkey AS src, l_partkey + 10000000 AS dst,
        |    CAST(l_quantity AS BIGINT) AS w
        |  FROM lineitem
        |), e AS (
        |  SELECT src, dst, w FROM fwd
        |  UNION ALL SELECT dst AS src, src AS dst, w FROM fwd
        |), l0 AS (
        |  SELECT min(l_orderkey) AS id, CAST(0 AS BIGINT) AS dist FROM lineitem
        |), c1 AS (
        |  SELECT e.dst AS id, min(l0.dist + e.w) AS nd
        |  FROM e JOIN l0 ON e.src = l0.id GROUP BY e.dst
        |), l1 AS (
        |  SELECT coalesce(l0.id, c1.id) AS id,
        |    CAST(least(coalesce(l0.dist, c1.nd), coalesce(c1.nd, l0.dist)) AS BIGINT) AS dist
        |  FROM l0 FULL JOIN c1 ON l0.id = c1.id
        |), c2 AS (
        |  SELECT e.dst AS id, min(l1.dist + e.w) AS nd
        |  FROM e JOIN l1 ON e.src = l1.id GROUP BY e.dst
        |), l2 AS (
        |  SELECT coalesce(l1.id, c2.id) AS id,
        |    CAST(least(coalesce(l1.dist, c2.nd), coalesce(c2.nd, l1.dist)) AS BIGINT) AS dist
        |  FROM l1 FULL JOIN c2 ON l1.id = c2.id
        |), c3 AS (
        |  SELECT e.dst AS id, min(l2.dist + e.w) AS nd
        |  FROM e JOIN l2 ON e.src = l2.id GROUP BY e.dst
        |)
        |SELECT coalesce(l2.id, c3.id) AS id,
        |  CAST(least(coalesce(l2.dist, c3.nd), coalesce(c3.nd, l2.dist)) AS BIGINT) AS dist
        |FROM l2 FULL JOIN c3 ON l2.id = c3.id""".stripMargin,
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
    // q174: hashed-unigram importance weights; the float enters exactly
    // one rounded micro-nat scalar per bucket, doc scores are exact
    // integer sums
    "q174_dsir" ->
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |    unnest(list_filter(regexp_split_to_array(lower(text), '[\s[:punct:]]+'), x -> len(x) > 0)) AS tok
        |  FROM documents
        |), tb AS (
        |  SELECT doc_id, (lang = 'en') AS is_tgt,
        |    ('0x' || substr(md5(tok), 1, 8))::BIGINT % 1024 AS b
        |  FROM toks
        |), pb AS (
        |  SELECT b, count(*) AS raw_n,
        |    sum(CASE WHEN is_tgt THEN 1 ELSE 0 END) AS tgt_n
        |  FROM tb GROUP BY b
        |), tot AS (
        |  SELECT sum(raw_n) AS raw_tot, sum(tgt_n) AS tgt_tot FROM pb
        |), w AS (
        |  SELECT b, CAST(round((ln((tgt_n + 1)::DOUBLE / (tgt_tot + 1024))
        |    - ln((raw_n + 1)::DOUBLE / (raw_tot + 1024))) * 1000000) AS BIGINT) AS w_fp
        |  FROM pb, tot
        |), sc AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
        |    CAST(sum(w_fp) AS BIGINT) AS score_fp
        |  FROM tb JOIN w USING (b) GROUP BY doc_id
        |)
        |SELECT d.doc_id, coalesce(sc.n_tok, 0) AS n_tok,
        |  coalesce(sc.score_fp, 0) AS score_fp
        |FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id""".stripMargin,
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
    // q178: q101's clusters + survivorship (argmax by n_chars, min-id
    // tie-break; sorted distinct source union)
    "q178_golden_record" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '[\s[:punct:]]+'), x -> len(x) > 0) AS ts
        |  FROM documents
        |), idx AS (
        |  SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 1)) AS i
        |  FROM toks WHERE len(ts) >= 2
        |), sh AS (
        |  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] AS shingle FROM idx
        |), sizes AS (
        |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
        |), inter AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id
        |), pairs AS (
        |  SELECT id1, id2 FROM inter
        |  JOIN sizes sa ON sa.doc_id = id1 JOIN sizes sb ON sb.doc_id = id2
        |  WHERE 3 * inter > 1 * (sa.n + sb.n - inter)
        |), edges AS (
        |  SELECT id1 AS a, id2 AS b FROM pairs
        |  UNION ALL SELECT id2, id1 FROM pairs
        |), walk(id, r) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.b, w.r FROM walk w JOIN edges e ON e.a = w.id
        |), cl AS (
        |  SELECT id AS doc_id, min(r) AS cluster_id FROM walk GROUP BY id
        |), j AS (
        |  SELECT c.cluster_id, d.doc_id, d.n_chars, d.source
        |  FROM cl c JOIN documents d ON d.doc_id = c.doc_id
        |), r AS (
        |  SELECT *, row_number() OVER (PARTITION BY cluster_id
        |    ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM j
        |)
        |SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members,
        |  max(CASE WHEN rn = 1 THEN doc_id END) AS rep_id,
        |  max(CASE WHEN rn = 1 THEN n_chars END) AS rep_quality,
        |  CAST(sum(n_chars) AS BIGINT) AS total_quality,
        |  string_agg(DISTINCT source, ',' ORDER BY source) AS attrs
        |FROM r GROUP BY cluster_id""".stripMargin,
    // q179: q116's hashed-linear score mapped to ppm, decile calibration
    // + per-bucket Brier — all exact integer arithmetic
    "q179_calibration" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    list_transform(
        |      list_filter(regexp_split_to_array(text, '[\s[:punct:]]+'),
        |        x -> len(x) > 0),
        |      t -> (((ascii(substr(md5(t), 1, 1)) * 131
        |            + ascii(substr(md5(t), 2, 1))) * 131
        |            + ascii(substr(md5(t), 3, 1))) * 131
        |            + ascii(substr(md5(t), 4, 1))) % 64) AS bs
        |  FROM documents
        |), sc AS (
        |  SELECT doc_id,
        |    CAST(coalesce(list_sum(list_transform(bs, b -> (b % 7) - 3)), 0) AS BIGINT) AS s
        |  FROM tok
        |), p AS (
        |  SELECT d.doc_id,
        |    CASE WHEN d.n_chars >= 300 THEN 1 ELSE 0 END AS y,
        |    least(1000000, greatest(0, 500000 + sc.s * 10000)) AS p_ppm
        |  FROM documents d JOIN sc ON sc.doc_id = d.doc_id
        |)
        |SELECT least(9, p_ppm // 100000) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(y) AS BIGINT) AS n_pos,
        |  CAST((1000000 * sum(y)) // count(*) AS BIGINT) AS obs_ppm,
        |  CAST(sum(p_ppm) // count(*) AS BIGINT) AS avg_p_ppm,
        |  CAST(sum((p_ppm - y * 1000000) * (p_ppm - y * 1000000))
        |    // (count(*) * 1000000) AS BIGINT) AS brier_ppm
        |FROM p GROUP BY 1""".stripMargin,
    // q180: known-item retrieval eval — BM25 shapes mirror q88's oracle
    // exactly; ranking on the rounded score with id tie-break, metric
    // columns are pure integers
    "q180_mrr" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '[\s[:punct:]]+'), x -> len(x) > 0) AS ts
        |  FROM documents
        |), d AS (
        |  SELECT doc_id, len(ts) AS dl, ts FROM toks WHERE len(ts) > 0
        |), stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM d
        |), q AS (
        |  SELECT doc_id AS qid, list_distinct(ts[1:3]) AS terms
        |  FROM toks WHERE doc_id < 20
        |), qt AS (
        |  SELECT qid, unnest(terms) AS tok FROM q
        |), tf AS (
        |  SELECT doc_id, dl, tok, count(*) AS tf
        |  FROM (SELECT doc_id, dl, unnest(ts) AS tok FROM d)
        |  GROUP BY doc_id, dl, tok
        |), dfreq AS (
        |  SELECT tok, count(*) AS df FROM tf GROUP BY tok
        |), sc AS (
        |  SELECT qt.qid, tf.doc_id AS id,
        |    round(sum(
        |      ln((n - df + 0.5) / (df + 0.5) + 1.0) *
        |      (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 6) AS score
        |  FROM qt JOIN tf USING (tok) JOIN dfreq USING (tok) CROSS JOIN stats
        |  GROUP BY qt.qid, tf.doc_id
        |), rk AS (
        |  SELECT qid, id,
        |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, id) AS rank
        |  FROM sc
        |), hit AS (SELECT qid, rank FROM rk WHERE rank <= 10 AND id = qid)
        |SELECT q.qid, CAST(coalesce(hit.rank, 0) AS BIGINT) AS rank_in_top10,
        |  CAST(coalesce(1000000 // hit.rank, 0) AS BIGINT) AS rr_ppm,
        |  CASE WHEN hit.rank IS NOT NULL THEN 1 ELSE 0 END AS hit10
        |FROM q LEFT JOIN hit USING (qid)""".stripMargin,
    // q181: temperature sampling weights — pow enters once per group,
    // every output shape mirrored exactly
    "q181_temperature_mix" ->
      """WITH g AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY source
        |), t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS N FROM g
        |), pw AS (
        |  SELECT source, n_docs, N,
        |    pow(CAST(n_docs AS DOUBLE) / N, 0.3) AS pw
        |  FROM g, t
        |), z AS (SELECT sum(pw) AS z FROM pw)
        |SELECT source, n_docs,
        |  CAST((1000000 * n_docs) // N AS BIGINT) AS p_ppm,
        |  CAST(round(1000000 * pw / z) AS BIGINT) AS q_ppm,
        |  CAST(round(1000000 * pw / z / (CAST(n_docs AS DOUBLE) / N)) AS BIGINT)
        |    AS rate_ppm
        |FROM pw, z""".stripMargin,
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
    // q184: q21's brute-force restated over the predicate-filtered corpus
    "q184_filtered_ann" ->
      """SELECT probe_id, neighbor_id, CAST(rank AS BIGINT) AS rank FROM (
        |  SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY a.vec_id
        |      ORDER BY round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 9) DESC, b.vec_id) AS rank
        |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
        |  WHERE a.vec_id < 50 AND b.label = 3 AND b.vec_id % 2 = 0
        |) WHERE rank <= 3""".stripMargin,
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
    // q186: same grouping-id bit order as Spark (first column = MSB)
    "q186_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus)
        |    AS BIGINT) AS gid,
        |  count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,
    // q188: presence contingency + exact centi-chi2 in HUGEINT
    "q188_chi2" ->
      """WITH docterm AS (
        |  SELECT DISTINCT doc_id, source,
        |    unnest(string_split(text, ' ')) AS term
        |  FROM documents WHERE text IS NOT NULL
        |), tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(CASE WHEN source = 'src0' THEN 1 END) AS BIGINT)
        |      AS npos
        |  FROM documents
        |), cts AS (
        |  SELECT term,
        |    CAST(count(CASE WHEN source = 'src0' THEN 1 END) AS BIGINT) AS a,
        |    CAST(count(CASE WHEN source <> 'src0' THEN 1 END) AS BIGINT) AS b
        |  FROM docterm WHERE term <> '' GROUP BY term
        |)
        |SELECT term, a, b, npos - a AS c, (n - npos) - b AS d,
        |  CAST(CAST(100 AS HUGEINT) * n
        |      * (a * ((n - npos) - b) - b * (npos - a))
        |      * (a * ((n - npos) - b) - b * (npos - a))
        |    // (CAST(a + b AS HUGEINT) * ((npos - a) + ((n - npos) - b))
        |       * npos * (n - npos)) AS BIGINT) AS chi2_centi
        |FROM cts, tot
        |WHERE a + b > 0 AND (npos - a) + ((n - npos) - b) > 0
        |  AND npos > 0 AND n - npos > 0""".stripMargin,
    // q189: clipped 1/2-gram precision; bigrams via explicit index join
    "q189_ngram_overlap" ->
      """WITH pairs AS (
        |  SELECT c.doc_id AS pair_id, c.text AS cand, r.text AS ref
        |  FROM documents c JOIN documents r ON r.doc_id = c.doc_id + 1
        |  WHERE c.doc_id % 2 = 0
        |), c1 AS (
        |  SELECT pair_id, g, CAST(count(*) AS BIGINT) AS cc FROM (
        |    SELECT pair_id, unnest(string_split(cand, ' ')) AS g FROM pairs)
        |  WHERE g <> '' GROUP BY 1, 2
        |), r1 AS (
        |  SELECT pair_id, g, CAST(count(*) AS BIGINT) AS rc FROM (
        |    SELECT pair_id, unnest(string_split(ref, ' ')) AS g FROM pairs)
        |  WHERE g <> '' GROUP BY 1, 2
        |), o1 AS (
        |  SELECT c1.pair_id,
        |    CAST(sum(least(cc, coalesce(rc, 0))) AS BIGINT) AS hit1,
        |    CAST(sum(cc) AS BIGINT) AS tot1
        |  FROM c1 LEFT JOIN r1 ON c1.pair_id = r1.pair_id AND c1.g = r1.g
        |  GROUP BY 1
        |), c2 AS (
        |  SELECT pair_id, g, CAST(count(*) AS BIGINT) AS cc FROM (
        |    SELECT pair_id, l[i] || ' ' || l[i + 1] AS g
        |    FROM (SELECT pair_id, string_split(cand, ' ') AS l FROM pairs),
        |      UNNEST(range(1, greatest(len(l), 1))) AS t(i))
        |  GROUP BY 1, 2
        |), r2 AS (
        |  SELECT pair_id, g, CAST(count(*) AS BIGINT) AS rc FROM (
        |    SELECT pair_id, l[i] || ' ' || l[i + 1] AS g
        |    FROM (SELECT pair_id, string_split(ref, ' ') AS l FROM pairs),
        |      UNNEST(range(1, greatest(len(l), 1))) AS t(i))
        |  GROUP BY 1, 2
        |), o2 AS (
        |  SELECT c2.pair_id,
        |    CAST(sum(least(cc, coalesce(rc, 0))) AS BIGINT) AS hit2,
        |    CAST(sum(cc) AS BIGINT) AS tot2
        |  FROM c2 LEFT JOIN r2 ON c2.pair_id = r2.pair_id AND c2.g = r2.g
        |  GROUP BY 1
        |)
        |SELECT o1.pair_id, hit1, tot1,
        |  CAST((1000000 * hit1) // tot1 AS BIGINT) AS p1_ppm,
        |  hit2, tot2, CAST((1000000 * hit2) // tot2 AS BIGINT) AS p2_ppm
        |FROM o1 JOIN o2 ON o1.pair_id = o2.pair_id
        |WHERE tot1 > 0 AND tot2 > 0""".stripMargin,
    // q190: two integer rankers, integer reciprocal contributions
    "q190_rrf" ->
      """WITH lex AS (
        |  SELECT doc_id, row_number() OVER (ORDER BY
        |    len(list_filter(string_split(text, ' '), x -> x = 'spark'))
        |      DESC, doc_id) AS rank
        |  FROM documents
        |), lenr AS (
        |  SELECT doc_id, row_number() OVER (ORDER BY n_chars DESC, doc_id)
        |    AS rank
        |  FROM documents
        |), u AS (
        |  SELECT doc_id, rank FROM lex WHERE rank <= 100
        |  UNION ALL
        |  SELECT doc_id, rank FROM lenr WHERE rank <= 100
        |)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lists,
        |  CAST(sum(1000000 // (60 + rank)) AS BIGINT) AS rrf_ppm
        |FROM u GROUP BY doc_id
        |ORDER BY rrf_ppm DESC, doc_id LIMIT 50""".stripMargin,
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
        |FROM obs GROUP BY user_id""".stripMargin,
    // q194: q21's ranking with the near-dup band cut, stated verbatim
    "q194_hard_negatives" ->
      """SELECT probe_id, neighbor_id, CAST(rank AS BIGINT) AS rank FROM (
        |  SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY a.vec_id
        |      ORDER BY round(list_cosine_similarity(
        |        CAST(a.embedding AS DOUBLE[]),
        |        CAST(b.embedding AS DOUBLE[])), 9) DESC, b.vec_id) AS rank
        |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
        |  WHERE a.vec_id < 30
        |    AND round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |      CAST(b.embedding AS DOUBLE[])), 9) < 0.35
        |) WHERE rank <= 5""".stripMargin,
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
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'""".stripMargin,
    // q198: SCC = mutual reachability, stated as a recursive closure
    // joined with its own reverse; scc id = min mutual partner (or self)
    "q198_scc" ->
      """WITH RECURSIVE seq AS (
        |  SELECT o_custkey AS c, o_orderkey AS k,
        |    lead(o_orderkey) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS nxt,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders WHERE o_custkey < 400
        |), chain AS (
        |  SELECT k AS src, nxt AS dst FROM seq WHERE nxt IS NOT NULL
        |), closing AS (
        |  SELECT l.k AS src, f.k AS dst
        |  FROM (SELECT c, k FROM seq WHERE nxt IS NULL) l
        |  JOIN (SELECT c, k FROM seq WHERE rn = 1) f USING (c)
        |  WHERE c < 300
        |), e AS (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT src, dst FROM chain UNION ALL SELECT src, dst FROM closing)
        |), verts AS (
        |  -- explicit DISTINCT: under WITH RECURSIVE, DuckDB gives bare
        |  -- UNION inside non-recursive CTEs append semantics
        |  SELECT DISTINCT id FROM (
        |    SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e)
        |), reach AS (
        |  SELECT src AS s, dst AS d FROM e
        |  UNION
        |  SELECT r.s, e.dst FROM reach r JOIN e ON r.d = e.src
        |), mutual AS (
        |  SELECT r1.s AS v, min(r1.d) AS minw
        |  FROM reach r1 JOIN reach r2 ON r1.d = r2.s AND r2.d = r1.s
        |  GROUP BY r1.s
        |)
        |SELECT v.id AS o_orderkey,
        |  CAST(least(v.id, coalesce(m.minw, v.id)) AS BIGINT) AS scc
        |FROM verts v LEFT JOIN mutual m ON m.v = v.id""".stripMargin,
    // q202: the SAME oracle as q198 — the distributed divide-and-conquer
    // path must be row-for-row identical to the driver Tarjan path
    "q202_scc_dist" ->
      """WITH RECURSIVE seq AS (
        |  SELECT o_custkey AS c, o_orderkey AS k,
        |    lead(o_orderkey) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS nxt,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders WHERE o_custkey < 400
        |), chain AS (
        |  SELECT k AS src, nxt AS dst FROM seq WHERE nxt IS NOT NULL
        |), closing AS (
        |  SELECT l.k AS src, f.k AS dst
        |  FROM (SELECT c, k FROM seq WHERE nxt IS NULL) l
        |  JOIN (SELECT c, k FROM seq WHERE rn = 1) f USING (c)
        |  WHERE c < 300
        |), e AS (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT src, dst FROM chain UNION ALL SELECT src, dst FROM closing)
        |), verts AS (
        |  -- explicit DISTINCT: under WITH RECURSIVE, DuckDB gives bare
        |  -- UNION inside non-recursive CTEs append semantics
        |  SELECT DISTINCT id FROM (
        |    SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e)
        |), reach AS (
        |  SELECT src AS s, dst AS d FROM e
        |  UNION
        |  SELECT r.s, e.dst FROM reach r JOIN e ON r.d = e.src
        |), mutual AS (
        |  SELECT r1.s AS v, min(r1.d) AS minw
        |  FROM reach r1 JOIN reach r2 ON r1.d = r2.s AND r2.d = r1.s
        |  GROUP BY r1.s
        |)
        |SELECT v.id AS o_orderkey,
        |  CAST(least(v.id, coalesce(m.minw, v.id)) AS BIGINT) AS scc
        |FROM verts v LEFT JOIN mutual m ON m.v = v.id""".stripMargin,
    // q203: sparse-entity PARIS — odd keys have no grp statement, so the
    // functional penalty is skipped for any pair touching one (0.25);
    // both-even pairs agree (0.625) or conflict (0.125) on grp
    "q203_paris_sparse" ->
      """SELECT 'c:' || a.c_custkey AS x1, 'c:' || b.c_custkey AS x2,
        |  CAST(CASE
        |    WHEN a.c_custkey % 2 = 0 AND b.c_custkey % 2 = 0
        |      AND a.c_custkey // 10 = b.c_custkey // 10 THEN 0.625
        |    WHEN a.c_custkey % 2 = 0 AND b.c_custkey % 2 = 0 THEN 0.125
        |    ELSE 0.25 END AS DOUBLE) AS prob
        |FROM customer a JOIN customer b
        |  ON a.c_custkey // 20 = b.c_custkey // 20
        |  AND 'c:' || a.c_custkey < 'c:' || b.c_custkey""".stripMargin,
    // q204: the variable-graph INSERT copies both statements of every
    // customer into the graph that held them (the customer graph)
    "q204_update_graph_var" ->
      """SELECT 'c:' || c_custkey AS s, 'flag' AS p, c_mktsegment AS o,
        |  'customer' AS g, 2 AS okind
        |FROM customer
        |UNION ALL
        |SELECT 'c:' || c_custkey, 'flagNation', 'n:' || c_nationkey,
        |  'customer', 0
        |FROM customer""".stripMargin,
    // q205: same-segment customer pairs with the right side in nation 0
    "q205_graph_meta" ->
      """SELECT 'c:' || a.c_custkey AS c1, 'c:' || b.c_custkey AS c2,
        |  a.c_mktsegment AS seg
        |FROM customer a JOIN customer b ON a.c_mktsegment = b.c_mktsegment
        |WHERE b.c_nationkey = 0 AND a.c_custkey <> b.c_custkey""".stripMargin,
    // q199: exhaustive routing (nprobe = nlist) makes the batch kNN join
    // exact — the oracle is the full corpus-as-probes self top-3
    "q199_knn_join" ->
      """SELECT probe_id, neighbor_id, rank FROM (
        |  SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id,
        |    CAST(row_number() OVER (PARTITION BY a.vec_id
        |      ORDER BY round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 9) DESC, b.vec_id) AS INTEGER) AS rank
        |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
        |) WHERE rank <= 3""".stripMargin,
    // q201: the SAME oracle as q199 — the salted path must be
    // result-identical to the unsplit exact join for any task caps
    "q201_knn_salted" ->
      """SELECT probe_id, neighbor_id, rank FROM (
        |  SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id,
        |    CAST(row_number() OVER (PARTITION BY a.vec_id
        |      ORDER BY round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 9) DESC, b.vec_id) AS INTEGER) AS rank
        |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
        |) WHERE rank <= 3""".stripMargin,
    // q200: q101's recursive-CTE component closure, then the pinned
    // cluster-id-modulus split (weights 7/2/1 over 10 cells) — the
    // leakage guarantee is structural: split is a function of component
    "q200_leakage_split" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '[\s[:punct:]]+'), x -> len(x) > 0) AS ts
        |  FROM documents
        |), idx AS (
        |  SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 1)) AS i
        |  FROM toks WHERE len(ts) >= 2
        |), sh AS (
        |  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] AS shingle FROM idx
        |), sizes AS (
        |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
        |), inter AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id
        |), pairs AS (
        |  SELECT id1, id2 FROM inter
        |  JOIN sizes sa ON sa.doc_id = id1 JOIN sizes sb ON sb.doc_id = id2
        |  WHERE 3 * inter > 1 * (sa.n + sb.n - inter)
        |), edges AS (
        |  SELECT id1 AS a, id2 AS b FROM pairs
        |  UNION SELECT id2, id1 FROM pairs
        |), reach(a, b) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
        |), comp AS (
        |  SELECT d.doc_id,
        |    CAST(LEAST(d.doc_id, COALESCE(MIN(r.b), d.doc_id)) AS BIGINT) AS component
        |  FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
        |  GROUP BY d.doc_id
        |)
        |SELECT doc_id, component,
        |  CAST(CASE WHEN component % 10 < 7 THEN 0
        |            WHEN component % 10 < 9 THEN 1
        |            ELSE 2 END AS INT) AS split
        |FROM comp""".stripMargin
  )

  /** Headline queries timed by [[Bench]] at sf0.1. */
  val benchQueries: Seq[String] = Seq(
    "q01_agg", "q03_join", "q07_topk", "q09_range_join", "q13_closure",
    "q14_components", "q16_dedup_exact", "q19_ngram_jaccard", "q21_ann_top1",
    "q25_minhash_lsh", "q26_simhash", "q28_idf", "q30_token_blocking",
    "q39_stays", "q41_agent_match", "q49_multimodal", "q82_span_dedup",
    "q102_audio", "q103_video", "q120_asof_join", "q121_pagerank",
    // LLM-pipeline heavies, regression-tracked since round 9
    // (BENCH_NOTES.md records per-query targets)
    "q133_setsim_join", "q158_bm25_topk", "q159_heavy_hitters", "q174_dsir",
    "q199_knn_join")
}
