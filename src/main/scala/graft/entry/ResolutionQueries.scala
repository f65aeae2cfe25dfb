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

/** Entity resolution and inference: token blocking, soft-TF-IDF agent matching, IFP pairs, OWL/RDFS fixpoints, PARIS.
  *
  * One of the per-package query registries aggregated by
  * [[graft.SparkEntry]] — split out of the former 6k-LoC single object
  * so each registry compiles to a bounded class (static-init and
  * JIT/class-loading pressure were the bench's named suspect).
  * Query semantics, ids and oracle SQL are unchanged by the split.
  */
private[graft] object ResolutionQueries {

  /** J4: inverse-functional-property pairs (shared (brand,size) ⇒ same). */
  private def q15_ifp_pairs(s: SparkSession, dir: String): DataFrame =
    Resolution.ifpPairs(t(s, dir, "part"), Seq("p_brand", "p_size"), "p_partkey")

  /** A3: IDF table over documents (log on exact ints; round to 9 places). */
  private def q28_idf(s: SparkSession, dir: String): DataFrame =
    Resolution.idf(t(s, dir, "documents"), "text", "doc_id")
      .select(col("tok"), col("df"), round(col("idf"), 9).as("idf"))

  /** J3: token-blocking similarity candidates over part names; tokens in
    * more than 20% of rows are pruned (the IDF/skew guard), so candidate
    * fan-out stays bounded as data grows. Exact semantics → SQL oracle. */
  private def q30_token_blocking(s: SparkSession, dir: String): DataFrame =
    Resolution.tokenBlockingCandidatesFrac(t(s, dir, "part"), "p_name", "p_partkey",
      maxDocFreqFraction = 0.2, maxBlockSize = Some(100))

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

  /** G10/A7: PARIS alignment on a dyadic-rational fixture — hash-exact
    * against the closed-form SQL oracle since round 11 (the comment
    * below states the construction; this line previously still said
    * "rows-only", a pre-r11 leftover caught by the r15 registry review). */
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

  private[graft] val queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "q15_ifp_pairs" -> (q15_ifp_pairs _),
    "q28_idf" -> (q28_idf _),
    "q30_token_blocking" -> (q30_token_blocking _),
    "q41_agent_match" -> (q41_agent_match _),
    "q42_inference" -> (q42_inference _),
    "q52_paris" -> (q52_paris _),
    "q53_class_primary" -> (q53_class_primary _),
    "q92_rdfs" -> (q92_rdfs _),
    "q160_fellegi_sunter" -> (q160_fellegi_sunter _),
    "q178_golden_record" -> (q178_golden_record _),
    "q203_paris_sparse" -> (q203_paris_sparse _))

  private[graft] val oracleSql: ListMap[String, String] = ListMap(
    "q15_ifp_pairs" ->
      """SELECT a.p_partkey AS s1, b.p_partkey AS s2 FROM part a JOIN part b
        |ON a.p_brand = b.p_brand AND a.p_size = b.p_size
        |AND a.p_partkey < b.p_partkey""".stripMargin,
    "q28_idf" ->
      """WITH toks AS (
        |  SELECT DISTINCT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '[\s[:punct:]]+'), x -> len(x) > 0)) AS tok
        |  FROM documents
        |), n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents)
        |SELECT tok, count(*) AS df, round(ln(n_docs / count(*)), 9) AS idf
        |FROM toks, n GROUP BY tok, n_docs""".stripMargin,
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
    "q52_paris" ->
      """SELECT 'c:' || a.c_custkey AS x1, 'c:' || b.c_custkey AS x2,
        |  CAST(CASE WHEN a.c_custkey // 10 = b.c_custkey // 10
        |    THEN 0.625 ELSE 0.125 END AS DOUBLE) AS prob
        |FROM customer a JOIN customer b
        |  ON a.c_custkey // 20 = b.c_custkey // 20
        |  AND 'c:' || a.c_custkey < 'c:' || b.c_custkey""".stripMargin,
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
        |  AND 'c:' || a.c_custkey < 'c:' || b.c_custkey""".stripMargin
  )
}
