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

/** Vector similarity: brute-force/LSH/IVF ANN, quantized search, kNN joins, semantic dedup, hard negatives.
  *
  * One of the per-package query registries aggregated by
  * [[graft.SparkEntry]] — split out of the former 6k-LoC single object
  * so each registry compiles to a bounded class (static-init and
  * JIT/class-loading pressure were the bench's named suspect).
  * Query semantics, ids and oracle SQL are unchanged by the split.
  */
private[graft] object SimilarityQueries {

  /** Similarity search: exact brute-force cosine top-1 for a probe set. */
  private def q21_ann_top1(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Ann.bruteForceTopK(emb, emb.where(col("vec_id") < 100), "vec_id", "embedding", k = 1)
      .select(col("probe_id"), col("neighbor_id"))
  }

  /** Embedding near-dup: cosine-threshold pairs (exact, margin-safe). */
  private def q27_cosine_pairs(s: SparkSession, dir: String): DataFrame =
    Ann.thresholdPairs(t(s, dir, "embeddings"), "vec_id", "embedding", 0.4)

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

  /** q163: integer-exact Gram matrix XᵀX of the embedding corpus in
    * micro-units — the d×d reduction all dominant-direction and
    * whitening post-processing starts from. */
  private def q163_gram(s: SparkSession, dir: String): DataFrame =
    graft.similarity.Embeddings.gramMicro(t(s, dir, "embeddings"),
      "embedding", 1000L)
      .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
        col("s"))

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

  /** q207: the IVF SERVING route — the path a 100 TB deployment actually
    * runs (r14 verdict #1: q199's exact-kNN bench entry is quadratic by
    * configuration; this entry puts the scale-safe alternative under the
    * same timed-receipt discipline). First call builds + persists the
    * bucket-partitioned index ([[Ann.ivfBuild]]/[[Ann.ivfSave]] — the
    * offline half, amortized over every later batch); subsequent calls
    * [[Ann.ivfLoad]] and serve a FIXED 200-probe batch through
    * [[Ann.ivfQuery]]'s literal-pushdown route (nprobe ≪ nlist, static
    * partition + cent_id filters into the list scan). Bench's repeat
    * column therefore times pure serving; the cold column includes the
    * one-time build. Approximate by nature (no SQL oracle — same
    * category as q50): the recall contract vs the exact top-k is a 0.90
    * floor asserted in IvfServeSpec on a clustered corpus (the workload
    * IVF assumes) and measured per-corpus by ScalingProbe `ivfServe` —
    * 0.93 on the 10× ScaleUp corpus (clustered: 10 perturbation-copies
    * per family), 0.32 on the driver's sf0.1 table, which is isotropic
    * RANDOM (mean pairwise cosine ≈ 0, SCALING.md): there routing can
    * only beat the scanned fraction (4/44 ≈ 9% → 3.5× lift), a data
    * property every IVF shares, not an implementation defect. The auto
    * nlist (√n) keeps list length √n, so serve cost grows ~√n while the
    * probe batch stays fixed — the sublinear scale shape q199 cannot
    * have (measured 1.3–1.7× serve at 10× data vs q199's ~7.7×). */
  private def q207_ivf_serve(s: SparkSession, dir: String): DataFrame = {
    val idxPath = EntryKit.fixtureDir(dir) + "/q207_ivf_index"
    if (!new java.io.File(s"$idxPath/meta/_SUCCESS").exists()) {
      val emb = t(s, dir, "embeddings")
      Ann.ivfSave(Ann.ivfBuild(emb, "vec_id", "embedding"), idxPath)
    }
    val index = Ann.ivfLoad(s, idxPath)
    val probes = t(s, dir, "embeddings").where(col("vec_id") < 200)
    Ann.ivfQuery(index, probes, "vec_id", "embedding", k = 10, nprobe = 4)
      .select(col("probe_id"), col("neighbor_id"),
        col("rank").cast("long").as("rank"))
  }

  private[graft] val queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "q21_ann_top1" -> (q21_ann_top1 _),
    "q27_cosine_pairs" -> (q27_cosine_pairs _),
    "q50_ann_ivf" -> (q50_ann_ivf _),
    "q51_lsh_pairs" -> (q51_lsh_pairs _),
    "q84_semantic_dedup" -> (q84_semantic_dedup _),
    "q163_gram" -> (q163_gram _),
    "q184_filtered_ann" -> (q184_filtered_ann _),
    "q194_hard_negatives" -> (q194_hard_negatives _),
    "q199_knn_join" -> (q199_knn_join _),
    "q201_knn_salted" -> (q201_knn_salted _),
    "q207_ivf_serve" -> (q207_ivf_serve _))

  private[graft] val oracleSql: ListMap[String, String] = ListMap(
    "q21_ann_top1" ->
      """SELECT probe_id, neighbor_id FROM (
        |  SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY a.vec_id
        |      ORDER BY round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 9) DESC, b.vec_id) AS rk
        |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
        |  WHERE a.vec_id < 100
        |) WHERE rk = 1""".stripMargin,
    "q27_cosine_pairs" ->
      """SELECT a.vec_id AS id1, b.vec_id AS id2
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) > 0.4""".stripMargin,
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
    // q184: q21's brute-force restated over the predicate-filtered corpus
    "q184_filtered_ann" ->
      """SELECT probe_id, neighbor_id, CAST(rank AS BIGINT) AS rank FROM (
        |  SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY a.vec_id
        |      ORDER BY round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 9) DESC, b.vec_id) AS rank
        |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
        |  WHERE a.vec_id < 50 AND b.label = 3 AND b.vec_id % 2 = 0
        |) WHERE rank <= 3""".stripMargin,
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
        |) WHERE rank <= 3""".stripMargin
  )
}
