package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.immutable.ListMap

import graft.entry._

/** Driver contract — every operator from SURVEY.md §2 exposed as a named
  * query over the driver's parquet tables, each paired (where ANSI-SQL
  * expressible) with a DuckDB oracle in [[oracleSql]].
  *
  * The query definitions live in per-package registries under
  * [[graft.entry]] (CoreSql/Operator/Rdf/SpatialGraph/Resolution/Dedup/
  * Similarity/Text/Multimodal); this object only aggregates them. The
  * former single 6k-LoC object compiled every query, both contract maps
  * and their lambdas into one giant class + static initializer — the
  * bench's measured class-loading/JIT suspect (BENCH_NOTES round-13
  * A/B). Query ids, semantics and oracle SQL are unchanged by the split.
  *
  * Determinism rules used throughout (so DuckDB hash-compare is stable):
  * output columns are integers, strings, or doubles that are either read
  * unmodified from parquet or exact-integer-valued; float math appears only
  * in predicates with safe margins; every computed column is aliased
  * identically here and in the oracle SQL.
  */
object SparkEntry {

  private val registries = Seq(
    CoreSqlQueries.queries -> CoreSqlQueries.oracleSql,
    OperatorQueries.queries -> OperatorQueries.oracleSql,
    RdfQueries.queries -> RdfQueries.oracleSql,
    SpatialGraphQueries.queries -> SpatialGraphQueries.oracleSql,
    ResolutionQueries.queries -> ResolutionQueries.oracleSql,
    DedupQueries.queries -> DedupQueries.oracleSql,
    SimilarityQueries.queries -> SimilarityQueries.oracleSql,
    TextQueries.queries -> TextQueries.oracleSql,
    MultimodalQueries.queries -> MultimodalQueries.oracleSql)

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    registries.map(_._1).reduce(_ ++ _)

  val oracleSql: Map[String, String] =
    registries.map(_._2).reduce(_ ++ _)

  // `++` on maps silently drops duplicate keys — a query id accidentally
  // registered in two packages must fail loudly, not shrink the board
  require(queries.size == registries.map(_._1.size).sum,
    "duplicate query ids across entry registries")
  require(oracleSql.size == registries.map(_._2.size).sum,
    "duplicate oracle ids across entry registries")
  require(oracleSql.keySet.subsetOf(queries.keySet),
    "oracle entry without a matching query: " +
      (oracleSql.keySet -- queries.keySet).mkString(", "))

  /** Flagship query on sf=0.001; driver smoke-checks rows>0.
    * Pricing-summary style aggregate with an exact-cents revenue sum. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_agg")(spark, "/root/testdata/sf0.001")

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
    "q199_knn_join",
    // the IVF serving route (nprobe << nlist over a persisted index) —
    // the scale path that replaces q199's exact configuration at 100 TB;
    // its repeat column times pure serving (cold includes the one-time
    // index build). Recall floor vs exact: IvfServeSpec + SCALING.md.
    "q207_ivf_serve")
}
