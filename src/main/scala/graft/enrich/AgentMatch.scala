package graft.enrich

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Similarity
import graft.text.TextAnalysis

/** Fuzzy-name entity resolution — the Spark-first re-expression of the
  * reference's AgentMatchEnricher (`thymeflow/src/main/com/thymeflow/
  * enricher/entityresolution/AgentMatchEnricher.scala`): candidate
  * generation by shared rare tokens (replacing the Elasticsearch
  * minimum-should-match pass, `:232-267`), pairwise scoring by IDF-weighted
  * soft-TF-IDF with optimal token alignment (`EntityResolution.scala:54-116`),
  * thresholding at the persistence probability, then connected components
  * over the surviving sameAs edges (`:365-379`).
  *
  * Scale shape: candidates come from an equi-join on tokens with a
  * doc-frequency prune (the hot-token skew guard), scoring happens only on
  * candidate pairs via a UDF over pre-collected (token, idf) arrays, and
  * the final closure is the distributed label-propagation components.
  */
object AgentMatch {

  /** @param records (idCol, nameCol)
    * @param threshold persistence threshold (reference default 0.9)
    * @return sameAs pairs (id1, id2, score) */
  def sameAsPairs(
      records: DataFrame,
      idCol: String,
      nameCol: String,
      threshold: Double = 0.9,
      maxDocFreqFraction: Double = 0.5,
      simThreshold: Double = 0.9,
      maxBlockSize: Option[Int] = Some(10000)): DataFrame = {
    val spark = records.sparkSession
    // ONE tokenize subtree feeds everything; how much else fuses is
    // byte-gated on the INPUT's optimizer stats ([[Resolution.FuseBytes]]).
    // Small corpora: the document-frequency count, the IDF weight, and
    // the blocking group are all keyed on tok, so one groupBy produces
    // (tok, ids, idf) and feeds both the per-record weight arrays
    // (re-exploded, no join) and the pair tail — the fewest-stage shape,
    // but its collect runs before the hot-token prune, so it is only safe
    // when the whole corpus is broadcast-sized. At scale: count df first
    // (map-side partial aggregation, skew-safe), prune, and only then
    // collect the surviving tokens' blocks; weights come from a
    // co-partitioned (id, tok) ⋈ idf join. Both shapes are the same
    // logical result.
    val toksFlat = Resolution.tokShuffled(records, nameCol, idCol)
    val scalars = records.select(count(lit(1)).as("__n"),
      countDistinct(col(idCol)).as("n_docs"))
    val small = Resolution.smallInput(records)
    // sort_array keeps pair generation deterministic (id1 < id2 within a
    // block, lowest ids survive the cap) — reference searchSize semantics
    val (toks, candidates) =
      if (small) {
        // materialize the per-token groups once: both consumers (weights
        // re-explode, blocks filter) otherwise re-run the collect_list
        // aggregation above the reused exchange — the profiler showed the
        // two 64-task agg branches as the dominant steady-state stages
        val base = toksFlat.groupBy("tok")
          .agg(sort_array(collect_list(col("id"))).as("ids"))
          .crossJoin(broadcast(scalars))
          .withColumn("df", size(col("ids")).cast("long"))
          .withColumn("idf", log(col("n_docs").cast("double") / col("df")))
          .localCheckpoint()
        val perId = base
          .select(col("tok"), col("idf"), explode(col("ids")).as("id"))
          .groupBy("id")
          .agg(collect_list(col("tok")).as("toks"), collect_list(col("idf")).as("ws"))
        val blocks = base.where(col("df") <= col("__n") * maxDocFreqFraction)
        (perId, Resolution.pairsFromIdLists(blocks, maxBlockSize))
      } else {
        val counts = toksFlat.groupBy("tok").agg(count(lit(1)).as("df"))
        val withScalars = counts.crossJoin(broadcast(scalars))
        val idf = withScalars.select(col("tok"),
          log(col("n_docs").cast("double") / col("df")).as("idf"))
        val rareTokens = withScalars
          .where(col("df") <= col("__n") * maxDocFreqFraction).select("tok")
        val perId = toksFlat
          .join(idf, Seq("tok"))
          .groupBy("id")
          .agg(collect_list(col("tok")).as("toks"), collect_list(col("idf")).as("ws"))
        (perId, Resolution.pairsFromBlocks(toksFlat, rareTokens, maxBlockSize))
      }
    // The (id → aligned token/weight arrays) side is ~input-sized, so on
    // small-to-medium corpora broadcast it: both candidate joins become
    // BroadcastHashJoins and the candidate stream flows from its
    // (id1, id2) aggregation straight into scoring with no further
    // exchange or sort. Past the gate the plan falls back to the shuffled
    // sort-merge joins, which is the 100 TB shape.
    val toksSized = if (small) broadcast(toks) else toks
    // Scoring is the one CPU-bound per-row stage of the pipeline, so it
    // runs as the native soft_tfidf expression ([[SoftTfIdfScore]] —
    // reads ArrayData directly, no per-row converter boxing) above a
    // widened candidate stream: AQE coalesces the tiny-in-bytes
    // candidate shuffles to a handful of tasks, and scoring placed on
    // them would serialize. r16 moves the spread BEFORE the weight
    // joins: the exchange now carries the bare (id1, id2) candidate
    // rows instead of the post-join token/weight arrays (measured
    // 2.4 MB vs 16.4 MB on q41 — guide §2.3 "project before the
    // exchange"), and the broadcast joins plus scoring fuse into the
    // widened stage. Gated on the SAME `small` input-stats gate as the
    // broadcast decision: past it the weight joins are shuffled
    // sort-merge and partition the candidates themselves — the old
    // unconditional repartition re-shuffled the full array payloads
    // there for nothing (guide §2.4 "remove shuffles outright").
    val spread =
      if (small)
        candidates.repartition(
          records.sparkSession.sparkContext.defaultParallelism)
      else candidates
    spread
      .join(toksSized.select(col("id").as("id1"), col("toks").as("t1"), col("ws").as("w1")), "id1")
      .join(toksSized.select(col("id").as("id2"), col("toks").as("t2"), col("ws").as("w2")), "id2")
      .withColumn("score", call_function("soft_tfidf",
        col("t1"), col("w1"), col("t2"), col("w2"),
        lit(simThreshold), lit(threshold)))
      .where(col("score") >= threshold)
      .select(col("id1"), col("id2"), col("score"))
  }

  /** Full resolution: pairs above threshold -> equivalence classes.
    * Output (id, component). */
  def resolve(
      records: DataFrame,
      idCol: String,
      nameCol: String,
      threshold: Double = 0.9,
      maxDocFreqFraction: Double = 0.5): DataFrame = {
    val pairs = sameAsPairs(records, idCol, nameCol, threshold, maxDocFreqFraction)
    graft.graph.GraphOps.connectedComponents(
      pairs.select(col("id1").as("src"), col("id2").as("dst")),
      vertices = Some(records.select(col(idCol).as("id"))))
  }
}
