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
    // ONE tokenize subtree and ONE per-token aggregation feed everything.
    // The document-frequency count, the IDF weight, and the blocking
    // group are all keyed on tok, so they are computed as a single
    // groupBy producing (tok, ids, df): the weights branch re-explodes it
    // to (id, tok, idf) and the block→pair tail filters it by the
    // doc-frequency prune. The earlier formulation ran them as three
    // separate aggregation/join subtrees over the shared (id, tok)
    // exchange — correct, but three more exchanges and two more joins of
    // pure scheduling overhead per run; the fused shape is the same
    // logical result with the base aggregation deduped via exchange
    // reuse across its two consumers.
    val toksFlat = Resolution.tokShuffled(records, nameCol, idCol)
    val scalars = records.select(count(lit(1)).as("__n"),
      countDistinct(col(idCol)).as("n_docs"))
    // sort_array keeps pair generation deterministic (id1 < id2 within a
    // block, lowest ids survive the cap) — reference searchSize semantics
    val base = toksFlat.groupBy("tok")
      .agg(sort_array(collect_list(col("id"))).as("ids"),
        count(lit(1)).as("df"))
      .crossJoin(broadcast(scalars))
      .withColumn("idf", log(col("n_docs").cast("double") / col("df")))
    // per-record (tokens, weights) aligned arrays, recovered from the
    // per-token groups — no (id, tok) ⋈ idf join needed
    val toks = base
      .select(col("tok"), col("idf"), explode(col("ids")).as("id"))
      .groupBy("id")
      .agg(collect_list(col("tok")).as("toks"), collect_list(col("idf")).as("ws"))
    val blocks = base.where(col("df") <= col("__n") * maxDocFreqFraction)
    val cappedIds = maxBlockSize match {
      case Some(cap) => slice(col("ids"), 1, cap)
      case None => col("ids")
    }
    val candidates = blocks
      .select(posexplode(cappedIds).as(Seq("__i", "id1")), cappedIds.as("ids"))
      .select(col("id1"),
        explode(slice(col("ids"), col("__i") + lit(2), size(col("ids")))).as("id2"))
      .groupBy(col("id1"), col("id2"))
      .agg(count(lit(1)).as("shared_tokens"))
    // The (id → aligned token/weight arrays) side is ~input-sized, so on
    // small-to-medium corpora broadcast it: both candidate joins become
    // BroadcastHashJoins and the candidate stream flows from its
    // (id1, id2) aggregation straight into scoring with no further
    // exchange or sort. Byte-gated on the INPUT's optimizer stats (the
    // aggregated side has no reliable estimate) — past the gate the plan
    // falls back to the shuffled sort-merge joins, which is the 100 TB
    // shape.
    val toksSized =
      if (records.queryExecution.optimizedPlan.stats.sizeInBytes < (1L << 26))
        broadcast(toks)
      else toks
    // Scoring is the one CPU-bound per-row stage of the pipeline, so it
    // runs as the native soft_tfidf expression ([[SoftTfIdfScore]] —
    // reads ArrayData directly, no per-row converter boxing) pinned
    // above an explicit round-robin exchange: AQE coalesces the tiny-
    // in-bytes candidate shuffles to a handful of tasks, and scoring
    // placed any lower would serialize on them. One cheap shuffle of
    // (ids + token arrays) buys a full-width scoring stage.
    candidates
      .join(toksSized.select(col("id").as("id1"), col("toks").as("t1"), col("ws").as("w1")), "id1")
      .join(toksSized.select(col("id").as("id2"), col("toks").as("t2"), col("ws").as("w2")), "id2")
      .repartition(records.sparkSession.sparkContext.defaultParallelism)
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
