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
    val idf = Resolution.idf(records, nameCol, idCol)
      .select(col("tok"), col("idf"))
    // per-record (tokens, weights) aligned arrays
    val toks = records.select(
        col(idCol).as("id"),
        explode(array_distinct(TextAnalysis.tokens(lower(col(nameCol))))).as("tok"))
      .join(idf, Seq("tok"))
      .groupBy("id")
      .agg(collect_list(col("tok")).as("toks"), collect_list(col("idf")).as("ws"))
    val candidates = Resolution.tokenBlockingCandidatesFrac(
      records, nameCol, idCol, maxDocFreqFraction, maxBlockSize)
    val score = udf((t1: Seq[String], w1: Seq[Double], t2: Seq[String], w2: Seq[Double]) =>
      Similarity.softTfIdf(t1, w1, t2, w2, simThreshold, pruneBelow = threshold))
    candidates
      .join(toks.select(col("id").as("id1"), col("toks").as("t1"), col("ws").as("w1")), "id1")
      .join(toks.select(col("id").as("id2"), col("toks").as("t2"), col("ws").as("w2")), "id2")
      .withColumn("score", score(col("t1"), col("w1"), col("t2"), col("w2")))
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
