package graft.enrich

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Survivorship: collapse each duplicate cluster into one golden record
  * — the step after entity/document clustering in any MDM or corpus
  * curation flow (the reference's agent-matching enricher elects one
  * canonical agent per matched equivalence class the same way:
  * deterministic representative + merged attributes).
  *
  * Rules implemented (all deterministic, engine-independent):
  *  - representative = argmax by a caller-supplied integral quality
  *    column, ties broken by minimum id;
  *  - set-valued attributes merge as the sorted distinct union;
  *  - additive attributes sum exactly.
  *
  * Scale shape: one rank window + one aggregation, both keyed by the
  * cluster id — two shuffles of (cluster, small-attrs) rows; never
  * shuffles on text or carries more than one row per member. */
object GoldenRecord {

  /** @param clustered (idCol, clusterCol) assignment, e.g.
    *                  [[graft.dedup.FuzzyClusters.minhashClusters]] output
    * @param df        source rows carrying idCol, qualityCol, attrCol
    * @return one row per cluster: (clusterCol, n_members, rep_id,
    *         rep_quality, total_quality, attrs) */
  def collapse(clustered: DataFrame, df: DataFrame, idCol: String,
      clusterCol: String, qualityCol: String, attrCol: String): DataFrame = {
    val joined = df.join(clustered.select(col(idCol), col(clusterCol)), Seq(idCol))
    val byQuality = Window.partitionBy(col(clusterCol))
      .orderBy(col(qualityCol).desc, col(idCol).asc)
    joined
      .withColumn("__rn", row_number().over(byQuality))
      .groupBy(col(clusterCol))
      .agg(
        count(lit(1)).as("n_members"),
        max(when(col("__rn") === 1, col(idCol))).as("rep_id"),
        max(when(col("__rn") === 1, col(qualityCol))).as("rep_quality"),
        sum(col(qualityCol)).as("total_quality"),
        array_join(array_sort(collect_set(col(attrCol))), ",").as("attrs"))
  }
}
