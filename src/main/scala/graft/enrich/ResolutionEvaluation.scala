package graft.enrich

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Entity-resolution evaluation harness — precision/recall of sameAs
  * equivalence classes against a ground-truth pair set at threshold
  * buckets, the reference's EntityResolutionEvaluation
  * (`thymeflow/src/main/com/thymeflow/enricher/entityresolution/
  * EntityResolutionEvaluation.scala:20-120`: parse truth samples, judge
  * each pair by "same equivalence class at this threshold", write the
  * evaluation table).
  *
  * The judgment is class-based, not pair-based: predicted pairs at a
  * threshold are closed into connected components first (exactly the
  * reference's `map(resource1) == map(resource2)` on its equivalence
  * map), so indirect merges count — a truth pair connected only through a
  * chain of predictions is a true positive.
  *
  * Scale shape: one components run per threshold bucket (a handful), each
  * a [[graft.graph.GraphOps.connectedComponents]] job; the per-threshold
  * confusion counts are single aggregate rows. Nothing driver-side grows
  * with the corpus.
  */
object ResolutionEvaluation {

  /** @param truth ground-truth pairs: (id1, id2, same: boolean)
    * @param scored predicted pairs with scores: (id1, id2, score)
    * @param thresholds buckets to evaluate (pairs kept when
    *        score >= threshold)
    * @return one row per threshold:
    *         (threshold, tp, fp, fn, tn, precision, recall, f1) */
  def evaluate(truth: DataFrame, scored: DataFrame, thresholds: Seq[Double]): DataFrame = {
    val spark = truth.sparkSession
    val universe = truth.select(col("id1").as("id"))
      .unionByName(truth.select(col("id2").as("id")))
      .unionByName(scored.select(col("id1").as("id")))
      .unionByName(scored.select(col("id2").as("id")))
      .distinct()
    val rows = thresholds.sorted.map { t =>
      val pairs = scored.where(col("score") >= t)
        .select(col("id1").as("src"), col("id2").as("dst"))
      val comp = graft.graph.GraphOps.connectedComponents(pairs, Some(universe))
      val judged = truth
        .join(comp.select(col("id").as("id1"), col("component").as("c1")), "id1")
        .join(comp.select(col("id").as("id2"), col("component").as("c2")), "id2")
        .select(col("same").cast("boolean").as("same"),
          (col("c1") === col("c2")).as("pred"))
      val r = judged.agg(
        sum(when(col("same") && col("pred"), 1L).otherwise(0L)).as("tp"),
        sum(when(!col("same") && col("pred"), 1L).otherwise(0L)).as("fp"),
        sum(when(col("same") && !col("pred"), 1L).otherwise(0L)).as("fn"),
        sum(when(!col("same") && !col("pred"), 1L).otherwise(0L)).as("tn")).head()
      val (tp, fp, fn, tn) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val precision = if (tp + fp == 0) 1.0 else tp.toDouble / (tp + fp)
      val recall = if (tp + fn == 0) 1.0 else tp.toDouble / (tp + fn)
      val f1 = if (precision + recall == 0) 0.0
        else 2 * precision * recall / (precision + recall)
      Row(t, tp, fp, fn, tn, precision, recall, f1)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("threshold", DoubleType, nullable = false),
        StructField("tp", LongType, nullable = false),
        StructField("fp", LongType, nullable = false),
        StructField("fn", LongType, nullable = false),
        StructField("tn", LongType, nullable = false),
        StructField("precision", DoubleType, nullable = false),
        StructField("recall", DoubleType, nullable = false),
        StructField("f1", DoubleType, nullable = false))))
  }

  /** Render the evaluation as the reference's CSV lines
    * (`saveEvaluationToFile`, header + one line per threshold). */
  def report(evaluation: DataFrame): Seq[String] =
    "threshold,tp,fp,fn,tn,precision,recall,f1" +:
      evaluation.orderBy(col("threshold")).collect().toSeq.map { r =>
        f"${r.getDouble(0)}%.4f,${r.getLong(1)},${r.getLong(2)},${r.getLong(3)},${r.getLong(4)},${r.getDouble(5)}%.6f,${r.getDouble(6)}%.6f,${r.getDouble(7)}%.6f"
      }
}
