package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact AUC (area under the ROC curve) via the Mann–Whitney rank-sum
  * identity — the model-evaluation primitive for quality-classifier
  * gates (is `linear_score` / compression ratio / perplexity actually
  * separating keep from drop?). Everything stays in integers:
  * tie-averaged ranks are carried DOUBLED (rank2 = 2·|{s' < s}| +
  * |{s' = s}| + 1, an integer even under ties), and
  *
  *   AUC = (Σ_pos rank − n⁺(n⁺+1)/2) / (n⁺ n⁻)
  *       = (Σ_pos rank2 − n⁺(n⁺+1)) / (2 n⁺ n⁻)
  *
  * is emitted in ppm with truncating division — bit-identical on any
  * engine, which is what makes it oracle-checkable.
  *
  * Scale shape: one aggregation to the per-VALUE histogram (cnt,
  * cntPos), one running-sum window over that histogram, one scalar
  * fold. The window runs over distinct score values, not rows — for
  * integer scores (counts, cents, ppm signals) that cardinality is
  * bounded; quantize real-valued scores first (they arrive binned from
  * any practical scorer anyway).
  */
object Auc {

  /** One row: (n_pos, n_neg, auc_ppm). `scoreCol` integral; `labelCol`
    * boolean (true = positive). */
  def aucPpm(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val hist = df
      .select(col(scoreCol).cast("long").as("s"),
        when(col(labelCol), 1L).otherwise(0L).as("pos"))
      .groupBy(col("s"))
      .agg(count(lit(1)).as("cnt"), sum(col("pos")).as("cnt_pos"))
    val w = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = hist
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("rank2", (col("cum") - col("cnt")) * 2 + col("cnt") + 1)
    // rank-sum and ppm products in DECIMAL(38,0): sum_rank2 ~ 2·n·n_pos
    // and n_pos·n_neg both overflow Long in the ~1e9-row regime, where a
    // wrapped value reads as a garbage AUC with no error
    ranked.agg(
      sum(col("cnt_pos")).as("n_pos"),
      (sum(col("cnt")) - sum(col("cnt_pos"))).as("n_neg"),
      sum(col("cnt_pos").cast("decimal(38,0)") * col("rank2"))
        .as("sum_rank2"))
      .select(col("n_pos"), col("n_neg"),
        expr("(CAST(1000000 AS DECIMAL(38,0)) * " +
          "(sum_rank2 - CAST(n_pos AS DECIMAL(38,0)) * (n_pos + 1))) div " +
          "(CAST(2 AS DECIMAL(38,0)) * n_pos * n_neg)").as("auc_ppm"))
  }
}
