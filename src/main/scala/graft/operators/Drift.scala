package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-sample Kolmogorov–Smirnov distance for data-drift monitoring:
  * did yesterday's corpus slice come from the same distribution as
  * today's? D = max_v |F₁(v) − F₂(v)| over the observed support — the
  * standard drift alarm between pipeline snapshots (token-length
  * distributions, quality-score distributions, per-source mixes).
  *
  * Exactness: with sample sizes n₁, n₂ the statistic is a rational —
  * D = max |cum₁·n₂ − cum₂·n₁| / (n₁·n₂) — so the scaled integer
  * numerator is compared exactly and D ships in ppm with truncating
  * division. No float enters the decision, so two engines agree
  * bit-for-bit and a threshold alert fires identically everywhere.
  *
  * Scale shape: one aggregation to the per-(value, sample) histogram,
  * one running-sum window over DISTINCT VALUES (not rows — quantize
  * real-valued signals first), one max fold. Same shape as
  * [[Auc]] — at 10¹¹ rows the histogram is what moves, and it is
  * value-cardinality-sized.
  */
object Drift {

  /** One row: (n1, n2, d_num, d_ppm) where d_num = max|cum₁·n₂ −
    * cum₂·n₁| (the exact scaled statistic) and d_ppm = ⌊10⁶·D⌋.
    * `sampleCol` boolean: true = sample 1, false = sample 2. */
  def ksPpm(df: DataFrame, valueCol: String, sampleCol: String): DataFrame = {
    val hist = df
      .select(col(valueCol).cast("long").as("v"),
        when(col(sampleCol), 1L).otherwise(0L).as("s1"))
      .groupBy(col("v"))
      .agg(sum(col("s1")).as("c1"), (count(lit(1)) - sum(col("s1"))).as("c2"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cum1", sum(col("c1")).over(w))
      .withColumn("cum2", sum(col("c2")).over(w))
    // totals are one broadcast row; the cross join never shuffles the
    // histogram
    val totals = hist.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    // the scaled-numerator products run in DECIMAL(38,0): cum·n is
    // ~n1·n2, which overflows Long at ~3e9×3e9 samples and silently
    // disabled the alarm (a wrapped-negative d_ppm never exceeds the
    // threshold). Exactness is unchanged — decimal(38,0) holds the
    // ≤1e30 intermediate exactly; the exported d_num column stays long
    // (exact up to 9.2e18, null past it under the non-ANSI cast)
    cum.crossJoin(totals)
      .agg(first(col("n1")).as("n1"), first(col("n2")).as("n2"),
        max(abs(col("cum1").cast("decimal(38,0)") * col("n2") -
          col("cum2").cast("decimal(38,0)") * col("n1")))
          .as("d_num_dec"))
      .select(col("n1"), col("n2"), col("d_num_dec").cast("long").as("d_num"),
        expr("(CAST(1000000 AS DECIMAL(38,0)) * d_num_dec) div " +
          "(CAST(n1 AS DECIMAL(38,0)) * n2)").as("d_ppm"))
  }

  /** Total variation distance for CATEGORICAL columns — ½ Σ|p₁ − p₂|,
    * the ordered-support-free sibling of [[ksPpm]] (KS needs an order;
    * source/language/domain mixes have none). Same exact-rational
    * trick: TVD = Σ|c₁·n₂ − c₂·n₁| / (2·n₁·n₂), integer throughout.
    * One row: (n1, n2, tvd_ppm). */
  def tvdPpm(df: DataFrame, catCol: String, sampleCol: String): DataFrame = {
    val hist = df
      .select(col(catCol).cast("string").as("v"),
        when(col(sampleCol), 1L).otherwise(0L).as("s1"))
      .groupBy(col("v"))
      .agg(sum(col("s1")).as("c1"), (count(lit(1)) - sum(col("s1"))).as("c2"))
    val totals = hist.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    // same decimal treatment as ksPpm (c·n products overflow Long at
    // ~3e9×3e9 samples)
    hist.crossJoin(totals)
      .agg(first(col("n1")).as("n1"), first(col("n2")).as("n2"),
        sum(abs(col("c1").cast("decimal(38,0)") * col("n2") -
          col("c2").cast("decimal(38,0)") * col("n1"))).as("t_num"))
      .select(col("n1"), col("n2"),
        expr("(CAST(1000000 AS DECIMAL(38,0)) * t_num) div " +
          "(CAST(2 AS DECIMAL(38,0)) * n1 * n2)").as("tvd_ppm"))
  }
}
