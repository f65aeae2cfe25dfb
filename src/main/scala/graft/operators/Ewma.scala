package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-point exponentially-weighted moving average per key — the
  * time-series smoothing primitive (monitoring levels, per-user
  * engagement decay, adaptive baselines). The recurrence runs in
  * integer fixed point,
  *
  *   `s_0 = v_0;  s_i = (a·v_i + (2^k − a)·s_{i−1}) div 2^k`
  *
  * with `alpha = a / 2^k`, so the smoothed level is bit-identical on
  * any engine and any partitioning — the same engine-independence
  * contract as the PageRank/seasonal/KS integer families. (Float EWMA
  * would accumulate rounding skew that depends on evaluation order;
  * the `div` here truncates identically everywhere.)
  *
  * Scale shape: one shuffle onto the key, then per-key ordered folds
  * via `array_sort` + the codegen `aggregate` HOF — group payloads are
  * bounded by per-key observation counts (the monitoring contract;
  * for keys with millions of points, window-chunk first). No driver
  * collection, no iterative jobs.
  */
object Ewma {

  /** Final smoothed level per key: (keyCol, n_obs, ewma) where values
    * are `valueCol` cast to long (pre-scale to cents/micros upstream).
    * Order within a key is (orderCol, tieCol) ascending.
    *
    * @param alphaNum numerator `a` of `alpha = a / 2^k`
    * @param k        fixed-point shift (default 10: alpha steps of 1/1024)
    */
  def smooth(df: DataFrame, keyCol: String, orderCol: Column, tieCol: Column,
      valueCol: Column, alphaNum: Int, k: Int = 10): DataFrame = {
    val den = 1L << k
    require(alphaNum > 0 && alphaNum < den, "alpha must be in (0, 1)")
    df.select(col(keyCol), struct(orderCol.as("o"), tieCol.as("t"),
        valueCol.cast("long").as("v")).as("obs"))
      // a null measure/timestamp is "no observation": a null v mid-fold
      // would otherwise RESTART the recurrence at the next element
      .where(col("obs.v").isNotNull && col("obs.o").isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_obs"), collect_list(col("obs")).as("arr"))
      .select(col(keyCol), col("n_obs"),
        expr(s"""aggregate(array_sort(arr), cast(null as bigint),
          | (acc, x) -> case when acc is null then x.v
          |   else ($alphaNum * x.v + ${den - alphaNum} * acc) div $den
          |   end)""".stripMargin).as("ewma"))
  }
}
