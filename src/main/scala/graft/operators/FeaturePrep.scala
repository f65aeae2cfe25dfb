package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Feature-preparation operators for model-training pipelines, stated in
  * exact integer arithmetic so any engine reproduces them bit-for-bit.
  *
  * Both are the scale-correct shapes:
  *  - winsorize: per-group order statistics come from a rank window
  *    (ONE shuffle on the group key, no collect, no approximate
  *    percentile) and are joined back as a tiny per-group bound table;
  *  - leave-one-out encoding: per-group sums are a partial-aggregated
  *    groupBy; each row's own value is subtracted analytically, so no
  *    self-join and no per-row re-aggregation.
  */
object FeaturePrep {

  /** Per-group winsorization (outlier clipping) at exact rank cut points.
    * The lower/upper bounds are the group's ⌈n·loNum/den⌉-th and
    * ⌈n·hiNum/den⌉-th smallest values — pure integer rank arithmetic
    * (`(n*k + den-1) div den`), no float percentile, so the clip bounds
    * are order statistics any engine agrees on exactly.
    *
    * Output: input columns + `lo`, `hi`, `clipped`. */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
      loNum: Int = 1, hiNum: Int = 9, den: Int = 10): DataFrame = {
    require(den > 0 && loNum >= 0 && hiNum <= den && loNum <= hiNum,
      "rank cut points must satisfy 0 <= lo <= hi <= den")
    val byVal = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
    val grp = Window.partitionBy(col(groupCol))
    // rank over NON-NULL values only: nulls would sort first, occupy the
    // low ranks and skew both cut points (and could null-out `lo`)
    val ranked = df.where(col(valueCol).isNotNull)
      .withColumn("__rn", row_number().over(byVal))
      .withColumn("__n", count(lit(1)).over(grp))
    def cutRank(num: Int): Column =
      greatest(lit(1L), expr(s"(__n * $num + ${den - 1}) div $den"))
    val bounds = ranked
      .groupBy(col(groupCol))
      .agg(
        max(when(col("__rn") === cutRank(loNum), col(valueCol))).as("lo"),
        max(when(col("__rn") === cutRank(hiNum), col(valueCol))).as("hi"))
    // left join: a group whose values are ALL null keeps its rows with
    // null bounds; null values pass through as null clipped (guarded
    // explicitly — greatest/least skip nulls, so an unguarded clip would
    // fabricate `lo` for a null measurement)
    df.join(bounds, Seq(groupCol), "left")
      .withColumn("clipped",
        when(col(valueCol).isNotNull,
          least(greatest(col(valueCol), col("lo")), col("hi"))))
  }

  /** Leave-one-out target encoding — the standard high-cardinality
    * categorical feature for tabular models, with the leakage guard
    * (each row's own target is excluded from its group mean). Encoded
    * in exact integer ppm-style fixed point: the caller supplies an
    * integral target column (e.g. cents); the encoding is
    *
    *   n > 1: (group_sum − x) · scale div (n − 1)
    *   n = 1: (total_sum − x) · scale div (N − 1)   (global prior,
    *          also leave-one-out)
    *
    * Output: input columns + `enc` (scaled integer). */
  def looEncode(df: DataFrame, keyCol: String, targetCol: String,
      scale: Long = 100L): DataFrame = {
    val grp = df.groupBy(col(keyCol)).agg(
      sum(col(targetCol)).as("__gs"), count(lit(1)).as("__gn"))
    val tot = grp.agg(sum(col("__gs")).as("__ts"), sum(col("__gn")).as("__tn"))
    // the target column is referenced through a renamed alias so the
    // expr() arithmetic never re-parses a caller-supplied name (a
    // hyphenated or keyword column would mis-parse as SQL)
    // LEFT join: a null key never equi-matches its own group row, so an
    // inner join would silently DROP every null-key input row; with the
    // left join those rows get null __gn and fall through the when() to
    // the global-prior branch — the standard unknown-category encoding
    df.withColumn("__x", col(targetCol))
      .join(grp, Seq(keyCol), "left").crossJoin(broadcast(tot))
      .withColumn("enc",
        when(col("__gn") > 1,
          expr(s"((__gs - __x) * $scale) div (__gn - 1)"))
          .otherwise(expr(s"((__ts - __x) * $scale) div (__tn - 1)"))
          .cast("long"))
      .drop("__gs", "__gn", "__ts", "__tn", "__x")
  }
}
