package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.types.TimestampType

/** Salted two-stage aggregation for skewed keys (SURVEY §4: "salting for
  * skew"): a hot grouping key funnels its rows through one reducer; adding
  * a salt column spreads the partial aggregation over `salts` reducers and
  * a cheap second stage combines the partials. Exact for decomposable
  * aggregates (count/sum/min/max). */
object SkewedAgg {
  import org.apache.spark.sql.functions._

  /** count(*) per key with salt-spread partials. */
  def saltedCount(df: DataFrame, keyCol: String, salts: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(monotonically_increasing_id(), lit(salts.toLong)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("__partial")).as("n"))

  /** sum(valueCol) per key with salt-spread partials (exact for integral
    * values; for doubles the reduction order differs from a single-stage
    * sum, as with any distributed aggregation). */
  def saltedSum(df: DataFrame, keyCol: String, valueCol: String, salts: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(monotonically_increasing_id(), lit(salts.toLong)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("__partial")).as("sum"))
}

/** Interval-overlap / point-in-interval joins without a cartesian product.
  *
  * Semantics mirror the reference's event-stay interval matching
  * (`thymeflow/src/main/com/thymeflow/enricher/LocationEventEnricher.scala:66-87`):
  * keep pairs whose time ranges overlap. A naive Catalyst plan for the theta
  * condition `p >= start && p <= end` is a broadcast-nested-loop join —
  * O(n*m), fatal at scale. We instead bucket time into fixed-width bins,
  * explode each interval across the bins it covers, and equi-join on the bin
  * id, leaving only the residual range filter per bin. This turns the join
  * into a shuffle/broadcast hash join that scales linearly with data volume
  * (given bucketWidth >= typical interval width, each interval lands in
  * O(1) bins).
  */
object IntervalJoin {

  /** Epoch seconds tolerant of TIMESTAMP_NTZ inputs (session TZ is UTC). */
  private def es(c: Column): Column = unix_seconds(c.cast(TimestampType))

  /** Join rows of `points` to rows of `intervals` where
    * `points(pointCol)` in [`intervals(startCol)`, `intervals(endCol)`]
    * (inclusive both ends). All columns of both inputs are preserved;
    * callers must ensure disjoint column names.
    *
    * @param bucketSeconds bin width in seconds; pick >= the typical interval
    *                      length so each interval explodes into O(1) bins.
    */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      bucketSeconds: Long): DataFrame = {
    val w = lit(bucketSeconds)
    val p = points.withColumn("__bucket", floor(es(col(pointCol)) / w))
    val i = intervals.withColumn(
      "__bucket",
      explode(sequence(
        floor(es(col(startCol)) / w),
        floor(es(col(endCol)) / w))))
    p.join(i, Seq("__bucket"))
      .where(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bucket")
  }

  /** Interval-overlap join: keep pairs where
    * [ls, le] and [rs, re] overlap (`ls <= re && rs <= le`), the exact
    * predicate of LocationEventEnricher. Same binning trick; both sides
    * explode across covered bins, pairs dedupe on a single bin (the larger
    * of the two interval-start bins) to avoid duplicate emission.
    */
  def intervalOverlap(
      left: DataFrame,
      ls: String,
      le: String,
      right: DataFrame,
      rs: String,
      re: String,
      bucketSeconds: Long): DataFrame = {
    val w = lit(bucketSeconds)
    val l = left.withColumn(
      "__bucket",
      explode(sequence(floor(es(col(ls)) / w), floor(es(col(le)) / w))))
    val r = right.withColumn(
      "__bucket",
      explode(sequence(floor(es(col(rs)) / w), floor(es(col(re)) / w))))
    l.join(r, Seq("__bucket"))
      .where(col(ls) <= col(re) && col(rs) <= col(le))
      // emit each overlapping pair exactly once: only from the bin holding
      // the later of the two interval starts (that bin is covered by both).
      .where(col("__bucket") === floor(greatest(es(col(ls)), es(col(rs))) / w))
      .drop("__bucket")
  }

  /** Overlap ratio `(min(ends)-max(starts)) / (le-ls)` as used by the
    * reference's event-stay matcher (overlap relative to the left/event
    * duration). Exposed as a Column for post-join filtering. */
  def overlapRatio(ls: Column, le: Column, rs: Column, re: Column): Column = {
    val overlap = es(least(le, re)) - es(greatest(ls, rs))
    val len = es(le) - es(ls)
    overlap.cast("double") / len.cast("double")
  }
}
