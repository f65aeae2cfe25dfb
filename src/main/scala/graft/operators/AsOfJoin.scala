package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the single right row with the
  * greatest timestamp not after the left row's, per key (event↔snapshot
  * alignment, trade↔quote, click↔last-view attribution). Spark has no
  * native ASOF; the naive formulations are a range join (O(n·m) candidate
  * blowup) or a per-key collect. This one is the scale-correct shape:
  *
  *  - tag both sides, UNION them (no join node at all), hash-partition by
  *    key, sort each partition by (ts, side) — ONE exchange per side,
  *    identical to what any equi-join would have paid;
  *  - carry the latest right payload forward with
  *    `last(struct, ignoreNulls).over(unboundedPreceding..current)` — a
  *    running window, linear per partition, whole-stage codegen'd;
  *  - the payload rides in ONE struct so all its fields come from the
  *    SAME matched right row (filling columns independently could mix
  *    rows when a right field is legitimately null);
  *  - right rows sort BEFORE left rows at equal timestamps (side 0 < 1),
  *    giving standard `right.ts <= left.ts` inclusive semantics;
  *  - right rows TIED on (key, ts) order by their payload struct, so the
  *    match is the GREATEST payload among the ties — an arbitrary but
  *    DETERMINISTIC rule (without it the pick followed shuffle arrival
  *    order and two runs could disagree). Payload fields must therefore
  *    be orderable types (maps are not; wrap them downstream).
  *
  * Skew: a hot key is bounded by sorting its own rows only (no candidate
  * pairs are ever materialized). An optional `tolerance` (max left.ts −
  * right.ts, in the timestamp's native unit after casting to long) nulls
  * out matches staler than the bound — rows stay, payload nulls, exactly
  * like DuckDB/Pandas `ASOF ... TOLERANCE`.
  *
  * Output: every left row (all its columns) + the matched right payload
  * columns (null when no match). */
object AsOfJoin {

  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      toleranceMicros: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equi-key")
    require(payload.nonEmpty, "no right payload columns requested")
    val leftCols = left.columns.toSeq
    require(!payload.exists(leftCols.contains),
      s"payload collides with left columns: ${payload.filter(leftCols.contains)}")

    val ts = "__asof_ts"
    val side = "__asof_side"
    val pay = "__asof_pay"
    val payType = org.apache.spark.sql.types.StructType(
      payload.map(p => org.apache.spark.sql.types.StructField(
        p, right.schema(p).dataType)))
    val lx = left
      .withColumn(ts, unix_micros(col(leftTs).cast("timestamp")))
      .withColumn(side, lit(1))
      .withColumn(pay, lit(null).cast(payType))
    val r = right.select(
      keys.map(col) ++ Seq(
        unix_micros(col(rightTs).cast("timestamp")).as(ts),
        lit(0).as(side),
        struct(payload.map(col): _*).as(pay)): _*)
    // align columns: left-only columns are null on right rows
    val rAligned = lx.columns.foldLeft(r) { (df, c) =>
      if (r.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(lx.schema(c).dataType))
    }.select(lx.columns.map(col): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col(side).asc, col(pay).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = lx.unionByName(rAligned)
      .withColumn("__match", last(col(pay), ignoreNulls = true).over(w))
      .withColumn("__match_ts", last(
        when(col(side) === 0, col(ts)), ignoreNulls = true).over(w))
      .where(col(side) === 1)
    val inTol = toleranceMicros match {
      case Some(t) => col("__match_ts").isNotNull && (col(ts) - col("__match_ts") <= t)
      case None => col("__match_ts").isNotNull
    }
    val out = filled.withColumn("__ok", inTol)
    payload.foldLeft(out) { (df, p) =>
        df.withColumn(p, when(col("__ok"), col("__match")(p)))
      }
      .select((leftCols ++ payload).map(col): _*)
  }
}
