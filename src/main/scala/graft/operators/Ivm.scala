package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance for keyed count/sum aggregates: apply a
  * signed changelog (+1 inserted row, −1 deleted row) to a materialized
  * per-key aggregate WITHOUT touching the base table — the standard
  * warehouse trick that turns "re-aggregate 100 TB nightly" into
  * "aggregate today's delta and merge". Counts and sums are
  * self-maintainable under insert/delete (min/max are not — deletes
  * there need the base table; that asymmetry is the textbook IVM
  * boundary and is deliberately out of this operator's contract).
  *
  * Shape: the delta is pre-aggregated per key (map-side combine does
  * most of it), then one full-outer join against the snapshot on the
  * key; keys whose maintained count reaches zero drop out of the view.
  * A negative maintained count means the changelog deleted rows the
  * snapshot never had; such keys stay IN the output with their negative
  * `n` (visible poison a downstream expectation catches — see
  * [[Expectations.InRange]]) rather than being silently clamped, since
  * they always indicate a lost or replayed delta upstream.
  */
object Ivm {

  /** `snapshot`: keys + `n` (count) + `sumCols` (maintained sums).
    * `delta`: keys + `signCol` (±1) + the same sum columns carrying the
    * changed row's values. */
  def applyDelta(snapshot: DataFrame, delta: DataFrame, keyCols: Seq[String],
      sumCols: Seq[String], signCol: String): DataFrame = {
    require(keyCols.nonEmpty)
    val dAgg = delta.groupBy(keyCols.map(col): _*)
      .agg(sum(col(signCol)).cast("long").as("__dn"),
        sumCols.map(c =>
          sum(col(c) * col(signCol)).as(s"__d_$c")): _*)
    snapshot.join(dAgg, keyCols, "full_outer")
      .select(keyCols.map(col) ++ Seq(
        (coalesce(col("n"), lit(0L)) + coalesce(col("__dn"), lit(0L)))
          .as("n")) ++ sumCols.map(c =>
        (coalesce(col(c), lit(0L)) + coalesce(col(s"__d_$c"), lit(0L)))
          .as(c)): _*)
      .where(col("n") =!= 0)
  }

  /** Build the initial snapshot from base rows (counts + sums). */
  def snapshot(base: DataFrame, keyCols: Seq[String],
      sumCols: Seq[String]): DataFrame =
    base.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sumCols.map(c => sum(col(c)).as(c)): _*)
}
