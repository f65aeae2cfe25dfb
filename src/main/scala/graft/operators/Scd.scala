package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (SCD type 2) snapshot builder: collapse a
  * change-event log into per-key validity intervals — one row per
  * (key, attribute-state) EPISODE, valid from the first event that
  * established the state until the event that changed it (exclusive).
  *
  * This is the standard warehouse primitive for "what was X's state at
  * time T" queries (Kimball's type-2 dimension), and the batch dual of
  * CDC compaction: at 100 TB the log is append-only parquet and this
  * job is one window pass — both windows share the single
  * hash-partition-by-key exchange, there is no self-join, and no state
  * beyond the window frame, so it scales with the log, not the history
  * depth.
  *
  * Ties: events at the same timestamp are ordered by `tieCol` (a unique
  * id), so the result is deterministic under any partitioning. Open
  * episodes get `validTo = openEnd` (a sentinel far-future instant keeps
  * the column non-null, which downstream BETWEEN probes and the
  * hash-compare oracle both prefer).
  */
object Scd {

  def type2(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      tieCol: String,
      attrCols: Seq[String],
      openEnd: String = "9999-12-31 00:00:00"): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty)
    val key = keyCols.map(col)
    val ord = Seq(col(tsCol), col(tieCol))
    val w = Window.partitionBy(key: _*).orderBy(ord.map(_.asc): _*)

    val state = struct(attrCols.map(col): _*)
    // An episode starts where the attribute state differs from the
    // previous event's state (or at the key's first event). <=> is
    // null-safe, so a null attribute is a state like any other.
    val changed = df
      .withColumn("__prev", lag(state, 1).over(w))
      .withColumn("__start",
        when(col("__prev").isNull || !(col("__prev") <=> state), 1).otherwise(0))
      .where(col("__start") === 1)
    // valid_to = next episode's start for the same key (exclusive bound)
    changed
      .withColumn("__next_ts", lead(col(tsCol), 1).over(w))
      .select((keyCols ++ attrCols).map(col) ++ Seq(
        col(tsCol).as("valid_from"),
        coalesce(col("__next_ts"), lit(openEnd).cast("timestamp"))
          .as("valid_to")): _*)
  }

  /** Point-in-time probe: the state of each key at instant `at`. */
  def asOf(scd: DataFrame, at: String): DataFrame =
    scd.where(col("valid_from") <= lit(at).cast("timestamp") &&
      col("valid_to") > lit(at).cast("timestamp"))
}
