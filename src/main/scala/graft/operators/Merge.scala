package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Changelog application — MERGE INTO / CDC-compaction semantics: fold a
  * stream of full-row images (`upsert`) and tombstones (`delete`) into a
  * keyed snapshot, producing the next snapshot. The batch primitive
  * under every incremental table format (Delta/Hudi/Iceberg merge) and
  * the type-1 counterpart of [[Scd.type2]] (which keeps history; this
  * keeps latest-wins).
  *
  * Resolution: per key, the change with the greatest (`seqCol`, op,
  * image) wins — the sequence column decides, and the op/image tail
  * makes the order total even if a producer emits two changes with the
  * same sequence number, so the merge is deterministic under any
  * partitioning.
  *
  * Scale shape: one window over changes (hash-partitioned by key) + one
  * full-outer join against the snapshot on the same key — both stages
  * shuffle once on the key; nothing is ever collected. With both sides
  * bucketed by key on disk (see `sources.Bucketing`) the join runs
  * exchange-free — the standard nightly-compaction layout.
  */
object Merge {

  val Upsert = "upsert"
  val Delete = "delete"

  /** `changes` must carry every `snapshot` column (the full row image;
    * ignored for deletes) plus `opCol` ∈ {upsert, delete} and `seqCol`. */
  def apply(snapshot: DataFrame, changes: DataFrame, keyCols: Seq[String],
      seqCol: String, opCol: String): DataFrame = {
    require(keyCols.nonEmpty)
    val dataCols = snapshot.columns.filterNot(keyCols.contains).toSeq
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((Seq(col(seqCol), col(opCol)) ++ dataCols.map(col)).map(_.desc): _*)
    val latest = changes
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select((keyCols ++ dataCols).map(col) :+ col(opCol).as("__op"): _*)

    val s = snapshot.alias("s")
    val c = latest.alias("c")
    s.join(c, keyCols, "full_outer")
      .where(col("__op").isNull || col("__op") === Upsert)
      .select(keyCols.map(col) ++ dataCols.map(d =>
        when(col("__op") === Upsert, col(s"c.$d"))
          .otherwise(col(s"s.$d")).as(d)): _*)
  }
}
