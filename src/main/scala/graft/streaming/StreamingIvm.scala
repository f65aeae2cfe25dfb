package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming materialized view: maintain a keyed count/sum aggregate
  * under a stream of signed row deltas (+1/−1), persisting each
  * micro-batch's snapshot as a versioned parquet table — the streaming
  * wiring of [[graft.operators.Ivm]], and the aggregate analogue of
  * [[StreamingExactDedup]]'s digest index.
  *
  * Layout: `viewDir/v=<batchId>/` holds the full snapshot AFTER batch
  * `batchId`; `_CURRENT` names the latest committed version for
  * readers. Each batch folds its delta into the LARGEST VERSION
  * STRICTLY BELOW its own batch id — so a replayed batch (crash between
  * snapshot write and checkpoint commit) rebuilds from the same base it
  * saw the first time and overwrites its own output: exactly-once
  * semantics without a transaction log. Old versions are retained for
  * time travel; prune with `sources.Compaction`-style housekeeping when
  * history grows.
  *
  * Scale: the per-batch cost is Ivm's — delta pre-aggregation + one
  * full-outer join against the previous snapshot — NOT a base-table
  * recompute; the snapshot rewrite is the full view (count/sum views
  * are small relative to their base tables; for huge views partition
  * the write by a key prefix and rewrite only touched partitions, as
  * `rdf.QuadStore.write` does for graphs).
  */
object StreamingIvm {

  /** Largest committed version strictly below `beforeBatch`. */
  private def baseVersion(viewDir: String, beforeBatch: Long): Option[Long] =
    Option(new java.io.File(viewDir).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .map(_.getName.stripPrefix("v=").toLong)
      .filter(_ < beforeBatch)
      .sorted.lastOption

  /** Batch kernel (reusable from foreachBatch or batch backfills). */
  def applyBatch(delta: DataFrame, viewDir: String, batchId: Long,
      keyCols: Seq[String], sumCols: Seq[String], signCol: String): Unit = {
    val spark = delta.sparkSession
    val snap = baseVersion(viewDir, batchId) match {
      case Some(v) => spark.read.parquet(s"$viewDir/v=$v")
      case None => // empty snapshot with the view schema
        graft.operators.Ivm.snapshot(
          delta.select((keyCols ++ sumCols).map(col): _*).limit(0),
          keyCols, sumCols)
    }
    graft.operators.Ivm.applyDelta(snap, delta, keyCols, sumCols, signCol)
      .write.mode("overwrite").parquet(s"$viewDir/v=$batchId")
    val cur = new java.io.File(viewDir, "_CURRENT")
    java.nio.file.Files.writeString(cur.toPath, batchId.toString)
  }

  /** The latest committed snapshot. */
  def current(spark: SparkSession, viewDir: String): DataFrame = {
    val cur = new java.io.File(viewDir, "_CURRENT")
    require(cur.exists(), s"no committed view at $viewDir")
    val v = java.nio.file.Files.readString(cur.toPath).trim
    spark.read.parquet(s"$viewDir/v=$v")
  }

  /** Streaming wiring: fold the delta stream into the view. */
  def start(deltas: DataFrame, keyCols: Seq[String], sumCols: Seq[String],
      signCol: String, viewDir: String, checkpointDir: String): StreamingQuery = {
    new java.io.File(viewDir).mkdirs()
    deltas.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, viewDir, batchId, keyCols, sumCols, signCol)
      }
      .start()
  }
}
