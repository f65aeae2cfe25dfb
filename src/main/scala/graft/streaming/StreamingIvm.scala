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
  * CONTRACT — the checkpoint owns the version counter: versions ARE
  * batch ids, so a fresh-checkpoint restart (batch ids back at 0)
  * RESTARTS the view from empty (batch 0 finds no version strictly
  * below 0) and overwrites v=0 onward. To CONTINUE a maintained view,
  * keep its checkpoint; to rebuild intentionally, point the fresh run
  * at a new viewDir (or clear the old one) so stale high-numbered
  * versions cannot linger next to the new lineage.
  *
  * Scale: the per-batch cost is Ivm's — delta pre-aggregation + one
  * full-outer join against the previous snapshot — NOT a base-table
  * recompute; the snapshot rewrite is the full view (count/sum views
  * are small relative to their base tables; for huge views partition
  * the write by a key prefix and rewrite only touched partitions, as
  * `rdf.QuadStore.write` does for graphs).
  */
object StreamingIvm {

  private def fsFor(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Largest committed version strictly below `beforeBatch`. Hadoop FS,
    * not java.io.File — a File listing of an hdfs://s3a:// view dir is
    * null, which would silently rebase every batch onto an EMPTY
    * snapshot (the view resets with no error on exactly the stores the
    * scale layout uses). */
  private def baseVersion(spark: SparkSession, viewDir: String,
      beforeBatch: Long): Option[Long] = {
    val (fs, root) = fsFor(spark, viewDir)
    if (!fs.exists(root)) None
    else fs.listStatus(root).toSeq
      .filter(f => f.isDirectory && f.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.stripPrefix("v=").toLong)
      .filter(_ < beforeBatch)
      .sorted.lastOption
  }

  /** Batch kernel (reusable from foreachBatch or batch backfills). */
  def applyBatch(delta: DataFrame, viewDir: String, batchId: Long,
      keyCols: Seq[String], sumCols: Seq[String], signCol: String): Unit = {
    val spark = delta.sparkSession
    val snap = baseVersion(spark, viewDir, batchId) match {
      case Some(v) => spark.read.parquet(s"$viewDir/v=$v")
      case None => // empty snapshot with the view schema
        graft.operators.Ivm.snapshot(
          delta.select((keyCols ++ sumCols).map(col): _*).limit(0),
          keyCols, sumCols)
    }
    graft.operators.Ivm.applyDelta(snap, delta, keyCols, sumCols, signCol)
      .write.mode("overwrite").parquet(s"$viewDir/v=$batchId")
    val (fs, root) = fsFor(spark, viewDir)
    val out = fs.create(new org.apache.hadoop.fs.Path(root, "_CURRENT"), true)
    try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
  }

  /** The latest committed snapshot. */
  def current(spark: SparkSession, viewDir: String): DataFrame = {
    val (fs, root) = fsFor(spark, viewDir)
    val cur = new org.apache.hadoop.fs.Path(root, "_CURRENT")
    require(fs.exists(cur), s"no committed view at $viewDir")
    val in = fs.open(cur)
    val v = try new String(in.readAllBytes(), "UTF-8").trim finally in.close()
    spark.read.parquet(s"$viewDir/v=$v")
  }

  /** Streaming wiring: fold the delta stream into the view. */
  def start(deltas: DataFrame, keyCols: Seq[String], sumCols: Seq[String],
      signCol: String, viewDir: String, checkpointDir: String): StreamingQuery = {
    val (fs, root) = fsFor(deltas.sparkSession, viewDir)
    fs.mkdirs(root)
    deltas.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, viewDir, batchId, keyCols, sumCols, signCol)
      }
      .start()
  }
}
