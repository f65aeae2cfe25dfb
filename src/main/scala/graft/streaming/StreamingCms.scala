package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.CmSketch

/** Streaming count-min frequency monitor — the cumulative-sketch
  * composition of [[graft.operators.CmSketch]]: a landing stream's
  * per-key frequencies tracked across micro-batches, restarts and
  * redeployments without ever holding the key space. The persisted
  * state is one parquet sketch (`depth × width` cells) per batch,
  * laid out `run=<id>/batch=<id>` exactly like the dedup indexes
  * (replay-safe by the same rule: a re-run batch overwrites its own
  * directory and reads only strictly-earlier batches, so its output
  * is bit-identical to the original execution).
  *
  * Because CMS cells merge by ADDITION, the cumulative sketch is
  * `sum` over every visible batch sketch — a groupBy over at most
  * `batches × depth × width` tiny rows — and estimates carry the
  * same one-sided guarantee as the batch operator: never below the
  * true count seen so far. Compact old batch dirs by pre-summing if
  * batch counts grow unbounded.
  */
object StreamingCms {

  /** Batch kernel (call from `foreachBatch`): persist this batch's
    * sketch and return cumulative estimates THROUGH this batch for
    * `probes` (distinct values of `keyCol`), tagged with the batch id. */
  def observeBatch(batch: DataFrame, keyCol: String, depth: Int, width: Int,
      probes: DataFrame, indexDir: String, runId: String,
      batchId: Long): DataFrame = {
    val spark = batch.sparkSession
    val own = s"$indexDir/run=$runId/batch=$batchId"
    CmSketch.build(batch, keyCol, depth, width)
      .write.mode("overwrite").parquet(own)
    val visible = DedupIndex.earlierPaths(indexDir, runId, batchId,
      spark.sparkContext.hadoopConfiguration) :+ own
    val cumulative = spark.read.parquet(visible: _*)
      .groupBy("j", "bucket").agg(sum("cnt").as("cnt"))
    CmSketch.estimate(cumulative, probes, keyCol, depth, width)
      .select(lit(batchId).as("batch_id"), col(keyCol), col("est"))
  }
}
