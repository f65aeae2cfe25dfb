package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Live distribution-drift monitor: score every micro-batch of an
  * integral signal against a FROZEN reference histogram with the exact
  * KS statistic ([[graft.operators.Drift]]), emitting one verdict row
  * per batch — the operational wrapper that turns the q153-style batch
  * statistic into a pipeline alarm ("today's quality-score mix no
  * longer looks like the corpus we trained the gate on").
  *
  * The reference is a value histogram persisted once (parquet, value →
  * count) — at 100 TB the histogram is value-cardinality-sized, the
  * batch side is aggregated to ITS histogram before the comparison,
  * and the union the KS fold runs over is both histograms, never rows.
  * Alarms are integer-ppm thresholds, so the monitor fires identically
  * wherever it runs.
  */
object StreamingDrift {

  /** Persist the reference histogram for `valueCol`. */
  def writeReference(df: DataFrame, valueCol: String, refDir: String): Unit =
    df.select(col(valueCol).cast("long").as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("cnt"))
      .write.mode("overwrite").parquet(refDir)

  /** Batch kernel: exact KS of `batch` vs the reference, one row
    * (batch_id, n_batch, n_ref, d_ppm, drifted). */
  def scoreBatch(batch: DataFrame, valueCol: String, refDir: String,
      batchId: Long, alarmPpm: Long): DataFrame = {
    val spark = batch.sparkSession
    val ref = spark.read.parquet(refDir)
      .select(col("v"), col("cnt").as("c2"))
    val cur = batch.select(col(valueCol).cast("long").as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("c1"))
    // union of histograms -> cumulate both sides -> exact KS in ppm
    val merged = cur.join(ref, Seq("v"), "full_outer")
      .select(col("v"), coalesce(col("c1"), lit(0L)).as("c1"),
        coalesce(col("c2"), lit(0L)).as("c2"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cum = merged
      .withColumn("cum1", sum(col("c1")).over(w))
      .withColumn("cum2", sum(col("c2")).over(w))
    val totals = merged.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    // DECIMAL(38,0) products, mirroring operators.Drift.ksPpm: the Long
    // form overflowed at ~3e9×3e9 samples and a wrapped-negative d_ppm
    // silently never fired the alarm
    cum.crossJoin(totals)
      .agg(first(col("n1")).as("n_batch"), first(col("n2")).as("n_ref"),
        max(abs(col("cum1").cast("decimal(38,0)") * col("n2") -
          col("cum2").cast("decimal(38,0)") * col("n1")))
          .as("d_num"))
      .select(lit(batchId).as("batch_id"), col("n_batch"), col("n_ref"),
        expr("(CAST(1000000 AS DECIMAL(38,0)) * d_num) div " +
          "(CAST(n_batch AS DECIMAL(38,0)) * n_ref)").as("d_ppm"))
      .withColumn("drifted", col("d_ppm") > alarmPpm)
  }

  /** Streaming wiring: verdicts are handed to `sink` per batch. */
  def start(stream: DataFrame, valueCol: String, refDir: String,
      checkpointDir: String, alarmPpm: Long)(
      sink: DataFrame => Unit): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          sink(scoreBatch(batch, valueCol, refDir, batchId, alarmPpm))
      }
      .start()
}
