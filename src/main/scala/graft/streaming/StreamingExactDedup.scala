package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Cross-run streaming exact deduplication against a PERSISTED hash
  * index — the missing piece between `dropDuplicates` (bounded to one
  * query's state store) and batch dedup (bounded to one job's input): a
  * landing-directory corpus ingested over weeks must reject a document
  * it first saw last month, across restarts and full redeployments.
  *
  * Design: the seen-set is a parquet table of sha2-256 text digests
  * (collision-safe — a 64-bit hash at 10¹² docs has birthday collisions,
  * which here would silently DROP unique documents), laid out as one
  * subdirectory per micro-batch id. Each batch:
  *
  *   1. canonicalizes within the batch (min id per digest),
  *   2. left-anti joins the accumulated index (digest-only scan, the
  *      probe side never reads document text into the join),
  *   3. appends the survivors' digests under `batch=<id>/`.
  *
  * Replay safety: a re-executed batch id OVERWRITES its own
  * subdirectory (idempotent) and its anti-join reads only EARLIER batch
  * dirs, so the replayed batch sees exactly the index state the original
  * saw — emitted survivors are identical.
  *
  * At 100 TB the index is digests only (32 B/doc — ~3 TB per 10¹¹
  * docs), partition-pruned by the batch layout; compact it periodically
  * with [[graft.sources.Compaction]] if batch counts grow large.
  */
object StreamingExactDedup {

  /** Batch kernel (call from `foreachBatch` or reuse in batch jobs):
    * returns the deduplicated rows of `batch` and persists their
    * digests under `run=<runId>/batch=<batchId>`. Batch ids restart at 0
    * when a query starts over from a fresh checkpoint, so the replay
    * guard ("ignore my own batches ≥ mine") is scoped to the runId; every
    * batch of every OTHER run is always part of the seen-set.
    * Single-writer per index at a time. */
  def dedupBatch(batch: DataFrame, textCol: String, idCol: String,
      indexDir: String, runId: String, batchId: Long): DataFrame = {
    val spark = batch.sparkSession
    // sha2(null) is null, and null never equi-joins: without the
    // sentinel a null-text row would slip past the cross-batch anti-join
    // EVERY batch forever (and pile null rows into the index). The
    // sentinel groups null-text rows as mutual duplicates — the same
    // grouping the batch pipeline's window partitionBy gives them
    val hashed = batch
      .withColumn("__digest",
        coalesce(sha2(col(textCol), 256), lit("__null_text__")))
    // within-batch canonicalization: min id per digest
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__digest"))
    val canon = hashed
      .withColumn("__keep", col(idCol) === min(col(idCol)).over(w))
      .where(col("__keep"))
    // seen-set: all other runs in full + this run's batches strictly
    // before this one (replay safety — DedupIndex rules, shared with the
    // fuzzy sibling)
    val earlier = DedupIndex.earlierPaths(indexDir, runId, batchId,
      spark.sparkContext.hadoopConfiguration)
    val fresh =
      if (earlier.isEmpty) canon
      else canon.join(
        spark.read.parquet(earlier: _*).select(col("digest").as("__digest")),
        Seq("__digest"), "left_anti")
    val out = fresh.drop("__keep").localCheckpoint()
    out.select(col("__digest").as("digest"))
      .write.mode("overwrite")
      .parquet(s"$indexDir/run=$runId/batch=$batchId")
    out.drop("__digest")
  }

  /** Streaming wiring: dedup `docs` against `indexDir` and hand each
    * batch's survivors to `sink`. The runId is derived from the
    * CHECKPOINT path: a restart from the same checkpoint keeps the same
    * runId (so batch-id replay stays idempotent), while a
    * fresh-checkpoint restart gets a new runId and sees every older run
    * as part of the seen-set. */
  def start(docs: DataFrame, textCol: String, idCol: String,
      indexDir: String, checkpointDir: String)(
      sink: DataFrame => Unit): StreamingQuery = {
    val runId = DedupIndex.runIdAt(checkpointDir, indexDir,
      docs.sparkSession.sparkContext.hadoopConfiguration)
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(dedupBatch(batch, textCol, idCol, indexDir, runId, batchId))
      }
      .start()
  }
}
