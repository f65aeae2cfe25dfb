package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.similarity.Ann

/** Streaming kNN serving over a PERSISTED IVF index — the ANN member of
  * the streaming family (exact/fuzzy dedup, sessions, SCD2, sketches and
  * drift all have streaming counterparts; this closes retrieval). Two
  * halves, matching how a production vector service splits:
  *
  *   - [[appendBatch]]: corpus ingest — route a new vector batch against
  *     the persisted index's centroids (no refit, FAISS `add` semantics,
  *     the same contract as [[Ann.ivfAppend]]) and APPEND to the on-disk
  *     list files, preserving [[Ann.ivfSave]]'s bucket partitioning and
  *     per-file cent_id clustering so query-side directory/row-group
  *     pruning keeps working on the grown index.
  *   - [[start]]/[[knnBatch]]: probe serving — each micro-batch queries
  *     the CURRENT on-disk index via [[Ann.ivfQuery]], the partition-
  *     pruned serving kernel (a bounded probe batch touches at most its
  *     probed list buckets at the file level, not the whole index). The
  *     index is re-read per batch, so appends landing between batches
  *     are picked up on the next trigger without restarting the query.
  *
  * Per-probe results are independent, so the union of per-batch outputs
  * equals one batch [[Ann.knnJoin]] over the union of probes at equal
  * nprobe (identical routing + tie rules) — the stream is cut-invariant:
  * replaying the same probes under different batch boundaries yields the
  * same rows (spec-asserted in StreamingAnnSpec).
  */
object StreamingAnn {

  /** Ingest one corpus micro-batch into the persisted index at
    * `indexPath`: rows routed against the existing centroids land as an
    * APPEND into the bucket-partitioned list files (new parquet files
    * inside the touched bucket directories, each internally clustered by
    * cent_id for row-group pruning — the same layout rules as ivfSave). */
  def appendBatch(spark: SparkSession, indexPath: String, batch: DataFrame,
      idCol: String, vecCol: String): Unit = {
    val index = Ann.ivfLoad(spark, indexPath)
    Ann.routeForAppend(index, batch, idCol, vecCol)
      .repartition(org.apache.spark.sql.functions.col("list_bucket"))
      .sortWithinPartitions("list_bucket", "cent_id")
      .write.mode("append").partitionBy("list_bucket")
      .parquet(s"$indexPath/lists")
  }

  /** Batch kernel: serve one probe micro-batch against the index as it
    * exists on disk RIGHT NOW. Output: (probe_id, neighbor_id, rank). */
  def knnBatch(indexPath: String, probes: DataFrame, idCol: String,
      vecCol: String, k: Int, nprobe: Int = 4): DataFrame =
    Ann.ivfQuery(Ann.ivfLoad(probes.sparkSession, indexPath), probes,
      idCol, vecCol, k, nprobe)

  /** Streaming wiring: each probe micro-batch is served against the
    * current on-disk index and handed to `sink` with its batch id. */
  def start(probes: DataFrame, indexPath: String, checkpointDir: String,
      idCol: String, vecCol: String, k: Int, nprobe: Int = 4)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    probes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(knnBatch(indexPath, batch, idCol, vecCol, k, nprobe), batchId)
      }
      .start()

  /** Fraction of the index that arrived by [[appendBatch]] since the
    * last full [[Ann.ivfSave]]: (current list rows − rows at save) /
    * rows at save. Appends route against FROZEN centroids, so recall
    * drifts as this grows — the measured curve (SCALING.md
    * `annAppendRecall`) is the retrain policy's input; rebuild
    * (ivfBuild + ivfSave) once the fraction crosses the documented
    * threshold. */
  def appendedFraction(spark: SparkSession, indexPath: String): Double = {
    val base = spark.read.parquet(s"$indexPath/base_meta").head().getLong(0)
    val cur = spark.read.parquet(s"$indexPath/lists").count()
    require(base > 0, s"index at $indexPath saved with no rows")
    (cur - base).toDouble / base
  }

  /** Compact the bucket directories [[appendBatch]] has grown: every
    * `list_bucket=N` directory holding at least `minFiles` parquet
    * fragments is rewritten into ⌈bytes/targetBytes⌉ files, each sorted
    * by cent_id (ivfSave's row-group-pruning clustering), and swapped in
    * with directory renames. Appends add one small file per touched
    * bucket per batch — unbounded, the classic streaming-ingest
    * small-file problem; serving cost tracks file count inside the
    * probed buckets, so periodic compaction keeps the per-query scan
    * set flat while query RESULTS are bit-identical (spec-pinned).
    * Returns (bucket, filesBefore, filesAfter) per compacted bucket. */
  def compactGrownBuckets(spark: SparkSession, indexPath: String,
      targetBytes: Long = 128L << 20, minFiles: Int = 4): Seq[(Int, Int, Int)] = {
    require(targetBytes > 0 && minFiles >= 2,
      "targetBytes must be positive and minFiles >= 2")
    import org.apache.hadoop.fs.Path
    val listsDir = new Path(s"$indexPath/lists")
    val fs = listsDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(dir: Path): Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(dir).toSeq.filter { st =>
        val n = st.getPath.getName
        st.isFile && n.endsWith(".parquet") && !n.startsWith("_") &&
          !n.startsWith(".")
      }
    // crash recovery for a previously interrupted swap: a failure
    // between the two renames leaves the bucket dir MISSING with the
    // original data stranded in .compact_old_N — every query would then
    // silently serve without that bucket's vectors, and a later
    // compaction could fs.delete the stranded original. Restore first;
    // orphaned .compact_new_N staging dirs are always safe to drop
    // (they are rebuilt from the live bucket).
    fs.listStatus(new Path(indexPath)).toSeq
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith(".compact_old_"))
      .foreach { o =>
        val bucket = o.getPath.getName.stripPrefix(".compact_old_")
        val live = new Path(s"$indexPath/lists/list_bucket=$bucket")
        if (!fs.exists(live)) require(fs.rename(o.getPath, live),
          s"could not restore interrupted compaction for bucket $bucket")
        else fs.delete(o.getPath, true) // swap completed; stale backup
      }
    fs.listStatus(new Path(indexPath)).toSeq
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith(".compact_new_"))
      .foreach(n => fs.delete(n.getPath, true))
    val buckets = fs.listStatus(listsDir).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("list_bucket="))
    buckets.flatMap { b =>
      val files = dataFiles(b.getPath)
      if (files.size < minFiles) None
      else {
        val bucket = b.getPath.getName.stripPrefix("list_bucket=").toInt
        val bytes = files.map(_.getLen).sum
        val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
        val tmpNew = new Path(s"$indexPath/.compact_new_$bucket")
        val tmpOld = new Path(s"$indexPath/.compact_old_$bucket")
        fs.delete(tmpNew, true); fs.delete(tmpOld, true)
        spark.read.parquet(b.getPath.toString)
          .repartition(nOut)
          .sortWithinPartitions("cent_id")
          .write.mode("overwrite").parquet(tmpNew.toString)
        // swap: grown dir aside, compacted dir in, old fragments gone
        require(fs.rename(b.getPath, tmpOld), s"could not move aside $b")
        require(fs.rename(tmpNew, b.getPath), s"could not swap in $tmpNew")
        fs.delete(tmpOld, true)
        Some((bucket, files.size, dataFiles(b.getPath).size))
      }
    }
  }
}
