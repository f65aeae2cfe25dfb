package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the table-maintenance pass every long-lived
  * ingestion corpus needs: streaming sinks and per-batch writers leave
  * thousands of KB-sized parquet files, and at 100 TB the scan cost is
  * dominated by file-open overhead and starved row-group parallelism,
  * not bytes. Compaction rewrites a directory into ⌈bytes/target⌉
  * files and reports exactly what it did.
  *
  * Design points:
  *  - sizing comes from the FILE SYSTEM listing (compressed bytes), not
  *    row counts — the quantity that actually governs scan tasks;
  *  - the rewrite is `repartition(n)` (round-robin), which both merges
  *    small files AND splits oversized ones; pass a sort recipe through
  *    `orderBy` beforehand if layout matters (see [[graft.functions
  *    .ZOrder]] for the clustered variant);
  *  - the output lands in a NEW directory + atomic-ish rename contract
  *    is the caller's (object stores differ); this operator never
  *    deletes the input. */
object Compaction {

  final case class Report(filesBefore: Long, bytesBefore: Long,
      filesAfter: Long, rows: Long)

  private def listParquet(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    val buf = scala.collection.mutable.ArrayBuffer[(String, Long)]()
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (f.isFile && name.endsWith(".parquet") && !name.startsWith("_") &&
          !name.startsWith("."))
        buf += ((f.getPath.toString, f.getLen))
    }
    buf.toSeq
  }

  /** Rewrite `inDir`'s parquet fragments into `outDir` as
    * ⌈totalBytes/targetBytes⌉ files (min 1). Returns the report; the
    * input directory is left untouched. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long): Report = {
    require(targetBytes > 0, "targetBytes must be positive")
    val files = listParquet(spark, inDir)
    require(files.nonEmpty, s"no parquet files under $inDir")
    val totalBytes = files.map(_._2).sum
    val nOut = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(inDir)
    df.repartition(nOut).write.mode("overwrite").parquet(outDir)
    val after = listParquet(spark, outDir)
    Report(files.size.toLong, totalBytes, after.size.toLong,
      spark.read.parquet(outDir).count())
  }
}
