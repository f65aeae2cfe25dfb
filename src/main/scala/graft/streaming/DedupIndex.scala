package graft.streaming

/** Shared layout + replay rules for the persisted dedup indexes
  * ([[StreamingExactDedup]], [[StreamingFuzzyDedup]]): one parquet
  * subdirectory per `run=<runId>/batch=<batchId>`, where the runId is
  * derived from the CHECKPOINT path so a same-checkpoint restart keeps
  * its id (batch replay stays idempotent) while a fresh-checkpoint
  * restart sees every older run as part of the seen-set.
  *
  * Listing goes through the Hadoop FileSystem API, not java.io.File: on
  * hdfs:// or s3a:// index directories a File-based listing returns
  * null, which would silently turn the seen-set EMPTY (duplicates
  * streaming through with no error) — the failure mode this shares with
  * every path the 100 TB layout actually uses. */
private[streaming] object DedupIndex {

  /** Replay-safe seen-set: every batch dir of every OTHER run, plus this
    * run's batches STRICTLY before `batchId`. */
  def earlierPaths(indexDir: String, runId: String, batchId: Long,
      conf: org.apache.hadoop.conf.Configuration): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(indexDir)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq
      .filter(d => d.isDirectory && d.getPath.getName.startsWith("run="))
      .flatMap { runDir =>
        val mine = runDir.getPath.getName == s"run=$runId"
        fs.listStatus(runDir.getPath).toSeq
          .filter(b => b.isDirectory && b.getPath.getName.startsWith("batch="))
          .filter(b =>
            !mine || b.getPath.getName.stripPrefix("batch=").toLong < batchId)
          .map(_.getPath.toString)
      }
  }

  /** Stable run identity from the checkpoint path — the Hadoop Path URI,
    * not File.getCanonicalPath: canonicalization resolves against the
    * process CWD, so the SAME checkpoint restarted from a different
    * working directory would silently become a "different run" and the
    * replayed batch's keepers would all look like duplicates. */
  def runIdFor(checkpointDir: String): String =
    java.security.MessageDigest.getInstance("SHA-1")
      .digest(new org.apache.hadoop.fs.Path(checkpointDir).toUri.toString
        .getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString
}
