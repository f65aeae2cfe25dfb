package graft.streaming

/** Shared layout + replay rules for the persisted dedup indexes
  * ([[StreamingExactDedup]], [[StreamingFuzzyDedup]]): one parquet
  * subdirectory per `run=<runId>/batch=<batchId>`, where the runId is
  * derived from the CHECKPOINT path so a same-checkpoint restart keeps
  * its id (batch replay stays idempotent) while a fresh-checkpoint
  * restart sees every older run as part of the seen-set. */
private[streaming] object DedupIndex {

  /** Replay-safe seen-set: every batch dir of every OTHER run, plus this
    * run's batches STRICTLY before `batchId`. */
  def earlierPaths(indexDir: String, runId: String, batchId: Long): Seq[String] = {
    val root = new java.io.File(indexDir)
    Option(root.listFiles()).toSeq.flatten
      .filter(d => d.isDirectory && d.getName.startsWith("run="))
      .flatMap { runDir =>
        val mine = runDir.getName == s"run=$runId"
        Option(runDir.listFiles()).toSeq.flatten
          .filter(b => b.isDirectory && b.getName.startsWith("batch="))
          .filter(b =>
            !mine || b.getName.stripPrefix("batch=").toLong < batchId)
          .map(_.getPath)
      }
  }

  /** Stable run identity from the checkpoint path. */
  def runIdFor(checkpointDir: String): String =
    java.security.MessageDigest.getInstance("SHA-1")
      .digest(new java.io.File(checkpointDir).getCanonicalPath
        .getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString
}
