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

  /** Stable run identity from the checkpoint path, FS-qualified before
    * hashing: every spelling of the same directory — trailing slash,
    * `file:///x` vs bare `/x`, scheme-default authority — must yield the
    * same runId, or a crash-replayed batch restarted under a different
    * spelling would treat its own prior index writes as another run's
    * and suppress its keepers as duplicates. `fs.makeQualified` pins
    * scheme + authority and resolves a relative path against the
    * filesystem (a relative checkpoint genuinely is a different
    * directory from a different CWD — unlike spelling variants, that
    * SHOULD be a different run).
    *
    * Run-identity migration: qualification changed the hash input once
    * across the round-12 upgrade (e.g. `/x` now hashes as `file:/x`), so
    * a LIVE checkpoint straddling it would get a fresh runId — its
    * previous index runs become "another run's" content, suppressing any
    * keepers a mid-flight replayed batch had already written but not yet
    * delivered. [[runIdAt]] (the call sites' entry point) therefore
    * probes the index for the LEGACY runId's `run=` dir and adopts it
    * when the qualified id has no directory yet — the straddling
    * checkpoint keeps its identity and replay stays idempotent with no
    * operator action. */
  def runIdFor(checkpointDir: String,
      conf: org.apache.hadoop.conf.Configuration =
        new org.apache.hadoop.conf.Configuration()): String = {
    val p = new org.apache.hadoop.fs.Path(checkpointDir)
    val u = p.getFileSystem(conf).makeQualified(p).toUri
    // render from components: `file:///x` keeps an EMPTY authority while
    // a qualified bare `/x` has a null one — toString would differ
    val path0 = u.getPath
    val path = // Path normalizes, but belt-and-braces for odd URIs
      if (path0.length > 1 && path0.endsWith("/")) path0.dropRight(1) else path0
    val norm = s"${u.getScheme}://${Option(u.getAuthority).getOrElse("")}$path"
    sha6(norm)
  }

  /** Run identity as the streaming dedup call sites resolve it: the
    * FS-qualified [[runIdFor]] hash, UNLESS this index already holds a
    * `run=` directory written under the pre-qualification id (rounds
    * ≤ 11 hashed `File.getCanonicalPath`) and none under the qualified
    * id — then the legacy id is adopted, so a live checkpoint straddling
    * the upgrade keeps treating its own earlier batches as its own run
    * (replayed batches stay idempotent instead of self-suppressing). */
  def runIdAt(checkpointDir: String, indexDir: String,
      conf: org.apache.hadoop.conf.Configuration): String = {
    val id = runIdFor(checkpointDir, conf)
    val legacy = legacyRunIdFor(checkpointDir).filterNot(_ == id)
    legacy match {
      case None => id
      case Some(old) =>
        val root = new org.apache.hadoop.fs.Path(indexDir)
        val fs = root.getFileSystem(conf)
        // deliberately NOT exception-swallowing: a transient FS error here
        // must abort the adoption decision loudly — mapping it to "absent"
        // would make a straddling checkpoint adopt the fresh qualified id,
        // orphan its legacy seen-set, and re-emit already-delivered keepers
        // on replay (r13 ADVICE). Only fs.exists' own clean false (the
        // directory is genuinely absent) may steer adoption.
        def hasRun(r: String): Boolean =
          fs.exists(new org.apache.hadoop.fs.Path(root, s"run=$r"))
        if (!hasRun(id) && hasRun(old)) {
          System.err.println(s"[dedup-index] adopting pre-upgrade runId " +
            s"$old for checkpoint $checkpointDir (legacy run= dir present " +
            s"under $indexDir, none for qualified id $id)")
          old
        } else {
          if (hasRun(id) && hasRun(old))
            System.err.println(s"[dedup-index] WARNING: index $indexDir " +
              s"holds run= dirs under BOTH the qualified id $id and the " +
              s"legacy id $old for checkpoint $checkpointDir; using $id — " +
              s"the legacy run's batches count as another run's seen-set")
          id
        }
    }
  }

  /** The hash input rounds ≤ 11 used (java.io.File canonicalization);
    * only consulted to recognize a pre-upgrade index directory. */
  private def legacyRunIdFor(checkpointDir: String): Option[String] =
    try Some(sha6(new java.io.File(checkpointDir).getCanonicalPath))
    catch { case _: Exception => None }

  private def sha6(s: String): String =
    java.security.MessageDigest.getInstance("SHA-1")
      .digest(s.getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString
}
