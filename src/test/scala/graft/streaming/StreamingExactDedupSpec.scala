package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingExactDedupSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  private val sunk = scala.collection.mutable.ArrayBuffer[(Long, String)]()

  private def startQ(stream: MemoryStream[(Long, String)],
      indexDir: String, ckpt: String) =
    StreamingExactDedup.start(
      stream.toDS().toDF("doc_id", "text"), "text", "doc_id",
      indexDir, ckpt) { batch =>
      sunk.synchronized {
        sunk ++= batch.select("doc_id", "text").as[(Long, String)].collect()
      }
    }

  "dedup" should "drop repeats within and across micro-batches" in {
    implicit val sqlCtx = spark.sqlContext
    sunk.clear()
    val (indexDir, ckpt) = (tmp("dedup-idx"), tmp("dedup-ck"))
    val stream = MemoryStream[(Long, String)]
    val q = startQ(stream, indexDir, ckpt)
    try {
      stream.addData((1L, "alpha"), (2L, "alpha"), (3L, "beta"))
      q.processAllAvailable()
      stream.addData((4L, "alpha"), (5L, "gamma"), (6L, "beta"))
      q.processAllAvailable()
    } finally q.stop()
    sunk.sorted.toList shouldBe List(
      (1L, "alpha"), (3L, "beta"), (5L, "gamma"))
  }

  it should "remember documents across a FRESH-checkpoint restart" in {
    implicit val sqlCtx = spark.sqlContext
    sunk.clear()
    val indexDir = tmp("dedup-idx2")
    val s1 = MemoryStream[(Long, String)]
    val q1 = startQ(s1, indexDir, tmp("dedup-ck2a"))
    try {
      s1.addData((1L, "seen-last-month"), (2L, "one-off"))
      q1.processAllAvailable()
    } finally q1.stop()

    // new query, new checkpoint, SAME index: batch ids restart at 0 but
    // the previous run's digests must still suppress the repeat
    val s2 = MemoryStream[(Long, String)]
    val q2 = startQ(s2, indexDir, tmp("dedup-ck2b"))
    try {
      s2.addData((10L, "seen-last-month"), (11L, "brand-new"))
      q2.processAllAvailable()
    } finally q2.stop()
    sunk.sorted.toList shouldBe List(
      (1L, "seen-last-month"), (2L, "one-off"), (11L, "brand-new"))
  }

  it should "keep the min id as the within-batch canonical document" in {
    implicit val sqlCtx = spark.sqlContext
    sunk.clear()
    val stream = MemoryStream[(Long, String)]
    val q = startQ(stream, tmp("dedup-idx3"), tmp("dedup-ck3"))
    try {
      stream.addData((9L, "x"), (4L, "x"), (7L, "x"))
      q.processAllAvailable()
    } finally q.stop()
    sunk.toList shouldBe List((4L, "x"))
  }

  "dedupBatch" should "replay a batch id idempotently" in {
    val indexDir = tmp("dedup-idx4")
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val b1 = Seq((3L, "a"), (4L, "c")).toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame, id: Long) =
      StreamingExactDedup
        .dedupBatch(df, "text", "doc_id", indexDir, "r1", id)
        .as[(Long, String)].collect().toSet
    run(b0, 0) shouldBe Set((1L, "a"), (2L, "b"))
    run(b1, 1) shouldBe Set((4L, "c"))
    // replay of batch 1 (crash before sink committed): same output,
    // index unchanged in effect
    run(b1, 1) shouldBe Set((4L, "c"))
  }

  it should "dedup null-text documents across batches like the batch window does" in {
    // sha2(null) is null and null never equi-joins: pre-fix, a null-text
    // row slipped past the cross-batch anti-join EVERY batch forever
    val indexDir = tmp("dedup-idx5")
    def run(df: org.apache.spark.sql.DataFrame, id: Long) =
      StreamingExactDedup
        .dedupBatch(df, "text", "doc_id", indexDir, "r1", id)
        .as[(Long, String)].collect().toSet
    val b0 = Seq((1L, null: String), (2L, "x")).toDF("doc_id", "text")
    val b1 = Seq((3L, null: String), (4L, null: String)).toDF("doc_id", "text")
    run(b0, 0) shouldBe Set((1L, null), (2L, "x"))
    // later null-text rows are duplicates of the first-seen one
    run(b1, 1) shouldBe Set.empty
  }

  "DedupIndex.runIdFor" should "be invariant to checkpoint-path spelling" in {
    // a crash-replayed batch restarted under a different spelling of the
    // SAME directory must keep its runId, or its own prior index writes
    // look like another run's and its keepers are suppressed
    val conf = spark.sparkContext.hadoopConfiguration
    val base = "/tmp/graft-runid-spelling"
    val a = DedupIndex.runIdFor(base, conf)
    DedupIndex.runIdFor(base + "/", conf) shouldBe a
    DedupIndex.runIdFor("file:" + base, conf) shouldBe a
    DedupIndex.runIdFor("file://" + base, conf) shouldBe a
    DedupIndex.runIdFor("/tmp//graft-runid-spelling", conf) shouldBe a
    // a different directory is a different run
    DedupIndex.runIdFor(base + "2", conf) should not be a
  }

  it should "recover from a torn index write (killed between index write and checkpoint commit)" in {
    // r14 verdict #6: the crash window the replay-idempotence specs never
    // exercised — foreachBatch died AFTER starting the index parquet write
    // but BEFORE the checkpoint committed, leaving run=<id>/batch=2 as a
    // partially-written directory (dangling _temporary + a torn part
    // file). Documented recovery: the replayed batch never READS its own
    // torn dir (the seen-set is strictly-before) and OVERWRITES it.
    val indexDir = tmp("dedup-torn-idx")
    def batchDf(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")
    def run(b: org.apache.spark.sql.DataFrame, id: Long): Set[Long] =
      StreamingExactDedup.dedupBatch(b, "text", "doc_id", indexDir, "r1", id)
        .select("doc_id").as[Long].collect().toSet

    run(batchDf((1L, "a"), (2L, "b")), 0L) shouldBe Set(1L, 2L)
    run(batchDf((3L, "a"), (4L, "c")), 1L) shouldBe Set(4L)

    val torn = java.nio.file.Paths.get(indexDir, "run=r1", "batch=2")
    java.nio.file.Files.createDirectories(torn.resolve("_temporary"))
    java.nio.file.Files.write(torn.resolve("part-00000-torn.snappy.parquet"),
      "PAR1 this is not a parquet file".getBytes)

    // recovery replays batch 2 with the same input: 'c' is still seen
    // (batch 1), 'd' survives, and the torn content is gone
    run(batchDf((5L, "c"), (6L, "d")), 2L) shouldBe Set(6L)
    java.nio.file.Files.exists(
      torn.resolve("part-00000-torn.snappy.parquet")) shouldBe false

    // the NEXT batch reads the rewritten batch=2 cleanly: 'd' suppresses
    run(batchDf((7L, "d"), (8L, "e")), 3L) shouldBe Set(8L)
  }

  "DedupIndex.runIdAt" should "adopt a pre-upgrade legacy run directory" in {
    // rounds <= 11 hashed File.getCanonicalPath; a live checkpoint
    // straddling the qualification upgrade must keep that identity when
    // its index already holds run= dirs under the legacy id
    val conf = spark.sparkContext.hadoopConfiguration
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-legacy-ckpt").toString
    val index = java.nio.file.Files
      .createTempDirectory("graft-legacy-index").toString
    val qualified = DedupIndex.runIdFor(ckpt, conf)
    val legacy = { // the exact pre-upgrade hash input
      val canon = new java.io.File(ckpt).getCanonicalPath
      java.security.MessageDigest.getInstance("SHA-1")
        .digest(canon.getBytes("UTF-8"))
        .take(6).map(b => f"$b%02x").mkString
    }
    legacy should not be qualified // the migration case is real on this FS
    // empty index: no adoption, qualified id wins
    DedupIndex.runIdAt(ckpt, index, conf) shouldBe qualified
    // legacy run= dir present, qualified absent: adopt the legacy id
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(index, s"run=$legacy", "batch=0"))
    DedupIndex.runIdAt(ckpt, index, conf) shouldBe legacy
    // both present: the qualified id wins (post-migration state)
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(index, s"run=$qualified", "batch=0"))
    DedupIndex.runIdAt(ckpt, index, conf) shouldBe qualified
  }

  it should "propagate index-probe I/O errors instead of adopting an id" in {
    // regression (r13 ADVICE): a transient FS error while probing the
    // legacy run= dir used to read as "absent", silently steering a
    // straddling checkpoint onto the fresh qualified id and orphaning its
    // legacy seen-set; the probe must fail loudly instead
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    conf.setClass("fs.failingfs.impl", classOf[FailingFs],
      classOf[org.apache.hadoop.fs.FileSystem])
    conf.setBoolean("fs.failingfs.impl.disable.cache", true)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-failfs-ckpt").toString
    val ex = intercept[java.io.IOException] {
      DedupIndex.runIdAt(ckpt, "failingfs:///idx", conf)
    }
    ex.getMessage should include("injected")
  }
}

/** exists/getFileStatus throw — simulates a transient index-FS outage
  * during [[DedupIndex.runIdAt]]'s legacy-run probe. */
class FailingFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("failingfs:///")
  // RawLocalFileSystem overrides exists() directly (File.exists, not
  // getFileStatus) — fail both entry points
  override def exists(p: org.apache.hadoop.fs.Path): Boolean =
    throw new java.io.IOException("injected index-FS outage: " + p)
  override def getFileStatus(p: org.apache.hadoop.fs.Path): org.apache.hadoop.fs.FileStatus =
    throw new java.io.IOException("injected index-FS outage: " + p)
}
