package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingFuzzyDedupSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  private val base = "the quick brown fox jumps over the lazy dog again and again"
  private val other = "completely different content about catalyst physical plans"

  private def startQ(stream: MemoryStream[(Long, String)],
      indexDir: String, ckpt: String,
      sunk: scala.collection.mutable.ArrayBuffer[Long]) =
    StreamingFuzzyDedup.start(
      stream.toDS().toDF("doc_id", "text"), "text", "doc_id",
      indexDir, ckpt) { batch =>
      sunk.synchronized { sunk ++= batch.select("doc_id").as[Long].collect() }
    }

  "streaming fuzzy dedup" should "collapse within-batch families and drop cross-batch near-dups" in {
    implicit val sqlCtx = spark.sqlContext
    val sunk = scala.collection.mutable.ArrayBuffer[Long]()
    val (indexDir, ckpt) = (tmp("fz-idx"), tmp("fz-ck"))
    val stream = MemoryStream[(Long, String)]
    val q = startQ(stream, indexDir, ckpt, sunk)
    try {
      // batch 1: a 3-member near-dup family + one distinct doc
      stream.addData(
        (1L, base), (2L, base + " extra"), (3L, base + " extra words"),
        (10L, other))
      q.processAllAvailable()
      // batch 2: a NEW near-dup of the batch-1 family (drops), a replay
      // of the distinct doc's text with a new id (drops), and one novel
      stream.addData(
        (20L, base + " tail"), (21L, other + " appended"),
        (30L, "entirely novel text about streaming state stores tonight"))
      q.processAllAvailable()
    } finally q.stop()
    sunk.sorted.toList shouldBe List(1L, 10L, 30L)
  }

  it should "not let NEVER-EMITTED content suppress later novel documents" in {
    // regression: only SURVIVING families' buckets may enter the index.
    // B (half A-clone, half novel) drops against A; C resembles only
    // B's novel half — if B's buckets had been persisted, C would be
    // suppressed even though nothing representing it was ever emitted.
    implicit val sqlCtx = spark.sqlContext
    val novel = "meanwhile the committee debated seventeen entirely " +
      "unrelated propositions regarding lighthouse maintenance budgets"
    val sunk = scala.collection.mutable.ArrayBuffer[Long]()
    val (indexDir, ckpt) = (tmp("fz-idx3"), tmp("fz-ck4"))
    val stream = MemoryStream[(Long, String)]
    val q = startQ(stream, indexDir, ckpt, sunk)
    try {
      stream.addData((1L, base))
      q.processAllAvailable()
      stream.addData((2L, base + " " + novel)) // drops: collides with A
      q.processAllAvailable()
      stream.addData((3L, novel)) // must be EMITTED: nothing emitted resembles it
      q.processAllAvailable()
    } finally q.stop()
    sunk.sorted.toList shouldBe List(1L, 3L)
  }

  it should "stay idempotent across a same-checkpoint replay and remember across runs" in {
    implicit val sqlCtx = spark.sqlContext
    val sunk = scala.collection.mutable.ArrayBuffer[Long]()
    val indexDir = tmp("fz-idx2")
    val ckpt = tmp("fz-ck2")
    val stream = MemoryStream[(Long, String)]
    val q = startQ(stream, indexDir, ckpt, sunk)
    try {
      stream.addData((1L, base), (10L, other))
      q.processAllAvailable()
    } finally q.stop()
    // a FRESH checkpoint (new run): earlier run's buckets are the seen-set
    val sunk2 = scala.collection.mutable.ArrayBuffer[Long]()
    val stream2 = MemoryStream[(Long, String)]
    val q2 = startQ(stream2, indexDir, tmp("fz-ck3"), sunk2)
    try {
      stream2.addData((50L, base + " coda"), (51L, "brand new content here today"))
      q2.processAllAvailable()
    } finally q2.stop()
    sunk.sorted.toList shouldBe List(1L, 10L)
    sunk2.sorted.toList shouldBe List(51L)
  }
}
