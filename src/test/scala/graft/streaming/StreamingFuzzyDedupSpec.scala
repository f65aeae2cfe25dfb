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

  it should "recover from a torn bucket-index write (killed before checkpoint commit)" in {
    // r14 verdict #6: the batch died mid-way through persisting its
    // surviving families' buckets (run=<id>/batch=2 half-written), before
    // the checkpoint committed. The replayed batch must ignore its own
    // torn dir (strictly-before seen-set) and overwrite it cleanly.
    val indexDir = tmp("fz-torn-idx")
    def batchDf(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")
    def run(b: org.apache.spark.sql.DataFrame, id: Long): Set[Long] =
      StreamingFuzzyDedup.dedupBatch(b, "text", "doc_id", indexDir, "r1", id)
        .select("doc_id").as[Long].collect().toSet

    run(batchDf((1L, base)), 0L) shouldBe Set(1L)
    run(batchDf((2L, other)), 1L) shouldBe Set(2L)

    val torn = java.nio.file.Paths.get(indexDir, "run=r1", "batch=2")
    java.nio.file.Files.createDirectories(torn.resolve("_temporary"))
    java.nio.file.Files.write(torn.resolve("part-00000-torn.snappy.parquet"),
      "not parquet".getBytes)

    // replay of batch 2: the other-clone still drops against batch 1's
    // buckets, the novel doc survives, the torn file is overwritten away
    val novel = "entirely novel committee propositions about lighthouse budgets"
    run(batchDf((3L, other), (4L, novel)), 2L) shouldBe Set(4L)
    java.nio.file.Files.exists(
      torn.resolve("part-00000-torn.snappy.parquet")) shouldBe false

    // and the rewritten batch=2 buckets suppress the novel doc's clone
    val fresh = "yet another unrelated passage describing harbor logistics"
    run(batchDf((5L, novel), (6L, fresh)), 3L) shouldBe Set(6L)
  }
}
