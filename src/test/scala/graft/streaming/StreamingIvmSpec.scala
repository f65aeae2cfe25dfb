package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingIvmSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  private def view(dir: String): Set[(Long, Long, Long)] =
    StreamingIvm.current(spark, dir).as[(Long, Long, Long)].collect().toSet

  "StreamingIvm" should "fold delta batches into a versioned view" in {
    implicit val sqlCtx = spark.sqlContext
    val (viewDir, ckpt) = (tmp("ivm-view"), tmp("ivm-ck"))
    val stream = MemoryStream[(Long, Long, Long)] // (k, sign, v)
    val q = StreamingIvm.start(stream.toDS().toDF("k", "sign", "v"),
      Seq("k"), Seq("v"), "sign", viewDir, ckpt)
    try {
      stream.addData((1L, 1L, 10L), (1L, 1L, 20L), (2L, 1L, 5L))
      q.processAllAvailable()
      view(viewDir) shouldBe Set((1L, 2L, 30L), (2L, 1L, 5L))
      // batch 2: delete one row of key 1, insert key 3
      stream.addData((1L, -1L, 10L), (3L, 1L, 7L))
      q.processAllAvailable()
      view(viewDir) shouldBe Set((1L, 1L, 20L), (2L, 1L, 5L), (3L, 1L, 7L))
      // both versions retained for time travel
      spark.read.parquet(s"$viewDir/v=0").count() shouldBe 2
      spark.read.parquet(s"$viewDir/v=1").count() shouldBe 3
    } finally q.stop()
  }

  it should "replay a batch id idempotently (same base, same result)" in {
    val viewDir = tmp("ivm-view2")
    def d(rows: (Long, Long, Long)*) = rows.toSeq.toDF("k", "sign", "v")
    StreamingIvm.applyBatch(d((1L, 1L, 10L)), viewDir, 0L,
      Seq("k"), Seq("v"), "sign")
    StreamingIvm.applyBatch(d((1L, 1L, 5L)), viewDir, 1L,
      Seq("k"), Seq("v"), "sign")
    view(viewDir) shouldBe Set((1L, 2L, 15L))
    // crash-replay of batch 1: must rebuild from v=0, not from v=1
    StreamingIvm.applyBatch(d((1L, 1L, 5L)), viewDir, 1L,
      Seq("k"), Seq("v"), "sign")
    view(viewDir) shouldBe Set((1L, 2L, 15L))
  }

  it should "recover from a torn snapshot write (killed before _CURRENT and checkpoint)" in {
    // r14 verdict #6: the batch died while writing v=2 (dangling
    // _temporary + a torn part file), before bumping _CURRENT and before
    // the checkpoint committed. Documented semantics: readers keep the
    // committed snapshot (_CURRENT still names v=1), and the replayed
    // batch rebases on the largest version STRICTLY below its id — the
    // torn v=2 is never a base — then overwrites it.
    val viewDir = tmp("ivm-torn")
    def d(rows: (Long, Long, Long)*) = rows.toSeq.toDF("k", "sign", "v")
    def apply(b: org.apache.spark.sql.DataFrame, id: Long): Unit =
      StreamingIvm.applyBatch(b, viewDir, id, Seq("k"), Seq("v"), "sign")
    apply(d((1L, 1L, 10L)), 0L)
    apply(d((2L, 1L, 5L)), 1L)
    view(viewDir) shouldBe Set((1L, 1L, 10L), (2L, 1L, 5L))

    val torn = java.nio.file.Paths.get(viewDir, "v=2")
    java.nio.file.Files.createDirectories(torn.resolve("_temporary"))
    java.nio.file.Files.write(torn.resolve("part-00000-torn.snappy.parquet"),
      "garbage, not parquet".getBytes)

    // reader isolation: _CURRENT was never bumped, the torn dir is invisible
    view(viewDir) shouldBe Set((1L, 1L, 10L), (2L, 1L, 5L))

    // recovery: replay batch 2 — rebases on v=1, overwrites the torn v=2,
    // commits _CURRENT
    apply(d((1L, 1L, 7L)), 2L)
    view(viewDir) shouldBe Set((1L, 2L, 17L), (2L, 1L, 5L))
    java.nio.file.Files.exists(
      torn.resolve("part-00000-torn.snappy.parquet")) shouldBe false
    // and a subsequent batch builds on the recovered snapshot
    apply(d((3L, 1L, 1L)), 3L)
    view(viewDir) shouldBe Set((1L, 2L, 17L), (2L, 1L, 5L), (3L, 1L, 1L))
  }

  it should "start from an empty view on the first batch" in {
    val viewDir = tmp("ivm-view3")
    StreamingIvm.applyBatch(
      Seq((9L, 1L, 1L)).toDF("k", "sign", "v"), viewDir, 0L,
      Seq("k"), Seq("v"), "sign")
    view(viewDir) shouldBe Set((9L, 1L, 1L))
  }
}
