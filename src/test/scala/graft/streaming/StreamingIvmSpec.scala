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

  it should "start from an empty view on the first batch" in {
    val viewDir = tmp("ivm-view3")
    StreamingIvm.applyBatch(
      Seq((9L, 1L, 1L)).toDF("k", "sign", "v"), viewDir, 0L,
      Seq("k"), Seq("v"), "sign")
    view(viewDir) shouldBe Set((9L, 1L, 1L))
  }
}
