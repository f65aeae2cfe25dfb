package graft.streaming

import graft.SparkSpec
import graft.operators.CmSketch
import org.apache.spark.sql.functions._

class StreamingCmsSpec extends SparkSpec {
  import spark.implicits._

  behavior of "StreamingCms.observeBatch"

  private def freshDir() = java.nio.file.Files
    .createTempDirectory("cms-idx").toString

  it should "accumulate estimates across batches with the one-sided bound" in {
    val dir = freshDir()
    val probes = Seq(1L, 2L, 3L).toDF("key")
    // batch 0: key 1 x10, key 2 x5; batch 1: key 1 x7, key 3 x2
    val b0 = (Seq.fill(10)(1L) ++ Seq.fill(5)(2L)).toDF("key")
    val b1 = (Seq.fill(7)(1L) ++ Seq.fill(2)(3L)).toDF("key")
    val e0 = StreamingCms.observeBatch(b0, "key", 3, 1024, probes,
      dir, "r", 0L).collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val e1 = StreamingCms.observeBatch(b1, "key", 3, 1024, probes,
      dir, "r", 1L).collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    e0(1L) should be >= 10L
    e0(3L) shouldBe 0L // not yet seen, wide sketch -> no collision mass
    e1(1L) should be >= 17L // cumulative through batch 1
    e1(2L) should be >= 5L
    e1(3L) should be >= 2L
  }

  it should "replay a batch idempotently (same visible state, same output)" in {
    val dir = freshDir()
    val probes = Seq(1L).toDF("key")
    val b0 = Seq.fill(4)(1L).toDF("key")
    val b1 = Seq.fill(6)(1L).toDF("key")
    StreamingCms.observeBatch(b0, "key", 3, 256, probes, dir, "r", 0L).collect()
    val first = StreamingCms.observeBatch(b1, "key", 3, 256, probes,
      dir, "r", 1L).collect().map(_.getLong(2)).toSeq
    // crash/replay of batch 1: overwrites its own dir, reads only batch 0
    val replay = StreamingCms.observeBatch(b1, "key", 3, 256, probes,
      dir, "r", 1L).collect().map(_.getLong(2)).toSeq
    replay shouldBe first
  }

  it should "equal the one-shot batch sketch after any batch cut" in {
    val dir = freshDir()
    val rnd = new scala.util.Random(5)
    val all = Seq.fill(500)(rnd.nextLong(40))
    val (h1, h2) = all.splitAt(170)
    val probes = (0L until 40L).toDF("key")
    StreamingCms.observeBatch(h1.toDF("key"), "key", 3, 64, probes,
      dir, "r", 0L).collect()
    val streamed = StreamingCms.observeBatch(h2.toDF("key"), "key", 3, 64,
        probes, dir, "r", 1L)
      .select("key", "est").collect().map(r => r.getLong(0) -> r.getLong(1))
    val oneShot = CmSketch.estimate(
        CmSketch.build(all.toDF("key"), "key", 3, 64), probes, "key", 3, 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    streamed.toMap shouldBe oneShot.toMap
  }
}
