package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val media = Seq(
    Multimodal.MediaRow(1L, "image", "fake-png-bytes".getBytes, "image/png", 640, 480, -1),
    Multimodal.MediaRow(2L, "audio", "fake-wav".getBytes, "audio/wav", -1, -1, 2000),
    Multimodal.MediaRow(3L, "image", "fake-png-bytes".getBytes, "image/png", 640, 480, -1))

  "extractFeatures" should "produce deterministic features per content" in {
    val feats = Multimodal.extractFeatures(spark.createDataset(media), dim = 8).collect()
    feats.length shouldBe 3
    val byId = feats.map(f => f.media_id -> f).toMap
    byId(1L).feature.toSeq shouldBe byId(3L).feature.toSeq // same bytes, same features
    byId(1L).feature.toSeq should not be byId(2L).feature.toSeq
    byId(1L).n_bytes shouldBe "fake-png-bytes".getBytes.length.toLong
    byId(1L).checksum shouldBe byId(3L).checksum
  }

  "repartitionForMedia" should "split by payload bytes" in {
    val df = media.map(m => (m.media_id, m.bytes)).toDF("media_id", "bytes")
    val re = Multimodal.repartitionForMedia(df, "bytes", targetBytes = 10)
    re.count() shouldBe 3
    re.rdd.getNumPartitions should be >= 2
  }

  "frameOffsets" should "sample at the stride up to the cap" in {
    Multimodal.frameOffsets(1000, 250, 10) shouldBe Seq(0L, 250L, 500L, 750L)
    Multimodal.frameOffsets(10000, 100, 3) shouldBe Seq(0L, 100L, 200L)
  }
}
