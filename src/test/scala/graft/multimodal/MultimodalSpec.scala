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

  // ---- real header decode, pinned to fixtures independent of synthesis --

  "ImageHeaders.parse" should "read a real 1x1 PNG file's header" in {
    // canonical 1x1 transparent PNG (a real file, byte-for-byte)
    val png = java.util.Base64.getDecoder.decode(
      "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAAC0lEQVR42mNkYAAAAAYAAjCB0C8AAAAASUVORK5CYII=")
    ImageHeaders.parse(png) shouldBe Some(ImageHeaders.ImageMeta("image/png", 1, 1))
  }

  it should "walk JPEG segments (APP0 before SOF0) to the frame header" in {
    // hand-assembled per ITU-T T.81: SOI, APP0/JFIF (16 bytes), SOF0 with
    // height=2 width=3, EOI — layout differs from synthJpeg on purpose
    val hex = "FFD8" + "FFE0" + "0010" + "4A46494600" + "0101" + "00" +
      "0001" + "0001" + "0000" +
      "FFC0" + "000B" + "08" + "0002" + "0003" + "01" + "011100" + "FFD9"
    val jpeg = hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    ImageHeaders.parse(jpeg) shouldBe Some(ImageHeaders.ImageMeta("image/jpeg", 3, 2))
  }

  it should "read GIF logical screen dimensions (little-endian)" in {
    val gif = "GIF89a".getBytes ++ Array[Byte](0x04, 0x00, 0x03, 0x00, 0, 0, 0, 0x3b)
    ImageHeaders.parse(gif) shouldBe Some(ImageHeaders.ImageMeta("image/gif", 4, 3))
  }

  it should "reject unknown payloads and round-trip all synthesizers" in {
    ImageHeaders.parse("not an image at all".getBytes) shouldBe None
    ImageHeaders.parse(ImageHeaders.synthPng(640, 480)) shouldBe
      Some(ImageHeaders.ImageMeta("image/png", 640, 480))
    ImageHeaders.parse(ImageHeaders.synthJpeg(31, 17)) shouldBe
      Some(ImageHeaders.ImageMeta("image/jpeg", 31, 17))
    ImageHeaders.parse(ImageHeaders.synthGif(300, 200)) shouldBe
      Some(ImageHeaders.ImageMeta("image/gif", 300, 200))
    ImageHeaders.parse(ImageHeaders.synthBmp(12, 34)) shouldBe
      Some(ImageHeaders.ImageMeta("image/bmp", 12, 34))
  }

  "describeImages" should "decode a mixed-format binary column" in {
    val df = Seq(
      (1L, ImageHeaders.synthPng(10, 20)),
      (2L, ImageHeaders.synthJpeg(30, 40)),
      (3L, "garbage".getBytes))
      .toDF("media_id", "bytes")
    val out = Multimodal.describeImages(df, "media_id", "bytes")
      .as[(Long, Option[String], Int, Int)].collect().sortBy(_._1)
    out(0) shouldBe ((1L, Some("image/png"), 10, 20))
    out(1) shouldBe ((2L, Some("image/jpeg"), 30, 40))
    out(2) shouldBe ((3L, None, -1, -1))
  }
}
