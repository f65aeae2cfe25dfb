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

  it should "parse OS/2 BITMAPCOREHEADER dims as u16 (not the v3 layout)" in {
    // 12-byte DIB header: u16 dims at 18/20 — the INFOHEADER layout would
    // splice height bits into the width
    val core = new Array[Byte](26)
    core(0) = 'B'; core(1) = 'M'
    core(14) = 12 // DIB header size (LE i32)
    core(18) = 0x05; core(19) = 0x00 // width 5
    core(20) = 0x07; core(21) = 0x00 // height 7
    ImageHeaders.parse(core) shouldBe
      Some(ImageHeaders.ImageMeta("image/bmp", 5, 7))
    // unknown DIB header size (below the 16-byte INFOHEADER-compatible
    // floor, not the 12-byte COREHEADER): None, not a guess
    val odd = core.clone(); odd(14) = 14
    ImageHeaders.parse(odd) shouldBe None
  }

  // ---------------- round-3: REAL pixel decode + embedding kernel --------

  "ImagePixels" should "round-trip encodeGrayPng through the real decoder" in {
    val img = ImagePixels.encodeGrayPng(7, 5, (x, y) => x * 30 + y * 11)
    ImageHeaders.parse(img) shouldBe Some(ImageHeaders.ImageMeta("image/png", 7, 5))
    val g = ImagePixels.decode(img).get
    g.width shouldBe 7
    g.height shouldBe 5
    // exact pixel values survive deflate + filter round-trip
    for (y <- 0 until 5; x <- 0 until 7)
      g.pix(y * 7 + x) shouldBe (((x * 30 + y * 11) & 0xff) / 255f)
  }

  it should "decode an independently-encoded RGBA PNG (reference zlib)" in {
    // 2x2 RGBA (red, green / blue, white) produced by a reference encoder
    // (CPython zlib), NOT by encodeGrayPng — cross-implementation check.
    // (The ubiquitous 1x1 "transparent PNG" base64 is NOT used: its pixel
    // stream is truncated — 3 bytes where RGBA needs 5 — and this decoder
    // correctly rejects it where lenient browser decoders do not.)
    val png = java.util.Base64.getDecoder.decode(
      "iVBORw0KGgoAAAANSUhEUgAAAAIAAAACCAYAAABytg0kAAAAEklEQVR4nGP4z8DwHwyBNBgAAEnICff5q7YNAAAAAElFTkSuQmCC")
    val g = ImagePixels.decode(png).get
    (g.width, g.height) shouldBe ((2, 2))
    g.pix(0) shouldBe 0.299f +- 1e-3f // red
    g.pix(1) shouldBe 0.587f +- 1e-3f // green
    g.pix(2) shouldBe 0.114f +- 1e-3f // blue
    g.pix(3) shouldBe 1.0f +- 1e-3f // white
  }

  it should "decode 24-bit BMP rows bottom-up with padding" in {
    // hand-built 2x2 BMP: bottom row black+white, top row mid-grays
    val rowSize = 8 // 2 px * 3 B = 6, padded to 8
    val bytes = new Array[Byte](54 + rowSize * 2)
    bytes(0) = 'B'; bytes(1) = 'M'
    def w32(i: Int, v: Int): Unit = {
      bytes(i) = (v & 0xff).toByte; bytes(i + 1) = ((v >> 8) & 0xff).toByte
      bytes(i + 2) = ((v >> 16) & 0xff).toByte; bytes(i + 3) = ((v >> 24) & 0xff).toByte
    }
    w32(2, bytes.length); w32(10, 54); w32(14, 40); w32(18, 2); w32(22, 2)
    bytes(26) = 1; bytes(28) = 24
    // file row 0 = image BOTTOM: black (0,0,0), white (255,255,255)
    bytes(54 + 3) = -1; bytes(54 + 4) = -1; bytes(54 + 5) = -1
    // file row 1 = image TOP: two mid-grays 100 and 200
    for (k <- 0 until 3) bytes(54 + rowSize + k) = 100
    for (k <- 0 until 3) bytes(54 + rowSize + 3 + k) = (200 & 0xff).toByte
    val g = ImagePixels.decode(bytes).get
    (g.width, g.height) shouldBe ((2, 2))
    g.pix(0) shouldBe (100 / 255f) +- 1e-4f // top-left
    g.pix(1) shouldBe (200 / 255f) +- 1e-4f
    g.pix(2) shouldBe 0f +- 1e-4f // bottom-left black
    g.pix(3) shouldBe 1f +- 1e-4f
  }

  it should "return None (not hang) on a preset-dictionary zlib IDAT" in {
    // zlib header 0x78 0x20 sets FDICT: Inflater stalls at
    // needsDictionary — inflate() returns 0 with needsInput() false and
    // finished() false forever, which the old loop condition never exited
    val png = new java.io.ByteArrayOutputStream()
    png.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      def w32(v: Int): Unit = { png.write(v >>> 24); png.write((v >>> 16) & 0xff)
        png.write((v >>> 8) & 0xff); png.write(v & 0xff) }
      w32(data.length); png.write(typ.getBytes("US-ASCII"))
      png.write(data); w32(0) // decoder ignores chunk CRCs
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(2).putInt(2)
    ihdr.put(8.toByte).put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    chunk("IHDR", ihdr.array())
    chunk("IDAT", Array(0x78, 0x20, 0, 0, 0, 1, 7, 7, 7, 7).map(_.toByte))
    chunk("IEND", Array.emptyByteArray)
    ImagePixels.decode(png.toByteArray) shouldBe None
  }

  it should "hash duplicates equal and distinct patterns apart (dhash64)" in {
    def grad(x: Int, y: Int) = (x * 8) & 0xff
    def checker(x: Int, y: Int) = if (((x / 4) + (y / 4)) % 2 == 0) 0 else 255
    val a1 = ImagePixels.decode(ImagePixels.encodeGrayPng(32, 32, grad)).get
    val a2 = ImagePixels.decode(ImagePixels.encodeGrayPng(32, 32, grad)).get
    val b = ImagePixels.decode(ImagePixels.encodeGrayPng(32, 32, checker)).get
    ImagePixels.dhash64(a1) shouldBe ImagePixels.dhash64(a2)
    java.lang.Long.bitCount(
      ImagePixels.dhash64(a1) ^ ImagePixels.dhash64(b)) should be > 8
  }

  it should "embed noisy copies close and distinct patterns far (cosine)" in {
    def pat(x: Int, y: Int) = 128 + (100 * math.sin(x * 0.4) * math.cos(y * 0.3)).toInt
    def noisy(x: Int, y: Int) = pat(x, y) + ((x * 31 + y * 17) % 5 - 2)
    def other(x: Int, y: Int) = 128 + (100 * math.sin(y * 0.7)).toInt
    def cos(u: Array[Float], v: Array[Float]) =
      u.zip(v).map { case (a, b) => a * b }.sum.toDouble
    val e1 = ImagePixels.embed(ImagePixels.encodeGrayPng(40, 40, pat), 64)
    val e2 = ImagePixels.embed(ImagePixels.encodeGrayPng(40, 40, noisy), 64)
    val e3 = ImagePixels.embed(ImagePixels.encodeGrayPng(40, 40, other), 64)
    cos(e1, e2) should be > 0.98
    cos(e1, e3) should be < 0.5
    // undecodable bytes fall back to byte-histogram features (normalized)
    val fb = ImagePixels.embed(ImageHeaders.synthJpeg(8, 8), 64)
    math.sqrt(fb.map(v => v.toDouble * v).sum) shouldBe 1.0 +- 1e-6
  }

  "embedImages" should "produce ANN-ready vectors with dhash flags" in {
    val df = Seq(
      (1L, ImagePixels.encodeGrayPng(16, 16, (x, _) => x * 16)),
      (2L, ImagePixels.encodeGrayPng(16, 16, (x, _) => x * 16)),
      (3L, "not an image".getBytes))
      .toDF("media_id", "bytes")
    val out = Multimodal.embedImages(df, "media_id", "bytes", dim = 16)
      .orderBy("media_id").collect()
    out(0).getAs[Long]("dhash") shouldBe out(1).getAs[Long]("dhash")
    out(0).getAs[Boolean]("decoded") shouldBe true
    out(2).getAs[Boolean]("decoded") shouldBe false
    out(0).getAs[Seq[Float]]("embedding").length shouldBe 16
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
