package graft.multimodal

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class ExifSpec extends AnyFlatSpec with Matchers {

  private val lat = 48858370L // 48.858370° N (micro-degrees)
  private val lon = 2294481L // 2.294481° E

  "buildJpeg/parse" should "round-trip all fields, little-endian" in {
    val d = Exif.parse(Exif.buildJpeg(
      "ACME Cam", "2024:06:01 12:34:56", 6, lat, lon, littleEndian = true))
    d.make shouldBe Some("ACME Cam")
    d.dateTime shouldBe Some("2024:06:01 12:34:56")
    d.orientation shouldBe Some(6)
    d.latE6 shouldBe Some(lat)
    d.lonE6 shouldBe Some(lon)
  }

  it should "round-trip big-endian (MM) identically" in {
    val d = Exif.parse(Exif.buildJpeg(
      "ACME Cam", "2024:06:01 12:34:56", 3, lat, lon, littleEndian = false))
    d.orientation shouldBe Some(3)
    d.latE6 shouldBe Some(lat)
    d.lonE6 shouldBe Some(lon)
  }

  it should "carry southern/western hemispheres as negative micro-degrees" in {
    val d = Exif.parse(Exif.buildJpeg("c", "t", 1, -lat, -lon))
    d.latE6 shouldBe Some(-lat)
    d.lonE6 shouldBe Some(-lon)
  }

  it should "round-trip every residue of the 1/3600-degree grid exactly" in {
    for (e6 <- Seq(0L, 1L, 59L, 999999L, 1000000L, 89999999L, 123456L)) {
      Exif.parse(Exif.buildJpeg("c", "t", 1, e6, e6)).latE6 shouldBe Some(e6)
    }
  }

  "parse" should "reject junk, truncation, and non-EXIF JPEGs" in {
    Exif.parse(null) shouldBe Exif.ExifData(None, None, None, None, None)
    Exif.parse(Array[Byte](1, 2, 3)).make shouldBe None
    // valid JPEG SOI but no APP1
    Exif.parse(Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)).make shouldBe None
    // truncated mid-APP1
    val full = Exif.buildJpeg("ACME", "t", 1, lat, lon)
    Exif.parse(full.take(20)).make shouldBe None
    // corrupted TIFF magic
    val bad = full.clone(); bad(14) = 0x00
    Exif.parse(bad).make shouldBe None
  }

  it should "keep u32-scale rationals exact instead of overflowing Long" in {
    // deg = 0xFFFFFFFF/0xFFFFFFFF = 1 passes the ratio bound, but the old
    // Long arithmetic (num * 3.6e9) wrapped negative — the coordinate came
    // back as garbage instead of 1 degree
    val jpeg = Exif.buildJpeg("X", "t", 1, 0L, 0L)
    // writer layout: TIFF origin 12, lat DMS block at origin+126 (deg num,
    // deg den, min num, min den, sec num, sec den — LE u32s)
    val latAt = 12 + 126
    jpeg.slice(latAt, latAt + 8).toSeq shouldBe
      Seq[Byte](0, 0, 0, 0, 1, 0, 0, 0) // guard: 0/1 degrees as written
    for (k <- 0 until 8) jpeg(latAt + k) = 0xff.toByte
    Exif.parse(jpeg).latE6 shouldBe Some(1000000L)
    // an unbounded seconds term is corruption, not a coordinate
    val jpeg2 = Exif.buildJpeg("X", "t", 1, 0L, 0L)
    jpeg2(latAt + 16) = 0xff.toByte // sec num = 255, sec den stays 1e6...
    for (k <- 17 until 24) jpeg2(latAt + k) = 0.toByte // ...den = 0 -> None
    Exif.parse(jpeg2).latE6 shouldBe None
  }

  it should "parse a bare TIFF body (no JPEG wrapper)" in {
    val jpeg = Exif.buildJpeg("Bare", "t", 8, lat, lon)
    val tiff = jpeg.slice(12, jpeg.length - 2) // strip SOI+APP1 header+EOI
    Exif.parse(tiff).make shouldBe Some("Bare")
    Exif.parse(tiff).orientation shouldBe Some(8)
  }

  "extract" should "parse a binary column per partition, nulls for junk" in {
    val spark = graft.SparkSpec.session
    import spark.implicits._
    val rows = Seq(
      (1L, Exif.buildJpeg("Cam", "2024:01:01 00:00:00", 6, lat, lon)),
      (2L, Array[Byte](1, 2, 3)), // junk
      (3L, null.asInstanceOf[Array[Byte]]))
      .toDF("img_id", "bytes")
    val out = Exif.extract(rows, "img_id", "bytes")
      .orderBy("id")
      .as[(Long, String, String, Option[Long], Option[Long], Option[Long])]
      .collect()
    out(0) shouldBe ((1L, "Cam", "2024:01:01 00:00:00",
      Some(6L), Some(lat), Some(lon)))
    out(1)._2 shouldBe null
    out(2)._4 shouldBe None
  }

  it should "return None fields when the GPS IFD pointer is absent" in {
    // hand-build a TIFF with only Make: 1 entry
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int) = out.write(v & 0xff)
    def w16(v: Int) = { w8(v); w8(v >> 8) }
    def w32(v: Int) = { w8(v); w8(v >> 8); w8(v >> 16); w8(v >> 24) }
    out.write('I'); out.write('I'); w16(42); w32(8)
    w16(1) // one entry: Make="Quad\0" (5 bytes > 4 -> stored at offset 26)
    w16(0x010f); w16(2); w32(5); w32(26)
    w32(0)
    "Quad".foreach(c => out.write(c)); out.write(0)
    val d = Exif.parse(out.toByteArray)
    d.make shouldBe Some("Quad")
    d.latE6 shouldBe None
    d.orientation shouldBe None
  }
}
