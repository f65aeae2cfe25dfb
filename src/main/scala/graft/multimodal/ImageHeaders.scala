package graft.multimodal

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.util.zip.CRC32

/** Real (pure-JVM) image header decoding from the public format specs —
  * PNG (ISO/IEC 15948 §11.2.2 IHDR), JPEG/JFIF (ITU-T T.81 SOFn frame
  * headers), GIF (GIF89a spec, logical screen descriptor) and BMP
  * (BITMAPINFOHEADER). This replaces the round-1 decode STUB for image
  * metadata: mime/width/height come from the actual bytes; only the
  * embedding kernel remains a deterministic fake (no codec libraries in
  * the container, and none are needed for header fields).
  *
  * Counterpart surface in the reference: media handling is out of its
  * scope; this is part of the engine's LLM-training-pipeline additions.
  */
object ImageHeaders {

  final case class ImageMeta(mime: String, width: Int, height: Int)

  private def u16be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def u32be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def i32le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  private val PngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Parse a supported image header; None for unrecognized/truncated. */
  def parse(bytes: Array[Byte]): Option[ImageMeta] = {
    if (bytes == null || bytes.length < 10) None
    else if (bytes.take(8).sameElements(PngSig)) parsePng(bytes)
    else if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) parseJpeg(bytes)
    else if (bytes.length >= 10 &&
      new String(bytes, 0, 3, StandardCharsets.US_ASCII) == "GIF") parseGif(bytes)
    else if (bytes(0) == 'B' && bytes(1) == 'M') parseBmp(bytes)
    else None
  }

  /** PNG: the IHDR chunk is REQUIRED to be first (spec §5.6): width and
    * height are the two big-endian u32s at offsets 16 and 20. */
  private def parsePng(b: Array[Byte]): Option[ImageMeta] =
    if (b.length < 24) None
    else if (new String(b, 12, 4, StandardCharsets.US_ASCII) != "IHDR") None
    else Some(ImageMeta("image/png", u32be(b, 16), u32be(b, 20)))

  /** JPEG: walk the marker segments; the frame header (SOF0..SOF15 minus
    * DHT/JPG/DAC) carries height then width as big-endian u16s after the
    * 2-byte length and 1-byte precision (T.81 §B.2.2). */
  private def parseJpeg(b: Array[Byte]): Option[ImageMeta] = {
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None // marker desync
      val marker = b(i + 1) & 0xff
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7) || marker == 0x01) {
        i += 2 // standalone marker, no length
      } else if (marker == 0xd9) {
        return None // EOI before any SOF
      } else {
        val len = u16be(b, i + 2)
        if (len < 2) return None
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          if (i + 9 >= b.length) return None
          val height = u16be(b, i + 5)
          val width = u16be(b, i + 7)
          return Some(ImageMeta("image/jpeg", width, height))
        }
        i += 2 + len
      }
    }
    None
  }

  /** GIF: logical screen width/height, little-endian u16 at offsets 6/8. */
  private def parseGif(b: Array[Byte]): Option[ImageMeta] = {
    val ver = new String(b, 3, 3, StandardCharsets.US_ASCII)
    if (ver != "87a" && ver != "89a") None
    else Some(ImageMeta("image/gif", u16le(b, 6), u16le(b, 8)))
  }

  /** BMP: dispatch on the DIB header size at offset 14 — 12 is the OS/2
    * BITMAPCOREHEADER (UNSIGNED LE u16 dims at 18/20); anything >= 16 is
    * INFOHEADER-layout-compatible (OS/2 2.x headers are truncations or
    * extensions of BITMAPINFOHEADER: signed LE i32 dims at 18/22; height
    * may be negative for top-down rows — magnitude is the pixel height).
    * Reading a COREHEADER file with the INFOHEADER layout would splice
    * the height's low half onto the width — garbage dims, not None. */
  private def parseBmp(b: Array[Byte]): Option[ImageMeta] =
    if (b.length < 22) None
    else i32le(b, 14) match {
      case 12 =>
        Some(ImageMeta("image/bmp", u16le(b, 18), u16le(b, 20)))
      case sz if sz >= 16 && b.length >= 26 =>
        Some(ImageMeta("image/bmp", i32le(b, 18), math.abs(i32le(b, 22))))
      case _ => None
    }

  // ------------------------------------------------------- synthesis ------
  // Deterministic minimal-but-spec-valid fixtures (used by tests and the
  // oracle round-trip query): header structures are bit-faithful to the
  // specs above, with empty/placeholder pixel payloads.

  def synthPng(width: Int, height: Int): Array[Byte] = {
    val ihdr = ByteBuffer.allocate(17)
    ihdr.put("IHDR".getBytes(StandardCharsets.US_ASCII))
    ihdr.putInt(width).putInt(height)
    ihdr.put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    val crc = new CRC32
    crc.update(ihdr.array(), 0, 17)
    val out = ByteBuffer.allocate(8 + 4 + 17 + 4 + 12)
    out.put(PngSig)
    out.putInt(13).put(ihdr.array())
    out.putInt(crc.getValue.toInt)
    out.putInt(0).put("IEND".getBytes(StandardCharsets.US_ASCII))
    val crcEnd = new CRC32
    crcEnd.update("IEND".getBytes(StandardCharsets.US_ASCII))
    out.putInt(crcEnd.getValue.toInt)
    out.array()
  }

  def synthJpeg(width: Int, height: Int): Array[Byte] = {
    val out = ByteBuffer.allocate(2 + 13 + 2)
    out.put(0xff.toByte).put(0xd8.toByte) // SOI
    out.put(0xff.toByte).put(0xc0.toByte) // SOF0
    out.putShort(11.toShort) // segment length: 8 + 3*1 component
    out.put(8.toByte) // precision
    out.putShort(height.toShort).putShort(width.toShort)
    out.put(1.toByte) // one component
    out.put(1.toByte).put(0x11.toByte).put(0.toByte)
    out.put(0xff.toByte).put(0xd9.toByte) // EOI
    out.array()
  }

  def synthGif(width: Int, height: Int): Array[Byte] = {
    val out = ByteBuffer.allocate(6 + 7 + 1)
    out.put("GIF89a".getBytes(StandardCharsets.US_ASCII))
    out.put((width & 0xff).toByte).put(((width >> 8) & 0xff).toByte)
    out.put((height & 0xff).toByte).put(((height >> 8) & 0xff).toByte)
    out.put(0.toByte).put(0.toByte).put(0.toByte)
    out.put(0x3b.toByte) // trailer
    out.array()
  }

  def synthBmp(width: Int, height: Int): Array[Byte] = {
    val out = ByteBuffer.allocate(54)
    out.put('B'.toByte).put('M'.toByte)
    out.putInt(Integer.reverseBytes(54)) // file size (LE)
    out.putInt(0)
    out.putInt(Integer.reverseBytes(54)) // pixel data offset
    out.putInt(Integer.reverseBytes(40)) // BITMAPINFOHEADER size
    out.putInt(Integer.reverseBytes(width))
    out.putInt(Integer.reverseBytes(height))
    out.array()
  }
}
