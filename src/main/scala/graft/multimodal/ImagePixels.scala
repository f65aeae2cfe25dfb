package graft.multimodal

import java.nio.charset.StandardCharsets
import java.util.zip.{CRC32, Deflater, Inflater}

/** Real (pure-JVM, zero-codec) pixel decode and image features.
  *
  * PNG is fully decodable with nothing but `java.util.zip.Inflater`: the
  * IDAT stream is zlib, scanline filters are five integer predictors
  * (ISO/IEC 15948 §9). BMP 24-bit is raw little-endian BGR rows. That
  * makes two genuinely-decoded formats for the embedding kernel — the
  * round-2 "deterministic fake" survives only as the byte-histogram
  * fallback for formats whose entropy coding does need a codec (JPEG).
  *
  * Features:
  *  - [[dhash64]]: the public difference-hash (9x8 grayscale grid, one
  *    bit per horizontal gradient) — near-duplicate detection.
  *  - [[embed]]: grid-luminance embedding (area-averaged g x g grid,
  *    mean-centered, L2-normalized) for decodable images; 256-bin byte
  *    histogram folded to `dim` for everything else. Both are pure
  *    per-row JVM kernels — they run inside mapPartitions at scan speed.
  */
object ImagePixels {

  /** Row-major luminance raster, values in [0, 1]. */
  final case class Gray(width: Int, height: Int, pix: Array[Float])

  private val PngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  def decode(bytes: Array[Byte]): Option[Gray] =
    if (bytes == null || bytes.length < 26) None
    else if (bytes.take(8).sameElements(PngSig)) decodePng(bytes)
    else if (bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(bytes)
    else None

  // ------------------------------------------------------------------ PNG

  private def u32be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  /** 8-bit-depth, non-interlaced PNG; color types 0 (gray), 2 (RGB),
    * 4 (gray+alpha), 6 (RGBA). Palette/16-bit/interlaced → None. */
  private def decodePng(b: Array[Byte]): Option[Gray] = {
    if (b.length < 33 || new String(b, 12, 4, StandardCharsets.US_ASCII) != "IHDR")
      return None
    val width = u32be(b, 16)
    val height = u32be(b, 20)
    val bitDepth = b(24) & 0xff
    val colorType = b(25) & 0xff
    val interlace = b(28) & 0xff
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4; case _ => return None
    }
    if (bitDepth != 8 || interlace != 0) return None
    if (width <= 0 || height <= 0 || width.toLong * height > (64L << 20)) return None
    // concatenate IDAT payloads
    val idat = new java.io.ByteArrayOutputStream()
    var i = 8
    var ok = true
    while (ok && i + 8 <= b.length) {
      val len = u32be(b, i)
      val typ = new String(b, i + 4, 4, StandardCharsets.US_ASCII)
      if (len < 0 || i + 8 + len > b.length) ok = false
      else {
        if (typ == "IDAT") idat.write(b, i + 8, len)
        if (typ == "IEND") ok = false
        i += 12 + len // len + type + data + crc
      }
    }
    val compressed = idat.toByteArray
    if (compressed.isEmpty) return None
    val bpp = channels // bytes per pixel at depth 8
    val stride = width * bpp
    val raw = new Array[Byte]((stride + 1) * height)
    val inflater = new Inflater()
    inflater.setInput(compressed)
    var off = 0
    try {
      while (off < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, off, raw.length - off)
        // n == 0 without finished() covers EVERY stall state — truncated
        // input (needsInput) AND a preset-dictionary stream (FDICT set,
        // needsDictionary), which previously looped forever on hostile
        // bytes because neither exit condition could become true
        if (n == 0 && !inflater.finished()) return None
        off += n
      }
    } catch { case _: Exception => return None } finally inflater.end()
    if (off < raw.length) return None
    // undo scanline filters in place (ISO/IEC 15948 §9.2)
    val out = new Array[Byte](stride * height)
    var y = 0
    while (y < height) {
      val filter = raw((stride + 1) * y) & 0xff
      val rowIn = (stride + 1) * y + 1
      val rowOut = stride * y
      var x = 0
      while (x < stride) {
        val rw = raw(rowIn + x) & 0xff
        val a = if (x >= bpp) out(rowOut + x - bpp) & 0xff else 0
        val up = if (y > 0) out(rowOut - stride + x) & 0xff else 0
        val c = if (x >= bpp && y > 0) out(rowOut - stride + x - bpp) & 0xff else 0
        val v = filter match {
          case 0 => rw
          case 1 => rw + a
          case 2 => rw + up
          case 3 => rw + ((a + up) >> 1)
          case 4 =>
            val p = a + up - c
            val pa = math.abs(p - a); val pb = math.abs(p - up); val pc = math.abs(p - c)
            rw + (if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c)
          case _ => return None
        }
        out(rowOut + x) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val pix = new Array[Float](width * height)
    var p = 0
    while (p < width * height) {
      val base = p * bpp
      val lum = channels match {
        case 1 | 2 => (out(base) & 0xff).toFloat
        case _ =>
          0.299f * (out(base) & 0xff) + 0.587f * (out(base + 1) & 0xff) +
            0.114f * (out(base + 2) & 0xff)
      }
      pix(p) = lum / 255f
      p += 1
    }
    Some(Gray(width, height, pix))
  }

  // ------------------------------------------------------------------ BMP

  private def i32le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  /** 24-bit uncompressed BITMAPINFOHEADER BMP (bottom-up or top-down). */
  private def decodeBmp(b: Array[Byte]): Option[Gray] = {
    if (b.length < 54) return None
    val dataOff = i32le(b, 10)
    val width = i32le(b, 18)
    val rawH = i32le(b, 22)
    val bits = (b(28) & 0xff) | ((b(29) & 0xff) << 8)
    val compression = i32le(b, 30)
    if (bits != 24 || compression != 0) return None
    val height = math.abs(rawH)
    if (width <= 0 || height == 0 || width.toLong * height > (64L << 20)) return None
    val rowSize = ((width * 3 + 3) / 4) * 4 // rows pad to 4 bytes
    if (dataOff < 0 || dataOff.toLong + rowSize.toLong * height > b.length) return None
    val topDown = rawH < 0
    val pix = new Array[Float](width * height)
    var y = 0
    while (y < height) {
      val srcRow = dataOff + rowSize * (if (topDown) y else height - 1 - y)
      var x = 0
      while (x < width) {
        val i0 = srcRow + x * 3
        val lum = 0.114f * (b(i0) & 0xff) + 0.587f * (b(i0 + 1) & 0xff) +
          0.299f * (b(i0 + 2) & 0xff) // BGR order
        pix(y * width + x) = lum / 255f
        x += 1
      }
      y += 1
    }
    Some(Gray(width, height, pix))
  }

  // ------------------------------------------------------------- features

  /** Area-averaged resample to a gw x gh grid (each cell = mean of its
    * source box) — the standard preprocessing for perceptual hashes. */
  def resample(g: Gray, gw: Int, gh: Int): Array[Float] = {
    val out = new Array[Float](gw * gh)
    var gy = 0
    while (gy < gh) {
      // long box arithmetic: gx * width overflows Int once the grid is
      // wide and the source is large (prime dim -> gw = dim strips)
      val y0 = (gy.toLong * g.height / gh).toInt
      val y1 = math.max(y0 + 1, ((gy + 1).toLong * g.height / gh).toInt)
      var gx = 0
      while (gx < gw) {
        val x0 = (gx.toLong * g.width / gw).toInt
        val x1 = math.max(x0 + 1, ((gx + 1).toLong * g.width / gw).toInt)
        var sum = 0f
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { sum += g.pix(y * g.width + x); x += 1 }
          y += 1
        }
        out(gy * gw + gx) = sum / ((y1 - y0) * (x1 - x0))
        gx += 1
      }
      gy += 1
    }
    out
  }

  /** Difference hash: 9x8 grid, bit set when a cell is brighter than its
    * right neighbor — 64 bits, Hamming-comparable. */
  def dhash64(g: Gray): Long = {
    val grid = resample(g, 9, 8)
    var h = 0L
    var bit = 0
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (grid(y * 9 + x) > grid(y * 9 + x + 1)) h |= 1L << bit
        bit += 1
        x += 1
      }
      y += 1
    }
    h
  }

  /** Embedding: decoded images → gw x gh grid luminance, mean-centered and
    * L2-normalized (cosine-comparable, translation-insensitive in
    * brightness); undecodable bytes → 256-bin byte histogram folded to
    * `dim`, L2-normalized. The grid is the most-square factorization of
    * `dim` (64 → 8x8, 8 → 4x2; primes degrade to a 1-row strip). */
  def embed(bytes: Array[Byte], dim: Int): Array[Float] = {
    require(dim > 0, "dim must be positive")
    val gh = (math.sqrt(dim.toDouble).toInt to 1 by -1).find(dim % _ == 0).get
    val gw = dim / gh
    decode(bytes) match {
      case Some(g) =>
        val v = resample(g, gw, gh)
        var mean = 0f
        v.foreach(mean += _)
        mean /= dim
        var norm = 0.0
        var i = 0
        while (i < dim) { v(i) -= mean; norm += v(i).toDouble * v(i); i += 1 }
        val n = math.sqrt(norm)
        if (n > 1e-12) { i = 0; while (i < dim) { v(i) = (v(i) / n).toFloat; i += 1 } }
        v
      case None => byteHistogram(bytes, dim)
    }
  }

  /** Fallback features: 256-bin byte histogram folded into `dim` bins,
    * L2-normalized. Real content statistics (not a hash fake), cheap, and
    * stable across re-encodings of the same byte payload. */
  def byteHistogram(bytes: Array[Byte], dim: Int): Array[Float] = {
    val hist = new Array[Float](dim)
    if (bytes != null) {
      var i = 0
      while (i < bytes.length) { hist((bytes(i) & 0xff) * dim / 256) += 1f; i += 1 }
    }
    var norm = 0.0
    hist.foreach(v => norm += v.toDouble * v)
    val n = math.sqrt(norm)
    if (n > 1e-12) {
      var i = 0
      while (i < dim) { hist(i) = (hist(i) / n).toFloat; i += 1 }
    }
    hist
  }

  // ------------------------------------------------------------ synthesis

  /** Encode a REAL grayscale PNG (color type 0, depth 8, filter 0) from a
    * pixel function — spec-complete (zlib IDAT, CRCs), decodable by any
    * reader. Test/fixture counterpart of [[decodePng]]. */
  def encodeGrayPng(width: Int, height: Int, f: (Int, Int) => Int): Array[Byte] = {
    val raw = new Array[Byte]((width + 1) * height)
    var y = 0
    while (y < height) {
      raw((width + 1) * y) = 0 // filter: none
      var x = 0
      while (x < width) {
        raw((width + 1) * y + 1 + x) = (f(x, y) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val deflater = new Deflater()
    deflater.setInput(raw)
    deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val outZ = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) outZ.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val idat = outZ.toByteArray

    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = {
      out.write(((v >>> 24) & 0xff).toInt); out.write(((v >>> 16) & 0xff).toInt)
      out.write(((v >>> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    def chunk(typ: String, data: Array[Byte]): Unit = {
      w32(data.length.toLong)
      val tb = typ.getBytes(StandardCharsets.US_ASCII)
      out.write(tb)
      out.write(data)
      val crc = new CRC32
      crc.update(tb); crc.update(data)
      w32(crc.getValue)
    }
    out.write(PngSig)
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(width).putInt(height)
    ihdr.put(8.toByte).put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    chunk("IHDR", ihdr.array())
    chunk("IDAT", idat)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }
}
