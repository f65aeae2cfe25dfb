package graft.multimodal

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** Real (pure-JVM) ISO Base Media File Format ("MP4", ISO/IEC 14496-12)
  * container support: a bit-faithful box writer and a recursive box-walking
  * parser for the structural metadata a data pipeline needs — movie
  * duration/timescale (`mvhd`), track presentation dimensions (`tkhd`,
  * 16.16 fixed point), brand (`ftyp`), and the media payload extent
  * (`mdat`). Codec payloads stay opaque (no decoders in the container and
  * none are needed for container facts); frame SAMPLING is real logic:
  * deterministic time-grid offsets proportionally seeked into the payload.
  *
  * Parser behavior per the spec:
  *   - boxes are (u32 size)(4cc type)(body); size includes the 8-byte
  *     header; size==1 switches to a u64 `largesize` after the type
  *     (§4.2); size==0 means "to end of file" (top level only);
  *   - container boxes (`moov`, `trak`, `mdia`) recurse; unknown boxes are
  *     skipped by their declared size;
  *   - full boxes (`mvhd`, `tkhd`) dispatch on version: v0 = u32 times,
  *     v1 = u64 times (§4.3);
  *   - truncated or misdeclared sizes yield None, never a mis-parse.
  *
  * Counterpart surface in the reference: media handling is out of its
  * scope; this is part of the engine's LLM-training-pipeline additions
  * (video rows as opaque binary columns + typed metadata).
  */
object VideoMp4 {

  final case class Mp4Meta(
      brand: String,
      timescale: Long, // mvhd ticks per second
      duration: Long, // mvhd ticks
      durationMs: Long,
      width: Int, // first tkhd, integer part of 16.16
      height: Int,
      mdatOffset: Int, // -1 when absent
      mdatLength: Int)

  private def fourcc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, StandardCharsets.US_ASCII)
  private def u32(b: ByteBuffer, i: Int): Long = b.getInt(i).toLong & 0xffffffffL

  // ------------------------------------------------------------ writer ----

  /** Minimal-but-valid MP4: ftyp + moov(mvhd + trak(tkhd)) + mdat(payload).
    * Durations are expressed against `timescale` ticks per second. */
  def write(timescale: Long, duration: Long, width: Int, height: Int,
      payload: Array[Byte], brand: String = "isom"): Array[Byte] = {
    require(brand.length == 4, "brand must be a 4cc")
    // this writer emits version-0 full boxes (u32 times); values past u32
    // must fail loudly, not truncate silently in a "bit-faithful" writer
    require(timescale > 0 && timescale <= 0xffffffffL,
      s"timescale $timescale out of version-0 u32 range")
    require(duration >= 0 && duration <= 0xffffffffL,
      s"duration $duration out of version-0 u32 range")
    val ftyp = box("ftyp", bb => {
      bb.put(brand.getBytes(StandardCharsets.US_ASCII))
      bb.putInt(0) // minor version
      bb.put(brand.getBytes(StandardCharsets.US_ASCII)) // compatible brand
    }, 12)
    val mvhd = box("mvhd", bb => {
      bb.putInt(0) // version 0 + flags
      bb.putInt(0).putInt(0) // creation/modification time
      bb.putInt(timescale.toInt)
      bb.putInt(duration.toInt)
      bb.putInt(0x00010000) // rate 1.0
      bb.putShort(0x0100.toShort) // volume 1.0
      bb.putShort(0) // reserved
      bb.putInt(0).putInt(0) // reserved
      var i = 0
      val matrix = Array(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
      while (i < 9) { bb.putInt(matrix(i)); i += 1 }
      i = 0
      while (i < 6) { bb.putInt(0); i += 1 } // pre_defined
      bb.putInt(2) // next track id
    }, 100)
    val tkhd = box("tkhd", bb => {
      bb.putInt(0x000007) // version 0, flags: enabled | in movie | in preview
      bb.putInt(0).putInt(0) // times
      bb.putInt(1) // track id
      bb.putInt(0) // reserved
      bb.putInt(duration.toInt)
      bb.putInt(0).putInt(0) // reserved
      bb.putShort(0).putShort(0) // layer, alternate group
      bb.putShort(0).putShort(0) // volume (0 for video), reserved
      var i = 0
      val matrix = Array(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
      while (i < 9) { bb.putInt(matrix(i)); i += 1 }
      bb.putInt(width << 16) // 16.16 fixed
      bb.putInt(height << 16)
    }, 84)
    val trak = box("trak", bb => bb.put(tkhd), tkhd.length)
    val moov = box("moov", bb => { bb.put(mvhd); bb.put(trak) },
      mvhd.length + trak.length)
    val mdat = box("mdat", bb => bb.put(payload), payload.length)
    val out = ByteBuffer.allocate(ftyp.length + moov.length + mdat.length)
    out.put(ftyp).put(moov).put(mdat)
    out.array()
  }

  private def box(tpe: String, body: ByteBuffer => Unit, bodySize: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + bodySize)
    bb.putInt(8 + bodySize)
    bb.put(tpe.getBytes(StandardCharsets.US_ASCII))
    body(bb)
    bb.array()
  }

  // ------------------------------------------------------------ parser ----

  /** Walk the box tree; None on non-BMFF input or structural corruption. */
  def parse(bytes: Array[Byte]): Option[Mp4Meta] = {
    if (bytes == null || bytes.length < 8) return None
    if (fourcc(bytes, 4) != "ftyp") return None
    val buf = ByteBuffer.wrap(bytes)
    var brand: String = null
    var timescale = -1L
    var duration = -1L
    var width = -1
    var height = -1
    var mdatOff = -1
    var mdatLen = 0

    // returns false on structural corruption anywhere in the subtree
    def scan(start: Int, end: Int, topLevel: Boolean): Boolean = {
      var pos = start
      while (pos + 8 <= end) {
        var header = 8
        var size = u32(buf, pos)
        val tpe = fourcc(bytes, pos + 4)
        if (size == 1) { // 64-bit largesize
          if (pos + 16 > end) return false
          size = buf.getLong(pos + 8)
          header = 16
        } else if (size == 0) { // to end of enclosing scope, top level only
          if (!topLevel) return false
          size = (end - pos).toLong
        }
        if (size < header || pos + size > end) return false
        val bodyOff = pos + header
        val bodyLen = (size - header).toInt
        tpe match {
          case "ftyp" =>
            if (bodyLen < 4) return false
            brand = fourcc(bytes, bodyOff)
          case "moov" | "trak" | "mdia" =>
            if (!scan(bodyOff, bodyOff + bodyLen, topLevel = false)) return false
          case "mvhd" =>
            val v = bytes(bodyOff) & 0xff
            if (v == 0) {
              if (bodyLen < 20) return false
              timescale = u32(buf, bodyOff + 12)
              duration = u32(buf, bodyOff + 16)
            } else if (v == 1) {
              if (bodyLen < 32) return false
              timescale = u32(buf, bodyOff + 20)
              duration = buf.getLong(bodyOff + 24)
            } else return false
          case "tkhd" =>
            if (width < 0) { // first track wins
              val v = bytes(bodyOff) & 0xff
              val dimOff = if (v == 1) 88 else 76 // §8.3.2 layout by version
              if (bodyLen < dimOff + 8) return false
              width = (u32(buf, bodyOff + dimOff) >>> 16).toInt
              height = (u32(buf, bodyOff + dimOff + 4) >>> 16).toInt
            }
          case "mdat" =>
            if (mdatOff < 0) { mdatOff = bodyOff; mdatLen = bodyLen }
          case _ => () // skip unknown boxes by declared size
        }
        pos += size.toInt
      }
      // every scope — containers AND the file — must consume exactly its
      // extent: trailing sub-8-byte fragments are corruption, not padding
      pos == end
    }

    if (!scan(0, bytes.length, topLevel = true)) return None
    if (brand == null || timescale <= 0 || duration < 0) return None
    Some(Mp4Meta(brand, timescale, duration, duration * 1000L / timescale,
      width, height, mdatOff, mdatLen))
  }

  // ------------------------------------------------------ frame sampling --

  /** Deterministic frame-sample plan: time grid at `strideMs`, capped at
    * `maxFrames`, each grid instant proportionally seeked to a payload
    * offset (the codec-free analogue of a keyframe seek). Returns
    * (frameIndex, timeMs, payloadOffset). Empty when the clip has no
    * duration or no payload. */
  def framePlan(meta: Mp4Meta, strideMs: Long, maxFrames: Int): Seq[(Int, Long, Int)] = {
    if (meta.durationMs <= 0 || meta.mdatLength <= 0) return Seq.empty
    (0L until meta.durationMs by math.max(1, strideMs)).take(maxFrames)
      .zipWithIndex.map { case (t, i) =>
        (i, t, ((t * meta.mdatLength) / meta.durationMs).toInt)
      }
  }

  /** Execute the plan against the container bytes: one sampled payload
    * byte per frame (the stand-in for a decoded frame; the offsets and
    * plumbing are the real, scale-relevant logic). */
  def sampleFrames(bytes: Array[Byte], meta: Mp4Meta, strideMs: Long,
      maxFrames: Int): Seq[(Int, Long, Int, Int)] =
    framePlan(meta, strideMs, maxFrames).map { case (i, t, off) =>
      (i, t, off, bytes(meta.mdatOffset + off) & 0xff)
    }
}
