package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Real (pure-JVM) RIFF/WAVE PCM audio support from the public format spec
  * (Microsoft/IBM Multimedia Programming Interface and Data Specification
  * 1.0, the canonical WAVE definition): a bit-faithful writer and a
  * chunk-walking parser for 16-bit integer PCM, plus integer-exact sample
  * statistics used by the corpus-level audio queries. No codec libraries
  * are involved and none are needed — PCM is the decoded form.
  *
  * Parser behavior follows the spec, not a happy path:
  *   - chunks are walked in order; unknown chunks (LIST, fact, cue, bext,
  *     ...) are skipped by their declared size;
  *   - odd-sized chunks are padded to an even boundary (RIFF rule) and the
  *     pad byte is not part of the next chunk;
  *   - `fmt ` must precede `data` (required by the spec for PCM since the
  *     sample layout is undefined until the format is known);
  *   - truncated, misdeclared, or non-PCM input yields None, never a
  *     mis-decode.
  *
  * Counterpart surface in the reference: media handling is out of its
  * scope; this is part of the engine's LLM-training-pipeline additions
  * (audio rows as opaque binary columns + typed metadata).
  */
object AudioWav {

  /** Header facts: everything knowable without touching the payload. */
  final case class WavMeta(
      channels: Int,
      sampleRate: Int,
      bitsPerSample: Int,
      nFrames: Long, // frames = samples per channel
      durationMs: Long)

  /** Integer-exact PCM statistics: every field is exactly restateable in
    * SQL over the generating formula, so oracle checks are hash-strict
    * (no float summation-order hazards). RMS and similar derived floats
    * belong to callers: `sqrt(sumSq / n)`. */
  final case class PcmStats(
      nSamples: Long,
      sumAbs: Long,
      sumSq: Long,
      peak: Int, // max |sample|; 32768 representable (Short.MinValue)
      zeroCrossings: Long) // transitions of the sign bit (x < 0) between neighbors

  private def fourcc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, StandardCharsets.US_ASCII)

  // ------------------------------------------------------------ writer ----

  /** Serialize 16-bit PCM to a canonical 44-byte-header WAVE file.
    * `samples` is frame-interleaved when channels > 1 (L R L R ...) and its
    * length must be a multiple of `channels`. */
  def write(samples: Array[Short], sampleRate: Int, channels: Int = 1): Array[Byte] = {
    require(channels > 0 && sampleRate > 0, s"bad wav params: ch=$channels rate=$sampleRate")
    require(samples.length % channels == 0,
      s"sample count ${samples.length} not a multiple of $channels channels")
    val dataBytes = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataBytes).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes(StandardCharsets.US_ASCII))
    buf.putInt(36 + dataBytes) // RIFF size: file minus the 8-byte RIFF header
    buf.put("WAVE".getBytes(StandardCharsets.US_ASCII))
    buf.put("fmt ".getBytes(StandardCharsets.US_ASCII))
    buf.putInt(16) // PCM fmt chunk body size
    buf.putShort(1) // wFormatTag = WAVE_FORMAT_PCM
    buf.putShort(channels.toShort)
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * channels * 2) // byte rate
    buf.putShort((channels * 2).toShort) // block align
    buf.putShort(16) // bits per sample
    buf.put("data".getBytes(StandardCharsets.US_ASCII))
    buf.putInt(dataBytes)
    var i = 0
    while (i < samples.length) { buf.putShort(samples(i)); i += 1 }
    buf.array()
  }

  // ------------------------------------------------------------ parser ----

  /** Header-only parse: chunk walk up to and including the `data` size
    * field, no sample materialization. None on anything not 16-bit PCM. */
  def parseMeta(bytes: Array[Byte]): Option[WavMeta] =
    walk(bytes).map(_._1)

  /** Full decode: metadata plus the interleaved sample array. `maxFrames`
    * caps the DECODED frames (allocation and copy work) — the returned
    * meta still describes the whole clip, so duration stays truthful on a
    * prefix decode. */
  def parse(bytes: Array[Byte],
      maxFrames: Long = Long.MaxValue): Option[(WavMeta, Array[Short])] =
    walk(bytes).map { case (meta, dataOff, dataLen) =>
      val frames = math.min(meta.nFrames, math.max(0L, maxFrames))
      val n = (frames * meta.channels).toInt
      val out = new Array[Short](n)
      val buf = ByteBuffer.wrap(bytes, dataOff, dataLen).order(ByteOrder.LITTLE_ENDIAN)
      var i = 0
      while (i < n) { out(i) = buf.getShort(); i += 1 }
      (meta, out)
    }

  private def walk(bytes: Array[Byte]): Option[(WavMeta, Int, Int)] = {
    if (bytes == null || bytes.length < 12) return None
    if (fourcc(bytes, 0) != "RIFF" || fourcc(bytes, 8) != "WAVE") return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    // all position/size arithmetic in Long: a declared u32 size near
    // Int.MaxValue must fail the bounds check, not wrap it (the parser's
    // contract is None on corruption, never a crash or a mis-read)
    var pos = 12L
    var channels = -1
    var sampleRate = -1
    var bits = -1
    var blockAlign = -1
    while (pos + 8 <= bytes.length) {
      val p = pos.toInt
      val id = fourcc(bytes, p)
      val size = buf.getInt(p + 4).toLong & 0xffffffffL
      if (pos + 8 + size > bytes.length) return None // misdeclared
      if (id == "fmt ") {
        if (size < 16) return None
        val tag = buf.getShort(p + 8) & 0xffff
        if (tag != 1) return None // integer PCM only
        channels = buf.getShort(p + 10) & 0xffff
        sampleRate = buf.getInt(p + 12)
        blockAlign = buf.getShort(p + 20) & 0xffff
        bits = buf.getShort(p + 22) & 0xffff
        if (channels <= 0 || sampleRate <= 0 || bits != 16 ||
          blockAlign != channels * 2) return None
      } else if (id == "data") {
        if (channels < 0) return None // fmt must precede data for PCM
        val frames = size / blockAlign
        return Some((WavMeta(channels, sampleRate, bits, frames,
          frames * 1000L / sampleRate), p + 8, (size - size % blockAlign).toInt))
      }
      pos += 8 + size + (size & 1) // RIFF: odd chunks carry one pad byte
    }
    None
  }

  // -------------------------------------------------------- statistics ----

  /** One pass over interleaved samples; all-integer, overflow-safe for any
    * realistic clip (sumSq <= 2^30 per sample, so ~2^33 samples to Long
    * overflow). A zero crossing is a sign-bit change between consecutive
    * samples of the SAME channel. */
  def stats(samples: Array[Short], channels: Int = 1): PcmStats = {
    var sumAbs = 0L
    var sumSq = 0L
    var peak = 0
    var crossings = 0L
    var i = 0
    while (i < samples.length) {
      val x = samples(i).toInt
      val a = math.abs(x)
      sumAbs += a
      sumSq += x.toLong * x
      if (a > peak) peak = a
      if (i >= channels && ((samples(i - channels) < 0) != (x < 0))) crossings += 1
      i += 1
    }
    PcmStats(samples.length.toLong, sumAbs, sumSq, peak, crossings)
  }

  /** Fixed-duration analysis windows over channel 0 (frame-level feature
    * rows for downstream aggregation): one [[PcmStats]] per `windowMs`
    * span, final partial window included. `maxWindows` caps the WORK, not
    * just the output — windows past the cap are never computed. */
  def windowStats(samples: Array[Short], channels: Int, sampleRate: Int,
      windowMs: Int, maxWindows: Int = Int.MaxValue): Seq[(Int, PcmStats)] = {
    require(windowMs > 0, "windowMs must be positive")
    val perWindow = math.max(1, (sampleRate.toLong * windowMs / 1000L).toInt)
    val nFrames = samples.length / math.max(1, channels)
    (0 until nFrames by perWindow).take(maxWindows).zipWithIndex.map {
      case (start, w) =>
        val end = math.min(nFrames, start + perWindow)
        val mono = new Array[Short](end - start)
        var i = start
        while (i < end) { mono(i - start) = samples(i * channels); i += 1 }
        (w, stats(mono, 1))
    }
  }
}
