package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets

/** Audio (RIFF/WAVE PCM) and video (ISO-BMFF/MP4) kernels: golden byte
  * fixtures built independently of the writers, writer↔parser round-trips,
  * the spec's edge rules (odd-chunk padding, largesize, version-1 full
  * boxes, fmt-before-data), corruption rejection, and the DataFrame
  * operator contracts (null-preserving audit rows, bounded frame fan-out).
  */
class MultimodalAvSpec extends SparkSpec {
  import spark.implicits._

  private def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
  private def ascii(s: String): Array[Byte] = s.getBytes(StandardCharsets.US_ASCII)
  private def le32(n: Int): Array[Byte] =
    b(n & 0xff, (n >> 8) & 0xff, (n >> 16) & 0xff, (n >> 24) & 0xff)
  private def le16(n: Int): Array[Byte] = b(n & 0xff, (n >> 8) & 0xff)
  private def be32(n: Int): Array[Byte] =
    b((n >> 24) & 0xff, (n >> 16) & 0xff, (n >> 8) & 0xff, n & 0xff)
  private def be64(n: Long): Array[Byte] = be32((n >> 32).toInt) ++ be32(n.toInt)

  // ------------------------------------------------------------- WAV ------

  /** 44-byte canonical header + two samples (1, -1), written by hand. */
  private def goldenWav: Array[Byte] =
    ascii("RIFF") ++ le32(40) ++ ascii("WAVE") ++
      ascii("fmt ") ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++
      le32(16000) ++ le16(2) ++ le16(16) ++
      ascii("data") ++ le32(4) ++ b(0x01, 0x00, 0xff, 0xff)

  "AudioWav.parse" should "decode a hand-built golden WAV byte-for-byte" in {
    val (meta, samples) = AudioWav.parse(goldenWav).get
    meta shouldBe AudioWav.WavMeta(1, 8000, 16, 2, 0)
    samples.toSeq shouldBe Seq(1.toShort, -1.toShort)
  }

  it should "skip unknown chunks and honor the odd-size pad rule" in {
    // LIST with an ODD body size (5): the pad byte must not shift `fmt `
    val withList = goldenWav.take(12) ++
      ascii("LIST") ++ le32(5) ++ ascii("INFOx") ++ b(0) ++ goldenWav.drop(12)
    val (meta, samples) = AudioWav.parse(withList).get
    meta.sampleRate shouldBe 8000
    samples.toSeq shouldBe Seq(1.toShort, -1.toShort)
  }

  it should "reject data-before-fmt, truncation, non-PCM, and misdeclared sizes" in {
    val dataFirst = goldenWav.take(12) ++ goldenWav.slice(36, 48) ++ goldenWav.slice(12, 36)
    AudioWav.parse(dataFirst) shouldBe None
    AudioWav.parse(goldenWav.dropRight(1)) shouldBe None // data chunk short
    val float = goldenWav.clone(); float(20) = 3 // WAVE_FORMAT_IEEE_FLOAT
    AudioWav.parse(float) shouldBe None
    val lying = goldenWav.clone(); lying(40) = 99 // data size > remaining
    AudioWav.parse(lying) shouldBe None
    AudioWav.parse("not audio at all".getBytes) shouldBe None
  }

  it should "reject a near-u32 declared chunk size without crashing" in {
    // Int arithmetic would wrap pos+8+size negative and read out of
    // bounds; the Long walk must just return None
    val evil = ascii("RIFF") ++ le32(40) ++ ascii("WAVE") ++
      ascii("fmt ") ++ le32(0x7ffffff0)
    AudioWav.parse(evil) shouldBe None
    val evilJunk = ascii("RIFF") ++ le32(40) ++ ascii("WAVE") ++
      ascii("LIST") ++ le32(0xfffffff0)
    AudioWav.parse(evilJunk) shouldBe None
  }

  it should "prefix-decode under a frame cap while meta stays whole-clip" in {
    val (meta, samples) = AudioWav.parse(goldenWav, maxFrames = 1).get
    meta.nFrames shouldBe 2 // duration facts describe the full clip
    samples.toSeq shouldBe Seq(1.toShort) // but only one frame decodes
  }

  "AudioWav.write" should "round-trip samples, rate, and channels" in {
    val rnd = new scala.util.Random(7)
    for (channels <- Seq(1, 2); rate <- Seq(8000, 44100)) {
      val n = channels * (1 + rnd.nextInt(500))
      val samples = Array.fill(n)(rnd.nextInt(65536).toShort)
      val (meta, decoded) = AudioWav.parse(AudioWav.write(samples, rate, channels)).get
      meta.channels shouldBe channels
      meta.sampleRate shouldBe rate
      meta.nFrames shouldBe n / channels
      meta.durationMs shouldBe (n / channels).toLong * 1000 / rate
      decoded.toSeq shouldBe samples.toSeq
    }
  }

  "AudioWav.stats" should "match hand-computed integer statistics" in {
    val st = AudioWav.stats(Array[Short](3, -4, 0, 5, -1))
    st.nSamples shouldBe 5
    st.sumAbs shouldBe 13
    st.sumSq shouldBe (9 + 16 + 0 + 25 + 1)
    st.peak shouldBe 5
    // sign-bit transitions: 3→-4, -4→0, 5→-1 (0 counts as non-negative)
    st.zeroCrossings shouldBe 3
  }

  it should "count crossings per channel when interleaved" in {
    // stereo: L = [1, 2], R = [-1, -2] — no crossings within either channel
    AudioWav.stats(Array[Short](1, -1, 2, -2), channels = 2).zeroCrossings shouldBe 0
    // but as mono the same array alternates sign every sample
    AudioWav.stats(Array[Short](1, -1, 2, -2), channels = 1).zeroCrossings shouldBe 3
  }

  "AudioWav.windowStats" should "split into fixed spans with a partial tail" in {
    val samples = Array.tabulate(25)(i => i.toShort) // 25 frames @ 1000 Hz
    val ws = AudioWav.windowStats(samples, channels = 1, sampleRate = 1000, windowMs = 10)
    ws.map(_._1) shouldBe Seq(0, 1, 2)
    ws.map(_._2.nSamples) shouldBe Seq(10L, 10L, 5L)
    ws.last._2.sumAbs shouldBe (20 + 21 + 22 + 23 + 24)
    // the cap bounds the WORK: only the first maxWindows windows compute
    AudioWav.windowStats(samples, 1, 1000, 10, maxWindows = 2)
      .map(_._1) shouldBe Seq(0, 1)
  }

  // ------------------------------------------------------------- MP4 ------

  "VideoMp4" should "round-trip timescale, duration, dimensions, and payload" in {
    val payload = Array.tabulate(100)(i => (i * 7 % 251).toByte)
    val bytes = VideoMp4.write(timescale = 1000, duration = 2500,
      width = 320, height = 240, payload)
    val m = VideoMp4.parse(bytes).get
    m.brand shouldBe "isom"
    m.timescale shouldBe 1000
    m.duration shouldBe 2500
    m.durationMs shouldBe 2500
    m.width shouldBe 320
    m.height shouldBe 240
    m.mdatLength shouldBe 100
    bytes.slice(m.mdatOffset, m.mdatOffset + m.mdatLength).toSeq shouldBe payload.toSeq
  }

  it should "refuse to write version-0 fields past u32 instead of truncating" in {
    an[IllegalArgumentException] should be thrownBy
      VideoMp4.write(1000, 0x100000005L, 64, 48, Array.empty[Byte])
    an[IllegalArgumentException] should be thrownBy
      VideoMp4.write(0x100000000L, 10, 64, 48, Array.empty[Byte])
  }

  it should "express non-millisecond timescales in durationMs" in {
    val m = VideoMp4.parse(VideoMp4.write(90000, 180000, 64, 48, Array[Byte](1))).get
    m.durationMs shouldBe 2000
  }

  it should "skip unknown boxes and accept a largesize mdat" in {
    val base = VideoMp4.write(1000, 1000, 64, 48, Array.empty[Byte])
    val noMdat = base.dropRight(8) // strip the empty mdat box
    val free = be32(12) ++ ascii("free") ++ be32(0)
    val large = be32(1) ++ ascii("mdat") ++ be64(16 + 3) ++ b(9, 8, 7)
    val assembled = noMdat ++ free ++ large
    val m = VideoMp4.parse(assembled).get
    m.duration shouldBe 1000
    m.mdatLength shouldBe 3
    assembled(m.mdatOffset) shouldBe 9.toByte
  }

  it should "parse a version-1 mvhd (64-bit times)" in {
    val mvhdBody = b(1, 0, 0, 0) ++ be64(0) ++ be64(0) ++ be32(600) ++ be64(1200)
    val mvhd = be32(8 + mvhdBody.length) ++ ascii("mvhd") ++ mvhdBody
    val moov = be32(8 + mvhd.length) ++ ascii("moov") ++ mvhd
    val ftyp = be32(16) ++ ascii("ftyp") ++ ascii("iso6") ++ be32(0)
    val m = VideoMp4.parse(ftyp ++ moov).get
    m.brand shouldBe "iso6"
    m.timescale shouldBe 600
    m.duration shouldBe 1200
    m.durationMs shouldBe 2000
    m.width shouldBe -1 // no trak authored
  }

  it should "treat a top-level size-0 box as running to end of file" in {
    val base = VideoMp4.write(1000, 1000, 64, 48, Array.empty[Byte])
    val openEnded = base.dropRight(8) ++ be32(0) ++ ascii("mdat") ++ b(5, 6)
    VideoMp4.parse(openEnded).get.mdatLength shouldBe 2
  }

  it should "reject corruption rather than mis-parse" in {
    val good = VideoMp4.write(1000, 1000, 64, 48, Array[Byte](1, 2, 3))
    VideoMp4.parse(good.dropRight(2)) shouldBe None // truncated mdat
    val lying = good.clone(); lying(2) = 1 // ftyp declares a size past EOF
    VideoMp4.parse(lying) shouldBe None
    VideoMp4.parse("RIFFxxxxWAVE".getBytes) shouldBe None // wrong container
    // a moov whose declared body ends mid-child must fail, not under-read
    val mvhd = be32(8 + 100) ++ ascii("mvhd") // declares 100 bytes, has none
    val moov = be32(8 + mvhd.length) ++ ascii("moov") ++ mvhd
    val ftyp = good.take(20)
    VideoMp4.parse(ftyp ++ moov) shouldBe None
  }

  "VideoMp4.framePlan" should "grid time, cap frames, and seek proportionally" in {
    val meta = VideoMp4.Mp4Meta("isom", 1000, 1000, 1000, 64, 48, 40, 100)
    val plan = VideoMp4.framePlan(meta, strideMs = 250, maxFrames = 16)
    plan shouldBe Seq((0, 0L, 0), (1, 250L, 25), (2, 500L, 50), (3, 750L, 75))
    VideoMp4.framePlan(meta, 250, 2).length shouldBe 2
    VideoMp4.framePlan(meta.copy(durationMs = 0), 250, 16) shouldBe Seq.empty
    VideoMp4.framePlan(meta.copy(mdatLength = 0), 250, 16) shouldBe Seq.empty
  }

  // ----------------------------------------------- DataFrame operators ----

  "analyzeAudio" should "decode valid rows and keep nulls for garbage" in {
    val wav = AudioWav.write(Array[Short](100, -100, 100, -100), 8000)
    val df = Seq((1L, wav), (2L, "junk".getBytes)).toDF("id", "bytes")
    val out = Multimodal.analyzeAudio(df, "id", "bytes").orderBy("id").collect()
    out.length shouldBe 2
    out(0).getLong(1) shouldBe wav.length.toLong // n_bytes
    out(0).getInt(2) shouldBe 1 // channels
    out(0).getInt(3) shouldBe 8000
    out(0).getLong(4) shouldBe 4 // n_frames
    out(0).getLong(6) shouldBe 400 // sum_abs
    out(0).getLong(9) shouldBe 3 // zero_crossings
    out(1).isNullAt(2) shouldBe true // garbage rows audit as nulls
    out(1).getLong(1) shouldBe 4L // ...but payload size is still known
  }

  "audioFrameFeatures" should "explode bounded per-window feature rows" in {
    // 2500 frames @ 1000 Hz -> 100ms windows of 100 frames; cap at 20
    val samples = Array.tabulate(2500)(i => (if (i % 2 == 0) 100 else -100).toShort)
    val wav = AudioWav.write(samples, 1000)
    val df = Seq((1L, wav), (2L, "junk".getBytes)).toDF("id", "bytes")
    val rows = Multimodal.audioFrameFeatures(df, "id", "bytes",
      windowMs = 100, maxWindows = 20).collect()
    rows.length shouldBe 20 // 25 full windows capped at 20; junk row silent
    rows.map(_.getInt(1)).toSet shouldBe (0 until 20).toSet
    rows.foreach { r =>
      r.getLong(2) shouldBe 100 // n_samples per window
      r.getLong(3) shouldBe 100L * 100 // sum_abs
      r.getInt(5) shouldBe 100 // peak
      r.getLong(6) shouldBe 99 // alternating signs: 99 crossings per window
    }
  }

  "describeVideo and sampleVideoFrames" should "compose over real container bytes" in {
    val payload = Array.tabulate(200)(i => (i % 97).toByte)
    val mp4 = VideoMp4.write(1000, 1000, 128, 96, payload)
    val df = Seq((1L, mp4), (2L, "nope".getBytes)).toDF("id", "bytes")
    val meta = Multimodal.describeVideo(df, "id", "bytes").orderBy("id").collect()
    meta(0).getString(1) shouldBe "isom"
    meta(0).getInt(3) shouldBe 128
    meta(1).isNullAt(1) shouldBe true
    val frames = Multimodal.sampleVideoFrames(df, "id", "bytes", 250, 16)
    val rows = frames.orderBy("frame_idx").collect()
    rows.length shouldBe 4 // only the parseable row fans out, capped
    rows.map(_.getInt(1)).toSeq shouldBe Seq(0, 1, 2, 3)
    rows.map(_.getInt(4)).toSeq shouldBe Seq(0, 50 % 97, 100 % 97, 150 % 97)
  }
}
