package graft.multimodal

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

/** Generative invariants for the audio/video container kernels:
  * write → parse identity under arbitrary payloads (including PCM
  * extremes), indifference to injected unknown chunks/boxes, loud
  * rejection of mid-structure truncation, and the frame-plan bounds the
  * bounded-fan-out claim rests on. */
object MultimodalAvProps extends Properties("MultimodalAv") {

  // --------------------------------------------------------------- WAV ----

  private val pcm: Gen[Array[Short]] = for {
    n <- Gen.choose(0, 300)
    xs <- Gen.listOfN(n, Gen.oneOf(
      Gen.choose(Short.MinValue.toInt, Short.MaxValue.toInt),
      Gen.oneOf(0, 1, -1, Short.MinValue.toInt, Short.MaxValue.toInt)))
  } yield xs.map(_.toShort).toArray

  property("wav round-trips samples, rate, channels") =
    forAll(pcm, Gen.choose(1, 4), Gen.oneOf(8000, 16000, 44100)) {
      (mono, channels, rate) =>
        val samples = Array.tabulate(mono.length * channels)(i => mono(i / channels))
        val (meta, decoded) = AudioWav.parse(AudioWav.write(samples, rate, channels)).get
        meta.channels == channels && meta.sampleRate == rate &&
          meta.nFrames == mono.length && decoded.sameElements(samples)
    }

  private val junkChunk: Gen[Array[Byte]] = for {
    id <- Gen.oneOf("LIST", "fact", "cue ", "bext", "junk")
    n <- Gen.choose(0, 9) // odd sizes exercise the RIFF pad rule
    body <- Gen.listOfN(n, Gen.choose(0, 255))
  } yield {
    val b = new java.io.ByteArrayOutputStream()
    b.write(id.getBytes("US-ASCII"))
    b.write(Array[Byte](n.toByte, 0, 0, 0))
    body.foreach(b.write)
    if (n % 2 == 1) b.write(0) // pad byte
    b.toByteArray
  }

  property("wav parse skips any injected unknown chunks") =
    forAll(pcm, junkChunk, junkChunk) { (samples, j1, j2) =>
      val wav = AudioWav.write(samples, 8000)
      // inject before fmt (offset 12) and between fmt and data (offset 36)
      val mangled = wav.take(12) ++ j1 ++ wav.slice(12, 36) ++ j2 ++ wav.drop(36)
      AudioWav.parse(mangled).exists(_._2.sameElements(samples))
    }

  property("wav strict prefixes are rejected, never mis-decoded") =
    forAll(pcm, Gen.choose(0.0, 1.0)) { (samples, frac) =>
      val wav = AudioWav.write(samples, 8000)
      val k = (frac * (wav.length - 1)).toInt
      AudioWav.parse(wav.take(k)).isEmpty
    }

  property("wav stats agree with a naive reference") =
    forAll(pcm, Gen.choose(1, 3)) { (mono, channels) =>
      val samples = Array.tabulate(mono.length * channels)(i => mono(i / channels))
      val st = AudioWav.stats(samples, channels)
      val ref = samples.map(_.toLong)
      val crossRef = (channels until samples.length)
        .count(i => (samples(i - channels) < 0) != (samples(i) < 0))
      st.sumAbs == ref.map(math.abs).sum &&
        st.sumSq == ref.map(x => x * x).sum &&
        st.peak == (if (ref.isEmpty) 0 else ref.map(math.abs).max) &&
        st.zeroCrossings == crossRef
    }

  // --------------------------------------------------------------- MP4 ----

  private val clip: Gen[(Long, Long, Int, Int, Array[Byte])] = for {
    ts <- Gen.oneOf(600L, 1000L, 90000L)
    dur <- Gen.choose(0L, 1000000L)
    w <- Gen.choose(0, 4096)
    h <- Gen.choose(0, 4096)
    n <- Gen.choose(0, 400)
    payload <- Gen.listOfN(n, Gen.choose(0, 255))
  } yield (ts, dur, w, h, payload.map(_.toByte).toArray)

  property("mp4 round-trips timescale, duration, dims, payload") =
    forAll(clip) { case (ts, dur, w, h, payload) =>
      val bytes = VideoMp4.write(ts, dur, w, h, payload)
      val m = VideoMp4.parse(bytes).get
      m.timescale == ts && m.duration == dur && m.width == w && m.height == h &&
        m.durationMs == dur * 1000L / ts && m.mdatLength == payload.length &&
        bytes.slice(m.mdatOffset, m.mdatOffset + m.mdatLength).sameElements(payload)
    }

  private val junkBox: Gen[Array[Byte]] = for {
    tpe <- Gen.oneOf("free", "skip", "wide", "uuid")
    n <- Gen.choose(0, 24)
    body <- Gen.listOfN(n, Gen.choose(0, 255))
  } yield {
    val b = new java.io.ByteArrayOutputStream()
    val size = 8 + n
    b.write(Array[Byte]((size >> 24).toByte, (size >> 16).toByte,
      (size >> 8).toByte, size.toByte))
    b.write(tpe.getBytes("US-ASCII"))
    body.foreach(b.write)
    b.toByteArray
  }

  property("mp4 parse skips injected unknown top-level boxes") =
    forAll(clip, junkBox, junkBox) { case ((ts, dur, w, h, payload), j1, j2) =>
      val bytes = VideoMp4.write(ts, dur, w, h, payload)
      val ftypEnd = 20 // writer's ftyp box is always 20 bytes
      val mangled = bytes.take(ftypEnd) ++ j1 ++ bytes.drop(ftypEnd) ++ j2
      val m = VideoMp4.parse(mangled).get
      m.duration == dur && m.width == w &&
        mangled.slice(m.mdatOffset, m.mdatOffset + m.mdatLength).sameElements(payload)
    }

  property("mp4 cuts inside a box are rejected, never mis-parsed") =
    forAll(clip, Gen.choose(0.0, 1.0)) { case ((ts, dur, w, h, payload), frac) =>
      val bytes = VideoMp4.write(ts, dur, w, h, payload)
      val boundaries = { // box boundaries: prefixes ending here stay valid
        val moovSize = ((bytes(20) & 0xff) << 24) | ((bytes(21) & 0xff) << 16) |
          ((bytes(22) & 0xff) << 8) | (bytes(23) & 0xff)
        Set(0, 20, 20 + moovSize, bytes.length)
      }
      val k = (frac * (bytes.length - 1)).toInt
      boundaries.contains(k) || VideoMp4.parse(bytes.take(k)).isEmpty
    }

  property("frame plan is bounded, in-range, and monotonic") =
    forAll(clip, Gen.choose(1L, 5000L), Gen.choose(1, 32)) {
      case ((ts, dur, w, h, payload), stride, maxFrames) =>
        val meta = VideoMp4.parse(VideoMp4.write(ts, dur, w, h, payload)).get
        val plan = VideoMp4.framePlan(meta, stride, maxFrames)
        val expectedLen =
          if (meta.durationMs <= 0 || payload.isEmpty) 0
          else math.min((meta.durationMs + stride - 1) / stride, maxFrames.toLong)
        plan.length == expectedLen &&
          plan.forall { case (_, t, off) =>
            t < meta.durationMs && off >= 0 && off < payload.length } &&
          plan.map(_._3) == plan.map(_._3).sorted
    }
}
