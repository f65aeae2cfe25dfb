package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: media as opaque
  * `binary` columns plus typed metadata, processed batch-at-a-time in
  * distributed partition functions.
  *
  * The embedding kernel is REAL for PNG and BMP ([[ImagePixels]]: zlib
  * inflate + scanline defilter, grid-luminance features, dHash) and falls
  * back to byte-histogram statistics for codec-needing formats (JPEG
  * entropy decode stays out — no codec libraries in the container).
  * Everything around it is the load-bearing Spark shape: the schema
  * contract, the mapPartitions batch path (one buffer in, feature struct
  * out, no driver collect), the partition sizing note (media rows are
  * MBs, so partitions must be sized by bytes not rows —
  * spark.sql.files.maxPartitionBytes governs scans, and
  * `repartitionForMedia` rebalances by accumulated payload size).
  */
object Multimodal {

  /** Typed media row: the engine's canonical multimodal schema. */
  final case class MediaRow(
      media_id: Long,
      kind: String, // "image" | "audio" | "video"
      bytes: Array[Byte],
      mime: String,
      width: Int, // -1 when unknown/not applicable
      height: Int,
      duration_ms: Long)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      checksum: Long,
      feature: Array[Float]) // fixed-dim embedding slot

  /** Batch feature extraction: runs once per partition, streams rows,
    * allocates nothing per-row beyond the feature vector. The feature is
    * [[ImagePixels.embed]] — real pixels for PNG/BMP, byte-histogram
    * statistics otherwise (`dim` must be a square). */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        var checksum = 0L
        var i = 0
        while (i < r.bytes.length) { checksum = checksum * 131 + (r.bytes(i) & 0xff); i += 1 }
        MediaFeatures(r.media_id, r.kind, r.bytes.length.toLong, checksum,
          ImagePixels.embed(r.bytes, dim))
      }
    }
  }

  /** Image embeddings + perceptual hash as a DataFrame stage: per-row JVM
    * kernel inside mapPartitions, output ready for [[graft.similarity.Ann]]
    * (`embedding` is cosine-comparable; `dhash` is Hamming-comparable and
    * null-free — undecodable rows hash their byte histogram's zero vector
    * as 0L with decoded=false). */
  def embedImages(df: DataFrame, idCol: String, bytesCol: String, dim: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val idType = df.schema(idCol).dataType
    df.select(col(idCol).cast("string").as("id"), col(bytesCol).as("bytes"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val decoded = ImagePixels.decode(bytes)
        (id, ImagePixels.embed(bytes, dim),
          decoded.map(ImagePixels.dhash64).getOrElse(0L), decoded.isDefined)
      })
      .toDF(idCol, "embedding", "dhash", "decoded")
      .withColumn(idCol, col(idCol).cast(idType))
  }

  /** REAL image metadata decode (not the stub): mime/width/height parsed
    * from PNG/JPEG/GIF/BMP headers per the public format specs
    * ([[ImageHeaders]]). Unrecognized payloads yield (null, -1, -1).
    * Runs as a per-partition stream — no driver collect, no codecs. */
  def describeImages(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // ids ride through as strings (exact for integral and IRI keys alike)
    // and are cast back to the caller's type at the end
    val idType = df.schema(idCol).dataType
    df.select(col(idCol).cast("string").as("id"), col(bytesCol).as("bytes"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        ImageHeaders.parse(bytes) match {
          case Some(m) => (id, m.mime, m.width, m.height)
          case None => (id, null: String, -1, -1)
        }
      })
      .toDF(idCol, "mime", "width", "height")
      .withColumn(idCol, col(idCol).cast(idType))
  }

  /** Rebalance media rows into partitions of roughly `targetBytes` payload
    * each — row-count partitioning is wrong when rows are megabytes. */
  def repartitionForMedia(df: DataFrame, bytesCol: String, targetBytes: Long): DataFrame = {
    val spark = df.sparkSession
    // coalesce: sum over zero rows (or all-null payloads) is null
    val totalBytes = df.select(coalesce(sum(length(col(bytesCol)).cast("long")),
      lit(0L))).head().getLong(0)
    val parts = math.max(1, math.min(200000, totalBytes / math.max(1, targetBytes))).toInt
    df.repartition(parts)
  }

  /** Frame-sample stand-in for video rows: deterministic frame offsets at a
    * fixed stride (the real kernel would decode; offsets are the real,
    * testable logic). */
  def frameOffsets(durationMs: Long, strideMs: Long, maxFrames: Int): Seq[Long] =
    (0L until durationMs by math.max(1, strideMs)).take(maxFrames)

  /** REAL audio decode ([[AudioWav]]): RIFF/WAVE chunk walk + 16-bit PCM
    * sample pass, emitting header metadata and integer-exact signal
    * statistics per row. Undecodable rows keep nulls in every audio
    * column rather than vanishing (corpus audits need the failure rows).
    * Per-partition stream, no driver collect, no codecs. */
  def analyzeAudio(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val idType = df.schema(idCol).dataType
    df.select(col(idCol).cast("string").as("id"), col(bytesCol).as("bytes"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        // n_bytes is knowable for every row (audit metadata); the audio
        // columns stay null when the payload is not decodable PCM
        val nBytes = if (bytes == null) 0L else bytes.length.toLong
        AudioWav.parse(bytes) match {
          case Some((m, samples)) =>
            val st = AudioWav.stats(samples, m.channels)
            (id, nBytes, java.lang.Integer.valueOf(m.channels),
              java.lang.Integer.valueOf(m.sampleRate),
              java.lang.Long.valueOf(m.nFrames), java.lang.Long.valueOf(m.durationMs),
              java.lang.Long.valueOf(st.sumAbs), java.lang.Long.valueOf(st.sumSq),
              java.lang.Integer.valueOf(st.peak), java.lang.Long.valueOf(st.zeroCrossings))
          case None =>
            (id, nBytes, null: java.lang.Integer, null: java.lang.Integer,
              null: java.lang.Long, null: java.lang.Long, null: java.lang.Long,
              null: java.lang.Long, null: java.lang.Integer, null: java.lang.Long)
        }
      })
      .toDF(idCol, "n_bytes", "channels", "sample_rate", "n_frames", "duration_ms",
        "sum_abs", "sum_sq", "peak", "zero_crossings")
      .withColumn(idCol, col(idCol).cast(idType))
  }

  /** REAL video container decode ([[VideoMp4]]): ISO-BMFF box walk for
    * brand/duration/dimensions/payload extent. Same null-preserving
    * contract and partition-streaming shape as [[analyzeAudio]]. */
  def describeVideo(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val idType = df.schema(idCol).dataType
    df.select(col(idCol).cast("string").as("id"), col(bytesCol).as("bytes"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        VideoMp4.parse(bytes) match {
          case Some(m) =>
            (id, m.brand, java.lang.Long.valueOf(m.durationMs),
              java.lang.Integer.valueOf(m.width), java.lang.Integer.valueOf(m.height),
              java.lang.Integer.valueOf(m.mdatLength))
          case None =>
            (id, null: String, null: java.lang.Long, null: java.lang.Integer,
              null: java.lang.Integer, null: java.lang.Integer)
        }
      })
      .toDF(idCol, "brand", "duration_ms", "width", "height", "mdat_bytes")
      .withColumn(idCol, col(idCol).cast(idType))
  }

  /** Audio frame features as a row-exploding stage: each decodable clip
    * yields one row per `windowMs` analysis window (channel 0), capped at
    * `maxWindows` — the audio analogue of [[sampleVideoFrames]], bounded
    * fan-out for safe composition at any corpus size. Undecodable rows
    * yield no frames (audit them via [[analyzeAudio]]). */
  def audioFrameFeatures(df: DataFrame, idCol: String, bytesCol: String,
      windowMs: Int, maxWindows: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val idType = df.schema(idCol).dataType
    df.select(col(idCol).cast("string").as("id"), col(bytesCol).as("bytes"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        // header first, then a PREFIX decode of just the frames the capped
        // windows need — a huge clip never allocates past the cap
        AudioWav.parseMeta(bytes).toSeq.flatMap { meta =>
          val perWindow =
            math.max(1L, meta.sampleRate.toLong * windowMs / 1000L)
          AudioWav.parse(bytes, maxFrames = perWindow * maxWindows).toSeq
            .flatMap { case (m, samples) =>
              AudioWav.windowStats(samples, m.channels, m.sampleRate, windowMs,
                  maxWindows)
                .map { case (w, st) =>
                  (id, w, st.nSamples, st.sumAbs, st.sumSq, st.peak,
                    st.zeroCrossings)
                }
            }
        }
      })
      .toDF(idCol, "window_idx", "n_samples", "sum_abs", "sum_sq", "peak",
        "zero_crossings")
      .withColumn(idCol, col(idCol).cast(idType))
  }

  /** Frame sampling as a row-exploding stage: each video row yields one
    * row per sampled frame (frame index, time, payload offset, sampled
    * byte). Fan-out is bounded by `maxFrames`, so the stage's output is
    * at most `maxFrames`× its input — safe to follow with per-frame
    * feature extraction at any corpus size. Unparseable rows yield no
    * frames (audit them via [[describeVideo]]). */
  def sampleVideoFrames(df: DataFrame, idCol: String, bytesCol: String,
      strideMs: Long, maxFrames: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val idType = df.schema(idCol).dataType
    df.select(col(idCol).cast("string").as("id"), col(bytesCol).as("bytes"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        VideoMp4.parse(bytes).toSeq.flatMap { m =>
          VideoMp4.sampleFrames(bytes, m, strideMs, maxFrames).map {
            case (i, t, off, v) => (id, i, t, off, v)
          }
        }
      })
      .toDF(idCol, "frame_idx", "time_ms", "payload_offset", "sample_value")
      .withColumn(idCol, col(idCol).cast(idType))
  }
}
