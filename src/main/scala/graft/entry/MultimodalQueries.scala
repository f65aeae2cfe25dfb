package graft.entry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import scala.collection.immutable.ListMap

import graft.operators.IntervalJoin
import graft.graph.GraphOps
import graft.dedup.Dedup
import graft.enrich.Resolution
import graft.similarity.Ann
import graft.text.TextAnalysis
import graft.rdf.{Bgp, QuadStore, TpchQuads}
import graft.rdf.Bgp.Pattern

import graft.entry.EntryKit.{t, eventsAsObservations}

/** Multimodal columns: image/audio/video/EXIF kernels over opaque binary with typed metadata, image embeddings into ANN.
  *
  * One of the per-package query registries aggregated by
  * [[graft.SparkEntry]] — split out of the former 6k-LoC single object
  * so each registry compiles to a bounded class (static-init and
  * JIT/class-loading pressure were the bench's named suspect).
  * Query semantics, ids and oracle SQL are unchanged by the split.
  */
private[graft] object MultimodalQueries {

  /** Multimodal plumbing: text bytes as the opaque binary column, feature
    * extraction via the partition-batched kernel; byte count is the
    * oracle-checkable surface. */
  private def q49_multimodal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = t(s, dir, "documents").select(
        col("doc_id").as("media_id"), lit("text").as("kind"),
        encode(col("text"), "UTF-8").as("bytes"), lit("text/plain").as("mime"),
        lit(-1).as("width"), lit(-1).as("height"), lit(-1L).as("duration_ms"))
      .as[graft.multimodal.Multimodal.MediaRow]
    graft.multimodal.Multimodal.extractFeatures(media, dim = 8)
      .select(col("media_id").as("doc_id"), col("n_bytes"))
  }

  /** Multimodal REAL header decode: synthesize spec-valid PNG/JPEG/GIF
    * binaries per document (dimensions derived from doc_id), parse them
    * back with the pure-JVM header readers, and oracle-check the
    * round-trip closed-form. The parser itself is additionally pinned to
    * known byte fixtures in MultimodalSpec. */
  private def q69_image_meta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.multimodal.ImageHeaders
    val imgs = t(s, dir, "documents").select(col("doc_id").cast("long")).as[Long]
      .map { id =>
        val w = (id % 64 + 1).toInt
        val h = ((id * 7) % 64 + 1).toInt
        val bytes = (id % 3) match {
          case 0 => ImageHeaders.synthPng(w, h)
          case 1 => ImageHeaders.synthJpeg(w, h)
          case _ => ImageHeaders.synthGif(w, h)
        }
        (id, bytes)
      }.toDF("doc_id", "bytes")
    graft.multimodal.Multimodal.describeImages(imgs, "doc_id", "bytes")
  }

  /** Multimodal → ANN end-to-end: REAL grayscale PNGs (zlib-encoded pixel
    * patterns parameterized by doc_id) → [[graft.multimodal.ImagePixels]]
    * pixel decode → grid-luminance embeddings → IVF top-k neighbors.
    * Oracle-checked: the EXPECTED pixel grid is emitted as a parquet
    * fixture computed from the generating formula itself (independent of
    * the engine's PNG decoder — a decode bug goes hash-red rather than
    * relocating the oracle) and the oracle SQL restates the grid-average
    * embedding + exhaustive cosine top-3 over it. IVF-vs-exhaustive
    * equality is guaranteed on this corpus: doc_ids congruent mod 77
    * share (freq, phase) and hence bit-identical pixels/embeddings, so
    * every probe's true top-3 are exact sim-1.0 ties resolved by the
    * shared (sim DESC, neighbor_id) order, and tied vectors route to the
    * probe's own IVF list by construction. */
  private def q76_image_embed(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // oracle precondition (r13 ADVICE): the rank-agreement argument rests
    // on every probe (doc_id < 10) having >= 3 exact mod-77 duplicates
    // (sim-1.0 ties), which needs doc_ids up to at least 9 + 3*77. A
    // smaller/changed documents table must fail loudly here, not as a
    // float32-vs-float64 rank-flip oracle mismatch.
    // r14 ADVICE: max() over an empty table is a NULL aggregate — read it
    // null-safely so an empty documents table fails with this contextual
    // message too, not an NPE ahead of it
    val maxIdRow = t(s, dir, "documents")
      .agg(max(col("doc_id").cast("long"))).head
    val maxId = if (maxIdRow.isNullAt(0)) -1L else maxIdRow.getLong(0)
    require(maxId >= 241,
      s"q76 oracle precondition violated: documents max doc_id " +
        s"${if (maxId < 0) "NULL (empty table)" else maxId.toString} < 241, " +
        "so probes 0-9 lack 3 exact mod-77 duplicates and IVF-vs-exhaustive " +
        "tie-ranking agreement no longer holds")
    val imgsDs = t(s, dir, "documents").select(col("doc_id").cast("long")).as[Long]
      .map { id =>
        val freq = (id % 7 + 1).toInt
        val phase = (id % 11).toInt
        (id, graft.multimodal.ImagePixels.encodeGrayPng(32, 32, (x, y) =>
          128 + (100 * math.sin((x + phase) * freq * 0.2) *
            math.cos(y * freq * 0.2)).toInt))
      }
    // oracle fixture: the expected pixel grid from the GENERATING FORMULA
    // directly — not from the engine's decoder (r14 verdict residue #3:
    // the decode-derived fixture was self-referential in one direction; a
    // decoder bug now surfaces as an embedding-vs-fixture hash mismatch
    // instead of silently moving the oracle). encodeGrayPng writes
    // f(x, y) & 0xff verbatim into the 8-bit gray plane and the formula's
    // range is [28, 228], so the formula value IS the stored pixel byte
    // the decoder must recover exactly (v/255f*255f rounds back to v).
    t(s, dir, "documents").select(col("doc_id").cast("long")).as[Long]
      .flatMap { id =>
        val freq = (id % 7 + 1).toInt
        val phase = (id % 11).toInt
        for {
          y <- 0 until 32
          x <- 0 until 32
        } yield (id, y, x,
          (128 + (100 * math.sin((x + phase) * freq * 0.2) *
            math.cos(y * freq * 0.2)).toInt).toLong)
      }.toDF("doc_id", "y", "x", "v")
      .write.mode("overwrite").parquet(
        EntryKit.fixtureDir(dir) + "/q76_pixels.parquet")
    val imgs = imgsDs.toDF("doc_id", "bytes")
    val emb = graft.multimodal.Multimodal.embedImages(imgs, "doc_id", "bytes", dim = 64)
      .select(col("doc_id").as("vec_id"), col("embedding"))
    Ann.ivfTopK(emb, emb.where(col("vec_id") < 10), "vec_id", "embedding",
      k = 3, nlist = 8, nprobe = 3)
  }

  /** Multimodal audio: REAL RIFF/WAVE round-trip. Each document synthesizes
    * a deterministic PCM-16 clip (LCG samples, length keyed to n_chars),
    * serializes it to actual WAVE bytes, and [[graft.multimodal.Multimodal
    * .analyzeAudio]] re-parses those bytes (chunk walk + sample decode) into
    * header metadata and integer-exact signal statistics. The oracle
    * restates the generating formula in SQL, so any writer/parser/stats bug
    * — header offsets, endianness, sign handling, chunk sizes — goes
    * hash-red. */
  private def q102_audio(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wav = t(s, dir, "documents")
      .select(col("doc_id"), least(greatest(col("n_chars"), lit(1L)), lit(1600L)).as("n"))
      .as[(Long, Long)]
      .mapPartitions(_.map { case (docId, n) =>
        val samples = new Array[Short](n.toInt)
        var i = 0
        while (i < samples.length) {
          samples(i) = (((docId * 7919L + i * 104729L) % 65536L) - 32768L).toShort
          i += 1
        }
        (docId, graft.multimodal.AudioWav.write(samples, sampleRate = 8000))
      })
      .toDF("doc_id", "bytes")
    // no side computation to join back: n_bytes rides inside the one
    // per-partition pass (a separate length() branch would re-synthesize
    // and join a document-proportional side)
    graft.multimodal.Multimodal.analyzeAudio(wav, "doc_id", "bytes")
  }

  /** Multimodal video: REAL ISO-BMFF round-trip. Each document synthesizes
    * a deterministic MP4 (mvhd duration keyed to n_chars, tkhd dims keyed
    * to doc_id, LCG mdat payload), and the query composes the two container
    * operators — [[graft.multimodal.Multimodal.describeVideo]] (box-walk
    * metadata) and [[graft.multimodal.Multimodal.sampleVideoFrames]]
    * (bounded frame explosion + proportional payload seek) — into per-clip
    * frame aggregates. The oracle restates the time grid and seek formula
    * in SQL. */
  private def q103_video(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val mp4 = t(s, dir, "documents")
      .select(col("doc_id"),
        (lit(500L) + col("n_chars") % 4000L).as("dur"),
        (lit(160) + (col("doc_id") % 16).cast("int") * 8).as("w"),
        (lit(120) + (col("doc_id") % 9).cast("int") * 8).as("h"),
        least(greatest(col("n_chars"), lit(1L)), lit(1200L)).as("m"))
      .as[(Long, Long, Int, Int, Long)]
      .mapPartitions(_.map { case (docId, dur, w, h, m) =>
        val payload = new Array[Byte](m.toInt)
        var j = 0
        while (j < payload.length) {
          payload(j) = ((docId * 31L + j * 17L) % 251L).toByte
          j += 1
        }
        (docId, graft.multimodal.VideoMp4.write(
          timescale = 1000L, duration = dur, width = w, height = h, payload))
      })
      .toDF("doc_id", "bytes")
    val meta = graft.multimodal.Multimodal.describeVideo(mp4, "doc_id", "bytes")
    val frames = graft.multimodal.Multimodal
      .sampleVideoFrames(mp4, "doc_id", "bytes", strideMs = 250L, maxFrames = 16)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_frames"),
        sum(col("payload_offset").cast("long")).as("sum_offsets"),
        sum(col("sample_value").cast("long")).as("sum_samples"))
    meta.join(frames, "doc_id")
  }

  /** M6: EXIF build→parse round trip at scale — deterministic camera
    * metadata synthesized per customer row, wrapped in a real JPEG/APP1
    * EXIF block (alternating byte orders), parsed back by the strict
    * TIFF walker. The oracle states the synthesis formulas; hash
    * equality proves the byte-level round trip. */
  private def q141_exif(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer").select(col("c_custkey")).as[Long].map { k =>
      val make = s"cam-${k % 10}"
      val dt = f"2024:01:${k % 28 + 1}%02d 12:00:00"
      val orient = (k % 8 + 1).toInt
      val lat = (k * 37 % 180000000L) - 90000000L
      val lon = (k * 91 % 360000000L) - 180000000L
      val d = graft.multimodal.Exif.parse(graft.multimodal.Exif.buildJpeg(
        make, dt, orient, lat, lon, littleEndian = k % 2 == 0))
      (k, d.make.orNull, d.dateTime.orNull,
        d.orientation.map(_.toLong).getOrElse(-1L),
        d.latE6.getOrElse(Long.MinValue), d.lonE6.getOrElse(Long.MinValue))
    }.toDF("c_custkey", "make", "dt", "orientation", "lat_e6", "lon_e6")
  }

  private[graft] val queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "q49_multimodal" -> (q49_multimodal _),
    "q69_image_meta" -> (q69_image_meta _),
    "q76_image_embed" -> (q76_image_embed _),
    "q102_audio" -> (q102_audio _),
    "q103_video" -> (q103_video _),
    "q141_exif" -> (q141_exif _))

  private[graft] val oracleSql: ListMap[String, String] = ListMap(
    "q49_multimodal" ->
      "SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes FROM documents",
    "q69_image_meta" ->
      """SELECT doc_id,
        |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image/png'
        |    WHEN 1 THEN 'image/jpeg' ELSE 'image/gif' END AS mime,
        |  CAST(doc_id % 64 + 1 AS INT) AS width,
        |  CAST((doc_id * 7) % 64 + 1 AS INT) AS height
        |FROM documents""".stripMargin,
    // the PNG decode is fixtured (the one step DuckDB cannot restate: the
    // query dumps the decoder's integer pixel grid — exact, gray decode is
    // v/255f and round(lum*255) recovers v bit-for-bit); everything
    // downstream of it — 4x4 box means, mean-centering, L2 norm, cosine
    // top-3 — is restated here. round(sim, 6) absorbs float64-vs-float32
    // noise: the true top-3 are EXACT mod-77 duplicates (sim 1.0 ties in
    // both engines) resolved by the shared (sim DESC, neighbor_id) order,
    // and the nearest non-duplicate sits far below 1 - 1e-6. The fixture
    // path interpolates this run's sf0.01 dir as the static default;
    // fixture dirs are per-run + per-dataset, and Verify rewrites the
    // emitted SQL to the actual (runId, sfDir) path it wrote.
    "q76_image_embed" ->
      s"""WITH px AS (
        |  SELECT doc_id, y, x, v
        |  FROM read_parquet('${EntryKit.fixtureDir("/root/testdata/sf0.01")}/q76_pixels.parquet/*.parquet')
        |), grid AS (
        |  SELECT doc_id, (y // 4) * 8 + (x // 4) AS cell, avg(v / 255.0) AS g
        |  FROM px GROUP BY 1, 2
        |), cent AS (
        |  SELECT doc_id, cell, g - avg(g) OVER (PARTITION BY doc_id) AS c
        |  FROM grid
        |), nrm AS (
        |  SELECT doc_id, cell, c / sqrt(sum(c * c) OVER (PARTITION BY doc_id)) AS e
        |  FROM cent
        |), sims AS (
        |  SELECT p.doc_id AS probe_id, n.doc_id AS neighbor_id,
        |    round(sum(p.e * n.e), 6) AS sim
        |  FROM nrm p JOIN nrm n ON p.cell = n.cell AND n.doc_id <> p.doc_id
        |  WHERE p.doc_id < 10
        |  GROUP BY 1, 2
        |), ranked AS (
        |  SELECT probe_id, neighbor_id, row_number() OVER (
        |    PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rank
        |  FROM sims
        |)
        |SELECT probe_id, neighbor_id, rank FROM ranked WHERE rank <= 3""".stripMargin,
    // q102: the engine synthesizes PCM-16 from this exact LCG, serializes
    // real WAVE bytes, and re-parses them; the oracle recomputes every
    // field from the formula — all-integer, so the hash check is strict
    "q102_audio" ->
      """WITH d AS (
        |  SELECT doc_id, LEAST(GREATEST(n_chars, 1), 1600) AS n FROM documents
        |), s AS (
        |  SELECT d.doc_id, g.i,
        |    ((d.doc_id * 7919 + g.i * 104729) % 65536) - 32768 AS x
        |  FROM d JOIN generate_series(0, 1599) g(i) ON g.i < d.n
        |), lagged AS (
        |  SELECT doc_id, i, x,
        |    lag(x) OVER (PARTITION BY doc_id ORDER BY i) AS lx
        |  FROM s
        |), agg AS (
        |  SELECT doc_id,
        |    CAST(SUM(ABS(x)) AS BIGINT) AS sum_abs,
        |    CAST(SUM(x * x) AS BIGINT) AS sum_sq,
        |    CAST(MAX(ABS(x)) AS INT) AS peak,
        |    CAST(SUM(CASE WHEN lx IS NOT NULL AND (x < 0) <> (lx < 0)
        |                  THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
        |  FROM lagged GROUP BY doc_id
        |)
        |SELECT d.doc_id,
        |  CAST(44 + 2 * d.n AS BIGINT) AS n_bytes,
        |  CAST(1 AS INT) AS channels,
        |  CAST(8000 AS INT) AS sample_rate,
        |  CAST(d.n AS BIGINT) AS n_frames,
        |  CAST((d.n * 1000) // 8000 AS BIGINT) AS duration_ms,
        |  agg.sum_abs, agg.sum_sq, agg.peak, agg.zero_crossings
        |FROM d JOIN agg ON agg.doc_id = d.doc_id""".stripMargin,
    // q103: same contract for the MP4 container — time grid at 250 ms
    // stride capped at 16 frames, proportional payload seek, LCG payload
    "q103_video" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    500 + (n_chars % 4000) AS dur,
        |    CAST(160 + (doc_id % 16) * 8 AS INT) AS width,
        |    CAST(120 + (doc_id % 9) * 8 AS INT) AS height,
        |    LEAST(GREATEST(n_chars, 1), 1200) AS m
        |  FROM documents
        |), f AS (
        |  SELECT d.doc_id, d.m, g.i,
        |    ((g.i * 250 * d.m) // d.dur) AS off
        |  FROM d JOIN generate_series(0, 15) g(i) ON g.i * 250 < d.dur
        |)
        |SELECT d.doc_id, 'isom' AS brand,
        |  CAST(d.dur AS BIGINT) AS duration_ms,
        |  d.width, d.height, CAST(d.m AS INT) AS mdat_bytes,
        |  CAST(COUNT(*) AS BIGINT) AS n_frames,
        |  CAST(SUM(f.off) AS BIGINT) AS sum_offsets,
        |  CAST(SUM((d.doc_id * 31 + f.off * 17) % 251) AS BIGINT) AS sum_samples
        |FROM d JOIN f ON f.doc_id = d.doc_id
        |GROUP BY d.doc_id, d.dur, d.width, d.height, d.m""".stripMargin,
    // q141: the synthesis formulas; matching hashes prove the EXIF
    // byte-level build→parse round trip was lossless
    "q141_exif" ->
      """SELECT c_custkey,
        |  'cam-' || CAST(c_custkey % 10 AS VARCHAR) AS make,
        |  '2024:01:' || lpad(CAST(c_custkey % 28 + 1 AS VARCHAR), 2, '0')
        |    || ' 12:00:00' AS dt,
        |  CAST(c_custkey % 8 + 1 AS BIGINT) AS orientation,
        |  CAST(c_custkey * 37 % 180000000 - 90000000 AS BIGINT) AS lat_e6,
        |  CAST(c_custkey * 91 % 360000000 - 180000000 AS BIGINT) AS lon_e6
        |FROM customer""".stripMargin
  )
}
