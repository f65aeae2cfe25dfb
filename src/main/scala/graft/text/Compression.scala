package graft.text

import java.util.zip.Deflater
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Compression-ratio quality signal: DEFLATE the UTF-8 text and report
  * compressed/original sizes. A widely used corpus heuristic (Dolma,
  * RedPajama-v2 ship it as a quality annotation): boilerplate, template
  * spam and repeated n-grams compress far below natural prose, while
  * already-compressed/binary junk barely compresses at all — both tails
  * are cut cheaply before any model-based scoring.
  *
  * Determinism: DEFLATE output is fully determined by (input, level,
  * strategy) for a given zlib build — the JDK pins one — so results are
  * stable across runs and partitionings on one runtime, but NOT a
  * cross-engine contract: the driver query is rows-only by design
  * (there is no SQL restatement of zlib), and the spec pins behavior
  * with monotonicity properties (repetition compresses tighter than
  * prose, prose tighter than random bytes) rather than golden bytes.
  *
  * Scale shape: map-only, one Deflater per partition (reset per row —
  * allocation-free inner loop), linear in bytes.
  */
object Compression {

  /** Per-row kernel: compressed byte count of the UTF-8 encoding. */
  def deflatedSize(text: String, level: Int = Deflater.DEFAULT_COMPRESSION): Int = {
    val d = new Deflater(level)
    try deflatedSizeWith(d, text)
    finally d.end()
  }

  private def deflatedSizeWith(d: Deflater, text: String): Int = {
    val bytes = Option(text).getOrElse("").getBytes("UTF-8")
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  /** (id, n_bytes, n_deflated, ratio_ppm): ratio in integer ppm of the
    * original size (smaller = more compressible = more repetitive). */
  def profile(df: DataFrame, idCol: String, textCol: String,
      level: Int = Deflater.DEFAULT_COMPRESSION): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val d = new Deflater(level)
        it.map { case (id, text) =>
          val n = Option(text).getOrElse("").getBytes("UTF-8").length
          val c = deflatedSizeWith(d, text)
          val ppm = if (n == 0) 1000000L else 1000000L * c / n
          (id, n.toLong, c.toLong, ppm)
        }
        // Deflater.end() is skipped deliberately: the iterator is lazy and
        // rows outlive this frame; finalization reclaims the native state.
      }
      .toDF("id", "n_bytes", "n_deflated", "ratio_ppm")
  }
}
