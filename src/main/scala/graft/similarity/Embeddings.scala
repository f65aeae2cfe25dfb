package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-matrix analytics: the Gram / second-moment matrix XᵀX in
  * integer micro-units, and a driver-side PCA on top of it. XᵀX is the
  * workhorse of embedding hygiene at corpus scale — dominant-direction
  * removal (all-but-the-top post-processing), anisotropy diagnosis,
  * whitening, PCA dims for IVF routing — and it reduces over ROWS, so
  * a 10¹¹×d corpus aggregates to a d×d table no matter the scale.
  *
  * Determinism discipline (the q146 centroid pattern, extended to
  * second moments): each component is quantized to
  * round(x·scale) — half away from zero, matching both Spark's round()
  * and the SQL oracle's — and all sums are over Longs, so ANY
  * partitioning and any engine reproduce identical cell values.
  *
  * Scale shape: one mapPartitions kernel accumulates the upper-triangle
  * outer product into a d(d+1)/2 Long array per partition (no row
  * explosion, no self-join — the naive "explode twice and join on row
  * id" plan shuffles d·n rows and materializes d²·n/2 pairs); the only
  * shuffle is the d(d+1)/2-cell partial-sum merge. Overflow headroom:
  * |q| ≤ scale·|x|; at scale 10³ and |x| ≤ 10², each product ≤ 10¹⁰ —
  * 9·10⁸ rows per cell before nearing Long range; lower `scale` for
  * bigger corpora. */
object Embeddings {

  /** Upper-triangle second-moment matrix: (i, j, s) with i ≤ j,
    * s = Σ_rows q_i·q_j, q = round(x·scale) as Long. */
  def gramMicro(df: DataFrame, vecCol: String, scale: Long = 1000L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(vecCol)).as[Array[Float]]
      .mapPartitions { it =>
        var acc: Array[Long] = null
        var d = 0
        it.foreach { v =>
          if (acc == null) { d = v.length; acc = new Array[Long](d * (d + 1) / 2) }
          require(v.length == d, s"ragged embedding: ${v.length} vs $d")
          val q = new Array[Long](d)
          var i = 0
          while (i < d) {
            val y = v(i).toDouble * scale
            // half away from zero — same rule as Spark round() / SQL round()
            q(i) = (if (y >= 0) math.floor(y + 0.5) else math.ceil(y - 0.5)).toLong
            i += 1
          }
          var idx = 0
          i = 0
          while (i < d) {
            var j = i
            while (j < d) { acc(idx) += q(i) * q(j); idx += 1; j += 1 }
            i += 1
          }
        }
        if (acc == null) Iterator.empty
        else {
          val out = new Array[(Int, Int, Long)](acc.length)
          var idx = 0
          var i = 0
          while (i < d) {
            var j = i
            while (j < d) { out(idx) = (i, j, acc(idx)); idx += 1; j += 1 }
            i += 1
          }
          out.iterator
        }
      }
      .toDF("i", "j", "s_part")
      .groupBy(col("i"), col("j"))
      .agg(sum(col("s_part")).as("s"))
  }

  /** The reference quantizer, exposed for differential specs: identical
    * to the kernel's per-element rule. */
  private[similarity] def quantize(x: Double, scale: Long): Long = {
    val y = x * scale
    (if (y >= 0) math.floor(y + 0.5) else math.ceil(y - 0.5)).toLong
  }

  /** Dominant direction of the corpus: power iteration on the collected
    * d×d Gram table (driver-side — the matrix is tiny; the DISTRIBUTED
    * work was building it). Deterministic: fixed start vector e₀+…ₙ/√d,
    * fixed iteration count, no randomness. Returns (eigenvector,
    * rayleigh quotient) in the quantized units. */
  def topEigenvector(gram: DataFrame, iterations: Int = 50): (Array[Double], Double) = {
    val cells = gram.select(col("i").cast("int"), col("j").cast("int"),
      col("s").cast("long")).collect()
    val d = cells.map(r => math.max(r.getInt(0), r.getInt(1))).max + 1
    val m = Array.ofDim[Double](d, d)
    cells.foreach { r =>
      val (i, j, s) = (r.getInt(0), r.getInt(1), r.getLong(2).toDouble)
      m(i)(j) = s; m(j)(i) = s
    }
    var v = Array.fill(d)(1.0 / math.sqrt(d))
    var lambda = 0.0
    for (_ <- 0 until iterations) {
      val w = new Array[Double](d)
      var i = 0
      while (i < d) {
        var s = 0.0; var j = 0
        while (j < d) { s += m(i)(j) * v(j); j += 1 }
        w(i) = s; i += 1
      }
      val n = math.sqrt(w.map(x => x * x).sum)
      if (n > 0) { var i2 = 0; while (i2 < d) { w(i2) /= n; i2 += 1 } }
      lambda = n
      v = w
    }
    (v, lambda)
  }
}
