package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HyperLogLog register table — the industry-standard cardinality
  * sketch, here in its deterministic md5 form so the REGISTERS
  * themselves (not a float estimate) are the operator output:
  * `m = 2^b` buckets each holding the maximum `rho` (position of the
  * highest set bit, counted from the top of the 60−b suffix bits) seen
  * in that bucket. Registers merge by element-wise MAX — any
  * partitioning, any batch/stream cut, same table (spec-pinned), which
  * is what makes the sketch shippable from 1000 executors as `m` bytes
  * each.
  *
  * The repo's KMV sketch (A27) remains the house recommendation when
  * set EXPRESSIONS (union/intersection overlap) are needed; HLL is the
  * cheaper register-array shape everyone interoperates with. The float
  * harmonic-mean estimate is a driver-side postprocess
  * ([[estimateRegisters]], used by the spec's accuracy gate) — engine
  * output stays integer-exact.
  *
  * Scale shape: one narrow hash pass, one groupBy onto at most `m`
  * groups with map-side combine. Nothing else moves.
  */
object HllSketch {

  /** Observed registers: (bucket, max_rho), at most `2^b` rows.
    * Buckets never hit are absent (their register is 0). */
  def registers(df: DataFrame, keyCol: String, b: Int): DataFrame = {
    require(b >= 2 && b <= 16, "b out of range")
    val m = 1L << b
    val sufBits = 60 - b
    val h = conv(substring(md5(col(keyCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    val suffix = shiftright(h, b) // top 60-b bits (h >= 0; m = 2^b)
    // rho = leading zeros of the suffix within its 60-b bit window, +1;
    // bin() has no leading zeros, so rho falls out of the string length
    val rho = when(suffix === 0, lit(sufBits + 1))
      .otherwise(lit(sufBits + 1) - length(bin(suffix)))
    df.select(h.bitwiseAND(lit(m - 1)).as("bucket"),
        rho.cast("long").as("rho"))
      .groupBy("bucket")
      .agg(max(col("rho")).as("max_rho"))
  }

  /** Driver-side harmonic-mean estimate (Flajolet et al. 2007, with
    * the small-range linear-counting correction) from an observed
    * register list; absent buckets count as zero registers. */
  def estimateRegisters(regs: Seq[(Long, Long)], b: Int): Double = {
    val m = 1 << b
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1 + 1.079 / m)
    }
    val zeros = m - regs.length
    val sum = regs.map { case (_, r) => math.pow(2.0, -r.toDouble) }.sum +
      zeros.toDouble
    val raw = alpha * m * m / sum
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
    else raw
  }
}
