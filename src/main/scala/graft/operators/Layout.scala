package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton space-filling-curve) layout keys — the
  * data-layout operator behind multi-dimensional data skipping
  * (Delta `OPTIMIZE ZORDER BY`, Iceberg sort orders): rows close in
  * SEVERAL dimensions land in the same target bucket, so a range
  * predicate on ANY of the interleaved columns prunes most buckets
  * at scan time. At 100 TB this is how a fact table gets rewritten
  * so that both `part`-scoped and `supplier`-scoped scans skip
  * ~`1 - 2^-bits` of the files, where a single-column sort would
  * only serve one of the two.
  *
  * Everything is exact integer arithmetic: dimensions are quantized
  * to `bits`-bit cells over their observed [min, max] span
  * (`(v - min) * 2^bits div (span + 1)`), and the key interleaves
  * the cells' bits MSB-first with dimension 0 highest. The min/max
  * aggregate is a one-row broadcast; the fact table itself is never
  * shuffled — the whole operator is a narrow map inside whole-stage
  * codegen, and the final physical clustering is a plain
  * `repartitionByRange(zkey)` write.
  */
object Layout {

  /** Bit-interleave `bits`-bit quantized cells, dimension 0 taking the
    * most-significant position in each round. Pure column arithmetic
    * (stays inside whole-stage codegen). */
  def interleave(cells: Seq[Column], bits: Int): Column = {
    val d = cells.length
    val terms = for {
      i <- (bits - 1) to 0 by -1 // bit position within each dimension
      (c, j) <- cells.zipWithIndex
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)),
      i * d + (d - 1 - j))
    terms.reduce(_ + _)
  }

  /** JVM reference for the spec: interleave the low `bits` bits of
    * `cells` (dimension 0 most significant per round). */
  def interleaveRef(cells: Seq[Long], bits: Int): Long = {
    val d = cells.length
    var z = 0L
    for (i <- (bits - 1) to 0 by -1; j <- cells.indices)
      z |= ((cells(j) >> i) & 1L) << (i * d + (d - 1 - j))
    z
  }

  /** Append quantized cells `q0..q{n-1}`, the interleaved `zkey`, and a
    * target `bucket` (top `log2(buckets)` bits of the key) to `df`.
    *
    * @param dims    integral dimension columns to co-cluster
    * @param bits    cell resolution per dimension
    * @param buckets number of target buckets (power of two ≤ 2^(bits·dims))
    */
  def zOrder(df: DataFrame, dims: Seq[Column], bits: Int,
      buckets: Int): DataFrame = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      "buckets must be a power of two")
    val d = dims.length
    require(Integer.numberOfTrailingZeros(buckets) <= bits * d,
      s"buckets must be <= 2^(bits*dims) = 2^${bits * d}")
    val aggs = dims.zipWithIndex.flatMap { case (c, j) =>
      Seq(min(c).cast("long").as(s"_n$j"), max(c).cast("long").as(s"_x$j"))
    }
    val mm = df.agg(aggs.head, aggs.tail: _*)
    val withCells = dims.zipWithIndex.foldLeft(
      df.crossJoin(broadcast(mm))) { case (acc, (c, j)) =>
      acc
        .withColumn(s"_v$j", c.cast("long"))
        // the offset·2^bits product runs in decimal(38,0): in long
        // arithmetic it wraps once a dimension's span exceeds
        // 2^(63-bits) — e.g. microsecond timestamps at bits=16. The
        // quotient is < 2^bits, so the long cast back is always exact.
        .withColumn(s"q$j",
          expr(s"cast(((cast(_v$j as decimal(38,0)) - _n$j) * ${1L << bits})" +
            s" div (cast(_x$j as decimal(38,0)) - _n$j + 1) as long)"))
    }
    val shift = bits * d - Integer.numberOfTrailingZeros(buckets)
    withCells
      .withColumn("zkey",
        interleave((0 until d).map(j => col(s"q$j")), bits).cast("long"))
      .withColumn("bucket", shiftright(col("zkey"), shift).cast("long"))
      .drop((0 until d).flatMap(j => Seq(s"_v$j", s"_n$j", s"_x$j")): _*)
  }
}
