package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count sketches and pairwise set
  * overlap — the mergeable cardinality sketch (Bar-Yossef et al. 2002,
  * Beyer et al. 2007, the same family Apache DataSketches' theta sketch
  * builds on). Unlike HLL (q107), KMV supports SET OPERATIONS: keeping
  * the k smallest distinct hashes of a set lets you estimate |A|, |A∪B|
  * (merge sketches, re-cut at k) and hence |A∩B| by inclusion-exclusion
  * — the "how much do these corpora/cohorts overlap" question a
  * training-data audit asks per source pair without an exact
  * distinct-join over everything.
  *
  * DETERMINISTIC by construction: the hash is md5-derived (60-bit), the
  * sketch is the set of k smallest distinct hash values (no RNG, no
  * insertion-order dependence), and the estimator
  *
  *   n̂ = (k−1) · 2⁶⁰ / h_(k)      (exact size when the set has < k
  *                                  distinct values — the sketch IS the
  *                                  set then)
  *
  * is evaluated as floor of one IEEE double division of two exactly
  * representable integers — every engine computes the identical BIGINT,
  * so the whole sketch pipeline is oracle-checkable, estimates included.
  *
  * Scale shape: the sketch is a typed [[Aggregator]] with a bounded
  * k-element buffer — partial aggregation absorbs any group size
  * map-side, shuffle volume is O(groups·k), and pairwise overlap runs
  * on the TINY per-group sketch table (broadcast self-join), never on
  * the raw data. */
object KmvSketch {

  /** Exact k smallest DISTINCT longs per group: sorted-ascending bounded
    * buffer, duplicate-free — partial-merge friendly. */
  final class MinKDistinctLongs(k: Int)
      extends Aggregator[Long, List[Long], Seq[Long]] {
    override def zero: List[Long] = Nil
    override def reduce(buf: List[Long], v: Long): List[Long] =
      if (buf.length == k && buf.last <= v) buf
      else {
        val (lo, hi) = buf.span(_ < v)
        if (hi.headOption.contains(v)) buf
        else {
          val merged = lo ::: (v :: hi)
          if (merged.length > k) merged.take(k) else merged
        }
      }
    override def merge(a: List[Long], b: List[Long]): List[Long] =
      b.foldLeft(a)(reduce)
    override def finish(r: List[Long]): Seq[Long] = r
    override def bufferEncoder: Encoder[List[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Column form: k smallest distinct values of `h` per group. */
  def minK(k: Int, h: Column): Column = {
    udaf(new MinKDistinctLongs(k),
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Long]())
      .apply(h.cast("long"))
  }

  /** 60-bit md5 hash of an element — stated identically in SQL as
    * ('0x' || substr(md5(CAST(e AS VARCHAR)), 1, 15))::BIGINT. */
  def hash60(e: Column): Column =
    conv(substring(md5(e.cast("string")), 1, 15), 16, 10).cast("long")

  // 2^60 as an explicit DOUBLE: a `….0` literal would parse as DECIMAL
  // in both Spark SQL and DuckDB, silently changing the arithmetic
  private val M = "CAST(1152921504606846976 AS DOUBLE)"

  /** KMV estimate from a sketch array column (ascending, distinct):
    * exact size below k, (k−1)·2⁶⁰ div h_(k) at capacity. */
  private def estimate(sk: Column, k: Int): Column =
    when(size(sk) < k, size(sk).cast("long"))
      .otherwise(floor(lit(k - 1) * expr(M) / element_at(sk, k)).cast("long"))

  /** Per-group KMV sketches + distinct estimates: (g, sk, est_n). The
    * aggregation is insert-idempotent and merge-associative, so running
    * it on a STREAM makes the sketch table a native stateful aggregation
    * (update/complete mode) with O(groups × k) state — duplicates and
    * replays cannot skew it (same composition as the streaming HLL
    * registers, StreamingKmvSpec pins the batch convergence). */
  def sketches(df: DataFrame, groupCol: String, elem: Column, k: Int = 64): DataFrame = {
    require(k >= 2, "k must be at least 2")
    df.select(col(groupCol).as("g"), hash60(elem).as("h"))
      // null elements hash to null, which the primitive-Long aggregator
      // input would reject at runtime — a null is "no element", drop it
      .where(col("h").isNotNull)
      .groupBy(col("g")).agg(minK(k, col("h")).as("sk"))
      .withColumn("est_n", estimate(col("sk"), k))
  }

  /** Per-group distinct estimates and pairwise overlap estimates.
    * Output: (type_a, type_b, est_a, est_b, est_union, est_inter). */
  def overlap(df: DataFrame, groupCol: String, elem: Column, k: Int = 64): DataFrame = {
    require(k >= 2, "k must be at least 2")
    val sk = sketches(df, groupCol, elem, k)
    val a = sk.select(col("g").as("type_a"), col("sk").as("sk_a"), col("est_n").as("est_a"))
    val b = sk.select(col("g").as("type_b"), col("sk").as("sk_b"), col("est_n").as("est_b"))
    a.join(broadcast(b), col("type_a") < col("type_b"))
      .withColumn("sk_u",
        slice(array_sort(array_union(col("sk_a"), col("sk_b"))), 1, k))
      .withColumn("est_union", estimate(col("sk_u"), k))
      .select(
        col("type_a"), col("type_b"), col("est_a"), col("est_b"), col("est_union"),
        greatest(lit(0L), col("est_a") + col("est_b") - col("est_union")).as("est_inter"))
  }
}
