package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) interleaving for multi-dimensional file layout.
  *
  * Why: parquet prunes row groups with per-column min/max stats, but a
  * sort on ONE column destroys locality on every other. Interleaving the
  * bits of two dimensions into one key and range-partition-sorting on it
  * gives every file a tight bounding BOX in (x, y) — so a selective
  * predicate on either (or both) dimensions skips most files at the scan,
  * before a single row is read. This is the standard layout trick for
  * multi-tenant fact tables at 100 TB (Delta/Iceberg `ZORDER BY`); here
  * it is a plain deterministic expression plus a writer recipe, so it
  * works on vanilla parquet.
  *
  * The key is pure bit arithmetic (no hashing, no floats) and restates in
  * any SQL engine as `Σ_b ((x>>b)&1)<<2b | ((y>>b)&1)<<(2b+1)` — which is
  * exactly what the driver-facing query's oracle does.
  */
object ZOrder {

  /** Bits interleaved per dimension: two 21-bit dims → a 42-bit key. */
  val BitsPerDim = 21
  val DimMask: Long = (1L << BitsPerDim) - 1

  /** JVM kernel — also the codegen target of [[ZOrderKey]]. Inputs are
    * masked to 21 bits, so any non-negative long is safe. */
  def interleave(x: Long, y: Long): Long = {
    var a = x & DimMask
    var b = y & DimMask
    var out = 0L
    var i = 0
    while (i < BitsPerDim) {
      out |= ((a & 1L) << (2 * i)) | ((b & 1L) << (2 * i + 1))
      a >>= 1; b >>= 1
      i += 1
    }
    out
  }

  /** Morton key column over two non-negative integral columns. */
  def key(x: Column, y: Column): Column =
    call_function("zorder_key", x.cast("long"), y.cast("long"))

  /** Scale an integral column with a known [min, max] domain onto the
    * 21-bit bucket grid — integer-exact ((v-min)·mask div range), so the
    * layout is reproducible across writers and engines. */
  def scaled(c: Column, min: Long, max: Long): Column = {
    require(max > min, s"degenerate domain [$min, $max]")
    // (v-min) ≤ range and range·mask must fit a long: require range < 2^42
    // (subtractExact: a wide domain overflowed max - min into a NEGATIVE
    // width that passed the check and poisoned the divisor)
    val width =
      try Math.subtractExact(max, min)
      catch { case _: ArithmeticException => Long.MaxValue }
    require(width < (1L << 42), "domain too wide for exact scaling")
    // integral divide (`div`), NOT `/`: Spark's slash is true division to
    // double, whose rounding could mis-bucket at grid boundaries
    call_function("div",
      (c.cast("long") - lit(min)) * lit(DimMask), lit(width))
  }

  /** Write-side recipe: range-partition + sort by the Morton key so each
    * output file covers a compact (x, y) box. `numFiles` sizes the layout
    * (at scale: total bytes / target file size). The key column does not
    * survive into the output — readers prune on the ORIGINAL columns'
    * parquet stats. */
  def layout(df: DataFrame, x: Column, y: Column, numFiles: Int): DataFrame = {
    val keyed = df.withColumn("__zkey", key(x, y))
    keyed.repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
  }
}

/** `zorder_key(x, y)` → bigint Morton interleave, codegen'd. */
case class ZOrderKey(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "zorder_key"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"zorder_key needs (bigint, bigint), got $other")
    }
  override protected def nullSafeEval(x: Any, y: Any): Any =
    ZOrder.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ZOrder.interleave($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
