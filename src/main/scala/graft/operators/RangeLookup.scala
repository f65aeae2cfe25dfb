package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Broadcast range-lookup join — point-in-interval against a
  * DIMENSION-sized table of disjoint ranges (CIDR→geo, id blocks→
  * tenant, time windows→release): the shuffle-free physical alternative
  * to [[IntervalJoin]]'s binned exchange (q09) and [[AsOfJoin]]'s union
  * window (q120). Those shuffle the fact side on the bin/time key; here
  * the sorted range bounds ship to every task as two Long arrays and
  * each probe row binary-searches them in a codegen'd expression —
  * O(log r) per row, ZERO exchanges on the 100 TB side. The matched
  * range's payload columns attach through a broadcast hash join on the
  * matched index (map-side, no shuffle).
  *
  * Preconditions enforced at build: ranges sorted by `lo` are pairwise
  * disjoint (overlap would make "the" match ambiguous) and the range
  * count is byte-gated (arrays must fit comfortably in a task
  * broadcast). */
object RangeLookup {

  /** Index of the range containing `key` in sorted disjoint bounds, or
    * -1. Greatest lo ≤ key, then an upper-bound check. */
  def search(key: Long, los: Array[Long], his: Array[Long]): Int = {
    var a = 0
    var b = los.length - 1
    var found = -1
    while (a <= b) {
      val mid = (a + b) >>> 1
      if (los(mid) <= key) { found = mid; a = mid + 1 }
      else b = mid - 1
    }
    if (found >= 0 && key <= his(found)) found else -1
  }

  /** `probe` keeps every row ("left" semantics); rows whose `keyCol`
    * falls inside a range gain that range's columns, others get nulls.
    * `ranges` must carry `loCol`/`hiCol` (castable to long) plus any
    * payload columns; at most `maxRanges` rows. */
  def lookupJoin(probe: DataFrame, keyCol: String, ranges: DataFrame,
      loCol: String, hiCol: String, maxRanges: Int = 4000000): DataFrame = {
    val spark = probe.sparkSession
    val casted = ranges
      .withColumn(loCol, col(loCol).cast("long"))
      .withColumn(hiCol, col(hiCol).cast("long"))
    val sorted = casted.orderBy(col(loCol)).collect()
    require(sorted.length <= maxRanges,
      s"range side has ${sorted.length} rows — beyond the broadcast gate " +
        s"($maxRanges); use IntervalJoin/AsOfJoin for large range sides")
    val loIdx = casted.columns.indexOf(loCol)
    val hiIdx = casted.columns.indexOf(hiCol)
    val los = sorted.map(_.getLong(loIdx))
    val his = sorted.map(_.getLong(hiIdx))
    var i = 0
    while (i < sorted.length) {
      require(his(i) >= los(i), s"range $i has hi < lo")
      require(i == 0 || los(i) > his(i - 1),
        s"ranges overlap or duplicate at index $i — lookup would be ambiguous")
      i += 1
    }
    val dim = spark.createDataFrame(
      spark.sparkContext.parallelize(
        sorted.zipWithIndex.map { case (r, ix) =>
          org.apache.spark.sql.Row.fromSeq(ix +: r.toSeq) }.toSeq, 1),
      org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField("__range_idx", IntegerType,
          nullable = false) +: casted.schema.fields.toSeq))
    val idxCol = GraftColumnBridge.column(RangeIndexOf(
      GraftColumnBridge.expression(col(keyCol).cast("long")), los, his))
    probe.withColumn("__range_idx", idxCol)
      .join(broadcast(dim), Seq("__range_idx"), "left")
      .drop("__range_idx")
  }
}

/** Codegen'd binary search over broadcast-referenced bound arrays:
  * the matched range index, null when no range contains the key. */
case class RangeIndexOf(child: Expression, los: Array[Long], his: Array[Long])
    extends UnaryExpression {
  require(los.length == his.length, "bound arrays disagree")
  override def prettyName: String = "range_index_of"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"range_index_of needs bigint, got $other")
  }
  override protected def nullSafeEval(input: Any): Any = {
    val i = RangeLookup.search(input.asInstanceOf[Long], los, his)
    if (i < 0) null else i
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val losRef = ctx.addReferenceObj("rangeLos", los, "long[]")
    val hisRef = ctx.addReferenceObj("rangeHis", his, "long[]")
    val idx = ctx.freshName("rangeIdx")
    nullSafeCodeGen(ctx, ev, c => s"""
      int $idx = graft.operators.RangeLookup.search($c, $losRef, $hisRef);
      if ($idx < 0) { ${ev.isNull} = true; }
      else { ${ev.value} = $idx; }
    """)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
