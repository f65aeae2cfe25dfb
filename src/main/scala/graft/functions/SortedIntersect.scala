package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Intersection size of two SORTED distinct long arrays as one native
  * merge scan, with a lower-bound early exit.
  *
  * The set-similarity verify stage ([[graft.operators.SetSimJoin]]) runs
  * this over millions of candidate pairs; Spark's generic
  * `array_intersect` builds a hash set per call and ignores sortedness.
  * The merge scan does one pass of 8-byte comparisons, and `minInter`
  * (the smallest intersection that can still clear the similarity
  * threshold for this pair) lets it abandon a pair as soon as
  * `matched + min(remaining_a, remaining_b) < minInter` — candidates
  * far below threshold exit after a few steps. The returned count is
  * EXACT for every pair at or above `minInter`; early-exited pairs
  * return their (strictly below-threshold) partial count, so a
  * `result >= minInter` filter is decision-identical to filtering on
  * the true intersection size.
  *
  * Preconditions (met by the dictionary-encoded token arrays): both
  * arrays ascending-sorted, elements distinct and non-null.
  */
case class SortedIntersectSize(a: Expression, b: Expression, minInter: Expression)
    extends TernaryExpression {

  override def first: Expression = a
  override def second: Expression = b
  override def third: Expression = minInter

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (a.dataType, b.dataType, minInter.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _), LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"sorted_intersect_size needs (array<bigint>, array<bigint>, bigint), got $other")
    }

  override protected def nullSafeEval(x: Any, y: Any, m: Any): Any =
    SortedIntersectSize.compute(x.asInstanceOf[ArrayData],
      y.asInstanceOf[ArrayData], m.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y, m) =>
      s"graft.functions.SortedIntersectSize.compute($x, $y, $m)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(a = newFirst, b = newSecond, minInter = newThird)
}

/** TRUE when two SORTED distinct long arrays share NO common element
  * strictly below `v` — one allocation-free merge scan that stops as
  * soon as either array reaches `v`.
  *
  * The exactly-once candidate emission of [[graft.operators.SetSimJoin]]
  * keeps a prefix-join mention only when the matched token is the pair's
  * MINIMUM common prefix token; that is exactly "no common element below
  * the matched tid". The generic `array_min(array_intersect(a, b))`
  * formulation builds a hash set + result array PER MENTION (millions of
  * allocations concentrated on the hot-token tasks — measured as a 2.3 s
  * straggler stage on the sf0.1 q133 corpus); this scan does O(elements
  * below v) 8-byte comparisons and allocates nothing.
  *
  * Preconditions as [[SortedIntersectSize]]: ascending, distinct,
  * non-null elements. */
case class SortedNoCommonBelow(a: Expression, b: Expression, v: Expression)
    extends TernaryExpression {

  override def first: Expression = a
  override def second: Expression = b
  override def third: Expression = v

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def checkInputDataTypes(): TypeCheckResult =
    (a.dataType, b.dataType, v.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _), LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"sorted_no_common_below needs (array<bigint>, array<bigint>, bigint), got $other")
    }

  override protected def nullSafeEval(x: Any, y: Any, m: Any): Any =
    SortedNoCommonBelow.compute(x.asInstanceOf[ArrayData],
      y.asInstanceOf[ArrayData], m.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y, m) =>
      s"graft.functions.SortedNoCommonBelow.compute($x, $y, $m)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(a = newFirst, b = newSecond, v = newThird)
}

object SortedNoCommonBelow {
  def compute(a: ArrayData, b: ArrayData, v: Long): Boolean = {
    val na = a.numElements()
    val nb = b.numElements()
    var ia = 0
    var ib = 0
    while (ia < na && ib < nb) {
      val va = a.getLong(ia)
      val vb = b.getLong(ib)
      if (va >= v || vb >= v) return true
      if (va == vb) return false
      else if (va < vb) ia += 1
      else ib += 1
    }
    true
  }
}

object SortedIntersectSize {
  def compute(a: ArrayData, b: ArrayData, minInter: Long): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var ia = 0
    var ib = 0
    var matched = 0L
    while (ia < na && ib < nb) {
      // bail once even matching every remaining element cannot reach the
      // bound — below-threshold candidates exit in O(gap) steps
      if (matched + math.min(na - ia, nb - ib) < minInter) return matched
      val va = a.getLong(ia)
      val vb = b.getLong(ib)
      if (va == vb) { matched += 1; ia += 1; ib += 1 }
      else if (va < vb) ia += 1
      else ib += 1
    }
    matched
  }
}
