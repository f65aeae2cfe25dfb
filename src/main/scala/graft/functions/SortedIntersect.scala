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
