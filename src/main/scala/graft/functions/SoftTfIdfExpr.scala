package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/** `soft_tfidf(toks1, ws1, toks2, ws2, simThreshold, pruneBelow)` →
  * double: IDF-weighted soft-TF-IDF with optimal token alignment
  * (reference `thymeflow/.../EntityResolution.scala:54-116`) as a native
  * Catalyst expression. A Scala UDF here converts four arrays per row
  * through CatalystTypeConverters (boxing every double, wrapping every
  * array) — at ~10⁵–10⁶ candidate pairs per resolution query that
  * conversion dominated the scoring stage. This expression reads
  * `ArrayData` directly: weights via `toDoubleArray` (primitive copy),
  * tokens as strings, then the unboxed [[Similarity.softTfIdfArrays]]
  * kernel.
  *
  * Declared NON-deterministic on purpose (the function is pure): it
  * pins the scoring above the resolver's explicit round-robin exchange.
  * Left deterministic, Catalyst pushes the `score >= threshold` filter
  * into the candidate join, which AQE coalesces to a handful of tasks —
  * serializing the one CPU-bound stage of the pipeline. See
  * [[graft.enrich.AgentMatch.sameAsPairs]].
  */
case class SoftTfIdfScore(
    toks1: Expression, ws1: Expression,
    toks2: Expression, ws2: Expression,
    simThreshold: Double, pruneBelow: Double)
    extends QuaternaryExpression {

  override def first: Expression = toks1
  override def second: Expression = ws1
  override def third: Expression = toks2
  override def fourth: Expression = ws2

  override def dataType: DataType = DoubleType
  override lazy val deterministic: Boolean = false
  override def nullable: Boolean =
    toks1.nullable || ws1.nullable || toks2.nullable || ws2.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(toks1, toks2).forall(_.dataType match {
      case ArrayType(StringType, _) => true; case _ => false
    }) && Seq(ws1, ws2).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true; case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "soft_tfidf needs (array<string>, array<double>, array<string>, array<double>)")
  }

  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    SoftTfIdfScore.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      c.asInstanceOf[ArrayData], d.asInstanceOf[ArrayData], simThreshold, pruneBelow)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t1, w1, t2, w2) =>
      s"graft.functions.SoftTfIdfScore.compute($t1, $w1, $t2, $w2, ${simThreshold}D, ${pruneBelow}D)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(toks1 = newFirst, ws1 = newSecond, toks2 = newThird, ws2 = newFourth)
}

object SoftTfIdfScore {
  /** Row kernel: ArrayData → primitive arrays → unboxed scorer. */
  def compute(t1: ArrayData, w1: ArrayData, t2: ArrayData, w2: ArrayData,
      simThreshold: Double, pruneBelow: Double): Double = {
    // the array type admits null elements (containsNull is data-shaped):
    // a null token/weight pair is SKIPPED rather than NPE-ing the task
    def pairs(t: ArrayData, w: ArrayData): (Array[String], Array[Double]) = {
      val n = math.min(t.numElements(), w.numElements())
      val ss = Array.newBuilder[String]
      val ws = Array.newBuilder[Double]
      var i = 0
      while (i < n) {
        if (!t.isNullAt(i) && !w.isNullAt(i)) {
          ss += t.getUTF8String(i).toString
          ws += w.getDouble(i)
        }
        i += 1
      }
      (ss.result(), ws.result())
    }
    val (s1, d1) = pairs(t1, w1)
    val (s2, d2) = pairs(t2, w2)
    Similarity.softTfIdfArrays(s1, d1, s2, d2, simThreshold, pruneBelow)
  }
}
