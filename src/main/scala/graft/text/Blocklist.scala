package graft.text

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring matching (Aho–Corasick 1975) for blocklist
  * curation — the "does this document mention any of these N thousand
  * terms" gate every production corpus pipeline runs (profanity/NSFW
  * lists, PII trigger terms, licensing markers).
  *
  * Why an automaton: N separate `contains` passes cost O(N·len) per
  * document; the automaton costs O(len + hits) regardless of list size,
  * which is the difference between feasible and not at a 10k-term list
  * over 100 TB. The automaton builds ONCE at plan time (the pattern list
  * arrives as a foldable array literal through the registry builder) and
  * rides into generated code as a reference object — per-row work is the
  * bare goto/fail walk.
  *
  * Matching is exact-substring and case-sensitive; callers lowercase both
  * sides for case-folded semantics. Matched patterns report in PATTERN
  * ORDER (stable, engine-restatable: the oracle is a `list_filter` over
  * the same list).
  */
object Blocklist {

  /** Immutable goto/fail automaton. Nodes are dense ints; transitions are
    * per-node hash maps (pattern alphabets are tiny relative to text). */
  final class Automaton private[Blocklist] (
      val patterns: Array[String],
      children: Array[mutable.LongMap[Int]], // char -> node
      fail: Array[Int],
      out: Array[Array[Int]]) extends Serializable {

    private def step(state: Int, c: Char): Int = {
      var s = state
      while (s != 0 && !children(s).contains(c.toLong)) s = fail(s)
      children(s).getOrElse(c.toLong, 0)
    }

    /** Distinct matched pattern ids, ascending (= pattern order). */
    def matchedIds(text: String): Array[Int] = {
      if (patterns.isEmpty) return Array.emptyIntArray
      val seen = new java.util.BitSet(patterns.length)
      var s = 0
      var i = 0
      while (i < text.length) {
        s = step(s, text.charAt(i))
        val o = out(s)
        var j = 0
        while (j < o.length) { seen.set(o(j)); j += 1 }
        i += 1
      }
      val ids = new Array[Int](seen.cardinality())
      var k = 0
      var b = seen.nextSetBit(0)
      while (b >= 0) { ids(k) = b; k += 1; b = seen.nextSetBit(b + 1) }
      ids
    }

    def containsAny(text: String): Boolean = {
      var s = 0
      var i = 0
      while (i < text.length) {
        s = step(s, text.charAt(i))
        if (out(s).nonEmpty) return true
        i += 1
      }
      false
    }
  }

  /** Build the automaton: trie insert + BFS fail links with output-set
    * merging (the textbook construction). */
  def build(patterns: Seq[String]): Automaton = {
    val pats = patterns.toArray
    val children = mutable.ArrayBuffer(mutable.LongMap.empty[Int])
    val outSets = mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Int])
    pats.zipWithIndex.foreach { case (p, id) =>
      require(p.nonEmpty, "empty blocklist pattern")
      var s = 0
      p.foreach { c =>
        s = children(s).getOrElse(c.toLong, {
          children += mutable.LongMap.empty[Int]
          outSets += mutable.ArrayBuffer.empty[Int]
          children(s)(c.toLong) = children.size - 1
          children.size - 1
        })
      }
      outSets(s) += id
    }
    val n = children.size
    val fail = new Array[Int](n)
    val queue = mutable.Queue.empty[Int]
    children(0).foreachValue(queue.enqueue(_))
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      children(u).foreach { case (c, v) =>
        var f = fail(u)
        while (f != 0 && !children(f).contains(c)) f = fail(f)
        fail(v) = if (children(f).contains(c) && children(f)(c) != v) children(f)(c) else 0
        outSets(v) ++= outSets(fail(v))
        queue.enqueue(v)
      }
    }
    new Automaton(pats, children.toArray, fail, outSets.map(_.toArray.sorted).toArray)
  }
}

/** `blocklist_any(text)` → boolean over a plan-time-built automaton. */
case class BlocklistAny(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  @transient private lazy val auto = Blocklist.build(patterns)
  override def prettyName: String = "blocklist_any"
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"blocklist_any needs string, got $other")
    }
  override protected def nullSafeEval(input: Any): Any =
    auto.containsAny(input.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("blocklistAuto", auto,
      classOf[Blocklist.Automaton].getName)
    defineCodeGen(ctx, ev, c => s"$ref.containsAny($c.toString())")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `blocklist_hits(text)` → array<string> of matched patterns in pattern
  * order (distinct). */
case class BlocklistHits(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  @transient private lazy val auto = Blocklist.build(patterns)
  override def prettyName: String = "blocklist_hits"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"blocklist_hits needs string, got $other")
    }
  def hits(text: UTF8String): ArrayData = {
    val ids = auto.matchedIds(text.toString)
    val arr = new Array[Any](ids.length)
    var i = 0
    while (i < ids.length) {
      arr(i) = UTF8String.fromString(auto.patterns(ids(i)))
      i += 1
    }
    new GenericArrayData(arr)
  }
  override protected def nullSafeEval(input: Any): Any =
    hits(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("blocklistHits", this, classOf[BlocklistHits].getName)
    defineCodeGen(ctx, ev, c => s"$self.hits($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
