package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvmSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq(
    (1L, 10L), (1L, 20L), (2L, 5L)).toDF("k", "v")

  "applyDelta" should "equal recomputing over the changed row set" in {
    val snap = Ivm.snapshot(base, Seq("k"), Seq("v"))
    // insert (3, 7); insert (1, 30); delete (1, 10)
    val delta = Seq((3L, 1L, 7L), (1L, 1L, 30L), (1L, -1L, 10L))
      .toDF("k", "sign", "v")
    val got = Ivm.applyDelta(snap, delta, Seq("k"), Seq("v"), "sign")
      .as[(Long, Long, Long)].collect().toSet
    got shouldBe Set((1L, 2L, 50L), (2L, 1L, 5L), (3L, 1L, 7L))
  }

  it should "drop keys whose count reaches zero" in {
    val snap = Ivm.snapshot(base, Seq("k"), Seq("v"))
    val delta = Seq((2L, -1L, 5L)).toDF("k", "sign", "v")
    Ivm.applyDelta(snap, delta, Seq("k"), Seq("v"), "sign")
      .where($"k" === 2L).count() shouldBe 0
  }

  it should "keep a negative count visible instead of clamping" in {
    val snap = Ivm.snapshot(base, Seq("k"), Seq("v"))
    val delta = Seq((2L, -1L, 5L), (2L, -1L, 5L)).toDF("k", "sign", "v")
    val row = Ivm.applyDelta(snap, delta, Seq("k"), Seq("v"), "sign")
      .where($"k" === 2L).as[(Long, Long, Long)].collect()
    row.head._2 shouldBe -1L // poison, not silently dropped
  }

  it should "be idempotent-compatible: applying an empty delta is identity" in {
    val snap = Ivm.snapshot(base, Seq("k"), Seq("v"))
    val empty = Seq.empty[(Long, Long, Long)].toDF("k", "sign", "v")
    Ivm.applyDelta(snap, empty, Seq("k"), Seq("v"), "sign")
      .as[(Long, Long, Long)].collect().toSet shouldBe
      snap.as[(Long, Long, Long)].collect().toSet
  }

  it should "match a randomized recompute across many keys" in {
    val rnd = new scala.util.Random(3)
    val rows = (0 until 300).map(i => (rnd.nextInt(20).toLong, (i % 17).toLong))
    val (b, ins) = rows.splitAt(200)
    val del = b.filter(_._1 % 3 == 0).take(40)
    val snap = Ivm.snapshot(b.toDF("k", "v"), Seq("k"), Seq("v"))
    val delta = (ins.map { case (k, v) => (k, 1L, v) } ++
      del.map { case (k, v) => (k, -1L, v) }).toDF("k", "sign", "v")
    val got = Ivm.applyDelta(snap, delta, Seq("k"), Seq("v"), "sign")
      .as[(Long, Long, Long)].collect().toSet
    val finalRows = b.diff(del) ++ ins
    val want = finalRows.groupBy(_._1).map { case (k, g) =>
      (k, g.size.toLong, g.map(_._2).sum) }.toSet
    got shouldBe want
  }
}
