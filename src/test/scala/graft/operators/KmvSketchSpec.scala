package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmvSketchSpec extends SparkSpec {

  behavior of "KmvSketch"

  it should "keep the k smallest distinct longs regardless of order and duplicates" in {
    val agg = new KmvSketch.MinKDistinctLongs(3)
    val buf = Seq(9L, 2L, 7L, 2L, 1L, 8L, 1L).foldLeft(agg.zero)(agg.reduce)
    agg.finish(buf) shouldBe Seq(1L, 2L, 7L)
    // merge path must agree with sequential reduction
    val left = Seq(9L, 2L).foldLeft(agg.zero)(agg.reduce)
    val right = Seq(7L, 1L, 8L, 1L, 2L).foldLeft(agg.zero)(agg.reduce)
    agg.finish(agg.merge(left, right)) shouldBe Seq(1L, 2L, 7L)
  }

  it should "report exact sizes below capacity and sane estimates at capacity" in {
    val s = spark
    import s.implicits._
    // groups "big": 1000 distinct elements, "small": 5 distinct
    val rows = (1L to 1000L).map(i => ("big", i)) ++ (1L to 5L).map(i => ("small", i))
    val df = rows.toDF("g", "elem")
    val out = KmvSketch.overlap(df, "g", col("elem"), k = 64)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    out should have length 1
    val (a, b, estA, estB, estU, estI) = out.head
    (a, b) shouldBe ("big", "small")
    estB shouldBe 5L // below capacity: exact
    estA.toDouble shouldBe 1000.0 +- 300.0 // KMV k=64 → ~12% rse
    // small ⊂ big: union ≈ big, intersection ≈ small
    estU.toDouble shouldBe estA.toDouble +- estA * 0.15
    estI should be >= 0L
  }

  it should "estimate disjoint sets with near-zero intersection" in {
    val s = spark
    import s.implicits._
    val rows = (1L to 500L).map(i => ("a", i)) ++ (10001L to 10500L).map(i => ("b", i))
    val out = KmvSketch.overlap(rows.toDF("g", "elem"), "g", col("elem"), k = 64)
      .collect().head
    val (estA, estB, estI) = (out.getLong(2), out.getLong(3), out.getLong(5))
    estI.toDouble should be < (estA + estB) * 0.15
  }
}
