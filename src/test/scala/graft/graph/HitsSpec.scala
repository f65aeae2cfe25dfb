package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HitsSpec extends SparkSpec {

  import spark.implicits._

  behavior of "Hits.fixedPoint"

  it should "match a hand-unrolled iteration on a tiny graph" in {
    // 1→3, 2→3, 2→4: vertex 3 is the authority, 2 the best hub
    val e = Seq((1L, 3L), (2L, 3L), (2L, 4L)).toDF("src", "dst")
    val out = Hits.fixedPoint(e, 1).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // a_raw: 3 → 2e6, 4 → 1e6; max 2e6 → a(3)=1e6, a(4)=500000
    out(3L)._1 shouldBe 1000000L
    out(4L)._1 shouldBe 500000L
    // h_raw: 1 → a(3)=1e6, 2 → a(3)+a(4)=1.5e6; max → h(2)=1e6, h(1)=666666
    out(2L)._2 shouldBe 1000000L
    out(1L)._2 shouldBe 666666L
    // pure sources have auth 0; pure sinks have hub 0
    out(1L)._1 shouldBe 0L
    out(3L)._2 shouldBe 0L
  }

  it should "be bit-identical under any partitioning" in {
    val rnd = new scala.util.Random(5)
    val e = (0 until 4000).map(_ =>
      (rnd.nextInt(200).toLong, (200 + rnd.nextInt(100)).toLong))
      .toDF("src", "dst")
    val a = Hits.fixedPoint(e.repartition(1), 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val b = Hits.fixedPoint(e.repartition(13), 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    b shouldBe a
  }

  it should "rank the most-linked authority first on a star" in {
    // hub 0 points to 1..10; 11..13 also point to 1 — vertex 1 wins auth
    val e = ((1L to 10L).map((0L, _)) ++ Seq((11L, 1L), (12L, 1L), (13L, 1L)))
      .toDF("src", "dst")
    val out = Hits.fixedPoint(e, 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out(1L) shouldBe 1000000L // normalized max
    all((2L to 10L).map(out)) should be < out(1L)
  }

  it should "normalize without overflow when degree*scale*scale passes 2^63" in {
    // 20 hubs → 1 sink at scale=1e9: the raw auth sum is 2e10, and the
    // pre-fix long product raw*scale = 2e19 wraps past Long.MaxValue.
    // The decimal path must still score the sink at exactly `scale`.
    val e = (1L to 20L).map((_, 100L)).toDF("src", "dst")
    val out = Hits.fixedPoint(e, 1, scale = 1000000000L).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    out(100L)._1 shouldBe 1000000000L
    (1L to 20L).foreach { h => out(h)._2 shouldBe 1000000000L }
    all(out.values.map(_._1)) should be >= 0L
  }

  it should "keep every vertex in the output" in {
    val e = Seq((1L, 2L), (3L, 4L)).toDF("src", "dst")
    Hits.fixedPoint(e, 2).count() shouldBe 4L
  }
}
