package graft.graph

import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** JVM reference of the identical integer recurrence. */
  private def ref(edges: Seq[(Long, Long)], iters: Int,
      scale: Long = 1000000L, num: Long = 85, den: Long = 100): Map[Long, Long] = {
    val vs = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val base = (scale * (den - num)) / den
    var r = vs.map(_ -> scale).toMap
    for (_ <- 0 until iters) {
      val m = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / deg(s) }.sum).toMap
      r = vs.map(v => v -> (base + (num * m.getOrElse(v, 0L)) / den)).toMap
    }
    r
  }

  "fixedPoint" should "reproduce the integer recurrence on a cyclic graph" in {
    // triangle + a dangling sink + a source with two out-links
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L), (5L, 1L), (5L, 4L))
    val got = PageRank.fixedPoint(edges.toDF("src", "dst"), iterations = 4)
      .as[(Long, Long)].collect().toMap
    got shouldBe ref(edges, 4)
    // the cycle members accumulated rank; the pure source decayed to base
    got(5L) shouldBe 150000L
    got(1L) should be > got(5L)
  }

  it should "count parallel edges as repeated links" in {
    val single = Seq((1L, 2L), (1L, 3L))
    val parallel = Seq((1L, 2L), (1L, 2L), (1L, 3L)) // deg 3, 2/3 to node 2
    val g1 = PageRank.fixedPoint(single.toDF("src", "dst"), 1)
      .as[(Long, Long)].collect().toMap
    val g2 = PageRank.fixedPoint(parallel.toDF("src", "dst"), 1)
      .as[(Long, Long)].collect().toMap
    g1 shouldBe ref(single, 1)
    g2 shouldBe ref(parallel, 1)
    g2(2L) should be > g1(2L)
  }

  it should "return the uniform init at zero iterations" in {
    val got = PageRank.fixedPoint(Seq((1L, 2L)).toDF("src", "dst"), 0)
      .as[(Long, Long)].collect().toMap
    got shouldBe Map(1L -> 1000000L, 2L -> 1000000L)
  }
}
