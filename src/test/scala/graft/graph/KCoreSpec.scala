package graft.graph

import graft.SparkSpec

class KCoreSpec extends SparkSpec {

  import spark.implicits._

  behavior of "KCore.kCore"

  it should "peel a triangle-plus-pendant down to the triangle for k=2" in {
    // triangle 1-2-3, pendant 4 hanging off 1, chain 5-6
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L), (5L, 6L))
      .toDF("src", "dst")
    val out = KCore.kCore(e, 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.keySet shouldBe Set(1L, 2L, 3L)
    out.values.toSet shouldBe Set(2L) // every triangle vertex has degree 2
  }

  it should "cascade deletions (degree threshold alone is not a 2-core)" in {
    // path 1-2-3-4: every inner vertex has degree 2 initially, but
    // peeling the endpoints cascades until nothing is left
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    KCore.kCore(e, 2).count() shouldBe 0L
  }

  it should "respect maxRounds as a bounded partial peel" in {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    // one round removes only the original endpoints 1 and 4
    val afterOne = KCore.kCore(e, 2, maxRounds = 1).collect()
      .map(_.getLong(0)).toSet
    afterOne shouldBe Set(2L, 3L)
  }

  it should "treat edges as undirected and ignore direction/duplicates/loops" in {
    val e = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (1L, 3L), (3L, 3L))
      .toDF("src", "dst")
    val out = KCore.kCore(e, 2).collect().map(_.getLong(0)).toSet
    out shouldBe Set(1L, 2L, 3L)
  }

  it should "match a brute-force peeler on random graphs" in {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val edges = (0 until 300).map(_ =>
        (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter(p => p._1 != p._2)
      val got = KCore.kCore(edges.toDF("src", "dst"), 3).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // driver-side reference peel
      var adj = edges.flatMap(p => Seq(p, p.swap)).distinct
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      var changed = true
      while (changed) {
        val weak = adj.filter(_._2.size < 3).keySet
        changed = weak.nonEmpty
        adj = (adj -- weak).view
          .mapValues(_ -- weak).toMap.filter(_._2.nonEmpty)
      }
      got shouldBe adj.view.mapValues(_.size.toLong).toMap
    }
  }
}
