package graft.graph

import graft.SparkSpec

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  "transitiveClosure" should "close a chain" in {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("src", "dst")
    val closure = GraphOps.transitiveClosure(edges)
      .as[(String, String)].collect().toSet
    closure shouldBe Set(
      ("a", "b"), ("b", "c"), ("c", "d"),
      ("a", "c"), ("b", "d"), ("a", "d"))
  }

  it should "handle branching and converge on cycles" in {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val closure = GraphOps.transitiveClosure(edges).as[(Long, Long)].collect().toSet
    closure shouldBe (for (a <- 1L to 3L; b <- 1L to 3L) yield (a, b)).toSet
  }

  "connectedComponents" should "label chains, isolated nodes, multiple components" in {
    // component {1,2,3,4} (a path), component {10,11}, isolated 99
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("src", "dst")
    val verts = Seq(1L, 2L, 3L, 4L, 10L, 11L, 99L).toDF("id")
    val labels = GraphOps.connectedComponents(edges, Some(verts))
      .as[(Long, Long)].collect().toMap
    labels shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 99L -> 99L)
  }

  it should "converge on a long path within the iteration budget" in {
    val n = 200
    val edges = (0 until n).map(i => (i.toLong, i.toLong + 1)).toDF("src", "dst")
    val labels = GraphOps.connectedComponents(edges).as[(Long, Long)].collect()
    labels.length shouldBe n + 1
    all(labels.map(_._2)) shouldBe 0L
  }
}
