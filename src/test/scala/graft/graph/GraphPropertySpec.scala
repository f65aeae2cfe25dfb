package graft.graph

import graft.SparkSpec

/** Algebraic invariants of the iterative graph operators. */
class GraphPropertySpec extends SparkSpec {
  import spark.implicits._

  private val edges = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (5L, 5L))
    .toDF("src", "dst")

  "transitiveClosure" should "be idempotent (closing a closure adds nothing)" in {
    val once = GraphOps.transitiveClosure(edges)
    val twice = GraphOps.transitiveClosure(once)
    twice.as[(Long, Long)].collect().toSet shouldBe
      once.as[(Long, Long)].collect().toSet
  }

  it should "contain the original edges" in {
    val closure = GraphOps.transitiveClosure(edges).as[(Long, Long)].collect().toSet
    edges.as[(Long, Long)].collect().toSet.subsetOf(closure) shouldBe true
  }

  "connectedComponents" should "be invariant under edge direction" in {
    val flipped = edges.select($"dst".as("src"), $"src".as("dst"))
    val a = GraphOps.connectedComponents(edges).as[(Long, Long)].collect().toMap
    val b = GraphOps.connectedComponents(flipped).as[(Long, Long)].collect().toMap
    a shouldBe b
  }

  it should "assign every vertex the component of its minimum reachable id" in {
    val labels = GraphOps.connectedComponents(edges).as[(Long, Long)].collect().toMap
    labels(4L) shouldBe 1L
    labels(12L) shouldBe 10L
    labels(5L) shouldBe 5L // self-loop vertex is its own component
  }

  it should "agree between the driver and distributed paths on this graph" in {
    val driver = GraphOps.connectedComponents(edges).as[(Long, Long)].collect().toMap
    val dist = GraphOps.connectedComponents(edges, smallGraphThreshold = 0)
      .as[(Long, Long)].collect().toMap
    driver shouldBe dist
  }

  "the closure circuit breaker" should "fail fast on both driver and distributed paths" in {
    // K_20 directed both ways: closure is ~400 pairs, budget is 50
    val dense = (for (a <- 1L to 20L; b <- 1L to 20L if a != b) yield (a, b))
      .toDF("src", "dst")
    a[GraphOps.ClosureBudgetExceeded] should be thrownBy
      GraphOps.transitiveClosure(dense, maxPairs = 50)
    a[GraphOps.ClosureBudgetExceeded] should be thrownBy
      GraphOps.transitiveClosure(dense, smallGraphThreshold = 0, maxPairs = 50)
    // a comfortable budget passes on both paths with identical results
    val ok = GraphOps.transitiveClosure(dense, maxPairs = 1000)
      .as[(Long, Long)].collect().toSet
    val okDist = GraphOps.transitiveClosure(dense, smallGraphThreshold = 0, maxPairs = 1000)
      .as[(Long, Long)].collect().toSet
    okDist shouldBe ok
  }

  "the driver fast-path gate" should "be bytes-aware, not just row-count-aware" in {
    // few rows but very wide ids: a tiny maxDriverBytes must force the
    // distributed path; results agree with the driver path either way
    val wide = Seq.tabulate(8)(i =>
      ("node-" + ("x" * 200) + i, "node-" + ("x" * 200) + (i + 1)))
      .toDF("src", "dst")
    val viaDriver = GraphOps.connectedComponents(wide)
      .as[(String, String)].collect().toMap
    val viaDistributed = GraphOps.connectedComponents(wide, maxDriverBytes = 64)
      .as[(String, String)].collect().toMap
    viaDistributed shouldBe viaDriver
  }
}
