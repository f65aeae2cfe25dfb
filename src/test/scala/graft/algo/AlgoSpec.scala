package graft.algo

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class AlgoSpec extends AnyFlatSpec with Matchers {

  "Dijkstra" should "find shortest paths and respect stop conditions" in {
    val adj = Map(
      "a" -> Seq(("b", 1.0), ("c", 4.0)),
      "b" -> Seq(("c", 2.0), ("d", 6.0)),
      "c" -> Seq(("d", 3.0)),
      "d" -> Seq.empty[(String, Double)])
    val (dist, _) = Dijkstra.run("a", adj)
    dist("d") shouldBe 6.0
    Dijkstra.path("a", "d", adj) shouldBe List("a", "b", "c", "d")
    Dijkstra.path("d", "a", adj) shouldBe Nil
  }

  "Hungarian" should "find the optimal assignment" in {
    val cost = Array(
      Array(4.0, 1.0, 3.0),
      Array(2.0, 0.0, 5.0),
      Array(3.0, 2.0, 2.0))
    val (assign, total) = Hungarian.solve(cost)
    total shouldBe 5.0 // 1 + 2 + 2
    assign.toSeq shouldBe Seq(1, 0, 2)
  }

  it should "handle rectangular (rows < cols) matrices" in {
    val cost = Array(Array(5.0, 1.0, 9.0))
    val (assign, total) = Hungarian.solve(cost)
    assign.toSeq shouldBe Seq(1)
    total shouldBe 1.0
  }

  it should "maximize similarity via the wrapper" in {
    val sim = Array(Array(0.9, 0.1), Array(0.2, 0.8))
    val (assign, total) = Hungarian.maxSimilarityAssignment(sim)
    assign.toSeq shouldBe Seq(0, 1)
    total shouldBe 1.7 +- 1e-12
  }

  "MinCostFlow" should "push max flow at min cost" in {
    // two disjoint s->t paths: cap 1 cost 1, cap 1 cost 3
    val g = new MinCostFlow.Graph(4)
    g.addEdge(0, 1, 1, 1); g.addEdge(1, 3, 1, 0)
    g.addEdge(0, 2, 1, 3); g.addEdge(2, 3, 1, 0)
    val (flow, cost) = MinCostFlow.solve(g, 0, 3)
    flow shouldBe 2.0
    cost shouldBe 4.0
  }

  it should "prefer the cheap path when flow is capped" in {
    val g = new MinCostFlow.Graph(4)
    g.addEdge(0, 1, 1, 1); g.addEdge(1, 3, 1, 0)
    g.addEdge(0, 2, 1, 3); g.addEdge(2, 3, 1, 0)
    val (flow, cost) = MinCostFlow.solve(g, 0, 3, maxFlow = 1)
    flow shouldBe 1.0
    cost shouldBe 1.0
  }

  "Viterbi" should "decode the best path through a trellis" in {
    // two steps, states {0,1}; emissions favor 0 then 1; transition 0->1 free
    val states = IndexedSeq(IndexedSeq(0, 1), IndexedSeq(0, 1))
    val (path, score) = Viterbi.decode[Int](states,
      emitScore = (t, s) => if ((t == 0 && s == 0) || (t == 1 && s == 1)) 1.0 else 0.0,
      transScore = (_, _, _) => 0.0)
    path shouldBe IndexedSeq(0, 1)
    score shouldBe 2.0
  }

  it should "respect forbidden transitions" in {
    val states = IndexedSeq(IndexedSeq(0, 1), IndexedSeq(0, 1))
    val (path, _) = Viterbi.decode[Int](states,
      emitScore = (t, s) => if ((t == 0 && s == 0) || (t == 1 && s == 1)) 1.0 else 0.0,
      transScore = (_, from, to) =>
        if (from == 0 && to == 1) Double.NegativeInfinity else 0.0)
    path should (be(IndexedSeq(0, 0)) or be(IndexedSeq(1, 1)))
  }

  "Viterbi.segmentAtSingletons" should "cut at single-state steps" in {
    val states = IndexedSeq(
      IndexedSeq(1, 2), IndexedSeq(1), IndexedSeq(1, 2), IndexedSeq(1, 2))
    val segs = Viterbi.segmentAtSingletons(states)
    segs.flatten.distinct.sorted shouldBe Seq(0, 1, 2, 3)
  }

  "Alignment" should "find exact substrings with full score" in {
    val r = Alignment.smithWaterman("johnsmith", "xxsmithyy")
    r.score shouldBe 10.0 // "smith" = 5 matches * 2
    "johnsmith".substring(r.aSpan._1, r.aSpan._2) shouldBe "smith"
    "xxsmithyy".substring(r.bSpan._1, r.bSpan._2) shouldBe "smith"
  }

  it should "give similarity 1 for identical strings and 0 for disjoint" in {
    Alignment.similarity("anna", "anna") shouldBe 1.0
    Alignment.similarity("abc", "xyz") shouldBe 0.0
  }
}
