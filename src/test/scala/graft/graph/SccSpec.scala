package graft.graph

import graft.SparkSpec

class SccSpec extends SparkSpec {
  import spark.implicits._

  // maxDriverBytes = 0 disables BOTH the entry fast path and the
  // per-round driver cutover: the pure-distributed differential
  private def dist(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val rows = Scc.decompose(edges.toDF("src", "dst"),
      smallGraphThreshold = 0, maxDriverBytes = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    // output contract: exactly ONE row per vertex (a .toMap alone would
    // mask duplicated rows — the chained-contraction regression shape)
    withClue(s"${rows.length} rows for ${rows.map(_._1).distinct.length} ids") {
      rows.length shouldBe rows.map(_._1).distinct.length
    }
    rows.toMap
  }

  private def drv(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Scc.decompose(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  behavior of "Scc.decompose"

  it should "find cycles, chains and self-loops (both paths agree)" in {
    // ring 1-2-3, tail 3->4->5, self-loop 6, 2-cycle 7<->8, 8->1
    val edges = Seq[(Long, Long)](
      (1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 5) /* distinct loop */,
      (6, 6), (7, 8), (8, 7), (8, 1))
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L,
      6L -> 6L, 7L -> 7L, 8L -> 7L)
    drv(edges) shouldBe want
    dist(edges) shouldBe want
  }

  it should "peel nested condensation layers (bow-tie shape)" in {
    // core ring {10,11,12}; in-tentacle chain 1->2->10; out ring {20,21}
    // reached from the core; a back edge inside the out ring only
    val edges = Seq[(Long, Long)](
      (1, 2), (2, 10), (10, 11), (11, 12), (12, 10),
      (12, 20), (20, 21), (21, 20))
    val want = Map(1L -> 1L, 2L -> 2L, 10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L)
    drv(edges) shouldBe want
    dist(edges) shouldBe want
  }

  it should "match iterative Tarjan on random graphs (differential)" in {
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 5) {
      val n = 30 + trial * 10
      val edges = Seq.fill(n * 2)(
        (rnd.nextLong(n).abs, rnd.nextLong(n).abs))
      val expect = Scc.tarjan(edges.toArray)
      dist(edges) shouldBe expect
    }
  }

  it should "split a deep chain of ring-SCCs in logarithmic rounds" in {
    // 12 rings of 4 vertices, ring i+1's head -> ring i's head: the deep
    // condensation chain that defeats min-label coloring (Θ(n/ln n)
    // rounds — the round-9 scc4M probe hang). DCSC's random pivots must
    // both get it RIGHT and get it done in ~O(log #rings) rounds.
    val edges = (0L until 12L).flatMap { ring =>
      val base = ring * 4
      val cycle = (0L until 4L).map(i => (base + i, base + (i + 1) % 4))
      if (ring == 0) cycle else cycle :+ (base, base - 4)
    }
    val expect = Scc.tarjan(edges.toArray)
    var rounds = 0
    val got = Scc.decompose(edges.toDF("src", "dst"),
      smallGraphThreshold = 0, maxDriverBytes = 0, onRound = r => rounds = r)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe expect
    withClue(s"rounds=$rounds for 12 chained ring-SCCs") {
      rounds should be < 12
    }
  }

  it should "cut over to the driver once the remainder fits the gate" in {
    // 24 chained ring-SCCs: distributed ENTRY forced, but the default
    // byte gate lets round 2 collapse the whole remainder with one
    // driver Tarjan pass — pure-distributed needs many more rounds for
    // this depth, so rounds <= 3 proves the cutover actually fired.
    val edges = (0L until 24L).flatMap { ring =>
      val base = ring * 4
      val cycle = (0L until 4L).map(i => (base + i, base + (i + 1) % 4))
      if (ring == 0) cycle else cycle :+ (base, base - 4)
    }
    val expect = Scc.tarjan(edges.toArray)
    var rounds = 0
    val got = Scc.decompose(edges.toDF("src", "dst"),
      smallGraphThreshold = 0, onRound = r => rounds = r)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe expect
    withClue(s"rounds=$rounds for 24 chained ring-SCCs with the gate on") {
      rounds should be <= 3
    }
  }

  it should "resolve a pure giant ring under the doubling early-stop" in {
    // single thin cycle, no tails: the pointer-map image is the whole
    // ring at EVERY doubling, so the plateau fires immediately and the
    // contract pass sees only window-local minima — correctness must
    // come from iterated passes + the label fixpoint, not from a full
    // log2(n) doubling
    val n = 241L
    val ring = (0L until n).map(i => (i, (i + 1) % n))
    dist(ring) shouldBe (0L until n).map(i => i -> 0L).toMap
    // and a LONG TAIL into a small ring: the plateau may not fire until
    // the doubling covers the tail, and every tail vertex must stay a
    // singleton (never contracted as on-cycle)
    val tail = (1001L until 1100L).map(i => (i, i - 1)) :+ (1000L, 4L)
    val got = dist(ring.take(5).map { case (s, d) => (s, d % 5) } ++ tail)
    (0L until 5L).foreach(i => got(i) shouldBe 0L)
    (1000L until 1100L).foreach(i => got(i) shouldBe i)
  }

  it should "handle a long trivial-SCC chain through trim" in {
    val edges = (1L until 60L).map(i => (i, i + 1))
    val got = drv(edges)
    got shouldBe (1L to 60L).map(i => i -> i).toMap
    dist(edges) shouldBe got
  }
}
