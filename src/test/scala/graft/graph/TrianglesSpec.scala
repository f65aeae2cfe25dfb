package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Triangles.perVertex(edges.toDF("s", "d"), "s", "d")
      .as[(Long, Long)].collect().toMap

  /** Brute-force reference over the canonical undirected edge set. */
  private def brute(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val e = edges.collect { case (a, b) if a != b =>
      (math.min(a, b), math.max(a, b)) }.toSet
    val vs = e.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    val tris = for {
      a <- vs; b <- vs if a < b && e((a, b))
      c <- vs if b < c && e((a, c)) && e((b, c))
    } yield Seq(a, b, c)
    tris.flatten.groupBy(identity).map { case (v, o) => v -> o.size.toLong }
  }

  "perVertex" should "count the single triangle in a triangle+tail" in {
    run(Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))) shouldBe
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L)
  }

  it should "ignore duplicate, reversed, and self-loop edges" in {
    run(Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (1L, 3L), (2L, 2L))) shouldBe
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L)
  }

  it should "count K4 as four triangles, three per vertex" in {
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    run(k4) shouldBe Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L)
  }

  it should "match brute force on a random graph with a hub" in {
    val rnd = new scala.util.Random(11)
    // hub vertex 0 connected to everyone: exercises the orientation's
    // skew handling (the hub must get out-degree ~0, not ~n)
    val hub = (1L to 30L).map(v => (0L, v))
    val rest = Seq.fill(120)((1L + rnd.nextInt(30).toLong, 1L + rnd.nextInt(30).toLong))
    val edges = hub ++ rest
    run(edges) shouldBe brute(edges)
  }

  it should "find no triangles in a pure star" in {
    // K1,30: hub degree 30, leaves degree 1 — orientation points every
    // edge INTO the hub, so zero wedges are generated (the skew-proof
    // property), and the result is correctly empty.
    run((1L to 30L).map(v => (0L, v))) shouldBe Map.empty
  }
}
