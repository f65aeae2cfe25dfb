package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SortedNeighborhoodSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], w: Int): Set[(Long, Long, Long)] =
    SortedNeighborhood.pairs(rows.toDF("id", "k"), "id", "k", w)
      .as[(Long, Long, Long)].collect().toSet

  /** Reference: sort by (key, id), emit pairs within w ranks. */
  private def brute(rows: Seq[(Long, String)], w: Int): Set[(Long, Long, Long)] = {
    val ranked = rows.sortBy { case (id, k) => (k, id) }.map(_._1).zipWithIndex
    (for {
      (id1, r1) <- ranked; (id2, r2) <- ranked
      if r2 > r1 && r2 - r1 <= w - 1
    } yield (id1, id2, (r2 - r1).toLong)).toSet
  }

  "pairs" should "emit exactly the sliding-window pairs of the sorted order" in {
    val rows = Seq((10L, "smith"), (11L, "smyth"), (12L, "adams"),
      (13L, "smith"), (14L, "zhao"))
    run(rows, 3) shouldBe brute(rows, 3)
  }

  it should "order equal keys by id (deterministic ranks)" in {
    val rows = Seq((5L, "dup"), (3L, "dup"), (4L, "dup"))
    // sorted: (dup,3) (dup,4) (dup,5) -> adjacent pairs at dist 1: (3,4),(4,5)
    run(rows, 2) shouldBe Set((3L, 4L, 1L), (4L, 5L, 1L))
  }

  it should "catch a typo pair that token blocking misses" in {
    // "jonathan meyers" vs "jonathan meyrs": the surname token differs,
    // but they are rank-adjacent under the sorted key
    val rows = Seq((1L, "jonathan meyers"), (2L, "jonathan meyrs"),
      (3L, "alice brown"), (4L, "zoe quinn"))
    val got = run(rows, 2).map(p => (p._1, p._2))
    got should contain((1L, 2L))
  }

  it should "match brute force on a random corpus across window sizes" in {
    val rnd = new scala.util.Random(5)
    val rows = (0L until 80L).map(id =>
      (id, rnd.alphanumeric.take(3).mkString.toLowerCase))
    for (w <- Seq(2, 5, 10))
      withClue(s"w=$w") { run(rows, w) shouldBe brute(rows, w) }
  }
}
