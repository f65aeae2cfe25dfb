package graft.operators

import graft.SparkSpec

class SkylineSpec extends SparkSpec {

  import spark.implicits._

  behavior of "Skyline.pareto2D"

  it should "keep exactly the non-dominated rows" in {
    val rows = Seq(
      (1L, 10L, 1L),  // frontier (best x)
      (2L, 8L, 5L),   // frontier
      (3L, 8L, 3L),   // dominated by 2 (same x, lower y)
      (4L, 5L, 5L),   // dominated by 2 (lower x, same y)
      (5L, 4L, 9L),   // frontier
      (6L, 4L, 9L),   // tie with 5 on both dims — both stay
      (7L, 1L, 1L)    // dominated by everything
    ).toDF("id", "x", "y")
    val got = Skyline.pareto2D(rows, "id", "x", "y")
      .select("id").as[Long].collect().toSet
    got shouldBe Set(1L, 2L, 5L, 6L)
  }

  it should "match a brute-force dominance check on random data" in {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val rows = (0 until 2000).map(i =>
        (i.toLong, rnd.nextInt(100).toLong, rnd.nextInt(100).toLong))
      val got = Skyline.pareto2D(rows.toDF("id", "x", "y").repartition(7),
          "id", "x", "y")
        .select("id").as[Long].collect().toSet
      val want = rows.filter { case (_, x, y) =>
        !rows.exists { case (_, x2, y2) =>
          x2 >= x && y2 >= y && (x2 > x || y2 > y) }
      }.map(_._1).toSet
      got shouldBe want
    }
  }

  it should "return everything on a pure anti-chain" in {
    val rows = (0L until 50L).map(i => (i, i, 49L - i)).toDF("id", "x", "y")
    Skyline.pareto2D(rows, "id", "x", "y").count() shouldBe 50L
  }
}
