package graft.operators

import graft.SparkSpec

class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Boolean)]): (Long, Long, Long, Long) =
    Drift.ksPpm(rows.toDF("v", "s"), "v", "s")
      .as[(Long, Long, Long, Long)].head()

  /** Reference: D over the union of observed values. */
  private def brute(rows: Seq[(Long, Boolean)]): Double = {
    val a = rows.filter(_._2).map(_._1).sorted
    val b = rows.filterNot(_._2).map(_._1).sorted
    val vs = (a ++ b).distinct.sorted
    vs.map { v =>
      math.abs(a.count(_ <= v).toDouble / a.size -
        b.count(_ <= v).toDouble / b.size)
    }.max
  }

  "ksPpm" should "be zero for identical samples" in {
    val base = Seq(1L, 2L, 2L, 5L, 9L)
    val rows = base.map((_, true)) ++ base.map((_, false))
    run(rows)._4 shouldBe 0L
  }

  it should "be one million for disjoint supports" in {
    val rows = Seq(1L, 2L, 3L).map((_, true)) ++
      Seq(10L, 11L, 12L).map((_, false))
    run(rows)._4 shouldBe 1000000L
  }

  it should "match the float reference on randomized data" in {
    val rnd = new scala.util.Random(29)
    val rows = Seq.fill(300)((rnd.nextInt(20).toLong, true)) ++
      Seq.fill(250)((rnd.nextInt(25).toLong, false))
    val (n1, n2, _, ppm) = run(rows)
    n1 shouldBe 300L; n2 shouldBe 250L
    val want = math.floor(brute(rows) * 1000000).toLong
    math.abs(ppm - want) should be <= 1L
  }

  "tvdPpm" should "be zero for identical mixes and one million for disjoint" in {
    val same = Seq(("a", true), ("b", true), ("a", false), ("b", false))
    Drift.tvdPpm(same.toDF("v", "s"), "v", "s")
      .select("tvd_ppm").as[Long].head() shouldBe 0L
    val disjoint = Seq(("a", true), ("b", true), ("c", false), ("d", false))
    Drift.tvdPpm(disjoint.toDF("v", "s"), "v", "s")
      .select("tvd_ppm").as[Long].head() shouldBe 1000000L
  }

  it should "match the float reference on a skewed categorical mix" in {
    val rows = Seq.fill(60)(("x", true)) ++ Seq.fill(40)(("y", true)) ++
      Seq.fill(30)(("x", false)) ++ Seq.fill(70)(("y", false))
    // p1 = (.6,.4), p2 = (.3,.7): TVD = ½(0.3+0.3) = 0.3
    Drift.tvdPpm(rows.toDF("v", "s"), "v", "s")
      .select("tvd_ppm").as[Long].head() shouldBe 300000L
  }

  it should "detect an injected location shift" in {
    val rnd = new scala.util.Random(31)
    val rows = Seq.fill(500)((rnd.nextInt(50).toLong, true)) ++
      Seq.fill(500)((rnd.nextInt(50).toLong + 10L, false)) // shifted +10
    run(rows)._4 should be > 150000L // D well above noise
  }
}
