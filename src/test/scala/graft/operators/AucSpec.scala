package graft.operators

import graft.SparkSpec

class AucSpec extends SparkSpec {
  import spark.implicits._

  /** Pair-counting reference: P(score_pos > score_neg) + ½P(=). */
  private def brute(rows: Seq[(Long, Boolean)]): Double = {
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    wins / (pos.size * neg.size)
  }

  private def run(rows: Seq[(Long, Boolean)]): (Long, Long, Long) =
    Auc.aucPpm(rows.toDF("score", "label"), "score", "label")
      .as[(Long, Long, Long)].head()

  "aucPpm" should "be 1.0 for a perfect separator and 0 for an inverted one" in {
    val perfect = Seq((10L, true), (11L, true), (1L, false), (2L, false))
    run(perfect)._3 shouldBe 1000000L
    val inverted = perfect.map { case (s, l) => (s, !l) }
    run(inverted)._3 shouldBe 0L
  }

  it should "be 500000 ppm for an uninformative score" in {
    // all scores equal: ties everywhere -> exactly one half
    run(Seq((5L, true), (5L, true), (5L, false), (5L, false)))._3 shouldBe
      500000L
  }

  it should "match pair-counting on randomized data with heavy ties" in {
    val rnd = new scala.util.Random(17)
    val rows = Seq.fill(400)((rnd.nextInt(12).toLong, rnd.nextBoolean()))
    val (nPos, nNeg, ppm) = run(rows)
    nPos shouldBe rows.count(_._2)
    nNeg shouldBe rows.count(!_._2)
    val want = math.floor(brute(rows) * 1000000).toLong
    // truncating integer division vs float reference: equal to the unit
    math.abs(ppm - want) should be <= 1L
  }

  it should "be invariant to partitioning" in {
    val rows = Seq.fill(200)((scala.util.Random.nextInt(9).toLong, true)) ++
      Seq.fill(200)((scala.util.Random.nextInt(11).toLong, false))
    val a = run(rows)
    val b = Auc.aucPpm(rows.toDF("score", "label").repartition(13),
      "score", "label").as[(Long, Long, Long)].head()
    a shouldBe b
  }
}
