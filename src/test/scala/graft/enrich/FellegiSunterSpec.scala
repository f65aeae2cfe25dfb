package graft.enrich

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FellegiSunterSpec extends SparkSpec {

  import spark.implicits._

  behavior of "FellegiSunter"

  // 4 matches (3 of which agree on f1), 6 non-matches (1 agrees on f1)
  private lazy val labeled = Seq(
    (1, 1, 1), (1, 1, 0), (1, 1, 1), (1, 0, 0),
    (0, 1, 0), (0, 0, 0), (0, 0, 1), (0, 0, 0), (0, 0, 0), (0, 0, 1)
  ).toDF("is_match", "f1", "f2")

  it should "estimate half-offset m/u and hand-checked weights" in {
    val w = FellegiSunter.weights(labeled, Seq("f1", "f2"), "is_match")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6))).toMap
    val (mNum, mDen, uNum, uDen, wa, wd) = w("f1")
    mNum shouldBe 3L; mDen shouldBe 4L; uNum shouldBe 1L; uDen shouldBe 6L
    val m = (3 + 0.5) / (4 + 1.0) // 0.7
    val u = (1 + 0.5) / (6 + 1.0) // 3/14
    def r6(x: Double) = // Spark round() is HALF_UP
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    wa shouldBe (r6(math.log(m / u)) +- 1e-9)
    wd shouldBe (r6(math.log((1 - m) / (1 - u))) +- 1e-9)
  }

  it should "stay finite on degenerate always/never-agreeing fields" in {
    val degenerate = Seq((1, 1), (1, 1), (0, 0), (0, 0)).toDF("is_match", "f")
    val w = FellegiSunter.weights(degenerate, Seq("f"), "is_match").collect()(0)
    w.getDouble(5).isInfinite shouldBe false
    w.getDouble(6).isInfinite shouldBe false
  }

  it should "score pairs as the sum of selected weights" in {
    val w = FellegiSunter.weights(labeled, Seq("f1", "f2"), "is_match")
    val wm = w.collect().map(r => r.getString(0) ->
      (r.getDouble(5), r.getDouble(6))).toMap
    val pairs = Seq((10L, 1, 0), (11L, 0, 1), (12L, 1, 1)).toDF("id", "f1", "f2")
    val scored = FellegiSunter.score(pairs, w, Seq("f1", "f2"))
      .select(col("id"), col("fs_score")).as[(Long, Double)].collect().toMap
    def r6(x: Double) = // Spark round() is HALF_UP
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    scored(10L) shouldBe (r6(wm("f1")._1 + wm("f2")._2) +- 1e-9)
    scored(12L) shouldBe (r6(wm("f1")._1 + wm("f2")._1) +- 1e-9)
    // full agreement must outrank full disagreement on informative fields
    scored(12L) should be > scored(11L)
  }

  it should "stay finite when the labeled sample has only one class" in {
    // the other class's sums are NULL over zero rows; pre-fix the
    // weights came out null and score() NPE'd
    import spark.implicits._
    val oneClass = Seq((1, 1), (1, 0)).toDF("is_match", "f")
    val w = FellegiSunter.weights(oneClass, Seq("f"), "is_match").collect()(0)
    w.getAs[Long]("u_den") shouldBe 0L
    noException should be thrownBy
      FellegiSunter.score(oneClass, FellegiSunter.weights(oneClass, Seq("f"),
        "is_match"), Seq("f")).collect()
  }

  it should "reject scoring against missing fields" in {
    val w = FellegiSunter.weights(labeled, Seq("f1"), "is_match")
    an[IllegalArgumentException] should be thrownBy
      FellegiSunter.score(labeled, w, Seq("f2")).collect()
  }
}
