package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SeasonalSpec extends SparkSpec {
  import spark.implicits._

  behavior of "Seasonal.residuals"

  it should "learn per-slot integer baselines and flag only residuals past 3x meanAD" in {
    // slot 0: flat 100s; slot 1: three 100s and one 5000 spike
    val rows = Seq(
      (1L, "a", 0L, 100L), (2L, "a", 0L, 100L), (3L, "a", 0L, 100L), (4L, "a", 0L, 100L),
      (5L, "a", 1L, 100L), (6L, "a", 1L, 100L), (7L, "a", 1L, 100L), (8L, "a", 1L, 5000L))
    val out = Seasonal.residuals(rows.toDF("id", "g", "slot", "v"),
        "id", "g", col("slot"), col("v"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(4), r.getLong(5), r.getInt(6))).toMap
    // slot 1 baseline = (100*3 + 5000) div 4 = 1325
    out(5L) shouldBe ((1325L, -1225L, 0))
    out(8L)._1 shouldBe 1325L
    out(8L)._2 shouldBe 3675L
    // meanAD = (0*4 + 1225*3 + 3675) div 8 = 918; only the spike clears 3x
    out(8L)._3 shouldBe 1
    Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).foreach(id => out(id)._3 shouldBe 0)
  }
}
