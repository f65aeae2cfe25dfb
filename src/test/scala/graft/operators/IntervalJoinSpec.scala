package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  "pointInInterval" should "match the naive theta join" in {
    val points = Seq(
      (1L, ts("2024-01-01 00:05:00")),
      (2L, ts("2024-01-01 03:00:00")),
      (3L, ts("2024-01-02 12:00:00")),
      (4L, ts("2024-03-01 00:00:00"))).toDF("pid", "pt")
    val intervals = Seq(
      (10L, ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00")),
      (11L, ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00")),
      (12L, ts("2024-02-01 00:00:00"), ts("2024-02-02 00:00:00"))).toDF("iid", "start", "end")

    val fast = IntervalJoin.pointInInterval(points, "pt", intervals, "start", "end", 3600)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val naive = points.join(intervals, $"pt" >= $"start" && $"pt" <= $"end")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    fast shouldBe naive
    fast shouldBe Set((1L, 10L), (1L, 11L), (2L, 11L), (3L, 11L))
  }

  it should "include boundary points (inclusive ends)" in {
    val points = Seq((1L, ts("2024-01-01 01:00:00"))).toDF("pid", "pt")
    val intervals = Seq((10L, ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00")))
      .toDF("iid", "start", "end")
    IntervalJoin.pointInInterval(points, "pt", intervals, "start", "end", 60)
      .count() shouldBe 1
  }

  "intervalOverlap" should "emit each overlapping pair exactly once" in {
    val a = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 10:00:00")),
      (2L, ts("2024-01-05 00:00:00"), ts("2024-01-06 00:00:00"))).toDF("aid", "as", "ae")
    val b = Seq(
      (10L, ts("2024-01-01 05:00:00"), ts("2024-01-02 00:00:00")),
      (11L, ts("2024-01-04 00:00:00"), ts("2024-01-05 00:30:00")),
      (12L, ts("2024-02-01 00:00:00"), ts("2024-02-01 01:00:00"))).toDF("bid", "bs", "be")
    val res = IntervalJoin.intervalOverlap(a, "as", "ae", b, "bs", "be", 3600)
      .select("aid", "bid").as[(Long, Long)].collect().toList
    res.size shouldBe res.toSet.size // no duplicate pairs from multi-bin overlap
    res.toSet shouldBe Set((1L, 10L), (2L, 11L))
  }

  "overlapRatio" should "compute overlap relative to the left interval" in {
    val df = Seq((ts("2024-01-01 00:00:00"), ts("2024-01-01 10:00:00"),
      ts("2024-01-01 05:00:00"), ts("2024-01-01 20:00:00")))
      .toDF("ls", "le", "rs", "re")
    val r = df.select(IntervalJoin.overlapRatio($"ls", $"le", $"rs", $"re").as("r"))
      .as[Double].head()
    r shouldBe 0.5 +- 1e-12
  }
}
