package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  "BinnedRangeJoinRewrite" should "turn a pure range join into an equi-join with identical results" in {
    val points = (0 until 2000).map(i =>
      (i.toLong, ts(f"2024-01-${1 + i % 28}%02d ${i % 24}%02d:00:00")))
      .toDF("pid", "pt")
    val intervals = (0 until 300).map(i =>
      (1000L + i, ts(f"2024-01-${1 + i % 28}%02d 00:00:00"),
        ts(f"2024-01-${1 + i % 28}%02d 23:59:59")))
      .toDF("iid", "istart", "iend")
    points.createOrReplaceTempView("pts")
    intervals.createOrReplaceTempView("ivs")

    val q = spark.sql(
      "SELECT pid, iid FROM pts JOIN ivs ON pt >= istart AND pt <= iend")
    val plan = q.queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should include regex "(ShuffledHashJoin|SortMergeJoin|BroadcastHashJoin)"

    // ground truth: driver-side nested loop
    val ps = points.as[(Long, java.sql.Timestamp)].collect()
    val is = intervals.as[(Long, java.sql.Timestamp, java.sql.Timestamp)].collect()
    val expected = (for {
      (pid, pt) <- ps
      (iid, s, e) <- is
      if !pt.before(s) && !pt.after(e)
    } yield (pid, iid)).toSet
    expected should not be empty
    q.as[(Long, Long)].collect().toSet shouldBe expected
  }

  it should "treat inverted and null-bounded intervals as matching nothing" in {
    // pre-rewrite, a dirty interval row (end before start, or a null
    // bound) simply matched no points; the bare ascending Sequence the
    // rewrite used to emit RAISED "Illegal sequence boundaries" at
    // runtime — a semantics-preserving rewrite must not turn unmatched
    // rows into job failures
    val points = Seq((1L, ts("2024-01-05 12:00:00"))).toDF("pid", "pt")
    val intervals = Seq(
      (10L, ts("2024-01-05 00:00:00"), ts("2024-01-05 23:59:59")), // valid
      (11L, ts("2024-01-09 00:00:00"), ts("2024-01-02 00:00:00")), // inverted
      (12L, null.asInstanceOf[java.sql.Timestamp],
        ts("2024-01-05 23:59:59"))) // null start
      .toDF("iid", "istart", "iend")
    points.createOrReplaceTempView("pts2")
    intervals.createOrReplaceTempView("ivs2")
    val q = spark.sql(
      "SELECT pid, iid FROM pts2 JOIN ivs2 ON pt >= istart AND pt <= iend")
    q.queryExecution.executedPlan.toString should not include "BroadcastNestedLoopJoin"
    q.as[(Long, Long)].collect().toSet shouldBe Set((1L, 10L))
  }

  it should "leave equi-joins and non-range joins untouched" in {
    val a = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("id", "t")
    val b = Seq((1L, ts("2024-01-01 09:00:00"), ts("2024-01-01 11:00:00")))
      .toDF("id", "s", "e")
    // has an equality conjunct -> hash join already; rule must not touch it
    val q = a.join(b, a("id") === b("id") && a("t") >= b("s") && a("t") <= b("e"))
    q.count() shouldBe 1
  }
}
