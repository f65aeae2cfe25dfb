package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._
  import Expectations._

  private val df = Seq(
    (1L, Some("a"), 10.0, "X"),
    (2L, Some("b"), 20.0, "Y"),
    (2L, None, 999.0, "Z"), // duplicate key, null name, out-of-range, bad value
    (4L, Some("d"), 30.0, "X"))
    .toDF("k", "name", "bal", "seg")

  private def run(es: Seq[Expectation]): Map[(String, String), (Long, Long, Boolean)] =
    check(df, es).collect().map(r =>
      (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(4), r.getBoolean(6)))).toMap

  "check" should "compute all metrics in one pass with ppm verdicts" in {
    val out = run(Seq(
      NotNull("name"),
      Unique("k"),
      InRange("bal", 0, 100),
      AcceptedValues("seg", Seq("X", "Y"))))
    out(("not_null", "name")) shouldBe ((1L, 250000L, false))
    out(("unique", "k")) shouldBe ((1L, 250000L, false))
    out(("in_range", "bal")) shouldBe ((1L, 250000L, false))
    out(("accepted_values", "seg")) shouldBe ((1L, 250000L, false))
  }

  it should "pass within a nonzero budget" in {
    run(Seq(NotNull("name", budgetPpm = 300000)))(("not_null", "name"))
      ._3 shouldBe true
  }

  it should "not count nulls as range or set violations" in {
    val withNull = Seq((Some(5.0), Option.empty[String]),
      (None, Some("X"))).toDF("bal", "seg")
    val out = check(withNull, Seq(InRange("bal", 0, 10),
      AcceptedValues("seg", Seq("X"))))
      .select("expectation", "violations").as[(String, Long)].collect().toMap
    out("in_range") shouldBe 0L
    out("accepted_values") shouldBe 0L
  }

  it should "report zero ppm on an empty table" in {
    val empty = df.where(lit(false))
    val out = check(empty, Seq(NotNull("name"), Unique("k")))
      .select("violation_ppm", "passed").as[(Long, Boolean)].collect()
    out.foreach { case (ppm, passed) => ppm shouldBe 0L; passed shouldBe true }
  }

  "plan" should "evaluate every expectation from a single aggregate" in {
    val plan = check(df, Seq(NotNull("name"), InRange("bal", 0, 1),
      AcceptedValues("seg", Seq("X")))).queryExecution.executedPlan.toString
    // one scan feeding one aggregate — no join, no union of scans
    plan.split("LocalTableScan").length - 1 should be <= 1
  }
}
