package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TableDiffSpec extends SparkSpec {
  import spark.implicits._

  private val before = Seq(
    (1L, Some("a"), 10L), (2L, Some("b"), 20L),
    (3L, Some("c"), 30L), (4L, Option.empty[String], 40L))
    .toDF("k", "name", "v")

  private val afterT = Seq(
    (1L, Some("a"), 10L), //       unchanged
    (2L, Some("B"), 20L), //       changed (name)
    (4L, Some("now-set"), 40L), // changed (null -> value)
    (5L, Some("e"), 50L)) //       added; 3 removed
    .toDF("k", "name", "v")

  "diff" should "classify added/removed/changed/unchanged per key" in {
    TableDiff.diff(before, afterT, Seq("k"))
      .as[(Long, String)].collect().toMap shouldBe Map(
      1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "changed", 5L -> "added")
  }

  it should "distinguish null placement across columns" in {
    val b = Seq((1L, Option.empty[String], Some("x"))).toDF("k", "a", "b")
    val a = Seq((1L, Some("x"), Option.empty[String])).toDF("k", "a", "b")
    TableDiff.diff(b, a, Seq("k"))
      .as[(Long, String)].head()._2 shouldBe "changed"
  }

  it should "treat identical all-null rows as unchanged" in {
    val t = Seq((1L, Option.empty[String])).toDF("k", "a")
    TableDiff.diff(t, t, Seq("k"))
      .as[(Long, String)].head()._2 shouldBe "unchanged"
  }

  "summary" should "count statuses" in {
    TableDiff.summary(before, afterT, Seq("k"))
      .as[(String, Long)].collect().toMap shouldBe Map(
      "unchanged" -> 1L, "changed" -> 2L, "removed" -> 1L, "added" -> 1L)
  }
}
