package graft.operators

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val log = Seq(
    // key 1: A A B A — four events, three episodes (the repeat collapses)
    (1L, ts("2024-01-01 00:00:00"), 1L, "A"),
    (1L, ts("2024-01-02 00:00:00"), 2L, "A"),
    (1L, ts("2024-01-03 00:00:00"), 3L, "B"),
    (1L, ts("2024-01-04 00:00:00"), 4L, "A"),
    // key 2: single event — one open episode
    (2L, ts("2024-02-01 00:00:00"), 5L, "X"))
    .toDF("k", "t", "id", "attr")

  "type2" should "compress episodes and chain exclusive bounds" in {
    val out = Scd.type2(log, Seq("k"), "t", "id", Seq("attr"))
      .as[(Long, String, Timestamp, Timestamp)].collect().toSet
    out shouldBe Set(
      (1L, "A", ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00")),
      (1L, "B", ts("2024-01-03 00:00:00"), ts("2024-01-04 00:00:00")),
      (1L, "A", ts("2024-01-04 00:00:00"), ts("9999-12-31 00:00:00")),
      (2L, "X", ts("2024-02-01 00:00:00"), ts("9999-12-31 00:00:00")))
  }

  it should "break same-timestamp ties by the tie column" in {
    val tied = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L, "A"),
      (1L, ts("2024-01-01 00:00:00"), 11L, "B"))
      .toDF("k", "t", "id", "attr")
    val out = Scd.type2(tied, Seq("k"), "t", "id", Seq("attr"))
      .orderBy("valid_from", "attr")
      .as[(Long, String, Timestamp, Timestamp)].collect()
    out.map(_._2).toSeq shouldBe Seq("A", "B")
    out(0)._4 shouldBe ts("2024-01-01 00:00:00") // zero-width first episode
  }

  it should "treat null attributes as a distinct state (null-safe compare)" in {
    val withNull = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "A"),
      (1L, ts("2024-01-02 00:00:00"), 2L, null.asInstanceOf[String]),
      (1L, ts("2024-01-03 00:00:00"), 3L, null.asInstanceOf[String]),
      (1L, ts("2024-01-04 00:00:00"), 4L, "A"))
      .toDF("k", "t", "id", "attr")
    Scd.type2(withNull, Seq("k"), "t", "id", Seq("attr")).count() shouldBe 3
  }

  it should "track multi-column state as a unit" in {
    val multi = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "A", 1),
      (1L, ts("2024-01-02 00:00:00"), 2L, "A", 2), // second attr changes
      (1L, ts("2024-01-03 00:00:00"), 3L, "A", 2))
      .toDF("k", "t", "id", "a1", "a2")
    Scd.type2(multi, Seq("k"), "t", "id", Seq("a1", "a2")).count() shouldBe 2
  }

  "asOf" should "probe the state at an instant" in {
    val scd = Scd.type2(log, Seq("k"), "t", "id", Seq("attr"))
    val at = Scd.asOf(scd, "2024-01-03 12:00:00")
      .select("k", "attr").as[(Long, String)].collect().toSet
    at shouldBe Set((1L, "B")) // key 2's first episode starts 2024-02-01
  }
}
