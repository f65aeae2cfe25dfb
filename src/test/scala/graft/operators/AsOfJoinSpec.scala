package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private val quotes = Seq(
    ("A", ts(10), 100.0, "q1"),
    ("A", ts(20), 101.0, "q2"),
    ("A", ts(30), 102.0, "q3"),
    ("B", ts(15), 50.0, "q4")).toDF("sym", "qts", "px", "qid")
    .select($"sym", $"qts", $"px", $"qid")

  private val trades = Seq(
    ("A", ts(5), 1L),   // before any quote: no match
    ("A", ts(20), 2L),  // equal ts: inclusive, matches q2
    ("A", ts(25), 3L),  // between: matches q2
    ("A", ts(99), 4L),  // far after: matches q3 (unless tolerance)
    ("B", ts(16), 5L),  // other key: matches q4
    ("C", ts(16), 6L)   // key with no quotes at all
  ).toDF("sym", "tts", "tid")

  "backward" should "match each left row to the latest right row at or before it" in {
    val out = AsOfJoin.backward(trades, quotes, Seq("sym"),
        leftTs = "tts", rightTs = "qts", payload = Seq("px", "qid"))
      .select("tid", "px", "qid")
      .as[(Long, Option[Double], Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    out shouldBe Map(
      1L -> ((None, None)),
      2L -> ((Some(101.0), Some("q2"))),
      3L -> ((Some(101.0), Some("q2"))),
      4L -> ((Some(102.0), Some("q3"))),
      5L -> ((Some(50.0), Some("q4"))),
      6L -> ((None, None)))
  }

  it should "null out matches staler than the tolerance, keeping the row" in {
    val out = AsOfJoin.backward(trades, quotes, Seq("sym"),
        "tts", "qts", Seq("px", "qid"),
        toleranceMicros = Some(10L * 1000000L))
      .select("tid", "qid").as[(Long, Option[String])].collect().toMap
    out(4L) shouldBe None // 69 s stale > 10 s tolerance
    out(3L) shouldBe Some("q2") // 5 s fresh
    out.size shouldBe 6 // every left row retained
  }

  it should "break right-row (key, ts) ties deterministically by payload" in {
    // pre-fix the pick among tied right rows followed shuffle arrival
    // order — two runs could return different payloads; the contract is
    // now the GREATEST payload struct among the ties
    val q = Seq(
      ("A", ts(10), 1.0, "qa"),
      ("A", ts(10), 3.0, "qc"),
      ("A", ts(10), 2.0, "qb")).toDF("sym", "qts", "px", "qid")
      .repartition(3) // spread the ties so arrival order would vary
    val t = Seq(("A", ts(30), 1L)).toDF("sym", "tts", "tid")
    for (_ <- 1 to 3) {
      val out = AsOfJoin.backward(t, q, Seq("sym"), "tts", "qts", Seq("px", "qid"))
        .select("px", "qid").as[(Double, String)].collect().head
      out shouldBe ((3.0, "qc"))
    }
  }

  it should "take all payload fields from the same matched row even when one is null" in {
    val q = Seq(
      ("A", ts(10), Option(1.0), "old"),
      ("A", ts(20), Option.empty[Double], "new")).toDF("sym", "qts", "px", "qid")
    val t = Seq(("A", ts(30), 1L)).toDF("sym", "tts", "tid")
    val out = AsOfJoin.backward(t, q, Seq("sym"), "tts", "qts", Seq("px", "qid"))
      .select("px", "qid").as[(Option[Double], String)].collect().head
    // the match is the ts=20 row: px must be ITS null, not ts=10's 1.0
    out shouldBe ((None, "new"))
  }
}
