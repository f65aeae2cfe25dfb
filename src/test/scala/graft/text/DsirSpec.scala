package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {

  behavior of "Dsir.importanceWeights"

  it should "score target-domain documents above off-domain ones" in {
    val s = spark
    import s.implicits._
    // target = lang 'tgt': heavy in "alpha beta"; raw background heavy in
    // "noise filler". A fresh doc full of target vocabulary must outscore
    // one full of background vocabulary.
    val rows = (1L to 20L).map(i => (i, "alpha beta alpha beta gamma", "tgt")) ++
      (21L to 80L).map(i => (i, "noise filler noise filler junk", "raw")) ++
      Seq((100L, "alpha beta gamma alpha", "raw"), (101L, "noise junk filler noise", "raw"))
    val df = rows.toDF("doc_id", "text", "lang")
    val out = Dsir.importanceWeights(df, "text", "doc_id", col("lang") === "tgt")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    out(100L)._2 should be > out(101L)._2
    out(100L)._1 shouldBe 4L
  }

  it should "preserve the domain ordering under the xxhash64 production path" in {
    val s = spark
    import s.implicits._
    val rows = (1L to 20L).map(i => (i, "alpha beta alpha beta gamma", "tgt")) ++
      (21L to 80L).map(i => (i, "noise filler noise filler junk", "raw")) ++
      Seq((100L, "alpha beta gamma alpha", "raw"), (101L, "noise junk filler noise", "raw"))
    val out = Dsir.importanceWeights(rows.toDF("doc_id", "text", "lang"),
        "text", "doc_id", col("lang") === "tgt", md5Oracle = false)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    out(100L) should be > out(101L)
  }

  it should "return zero for token-free documents and cover every input row" in {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "only doc", true), (2L, "   ", false)).toDF("doc_id", "text", "t")
    val out = Dsir.importanceWeights(df, "text", "doc_id", col("t"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    out.keySet shouldBe Set(1L, 2L)
    out(2L) shouldBe ((0L, 0L))
  }
}
