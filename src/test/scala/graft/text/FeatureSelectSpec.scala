package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FeatureSelectSpec extends SparkSpec {
  import spark.implicits._

  behavior of "FeatureSelect.chiSquare"

  it should "compute the exact 2x2 presence chi-square in centi-units" in {
    // 4 positive docs, 6 negative; "hot" in 3 pos + 1 neg, "cold" in
    // 1 pos + 5 neg, "both" everywhere except one neg doc
    val docs = Seq(
      (0L, "hot both", true), (1L, "hot both", true),
      (2L, "hot cold both", true), (3L, "both", true),
      (4L, "cold both", false), (5L, "cold both", false),
      (6L, "cold both", false), (7L, "cold both", false),
      (8L, "cold both", false), (9L, "hot", false)
    ).toDF("doc_id", "text", "pos")
    val out = FeatureSelect.chiSquare(docs, "doc_id", "text", col("pos"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap

    // hot: a=3 b=1 c=1 d=5 -> chi2 = 10*(15-1)^2 / (4*6*4*6) = 3.4027..
    out("hot") shouldBe ((3L, 1L, 1L, 5L,
      100L * 10 * 14 * 14 / (4 * 6 * 4 * 6)))
    out("hot")._5 shouldBe 340L
    // cold: a=1 b=5 c=3 d=1 -> 10*(1-15)^2/(6*4*4*6) = same table flipped
    out("cold")._5 shouldBe 340L
    // "both" misses only doc 9: a=4 b=5 c=0 d=1
    out("both") shouldBe ((4L, 5L, 0L, 1L,
      100L * 10 * (4 * 1 - 5 * 0) * (4 * 1 - 5 * 0) / (9 * 1 * 4 * 6)))
  }

  it should "drop degenerate margins instead of dividing by zero" in {
    val docs = Seq((0L, "every", true), (1L, "every", false))
      .toDF("doc_id", "text", "pos")
    // "every" is present in all docs -> (c+d) margin is 0 -> dropped
    FeatureSelect.chiSquare(docs, "doc_id", "text", col("pos"))
      .count() shouldBe 0L
  }

  it should "score presence, not frequency" in {
    val docs = Seq((0L, "w w w w w", true), (1L, "w", false))
      .toDF("doc_id", "text", "pos")
    // both docs contain "w" once at presence granularity -> degenerate
    FeatureSelect.chiSquare(docs, "doc_id", "text", col("pos"))
      .count() shouldBe 0L
  }
}
