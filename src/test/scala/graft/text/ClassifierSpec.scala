package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def refBucket(tok: String, buckets: Int): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (((hex(0).toInt * 131 + hex(1).toInt) * 131 + hex(2).toInt) * 131 +
      hex(3).toInt) % buckets
  }

  "hashedLinearScore" should "match a JVM reference over tokenized text" in {
    val weights = (0 until 16).map(b => ((b % 5) - 2).toDouble)
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "spark, joins; and windows!"),
      (3L, ""),
      (4L, "one")).toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        Classifier.hashedLinearScore(col("text"), weights, bias = 0.5).as("s"))
      .as[(Long, Double)].collect().toMap
    def ref(text: String): Double =
      0.5 + text.split("[\\s\\p{Punct}]+").filter(_.nonEmpty)
        .map(t => weights(refBucket(t, 16))).sum
    got shouldBe Map(
      1L -> ref("the quick brown fox"),
      2L -> ref("spark, joins; and windows!"),
      3L -> 0.5, // empty doc: bias only
      4L -> ref("one"))
  }

  "gate" should "keep exactly the rows whose score clears the threshold" in {
    // single-bucket model: score = bias + w0 * n_tokens, monotone in length
    val docs = Seq(
      (1L, "a b c d e"), (2L, "a b"), (3L, "")).toDF("doc_id", "text")
    val res = Classifier.gate(docs, "text", "doc_id",
        weights = Seq(1.0), bias = 0.0, threshold = 2.5)
      .as[(Long, Double, Boolean)].collect()
      .map { case (id, s, k) => id -> ((s, k)) }.toMap
    res shouldBe Map(1L -> ((5.0, true)), 2L -> ((2.0, false)), 3L -> ((0.0, false)))
  }

  "LinearScore (native)" should "be bit-identical to the fastHash column path" in {
    val weights = (0 until 64).map(b => 0.1 * ((b % 9) - 4)) // NON-integer
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "spark, joins; and windows! again spark"),
      (3L, ""), (4L, "solo")).toDF("doc_id", "text")
    val viaColumns = docs.select(col("doc_id"),
        Classifier.hashedLinearScore(col("text"), weights, 0.25,
          fastHash = true).as("s"))
      .as[(Long, Double)].collect().toMap
    val viaNative = Classifier.gate(docs, "text", "doc_id",
        weights, bias = 0.25, threshold = 0.0, fastHash = true)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    // the gate must actually have dispatched to the native expression
    Classifier.gate(docs, "text", "doc_id", weights, 0.25, 0.0,
        fastHash = true)
      .queryExecution.analyzed.toString should include("linear_score")
    viaNative.keys should have size 4
    viaNative.foreach { case (id, s) =>
      java.lang.Double.doubleToLongBits(s) shouldBe
        java.lang.Double.doubleToLongBits(viaColumns(id))
    }
  }

  "tokenBucketFast" should "agree with md5 bucketing under bucket-blind weights" in {
    // uniform weights make the score independent of the bucket function:
    // both paths must yield w * n_tokens + bias exactly
    val docs = Seq((1L, "a b c"), (2L, "x y z w v")).toDF("doc_id", "text")
    val uni = Seq.fill(32)(2.0)
    val slow = docs.select(col("doc_id"),
        Classifier.hashedLinearScore(col("text"), uni, 1.0).as("s"))
      .as[(Long, Double)].collect().toMap
    val fast = docs.select(col("doc_id"),
        Classifier.hashedLinearScore(col("text"), uni, 1.0, fastHash = true).as("s"))
      .as[(Long, Double)].collect().toMap
    slow shouldBe Map(1L -> 7.0, 2L -> 11.0)
    fast shouldBe slow
  }

  it should "spread a large vocabulary across all buckets" in {
    val got = (0 until 500).map(i => s"tok$i").toDF("t")
      .select(Classifier.tokenBucketFast(col("t"), 16))
      .as[Int].collect()
    got.distinct.sorted shouldBe (0 until 16)
  }

  it should "reach every bucket across a large vocabulary" in {
    val b = 16
    val toks = (0 until 500).map(i => s"tok$i")
    toks.map(refBucket(_, b)).distinct.size shouldBe b
    // and the column formulation agrees bucket-by-bucket
    val got = toks.toDF("t")
      .select(col("t"), Classifier.tokenBucket(col("t"), b).as("b"))
      .as[(String, Int)].collect().toMap
    toks.foreach(t => got(t) shouldBe refBucket(t, b))
  }
}
