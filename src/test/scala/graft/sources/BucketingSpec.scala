package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Plan-shape proof of co-located joins: same-bucketed tables join with no
  * shuffle exchange on either side, while the plain-parquet join shuffles
  * both. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  "bucketed tables" should "join without a shuffle exchange" in {
    val left = (1L to 2000L).map(i => (i, s"name-$i")).toDF("k", "name")
    val right = (1L to 2000L).map(i => (i, i * 10)).toDF("k", "v")
    // force SMJ so the exchange question is about shuffles, not broadcasts
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(left, "bspec_left", "k", 4)
      Bucketing.writeBucketed(right, "bspec_right", "k", 4)
      val joined = Bucketing.colocatedJoin(spark, "bspec_left", "bspec_right", "k")
      Bucketing.isShuffleFree(joined) shouldBe true
      joined.count() shouldBe 2000L
      joined.where($"k" === 7L).select("name", "v").as[(String, Long)].head() shouldBe
        (("name-7", 70L))
      // control: the same join over non-bucketed data shuffles
      val plain = left.join(right, "k")
      Bucketing.isShuffleFree(plain) shouldBe false
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bspec_left")
      spark.sql("DROP TABLE IF EXISTS bspec_right")
    }
  }
}
