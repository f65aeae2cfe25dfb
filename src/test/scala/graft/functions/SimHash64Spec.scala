package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimHash64Spec extends SparkSpec {
  import spark.implicits._

  "SimHash64" should "equal the column-expression formulation" in {
    val texts = Seq("the quick brown fox", "spark engines are different",
      "a b c d e f g", "singleword").toDF("t")
    val hashes = texts.select(
      transform(graft.text.TextAnalysis.tokens(lower($"t")), x => xxhash64(x)).as("h"))
    val native = hashes.select(call_function("simhash64", $"h")).as[Long].collect()
    val hof = hashes.select(graft.dedup.Dedup.simhashFromHashes($"h")).as[Long].collect()
    native.toSeq shouldBe hof.toSeq
  }

  it should "be usable from SQL and handle empty arrays" in {
    spark.sql("SELECT simhash64(array(1L, 2L, 3L)) AS fp").as[Long].head() should not be 0L
    spark.sql("SELECT simhash64(CAST(array() AS ARRAY<BIGINT>)) AS fp")
      .as[Long].head() shouldBe 0L
  }
}
