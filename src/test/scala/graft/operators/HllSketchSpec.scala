package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HllSketchSpec extends SparkSpec {
  import spark.implicits._

  private def estimate(df: org.apache.spark.sql.DataFrame, b: Int): Double =
    HllSketch.estimateRegisters(
      HllSketch.registers(df, "key", b).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toSeq, b)

  behavior of "HllSketch"

  it should "estimate cardinality within the m=256 error envelope" in {
    for (n <- Seq(500, 5000, 20000)) {
      val df = (1L to n.toLong).map("k" + _).toDF("key")
      val est = estimate(df, 8)
      // standard error is 1.04/sqrt(256) = 6.5%; allow 3 sigma
      math.abs(est - n) / n should be < 0.20
    }
  }

  it should "be insensitive to duplication (it counts distinct)" in {
    val uniq = (1L to 1000L).map("k" + _).toDF("key")
    val dup = uniq.unionAll(uniq).unionAll(uniq)
    HllSketch.registers(dup, "key", 6).collect().toSet shouldBe
      HllSketch.registers(uniq, "key", 6).collect().toSet
  }

  it should "merge registers by element-wise max (any-cut property)" in {
    val a = (1L to 700L).map("a" + _).toDF("key")
    val b = (1L to 900L).map("b" + _).toDF("key")
    val merged = HllSketch.registers(a, "key", 6)
      .unionAll(HllSketch.registers(b, "key", 6))
      .groupBy("bucket").agg(max("max_rho").as("max_rho"))
    val whole = HllSketch.registers(a.unionAll(b), "key", 6)
    merged.unionAll(whole).groupBy("bucket", "max_rho").count()
      .where(col("count") =!= 2).count() shouldBe 0L
  }
}
