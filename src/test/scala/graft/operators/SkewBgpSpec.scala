package graft.operators

import graft.SparkSpec
import graft.rdf.Bgp
import org.apache.spark.sql.functions._

class SkewBgpSpec extends SparkSpec {
  import spark.implicits._

  "SkewedAgg" should "match plain groupBy exactly" in {
    val df = (1 to 1000).map(i => (if (i % 10 == 0) "cold" else "hot", i.toLong))
      .toDF("k", "v")
    val salted = SkewedAgg.saltedSum(df, "k", "v", salts = 8)
      .as[(String, Long)].collect().toMap
    val plain = df.groupBy("k").agg(sum("v")).as[(String, Long)].collect().toMap
    salted shouldBe plain
    SkewedAgg.saltedCount(df, "k", salts = 8).as[(String, Long)].collect().toMap shouldBe
      Map("hot" -> 900L, "cold" -> 100L)
  }

  "Bgp filter/bind/values" should "compose over binding sets" in {
    val quads = Seq(
      ("a", "age", "31", 2.toByte, null: String, null: String, "g"),
      ("b", "age", "7", 2.toByte, null: String, null: String, "g"),
      ("c", "age", "55", 2.toByte, null: String, null: String, "g"))
      .toDF("s", "p", "o", "oKind", "oDt", "oLang", "g")
    val bound = Bgp.bgp(quads, Bgp.Pattern("?x", "age", "?age"))
    val adults = Bgp.filterBindings(bound, col("age").cast("int") >= 18)
    adults.select("x").as[String].collect().toSet shouldBe Set("a", "c")
    val withDecade = Bgp.bind(adults, "decade", (col("age").cast("int") / 10).cast("int"))
    withDecade.select("decade").as[Int].collect().toSet shouldBe Set(3, 5)
    Bgp.values(bound, "x", Seq("a", "b")).count() shouldBe 2
  }
}
