package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {
  import spark.implicits._

  "TopK aggregator" should "match the window-based top-k exactly" in {
    val rows = (0 until 5000).map(i => ((i % 37).toLong, (i * 7919 % 1000).toDouble, i.toLong))
    val df = rows.toDF("key", "score", "id")

    val viaAgg = df.groupBy($"key")
      .agg(TopK.topK(3, $"score", $"id").as("top"))
      .select($"key", posexplode($"top").as(Seq("pos", "e")))
      .select($"key", ($"pos" + 1).as("rk"), $"e._2".as("id"))
      .as[(Long, Int, Long)].collect().toSet

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"key").orderBy($"score".desc, $"id")
    val viaWindow = df.withColumn("rk", row_number().over(w))
      .where($"rk" <= 3)
      .select($"key", $"rk", $"id")
      .as[(Long, Int, Long)].collect().toSet

    viaAgg shouldBe viaWindow
  }

  it should "handle groups smaller than k" in {
    val df = Seq((1L, 5.0, 10L), (1L, 7.0, 11L)).toDF("key", "score", "id")
    val top = df.groupBy($"key").agg(TopK.topK(5, $"score", $"id").as("top"))
      .select(org.apache.spark.sql.functions.size($"top")).as[Int].head()
    top shouldBe 2
  }
}
