package graft.streaming

import graft.SparkSpec
import graft.functions.Sketches
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming distinct-count via HLL registers AS the streaming state:
  * `hllRegisters` is select + groupBy(max), so running it on a stream
  * makes the register table a NATIVE stateful aggregation — update-mode
  * max per (group, bucket), exactly-once across micro-batches, and the
  * state size is O(groups × 1024) whatever the stream's cardinality.
  * Register max is idempotent, so replays/duplicates can't skew it —
  * the sketch-merge property doing the work of custom state code. */
class StreamingHllSpec extends SparkSpec {
  import spark.implicits._

  "streaming hll registers" should "converge to the batch sketch across micro-batches" in {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, Long)]
    val regs = Sketches.hllRegisters(
      stream.toDF().toDF("grp", "key"), Seq("grp"), col("key").cast("string"))
    val q = regs.writeStream.format("memory").queryName("hll_regs")
      .outputMode("complete").start()
    try {
      val batch1 = (1L to 400L).map(i => ("a", i)) ++ (1L to 50L).map(i => ("b", i))
      stream.addData(batch1: _*)
      q.processAllAvailable()
      // batch 2 overlaps batch 1 heavily — idempotent max absorbs it
      val batch2 = (200L to 600L).map(i => ("a", i)) ++ (40L to 90L).map(i => ("b", i))
      stream.addData(batch2: _*)
      q.processAllAvailable()

      val streamed = spark.table("hll_regs")
        .as[(String, Long, Int)].collect().toSet
      val batchEquiv = Sketches.hllRegisters(
          (batch1 ++ batch2).toDF("grp", "key"), Seq("grp"), col("key").cast("string"))
        .as[(String, Long, Int)].collect().toSet
      streamed shouldBe batchEquiv

      // and the estimates recovered from the streamed registers are sane
      val est = Sketches.hllEstimate(
          (batch1 ++ batch2).toDF("grp", "key"), Seq("grp"), col("key").cast("string"))
        .select("grp", "estimate").as[(String, Double)].collect().toMap
      est("a") shouldBe 600.0 +- 60.0
      est("b") shouldBe 90.0 +- 15.0
    } finally q.stop()
  }
}
