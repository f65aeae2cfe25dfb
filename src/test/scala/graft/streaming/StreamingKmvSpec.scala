package graft.streaming

import graft.SparkSpec
import graft.operators.KmvSketch
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming distinct-count + overlap via KMV sketches AS the streaming
  * state: [[KmvSketch.sketches]] is select + groupBy(bounded aggregator),
  * so on a stream the sketch table is a NATIVE stateful aggregation —
  * O(groups × k) state forever, insert-idempotent (duplicates and
  * replays cannot move a k-smallest-distinct set), and unlike the HLL
  * registers the resulting per-group state still supports SET
  * OPERATIONS (union re-cut, intersection by inclusion-exclusion). */
class StreamingKmvSpec extends SparkSpec {
  import spark.implicits._

  "streaming kmv sketches" should "converge to the batch sketch across overlapping micro-batches" in {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, Long)]
    val sk = KmvSketch.sketches(
      stream.toDF().toDF("grp", "key"), "grp", col("key"))
    val q = sk.writeStream.format("memory").queryName("kmv_sk")
      .outputMode("complete").start()
    try {
      val batch1 = (1L to 300L).map(i => ("a", i)) ++ (1L to 40L).map(i => ("b", i))
      stream.addData(batch1: _*)
      q.processAllAvailable()
      // heavy overlap with batch 1: idempotent inserts absorb it
      val batch2 = (150L to 500L).map(i => ("a", i)) ++ (30L to 70L).map(i => ("b", i))
      stream.addData(batch2: _*)
      q.processAllAvailable()

      val streamed = spark.table("kmv_sk")
        .select("g", "sk", "est_n")
        .as[(String, Seq[Long], Long)].collect()
        .map(t => t._1 -> ((t._2, t._3))).toMap
      val batchEquiv = KmvSketch.sketches(
          (batch1 ++ batch2).toDF("grp", "key"), "grp", col("key"))
        .as[(String, Seq[Long], Long)].collect()
        .map(t => t._1 -> ((t._2, t._3))).toMap
      streamed shouldBe batchEquiv
      // exact below capacity: group b has 70 distinct keys > 64 → estimate;
      // sanity-band both
      // k=64 ⇒ rse ≈ 13%; this particular md5 realization sits ~2.7σ
      // high on group a (674 for 500 true) — deterministic, so the band
      // documents the sketch's accuracy class, not a flake margin
      streamed("a")._2.toDouble shouldBe 500.0 +- 250.0
      streamed("b")._2.toDouble shouldBe 70.0 +- 25.0
    } finally q.stop()
  }
}
