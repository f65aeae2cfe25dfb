package graft.spatial

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingStaySpec extends SparkSpec {
  import spark.implicits._

  private val minute = 60000L

  "extractStaysIncremental" should "carry open clusters across micro-batches" in {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[StayExtraction.Obs]
    val stays = StayExtraction.extractStaysIncremental(stream.toDS())
    val query = stays.writeStream
      .format("memory")
      .queryName("stays_out")
      .outputMode(OutputMode.Append)
      .start()
    try {
      // batch 1: first 10 minutes of a dwell — stay not yet complete
      stream.addData((0 until 10).map(i =>
        StayExtraction.Obs(1L, i * minute, 40.0, -74.0, 20.0)): _*)
      query.processAllAvailable()
      spark.table("stays_out").count() shouldBe 0

      // batch 2: ten more minutes at the same spot, then a far jump that
      // closes the cluster -> the 19-minute stay is emitted
      stream.addData(
        ((10 until 20).map(i => StayExtraction.Obs(1L, i * minute, 40.0, -74.0, 20.0)) :+
          StayExtraction.Obs(1L, 21 * minute, 45.0, -70.0, 20.0)): _*)
      query.processAllAvailable()
      val result = spark.table("stays_out")
        .as[StayExtraction.Stay].collect()
      result.length shouldBe 1
      result.head.n_obs shouldBe 20
      result.head.end_ms - result.head.start_ms shouldBe 19 * minute

      // matches the batch operator on the same (complete) observation set
      val batchObs = (0 until 20).map(i =>
        StayExtraction.Obs(1L, i * minute, 40.0, -74.0, 20.0)) :+
        StayExtraction.Obs(1L, 21 * minute, 45.0, -70.0, 20.0)
      // include a trailing far observation so the batch path flushes too
      val batchStays = StayExtraction.extractStays(spark.createDataset(batchObs)).collect()
      batchStays.map(s => (s.start_ms, s.end_ms, s.n_obs)).toSet shouldBe
        result.map(s => (s.start_ms, s.end_ms, s.n_obs)).toSet
    } finally query.stop()
  }

  "WindowedStays.extractStaysIncremental" should
    "carry the candidate SET across batches and match the batch stage-1 pass" in {
    implicit val sqlCtx = spark.sqlContext
    val siteA = (40.0, -74.0)
    val siteB = (40.02, -74.0)
    // interleaved A/B trace (site switch every few minutes), split
    // mid-stream: the multi-candidate state must survive the batch cut
    // two trailing far observations: the first closes everything except
    // the retained most-recent candidate (the reference keeps it when the
    // whole window empties), the second flushes that one too
    val trace = (0 to 90 by 2).map { m =>
      val (lat, lon) = if (m % 8 == 6) siteB else siteA
      StayExtraction.Obs(7L, m * minute, lat, lon, 30.0)
    } ++ Seq(
      StayExtraction.Obs(7L, 300 * minute, 45.0, -70.0, 30.0),
      StayExtraction.Obs(7L, 302 * minute, 45.0, -70.0, 30.0))

    val stream = MemoryStream[StayExtraction.Obs]
    val stays = WindowedStays.extractStaysIncremental(stream.toDS())
    val query = stays.writeStream
      .format("memory")
      .queryName("wstays_out")
      .outputMode(OutputMode.Append)
      .start()
    try {
      val (batch1, batch2) = trace.splitAt(20)
      stream.addData(batch1: _*)
      query.processAllAvailable()
      stream.addData(batch2: _*)
      query.processAllAvailable()
      val streamed = spark.table("wstays_out").as[StayExtraction.Stay].collect()
        .map(s => (s.start_ms, s.end_ms, s.n_obs)).toSet
      // reference result: the batch stage-1 clustering over the full trace
      val batchClosed = WindowedStays.clusterPass(trace.toIndexedSeq,
          WindowedStays.DefaultLookupMs, WindowedStays.DefaultLambda)
        .filter(c => c.toMs - c.fromMs >= WindowedStays.DefaultMinStayMs)
        .map(c => (c.fromMs, c.toMs, c.memberIdx.size)).toSet
      streamed shouldBe batchClosed
      // the interleaved trace must yield BOTH site stays (the windowed
      // semantics the greedy incremental variant cannot produce)
      streamed.size shouldBe 2
    } finally query.stop()
  }
}
