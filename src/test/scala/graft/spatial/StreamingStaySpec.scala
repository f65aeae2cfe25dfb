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
}
