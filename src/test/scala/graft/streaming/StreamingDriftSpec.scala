package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingDriftSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  "StreamingDrift" should "stay quiet on in-distribution batches and alarm on a shift" in {
    implicit val sqlCtx = spark.sqlContext
    val refDir = tmp("drift-ref")
    val rnd = new scala.util.Random(41)
    val reference = Seq.fill(2000)(rnd.nextInt(30).toLong).toDF("score")
    StreamingDrift.writeReference(reference, "score", refDir)

    val verdicts = scala.collection.mutable.ArrayBuffer[(Long, Long, Boolean)]()
    val stream = MemoryStream[Long]
    val q = StreamingDrift.start(stream.toDS().toDF("score"), "score",
      refDir, tmp("drift-ck"), alarmPpm = 150000) { v =>
      verdicts.synchronized {
        verdicts ++= v.select("batch_id", "d_ppm", "drifted")
          .as[(Long, Long, Boolean)].collect()
      }
    }
    try {
      // batch 0: same generator -> below alarm
      stream.addData(Seq.fill(800)(rnd.nextInt(30).toLong): _*)
      q.processAllAvailable()
      // batch 1: location shift -> alarm
      stream.addData(Seq.fill(800)(rnd.nextInt(30).toLong + 15L): _*)
      q.processAllAvailable()
    } finally q.stop()

    val byBatch = verdicts.map(v => v._1 -> v).toMap
    byBatch(0L)._3 shouldBe false
    byBatch(1L)._3 shouldBe true
    byBatch(1L)._2 should be > byBatch(0L)._2
  }

  "scoreBatch" should "report zero drift against itself" in {
    val refDir = tmp("drift-ref2")
    val data = Seq.tabulate(100)(i => (i % 7).toLong).toDF("score")
    StreamingDrift.writeReference(data, "score", refDir)
    StreamingDrift.scoreBatch(data, "score", refDir, 0L, 100000)
      .select("d_ppm").as[Long].head() shouldBe 0L
  }
}
