package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import StreamingAsOf.{Event, Match}

class StreamingAsOfSpec extends SparkSpec {
  import spark.implicits._

  private def build(key: Long, ts: Long, v: Double) =
    Event(key, ts, isBuild = true, v, probeId = -1L)
  private def probe(key: Long, ts: Long, id: Long) =
    Event(key, ts, isBuild = false, 0.0, probeId = id)

  "enrich" should "match probes against all builds seen so far, event-time correct" in {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val ckpt = java.nio.file.Files.createTempDirectory("asof-ckpt").toString
    val q = StreamingAsOf.enrich(stream.toDS())
      .writeStream.format("memory").queryName("asof_out")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      // batch 1: two quotes then a probe after both; one probe before any
      stream.addData(build(1, 10, 100.0), build(1, 20, 101.0),
        probe(1, 25, 1001), probe(1, 5, 1002))
      q.processAllAvailable()
      // batch 2: a newer build; a LATE probe at ts 15 must still match
      // the ts-10 build (event-time binary search), not ts-30
      stream.addData(build(1, 30, 102.0), probe(1, 15, 1003),
        probe(1, 35, 1004), probe(2, 50, 1005))
      q.processAllAvailable()
      val got = spark.table("asof_out").as[Match].collect()
        .map(m => m.probeId -> ((m.matchTs, m.matchValue))).toMap
      got shouldBe Map(
        1001L -> ((Some(20L), Some(101.0))),
        1002L -> ((None, None)),            // before any build
        1003L -> ((Some(10L), Some(100.0))), // late probe, event-time match
        1004L -> ((Some(30L), Some(102.0))),
        1005L -> ((None, None)))            // other key: no state
    } finally q.stop()
  }

  it should "apply the build-before-probe tie rule within a batch" in {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val ckpt = java.nio.file.Files.createTempDirectory("asof-ckpt2").toString
    val q = StreamingAsOf.enrich(stream.toDS())
      .writeStream.format("memory").queryName("asof_tie")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      stream.addData(probe(7, 100, 2001), build(7, 100, 9.0))
      q.processAllAvailable()
      val got = spark.table("asof_tie").as[Match].collect().head
      got.matchTs shouldBe Some(100L) // equal-ts build visible to the probe
      got.matchValue shouldBe Some(9.0)
    } finally q.stop()
  }

  it should "bound per-key state to maxStatePerKey newest builds" in {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val ckpt = java.nio.file.Files.createTempDirectory("asof-ckpt3").toString
    val q = StreamingAsOf.enrich(stream.toDS(), maxStatePerKey = 2)
      .writeStream.format("memory").queryName("asof_trim")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      stream.addData(build(3, 10, 1.0), build(3, 20, 2.0), build(3, 30, 3.0))
      q.processAllAvailable()
      // ts-10 was trimmed: a probe at 15 finds nothing retained <= 15
      stream.addData(probe(3, 15, 3001), probe(3, 99, 3002))
      q.processAllAvailable()
      val got = spark.table("asof_trim").as[Match].collect()
        .map(m => m.probeId -> m.matchTs).toMap
      got shouldBe Map(3001L -> None, 3002L -> Some(30L))
    } finally q.stop()
  }
}
