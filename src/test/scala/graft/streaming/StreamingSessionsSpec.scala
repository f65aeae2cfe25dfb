package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import StreamingSessions.{Closed, SEvent}

class StreamingSessionsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(key: Long, ms: Long, w: Double = 1.0) =
    SEvent(key, new java.sql.Timestamp(ms), w)

  private def startQuery(stream: MemoryStream[SEvent], name: String,
      gapMs: Long, maxOpen: Int = 64, delay: String = "0 seconds") = {
    val ckpt = java.nio.file.Files.createTempDirectory(name).toString
    StreamingSessions.sessions(stream.toDS(), gapMs, delay, maxOpen)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
  }

  private def out(name: String): Seq[Closed] =
    spark.table(name).as[Closed].collect().toSeq

  "sessions" should "close a session once the watermark passes end+gap" in {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[SEvent]
    val q = startQuery(stream, "sess_close", gapMs = 1000)
    try {
      stream.addData(ev(1, 100), ev(1, 600)) // one session [100,600]
      q.processAllAvailable()
      out("sess_close") shouldBe empty // watermark still at 600
      // far-future event advances the watermark past 600+1000…
      stream.addData(ev(2, 50000))
      q.processAllAvailable()
      // …and the NEXT batch fires the event-time timeout
      stream.addData(ev(2, 50001))
      q.processAllAvailable()
      val closed = out("sess_close").filter(_.key == 1L)
      closed shouldBe Seq(Closed(1L, 100L, 600L, 2L, 2.0, forced = false))
    } finally q.stop()
  }

  it should "bridge two provisional sessions when a middle event arrives" in {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[SEvent]
    // 10s watermark allowance: the bridging event arrives one batch late
    val q = startQuery(stream, "sess_bridge", gapMs = 1000, delay = "10 seconds")
    try {
      // two islands 1800ms apart (> gap): provisionally separate sessions
      stream.addData(ev(1, 1000), ev(1, 2800))
      q.processAllAvailable()
      // bridging event within gap of both, inside the lateness allowance
      stream.addData(ev(1, 1900))
      q.processAllAvailable()
      stream.addData(ev(2, 99000))
      q.processAllAvailable()
      stream.addData(ev(2, 99001))
      q.processAllAvailable()
      val closed = out("sess_bridge").filter(_.key == 1L)
      closed shouldBe Seq(Closed(1L, 1000L, 2800L, 3L, 3.0, forced = false))
    } finally q.stop()
  }

  it should "keep separate keys in separate sessions" in {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[SEvent]
    val q = startQuery(stream, "sess_keys", gapMs = 1000)
    try {
      stream.addData(ev(1, 100), ev(2, 150), ev(1, 200))
      q.processAllAvailable()
      stream.addData(ev(9, 77000))
      q.processAllAvailable()
      stream.addData(ev(9, 77001))
      q.processAllAvailable()
      val closed = out("sess_keys").filter(_.key <= 2)
        .map(c => (c.key, c.startMs, c.endMs, c.n)).toSet
      closed shouldBe Set((1L, 100L, 200L, 2L), (2L, 150L, 150L, 1L))
    } finally q.stop()
  }

  it should "force-close the oldest interval beyond maxOpen and mark it" in {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[SEvent]
    val q = startQuery(stream, "sess_cap", gapMs = 10, maxOpen = 2)
    try {
      // three disjoint islands for one key in one batch -> cap of 2 forces
      // the oldest out immediately
      stream.addData(ev(1, 100), ev(1, 1000), ev(1, 2000))
      q.processAllAvailable()
      val forced = out("sess_cap").filter(_.forced)
      forced.map(c => (c.startMs, c.endMs)) shouldBe Seq((100L, 100L))
    } finally q.stop()
  }

  it should "converge to the batch q20 grouping on an in-order replay" in {
    implicit val sqlCtx = spark.sqlContext
    val gap = 30L * 60 * 1000 // q20's 30-minute gap
    val base = 3600000L // shift off epoch 0 (initial watermark drops ts<=0)
    val events = Seq( // (key, minuteOffset)
      (1L, 0L), (1L, 10L), (1L, 50L), (1L, 62L), (2L, 5L), (2L, 90L))
      .map { case (k, m) => ev(k, base + m * 60000) }
    val stream = MemoryStream[SEvent]
    val q = startQuery(stream, "sess_batch", gapMs = gap)
    try {
      stream.addData(events: _*)
      q.processAllAvailable()
      stream.addData(ev(9, 10L * 3600000))
      q.processAllAvailable()
      stream.addData(ev(9, 10L * 3600000 + 1))
      q.processAllAvailable()
      val got = out("sess_batch").filter(_.key <= 2)
        .map(c => (c.key, (c.startMs - base) / 60000,
          (c.endMs - base) / 60000, c.n)).toSet
      // batch grouping with a 30-min gap: key 1 -> {0,10}, {50,62};
      // key 2 -> {5}, {90}
      got shouldBe Set(
        (1L, 0L, 10L, 2L), (1L, 50L, 62L, 2L),
        (2L, 5L, 5L, 1L), (2L, 90L, 90L, 1L))
    } finally q.stop()
  }
}
