package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.operators.Scd
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingScdSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  private def ts(s: Long) = new Timestamp(s * 1000)

  behavior of "StreamingScd"

  it should "emit closed episodes exactly once and converge to the batch builder" in {
    implicit val sqlCtx = spark.sqlContext
    val b1 = Seq(("k1", "red", ts(10), 1L), ("k1", "red", ts(20), 2L),
      ("k2", "blue", ts(15), 3L))
    val b2 = Seq(("k1", "green", ts(30), 4L), ("k2", "blue", ts(40), 5L),
      ("k2", "gold", ts(50), 6L))

    val seen = scala.collection.mutable.ArrayBuffer[StreamingScd.Episode]()
    val stream = MemoryStream[(String, String, Timestamp, Long)]
    val q = StreamingScd.start(
      stream.toDS().toDF("key", "value", "ts", "tie"), tmp("scd-ck")) {
      (ds, _) => seen.synchronized { seen ++= ds.collect() }
    }
    try {
      stream.addData(b1: _*)
      q.processAllAvailable()
      stream.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()

    seen.count(_.late) shouldBe 0
    // closed episodes appear exactly once
    val closed = seen.filter(e => e.valid_to.isDefined)
    closed.groupBy(e => (e.key, e.value, e.valid_from)).values
      .foreach(_.size shouldBe 1)
    // reconstruct: latest open row per key + closed rows == batch SCD2
    val openByKey = seen.filter(_.valid_to.isEmpty)
      .groupBy(_.key).view.mapValues(_.maxBy(_.valid_from.getTime)).toMap
    val gotEpisodes = (closed.map(e =>
        (e.key, e.value, e.valid_from.getTime, e.valid_to.map(_.getTime))) ++
      openByKey.values.map(e =>
        (e.key, e.value, e.valid_from.getTime, None))).toSet
    val batch = Scd.type2((b1 ++ b2).toDF("key", "value", "ts", "tie"),
        Seq("key"), "ts", "tie", Seq("value"))
      .select(col("key"), col("value"), col("valid_from"), col("valid_to"))
      .as[(String, String, Timestamp, Timestamp)].collect()
      .map { case (k, v, f, t) =>
        val open = t.getTime > ts(1000000).getTime // the 9999 sentinel
        (k, v, f.getTime, if (open) None else Some(t.getTime))
      }.toSet
    gotEpisodes shouldBe batch
  }

  it should "flag late events instead of rewriting emitted history" in {
    implicit val sqlCtx = spark.sqlContext
    val seen = scala.collection.mutable.ArrayBuffer[StreamingScd.Episode]()
    val stream = MemoryStream[(String, String, Timestamp, Long)]
    val q = StreamingScd.start(
      stream.toDS().toDF("key", "value", "ts", "tie"), tmp("scd-ck2")) {
      (ds, _) => seen.synchronized { seen ++= ds.collect() }
    }
    try {
      stream.addData(("k1", "red", ts(100), 1L))
      q.processAllAvailable()
      stream.addData(("k1", "stale", ts(50), 2L)) // older than the open episode
      q.processAllAvailable()
    } finally q.stop()
    val late = seen.filter(_.late)
    late.map(e => (e.key, e.value)) shouldBe Seq(("k1", "stale"))
    // the open episode is untouched
    seen.filter(e => !e.late && e.valid_to.isEmpty)
      .map(_.value).toSeq shouldBe Seq("red")
  }

  it should "not re-emit anything for unchanged values" in {
    implicit val sqlCtx = spark.sqlContext
    val seen = scala.collection.mutable.ArrayBuffer[StreamingScd.Episode]()
    val stream = MemoryStream[(String, String, Timestamp, Long)]
    val q = StreamingScd.start(
      stream.toDS().toDF("key", "value", "ts", "tie"), tmp("scd-ck3")) {
      (ds, _) => seen.synchronized { seen ++= ds.collect() }
    }
    try {
      stream.addData(("k1", "red", ts(10), 1L))
      q.processAllAvailable()
      val before = seen.size
      stream.addData(("k1", "red", ts(20), 2L)) // same value — no change
      q.processAllAvailable()
      seen.size shouldBe before
    } finally q.stop()
  }
}
