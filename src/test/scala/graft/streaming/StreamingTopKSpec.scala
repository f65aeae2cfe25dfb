package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingTopKSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  behavior of "StreamingTopK"

  it should "carry MG candidates across micro-batches with the n/(s+1) guarantee" in {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(11)
    def batch(n: Int): Seq[(String, String)] = (0 until n).map { _ =>
      val r = rnd.nextDouble()
      val v = if (r < 0.4) "hot" else if (r < 0.55) "warm"
        else s"cold${rnd.nextInt(2000)}"
      ("g1", v)
    }
    val b1 = batch(3000)
    val b2 = batch(3000)
    val truth = (b1 ++ b2).groupBy(_._2).view.mapValues(_.size.toLong).toMap

    val seen = scala.collection.mutable.ArrayBuffer[StreamingTopK.MgSummary]()
    val stream = MemoryStream[(String, String)]
    val s = 20
    val q = StreamingTopK.start(
      stream.toDS().toDF("group", "value"), s, tmp("topk-ck")) { (ds, _) =>
      seen.synchronized { seen ++= ds.collect() }
    }
    try {
      stream.addData(b1: _*)
      q.processAllAvailable()
      stream.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()

    val last = seen.last
    last.group shouldBe "g1"
    last.n shouldBe 6000L
    last.values.size should be <= s
    // every value with true count > n/(s+1) must be present...
    val threshold = last.n / (s + 1)
    truth.filter(_._2 > threshold).keySet.foreach { hot =>
      last.values.keySet should contain(hot)
    }
    // ...and counters never exceed the true count, nor undercount by
    // more than n/(s+1)
    last.values.foreach { case (v, c) =>
      c should be <= truth(v)
      c should be >= truth(v) - threshold
    }
  }

  it should "track groups independently" in {
    implicit val sqlCtx = spark.sqlContext
    val seen = scala.collection.mutable.ArrayBuffer[StreamingTopK.MgSummary]()
    val stream = MemoryStream[(String, String)]
    val q = StreamingTopK.start(
      stream.toDS().toDF("group", "value"), 5, tmp("topk-ck2")) { (ds, _) =>
      seen.synchronized { seen ++= ds.collect() }
    }
    try {
      stream.addData(Seq.fill(50)(("a", "x")) ++ Seq.fill(30)(("b", "y")): _*)
      q.processAllAvailable()
    } finally q.stop()
    val byGroup = seen.map(s => s.group -> s).toMap
    byGroup("a").values("x") shouldBe 50L
    byGroup("a").n shouldBe 50L
    byGroup("b").values("y") shouldBe 30L
    byGroup("b").n shouldBe 30L
  }
}
