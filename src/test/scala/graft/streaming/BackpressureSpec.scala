package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.FileIngest
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.Trigger

/** T7 — demand/backpressure bound on the incremental file source: the
  * reference's synchronizers respond to Akka Streams demand one batch at
  * a time; the Spark analogue is the file source's `maxFilesPerTrigger`
  * (set in [[FileIngest.streamScan]]). Under a file flood every
  * micro-batch must stay within the bound and the stream must still
  * drain completely. */
class BackpressureSpec extends SparkSpec {

  "streamScan" should "cap files per micro-batch under a file flood and still drain" in {
    val dir = Files.createTempDirectory("graft-flood")
    (0 until 20).foreach { i =>
      Files.writeString(dir.resolve(f"doc$i%02d.txt"), s"content $i")
    }
    val batchFiles = scala.collection.mutable.ArrayBuffer[Long]()
    val q = FileIngest.streamScan(spark, dir.toString, maxFilesPerTrigger = 3)
      .writeStream
      .foreachBatch { (batch: Dataset[FileIngest.RawDoc], _: Long) =>
        batchFiles.synchronized {
          batchFiles += batch.select("path").distinct().count()
        }
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft-flood-ckpt").toString)
      .trigger(Trigger.AvailableNow()) // drain everything, honoring the bound
      .start()
    q.awaitTermination(120000) shouldBe true
    batchFiles.sum shouldBe 20L // every file processed exactly once
    all(batchFiles) should be <= 3L // never more than the demand bound
    batchFiles.size should be >= 7 // ceil(20/3) micro-batches at minimum
  }
}
