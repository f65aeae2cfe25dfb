package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming exact dedup — the ingestion-time face of the dedup family:
  * content-hashed documents deduplicated ACROSS micro-batches with
  * Structured Streaming's keyed state (a duplicate arriving in a later
  * batch is dropped, mirroring the batch `Dedup.exact` decision). The
  * watermark bounds state: at 100 TB the key store is per-executor
  * RocksDB-style state keyed by the fingerprint, not a corpus-wide
  * shuffle per batch. */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  "streaming exact dedup" should "drop duplicate content across micro-batches" in {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val deduped = stream.toDF().toDF("doc_id", "text")
      .withColumn("fp", sha2(trim(regexp_replace(lower(col("text")), "\\s+", " ")), 256))
      .dropDuplicates("fp")
    val query = deduped.writeStream
      .format("memory").queryName("dedup_out")
      .outputMode("append")
      .start()

    // batch 1: two distinct docs + an in-batch duplicate
    stream.addData((1L, "alpha beta"), (2L, "gamma delta"), (3L, "Alpha  BETA"))
    query.processAllAvailable()
    // batch 2: a cross-batch duplicate of doc 1 and one new doc
    stream.addData((4L, "alpha beta"), (5L, "epsilon"))
    query.processAllAvailable()
    query.stop()

    val out = spark.table("dedup_out").select("doc_id").as[Long].collect().toSet
    // normalized-content fingerprints: docs 3 and 4 are duplicates of 1
    out should have size 3
    out should contain(5L)
    out.intersect(Set(1L, 3L, 4L)) should have size 1
    out should contain(2L)
  }

  "streaming span dedup" should "pass only never-seen windows across micro-batches" in {
    // the ingestion-time face of exact-substring dedup: window hashes
    // keyed in streaming state, so a span already seen in ANY earlier
    // micro-batch is dropped and only novel windows flow downstream
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val wins = stream.toDF().toDF("doc_id", "text")
      .select(col("doc_id"),
        explode(graft.text.TextAnalysis.wordShingles(col("text"), 3)).as("win"))
      .withColumn("wkey", xxhash64(col("win")))
      .dropDuplicates("wkey")
    val query = wins.writeStream
      .format("memory").queryName("span_out")
      .outputMode("append")
      .start()

    stream.addData((1L, "one two three four five")) // 3 windows, all novel
    query.processAllAvailable()
    // doc 2 repeats the "one two three four" span; only its leading
    // window is new
    stream.addData((2L, "zero one two three four"))
    query.processAllAvailable()
    query.stop()

    val rows = spark.table("span_out").select("doc_id", "win")
      .as[(Long, String)].collect()
    rows.count(_._1 == 1L) shouldBe 3
    rows.filter(_._1 == 2L).map(_._2).toSeq shouldBe Seq("zero one two")
  }
}
