package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.rdf.{Quad, QuadDiff}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** End-to-end Structured Streaming run of the quad pipeline: MemoryStream
  * of quads → foreachBatch replace-graph upsert + enricher → parquet store
  * partitioned by g. */
class StreamingE2ESpec extends SparkSpec {
  import spark.implicits._

  "QuadPipeline.run" should "ingest micro-batches into a graph-partitioned store" in {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Quad]
    val storePath = Files.createTempDirectory("graft-store").resolve("quads").toString
    val noNeg = spark.createDataset(Seq.empty[Quad]).toDF()

    val upperEnr: QuadPipeline.Enricher = (_, diff) => QuadDiff(
      diff.added.where($"p" === "name")
        .select($"s", lit("NAME").as("p"), upper($"o").as("o"), $"oKind",
          $"oDt", $"oLang", lit("enr").as("g")),
      diff.removed.limit(0))

    val query = QuadPipeline.run(spark, stream.toDF(), storePath, noNeg,
        Seq(upperEnr), triggerMs = 100)
      .start()
    try {
      stream.addData(
        Quad("a", "name", "alice", Quad.LITERAL, null, null, "doc1"),
        Quad("b", "age", "30", Quad.LITERAL, null, null, "doc1"))
      query.processAllAvailable()

      val store = spark.read.parquet(storePath)
      store.where($"g" === "doc1").count() shouldBe 2
      store.where($"g" === "enr").select("o").as[String].collect().toSeq shouldBe Seq("ALICE")

      // second micro-batch replaces doc1: alice renamed, b dropped
      stream.addData(Quad("a", "name", "alicia", Quad.LITERAL, null, null, "doc1"))
      query.processAllAvailable()

      val store2 = spark.read.parquet(storePath)
      store2.where($"g" === "doc1").select("o").as[String].collect().toSeq shouldBe Seq("alicia")
      store2.where($"g" === "enr").select("o").as[String].collect().toSet should contain("ALICIA")
    } finally query.stop()
  }
}
