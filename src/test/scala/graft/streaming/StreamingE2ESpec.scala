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

  private def partitionState(dir: java.nio.file.Path): Map[String, (Long, Long)] = {
    import scala.jdk.CollectionConverters._
    Files.walk(dir).iterator().asScala
      .filter(p => Files.isRegularFile(p) && !p.getFileName.toString.startsWith("."))
      .map(p => (dir.relativize(p).toString,
        (Files.size(p), Files.getLastModifiedTime(p).toMillis)))
      .toMap
  }

  it should "leave untouched graph partitions byte-identical and drop emptied ones" in {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Quad]
    val root = Files.createTempDirectory("graft-store-scoped")
    val storePath = root.resolve("quads").toString
    val negations = Seq(
      Quad("z", "name", "zoe", Quad.LITERAL, null, null, "neg")).toDS().toDF()

    val query = QuadPipeline.run(spark, stream.toDF(), storePath, negations,
        Seq.empty, triggerMs = 100)
      .start()
    try {
      stream.addData(
        Quad("a", "name", "alice", Quad.LITERAL, null, null, "docA"),
        Quad("b", "name", "bob", Quad.LITERAL, null, null, "docB"))
      query.processAllAvailable()

      val docBdir = root.resolve("quads").resolve("g=docB")
      val before = partitionState(docBdir)
      before should not be empty

      // second batch touches only docA: docB's partition files must remain
      // the same files with the same bytes and timestamps (not rewritten)
      stream.addData(Quad("a", "name", "alicia", Quad.LITERAL, null, null, "docA"))
      query.processAllAvailable()
      partitionState(docBdir) shouldBe before
      spark.read.parquet(storePath).where($"g" === "docA")
        .select("o").as[String].collect().toSeq shouldBe Seq("alicia")

      // third batch replaces docA with a fully-negated payload: the graph
      // empties and its partition directory is dropped; docB still intact
      stream.addData(Quad("z", "name", "zoe", Quad.LITERAL, null, null, "docA"))
      query.processAllAvailable()
      Files.exists(root.resolve("quads").resolve("g=docA")) shouldBe false
      partitionState(docBdir) shouldBe before
      spark.read.parquet(storePath).where($"g" === "docB").count() shouldBe 1
    } finally query.stop()
  }
}
