package graft.streaming

import graft.SparkSpec
import graft.sources.Warc
import org.apache.spark.sql.functions._

/** End-to-end LIVE curation pipeline — the whole web-scale ingest chain
  * as ONE continuous query: WARC landing directory → record parse →
  * HTML visible-text extraction (native `html_text`) → hashed-linear
  * quality gate (native `linear_score`) → cross-batch exact dedup —
  * every stage the same operator the batch queries use, composed under
  * Structured Streaming. Two micro-batches prove incremental arrival,
  * per-stage filtering, and dedup state across batches. */
class StreamingCurationE2ESpec extends SparkSpec {
  import spark.implicits._

  private val date = "2026-01-01T00:00:00Z"

  private def page(id: Long, body: String): Array[Byte] =
    Warc.writeRecord("response", s"<urn:uuid:p$id>", date,
      Some(s"http://example.org/p/$id"),
      Some("application/http;msgtype=response"),
      Warc.httpResponse(body.getBytes("UTF-8"), "text/html"))

  private def html(text: String): String =
    s"<html><head><title>t</title></head><body><p>$text</p></body></html>"

  "the streaming curation pipeline" should "ingest, extract, gate and dedup live" in {
    val dir = java.nio.file.Files.createTempDirectory("curation-stream")
    val ckpt = java.nio.file.Files.createTempDirectory("curation-ckpt")
    // single-bucket model: score = n_tokens, threshold 3 drops short docs
    val weights = Seq(1.0)

    java.nio.file.Files.write(dir.resolve("a.warc"), Warc.writeFile(Seq(
      page(1, html("a genuinely long enough article body here")), // keeps
      page(2, html("too short")),                                 // gated out
      page(3, html("a genuinely long enough article body here"))  // dup of 1
    )))

    val curated = Warc.readStreamFiles(spark, dir.toString)
      .where(col("warc_type") === "response")
      // content is the HTTP response: drop the header block, keep the body
      .select(col("target_uri"),
        expr("substr(decode(content, 'UTF-8')," +
          " instr(decode(content, 'UTF-8'), '\r\n\r\n') + 4)").as("body"))
      .select(col("target_uri"),
        call_function("html_text", col("body")).as("text"))
      .withColumn("score",
        call_function("linear_score", col("text"),
          array(weights.map(lit): _*), lit(0.0)))
      .where(col("score") > 3.0)
      .withColumn("fp", sha2(trim(regexp_replace(lower(col("text")), "\\s+", " ")), 256))
      .dropDuplicates("fp")

    val q = curated.writeStream.format("memory").queryName("curated_docs")
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val b1 = spark.table("curated_docs")
        .select("target_uri").as[String].collect().toSet
      b1 shouldBe Set("http://example.org/p/1") // gated + in-batch dedup

      // batch 2: one novel page, one cross-batch duplicate of page 1
      java.nio.file.Files.write(dir.resolve("b.warc"), Warc.writeFile(Seq(
        page(4, html("a different but equally long article body instead")),
        page(5, html("a genuinely long enough article body here"))
      )))
      q.processAllAvailable()
      val b2 = spark.table("curated_docs")
        .select("target_uri").as[String].collect().toSet
      b2 shouldBe Set("http://example.org/p/1", "http://example.org/p/4")
      // the extracted text is the visible text, not markup
      spark.table("curated_docs").select("text").as[String].collect()
        .foreach { t => t should not include "<p>"; t should not include "title" }
    } finally q.stop()
  }
}
