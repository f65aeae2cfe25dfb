package graft.streaming

import graft.SparkSpec
import graft.text.{Normalize, Pii, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming curation front door — the batch pipeline's GATE stages
  * (NFC normalize → PII redact → Gopher quality) are all stateless
  * projections/filters, so they run unchanged INSIDE a streaming
  * query; the one stateful stage (exact dedup across batches and
  * RUNS) is [[StreamingExactDedup]]'s persisted digest index. This
  * pins the composition: documents arriving over micro-batches come
  * out curated exactly like a batch run of the same gates. */
class StreamingCurationSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  // the batch pipeline's gate stages, applied to any (doc_id, text) frame
  private def gates(df: DataFrame): DataFrame = {
    val normalized = Normalize.nfcCol(df, "text", "text_nfc")
    val redacted = Pii.redact(normalized, "text_nfc", out = "text_clean")
    redacted.where(TextAnalysis.gopherStats(col("text_clean"),
        Seq("the", "a", "of", "and")).getField("passes") === 1)
      .select(col("doc_id"), col("text_clean"))
  }

  private val good =
    ("the marvelous story of the ancient forest fox and the sleeping dog " * 8).trim
  private val short_ = "too short"
  private val withPii = ("write someone@example.com today because " +
    "the marvelous story of the ancient forest fox and the sleeping dog " * 8).trim

  "streaming curation" should "apply the batch gates per micro-batch and dedup across batches" in {
    implicit val sqlCtx = spark.sqlContext
    val sunk = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    val (indexDir, ckpt) = (tmp("cur-idx"), tmp("cur-ck"))
    val stream = MemoryStream[(Long, String)]
    val q = StreamingExactDedup.start(
      gates(stream.toDS().toDF("doc_id", "text")),
      "text_clean", "doc_id", indexDir, ckpt) { batch =>
      sunk.synchronized {
        sunk ++= batch.select("doc_id", "text_clean").as[(Long, String)].collect()
      }
    }
    try {
      stream.addData((1L, good), (2L, short_), (3L, withPii))
      q.processAllAvailable()
      // batch 2 repeats doc 1's text verbatim → cross-batch dedup drops it
      stream.addData((4L, good), (5L, good + " with a new ending sentence"))
      q.processAllAvailable()
    } finally q.stop()

    val out = sunk.sorted.toList
    out.map(_._1) shouldBe List(1L, 3L, 5L)
    // the PII gate ran before dedup: the surviving text is redacted
    out.find(_._1 == 3L).get._2 should not include "someone@example.com"
    // and the curated set equals a BATCH run of the same gates + dedup
    val batchEquiv = gates(Seq(
        (1L, good), (2L, short_), (3L, withPii),
        (4L, good), (5L, good + " with a new ending sentence"))
        .toDF("doc_id", "text"))
    val batchDeduped = StreamingExactDedup.dedupBatch(
      batchEquiv, "text_clean", "doc_id", tmp("cur-idx2"), "batchrun", 0L)
    batchDeduped.select("doc_id").as[Long].collect().sorted.toList shouldBe
      List(1L, 3L, 5L)
  }
  it should "chain the gates into streaming NEAR-dup dedup (first-seen-wins across batches)" in {
    implicit val sqlCtx = spark.sqlContext
    val sunk = scala.collection.mutable.ArrayBuffer[Long]()
    val (indexDir, ckpt) = (tmp("curf-idx"), tmp("curf-ck"))
    val stream = MemoryStream[(Long, String)]
    val q = StreamingFuzzyDedup.start(
      gates(stream.toDS().toDF("doc_id", "text")),
      "text_clean", "doc_id", indexDir, ckpt) { batch =>
      sunk.synchronized { sunk ++= batch.select("doc_id").as[Long].collect() }
    }
    try {
      stream.addData((1L, good), (2L, short_))
      q.processAllAvailable()
      // near-dup (not byte-equal) of doc 1 arrives later → dropped by
      // the FUZZY index where exact dedup would have kept it
      stream.addData((3L, good + " with one extra closing sentence"))
      q.processAllAvailable()
    } finally q.stop()
    sunk.sorted.toList shouldBe List(1L)
  }

  it should "split-tag the streamed corpus exactly like the batch pipeline" in {
    implicit val sqlCtx = spark.sqlContext
    // three families across two batches: A = {1, verbatim 4, near-dup 6},
    // B = {2, near-dup 5}, C = {3} — monotone ids, so streamed keepers
    // are the batch clustering's min-id roots
    val textA = good
    val textB = (("the calm river of the quiet and ancient valley " +
      "walked the gentle dog of a warm day ") * 8).trim
    val textC = (("the patient owl of a winter night watched " +
      "the silver moon and the sleeping field ") * 8).trim
    val corpus = Seq(
      (1L, textA), (2L, textB), (3L, textC),
      (4L, textA), (5L, textB + " with one extra closing sentence"),
      (6L, textA + " and one more trailing thought"))

    val tagged = scala.collection.mutable.ArrayBuffer[(Long, Long, Int)]()
    val (indexDir, ckpt) = (tmp("curs-idx"), tmp("curs-ck"))
    val stream = MemoryStream[(Long, String)]
    val q = StreamingFuzzyDedup.start(
      gates(stream.toDS().toDF("doc_id", "text")),
      "text_clean", "doc_id", indexDir, ckpt) { batch =>
      val withSplit = StreamingFuzzyDedup.splitTag(batch, "doc_id")
      tagged.synchronized {
        tagged ++= withSplit.select("doc_id", "cluster_id", "split")
          .as[(Long, Long, Int)].collect()
      }
    }
    try {
      stream.addData(corpus.take(3): _*)
      q.processAllAvailable()
      stream.addData(corpus.drop(3): _*)
      q.processAllAvailable()
    } finally q.stop()

    // batch pipeline over the same corpus: the full-membership split frame
    val (_, _, splits, _) = graft.tools.Curate.run(
      corpus.toDF("doc_id", "text")
        .withColumn("source", lit("s")), // Curate expects a source column
      Seq((99L, "benchmark text never colliding")).toDF("doc_id", "text"))
    val batchSplit = splits.select("doc_id", "cluster_id", "split")
      .as[(Long, Long, Int)].collect().map(t => t._1 -> (t._2, t._3)).toMap

    // streamed keepers carry the batch run's exact (cluster_id, split)
    tagged should not be empty
    tagged.foreach { case (id, cid, sp) =>
      withClue(s"doc $id: ") { batchSplit(id) shouldBe ((cid, sp)) }
    }
    // and every batch-side family member (kept OR dropped) shares its
    // streamed keeper's split — the leakage-safety contract end to end
    val streamedSplit = tagged.map(t => t._2 -> t._3).toMap
    batchSplit.foreach { case (_, (cid, sp)) =>
      streamedSplit.get(cid).foreach(_ shouldBe sp)
    }
  }

}
