package graft.text

import graft.SparkSpec
import graft.operators.{Expectations, SetSimJoin}
import org.apache.spark.sql.functions._

/** Composition of this round's curation operators as one batch chain:
  * NFC normalization → compression-ratio gate → exact dedup on NFC
  * keys → containment-based subset removal → expectations audit. Each
  * stage is the operator the driver queries verify individually; this
  * spec proves they compose — same column contracts, no surprises at
  * the seams.
  */
class CurationComposeSpec extends SparkSpec {
  import spark.implicits._

  private val article =
    "the quick brown fox jumps over the lazy dog and keeps running " +
      "through a long meadow full of genuinely varied words"

  "the curation chain" should "normalize, gate, dedup, and audit" in {
    val docs = Seq(
      (1L, "caf\u00e9 " + article), //         keeper
      (2L, "cafe\u0301 " + article), //        same text, decomposed form -> dup of 1
      (3L, "spam spam " * 200), //             template spam: compresses away
      (4L, "the quick brown fox jumps"), //    subset of 1's vocabulary
      (5L, "an entirely different document about other topics altogether"))
      .toDF("doc_id", "text")

    // 1) NFC: the composed/decomposed pair now shares a byte-identical text
    val normalized = Normalize.nfcCol(docs, "text", "text_nfc")

    // 2) compression gate: template spam sits far below natural prose
    val gated = Compression.profile(normalized, "doc_id", "text_nfc")
      .select(col("id").as("doc_id"), col("ratio_ppm"))
      .join(normalized, "doc_id")
      .where(col("ratio_ppm") > 200000) // < 20% of original = repetitive junk
    gated.select("doc_id").as[Long].collect().toSet shouldBe
      Set(1L, 2L, 4L, 5L)

    // 3) exact dedup on the NFC key: 2 collapses into 1 (min id wins)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(sha2(col("text_nfc"), 256))
    val deduped = gated
      .withColumn("keep", col("doc_id") === min(col("doc_id")).over(w))
      .where(col("keep")).drop("keep")
    deduped.select("doc_id").as[Long].collect().toSet shouldBe
      Set(1L, 4L, 5L)

    // 4) containment: 4's vocabulary is inside 1's -> drop the subset
    val toks = deduped.select(col("doc_id").as("id"),
      array_distinct(filter(split(col("text_nfc"), "[\\s\\p{Punct}]+"),
        t => org.apache.spark.sql.functions.length(t) > 0)).as("toks"))
    val contained = SetSimJoin
      .containmentPairsTokens(toks, "id", "toks", num = 4, den = 5)
      .select(col("id_small")).distinct()
    val finalDocs = deduped.join(contained,
      deduped("doc_id") === contained("id_small"), "left_anti")
    finalDocs.select("doc_id").as[Long].collect().toSet shouldBe Set(1L, 5L)

    // 5) audit the output corpus: the invariants a downstream trainer
    // assumes, checked in one pass
    val audit = Expectations.check(finalDocs, Seq(
      Expectations.NotNull("text_nfc"),
      Expectations.Unique("doc_id")))
    audit.where(!col("passed")).count() shouldBe 0
  }
}
