package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, 300L), (2L, 300L), (3L, 100L), (4L, 0L), (5L, 900L))
    .toDF("doc_id", "n_tok")

  "Packing.concatChunks" should "lay out the concat-and-chunk spans exactly" in {
    val out = Packing.concatChunks(docs, "doc_id", "n_tok", capacity = 512)
      .orderBy("doc_id")
      .select("doc_id", "tok_start", "tok_end", "first_chunk", "last_chunk", "n_chunks")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    out shouldBe Seq(
      (1L, 0L, 300L, 0L, 0L, 1L),
      (2L, 300L, 600L, 0L, 1L, 2L), // straddles the 512 cut
      (3L, 600L, 700L, 1L, 1L, 1L),
      // doc 4 (zero-length) dropped
      (5L, 700L, 1600L, 1L, 3L, 3L)) // spans chunks 1..3
  }

  it should "match a single-partition reference regardless of partitioning" in {
    // 200 docs with irregular lengths, written through 13 partitions: the
    // two-pass prefix sum must equal the sequential cumsum
    val many = (1 to 200).map(i => (i.toLong, (i * 37 % 97 + 1).toLong))
    val df = spark.createDataFrame(many).toDF("doc_id", "n_tok").repartition(13)
    val out = Packing.concatChunks(df, "doc_id", "n_tok", capacity = 256)
      .orderBy("doc_id").select("tok_end").as[Long].collect().toSeq
    val expected = many.map(_._2).scanLeft(0L)(_ + _).tail
    out shouldBe expected
  }

  "Packing.chunkMembers" should "explode per-chunk sub-spans with exact offsets" in {
    val members = Packing.chunkMembers(docs, "doc_id", "n_tok", capacity = 512)
      .orderBy("chunk", "doc_id")
      .select("chunk", "doc_id", "offset_in_chunk", "n_tokens_in_chunk")
      .as[(Long, Long, Long, Long)].collect().toSeq
    members shouldBe Seq(
      (0L, 1L, 0L, 300L),
      (0L, 2L, 300L, 212L), // first 212 of doc 2 fill chunk 0
      (1L, 2L, 0L, 88L), // remaining 88 spill into chunk 1
      (1L, 3L, 88L, 100L),
      (1L, 5L, 188L, 324L), // doc 5 fills the rest of chunk 1...
      (2L, 5L, 0L, 512L), // ...all of chunk 2...
      (3L, 5L, 0L, 64L)) // ...and 64 tokens of chunk 3
    // every chunk but the last is exactly full
    val fill = members.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    fill(0L) shouldBe 512L
    fill(1L) shouldBe 512L
    fill(2L) shouldBe 512L
    fill(3L) shouldBe 64L
  }
}
