package graft.dedup

import graft.SparkSpec

class DecontaminationSpec extends SparkSpec {
  import spark.implicits._

  private val bench = Seq(
    (100L, "the quick brown fox jumps over the lazy dog"))
    .toDF("bench_id", "text")

  "Decontamination" should "flag docs sharing an n-gram and keep clean ones" in {
    val docs = Seq(
      (1L, "He said The Quick Brown Fox appeared"), // 4-gram hit (case-folded)
      (2L, "a quick brown dog and a lazy fox"), // words shared, no 4-gram
      (3L, "entirely unrelated content here today"))
      .toDF("doc_id", "text")
    val report = Decontamination.overlapReport(
      docs, "doc_id", "text", bench, "bench_id", "text", n = 4)
      .as[(Long, Long, Long)].collect()
    report.map(_._1).toSet shouldBe Set(1L)
    val clean = Decontamination.decontaminate(
      docs, "doc_id", "text", bench, "bench_id", "text", n = 4)
      .select("doc_id").as[Long].collect().toSet
    clean shouldBe Set(2L, 3L)
  }

  it should "count distinct colliding n-grams and benchmark docs" in {
    val bench2 = bench.union(Seq(
      (200L, "pack my box with five dozen liquor jugs")).toDF("bench_id", "text"))
    val docs = Seq(
      // hits both benchmark docs; two distinct 4-grams against doc 100
      (7L, "the quick brown fox jumps; pack my box with five dozen jugs"))
      .toDF("doc_id", "text")
    val r = Decontamination.overlapReport(
      docs, "doc_id", "text", bench2, "bench_id", "text", n = 4)
      .collect().head
    // doc 100: "the quick brown fox", "quick brown fox jumps";
    // doc 200: "pack my box with", "my box with five", "box with five dozen"
    r.getAs[Long]("n_hits") shouldBe 5L
    r.getAs[Long]("n_bench_docs") shouldBe 2L
  }
}
