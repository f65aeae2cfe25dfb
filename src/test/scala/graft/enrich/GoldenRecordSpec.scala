package graft.enrich

import graft.SparkSpec

class GoldenRecordSpec extends SparkSpec {

  behavior of "GoldenRecord.collapse"

  it should "elect the argmax representative with min-id tie-break and merge attributes" in {
    val s = spark
    import s.implicits._
    val clustered = Seq((1L, 1L), (2L, 1L), (3L, 1L), (9L, 9L))
      .toDF("doc_id", "cluster_id")
    val docs = Seq(
      (1L, 10L, "web"), (2L, 30L, "mail"), (3L, 30L, "web"), (9L, 7L, "pdf"))
      .toDF("doc_id", "n_chars", "source")
    val out = GoldenRecord.collapse(clustered, docs,
        "doc_id", "cluster_id", "n_chars", "source")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))).toMap
    // quality tie 2 vs 3 at 30 chars → min id 2 wins; additive quality sums
    out(1L) shouldBe ((3L, 2L, 30L, 70L, "mail,web"))
    out(9L) shouldBe ((1L, 9L, 7L, 7L, "pdf"))
  }
}
