package graft.operators

import graft.SparkSpec

class AnonymitySpec extends SparkSpec {
  import spark.implicits._

  behavior of "Anonymity.audit"

  it should "verdict k-anonymity by group size and l-diversity by sensitive cardinality" in {
    val rows = Seq(
      // group (10, "A"): 3 rows, 3 distinct balances → fails k=3? n=3 ok; l=2 ok
      (10L, "A", 100L), (10L, "A", 200L), (10L, "A", 300L),
      // group (20, "B"): 4 rows but ONE sensitive value → k ok, l fails
      (20L, "B", 500L), (20L, "B", 500L), (20L, "B", 500L), (20L, "B", 500L),
      // group (30, "C"): singleton → both fail
      (30L, "C", 900L))
      .toDF("nat", "seg", "bal")
    val out = Anonymity.audit(rows, Seq("nat", "seg"), "bal", k = 3, l = 2)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getInt(4), r.getInt(5))).toMap
    out((10L, "A")) shouldBe ((3L, 3L, 1, 1))
    out((20L, "B")) shouldBe ((4L, 1L, 1, 0))
    out((30L, "C")) shouldBe ((1L, 1L, 0, 0))
  }
}
