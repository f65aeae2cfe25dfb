package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FilteredAnnSpec extends SparkSpec {
  import spark.implicits._

  // deterministic corpus: 400 vectors in 8 clusters, label = cluster
  private def corpus = {
    val rows = (0 until 400).map { i =>
      val c = i % 8
      val v = Array.tabulate(16)(d =>
        (if (d == c * 2) 10f else 0f) + ((i * 31 + d * 7) % 5) * 0.1f)
      (i.toLong, v, c)
    }
    rows.toDF("vec_id", "embedding", "label")
  }

  behavior of "Ann.filteredTopK"

  it should "route selective predicates to the exact pre-filter path" in {
    val df = corpus
    val probes = df.where(col("vec_id") < 5)
    // label = 2 AND vec_id % 8 == 2 → 50/400 = 12.5%, use cutover 0.2
    val out = Ann.filteredTopK(df, probes, "vec_id", "embedding",
      col("label") === 2, k = 3, cutover = 0.2)
    val exact = Ann.bruteForceTopK(df.where(col("label") === 2),
      probes, "vec_id", "embedding", k = 3)
    out.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet shouldBe
      exact.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  it should "post-filter the IVF pool on broad predicates with full predicate precision" in {
    val df = corpus
    val probes = df.where(col("vec_id") < 5)
    // label != 0 → 87.5% of the corpus: the IVF route
    val out = Ann.filteredTopK(df, probes, "vec_id", "embedding",
        col("label") =!= 0, k = 3, cutover = 0.1, overFetch = 4, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    out should not be empty
    // ≤ k per probe, ranks contiguous from 1
    out.groupBy(_._1).values.foreach { rs =>
      rs.length should be <= 3
      rs.map(_._3).sorted shouldBe (1 to rs.length)
    }
    // precision: every survivor satisfies the predicate
    val allowed = df.where(col("label") =!= 0)
      .select("vec_id").as[Long].collect().toSet
    out.map(_._2).foreach(n => allowed should contain(n))
    // recall on this clustered fixture: the over-fetched pool keeps most
    // of the exact filtered top-3
    val exact = Ann.bruteForceTopK(df.where(col("label") =!= 0),
        probes, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = out.map(t => (t._1, t._2)).toSet
    (got.intersect(exact).size.toDouble / exact.size) should be >= 0.5
  }

  it should "return empty when nothing satisfies the predicate" in {
    val df = corpus
    Ann.filteredTopK(df, df.where(col("vec_id") < 3), "vec_id", "embedding",
      col("label") === 99, k = 3).count() shouldBe 0L
  }
}
