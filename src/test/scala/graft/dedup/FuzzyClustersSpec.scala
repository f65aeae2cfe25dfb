package graft.dedup

import graft.SparkSpec

class FuzzyClustersSpec extends SparkSpec {

  behavior of "FuzzyClusters.minhashClusters"

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  it should "close transitive near-dup chains into one cluster" in {
    // 1≈2 and 2≈3 share most shingles; 1 and 3 drift but must still
    // land in cluster 1 through transitivity
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val d = docs(
      1L -> base,
      2L -> (base + " extra"),
      3L -> (base + " extra words here"),
      10L -> "completely different content about spark physical plans",
      11L -> "completely different content about spark physical plans")
    val out = FuzzyClusters.minhashClusters(d, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    out should contain allOf(
      (1L, 1L, 1), (2L, 1L, 0), (3L, 1L, 0), (10L, 10L, 1), (11L, 10L, 0))
  }

  it should "make singletons their own keepers" in {
    val d = docs(5L -> "alpha beta gamma delta", 9L -> "epsilon zeta eta theta")
    val out = FuzzyClusters.minhashClusters(d, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    out shouldBe Set((5L, 5L, 1), (9L, 9L, 1))
  }

  behavior of "FuzzyClusters.lshStarClusters"

  it should "cluster near-dups through bucket stars and keep distinct docs apart" in {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val d = docs(
      1L -> base,
      2L -> (base + " extra"),
      3L -> (base + " extra words here"),
      10L -> "completely different content about spark physical plans")
    val out = FuzzyClusters.lshStarClusters(d, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    out should contain allOf((1L, 1L, 1), (2L, 1L, 0), (3L, 1L, 0), (10L, 10L, 1))
  }

  it should "refine-contain the verified clustering on the driver corpus" in {
    // Theorem: every verified pair came from a shared band bucket, so
    // docs the verified path merges are ALWAYS star-merged — the star
    // clustering is a coarsening (recall is never lost). The converse
    // does not hold: buckets also connect sub-threshold pairs (banding
    // false positives), which is the precision trade the linear-edge
    // path makes. Assert the containment, and that the extra merges
    // stay a small fraction of the corpus.
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val verified = FuzzyClusters.minhashClusters(d, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val star = FuzzyClusters.lshStarClusters(d, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    star.keySet shouldBe verified.keySet
    // containment: same verified cluster => same star cluster
    verified.groupBy(_._2).values.foreach { members =>
      members.keys.map(star).toSet.size shouldBe 1
    }
    // the extra (unverified) merges touch only a few docs here
    val extra = star.keys.count(id => {
      val starPeers = star.keys.filter(k => star(k) == star(id)).toSet
      val verPeers = verified.keys.filter(k => verified(k) == verified(id)).toSet
      starPeers != verPeers
    })
    extra.toDouble / star.size should be < 0.05
  }
}
