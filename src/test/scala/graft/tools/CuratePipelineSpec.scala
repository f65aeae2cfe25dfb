package graft.tools

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CuratePipelineSpec extends SparkSpec {

  behavior of "Curate.run"

  private def corpus = {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    (docs.where(col("doc_id") >= 20), docs.where(col("doc_id") < 20))
  }

  it should "drop monotonically through the gates and report agreeing counts" in {
    val (docs, bench) = corpus
    val (curated, mix, _, audit) = Curate.run(docs, bench)
    val counts = audit.stages.toMap
    counts("input") shouldBe docs.count()
    // gates only drop (annotation stages are not counted)
    counts("quality") should be <= counts("input")
    counts("exact_dedup") should be <= counts("quality")
    counts("fuzzy_dedup") should be <= counts("exact_dedup")
    counts("decontaminated") should be <= counts("fuzzy_dedup")
    // temperature mixing conserves total mass (Σ n_s·q_s/p_s = N up to
    // the fractional-epoch draws): the mixed stream stays near the
    // decontaminated count — heads shrink, tails grow
    counts("mixed").toDouble shouldBe
      counts("decontaminated").toDouble +- counts("decontaminated") * 0.25
    // the curated frame IS the decontaminated stage (pre-mix), now
    // split-tagged; the three split sizes partition it exactly
    curated.count() shouldBe counts("decontaminated")
    counts("split_train") + counts("split_val") + counts("split_test") shouldBe
      counts("decontaminated")
    // mixing rates cover exactly the surviving sources and normalize
    val mixRows = mix.collect()
    mixRows.map(_.getAs[Long]("n_docs")).sum shouldBe counts("decontaminated")
    val qSum = mixRows.map(_.getAs[Long]("q_ppm")).sum
    qSum.toDouble shouldBe 1000000.0 +- mixRows.length.toDouble
    audit.chunks should be > 0L
  }

  it should "never let a near-dup cluster straddle a split boundary" in {
    val (docs, bench) = corpus
    // clone a slice of documents under fresh ids: guaranteed near-dup
    // families whose members stage 6 drops — the straddle check must
    // hold for THEM, not just the surviving keepers
    val clones = docs.where(col("doc_id") % 7 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    val (curated, _, splits, audit) = Curate.run(docs.union(clones), bench)
    val counts = audit.stages.toMap
    withClue("the cloned corpus must actually exercise fuzzy dedup") {
      counts("fuzzy_dedup") should be < counts("exact_dedup")
    }
    // full membership: every exact-dedup survivor is split-assigned,
    // including the near-dups the keeper filter drops
    splits.count() shouldBe counts("exact_dedup")
    splits.count() should be > curated.count()
    // the contract: split is constant within every near-dup cluster
    splits.groupBy("cluster_id")
      .agg(countDistinct(col("split")).as("n"))
      .where(col("n") > 1).count() shouldBe 0L
    // a dropped clone inherits exactly its keeper's split
    val curSel = curated.select(col("cluster_id"), col("split").as("ksplit"))
      .distinct()
    splits.join(curSel, Seq("cluster_id"))
      .where(col("split") =!= col("ksplit")).count() shouldBe 0L
  }

  it should "be deterministic across runs" in {
    val (docs, bench) = corpus
    val (c1, _, _, a1) = Curate.run(docs, bench)
    val (c2, _, _, a2) = Curate.run(docs, bench)
    a1.stages shouldBe a2.stages
    a1.chunks shouldBe a2.chunks
    val ids1 = c1.select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted
    val ids2 = c2.select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted
    ids1 shouldBe ids2
  }
}
