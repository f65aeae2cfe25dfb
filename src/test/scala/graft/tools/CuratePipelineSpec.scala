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
    val (curated, mix, audit) = Curate.run(docs, bench)
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
    // the curated frame IS the decontaminated stage (pre-mix)
    curated.count() shouldBe counts("decontaminated")
    // mixing rates cover exactly the surviving sources and normalize
    val mixRows = mix.collect()
    mixRows.map(_.getAs[Long]("n_docs")).sum shouldBe counts("decontaminated")
    val qSum = mixRows.map(_.getAs[Long]("q_ppm")).sum
    qSum.toDouble shouldBe 1000000.0 +- mixRows.length.toDouble
    audit.chunks should be > 0L
  }

  it should "be deterministic across runs" in {
    val (docs, bench) = corpus
    val (c1, _, a1) = Curate.run(docs, bench)
    val (c2, _, a2) = Curate.run(docs, bench)
    a1.stages shouldBe a2.stages
    a1.chunks shouldBe a2.chunks
    val ids1 = c1.select("doc_id").collect().map(_.getLong(0)).sorted
    val ids2 = c2.select("doc_id").collect().map(_.getLong(0)).sorted
    ids1 shouldBe ids2
  }
}
