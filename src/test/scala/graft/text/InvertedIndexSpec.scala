package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class InvertedIndexSpec extends SparkSpec {

  import spark.implicits._

  // deterministic synthetic corpus with a Zipf-ish token mix so the
  // candidate-prune path has real df spread
  private def corpus(n: Int, seed: Int): org.apache.spark.sql.DataFrame = {
    val rnd = new scala.util.Random(seed)
    val common = Seq("alpha", "beta", "gamma")
    val mid = Seq("delta", "epsilon", "zeta", "eta")
    val rare = Seq("theta", "iota", "kappa", "lambda", "mu", "nu")
    (0 until n).map { i =>
      val words = Seq.fill(3 + rnd.nextInt(10)) {
        val r = rnd.nextInt(10)
        if (r < 6) common(rnd.nextInt(common.size))
        else if (r < 9) mid(rnd.nextInt(mid.size))
        else rare(rnd.nextInt(rare.size))
      }
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
  }

  behavior of "InvertedIndex"

  it should "reproduce TextAnalysis.bm25 scores exactly" in {
    val docs = corpus(400, 1)
    val terms = Seq("alpha", "delta", "theta")
    val ix = InvertedIndex.build(docs, "doc_id", "text")
    val viaIndex = ix.postings
      .where(col("tok").isin(terms: _*)) // full scoring, no top-k cut
    val full = InvertedIndex.topK(ix, terms, k = 100000, prune = false)
      .select(col("id"), col("score")).as[(Long, Double)].collect().toMap
    val reference = TextAnalysis.bm25(docs, "text", "doc_id", terms)
      .as[(Long, Double)].collect().toMap
    full shouldBe reference
    viaIndex.count() should be > 0L
  }

  it should "score a query batch identically to per-query topK" in {
    val docs = corpus(300, 7)
    val ix = InvertedIndex.build(docs, "doc_id", "text")
    val queryTerms = Seq(
      1L -> Seq("alpha", "theta"),
      2L -> Seq("delta"),
      3L -> Seq("beta", "epsilon", "kappa"),
      // repeated term: topK's isin matching scores each DISTINCT term
      // once; the batch path must not double-count it
      4L -> Seq("alpha", "delta", "alpha"))
    val batch = InvertedIndex.topKBatch(
        ix, queryTerms.toDF("qid", "terms"), "qid", "terms", k = 5)
      .select(col("qid"), col("id"), col("score"), col("rank"))
      .as[(Long, Long, Double, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3, t._4)).toSet).toMap
    queryTerms.foreach { case (qid, terms) =>
      val single = InvertedIndex.topK(ix, terms, k = 5)
        .select(col("id"), col("score"), col("rank"))
        .as[(Long, Double, Int)].collect().toSet
      batch(qid) shouldBe single
    }
  }

  it should "refuse a non-integral query id instead of merging all queries" in {
    // a string qid cast to long nulls: pre-guard, every query's results
    // silently merged into one qid=null ranking
    val docs = corpus(50, 7)
    val ix = InvertedIndex.build(docs, "doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      InvertedIndex.topKBatch(
        ix, Seq(("q1", Seq("alpha"))).toDF("qid", "terms"), "qid", "terms", k = 3)
    }
    e.getMessage should include ("integral")
  }

  it should "return identical top-k with and without the rank-safe prune" in {
    for (seed <- 1 to 3) {
      val docs = corpus(500, seed)
      val ix = InvertedIndex.build(docs, "doc_id", "text")
      val terms = Seq("alpha", "epsilon", "kappa")
      val pruned = InvertedIndex.topK(ix, terms, 15, prune = true)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq
      val plain = InvertedIndex.topK(ix, terms, 15, prune = false)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq
      pruned shouldBe plain
    }
  }

  it should "round-trip through save/load with identical results" in {
    val docs = corpus(300, 7)
    val dir = java.nio.file.Files.createTempDirectory("invix").toString
    val ix = InvertedIndex.build(docs, "doc_id", "text")
    InvertedIndex.save(ix, dir, numBuckets = 16)
    val loaded = InvertedIndex.load(spark, dir)
    loaded.n shouldBe ix.n
    loaded.sumDl shouldBe ix.sumDl
    loaded.numBuckets shouldBe Some(16)
    val a = InvertedIndex.topK(ix, Seq("beta", "zeta"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = InvertedIndex.topK(loaded, Seq("beta", "zeta"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    b shouldBe a
  }

  it should "prune the posting scan to the query terms' bucket directories" in {
    val docs = corpus(300, 9)
    val dir = java.nio.file.Files.createTempDirectory("invix2").toString
    InvertedIndex.save(InvertedIndex.build(docs, "doc_id", "text"), dir, 16)
    val all = spark.read.parquet(s"$dir/postings")
    def filesTouched(df: org.apache.spark.sql.DataFrame): Long =
      df.select(input_file_name()).distinct().count()
    val totalFiles = filesTouched(all)
    // one term → one bucket directory survives the partition filter
    val bucket = all.sparkSession.range(1)
      .select(pmod(xxhash64(lit("beta")), lit(16L))).head().getLong(0)
    val prunedFiles = filesTouched(all.where(col("bucket") === bucket))
    prunedFiles should be < totalFiles
    // and the pruned read still finds every 'beta' posting
    val viaPruned = all.where(col("bucket") === bucket)
      .where(col("tok") === "beta").count()
    val viaFull = all.where(col("tok") === "beta").count()
    viaPruned shouldBe viaFull
  }

  it should "return empty for terms absent from the corpus" in {
    val ix = InvertedIndex.build(corpus(50, 3), "doc_id", "text")
    InvertedIndex.topK(ix, Seq("nosuchterm"), 5).count() shouldBe 0L
  }
}
