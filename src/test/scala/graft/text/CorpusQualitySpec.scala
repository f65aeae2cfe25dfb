package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the corpus-LM and repetition quality
  * signals (the CCNet / Gopher-repetition dimensions). */
class CorpusQualitySpec extends SparkSpec {
  import spark.implicits._

  "CorpusLm" should "count trigrams and flag rare ones exactly" in {
    // "aaaa" -> trigrams aaa, aaa ; "aaab" -> aaa, aab
    val docs = Seq((1L, "aaaa"), (2L, "aaab")).toDF("doc_id", "text")
    val model = CorpusLm.trigramCounts(docs, "text")
    model.as[(String, Long)].collect().toMap shouldBe Map("aaa" -> 3L, "aab" -> 1L)
    val scored = CorpusLm.scoreDocs(docs, "doc_id", "text", model, rareMax = 1)
      .orderBy("doc_id").collect()
    // doc 1: 2x aaa (cnt 3, not rare)
    scored(0).getAs[Long]("n_tri") shouldBe 2L
    scored(0).getAs[Long]("n_distinct_tri") shouldBe 1L
    scored(0).getAs[Long]("n_rare") shouldBe 0L
    // doc 2: aaa (cnt 3) + aab (cnt 1, rare)
    scored(1).getAs[Long]("n_tri") shouldBe 2L
    scored(1).getAs[Long]("n_distinct_tri") shouldBe 2L
    scored(1).getAs[Long]("n_rare") shouldBe 1L
    // avg_logprob: doc1 = ln(3/4); doc2 = (ln(3/4) + ln(1/4)) / 2
    scored(0).getAs[Double]("avg_logprob") shouldBe math.log(3.0 / 4) +- 1e-12
    scored(1).getAs[Double]("avg_logprob") shouldBe
      ((math.log(3.0 / 4) + math.log(1.0 / 4)) / 2) +- 1e-12
  }

  it should "treat unseen trigrams as rare when scoring out-of-corpus docs" in {
    val corpus = Seq((1L, "hello world")).toDF("doc_id", "text")
    val model = CorpusLm.trigramCounts(corpus, "text")
    val out = CorpusLm.scoreDocs(Seq((9L, "zzzqqq")).toDF("doc_id", "text"),
      "doc_id", "text", model, rareMax = 1).collect().head
    out.getAs[Long]("n_rare") shouldBe out.getAs[Long]("n_tri") // all unseen
    out.getAs[Double]("avg_logprob") should be < math.log(1.0 / 9) // floor prob
  }

  it should "normalize whitespace and case before trigramming" in {
    val a = Seq((1L, "Ab  cd")).toDF("doc_id", "text")
    val b = Seq((1L, "ab cd")).toDF("doc_id", "text")
    CorpusLm.trigramCounts(a, "text").as[(String, Long)].collect().toSet shouldBe
      CorpusLm.trigramCounts(b, "text").as[(String, Long)].collect().toSet
  }

  "Repetition.signals" should "compute the Gopher duplicate-line and top-bigram stats" in {
    val text = Seq(
      "the cat sat",
      "unique line here",
      "the cat sat", // dup (11 chars x2)
      "", //  dropped
      "  the cat sat  ", // trimmed -> third copy
      "tail").mkString("\n")
    val out = Repetition.signals(Seq((7L, text)).toDF("doc_id", "text"),
      "doc_id", "text").collect().head
    out.getAs[Long]("n_lines") shouldBe 5L // empty line dropped
    out.getAs[Long]("n_dup_lines") shouldBe 3L // all copies counted
    out.getAs[Long]("n_chars_dup_lines") shouldBe 3L * 11
    // bigrams over the whole token stream: 13 tokens -> 12 bigrams
    out.getAs[Long]("n_bigrams") shouldBe 12L
    // "the cat" and "cat sat" each occur 3x; max = 3
    out.getAs[Long]("top_bigram_n") shouldBe 3L
  }

  it should "zero-fill docs with no duplicate structure" in {
    val out = Repetition.signals(Seq((1L, "one two three")).toDF("doc_id", "text"),
      "doc_id", "text").collect().head
    out.getAs[Long]("n_dup_lines") shouldBe 0L
    out.getAs[Long]("n_chars_dup_lines") shouldBe 0L
    out.getAs[Long]("n_bigrams") shouldBe 2L
    out.getAs[Long]("top_bigram_n") shouldBe 1L
  }
}
