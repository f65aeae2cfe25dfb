package graft.text

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val sennrich = Seq( // the ACL-2016 running example
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  "learnFromCounts" should "reproduce the textbook first merges" in {
    val merges = Bpe.learnFromCounts(sennrich, 4)
    // pair counts: (e,s)=9, (s,t)=9, (t,</w>)=9, (l,o)=7, (o,w)=7 …
    // ties break lexicographically: (e,s) < (s,t) < (t,</w>)
    merges.take(3) shouldBe Seq(("e", "s"), ("es", "t"), ("est", "</w>"))
    merges(3) shouldBe (("l", "o")) // 7, beats (o,w) tie? (l,o) < (o,w)
  }

  it should "stop early when nothing is left to merge" in {
    Bpe.learnFromCounts(Seq(("ab", 1L)), 100).length should be <= 3
  }

  "encodeWord" should "apply merges in rank order, greedily" in {
    val ranks = Bpe.learnFromCounts(sennrich, 10).zipWithIndex.toMap
    Bpe.encodeWord("newest", ranks).mkString("|") should endWith("est</w>")
    Bpe.encodeWord("lowest", ranks) should contain("est</w>")
  }

  it should "fall back to characters for unseen alphabets" in {
    val ranks = Bpe.learnFromCounts(sennrich, 10).zipWithIndex.toMap
    Bpe.encodeWord("xyz", ranks) shouldBe Vector("x", "y", "z", "</w>")
  }

  "encode" should "be invariant to partitioning and match the kernel" in {
    val docs = Seq((1L, "the lowest newest low"), (2L, "wide widest"))
      .toDF("doc_id", "text")
    val merges = Bpe.learn(docs, "text", 20)
    val ranks = merges.zipWithIndex.toMap
    val direct = Seq("the", "lowest", "newest", "low")
      .flatMap(w => Bpe.encodeWord(w, ranks))
    val enc = Bpe.encode(docs, "doc_id", "text", merges)
    val got = enc.where($"id" === 1L).select("bpe_tokens")
      .as[Seq[String]].head()
    got shouldBe direct
    val rep = Bpe.encode(docs.repartition(7), "doc_id", "text", merges)
      .where($"id" === 1L).select("bpe_tokens").as[Seq[String]].head()
    rep shouldBe got
  }

  "tokenCounts" should "count encoded tokens per document" in {
    val docs = Seq((1L, "aa aa"), (2L, "")).toDF("doc_id", "text")
    val merges = Bpe.learn(docs, "text", 5)
    val counts = Bpe.tokenCounts(docs, "doc_id", "text", merges)
      .as[(Long, Long)].collect().toMap
    counts(2L) shouldBe 0L
    counts(1L) should be >= 2L // two words, at least one token each
  }
}
