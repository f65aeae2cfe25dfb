package graft.enrich

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ResolutionSpec extends SparkSpec {
  import spark.implicits._

  "ifpPairs" should "pair ids sharing all key columns" in {
    val df = Seq(
      (1L, "a@x.com", "555"),
      (2L, "a@x.com", "555"),
      (3L, "a@x.com", "666"),
      (4L, "b@y.com", "555")).toDF("id", "email", "phone")
    Resolution.ifpPairs(df, Seq("email", "phone"), "id")
      .as[(Long, Long)].collect().toSet shouldBe Set((1L, 2L))
  }

  "tokenBlockingCandidates" should "pair records sharing rare tokens only" in {
    val df = Seq(
      (1L, "john smith"),
      (2L, "john doe"),
      (3L, "jane smith"),
      (4L, "common common")).toDF("id", "name")
    // every token has df <= 2 except none; cap 1 prunes everything shared
    val all = Resolution.tokenBlockingCandidates(df, "name", "id", maxDocFreq = 2)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    all shouldBe Set((1L, 2L), (1L, 3L))
  }

  it should "produce identical candidates on the fused and scale plans" in {
    val df = Seq(
      (1L, "john smith"), (2L, "john doe"), (3L, "jane smith"),
      (4L, "common common"), (5L, "john smith jr"), (6L, "ada doe")
    ).toDF("id", "name")
    def run() = Resolution.tokenBlockingCandidates(df, "name", "id", maxDocFreq = 3)
      .select("id1", "id2", "shared_tokens")
      .as[(Long, Long, Long)].collect().toSet
    // cap of 2 BITES here ("smith" and "doe" blocks have 3+ members):
    // both plans must slice the same lowest ids before expansion
    def runCapped() = Resolution.tokenBlockingCandidatesFrac(
        df, "name", "id", maxDocFreqFraction = 0.9, maxBlockSize = Some(2))
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val fused = run()
    val fusedCapped = runCapped()
    spark.conf.set("spark.graft.resolution.fuseBytes", "0") // force scale path
    try {
      val scale = run()
      scale shouldBe fused
      runCapped() shouldBe fusedCapped
      val pairsFused = {
        spark.conf.set("spark.graft.resolution.fuseBytes", (1L << 26).toString)
        AgentMatch.sameAsPairs(df, "id", "name", threshold = 0.8,
          maxDocFreqFraction = 0.9).select("id1", "id2")
          .as[(Long, Long)].collect().toSet
      }
      spark.conf.set("spark.graft.resolution.fuseBytes", "0")
      val pairsScale = AgentMatch.sameAsPairs(df, "id", "name", threshold = 0.8,
        maxDocFreqFraction = 0.9).select("id1", "id2")
        .as[(Long, Long)].collect().toSet
      pairsScale shouldBe pairsFused
    } finally spark.conf.unset("spark.graft.resolution.fuseBytes")
  }

  "idf" should "compute ln(N/df) over distinct doc tokens" in {
    val df = Seq((1L, "a b"), (2L, "a c"), (3L, "a b")).toDF("id", "text")
    val m = Resolution.idf(df, "text", "id")
      .select("tok", "idf").as[(String, Double)].collect().toMap
    m("a") shouldBe 0.0 +- 1e-12
    m("b") shouldBe math.log(3.0 / 2) +- 1e-12
    m("c") shouldBe math.log(3.0) +- 1e-12
  }

  "levenshteinSim" should "be 1 for equal strings and scale with distance" in {
    val df = Seq(("kitten", "sitting")).toDF("a", "b")
    df.select(Resolution.levenshteinSim($"a", $"b")).as[Double].head() shouldBe
      (1.0 - 3.0 / 7) +- 1e-12
  }
}
