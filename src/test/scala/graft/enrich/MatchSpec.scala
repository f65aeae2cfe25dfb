package graft.enrich

import graft.SparkSpec
import graft.functions.Similarity

class MatchSpec extends SparkSpec {
  import spark.implicits._

  "Similarity.jaroWinkler" should "match reference values" in {
    Similarity.jaroWinkler("MARTHA", "MARHTA") shouldBe 0.9611 +- 0.0001
    Similarity.jaroWinkler("DWAYNE", "DUANE") shouldBe 0.84 +- 0.0001
    Similarity.jaroWinkler("abc", "abc") shouldBe 1.0
    Similarity.jaroWinkler("abc", "xyz") shouldBe 0.0
  }

  "Similarity.softTfIdf" should "score aligned rare tokens highly" in {
    // same rare surname, different common first names
    val s = Similarity.softTfIdf(
      Seq("john", "zyxwv"), Seq(0.1, 2.0),
      Seq("jon", "zyxwv"), Seq(0.1, 2.0))
    s should be > 0.9
    Similarity.softTfIdf(Seq("aaa"), Seq(1.0), Seq("bbb"), Seq(1.0)) shouldBe 0.0
  }

  "AgentMatch.sameAsPairs" should "link near-identical names and skip distinct ones" in {
    val agents = Seq(
      (1L, "Barnaby Quixote"),
      (2L, "Barnaby Quixotte"), // same person, typo
      (3L, "Quixote Barnaby"),  // token order swap
      (4L, "Melinda Farrow"),
      (5L, "Totally Unrelated")).toDF("id", "name")
    val pairs = AgentMatch.sameAsPairs(agents, "id", "name",
        threshold = 0.8, maxDocFreqFraction = 0.9)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    pairs should contain((1L, 2L))
    pairs should contain((1L, 3L))
    pairs.flatMap(p => Set(p._1, p._2)) should not contain 4L
  }

  "AgentMatch.resolve" should "produce equivalence classes over all records" in {
    val agents = Seq(
      (1L, "Barnaby Quixote"), (2L, "Barnaby Quixotte"), (4L, "Melinda Farrow"))
      .toDF("id", "name")
    val classes = AgentMatch.resolve(agents, "id", "name", threshold = 0.8,
        maxDocFreqFraction = 0.9)
      .as[(Long, Long)].collect().toMap
    classes(1L) shouldBe classes(2L)
    classes(4L) shouldBe 4L
  }

  "Paris.align" should "align instances sharing high-functionality values" in {
    val left = Seq(
      ("a1", "email", "x@example.com"),
      ("a1", "country", "FR"),
      ("a2", "country", "FR")).toDF("s", "p", "o")
    val right = Seq(
      ("b1", "email", "x@example.com"),
      ("b1", "country", "FR"),
      ("b2", "country", "FR")).toDF("s", "p", "o")
    val aligned = Paris.align(left, right, iterations = 3, threshold = 0.5)
      .select("s1", "s2").as[(String, String)].collect().toSet
    aligned should contain(("a1", "b1"))
    aligned should not contain (("a2", "b2")) // only low-functionality evidence
  }

  "Inference.infer" should "close inverseOf, symmetric and transitive rules" in {
    val quads = Seq(
      ("a", "parentOf", "b", 0.toByte, null: String, null: String, "g"),
      ("b", "knows", "c", 0.toByte, null: String, null: String, "g"),
      ("x", "ancestorOf", "y", 0.toByte, null: String, null: String, "g"),
      ("y", "ancestorOf", "z", 0.toByte, null: String, null: String, "g"))
      .toDF("s", "p", "o", "oKind", "oDt", "oLang", "g")
    val rules = Inference.Rules(
      inverseOf = Map("parentOf" -> "childOf"),
      symmetric = Set("knows"),
      transitive = Set("ancestorOf"))
    val inferred = Inference.infer(quads, rules)
      .select("s", "p", "o").as[(String, String, String)].collect().toSet
    inferred shouldBe Set(
      ("b", "childOf", "a"),
      ("c", "knows", "b"),
      ("x", "ancestorOf", "z"))
  }

  "Inference.sameAsClasses" should "respect differentFrom guards" in {
    val sameAs = Seq(("a", "b"), ("b", "c"), ("d", "e")).toDF("s1", "s2")
    val diff = Seq(("e", "d")).toDF("s1", "s2") // kills d~e in either order
    val classes = Inference.sameAsClasses(sameAs, diff)
      .as[(String, String)].collect().toMap
    classes("a") shouldBe classes("c")
    classes.get("d") should not be classes.get("e")
  }
}
