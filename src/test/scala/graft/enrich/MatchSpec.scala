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

  "soft_tfidf (native expression)" should "agree with the JVM kernel" in {
    import org.apache.spark.sql.functions.{call_function, col, lit}
    val rows = Seq(
      (Seq("john", "zyxwv"), Seq(0.1, 2.0), Seq("jon", "zyxwv"), Seq(0.1, 2.0)),
      (Seq("aaa"), Seq(1.0), Seq("bbb"), Seq(1.0)),
      (Seq("x", "y", "z"), Seq(1.0, 2.0, 3.0), Seq("y", "x"), Seq(2.0, 1.5)))
      .toDF("t1", "w1", "t2", "w2")
    val got = rows.select(call_function("soft_tfidf",
        col("t1"), col("w1"), col("t2"), col("w2"), lit(0.9), lit(0.0)))
      .as[Double].collect()
    val want = Seq(
      Similarity.softTfIdf(Seq("john", "zyxwv"), Seq(0.1, 2.0), Seq("jon", "zyxwv"), Seq(0.1, 2.0)),
      Similarity.softTfIdf(Seq("aaa"), Seq(1.0), Seq("bbb"), Seq(1.0)),
      Similarity.softTfIdf(Seq("x", "y", "z"), Seq(1.0, 2.0, 3.0), Seq("y", "x"), Seq(2.0, 1.5)))
    got.toSeq shouldBe want
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

  "Paris.resolve" should "compute the exact evidence products (dyadic fixture)" in {
    // x1/x2 share grp AND par; x1/x3 share par only.
    // pos(x1,x2) = (1-0.5)(1-0.25) = 0.375 -> P+ = 0.625; neg = 1
    // pos(x1,x3) = (1-0.25) -> P+ = 0.25; neg = (1-0.5*1)(1-0.75*0) = 0.5
    val stmts = Seq(
      ("x1", "grp", "gA", false), ("x1", "par", "qA", false),
      ("x2", "grp", "gA", false), ("x2", "par", "qA", false),
      ("x3", "grp", "gB", false), ("x3", "par", "qA", false))
      .toDF("x", "p", "o", "oIsInstance")
    val props = Seq(("grp", 0.5, 0.5), ("par", 0.75, 0.25))
      .toDF("p", "fun", "inv_fun")
    val noEq = Seq.empty[(String, String, Double)].toDF("o1", "o2", "prob")
    val res = Paris.resolve(stmts, noEq, props, iterations = 10)
      .as[(String, String, Double)].collect()
      .map { case (a, b, p) => ((a, b), p) }.toMap
    res(("x1", "x2")) shouldBe 0.625
    res(("x2", "x1")) shouldBe 0.625
    res(("x1", "x3")) shouldBe 0.125
    res(("x3", "x1")) shouldBe 0.125
  }

  it should "not penalize an entity silent on a functional property" in {
    // x4 has NO grp statement at all. Suchanek §4's penalty multiplies
    // over statement PAIRS — silence is not counter-evidence, so only
    // the (agreeing) par factor applies:
    //   pos(x1,x4) = (1-0.25) -> P+ = 0.25
    //   neg(x1,x4) = (1-0.75*0) = 1      [grp skipped: x4 silent]
    //   prob = 0.25 (the pre-fix code returned 0.125 = 0.25 * (1-0.5))
    val stmts = Seq(
      ("x1", "grp", "gA", false), ("x1", "par", "qA", false),
      ("x4", "par", "qA", false))
      .toDF("x", "p", "o", "oIsInstance")
    val props = Seq(("grp", 0.5, 0.5), ("par", 0.75, 0.25))
      .toDF("p", "fun", "inv_fun")
    val noEq = Seq.empty[(String, String, Double)].toDF("o1", "o2", "prob")
    val res = Paris.resolve(stmts, noEq, props, iterations = 10)
      .as[(String, String, Double)].collect()
      .map { case (a, b, p) => ((a, b), p) }.toMap
    res(("x1", "x4")) shouldBe 0.25
    res(("x4", "x1")) shouldBe 0.25
  }

  it should "propagate equality through instance-valued objects one hop per iteration" in {
    // b1 ≈ b2 via a shared inverse-functional email (round 1); a1 ≈ a2
    // only via the instance-valued spouse property, which needs b1 ≈ b2
    // from the previous round — so it appears in round 2, not round 1.
    val stmts = Seq(
      ("a1", "spouse", "b1", true), ("a2", "spouse", "b2", true),
      ("b1", "email", "e@x.org", false), ("b2", "email", "e@x.org", false))
      .toDF("x", "p", "o", "oIsInstance")
    val props = Seq(("spouse", 0.0, 0.5), ("email", 0.0, 0.75))
      .toDF("p", "fun", "inv_fun")
    val noEq = Seq.empty[(String, String, Double)].toDF("o1", "o2", "prob")
    def pairs(iters: Int) =
      Paris.resolve(stmts, noEq, props, iterations = iters)
        .select("x1", "x2").as[(String, String)].collect().toSet
    val r1 = pairs(1)
    r1 should contain(("b1", "b2"))
    r1 should not contain (("a1", "a2"))
    val r2 = pairs(2)
    r2 should contain(("b1", "b2"))
    r2 should contain(("a1", "a2"))
    // fixpoint: more rounds change nothing on this fixture
    val r10 = Paris.resolve(stmts, noEq, props, iterations = 10)
      .as[(String, String, Double)].collect().toSet
    val r3 = Paris.resolve(stmts, noEq, props, iterations = 3)
      .as[(String, String, Double)].collect().toSet
    r10 shouldBe r3
  }

  "NameStructure.alignOne" should "decompose a local-part into a pattern with matched slots" in {
    val (pattern, slots) = NameStructure.alignOne("john.smith",
      Seq(("John", Seq("givenName")), ("Smith", Seq("familyName"))))
    pattern shouldBe "<v>.<v>"
    slots shouldBe Seq((1, "john", Seq("givenName")), (2, "smith", Seq("familyName")))
  }

  it should "turn unmatched alphanumeric runs into unqualified slots" in {
    val (pattern, slots) = NameStructure.alignOne("jdoe42",
      Seq(("Zelda", Seq("givenName"))))
    pattern shouldBe "<v>"
    slots shouldBe Seq((1, "jdoe42", Seq.empty))
    // approximate match still aligns (>= 70% chars: one substitution in 8)
    val (p2, s2) = NameStructure.alignOne("jonathen-smith",
      Seq(("jonathan", Seq.empty), ("smith", Seq.empty)))
    p2 shouldBe "<v>-<v>"
    s2.map(_._2) shouldBe Seq("jonathan", "smith")
  }

  "NameStructure.inferNamePartTypes" should
    "propagate types through domain patterns and shared name parts" in {
    // corp.example uses given.family: A is fully typed; B learns its slot
    // types through the shared domain pattern; C (other domain) learns
    // "smith" is a family name through the shared name-part node.
    val names = Seq(
      ("A", "John", Seq("givenName")), ("A", "Smith", Seq("familyName")),
      ("B", "Jane", Seq.empty[String]), ("B", "Doe", Seq.empty[String]),
      ("C", "Smith", Seq.empty[String]))
      .toDF("agent", "part", "types")
    val emails = Seq(
      ("A", "john.smith", "corp.example"),
      ("B", "jane.doe", "corp.example"),
      ("C", "smith", "other.example"))
      .toDF("agent", "localPart", "domain")
    val aligned = NameStructure.alignEmailLocalParts(names, emails)
    val inferred = NameStructure.inferNamePartTypes(aligned)
      .as[(String, String, String, Double)].collect()
      .map { case (a, p, t, w) => ((a, p), (t, w)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toMap).toMap
    inferred(("B", "jane")) shouldBe Map("givenName" -> 1.0)
    inferred(("B", "doe")) shouldBe Map("familyName" -> 1.0)
    inferred(("C", "smith")) shouldBe Map("familyName" -> 1.0)
  }

  it should "count the start node's own qualified type (distance-0 self-hit)" in {
    // The same (D, smith) slot is unqualified in one aligned row and
    // typed familyName in another (two sources, one typed): its own
    // label is distance-0 evidence and must win over the 2-hop
    // domain-pattern neighbor (E, emma) = givenName, which the pre-fix
    // BFS (visited initialized with the frontier, hits scanned from
    // distance 1) returned instead.
    val aligned = spark.createDataset(Seq(
      NameStructure.AlignedSlot("D", "corp", "<v>", 0, "smith", Seq.empty),
      NameStructure.AlignedSlot("D", "corp2", "<v>", 0, "smith", Seq("familyName")),
      NameStructure.AlignedSlot("E", "corp", "<v>", 0, "emma", Seq("givenName"))))
    val inferred = NameStructure.inferNamePartTypes(aligned)
      .as[(String, String, String, Double)].collect()
      .map { case (a, p, t, w) => ((a, p), (t, w)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toMap).toMap
    inferred(("D", "smith")) shouldBe Map("familyName" -> 1.0)
  }

  it should "skip public mailbox domains" in {
    val names = Seq(("A", "John", Seq("givenName")), ("B", "Jane", Seq.empty[String]))
      .toDF("agent", "part", "types")
    val emails = Seq(
      ("A", "john", "gmail.com"), ("B", "jane", "gmail.com"))
      .toDF("agent", "localPart", "domain")
    NameStructure.alignEmailLocalParts(names, emails).count() shouldBe 0L
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
