package graft.enrich

import graft.SparkSpec

/** P/R evaluation of the two entity-resolution engines against
  * hand-authored ground truth (FIXTURES.md §B6) — exact confusion counts
  * at each threshold bucket. */
class ResolutionEvaluationSpec extends SparkSpec {
  import spark.implicits._

  "ResolutionEvaluation" should "score AgentMatch classes against ground truth" in {
    // name variants: a1/a2 identical, a3 a one-letter surname variant
    // (soft-TF-IDF lands between the buckets), a4 unrelated
    // a5/a6 pad the corpus so 'john' (df 3/6) stays under the blocking
    // fraction and the a1-a3 candidate is generated
    val records = Seq(
      ("a1", "John Smith"), ("a2", "John Smith"),
      ("a3", "John Smyth"), ("a4", "Alice Wonders"),
      ("a5", "Bob Marley"), ("a6", "Carol King"))
      .toDF("id", "name")
    val truth = Seq(
      ("a1", "a2", true), ("a1", "a3", true), ("a2", "a3", true),
      ("a1", "a4", false), ("a3", "a4", false))
      .toDF("id1", "id2", "same")
    val scored = AgentMatch.sameAsPairs(records, "id", "name",
      threshold = 0.5, simThreshold = 0.85)
    // sanity on the fixture premise: the variant pair scores inside (0.5, 0.95)
    val scores = scored.as[(String, String, Double)].collect()
      .map { case (a, b, s) => (Set(a, b), s) }.toMap
    scores(Set("a1", "a2")) shouldBe 1.0
    val variant = scores(Set("a1", "a3"))
    variant should (be > 0.5 and be < 0.95)

    val eval = ResolutionEvaluation.evaluate(truth, scored, Seq(0.5, 0.95))
      .collect().map(r => r.getDouble(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)),
          (r.getDouble(5), r.getDouble(6), r.getDouble(7)))).toMap
    // t=0.5: {a1,a2,a3} merge -> perfect P/R on the 5 truth pairs
    eval(0.5) shouldBe (((3L, 0L, 0L, 2L), (1.0, 1.0, 1.0)))
    // t=0.95: only the exact-name pair survives -> recall 1/3, precision 1
    val ((tp, fp, fn, tn), (p, rc, f1)) = eval(0.95)
    (tp, fp, fn, tn) shouldBe ((1L, 0L, 2L, 2L))
    p shouldBe 1.0
    rc shouldBe (1.0 / 3) +- 1e-12
    f1 shouldBe 0.5 +- 1e-12
  }

  it should "score Paris classes on the dyadic fixture exactly" in {
    // MatchSpec's dyadic fixture: resolve() yields exactly
    // P(x1~x2) = 0.625 and P(x1~x3) = 0.125
    val stmts = Seq(
      ("x1", "grp", "gA", false), ("x1", "par", "qA", false),
      ("x2", "grp", "gA", false), ("x2", "par", "qA", false),
      ("x3", "grp", "gB", false), ("x3", "par", "qA", false))
      .toDF("x", "p", "o", "oIsInstance")
    val props = Seq(("grp", 0.5, 0.5), ("par", 0.75, 0.25))
      .toDF("p", "fun", "inv_fun")
    val noEq = Seq.empty[(String, String, Double)].toDF("o1", "o2", "prob")
    val scored = Paris.resolve(stmts, noEq, props, iterations = 10)
      .select($"x1".as("id1"), $"x2".as("id2"), $"prob".as("score"))
    val truth = Seq(
      ("x1", "x2", true), ("x1", "x3", false), ("x2", "x3", false))
      .toDF("id1", "id2", "same")
    val eval = ResolutionEvaluation.evaluate(truth, scored, Seq(0.1, 0.5))
      .collect().map(r => r.getDouble(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)),
          (r.getDouble(5), r.getDouble(6)))).toMap
    // t=0.5 keeps only x1~x2 (0.625): perfect
    eval(0.5) shouldBe (((1L, 0L, 0L, 2L), (1.0, 1.0)))
    // t=0.1 also admits x1~x3 (0.125): everything merges -> 2 false pairs
    eval(0.1) shouldBe (((1L, 2L, 0L, 0L), (1.0 / 3, 1.0)))
  }

  it should "render the reference's CSV report shape" in {
    val truth = Seq(("a", "b", true)).toDF("id1", "id2", "same")
    val scored = Seq(("a", "b", 0.9)).toDF("id1", "id2", "score")
    val lines = ResolutionEvaluation.report(
      ResolutionEvaluation.evaluate(truth, scored, Seq(0.5)))
    lines.head shouldBe "threshold,tp,fp,fn,tn,precision,recall,f1"
    lines(1) shouldBe "0.5000,1,0,0,0,1.000000,1.000000,1.000000"
  }
}
