package graft.rdf

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuadStoreSpec extends SparkSpec {
  import spark.implicits._

  private def quadsDf(rows: (String, String, String, String)*) =
    rows.map { case (s, p, o, g) => (s, p, o, 2.toByte, null: String, null: String, g) }
      .toDF("s", "p", "o", "oKind", "oDt", "oLang", "g")

  "replaceGraphDiff" should "compute added and removed scoped to one graph" in {
    val current = quadsDf(
      ("a", "p", "1", "doc1"), ("a", "q", "2", "doc1"), ("z", "p", "9", "doc2"))
    val next = quadsDf(
      ("a", "p", "1", "doc1"), ("a", "q", "3", "doc1"))
    val d = QuadStore.replaceGraphDiff(current, next, "doc1")
    d.added.select("s", "p", "o").as[(String, String, String)].collect().toSet shouldBe
      Set(("a", "q", "3"))
    d.removed.select("s", "p", "o").as[(String, String, String)].collect().toSet shouldBe
      Set(("a", "q", "2"))
  }

  it should "leave other graphs untouched when the diff is applied" in {
    val current = quadsDf(("a", "p", "1", "doc1"), ("z", "p", "9", "doc2"))
    val next = quadsDf(("b", "p", "2", "doc1"))
    val d = QuadStore.replaceGraphDiff(current, next, "doc1")
    val updated = QuadStore.applyDiff(current, d)
    updated.select("s", "g").as[(String, String)].collect().toSet shouldBe
      Set(("b", "doc1"), ("z", "doc2"))
  }

  "guardAgainstNegations" should "drop negated additions regardless of graph" in {
    val added = quadsDf(("a", "p", "1", "enr"), ("b", "p", "2", "enr"))
    val negations = quadsDf(("b", "p", "2", "user"))
    QuadStore.guardAgainstNegations(added, negations)
      .select("s").as[String].collect().toSeq shouldBe Seq("a")
  }

  "diff re-application" should "be idempotent (re-ingest invariant)" in {
    val current = quadsDf(("a", "p", "1", "doc1"))
    val next = quadsDf(("a", "p", "1", "doc1"), ("a", "p", "2", "doc1"))
    val d1 = QuadStore.replaceGraphDiff(current, next, "doc1")
    val once = QuadStore.applyDiff(current, d1)
    val d2 = QuadStore.replaceGraphDiff(once, next, "doc1")
    d2.isEmpty shouldBe true
  }
}
