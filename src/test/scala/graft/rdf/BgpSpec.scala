package graft.rdf

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BgpSpec extends SparkSpec {
  import spark.implicits._
  import Bgp.Pattern

  private def quad(s: String, p: String, o: String, g: String = "g1") =
    (s, p, o, 2.toByte, null: String, null: String, g)

  private lazy val quads = Seq(
    quad("alice", "name", "Alice"),
    quad("alice", "knows", "bob"),
    quad("bob", "name", "Bob"),
    quad("bob", "knows", "carol"),
    quad("carol", "name", "Carol", "g2"),
    quad("narcissus", "knows", "narcissus"))
    .toDF("s", "p", "o", "oKind", "oDt", "oLang", "g")

  "scan" should "filter constants and project variables" in {
    Bgp.scan(quads, Pattern("?x", "name", "?n"))
      .as[(String, String)].collect().toSet shouldBe
      Set(("alice", "Alice"), ("bob", "Bob"), ("carol", "Carol"))
  }

  it should "handle a repeated variable as a self-equality filter" in {
    Bgp.scan(quads, Pattern("?x", "knows", "?x"))
      .as[String].collect().toSeq shouldBe Seq("narcissus")
  }

  it should "scope to a graph when requested" in {
    Bgp.scan(quads, Pattern("?x", "name", "?n", g = Some("g2")))
      .as[(String, String)].collect().toSet shouldBe Set(("carol", "Carol"))
  }

  "bgp" should "join patterns on shared variables" in {
    Bgp.bgp(quads,
        Pattern("?x", "knows", "?y"),
        Pattern("?y", "name", "?yn"))
      .select("x", "yn").as[(String, String)].collect().toSet shouldBe
      Set(("alice", "Bob"), ("bob", "Carol"))
  }

  "optional" should "keep unmatched left rows with nulls" in {
    val left = Bgp.bgp(quads, Pattern("?x", "name", "?n"))
    val res = Bgp.optional(left, quads, Pattern("?x", "knows", "?y"))
      .select("x", "y").collect()
      .map(r => (r.getString(0), Option(r.getString(1)))).toSet
    res shouldBe Set(
      ("alice", Some("bob")), ("bob", Some("carol")), ("carol", None))
  }

  "union" should "pad missing variables with nulls" in {
    val a = Bgp.bgp(quads, Pattern("?x", "name", "?n"))
    val b = Bgp.bgp(quads, Pattern("?x", "knows", "?y"))
    val u = Bgp.union(a, b)
    u.columns.toSet shouldBe Set("x", "n", "y")
    u.count() shouldBe 6
  }

  "ask" should "report pattern satisfiability" in {
    Bgp.ask(quads, Pattern("alice", "knows", "?y")) shouldBe true
    Bgp.ask(quads, Pattern("carol", "knows", "?y")) shouldBe false
  }

  "bgp join ordering" should "avoid cartesian products on interleaved disconnected chains" in {
    // authored order joins {?x knows ?y} to {?a name ?an} with no shared
    // vars — the old left-fold cross-joined at step two; the greedy
    // connectivity order joins pattern 3 first and never goes cartesian
    val df = Bgp.bgp(quads,
      Pattern("?x", "knows", "?y"),
      Pattern("?a", "name", "?an"),
      Pattern("?y", "knows", "?a"))
    df.as[(String, String, String, String)].collect().toSet shouldBe
      Set(("alice", "bob", "carol", "Carol")) // column order stays authored
    val plan = df.queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  it should "still cross join genuinely disconnected pattern graphs" in {
    val df = Bgp.bgp(quads,
      Pattern("alice", "knows", "?y"),
      Pattern("carol", "name", "?cn"))
    df.as[(String, String)].collect().toSet shouldBe Set(("bob", "Carol"))
  }
}
