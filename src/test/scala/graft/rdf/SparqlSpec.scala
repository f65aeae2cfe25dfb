package graft.rdf

import graft.SparkSpec

class SparqlSpec extends SparkSpec {
  import spark.implicits._

  private def quad(s: String, p: String, o: String, g: String = "g1") =
    (s, p, o, 2.toByte, null: String, null: String, g)

  private lazy val quads = Seq(
    quad("alice", "name", "Alice"),
    quad("alice", "age", "31"),
    quad("alice", "knows", "bob"),
    quad("bob", "name", "Bob"),
    quad("bob", "age", "7"),
    quad("carol", "name", "Carol", "g2"))
    .toDF("s", "p", "o", "oKind", "oDt", "oLang", "g")

  "Sparql.select" should "run a BGP with projection" in {
    Sparql.select(quads,
      "SELECT ?n WHERE { ?x <knows> ?y . ?y <name> ?n }")
      .as[String].collect().toSeq shouldBe Seq("Bob")
  }

  it should "support FILTER with numeric comparison and boolean ops" in {
    Sparql.select(quads,
      """SELECT ?x WHERE { ?x <age> ?a . FILTER(?a >= 18) }""")
      .as[String].collect().toSeq shouldBe Seq("alice")
    Sparql.select(quads,
      """SELECT ?x WHERE { ?x <age> ?a . FILTER(?a >= 18 || ?a < 10) }""")
      .as[String].collect().toSet shouldBe Set("alice", "bob")
  }

  it should "support OPTIONAL with null padding" in {
    val rows = Sparql.select(quads,
      "SELECT ?x ?y WHERE { ?x <name> ?n . OPTIONAL { ?x <knows> ?y } }")
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toSet
    rows shouldBe Set(("alice", Some("bob")), ("bob", None), ("carol", None))
  }

  it should "support GRAPH scoping" in {
    Sparql.select(quads,
      "SELECT ?x WHERE { GRAPH <g2> { ?x <name> ?n } }")
      .as[String].collect().toSeq shouldBe Seq("carol")
  }

  it should "support UNION, DISTINCT, ORDER BY and LIMIT" in {
    val res = Sparql.select(quads,
      """SELECT DISTINCT ?n WHERE {
        |  { ?x <name> ?n } UNION { ?x <knows> ?n }
        |} ORDER BY ?n LIMIT 3""".stripMargin)
      .as[String].collect().toSeq
    res shouldBe Seq("Alice", "Bob", "Carol")
  }

  it should "match string literals in FILTER" in {
    Sparql.select(quads,
      """SELECT ?x WHERE { ?x <name> ?n . FILTER(?n = "Alice") }""")
      .as[String].collect().toSeq shouldBe Seq("alice")
  }

  it should "support BIND and VALUES" in {
    val res = Sparql.select(quads,
      """SELECT ?x ?tag WHERE {
        |  ?x <name> ?n . BIND("person" AS ?tag)
        |  VALUES ?x { <alice> <bob> }
        |}""".stripMargin)
      .as[(String, String)].collect().toSet
    res shouldBe Set(("alice", "person"), ("bob", "person"))
  }

  "Sparql.ask" should "answer existence queries" in {
    Sparql.ask(quads, "ASK { <alice> <knows> ?y }") shouldBe true
    Sparql.ask(quads, "ASK { <carol> <knows> ?y }") shouldBe false
  }
}
