package graft.sources

import graft.SparkSpec
import graft.rdf.Quad

class JsonLdSpec extends SparkSpec {
  import spark.implicits._

  private val quads = Seq(
    Quad("http://ex.org/alice", "http://schema.org/name", "Alice \"A.\"",
      Quad.LITERAL, null, null, "g"),
    Quad("http://ex.org/alice", "http://schema.org/knows", "http://ex.org/bob",
      Quad.IRI, null, null, "g"),
    Quad("http://ex.org/alice", "http://schema.org/knows", "http://ex.org/carol",
      Quad.IRI, null, null, "g"),
    Quad("http://ex.org/alice",
      "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
      "http://schema.org/Person", Quad.IRI, null, null, "g"),
    Quad("http://ex.org/bob", "http://schema.org/name", "Bob",
      Quad.LITERAL, null, "en", "g"),
    Quad("http://ex.org/bob", "http://schema.org/height", "1.82",
      Quad.LITERAL, Quad.Xsd.double, null, "g"))

  "JsonLd.serialize" should "emit one node object per subject with typed objects" in {
    val doc = JsonLd.serialize(quads)
    doc should include(""""@id":"http://ex.org/alice"""")
    doc should include(""""@type":["http://schema.org/Person"]""")
    doc should include(
      """"http://schema.org/knows":[{"@id":"http://ex.org/bob"},{"@id":"http://ex.org/carol"}]""")
    doc should include(""""@value":"Bob","@language":"en"""")
    doc should include(
      """"@value":"1.82","@type":"http://www.w3.org/2001/XMLSchema#double"""")
    doc should include(""""@value":"Alice \"A.\""""")
  }

  it should "be machine-readable JSON (Spark's JSON reader parses @graph)" in {
    // parse the emitted document with a real JSON parser — proves the
    // escaping and structure, not just substrings
    val doc = JsonLd.serialize(quads)
    val parsed = spark.read.json(Seq(doc).toDS())
    parsed.columns should contain("@graph")
    import org.apache.spark.sql.functions._
    val nodes = parsed.select(explode(col("`@graph`")).as("n")).select("n.*")
    nodes.count() shouldBe 2 // one node object per subject
    nodes.select("`@id`").as[String].collect().toSet shouldBe
      Set("http://ex.org/alice", "http://ex.org/bob")
  }

  "TriG" should "round-trip through Turtle.parse with graphs intact" in {
    val trigQuads = (quads.take(2).map(_.copy(g = "http://ex.org/g1")) ++
      quads.drop(4).map(_.copy(g = "http://ex.org/g2"))).toSet
    val doc = Turtle.serializeTrig(trigQuads.toSeq)
    Turtle.parse(doc).toSet shouldBe trigQuads
  }

  "Turtle.writeTrigStream" should "group subject blocks inside named-graph blocks" in {
    val trigQuads = quads.take(2).map(_.copy(g = "http://ex.org/g1")) ++
      quads.drop(4).map(_.copy(g = "http://ex.org/g2"))
    val sb = new StringBuilder
    val sorted = trigQuads.sortBy(q => (q.g, q.s, q.p, q.o))
    Turtle.writeTrigStream(
      sorted.iterator.map(q => (q.g, q.s, q.p, q.o, q.oKind, q.oDt, q.oLang)),
      s => sb.append(s))
    val doc = sb.toString
    doc should include("<http://ex.org/g1> {")
    doc should include("<http://ex.org/g2> {")
    // subject block with ;-chained predicates inside the graph block
    doc should include("schema:name")
    doc should include(""""Bob"@en""")
    // both graph blocks close
    doc.linesIterator.count(_.trim == "}") shouldBe 2
  }
}
