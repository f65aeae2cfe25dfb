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
      "rdf:type",
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

  "JsonLd.parse" should "round-trip the writer's expanded-flat output" in {
    JsonLd.parse(JsonLd.serialize(quads), "g").toSet shouldBe quads.toSet
  }

  it should "parse authored compact form: context prefixes, bare scalars, nested nodes" in {
    val doc =
      """{"@context":{"schema":"http://schema.org/","name":"http://schema.org/name"},
        | "@id":"http://ex.org/alice",
        | "@type":"schema:Person",
        | "name":"Alice",
        | "schema:age":41,
        | "schema:height":1.7,
        | "schema:active":true,
        | "schema:knows":{"@id":"http://ex.org/bob","name":"Bob"}}""".stripMargin
    val got = JsonLd.parse(doc, "g").toSet
    got should contain(Quad("http://ex.org/alice",
      "rdf:type",
      "http://schema.org/Person", Quad.IRI, null, null, "g"))
    got should contain(Quad("http://ex.org/alice", "http://schema.org/name",
      "Alice", Quad.LITERAL, null, null, "g"))
    got should contain(Quad("http://ex.org/alice", "http://schema.org/age",
      "41", Quad.LITERAL, Quad.Xsd.long, null, "g"))
    got should contain(Quad("http://ex.org/alice", "http://schema.org/height",
      "1.7", Quad.LITERAL, Quad.Xsd.double, null, "g"))
    got should contain(Quad("http://ex.org/alice", "http://schema.org/active",
      "true", Quad.LITERAL, Quad.Xsd.boolean, null, "g"))
    // nested node: edge + the nested node's own property
    got should contain(Quad("http://ex.org/alice", "http://schema.org/knows",
      "http://ex.org/bob", Quad.IRI, null, null, "g"))
    got should contain(Quad("http://ex.org/bob", "http://schema.org/name",
      "Bob", Quad.LITERAL, null, null, "g"))
  }

  it should "mint fresh blank nodes for id-less nested nodes" in {
    val doc =
      """{"@id":"http://ex.org/a","http://ex.org/p":
        | {"http://schema.org/name":"anon"}}""".stripMargin
    val got = JsonLd.parse(doc, "g")
    val edge = got.find(_.p == "http://ex.org/p").get
    edge.oKind shouldBe Quad.BNODE
    got should contain(Quad(edge.o, "http://schema.org/name", "anon",
      Quad.LITERAL, null, null, "g"))
  }

  it should "land named-graph nodes in their graph" in {
    val doc =
      """{"@graph":[
        | {"@id":"http://ex.org/g1","@graph":[
        |   {"@id":"http://ex.org/a","http://schema.org/name":"in-g1"}]},
        | {"@id":"http://ex.org/b","http://schema.org/name":"in-default"}]}""".stripMargin
    val got = JsonLd.parse(doc, "dg").toSet
    got should contain(Quad("http://ex.org/a", "http://schema.org/name",
      "in-g1", Quad.LITERAL, null, null, "http://ex.org/g1"))
    got should contain(Quad("http://ex.org/b", "http://schema.org/name",
      "in-default", Quad.LITERAL, null, null, "dg"))
  }

  it should "lower @list to rdf:first/rdf:rest chains" in {
    val rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    val got = JsonLd.parse(
      """{"@id":"http://ex.org/a",
        | "http://ex.org/p":{"@list":["x", 2]},
        | "http://ex.org/q":{"@list":[]}}""".stripMargin, "g")
    val head = got.find(_.p == "http://ex.org/p").get
    head.oKind shouldBe Quad.BNODE
    val f1 = got.find(q => q.s == head.o && q.p == rdf + "first").get
    f1.o shouldBe "x"
    val r1 = got.find(q => q.s == head.o && q.p == rdf + "rest").get
    val f2 = got.find(q => q.s == r1.o && q.p == rdf + "first").get
    f2.o shouldBe "2"
    f2.oDt shouldBe Quad.Xsd.long
    got.find(q => q.s == r1.o && q.p == rdf + "rest").get.o shouldBe rdf + "nil"
    got.find(_.p == "http://ex.org/q").get.o shouldBe rdf + "nil"
    // @container stays a loud failure
    an[IllegalArgumentException] should be thrownBy JsonLd.parse(
      """{"@id":"http://ex.org/a","@container":"x"}""", "g")
  }

  it should "fail loudly on non-scalar @value and keep _:jb labels distinct" in {
    an[IllegalArgumentException] should be thrownBy JsonLd.parse(
      """{"@id":"http://ex.org/a","http://ex.org/p":{"@value":null}}""", "g")
    an[IllegalArgumentException] should be thrownBy JsonLd.parse(
      """{"@id":"http://ex.org/a","http://ex.org/p":{"@value":{"x":1}}}""", "g")
    // an explicit _:jb1 label must not be merged with a minted one
    val got = JsonLd.parse(
      """{"@graph":[
        | {"@id":"_:jb1","http://ex.org/p":"explicit"},
        | {"@id":"http://ex.org/a","http://ex.org/q":{"http://ex.org/r":"anon"}}
        |]}""".stripMargin, "g")
    val anon = got.find(_.p == "http://ex.org/q").get.o
    anon should not be "_:jb1"
    got.filter(_.s == "_:jb1").map(_.o) shouldBe Seq("explicit")
  }

  it should "read distributed and feed SPARQL LOAD by extension" in {
    val dir = java.nio.file.Files.createTempDirectory("jsonld").toFile
    try {
      java.nio.file.Files.write(new java.io.File(dir, "a.jsonld").toPath,
        JsonLd.serialize(quads.take(2)).getBytes("UTF-8"))
      java.nio.file.Files.write(new java.io.File(dir, "b.jsonld").toPath,
        JsonLd.serialize(quads.drop(4)).getBytes("UTF-8"))
      val got = JsonLd.read(spark, dir.getAbsolutePath + "/*.jsonld", "g")
      got.count() shouldBe 4
      got.collect().toSet shouldBe (quads.take(2) ++ quads.drop(4)).toSet
    } finally {
      dir.listFiles.foreach(_.delete()); dir.delete()
    }
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
