package graft.sources

import graft.SparkSpec
import graft.rdf.Quad

class RdfXmlSpec extends SparkSpec {

  private def q(s: String, p: String, o: String, kind: Byte = Quad.IRI,
      dt: String = null, lang: String = null) =
    Quad(s, p, o, kind, dt, lang, "g")

  private val quads = Seq(
    q("http://ex.org/alice", "http://schema.org/name", "Alice <&> \"A\"",
      Quad.LITERAL),
    q("http://ex.org/alice", "http://schema.org/knows", "http://ex.org/bob"),
    q("http://ex.org/alice", "http://schema.org/note", "hi", Quad.LITERAL,
      lang = "en"),
    q("http://ex.org/bob", "http://schema.org/height", "1.82", Quad.LITERAL,
      dt = Quad.Xsd.double),
    q("http://ex.org/bob", "http://schema.org/ref", "_:b1", Quad.BNODE),
    q("_:b1", "http://schema.org/name", "Anon", Quad.LITERAL))

  "RdfXml.serialize" should "emit namespaced property elements grouped by subject" in {
    val doc = RdfXml.serialize(quads)
    doc should include("""<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">""")
    doc should include("""<rdf:Description rdf:about="http://ex.org/alice">""")
    doc should include("""<p:knows xmlns:p="http://schema.org/" rdf:resource="http://ex.org/bob"/>""")
    // XML escaping in text, lang and datatype attributes
    doc should include("Alice &lt;&amp;&gt; \"A\"")
    doc should include("""xml:lang="en"""")
    doc should include(s"""rdf:datatype="${Quad.Xsd.double}"""")
    // each subject appears exactly once
    doc.linesIterator.count(_.contains("rdf:about=\"http://ex.org/alice\"")) shouldBe 1
  }

  it should "round-trip through RdfXml.parse" in {
    RdfXml.parse(RdfXml.serialize(quads), "g").toSet shouldBe quads.toSet
  }

  "RdfXml.parse" should "read typed node elements as rdf:type" in {
    val doc =
      """<?xml version="1.0"?>
        |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        |         xmlns:s="http://schema.org/">
        |  <s:Person rdf:about="http://ex.org/carol">
        |    <s:name>Carol</s:name>
        |  </s:Person>
        |</rdf:RDF>""".stripMargin
    RdfXml.parse(doc, "g").toSet shouldBe Set(
      q("http://ex.org/carol", "rdf:type",
        "http://schema.org/Person"),
      q("http://ex.org/carol", "http://schema.org/name", "Carol", Quad.LITERAL))
  }

  it should "parse property attributes, parseType Resource and Collection" in {
    val rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    val doc =
      """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        |         xmlns:s="http://schema.org/">
        |  <rdf:Description rdf:about="http://ex.org/a" s:name="Ada" s:job="dev">
        |    <s:addr rdf:parseType="Resource">
        |      <s:city>Oslo</s:city>
        |      <s:zip>1234</s:zip>
        |    </s:addr>
        |    <s:kids rdf:parseType="Collection">
        |      <rdf:Description rdf:about="http://ex.org/k1"/>
        |      <rdf:Description rdf:about="http://ex.org/k2"/>
        |    </s:kids>
        |    <s:none rdf:parseType="Collection"/>
        |  </rdf:Description>
        |</rdf:RDF>""".stripMargin
    val got = RdfXml.parse(doc, "g")
    val byP = got.map(q => q.p -> q).toMap
    byP("http://schema.org/name").o shouldBe "Ada"
    byP("http://schema.org/job").o shouldBe "dev"
    // parseType=Resource: bnode with the inner property elements
    val addr = byP("http://schema.org/addr")
    addr.oKind shouldBe Quad.BNODE
    got.find(q => q.s == addr.o && q.p == "http://schema.org/city").get.o shouldBe "Oslo"
    got.find(q => q.s == addr.o && q.p == "http://schema.org/zip").get.o shouldBe "1234"
    // parseType=Collection: rdf:first/rdf:rest chain over the node elements
    val kids = byP("http://schema.org/kids")
    kids.oKind shouldBe Quad.BNODE
    val c1 = got.find(q => q.s == kids.o && q.p == rdf + "first").get
    c1.o shouldBe "http://ex.org/k1"
    val r1 = got.find(q => q.s == kids.o && q.p == rdf + "rest").get
    got.find(q => q.s == r1.o && q.p == rdf + "first").get.o shouldBe "http://ex.org/k2"
    got.find(q => q.s == r1.o && q.p == rdf + "rest").get.o shouldBe rdf + "nil"
    byP("http://schema.org/none").o shouldBe rdf + "nil"
    // unsupported parseType stays loud
    an[IllegalArgumentException] should be thrownBy RdfXml.parse(
      """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">
        |<rdf:Description rdf:about="http://ex.org/x">
        |<rdf:value rdf:parseType="Literal"><b>x</b></rdf:value>
        |</rdf:Description></rdf:RDF>""".stripMargin)
  }

  it should "emit rdf:type attributes and keep minted ids clear of authored nodeIDs" in {
    val rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    val doc =
      """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        |         xmlns:s="http://schema.org/">
        |  <rdf:Description rdf:nodeID="genid1">
        |    <s:name>explicit</s:name>
        |  </rdf:Description>
        |  <rdf:Description rdf:about="http://ex.org/a"
        |                   rdf:type="http://ex.org/T">
        |    <s:addr rdf:parseType="Resource"><s:city>Oslo</s:city></s:addr>
        |  </rdf:Description>
        |</rdf:RDF>""".stripMargin
    val got = RdfXml.parse(doc, "g")
    val ty = got.find(_.p == "rdf:type").get
    ty.o shouldBe "http://ex.org/T"
    ty.oKind shouldBe Quad.IRI
    // the parseType=Resource bnode must not collide with authored genid1
    val addr = got.find(_.p == "http://schema.org/addr").get.o
    addr should not be "_:genid1"
    got.filter(_.s == "_:genid1").map(_.o) shouldBe Seq("explicit")
  }

  it should "reject a non-RDF root loudly" in {
    val e = intercept[IllegalArgumentException] {
      RdfXml.parse("<html><body/></html>")
    }
    e.getMessage should include("not an rdf:RDF document")
  }

  "RdfXml.splitQName" should "split at the longest NCName suffix and fail on none" in {
    RdfXml.splitQName("http://schema.org/name") shouldBe ("http://schema.org/", "name")
    RdfXml.splitQName("http://ex.org/ns#p-1.x") shouldBe ("http://ex.org/ns#", "p-1.x")
    intercept[IllegalArgumentException](RdfXml.splitQName("http://ex.org/ns#"))
  }

  it should "read distributed, one task per document" in {
    val dir = java.nio.file.Files.createTempDirectory("graft-rdfxml")
    java.nio.file.Files.writeString(dir.resolve("a.rdf"), RdfXml.serialize(quads))
    val got = RdfXml.read(spark, dir.toString + "/*.rdf").collect().toSet
    got shouldBe quads.map(_.copy(g = "graft:default")).toSet
  }
}
