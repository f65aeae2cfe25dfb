package graft.sources

import graft.SparkSpec
import graft.rdf.Quad

class TurtleSpec extends SparkSpec {

  private def q(s: String, p: String, o: String, kind: Byte = Quad.IRI,
      dt: String = null, lang: String = null) =
    Quad(s, p, o, kind, dt, lang, "g")

  private val quads = Seq(
    q("http://ex.org/alice", "http://schema.org/name", "Alice \"A.\"\nW.",
      Quad.LITERAL),
    q("http://ex.org/alice", "http://schema.org/knows", "http://ex.org/bob"),
    q("http://ex.org/alice", "http://schema.org/knows", "http://ex.org/carol"),
    q("http://ex.org/alice",
      "rdf:type",
      "http://schema.org/Person"),
    q("http://ex.org/bob", "http://schema.org/name", "Bob", Quad.LITERAL,
      lang = "en"),
    q("http://ex.org/bob", "http://schema.org/height", "1.82", Quad.LITERAL,
      dt = Quad.Xsd.double),
    q("http://ex.org/bob", "http://schema.org/id", "b-7", Quad.LITERAL),
    q("_:blank1", "http://schema.org/name", "Anon", Quad.LITERAL))

  "Turtle.serialize" should "abbreviate with prefixes and group subjects" in {
    val doc = Turtle.serialize(quads)
    doc should include("@prefix schema: <http://schema.org/> .")
    // rdf:type becomes the `a` keyword
    doc should include("a schema:Person")
    // object list: two knows targets joined with a comma on one predicate
    doc should include("schema:knows <http://ex.org/bob>, <http://ex.org/carol>")
    // each subject appears exactly once (subject grouping)
    doc.linesIterator.count(_.startsWith("<http://ex.org/alice>")) shouldBe 1
    // literals carry lang / datatype abbreviated forms
    doc should include(""""Bob"@en""")
    doc should include(""""1.82"^^xsd:double""")
  }

  it should "round-trip through Turtle.parse" in {
    val doc = Turtle.serialize(quads)
    val back = Turtle.parse(doc, "g")
    back.toSet shouldBe quads.toSet
  }

  "Turtle.parse" should "honor document @prefix and @base, comments and bare literals" in {
    val doc =
      """# a comment
        |@prefix ex: <http://ex.org/> .
        |@base <http://base.org/> .
        |ex:dave ex:age 41 ;   # trailing comment
        |        ex:score 3.5 ;
        |        ex:active true ;
        |        ex:link <rel> .
        |""".stripMargin
    val got = Turtle.parse(doc, "g").map(t => (t.p, t.o, t.oDt)).toSet
    got shouldBe Set(
      ("http://ex.org/age", "41", Quad.Xsd.long),
      ("http://ex.org/score", "3.5", Quad.Xsd.decimal),
      ("http://ex.org/active", "true", Quad.Xsd.boolean),
      ("http://ex.org/link", "http://base.org/rel", null))
  }

  it should "type only exponent forms as xsd:double" in {
    val doc = "@prefix ex: <http://ex.org/> .\n" +
      "ex:a ex:v 1.5e3 ; ex:w 2E-1 .\n"
    Turtle.parse(doc, "g").map(_.oDt).toSet shouldBe Set(Quad.Xsd.double)
  }

  it should "round-trip escaped backslash followed by n/r/t letters" in {
    // the sequential-replace unescape corrupted C:\new into C:<newline>ew
    val tricky = Seq(
      q("http://ex.org/f", "http://schema.org/path", "C:\\new\\train", Quad.LITERAL),
      q("http://ex.org/f", "http://schema.org/mix", "a\\n\nb\\t\t", Quad.LITERAL))
    Turtle.parse(Turtle.serialize(tricky), "g").toSet shouldBe tricky.toSet
  }

  it should "parse \\u and \\U escapes" in {
    val doc = "@prefix ex: <http://ex.org/> .\n" +
      "ex:a ex:v \"A\\u00e9B\\U0001F600C\" .\n"
    Turtle.parse(doc, "g").head.o shouldBe "A\u00e9B\ud83d\ude00C"
  }

  it should "parse SPARQL-style PREFIX and long strings" in {
    val doc = "PREFIX ex: <http://ex.org/>\n" +
      "ex:a ex:note \"\"\"line one\nline two\"\"\" .\n"
    val got = Turtle.parse(doc, "g")
    got.head.o shouldBe "line one\nline two"
  }

  it should "process escapes inside long strings and longest-match the closer" in {
    // ECHAR/UCHAR are live inside long strings; """" means content
    // ends with a quote; escaped \" does not terminate the run
    val doc = "PREFIX ex: <http://ex.org/>\n" +
      "ex:a ex:p \"\"\"tab\\there \"quoted\" back\\\\slash\"\"\" .\n" +
      "ex:b ex:p \"\"\"ends with quote\"\"\"\" .\n" +
      "ex:c ex:p \"\"\"esc \\\" mid\"\"\" .\n"
    val byS = Turtle.parse(doc, "g").map(q => q.s -> q.o).toMap
    byS("http://ex.org/a") shouldBe "tab\there \"quoted\" back\\slash"
    byS("http://ex.org/b") shouldBe "ends with quote\""
    byS("http://ex.org/c") shouldBe "esc \" mid"
  }

  it should "parse single-quoted strings, both short and long" in {
    val doc = "PREFIX ex: <http://ex.org/>\n" +
      "ex:a ex:p 'plain' .\n" +
      "ex:b ex:p 'has \"double\" quotes'@en .\n" +
      "ex:c ex:p 'esc\\'aped' .\n" +
      "ex:d ex:p '''long\nwith \"quotes\" and 'single' ones''' .\n" +
      "ex:e ex:p '42'^^<http://www.w3.org/2001/XMLSchema#integer> .\n"
    val got = Turtle.parse(doc, "g")
    val byS = got.map(q => q.s -> q.o).toMap
    byS("http://ex.org/a") shouldBe "plain"
    byS("http://ex.org/b") shouldBe "has \"double\" quotes"
    got.find(_.s == "http://ex.org/b").get.oLang shouldBe "en"
    byS("http://ex.org/c") shouldBe "esc'aped"
    byS("http://ex.org/d") shouldBe "long\nwith \"quotes\" and 'single' ones"
    got.find(_.s == "http://ex.org/e").get.oDt should endWith("integer")
  }

  it should "not merge fresh anon labels with explicit _:tb labels" in {
    val got = Turtle.parse(
      """@prefix ex: <http://ex.org/> .
        |_:tb1 ex:p ex:explicit .
        |ex:a ex:q [ ex:r ex:s ] .""".stripMargin, "g")
    val anon = got.find(_.p == "http://ex.org/q").get.o
    anon should not be "_:tb1"
    got.filter(_.s == "_:tb1").map(_.p) shouldBe Seq("http://ex.org/p")
  }

  it should "accept ; runs, leading-dot decimals, and reject bare subjects" in {
    val got = Turtle.parse(
      """@prefix ex: <http://ex.org/> .
        |ex:a ex:p ex:o ; ; ex:q .5 ; .""".stripMargin, "g")
    got.map(_.p).sorted shouldBe Seq("http://ex.org/p", "http://ex.org/q")
    val dec = got.find(_.p == "http://ex.org/q").get
    dec.o shouldBe ".5"
    dec.oDt shouldBe graft.rdf.Quad.Xsd.decimal
    // a subject with no predicates is a truncated statement (§7.1 allows
    // it only for [ p o ] subjects)
    an[Exception] should be thrownBy
      Turtle.parse("@prefix ex: <http://ex.org/> . ex:a .", "g")
    // truncated input fails as a parse error, not an internal crash
    an[Exception] should be thrownBy Turtle.parse("<http://ex.org/a>", "g")
  }

  it should "accept the GRAPH keyword and anonymous default blocks in TriG" in {
    val got = Turtle.parse(
      """@prefix ex: <http://ex.org/> .
        |GRAPH ex:g1 { ex:a ex:p ex:b . }
        |{ ex:c ex:p ex:d . }
        |ex:g2 { ex:e ex:p ex:f . }""".stripMargin, "dg")
    got.find(_.s == "http://ex.org/a").get.g shouldBe "http://ex.org/g1"
    got.find(_.s == "http://ex.org/c").get.g shouldBe "dg"
    got.find(_.s == "http://ex.org/e").get.g shouldBe "http://ex.org/g2"
  }

  it should "parse blank-node property lists as object, subject, and nested" in {
    val got = Turtle.parse(
      """@prefix ex: <http://ex.org/> .
        |ex:a ex:b [ ex:c ex:d ; ex:e "v" ] .
        |[ ex:p ex:q ] ex:r ex:s .
        |ex:m ex:n [ ex:o [ ex:deep "x" ] ] .
        |ex:y ex:z [] .""".stripMargin, "g")
    val b1 = got.find(q => q.s == "http://ex.org/a").get.o
    b1 should startWith("_:")
    got should contain(Quad(b1, "http://ex.org/c", "http://ex.org/d",
      Quad.IRI, null, null, "g"))
    got should contain(Quad(b1, "http://ex.org/e", "v",
      Quad.LITERAL, null, null, "g"))
    // subject-position list: the anon subject carries BOTH its inner and
    // outer predicates
    val anonSubj = got.find(_.p == "http://ex.org/p").get.s
    got should contain(Quad(anonSubj, "http://ex.org/r", "http://ex.org/s",
      Quad.IRI, null, null, "g"))
    // nested: m --n--> b2 --o--> b3 --deep--> "x"
    val b2 = got.find(_.p == "http://ex.org/n").get.o
    val b3 = got.find(q => q.s == b2 && q.p == "http://ex.org/o").get.o
    got should contain(Quad(b3, "http://ex.org/deep", "x",
      Quad.LITERAL, null, null, "g"))
    // ANON object
    got.find(_.p == "http://ex.org/z").get.oKind shouldBe Quad.BNODE
  }

  it should "parse collections as rdf:first/rdf:rest chains" in {
    val rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    val got = Turtle.parse(
      """@prefix ex: <http://ex.org/> .
        |ex:a ex:list ( ex:x "two" 3 ) .
        |ex:b ex:empty () .""".stripMargin, "g")
    val head = got.find(_.p == "http://ex.org/list").get
    head.oKind shouldBe Quad.BNODE
    def cell(c: String): (Quad, Quad) = (
      got.find(q => q.s == c && q.p == rdf + "first").get,
      got.find(q => q.s == c && q.p == rdf + "rest").get)
    val (f1, r1) = cell(head.o)
    f1.o shouldBe "http://ex.org/x"
    val (f2, r2) = cell(r1.o)
    f2.o shouldBe "two"
    val (f3, r3) = cell(r2.o)
    f3.o shouldBe "3"
    f3.oDt shouldBe Quad.Xsd.long
    r3.o shouldBe rdf + "nil"
    // () is rdf:nil directly
    got.find(_.p == "http://ex.org/empty").get.o shouldBe rdf + "nil"
  }

  it should "read distributed, one task per document" in {
    val dir = java.nio.file.Files.createTempDirectory("graft-ttl")
    java.nio.file.Files.writeString(dir.resolve("a.ttl"),
      "@prefix ex: <http://a.org/> .\nex:x ex:p ex:y .\n")
    java.nio.file.Files.writeString(dir.resolve("b.ttl"),
      "@prefix ex: <http://b.org/> .\nex:x ex:p \"lit\" .\n")
    val got = Turtle.read(spark, dir.toString + "/*.ttl").collect().toSet
    got.map(_.s) shouldBe Set("http://a.org/x", "http://b.org/x")
    // per-document prefix tables do not leak across files
    got.find(_.oKind == Quad.LITERAL).get.o shouldBe "lit"
  }
}
