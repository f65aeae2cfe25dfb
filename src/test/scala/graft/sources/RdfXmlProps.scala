package graft.sources

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.rdf.Quad

/** Generative round-trip invariant for the RDF/XML writer/parser pair,
  * mirroring [[TurtleProps]]: any quad set built from valid RDF terms
  * (predicates with an NCName local part — an RDF/XML precondition)
  * must survive serialize → parse exactly. RDF/XML flattens graph
  * provenance, so generation pins `g` to the parse default. The literal
  * alphabet includes `\r` deliberately: XML parsers normalize CR to LF
  * in content, so the writer must emit it as a character reference. */
object RdfXmlProps extends Properties("RdfXml") {

  private val localName: Gen[String] =
    for {
      h <- Gen.alphaChar
      t <- Gen.listOfN(6, Gen.oneOf(Gen.alphaNumChar, Gen.const('_'), Gen.const('-')))
    } yield (h :: t).mkString

  private val iri: Gen[String] = for {
    ns <- Gen.oneOf("http://ex.org/", "http://schema.org/", "urn:x:")
    l <- localName
  } yield ns + l

  // every XML-sensitive class: markup chars, quotes, backslashes (inert
  // in XML but hot in the other formats — guards against shared-helper
  // regressions), CR/LF/TAB, non-ASCII
  private val literalValue: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(20)),
    Gen.listOfN(8, Gen.oneOf('a', '<', '>', '&', '"', '\\', '\r', '\n', '\t', ' ', 'é', '中'))
      .map(_.mkString),
    Gen.const("a <b> && \"c\"\r\nd"))

  private val lang: Gen[String] = Gen.oneOf("en", "en-US", "fr", "zh")

  private val quad: Gen[Quad] = for {
    s <- Gen.oneOf(iri, localName.map("_:" + _))
    p <- iri
    kind <- Gen.oneOf(Quad.IRI, Quad.BNODE, Quad.LITERAL)
    o <- kind match {
      case Quad.IRI => iri
      case Quad.BNODE => localName.map("_:" + _)
      case _ => literalValue
    }
    dt <- if (kind == Quad.LITERAL)
      Gen.oneOf(null: String, Quad.Xsd.long, Quad.Xsd.dateTime)
    else Gen.const(null: String)
    l <- if (kind == Quad.LITERAL && dt == null)
      Gen.oneOf(Gen.const(null: String), lang)
    else Gen.const(null: String)
  } yield Quad(s, p, o, kind, dt, l, "g")

  property("serialize -> parse is the identity on quad sets") =
    forAll(Gen.listOf(quad).map(_.take(30))) { quads =>
      RdfXml.parse(RdfXml.serialize(quads), "g").toSet == quads.toSet
    }

  property("writer rejects C0 controls XML 1.0 cannot represent") =
    forAll(iri, Gen.choose(1.toChar, 8.toChar)) { (s, c) =>
      val q = Quad(s, "http://ex.org/ns#p", s"a${c}b", Quad.LITERAL, null, null, "g")
      scala.util.Try(RdfXml.serialize(Seq(q))).isFailure
    }

  property("writer fails loudly on a predicate with no NCName local") =
    forAll(iri) { s =>
      // trailing slash leaves no local-name suffix
      val bad = Quad(s, "http://ex.org/ns/", "x", Quad.LITERAL, null, null, "g")
      scala.util.Try(RdfXml.serialize(Seq(bad))).isFailure
    }
}
