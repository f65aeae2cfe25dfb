package graft.sources

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.rdf.Quad

/** Generative round-trip invariant for the Turtle writer/parser pair:
  * any quad set built from valid RDF terms must survive
  * serialize → parse exactly (set equality, including literal escapes,
  * language tags and datatypes). This is the guarantee the endpoint's
  * Turtle route rests on. */
object TurtleProps extends Properties("Turtle") {

  private val localName: Gen[String] =
    for {
      h <- Gen.alphaChar
      t <- Gen.listOfN(6, Gen.oneOf(Gen.alphaNumChar, Gen.const('_'), Gen.const('-')))
    } yield (h :: t).mkString

  private val iri: Gen[String] = for {
    ns <- Gen.oneOf("http://ex.org/", "http://schema.org/", "urn:x:")
    l <- localName
  } yield ns + l

  // literal values exercise every escape class the writer handles —
  // n/r/t LETTERS are in the alphabet so backslash-then-letter
  // adjacencies (e.g. the value C:\new) are generated, the case the
  // old sequential-replace unescape corrupted
  private val literalValue: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(20)),
    Gen.listOfN(8, Gen.oneOf('a', 'n', 'r', 't', ' ', '"', '\\', '\n', '\t', 'é', '中'))
      .map(_.mkString),
    Gen.const("C:\\new\\train\\tab"))

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
      val doc = Turtle.serialize(quads)
      Turtle.parse(doc, "g").toSet == quads.toSet
    }

  property("serialized form declares every prefix it uses") =
    forAll(Gen.nonEmptyListOf(quad).map(_.take(10))) { quads =>
      val doc = Turtle.serialize(quads)
      // every prefixed name's prefix must resolve: reparse can't throw
      Turtle.parse(doc, "g").nonEmpty || quads.isEmpty
    }

  private val graphed: Gen[Quad] = for {
    q <- quad
    g <- iri
  } yield q.copy(g = g)

  property("TriG serialize -> parse is the identity on graphed quad sets") =
    forAll(Gen.listOf(graphed).map(_.take(30))) { quads =>
      Turtle.parse(Turtle.serializeTrig(quads)).toSet == quads.toSet
    }

  property("N-Quads line round-trip agrees per quad") = forAll(quad) { q =>
    // same generator, the line-oriented member of the family: one
    // serialized line parses back to the identical quad
    val line = NTriples.serializeQuadLine(q)
    NTriples.parseLine(line, "fallback").contains(q)
  }
}
