package graft.sources

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.rdf.Quad

/** Grammar fuzzing of the Turtle PARSER on authored documents — the
  * forms real tools emit that the writer never produces (so the
  * serialize→parse round-trip properties cannot reach them): blank-node
  * property lists, collections, all four quote flavors, bare
  * numeric/boolean literals, `a`, `;`/`,` groupings, comments.
  *
  * A random term tree is rendered with random syntax choices and
  * parsed; the parse must equal the tree's expected quads up to blank
  * node renaming. Both sides are canonicalized by replacing each blank
  * node with the signature of its outgoing subtree (sound because
  * generated blank nodes form trees — each has exactly one incoming
  * edge, no cycles).
  */
class TurtleAuthoredFuzzSpec extends AnyFlatSpec with Matchers {

  private val rnd = new scala.util.Random(sys.env.getOrElse("GRAFT_FUZZ_SEED", "11").toLong)
  private val Ex = "http://ex.org/"
  private val Rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  private val RdfType = Rdf + "type"
  // the parser normalizes the full type IRI to the engine's compact
  // store form in predicate position — the model mirrors that
  private def storeP(p: String): String = if (p == RdfType) "rdf:type" else p

  private var n = 0
  private def uniq(): Int = { n += 1; n }

  // ---- term tree ----
  private sealed trait Node
  private case class NIri(v: String) extends Node
  private case class NLit(text: String, dt: Option[String], lang: Option[String]) extends Node
  private case class NNum(token: String, dt: String) extends Node
  private case class NList(items: Seq[Node]) extends Node
  private case class NProps(props: Seq[(String, Node)]) extends Node

  private def randIri(): NIri = NIri(Ex + "t" + uniq())
  private def randPred(): String =
    if (rnd.nextInt(8) == 0) RdfType else Ex + "p" + rnd.nextInt(5)

  private val nasty = Vector("plain", "with \"quotes\"", "sing'le", "back\\slash",
    "tab\there", "new\nline", "C:\\new", "mixed \"'\\ end", "é中\u00e9")
  private def randLit(): NLit = {
    val text = nasty(rnd.nextInt(nasty.size)) + "_" + uniq()
    rnd.nextInt(4) match {
      case 0 => NLit(text, None, Some(Vector("en", "fr", "en-US")(rnd.nextInt(3))))
      case 1 => NLit(text, Some("http://www.w3.org/2001/XMLSchema#token"), None)
      case _ => NLit(text, None, None)
    }
  }
  private def randNum(): NNum = rnd.nextInt(4) match {
    case 0 => NNum((rnd.nextInt(2000) - 1000).toString, Quad.Xsd.long)
    case 1 => NNum(s"${rnd.nextInt(100)}.${rnd.nextInt(100)}", Quad.Xsd.decimal)
    case 2 => NNum(s"${rnd.nextInt(10)}.${rnd.nextInt(10)}e${rnd.nextInt(6)}", Quad.Xsd.double)
    case _ => NNum(if (rnd.nextBoolean()) "true" else "false", Quad.Xsd.boolean)
  }

  private def randNode(depth: Int): Node =
    if (depth == 0) rnd.nextInt(3) match {
      case 0 => randIri()
      case 1 => randLit()
      case _ => randNum()
    }
    else rnd.nextInt(6) match {
      case 0 => randIri()
      case 1 => randLit()
      case 2 => randNum()
      case 3 => NList(Seq.fill(rnd.nextInt(3))(randNode(depth - 1)))
      case _ => NProps(Seq.fill(1 + rnd.nextInt(3))((randPred(), randNode(depth - 1))))
    }

  // ---- expected quads (generator-side blank labels) ----
  private var bn = 0
  private def freshB(): String = { bn += 1; "_:gen" + bn }

  private def termOf(node: Node, out: scala.collection.mutable.ListBuffer[Quad])
      : (String, Byte, String, String) = node match {
    case NIri(v) => (v, Quad.IRI, null, null)
    case NLit(t, dt, lang) => (t, Quad.LITERAL, dt.orNull, lang.orNull)
    case NNum(tok, dt) => (tok, Quad.LITERAL, dt, null)
    case NList(items) =>
      if (items.isEmpty) (Rdf + "nil", Quad.IRI, null, null)
      else {
        val cells = items.map(_ => freshB())
        items.zip(cells).zipWithIndex.foreach { case ((item, cell), idx) =>
          val (o, k, dt, lang) = termOf(item, out)
          out += Quad(cell, Rdf + "first", o, k, dt, lang, "g")
          val (rest, rk) = if (idx + 1 < cells.size) (cells(idx + 1), Quad.BNODE)
            else (Rdf + "nil", Quad.IRI)
          out += Quad(cell, Rdf + "rest", rest, rk, null, null, "g")
        }
        (cells.head, Quad.BNODE, null, null)
      }
    case NProps(props) =>
      val b = freshB()
      props.foreach { case (p, v) =>
        val (o, k, dt, lang) = termOf(v, out)
        out += Quad(b, storeP(p), o, k, dt, lang, "g")
      }
      (b, Quad.BNODE, null, null)
  }

  // ---- rendering with random syntax choices ----
  private def renderIri(v: String): String =
    if (v == RdfType && rnd.nextBoolean()) "a"
    else if (v.startsWith(Ex) && rnd.nextBoolean()) "ex:" + v.substring(Ex.length)
    else if (v.startsWith(Rdf) && rnd.nextBoolean()) "rdf:" + v.substring(Rdf.length)
    else s"<$v>"

  private def renderLit(t: String, dt: Option[String], lang: Option[String]): String = {
    val flavor = rnd.nextInt(4)
    val body = flavor match {
      case 0 => // short double
        "\"" + t.replace("\\", "\\\\").replace("\"", "\\\"")
          .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t") + "\""
      case 1 => // short single: raw double quotes are legal
        "'" + t.replace("\\", "\\\\").replace("'", "\\'")
          .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t") + "'"
      case 2 => // long double: escape backslash and every quote (run-safe)
        "\"\"\"" + t.replace("\\", "\\\\").replace("\"", "\\\"") + "\"\"\""
      case _ => // long single: raw newlines/doubles legal, escape singles
        "'''" + t.replace("\\", "\\\\").replace("'", "\\'") + "'''"
    }
    body + lang.map("@" + _).getOrElse("") +
      dt.map(d => "^^" + renderIri(d)).getOrElse("")
  }

  private def ws(): String =
    Vector(" ", "  ", "\n  ", " # c\n  ")(rnd.nextInt(4))

  private def renderNode(node: Node): String = node match {
    case NIri(v) => renderIri(v)
    case NLit(t, dt, lang) => renderLit(t, dt, lang)
    case NNum(tok, _) => tok
    case NList(items) => items.map(renderNode).mkString("(" + ws(), ws(), ws() + ")")
    case NProps(props) =>
      props.map { case (p, v) => s"${renderIri(p)} ${renderNode(v)}" }
        .mkString("[" + ws(), " ;" + ws(), ws() + "]")
  }

  // canonicalization up to blank-node renaming: RdfCanon.canon
  private def canon(quads: Seq[Quad]) = RdfCanon.canon(quads)

  "Turtle.parse" should "parse random authored documents to the expected graph" in {
    for (_ <- 1 to 200) {
      val expected = scala.collection.mutable.ListBuffer[Quad]()
      val stmts = (1 to (1 + rnd.nextInt(4))).map { _ =>
        val subjProps = rnd.nextInt(4) == 0
        if (subjProps) {
          // [ p o ; … ] as a subject, optionally with outer predicates
          val inner = NProps(Seq.fill(1 + rnd.nextInt(2))((randPred(), randNode(1))))
          val (s, _, _, _) = termOf(inner, expected)
          val outer = Seq.fill(rnd.nextInt(2))((randPred(), randNode(1)))
          outer.foreach { case (p, v) =>
            val (o, k, dt, lang) = termOf(v, expected)
            expected += Quad(s, storeP(p), o, k, dt, lang, "g")
          }
          renderNode(inner) +
            (if (outer.isEmpty) "" else " " + outer.map { case (p, v) =>
              s"${renderIri(p)} ${renderNode(v)}" }.mkString(" ; ")) + " ."
        } else {
          val s = randIri()
          val props = Seq.fill(1 + rnd.nextInt(3))((randPred(), randNode(2)))
          props.foreach { case (p, v) =>
            val (o, k, dt, lang) = termOf(v, expected)
            expected += Quad(s.v, storeP(p), o, k, dt, lang, "g")
          }
          s"${renderIri(s.v)} " + props.map { case (p, v) =>
            s"${renderIri(p)} ${renderNode(v)}" }.mkString(" ;" + ws()) + " ."
        }
      }
      val doc = "@prefix ex: <" + Ex + "> .\n@prefix rdf: <" + Rdf + "> .\n" +
        stmts.mkString("\n")
      withClue(s"doc:\n$doc\n") {
        canon(Turtle.parse(doc, "g")) shouldBe canon(expected.toSeq)
      }
    }
  }
}
