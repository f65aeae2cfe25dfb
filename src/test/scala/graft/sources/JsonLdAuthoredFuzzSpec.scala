package graft.sources

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.rdf.Quad

/** Grammar fuzzing of the JSON-LD PARSER on authored compact documents —
  * the shapes tools and humans write that the expanded-flat writer never
  * emits (so the round-trip property cannot reach them): `@context`
  * prefix maps with compact IRIs, nested id-less node objects, value
  * objects with `@language`/`@type`, bare JSON scalars, arrays, `@list`,
  * and named-graph nodes. Random term trees are rendered with random
  * syntax choices and parsed; the result must equal the tree's expected
  * quads up to blank-node renaming ([[RdfCanon]]). */
class JsonLdAuthoredFuzzSpec extends AnyFlatSpec with Matchers {

  private val rnd = new scala.util.Random(sys.env.getOrElse("GRAFT_FUZZ_SEED", "23").toLong)
  private val Ex = "http://ex.org/"
  private val Rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

  private var n = 0
  private def uniq(): Int = { n += 1; n }

  private sealed trait Node
  private case class NIriRef(v: String) extends Node
  private case class NStr(text: String, dt: Option[String], lang: Option[String]) extends Node
  private case class NInt(v: Long) extends Node
  private case class NDbl(v: Double) extends Node
  private case class NBool(v: Boolean) extends Node
  private case class NList(items: Seq[Node]) extends Node
  private case class NNode(id: Option[String], props: Seq[(String, Seq[Node])]) extends Node

  // JSON object keys must be unique per node — Jackson keeps the last
  // duplicate, so predicates are sampled WITHOUT replacement
  private val predPool = Vector.tabulate(5)(i => Ex + "p" + i)
  private def randPreds(k: Int): Seq[String] = rnd.shuffle(predPool).take(k)
  private val texts = Vector("plain", "with \"quotes\"", "back\\slash",
    "tab\there", "new\nline", "é中")
  private def randStr(): NStr = {
    val t = texts(rnd.nextInt(texts.size)) + "_" + uniq()
    rnd.nextInt(4) match {
      case 0 => NStr(t, None, Some(Vector("en", "fr", "en-US")(rnd.nextInt(3))))
      case 1 => NStr(t, Some("http://www.w3.org/2001/XMLSchema#token"), None)
      case _ => NStr(t, None, None)
    }
  }

  private def randLeaf(): Node = rnd.nextInt(5) match {
    case 0 => NIriRef(Ex + "t" + uniq())
    case 1 => NInt(rnd.nextInt(4000) - 2000)
    case 2 => NDbl((rnd.nextInt(1000) + 1) / 8.0) // exact in binary => stable asText
    case 3 => NBool(rnd.nextBoolean())
    case _ => randStr()
  }

  private def randNode(depth: Int): Node =
    if (depth == 0) randLeaf()
    else rnd.nextInt(6) match {
      case 0 => NList(Seq.fill(rnd.nextInt(3))(randNode(depth - 1)))
      case 1 | 2 => NNode(
        if (rnd.nextBoolean()) Some(Ex + "n" + uniq()) else None,
        randPreds(1 + rnd.nextInt(2)).map(p => (p, Seq(randNode(depth - 1)))))
      case _ => randLeaf()
    }

  // ---- expected quads ----
  private var bn = 0
  private def freshB(): String = { bn += 1; "_:gen" + bn }

  private def termOf(node: Node, g: String,
      out: scala.collection.mutable.ListBuffer[Quad]): (String, Byte, String, String) =
    node match {
      case NIriRef(v) => (v, Quad.IRI, null, null)
      case NStr(t, dt, lang) => (t, Quad.LITERAL, dt.orNull, lang.orNull)
      case NInt(v) => (v.toString, Quad.LITERAL, Quad.Xsd.long, null)
      case NDbl(v) => (v.toString, Quad.LITERAL, Quad.Xsd.double, null)
      case NBool(v) => (v.toString, Quad.LITERAL, Quad.Xsd.boolean, null)
      case NList(items) =>
        if (items.isEmpty) (Rdf + "nil", Quad.IRI, null, null)
        else {
          val cells = items.map(_ => freshB())
          items.zip(cells).zipWithIndex.foreach { case ((item, cell), idx) =>
            val (o, k, dt, lang) = termOf(item, g, out)
            out += Quad(cell, Rdf + "first", o, k, dt, lang, g)
            val (rest, rk) = if (idx + 1 < cells.size) (cells(idx + 1), Quad.BNODE)
              else (Rdf + "nil", Quad.IRI)
            out += Quad(cell, Rdf + "rest", rest, rk, null, null, g)
          }
          (cells.head, Quad.BNODE, null, null)
        }
      case NNode(id, props) =>
        val s = id.getOrElse(freshB())
        val kind = if (id.isDefined) Quad.IRI else Quad.BNODE
        props.foreach { case (p, vs) =>
          vs.foreach { v =>
            val (o, k, dt, lang) = termOf(v, g, out)
            out += Quad(s, p, o, k, dt, lang, g)
          }
        }
        (s, kind, null, null)
    }

  // ---- JSON rendering with random syntax choices ----
  private def jstr(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  // compact an IRI against the generated context half the time
  private def ciri(v: String): String =
    if (v.startsWith(Ex) && rnd.nextBoolean()) "ex:" + v.substring(Ex.length)
    else v

  private def renderValue(node: Node): String = node match {
    case NIriRef(v) => s"""{"@id": ${jstr(ciri(v))}}"""
    case NStr(t, None, None) =>
      if (rnd.nextBoolean()) jstr(t) else s"""{"@value": ${jstr(t)}}"""
    case NStr(t, Some(dt), None) =>
      s"""{"@value": ${jstr(t)}, "@type": ${jstr(ciri(dt))}}"""
    case NStr(t, _, Some(lang)) =>
      s"""{"@value": ${jstr(t)}, "@language": ${jstr(lang)}}"""
    case NInt(v) => if (rnd.nextBoolean()) v.toString
      else s"""{"@value": $v}"""
    case NDbl(v) => v.toString
    case NBool(v) => v.toString
    case NList(items) => s"""{"@list": [${items.map(renderValue).mkString(", ")}]}"""
    case NNode(id, props) =>
      val fields = id.map(i => s""""@id": ${jstr(ciri(i))}""").toSeq ++
        props.map { case (p, vs) =>
          val body = if (vs.size == 1 && rnd.nextBoolean()) renderValue(vs.head)
            else s"[${vs.map(renderValue).mkString(", ")}]"
          s"${jstr(ciri(p))}: $body"
        }
      s"{${fields.mkString(", ")}}"
  }

  "JsonLd.parse" should "parse random authored compact documents to the expected graph" in {
    for (_ <- 1 to 200) {
      val expected = scala.collection.mutable.ListBuffer[Quad]()
      val dg = "dg"
      val topNodes = Seq.fill(1 + rnd.nextInt(3))(
        NNode(Some(Ex + "s" + uniq()),
          randPreds(1 + rnd.nextInt(3)).map(p =>
            (p, Seq.fill(1 + rnd.nextInt(2))(randNode(2))))))
      val graphed = rnd.nextInt(3) == 0
      val gname = Ex + "g" + uniq()
      topNodes.foreach(nd => termOf(nd, if (graphed) gname else dg, expected))
      val ctx = s""""@context": {"ex": ${jstr(Ex)}}"""
      val body = topNodes.map(renderValue)
      val doc =
        if (graphed)
          s"""{$ctx, "@id": ${jstr(gname)}, "@graph": [${body.mkString(", ")}]}"""
        else if (body.size == 1) s"""{$ctx, ${body.head.drop(1)}"""
        else s"""{$ctx, "@graph": [${body.mkString(", ")}]}"""
      withClue(s"doc:\n$doc\n") {
        RdfCanon.canon(JsonLd.parse(doc, dg)) shouldBe RdfCanon.canon(expected.toSeq)
      }
    }
  }
}
