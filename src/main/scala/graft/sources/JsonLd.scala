package graft.sources

import graft.rdf.Quad

/** Flat JSON-LD serialization of graph results — the web-facing member of
  * the RDF family (the reference negotiates RDF4J's JSON-LD writer the
  * same way it negotiates Turtle,
  * `core/src/main/com/thymeflow/api/SparqlService.scala:170-201`).
  *
  * Output is the expanded-flat form: one `@graph` array, one node object
  * per subject, predicate keys as full IRIs, objects as `{"@id": …}` for
  * IRIs/bnodes and `{"@value": …[, "@language"|"@type": …]}` for
  * literals; `rdf:type` compacts to `@type`. No `@context` is emitted —
  * expanded form is valid standalone JSON-LD and round-trips through any
  * conformant processor without a context fetch.
  *
  * Streaming contract mirrors [[Turtle.writeStream]]: the caller feeds
  * rows GROUPED BY SUBJECT (sorted suffices); memory is one (subject,
  * predicate) run, never the document.
  */
object JsonLd {

  private val RdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

  private def esc(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  private def obj(o: String, kind: Byte, dt: String, lang: String): String =
    kind match {
      case Quad.IRI | Quad.BNODE => s"""{"@id":"${esc(o)}"}"""
      case _ =>
        val v = s""""@value":"${esc(o)}""""
        if (lang != null && lang.nonEmpty) s"""{$v,"@language":"${esc(lang)}"}"""
        else if (dt != null && dt.nonEmpty && dt != Quad.Xsd.string)
          s"""{$v,"@type":"${esc(dt)}"}"""
        else s"{$v}"
    }

  /** Emit `{"@graph":[…]}`, one node object per subject. Rows must arrive
    * grouped by subject, and within a subject grouped by predicate. */
  def writeStream(rows: Iterator[(String, String, String, Byte, String, String)],
      sink: String => Unit): Unit = {
    var curS: String = null
    var curP: String = null
    sink("""{"@graph":[""")
    rows.foreach { case (s, p, o, oKind, oDt, oLang) =>
      if (s != curS) {
        if (curS != null) sink("]}")
        sink((if (curS != null) "," else "") + s"""{"@id":"${esc(s)}"""")
        curS = s; curP = null
      }
      if (p != curP) {
        if (curP != null) sink("]")
        if (p == RdfType) sink(""","@type":[""")
        else sink(s""","${esc(p)}":[""")
        curP = p
      } else sink(",")
      // @type values are bare IRI strings per JSON-LD; others are objects
      if (p == RdfType) sink(s""""${esc(o)}"""")
      else sink(obj(o, oKind, oDt, oLang))
    }
    if (curS != null) sink("]}")
    sink("]}")
  }

  /** Whole-document serialization (tests / driver-side convenience). */
  def serialize(quads: Seq[Quad]): String = {
    val sb = new StringBuilder
    val sorted = quads.sortBy(q => (q.s, q.p, q.o))
    writeStream(
      sorted.iterator.map(q => (q.s, q.p, q.o, q.oKind, q.oDt, q.oLang)),
      s => sb.append(s))
    sb.toString
  }
}
