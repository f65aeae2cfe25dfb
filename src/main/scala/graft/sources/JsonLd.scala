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
  private val RdfFirst = "http://www.w3.org/1999/02/22-rdf-syntax-ns#first"
  private val RdfRest = "http://www.w3.org/1999/02/22-rdf-syntax-ns#rest"
  private val RdfNil = "http://www.w3.org/1999/02/22-rdf-syntax-ns#nil"

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
        if (p == RdfType || p == "rdf:type") sink(""","@type":[""")
        else sink(s""","${esc(p)}":[""")
        curP = p
      } else sink(",")
      // @type values are bare IRI strings per JSON-LD; others are objects
      if (p == RdfType || p == "rdf:type") sink(s""""${esc(o)}"""")
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

  /** Parse a JSON-LD document into quads — the inverse leg that lets
    * LOAD and the file reader accept `.jsonld` (the reference parses it
    * via RDF4J Rio like every other format). Covers the expanded/flat
    * subset [[writeStream]] emits plus the common authored forms:
    * top-level `@graph` array / bare array / single node object;
    * `@type` as string or array; predicate values as arrays, value
    * objects (`@value` + `@language`/`@type`), bare JSON scalars
    * (string/number/boolean → plain/xsd-typed literals, same canonical
    * datatypes as the Turtle reader), nested node objects (edge +
    * recurse, fresh `_:jb…` label when `@id` is absent); named-graph
    * nodes (`@id` + inner `@graph`); `@list` values lower to
    * rdf:first/rdf:rest chains (the same shape as Turtle `( … )`
    * collections, `[]` = rdf:nil); a simple `@context` of string
    * prefix/term mappings (compact IRIs expand — full context
    * processing and `@container`/`@reverse` are out of scope and fail
    * loudly rather than mis-parse). */
  def parse(doc: String, defaultGraph: String = "graft:default"): Seq[Quad] = {
    import com.fasterxml.jackson.databind.JsonNode
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(doc)
    val out = scala.collection.mutable.ListBuffer[Quad]()
    var bnodeN = 0
    // fresh labels must not collide with explicit "@id":"_:jbN" labels
    // in the document (two distinct nodes would silently merge). The
    // used set is collected in ONE document scan — the per-label
    // doc.contains rescan was quadratic on list-heavy documents
    // (the Turtle tokenizer takes the same one-pass approach)
    val usedLabels = "\"(_:jb[0-9]+)\"".r
      .findAllMatchIn(doc).map(_.group(1)).toSet
    def freshB(): String = {
      bnodeN += 1
      var l = "_:jb" + bnodeN
      while (usedLabels(l)) { bnodeN += 1; l = "_:jb" + bnodeN }
      l
    }

    def asSeq(n: JsonNode): Seq[JsonNode] =
      if (n.isArray) (0 until n.size).map(n.get) else Seq(n)

    def ctxOf(n: JsonNode): Map[String, String] = {
      val c = n.get("@context")
      if (c == null || !c.isObject) Map.empty
      else {
        val it = c.properties().iterator()
        val b = Map.newBuilder[String, String]
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue.isTextual) b += e.getKey -> e.getValue.asText
        }
        b.result()
      }
    }

    def expand(term: String, ctx: Map[String, String]): String =
      ctx.get(term) match {
        case Some(iri) => iri
        case None =>
          val i = term.indexOf(':')
          if (i > 0 && ctx.contains(term.substring(0, i)))
            ctx(term.substring(0, i)) + term.substring(i + 1)
          else term
      }

    def kindOf(id: String): Byte = if (id.startsWith("_:")) Quad.BNODE else Quad.IRI

    // one value in object position → its term; quads for nested
    // structure (node objects, @list chains) emit as a side effect
    def objectOf(v: JsonNode, g: String, ctx: Map[String, String])
        : (String, Byte, String, String) =
      if (v.isObject && v.has("@list")) {
        // ordered collection → rdf:first/rdf:rest chain, like the Turtle
        // `( … )` lowering; [] is rdf:nil
        val items = asSeq(v.get("@list")).map(i => objectOf(i, g, ctx))
        if (items.isEmpty) (RdfNil, Quad.IRI, null, null)
        else {
          val cells = items.map(_ => freshB())
          items.zip(cells).zipWithIndex.foreach {
            case (((o, k, dt, lang), cell), idx) =>
              out += Quad(cell, RdfFirst, o, k, dt, lang, g)
              val (rest, rk) =
                if (idx + 1 < cells.size) (cells(idx + 1), Quad.BNODE)
                else (RdfNil, Quad.IRI)
              out += Quad(cell, RdfRest, rest, rk, null, null, g)
          }
          (cells.head, Quad.BNODE, null, null)
        }
      } else if (v.isObject && v.has("@value")) {
        val value = v.get("@value")
        require(value.isTextual || value.isBoolean || value.isNumber,
          s"@value must be a JSON scalar, got: $value")
        val (text, dt0) =
          if (value.isTextual) (value.asText, null: String)
          else if (value.isBoolean) (value.asText, Quad.Xsd.boolean)
          else if (value.isIntegralNumber) (value.asText, Quad.Xsd.long)
          else (value.asText, Quad.Xsd.double)
        val lang = Option(v.get("@language")).map(_.asText).orNull
        val dt = Option(v.get("@type")).map(t => expand(t.asText, ctx))
          .filter(_ != Quad.Xsd.string) // canonical form: no explicit xsd:string
          .getOrElse(dt0)
        (text, Quad.LITERAL, if (lang != null) null else dt, lang)
      } else if (v.isObject && v.has("@id") && v.size <= 1) {
        val o = expand(v.get("@id").asText, ctx)
        (o, kindOf(o), null, null)
      } else if (v.isObject) { // nested node object: edge + recurse
        val o = node(v, g, ctx)
        (o, kindOf(o), null, null)
      } else if (v.isTextual) (v.asText, Quad.LITERAL, null, null)
      else if (v.isBoolean) (v.asText, Quad.LITERAL, Quad.Xsd.boolean, null)
      else if (v.isIntegralNumber) (v.asText, Quad.LITERAL, Quad.Xsd.long, null)
      else if (v.isNumber) (v.asText, Quad.LITERAL, Quad.Xsd.double, null)
      else throw new IllegalArgumentException(s"unsupported JSON-LD value: $v")

    // one node object → quads; returns the node's subject term
    def node(n: JsonNode, g: String, ctx: Map[String, String]): String = {
      require(n.isObject, s"JSON-LD node must be an object, got: $n")
      val s = Option(n.get("@id")).map(v => expand(v.asText, ctx)).getOrElse(freshB())
      val fields = n.properties().iterator()
      while (fields.hasNext) {
        val e = fields.next()
        e.getKey match {
          case "@id" | "@context" => ()
          case "@graph" => // named-graph node: members land in graph s
            asSeq(e.getValue).foreach(m => node(m, s, ctx))
          case "@type" =>
            // compact store form (see NTriples.normPred): type quads
            // must be visible to the engine's "rdf:type"-keyed queries
            asSeq(e.getValue).foreach(t =>
              out += Quad(s, "rdf:type", expand(t.asText, ctx), Quad.IRI,
                null, null, g))
          case "@list" | "@container" | "@reverse" =>
            throw new IllegalArgumentException(s"JSON-LD ${e.getKey} not supported")
          case key =>
            val p = graft.sources.NTriples.normPred(expand(key, ctx))
            asSeq(e.getValue).foreach { v =>
              if (v.isNull) ()
              else {
                val (o, k, dt, lang) = objectOf(v, g, ctx)
                out += Quad(s, p, o, k, dt, lang, g)
              }
            }
        }
      }
      s
    }

    val ctx = ctxOf(root)
    val tops =
      if (root.isArray) asSeq(root)
      // a root @graph WITHOUT @id is the document wrapper (default
      // graph); WITH @id the root is itself a named graph and must go
      // through node() so members land in that graph
      else if (root.has("@graph") && !root.has("@id")) asSeq(root.get("@graph"))
      else Seq(root)
    tops.foreach { t =>
      // a top-level node whose only content is @id + @graph is a named
      // graph; node() handles both that and plain nodes
      node(t, defaultGraph, ctx)
    }
    out.toSeq
  }

  /** Distributed read: one task per FILE (JSON-LD documents are not
    * line-splittable), same shape as [[Turtle.read]]/[[RdfXml.read]]. */
  def read(spark: org.apache.spark.sql.SparkSession, path: String,
      defaultGraph: String = "graft:default")
      : org.apache.spark.sql.Dataset[Quad] = {
    import spark.implicits._
    spark.read.option("wholetext", "true").textFile(path)
      .flatMap(doc => parse(doc, defaultGraph))
  }
}
