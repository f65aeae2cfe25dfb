package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.rdf.Quad

/** RDF/XML serialization — the RDF family's legacy member, still the
  * default of older tooling (Protégé, older Jena). The reference
  * content-negotiates every RDF4J writer for CONSTRUCT/DESCRIBE results,
  * RDF/XML included (`core/src/main/com/thymeflow/api/SparqlService
  * .scala:170-201`); this provides the leg natively: a streaming,
  * subject-grouped writer and a DOM parser (scala-xml, on the Spark
  * classpath) for tool-authored documents.
  *
  * Like Turtle, RDF/XML is NOT line-splittable — the parallelism unit of
  * [[read]] is the FILE. Property IRIs split into (namespace, NCName
  * local) at the longest valid local-name suffix, with the namespace
  * declared per property element — verbose but correct for any IRI whose
  * local part is a legal NCName. Graph provenance is flattened (RDF/XML
  * has no graph term — N-Quads/TriG keep it). */
object RdfXml {

  private val RdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

  // CR must be a character reference: XML parsers normalize literal
  // CR/CRLF in content to LF (XML 1.0 §2.11), which would corrupt
  // round-tripped literals. Other C0 controls are REJECTED loudly: XML
  // 1.0 has no representation for them at all (§2.2 Char excludes them
  // even as character references), so emitting them would produce a
  // document every conformant parser refuses — fail at write time, at
  // the offending value, not at some later read.
  private def escText(s: String): String = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c < 0x20 && c != '\t' && c != '\n' && c != '\r')
        throw new IllegalArgumentException(
          f"RDF/XML cannot represent control character U+${c.toInt}%04X " +
            "(XML 1.0 excludes C0 controls other than TAB/LF/CR); " +
            "serialize this graph as Turtle/TriG/N-Quads/JSON-LD instead")
      i += 1
    }
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\r", "&#13;")
  }

  // attribute-value normalization additionally folds TAB/LF to spaces
  private def escAttr(s: String): String =
    escText(s).replace("\"", "&quot;").replace("\n", "&#10;").replace("\t", "&#9;")

  private def ncNameStart(c: Char): Boolean = c.isLetter || c == '_'
  private def ncNameChar(c: Char): Boolean =
    c.isLetterOrDigit || c == '_' || c == '-' || c == '.'

  /** Split an IRI at the longest NCName suffix: ("http://s.org/", "name").
    * An IRI with no legal local suffix cannot be an RDF/XML property —
    * serialize fails loudly rather than emitting an unparseable QName. */
  private[sources] def splitQName(iri: String): (String, String) = {
    var i = iri.length
    while (i > 0 && ncNameChar(iri.charAt(i - 1))) i -= 1
    // walk forward past any leading non-start chars (digits, -, .)
    while (i < iri.length && !ncNameStart(iri.charAt(i))) i += 1
    require(i < iri.length, s"IRI has no NCName local part for RDF/XML: $iri")
    (iri.substring(0, i), iri.substring(i))
  }

  /** Streaming writer: one `rdf:Description` per subject run. The input
    * iterator MUST be grouped by subject (sorted suffices) — same
    * contract as [[Turtle.writeStream]]. */
  def writeStream(rows: Iterator[(String, String, String, Byte, String, String)],
      sink: String => Unit): Unit = {
    sink("<?xml version=\"1.0\" encoding=\"utf-8\"?>\n")
    sink(s"""<rdf:RDF xmlns:rdf="$RdfNs">\n""")
    var curS: String = null
    rows.foreach { case (s, p, o, oKind, oDt, oLang) =>
      if (s != curS) {
        if (curS != null) sink("  </rdf:Description>\n")
        val about =
          if (s.startsWith("_:")) s"""rdf:nodeID="${escAttr(s.stripPrefix("_:"))}""""
          else s"""rdf:about="${escAttr(s)}""""
        sink(s"  <rdf:Description $about>\n")
        curS = s
      }
      // expand the engine's compact "rdf:type" to the full IRI so the
      // emitted XML is standard (a colon'd local name is invalid XML)
      val (ns, local) = splitQName(NTriples.expandPred(p))
      // a prefix bound to "" is illegal XML — namespace-less predicates
      // (test fixtures, urn fragments) emit as unprefixed local names
      val (open, close) =
        if (ns.isEmpty) (local, local)
        else (s"""p:$local xmlns:p="${escAttr(ns)}"""", s"p:$local")
      oKind match {
        case Quad.IRI =>
          sink(s"""    <$open rdf:resource="${escAttr(o)}"/>\n""")
        case Quad.BNODE =>
          sink(s"""    <$open rdf:nodeID="${escAttr(o.stripPrefix("_:"))}"/>\n""")
        case _ =>
          val attrs =
            if (oLang != null && oLang.nonEmpty) s""" xml:lang="${escAttr(oLang)}""""
            else if (oDt != null && oDt.nonEmpty && oDt != Quad.Xsd.string)
              s""" rdf:datatype="${escAttr(oDt)}""""
            else ""
          sink(s"""    <$open$attrs>${escText(o)}</$close>\n""")
      }
    }
    if (curS != null) sink("  </rdf:Description>\n")
    sink("</rdf:RDF>\n")
  }

  /** Whole-document serialization (driver-side convenience / tests). */
  def serialize(quads: Seq[Quad]): String = {
    val sb = new StringBuilder
    val sorted = quads.sortBy(q => (q.s, q.p, q.o))
    writeStream(sorted.iterator.map(q => (q.s, q.p, q.o, q.oKind, q.oDt, q.oLang)),
      s => sb.append(s))
    sb.toString
  }

  /** Parse one RDF/XML document into quads (graph = `defaultGraph`).
    * Supports the subset the writer emits plus the common authored
    * forms: `rdf:Description` with `rdf:about`/`rdf:nodeID`, typed node
    * elements (`<ex:Person rdf:about=…>` → an rdf:type quad), property
    * elements with `rdf:resource`/`rdf:nodeID`/`rdf:datatype`/
    * `xml:lang`/text content, `rdf:ID` fragments against `base`,
    * property attributes (§2.5), `rdf:parseType="Resource"` (§2.11)
    * and `rdf:parseType="Collection"` (§2.18); other parseTypes fail
    * loudly. */
  def parse(doc: String, defaultGraph: String = "graft:default",
      base: String = ""): Seq[Quad] = {
    val root = scala.xml.XML.loadString(doc)
    require(root.label == "RDF" && root.namespace == RdfNs,
      s"not an rdf:RDF document: root is {${root.namespace}}${root.label}")
    val out = scala.collection.mutable.ListBuffer[Quad]()

    def rdfAttr(n: scala.xml.Node, name: String): Option[String] =
      n.attribute(RdfNs, name).map(_.text)

    // counter-based fresh labels (identityHashCode is not collision-free),
    // skipping any label the document declares via rdf:nodeID
    val usedIds = (root \\ "_").flatMap(n => rdfAttr(n, "nodeID")).toSet
    var genN = 0
    def freshB(): String = {
      genN += 1
      var l = "genid" + genN
      while (usedIds(l)) { genN += 1; l = "genid" + genN }
      "_:" + l
    }

    def subjectOf(n: scala.xml.Node): String =
      rdfAttr(n, "about").getOrElse(
        rdfAttr(n, "nodeID").map("_:" + _).getOrElse(
          rdfAttr(n, "ID").map(id => base + "#" + id).getOrElse(freshB())))

    def nodeElement(n: scala.xml.Node): String = {
      val s = subjectOf(n)
      // typed node element: the element name IS an rdf:type
      if (!(n.namespace == RdfNs && n.label == "Description"))
        // compact store form (see NTriples.normPred): type quads must be
        // visible to the engine's "rdf:type"-keyed queries
        out += Quad(s, "rdf:type", Option(n.namespace).getOrElse("") + n.label,
          Quad.IRI, null, null, defaultGraph)
      // property attributes (§2.5): prefixed non-rdf/xml attributes on a
      // node element are string-literal properties; rdf:type as an
      // attribute is the one rdf:* property attribute (object is an IRI)
      n.attributes.foreach {
        case a: scala.xml.PrefixedAttribute =>
          val ns = n.getNamespace(a.pre)
          if (ns == RdfNs && a.key == "type")
            out += Quad(s, "rdf:type", a.value.text, Quad.IRI, null, null,
              defaultGraph)
          else if (ns != RdfNs && ns != "http://www.w3.org/XML/1998/namespace")
            out += Quad(s, ns + a.key, a.value.text, Quad.LITERAL, null, null,
              defaultGraph)
        case _ => ()
      }
      propertyElements(s, n)
      s
    }

    def propertyElements(s: String, parent: scala.xml.Node): Unit =
      parent.child.collect { case e: scala.xml.Elem => e }.foreach { pe =>
        val p = graft.sources.NTriples.normPred(
          Option(pe.namespace).getOrElse("") + pe.label)
        (rdfAttr(pe, "resource"), rdfAttr(pe, "parseType")) match {
          case (Some(r), _) => out += Quad(s, p, r, Quad.IRI, null, null, defaultGraph)
          case (None, Some("Resource")) =>
            // §2.11: the object is a fresh blank node whose property
            // elements are this element's children
            val b = freshB()
            out += Quad(s, p, b, Quad.BNODE, null, null, defaultGraph)
            propertyElements(b, pe)
          case (None, Some("Collection")) =>
            // §2.18: child node elements form an rdf:first/rdf:rest chain
            val items = pe.child.collect { case e: scala.xml.Elem => e }
            if (items.isEmpty)
              out += Quad(s, p, RdfNs + "nil", Quad.IRI, null, null, defaultGraph)
            else {
              val cells = items.map(_ => freshB())
              out += Quad(s, p, cells.head, Quad.BNODE, null, null, defaultGraph)
              items.zip(cells).zipWithIndex.foreach { case ((item, cell), idx) =>
                val it = nodeElement(item)
                out += Quad(cell, RdfNs + "first", it,
                  if (it.startsWith("_:")) Quad.BNODE else Quad.IRI,
                  null, null, defaultGraph)
                val (rest, rk) = if (idx + 1 < cells.size) (cells(idx + 1), Quad.BNODE)
                  else (RdfNs + "nil", Quad.IRI)
                out += Quad(cell, RdfNs + "rest", rest, rk, null, null, defaultGraph)
              }
            }
          case (None, Some(other)) =>
            throw new IllegalArgumentException(s"rdf:parseType='$other' not supported")
          case (None, None) => rdfAttr(pe, "nodeID") match {
            case Some(b) => out += Quad(s, p, "_:" + b, Quad.BNODE, null, null, defaultGraph)
            case None =>
              val nested = pe.child.collect { case e: scala.xml.Elem => e }
              if (nested.nonEmpty) {
                // nested node element: object is its subject, recurse
                // (subjectOf mints fresh labels, so evaluate exactly once
                // via nodeElement's return value)
                nested.foreach { inner =>
                  val o = nodeElement(inner)
                  out += Quad(s, p, o,
                    if (o.startsWith("_:")) Quad.BNODE else Quad.IRI,
                    null, null, defaultGraph)
                }
              } else {
                val lang = pe.attribute("http://www.w3.org/XML/1998/namespace", "lang")
                  .map(_.text).orNull
                // canonical store form: explicit xsd:string normalizes away
                val dt = rdfAttr(pe, "datatype")
                  .filter(_ != graft.rdf.Quad.Xsd.string).orNull
                out += Quad(s, p, pe.text, Quad.LITERAL, dt, lang, defaultGraph)
              }
          }
        }
      }

    root.child.collect { case e: scala.xml.Elem => e }.foreach(nodeElement)
    out.toSeq
  }

  /** Distributed read: one task per FILE (wholetext — not splittable),
    * same shape as [[Turtle.read]]. */
  def read(spark: SparkSession, path: String,
      defaultGraph: String = "graft:default"): Dataset[Quad] = {
    import spark.implicits._
    spark.read.option("wholetext", "true").textFile(path)
      .flatMap(doc => parse(doc, defaultGraph))
  }
}
