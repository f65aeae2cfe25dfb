package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.rdf.Quad

/** Turtle serialization — the RDF family's human-facing member and the
  * most common default of RDF tooling. The reference content-negotiates
  * every RDF4J writer for CONSTRUCT/DESCRIBE results
  * (`core/src/main/com/thymeflow/api/SparqlService.scala:170-201`); this
  * provides the Turtle leg natively: a streaming, prefix-abbreviating,
  * subject-grouped writer and a per-document parser.
  *
  * Scale note: unlike N-Triples, Turtle is NOT line-splittable
  * (statements span lines, `@prefix` state is document-global), so —
  * like gzip — the parallelism unit is the FILE: [[read]] parses whole
  * documents on executors, one task per file. Bulk interchange at
  * cluster scale should stay on N-Quads ([[NTriples]]); Turtle is for
  * serving results and ingesting tool-authored documents.
  */
object Turtle {

  /** Default prefix table for abbreviation (writer) — resolution
    * (reader) always honors the document's own `@prefix` directives. */
  val DefaultPrefixes: Seq[(String, String)] = Seq(
    "rdf" -> "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs" -> "http://www.w3.org/2000/01/rdf-schema#",
    "xsd" -> "http://www.w3.org/2001/XMLSchema#",
    "schema" -> "http://schema.org/",
    "foaf" -> "http://xmlns.com/foaf/0.1/")

  private val LocalName = "[A-Za-z_][A-Za-z0-9_-]*".r

  private def escape(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")

  /** `<iri>` or `prefix:local` when a prefix matches and the remainder is
    * a safe PN_LOCAL (conservative subset — correctness over brevity). */
  private def iri(value: String, prefixes: Seq[(String, String)]): String =
    prefixes.collectFirst {
      case (p, ns) if value.startsWith(ns) &&
          LocalName.pattern.matcher(value.substring(ns.length)).matches() =>
        s"$p:${value.substring(ns.length)}"
    }.getOrElse(s"<$value>")

  private def term(value: String, kind: Byte, dt: String, lang: String,
      prefixes: Seq[(String, String)]): String = kind match {
    case Quad.IRI => iri(value, prefixes)
    case Quad.BNODE => if (value.startsWith("_:")) value else s"_:$value"
    case _ =>
      val base = "\"" + escape(value) + "\""
      if (lang != null && lang.nonEmpty) s"$base@$lang"
      else if (dt != null && dt.nonEmpty && dt != Quad.Xsd.string)
        s"$base^^${iri(dt, prefixes)}"
      else base
  }

  /** Streaming writer: emits `@prefix` headers, then one subject block
    * per distinct subject with `;`-chained predicates and `,`-chained
    * objects. The input iterator MUST be grouped by subject (sorted
    * suffices) — the caller orders; this function never buffers more
    * than one (subject, predicate) run. Graphs are flattened (Turtle has
    * no graph term — use TriG/N-Quads to keep provenance). */
  def writeStream(rows: Iterator[(String, String, String, Byte, String, String)],
      sink: String => Unit,
      prefixes: Seq[(String, String)] = DefaultPrefixes): Unit = {
    prefixes.foreach { case (p, ns) => sink(s"@prefix $p: <$ns> .\n") }
    var curS: String = null
    var curP: String = null
    rows.foreach { case (s, p, o, oKind, oDt, oLang) =>
      val t = term(o, oKind, oDt, oLang, prefixes)
      if (s != curS) {
        if (curS != null) sink(" .\n")
        sink("\n" + (if (s.startsWith("_:")) s else iri(s, prefixes)))
        sink("\n  " + predicate(p, prefixes) + " " + t)
        curS = s; curP = p
      } else if (p != curP) {
        sink(" ;\n  " + predicate(p, prefixes) + " " + t)
        curP = p
      } else sink(", " + t)
    }
    if (curS != null) sink(" .\n")
  }

  private val RdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
  private val RdfFirst = "http://www.w3.org/1999/02/22-rdf-syntax-ns#first"
  private val RdfRest = "http://www.w3.org/1999/02/22-rdf-syntax-ns#rest"
  private val RdfNil = "http://www.w3.org/1999/02/22-rdf-syntax-ns#nil"
  private def predicate(p: String, prefixes: Seq[(String, String)]): String =
    // both the engine's compact store form and the full IRI write as `a`
    // (previously a store-conventional "rdf:type" serialized as the
    // non-standard relative IRI <rdf:type>)
    if (p == RdfType || p == "rdf:type") "a" else iri(p, prefixes)

  /** TriG: Turtle wrapped in named-graph blocks — the provenance-keeping
    * serialization (each block is one `g` context, mirroring the
    * reference's per-document/per-enricher graphs). Rows must arrive
    * grouped by (graph, subject, predicate); buffering is one run. */
  def writeTrigStream(
      rows: Iterator[(String, String, String, String, Byte, String, String)],
      sink: String => Unit,
      prefixes: Seq[(String, String)] = DefaultPrefixes): Unit = {
    prefixes.foreach { case (p, ns) => sink(s"@prefix $p: <$ns> .\n") }
    var curG: String = null
    var curS: String = null
    var curP: String = null
    def closeGraph(): Unit = if (curG != null) { sink(" .\n}\n"); curS = null; curP = null }
    rows.foreach { case (g, s, p, o, oKind, oDt, oLang) =>
      val t = term(o, oKind, oDt, oLang, prefixes)
      if (g != curG) {
        closeGraph()
        sink("\n" + iri(g, prefixes) + " {")
        curG = g
      }
      if (s != curS) {
        if (curS != null) sink(" .")
        sink("\n  " + (if (s.startsWith("_:")) s else iri(s, prefixes)))
        sink("\n    " + predicate(p, prefixes) + " " + t)
        curS = s; curP = p
      } else if (p != curP) {
        sink(" ;\n    " + predicate(p, prefixes) + " " + t)
        curP = p
      } else sink(", " + t)
    }
    closeGraph()
  }

  /** Whole-document TriG serialization (driver-side convenience / tests). */
  def serializeTrig(quads: Seq[Quad],
      prefixes: Seq[(String, String)] = DefaultPrefixes): String = {
    val sb = new StringBuilder
    val sorted = quads.sortBy(q => (q.g, q.s, q.p, q.o))
    writeTrigStream(
      sorted.iterator.map(q => (q.g, q.s, q.p, q.o, q.oKind, q.oDt, q.oLang)),
      s => sb.append(s), prefixes)
    sb.toString
  }

  /** Whole-document serialization (driver-side convenience / tests). */
  def serialize(quads: Seq[Quad],
      prefixes: Seq[(String, String)] = DefaultPrefixes): String = {
    val sb = new StringBuilder
    val sorted = quads.sortBy(q => (q.s, q.p, q.o))
    writeStream(
      sorted.iterator.map(q => (q.s, q.p, q.o, q.oKind, q.oDt, q.oLang)),
      s => sb.append(s), prefixes)
    sb.toString
  }

  // ------------------------------------------------------------- parser

  /** Tokenize a Turtle document: IRIs, literals (with escapes), prefixed
    * names/keywords, and the punctuation `; , . [ ] ( )`. Comments run
    * `#` to end of line outside quoted strings. */
  private[sources] def tokenize(doc: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    var i = 0
    val n = doc.length
    while (i < n) {
      val c = doc.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '#') { while (i < n && doc.charAt(i) != '\n') i += 1 }
      else if (c == '<') {
        val j = doc.indexOf('>', i)
        require(j > 0, s"unterminated IRI at offset $i")
        out += doc.substring(i, j + 1); i = j + 1
      } else if (c == '"' || c == '\'') {
        // both quote flavors (§6.4: '…' and '''…''' are legal alongside
        // "…" and """…"""); single-quoted forms normalize to the
        // double-quoted token shape so the rest of the parser sees one
        // representation. Long-string form first, then short with escapes.
        val q = c
        if (i + 2 < n && doc.charAt(i + 1) == q && doc.charAt(i + 2) == q) {
          // find the terminating quote-run with escape awareness (\" does
          // not close), longest-match so """" puts the extra quote in the
          // content (§6.4 STRING_LITERAL_LONG)
          var j = i + 3
          var run = 0
          while (j < n && run < 3) {
            val ch = doc.charAt(j)
            if (ch == '\\' && j + 1 < n) { run = 0; j += 2 }
            else { run = if (ch == q) run + 1 else 0; j += 1 }
          }
          require(run == 3, s"unterminated long string at offset $i")
          while (j < n && doc.charAt(j) == q) j += 1
          val content = doc.substring(i + 3, j - 3)
          // normalize to a short double-quoted token: keep escape pairs
          // as-is (unescape processes them once), escape raw specials
          val sb = new StringBuilder("\"")
          var k = 0
          while (k < content.length) {
            val ch = content.charAt(k)
            if (ch == '\\' && k + 1 < content.length) {
              sb.append(ch).append(content.charAt(k + 1)); k += 2
            } else {
              ch match {
                case '"' => sb.append("\\\"")
                case '\n' => sb.append("\\n")
                case '\r' => sb.append("\\r")
                case other => sb.append(other)
              }
              k += 1
            }
          }
          sb.append('"'); out += sb.toString
          i = j
        } else {
          val sb = new StringBuilder("\"")
          i += 1
          while (i < n && doc.charAt(i) != q) {
            if (doc.charAt(i) == '\\' && i + 1 < n) {
              sb.append(doc.charAt(i)).append(doc.charAt(i + 1)); i += 2
            } else if (doc.charAt(i) == '"') { sb.append("\\\""); i += 1 }
            else { sb.append(doc.charAt(i)); i += 1 }
          }
          require(i < n, s"unterminated string at offset $i")
          sb.append('"'); out += sb.toString; i += 1
        }
        // attach a ^^type / @lang suffix to the literal token
        if (i + 1 < n && doc.charAt(i) == '^' && doc.charAt(i + 1) == '^') {
          i += 2
          if (i < n && doc.charAt(i) == '<') {
            val j = doc.indexOf('>', i)
            out += out.remove(out.size - 1) + "^^" + doc.substring(i, j + 1)
            i = j + 1
          } else {
            val j = wordEnd(doc, i)
            out += out.remove(out.size - 1) + "^^" + doc.substring(i, j)
            i = j
          }
        } else if (i < n && doc.charAt(i) == '@') {
          val j = wordEnd(doc, i)
          out += out.remove(out.size - 1) + doc.substring(i, j)
          i = j
        }
      } else if (";,.[](){}".indexOf(c) >= 0 &&
          // a '.' directly followed by a digit starts a bare decimal
          // (.5 — DECIMAL's integer part is optional), not a terminator
          !(c == '.' && i + 1 < n && doc.charAt(i + 1).isDigit)) {
        out += c.toString; i += 1
      }
      else {
        val j = wordEnd(doc, i)
        out += doc.substring(i, j); i = j
      }
    }
    out.toList
  }

  /** Single left-to-right unescape scan — each `\x` pair is consumed
    * exactly once, so `\\` followed by `n` yields backslash-then-n, not
    * a newline (the sequential-`.replace` pipeline corrupted that). */
  private[sources] def unescape(raw: String): String = {
    val n = raw.length
    val sb = new StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = raw.charAt(i)
      if (c == '\\' && i + 1 < n) {
        raw.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case '"' => sb.append('"'); i += 2
          case '\'' => sb.append('\''); i += 2
          case '\\' => sb.append('\\'); i += 2
          case 'u' if i + 6 <= n =>
            sb.append(Integer.parseInt(raw.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case 'U' if i + 10 <= n =>
            sb.appendAll(Character.toChars(
              Integer.parseInt(raw.substring(i + 2, i + 10), 16)))
            i += 10
          case other => sb.append('\\').append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def wordEnd(doc: String, start: Int): Int = {
    var j = start
    val n = doc.length
    while (j < n && !doc.charAt(j).isWhitespace &&
      ";,\"<[](){}".indexOf(doc.charAt(j)) < 0 &&
      // '.' ends a statement only when followed by whitespace/EOF — it is
      // legal inside prefixed names and decimals
      !(doc.charAt(j) == '.' &&
        (j + 1 >= n || doc.charAt(j + 1).isWhitespace))) j += 1
    j
  }

  /** Parse one Turtle OR TriG document into quads (graph =
    * `defaultGraph` for plain triples; a top-level `<g> { … }` TriG
    * block assigns its graph to the statements inside — round-trips
    * [[writeTrigStream]]). Supports `@prefix`/`@base` (and SPARQL-style
    * PREFIX/BASE), `a`, `;`/`,` lists, IRIs, prefixed names, blank-node
    * labels, and literals with language tags or datatypes. Blank-node
    * property lists `[ p o ; … ]` (as subject or object, fresh `_:tb…`
    * labels) and collections `( e1 e2 … )` (rdf:first/rdf:rest chains,
    * `()` = rdf:nil) parse per Turtle §7.2/7.3 — the writer never emits
    * them, but RDF4J-authored documents (the reference's toolchain) use
    * both liberally. */
  def parse(doc: String, defaultGraph: String = "graft:default"): Seq[Quad] = {
    var tokens = tokenize(doc)
    val prefixes = scala.collection.mutable.Map[String, String]()
    var base = ""
    var graph = defaultGraph
    var graphDepth = 0 // inside a TriG block?
    val out = scala.collection.mutable.ListBuffer[Quad]()

    def resolve(t: String): (String, Byte) =
      if (t.startsWith("<")) {
        val v = t.substring(1, t.length - 1)
        (if (v.contains(":") || base.isEmpty) v else base + v, Quad.IRI)
      } else if (t.startsWith("_:")) (t, Quad.BNODE)
      else if (t == "a") (RdfType, Quad.IRI)
      else {
        val idx = t.indexOf(':')
        require(idx >= 0, s"not a term: $t")
        val (p, local) = (t.substring(0, idx), t.substring(idx + 1))
        val ns = prefixes.getOrElse(p, sys.error(s"undeclared prefix '$p:'"))
        (ns + local, Quad.IRI)
      }

    // fresh labels must not collide with explicit _:tbN labels in the
    // document (two distinct nodes would silently merge)
    val usedLabels = tokens.iterator.filter(_.startsWith("_:")).toSet
    var anonN = 0
    def freshB(): String = {
      anonN += 1
      var l = "_:tb" + anonN
      while (usedLabels(l)) { anonN += 1; l = "_:tb" + anonN }
      l
    }

    def objTerm(t: String): (String, Byte, String, String) =
      if (t.startsWith("\"")) {
        val close = t.lastIndexOf('"')
        val value = unescape(t.substring(1, close))
        val suffix = t.substring(close + 1)
        if (suffix.startsWith("@")) (value, Quad.LITERAL, null, suffix.substring(1))
        else if (suffix.startsWith("^^")) {
          // explicit ^^xsd:string normalizes away — the canonical store
          // form NTriples.parseLine documents and enforces (plain
          // literals carry no datatype; mixed-provenance quads must
          // compare equal)
          val dt = resolve(suffix.substring(2))._1
          (value, Quad.LITERAL, if (dt == Quad.Xsd.string) null else dt, null)
        } else (value, Quad.LITERAL, null, null)
      } else if (t.head.isDigit || t.head == '-' || t.head == '+' ||
          (t.head == '.' && t.length > 1) || t == "true" || t == "false") {
        // bare numeric/boolean literals carry their implied XSD type:
        // per the Turtle grammar only exponent forms are xsd:double;
        // digits-with-dot is xsd:decimal, bare integers xsd:integer-ish
        val dt =
          if (t == "true" || t == "false") Quad.Xsd.boolean
          else if (t.contains("e") || t.contains("E")) Quad.Xsd.double
          else if (t.contains(".")) Quad.Xsd.decimal
          else Quad.Xsd.long
        (t, Quad.LITERAL, dt, null)
      } else {
        val (v, k) = resolve(t)
        (v, k, null, null)
      }

    // object position: a simple term, `[ predicateObjectList ]` (fresh
    // blank node), or `( collection )` (rdf:first/rdf:rest chain,
    // `()` = rdf:nil) — Turtle §7.2/7.3
    def parseObject(): (String, Byte, String, String) = tokens.head match {
      case "[" =>
        tokens = tokens.tail
        val b = freshB()
        if (tokens.headOption.contains("]")) tokens = tokens.tail
        else {
          predicateObjectList(b)
          require(tokens.headOption.contains("]"), "unterminated [ property list")
          tokens = tokens.tail
        }
        (b, Quad.BNODE, null, null)
      case "(" =>
        tokens = tokens.tail
        val items = scala.collection.mutable.ListBuffer[(String, Byte, String, String)]()
        while (!tokens.headOption.contains(")")) {
          require(tokens.nonEmpty, "unterminated ( collection")
          items += parseObject()
        }
        tokens = tokens.tail
        if (items.isEmpty) (RdfNil, Quad.IRI, null, null)
        else {
          val cells = items.map(_ => freshB())
          for ((((o, k, dt, lang), cell), idx) <- items.zip(cells).zipWithIndex) {
            out += Quad(cell, RdfFirst, o, k, dt, lang, graph)
            val (rest, rk) =
              if (idx + 1 < cells.size) (cells(idx + 1), Quad.BNODE)
              else (RdfNil, Quad.IRI)
            out += Quad(cell, RdfRest, rest, rk, null, null, graph)
          }
          (cells.head, Quad.BNODE, null, null)
        }
      case t =>
        tokens = tokens.tail
        objTerm(t)
    }

    def predicateObjectList(s: String): Unit = {
      var done = false
      while (!done) {
        require(tokens.nonEmpty, "statement ended before predicate")
        // predicate position normalizes the full type IRI to the
        // engine's compact "rdf:type" (see NTriples.normPred): without
        // it, externally-authored `a`/rdf:type statements were invisible
        // to every "rdf:type"-keyed query (Sparql's `a`, Views)
        val p = NTriples.normPred(resolve(tokens.head)._1)
        tokens = tokens.tail
        var moreObjects = true
        while (moreObjects) {
          require(tokens.nonEmpty, "statement ended before object")
          val (o, kind, dt, lang) = parseObject()
          out += Quad(s, p, o, kind, dt, lang, graph)
          moreObjects = tokens.headOption.contains(",") && {
            tokens = tokens.tail; true
          }
        }
        if (tokens.headOption.contains(";")) {
          // `;` runs are legal (§7.2: the verb after `;` is optional), as
          // is a trailing `;` before a statement/list/block terminator
          while (tokens.headOption.contains(";")) tokens = tokens.tail
          if (tokens.headOption.forall(t => t == "." || t == "]" || t == "}"))
            done = true
        } else done = true
      }
    }

    while (tokens.nonEmpty) {
      tokens.head match {
        case t if t.equalsIgnoreCase("@prefix") || t.equalsIgnoreCase("PREFIX") =>
          val (name :: nsTok :: rest) = tokens.tail: @unchecked
          prefixes(name.stripSuffix(":")) = nsTok.substring(1, nsTok.length - 1)
          tokens = if (rest.headOption.contains(".")) rest.tail else rest
        case t if t.equalsIgnoreCase("@base") || t.equalsIgnoreCase("BASE") =>
          val (bTok :: rest) = tokens.tail: @unchecked
          base = bTok.substring(1, bTok.length - 1)
          tokens = if (rest.headOption.contains(".")) rest.tail else rest
        case "}" if graphDepth > 0 => // close a TriG graph block
          graphDepth -= 1; graph = defaultGraph
          tokens = tokens.tail
          if (tokens.headOption.contains(".")) tokens = tokens.tail
        case t if t.equalsIgnoreCase("GRAPH") &&
            tokens.drop(2).headOption.contains("{") => // GRAPH <g> { … }
          require(graphDepth == 0, "nested TriG graph blocks are not legal")
          graph = resolve(tokens.tail.head)._1
          graphDepth += 1
          tokens = tokens.drop(3)
        case "{" => // anonymous block: statements land in the default graph
          require(graphDepth == 0, "nested TriG graph blocks are not legal")
          graphDepth += 1
          tokens = tokens.tail
        case gTok if tokens.tail.headOption.contains("{") => // open one
          require(graphDepth == 0, "nested TriG graph blocks are not legal")
          graph = resolve(gTok)._1
          graphDepth += 1
          tokens = tokens.tail.tail
        case sTok =>
          // subject: a term, or a [ ]/( ) node whose inner quads emit now
          val s =
            if (sTok == "[" || sTok == "(") parseObject()._1
            else { tokens = tokens.tail; resolve(sTok)._1 }
          // §7.1: ONLY a blankNodePropertyList subject may omit the
          // predicateObjectList (`[ p o ] .`); a bare IRI/collection
          // subject with no predicates is a truncated statement
          if (sTok == "[" && tokens.headOption.exists(t =>
              t == "." || (t == "}" && graphDepth > 0))) ()
          else predicateObjectList(s)
          tokens.headOption match {
            case Some(".") => tokens = tokens.tail
            // a statement inside a TriG block may be the block's last,
            // terminated by the closing brace rather than a dot
            case Some("}") if graphDepth > 0 => ()
            case other => sys.error(s"expected '.', got $other")
          }
      }
    }
    out.toSeq
  }

  /** Distributed read: one task per FILE (wholetext — Turtle is not
    * line-splittable); each document parses independently with its own
    * prefix table, quads land in `defaultGraph` (or per-file graphs via
    * the file-name column upstream). */
  def read(spark: SparkSession, path: String,
      defaultGraph: String = "graft:default"): Dataset[Quad] = {
    import spark.implicits._
    spark.read.option("wholetext", "true").textFile(path)
      .flatMap(doc => parse(doc, defaultGraph))
  }
}
