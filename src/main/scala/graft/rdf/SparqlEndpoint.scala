package graft.rdf

import java.io.OutputStream
import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicReference

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.DataFrame

/** SPARQL 1.1 Protocol endpoint over a quads DataFrame — the engine's
  * front door, mirroring the reference's akka-http service
  * (`core/src/main/com/thymeflow/api/SparqlService.scala:38-201`) on the
  * JDK's built-in HTTP server (zero dependencies).
  *
  * Queries: GET `/sparql?query=...` and POST with
  * `application/x-www-form-urlencoded` (`query=...`) or
  * `application/sparql-query` bodies; SELECT, ASK and CONSTRUCT forms.
  * SELECT results negotiate SPARQL JSON (default), XML
  * (`application/sparql-results+xml`), CSV (`text/csv`) or TSV
  * (`text/tab-separated-values`) via Accept — the reference resolves the
  * writer the same way (`SparqlService.scala:170-201`). CONSTRUCT streams
  * N-Quads lines. Malformed queries → 400 with the parse error.
  *
  * Updates: POST with `update=...` form data or an
  * `application/sparql-update` body (`INSERT DATA` / `DELETE DATA` /
  * `DELETE/INSERT WHERE`) — parsed by [[Sparql.updateDiff]] and applied
  * to the served snapshot through [[QuadStore.applyDiff]], exactly the
  * reference's prepareUpdate→execute path
  * (`SparqlService.scala:144-158`); 200 with an empty body on success.
  *
  * Results STREAM: rows are serialized from `toLocalIterator` — one
  * partition in flight at a time, chunked transfer encoding, no driver
  * collect of the full result (the reference streams its result sets the
  * same way, `SparqlService.scala:140-170`).
  */
object SparqlEndpoint {

  /** One served store version plus its term-kind side table. The table is
    * computed (and locally checkpointed) at most ONCE per snapshot — the
    * first JSON/XML SELECT pays three store scans + one aggregate, every
    * later request on the same version reuses the materialized result.
    * Updates swap in a fresh [[Snapshot]], so the cache can never serve a
    * stale kind. */
  final class Snapshot(val quads: DataFrame) {
    /** Distinct term → kind (IRI=0 wins ties: any term standing as a
      * subject or predicate is an IRI; object occurrences carry their
      * stored kind). */
    lazy val termKinds: DataFrame = {
      import org.apache.spark.sql.functions._
      quads.select(col("o").as("__term"), col("oKind").cast("byte").as("__k"))
        .unionByName(quads.select(col("s").as("__term"),
          lit(Quad.IRI).cast("byte").as("__k")))
        .unionByName(quads.select(col("p").as("__term"),
          lit(Quad.IRI).cast("byte").as("__k")))
        .groupBy(col("__term")).agg(min(col("__k")).as("__k"))
        .localCheckpoint()
    }
  }

  final case class Server(http: HttpServer, ref: AtomicReference[Snapshot],
      executor: java.util.concurrent.ExecutorService) {
    def port: Int = http.getAddress.getPort
    def stop(): Unit = { http.stop(0); executor.shutdown() }
    /** Current store snapshot (reflects applied updates). */
    def store: DataFrame = ref.get.quads
    /** Swap in a new store version (live serving: wire as
      * [[graft.streaming.QuadPipeline.run]]'s `onStore` callback so every
      * micro-batch publishes its refreshed store here). Atomic — requests
      * in flight finish on the old snapshot. */
    def refresh(quads: DataFrame): Unit = ref.set(new Snapshot(quads))
  }

  def start(quads: DataFrame, port: Int = 0): Server = {
    val ref = new AtomicReference[Snapshot](new Snapshot(quads))
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/sparql", new Handler(ref))
    // concurrent request pool, nproc+1 like the reference
    // (`SparqlService.scala:37`) — a slow SELECT no longer blocks other
    // clients. Safe because [[Snapshot]] is immutable and swaps are
    // atomic; updates serialize on the ref (Handler.runUpdate).
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      Runtime.getRuntime.availableProcessors() + 1)
    server.setExecutor(pool)
    server.start()
    Server(server, ref, pool)
  }

  private def parseParams(s: String): Map[String, String] =
    if (s == null || s.isEmpty) Map.empty
    else s.split("&").toSeq.flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) =>
          Some(URLDecoder.decode(k, "UTF-8") -> URLDecoder.decode(v, "UTF-8"))
        case _ => None
      }
    }.toMap

  private def jsonEscape(s: String): String = {
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

  private def csvEscape(s: String): String =
    if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  private val Sd = "http://www.w3.org/ns/sparql-service-description#"

  private val serviceDescription: String = Seq(
    s"_:service <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <${Sd}Service> .",
    s"_:service <${Sd}feature> <${Sd}UnionDefaultGraph> .",
    s"_:service <${Sd}supportedLanguage> <${Sd}SPARQL11Query> .",
    s"_:service <${Sd}supportedLanguage> <${Sd}SPARQL11Update> .",
    s"_:service <${Sd}resultFormat> <http://www.w3.org/ns/formats/SPARQL_Results_JSON> .",
    s"_:service <${Sd}resultFormat> <http://www.w3.org/ns/formats/SPARQL_Results_XML> .",
    s"_:service <${Sd}resultFormat> <http://www.w3.org/ns/formats/SPARQL_Results_CSV> .",
    s"_:service <${Sd}resultFormat> <http://www.w3.org/ns/formats/SPARQL_Results_TSV> .",
    s"_:service <${Sd}resultFormat> <http://www.w3.org/ns/formats/N-Quads> .",
    s"_:service <${Sd}resultFormat> <http://www.w3.org/ns/formats/Turtle> .",
    s"_:service <${Sd}resultFormat> <http://www.w3.org/ns/formats/JSON-LD> .",
    s"_:service <${Sd}resultFormat> <http://www.w3.org/ns/formats/TriG> .")
    .mkString("", "\n", "\n")

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** Attach authoritative term-kind columns (`__kind_<col>`) by joining
    * each STRING-typed projected column back to the snapshot's cached
    * term table. Protocol clients then get term types from DATA, exactly
    * as the reference serves real RDF4J term kinds — the string-shape
    * heuristic remains only for values the store never saw
    * (BIND/expression results). Non-string columns (aggregates, numeric
    * expressions) are never stored terms, and joining them against the
    * string term table would make ANSI mode cast the term side to the
    * numeric type and throw on the first IRI — so they are skipped and
    * fall through to the literal default at serialization time.
    * Cost: one hash join per string column against the per-version
    * cached table (see [[Snapshot.termKinds]]) — no per-request scans. */
  private def withTermKinds(df: DataFrame, terms: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.StringType
    val strCols =
      df.schema.fields.filter(_.dataType == StringType).map(_.name)
    strCols.foldLeft(df) { (acc, c) =>
      val t = terms.select(col("__term").as(s"__t_$c"), col("__k").as(s"__kind_$c"))
      acc.join(t, acc(c) === t(s"__t_$c"), "left").drop(s"__t_$c")
    }
  }

  /** Protocol term type for a bound value: stored kind when the store
    * knows the term, strict IRI shape otherwise. */
  private def termType(kind: Option[Byte], value: String): String = kind match {
    case Some(Quad.IRI) => "uri"
    case Some(Quad.BNODE) => "bnode"
    case Some(_) => "literal"
    case None => if (Sparql.looksLikeIri(value)) "uri" else "literal"
  }

  private final class Handler(ref: AtomicReference[Snapshot]) extends HttpHandler {
    override def handle(ex: HttpExchange): Unit =
      try {
        val (query, update) = ex.getRequestMethod.toUpperCase match {
          case "GET" =>
            (parseParams(ex.getRequestURI.getRawQuery).get("query"), None)
          case "POST" =>
            val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
            val ct = Option(ex.getRequestHeaders.getFirst("Content-Type")).getOrElse("")
            if (ct.startsWith("application/sparql-query")) (Some(body), None)
            else if (ct.startsWith("application/sparql-update")) (None, Some(body))
            else {
              val params = parseParams(body)
              (params.get("query"), params.get("update"))
            }
          case _ =>
            ex.sendResponseHeaders(405, -1); ex.close(); return
        }
        // query form, looking through any PREFIX header block
        def form(q: String): String =
          "(?is)^(?:\\s*PREFIX\\s+\\S+\\s+<[^>]*>)*\\s*(SELECT|ASK|CONSTRUCT|DESCRIBE)".r
            .findFirstMatchIn(q).map(_.group(1).toUpperCase).getOrElse("SELECT")
        (query, update) match {
          case (_, Some(u)) => runUpdate(ex, u)
          case (None, None) if ex.getRequestMethod.equalsIgnoreCase("GET") =>
            // SPARQL 1.1 Service Description for query-less GETs — the
            // reference serves the same document (sd:Service with
            // sd:UnionDefaultGraph, `SparqlService.scala:158-168,225-239`)
            respond(ex, 200, "application/n-triples", serviceDescription)
          case (None, None) => respond(ex, 400, "text/plain", "missing query parameter")
          case (Some(q), _) if form(q) == "ASK" =>
            val result = Sparql.ask(ref.get.quads, q)
            val accept = Option(ex.getRequestHeaders.getFirst("Accept")).getOrElse("")
            if (accept.contains("application/sparql-results+xml"))
              respond(ex, 200, "application/sparql-results+xml",
                "<?xml version=\"1.0\"?><sparql xmlns=\"http://www.w3.org/2005/sparql-results#\">" +
                  s"<head/><boolean>$result</boolean></sparql>")
            else respond(ex, 200, "application/sparql-results+json",
              s"""{"head":{},"boolean":$result}""")
          case (Some(q), _) if form(q) == "CONSTRUCT" || form(q) == "DESCRIBE" =>
            // graph-result forms: N-Quads by default, Turtle on Accept —
            // the most common RDF tooling default (the reference resolves
            // every RDF4J writer the same way, SparqlService.scala:170-201)
            val df =
              try if (form(q) == "CONSTRUCT") Sparql.construct(ref.get.quads, q)
                  else Sparql.describe(ref.get.quads, q)
              catch {
                case e: Exception =>
                  respond(ex, 400, "text/plain", s"parse error: ${e.getMessage}")
                  return
              }
            val accept = Option(ex.getRequestHeaders.getFirst("Accept")).getOrElse("")
            if (accept.contains("text/turtle")) streamTurtle(ex, df)
            else if (accept.contains("application/ld+json")) streamJsonLd(ex, df)
            else if (accept.contains("application/trig")) streamTrig(ex, df)
            else if (accept.contains("application/rdf+xml")) streamRdfXml(ex, df)
            else streamNQuads(ex, df)
          case (Some(q), _) =>
            val df =
              try Sparql.select(ref.get.quads, q)
              catch {
                case e: Exception =>
                  respond(ex, 400, "text/plain", s"parse error: ${e.getMessage}")
                  return
              }
            val accept = Option(ex.getRequestHeaders.getFirst("Accept")).getOrElse("")
            if (accept.contains("text/csv")) streamCsv(ex, df)
            else if (accept.contains("text/tab-separated-values")) streamTsv(ex, df)
            else if (accept.contains("application/sparql-results+xml"))
              streamXml(ex, withTermKinds(df, ref.get.termKinds))
            else streamJson(ex, withTermKinds(df, ref.get.termKinds))
        }
      } catch {
        case e: Exception =>
          try respond(ex, 500, "text/plain", s"error: ${e.getMessage}")
          catch { case _: Exception => () }
      } finally ex.close()

    private def runUpdate(ex: HttpExchange, updateText: String): Unit = {
      // updates serialize on the snapshot ref: with the concurrent
      // request pool, two read-modify-swap updates racing would lose one
      val ok = ref.synchronized {
        val diff =
          try Sparql.updateDiff(ref.get.quads, updateText)
          catch {
            case e: Exception =>
              respond(ex, 400, "text/plain", s"malformed update: ${e.getMessage}")
              return
          }
        // materialize the new snapshot's diff inputs before swapping so a
        // later update's WHERE doesn't re-evaluate a deep applyDiff chain
        ref.set(new Snapshot(QuadStore.applyDiff(ref.get.quads, diff).localCheckpoint()))
        true
      }
      if (ok) respond(ex, 200, "text/plain", "")
    }

    private def respond(ex: HttpExchange, code: Int, ct: String, body: String): Unit = {
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", ct)
      ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
      if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    }

    /** SPARQL results JSON, streamed row by row (chunked). The input
      * carries `__kind_<col>` columns from [[withTermKinds]]. */
    private def streamJson(ex: HttpExchange, df: DataFrame): Unit = {
      val all = df.columns
      val cols = all.filterNot(_.startsWith("__kind_"))
      val valIdx = cols.map(all.indexOf(_))
      val kindIdx = cols.map(c => all.indexOf(s"__kind_$c"))
      ex.getResponseHeaders.set("Content-Type", "application/sparql-results+json")
      ex.sendResponseHeaders(200, 0) // 0 => chunked
      val out: OutputStream = ex.getResponseBody
      def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.UTF_8))
      w("""{"head":{"vars":[""")
      w(cols.map(c => "\"" + jsonEscape(c) + "\"").mkString(","))
      w("""]},"results":{"bindings":[""")
      val it = df.toLocalIterator()
      var first = true
      while (it.hasNext) {
        val row = it.next()
        if (!first) w(",")
        first = false
        val fields = cols.indices.flatMap { i =>
          Option(row.get(valIdx(i))).map { v =>
            val s = v.toString
            val kind = Some(kindIdx(i)).filter(_ >= 0)
              .filterNot(row.isNullAt).map(row.getByte)
            val tpe = termType(kind, s)
            "\"" + jsonEscape(cols(i)) +
              "\":{\"type\":\"" + tpe + "\",\"value\":\"" +
              jsonEscape(s) + "\"}"
          }
        }
        w("{" + fields.mkString(",") + "}")
      }
      w("]}}")
      out.flush()
    }

    /** SPARQL results XML (the reference's second tuple format), streamed. */
    private def streamXml(ex: HttpExchange, df: DataFrame): Unit = {
      val all = df.columns
      val cols = all.filterNot(_.startsWith("__kind_"))
      val valIdx = cols.map(all.indexOf(_))
      val kindIdx = cols.map(c => all.indexOf(s"__kind_$c"))
      ex.getResponseHeaders.set("Content-Type", "application/sparql-results+xml")
      ex.sendResponseHeaders(200, 0)
      val out = ex.getResponseBody
      def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.UTF_8))
      w("""<?xml version="1.0"?><sparql xmlns="http://www.w3.org/2005/sparql-results#"><head>""")
      cols.foreach(c => w(s"""<variable name="${xmlEscape(c)}"/>"""))
      w("</head><results>")
      val it = df.toLocalIterator()
      while (it.hasNext) {
        val row = it.next()
        w("<result>")
        cols.indices.foreach { i =>
          Option(row.get(valIdx(i))).foreach { v =>
            val s = v.toString
            val kind = Some(kindIdx(i)).filter(_ >= 0)
              .filterNot(row.isNullAt).map(row.getByte)
            val tag = termType(kind, s)
            w(s"""<binding name="${xmlEscape(cols(i))}"><$tag>${xmlEscape(s)}</$tag></binding>""")
          }
        }
        w("</result>")
      }
      w("</results></sparql>")
      out.flush()
    }

    /** SPARQL results CSV (RFC 4180-ish), streamed. */
    private def streamCsv(ex: HttpExchange, df: DataFrame): Unit = {
      val cols = df.columns
      ex.getResponseHeaders.set("Content-Type", "text/csv; charset=utf-8")
      ex.sendResponseHeaders(200, 0)
      val out = ex.getResponseBody
      def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.UTF_8))
      w(cols.map(csvEscape).mkString(",") + "\r\n")
      val it = df.toLocalIterator()
      while (it.hasNext) {
        val row = it.next()
        w(cols.indices.map(i =>
          Option(row.get(i)).map(v => csvEscape(v.toString)).getOrElse(""))
          .mkString(",") + "\r\n")
      }
      out.flush()
    }

    /** SPARQL results TSV, streamed. */
    private def streamTsv(ex: HttpExchange, df: DataFrame): Unit = {
      val cols = df.columns
      ex.getResponseHeaders.set("Content-Type", "text/tab-separated-values; charset=utf-8")
      ex.sendResponseHeaders(200, 0)
      val out = ex.getResponseBody
      def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.UTF_8))
      w(cols.map("?" + _).mkString("\t") + "\n")
      val it = df.toLocalIterator()
      while (it.hasNext) {
        val row = it.next()
        w(cols.indices.map(i =>
          Option(row.get(i)).map(v =>
            v.toString.replace("\\", "\\\\").replace("\t", "\\t").replace("\n", "\\n"))
            .getOrElse(""))
          .mkString("\t") + "\n")
      }
      out.flush()
    }

    /** CONSTRUCT/DESCRIBE results as prefixed Turtle, streamed: the
      * result is sorted by (s, p) so [[graft.sources.Turtle.writeStream]]
      * groups subject blocks in one pass over `toLocalIterator` — no
      * driver collect. Graph provenance is flattened (Turtle has no
      * graph term; N-Quads keeps it). */
    private def streamTurtle(ex: HttpExchange, df: DataFrame): Unit = {
      import org.apache.spark.sql.functions.col
      ex.getResponseHeaders.set("Content-Type", "text/turtle; charset=utf-8")
      ex.sendResponseHeaders(200, 0)
      val out = ex.getResponseBody
      graft.sources.Turtle.writeStream(
        sortedTermRows(df, df.orderBy(col("s"), col("p"), col("o"))),
        s => out.write(s.getBytes(StandardCharsets.UTF_8)))
      out.flush()
    }

    /** Graph results as flat expanded JSON-LD (`{"@graph":[…]}`),
      * streamed with the same sorted-subject-group contract as Turtle. */
    private def streamJsonLd(ex: HttpExchange, df: DataFrame): Unit = {
      import org.apache.spark.sql.functions.col
      ex.getResponseHeaders.set("Content-Type", "application/ld+json; charset=utf-8")
      ex.sendResponseHeaders(200, 0)
      val out = ex.getResponseBody
      graft.sources.JsonLd.writeStream(
        sortedTermRows(df, df.orderBy(col("s"), col("p"), col("o"))),
        s => out.write(s.getBytes(StandardCharsets.UTF_8)))
      out.flush()
    }

    /** Graph results as RDF/XML — the legacy default of Protégé / older
      * Jena clients (reference negotiates it via RDF4J,
      * `SparqlService.scala:170-201`); same sorted-subject-group
      * streaming contract as Turtle. */
    private def streamRdfXml(ex: HttpExchange, df: DataFrame): Unit = {
      import org.apache.spark.sql.functions.col
      ex.getResponseHeaders.set("Content-Type", "application/rdf+xml; charset=utf-8")
      ex.sendResponseHeaders(200, 0)
      val out = ex.getResponseBody
      graft.sources.RdfXml.writeStream(
        sortedTermRows(df, df.orderBy(col("s"), col("p"), col("o"))),
        s => out.write(s.getBytes(StandardCharsets.UTF_8)))
      out.flush()
    }

    /** Graph results as TriG (named-graph-blocked Turtle), streamed —
      * the serialization that keeps `g` provenance. */
    private def streamTrig(ex: HttpExchange, df: DataFrame): Unit = {
      import org.apache.spark.sql.functions.col
      ex.getResponseHeaders.set("Content-Type", "application/trig; charset=utf-8")
      ex.sendResponseHeaders(200, 0)
      val out = ex.getResponseBody
      val idx = df.columns.zipWithIndex.toMap
      val it = df.orderBy(col("g"), col("s"), col("p"), col("o")).toLocalIterator()
      def strCol(row: org.apache.spark.sql.Row, c: String): String =
        idx.get(c).map(i => if (row.isNullAt(i)) null else row.getString(i)).orNull
      val rows = new Iterator[(String, String, String, String, Byte, String, String)] {
        def hasNext: Boolean = it.hasNext
        def next(): (String, String, String, String, Byte, String, String) = {
          val row = it.next()
          (row.getString(idx("g")), row.getString(idx("s")), row.getString(idx("p")),
            row.getString(idx("o")),
            idx.get("oKind").map(row.getByte).getOrElse(Quad.LITERAL),
            strCol(row, "oDt"), strCol(row, "oLang"))
        }
      }
      graft.sources.Turtle.writeTrigStream(rows,
        s => out.write(s.getBytes(StandardCharsets.UTF_8)))
      out.flush()
    }

    /** Shared (s,p,o,kind,dt,lang) row iterator over an ordered frame. */
    private def sortedTermRows(df: DataFrame,
        ordered: DataFrame): Iterator[(String, String, String, Byte, String, String)] = {
      val idx = df.columns.zipWithIndex.toMap
      val it = ordered.toLocalIterator()
      def strCol(row: org.apache.spark.sql.Row, c: String): String =
        idx.get(c).map(i => if (row.isNullAt(i)) null else row.getString(i)).orNull
      new Iterator[(String, String, String, Byte, String, String)] {
        def hasNext: Boolean = it.hasNext
        def next(): (String, String, String, Byte, String, String) = {
          val row = it.next()
          (row.getString(idx("s")), row.getString(idx("p")), row.getString(idx("o")),
            idx.get("oKind").map(row.getByte).getOrElse(Quad.LITERAL),
            strCol(row, "oDt"), strCol(row, "oLang"))
        }
      }
    }

    /** CONSTRUCT results as N-Quads lines, streamed. Expects the
      * (s, p, o, oKind, ..., g) layout [[Sparql.construct]] produces. */
    private def streamNQuads(ex: HttpExchange, df: DataFrame): Unit = {
      ex.getResponseHeaders.set("Content-Type", "application/n-quads; charset=utf-8")
      ex.sendResponseHeaders(200, 0)
      val out = ex.getResponseBody
      def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.UTF_8))
      val idx = df.columns.zipWithIndex.toMap
      val it = df.toLocalIterator()
      while (it.hasNext) {
        val row = it.next()
        val s = row.getString(idx("s"))
        val p = row.getString(idx("p"))
        val o = row.getString(idx("o"))
        val g = row.getString(idx("g"))
        val kind = idx.get("oKind").map(row.getByte).getOrElse(Quad.LITERAL)
        def strCol(c: String): String =
          idx.get(c).map(i => if (row.isNullAt(i)) null else row.getString(i)).orNull
        // shared N-Triples term rule: ^^datatype / @lang survive;
        // blank-node subjects/graphs keep their _: label (never <_:b>)
        val oTerm = graft.sources.NTriples.fmtTerm(o, kind, strCol("oDt"), strCol("oLang"))
        val sTerm = if (s.startsWith("_:")) s else s"<$s>"
        val gTerm = if (g.startsWith("_:")) g else s"<$g>"
        w(s"$sTerm <$p> $oTerm $gTerm .\n")
      }
      out.flush()
    }
  }
}
