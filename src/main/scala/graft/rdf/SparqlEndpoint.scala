package graft.rdf

import java.io.OutputStream
import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.DataFrame

/** SPARQL 1.1 Protocol endpoint over a quads DataFrame — the engine's
  * front door, mirroring the reference's akka-http service
  * (`core/src/main/com/thymeflow/api/SparqlService.scala:38-201`) on the
  * JDK's built-in HTTP server (zero dependencies).
  *
  * Supported: GET `/sparql?query=...` and POST with
  * `application/x-www-form-urlencoded` (`query=...`) or
  * `application/sparql-query` bodies; SELECT and ASK forms; results as
  * SPARQL JSON (`application/sparql-results+json`, the default) or CSV
  * (`text/csv` via Accept). Malformed queries → 400 with the parse error.
  *
  * Results STREAM: rows are serialized from `toLocalIterator` — one
  * partition in flight at a time, chunked transfer encoding, no driver
  * collect of the full result (the reference streams its result sets the
  * same way, `SparqlService.scala:140-170`).
  */
object SparqlEndpoint {

  final case class Server(http: HttpServer) {
    def port: Int = http.getAddress.getPort
    def stop(): Unit = http.stop(0)
  }

  def start(quads: DataFrame, port: Int = 0): Server = {
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/sparql", new Handler(quads))
    server.setExecutor(null) // serial — one query at a time per endpoint
    server.start()
    Server(server)
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

  private final class Handler(quads: DataFrame) extends HttpHandler {
    override def handle(ex: HttpExchange): Unit =
      try {
        val query = ex.getRequestMethod.toUpperCase match {
          case "GET" => parseParams(ex.getRequestURI.getRawQuery).get("query")
          case "POST" =>
            val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
            val ct = Option(ex.getRequestHeaders.getFirst("Content-Type")).getOrElse("")
            if (ct.startsWith("application/sparql-query")) Some(body)
            else parseParams(body).get("query")
          case _ =>
            ex.sendResponseHeaders(405, -1); ex.close(); return
        }
        query match {
          case None => respond(ex, 400, "text/plain", "missing query parameter")
          case Some(q) if q.trim.toUpperCase.startsWith("ASK") =>
            val result = Sparql.ask(quads, q)
            respond(ex, 200, "application/sparql-results+json",
              s"""{"head":{},"boolean":$result}""")
          case Some(q) =>
            val df =
              try Sparql.select(quads, q)
              catch {
                case e: Exception =>
                  respond(ex, 400, "text/plain", s"parse error: ${e.getMessage}")
                  return
              }
            val accept = Option(ex.getRequestHeaders.getFirst("Accept")).getOrElse("")
            if (accept.contains("text/csv")) streamCsv(ex, df)
            else streamJson(ex, df)
        }
      } catch {
        case e: Exception =>
          try respond(ex, 500, "text/plain", s"error: ${e.getMessage}")
          catch { case _: Exception => () }
      } finally ex.close()

    private def respond(ex: HttpExchange, code: Int, ct: String, body: String): Unit = {
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", ct)
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
    }

    /** SPARQL results JSON, streamed row by row (chunked). */
    private def streamJson(ex: HttpExchange, df: DataFrame): Unit = {
      val cols = df.columns
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
          Option(row.get(i)).map { v =>
            "\"" + jsonEscape(cols(i)) +
              "\":{\"type\":\"literal\",\"value\":\"" +
              jsonEscape(v.toString) + "\"}"
          }
        }
        w("{" + fields.mkString(",") + "}")
      }
      w("]}}")
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
  }
}
