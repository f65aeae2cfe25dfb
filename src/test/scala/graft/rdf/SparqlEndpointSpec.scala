package graft.rdf

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.URLEncoder

import graft.SparkSpec

/** End-to-end HTTP tests of the SPARQL protocol endpoint: a real server on
  * an ephemeral port, a real JDK HttpClient. */
class SparqlEndpointSpec extends SparkSpec {
  import spark.implicits._

  private lazy val quads = Seq(
    ("alice", "name", "Alice", 2.toByte, null: String, null: String, "g1"),
    ("alice", "knows", "bob", 0.toByte, null: String, null: String, "g1"),
    ("bob", "name", "Bob, \"Bobby\"", 2.toByte, null: String, null: String, "g1"))
    .toDF("s", "p", "o", "oKind", "oDt", "oLang", "g")

  private def withServer[A](f: SparqlEndpoint.Server => A): A = {
    val server = SparqlEndpoint.start(quads)
    try f(server) finally server.stop()
  }

  private val client = HttpClient.newHttpClient()

  private def get(server: SparqlEndpoint.Server, query: String,
      accept: String = "application/sparql-results+json"): HttpResponse[String] =
    client.send(
      HttpRequest.newBuilder(URI.create(
          s"http://localhost:${server.port}/sparql?query=" +
            URLEncoder.encode(query, "UTF-8")))
        .header("Accept", accept).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  "the endpoint" should "answer a SELECT as SPARQL results JSON" in withServer { server =>
    val resp = get(server, "SELECT ?n WHERE { ?x <knows> ?y . ?y <name> ?n }")
    resp.statusCode() shouldBe 200
    resp.headers().firstValue("Content-Type").get() should
      include("application/sparql-results+json")
    resp.body() should include(""""vars":["n"]""")
    resp.body() should include(""""value":"Bob, \"Bobby\""""")
  }

  it should "answer POST form bodies and stream CSV on Accept" in withServer { server =>
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(s"http://localhost:${server.port}/sparql"))
        .header("Content-Type", "application/x-www-form-urlencoded")
        .header("Accept", "text/csv")
        .POST(HttpRequest.BodyPublishers.ofString(
          "query=" + URLEncoder.encode(
            "SELECT ?x ?n WHERE { ?x <name> ?n } ORDER BY ?x", "UTF-8")))
        .build(),
      HttpResponse.BodyHandlers.ofString())
    resp.statusCode() shouldBe 200
    val lines = resp.body().trim.split("\r\n").toSeq
    lines.head shouldBe "x,n"
    lines(1) shouldBe "alice,Alice"
    lines(2) shouldBe "bob,\"Bob, \"\"Bobby\"\"\""
  }

  it should "answer ASK with a boolean document" in withServer { server =>
    get(server, "ASK { <alice> <knows> ?y }").body() shouldBe
      """{"head":{},"boolean":true}"""
    get(server, "ASK { <bob> <knows> ?y }").body() shouldBe
      """{"head":{},"boolean":false}"""
  }

  it should "reject malformed queries with 400" in withServer { server =>
    get(server, "SELECT WHERE oops").statusCode() shouldBe 400
    client.send(
      HttpRequest.newBuilder(URI.create(s"http://localhost:${server.port}/sparql"))
        .GET().build(),
      HttpResponse.BodyHandlers.ofString()).statusCode() shouldBe 400
  }
}
