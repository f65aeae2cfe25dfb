package graft

import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.convert.Converters
import graft.rdf.SparqlEndpoint
import graft.streaming.QuadPipeline
import org.apache.spark.sql.functions._

/** The reference's §3.2 lifecycle end-to-end, served: ingest personal-data
  * fixtures → converter quads → enricher chain → the store behind a live
  * SPARQL HTTP endpoint, then the reference's own enricher query text run
  * as protocol requests (`thymeflow/src/main/com/thymeflow/enricher/
  * entityresolution/AgentMatchEnricher.scala:101-112` against
  * `core/src/main/com/thymeflow/api/SparqlService.scala`'s front door). */
class ServedPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val S = Converters.schemaOrg
  private val client = HttpClient.newHttpClient()

  private def get(server: SparqlEndpoint.Server, query: String,
      accept: String = "application/sparql-results+json"): HttpResponse[String] =
    client.send(
      HttpRequest.newBuilder(URI.create(
          s"http://localhost:${server.port}/sparql?query=" +
            URLEncoder.encode(query, "UTF-8")))
        .header("Accept", accept).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  private def update(server: SparqlEndpoint.Server, updateText: String): Int =
    client.send(
      HttpRequest.newBuilder(URI.create(s"http://localhost:${server.port}/sparql"))
        .header("Content-Type", "application/sparql-update")
        .POST(HttpRequest.BodyPublishers.ofString(updateText)).build(),
      HttpResponse.BodyHandlers.ofString()).statusCode()

  "the served pipeline" should
    "ingest, enrich and answer the reference's enricher queries over HTTP" in {
    // ---- ingest: two emails + a vCard sharing alice's address (golden B3/B4)
    val emails = Seq(
      ("m1",
        """Message-ID: <m1@host>
          |From: Alice Wonders <alice@example.com>
          |To: bob@example.com
          |Subject: lunch
          |
          |body""".stripMargin),
      ("m2",
        """Message-ID: <m2@host>
          |From: bob@example.com
          |To: Wondrs Alice <alice@example.com>
          |Subject: Re: lunch
          |
          |ok!""".stripMargin))
    val vcard =
      """BEGIN:VCARD
        |VERSION:3.0
        |UID:card-alice
        |FN:Alice W.
        |EMAIL:alice@example.com
        |END:VCARD""".stripMargin
    val batch = Converters.email(emails.toDS()).toDF()
      .unionByName(Converters.vcard(Seq(("v1", vcard)).toDS()).toDF())

    // ---- enrich: the reference-ordered chain (IFP same-as on email)
    val empty = batch.limit(0)
    val (store, _) = QuadPipeline.processBatch(
      empty, batch, empty, Seq(graft.enrich.Enrichers.ifpSameAs(S + "email")))

    // ---- serve
    val server = SparqlEndpoint.start(store.localCheckpoint())
    try {
      // the AgentMatchEnricher message-count query, stated verbatim
      // (AgentMatchEnricher.scala:101-112) over this engine's vocabulary
      val resp = get(server,
        s"""SELECT ?agent ?name (COUNT(?msg) as ?msgCount) WHERE {
           |  ?agent a <personal:Agent> ;
           |           <${S}name> ?name .
           |  OPTIONAL {
           |    {
           |      ?msg <${S}recipient> ?agent .
           |    } UNION {
           |      ?msg <${S}sender> ?agent .
           |    }
           |  }
           |} GROUP BY ?agent ?name""".stripMargin)
      resp.statusCode() shouldBe 200
      val body = resp.body()
      // alice's agent carries both display spellings, 2 messages each;
      // the card agent has a name and zero messages
      body should include(""""name":{"type":"literal","value":"Alice Wonders"}""")
      body should include(""""name":{"type":"literal","value":"Wondrs Alice"}""")
      body should include(""""name":{"type":"literal","value":"Alice W."}""")
      body should include(""""msgCount":{"type":"literal","value":"2"}""")
      body should include(""""msgCount":{"type":"literal","value":"0"}""")

      // the IFP enricher's sameAs statements are served: the email agent
      // and the vCard agent resolved to one entity
      val aliceAgent = graft.convert.Iri.entity("agent", "alice@example.com")
      val cardAgent = graft.convert.Iri.entity("agent", "card-alice")
      val sameAs = get(server,
        s"""SELECT ?a ?b WHERE { ?a <personal:sameAs> ?b }""")
      sameAs.body() should include(aliceAgent)
      sameAs.body() should include(cardAgent)

      // the guard shape (AbstractEnricher.scala:17-23) over the live store:
      // nothing is differentFrom -> false
      get(server,
        """ASK {
          |  ?f1 <personal:sameAs>*/<personal:differentFrom>/<personal:sameAs>* ?f2
          |}""".stripMargin).body() shouldBe """{"head":{},"boolean":false}"""

      // front-door UPDATE: assert a differentFrom, watch the guard flip
      update(server,
        s"""INSERT DATA { <$aliceAgent> <personal:differentFrom> <urn:x> }""") shouldBe 200
      get(server,
        """ASK {
          |  ?f1 <personal:sameAs>*/<personal:differentFrom>/<personal:sameAs>* ?f2
          |}""".stripMargin).body() shouldBe """{"head":{},"boolean":true}"""

      // CONSTRUCT over the enriched store through the same front door
      val constructed = get(server,
        s"""CONSTRUCT { ?a <personal:mergedWith> ?b } WHERE {
           |  ?a <personal:sameAs> ?b
           |}""".stripMargin, accept = "application/n-quads")
      constructed.statusCode() shouldBe 200
      constructed.body() should include("<personal:mergedWith>")

      // DESCRIBE the resolved agent through the front door: its own
      // statements plus the incoming sameAs/sender/recipient links
      val described = get(server, s"DESCRIBE <$aliceAgent>",
        accept = "application/n-quads")
      described.statusCode() shouldBe 200
      described.body() should include(s"<$aliceAgent> <${S}name>")
      described.body() should include(s"<personal:sameAs> <$aliceAgent>")
      described.body() should include(s"<${S}sender> <$aliceAgent>")
    } finally server.stop()
  }
}
