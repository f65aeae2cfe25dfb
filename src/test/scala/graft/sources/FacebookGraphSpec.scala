package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Facebook Graph API source against a scripted Graph-API-shaped server
  * (same pattern as the DAV/IMAP specs): profile + friends + batched
  * event fetch, conversion semantics per the reference's converter. */
class FacebookGraphSpec extends AnyFlatSpec with Matchers {

  private val sorg = "http://schema.org/"

  private def withServer(eventCount: Int)(body: (String, () => Int) => Unit): Unit = {
    var batchRequests = 0
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    def respond(ex: HttpExchange, json: String): Unit = {
      val bytes = json.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }
    server.createContext("/me", { (ex: HttpExchange) =>
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      q should include("access_token=tok123")
      q should include("birthday")
      val events = (1 to eventCount)
        .map(i => s"""{"id":"ev$i"}""").mkString(",")
      respond(ex,
        s"""{"id":"me1","first_name":"Ada","last_name":"Lovelace",
           |"gender":"female","email":"ada@example.org","bio":"pioneer",
           |"birthday":"12/10/1815","updated_time":"2015-01-01T00:00:00+0000",
           |"events":{"data":[$events]},
           |"taggable_friends":{"data":[
           |  {"id":"fr1","name":"Charles Babbage",
           |   "picture":{"data":{"url":"https://img.example/cb.jpg"}}},
           |  {"id":"fr2","name":"Mary Somerville"}
           |]}}""".stripMargin)
    })
    server.createContext("/", { (ex: HttpExchange) =>
      batchRequests += 1
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      val ids = q.split("&").find(_.startsWith("ids="))
        .map(_.stripPrefix("ids=")).map(java.net.URLDecoder.decode(_, "UTF-8"))
        .getOrElse("").split(",").filter(_.nonEmpty)
      val events = ids.map { id =>
        s""""$id":{"id":"$id","name":"Event $id",
           |"description":"desc $id",
           |"start_time":"2016-05-01T19:00:00+0200",
           |"end_time":"2016-05-01T23:30:00+0200",
           |"cover":{"id":"c$id","source":"https://img.example/$id.jpg"},
           |"place":{"id":"pl$id","name":"Some Hall",
           |  "location":{"city":"Paris","country":"France",
           |    "latitude":48.8566,"longitude":2.3522,
           |    "state":"IdF","street":"1 Rue X","zip":"75001"}},
           |"attending":{"data":[
           |  {"id":"fr1","name":"Charles Babbage","rsvp_status":"attending"}]},
           |"declined":{"data":[
           |  {"id":"fr2","name":"Mary Somerville","rsvp_status":"declined"}]}
           |}""".stripMargin
      }.mkString(",")
      respond(ex, s"{$events}")
    })
    server.start()
    try body(s"http://localhost:${server.getAddress.getPort}", () => batchRequests)
    finally server.stop(0)
  }

  behavior of "FacebookGraph"

  it should "convert profile, friends, events, places and RSVP semantics" in {
    withServer(eventCount = 2) { (endpoint, _) =>
      val r = FacebookGraph.sync(endpoint, "tok123", "facebook:acc1", "source:fb1")
      val qs = r.quads
      val ns = FacebookGraph.namespace
      def has(s: String, p: String, o: String): Unit =
        withClue(s"expect <$s> <$p> <$o>:") {
          qs.exists(q => q.s == s && q.p == p && q.o == o) shouldBe true
        }

      // profile
      has(ns + "me1", "rdf:type", "personal:Agent")
      has(ns + "me1", "rdf:type", sorg + "Person")
      has(ns + "me1", sorg + "givenName", "Ada")
      has(ns + "me1", sorg + "familyName", "Lovelace")
      has(ns + "me1", sorg + "email", "mailto:ada@example.org")
      has(ns + "me1", sorg + "description", "pioneer")
      val bday = qs.find(q => q.s == ns + "me1" && q.p == sorg + "birthDate").get
      bday.o shouldBe "1815-12-10"
      bday.oDt shouldBe "http://www.w3.org/2001/XMLSchema#date"

      // friends: name + image typed on the IMAGE node
      has(ns + "fr1", sorg + "name", "Charles Babbage")
      has(ns + "fr1", sorg + "image", "https://img.example/cb.jpg")
      has("https://img.example/cb.jpg", "rdf:type", sorg + "ImageObject")

      // events: reformatted offsets, cover, place with geo + address
      has(ns + "ev1", "rdf:type", sorg + "Event")
      val start = qs.find(q => q.s == ns + "ev1" && q.p == sorg + "startDate").get
      start.o shouldBe "2016-05-01T19:00:00+02:00"
      start.oDt shouldBe "http://www.w3.org/2001/XMLSchema#dateTime"
      has(ns + "ev1", sorg + "location", ns + "plev1")
      has(ns + "plev1", "rdf:type", sorg + "Place")
      has(ns + "plev1", sorg + "geo", graft.convert.Iri.geo(48.8566, 2.3522))
      val addr = qs.find(q => q.s == ns + "plev1" && q.p == sorg + "address").get.o
      has(addr, "rdf:type", sorg + "PostalAddress")
      has(addr, sorg + "addressLocality", "Paris")
      has(addr, sorg + "addressRegion", "IdF")
      has(addr, sorg + "postalCode", "75001")
      has(addr, sorg + "addressCountry", "France")
      has(addr, sorg + "streetAddress", "1 Rue X")

      // RSVP: only "attending" links; both invitees get Person + name
      has(ns + "ev1", sorg + "attendee", ns + "fr1")
      qs.exists(q => q.s == ns + "ev1" && q.p == sorg + "attendee" &&
        q.o == ns + "fr2") shouldBe false
      has(ns + "fr2", "rdf:type", "personal:Agent")
      has(ns + "fr2", sorg + "name", "Mary Somerville")

      // provenance
      has("facebook:acc1", "personal:documentOf", "source:fb1")
      qs.foreach(_.g shouldBe "facebook:acc1")
    }
  }

  it should "batch event detail requests in groups of 10" in {
    withServer(eventCount = 25) { (endpoint, batchCount) =>
      val r = FacebookGraph.sync(endpoint, "tok123", "facebook:acc1", "source:fb1")
      r.eventIds should have size 25
      batchCount() shouldBe 3 // ceil(25 / 10)
      // every event converted
      (1 to 25).foreach { i =>
        r.quads.exists(q =>
          q.s == FacebookGraph.namespace + s"ev$i" &&
            q.p == "rdf:type" && q.o == sorg + "Event") shouldBe true
      }
    }
  }

  it should "parse the reference's three-tier birthday lattice" in {
    FacebookGraph.convertBirthday("07/20/1969") shouldBe
      Some(("1969-07-20", "http://www.w3.org/2001/XMLSchema#date"))
    FacebookGraph.convertBirthday("1969") shouldBe
      Some(("1969", "http://www.w3.org/2001/XMLSchema#gYear"))
    FacebookGraph.convertBirthday("07/20") shouldBe
      Some(("--07-20", "http://www.w3.org/2001/XMLSchema#gMonthDay"))
    FacebookGraph.convertBirthday("13/45") shouldBe None
    FacebookGraph.convertBirthday("garbage") shouldBe None
  }

  it should "parse and strictly reject Graph API datetimes" in {
    FacebookGraph.convertIsoOffsetDateTime("2016-05-01T19:00:00+0200") shouldBe
      Some("2016-05-01T19:00:00+02:00")
    FacebookGraph.convertIsoOffsetDateTime("2016-05-01T19:00:00Z") shouldBe
      Some("2016-05-01T19:00:00Z")
    FacebookGraph.convertIsoOffsetDateTime("2016-02-30T19:00:00Z") shouldBe None
    FacebookGraph.convertIsoOffsetDateTime("not a date") shouldBe None
  }
}
