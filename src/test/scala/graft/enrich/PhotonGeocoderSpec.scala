package graft.enrich

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.HttpServer
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The real Photon HTTP client against a local server serving canned
  * Photon GeoJSON (zero egress) — request shapes, feature parsing,
  * invalid-feature filtering, and the cache-first wiring into the
  * Geocoding enricher. */
class PhotonGeocoderSpec extends SparkSpec {
  import spark.implicits._

  private val photonJson =
    """{"type":"FeatureCollection","features":[
      |  {"type":"Feature",
      |   "geometry":{"type":"Point","coordinates":[2.3522,48.8566]},
      |   "properties":{"osm_id":17807753,"osm_type":"W","osm_key":"amenity",
      |     "osm_value":"cafe","name":"Cafe de Flore","street":"Boulevard Saint-Germain",
      |     "housenumber":"172","city":"Paris","postcode":"75006","country":"France"}},
      |  {"type":"Feature",
      |   "geometry":{"type":"Point","coordinates":[2.0,48.0]},
      |   "properties":{"name":"no osm provenance -> invalid"}}
      |]}""".stripMargin

  private def withServer[A](f: (String, () => Seq[String]) => A): A = {
    val requests = scala.collection.mutable.ListBuffer[String]()
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/", { ex =>
      requests.synchronized { requests += ex.getRequestURI.toString }
      val bytes = photonJson.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try f(s"http://localhost:${server.getAddress.getPort}",
      () => requests.synchronized(requests.toSeq))
    finally server.stop(0)
  }

  "PhotonGeocoder" should "parse features and drop invalid ones" in withServer { (url, reqs) =>
    val g = new PhotonGeocoder(url)
    val fs = g.direct("cafe de flore, paris")
    fs.length shouldBe 1 // the provenance-less feature is dropped
    val f = fs.head
    f.name shouldBe Some("Cafe de Flore")
    (f.lon, f.lat) shouldBe ((2.3522, 48.8566))
    f.street shouldBe Some("Boulevard Saint-Germain")
    f.houseNumber shouldBe Some("172")
    f.locality shouldBe Some("Paris")
    f.country shouldBe Some("France")
    f.iri shouldBe "http://www.openstreetmap.org/node/17807753"
    f.isValid shouldBe true
    reqs().head should startWith("/api?q=cafe+de+flore")
  }

  it should "hit /reverse with lon/lat and serialize the B7 cache shape" in
    withServer { (url, reqs) =>
      val g = new PhotonGeocoder(url)
      val fs = g.reverse(2.3522, 48.8566)
      fs.length shouldBe 1
      reqs().head shouldBe "/reverse?lon=2.3522&lat=48.8566"
      val json = fs.head.serialized
      json should include(""""point":{"longitude":2.3522,"latitude":48.8566}""")
      json should include(""""street":"Boulevard Saint-Germain"""")
      json should include(""""isValid":true""")
    }

  it should "drive Geocoding.geocodePlaces cache-first (one call per distinct miss)" in
    withServer { (url, reqs) =>
      val g = new PhotonGeocoder(url)
      val S = graft.convert.Converters.schemaOrg
      // two places sharing one name, one pre-cached place
      val quads = Seq(
        ("p1", "rdf:type", S + "Place"), ("p1", S + "name", "Cafe de Flore"),
        ("p2", "rdf:type", S + "Place"), ("p2", S + "name", "Cafe de Flore"),
        ("p3", "rdf:type", S + "Place"), ("p3", S + "name", "Cached Corner"))
        .map { case (s, p, o) => (s, p, o, 2.toByte, null: String, null: String, "g1") }
        .toDF("s", "p", "o", "oKind", "oDt", "oLang", "g")
      val cache = Seq(("Cached Corner", """{"name":"Cached Corner"}"""))
        .toDF("key", "value")
      val (diff, newCache) = Geocoding.geocodePlaces(quads, cache, g.lookupFn)
      val added = diff.added.select("s", "o").as[(String, String)].collect().toMap
      added.keySet shouldBe Set("p1", "p2", "p3")
      added("p1") should include("Cafe de Flore")
      added("p3") shouldBe """{"name":"Cached Corner"}"""
      // ONE http call despite two places sharing the missed name
      reqs().length shouldBe 1
      newCache.count() shouldBe 1
    }
}
