package graft.enrich

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.URLEncoder
import java.time.Duration

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** One geocoder feature — the reference's SimpleFeature + Photon source
  * (`thymeflow/src/main/com/thymeflow/spatial/geocoding/photon/
  * Photon.scala`, `SimpleFeature`): a point, a structured address, and
  * OSM provenance. */
final case class GeoFeature(
    name: Option[String],
    lon: Double,
    lat: Double,
    houseNumber: Option[String],
    street: Option[String],
    locality: Option[String],
    postalCode: Option[String],
    region: Option[String],
    country: Option[String],
    osmId: Long,
    osmType: String,
    osmKey: String,
    osmValue: String) {

  /** The reference's validity rule (`Photon.scala:9-11`). */
  def isValid: Boolean =
    osmId != -1 && osmKey.nonEmpty && osmValue.nonEmpty && osmType.nonEmpty

  def iri: String = "http://www.openstreetmap.org/node/" + osmId

  /** FIXTURES.md B7 cache-value layout (the reference's MapDB cache
    * serializes the same shape). */
  def serialized: String = {
    val m = new ObjectMapper()
    val root = m.createObjectNode()
    name.foreach(root.put("name", _))
    val pt = root.putObject("point")
    pt.put("longitude", lon); pt.put("latitude", lat)
    val addr = root.putObject("address")
    houseNumber.foreach(addr.put("houseNumber", _))
    street.foreach(addr.put("street", _))
    locality.foreach(addr.put("locality", _))
    postalCode.foreach(addr.put("postalCode", _))
    region.foreach(addr.put("region", _))
    country.foreach(addr.put("country", _))
    val src = root.putObject("source")
    src.put("isValid", isValid); src.put("iri", iri)
    m.writeValueAsString(root)
  }
}

/** REAL Photon geocoder HTTP client — the reference's akka-http Geocoder
  * (`thymeflow/src/main/com/thymeflow/spatial/geocoding/photon/
  * Geocoder.scala:26-120`: /api for direct, /reverse for reverse,
  * GeoJSON features with osm_* provenance, invalid features dropped) on
  * the JDK HttpClient + Spark's bundled Jackson (zero new deps).
  *
  * Intended use is cache-first ([[CachedLookup]] / [[Geocoding]]): the
  * driver-side functions [[lookupFn]]/[[reverseFn]] run once per DISTINCT
  * cache miss, never per row — external-call volume is bounded by key
  * cardinality regardless of corpus size (T8).
  */
final class PhotonGeocoder(baseUrl: String,
    timeout: Duration = Duration.ofSeconds(10)) extends Serializable {

  // the resolver functions ride inside Spark closures (CachedLookup maps
  // them over the distinct-miss rows): only (baseUrl, timeout) serialize,
  // the client re-materializes lazily wherever the function lands
  @transient private lazy val client =
    HttpClient.newBuilder().connectTimeout(timeout).build()
  @transient private lazy val mapper = new ObjectMapper()

  private def getJson(pathAndQuery: String): Option[JsonNode] = {
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(baseUrl.stripSuffix("/") + pathAndQuery))
        .timeout(timeout).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200) None
    else Option(mapper.readTree(resp.body()))
  }

  /** Forward geocoding: GET /api?q=...[&lon=&lat= bias]. */
  def direct(query: String, bias: Option[(Double, Double)] = None): Seq[GeoFeature] = {
    val biasQ = bias.map { case (lon, lat) => s"&lon=$lon&lat=$lat" }.getOrElse("")
    getJson(s"/api?q=${URLEncoder.encode(query, "UTF-8")}$biasQ")
      .map(parseResponse).getOrElse(Nil)
  }

  /** Reverse geocoding: GET /reverse?lon=...&lat=... */
  def reverse(lon: Double, lat: Double): Seq[GeoFeature] =
    getJson(s"/reverse?lon=$lon&lat=$lat").map(parseResponse).getOrElse(Nil)

  /** Parse a Photon GeoJSON FeatureCollection; invalid features (missing
    * OSM provenance) are dropped like the reference's. */
  private[enrich] def parseResponse(root: JsonNode): Seq[GeoFeature] = {
    val features = root.path("features")
    if (!features.isArray) return Nil
    (0 until features.size).flatMap { i =>
      val f = features.get(i)
      val coords = f.path("geometry").path("coordinates")
      if (!coords.isArray || coords.size < 2) None
      else {
        val p = f.path("properties")
        def str(k: String): Option[String] =
          Option(p.get(k)).filter(_.isTextual).map(_.asText)
        val feature = GeoFeature(
          name = str("name"),
          lon = coords.get(0).asDouble,
          lat = coords.get(1).asDouble,
          houseNumber = str("housenumber"),
          street = str("street"),
          locality = str("city"),
          postalCode = str("postcode"),
          region = str("state"),
          country = str("country"),
          osmId = Option(p.get("osm_id")).filter(_.isNumber).map(_.asLong).getOrElse(-1L),
          osmType = str("osm_type").getOrElse(""),
          osmKey = str("osm_key").getOrElse(""),
          osmValue = str("osm_value").getOrElse(""))
        if (feature.isValid) Some(feature) else None
      }
    }
  }

  /** Cache-miss resolver for [[Geocoding.geocodePlaces]]: first feature
    * (W4), serialized; null on no result (the null row is cached,
    * so a no-result key is never re-queried). */
  def lookupFn: String => String =
    q => direct(q).headOption.map(_.serialized).orNull

  /** Cache-miss resolver for [[Geocoding.reverseGeocodeStays]] — the key
    * is the rounded "lat,lon" the enricher builds. */
  def reverseFn: String => String = key =>
    key.split(",") match {
      case Array(lat, lon) =>
        try reverse(lon.toDouble, lat.toDouble).headOption.map(_.serialized).orNull
        catch { case _: NumberFormatException => null }
      case _ => null
    }
}
