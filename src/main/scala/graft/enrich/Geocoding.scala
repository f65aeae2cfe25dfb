package graft.enrich

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.rdf.QuadDiff

/** Geocoding enrichers — the Spark shape of the reference's
  * PlacesGeocoderEnricher (`thymeflow/src/main/com/thymeflow/enricher/
  * PlacesGeocoderEnricher.scala:36-87`: geocode only places lacking
  * address links — the J6 semi-join guard — taking the first feature
  * only — W4) and EventsWithStaysGeocoderEnricher (reverse-geocode stay
  * coordinates). External calls go through [[CachedLookup]], so cost
  * scales with distinct cache misses, never with corpus size (T8).
  */
object Geocoding {

  val OutputGraph = "graft:geocoded"
  private val S = graft.convert.Converters.schemaOrg

  /** Forward-geocode named places that have no address yet.
    *
    * @param quads    store snapshot
    * @param cache    (key, value) geocode cache table
    * @param geocoder name -> serialized address (the external call; tests
    *                 pass a stub per FIXTURES.md B7)
    * @return (diff to apply, new cache rows to persist) */
  def geocodePlaces(
      quads: DataFrame,
      cache: DataFrame,
      geocoder: String => String): (QuadDiff, DataFrame) = {
    val places = quads.where(col("p") === "rdf:type" && col("o") === (S + "Place"))
      .select(col("s").as("place"))
    val withName = places.join(
      quads.where(col("p") === (S + "name")).select(col("s").as("place"), col("o").as("name")),
      "place")
    // J6 guard: skip places that already carry an address link
    val unaddressed = withName.join(
      quads.where(col("p") === (S + "address")).select(col("s").as("place")),
      Seq("place"), "left_anti")
    val looked = CachedLookup.lookup(unaddressed, "name", cache, geocoder)
    // W4: the reference keeps only the first geocoder feature; the cache
    // value here is already the single best feature
    val added = looked.resolved.where(col("value").isNotNull)
      .select(col("place").as("s"), lit(S + "address").as("p"),
        col("value").as("o"), lit(graft.rdf.Quad.LITERAL).as("oKind"),
        lit(null).cast("string").as("oDt"), lit(null).cast("string").as("oLang"),
        lit(OutputGraph).as("g"))
    (QuadDiff(added, added.limit(0)), looked.newCacheRows)
  }

  /** Reverse-geocode stays (coordinate-keyed cache; coordinates are
    * rounded to ~100 m before keying so nearby stays share cache hits,
    * mirroring the reference's point-keyed cache). */
  def reverseGeocodeStays(
      quads: DataFrame,
      cache: DataFrame,
      reverse: String => String): (QuadDiff, DataFrame) = {
    val stayGeo = quads.where(col("p") === "personal:geo" && col("g") === "graft:stays")
      .select(col("s").as("stay"),
        concat(
          round(regexp_extract(col("o"), "geo:([^,]+),(.+)", 1).cast("double"), 3),
          lit(","),
          round(regexp_extract(col("o"), "geo:([^,]+),(.+)", 2).cast("double"), 3)
        ).as("coord_key"))
    val unaddressed = stayGeo.join(
      quads.where(col("p") === (S + "address")).select(col("s").as("stay")),
      Seq("stay"), "left_anti")
    val looked = CachedLookup.lookup(unaddressed, "coord_key", cache, reverse)
    val added = looked.resolved.where(col("value").isNotNull)
      .select(col("stay").as("s"), lit(S + "address").as("p"),
        col("value").as("o"), lit(graft.rdf.Quad.LITERAL).as("oKind"),
        lit(null).cast("string").as("oDt"), lit(null).cast("string").as("oLang"),
        lit(OutputGraph).as("g"))
    (QuadDiff(added, added.limit(0)), looked.newCacheRows)
  }
}
