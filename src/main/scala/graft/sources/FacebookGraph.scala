package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.OffsetDateTime
import java.time.format.{DateTimeFormatter, DateTimeFormatterBuilder, ResolverStyle}
import java.time.chrono.IsoChronology
import java.util.Locale

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.convert.Iri
import graft.rdf.Quad

/** Facebook Graph API source (S8, the last inventory row): one-shot
  * profile + events sync against a Graph-API-shaped endpoint.
  *
  * Mirrors the reference's synchronizer protocol
  * (`core/src/main/com/thymeflow/sync/facebook/FacebookSynchronizer.scala:
  * 110-152`): one `/me` request carrying the profile fields plus
  * `events.limit(1000){id}` and `taggable_friends.limit(1000)`, then the
  * returned event ids fetched in BATCHES of 10 via the multi-id form
  * `/?ids=a,b,...&fields=...` — the API's documented batch-read shape, so
  * a thousand events cost ~100 requests, not 1000. Conversion semantics
  * follow `FacebookConverter.scala:30-180` (same types, predicates, RSVP
  * filter, date lattice), with three deliberate deviations, each noted at
  * the site: `rdf:type schema:ImageObject` goes on the IMAGE node (the
  * reference types the friend/event node — `FacebookConverter.scala:77,
  * 108` — a wrong-subject slip), gMonthDay birthdays use the canonical
  * `--MM-dd` lexical form (the reference formats `MM-ddd`, day-of-year —
  * `FacebookConverter.scala:233`), and the `/me` request asks for the
  * `birthday`/`bio` fields its converter reads (the reference requests
  * neither, so its own conversions could never fire).
  *
  * Like the reference (`FacebookSynchronizer.scala:64-70`), the source is
  * read-only: write-backs to facebook-namespace graphs are not supported.
  * All parsing is driver-side (one profile's worth of JSON); the returned
  * quads enter the standard pipeline as one named graph per account.
  */
object FacebookGraph {

  val namespace = "https://graph.facebook.com/"
  private val schemaOrg = "http://schema.org/"

  private val mapper = new ObjectMapper()

  case class FbSync(quads: Seq[Quad], eventIds: Seq[String], requests: Int)

  private def quad(s: String, p: String, o: String, kind: Byte, g: String,
      dt: String = null): Quad =
    Quad(s, p, o, kind, if (kind == Quad.LITERAL) dt else null, null, g)

  private def node(id: String): String = namespace + id

  // ---------------------------------------------------------------- sync

  /** One full sync: profile + friends + all events, batched. `endpoint`
    * is the API root (scheme://host[:port][/vX.Y]); specs point it at a
    * scripted local server. */
  def sync(endpoint: String, accessToken: String, graph: String,
      sourceIri: String,
      client: HttpClient = HttpClient.newHttpClient(),
      batchSize: Int = 10): FbSync = {
    require(batchSize > 0, "batchSize must be positive")
    val meFields = "about,age_range,email,first_name,last_name,gender," +
      "birthday,bio,education,hometown,updated_time," +
      "events.limit(1000){id},taggable_friends.limit(1000)"
    val meJson = get(client,
      s"$endpoint/me?access_token=${enc(accessToken)}&fields=${enc(meFields)}")
    val (meQuads, eventIds) = convertMe(meJson, graph)

    val eventFields = "id,attending_count,category,cover,declined_count," +
      "description,end_time,interested_count,maybe_count,name,noreply_count," +
      "owner,place,start_time,ticket_uri,timezone,type,updated_time," +
      "attending.limit(100),declined.limit(100),interested.limit(100)," +
      "maybe.limit(100),noreply.limit(100)"
    var requests = 1
    val eventQuads = eventIds.grouped(batchSize).flatMap { ids =>
      requests += 1
      val json = get(client, s"$endpoint/?access_token=${enc(accessToken)}" +
        s"&ids=${enc(ids.mkString(","))}&fields=${enc(eventFields)}")
      convertEventsBatch(json, graph)
    }.toSeq

    val provenance = quad(graph, "personal:documentOf", sourceIri, Quad.IRI, graph)
    FbSync((meQuads ++ eventQuads :+ provenance).distinct, eventIds, requests)
  }

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")

  private def get(client: HttpClient, url: String): String = {
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    // Redact the query string on failure: the access token travels as a
    // query parameter and must not reach logs or stack traces.
    require(resp.statusCode() == 200,
      s"Graph API GET ${URI.create(url).getPath} returned ${resp.statusCode()}")
    resp.body()
  }

  // ---------------------------------------------------------- converters

  /** `/me` response → (quads, event ids). */
  private[sources] def convertMe(json: String, g: String): (Seq[Quad], Seq[String]) = {
    val me = mapper.readTree(json)
    val id = text(me, "id").getOrElse(sys.error("me response has no id"))
    val meNode = node(id)
    val out = Seq.newBuilder[Quad]
    out += quad(meNode, "rdf:type", "personal:Agent", Quad.IRI, g)
    out += quad(meNode, "rdf:type", schemaOrg + "Person", Quad.IRI, g)
    text(me, "birthday").flatMap(convertBirthday).foreach { case (lex, dt) =>
      out += quad(meNode, schemaOrg + "birthDate", lex, Quad.LITERAL, g, dt)
    }
    text(me, "first_name").foreach(v =>
      out += quad(meNode, schemaOrg + "givenName", v, Quad.LITERAL, g))
    text(me, "last_name").foreach(v =>
      out += quad(meNode, schemaOrg + "familyName", v, Quad.LITERAL, g))
    text(me, "gender").foreach(v =>
      out += quad(meNode, schemaOrg + "gender", v, Quad.LITERAL, g))
    text(me, "email").flatMap(Iri.mailto).foreach(mailto =>
      out += quad(meNode, schemaOrg + "email", mailto, Quad.IRI, g))
    text(me, "bio").foreach(v =>
      out += quad(meNode, schemaOrg + "description", v, Quad.LITERAL, g))

    dataArray(me, "taggable_friends").foreach { friend =>
      text(friend, "id").foreach { fid =>
        val fNode = node(fid)
        out += quad(fNode, "rdf:type", "personal:Agent", Quad.IRI, g)
        out += quad(fNode, "rdf:type", schemaOrg + "Person", Quad.IRI, g)
        text(friend, "name").foreach(n =>
          out += quad(fNode, schemaOrg + "name", n, Quad.LITERAL, g))
        val url = Option(friend.get("picture")).flatMap(p => text(p, "data", "url"))
        url.foreach { u =>
          out += quad(fNode, schemaOrg + "image", u, Quad.IRI, g)
          // deviation: the image IRI is the ImageObject (the reference
          // types the friend node, FacebookConverter.scala:77)
          out += quad(u, "rdf:type", schemaOrg + "ImageObject", Quad.IRI, g)
        }
      }
    }
    val eventIds = dataArray(me, "events").flatMap(e => text(e, "id"))
    (out.result(), eventIds)
  }

  /** Multi-id batch response `{eventId: {...event...}, ...}` → quads. */
  private[sources] def convertEventsBatch(json: String, g: String): Seq[Quad] = {
    val root = mapper.readTree(json)
    val out = Seq.newBuilder[Quad]
    val it = root.properties().iterator()
    while (it.hasNext) out ++= convertEvent(it.next().getValue, g)
    out.result()
  }

  private def convertEvent(ev: JsonNode, g: String): Seq[Quad] = {
    val id = text(ev, "id").getOrElse(return Nil)
    val evNode = node(id)
    val out = Seq.newBuilder[Quad]
    out += quad(evNode, "rdf:type", schemaOrg + "Event", Quad.IRI, g)
    text(ev, "start_time").flatMap(convertIsoOffsetDateTime).foreach(v =>
      out += quad(evNode, schemaOrg + "startDate", v, Quad.LITERAL, g,
        Quad.Xsd.dateTime))
    text(ev, "end_time").flatMap(convertIsoOffsetDateTime).foreach(v =>
      out += quad(evNode, schemaOrg + "endDate", v, Quad.LITERAL, g,
        Quad.Xsd.dateTime))
    text(ev, "description").foreach(v =>
      out += quad(evNode, schemaOrg + "description", v, Quad.LITERAL, g))
    text(ev, "name").foreach(v =>
      out += quad(evNode, schemaOrg + "name", v, Quad.LITERAL, g))
    text(ev, "cover", "source").foreach { src =>
      out += quad(evNode, schemaOrg + "image", src, Quad.IRI, g)
      // deviation: type on the image node (reference types the event,
      // FacebookConverter.scala:108)
      out += quad(src, "rdf:type", schemaOrg + "ImageObject", Quad.IRI, g)
    }

    Option(ev.get("place")).foreach { place =>
      val placeNode = text(place, "id") match {
        case Some(pid) => node(pid)
        case None => "_:fbplace-" + id // deterministic per event
      }
      val kind = if (placeNode.startsWith("_:")) Quad.BNODE else Quad.IRI
      out += quad(evNode, schemaOrg + "location", placeNode, kind, g)
      out += quad(placeNode, "rdf:type", schemaOrg + "Place", Quad.IRI, g)
      text(place, "name").foreach(n =>
        out += quad(placeNode, schemaOrg + "name", n, Quad.LITERAL, g))
      Option(place.get("location")).foreach { loc =>
        (num(loc, "latitude"), num(loc, "longitude")) match {
          case (Some(lat), Some(lon)) =>
            out += quad(placeNode, schemaOrg + "geo", Iri.geo(lat, lon), Quad.IRI, g)
          case _ =>
        }
        val street = text(loc, "street")
        val city = text(loc, "city")
        val zip = text(loc, "zip")
        val country = text(loc, "country")
        // the reference's region merge order: state then region
        // (FacebookConverter.scala:160-163)
        val region = Seq(text(loc, "state"), text(loc, "region")).flatten match {
          case Seq() => None
          case v => Some(v.mkString(" "))
        }
        if (Seq(street, city, zip, country, region).exists(_.isDefined)) {
          val key = Seq(street, city, region, zip, country)
            .map(_.getOrElse("")).mkString("\u0000")
          val addr = Iri.entity("address", key)
          out += quad(placeNode, schemaOrg + "address", addr, Quad.IRI, g)
          out += quad(addr, "rdf:type", schemaOrg + "PostalAddress", Quad.IRI, g)
          street.foreach(v =>
            out += quad(addr, schemaOrg + "streetAddress", v, Quad.LITERAL, g))
          city.foreach(v =>
            out += quad(addr, schemaOrg + "addressLocality", v, Quad.LITERAL, g))
          region.foreach(v =>
            out += quad(addr, schemaOrg + "addressRegion", v, Quad.LITERAL, g))
          zip.foreach(v =>
            out += quad(addr, schemaOrg + "postalCode", v, Quad.LITERAL, g))
          country.foreach(v =>
            out += quad(addr, schemaOrg + "addressCountry", v, Quad.LITERAL, g))
        }
      }
    }

    // invitees across all five RSVP buckets get Agent/Person/name quads;
    // only rsvp_status == "attending" links to the event
    // (FacebookConverter.scala:117-124)
    Seq("attending", "declined", "interested", "maybe", "noreply").foreach { bucket =>
      dataArray(ev, bucket).foreach { inv =>
        for (pid <- text(inv, "id"); name <- text(inv, "name")) {
          val pNode = node(pid)
          out += quad(pNode, "rdf:type", "personal:Agent", Quad.IRI, g)
          out += quad(pNode, "rdf:type", schemaOrg + "Person", Quad.IRI, g)
          out += quad(pNode, schemaOrg + "name", name, Quad.LITERAL, g)
          if (text(inv, "rsvp_status").contains("attending"))
            out += quad(evNode, schemaOrg + "attendee", pNode, Quad.IRI, g)
        }
      }
    }
    out.result()
  }

  // ------------------------------------------------------------- parsing

  private def text(n: JsonNode, path: String*): Option[String] = {
    var cur = n
    for (p <- path) {
      if (cur == null) return None
      cur = cur.get(p)
    }
    if (cur == null || cur.isNull) None else Some(cur.asText())
  }

  private def num(n: JsonNode, field: String): Option[Double] = {
    val v = n.get(field)
    if (v == null || !v.isNumber) None else Some(v.asDouble())
  }

  private def dataArray(n: JsonNode, field: String): Seq[JsonNode] = {
    val d = Option(n.get(field)).map(_.get("data")).orNull
    if (d == null || !d.isArray) Nil
    else (0 until d.size).map(d.get)
  }

  /** The reference's three-tier birthday lattice
    * (`FacebookConverter.scala:225-246`): MM/dd/yyyy → xsd:date,
    * yyyy → xsd:gYear, MM/dd → xsd:gMonthDay. Returns (lexical,
    * datatype IRI). gMonthDay uses the canonical `--MM-dd` form. */
  private[sources] def convertBirthday(s: String): Option[(String, String)] = {
    val xsd = "http://www.w3.org/2001/XMLSchema#"
    s match {
      case FullDate(mm, dd, yyyy) if validMd(mm.toInt, dd.toInt) =>
        Some((f"${yyyy.toInt}%04d-${mm.toInt}%02d-${dd.toInt}%02d", xsd + "date"))
      case YearOnly(yyyy) => Some((f"${yyyy.toInt}%04d", xsd + "gYear"))
      case MonthDay(mm, dd) if validMd(mm.toInt, dd.toInt) =>
        Some((f"--${mm.toInt}%02d-${dd.toInt}%02d", xsd + "gMonthDay"))
      case _ => None
    }
  }
  private val FullDate = """(\d{1,2})/(\d{1,2})/(\d{4})""".r
  private val YearOnly = """(\d{4})""".r
  private val MonthDay = """(\d{1,2})/(\d{1,2})""".r
  private def validMd(m: Int, d: Int): Boolean =
    m >= 1 && m <= 12 && d >= 1 && d <= 31

  /** Strict ISO offset datetime (`+HHmm` or `Z` offsets, the API's wire
    * form) reformatted with a colonized offset, the reference's output
    * shape (`FacebookConverter.scala:186-210`). */
  private[sources] def convertIsoOffsetDateTime(s: String): Option[String] =
    try {
      Some(OffsetDateTime.parse(s, WireFormat).format(OutFormat))
    } catch { case _: java.time.format.DateTimeParseException => None }

  private val WireFormat = new DateTimeFormatterBuilder()
    .parseCaseInsensitive()
    .append(DateTimeFormatter.ISO_LOCAL_DATE_TIME)
    .appendOffset("+HHmm", "Z")
    .toFormatter(Locale.ROOT)
    .withResolverStyle(ResolverStyle.STRICT)
    .withChronology(IsoChronology.INSTANCE)

  private val OutFormat = new DateTimeFormatterBuilder()
    .append(DateTimeFormatter.ISO_LOCAL_DATE)
    .appendLiteral('T')
    .appendPattern("HH:mm:ss")
    .optionalStart()
    .appendFraction(java.time.temporal.ChronoField.NANO_OF_SECOND, 0, 9, true)
    .optionalEnd()
    .appendOffset("+HH:MM", "Z")
    .toFormatter(Locale.ROOT)
}
