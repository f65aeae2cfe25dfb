package graft.convert

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.rdf.Quad

/** Source converters: one raw document → many quads, run as distributed
  * flatMaps (`mapPartitions`-style via Dataset.flatMap) so ingestion scales
  * with the file scan. Parsers are deliberately minimal hand-rolled
  * implementations of the public formats (RFC 2822/5322 headers, RFC 5545
  * iCalendar, RFC 6350 vCard, the Google Takeout location JSON layout);
  * they mirror the statement shapes of the reference's converter suite:
  *
  * - email: `core/src/main/com/thymeflow/sync/converter/
  *   EmailMessageConverter.scala:40-124` (message node, sender/recipient
  *   agents keyed by address, in-reply-to links)
  * - ical: `ICalConverter.scala:60-115` (event with start/end/name/
  *   location/organizer/attendee, geo from structured location)
  * - vcard: `VCardConverter.scala:37-264` (agent with names, emails via
  *   mailto, phones via tel)
  * - location history: `thymeflow/src/main/com/thymeflow/sync/converter/
  *   GoogleLocationHistoryConverter.scala:20-99` (E7 scaling, one document
  *   per day)
  */
object Converters {

  val schemaOrg = "http://schema.org/"

  private def quad(s: String, p: String, o: String, kind: Byte, g: String): Quad =
    Quad(s, p, o, kind, if (kind == Quad.LITERAL) Quad.Xsd.string else null, null, g)

  // ------------------------------------------------------------------ email

  /** Unfold RFC 5322 folded headers, return header map (first value wins
    * except address lists which append). */
  private def parseHeaders(raw: String): Map[String, List[String]] = {
    val headerPart = raw.split("\r?\n\r?\n", 2)(0)
    val unfolded = headerPart.replaceAll("\r?\n[ \t]+", " ")
    unfolded.split("\r?\n").toList
      .flatMap { line =>
        val idx = line.indexOf(':')
        if (idx <= 0) None
        else Some(line.substring(0, idx).trim.toLowerCase -> line.substring(idx + 1).trim)
      }
      .groupMap(_._1)(_._2)
  }

  private def addresses(v: String): Seq[String] =
    v.split(",").toSeq.flatMap { part =>
      val angled = "<([^>]+)>".r.findFirstMatchIn(part).map(_.group(1))
      val cand = angled.getOrElse(part.trim)
      Iri.splitEmail(cand).map { case (l, d) => s"$l@$d" }
    }

  /** (docId, rawMessage) → quads: message node + agents per address role. */
  def email(docs: Dataset[(String, String)]): Dataset[Quad] = {
    import docs.sparkSession.implicits._
    docs.flatMap { case (docId, raw) =>
      val g = s"doc:$docId"
      val h = parseHeaders(raw)
      def first(k: String) = h.get(k).flatMap(_.headOption)
      val msgIri = first("message-id").map(Iri.mid)
        .getOrElse(Iri.entity("email", docId))
      val base = Seq(
        Some(quad(msgIri, "rdf:type", schemaOrg + "EmailMessage", Quad.IRI, g)),
        first("subject").map(s => quad(msgIri, schemaOrg + "headline", s, Quad.LITERAL, g)),
        first("date").map(d => quad(msgIri, schemaOrg + "dateSent", d, Quad.LITERAL, g)),
        first("in-reply-to").map(r =>
          quad(msgIri, "personal:inReplyTo", Iri.mid(r), Quad.IRI, g))).flatten
      val roles = Seq(
        "from" -> (schemaOrg + "sender"),
        "to" -> (schemaOrg + "recipient"),
        "cc" -> "personal:copyRecipient",
        "bcc" -> "personal:blindCopyRecipient")
      val agents = roles.flatMap { case (header, pred) =>
        h.getOrElse(header, Nil).flatMap(addresses).flatMap { addr =>
          val agentIri = Iri.entity("agent", addr.toLowerCase)
          Seq(
            quad(msgIri, pred, agentIri, Quad.IRI, g),
            quad(agentIri, "rdf:type", "personal:Agent", Quad.IRI, g),
            quad(agentIri, schemaOrg + "email", Iri.mailto(addr).get, Quad.IRI, g))
        }
      }
      base ++ agents
    }
  }

  // ------------------------------------------------------------------- ical

  private def icalProps(block: String): Seq[(String, Map[String, String], String)] = {
    val unfolded = block.replaceAll("\r?\n[ \t]", "")
    unfolded.split("\r?\n").toSeq.flatMap { line =>
      val idx = line.indexOf(':')
      if (idx <= 0) None
      else {
        val lhs = line.substring(0, idx)
        val value = line.substring(idx + 1)
        val parts = lhs.split(";").toSeq
        val params = parts.drop(1).flatMap { p =>
          p.split("=", 2) match {
            case Array(k, v) => Some(k.toUpperCase -> v)
            case _ => None
          }
        }.toMap
        Some((parts.head.toUpperCase, params, value))
      }
    }
  }

  /** (docId, icsText) → Event/Place quads per VEVENT. */
  def ical(docs: Dataset[(String, String)]): Dataset[Quad] = {
    import docs.sparkSession.implicits._
    docs.flatMap { case (docId, raw) =>
      val g = s"doc:$docId"
      "(?s)BEGIN:VEVENT(.*?)END:VEVENT".r.findAllMatchIn(raw).toSeq.flatMap { m =>
        val props = icalProps(m.group(1))
        def firstVal(name: String) = props.find(_._1 == name).map(_._3)
        val uid = firstVal("UID").getOrElse(Iri.nameUuid(m.group(1)))
        val ev = Iri.entity("event", uid)
        val base = Seq(
          Some(quad(ev, "rdf:type", schemaOrg + "Event", Quad.IRI, g)),
          firstVal("SUMMARY").map(s => quad(ev, schemaOrg + "name", s, Quad.LITERAL, g)),
          firstVal("DESCRIPTION").map(s => quad(ev, schemaOrg + "description", s, Quad.LITERAL, g)),
          firstVal("DTSTART").map(s => quad(ev, schemaOrg + "startDate", s, Quad.LITERAL, g)),
          firstVal("DTEND").map(s => quad(ev, schemaOrg + "endDate", s, Quad.LITERAL, g))).flatten
        val loc = firstVal("LOCATION").toSeq.flatMap { l =>
          val place = Iri.entity("place", l)
          Seq(quad(ev, schemaOrg + "location", place, Quad.IRI, g),
            quad(place, "rdf:type", schemaOrg + "Place", Quad.IRI, g),
            quad(place, schemaOrg + "name", l, Quad.LITERAL, g))
        }
        val geo = firstVal("GEO").toSeq.flatMap { gv =>
          gv.split(";") match {
            case Array(lat, lon) =>
              Seq(quad(ev, schemaOrg + "geo", Iri.geo(lat.toDouble, lon.toDouble), Quad.IRI, g))
            case _ => Nil
          }
        }
        val people = props.filter(p => p._1 == "ORGANIZER" || p._1 == "ATTENDEE")
          .flatMap { case (name, params, value) =>
            Iri.splitEmail(value).toSeq.flatMap { case (l, d) =>
              val agent = Iri.entity("agent", s"$l@$d")
              val pred = if (name == "ORGANIZER") schemaOrg + "organizer"
                         else schemaOrg + "attendee"
              Seq(quad(ev, pred, agent, Quad.IRI, g),
                quad(agent, "rdf:type", "personal:Agent", Quad.IRI, g)) ++
                params.get("CN").map(cn => quad(agent, schemaOrg + "name", cn, Quad.LITERAL, g))
            }
          }
        base ++ loc ++ geo ++ people
      }
    }
  }

  // ------------------------------------------------------------------ vcard

  /** (docId, vcfText) → Agent quads per vCard. */
  def vcard(docs: Dataset[(String, String)]): Dataset[Quad] = {
    import docs.sparkSession.implicits._
    docs.flatMap { case (docId, raw) =>
      val g = s"doc:$docId"
      "(?s)BEGIN:VCARD(.*?)END:VCARD".r.findAllMatchIn(raw).toSeq.flatMap { m =>
        val props = icalProps(m.group(1)) // same prop grammar
        def firstVal(name: String) = props.find(_._1 == name).map(_._3)
        val key = firstVal("UID").orElse(firstVal("FN")).getOrElse(Iri.nameUuid(m.group(1)))
        val agent = Iri.entity("agent", key)
        val base = Seq(
          Some(quad(agent, "rdf:type", "personal:Agent", Quad.IRI, g)),
          firstVal("FN").map(v => quad(agent, schemaOrg + "name", v, Quad.LITERAL, g)),
          firstVal("ORG").map(v => quad(agent, schemaOrg + "worksFor", v, Quad.LITERAL, g)),
          firstVal("BDAY").map(v => quad(agent, schemaOrg + "birthDate", v, Quad.LITERAL, g))).flatten
        val n = firstVal("N").toSeq.flatMap { v =>
          val parts = v.split(";", -1)
          val family = parts.lift(0).filter(_.nonEmpty)
          val given = parts.lift(1).filter(_.nonEmpty)
          family.map(f => quad(agent, schemaOrg + "familyName", f, Quad.LITERAL, g)).toSeq ++
            given.map(gn => quad(agent, schemaOrg + "givenName", gn, Quad.LITERAL, g))
        }
        val emails = props.filter(_._1 == "EMAIL").flatMap(p => Iri.mailto(p._3))
          .map(m2 => quad(agent, schemaOrg + "email", m2, Quad.IRI, g))
        val tels = props.filter(_._1 == "TEL").flatMap(p => Iri.tel(p._3))
          .map(t => quad(agent, schemaOrg + "telephone", t, Quad.IRI, g))
        base ++ n ++ emails ++ tels
      }
    }
  }

  // ------------------------------------------- Google location history JSON

  /** Takeout-style JSON → location-observation quads, one provenance graph
    * per (source doc, day) — the reference's day-grouping (`:42-58`).
    * Runs as spark JSON parsing + explode, fully columnar. */
  def locationHistory(spark: SparkSession, df: DataFrame): DataFrame = {
    // expected schema: locations: array<struct<timestampMs string,
    //   latitudeE7 long, longitudeE7 long, accuracy long>>
    val exploded = df.select(explode(col("locations")).as("l"))
      .select(
        (col("l.timestampMs").cast("long") / 1000).cast("long").as("epoch_s"),
        (col("l.latitudeE7").cast("double") / 1e7).as("lat"),
        (col("l.longitudeE7").cast("double") / 1e7).as("lon"),
        col("l.accuracy").cast("double").as("accuracy"))
    val withDay = exploded
      .withColumn("day", date_format(timestamp_seconds(col("epoch_s")), "yyyy-MM-dd"))
      .withColumn("g", concat(lit("doc:location:"), col("day")))
      .withColumn("s", concat(lit("urn:graft:loc:"),
        sha1(concat_ws("|", col("epoch_s"), col("lat"), col("lon")))))
    val mk = (p: String, o: org.apache.spark.sql.Column, kind: Byte) =>
      struct(col("s"), lit(p).as("p"), o.cast("string").as("o"),
        lit(kind).as("oKind"),
        lit(if (kind == Quad.LITERAL) Quad.Xsd.string else null).cast("string").as("oDt"),
        lit(null).cast("string").as("oLang"), col("g"))
    withDay.select(explode(array(
      mk("rdf:type", lit("personal:Location"), Quad.IRI),
      mk(schemaOrg + "geo", concat(lit("geo:"), col("lat"), lit(","), col("lon")), Quad.IRI),
      mk("personal:time", timestamp_seconds(col("epoch_s")).cast("string"), Quad.LITERAL),
      mk("personal:uncertainty", col("accuracy"), Quad.LITERAL))).as("q"))
      .select(col("q.*"))
  }
}
