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

  /** Split an address-list header at top-level commas (quoted display
    * names may contain commas: `"Doe, Jane" <j@d>`). */
  private def splitAddressList(v: String): Seq[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    val sb = new StringBuilder
    var inQuote = false
    v.foreach {
      case '"' => inQuote = !inQuote; sb += '"'
      case ',' if !inQuote => out += sb.toString; sb.clear()
      case c => sb += c
    }
    out += sb.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** Parse one address-list header value into (address, display name)
    * pairs; display names are RFC 2047-decoded and dropped when they just
    * repeat the address (the reference's EmailAddressNameConverter
    * filtering). */
  private def addresses(v: String): Seq[(String, Option[String])] =
    splitAddressList(v).flatMap { part =>
      val angled = "<([^>]+)>".r.findFirstMatchIn(part)
      val cand = angled.map(_.group(1)).getOrElse(part.trim)
      Iri.splitEmail(cand).map { case (l, d) =>
        val addr = s"$l@$d"
        val name = angled.map(m => part.substring(0, m.start)).map { raw =>
          Mime.decodeEncodedWords(raw).trim.stripPrefix("\"").stripSuffix("\"").trim
        }.filter(n => n.nonEmpty && !n.equalsIgnoreCase(addr))
        (addr, name)
      }
    }

  /** (docId, rawMessage) → quads: message node, agents per address role
    * (with decoded display names), decoded text/plain body parts, nested
    * message/rfc822 parts via schema:hasPart — the reference's full MIME
    * walk (`EmailMessageConverter.scala:40-158`: header statements,
    * per-address agents, multipart recursion, attachment skip, text
    * extraction), on the hand-rolled [[Mime]] parser. */
  def email(docs: Dataset[(String, String)]): Dataset[Quad] = {
    import docs.sparkSession.implicits._
    // statement-SET semantics, like the reference's StatementSet: the same
    // agent described from many messages collapses to one copy
    docs.flatMap { case (docId, raw) =>
      convertEmailMessage(Mime.parseMessage(raw), s"doc:$docId", docId, depth = 0)._2
    }.dropDuplicates()
  }

  /** One message entity → (message IRI, quads); recurses into nested
    * message/rfc822 parts (depth-capped — pathological nesting shouldn't
    * recurse unboundedly inside an executor task). */
  private def convertEmailMessage(
      msg: Mime.Part, g: String, fallbackKey: String, depth: Int): (String, Seq[Quad]) = {
    val h = msg.headers
    def first(k: String) = h.get(k).flatMap(_.headOption)
    val msgIri = first("message-id").map(Iri.mid)
      .getOrElse(Iri.entity("email", fallbackKey))
    val base = Seq(
      Some(quad(msgIri, "rdf:type", schemaOrg + "EmailMessage", Quad.IRI, g)),
      first("subject").map(s =>
        quad(msgIri, schemaOrg + "headline", Mime.decodeEncodedWords(s), Quad.LITERAL, g)),
      first("date").map(d => quad(msgIri, schemaOrg + "dateSent", d, Quad.LITERAL, g)),
      first("content-language").map(l =>
        quad(msgIri, schemaOrg + "inLanguage", l, Quad.LITERAL, g)),
      first("in-reply-to").map(r =>
        quad(msgIri, "personal:inReplyTo", Iri.mid(r), Quad.IRI, g))).flatten
    val roles = Seq(
      "from" -> (schemaOrg + "sender"),
      "to" -> (schemaOrg + "recipient"),
      "cc" -> "personal:copyRecipient",
      "bcc" -> "personal:blindCopyRecipient")
    // agent-describing statements live in the AGENT's own graph (the
    // reference adds them with context = personResource,
    // `EmailMessageConverter.scala:97-105`): the same address seen from
    // many messages converges on identical quads instead of per-document
    // copies that would duplicate BGP solutions
    val agents = roles.flatMap { case (header, pred) =>
      h.getOrElse(header, Nil).flatMap(addresses).flatMap { case (addr, name) =>
        val agentIri = Iri.entity("agent", addr.toLowerCase)
        Seq(
          quad(msgIri, pred, agentIri, Quad.IRI, g),
          quad(agentIri, "rdf:type", "personal:Agent", Quad.IRI, agentIri),
          quad(agentIri, schemaOrg + "email", Iri.mailto(addr).get, Quad.IRI, agentIri)) ++
          name.map(n => quad(agentIri, schemaOrg + "name", n, Quad.LITERAL, agentIri))
      }
    }
    // decoded body text (multipart-aware, attachments skipped)
    val bodyText = Mime.plainTextParts(msg)
      .map(_.trim).filter(_.nonEmpty)
      .map(t => quad(msgIri, schemaOrg + "text", t, Quad.LITERAL, g))
    // nested message/rfc822 parts → hasPart + recursive conversion
    val nested =
      if (depth >= 3) Nil
      else Mime.nestedMessages(msg).zipWithIndex.flatMap { case (inner, i) =>
        val (innerIri, innerQuads) =
          convertEmailMessage(inner, g, s"$fallbackKey/part$i", depth + 1)
        quad(msgIri, schemaOrg + "hasPart", innerIri, Quad.IRI, g) +: innerQuads
      }
    (msgIri, base ++ agents ++ bodyText ++ nested)
  }

  // ------------------------------------------------------------------- ical

  import java.time.{DayOfWeek, Duration => JDuration, LocalDate, LocalDateTime, ZonedDateTime, ZoneId, ZoneOffset}
  import java.time.format.DateTimeFormatter
  import java.time.temporal.{ChronoUnit, TemporalAdjusters}

  private val IcalDateTime = DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss")

  /** TZID-aware iCalendar date-time parse (RFC 5545 §3.3.5): the `Z` form
    * is UTC, the local form is resolved through the TZID parameter's zone
    * (DST-correct via java.time), a bare date is midnight in that zone.
    * The reference gets this from ical4j/biweekly (`ICalConverter.scala:
    * 139-160`); unknown zones and malformed values → None (tolerant). */
  private[convert] def parseIcalInstant(
      value: String, params: Map[String, String]): Option[ZonedDateTime] = {
    val zone: ZoneId = params.get("TZID").flatMap { z =>
      try Some(ZoneId.of(z)) catch { case _: Exception => None }
    }.getOrElse(ZoneOffset.UTC)
    val v = value.trim
    try {
      if (v.matches("\\d{8}T\\d{6}Z"))
        Some(LocalDateTime.parse(v.dropRight(1), IcalDateTime).atZone(ZoneOffset.UTC))
      else if (v.matches("\\d{8}T\\d{6}"))
        Some(LocalDateTime.parse(v, IcalDateTime).atZone(zone))
      else if (v.matches("\\d{8}"))
        Some(LocalDate.parse(v, DateTimeFormatter.BASIC_ISO_DATE).atStartOfDay(zone))
      else None
    } catch { case _: Exception => None }
  }

  private def fmtInstant(z: ZonedDateTime): String =
    DateTimeFormatter.ISO_INSTANT.format(z.toInstant.truncatedTo(ChronoUnit.SECONDS))

  /** RFC 5545 duration (supports the P<n>W week form Duration.parse lacks). */
  private[convert] def parseIcalDuration(v: String): Option[JDuration] =
    try Some(JDuration.parse(v)) catch {
      case _: Exception =>
        "^[+-]?P(\\d+)W$".r.findFirstMatchIn(v.trim)
          .map(m => JDuration.ofDays(m.group(1).toLong * 7))
    }

  private[convert] def parseRrule(v: String): Map[String, String] =
    v.split(";").toSeq.flatMap(_.split("=", 2) match {
      case Array(k, x) => Some(k.trim.toUpperCase -> x.trim)
      case _ => None
    }).toMap

  private val ByDayNames = Map(
    "MO" -> DayOfWeek.MONDAY, "TU" -> DayOfWeek.TUESDAY, "WE" -> DayOfWeek.WEDNESDAY,
    "TH" -> DayOfWeek.THURSDAY, "FR" -> DayOfWeek.FRIDAY, "SA" -> DayOfWeek.SATURDAY,
    "SU" -> DayOfWeek.SUNDAY)

  /** Bounded RRULE expansion (FREQ daily/weekly/monthly/yearly, INTERVAL,
    * COUNT, UNTIL, BYDAY for weekly): instance start times from DTSTART,
    * zone-aware (a weekly 09:00 Paris event stays 09:00 across DST).
    * Expansion is always capped by `maxInstances` and `horizonDays` so a
    * COUNT-less infinite rule cannot blow up an executor task. DTSTART is
    * always the first instance (RFC 5545 §3.8.5.3 note). */
  private[convert] def expandRrule(
      start: ZonedDateTime,
      rule: Map[String, String],
      maxInstances: Int = 100,
      horizonDays: Int = 730): Seq[ZonedDateTime] = {
    val interval = math.max(1, rule.get("INTERVAL").flatMap(_.toIntOption).getOrElse(1))
    val count = math.min(maxInstances,
      rule.get("COUNT").flatMap(_.toIntOption).getOrElse(Int.MaxValue))
    val until = rule.get("UNTIL").flatMap(u => parseIcalInstant(u, Map.empty)).map(_.toInstant)
    val horizon = start.plusDays(horizonDays.toLong).toInstant
    val byday = rule.get("BYDAY").map(_.split(",").toSeq.flatMap(d => ByDayNames.get(d.trim.toUpperCase)))
      .getOrElse(Nil)
    val candidates: Iterator[ZonedDateTime] = rule.getOrElse("FREQ", "").toUpperCase match {
      case "DAILY" => Iterator.from(0).map(k => start.plusDays(k.toLong * interval))
      case "WEEKLY" if byday.isEmpty =>
        Iterator.from(0).map(k => start.plusWeeks(k.toLong * interval))
      case "WEEKLY" =>
        val startMonday = start.toLocalDate.`with`(TemporalAdjusters.previousOrSame(DayOfWeek.MONDAY))
        Iterator.from(0).map(d => start.plusDays(d.toLong)).filter { z =>
          val weekIdx = ChronoUnit.WEEKS.between(startMonday,
            z.toLocalDate.`with`(TemporalAdjusters.previousOrSame(DayOfWeek.MONDAY)))
          (z.isEqual(start) || byday.contains(z.getDayOfWeek)) && weekIdx % interval == 0
        }
      case "MONTHLY" => Iterator.from(0).map(k => start.plusMonths(k.toLong * interval))
      case "YEARLY" => Iterator.from(0).map(k => start.plusYears(k.toLong * interval))
      case _ => Iterator.single(start)
    }
    candidates
      .takeWhile(z => !z.toInstant.isAfter(horizon) &&
        until.forall(u => !z.toInstant.isAfter(u)))
      .take(count)
      .toList
  }

  /** One content line → (NAME, params, value), quote-aware per RFC 5545
    * §3.1-3.2 / RFC 6350 §3.3: a param value may be double-quoted and then
    * legally contain ':', ';' and ',' (`ATTENDEE;CN="Doe, John":mailto:…`,
    * `CN="http://x"`), so the name/value colon and the param semicolons
    * must be found OUTSIDE quotes — the old `indexOf(':')`/`split(";")`
    * cut such lines mid-param (r14 review pass). Surrounding quotes are
    * stripped from param values (`TZID="America/New_York"` now resolves
    * instead of falling back to UTC). */
  /** RFC 6868 caret-escape decode for param values (`^^` → `^`, `^n` →
    * newline, `^'` → DQUOTE), the symmetric inverse of the writers'
    * encoding — a caret not starting a defined sequence is kept as-is,
    * per §4's leniency rule. Applied after quote stripping: the escapes
    * are defined for both quoted and unquoted param values. */
  private def caretDecode(v: String): String =
    if (v.indexOf('^') < 0) v
    else {
      val sb = new StringBuilder(v.length)
      var i = 0
      while (i < v.length) {
        val c = v.charAt(i)
        if (c == '^' && i + 1 < v.length) {
          v.charAt(i + 1) match {
            case '^' => sb += '^'; i += 2
            case 'n' => sb += '\n'; i += 2
            case '\'' => sb += '"'; i += 2
            case _ => sb += '^'; i += 1
          }
        } else { sb += c; i += 1 }
      }
      sb.toString
    }

  private def icalProps(block: String): Seq[(String, Map[String, String], String)] = {
    val unfolded = block.replaceAll("\r?\n[ \t]", "")
    unfolded.split("\r?\n").toSeq.flatMap { line =>
      var i = 0
      var inQ = false
      var colon = -1
      while (i < line.length && colon < 0) {
        val c = line.charAt(i)
        if (c == '"') inQ = !inQ
        else if (c == ':' && !inQ) colon = i
        i += 1
      }
      if (colon <= 0) None
      else {
        val lhs = line.substring(0, colon)
        val value = line.substring(colon + 1)
        val segs = scala.collection.mutable.ListBuffer[String]()
        val sb = new StringBuilder
        var q = false
        lhs.foreach { c =>
          if (c == '"') { q = !q; sb += c }
          else if (c == ';' && !q) { segs += sb.toString; sb.clear() }
          else sb += c
        }
        segs += sb.toString
        val params = segs.drop(1).flatMap { p =>
          p.split("=", 2) match {
            case Array(k, v) =>
              val unq =
                if (v.length >= 2 && v.startsWith("\"") && v.endsWith("\""))
                  v.substring(1, v.length - 1)
                else v
              Some(k.toUpperCase -> caretDecode(unq))
            case _ => None
          }
        }.toMap
        Some((segs.head.toUpperCase, params, value))
      }
    }
  }

  /** Typed xsd:dateTime literal quad. */
  private def dtQuad(s: String, p: String, o: String, g: String): Quad =
    Quad(s, p, o, Quad.LITERAL, Quad.Xsd.dateTime, null, g)

  /** RFC 5545 §3.3.11 / RFC 6350 §3.4 TEXT unescape, single
    * left-to-right pass: `\\`, `\;`, `\,`, `\n`/`\N`. Applied at
    * point-of-use on display values (never on structured values like N,
    * whose `;` separators must split FIRST). The write-back serializers
    * ([[VcardWrite]], [[IcalWrite]]) escape symmetrically. */
  /** Split a STRUCTURED value at unescaped ';' separators (RFC 6350 §3.3,
    * e.g. the N property): a ';' separates components unless preceded by
    * an ODD run of backslashes. The lookbehind `(?<!\\);` this replaces
    * misread `\\;` — an escaped BACKSLASH followed by a real separator
    * (family name ending in '\') — as an escaped ';', merging two
    * components (r14 review pass; the converter fuzz suite pins it). */
  private[convert] def splitStructured(v: String): Seq[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    val sb = new StringBuilder
    var i = 0
    while (i < v.length) {
      val c = v.charAt(i)
      if (c == '\\' && i + 1 < v.length) { sb += c; sb += v.charAt(i + 1); i += 2 }
      else if (c == ';') { out += sb.toString; sb.clear(); i += 1 }
      else { sb += c; i += 1 }
    }
    out += sb.toString
    out.toSeq
  }

  private[convert] def unescapeText(v: String): String = {
    val n = v.length
    val sb = new StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = v.charAt(i)
      if (c == '\\' && i + 1 < n) {
        v.charAt(i + 1) match {
          case 'n' | 'N' => sb.append('\n')
          case other => sb.append(other)
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** (docId, icsText) → Event/Place quads per VEVENT. TZID-parameterized
    * date-times are normalized to UTC xsd:dateTime; an RRULE expands to
    * its instances (bounded horizon), each a full Event keyed by
    * (uid, recurrence index) — the reference keys event resources by
    * (uid, recurrence-id, sequence) the same way
    * (`ICalConverter.scala:219-224`). */
  def ical(docs: Dataset[(String, String)]): Dataset[Quad] = {
    import docs.sparkSession.implicits._
    docs.flatMap { case (docId, raw) =>
      val g = s"doc:$docId"
      "(?s)BEGIN:VEVENT(.*?)END:VEVENT".r.findAllMatchIn(raw).toSeq.flatMap { m =>
        val props = icalProps(m.group(1))
        def firstProp(name: String) = props.find(_._1 == name)
        def firstVal(name: String) = firstProp(name).map(_._3)
        // UID is TEXT-valued: unescape it so the identity the write-back
        // serializer regenerates (it RE-escapes on write) survives a
        // parse→write→parse cycle for UIDs containing \; \, \\ or \N
        val uid = firstVal("UID").map(unescapeText).getOrElse(Iri.nameUuid(m.group(1)))
        val startZ = firstProp("DTSTART").flatMap(p => parseIcalInstant(p._3, p._2))
        val endZ = firstProp("DTEND").flatMap(p => parseIcalInstant(p._3, p._2))
        val duration = firstVal("DURATION").flatMap(parseIcalDuration)
          .orElse(for (s0 <- startZ; e0 <- endZ) yield JDuration.between(s0, e0))
        val starts: Seq[ZonedDateTime] =
          (firstVal("RRULE").map(parseRrule), startZ) match {
            case (Some(rule), Some(s0)) => expandRrule(s0, rule)
            case _ => startZ.toSeq
          }

        /** The property quads, targeted at one event instance IRI. */
        def instanceQuads(ev: String, start: Option[ZonedDateTime]): Seq[Quad] = {
          val base = Seq(
            Some(quad(ev, "rdf:type", schemaOrg + "Event", Quad.IRI, g)),
            // UID rides along so the write-back serializer ([[IcalWrite]])
            // can regenerate a stable VEVENT identity (base instances
            // only — recurrence expansions are derived data)
            (if (ev == Iri.entity("event", uid))
              Some(quad(ev, "personal:uid", uid, Quad.LITERAL, g)) else None),
            firstVal("SUMMARY").map(s =>
              quad(ev, schemaOrg + "name", unescapeText(s), Quad.LITERAL, g)),
            firstVal("DESCRIPTION").map(s =>
              quad(ev, schemaOrg + "description", unescapeText(s), Quad.LITERAL, g)),
            start.map(s0 => dtQuad(ev, schemaOrg + "startDate", fmtInstant(s0), g))
              .orElse(firstVal("DTSTART").map(s =>
                quad(ev, schemaOrg + "startDate", s, Quad.LITERAL, g))),
            (start, duration) match {
              case (Some(s0), Some(d)) =>
                Some(dtQuad(ev, schemaOrg + "endDate", fmtInstant(s0.plus(d)), g))
              case _ => firstVal("DTEND").map(e =>
                quad(ev, schemaOrg + "endDate", e, Quad.LITERAL, g))
            }).flatten
          val loc = firstVal("LOCATION").map(unescapeText).toSeq.flatMap { l =>
            val place = Iri.entity("place", l)
            Seq(quad(ev, schemaOrg + "location", place, Quad.IRI, g),
              quad(place, "rdf:type", schemaOrg + "Place", Quad.IRI, g),
              quad(place, schemaOrg + "name", l, Quad.LITERAL, g))
          }
          val geo = firstVal("GEO").toSeq.flatMap { gv =>
            gv.split(";") match {
              case Array(lat, lon) =>
                // tolerant like every other field: a malformed GEO on one
                // hostile document must drop the quad, not throw
                // NumberFormatException out of an executor task
                (lat.trim.toDoubleOption, lon.trim.toDoubleOption) match {
                  case (Some(la), Some(lo)) =>
                    Seq(quad(ev, schemaOrg + "geo", Iri.geo(la, lo), Quad.IRI, g))
                  case _ => Nil
                }
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
                  quad(agent, "rdf:type", "personal:Agent", Quad.IRI, g),
                  // the address itself, so write-back can regenerate the
                  // ORGANIZER/ATTENDEE lines (vCard conversion keeps it too)
                  quad(agent, schemaOrg + "email", s"mailto:$l@$d", Quad.IRI, g)) ++
                  params.get("CN").map(cn => quad(agent, schemaOrg + "name", cn, Quad.LITERAL, g))
              }
            }
          base ++ loc ++ geo ++ people
        }

        if (starts.isEmpty) instanceQuads(Iri.entity("event", uid), None)
        else starts.zipWithIndex.flatMap { case (s0, i) =>
          val ev =
            if (i == 0) Iri.entity("event", uid)
            else Iri.entity("event", s"$uid#rec$i")
          instanceQuads(ev, Some(s0))
        }
      }
    }
  }

  // ------------------------------------------------------------------ vcard

  /** The reference's TEL-type → class mapping
    * (`VCardConverter.scala:252-263`). */
  private val TelTypeClass = Map(
    "CELL" -> "personal:CellphoneNumber",
    "FAX" -> "personal:FaxNumber",
    "HOME" -> "personal:HomeAddress",
    "PREF" -> "personal:PreferredAddress",
    "WORK" -> "personal:WorkAddress")

  /** Decode one PHOTO property to (mediaType, bytes): inline base64
    * (ENCODING=b / ENCODING=BASE64 with a TYPE subtype, vCard 3.0) or a
    * data: URI (vCard 4.0). HTTP(S) URL photos are reference-only — no
    * bytes. The reference resolves the same three forms
    * (`VCardConverter.scala:214-230`). */
  private[convert] def photoData(
      params: Map[String, String], value: String): Option[(String, Array[Byte])] = {
    def b64(s: String): Option[Array[Byte]] =
      try Some(java.util.Base64.getMimeDecoder.decode(s.replaceAll("\\s", "")))
      catch { case _: IllegalArgumentException => None }
    if (value.startsWith("data:")) {
      "^data:([^;,]+)(;base64)?,(.*)$".r.findFirstMatchIn(value).flatMap { m =>
        if (m.group(2) == null) None else b64(m.group(3)).map((m.group(1), _))
      }
    } else if (params.get("ENCODING").exists(e =>
        e.equalsIgnoreCase("b") || e.equalsIgnoreCase("base64"))) {
      val mime = "image/" + params.getOrElse("TYPE", "jpeg").toLowerCase
      b64(value).map((mime, _))
    } else None
  }

  /** (docId, vcfText) → Agent quads per vCard: names, emails, typed
    * phones, photos (inline photos become ImageObject nodes keyed by
    * content; their bytes are exposed to the multimodal pipeline via
    * [[vcardPhotos]]).
    * @param defaultRegion region for national-format TEL values
    *        ([[Phone.telUri]]; the reference passes libphonenumber a
    *        configured default region the same way) */
  def vcard(docs: Dataset[(String, String)], defaultRegion: String): Dataset[Quad] =
    vcardImpl(docs, defaultRegion)

  def vcard(docs: Dataset[(String, String)]): Dataset[Quad] =
    vcardImpl(docs, "US")

  private def vcardImpl(docs: Dataset[(String, String)], defaultRegion: String): Dataset[Quad] = {
    import docs.sparkSession.implicits._
    docs.flatMap { case (docId, raw) =>
      val g = s"doc:$docId"
      "(?s)BEGIN:VCARD(.*?)END:VCARD".r.findAllMatchIn(raw).toSeq.flatMap { m =>
        val props = icalProps(m.group(1)) // same prop grammar
        def firstVal(name: String) = props.find(_._1 == name).map(_._3)
        // identity key on the UNESCAPED value: the write-back serializer
        // re-escapes canonically, so keying on the raw form would mint a
        // different agent IRI after a parse→write→parse cycle whenever the
        // input used a non-canonical escape (e.g. \N for newline)
        val key = firstVal("UID").map(unescapeText)
          .orElse(firstVal("FN").map(unescapeText))
          .getOrElse(Iri.nameUuid(m.group(1)))
        val agent = Iri.entity("agent", key)
        val base = Seq(
          Some(quad(agent, "rdf:type", "personal:Agent", Quad.IRI, g)),
          // UID rides along as a quad so the write-back serializer
          // ([[VcardWrite]]) can regenerate a stable vCard identity
          firstVal("UID").map(v =>
            quad(agent, "personal:uid", unescapeText(v), Quad.LITERAL, g)),
          firstVal("FN").map(v =>
            quad(agent, schemaOrg + "name", unescapeText(v), Quad.LITERAL, g)),
          firstVal("ORG").map(v =>
            quad(agent, schemaOrg + "worksFor", unescapeText(v), Quad.LITERAL, g)),
          firstVal("BDAY").map(v => quad(agent, schemaOrg + "birthDate", v, Quad.LITERAL, g))).flatten
        val n = firstVal("N").toSeq.flatMap { v =>
          // structural ';' split FIRST (escaped \; survives it), then
          // TEXT-unescape each component
          val parts = splitStructured(v).map(unescapeText)
          val family = parts.lift(0).filter(_.nonEmpty)
          val given = parts.lift(1).filter(_.nonEmpty)
          family.map(f => quad(agent, schemaOrg + "familyName", f, Quad.LITERAL, g)).toSeq ++
            given.map(gn => quad(agent, schemaOrg + "givenName", gn, Quad.LITERAL, g))
        }
        val emails = props.filter(_._1 == "EMAIL").flatMap(p => Iri.mailto(p._3))
          .map(m2 => quad(agent, schemaOrg + "email", m2, Quad.IRI, g))
        val tels = props.filter(_._1 == "TEL").flatMap { case (_, params, value) =>
          Phone.telUri(value, defaultRegion).orElse(Iri.tel(value)).toSeq.flatMap { t =>
            val types = params.get("TYPE").toSeq
              .flatMap(_.split(",").toSeq).map(_.trim.toUpperCase)
            Seq(quad(agent, schemaOrg + "telephone", t, Quad.IRI, g),
              quad(t, "rdf:type", "personal:PhoneNumber", Quad.IRI, g)) ++
              types.flatMap(TelTypeClass.get)
                .map(cls => quad(t, "rdf:type", cls, Quad.IRI, g))
          }
        }
        val photos = props.filter(_._1 == "PHOTO").flatMap { case (_, params, value) =>
          photoData(params, value) match {
            case Some((mime, bytes)) =>
              val photoIri = Iri.entity("photo", java.util.Base64.getEncoder.encodeToString(bytes))
              Seq(quad(agent, schemaOrg + "image", photoIri, Quad.IRI, g),
                quad(photoIri, "rdf:type", schemaOrg + "ImageObject", Quad.IRI, g),
                quad(photoIri, schemaOrg + "encodingFormat", mime, Quad.LITERAL, g))
            case None if value.startsWith("http") =>
              Seq(quad(agent, schemaOrg + "image", value, Quad.IRI, g),
                quad(value, "rdf:type", schemaOrg + "ImageObject", Quad.IRI, g))
            case None => Nil
          }
        }
        base ++ n ++ emails ++ tels ++ photos
      }
    }
  }

  /** Inline vCard photo bytes for the multimodal pipeline: one row per
    * decodable PHOTO, keyed by the same content-derived IRI the quads
    * carry — join on it to land decoded image features back on agents.
    * Feeds [[graft.multimodal.Multimodal.describeImages]] directly. */
  def vcardPhotos(docs: Dataset[(String, String)]): DataFrame = {
    import docs.sparkSession.implicits._
    docs.flatMap { case (_, raw) =>
      "(?s)BEGIN:VCARD(.*?)END:VCARD".r.findAllMatchIn(raw).toSeq.flatMap { m =>
        icalProps(m.group(1)).filter(_._1 == "PHOTO").flatMap { case (_, params, value) =>
          photoData(params, value).map { case (mime, bytes) =>
            (Iri.entity("photo", java.util.Base64.getEncoder.encodeToString(bytes)), mime, bytes)
          }
        }
      }
    }.toDF("photo", "mime", "bytes")
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
