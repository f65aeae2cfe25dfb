package graft.convert

import java.time.Instant
import java.time.format.DateTimeFormatter
import java.time.ZoneOffset

import graft.rdf.Quad

/** Quads → iCalendar text: the CalDAV write-back serializer, the VEVENT
  * sibling of [[VcardWrite]] (reference push leg:
  * `core/src/main/com/thymeflow/sync/dav/BaseDavSynchronizer.scala:234`).
  * Inverse of [[Converters.ical]]'s predicate mapping for BASE event
  * instances (those carrying a `personal:uid` quad); RRULE-expanded
  * recurrence instances are derived data and do not serialize. Typed
  * xsd:dateTime start/end literals become UTC `...Z` forms; plain
  * literals (unparseable inputs kept verbatim by the converter) pass
  * through unchanged. */
object IcalWrite {

  private val schemaOrg = Converters.schemaOrg
  private val IcsUtc = DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'")
    .withZone(ZoneOffset.UTC)

  private def escape(v: String): String =
    // CR first: RFC 5545 content never carries raw CR — a write-back value
    // containing \r\n (e.g. from a SPARQL UPDATE literal) folds to the \n
    // escape instead of corrupting the content line
    v.replace("\r\n", "\n").replace("\r", "\n")
      .replace("\\", "\\\\").replace("\n", "\\n").replace(",", "\\,")
      .replace(";", "\\;")

  /** RFC 5545 §3.2 parameter value: quoted when it contains ':', ';' or
    * ','. DQUOTE/CR/LF cannot appear raw in a param value at all — they
    * are caret-escaped per RFC 6868 (`^^` `^n` `^'`), which
    * [[Converters]]' prop reader decodes symmetrically, so a CN carrying
    * a double quote or newline now survives parse→write→parse
    * graph-identically instead of being lossily sanitized (r14 ADVICE).
    * The unquoted-CN form this replaces corrupted the whole content line
    * for a CN like `Doe, John` (r14 review pass). */
  private def param(v: String): String = {
    val enc = v.replace("^", "^^")
      .replace("\r\n", "\n").replace("\r", "\n").replace("\n", "^n")
      .replace("\"", "^'")
    if (enc.exists(c => c == ':' || c == ';' || c == ',')) "\"" + enc + "\""
    else enc
  }

  private def icsInstant(iso: String, dt: String): String =
    if (dt == Quad.Xsd.dateTime) IcsUtc.format(Instant.parse(iso))
    else iso // converter kept the raw unparseable value — round it back

  /** Serialize every base `schema:Event` in one document graph's quads
    * to a VEVENT; events sort by IRI for deterministic output. */
  def fromQuads(quads: Seq[Quad]): String = {
    val bySubject = quads.groupBy(_.s)
    val events = quads.collect {
      case q if q.p == "rdf:type" && q.o == schemaOrg + "Event" => q.s
    }.distinct.sorted
      // base instances only: they carry the uid quad
      .filter(e => bySubject.getOrElse(e, Nil).exists(_.p == "personal:uid"))
    val sb = new StringBuilder("BEGIN:VCALENDAR\r\nVERSION:2.0\r\n")
    events.foreach { ev =>
      val props = bySubject.getOrElse(ev, Nil)
      def firstQ(p: String): Option[Quad] = props.find(_.p == p)
      sb ++= "BEGIN:VEVENT\r\n"
      firstQ("personal:uid").foreach(q => sb ++= s"UID:${escape(q.o)}\r\n")
      firstQ(schemaOrg + "name").foreach(q => sb ++= s"SUMMARY:${escape(q.o)}\r\n")
      firstQ(schemaOrg + "description")
        .foreach(q => sb ++= s"DESCRIPTION:${escape(q.o)}\r\n")
      firstQ(schemaOrg + "startDate")
        .foreach(q => sb ++= s"DTSTART:${icsInstant(q.o, q.oDt)}\r\n")
      firstQ(schemaOrg + "endDate")
        .foreach(q => sb ++= s"DTEND:${icsInstant(q.o, q.oDt)}\r\n")
      // location: the place node's name
      firstQ(schemaOrg + "location").foreach { loc =>
        bySubject.getOrElse(loc.o, Nil).find(_.p == schemaOrg + "name")
          .foreach(n => sb ++= s"LOCATION:${escape(n.o)}\r\n")
      }
      firstQ(schemaOrg + "geo").foreach { q =>
        // geo:LAT,LON IRI → GEO:LAT;LON
        val ll = q.o.stripPrefix("geo:").split(",")
        if (ll.length == 2) sb ++= s"GEO:${ll(0)};${ll(1)}\r\n"
      }
      def person(pred: String, line: String): Unit =
        props.filter(_.p == pred).foreach { pq =>
          val agent = bySubject.getOrElse(pq.o, Nil)
          agent.find(_.p == schemaOrg + "email").foreach { em =>
            val cn = agent.find(_.p == schemaOrg + "name")
              .map(n => s";CN=${param(n.o)}").getOrElse("")
            sb ++= s"$line$cn:${em.o}\r\n"
          }
        }
      person(schemaOrg + "organizer", "ORGANIZER")
      person(schemaOrg + "attendee", "ATTENDEE")
      sb ++= "END:VEVENT\r\n"
    }
    sb ++= "END:VCALENDAR\r\n"
    sb.toString
  }
}
