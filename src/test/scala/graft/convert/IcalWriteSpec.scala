package graft.convert

import graft.SparkSpec

/** The CalDAV write-back serializer: graph → VEVENT text that the
  * forward converter maps back to the same quads (the fidelity the PUT
  * leg needs — a pushed document must re-ingest as a no-op). */
class IcalWriteSpec extends SparkSpec {
  import spark.implicits._

  private val ics =
    """BEGIN:VCALENDAR
      |VERSION:2.0
      |BEGIN:VEVENT
      |UID:ev-1
      |SUMMARY:Board meeting, q3; planning
      |DESCRIPTION:Agenda TBD
      |DTSTART:20240101T100000Z
      |DTEND:20240101T111500Z
      |LOCATION:Room 5
      |GEO:48.85;2.35
      |ORGANIZER;CN=Alice:mailto:alice@example.com
      |ATTENDEE:mailto:bob@example.com
      |END:VEVENT
      |END:VCALENDAR""".stripMargin

  "IcalWrite.fromQuads" should "round-trip a converted VEVENT through the forward converter" in {
    val quads = Converters.ical(Seq(("d1", ics)).toDS()).collect().toSeq
    val out = IcalWrite.fromQuads(quads)
    out should include("UID:ev-1")
    out should include("SUMMARY:Board meeting\\, q3\\; planning")
    out should include("DTSTART:20240101T100000Z")
    out should include("DTEND:20240101T111500Z")
    out should include("LOCATION:Room 5")
    out should include("GEO:48.85;2.35")
    out should include("ORGANIZER;CN=Alice:mailto:alice@example.com")
    out should include("ATTENDEE:mailto:bob@example.com")
    // full fidelity: the regenerated document converts to the SAME quads
    val back = Converters.ical(Seq(("d1", out)).toDS()).collect().toSeq
    back.toSet shouldBe quads.toSet
  }

  it should "skip recurrence-expanded instances (derived data)" in {
    val rec =
      """BEGIN:VCALENDAR
        |BEGIN:VEVENT
        |UID:ev-r
        |SUMMARY:Standup
        |DTSTART:20240101T090000Z
        |DTEND:20240101T091500Z
        |RRULE:FREQ=DAILY;COUNT=3
        |END:VEVENT
        |END:VCALENDAR""".stripMargin
    val quads = Converters.ical(Seq(("d2", rec)).toDS()).collect().toSeq
    // three instances in the graph, ONE base VEVENT serialized
    quads.count(q => q.p == "rdf:type" && q.o.endsWith("Event")) shouldBe 3
    val out = IcalWrite.fromQuads(quads)
    "BEGIN:VEVENT".r.findAllIn(out).size shouldBe 1
    out should include("UID:ev-r")
  }
}
