package graft.convert

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ConvertersSpec extends SparkSpec {
  import spark.implicits._

  "Iri" should "mint stable name UUIDs and scheme IRIs" in {
    Iri.nameUuid("k1") shouldBe Iri.nameUuid("k1")
    Iri.nameUuid("k1") should not be Iri.nameUuid("k2")
    Iri.nameUuid("x") should fullyMatch regex
      "[0-9a-f]{8}-[0-9a-f]{4}-5[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}"
    Iri.mailto(" John@EXAMPLE.com ") shouldBe Some("mailto:John@example.com")
    Iri.splitEmail("no-at-sign") shouldBe None
    Iri.tel("+1 (555) 123-4567") shouldBe Some("tel:+15551234567")
    Iri.tel("not a phone") shouldBe None
    Iri.mid("<abc@host>") shouldBe "mid:abc%40host"
    Iri.geo(48.85, 2.3522) shouldBe "geo:48.85,2.3522"
  }

  "email converter" should "extract message, roles and agents" in {
    val raw =
      """Message-ID: <m1@host>
        |From: Alice <alice@example.com>
        |To: bob@example.com, Carol <carol@example.com>
        |Cc: dave@example.com
        |Subject: Hello
        | world
        |Date: Mon, 1 Jan 2024 10:00:00 +0000
        |In-Reply-To: <m0@host>
        |
        |Body text here.""".stripMargin
    val quads = Converters.email(Seq(("d1", raw)).toDS()).collect()
    val byPred = quads.groupBy(_.p).view.mapValues(_.map(_.o).toSet).toMap
    byPred("http://schema.org/headline") shouldBe Set("Hello world") // unfolded
    byPred("http://schema.org/sender").size shouldBe 1
    byPred("http://schema.org/recipient").size shouldBe 2
    byPred("personal:copyRecipient").size shouldBe 1
    byPred("personal:inReplyTo") shouldBe Set("mid:m0%40host")
    // message statements in the doc graph; agent descriptions in each
    // agent's own graph (reference context = personResource)
    quads.filter(_.s.startsWith("mid:")).map(_.g).toSet shouldBe Set("doc:d1")
    quads.filter(_.o == "personal:Agent").foreach(q => q.g shouldBe q.s)
    // same address in another message mints the same agent IRI
    val quads2 = Converters.email(Seq(("d2", "From: alice@example.com\n\n")).toDS()).collect()
    val senderIri1 = quads.find(_.p == "http://schema.org/sender").get.o
    val senderIri2 = quads2.find(_.p == "http://schema.org/sender").get.o
    senderIri1 shouldBe senderIri2
  }

  "ical converter" should "extract events with location, geo and attendees" in {
    val raw =
      """BEGIN:VCALENDAR
        |BEGIN:VEVENT
        |UID:e1
        |SUMMARY:Standup
        |DTSTART:20240101T100000Z
        |DTEND:20240101T101500Z
        |LOCATION:Office
        |GEO:48.85;2.35
        |ORGANIZER;CN=Alice:mailto:alice@example.com
        |ATTENDEE;CN=Bob:mailto:bob@example.com
        |END:VEVENT
        |END:VCALENDAR""".stripMargin
    val quads = Converters.ical(Seq(("c1", raw)).toDS()).collect()
    val byPred = quads.groupBy(_.p).view.mapValues(_.map(_.o).toSet).toMap
    byPred("http://schema.org/name") should contain("Standup")
    byPred("http://schema.org/startDate") shouldBe Set("2024-01-01T10:00:00Z")
    byPred("http://schema.org/endDate") shouldBe Set("2024-01-01T10:15:00Z")
    byPred("http://schema.org/geo") shouldBe Set("geo:48.85,2.35")
    byPred("http://schema.org/organizer").size shouldBe 1
    byPred("http://schema.org/attendee").size shouldBe 1
    byPred.keySet should contain("http://schema.org/location")
  }

  // ------------------- round-3 depth: MIME, RRULE/TZID, PHOTO/TEL types --

  "email converter" should "decode nested multipart with base64 and quoted-printable" in {
    // outer: multipart/mixed(text, multipart/alternative(plain-qp, html),
    // base64 text, attachment-to-skip); subject is an RFC 2047 word
    val raw = List(
      "Message-ID: <mm@host>",
      "From: =?UTF-8?B?QsOpYXRyaWNl?= <bea@example.com>",
      "Subject: =?UTF-8?Q?caf=C3=A9_plans?=",
      "Content-Type: multipart/mixed; boundary=\"outer\"",
      "",
      "preamble to ignore",
      "--outer",
      "Content-Type: multipart/alternative; boundary=\"inner\"",
      "",
      "--inner",
      "Content-Type: text/plain; charset=utf-8",
      "Content-Transfer-Encoding: quoted-printable",
      "",
      "Caf=C3=A9 at noon=",
      "?",
      "--inner",
      "Content-Type: text/html",
      "",
      "<b>Cafe at noon</b>",
      "--inner--",
      "--outer",
      "Content-Type: text/plain",
      "Content-Transfer-Encoding: base64",
      "",
      java.util.Base64.getEncoder.encodeToString(
        "see you there".getBytes("UTF-8")),
      "--outer",
      "Content-Type: text/plain",
      "Content-Disposition: attachment; filename=\"skip.txt\"",
      "",
      "attachment text must not appear",
      "--outer--",
      "epilogue").mkString("\r\n")
    val quads = Converters.email(Seq(("mm", raw)).toDS()).collect()
    val byPred = quads.groupBy(_.p).view.mapValues(_.map(_.o).toSet).toMap
    byPred("http://schema.org/headline") shouldBe Set("café plans") // decoded 2047
    // decoded body parts: the qp plain alternative (html skipped) + base64;
    // the attachment's text does not leak
    byPred("http://schema.org/text") shouldBe Set("Café at noon?", "see you there")
    // sender display name decoded from the encoded word
    byPred("http://schema.org/name") shouldBe Set("Béatrice")
  }

  it should "convert nested message/rfc822 parts via hasPart" in {
    val inner = List(
      "Message-ID: <orig@host>",
      "From: carol@example.com",
      "Subject: original",
      "",
      "the original text").mkString("\r\n")
    val raw = List(
      "Message-ID: <fwd@host>",
      "From: dave@example.com",
      "Subject: Fwd: original",
      "Content-Type: multipart/mixed; boundary=\"b\"",
      "",
      "--b",
      "Content-Type: text/plain",
      "",
      "see below",
      "--b",
      "Content-Type: message/rfc822",
      "",
      inner,
      "--b--").mkString("\r\n")
    val quads = Converters.email(Seq(("fw", raw)).toDS()).collect()
    val byPred = quads.groupBy(_.p).view.mapValues(_.map(_.o).toSet).toMap
    byPred("http://schema.org/hasPart") shouldBe Set("mid:orig%40host")
    byPred("http://schema.org/headline") shouldBe Set("Fwd: original", "original")
    byPred("http://schema.org/text") shouldBe Set("see below", "the original text")
    // the nested message's sender agent exists
    quads.filter(q => q.s == "mid:orig%40host" && q.p == "http://schema.org/sender")
      .length shouldBe 1
  }

  it should "drop the multipart epilogue after the close delimiter" in {
    val raw = List(
      "Message-ID: <ep@host>",
      "From: eve@example.com",
      "Subject: epilogue",
      "Content-Type: multipart/mixed; boundary=\"b\"",
      "",
      "preamble to be ignored",
      "--b",
      "Content-Type: text/plain",
      "",
      "real body",
      "--b--",
      "this epilogue must not leak into schema:text",
      "").mkString("\r\n")
    val quads = Converters.email(Seq(("ep", raw)).toDS()).collect()
    quads.filter(_.p == "http://schema.org/text").map(_.o).toSet shouldBe Set("real body")
  }

  "ical converter" should "normalize TZID-local datetimes to UTC" in {
    val raw =
      """BEGIN:VEVENT
        |UID:tz1
        |SUMMARY:Paris morning
        |DTSTART;TZID=Europe/Paris:20240312T093000
        |DTEND;TZID=Europe/Paris:20240312T103000
        |END:VEVENT""".stripMargin
    val quads = Converters.ical(Seq(("tz", raw)).toDS()).collect()
    val byPred = quads.groupBy(_.p).view.mapValues(_.map(_.o).toSet).toMap
    // CET (+01:00) in March before DST
    byPred("http://schema.org/startDate") shouldBe Set("2024-03-12T08:30:00Z")
    byPred("http://schema.org/endDate") shouldBe Set("2024-03-12T09:30:00Z")
    quads.find(_.p == "http://schema.org/startDate").get.oDt shouldBe
      graft.rdf.Quad.Xsd.dateTime
  }

  it should "expand RRULE into bounded instances with shifted start/end" in {
    val raw =
      """BEGIN:VEVENT
        |UID:rec1
        |SUMMARY:Weekly sync
        |DTSTART:20240101T100000Z
        |DTEND:20240101T103000Z
        |RRULE:FREQ=WEEKLY;COUNT=4
        |LOCATION:Room 1
        |END:VEVENT""".stripMargin
    val quads = Converters.ical(Seq(("rr", raw)).toDS()).collect()
    val starts = quads.filter(_.p == "http://schema.org/startDate").map(_.o).toSet
    starts shouldBe Set(
      "2024-01-01T10:00:00Z", "2024-01-08T10:00:00Z",
      "2024-01-15T10:00:00Z", "2024-01-22T10:00:00Z")
    val ends = quads.filter(_.p == "http://schema.org/endDate").map(_.o).toSet
    ends should contain("2024-01-22T10:30:00Z") // duration carried to instances
    // 4 distinct event IRIs, each typed and located
    quads.filter(_.p == "rdf:type").count(_.o == "http://schema.org/Event") shouldBe 4
    quads.filter(_.p == "http://schema.org/location").map(_.s).distinct.length shouldBe 4
    // the base instance keeps the plain uid IRI
    quads.map(_.s) should contain(Iri.entity("event", "rec1"))
  }

  it should "honor INTERVAL, UNTIL, BYDAY and the DST boundary" in {
    // biweekly: 3 instances until Feb 1
    val biweekly = Converters.ical(Seq(("i1",
      """BEGIN:VEVENT
        |UID:r2
        |DTSTART:20240102T090000Z
        |RRULE:FREQ=WEEKLY;INTERVAL=2;UNTIL=20240201T000000Z
        |END:VEVENT""".stripMargin)).toDS()).collect()
    biweekly.filter(_.p == "http://schema.org/startDate").map(_.o).toSet shouldBe
      Set("2024-01-02T09:00:00Z", "2024-01-16T09:00:00Z", "2024-01-30T09:00:00Z")
    // BYDAY Mon+Thu weekly
    val byday = Converters.ical(Seq(("i2",
      """BEGIN:VEVENT
        |UID:r3
        |DTSTART:20240101T080000Z
        |RRULE:FREQ=WEEKLY;BYDAY=MO,TH;COUNT=4
        |END:VEVENT""".stripMargin)).toDS()).collect()
    byday.filter(_.p == "http://schema.org/startDate").map(_.o).toSet shouldBe
      Set("2024-01-01T08:00:00Z", "2024-01-04T08:00:00Z",
        "2024-01-08T08:00:00Z", "2024-01-11T08:00:00Z")
    // zone-local recurrence across the DST switch keeps 09:00 Paris time:
    // +01:00 before Mar 31, +02:00 after -> UTC start shifts 08:00 -> 07:00
    val dst = Converters.ical(Seq(("i3",
      """BEGIN:VEVENT
        |UID:r4
        |DTSTART;TZID=Europe/Paris:20240325T090000
        |RRULE:FREQ=WEEKLY;COUNT=2
        |END:VEVENT""".stripMargin)).toDS()).collect()
    dst.filter(_.p == "http://schema.org/startDate").map(_.o).toSet shouldBe
      Set("2024-03-25T08:00:00Z", "2024-04-01T07:00:00Z")
  }

  "vcard converter" should "type TEL numbers and decode inline PHOTOs" in {
    val png = graft.multimodal.ImageHeaders.synthPng(12, 8)
    val b64 = java.util.Base64.getEncoder.encodeToString(png)
    val raw =
      s"""BEGIN:VCARD
         |VERSION:3.0
         |UID:card-p
         |FN:Pat Photo
         |TEL;TYPE=cell,voice:+1 555 000 2222
         |TEL;TYPE=work:+1 555 000 3333
         |PHOTO;ENCODING=b;TYPE=PNG:$b64
         |END:VCARD""".stripMargin
    val quads = Converters.vcard(Seq(("vp", raw)).toDS()).collect()
    val types = quads.filter(_.p == "rdf:type").groupBy(_.s).view
      .mapValues(_.map(_.o).toSet).toMap
    types("tel:+15550002222") shouldBe Set("personal:PhoneNumber", "personal:CellphoneNumber")
    types("tel:+15550003333") shouldBe Set("personal:PhoneNumber", "personal:WorkAddress")
    val photoIri = quads.find(_.p == "http://schema.org/image").get.o
    types(photoIri) should contain("http://schema.org/ImageObject")
    quads.find(q => q.s == photoIri && q.p == "http://schema.org/encodingFormat")
      .get.o shouldBe "image/png"
    // the photo bytes feed the multimodal pipeline and decode for real
    val photos = Converters.vcardPhotos(Seq(("vp", raw)).toDS())
    val desc = graft.multimodal.Multimodal.describeImages(photos, "photo", "bytes")
    val row = desc.collect().head
    row.getAs[String]("mime") shouldBe "image/png"
    row.getAs[Int]("width") shouldBe 12
    row.getAs[Int]("height") shouldBe 8
    row.getAs[String]("photo") shouldBe photoIri
  }

  "vcard converter" should "extract agent facets" in {
    val raw =
      """BEGIN:VCARD
        |VERSION:3.0
        |FN:John Smith
        |N:Smith;John;;;
        |EMAIL;TYPE=work:john@example.com
        |TEL;TYPE=cell:+1 555 000 1111
        |ORG:ACME
        |BDAY:1980-01-02
        |END:VCARD""".stripMargin
    val quads = Converters.vcard(Seq(("v1", raw)).toDS()).collect()
    val byPred = quads.groupBy(_.p).view.mapValues(_.map(_.o).toSet).toMap
    byPred("http://schema.org/name") shouldBe Set("John Smith")
    byPred("http://schema.org/givenName") shouldBe Set("John")
    byPred("http://schema.org/familyName") shouldBe Set("Smith")
    byPred("http://schema.org/email") shouldBe Set("mailto:john@example.com")
    byPred("http://schema.org/telephone") shouldBe Set("tel:+15550001111")
  }

  "ical/vcard property lines" should "honor quoted parameter values (r14 review)" in {
    // RFC 5545 §3.2: a quoted param value may contain ':', ';' and ',' —
    // pre-fix, indexOf(':') cut the line inside CN="http://…" and the
    // param split broke CN="Doe, John" at the comma
    val raw =
      """BEGIN:VEVENT
        |UID:qp1
        |DTSTART;TZID="Europe/Paris":20240325T090000
        |ATTENDEE;CN="Doe, John; Dr":mailto:jd@example.com
        |ORGANIZER;CN="http://weird":mailto:org@example.com
        |END:VEVENT""".stripMargin
    val quads = Converters.ical(Seq(("qp", raw)).toDS()).collect()
    // quoted TZID resolves (Paris is UTC+1 on Mar 25): 09:00 local = 08:00Z
    quads.filter(_.p == "http://schema.org/startDate").map(_.o).toSet shouldBe
      Set("2024-03-25T08:00:00Z")
    val names = quads.filter(_.p == "http://schema.org/name").map(_.o).toSet
    names should contain("Doe, John; Dr") // quotes stripped, commas kept
    names should contain("http://weird")
    quads.filter(_.p == "http://schema.org/attendee") should have length 1
    quads.filter(_.p == "http://schema.org/organizer") should have length 1
  }

  it should "split N at a separator after an escaped backslash" in {
    // `Smith\\;John` = family "Smith\" + given "John": the old lookbehind
    // read the ';' as escaped and merged both components
    val raw =
      """BEGIN:VCARD
        |VERSION:3.0
        |UID:bs1
        |FN:BS
        |N:Smith\\;John;;;
        |END:VCARD""".stripMargin
    val quads = Converters.vcard(Seq(("bs", raw)).toDS()).collect()
    val byPred = quads.groupBy(_.p).view.mapValues(_.map(_.o).toSet).toMap
    byPred("http://schema.org/familyName") shouldBe Set("Smith\\")
    byPred("http://schema.org/givenName") shouldBe Set("John")
  }

  it should "tolerate a malformed GEO instead of failing the task" in {
    val raw =
      """BEGIN:VEVENT
        |UID:geo-bad
        |SUMMARY:ok
        |GEO:not-a-number;2.35
        |END:VEVENT""".stripMargin
    val quads = Converters.ical(Seq(("gb", raw)).toDS()).collect()
    quads.filter(_.p == "http://schema.org/geo") shouldBe empty
    quads.filter(_.p == "http://schema.org/name").map(_.o).toSet shouldBe Set("ok")
  }

  "location history converter" should "scale E7 ints and group by day" in {
    val json =
      """{"locations":[
        |{"timestampMs":"1704103200000","latitudeE7":488566000,"longitudeE7":23522000,"accuracy":20},
        |{"timestampMs":"1704189600000","latitudeE7":488566000,"longitudeE7":23522000,"accuracy":20}
        |]}""".stripMargin.replaceAll("\n", "")
    val df = spark.read.json(Seq(json).toDS())
    val quads = Converters.locationHistory(spark, df)
    quads.select("g").distinct().as[String].collect().toSet shouldBe
      Set("doc:location:2024-01-01", "doc:location:2024-01-02")
    val geos = quads.where($"p" === "http://schema.org/geo")
      .select("o").as[String].collect().toSet
    geos shouldBe Set("geo:48.8566,2.3522")
    quads.where($"p" === "personal:uncertainty").count() shouldBe 2
  }
}
