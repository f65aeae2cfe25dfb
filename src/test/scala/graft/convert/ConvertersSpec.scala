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
    quads.map(_.g).toSet shouldBe Set("doc:d1")
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
    byPred("http://schema.org/startDate") shouldBe Set("20240101T100000Z")
    byPred("http://schema.org/geo") shouldBe Set("geo:48.85,2.35")
    byPred("http://schema.org/organizer").size shouldBe 1
    byPred("http://schema.org/attendee").size shouldBe 1
    byPred.keySet should contain("http://schema.org/location")
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
