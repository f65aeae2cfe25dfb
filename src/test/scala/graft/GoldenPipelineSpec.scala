package graft

import java.nio.file.Files

import graft.convert.Converters
import graft.enrich.{EventStayMatch, Resolution}
import graft.rdf.{QuadDiff, Views}
import graft.spatial.StayExtraction
import graft.streaming.QuadPipeline
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Golden end-to-end pipeline test (FIXTURES.md §B): authored personal-data
  * fixtures → converters → replace-graph upsert → enricher chain in the
  * reference's order (IFP inference → stay extraction → event-stay
  * matching) → golden assertions on the final store. Mirrors the
  * reference's dataflow `Thymeflow.scala:56-63` end-to-end.
  */
class GoldenPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val S = Converters.schemaOrg

  // ---- B3: emails; alice appears with two display spellings + shared addr
  private val emails = Seq(
    ("m1",
      """Message-ID: <m1@host>
        |From: Alice Wonders <alice@example.com>
        |To: bob@example.com
        |Subject: lunch at the office?
        |Date: Mon, 1 Jan 2024 09:00:00 +0000
        |
        |body""".stripMargin),
    ("m2",
      """Message-ID: <m2@host>
        |From: bob@example.com
        |To: Wondrs Alice <alice@example.com>
        |Subject: Re: lunch
        |In-Reply-To: <m1@host>
        |Date: Mon, 1 Jan 2024 09:30:00 +0000
        |
        |ok!""".stripMargin),
    // nested multipart + base64 — exercises the full MIME walk end-to-end
    ("m3", List(
      "Message-ID: <m3@host>",
      "From: =?UTF-8?B?QsOpYXRyaWNl?= <bea@example.com>",
      "To: alice@example.com",
      "Subject: agenda",
      "Date: Mon, 1 Jan 2024 10:00:00 +0000",
      "Content-Type: multipart/alternative; boundary=\"p\"",
      "",
      "--p",
      "Content-Type: text/plain; charset=utf-8",
      "Content-Transfer-Encoding: base64",
      "",
      java.util.Base64.getEncoder.encodeToString(
        "menu: café + tartines".getBytes("UTF-8")),
      "--p",
      "Content-Type: text/html",
      "",
      "<p>html alternative (must not be emitted)</p>",
      "--p--").mkString("\r\n")))

  // ---- B4: vCard sharing alice's email (drives the IFP merge)
  private val vcard =
    """BEGIN:VCARD
      |VERSION:3.0
      |UID:card-alice
      |FN:Alice W.
      |N:Wonders;Alice;;;
      |EMAIL:alice@example.com
      |TEL:+33 1 23 45 67 89
      |END:VCARD""".stripMargin

  // ---- B5: events — one overlapping the office stay, one far away
  private val ics =
    """BEGIN:VCALENDAR
      |BEGIN:VEVENT
      |UID:ev-lunch
      |SUMMARY:Lunch
      |DTSTART:20240101T120000Z
      |DTEND:20240101T124500Z
      |GEO:48.8566;2.3522
      |ORGANIZER:mailto:alice@example.com
      |END:VEVENT
      |BEGIN:VEVENT
      |UID:ev-remote
      |SUMMARY:Remote conf
      |DTSTART:20240101T120000Z
      |DTEND:20240101T130000Z
      |GEO:40.7128;-74.0060
      |END:VEVENT
      |END:VCALENDAR""".stripMargin

  // ---- B2: location trace — office dwell 11:50-12:50, then a move, then
  // a second dwell elsewhere 13:30-14:20 (points every 2 min, acc 20 m)
  private def locationJson: String = {
    def e7(d: Double) = math.round(d * 1e7)
    val base = java.time.Instant.parse("2024-01-01T11:50:00Z").toEpochMilli
    val officePts = (0 until 31).map { i =>
      s"""{"timestampMs":"${base + i * 120000L}","latitudeE7":${e7(48.8566)},"longitudeE7":${e7(2.3522)},"accuracy":20}"""
    }
    val moveBase = base + 65 * 60000L
    val movePts = (0 until 5).map { i =>
      s"""{"timestampMs":"${moveBase + i * 120000L}","latitudeE7":${e7(48.8566 + 0.01 * (i + 1))},"longitudeE7":${e7(2.3522)},"accuracy":20}"""
    }
    val dwell2Base = base + 100 * 60000L
    val dwell2Pts = (0 until 26).map { i =>
      s"""{"timestampMs":"${dwell2Base + i * 120000L}","latitudeE7":${e7(48.9100)},"longitudeE7":${e7(2.3522)},"accuracy":20}"""
    }
    s"""{"locations":[${(officePts ++ movePts ++ dwell2Pts).mkString(",")}]}"""
  }

  // enrichers come from the library (graft.enrich.Enrichers) — the spec
  // runs the reference-ordered chain and checks the golden outputs
  private val ifpEnricher = graft.enrich.Enrichers.ifpSameAs(S + "email")
  private val stayEnricher = graft.enrich.Enrichers.stays()
  private val eventStayEnricher = graft.enrich.Enrichers.eventStayLinks(S)

  "the full pipeline" should "produce the golden stays, merges and event links" in {
    // author fixture files (B2-B5)
    val dir = Files.createTempDirectory("graft-golden")
    Files.writeString(dir.resolve("m1.eml"), emails(0)._2)
    Files.writeString(dir.resolve("m2.eml"), emails(1)._2)
    Files.writeString(dir.resolve("m3.eml"), emails(2)._2)
    Files.writeString(dir.resolve("alice.vcf"), vcard)
    Files.writeString(dir.resolve("cal.ics"), ics)
    val locFile = dir.resolve("locations.json")
    Files.writeString(locFile, locationJson)

    // converters
    val docQuads = graft.sources.FileIngest.toQuads(
      graft.sources.FileIngest.scan(spark, dir.toString)).toDF()
    val locQuads = Converters.locationHistory(spark,
      spark.read.json(locFile.toString))
    val batch = docQuads.unionByName(locQuads)

    // empty store + negations; enricher chain in reference order
    val empty = batch.limit(0)
    val (store, diff) = QuadPipeline.processBatch(
      empty, batch, empty, Seq(ifpEnricher, stayEnricher, eventStayEnricher))
    val quads = store.localCheckpoint()

    // B8 golden: exactly 2 stays (office + second dwell; the move is none)
    val stays = quads.where(col("g") === "graft:stays" && col("p") === "rdf:type")
    stays.count() shouldBe 2

    // golden: alice's email agent (from eml) and card agent share the email
    // -> exactly one sameAs pair in the IFP graph
    val sameAs = quads.where(col("g") === "graft:ifp")
      .select("s", "o").as[(String, String)].collect()
    sameAs.length shouldBe 1

    // golden: the lunch event links to the office stay; the remote one not
    val links = quads.where(col("g") === "graft:eventStay")
      .select("s", "o").as[(String, String)].collect()
    links.length shouldBe 1
    links.head._1 shouldBe graft.convert.Iri.entity("event", "ev-lunch")

    // golden MIME depth: m3's base64 plain body decoded (html alternative
    // dropped), display name decoded from the RFC 2047 word
    quads.where(col("s") === "mid:m3%40host" && col("p") === (S + "text"))
      .select("o").as[String].collect().toSeq shouldBe Seq("menu: café + tartines")
    val beaAgent = quads.where(col("s") === "mid:m3%40host" && col("p") === (S + "sender"))
      .select("o").as[String].head()
    quads.where(col("s") === beaAgent && col("p") === (S + "name"))
      .select("o").as[String].collect().toSeq shouldBe Seq("Béatrice")

    // provenance graphs all present
    quads.select("g").distinct().as[String].collect().toSet should contain allOf (
      "graft:ifp", "graft:stays", "graft:eventStay")

    // the flowing diff accumulated every enricher's additions
    diff.added.count() should be >= quads.where(col("g").startsWith("graft:")).count()

    // the windowed (full-fidelity) stay enricher produces the same two
    // golden stays on this clean trace — multi-candidate clustering only
    // diverges on interleaved noise (WindowedStaysSpec covers that)
    val (storeW, _) = QuadPipeline.processBatch(
      empty, batch, empty, Seq(graft.enrich.Enrichers.stays(windowed = true)))
    val staysW = storeW.where(col("g") === "graft:stays" && col("p") === "rdf:type")
    staysW.count() shouldBe 2
    storeW.where(col("g") === "graft:stays" && col("p") === "personal:start")
      .select("o").as[String].collect().toSet shouldBe
      quads.where(col("g") === "graft:stays" && col("p") === "personal:start")
        .select("o").as[String].collect().toSet
  }
}
