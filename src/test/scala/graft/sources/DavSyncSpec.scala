package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.SparkSpec

/** Real-protocol CardDAV sync against a scripted WebDAV server (JDK
  * HttpServer speaking multistatus XML): ctag fast path, etag diffing,
  * multiget fetch of changed elements only, removals — the reference's
  * BaseDavSynchronizer behavior end-to-end, with fetched bodies flowing
  * into the distributed vCard converter. */
class DavSyncSpec extends SparkSpec {
  import spark.implicits._

  /** Mutable fake collection: href -> (etag, body). */
  private final class FakeDav {
    var ctag = 1
    val cards = scala.collection.mutable.LinkedHashMap[String, (String, String)]()
    var propfindCount = 0
    var reportHrefs: Seq[String] = Nil
    var putCount = 0
    var rejectedPuts = 0

    private def esc(s: String) =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

    val server: HttpServer = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/dav/contacts/", { (ex: HttpExchange) =>
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val depth = Option(ex.getRequestHeaders.getFirst("Depth")).getOrElse("0")
      if (ex.getRequestMethod == "PUT") {
        // etag-guarded document write: If-Match must name the current
        // version (or the document must be new); stores the body under a
        // fresh etag, bumps the collection ctag, answers 204 + ETag
        val href = ex.getRequestURI.getPath
        val ifMatch = Option(ex.getRequestHeaders.getFirst("If-Match"))
          .map(_.stripPrefix("\"").stripSuffix("\""))
        val current = cards.get(href).map(_._1)
        if (ifMatch.isDefined && ifMatch != current) {
          rejectedPuts += 1
          ex.sendResponseHeaders(412, -1)
        } else {
          putCount += 1
          val newEtag = s"p$putCount"
          cards(href) = (newEtag, body)
          ctag += 1
          ex.getResponseHeaders.set("ETag", "\"" + newEtag + "\"")
          ex.sendResponseHeaders(204, -1)
        }
        ex.close()
      } else {
      val resp = ex.getRequestMethod match {
        case "PROPFIND" if depth == "0" =>
          s"""<d:multistatus xmlns:d="DAV:" xmlns:cs="http://calendarserver.org/ns/">
             |<d:response><d:href>/dav/contacts/</d:href>
             |<d:propstat><d:prop><cs:getctag>c$ctag</cs:getctag></d:prop></d:propstat>
             |</d:response></d:multistatus>""".stripMargin
        case "PROPFIND" =>
          propfindCount += 1
          val rows = cards.map { case (href, (etag, _)) =>
            s"""<d:response><d:href>$href</d:href>
               |<d:propstat><d:prop><d:getetag>"$etag"</d:getetag></d:prop></d:propstat>
               |</d:response>""".stripMargin
          }.mkString
          s"""<d:multistatus xmlns:d="DAV:">
             |<d:response><d:href>/dav/contacts/</d:href>
             |<d:propstat><d:prop><d:getetag>"col"</d:getetag></d:prop></d:propstat>
             |</d:response>$rows</d:multistatus>""".stripMargin
        case "REPORT" =>
          val wanted = "<(?:[A-Za-z0-9]+:)?href>([^<]+)</".r
            .findAllMatchIn(body).map(_.group(1)).toSeq
          reportHrefs = wanted
          val rows = wanted.flatMap(h => cards.get(h).map { case (etag, card) =>
            s"""<d:response><d:href>$h</d:href><d:propstat><d:prop>
               |<d:getetag>"$etag"</d:getetag>
               |<card:address-data>${esc(card)}</card:address-data>
               |</d:prop></d:propstat></d:response>""".stripMargin
          }).mkString
          s"""<d:multistatus xmlns:d="DAV:"
             |  xmlns:card="urn:ietf:params:xml:ns:carddav">$rows</d:multistatus>""".stripMargin
        case _ => ""
      }
      val bytes = resp.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/xml")
      ex.sendResponseHeaders(207, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
      }
    })
    server.start()
    def url = s"http://localhost:${server.getAddress.getPort}/dav/contacts/"
  }

  private def vcard(uid: String, name: String, email: String) =
    s"BEGIN:VCARD\nVERSION:3.0\nUID:$uid\nFN:$name\nEMAIL:$email\nEND:VCARD"

  "DavSync" should "sync incrementally by ctag and etag like the reference" in {
    val dav = new FakeDav
    try {
      dav.cards("/dav/contacts/alice.vcf") = ("e1", vcard("a1", "Alice", "alice@example.com"))
      dav.cards("/dav/contacts/bob.vcf") = ("e2", vcard("b1", "Bob", "bob@example.com"))

      // initial sync fetches everything
      val d1 = DavSync.syncAddressBook(dav.url, DavSync.DavState())
      d1.fetched.map(_._1).toSet shouldBe dav.cards.keySet
      d1.removed shouldBe empty
      d1.state.etags.values.toSet shouldBe Set("e1", "e2")

      // fetched bodies flow into the distributed converter
      val quads = graft.convert.Converters.vcard(
        d1.fetched.map(f => (f._1, f._3)).toDS()).toDF()
      quads.where($"o" === "Alice").count() shouldBe 1
      quads.where($"o" === "mailto:bob@example.com").count() shouldBe 1

      // unchanged ctag: the fast path does ZERO per-element work
      val before = dav.propfindCount
      val d2 = DavSync.syncAddressBook(dav.url, d1.state)
      d2.isEmpty shouldBe true
      dav.propfindCount shouldBe before // no Depth:1 listing happened

      // one card modified: only IT is multiget-fetched
      dav.cards("/dav/contacts/alice.vcf") = ("e3", vcard("a1", "Alicia", "alice@example.com"))
      dav.ctag += 1
      val d3 = DavSync.syncAddressBook(dav.url, d2.state)
      d3.fetched.map(_._1) shouldBe Seq("/dav/contacts/alice.vcf")
      dav.reportHrefs shouldBe Seq("/dav/contacts/alice.vcf")
      d3.fetched.head._3 should include("Alicia")
      d3.removed shouldBe empty

      // one card deleted: reported as removed, nothing fetched
      dav.cards.remove("/dav/contacts/bob.vcf")
      dav.ctag += 1
      val d4 = DavSync.syncAddressBook(dav.url, d3.state)
      d4.fetched shouldBe empty
      d4.removed shouldBe Seq("/dav/contacts/bob.vcf")
      d4.state.etags.keySet shouldBe Set("/dav/contacts/alice.vcf")
    } finally dav.server.stop(0)
  }

  it should "drive the store through SyncBridge rounds (add, replace, remove)" in {
    import graft.streaming.SyncBridge
    val dav = new FakeDav
    try {
      dav.cards("/dav/contacts/alice.vcf") = ("e1", vcard("a1", "Alice", "alice@example.com"))
      dav.cards("/dav/contacts/bob.vcf") = ("e2", vcard("b1", "Bob", "bob@example.com"))
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], graft.rdf.Quad.schema)

      // round 1: both contacts land in their per-document graphs
      val d1 = DavSync.syncAddressBook(dav.url, DavSync.DavState())
      val (s1, _) = SyncBridge.applyDelta(empty,
        d1.fetched.map(f => (f._1, f._3)), d1.removed,
        graft.convert.Converters.vcard(_), empty, Nil)
      s1.where($"o" === "Alice").count() shouldBe 1
      s1.select("g").distinct().count() shouldBe 2

      // round 2: alice renamed, bob deleted — replace + graph clear
      dav.cards("/dav/contacts/alice.vcf") = ("e3", vcard("a1", "Alicia", "alice@example.com"))
      dav.cards.remove("/dav/contacts/bob.vcf")
      dav.ctag += 1
      val d2 = DavSync.syncAddressBook(dav.url, d1.state)
      val (s2, diff) = SyncBridge.applyDelta(s1,
        d2.fetched.map(f => (f._1, f._3)), d2.removed,
        graft.convert.Converters.vcard(_), empty, Nil)
      s2.where($"o" === "Alicia").count() shouldBe 1
      s2.where($"o" === "Alice").count() shouldBe 0
      s2.where($"g" === "doc:/dav/contacts/bob.vcf").count() shouldBe 0
      diff.removed.where($"o" === "Bob").count() shouldBe 1
    } finally dav.server.stop(0)
  }

  it should "round-trip a SPARQL UPDATE to the server and survive the next sync" in {
    import graft.rdf.QuadDiff
    import graft.streaming.{SyncBridge, Updater}
    val dav = new FakeDav
    try {
      val href = "/dav/contacts/alice.vcf"
      dav.cards(href) = ("e1", vcard("a1", "Alice", "alice@example.com"))
      val emptyStore = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], graft.rdf.Quad.schema)

      // ingest
      val d1 = DavSync.syncAddressBook(dav.url, DavSync.DavState())
      val (s1, _) = SyncBridge.applyDelta(emptyStore,
        d1.fetched.map(f => (f._1, f._3)), d1.removed,
        graft.convert.Converters.vcard(_), emptyStore, Nil)
      val agent = s1.where($"o" === "Alice").select("s").as[String].head()

      // a SPARQL-UPDATE-shaped diff on the DAV-owned graph: rename Alice
      val g = s"doc:$href"
      val upd = QuadDiff(
        Seq(graft.rdf.Quad(agent, graft.convert.Converters.schemaOrg + "name",
          "Alice Cooper", graft.rdf.Quad.LITERAL, null, null, g)).toDS().toDF(),
        s1.where($"o" === "Alice"))
      val res = Updater.applyUpdate(s1, upd, writableGraphs = Set(g))
      res.store.where($"o" === "Alice Cooper" && $"g" === g).count() shouldBe 1

      // write-back: the regenerated vCard is PUT with If-Match e1
      val st2 = SyncBridge.writeBackDav(res.store, upd, dav.url, d1.state)
      dav.putCount shouldBe 1
      dav.rejectedPuts shouldBe 0
      dav.cards(href)._2 should include("FN:Alice Cooper")
      dav.cards(href)._2 should include("UID:a1")
      dav.cards(href)._2 should include("EMAIL:alice@example.com")

      // next sync round: the cursor already knows the post-PUT etag, so
      // the engine's own write is NOT refetched — the update survived
      val d2 = DavSync.syncAddressBook(dav.url, st2)
      d2.fetched shouldBe empty
      d2.removed shouldBe empty

      // and a refetch-from-scratch converts back to the updated name
      val fresh = DavSync.syncAddressBook(dav.url, DavSync.DavState())
      val quads = graft.convert.Converters.vcard(
        fresh.fetched.map(f => (f._1, f._3)).toDS()).toDF()
      quads.where($"o" === "Alice Cooper").count() shouldBe 1

      // a stale etag is refused by the server (lost-update protection)
      val ex = intercept[IllegalArgumentException] {
        SyncBridge.writeBackDav(res.store, upd, dav.url, d1.state)
      }
      ex.getMessage should include("412")
      dav.rejectedPuts shouldBe 1
    } finally dav.server.stop(0)
  }
}
