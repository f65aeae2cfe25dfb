package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets

/** CalDAV / CardDAV incremental synchronization over real WebDAV HTTP —
  * the reference's `BaseDavSynchronizer` protocol
  * (`core/src/main/com/thymeflow/sync/dav/BaseDavSynchronizer.scala:128-230`):
  *
  *  1. `PROPFIND Depth:0` reads the collection's ctag — unchanged ctag
  *     means NO per-element work (the cheap fast path, `:128-139`);
  *  2. `PROPFIND Depth:1` lists (href, etag) per element;
  *  3. the etag map diff vs the previous [[DavState]] yields
  *     changed/new/removed hrefs (`:140,161-166,198`);
  *  4. `REPORT` multiget fetches ONLY the changed bodies
  *     (`CalDavSynchronizer.scala` / `CardDavSynchronizer.scala` issue
  *     calendar-multiget / addressbook-multiget the same way).
  *
  * The driver-side client fetches deltas; bodies then flow into the
  * distributed converters ([[graft.convert.Converters.ical]]/`vcard`) as
  * a `Dataset[(id, body)]` — protocol I/O is inherently per-collection
  * serial, parsing and quad generation are the parallel part.
  *
  * Multistatus XML is parsed with a deliberately small tag scanner (no
  * XML dependency): DAV servers namespace-prefix freely, so tags match
  * by local name. Bodies arrive XML-escaped inside
  * `calendar-data`/`address-data` and are unescaped here.
  */
object DavSync {

  /** Sync cursor: collection ctag + per-element etags. */
  final case class DavState(ctag: Option[String] = None,
      etags: Map[String, String] = Map.empty)

  /** One sync round's outcome: fetched (href, etag, body), removed
    * hrefs, and the advanced cursor. */
  final case class DavDelta(fetched: Seq[(String, String, String)],
      removed: Seq[String], state: DavState) {
    def isEmpty: Boolean = fetched.isEmpty && removed.isEmpty
  }

  private def xmlUnescape(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&apos;", "'").replace("&#13;", "\r").replace("&amp;", "&")

  /** All `<...local>inner</...local>` spans, namespace-prefix-blind. */
  private[sources] def tagContents(xml: String, local: String): Seq[String] = {
    val re = ("(?s)<(?:[A-Za-z0-9_-]+:)?" + local + "(?:\\s[^>]*)?>(.*?)</(?:[A-Za-z0-9_-]+:)?" +
      local + ">").r
    re.findAllMatchIn(xml).map(_.group(1)).toSeq
  }

  private def request(client: HttpClient, url: String, method: String,
      depth: Option[String], body: String): String = {
    val b = HttpRequest.newBuilder(URI.create(url))
      .header("Content-Type", "application/xml; charset=utf-8")
      .method(method, HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
    depth.foreach(d => b.header("Depth", d))
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() / 100 == 2, s"$method $url -> HTTP ${resp.statusCode()}")
    resp.body()
  }

  /** One incremental sync round against a DAV collection. `dataTag` is
    * the body-carrying element's local name: `calendar-data` (CalDAV) or
    * `address-data` (CardDAV). */
  def sync(collectionUrl: String, state: DavState,
      dataTag: String,
      client: HttpClient = HttpClient.newHttpClient()): DavDelta = {
    // 1. ctag probe (Depth 0)
    val ctagXml = request(client, collectionUrl, "PROPFIND", Some("0"),
      """<?xml version="1.0"?><d:propfind xmlns:d="DAV:"
        |  xmlns:cs="http://calendarserver.org/ns/"><d:prop>
        |  <cs:getctag/></d:prop></d:propfind>""".stripMargin)
    val ctag = tagContents(ctagXml, "getctag").headOption.map(_.trim)
    if (ctag.isDefined && ctag == state.ctag)
      return DavDelta(Nil, Nil, state) // nothing moved: zero element work

    // 2. (href, etag) listing (Depth 1)
    val listXml = request(client, collectionUrl, "PROPFIND", Some("1"),
      """<?xml version="1.0"?><d:propfind xmlns:d="DAV:"><d:prop>
        |  <d:getetag/></d:prop></d:propfind>""".stripMargin)
    // self-exclusion by PATH EQUALITY, not endsWith: the suffix test
    // excluded EVERY entry for a root collection (everything ends with
    // "") and permanently hid any element named like the collection's
    // last segment — both read as a silent full-removal signal
    val collPath = URI.create(collectionUrl).getPath.stripSuffix("/")
    def hrefPath(h: String): String =
      (try Option(URI.create(h).getPath).getOrElse(h)
       catch { case _: IllegalArgumentException => h }).stripSuffix("/")
    val entries = tagContents(listXml, "response").flatMap { r =>
      for {
        href <- tagContents(r, "href").headOption.map(_.trim)
        etag <- tagContents(r, "getetag").headOption.map(_.trim.stripPrefix("\"").stripSuffix("\""))
        if href.nonEmpty && hrefPath(href) != collPath
      } yield href -> etag
    }.toMap

    // 3. etag diff
    val changed = entries.collect {
      case (href, etag) if !state.etags.get(href).contains(etag) => href
    }.toSeq.sorted
    val removed = (state.etags.keySet -- entries.keySet).toSeq.sorted

    // 4. multiget REPORT for changed bodies only
    val fetched =
      if (changed.isEmpty) Nil
      else {
        val ns = if (dataTag == "calendar-data")
          """xmlns:x="urn:ietf:params:xml:ns:caldav"""" else
          """xmlns:x="urn:ietf:params:xml:ns:carddav""""
        val root = if (dataTag == "calendar-data") "calendar-multiget" else "addressbook-multiget"
        val reportXml = request(client, collectionUrl, "REPORT", Some("1"),
          s"""<?xml version="1.0"?><x:$root xmlns:d="DAV:" $ns>
             |<d:prop><d:getetag/><x:$dataTag/></d:prop>
             |${changed.map(h => s"<d:href>$h</d:href>").mkString("\n")}
             |</x:$root>""".stripMargin)
        tagContents(reportXml, "response").flatMap { r =>
          for {
            href <- tagContents(r, "href").headOption.map(_.trim)
            etag <- tagContents(r, "getetag").headOption
              .map(_.trim.stripPrefix("\"").stripSuffix("\""))
            body <- tagContents(r, dataTag).headOption.map(xmlUnescape)
          } yield (href, etag, body)
        }
      }

    DavDelta(fetched, removed,
      DavState(ctag, entries))
  }

  /** Write-back: PUT a regenerated document to its collection — the
    * reference's push leg (`BaseDavSynchronizer.scala:234`,
    * `sardine.put(documentUrl, newVersion, headers)`). The known etag
    * goes out as `If-Match`, so a concurrent remote edit fails the
    * precondition (HTTP 412) instead of being clobbered — lost-update
    * protection exactly as the reference's conditional PUT. Returns the
    * new etag when the server reports one (None → the next sync round's
    * etag diff refetches and reconciles). */
  def put(documentUrl: String, body: String, etag: Option[String],
      contentType: String = "text/vcard",
      client: HttpClient = HttpClient.newHttpClient()): Option[String] = {
    val b = HttpRequest.newBuilder(URI.create(documentUrl))
      .header("Content-Type", contentType)
      .PUT(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
    etag.foreach(e => b.header("If-Match", "\"" + e + "\""))
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() / 100 == 2,
      s"PUT $documentUrl -> HTTP ${resp.statusCode()}" +
        (if (resp.statusCode() == 412) " (etag precondition failed: remote changed)" else ""))
    val e = resp.headers().firstValue("ETag")
    if (e.isPresent) Some(e.get.stripPrefix("\"").stripSuffix("\"")) else None
  }

  /** CalDAV round (ics bodies). */
  def syncCalendar(url: String, state: DavState,
      client: HttpClient = HttpClient.newHttpClient()): DavDelta =
    sync(url, state, "calendar-data", client)

  /** CardDAV round (vcf bodies). */
  def syncAddressBook(url: String, state: DavState,
      client: HttpClient = HttpClient.newHttpClient()): DavDelta =
    sync(url, state, "address-data", client)
}
