package graft.convert

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Deterministic IRI minting — the reference derives stable IRIs from
  * content keys via SHA-1-based name UUIDs
  * (`core/src/main/com/thymeflow/sync/converter/utils/UUIDConverter.scala:10-42`),
  * mailto/tel/mid URI schemes (`EmailAddressConverter.scala:21-76`,
  * `PhoneNumberConverter.scala:16-53`, `EmailMessageUriConverter.scala:10-30`).
  * Pure functions usable from UDFs and converters alike.
  */
object Iri {

  /** Name-based UUID (version 5 style: SHA-1 of the key, RFC 4122 layout). */
  def nameUuid(key: String): String = {
    val d = MessageDigest.getInstance("SHA-1")
      .digest(key.getBytes(StandardCharsets.UTF_8))
    d(6) = ((d(6) & 0x0f) | 0x50).toByte // version 5
    d(8) = ((d(8) & 0x3f) | 0x80).toByte // IETF variant
    f"${bytesToHex(d, 0, 4)}-${bytesToHex(d, 4, 2)}-${bytesToHex(d, 6, 2)}-" +
      f"${bytesToHex(d, 8, 2)}-${bytesToHex(d, 10, 6)}"
  }

  private def bytesToHex(b: Array[Byte], off: Int, len: Int): String =
    b.slice(off, off + len).map(x => f"$x%02x").mkString

  def entity(kind: String, key: String): String = s"urn:graft:$kind:${nameUuid(key)}"

  /** mailto: IRI from an address (lowercased host, reference semantics). */
  def mailto(address: String): Option[String] = splitEmail(address).map {
    case (local, domain) => s"mailto:$local@$domain"
  }

  /** (localPart, domain) with trimming, mailto:-prefix tolerance and
    * domain lowercasing. */
  def splitEmail(address: String): Option[(String, String)] = {
    val trimmed = address.trim.stripPrefix("mailto:").stripPrefix("<").stripSuffix(">")
    val at = trimmed.lastIndexOf('@')
    if (at <= 0 || at == trimmed.length - 1) None
    else Some((trimmed.substring(0, at), trimmed.substring(at + 1).toLowerCase))
  }

  /** tel: IRI. International (+cc) numbers validate through [[Phone]]'s
    * E.164 region rules; bare digit strings keep the legacy permissive
    * form (no region context here — [[Phone.telUri]] is the region-aware
    * entry the converters use). */
  def tel(number: String): Option[String] = {
    val cleaned = number.trim.replaceAll("[\\s().-]", "")
    if (cleaned.startsWith("+")) Phone.telUri(cleaned, "ZZ")
    else if (cleaned.matches("[0-9]{3,15}")) Some(s"tel:$cleaned")
    else None
  }

  /** mid: IRI from an RFC 2392-style Message-ID. */
  def mid(messageId: String): String = {
    val id = messageId.trim.stripPrefix("<").stripSuffix(">")
    "mid:" + java.net.URLEncoder.encode(id, "UTF-8")
  }

  /** geo: URI with the reference's precision-preserving format
    * (`GeoCoordinatesConverter.scala:24-45`). */
  def geo(lat: Double, lon: Double): String = {
    def fmt(d: Double): String = {
      val s = BigDecimal(d).bigDecimal.stripTrailingZeros().toPlainString
      if (s.contains('.')) s else s + ".0"
    }
    s"geo:${fmt(lat)},${fmt(lon)}"
  }
}
