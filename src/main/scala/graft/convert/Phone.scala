package graft.convert

/** Region-aware phone-number normalization to E.164 — the semantics the
  * reference gets from libphonenumber
  * (`core/src/main/com/thymeflow/sync/converter/utils/
  * PhoneNumberConverter.scala:16-53`: parse with a default region,
  * validate, format RFC 3966), re-implemented on the PUBLIC numbering
  * rules (ITU-T E.164 country codes, national trunk prefixes,
  * international dial prefixes, national-number length bounds) for the
  * regions personal-data corpora actually contain. Unknown regions fall
  * back to the E.164 global envelope (7–15 digits).
  */
object Phone {

  /** cc = country calling code; trunk = national (trunk) prefix stripped
    * from domestic formats; intl = international dial prefixes; nsn
    * length bounds for the national significant number. */
  final case class Region(cc: String, trunk: Option[String],
      intl: Seq[String], nsnMin: Int, nsnMax: Int)

  /** Public per-region rules (ITU E.164 assignments + national plans). */
  val regions: Map[String, Region] = Map(
    "US" -> Region("1", None, Seq("011"), 10, 10),
    "CA" -> Region("1", None, Seq("011"), 10, 10),
    "FR" -> Region("33", Some("0"), Seq("00"), 9, 9),
    "GB" -> Region("44", Some("0"), Seq("00"), 9, 10),
    "DE" -> Region("49", Some("0"), Seq("00"), 6, 11),
    "ES" -> Region("34", None, Seq("00"), 9, 9),
    "IT" -> Region("39", None, Seq("00"), 6, 11),
    "AU" -> Region("61", Some("0"), Seq("0011"), 9, 9),
    "JP" -> Region("81", Some("0"), Seq("010"), 9, 10),
    "CN" -> Region("86", Some("0"), Seq("00"), 10, 11),
    "IN" -> Region("91", Some("0"), Seq("00"), 10, 10),
    "BR" -> Region("55", Some("0"), Seq("00"), 10, 11),
    "NL" -> Region("31", Some("0"), Seq("00"), 9, 9),
    "SE" -> Region("46", Some("0"), Seq("00"), 7, 9),
    "CH" -> Region("41", Some("0"), Seq("00"), 9, 9),
    "BE" -> Region("32", Some("0"), Seq("00"), 8, 9),
    "RU" -> Region("7", Some("8"), Seq("810"), 10, 10))

  private val ccToRegion: Map[String, Region] =
    regions.values.map(r => r.cc -> r).toMap

  /** Strip extensions (";ext=", "ext.", trailing "x123") and separators;
    * keep a leading '+'. */
  private def clean(raw: String): String = {
    val noExt = raw.trim
      .replaceAll("(?i);ext=.*$", "")
      .replaceAll("(?i)\\s*(ext\\.?|extension|x)\\s*\\d{1,6}\\s*$", "")
      .stripPrefix("tel:")
    val digits = noExt.replaceAll("[\\s().\\-/]", "")
    digits
  }

  /** Validate a +cc-prefixed E.164 candidate: known country codes check
    * their region's NSN bounds; unknown codes use the global 7–15 rule. */
  private def validateE164(digits: String): Option[String] = {
    if (!digits.matches("[0-9]{7,15}")) return None
    (3 to 1 by -1).flatMap(n =>
      if (digits.length > n) ccToRegion.get(digits.take(n)) else None)
      .headOption match {
      case Some(r) =>
        val nsn = digits.drop(r.cc.length)
        if (nsn.length >= r.nsnMin && nsn.length <= r.nsnMax) Some("+" + digits)
        else None
      case None => Some("+" + digits) // valid envelope, unlisted cc
    }
  }

  /** Parse to E.164 ("+<cc><nsn>") with a default region for national
    * formats; None when invalid. */
  def normalize(raw: String, defaultRegion: String): Option[String] = {
    val c = clean(raw)
    if (c.startsWith("+")) validateE164(c.drop(1))
    else if (!c.matches("[0-9]{3,17}")) None
    else regions.get(defaultRegion.toUpperCase) match {
      case None => if (c.matches("[0-9]{7,15}")) Some("+" + c) else None
      case Some(r) =>
        // international dial prefix of the region -> the rest is E.164
        r.intl.find(p => c.startsWith(p) && c.length > p.length + 6) match {
          case Some(p) => validateE164(c.drop(p.length))
          case None =>
            // national format: strip the trunk prefix, prepend the cc.
            // A leading 0 on the remaining NSN is invalid only where the
            // region's trunk prefix IS 0 (it would mean a doubled trunk);
            // regions without one keep it — Italian landline NSNs
            // legitimately start with 0 ("06..." Rome).
            val nsn = r.trunk.filter(c.startsWith).map(t => c.drop(t.length)).getOrElse(c)
            val doubledTrunk = r.trunk.contains("0") && nsn.startsWith("0")
            if (nsn.length >= r.nsnMin && nsn.length <= r.nsnMax && !doubledTrunk)
              Some("+" + r.cc + nsn)
            // cc-prefixed domestic form ("1 800 555 0199" under US): the
            // number already carries the region's own country code — try
            // it as E.164 before rejecting on NSN bounds
            else if (c.startsWith(r.cc)) validateE164(c)
            else None
        }
    }
  }

  /** RFC 3966 tel URI (the reference's output format). */
  def telUri(raw: String, defaultRegion: String): Option[String] =
    normalize(raw, defaultRegion).map("tel:" + _)
}
