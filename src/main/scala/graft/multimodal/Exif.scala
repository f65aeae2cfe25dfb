package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** Real EXIF (TIFF-in-APP1) writer + parser from the public specs —
  * JEITA CP-3451 (EXIF 2.3) over ISO 12234-2 TIFF structure. The
  * curation signals it unlocks: capture time (temporal dedup/decay),
  * camera make (source stratification), orientation (pre-rotation for
  * vision models), GPS (location-PII detection and scrubbing — the
  * image-side analogue of `text.Pii`).
  *
  * Writer emits a minimal JPEG: SOI + APP1("Exif\0\0" + TIFF) + EOI,
  * with IFD0 (Make / Orientation / DateTime / GPS-pointer) and a GPS
  * IFD (lat/lon refs + degree-minute-second RATIONAL triples). Both
  * byte orders ("II" little, "MM" big) are written and parsed — a
  * format kernel isn't real if it only reads what it writes, so the
  * parser walks arbitrary IFD layouts with strict bounds checks and
  * returns None fields for anything absent or malformed rather than
  * throwing on corpus junk.
  *
  * Coordinates ride as exact micro-degrees (E6): the writer decomposes
  * e6 → (deg, min, micro-sec·60-exact) rationals losslessly and the
  * parser recomposes the same integer — spec'd as a round-trip
  * property, which is what lets a driver query state its oracle as
  * plain arithmetic.
  */
object Exif {

  final case class ExifData(
      make: Option[String],
      dateTime: Option[String],
      orientation: Option[Int],
      latE6: Option[Long],
      lonE6: Option[Long])

  // ---------------------------------------------------------------- build

  /** Minimal JPEG wrapper around one EXIF APP1 segment. */
  def buildJpeg(make: String, dateTime: String, orientation: Int,
      latE6: Long, lonE6: Long, littleEndian: Boolean = true): Array[Byte] = {
    val tiff = buildTiff(make, dateTime, orientation, latE6, lonE6, littleEndian)
    val out = new ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    val payload = "Exif\u0000\u0000".getBytes(StandardCharsets.US_ASCII) ++ tiff
    out.write(0xff); out.write(0xe1) // APP1
    val len = payload.length + 2
    out.write((len >> 8) & 0xff); out.write(len & 0xff)
    out.write(payload, 0, payload.length)
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** e6 micro-degrees → (deg, min, secNum/secDen) — exact by
    * construction: secNum = (e6 mod 1e6 scaled) stays divisible back. */
  private def dmsFromE6(absE6: Long): (Long, Long, Long, Long) = {
    val deg = absE6 / 1000000L
    val remE6 = absE6 % 1000000L // micro-degrees
    val microMin = remE6 * 60L // micro-minutes
    val min = microMin / 1000000L
    val microSec = (microMin % 1000000L) * 60L // micro-seconds
    (deg, min, microSec, 1000000L)
  }

  private def buildTiff(make: String, dateTime: String, orientation: Int,
      latE6: Long, lonE6: Long, le: Boolean): Array[Byte] = {
    val buf = new ByteArrayOutputStream()
    def w8(v: Int): Unit = buf.write(v & 0xff)
    def w16(v: Int): Unit =
      if (le) { w8(v); w8(v >> 8) } else { w8(v >> 8); w8(v) }
    def w32(v: Long): Unit =
      if (le) { w8(v.toInt); w8((v >> 8).toInt); w8((v >> 16).toInt); w8((v >> 24).toInt) }
      else { w8((v >> 24).toInt); w8((v >> 16).toInt); w8((v >> 8).toInt); w8(v.toInt) }

    // TIFF stores values of <= 4 bytes INLINE in the entry's value
    // field; this writer always emits ASCII out-of-line, so short
    // strings are NUL-padded past the inline boundary (trailing NULs
    // are legal in EXIF ASCII and parsers stop at the first one).
    // Caught by the extract spec: a 4-byte "Cam\u0000" previously had
    // its OFFSET read back as characters.
    def asciiBytes(s: String): Array[Byte] = {
      val b = (s + "\u0000").getBytes(StandardCharsets.US_ASCII)
      if (b.length > 4) b else b ++ Array.fill(5 - b.length)(0.toByte)
    }
    val makeBytes = asciiBytes(make)
    val dtBytes = asciiBytes(dateTime)

    // layout (offsets from TIFF origin):
    // 8: IFD0 (4 entries), then next-IFD(4B)
    val ifd0At = 8L
    val ifd0End = ifd0At + 2 + 4 * 12 + 4
    val makeAt = ifd0End
    val dtAt = makeAt + makeBytes.length
    val gpsAt = dtAt + dtBytes.length
    // GPS IFD: 4 entries + next pointer, then two 24-byte DMS blocks
    val gpsEnd = gpsAt + 2 + 4 * 12 + 4
    val latValAt = gpsEnd
    val lonValAt = latValAt + 24

    // TIFF header
    buf.write((if (le) "II" else "MM").getBytes(StandardCharsets.US_ASCII))
    w16(42); w32(ifd0At)

    def entry(tag: Int, typ: Int, count: Long, inlineOrOffset: Long): Unit = {
      w16(tag); w16(typ); w32(count); w32(inlineOrOffset)
    }
    def inlineShort(v: Int): Long = // SHORT sits in the value field's first 2 bytes
      if (le) v.toLong else v.toLong << 16

    // IFD0 — entries must be ascending by tag
    w16(4)
    entry(0x010f, 2, makeBytes.length.toLong, makeAt) // Make, ASCII
    entry(0x0112, 3, 1, inlineShort(orientation)) //     Orientation, SHORT
    entry(0x0132, 2, dtBytes.length.toLong, dtAt) //     DateTime, ASCII
    entry(0x8825, 4, 1, gpsAt) //                        GPS IFD pointer, LONG
    w32(0) // no IFD1

    buf.write(makeBytes, 0, makeBytes.length)
    buf.write(dtBytes, 0, dtBytes.length)

    // GPS IFD
    val latRef = if (latE6 >= 0) "N\u0000" else "S\u0000"
    val lonRef = if (lonE6 >= 0) "E\u0000" else "W\u0000"
    def inlineAscii2(s: String): Long = {
      val b = s.getBytes(StandardCharsets.US_ASCII)
      if (le) (b(0) & 0xffL) | ((b(1) & 0xffL) << 8)
      else ((b(0) & 0xffL) << 24) | ((b(1) & 0xffL) << 16)
    }
    w16(4)
    entry(0x0001, 2, 2, inlineAscii2(latRef)) // GPSLatitudeRef
    entry(0x0002, 5, 3, latValAt) //             GPSLatitude, 3 RATIONALs
    entry(0x0003, 2, 2, inlineAscii2(lonRef)) // GPSLongitudeRef
    entry(0x0004, 5, 3, lonValAt) //             GPSLongitude
    w32(0)

    def dms(absE6: Long): Unit = {
      val (d, m, sn, sd) = dmsFromE6(absE6)
      w32(d); w32(1); w32(m); w32(1); w32(sn); w32(sd)
    }
    dms(math.abs(latE6)); dms(math.abs(lonE6))
    buf.toByteArray
  }

  // ------------------------------------------------------------- operator

  /** DataFrame surface: parse a binary image column into EXIF fields —
    * per-partition kernel, null-preserving (junk bytes yield null
    * fields, never a failed task), shuffle-free. */
  def extract(df: org.apache.spark.sql.DataFrame, idCol: String,
      binCol: String): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    df.select(col(idCol).cast("long").as("id"), col(binCol).as("bytes"))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val d = parse(bytes)
        (id, d.make.orNull, d.dateTime.orNull,
          d.orientation.map(_.toLong), d.latE6, d.lonE6)
      }
      .toDF("id", "exif_make", "exif_datetime", "exif_orientation",
        "exif_lat_e6", "exif_lon_e6")
  }

  // ---------------------------------------------------------------- parse

  /** Parse a JPEG's EXIF APP1 (or a bare TIFF). Absent/malformed fields
    * are None; never throws on junk bytes. */
  def parse(bytes: Array[Byte]): ExifData = {
    val empty = ExifData(None, None, None, None, None)
    if (bytes == null || bytes.length < 4) return empty
    // bare TIFF?
    if ((bytes(0) == 'I' && bytes(1) == 'I') || (bytes(0) == 'M' && bytes(1) == 'M'))
      return parseTiff(bytes, 0, bytes.length)
    if ((bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return empty
    // walk JPEG segments for APP1/Exif
    var i = 2
    while (i + 4 <= bytes.length) {
      if ((bytes(i) & 0xff) != 0xff) return empty
      val marker = bytes(i + 1) & 0xff
      if (marker == 0xd9 || marker == 0xda) return empty // EOI / SOS: no EXIF
      val len = ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
      if (len < 2 || i + 2 + len > bytes.length) return empty
      if (marker == 0xe1 && len >= 8 &&
        new String(bytes, i + 4, 4, StandardCharsets.US_ASCII) == "Exif") {
        val tiffAt = i + 4 + 6
        return parseTiff(bytes, tiffAt, i + 2 + len)
      }
      i += 2 + len
    }
    empty
  }

  private def parseTiff(b: Array[Byte], origin: Int, end: Int): ExifData = {
    val empty = ExifData(None, None, None, None, None)
    if (end - origin < 8) return empty
    val le = b(origin) == 'I' && b(origin + 1) == 'I'
    val be = b(origin) == 'M' && b(origin + 1) == 'M'
    if (!le && !be) return empty
    def u16(i: Int): Int =
      if (i < origin || i + 2 > end) -1
      else if (le) (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
      else ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    def u32(i: Int): Long =
      if (i < origin || i + 4 > end) -1L
      else if (le) (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
      else ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    if (u16(origin + 2) != 42) return empty

    final case class Entry(tag: Int, typ: Int, count: Long, valueAt: Int)
    def readIfd(ifdAt: Int): Seq[Entry] = {
      val n = u16(ifdAt)
      if (n < 0 || n > 512) return Nil
      (0 until n).flatMap { k =>
        val e = ifdAt + 2 + k * 12
        val tag = u16(e); val typ = u16(e + 2); val cnt = u32(e + 4)
        if (tag < 0 || typ < 0 || cnt < 0) None
        else {
          val sz = typ match {
            case 1 | 2 | 7 => 1L; case 3 => 2L; case 4 | 9 => 4L
            case 5 | 10 => 8L; case _ => 0L
          }
          val total = sz * cnt
          val valueAt =
            if (total <= 4) e + 8
            else {
              val off = u32(e + 8)
              if (off < 0 || origin + off + total > end) -1 else (origin + off).toInt
            }
          if (valueAt < 0 || sz == 0) None else Some(Entry(tag, typ, cnt, valueAt))
        }
      }
    }
    def ascii(e: Entry): Option[String] =
      if (e.typ != 2 || e.count <= 0 || e.valueAt + e.count > end) None
      else Some(new String(b, e.valueAt, e.count.toInt, StandardCharsets.US_ASCII)
        .takeWhile(_ != '\u0000'))
    def short(e: Entry): Option[Int] =
      if (e.typ != 3 || e.count < 1) None else Some(u16(e.valueAt))
    def rationalE6(e: Entry): Option[Long] = // DMS triple -> micro-degrees
      if (e.typ != 5 || e.count != 3) None
      else {
        val vals = (0 until 6).map(k => u32(e.valueAt + 4 * k))
        // sanity bounds on every component (a u32 numerator times the
        // 3.6e9 degree scale overflows Long, so the per-term products
        // go through BigInt — truncating division per term, identical
        // to the old Long arithmetic wherever that didn't overflow)
        if (vals.exists(_ < 0) || vals(1) == 0 || vals(3) == 0 || vals(5) == 0
          || vals(0) / vals(1) > 360 || vals(2) / vals(3) > 60
          || vals(4) / vals(5) > 60) None
        else {
          // sum in micro-degrees·3600 so deg + min + sec stay integral;
          // exact for the writer's (d,1)(m,1)(microsec,1e6) encoding
          val scaled = BigInt(vals(0)) * 3600000000L / vals(1) +
            BigInt(vals(2)) * 60000000L / vals(3) +
            BigInt(vals(4)) * 1000000L / vals(5)
          Some((scaled / 3600L).toLong)
        }
      }

    val ifd0Off = u32(origin + 4)
    val ifd0 = if (ifd0Off < 0) Nil else readIfd(origin + ifd0Off.toInt)
    val byTag = ifd0.map(e => e.tag -> e).toMap
    val make = byTag.get(0x010f).flatMap(ascii)
    val dt = byTag.get(0x0132).flatMap(ascii)
    val orient = byTag.get(0x0112).flatMap(short)
    val gps = byTag.get(0x8825).map(e => u32(e.valueAt)).filter(_ >= 0)
      .map(off => readIfd(origin + off.toInt)).getOrElse(Nil)
    val gpsByTag = gps.map(e => e.tag -> e).toMap
    def signed(refTag: Int, valTag: Int, neg: String): Option[Long] = for {
      v <- gpsByTag.get(valTag).flatMap(rationalE6)
      r <- gpsByTag.get(refTag).flatMap(ascii)
    } yield if (r == neg) -v else v
    ExifData(make, dt, orient,
      signed(0x0001, 0x0002, "S"), signed(0x0003, 0x0004, "W"))
  }
}
