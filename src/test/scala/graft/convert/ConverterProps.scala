package graft.convert

import scala.util.Random

import graft.SparkSpec
import graft.rdf.Quad

/** Generative round-trip properties for the converter inverses (r14
  * verdict #4): structured random contacts/events — escape-heavy values
  * (backslashes, separators, newlines, unicode), multi-valued properties,
  * quoted parameters, folded lines, mixed date-time forms — must come
  * back GRAPH-IDENTICAL through parse → write-back → parse:
  *
  *   text ──vcard/ical──▶ quads ──VcardWrite/IcalWrite──▶ text' ──parse──▶ quads'
  *   assert quads == quads' (as sets, per document graph)
  *
  * This is exactly the bug class the RFC 6350/5545 TEXT-escape fixes of
  * rounds 11-12 patched pointwise, plus the r14 review's quoted-param and
  * `\\;`-split findings — here pinned over a seeded random corpus instead
  * of golden cases. Deterministic (fixed seeds), so failures replay. */
class ConverterProps extends SparkSpec {
  import spark.implicits._

  /** Value alphabet: escape-relevant chars, separators, unicode, quotes. */
  private val ValueChars =
    "abcXYZ 019éüß中\\;,\n:'\"-.".toIndexedSeq
  /** Param-value alphabet (RFC 5545 §3.2: no DQUOTE, no line breaks). */
  // includes DQUOTE, caret and newline: RFC 6868 caret-escaping must
  // carry them through parse→write→parse graph-identically (r14 ADVICE)
  private val ParamChars = "abcXYZ 019éü中;,:'-.\"^\n".toIndexedSeq

  private def rnd(r: Random, chars: IndexedSeq[Char], max: Int = 14): String =
    (0 until (1 + r.nextInt(max))).map(_ => chars(r.nextInt(chars.length))).mkString

  /** RFC 6350/5545 TEXT escape — the serializer side of the generator
    * (kept independent of the production writers on purpose). */
  private def esc(v: String): String =
    v.replace("\\", "\\\\").replace("\n", "\\n").replace(",", "\\,")
      .replace(";", "\\;")

  /** RFC 5545 §3.2 param value — RFC 6868 caret-encoded (an independent
    * restatement of the escaping, NOT a call into the writer under test),
    * quoted when it contains ':' ';' ','. */
  private def param(v: String): String = {
    val enc = v.flatMap {
      case '^' => "^^"
      case '\n' => "^n"
      case '"' => "^'"
      case c => c.toString
    }
    if (enc.exists(c => c == ':' || c == ';' || c == ',')) "\"" + enc + "\"" else enc
  }

  /** Random RFC folding: long content lines split with CRLF + space,
    * including mid-escape splits (legal: unfolding precedes parsing). */
  private def fold(line: String, r: Random): String =
    if (line.length < 24 || r.nextBoolean()) line
    else line.grouped(12 + r.nextInt(25)).mkString("\r\n ")

  private def parseVcard(docs: Seq[(String, String)]): Map[String, Set[Quad]] =
    Converters.vcard(docs.toDS()).collect().toSeq.groupBy(_.g).view
      .mapValues(_.toSet).toMap

  private def parseIcal(docs: Seq[(String, String)]): Map[String, Set[Quad]] =
    Converters.ical(docs.toDS()).collect().toSeq.groupBy(_.g).view
      .mapValues(_.toSet).toMap

  // ------------------------------------------------------------------ vcard

  private def genVcard(r: Random): String = {
    val lines = Seq.newBuilder[String]
    lines += "BEGIN:VCARD"
    lines += "VERSION:3.0"
    if (r.nextBoolean()) lines += s"UID:${esc(rnd(r, ValueChars))}"
    lines += s"FN:${esc(rnd(r, ValueChars))}" // FN is mandatory (identity anchor)
    if (r.nextBoolean()) {
      // N with up to 5 components, each escape-heavy (extra components are
      // legal and ignored by the reader)
      val comps = (0 until (1 + r.nextInt(5))).map(_ =>
        if (r.nextInt(4) == 0) "" else esc(rnd(r, ValueChars, 8)))
      lines += s"N:${comps.mkString(";")}"
    }
    (0 until r.nextInt(3)).foreach { i =>
      lines += s"EMAIL:u$i${r.nextInt(100)}@Ex${r.nextInt(10)}.ORG"
    }
    (0 until r.nextInt(3)).foreach { _ =>
      val types = r.shuffle(Seq("CELL", "FAX", "HOME", "PREF", "WORK", "VOICE",
        "X-FOO")).take(r.nextInt(3))
      val t = if (types.isEmpty) "" else types.mkString(";TYPE=", ",", "")
      lines += s"TEL$t:+1555${1000000 + r.nextInt(8999999)}"
    }
    if (r.nextBoolean()) lines += s"ORG:${esc(rnd(r, ValueChars))}"
    if (r.nextBoolean()) lines += s"BDAY:19${10 + r.nextInt(89)}-0${1 + r.nextInt(9)}-1${r.nextInt(9)}"
    lines += "END:VCARD"
    lines.result().map(fold(_, r)).mkString("\r\n")
  }

  "vcard round-trip" should "be graph-identical over a random corpus" in {
    val r = new Random(20260816L)
    val docs = (0 until 150).map(i => s"c$i" -> genVcard(r))
    val first = parseVcard(docs)
    first.size shouldBe 150 // every card produced at least its Agent quad
    val written = docs.map { case (id, _) =>
      id -> VcardWrite.fromQuads(first(s"doc:$id").toSeq)
    }
    val second = parseVcard(written)
    docs.foreach { case (id, raw) =>
      withClue(s"card $id\n--- input ---\n$raw\n--- written ---\n${written.toMap.apply(id)}\n") {
        second.getOrElse(s"doc:$id", Set.empty) shouldBe first(s"doc:$id")
      }
    }
  }

  // ------------------------------------------------------------------- ical

  private def genDt(r: Random): (String, String) = r.nextInt(6) match {
    case 0 => ("", f"20${10 + r.nextInt(30)}%02d0${1 + r.nextInt(9)}1${r.nextInt(9)}T${r.nextInt(24)}%02d${r.nextInt(60)}%02d${r.nextInt(60)}%02dZ")
    case 1 | 2 =>
      val tz = Seq("Europe/Paris", "America/New_York", "UTC", "Asia/Tokyo")(r.nextInt(4))
      val quoted = if (r.nextBoolean()) "\"" + tz + "\"" else tz
      (s";TZID=$quoted", f"20${10 + r.nextInt(30)}%02d0${1 + r.nextInt(9)}1${r.nextInt(9)}T${r.nextInt(24)}%02d${r.nextInt(60)}%02d${r.nextInt(60)}%02d")
    case 3 => ("", f"20${10 + r.nextInt(30)}%02d0${1 + r.nextInt(9)}1${r.nextInt(9)}")
    case 4 => ("", "not-a-date-" + r.nextInt(100)) // kept verbatim as a literal
    case _ => ("", f"20${10 + r.nextInt(30)}%02d0${1 + r.nextInt(9)}1${r.nextInt(9)}T${r.nextInt(24)}%02d${r.nextInt(60)}%02d${r.nextInt(60)}%02dZ")
  }

  private def genVevent(r: Random): String = {
    val lines = Seq.newBuilder[String]
    lines += "BEGIN:VEVENT"
    if (r.nextBoolean()) lines += s"UID:${esc(rnd(r, ValueChars))}"
    if (r.nextBoolean()) lines += s"SUMMARY:${esc(rnd(r, ValueChars))}"
    if (r.nextBoolean()) lines += s"DESCRIPTION:${esc(rnd(r, ValueChars, 40))}"
    if (r.nextInt(4) > 0) {
      val (p, v) = genDt(r)
      lines += s"DTSTART$p:$v"
    }
    if (r.nextBoolean()) {
      val (p, v) = genDt(r)
      lines += s"DTEND$p:$v"
    }
    if (r.nextBoolean()) lines += s"LOCATION:${esc(rnd(r, ValueChars))}"
    if (r.nextBoolean())
      lines += s"GEO:${r.nextInt(179) - 89}.${r.nextInt(9999)};${r.nextInt(359) - 179}.${r.nextInt(9999)}"
    (0 until r.nextInt(3)).foreach { i =>
      val cn = if (r.nextBoolean()) s";CN=${param(rnd(r, ParamChars))}" else ""
      val role = if (i == 0 && r.nextBoolean()) "ORGANIZER" else "ATTENDEE"
      lines += s"$role$cn:mailto:p$i${r.nextInt(100)}@Ev${r.nextInt(10)}.org"
    }
    lines += "END:VEVENT"
    lines.result().map(fold(_, r)).mkString("\r\n")
  }

  "ical round-trip" should "be graph-identical over a random corpus" in {
    val r = new Random(4711L)
    val docs = (0 until 150).map { i =>
      s"e$i" -> s"BEGIN:VCALENDAR\r\nVERSION:2.0\r\n${genVevent(r)}\r\nEND:VCALENDAR"
    }
    val first = parseIcal(docs)
    val written = docs.map { case (id, _) =>
      id -> IcalWrite.fromQuads(first.getOrElse(s"doc:$id", Set.empty).toSeq)
    }
    val second = parseIcal(written)
    docs.foreach { case (id, raw) =>
      withClue(s"event $id\n--- input ---\n$raw\n--- written ---\n${written.toMap.apply(id)}\n") {
        second.getOrElse(s"doc:$id", Set.empty) shouldBe
          first.getOrElse(s"doc:$id", Set.empty)
      }
    }
  }

  "vcard write-back" should "be idempotent on the quad graph (3 cycles)" in {
    val r = new Random(999L)
    val docs = (0 until 40).map(i => s"x$i" -> genVcard(r))
    var quads = parseVcard(docs)
    (0 until 3).foreach { _ =>
      val rewritten = docs.map { case (id, _) =>
        id -> VcardWrite.fromQuads(quads(s"doc:$id").toSeq)
      }
      val next = parseVcard(rewritten)
      docs.foreach { case (id, _) =>
        next.getOrElse(s"doc:$id", Set.empty) shouldBe quads(s"doc:$id")
      }
      quads = next
    }
  }
}
