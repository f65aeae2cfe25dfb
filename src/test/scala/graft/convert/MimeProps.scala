package graft.convert

import scala.util.Random

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Generative planted-content properties for the MIME parser — the email
  * leg of the converter fuzz program (vCard/iCal round-trip in
  * [[ConverterProps]]; email has no inverse serializer, so the property
  * is extraction: build a random MIME tree with KNOWN text parts, render
  * it with an independent serializer, and assert [[Mime]] recovers
  * exactly the planted plain-text bodies, in reading order, through
  * nested multiparts, base64/quoted-printable encodings, attachments
  * (skipped), multipart/alternative (plain alternative only), epilogues
  * and folded headers. Deterministic seeds — failures replay. */
class MimeProps extends AnyFlatSpec with Matchers {

  private val Bodies = IndexedSeq(
    "plain ascii body",
    "line one\r\nline two with = sign and trailing spaces  ",
    "unicode: déjà vu — 中文 текст",
    "equals=everywhere = yes=",
    "tabs\tandcontrol chars",
    "ends with equals=")

  private def b64(s: String): String =
    java.util.Base64.getMimeEncoder.encodeToString(s.getBytes("UTF-8"))

  /** Independent QP encoder (RFC 2045 §6.7): encode '=', non-ASCII and
    * controls; no soft breaks needed for our line lengths. */
  private def qp(s: String): String =
    s.getBytes("UTF-8").map { b =>
      val c = b & 0xff
      if (c == '='.toInt || c < 32 || c > 126) f"=${c}%02X"
      else c.toChar.toString
    }.mkString

  /** One leaf part: (headers+body text, plantedBody or None if it must
    * NOT be extracted). */
  private def leaf(r: Random, body: String,
      attachment: Boolean): (String, Option[String]) = {
    val enc = r.nextInt(3)
    val (cte, encoded) = enc match {
      case 0 => ("7bit", body)
      case 1 => ("base64", b64(body))
      case _ => ("quoted-printable", qp(body))
    }
    val disp = if (attachment) "Content-Disposition: attachment; filename=\"x.txt\"\r\n" else ""
    val text =
      s"Content-Type: text/plain; charset=utf-8\r\n" +
        s"Content-Transfer-Encoding: $cte\r\n" + disp + "\r\n" + encoded
    if (attachment) (text, None) else (text, Some(body))
  }

  /** The CRLF before a boundary delimiter belongs to the delimiter
    * (RFC 2046 §5.1.1); the parser keeps it on the part body — strip one
    * from each extracted text before comparing to the planted original. */
  private def norm(ts: List[String]): List[String] =
    ts.map(_.stripSuffix("\n").stripSuffix("\r"))

  /** Render a multipart with given children; returns (entity text without
    * top-level headers, planted bodies in order). */
  private def multipart(r: Random, depth: Int,
      boundary: String): (String, List[String]) = {
    val n = 1 + r.nextInt(3)
    val parts = (0 until n).map(_ => entity(r, depth + 1)).toList
    val preamble = if (r.nextBoolean()) "this is the preamble\r\n" else ""
    val epilogue = if (r.nextBoolean()) "\r\nthis is the epilogue, not a part" else ""
    val bodyText = preamble +
      parts.map(p => s"--$boundary\r\n${p._1}\r\n").mkString +
      s"--$boundary--" + epilogue
    (bodyText, parts.flatMap(_._2))
  }

  /** One entity: (headers+body, planted bodies). */
  private def entity(r: Random, depth: Int): (String, List[String]) = {
    val kind = if (depth >= 2) 0 else r.nextInt(4) // 0-1 leaf, 2 mixed, 3 alternative
    kind match {
      case 2 =>
        val b = s"b${depth}x${r.nextInt(1000)}"
        val (body, planted) = multipart(r, depth, b)
        (s"""Content-Type: multipart/mixed; boundary="$b"""" + "\r\n\r\n" + body, planted)
      case 3 =>
        // alternative: plain + html; only the PLAIN text may surface
        val b = s"a${depth}x${r.nextInt(1000)}"
        val plain = Bodies(r.nextInt(Bodies.length))
        val (leafText, planted) = leaf(r, plain, attachment = false)
        val html = "Content-Type: text/html\r\n\r\n<p>never this</p>"
        val body = s"--$b\r\n$html\r\n--$b\r\n$leafText\r\n--$b--"
        (s"""Content-Type: multipart/alternative; boundary="$b"""" + "\r\n\r\n" + body,
          planted.toList)
      case _ =>
        leaf(r, Bodies(r.nextInt(Bodies.length)), attachment = r.nextInt(4) == 0) match {
          case (t, p) => (t, p.toList)
        }
    }
  }

  "Mime.plainTextParts" should "recover exactly the planted bodies over random MIME trees" in {
    val r = new Random(20260814L)
    (0 until 300).foreach { i =>
      val (body, planted) = entity(r, 0)
      val raw = "From: a@b.example\r\nSubject: t\r\n" + body
      val parsed = Mime.parseMessage(raw)
      withClue(s"case $i\n--- raw ---\n$raw\n") {
        norm(Mime.plainTextParts(parsed)) shouldBe planted
      }
    }
  }

  it should "find planted nested message/rfc822 parts" in {
    val r = new Random(77L)
    (0 until 100).foreach { i =>
      val innerBody = Bodies(r.nextInt(3)) // ascii-only set for 7bit inner
      val inner = "From: x@y.example\r\nSubject: inner\r\n" +
        "Content-Type: text/plain\r\n\r\n" + innerBody
      val b = s"m$i"
      val raw = "Subject: outer\r\n" +
        s"""Content-Type: multipart/mixed; boundary="$b"""" + "\r\n\r\n" +
        s"--$b\r\nContent-Type: text/plain\r\n\r\nouter text\r\n" +
        s"--$b\r\nContent-Type: message/rfc822\r\n\r\n$inner\r\n--$b--"
      val nested = Mime.nestedMessages(Mime.parseMessage(raw))
      withClue(s"case $i\n$raw\n") {
        nested should have length 1
        norm(Mime.plainTextParts(nested.head)) shouldBe List(innerBody)
        nested.head.headers("subject") shouldBe List("inner")
      }
    }
  }

  it should "decode folded and encoded-word headers over random inputs" in {
    val r = new Random(4242L)
    val subjects = Seq("héllo wörld", "plain", "a b c d e f", "中文 subject")
    (0 until 100).foreach { i =>
      val s = subjects(r.nextInt(subjects.length))
      val encoded = r.nextInt(3) match {
        case 0 => s"=?UTF-8?B?${b64(s)}?="
        case 1 => s"=?UTF-8?Q?${qp(s).replace(" ", "_")}?="
        case _ if s.forall(c => c >= ' ' && c < 127) => s
        case _ => s"=?UTF-8?B?${b64(s)}?="
      }
      // fold the header at a space if it has one (RFC 5322 §2.2.3)
      val folded =
        if (encoded.contains(' ') && r.nextBoolean())
          encoded.replaceFirst(" ", "\r\n ")
        else encoded
      val raw = s"Subject: $folded\r\nFrom: a@b.example\r\n\r\nbody"
      val hs = Mime.parseMessage(raw).headers
      withClue(s"case $i subject [$folded]\n") {
        Mime.decodeEncodedWords(hs("subject").head) shouldBe s
      }
    }
  }
}
