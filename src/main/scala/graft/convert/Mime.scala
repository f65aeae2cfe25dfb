package graft.convert

import java.nio.charset.{Charset, StandardCharsets}
import java.util.Base64

/** Minimal pure-JVM MIME parser for email bodies — the structure the
  * reference walks through javax.mail
  * (`core/src/main/com/thymeflow/sync/converter/EmailMessageConverter
  * .scala:125-158`: multipart recursion, attachment skip, text/plain
  * extraction, nested message/rfc822). Hand-rolled because ingestion runs
  * inside Dataset.flatMap on executors: the parser is a pure function of
  * the raw message string, no mail session, nothing driver-side.
  *
  * Covers the structures personal-mail corpora are made of: nested
  * multipart entities with boundaries, base64 and quoted-printable
  * content-transfer-encodings, charset-aware text decode, RFC 2047
  * encoded-word headers.
  */
object Mime {

  /** One MIME entity: leaf text (decoded) or multipart children. */
  final case class Part(
      headers: Map[String, List[String]],
      mimeType: String, // lowercase, e.g. "text/plain"
      params: Map[String, String], // content-type parameters, lowercase keys
      text: Option[String], // decoded body for text/* leaves
      rawBody: String, // undecoded body slice (nested message parsing)
      children: List[Part]) {
    def isAttachment: Boolean =
      headers.get("content-disposition").exists(_.exists(
        _.trim.toLowerCase.startsWith("attachment")))
  }

  /** Header block parse with RFC 5322 unfolding; keys lowercased, values
    * in document order. */
  def parseHeaders(headerPart: String): Map[String, List[String]] = {
    val unfolded = headerPart.replaceAll("\r?\n[ \t]+", " ")
    unfolded.split("\r?\n").toList
      .flatMap { line =>
        val idx = line.indexOf(':')
        if (idx <= 0) None
        else Some(line.substring(0, idx).trim.toLowerCase -> line.substring(idx + 1).trim)
      }
      .groupMap(_._1)(_._2)
  }

  /** Content-Type split: ("text/plain", Map("charset" -> "utf-8", ...)). */
  def contentType(headers: Map[String, List[String]]): (String, Map[String, String]) =
    headers.get("content-type").flatMap(_.headOption) match {
      case None => ("text/plain", Map.empty)
      case Some(v) =>
        val segs = v.split(";").toList
        val mime = segs.head.trim.toLowerCase
        val params = segs.tail.flatMap { p =>
          p.split("=", 2) match {
            case Array(k, value) =>
              Some(k.trim.toLowerCase -> value.trim.stripPrefix("\"").stripSuffix("\""))
            case _ => None
          }
        }.toMap
        (if (mime.isEmpty) "text/plain" else mime, params)
    }

  private def charsetOf(params: Map[String, String]): Charset =
    params.get("charset").flatMap { name =>
      try Some(Charset.forName(name)) catch { case _: Exception => None }
    }.getOrElse(StandardCharsets.UTF_8)

  /** Quoted-printable decode (RFC 2045 §6.7): =XX hex escapes and soft
    * line breaks; `underscoreIsSpace` enables the RFC 2047 Q variant. */
  def decodeQuotedPrintable(s: String, cs: Charset,
      underscoreIsSpace: Boolean = false): String = {
    val out = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '=' && i + 1 < s.length && (s.charAt(i + 1) == '\n' ||
          (s.charAt(i + 1) == '\r' && i + 2 < s.length && s.charAt(i + 2) == '\n'))) {
        i += (if (s.charAt(i + 1) == '\r') 3 else 2) // soft break
      } else if (c == '=' && i + 2 < s.length) {
        try {
          out.write(Integer.parseInt(s.substring(i + 1, i + 3), 16)); i += 3
        } catch { case _: NumberFormatException => out.write(c.toInt); i += 1 }
      } else if (c == '_' && underscoreIsSpace) { out.write(' '.toInt); i += 1 }
      else { out.write(c.toInt & 0xff); i += 1 }
    }
    new String(out.toByteArray, cs)
  }

  /** Body decode per Content-Transfer-Encoding. */
  def decodeBody(raw: String, headers: Map[String, List[String]], cs: Charset): String =
    headers.get("content-transfer-encoding").flatMap(_.headOption)
      .map(_.trim.toLowerCase).getOrElse("7bit") match {
      case "base64" =>
        try new String(Base64.getMimeDecoder.decode(raw.replaceAll("\\s", "")), cs)
        catch { case _: IllegalArgumentException => raw }
      case "quoted-printable" => decodeQuotedPrintable(raw, cs)
      case _ => raw
    }

  private val EncodedWord = """=\?([^?]+)\?([BbQq])\?([^?]*)\?=""".r

  /** RFC 2047 encoded-word decode for headers (Subject, display names). */
  def decodeEncodedWords(s: String): String = {
    // adjacent encoded words are concatenated without the separating space
    val joined = s.replaceAll("""\?=\s+=\?""", "?==?")
    EncodedWord.replaceAllIn(joined, m => {
      val cs = try Charset.forName(m.group(1)) catch { case _: Exception => StandardCharsets.UTF_8 }
      val decoded = m.group(2).toUpperCase match {
        case "B" =>
          try new String(Base64.getMimeDecoder.decode(m.group(3)), cs)
          catch { case _: IllegalArgumentException => m.group(3) }
        case _ => decodeQuotedPrintable(m.group(3), cs, underscoreIsSpace = true)
      }
      java.util.regex.Matcher.quoteReplacement(decoded)
    })
  }

  /** Parse a full RFC 5322 message (headers + body, recursively). */
  def parseMessage(raw: String): Part = {
    val split = raw.split("\r?\n\r?\n", 2)
    val headers = parseHeaders(split(0))
    val body = if (split.length > 1) split(1) else ""
    parseEntity(headers, body)
  }

  private def parseEntity(headers: Map[String, List[String]], body: String): Part = {
    val (mime, params) = contentType(headers)
    if (mime.startsWith("multipart/")) {
      val children = params.get("boundary") match {
        case None => Nil
        case Some(b) =>
          // the close delimiter --b-- ENDS the multipart: cut the body at
          // its first occurrence so the epilogue can never become a
          // header-less extra part, then split the remainder at plain
          // delimiter lines; preamble (index 0) is dropped too
          // (RFC 2046 §5.1.1)
          val delim = "--" + b
          val quoted = java.util.regex.Pattern.quote(delim)
          val effective = ("(?m)^" + quoted + "--").r
            .findFirstMatchIn(body).map(m => body.substring(0, m.start))
            .getOrElse(body)
          val segments = effective.split("(?m)^" + quoted + "[ \t]*\r?\n?")
          segments.drop(1).toList.filter(_.nonEmpty).map { seg =>
            val split = seg.split("\r?\n\r?\n", 2)
            val h = parseHeaders(split(0))
            parseEntity(h, if (split.length > 1) split(1) else "")
          }
      }
      Part(headers, mime, params, None, body, children)
    } else if (mime.startsWith("text/")) {
      Part(headers, mime, params, Some(decodeBody(body, headers, charsetOf(params))),
        body, Nil)
    } else Part(headers, mime, params, None, body, Nil)
  }

  /** All non-attachment text/plain bodies in reading order — what the
    * reference emits as schema:text (`EmailMessageConverter.scala:148-155`);
    * for multipart/alternative only the plain-text alternative is taken. */
  def plainTextParts(part: Part): List[String] =
    if (part.isAttachment) Nil
    else if (part.mimeType == "text/plain") part.text.toList
    else if (part.mimeType == "multipart/alternative")
      part.children.find(c => c.mimeType == "text/plain" && !c.isAttachment)
        .flatMap(_.text).toList
    else part.children.flatMap(plainTextParts)

  /** Nested message/rfc822 parts (skipping attachments), parsed. */
  def nestedMessages(part: Part): List[Part] =
    if (part.isAttachment) Nil
    else if (part.mimeType == "message/rfc822") List(parseMessage(part.rawBody))
    else part.children.flatMap(nestedMessages)
}
