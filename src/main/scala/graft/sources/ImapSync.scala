package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, InputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets
import javax.net.ssl.SSLSocketFactory

/** IMAP4rev1 incremental mail synchronization over a real socket — the
  * reference's `EmailSynchronizer` model
  * (`core/src/main/com/thymeflow/sync/EmailSynchronizer.scala:35-761`):
  * a folder cursor is (UIDVALIDITY, known UID set); each round SELECTs
  * the folder, diffs `UID SEARCH ALL` against the known set, fetches
  * only NEW messages (`UID FETCH n (BODY[])`, literal syntax), reports
  * vanished UIDs as removals, and treats a UIDVALIDITY change as a full
  * resync (every old UID invalid — the IMAP contract the reference
  * honors with its uid-validity tracking).
  *
  * The protocol subset spoken: LOGIN, SELECT, UID SEARCH ALL,
  * UID FETCH (BODY[]), LOGOUT — tagged commands, untagged `*` responses,
  * and `{n}` byte-count literals read from the raw stream. Like
  * [[DavSync]], the client is the driver-side I/O leg; fetched bodies
  * feed the distributed email converter
  * ([[graft.convert.Converters.email]]) as `(id, rfc822)` pairs.
  */
object ImapSync {

  /** Folder cursor. */
  final case class ImapState(uidValidity: Long = -1L, knownUids: Set[Long] = Set.empty)

  /** One round's outcome: (uid, rfc822-body) for new messages, vanished
    * uids, advanced cursor, and whether UIDVALIDITY forced a resync. */
  final case class ImapDelta(fetched: Seq[(Long, String)], removed: Seq[Long],
      state: ImapState, resync: Boolean)

  /** One logical response: physical-line fragments joined with a space,
    * `{n}` literals kept aside in order. */
  private final case class RespLine(text: String, literals: List[String])

  /** Line/literal reader for the IMAP stream (CRLF lines, raw literals). */
  private final class Lines(in: InputStream) {
    def readLine(): String = {
      val sb = new java.lang.StringBuilder
      var c = in.read()
      while (c != -1 && c != '\n') {
        if (c != '\r') sb.append(c.toChar)
        c = in.read()
      }
      sb.toString
    }
    def readLiteral(n: Int): String = {
      val buf = new Array[Byte](n)
      var off = 0
      while (off < n) {
        val k = in.read(buf, off, n - off)
        require(k >= 0, "stream closed inside literal")
        off += k
      }
      new String(buf, StandardCharsets.UTF_8)
    }
  }

  private val LiteralTail = """\{(\d+)\}$""".r

  /** Encode one command argument as an IMAP astring: a quoted string
    * (backslash/quote escaped) when the value is printable ASCII, else a
    * `{n}` synchronizing literal (the only form that can carry CR/LF or
    * 8-bit bytes). Never interpolated raw — a password containing a
    * space or CRLF can neither break the command nor inject lines. */
  private[sources] sealed trait Arg
  private[sources] final case class Quoted(text: String) extends Arg
  private[sources] final case class Literal(bytes: Array[Byte]) extends Arg
  private[sources] def encodeArg(v: String): Arg =
    if (v.forall(c => c >= 0x20 && c <= 0x7e))
      Quoted("\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
    else Literal(v.getBytes(StandardCharsets.UTF_8))

  /** One incremental sync round. `tls = true` connects IMAPS via the
    * default [[SSLSocketFactory]] (the reference's store config carries
    * the same boolean — mail.imap vs mail.imaps). */
  def sync(host: String, port: Int, user: String, password: String,
      folder: String, state: ImapState, tls: Boolean = false): ImapDelta = {
    val socket =
      if (tls) SSLSocketFactory.getDefault.createSocket(host, port)
      else new Socket(host, port)
    try {
      val in = new Lines(new BufferedInputStream(socket.getInputStream))
      val out = new BufferedOutputStream(socket.getOutputStream)
      var tagN = 0
      def command(text: String, args: Seq[String] = Nil): Seq[RespLine] = {
        tagN += 1
        val tag = s"a$tagN"
        out.write(s"$tag $text".getBytes(StandardCharsets.UTF_8))
        args.foreach { a =>
          out.write(' ')
          encodeArg(a) match {
            case Quoted(q) => out.write(q.getBytes(StandardCharsets.UTF_8))
            case Literal(b) =>
              // synchronizing literal: announce the byte count, wait for
              // the server's `+` continuation, then send the raw bytes
              out.write(s"{${b.length}}\r\n".getBytes(StandardCharsets.UTF_8))
              out.flush()
              val cont = in.readLine()
              require(cont.startsWith("+"), s"expected continuation, got: $cont")
              out.write(b)
          }
        }
        out.write("\r\n".getBytes(StandardCharsets.UTF_8))
        out.flush()
        val lines = scala.collection.mutable.ListBuffer[RespLine]()
        var done = false
        while (!done) {
          // one logical response: a physical line ending `{n}` is
          // followed by n raw bytes, then the response continues on the
          // next physical line
          var frag = in.readLine()
          val parts = new java.lang.StringBuilder(frag)
          val lits = scala.collection.mutable.ListBuffer[String]()
          var m = LiteralTail.findFirstMatchIn(frag)
          while (m.isDefined) {
            lits += in.readLiteral(m.get.group(1).toInt)
            frag = in.readLine()
            parts.append(" ").append(frag)
            m = LiteralTail.findFirstMatchIn(frag)
          }
          val line = parts.toString
          if (line.startsWith(tag + " ")) {
            require(line.startsWith(tag + " OK"), s"IMAP error: $line")
            done = true
          } else lines += RespLine(line, lits.toList)
        }
        lines.toList
      }

      in.readLine() // * OK greeting
      command("LOGIN", Seq(user, password))
      val selected = command("SELECT", Seq(folder))
      val uidValidity = selected.map(_.text).collectFirst {
        case l if l.contains("UIDVALIDITY") =>
          """UIDVALIDITY (\d+)""".r.findFirstMatchIn(l).get.group(1).toLong
      }.getOrElse(sys.error("SELECT returned no UIDVALIDITY"))

      // UIDVALIDITY change = every cached UID is invalid (full resync)
      val resync = state.uidValidity >= 0 && uidValidity != state.uidValidity
      val known = if (resync) Set.empty[Long] else state.knownUids

      val current = command("UID SEARCH ALL").map(_.text).collectFirst {
        case l if l.startsWith("* SEARCH") =>
          l.stripPrefix("* SEARCH").trim.split("\\s+").filter(_.nonEmpty)
            .map(_.toLong).toSet
      }.getOrElse(Set.empty[Long])

      val newUids = (current -- known).toSeq.sorted
      val removed = ((known -- current) ++
        (if (resync) state.knownUids else Set.empty)).toSeq.sorted

      val fetched = newUids.map { uid =>
        val body = command(s"UID FETCH $uid (BODY[])")
          .collectFirst { case RespLine(_, lit :: _) => lit }
          .getOrElse(sys.error(s"FETCH $uid returned no literal"))
        uid -> body
      }
      command("LOGOUT")
      ImapDelta(fetched, removed, ImapState(uidValidity, current), resync)
    } finally socket.close()
  }
}
