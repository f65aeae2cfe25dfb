package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, InputStream}
import java.net.{Socket, SocketTimeoutException}
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
  * Two incrementality modes, mirroring the reference's two legs:
  *   - [[sync]]: poll-style — one connection per round, full
  *     `UID SEARCH ALL` diff. Simple, latency = poll interval.
  *   - [[idle]]: listener-driven — the reference registers JavaMail
  *     `MessageCountListener`/`MessageChangedListener`s and reacts to
  *     server pushes (`EmailSynchronizer.scala:35-761`); here the
  *     connection is parked in RFC 2177 `IDLE` and unsolicited
  *     `* n EXISTS` / `* n EXPUNGE` lines drive fetch-by-SEQUENCE-RANGE
  *     (`FETCH old+1:n (UID BODY[])`) — no UID SEARCH round per event,
  *     latency = server push.
  *
  * The protocol subset spoken: LOGIN, SELECT, UID SEARCH ALL,
  * UID FETCH / FETCH (BODY[]), IDLE/DONE, LOGOUT — tagged commands,
  * untagged `*` responses, and `{n}` byte-count literals read from the
  * raw stream. Like [[DavSync]], the client is the driver-side I/O leg;
  * fetched bodies feed the distributed email converter
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
      // EOF before any character = the peer closed the connection: an
      // IOException like any other dropped-socket shape, NOT an empty
      // line (which the protocol handlers would misparse as a response)
      if (c == -1) throw new java.io.EOFException("IMAP connection closed")
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

  /** Driver-side session: tagged-command plumbing shared by [[sync]]
    * (one command round-trip at a time) and [[idle]] (which also needs
    * raw line access while parked between a `+ idling` continuation and
    * its `DONE`). */
  private final class Session(host: String, port: Int, tls: Boolean) {
    val socket: Socket =
      if (tls) SSLSocketFactory.getDefault.createSocket(host, port)
      else new Socket(host, port)
    private val in = new Lines(new BufferedInputStream(socket.getInputStream))
    private val out = new BufferedOutputStream(socket.getOutputStream)
    private var tagN = 0
    in.readLine() // * OK greeting

    def nextTag(): String = { tagN += 1; s"a$tagN" }

    def sendRaw(s: String): Unit = {
      out.write(s.getBytes(StandardCharsets.UTF_8)); out.flush()
    }

    // a gracefully-closed connection surfaces as EOFException from
    // Lines.readLine (it previously returned "", which the IDLE loop
    // misparsed as a malformed response instead of a dead socket)
    def readPhysical(): String = in.readLine()

    /** One logical response line: a physical line ending `{n}` is
      * followed by n raw bytes, then continues on the next line. */
    def readLogical(): RespLine = {
      var frag = readPhysical()
      val parts = new java.lang.StringBuilder(frag)
      val lits = scala.collection.mutable.ListBuffer[String]()
      var m = LiteralTail.findFirstMatchIn(frag)
      while (m.isDefined) {
        lits += in.readLiteral(m.get.group(1).toInt)
        frag = readPhysical()
        parts.append(" ").append(frag)
        m = LiteralTail.findFirstMatchIn(frag)
      }
      RespLine(parts.toString, lits.toList)
    }

    /** Send a tagged command, return the untagged responses up to (and
      * asserting) its `OK` completion. */
    def command(text: String, args: Seq[String] = Nil): Seq[RespLine] = {
      val tag = nextTag()
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
            val cont = readPhysical()
            require(cont.startsWith("+"), s"expected continuation, got: $cont")
            out.write(b)
        }
      }
      out.write("\r\n".getBytes(StandardCharsets.UTF_8))
      out.flush()
      drainUntilOk(tag)
    }

    /** Read logical responses until `tag OK`; error on anything else
      * tagged. */
    def drainUntilOk(tag: String): Seq[RespLine] = {
      val lines = scala.collection.mutable.ListBuffer[RespLine]()
      var done = false
      while (!done) {
        val r = readLogical()
        if (r.text.startsWith(tag + " ")) {
          require(r.text.startsWith(tag + " OK"), s"IMAP error: ${r.text}")
          done = true
        } else lines += r
      }
      lines.toList
    }

    def close(): Unit = socket.close()
  }

  /** SELECT the folder; returns (uidValidity, exists-count). */
  private def select(s: Session, folder: String): (Long, Int) = {
    val selected = s.command("SELECT", Seq(folder))
    val uidValidity = selected.map(_.text).collectFirst {
      case l if l.contains("UIDVALIDITY") =>
        """UIDVALIDITY (\d+)""".r.findFirstMatchIn(l).get.group(1).toLong
    }.getOrElse(sys.error("SELECT returned no UIDVALIDITY"))
    val exists = selected.map(_.text).collectFirst {
      case l if l.endsWith(" EXISTS") =>
        """\* (\d+) EXISTS""".r.findFirstMatchIn(l).get.group(1).toInt
    }.getOrElse(0)
    (uidValidity, exists)
  }

  /** One incremental sync round. `tls = true` connects IMAPS via the
    * default [[SSLSocketFactory]] (the reference's store config carries
    * the same boolean — mail.imap vs mail.imaps). */
  def sync(host: String, port: Int, user: String, password: String,
      folder: String, state: ImapState, tls: Boolean = false): ImapDelta = {
    val s = new Session(host, port, tls)
    try {
      s.command("LOGIN", Seq(user, password))
      val (uidValidity, _) = select(s, folder)

      // UIDVALIDITY change = every cached UID is invalid (full resync)
      val resync = state.uidValidity >= 0 && uidValidity != state.uidValidity
      val known = if (resync) Set.empty[Long] else state.knownUids

      val current = s.command("UID SEARCH ALL").map(_.text).collectFirst {
        case l if l.startsWith("* SEARCH") =>
          l.stripPrefix("* SEARCH").trim.split("\\s+").filter(_.nonEmpty)
            .map(_.toLong).toSet
      }.getOrElse(Set.empty[Long])

      val newUids = (current -- known).toSeq.sorted
      val removed = ((known -- current) ++
        (if (resync) state.knownUids else Set.empty)).toSeq.sorted

      val fetched = newUids.map { uid =>
        val body = s.command(s"UID FETCH $uid (BODY[])")
          .collectFirst { case RespLine(_, lit :: _) => lit }
          .getOrElse(sys.error(s"FETCH $uid returned no literal"))
        uid -> body
      }
      s.command("LOGOUT")
      ImapDelta(fetched, removed, ImapState(uidValidity, current), resync)
    } finally s.close()
  }

  private val UidInFetch = """UID (\d+)""".r
  private val ExistsLine = """\* (\d+) EXISTS""".r
  private val ExpungeLine = """\* (\d+) EXPUNGE""".r

  /** Listener-driven incrementality (RFC 2177): one connection performs
    * the initial `UID SEARCH ALL` diff (seeding the sequence→UID map —
    * UID order is sequence order within a selected mailbox), then parks
    * in `IDLE` and reacts to server pushes:
    *
    *   - `* n EXISTS` with n past the known count → `DONE`, then
    *     `FETCH old+1:n (UID BODY[])` by SEQUENCE range — the new
    *     messages land WITHOUT a UID SEARCH round — then re-IDLE.
    *   - `* n EXPUNGE` → the nth sequence entry is removed (reported in
    *     the delta's `removed`); remaining sequence numbers shift down,
    *     per the IMAP expunge contract.
    *
    * Returns after `maxEvents` push notifications have been processed or
    * `timeoutMillis` elapses with no event, whichever first — callers
    * loop for a long-lived listener (each returned cursor resumes
    * exactly). The poll fallback is just [[sync]] with the same cursor:
    * both speak (UIDVALIDITY, UID set), so a deployment can mix IDLE
    * where the server supports it and polling where it doesn't. */
  def idle(host: String, port: Int, user: String, password: String,
      folder: String, state: ImapState, maxEvents: Int = 1,
      timeoutMillis: Int = 30000, tls: Boolean = false): ImapDelta = {
    val s = new Session(host, port, tls)
    try {
      s.command("LOGIN", Seq(user, password))
      val (uidValidity, _) = select(s, folder)
      val resync = state.uidValidity >= 0 && uidValidity != state.uidValidity
      val known = if (resync) Set.empty[Long] else state.knownUids

      // seed the sequence->uid map; initial diff as in sync()
      val seqUids = scala.collection.mutable.ArrayBuffer[Long]()
      s.command("UID SEARCH ALL").map(_.text).collectFirst {
        case l if l.startsWith("* SEARCH") =>
          l.stripPrefix("* SEARCH").trim.split("\\s+").filter(_.nonEmpty)
            .map(_.toLong).sorted.foreach(seqUids += _)
      }
      val fetched = scala.collection.mutable.ArrayBuffer[(Long, String)]()
      val removed = scala.collection.mutable.ArrayBuffer[Long]()
      removed ++= ((known -- seqUids) ++
        (if (resync) state.knownUids else Set.empty)).toSeq.sorted
      (seqUids.toSet -- known).toSeq.sorted.foreach { uid =>
        val body = s.command(s"UID FETCH $uid (BODY[])")
          .collectFirst { case RespLine(_, lit :: _) => lit }
          .getOrElse(sys.error(s"FETCH $uid returned no literal"))
        fetched += uid -> body
      }

      // Notifications can surface anywhere — before the IDLE continuation,
      // racing the DONE, or interleaved inside a FETCH response (all legal
      // per RFC 3501 §7) — so every one funnels through a single queue
      // processed in arrival order.
      val pending = scala.collection.mutable.Queue[String]()

      /** Fetch sequence range lo..hi by SEQUENCE number, appending
        * (uid, body) pairs and growing the seq map. Responses to OUR
        * fetch carry a BODY[] literal; everything else interleaved in
        * the round — EXISTS/RECENT lines AND unilateral flags-only
        * `* n FETCH (FLAGS ...)` updates (RFC 3501 §7.4.2) — is chatter
        * that feeds the pending queue instead of aborting the sync. */
      def fetchRange(lo: Int, hi: Int): Unit =
        s.command(s"FETCH $lo:$hi (UID BODY[])").foreach {
          case RespLine(text, lit :: _) if text.contains("BODY[") =>
            val uid = UidInFetch.findFirstMatchIn(text)
              .getOrElse(sys.error(s"FETCH response without UID: $text"))
              .group(1).toLong
            seqUids += uid
            fetched += uid -> lit
          case RespLine(text, _) if text.contains("BODY[") =>
            sys.error(s"FETCH response without literal: $text")
          case r => pending += r.text // EXISTS/RECENT/flags-FETCH chatter
        }

      var events = 0
      var parked = true
      // absolute park deadline: each round's read timeout is the
      // REMAINING budget, so non-event chatter (unilateral flags-only
      // FETCH updates, RECENT) cannot re-arm the full timeout — pre-fix,
      // a neighbor client toggling flags every few seconds kept sawAny
      // true forever and idle() never returned to its caller
      val idleDeadline = System.nanoTime() + timeoutMillis.toLong * 1000000L
      // don't start a round with less budget than a prompt protocol
      // exchange needs: the remaining-budget soTimeout also governed the
      // IDLE-continuation read and the post-DONE drain, and a 1 ms
      // last-round timeout there threw SocketTimeoutException out of
      // idle(), losing the round's already-accumulated fetched/removed
      // events instead of returning the delta
      val minRoundMs = 500
      // the 500 ms floor protects LATER rounds (whose accumulated events
      // would be lost to a SocketTimeoutException mid-drain); on ENTRY
      // there is nothing accumulated yet, so the first round always parks —
      // its soTimeout is ALSO floored at minRoundMs (not 1 ms: a remaining
      // budget shorter than the server's RTT would time out the
      // IDLE-continuation read below and throw away the seeding diff).
      // A caller with timeoutMillis < 500 gets exactly one short
      // (~minRoundMs-bounded) park instead of silently never parking.
      var firstRound = true
      while (parked && events < maxEvents &&
          { val rem = ((idleDeadline - System.nanoTime()) / 1000000L).toInt
            if (!firstRound && rem < minRoundMs) { parked = false; false }
            else { s.socket.setSoTimeout(math.max(rem, minRoundMs)); firstRound = false; true } }) {
        val tag = s.nextTag()
        s.sendRaw(s"$tag IDLE\r\n")
        // untagged responses may precede the '+' continuation — buffer
        // them; only a tagged status line means IDLE was rejected. The
        // floor above makes a timeout here unlikely but not impossible
        // (slow server): treat it like a timed-out park — best-effort
        // DONE/drain, keep everything accumulated, return the delta —
        // rather than letting the exception destroy the seeding diff.
        // A DROPPED connection (plain IOException, not a timeout) anywhere
        // mid-IDLE must also preserve the accumulated delta (r14 ADVICE:
        // only SocketTimeoutException was caught, so a dead socket threw
        // away the seeding diff this comment promises to keep). The
        // socket is unusable then: skip the DONE/drain exchange entirely
        // and fall through to the dequeue + return. Order matters in the
        // catches — SocketTimeoutException IS an IOException.
        var dead = false
        val contOk =
          try {
            var cont = s.readPhysical()
            while (!cont.startsWith("+")) {
              require(cont.startsWith("*"), s"IDLE not accepted: $cont")
              pending += cont
              cont = s.readPhysical()
            }
            true
          } catch {
            case _: SocketTimeoutException =>
              parked = false
              // timeout: the socket is alive, best-effort DONE + drain
              try {
                s.sendRaw("DONE\r\n")
                pending ++= s.drainUntilOk(tag).map(_.text)
              } catch {
                case _: SocketTimeoutException => ()
                case _: java.io.IOException => dead = true
              }
              false
            case _: java.io.IOException =>
              parked = false; dead = true; false
          }
        // park until one unsolicited line arrives (or timeout), unless
        // notifications already queued up before the continuation
        val note =
          if (!contOk || pending.nonEmpty) None
          else
            try Some(s.readPhysical())
            catch {
              case _: SocketTimeoutException => None
              case _: java.io.IOException =>
                parked = false; dead = true; None
            }
        // note lines join `pending` BEFORE the drain attempt so a
        // connection dying inside DONE/drain cannot drop them
        pending ++= note.toList
        // DONE-to-OK is a prompt exchange, not a budget-bounded park: give
        // it a sane floor so a nearly-spent deadline can't starve the
        // drain mid-round (the events gathered this round are already in
        // `pending`/`fetched` and must reach the caller). The !contOk
        // branch already sent its best-effort DONE and drained.
        if (contOk && !dead) {
          try {
            s.socket.setSoTimeout(math.max(
              ((idleDeadline - System.nanoTime()) / 1000000L).toInt, minRoundMs))
            s.sendRaw("DONE\r\n")
            // notifications racing the DONE surface while draining; queue all
            pending ++= s.drainUntilOk(tag).map(_.text)
          } catch {
            case _: SocketTimeoutException => parked = false
            case _: java.io.IOException => parked = false; dead = true
          }
        }
        val sawAny = pending.nonEmpty
        while (pending.nonEmpty) {
          pending.dequeue() match {
            case ExistsLine(n) if n.toInt > seqUids.length =>
              events += 1
              // on a dead connection the fetch cannot run; leaving the
              // new sequence numbers out of the returned state makes the
              // next sync's seeding diff pick the messages up
              if (!dead)
                try fetchRange(seqUids.length + 1, n.toInt)
                catch {
                  case _: java.io.IOException => dead = true; parked = false
                }
            case ExpungeLine(n) =>
              events += 1
              val uid = seqUids.remove(n.toInt - 1)
              removed += uid
            case _ => () // EXISTS <= known count, RECENT, FLAGS chatter
          }
        }
        if (!sawAny) parked = false // timed out: hand back the cursor
      }
      // best-effort courtesy on a possibly-dead connection: the delta
      // below must reach the caller even when LOGOUT cannot
      try s.command("LOGOUT")
      catch { case _: java.io.IOException => () }
      ImapDelta(fetched.toList, removed.toList,
        ImapState(uidValidity, seqUids.toSet), resync)
    } finally s.close()
  }
}
