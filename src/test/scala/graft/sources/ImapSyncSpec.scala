package graft.sources

import java.io.{BufferedReader, InputStreamReader, PrintStream}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets

import graft.SparkSpec

/** Real-protocol IMAP sync against a scripted IMAP4rev1 server (plain
  * ServerSocket): tagged commands, UIDVALIDITY tracking, UID SEARCH
  * diffing, literal-syntax FETCH — the reference EmailSynchronizer's
  * incremental model end-to-end, with fetched RFC-822 bodies flowing
  * into the distributed email converter. */
class ImapSyncSpec extends SparkSpec {
  import spark.implicits._

  private final class FakeImap {
    var uidValidity = 7L
    val mailbox = scala.collection.mutable.LinkedHashMap[Long, String]()
    var fetchedUids: List[Long] = Nil
    @volatile var lastLogin: String = null
    @volatile var searches = 0
    @volatile var idleCount = 0
    /** One-shot: untagged line emitted BEFORE the next IDLE's `+`. */
    @volatile var pushBeforeContinuation: String = null
    /** One-shot: swallow the next IDLE's `+` continuation entirely (the
      * client must time out, DONE, and still deliver its delta). */
    @volatile var muteNextIdleContinuation = false
    /** One-shot: close the connection on the next IDLE — the dropped-
      * connection shape (EOF/IOException, not a timeout). */
    @volatile var dropOnNextIdle = false
    /** One-shot: untagged chatter interleaved inside the next seq FETCH. */
    @volatile var fetchChatter: String = null
    @volatile private var idleOut: PrintStream = null
    /** Push an unsolicited line to the client parked in IDLE. */
    def push(line: String): Unit = {
      val o = idleOut
      require(o != null, "no client in IDLE")
      o.print(line + "\r\n")
    }

    private val server = new ServerSocket(0)
    def port: Int = server.getLocalPort
    def stop(): Unit = server.close()

    private val thread = new Thread(() => {
      try while (true) {
        val s = server.accept()
        val in = new BufferedReader(new InputStreamReader(s.getInputStream, StandardCharsets.UTF_8))
        val out = new PrintStream(s.getOutputStream, true, "UTF-8")
        out.print("* OK fake IMAP ready\r\n")
        var line = in.readLine()
        var idleTag: String = null
        while (line != null) {
          val parts = line.split(" ", 3)
          val tag = parts(0)
          val cmd = (parts.lift(1).getOrElse("") + " " +
            parts.lift(2).getOrElse("")).trim.toUpperCase
          if (line == "DONE" && idleTag != null) {
            idleOut = null
            out.print(s"$idleTag OK idle finished\r\n")
            idleTag = null
          }
          else if (cmd.startsWith("IDLE")) {
            idleCount += 1
            if (dropOnNextIdle) {
              // dead-connection shape: close without any continuation —
              // the client's next read sees EOF, a plain IOException
              dropOnNextIdle = false
              s.close()
              line = null
            } else {
              val pre = pushBeforeContinuation
              if (pre != null) { pushBeforeContinuation = null; out.print(pre + "\r\n") }
              if (muteNextIdleContinuation) muteNextIdleContinuation = false
              else out.print("+ idling\r\n")
              idleTag = tag
              idleOut = out
            }
          }
          else if (cmd.startsWith("LOGIN")) {
            // accept `{n}` synchronizing literals: continue, read n chars
            // raw, splice them in as <LIT:…>, resume on the next line
            var logical = line
            val LitTail = """\{(\d+)\}$""".r
            var m = LitTail.findFirstMatchIn(logical)
            while (m.isDefined) {
              out.print("+ OK\r\n")
              val n = m.get.group(1).toInt
              val buf = new Array[Char](n)
              var off = 0
              while (off < n) {
                val k = in.read(buf, off, n - off)
                require(k >= 0, "closed in literal"); off += k
              }
              logical = logical.dropRight(m.get.group(0).length) +
                "<LIT:" + new String(buf) + ">" + in.readLine()
              m = LitTail.findFirstMatchIn(logical)
            }
            lastLogin = logical
            out.print(s"$tag OK logged in\r\n")
          }
          else if (cmd.startsWith("SELECT")) {
            out.print(s"* ${mailbox.size} EXISTS\r\n")
            out.print(s"* OK [UIDVALIDITY $uidValidity] UIDs valid\r\n")
            out.print(s"$tag OK [READ-ONLY] selected\r\n")
          } else if (cmd.startsWith("UID SEARCH")) {
            searches += 1
            out.print("* SEARCH " + mailbox.keys.mkString(" ") + "\r\n")
            out.print(s"$tag OK search done\r\n")
          } else if (cmd.startsWith("UID FETCH")) {
            val uid = """UID FETCH (\d+)""".r.findFirstMatchIn(cmd).get.group(1).toLong
            fetchedUids = fetchedUids :+ uid
            mailbox.get(uid).foreach { body =>
              val bytes = body.getBytes(StandardCharsets.UTF_8)
              out.print(s"* 1 FETCH (UID $uid BODY[] {${bytes.length}}\r\n")
              out.write(bytes); out.flush()
              out.print(")\r\n")
            }
            out.print(s"$tag OK fetch done\r\n")
          } else if (cmd.startsWith("FETCH")) {
            // sequence-range fetch (the IDLE client's no-search path)
            val m = """FETCH (\d+):(\d+)""".r.findFirstMatchIn(cmd).get
            val chatter = fetchChatter
            if (chatter != null) { fetchChatter = null; out.print(chatter + "\r\n") }
            val keys = mailbox.keys.toSeq
            (m.group(1).toInt to m.group(2).toInt).foreach { seq =>
              val uid = keys(seq - 1)
              fetchedUids = fetchedUids :+ uid
              val bytes = mailbox(uid).getBytes(StandardCharsets.UTF_8)
              out.print(s"* $seq FETCH (UID $uid BODY[] {${bytes.length}}\r\n")
              out.write(bytes); out.flush()
              out.print(")\r\n")
            }
            out.print(s"$tag OK fetch done\r\n")
          } else if (cmd.startsWith("LOGOUT")) {
            out.print("* BYE\r\n"); out.print(s"$tag OK bye\r\n")
            line = null
          } else out.print(s"$tag OK noop\r\n")
          if (line != null) line = in.readLine()
        }
        s.close()
      } catch { case _: Exception => () } // socket closed on stop()
    })
    thread.setDaemon(true)
    thread.start()
  }

  private def msg(id: String, from: String, subject: String) =
    s"Message-ID: <$id@host>\r\nFrom: $from\r\nTo: x@example.com\r\nSubject: $subject\r\n\r\nbody of $id"

  "ImapSync" should "track UIDs incrementally and resync on UIDVALIDITY change" in {
    val srv = new FakeImap
    try {
      srv.mailbox(101L) = msg("m1", "alice@example.com", "hello")
      srv.mailbox(102L) = msg("m2", "bob@example.com", "re: hello")

      // initial round fetches everything
      val d1 = ImapSync.sync("localhost", srv.port, "u", "p", "INBOX", ImapSync.ImapState())
      d1.fetched.map(_._1) shouldBe Seq(101L, 102L)
      d1.removed shouldBe empty
      d1.resync shouldBe false
      d1.state.uidValidity shouldBe 7L

      // fetched bodies flow into the distributed converter
      val quads = graft.convert.Converters.email(
        d1.fetched.map { case (uid, b) => (s"uid$uid", b) }.toDS()).toDF()
      quads.where($"o" === "hello").count() shouldBe 1

      // steady state: nothing new, nothing fetched
      val d2 = ImapSync.sync("localhost", srv.port, "u", "p", "INBOX", d1.state)
      d2.fetched shouldBe empty
      d2.removed shouldBe empty

      // one new message + one expunged: only the new uid is fetched
      srv.mailbox.remove(101L)
      srv.mailbox(103L) = msg("m3", "carol@example.com", "fwd: hello")
      srv.fetchedUids = Nil
      val d3 = ImapSync.sync("localhost", srv.port, "u", "p", "INBOX", d2.state)
      d3.fetched.map(_._1) shouldBe Seq(103L)
      srv.fetchedUids shouldBe List(103L)
      d3.removed shouldBe Seq(101L)

      // UIDVALIDITY bump: full resync — all old uids removed, all current refetched
      srv.uidValidity = 8L
      val d4 = ImapSync.sync("localhost", srv.port, "u", "p", "INBOX", d3.state)
      d4.resync shouldBe true
      d4.removed shouldBe d3.state.knownUids.toSeq.sorted
      d4.fetched.map(_._1) shouldBe Seq(102L, 103L)
      d4.state.uidValidity shouldBe 8L
    } finally srv.stop()
  }

  it should "receive pushed EXISTS/EXPUNGE in IDLE without a search round" in {
    val srv = new FakeImap
    def await(label: String)(cond: => Boolean): Unit = {
      val end = System.currentTimeMillis + 10000
      while (!cond && System.currentTimeMillis < end) Thread.sleep(20)
      withClue(label) { cond shouldBe true }
    }
    try {
      srv.mailbox(101L) = msg("m1", "alice@example.com", "hello")
      val result = new java.util.concurrent.atomic.AtomicReference[ImapSync.ImapDelta]()
      val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val t = new Thread(() =>
        try result.set(ImapSync.idle("localhost", srv.port, "u", "p", "INBOX",
          ImapSync.ImapState(), maxEvents = 2, timeoutMillis = 8000))
        catch { case e: Throwable => failure.set(e) })
      t.start()

      // client parks in IDLE after its initial diff (one seeding search)
      await("first IDLE")(srv.idleCount == 1)
      val searchesAtPark = srv.searches

      // push a new message: lands via sequence-range FETCH, no search
      srv.mailbox(102L) = msg("m2", "bob@example.com", "re: hello")
      srv.push("* 2 EXISTS")
      await("re-IDLE after EXISTS")(srv.idleCount == 2)

      // push an expunge of sequence 1 (uid 101)
      srv.mailbox.remove(101L)
      srv.push("* 1 EXPUNGE")
      t.join(10000)
      failure.get() shouldBe null
      val d = result.get()
      d should not be null

      d.fetched.map(_._1) shouldBe Seq(101L, 102L) // initial + pushed
      d.removed shouldBe Seq(101L)
      d.state.knownUids shouldBe Set(102L)
      d.state.uidValidity shouldBe 7L
      srv.searches shouldBe searchesAtPark // no per-event UID SEARCH

      // the cursor interoperates with the polling leg: nothing new
      val d2 = ImapSync.sync("localhost", srv.port, "u", "p", "INBOX", d.state)
      d2.fetched shouldBe empty
      d2.removed shouldBe empty
    } finally srv.stop()
  }

  it should "still park once when timeoutMillis is below the 500 ms round floor" in {
    // pre-fix the entry check required rem >= 500, so a 200 ms caller
    // never issued IDLE at all — a silent no-park return
    val srv = new FakeImap
    try {
      srv.mailbox(101L) = msg("m1", "alice@example.com", "hello")
      val t0 = System.nanoTime()
      val d = ImapSync.idle("localhost", srv.port, "u", "p", "INBOX",
        ImapSync.ImapState(), maxEvents = 2, timeoutMillis = 200)
      val elapsedMs = (System.nanoTime() - t0) / 1000000L
      srv.idleCount shouldBe 1 // it DID park (one short round)
      d.fetched.map(_._1) shouldBe Seq(101L) // seeding diff still delivered
      elapsedMs should be < 5000L // and the short budget was honored
    } finally srv.stop()
  }

  it should "deliver the seeding diff when the IDLE continuation never arrives" in {
    // regression (r13 ADVICE): a continuation read that times out — server
    // slower than the remaining budget — must not throw the accumulated
    // seeding-diff events away; it ends the park and returns the delta
    val srv = new FakeImap
    try {
      srv.mailbox(101L) = msg("m1", "alice@example.com", "hello")
      srv.muteNextIdleContinuation = true
      val t0 = System.nanoTime()
      val d = ImapSync.idle("localhost", srv.port, "u", "p", "INBOX",
        ImapSync.ImapState(), maxEvents = 2, timeoutMillis = 800)
      val elapsedMs = (System.nanoTime() - t0) / 1000000L
      srv.idleCount shouldBe 1 // IDLE was issued, continuation swallowed
      d.fetched.map(_._1) shouldBe Seq(101L) // delta survives the timeout
      d.state.knownUids shouldBe Set(101L)
      elapsedMs should be < 8000L
    } finally srv.stop()
  }

  it should "deliver the seeding diff when the connection drops mid-IDLE" in {
    // regression (r14 ADVICE): only SocketTimeoutException was caught in
    // the continuation recovery — a DROPPED connection (EOF / plain
    // IOException) propagated out of idle() and discarded the already-
    // accumulated seeding-diff events instead of returning the delta
    val srv = new FakeImap
    try {
      srv.mailbox(101L) = msg("m1", "alice@example.com", "hello")
      srv.dropOnNextIdle = true
      val d = ImapSync.idle("localhost", srv.port, "u", "p", "INBOX",
        ImapSync.ImapState(), maxEvents = 2, timeoutMillis = 8000)
      srv.idleCount shouldBe 1 // IDLE was issued, then the socket died
      d.fetched.map(_._1) shouldBe Seq(101L) // delta survives the drop
      d.state.knownUids shouldBe Set(101L)
      d.state.uidValidity shouldBe 7L
    } finally srv.stop()
  }

  it should "tolerate notifications before the IDLE continuation and FETCH chatter" in {
    val srv = new FakeImap
    def await(label: String)(cond: => Boolean): Unit = {
      val end = System.currentTimeMillis + 10000
      while (!cond && System.currentTimeMillis < end) Thread.sleep(20)
      withClue(label) { cond shouldBe true }
    }
    try {
      srv.mailbox(101L) = msg("m1", "alice@example.com", "hello")
      val result = new java.util.concurrent.atomic.AtomicReference[ImapSync.ImapDelta]()
      val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val t = new Thread(() =>
        try result.set(ImapSync.idle("localhost", srv.port, "u", "p", "INBOX",
          ImapSync.ImapState(), maxEvents = 2, timeoutMillis = 8000))
        catch { case e: Throwable => failure.set(e) })
      t.start()
      await("first IDLE")(srv.idleCount == 1)

      // two new messages; the first is announced with RFC-legal hostility:
      // a unilateral flags-only FETCH update (RFC 3501 §7.4.2) interleaved
      // inside our FETCH response, and the second EXISTS arriving before
      // the re-IDLE's '+' continuation
      srv.mailbox(102L) = msg("m2", "bob@example.com", "re: hello")
      srv.mailbox(103L) = msg("m3", "carol@example.com", "fwd: hello")
      srv.fetchChatter = "* 1 FETCH (FLAGS (\\Seen))"
      srv.pushBeforeContinuation = "* 3 EXISTS"
      srv.push("* 2 EXISTS")
      t.join(10000)
      failure.get() shouldBe null
      val d = result.get()
      d should not be null
      d.fetched.map(_._1) shouldBe Seq(101L, 102L, 103L)
      d.removed shouldBe empty
      d.state.knownUids shouldBe Set(101L, 102L, 103L)
    } finally srv.stop()
  }

  it should "send credentials as quoted strings or {n} literals, never raw" in {
    val srv = new FakeImap
    try {
      srv.mailbox(1L) = msg("m1", "a@example.com", "s")

      // printable-but-tricky credentials: quoted-string form with escapes
      val d1 = ImapSync.sync("localhost", srv.port, "u\"ser", "pa ss\\x",
        "INBOX", ImapSync.ImapState())
      d1.fetched.map(_._1) shouldBe Seq(1L)
      srv.lastLogin should include("\"u\\\"ser\"")
      srv.lastLogin should include("\"pa ss\\\\x\"")

      // CRLF-bearing password cannot be quoted: goes as a literal, and
      // cannot inject a protocol line
      val d2 = ImapSync.sync("localhost", srv.port, "u", "p\r\nEVIL LOGOUT",
        "INBOX", d1.state)
      d2.fetched shouldBe empty
      srv.lastLogin should include("<LIT:p\r\nEVIL LOGOUT>")
    } finally srv.stop()
  }
}
