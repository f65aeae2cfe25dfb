package graft.sources

import java.nio.charset.StandardCharsets

import graft.SparkSpec

class WarcSpec extends SparkSpec {

  private val date = "2026-01-01T00:00:00Z"

  private def resp(id: Long, body: String): Array[Byte] =
    Warc.writeRecord("response", s"<urn:uuid:resp-$id>", date,
      Some(s"http://example.org/doc/$id"), Some("application/http;msgtype=response"),
      Warc.httpResponse(body.getBytes(StandardCharsets.UTF_8), "text/html"))

  behavior of "Warc"

  it should "round-trip a single record with all headers" in {
    val recs = Warc.parse(resp(7, "hello <b>world</b>")).get
    recs should have size 1
    val r = recs.head
    r.warcType shouldBe "response"
    r.recordId shouldBe "<urn:uuid:resp-7>"
    r.date shouldBe date
    r.targetUri shouldBe Some("http://example.org/doc/7")
    r.offset shouldBe 0L
    val (code, headers, body) = Warc.parseHttpPayload(r.content).get
    code shouldBe 200
    headers("content-type") shouldBe "text/html"
    new String(body, StandardCharsets.UTF_8) shouldBe "hello <b>world</b>"
  }

  it should "walk multiple records and report exact offsets" in {
    val a = resp(1, "first")
    val b = Warc.writeRecord("warcinfo", "<urn:uuid:info>", date, None,
      Some("application/warc-fields"), "software: graft\r\n".getBytes)
    val c = resp(2, "third body, länger")
    val recs = Warc.parse(Warc.writeFile(Seq(a, b, c))).get
    recs.map(_.warcType) shouldBe Vector("response", "warcinfo", "response")
    recs.map(_.offset) shouldBe Vector(0L, a.length.toLong, (a.length + b.length).toLong)
    recs(1).targetUri shouldBe None
  }

  it should "round-trip through gzip (the .warc.gz member form)" in {
    val plain = Warc.writeFile(Seq(resp(1, "a"), resp(2, "b")))
    def norm(rs: Vector[Warc.WarcRecord]) =
      rs.map(r => (r.warcType, r.recordId, r.date, r.targetUri, r.contentType,
        r.content.toSeq, r.offset))
    norm(Warc.parse(Warc.gzip(plain)).get) shouldBe norm(Warc.parse(plain).get)
  }

  it should "reject a corrupt gzip member mid-file instead of truncating" in {
    // member-per-record .warc.gz with member 2's magic corrupted: the JDK
    // decoder treats the unparseable next header as clean EOF, which
    // pre-fix silently returned only member 1's records
    // member 2 must exceed the decoder's ~512-byte read-ahead: smaller
    // trailing corruption is the guard's documented residual (the JDK
    // buffers it before deciding EOF, indistinguishable from junk it
    // already swallowed); anything record-sized is caught
    val rnd = new scala.util.Random(7)
    val incompressible = Seq.fill(4096)(('a' + rnd.nextInt(26)).toChar).mkString
    val m1 = Warc.gzip(Warc.writeFile(Seq(resp(1, "a"))))
    val m2 = Warc.gzip(Warc.writeFile(Seq(resp(2, incompressible))))
    val good = m1 ++ m2
    Warc.parse(good).get should have size 2
    val bad = good.clone()
    bad(m1.length) = 0x00 // member 2's first magic byte
    Warc.parse(bad) shouldBe None
  }

  it should "reject structural corruption instead of resyncing" in {
    val good = resp(5, "payload")
    Warc.parse(good.dropRight(1)) shouldBe None // truncated terminator
    Warc.parse(good.dropRight(9)) shouldBe None // truncated content
    val overdeclared = new String(good, StandardCharsets.ISO_8859_1)
      .replaceFirst("Content-Length: ", "Content-Length: 9")
      .getBytes(StandardCharsets.ISO_8859_1)
    Warc.parse(overdeclared) shouldBe None
    val badVersion = ("WARC/9.9\r\n" +
      new String(good, StandardCharsets.ISO_8859_1).substring(10))
      .getBytes(StandardCharsets.ISO_8859_1)
    Warc.parse(badVersion) shouldBe None
    val noType = Warc.parse(new String(good, StandardCharsets.ISO_8859_1)
      .replaceFirst("WARC-Type", "X-Type").getBytes(StandardCharsets.ISO_8859_1))
    noType shouldBe None
    Warc.parse("not a warc at all".getBytes) shouldBe None
  }

  it should "reject a non-numeric or missing Content-Length" in {
    val good = new String(resp(5, "x"), StandardCharsets.ISO_8859_1)
    Warc.parse(good.replaceFirst("Content-Length: \\d+", "Content-Length: ten")
      .getBytes(StandardCharsets.ISO_8859_1)) shouldBe None
    Warc.parse(good.replaceFirst("Content-Length: \\d+\r\n", "")
      .getBytes(StandardCharsets.ISO_8859_1)) shouldBe None
  }

  it should "reject non-HTTP payloads in parseHttpPayload" in {
    Warc.parseHttpPayload("just text".getBytes) shouldBe None
    Warc.parseHttpPayload("HTTP/1.1 OK\r\n\r\n".getBytes) shouldBe None // no code
  }

  it should "read a directory of warc and warc.gz files with audit rows for corrupt ones" in {
    val dir = java.nio.file.Files.createTempDirectory("warcread")
    java.nio.file.Files.write(dir.resolve("a.warc"),
      Warc.writeFile(Seq(resp(1, "alpha"), resp(2, "beta"))))
    java.nio.file.Files.write(dir.resolve("b.warc.gz"),
      Warc.gzip(resp(3, "gamma")))
    java.nio.file.Files.write(dir.resolve("c.warc"), "garbage".getBytes)
    val df = Warc.readFiles(spark, dir.toString).cache()
    df.count() shouldBe 4
    df.where("warc_type IS NULL").count() shouldBe 1 // the audit row
    df.where("warc_type = 'response'").count() shouldBe 3
  }

  it should "ingest a landing directory incrementally, each file exactly once" in {
    val dir = java.nio.file.Files.createTempDirectory("warcstream")
    val ckpt = java.nio.file.Files.createTempDirectory("warcstream-ckpt")
    java.nio.file.Files.write(dir.resolve("a.warc"),
      Warc.writeFile(Seq(resp(1, "alpha"), resp(2, "beta"))))
    val q = Warc.readStreamFiles(spark, dir.toString)
      .select("path", "warc_type", "target_uri")
      .writeStream.format("memory").queryName("warc_stream")
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      spark.table("warc_stream").count() shouldBe 2
      // a second file arrives: only ITS records join the table
      java.nio.file.Files.write(dir.resolve("b.warc.gz"),
        Warc.gzip(resp(3, "gamma")))
      q.processAllAvailable()
      val rows = spark.table("warc_stream")
      rows.count() shouldBe 3
      rows.where("target_uri = 'http://example.org/doc/3'").count() shouldBe 1
      // the first file was NOT re-parsed
      rows.where("path LIKE '%a.warc'").count() shouldBe 2
    } finally q.stop()
  }
}
