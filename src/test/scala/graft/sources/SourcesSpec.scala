package graft.sources

import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.SparkSpec
import graft.rdf.Quad
import org.apache.spark.sql.functions._

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  "FileIngest" should "scan a tree, expand zips and dispatch by extension" in {
    val dir = Files.createTempDirectory("graft-ingest")
    val sub = Files.createDirectory(dir.resolve("sub"))
    Files.writeString(dir.resolve("a.eml"),
      "From: a@x.com\nSubject: Hi\n\nbody")
    Files.writeString(sub.resolve("c.vcf"),
      "BEGIN:VCARD\nFN:Jo\nEND:VCARD")
    Files.writeString(dir.resolve("skip.bin"), "xxxx")
    val zos = new ZipOutputStream(Files.newOutputStream(dir.resolve("z.zip")))
    zos.putNextEntry(new ZipEntry("inner.ics"))
    zos.write("BEGIN:VEVENT\nUID:e9\nSUMMARY:Zipped\nEND:VEVENT".getBytes)
    zos.closeEntry(); zos.close()

    val docs = FileIngest.scan(spark, dir.toString).collect()
    docs.map(_.path).count(_.contains("!")) shouldBe 1 // zip entry
    docs.length shouldBe 4

    val quads = FileIngest.toQuads(FileIngest.scan(spark, dir.toString)).collect()
    quads.map(_.p) should contain("http://schema.org/headline") // email
    quads.filter(_.p == "http://schema.org/name").map(_.o) should
      contain allOf ("Jo", "Zipped") // vcard + zipped ical
  }

  "NTriples" should "round-trip quads through serialization" in {
    // canonical store form: plain/lang-tagged literals carry null dt
    // (xsd:string never round-trips explicitly — matches the converters
    // and the Turtle parser, so mixed-provenance quads compare equal)
    val quads = Seq(
      Quad("http://ex/s", "http://ex/p", "http://ex/o", Quad.IRI, null, null, "g1"),
      Quad("_:b0", "http://ex/p", "plain \"quoted\"\nline", Quad.LITERAL,
        null, null, "g1"),
      Quad("http://ex/s", "http://ex/p", "bonjour", Quad.LITERAL,
        null, "fr", "g2"),
      Quad("http://ex/s", "http://ex/p", "42", Quad.LITERAL,
        "http://www.w3.org/2001/XMLSchema#long", null, "g2"))
    val ds = spark.createDataset(quads)
    val dir = Files.createTempDirectory("graft-nq").resolve("out").toString
    NTriples.write(ds, dir)
    val back = NTriples.read(spark, dir).collect().toSet
    back shouldBe quads.toSet
  }

  it should "parse triples without a graph into the default graph" in {
    NTriples.parseLine("<http://a> <http://p> \"v\" .", "dg")
      .get.g shouldBe "dg"
    NTriples.parseLine("# comment", "dg") shouldBe None
    NTriples.parseLine("", "dg") shouldBe None
  }

  it should "parse a blank-node graph label instead of corrupting the object" in {
    // pre-fix the lazy object group swallowed ` _:g1` into the IRI,
    // yielding o = "http://o> _:g" with no error
    val q = NTriples.parseLine("<http://s> <http://p> <http://o> _:g1 .", "dg").get
    (q.o, q.oKind, q.g) shouldBe (("http://o", graft.rdf.Quad.IRI, "_:g1"))
  }

  it should "not mis-split a literal object ending in a bnode-looking token" in {
    // `_:\S+` as the graph alternative matched `_:b1"` (quote is
    // non-space), leaving objTerm=`"see` — LiteralObj failed and the
    // quad was silently dropped; the label-restricted alternative
    // backtracks and the full literal parses
    val q = NTriples.parseLine("""<http://s> <http://p> "see _:b1" .""", "dg").get
    (q.o, q.oKind, q.g) shouldBe (("see _:b1", graft.rdf.Quad.LITERAL, "dg"))
    val lang = NTriples.parseLine("""<http://s> <http://p> "voir _:b1"@fr .""", "dg").get
    (lang.o, lang.oLang) shouldBe (("voir _:b1", "fr"))
    val typed = NTriples.parseLine(
      """<http://s> <http://p> "x _:b1"^^<http://t> .""", "dg").get
    (typed.o, typed.oDt) shouldBe (("x _:b1", "http://t"))
    // real bnode graph labels still parse
    NTriples.parseLine("""<http://s> <http://p> "lit" _:g.1-x .""", "dg")
      .get.g shouldBe "_:g.1-x"
    // BLANK_NODE_LABEL admits Unicode PN_CHARS — an ASCII-only class
    // made this line fail the grammar entirely and silently drop the quad
    val uni = NTriples.parseLine("""<http://s> <http://p> "lit" _:bé1 .""", "dg")
    uni.map(_.g) shouldBe Some("_:bé1")
    val uniIri = NTriples.parseLine("""<http://s> <http://p> <http://o> _:héllo_1 .""", "dg")
    uniIri.map(q => (q.o, q.g)) shouldBe Some(("http://o", "_:héllo_1"))
  }

  it should "normalize the full rdf:type IRI to the engine's compact form" in {
    NTriples.parseLine(
      "<http://s> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://T> .",
      "dg").get.p shouldBe "rdf:type"
    // and the writer expands it back: round-trip is identity, output is
    // standard N-Quads (not the relative IRI <rdf:type>)
    val line = NTriples.serializeQuadLine(graft.rdf.Quad(
      "http://s", "rdf:type", "http://T", graft.rdf.Quad.IRI, null, null, "g"))
    line should include("<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>")
    NTriples.parseLine(line, "dg").get.p shouldBe "rdf:type"
  }

  "FileIngest.streamScan" should "ingest dropped files incrementally into quads" in {
    val dir = Files.createTempDirectory("graft-stream-in")
    val out = Files.createTempDirectory("graft-stream-out").resolve("quads").toString
    val chk = Files.createTempDirectory("graft-stream-chk").toString
    Files.writeString(dir.resolve("a.eml"),
      "From: a@x.com\nSubject: First\n\nbody")

    val quads = FileIngest.toQuads(FileIngest.streamScan(spark, dir.toString, "*.eml"))
    val q = quads.writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", chk)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val first = spark.read.parquet(out)
    first.where($"p" === "http://schema.org/headline")
      .select("o").as[String].collect().toSeq shouldBe Seq("First")

    // drop a second file: only the new one is processed (incremental log)
    Files.writeString(dir.resolve("b.eml"),
      "From: b@x.com\nSubject: Second\n\nbody")
    val q2 = quads.writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", chk)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination(120000)

    val all = spark.read.parquet(out)
    all.where($"p" === "http://schema.org/headline")
      .select("o").as[String].collect().toSet shouldBe Set("First", "Second")
    // "First" ingested exactly once across both runs
    all.where($"o" === "First").count() shouldBe 1
  }

  "CachedLookup" should "call the lookup only for misses" in {
    import graft.enrich.CachedLookup
    val calls = spark.sparkContext.collectionAccumulator[String]("calls")
    val input = Seq("paris", "london", "paris", "tokyo").toDF("city")
    val cache = Seq(("paris", "FR")).toDF("key", "value")
    val res = CachedLookup.lookup(input, "city", cache,
      k => { calls.add(k); k.toUpperCase })
    val resolved = res.resolved.select("city", "value")
      .as[(String, String)].collect().toSet
    resolved shouldBe Set(("paris", "FR"), ("london", "LONDON"), ("tokyo", "TOKYO"))
    res.newCacheRows.count() shouldBe 2
    calls.value.size shouldBe 2 // paris cached, never called
  }
}
