package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox leaps over the lazy dog"), // near dup of 1
    (4L, "completely different text about spark engines"),
    (5L, "spark engines are completely different text about")).toDF("doc_id", "text")

  "exact" should "group identical texts keeping the min id" in {
    val res = Dedup.exact(docs, "text", "doc_id")
      .as[(Long, Long)].collect().toSet
    res shouldBe Set((1L, 2L), (3L, 1L), (4L, 1L), (5L, 1L))
  }

  "ngramJaccardPairs" should "find near-dups above an exact rational threshold" in {
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id", k = 2, num = 1, den = 3)
      .as[(Long, Long)].collect().toSet
    pairs should contain((1L, 2L)) // identical: jaccard 1
    pairs should contain((1L, 3L)) // one word differs: high overlap
    pairs should not contain ((1L, 4L))
  }

  "minhashLshPairs" should "recover exact and near dups after verification" in {
    val pairs = Dedup.minhashLshPairs(docs, "text", "doc_id",
      k = 2, numHashes = 32, bands = 16, num = 1, den = 3)
      .as[(Long, Long)].collect().toSet
    pairs should contain((1L, 2L))
    pairs should not contain ((1L, 4L))
  }

  "simhash" should "be identical for identical text and differ for unrelated text" in {
    val fps = docs.select($"doc_id", Dedup.simhash($"text").as("fp"))
      .as[(Long, Long)].collect().toMap
    fps(1L) shouldBe fps(2L)
    fps(1L) should not be fps(4L)
  }

  "simhashPairs" should "pair exact duplicates at hamming 0" in {
    val pairs = Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 3)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    pairs should contain((1L, 2L))
  }

  "spanDuplication" should "match a brute-force oracle on randomized corpora" in {
    // seeded random corpora over a tiny vocabulary (maximizes window
    // collisions), checked against an independent in-memory computation
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "d", "e")
    val w = 3
    for (_ <- 1 to 3) {
      val corpus = (1L to 8L).map(i =>
        (i, Seq.fill(rnd.nextInt(12) + 1)(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
      def windows(text: String): Set[String] = {
        val t = text.split("[\\s\\p{Punct}]+").filter(_.nonEmpty)
        val last = math.max(t.length - w, 0)
        (0 to last).map(i => t.slice(i, math.min(i + w, t.length)).mkString(" "))
          .filter(_.nonEmpty).toSet
      }
      val wmap = corpus.map { case (id, tx) => id -> windows(tx) }.toMap
      val expected = wmap.map { case (id, ws) =>
        id -> ((ws.size.toLong,
          ws.count(win => wmap.exists { case (o, ows) => o != id && ows(win) }).toLong))
      }
      val got = Dedup.spanDuplication(corpus.toDF("doc_id", "text"), "text", "doc_id", w)
        .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      got shouldBe expected
    }
  }

  it should "count cross-document duplicated windows exactly" in {
    // w=3 over the fixture: docs 1/2 share all 7 windows; doc 3 shares 4
    // with them; docs 4/5 share "completely different text" and
    // "different text about"
    val expected = Map(
      1L -> (7L, 7L), 2L -> (7L, 7L), 3L -> (7L, 4L),
      4L -> (4L, 2L), 5L -> (5L, 2L))
    val hashed = Dedup.spanDuplication(docs, "text", "doc_id", w = 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    hashed shouldBe expected
    // the string-keyed variant (no window hashing) partitions identically
    val exact = Dedup.spanDuplication(docs, "text", "doc_id", w = 3,
      hashWindows = false)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    exact shouldBe expected
  }

  it should "reject a band count that does not divide numHashes" in {
    // numHashes = 30, bands = 8 used to band only the first 24 hashes —
    // silently weakened recall, no error
    val e = intercept[IllegalArgumentException] {
      Dedup.minhashLshPairs(docs, "text", "doc_id",
        k = 2, numHashes = 30, bands = 8, num = 1, den = 3)
    }
    e.getMessage should include ("divide")
    intercept[IllegalArgumentException] {
      Dedup.minhashBandBuckets(docs, "text", "doc_id",
        k = 2, numHashes = 30, bands = 8)
    }
  }

  "dedupSegments" should "drop corpus-frequent segments and rebuild in order" in {
    val lined = Seq(
      (1L, "COOKIE BANNER\nunique article one\nCOPYRIGHT FOOTER"),
      (2L, "COOKIE BANNER\nunique article two\nCOPYRIGHT FOOTER"),
      (3L, "COOKIE BANNER\nunique article three\nCOPYRIGHT FOOTER"),
      (4L, "standalone page with no chrome")).toDF("doc_id", "text")
    val res = Dedup.dedupSegments(lined, "text", "doc_id", "\n", maxFreq = 2)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    res shouldBe Map(
      1L -> (3L, 1L, "unique article one"),
      2L -> (3L, 1L, "unique article two"),
      3L -> (3L, 1L, "unique article three"),
      4L -> (1L, 1L, "standalone page with no chrome"))
  }

  it should "not pin a broadcast hint on the banned-segment anti-join" in {
    // "small by construction" fails at low maxFreq over a big corpus
    // (maxFreq = 1 bans every segment occurring twice — a large fraction
    // of all distinct segments); a pinned broadcast() would OOM the
    // driver there, where the hint-free plan lets AQE broadcast at
    // runtime only when the banned set measures small
    val lined = Seq(
      (1L, "dup line\nunique a"), (2L, "dup line\nunique b")).toDF("doc_id", "text")
    val res = Dedup.dedupSegments(lined, "text", "doc_id", "\n", maxFreq = 1)
    res.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    } shouldBe empty
    res.as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap shouldBe Map(
      1L -> ((2L, 1L, "unique a")), 2L -> ((2L, 1L, "unique b")))
  }

  it should "emit an empty reconstruction when every segment is banned" in {
    val allDup = Seq(
      (1L, "same"), (2L, "same"), (3L, "same"), (4L, "same")).toDF("doc_id", "text")
    val res = Dedup.dedupSegments(allDup, "text", "doc_id", "\n", maxFreq = 2)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    res shouldBe (1L to 4L).map(_ -> ((1L, 0L, ""))).toMap
  }

  it should "treat regex-significant separators literally" in {
    val dotted = Seq(
      (1L, "alpha.beta.gamma"), (2L, "alpha.delta.gamma"),
      (3L, "alpha.epsilon.gamma")).toDF("doc_id", "text")
    // '.' must split on the literal dot, not on every character
    val res = Dedup.dedupSegments(dotted, "text", "doc_id", ".", maxFreq = 2)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    res shouldBe Map(
      1L -> (3L, 1L, "beta"), 2L -> (3L, 1L, "delta"),
      3L -> (3L, 1L, "epsilon"))
  }
}
