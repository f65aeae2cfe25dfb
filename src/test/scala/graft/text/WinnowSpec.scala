package graft.text

import graft.SparkSpec

class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** JVM reference of the identical selection. */
  private def ref(text: String, k: Int, w: Int): Set[String] = {
    val toks = text.split("[\\s\\p{Punct}]+").filter(_.nonEmpty)
    if (toks.length < k) return Set.empty
    val hs = toks.sliding(k).map(g => md5hex(g.mkString(" "))).toVector
    if (hs.length < w) return Set.empty
    hs.sliding(w).map(_.min).toSet
  }

  "fingerprints" should "select the min hash of every complete window" in {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven"),
      (3L, "too short"),           // < k tokens: nothing
      (4L, "a b c d e f g h")      // exactly k+w-1: one window
    ).toDF("doc_id", "text")
    val got = Winnow.fingerprints(docs, "text", "doc_id", k = 4, w = 5)
      .as[(Long, String)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    got.getOrElse(3L, Set.empty) shouldBe Set.empty
    got(1L) shouldBe ref("alpha beta gamma delta epsilon zeta eta theta iota kappa", 4, 5)
    // 7 tokens -> 4 shingle hashes < w: no complete window, no rows
    ref("one two three four five six seven", 4, 5) shouldBe Set.empty
    got.getOrElse(2L, Set.empty) shouldBe Set.empty
    got(4L) should have size 1
  }

  it should "guarantee a shared fingerprint for any shared run of w+k-1 words" in {
    val shared = "the winnowing guarantee holds for shared runs of length"
    val d1 = s"prefix words here $shared and a suffix"
    val d2 = s"totally different beginning $shared closing differently"
    val fps = Winnow.fingerprints(
        Seq((1L, d1), (2L, d2)).toDF("doc_id", "text"), "text", "doc_id",
        k = 3, w = 4)
      .as[(Long, String)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    (fps(1L) intersect fps(2L)) should not be empty
  }

  "candidatePairs" should "pair docs by shared fingerprints with the threshold" in {
    val shared = "a long enough shared passage that winnowing must fingerprint " +
      "identically in both documents across several windows"
    val docs = Seq(
      (1L, s"first document begins $shared and then ends"),
      (2L, s"second one opens differently $shared closing its own way"),
      (3L, "entirely unrelated content with no overlap whatsoever here")
    ).toDF("doc_id", "text")
    val fps = Winnow.fingerprints(docs, "text", "doc_id", k = 3, w = 4)
    val pairs = Winnow.candidatePairs(fps, "doc_id", minShared = 2)
      .as[(Long, Long, Long)].collect()
    pairs.map(p => (p._1, p._2)).toSet shouldBe Set((1L, 2L))
    pairs.head._3 should be >= 2L
  }

  it should "agree between fast and md5 selection on selection COUNT bounds" in {
    val docs = Seq((1L, ("tok " * 100).trim)).toDF("doc_id", "text")
    val slow = Winnow.fingerprints(docs, "text", "doc_id", 4, 5).count()
    val fast = Winnow.fingerprints(docs, "text", "doc_id", 4, 5,
      fastHash = true).count()
    // identical token stream -> identical shingles; a constant document
    // has ONE distinct shingle hash whichever hash is used
    slow shouldBe 1L
    fast shouldBe 1L
  }

  "winnow_fps (native)" should "match a JVM sliding-min reference exactly" in {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.types.UTF8String
    def refFps(text: String, k: Int, w: Int): Set[Long] = {
      val toks = text.split("[\\s\\p{Punct}]+").filter(_.nonEmpty)
      if (toks.length < k) return Set.empty
      val hs = toks.sliding(k).map(g =>
        XXH64.hashUTF8String(UTF8String.fromString(g.mkString(" ")), 42L)).toVector
      if (hs.length < w) return Set.empty
      hs.sliding(w).map(_.min).toSet
    }
    val rnd = new scala.util.Random(5)
    val docs = (1L to 30L).map { id =>
      val n = rnd.nextInt(40)
      (id, (1 to n).map(_ => s"w${rnd.nextInt(8)}").mkString(" "))
    }
    val got = Winnow.fingerprints(docs.toDF("doc_id", "text"),
        "text", "doc_id", k = 3, w = 4, fastHash = true)
      .as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    // the fast path must actually be the native kernel
    Winnow.fingerprints(docs.toDF("doc_id", "text"), "text", "doc_id", 3, 4,
        fastHash = true)
      .queryExecution.analyzed.toString should include("winnow_fps")
    docs.foreach { case (id, text) =>
      withClue(s"doc $id: ") {
        got.getOrElse(id, Set.empty) shouldBe refFps(text, 3, 4)
      }
    }
  }
}
