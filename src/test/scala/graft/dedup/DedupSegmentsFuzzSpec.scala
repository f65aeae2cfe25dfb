package graft.dedup

import graft.SparkSpec

/** Differential fuzzing of segment-frequency dedup: random corpora of
  * segment-built documents, checked against an obvious two-pass JVM
  * reference (count all segments; rebuild keeping the infrequent ones).
  * Seed fixed for CI; GRAFT_FUZZ_SEED sweeps alternates. */
class DedupSegmentsFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(
    sys.env.getOrElse("GRAFT_FUZZ_SEED", "13").toLong)

  "dedupSegments" should "agree with a two-pass reference on random corpora" in {
    val vocabulary = Vector("banner", "nav", "body1", "body2", "body3",
      "footer", "ad", "unique")
    for (round <- 1 to 10) {
      val maxFreq = 1 + rnd.nextInt(3)
      val docs = (1L to (20 + rnd.nextInt(30)).toLong).map { id =>
        val n = 1 + rnd.nextInt(6)
        val segs = (1 to n).map { _ =>
          val w = vocabulary(rnd.nextInt(vocabulary.length))
          if (rnd.nextInt(4) == 0) s"$w-$id" else w // some per-doc-unique
        }
        (id, segs.mkString("\n"))
      }
      val freq = docs.flatMap(_._2.split("\n", -1)).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      val expected = docs.map { case (id, text) =>
        val segs = text.split("\n", -1).toSeq
        val kept = segs.filter(freq(_) <= maxFreq)
        id -> ((segs.size.toLong, kept.size.toLong, kept.mkString("\n")))
      }.toMap

      val got = Dedup.dedupSegments(docs.toDF("doc_id", "text"),
          "text", "doc_id", "\n", maxFreq)
        .as[(Long, Long, Long, String)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

      withClue(s"round $round (maxFreq=$maxFreq): ") {
        got shouldBe expected
      }
    }
  }
}
