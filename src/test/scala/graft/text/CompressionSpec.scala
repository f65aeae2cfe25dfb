package graft.text

import graft.SparkSpec

class CompressionSpec extends SparkSpec {
  import spark.implicits._

  "deflatedSize" should "order repetition < prose < random" in {
    val rep = "the same line again and again\n" * 100
    val prose = ("It was a bright cold day in April, and the clocks were " +
      "striking thirteen. Winston Smith hurried home. ") * 30
    val rnd = new scala.util.Random(1)
    val noise = Array.fill(3000)((rnd.nextInt(94) + 33).toChar).mkString
    val (r, p, n) = (Compression.deflatedSize(rep),
      Compression.deflatedSize(prose), Compression.deflatedSize(noise))
    // normalize by input length: ratio in ppm
    def ppm(c: Int, s: String) = 1000000L * c / s.getBytes("UTF-8").length
    ppm(r, rep) should be < ppm(p, prose)
    ppm(p, prose) should be < ppm(n, noise)
  }

  it should "be deterministic across calls" in {
    val t = "determinism check " * 50
    Compression.deflatedSize(t) shouldBe Compression.deflatedSize(t)
  }

  "profile" should "emit exact sizes and ppm per row" in {
    val df = Seq((1L, "aaaaaaaaaa" * 100), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Compression.profile(df, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    out(1L)._2 shouldBe 1000L
    out(1L)._4 should be < 100000L // highly repetitive: < 10% of original
    out(2L)._2 shouldBe 0L
    out(2L)._4 shouldBe 1000000L // empty: defined as 100%
    out(3L) shouldBe ((3L, 0L, out(3L)._3, 1000000L))
  }

  it should "be invariant to partitioning" in {
    val docs = (0L until 50L).map(i => (i, s"doc $i " * (i.toInt + 1)))
    val a = Compression.profile(docs.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().toSet
    val b = Compression.profile(docs.toDF("doc_id", "text").repartition(7),
      "doc_id", "text").as[(Long, Long, Long, Long)].collect().toSet
    a shouldBe b
  }
}
