package graft.enrich

import graft.SparkSpec

class BlendSpec extends SparkSpec {
  import spark.implicits._

  "blendedNameWeights" should "give contacts at least the floor share and normalize" in {
    val contacts = Seq((1L, "John Smith", 1L)).toDF("id", "name", "n")
    val messages = Seq(
      (1L, "John Smith", 6L), (1L, "J. Smith", 2L),
      (2L, "Only Msgs", 4L)).toDF("id", "name", "n")
    val w = Resolution.blendedNameWeights(contacts, messages)
      .as[(Long, String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap

    // entity 1: contact "John Smith" gets 0.5; message mass 0.5 split 6:2
    w(1L)("John Smith") shouldBe (0.5 + 0.5 * 6.0 / 8) +- 1e-12
    w(1L)("J. Smith") shouldBe (0.5 * 2.0 / 8) +- 1e-12
    w(1L).values.sum shouldBe 1.0 +- 1e-12
    // entity 2: message-only mass sums to 1
    w(2L)("Only Msgs") shouldBe 1.0 +- 1e-12
  }

  it should "give contact-only entities full weight" in {
    val contacts = Seq((3L, "Solo Contact", 2L)).toDF("id", "name", "n")
    val messages = Seq.empty[(Long, String, Long)].toDF("id", "name", "n")
    val w = Resolution.blendedNameWeights(contacts, messages)
      .as[(Long, String, Double)].collect()
    w.head._3 shouldBe 1.0 +- 1e-12
  }
}
