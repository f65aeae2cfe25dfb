package graft.text

import graft.SparkSpec

class RrfSpec extends SparkSpec {
  import spark.implicits._

  behavior of "Rrf.fuse"

  it should "sum exact reciprocal-rank contributions across lists" in {
    val lex = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("doc", "rank")
    val vec = Seq(("b", 1L), ("a", 2L), ("d", 3L)).toDF("doc", "rank")
    val out = Rrf.fuse(Seq(lex, vec), "doc", "rank", c = 60, k = 10)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
    val m = out.toMap
    m("a") shouldBe ((2L, 1000000L / 61 + 1000000L / 62)) // 16393+16129
    m("b") shouldBe ((2L, 1000000L / 62 + 1000000L / 61))
    m("c") shouldBe ((1L, 1000000L / 63))
    m("d") shouldBe ((1L, 1000000L / 63))
    // a and b tie exactly; the id breaks the tie, singles follow
    out.map(_._1).toSeq shouldBe Seq("a", "b", "c", "d")
  }

  it should "apply the fused top-k after aggregation" in {
    val l1 = (1 to 100).map(i => (s"d$i", i.toLong)).toDF("doc", "rank")
    val fused = Rrf.fuse(Seq(l1), "doc", "rank", c = 60, k = 5)
    fused.count() shouldBe 5L
    fused.head().getString(0) shouldBe "d1"
  }
}
