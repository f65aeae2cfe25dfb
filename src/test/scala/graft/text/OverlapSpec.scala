package graft.text

import graft.SparkSpec

class OverlapSpec extends SparkSpec {
  import spark.implicits._

  behavior of "Overlap.modifiedPrecision"

  it should "clip candidate counts at the reference count (the BLEU guard)" in {
    // the canonical degenerate candidate: "the the the the the the the"
    // against a reference with two "the"s scores 2/7, not 7/7
    val pairs = Seq((1L, "the the the the the the the",
      "the cat is on the mat")).toDF("pair_id", "cand", "ref")
    val r = Overlap.modifiedPrecision(pairs, "pair_id", "cand", "ref", 1)
      .head()
    (r.getLong(1), r.getLong(2), r.getLong(3)) shouldBe ((2L, 7L,
      1000000L * 2 / 7))
  }

  it should "compute bigram precision over sliding windows" in {
    val pairs = Seq((1L, "a b c d", "a b x c d")).toDF("pair_id", "cand", "ref")
    // cand bigrams {a b, b c, c d}; ref has {a b, b x, x c, c d} -> 2/3
    val r = Overlap.modifiedPrecision(pairs, "pair_id", "cand", "ref", 2)
      .head()
    (r.getLong(1), r.getLong(2)) shouldBe ((2L, 3L))
  }

  it should "drop pairs whose candidate is shorter than the n-gram order" in {
    val pairs = Seq((1L, "one", "one two")).toDF("pair_id", "cand", "ref")
    Overlap.modifiedPrecision(pairs, "pair_id", "cand", "ref", 2)
      .count() shouldBe 0L
    // and identical texts score exactly 1.0
    val same = Seq((2L, "x y z", "x y z")).toDF("pair_id", "cand", "ref")
    Overlap.modifiedPrecision(same, "pair_id", "cand", "ref", 2)
      .head().getLong(3) shouldBe 1000000L
  }
}
