package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  behavior of "Layout.interleave"

  it should "match the JVM reference bit-for-bit on random cells" in {
    val rnd = new scala.util.Random(42)
    val cases = Seq.fill(200)((rnd.nextLong(256), rnd.nextLong(256),
      rnd.nextLong(256)))
    val got = cases.toDF("x", "y", "z")
      .select(col("x"), col("y"), col("z"), Layout.interleave(
        Seq(col("x"), col("y"), col("z")), 8).cast("long").as("zkey"))
      .collect()
    got.foreach { r =>
      r.getLong(3) shouldBe Layout.interleaveRef(
        Seq(r.getLong(0), r.getLong(1), r.getLong(2)), 8)
    }
  }

  it should "make the zkey prefix encode the prefixes of every dimension" in {
    // the data-skipping property: the top 2k bits of a 2-D key identify
    // the top k bits of BOTH coordinates, so a range predicate on either
    // coordinate maps to zkey ranges (= file pruning)
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 500) {
      val (x, y, k) = (rnd.nextLong(256), rnd.nextLong(256),
        1 + rnd.nextInt(7))
      val z = Layout.interleaveRef(Seq(x, y), 8)
      (z >> (2 * (8 - k))) shouldBe
        Layout.interleaveRef(Seq(x >> (8 - k), y >> (8 - k)), k)
    }
  }

  behavior of "Layout.zOrder"

  it should "quantize over the observed span and bucket by key prefix" in {
    val df = Seq((0L, 0L), (1023L, 0L), (0L, 15L), (1023L, 15L), (512L, 8L))
      .toDF("x", "y")
    val out = Layout.zOrder(df, Seq(col("x"), col("y")), bits = 4,
        buckets = 16)
      .select("x", "y", "q0", "q1", "zkey", "bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    out((0L, 0L)) shouldBe ((0L, 0L, 0L, 0L))
    // max lands in the top cell of each dimension
    out((1023L, 15L))._1 shouldBe 15L
    out((1023L, 15L))._2 shouldBe 15L
    out((1023L, 15L))._3 shouldBe 255L
    // bucket = top 4 of 8 key bits
    out.values.foreach { case (_, _, z, b) => b shouldBe (z >> 4) }
  }

  it should "quantize spans past 2^(63-bits) without overflow" in {
    // microsecond-epoch-scale span at bits=16: (v-min)*2^16 wraps in
    // long arithmetic; the decimal path must keep cells in [0, 2^16)
    val lo = 0L
    val hi = 1723600000000000L // ~2024 in epoch micros
    val df = Seq(lo, hi, hi / 2, hi / 3).toDF("ts")
    val out = Layout.zOrder(df, Seq(col("ts")), bits = 16, buckets = 16)
      .select("ts", "q0").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.values.foreach { q => q should (be >= 0L and be < 65536L) }
    out(lo) shouldBe 0L
    out(hi) shouldBe 65535L
    out(hi / 2) shouldBe 32767L
  }

  it should "reject buckets exceeding 2^(bits*dims)" in {
    an[IllegalArgumentException] should be thrownBy
      Layout.zOrder(Seq(1L).toDF("x"), Seq(col("x")), bits = 2, buckets = 8)
  }
}
