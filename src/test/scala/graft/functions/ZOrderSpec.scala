package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {

  import spark.implicits._

  behavior of "ZOrder.interleave"

  it should "interleave bits exactly" in {
    ZOrder.interleave(5, 3) shouldBe 27L // 101 ⨯ 011 → 011011
    ZOrder.interleave(0, 0) shouldBe 0L
    ZOrder.interleave(ZOrder.DimMask, 0) shouldBe 0x15555555555L
    ZOrder.interleave(0, ZOrder.DimMask) shouldBe 0x2AAAAAAAAAAL
    ZOrder.interleave(ZOrder.DimMask, ZOrder.DimMask) shouldBe (1L << 42) - 1
    // out-of-domain bits are masked, not wrapped into the key
    ZOrder.interleave(1L << 21, 0) shouldBe 0L
  }

  it should "evaluate identically through the registered expression" in {
    val rows = (0L until 2000L).map(i => (i * 2654435761L % (1L << 21),
      i * 40503L % (1L << 21)))
    val got = rows.toDF("x", "y")
      .select(call_function("zorder_key", col("x"), col("y")))
      .as[Long].collect()
    got.toSeq shouldBe rows.map { case (x, y) => ZOrder.interleave(x, y) }
  }

  behavior of "ZOrder.scaled"

  it should "bucket a domain onto the 21-bit grid integer-exactly" in {
    val df = Seq(0L, 500L, 1000L).toDF("v")
      .select(ZOrder.scaled(col("v"), 0L, 1000L).as("b")).as[Long].collect()
    df(0) shouldBe 0L
    df(1) shouldBe (ZOrder.DimMask / 2)
    df(2) shouldBe ZOrder.DimMask
  }

  behavior of "ZOrder.layout"

  it should "confine box predicates to a few files on either dimension" in {
    val n = 1 << 14
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val data = (0 until n).map { i =>
      // deterministic LCG scatter over the full 21-bit × 21-bit domain
      val x = (i * 2654435761L) & ZOrder.DimMask
      val y = (i * 97002721L + 12345L) & ZOrder.DimMask
      (i.toLong, x, y)
    }.toDF("id", "x", "y")
    ZOrder.layout(data, col("x"), col("y"), numFiles = 8)
      .write.mode("overwrite").parquet(s"$dir/z")
    val z = spark.read.parquet(s"$dir/z")
    def filesTouched(cond: String): Long =
      z.where(cond).select(input_file_name()).distinct().count()
    val q = (1L << 19) // a 1/4-of-domain band
    // top quarter on y → files whose boxes intersect it; z-order keeps
    // that a small subset (a y-sorted layout would too, but then x
    // predicates would touch everything — z-order bounds BOTH)
    filesTouched(s"y >= ${3 * q}") should be <= 4L
    filesTouched(s"x >= ${3 * q}") should be <= 6L
    filesTouched(s"x >= ${3 * q} AND y >= ${3 * q}") should be <= 3L
    z.count() shouldBe n.toLong
  }
}
