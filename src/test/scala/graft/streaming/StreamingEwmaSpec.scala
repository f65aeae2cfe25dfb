package graft.streaming

import graft.SparkSpec
import graft.operators.Ewma
import org.apache.spark.sql.functions._

class StreamingEwmaSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir() = java.nio.file.Files
    .createTempDirectory("ewma-state").toString

  private def fold(df: org.apache.spark.sql.DataFrame, dir: String,
      b: Long) =
    StreamingEwma.observeBatch(df, "u", col("o"), col("t"), col("v"),
        alphaNum = 300, k = 10, dir, "r", b)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  behavior of "StreamingEwma.observeBatch"

  it should "equal the one-shot batch fold when batches respect order" in {
    val rnd = new scala.util.Random(9)
    val rows = for (u <- 1L to 5L; i <- 1L to 40L)
      yield (u, i, 0L, rnd.nextLong(5000))
    val (b0, b1) = rows.partition(_._2 <= 25) // cut respects per-key order
    val dir = freshDir()
    fold(b0.toDF("u", "o", "t", "v"), dir, 0L)
    val streamed = fold(b1.toDF("u", "o", "t", "v"), dir, 1L)
    val oneShot = Ewma.smooth(rows.toDF("u", "o", "t", "v"), "u",
        col("o"), col("t"), col("v"), alphaNum = 300)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    streamed shouldBe oneShot
  }

  it should "carry keys absent from a batch through unchanged" in {
    val dir = freshDir()
    fold(Seq((1L, 1L, 0L, 100L), (2L, 1L, 0L, 200L)).toDF("u", "o", "t", "v"),
      dir, 0L)
    val after = fold(Seq((1L, 2L, 0L, 900L)).toDF("u", "o", "t", "v"),
      dir, 1L)
    after(2L) shouldBe ((1L, 200L)) // untouched
    after(1L)._1 shouldBe 2L
    after(1L)._2 shouldBe (300L * 900 + 724L * 100) / 1024
  }

  it should "replay a batch idempotently" in {
    val dir = freshDir()
    fold(Seq((1L, 1L, 0L, 400L)).toDF("u", "o", "t", "v"), dir, 0L)
    val first = fold(Seq((1L, 2L, 0L, 800L)).toDF("u", "o", "t", "v"), dir, 1L)
    val replay = fold(Seq((1L, 2L, 0L, 800L)).toDF("u", "o", "t", "v"), dir, 1L)
    replay shouldBe first
  }
}
