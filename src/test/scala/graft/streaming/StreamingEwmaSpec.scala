package graft.streaming

import graft.SparkSpec
import graft.operators.Ewma
import org.apache.spark.sql.functions._

class StreamingEwmaSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir() = java.nio.file.Files
    .createTempDirectory("ewma-state").toString

  private def fold(df: org.apache.spark.sql.DataFrame, dir: String,
      b: Long, run: String = "r") =
    StreamingEwma.observeBatch(df, "u", col("o"), col("t"), col("v"),
        alphaNum = 300, k = 10, dir, run, b)
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

  it should "fold from its OWN run's state after a fresh-checkpoint restart" in {
    val dir = freshDir()
    // old deployment accumulates through batch 5 (state: one obs, 100)
    fold(Seq((1L, 1L, 0L, 100L)).toDF("u", "o", "t", "v"), dir, 5L, "old")
    // new deployment: batch 0 has no own-run prior → continues from the
    // old run's latest state (restart-continuation semantics)
    val b0 = fold(Seq((1L, 2L, 0L, 900L)).toDF("u", "o", "t", "v"),
      dir, 0L, "new")
    b0(1L) shouldBe ((2L, (300L * 900 + 724L * 100) / 1024))
    // batch 1 (id still < old run's max) must fold from new-run batch 0,
    // NOT snap back to the old run's higher-numbered final state
    val b1 = fold(Seq((1L, 3L, 0L, 500L)).toDF("u", "o", "t", "v"),
      dir, 1L, "new")
    b1(1L)._1 shouldBe 3L
    b1(1L)._2 shouldBe (300L * 500 + 724L * b0(1L)._2) / 1024
  }

  it should "replay a batch idempotently" in {
    val dir = freshDir()
    fold(Seq((1L, 1L, 0L, 400L)).toDF("u", "o", "t", "v"), dir, 0L)
    val first = fold(Seq((1L, 2L, 0L, 800L)).toDF("u", "o", "t", "v"), dir, 1L)
    val replay = fold(Seq((1L, 2L, 0L, 800L)).toDF("u", "o", "t", "v"), dir, 1L)
    replay shouldBe first
  }
}
