package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultiProbeSpec extends SparkSpec {
  import spark.implicits._

  /** Near-dup clusters: pairs inside a cluster sit just under the SRP
    * planes' resolution, so single-table LSH misses some. */
  private def corpus(n: Int, d: Int): org.apache.spark.sql.DataFrame = {
    val rnd = new scala.util.Random(13)
    val centers = Array.fill(n / 4, d)(rnd.nextFloat() * 2 - 1)
    (0L until n.toLong).map { i =>
      val c = centers((i % (n / 4)).toInt)
      (i, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.08f))
    }.toDF("vec_id", "embedding")
  }

  private def pairs(df: org.apache.spark.sql.DataFrame,
      multi: Boolean): Set[(Long, Long)] = {
    val out =
      if (multi) Ann.lshPairsMultiProbe(df, "vec_id", "embedding",
        threshold = 0.95, numPlanes = 12, tables = 1)
      else Ann.lshPairs(df, "vec_id", "embedding",
        threshold = 0.95, numPlanes = 12, tables = 1)
    out.as[(Long, Long)].collect().toSet
  }

  "lshPairsMultiProbe" should "be a superset of the single-probe pairs" in {
    val df = corpus(80, 16)
    val single = pairs(df, multi = false)
    val multi = pairs(df, multi = true)
    (single -- multi) shouldBe Set.empty
  }

  it should "recover pairs a single unlucky hyperplane split" in {
    val df = corpus(80, 16)
    val single = pairs(df, multi = false)
    val multi = pairs(df, multi = true)
    val exact = Ann.thresholdPairs(df, "vec_id", "embedding", 0.95)
      .as[(Long, Long)].collect().toSet
    multi.size should be > single.size // strictly better on this corpus
    // precision stays exact: every emitted pair verifies above threshold
    (multi -- exact) shouldBe Set.empty
    // and recall is measurably higher
    val rSingle = single.size.toDouble / exact.size
    val rMulti = multi.size.toDouble / exact.size
    rMulti should be > rSingle
  }
}
