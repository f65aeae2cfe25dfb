package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {

  import spark.implicits._

  // 12k keys over 3 groups with known distinct counts and a skewed
  // frequency profile (key i repeated 1 + i%5 times).
  private lazy val data = {
    val rows = for {
      g <- Seq("a", "b", "c")
      i <- 0 until (g match { case "a" => 5000; case "b" => 800; case _ => 40 })
      _ <- 0 to i % 5
    } yield (g, s"$g-key-$i")
    rows.toDF("g", "k")
  }

  behavior of "Sketches.hll"

  it should "estimate within 5% of exact distinct at 5k cardinality" in {
    val est = Sketches.hllEstimate(data, Seq("g"), col("k"))
      .select("g", "estimate").as[(String, Double)].collect().toMap
    val exact = Map("a" -> 5000.0, "b" -> 800.0, "c" -> 40.0)
    for ((g, e) <- exact)
      math.abs(est(g) - e) / e should be < 0.05
  }

  it should "be invariant to partitioning and row order" in {
    val base = Sketches.hllSummary(data, Seq("g"), col("k")).collect().toSet
    val shuffled = Sketches.hllSummary(
      data.repartition(7, col("k")).sortWithinPartitions(desc("k")),
      Seq("g"), col("k")).collect().toSet
    shuffled shouldBe base
  }

  it should "merge split sketches to exactly the whole-data registers" in {
    val whole = Sketches.hllRegisters(data, Seq("g"), col("k")).collect().toSet
    val left = Sketches.hllRegisters(data.where(expr("length(k) % 2 = 0")), Seq("g"), col("k"))
    val right = Sketches.hllRegisters(data.where(expr("length(k) % 2 = 1")), Seq("g"), col("k"))
    Sketches.hllMerge(left, right, Seq("g")).collect().toSet shouldBe whole
  }

  it should "keep registers within the rho range [1, 51]" in {
    val regs = Sketches.hllRegisters(data, Seq("g"), col("k"))
      .agg(min("reg"), max("reg")).as[(Int, Int)].head()
    regs._1 should be >= 1
    regs._2 should be <= 51
  }

  behavior of "Sketches.cms"

  it should "never underestimate and be exact for collision-free keys" in {
    val df = data.where(col("g") === "c") // 40 keys, counts 1..5
    val sketch = Sketches.cmsSketch(df, col("k"))
    val est = Sketches.cmsEstimate(df, col("k"), sketch)
      .as[(String, Long)].collect().toMap
    val truth = df.groupBy("k").count().as[(String, Long)].collect().toMap
    for ((k, t) <- truth) est(k) should be >= t
    // 40 keys into 4×1024 buckets: min-over-rows collisions are absent
    est shouldBe truth
  }

  it should "overestimate only, even under heavy load" in {
    val sketch = Sketches.cmsSketch(data, col("k"))
    val est = Sketches.cmsEstimate(data, col("k"), sketch)
      .as[(String, Long)].collect().toMap
    val truth = data.groupBy("k").count().as[(String, Long)].collect().toMap
    for ((k, t) <- truth) est(k) should be >= t
  }

  it should "merge split sketches to the whole-data counters" in {
    val whole = Sketches.cmsSketch(data, col("k")).collect().toSet
    val l = Sketches.cmsSketch(data.where(expr("length(k) % 2 = 0")), col("k"))
    val r = Sketches.cmsSketch(data.where(expr("length(k) % 2 = 1")), col("k"))
    Sketches.cmsMerge(l, r).collect().toSet shouldBe whole
  }
}
