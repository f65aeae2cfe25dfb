package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {

  import spark.implicits._

  private lazy val probe = (0L until 20000L).map(i => (i, s"p$i")).toDF("k", "pv")
  // selective build side: 200 of the 20k keys
  private lazy val build = (0L until 20000L by 100).map(i => (i, s"b$i")).toDF("bk", "bv")

  behavior of "BloomJoin"

  it should "produce exactly the plain join result" in {
    val pruned = BloomJoin.prunedJoin(probe, "k", build, "bk")
      .select("k", "pv", "bk", "bv").collect().toSet
    val plain = probe.join(build, probe("k") === build("bk"))
      .select("k", "pv", "bk", "bv").collect().toSet
    pruned shouldBe plain
    pruned.size shouldBe 200
  }

  it should "never reject a key present in the build side (no false negatives)" in {
    val bits = BloomJoin.buildBits(build, col("bk"))
    build.where(!BloomJoin.mightContain(col("bk"), bits)).count() shouldBe 0L
  }

  it should "prune most non-matching probe rows before the join" in {
    val bits = BloomJoin.buildBits(build, col("bk"), numBits = 1 << 16)
    val kept = probe.where(BloomJoin.mightContain(col("k"), bits)).count()
    // 200 true keys; false-positive tail must stay well under 5% of 20k
    kept should be >= 200L
    kept should be < 1200L
    bits.length shouldBe (1 << 16) / 64
  }

  it should "keep the membership filter below the join in the physical plan" in {
    // parquet-backed probe side: local relations get folded at optimize
    // time, which would hide the filter node we want to see
    val dir = java.nio.file.Files.createTempDirectory("bloomplan").toString
    probe.write.mode("overwrite").parquet(s"$dir/probe")
    val probeP = spark.read.parquet(s"$dir/probe")
    val plan = BloomJoin.prunedJoin(probeP, "k", build, "bk")
      .queryExecution.executedPlan.toString
    plan should include("bloom_might_contain")
    // plans print top-down, so a larger index means deeper than the join
    plan.indexOf("bloom_might_contain") should be > plan.indexOf("Join")
  }

  it should "agree between interpreted and codegen evaluation" in {
    val bits = BloomJoin.buildBits(build, col("bk"))
    val viaColumn = probe
      .select(col("k"), BloomJoin.mightContain(col("k"), bits).as("m"))
      .as[(Long, Boolean)].collect().toMap
    val viaJvm = probe.select(col("k"), xxhash64(col("k")).as("h"))
      .as[(Long, Long)].collect()
      .map { case (k, h) => k -> BloomJoin.test(h, bits, BloomJoin.DefaultNumHashes) }
      .toMap
    viaColumn shouldBe viaJvm
  }
}
