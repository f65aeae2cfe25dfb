package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeLookupSpec extends SparkSpec {

  import spark.implicits._

  behavior of "RangeLookup"

  private lazy val ranges = Seq(
    (0L, 99L, "block-a"), (100L, 100L, "point"), (250L, 399L, "block-b"))
    .toDF("lo", "hi", "tag")

  it should "binary-search correctly at bounds, gaps, and beyond" in {
    RangeLookup.search(0L, Array(0L, 100L, 250L), Array(99L, 100L, 399L)) shouldBe 0
    RangeLookup.search(99L, Array(0L, 100L, 250L), Array(99L, 100L, 399L)) shouldBe 0
    RangeLookup.search(100L, Array(0L, 100L, 250L), Array(99L, 100L, 399L)) shouldBe 1
    RangeLookup.search(101L, Array(0L, 100L, 250L), Array(99L, 100L, 399L)) shouldBe -1
    RangeLookup.search(399L, Array(0L, 100L, 250L), Array(99L, 100L, 399L)) shouldBe 2
    RangeLookup.search(400L, Array(0L, 100L, 250L), Array(99L, 100L, 399L)) shouldBe -1
    RangeLookup.search(-1L, Array(0L, 100L, 250L), Array(99L, 100L, 399L)) shouldBe -1
  }

  it should "match the theta-join result with left semantics" in {
    val probe = (0L until 500L).map(k => (k, s"row$k")).toDF("k", "payload")
    val got = RangeLookup.lookupJoin(probe, "k", ranges, "lo", "hi")
      .select(col("k"), col("tag")).as[(Long, Option[String])]
      .collect().toMap
    val want = probe.join(ranges,
        probe("k") >= ranges("lo") && probe("k") <= ranges("hi"), "left")
      .select(col("k"), col("tag")).as[(Long, Option[String])]
      .collect().toMap
    got shouldBe want
    got(50L) shouldBe Some("block-a")
    got(100L) shouldBe Some("point")
    got(150L) shouldBe None
    got.size shouldBe 500
  }

  it should "add zero exchanges on the probe side" in {
    // parquet-backed probe: local relations fold at optimize time and
    // would hide the expression node
    val dir = java.nio.file.Files.createTempDirectory("rangelookup").toString
    (0L until 100L).toDF("k").write.mode("overwrite").parquet(s"$dir/probe")
    val probe = spark.read.parquet(s"$dir/probe")
    val plan = RangeLookup.lookupJoin(probe, "k", ranges, "lo", "hi")
      .queryExecution.executedPlan.toString
    plan should include("range_index_of")
    plan should include("BroadcastHashJoin")
    plan should not include "Exchange hashpartitioning"
  }

  it should "reject overlapping ranges" in {
    val bad = Seq((0L, 10L, "a"), (5L, 20L, "b")).toDF("lo", "hi", "tag")
    an[IllegalArgumentException] should be thrownBy
      RangeLookup.lookupJoin((0L until 5L).toDF("k"), "k", bad, "lo", "hi")
  }

  it should "reject hi < lo and oversized range sides" in {
    val bad = Seq((10L, 5L, "a")).toDF("lo", "hi", "tag")
    an[IllegalArgumentException] should be thrownBy
      RangeLookup.lookupJoin((0L until 5L).toDF("k"), "k", bad, "lo", "hi")
    an[IllegalArgumentException] should be thrownBy
      RangeLookup.lookupJoin((0L until 5L).toDF("k"), "k", ranges, "lo", "hi",
        maxRanges = 2)
  }
}
