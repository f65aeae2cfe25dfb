package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GeoFenceSpec extends SparkSpec {

  import spark.implicits._

  behavior of "GeoFence"

  private val square = Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0))
  // L-shape: non-convex — bbox contains points the polygon doesn't
  private val ell = Seq((20.0, 0.0), (30.0, 0.0), (30.0, 4.0), (24.0, 4.0),
    (24.0, 10.0), (20.0, 10.0))

  it should "ray-cast convex and non-convex fences correctly" in {
    val pts = Seq(
      (1L, 5.0, 5.0),   // inside square
      (2L, 11.0, 5.0),  // outside
      (3L, 22.0, 2.0),  // inside L (bottom arm)
      (4L, 22.0, 8.0),  // inside L (left arm)
      (5L, 27.0, 8.0),  // inside L's bbox but in the notch -> outside
      (6L, -1.0, -1.0)
    ).toDF("id", "x", "y")
    val got = GeoFence.fenceJoin(pts, "x", "y",
        Seq(("sq", square), ("ell", ell)))
      .select(col("id"), col("fence_tag"))
      .as[(Long, Option[String])].collect().toMap
    got(1L) shouldBe Some("sq")
    got(2L) shouldBe None
    got(3L) shouldBe Some("ell")
    got(4L) shouldBe Some("ell")
    got(5L) shouldBe None
    got(6L) shouldBe None
  }

  it should "match a JVM reference ray cast on random points" in {
    def refInside(x: Double, y: Double, ring: Seq[(Double, Double)]): Boolean = {
      var inside = false
      var j = ring.size - 1
      for (i <- ring.indices) {
        val (xi, yi) = ring(i); val (xj, yj) = ring(j)
        if ((yi > y) != (yj > y) &&
            x < (xj - xi) * (y - yi) / (yj - yi) + xi) inside = !inside
        j = i
      }
      inside
    }
    val rnd = new scala.util.Random(7)
    val pts = (0 until 2000).map(i =>
      (i.toLong, rnd.nextDouble() * 40 - 5, rnd.nextDouble() * 20 - 5))
    val got = GeoFence.fenceJoin(pts.toDF("id", "x", "y"), "x", "y",
        Seq(("sq", square), ("ell", ell)))
      .select(col("id"), col("fence_tag"))
      .as[(Long, Option[String])].collect().toMap
    pts.foreach { case (id, x, y) =>
      val want =
        if (refInside(x, y, square)) Some("sq")
        else if (refInside(x, y, ell)) Some("ell")
        else None
      withClue(s"point ($x, $y): ") { got(id) shouldBe want }
    }
  }

  it should "give the FIRST fence on overlap, deterministically" in {
    val inner = Seq((2.0, 2.0), (8.0, 2.0), (8.0, 8.0), (2.0, 8.0))
    val got = GeoFence.fenceJoin(Seq((1L, 5.0, 5.0)).toDF("id", "x", "y"),
        "x", "y", Seq(("outer", square), ("inner", inner)))
      .select(col("fence_tag")).as[Option[String]].head()
    got shouldBe Some("outer")
  }

  it should "keep the point side exchange-free in the plan" in {
    val dir = java.nio.file.Files.createTempDirectory("geofence").toString
    (0 until 100).map(i => (i.toLong, i * 0.3, i * 0.15))
      .toDF("id", "x", "y").write.mode("overwrite").parquet(s"$dir/p")
    val pts = spark.read.parquet(s"$dir/p")
    val plan = GeoFence.fenceJoin(pts, "x", "y", Seq(("sq", square)))
      .queryExecution.executedPlan.toString
    plan should include("polygon_index_of")
    plan should include("BroadcastHashJoin")
    plan should not include "Exchange hashpartitioning"
  }

  it should "reject degenerate fences" in {
    an[IllegalArgumentException] should be thrownBy
      GeoFence.fenceJoin(Seq((1L, 0.0, 0.0)).toDF("id", "x", "y"),
        "x", "y", Seq(("bad", Seq((0.0, 0.0), (1.0, 1.0)))))
  }
}
