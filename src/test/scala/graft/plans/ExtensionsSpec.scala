package graft.plans

import java.nio.file.Files

import graft.SparkSpec
import graft.functions.Haversine
import org.apache.spark.sql.functions._

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  "GraftExtensions" should "expose haversine_m and duration_ms in SQL" in {
    spark.sql("SELECT haversine_m(0D, 0D, 0D, 1D) AS d")
      .collect().head.getDouble(0) shouldBe 111.19e3 +- 0.2e3
    spark.sql(
      "SELECT duration_ms(TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-01-01 00:00:02') AS d")
      .collect().head.getLong(0) shouldBe 2000L
  }

  it should "expose the exact geodesic (vincenty_m and geodesic_m) in SQL" in {
    val Seq(v, g) = spark.sql(
      "SELECT vincenty_m(48.8566D, 2.3522D, 40.7128D, -74.006D) AS v, " +
        "geodesic_m(48.8566D, 2.3522D, 40.7128D, -74.006D) AS g")
      .collect().head.toSeq.map(_.asInstanceOf[Double])
    math.abs(v - g) should be < 1e-3
    // the antipodal case Vincenty's iteration cannot solve
    spark.sql("SELECT geodesic_m(0D, 0D, 0.5D, 179.5D) AS g")
      .collect().head.getDouble(0) shouldBe 19936288.579 +- 0.5
  }

  "HaversineRadiusPrefilter" should "push a latitude band into the scan without changing results" in {
    val dir = Files.createTempDirectory("graft-geo").resolve("pts").toString
    val rows = (0 until 1000).map { i =>
      (i.toLong, -30.0 + i * 0.06, 10.0 + (i % 50) * 0.1) // lats -30..30
    }
    rows.toDF("id", "lat", "lon").write.parquet(dir)

    val q = spark.read.parquet(dir)
      .where(expr("haversine_m(lat, lon, 0.0D, 12.0D) <= 300000.0D"))
    val plan = q.queryExecution.executedPlan.toString
    plan should include regex "PushedFilters: \\[[^]]*GreaterThanOrEqual\\(lat,-2\\.7"

    // ground truth computed independently on the driver
    val expected = rows.filter { case (_, la, lo) =>
      Haversine.distanceMeters(la, lo, 0.0, 12.0) <= 300000.0
    }.map(_._1).sorted
    expected should not be empty
    q.select("id").collect().map(_.getLong(0)).sorted.toSeq shouldBe expected
  }
}
