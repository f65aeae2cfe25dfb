package graft.text

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  "stratifiedSample" should "keep exactly the rows whose Knuth draw clears the bucket rate" in {
    val df = Seq(
      (1L, "a"), (2L, "a"), (3L, "a"), (4L, "a"), (5L, "a"),
      (6L, "b"), (7L, "b"), (8L, "b"), (9L, "b"), (10L, "b"))
      .toDF("id", "bucket")
    val rates = Map("a" -> 0.5, "b" -> 0.25)
    // reference draw computed independently on the driver
    def u(id: Long) = java.lang.Math.floorMod(id * 2654435761L, 1L << 32)
    val expected = (1L to 10L).filter { id =>
      val b = if (id <= 5) "a" else "b"
      u(id) < (rates(b) * (1L << 32)).toLong
    }.toSet
    val kept = Sampling.stratifiedSample(df, "id", "bucket", rates)
      .select("id").as[Long].collect().toSet
    kept shouldBe expected
    expected should not be empty // the fixture exercises both outcomes
    expected.size should be < 10
  }

  it should "keep unlisted buckets in full" in {
    val df = Seq((1L, "x"), (2L, "x")).toDF("id", "bucket")
    Sampling.stratifiedSample(df, "id", "bucket", Map("y" -> 0.0))
      .count() shouldBe 2
  }
}
