package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CmSketchSpec extends SparkSpec {
  import spark.implicits._

  behavior of "CmSketch"

  it should "never undercount (the one-sided error contract)" in {
    val rnd = new scala.util.Random(11)
    // zipf-ish: key k appears ~ 1000/k times
    val rows = (1 to 50).flatMap(k => Seq.fill(1000 / k)(k.toLong))
      .map(k => k -> rnd.nextInt()) // second column is noise
    val df = rows.toDF("key", "noise")
    val sketch = CmSketch.build(df, "key", depth = 3, width = 64)
    val exact = rows.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val est = CmSketch.estimate(sketch, df, "key", depth = 3, width = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    est.keySet shouldBe exact.keySet
    exact.foreach { case (k, n) => est(k) should be >= n }
    // heavy keys stay sharp: collisions add at most n/width-scale noise
    est(1L) should be < exact(1L) + rows.size.toLong / 8
  }

  it should "estimate absent keys at their collision mass only" in {
    val df = (1L to 100L).toDF("key")
    val sketch = CmSketch.build(df, "key", depth = 4, width = 1024)
    val absent = (1000L to 1010L).toDF("key")
    val est = CmSketch.estimate(sketch, absent, "key", 4, 1024)
      .collect().map(_.getLong(1))
    // true count is 0; with 100 keys in 1024 buckets and 4 rows, the
    // min over rows is almost surely 0 for every probe
    est.sum should be <= 2L
  }

  it should "merge cell-wise by addition (partition-independence)" in {
    val a = (1L to 60L).toDF("key")
    val b = (30L to 90L).toDF("key")
    val merged = CmSketch.build(a, "key", 3, 32)
      .unionAll(CmSketch.build(b, "key", 3, 32))
      .groupBy("j", "bucket").agg(sum("cnt").as("cnt"))
    val whole = CmSketch.build(a.unionAll(b), "key", 3, 32)
    merged.unionAll(whole).groupBy("j", "bucket", "cnt").count()
      .where(col("count") =!= 2).count() shouldBe 0L
  }
}
