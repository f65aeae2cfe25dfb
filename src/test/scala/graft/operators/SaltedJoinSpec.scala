package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SaltedJoinSpec extends SparkSpec {
  import spark.implicits._

  private val probe = Seq(
    (1L, "hot"), (2L, "hot"), (3L, "hot"), (4L, "hot"), (5L, "hot"),
    (6L, "cold"), (7L, "missing")).toDF("pid", "k")
  private val build = Seq(
    ("hot", 100L), ("cold", 200L), ("unused", 300L)).toDF("k", "v")

  "inner" should "produce exactly the plain inner join's rows" in {
    val plain = probe.join(build, Seq("k"))
      .select("pid", "v").as[(Long, Long)].collect().sorted.toSeq
    val salted = SaltedJoin.inner(probe, build, Seq("k"), salts = 4)
      .select("pid", "v").as[(Long, Long)].collect().sorted.toSeq
    salted shouldBe plain
    salted.map(_._1) should not contain 7L // unmatched probe key dropped
  }

  it should "handle duplicate build rows per key like the plain join" in {
    val dupBuild = Seq(("hot", 1L), ("hot", 2L)).toDF("k", "v")
    val plain = probe.join(dupBuild, Seq("k")).count()
    SaltedJoin.inner(probe, dupBuild, Seq("k"), salts = 3)
      .count() shouldBe plain // 5 hot probe rows x 2 build rows
  }

  it should "actually spread a hot key across salt values" in {
    val salts = probe.withColumn("__salt",
        pmod(xxhash64(probe.columns.map(col): _*), lit(4L)).cast("int"))
      .where($"k" === "hot").select("__salt").as[Int].collect()
    salts.distinct.length should be > 1
  }

  it should "reject a salt-column collision" in {
    val bad = probe.withColumnRenamed("pid", "__salt")
    an[IllegalArgumentException] should be thrownBy
      SaltedJoin.inner(bad, build, Seq("k"), 2)
  }
}
