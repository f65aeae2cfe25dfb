package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EwmaSpec extends SparkSpec {
  import spark.implicits._

  behavior of "Ewma.smooth"

  private def ref(vs: Seq[Long], a: Long, k: Int): Long =
    vs.tail.foldLeft(vs.head)((acc, v) =>
      (a * v + ((1L << k) - a) * acc) / (1L << k))

  it should "match the sequential fixed-point fold per key" in {
    val rnd = new scala.util.Random(3)
    val rows = for (u <- 1 to 10; i <- 1 to 50)
      yield (u.toLong, i.toLong, i.toLong, rnd.nextLong(10000))
    val out = Ewma.smooth(rows.toDF("u", "o", "t", "v"), "u",
        col("o"), col("t"), col("v"), alphaNum = 300)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val byKey = rows.groupBy(_._1)
    byKey.foreach { case (u, rs) =>
      out(u) shouldBe ((rs.size.toLong,
        ref(rs.sortBy(r => (r._2, r._3)).map(_._4), 300, 10)))
    }
  }

  it should "order by (orderCol, tieCol), not arrival order" in {
    // same key, shuffled arrival; ties on o broken by t
    val rows = Seq((1L, 2L, 0L, 100L), (1L, 1L, 1L, 500L),
      (1L, 1L, 0L, 900L), (1L, 3L, 0L, 0L))
    val got = Ewma.smooth(rows.toDF("u", "o", "t", "v"), "u",
        col("o"), col("t"), col("v"), alphaNum = 512)
      .head().getLong(2)
    got shouldBe ref(Seq(900L, 500L, 100L, 0L), 512, 10)
  }

  it should "converge to a constant signal exactly" in {
    val rows = (1 to 40).map(i => (1L, i.toLong, 0L, 777L))
    Ewma.smooth(rows.toDF("u", "o", "t", "v"), "u",
        col("o"), col("t"), col("v"), alphaNum = 100)
      .head().getLong(2) shouldBe 777L
  }
}
