package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {

  import spark.implicits._

  behavior of "HeavyHitters"

  private def zipfish(n: Int, seed: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      val r = rnd.nextDouble()
      if (r < 0.30) "hot1"
      else if (r < 0.45) "hot2"
      else if (r < 0.52) "warm"
      else s"cold${rnd.nextInt(5000)}" // long tail, mostly unique
    }
  }

  it should "match the exact GROUP BY + threshold answer" in {
    for (seed <- 1 to 3) {
      val data = zipfish(20000, seed)
      val df = data.toDF("v").repartition(7)
      val s = 20
      val got = HeavyHitters.frequentItems(df, "v", s)
        .as[(String, Long)].collect().toMap
      val n = data.size.toLong
      val want = data.groupBy(identity).view.mapValues(_.size.toLong)
        .filter { case (_, c) => c * s >= n }.toMap
      got shouldBe want
      got.keySet should contain("hot1")
    }
  }

  it should "never lose a heavy hitter to partition order (MG guarantee)" in {
    // adversarial layout: the heavy value arrives LAST in every partition,
    // after the tail has churned the counters
    val tail = (0 until 9000).map(i => s"t$i")
    val heavy = Seq.fill(1000)("heavy")
    val df = (tail ++ heavy).toDF("v").repartition(4)
    val got = HeavyHitters.frequentItems(df, "v", 10)
      .as[(String, Long)].collect().toMap
    got shouldBe Map("heavy" -> 1000L)
  }

  it should "bound per-partition candidates by s" in {
    val out = HeavyHitters.misraGries(
      (0 until 100000).iterator.map(i => s"x${i % 997}"), 25).toSeq
    out.size should be <= 25
  }

  it should "keep exact MG semantics on a tiny hand trace" in {
    // stream a a b c with s=2: c's arrival decrements a,b; survivors {a}
    val out = HeavyHitters.misraGries(Iterator("a", "a", "b", "c"), 2).toSeq
    out should contain("a")
    out should not contain "b"
    out should not contain "c"
  }

  it should "ignore nulls and return empty when nothing is frequent" in {
    val df = (0 until 1000).map(i => s"u$i").toDF("v")
      .unionByName(Seq.fill(5)(null.asInstanceOf[String]).toDF("v"))
    HeavyHitters.frequentItems(df, "v", 50).count() shouldBe 0L
  }
}
