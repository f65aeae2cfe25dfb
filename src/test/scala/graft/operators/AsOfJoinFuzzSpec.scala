package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

/** Differential fuzzing of the as-of join: random keyed event sets
  * evaluated BOTH by the union+window operator and by an obvious
  * per-key linear-scan reference. Divergence on any (match ts, payload,
  * row multiplicity) is a bug in one of them. Seed fixed for CI;
  * GRAFT_FUZZ_SEED sweeps alternates. */
class AsOfJoinFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(
    sys.env.getOrElse("GRAFT_FUZZ_SEED", "11").toLong)

  private def ts(s: Long) = new Timestamp(s)

  "backward" should "agree with a per-key linear-scan reference on random data" in {
    for (round <- 1 to 15) {
      val nKeys = 1 + rnd.nextInt(5)
      val probes = (1 to 40 + rnd.nextInt(60)).map { i =>
        (rnd.nextInt(nKeys).toLong, ts(rnd.nextInt(1000).toLong), i.toLong)
      }
      val builds = (1 to rnd.nextInt(80)).map { i =>
        (rnd.nextInt(nKeys).toLong, ts(rnd.nextInt(1000).toLong),
          1000L + i, rnd.nextDouble())
      }
      // reference: greatest build ts <= probe ts per key; ties on build
      // ts broken like the operator (last in (ts, id) order — but the
      // generator never emits duplicate (key, ts) builds, so ties can't
      // arise)
      val dedupBuilds = builds.groupBy(b => (b._1, b._2.getTime))
        .map(_._2.head).toSeq
      val byKey = dedupBuilds.groupBy(_._1)
        .view.mapValues(_.sortBy(_._2.getTime)).toMap
      val expected = probes.map { case (k, t, id) =>
        val m = byKey.getOrElse(k, Seq.empty)
          .takeWhile(_._2.getTime <= t.getTime).lastOption
        id -> m.map(b => (b._3, b._4))
      }.toMap

      val got = AsOfJoin.backward(
          probes.toDF("k", "pts", "pid"),
          dedupBuilds.toDF("k", "bts", "bid", "bval"),
          Seq("k"), "pts", "bts", Seq("bid", "bval"))
        .select("pid", "bid", "bval")
        .as[(Long, Option[Long], Option[Double])].collect()
        .map(r => r._1 -> r._2.map(b => (b, r._3.get))).toMap

      withClue(s"round $round: ") {
        got.size shouldBe probes.size // every probe row exactly once
        got shouldBe expected
      }
    }
  }
}
