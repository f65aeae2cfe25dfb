package graft.spatial

import graft.SparkSpec
import graft.spatial.StayExtraction.Obs

/** Fidelity tests for the windowed multi-candidate estimator + trellis:
  * fixtures where the greedy single-cluster pass and the reference's
  * candidate-window semantics PROVABLY differ. */
class WindowedStaysSpec extends SparkSpec {
  import spark.implicits._

  private val SiteA = (40.0000, -74.0000)
  private val SiteB = (40.0200, -74.0000) // ~2.2 km north of A

  private def obsAt(user: Long, minute: Int, site: (Double, Double),
      acc: Double = 30.0): Obs =
    Obs(user, minute * 60000L, site._1, site._2, acc)

  /** Interleaved two-site trace: runs of A observations with B observations
    * injected every few minutes. Each same-site run is < 15 min, so the
    * greedy single-cluster pass never accumulates a qualifying stay. */
  private lazy val interleaved: IndexedSeq[Obs] = {
    // minutes 0..90, site pattern: A A A B A A B A A B ... (B every 3rd+1)
    (0 to 90 by 2).map { m =>
      val site = if (m % 8 == 6) SiteB else SiteA
      obsAt(1L, m, site)
    }
  }

  "clusterPass (windowed)" should
    "assemble interleaved sites into two long clusters where greedy fragments them" in {
    val windowed = WindowedStays.clusterPass(interleaved,
      lookupMs = 60L * 60 * 1000, lambda = 0.95)
    val longWindowed = windowed.filter(c => c.toMs - c.fromMs >= 15L * 60 * 1000)
    // windowed: one A cluster spanning ~the whole trace and one long B chain
    longWindowed.size shouldBe 2
    val a = longWindowed.minBy(_.lat)
    a.lat shouldBe SiteA._1 +- 0.001
    a.memberIdx.size should be > 30
    // greedy (lookup 0): every site switch breaks the open cluster, so no
    // cluster ever spans >= 15 min
    val greedy = WindowedStays.clusterPass(interleaved, lookupMs = 0L, lambda = 0.95)
    greedy.filter(c => c.toMs - c.fromMs >= 15L * 60 * 1000) shouldBe empty
    greedy.size should be > longWindowed.size
  }

  it should "degenerate to the greedy chain when lookup is zero (clean runs)" in {
    // clean consecutive runs: A for 30 min, B for 30 min, A for 30 min
    val clean = ((0 to 28 by 2).map(m => obsAt(2L, m, SiteA)) ++
      (30 to 58 by 2).map(m => obsAt(2L, m, SiteB)) ++
      (60 to 88 by 2).map(m => obsAt(2L, m, SiteA))).toIndexedSeq
    val greedy = WindowedStays.clusterPass(clean, lookupMs = 0L, lambda = 0.95)
    greedy.size shouldBe 3
    greedy.map(_.memberIdx.size).toSet shouldBe Set(15)
  }

  "the trellis" should "drop device-left-behind observations as Stationary" in {
    // traveler is at A for 20 min, then goes to B for 40 min while a second
    // device keeps reporting from A every 6 min (and outlasts the trip);
    // trellis must attribute the interleaved A pings to the stationary
    // device (cost ~0) instead of bouncing the traveler A<->B (2.2 km per
    // switch). NB the stationary cluster must span past the last B
    // observation — Mov/Stat(cluster) states die when the cluster ends.
    val trace = ((0 to 18 by 2).map(m => obsAt(3L, m, SiteA)) ++
      (20 to 58).flatMap { m =>
        if (m % 6 == 0) Some(obsAt(3L, m, SiteA)) // left-behind device pings
        else if (m % 2 == 0) Some(obsAt(3L, m, SiteB)) // traveler at B
        else None
      } ++ Seq(obsAt(3L, 60, SiteA))).sortBy(_.timeMs).toIndexedSeq
    val clusters = WindowedStays.clusterPass(trace, 60L * 60 * 1000, 0.95)
      .filter(c => c.toMs - c.fromMs >= 15L * 60 * 1000)
    val byId = clusters.map(c => c.id -> c).toMap
    val assigned = {
      val arr = Array.fill[Option[WindowedStays.ClusterObs]](trace.length)(None)
      clusters.foreach(c => c.memberIdx.foreach(i => arr(i) = Some(c)))
      arr.toIndexedSeq
    }
    val kept = WindowedStays.smooth(trace, assigned, byId, 120L * 60 * 1000)
    val keptObs = kept.map(trace)
    // every B observation survives; the late A pings (minute >= 24) are
    // classified Stationary and dropped
    keptObs.count(_.lat > 40.01) shouldBe trace.count(_.lat > 40.01)
    val lateA = trace.zipWithIndex.filter { case (o, _) =>
      o.lat < 40.01 && o.timeMs >= 24L * 60000
    }.map(_._2)
    lateA.toSet.intersect(kept.toSet) shouldBe empty
  }

  "extractStays (end-to-end)" should
    "produce >= 15-min stays on the noisy trace where greedy produces none" in {
    val ds = interleaved.toDS()
    val windowed = WindowedStays.extractStays(ds,
      minFinalStayMs = 15L * 60 * 1000).collect()
    windowed should not be empty
    windowed.foreach(s => (s.end_ms - s.start_ms) should be >= 15L * 60 * 1000)
    val greedy = StayExtraction.extractStays(ds,
      minStayMs = 15L * 60 * 1000).collect()
    greedy shouldBe empty
  }

  it should "agree with the greedy extractor on clean well-separated runs" in {
    val clean = ((0 to 28 by 2).map(m => obsAt(4L, m, SiteA)) ++
      (40 to 68 by 2).map(m => obsAt(4L, m, SiteB))).toIndexedSeq
    val ds = clean.toDS()
    val windowed = WindowedStays.extractStays(ds, minFinalStayMs = 15L * 60 * 1000)
      .collect().sortBy(_.start_ms)
    val greedy = StayExtraction.extractStays(ds, minStayMs = 15L * 60 * 1000)
      .collect().sortBy(_.start_ms)
    windowed.map(s => (s.user, s.start_ms, s.end_ms, s.n_obs)).toSeq shouldBe
      greedy.map(s => (s.user, s.start_ms, s.end_ms, s.n_obs)).toSeq
  }
}
