package graft.spatial

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.algo.Viterbi
import graft.functions.Haversine
import graft.spatial.StayExtraction.{Obs, Stay}

/** Windowed multi-candidate stay extraction with trellis smoothing — the
  * full-fidelity counterpart of [[StayExtraction.extractStays]] (which keeps
  * exactly one open cluster, the scale-lean greedy variant).
  *
  * Reference semantics reproduced (re-expressed, not ported):
  *
  *  1. '''Candidate-window clustering''' (`spatial/src/main/com/thymeflow/
  *     location/cluster/TimeSequentialClusterEstimator.scala:49-106`): keep
  *     EVERY candidate cluster whose last observation is within a lookup
  *     window (default 60 min) of the current observation; try to merge the
  *     observation into the most recently updated candidate first; a merge
  *     is accepted when the Hellinger distance between the merged cluster's
  *     distribution and EACH member observation's distribution (the new one
  *     eagerly first — `TimeSequentialClusterEstimator.scala:80-87`) is at
  *     most lambda. Candidates that fall out of the window close; when all
  *     do, the most recent one is retained
  *     (`TimeSequentialClusterEstimator.scala:65-71`). On noisy interleaved
  *     traces (A A B A B B ...) this reassembles both sites' stays where the
  *     greedy single-cluster pass fragments them.
  *  2. '''Cluster statistics''' (`spatial/src/main/com/thymeflow/location/
  *     cluster/MaxLikelihoodCluster.scala:60-101`): precision-weighted mean;
  *     cluster variance is the harmonic-style n/Σ(1/vᵢ) — the average
  *     observation variance, NOT the variance of the mean, so clusters do
  *     not tighten without bound as they grow.
  *  3. '''Trellis smoothing''' (`spatial/src/main/com/thymeflow/location/
  *     treillis/StateEstimator.scala:19-141`, `StateGenerator.scala:14-87`):
  *     per observation the traveler is in one of three states — Same
  *     (device with traveler, no split), Moving(cluster) (device carried,
  *     another device stationary at cluster), Stationary(cluster, moving)
  *     (this observation from the left-behind device). Transition costs are
  *     ground distances; the min-cost state path (decoded with
  *     [[graft.algo.Viterbi]], segmented at singleton frontiers as the
  *     reference's `findSingleNodes` does) classifies each observation, and
  *     Stationary observations (device left behind) are dropped
  *     (`location/Clustering.scala:74-82`).
  *  4. '''Re-cluster''' (`thymeflow/src/main/com/thymeflow/enricher/
  *     LocationStayEnricher.scala:72-77`): the surviving observations are
  *     re-clustered greedily (lookup 0, min stay 0) into the final stays.
  *
  * Spark shape: `repartition(user)` + `sortWithinPartitions(user, time)` +
  * `mapPartitions` — one shuffle, then a sequential per-user pass whose
  * state is bounded by one user's trace (the same bound as the reference's
  * per-repository Akka stream). Each user is independent, so the operator
  * scales out with the number of users regardless of total data size.
  */
object WindowedStays {

  /** Reference defaults (`LocationStayEnricher.scala:52-56`). */
  val DefaultMinStayMs: Long = 15L * 60 * 1000
  val DefaultLookupMs: Long = 60L * 60 * 1000
  val DefaultMovementMs: Long = 120L * 60 * 1000
  val DefaultLambda: Double = 0.95

  def extractStays(
      obs: Dataset[Obs],
      minStayMs: Long = DefaultMinStayMs,
      lookupMs: Long = DefaultLookupMs,
      movementMs: Long = DefaultMovementMs,
      lambda: Double = DefaultLambda,
      minFinalStayMs: Long = 0L): Dataset[Stay] = {
    val spark = obs.sparkSession
    import spark.implicits._
    obs
      .repartition(col("user"))
      .sortWithinPartitions(col("user"), col("timeMs"))
      .mapPartitions { it =>
        new PerUserIterator(it,
          u => processUser(u, minStayMs, lookupMs, movementMs, lambda, minFinalStayMs))
      }
  }

  /** DataFrame adapter: (user, ts timestamp, lat, lon, accuracy). */
  def extractStaysDf(df: DataFrame,
      minStayMs: Long = DefaultMinStayMs,
      lookupMs: Long = DefaultLookupMs,
      movementMs: Long = DefaultMovementMs,
      lambda: Double = DefaultLambda,
      minFinalStayMs: Long = 0L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed = df.select(
      col("user").cast("long").as("user"),
      unix_millis(col("ts").cast("timestamp")).as("timeMs"),
      col("lat").cast("double").as("lat"),
      col("lon").cast("double").as("lon"),
      col("accuracy").cast("double").as("accuracy")).as[Obs]
    extractStays(typed, minStayMs, lookupMs, movementMs, lambda, minFinalStayMs).toDF()
  }

  // ---------------------------------------------------------------- stage A

  /** One member observation of a candidate cluster (enough to re-check the
    * Hellinger acceptance against a tentatively merged cluster). */
  private[spatial] final case class Member(lat: Double, lon: Double, sigma: Double, idx: Int)

  /** An open candidate cluster. `seq` orders candidates most-recently-
    * updated-first (the reference's (t desc, index desc) SortedSet order).
    * Mean is precision-weighted; variance is n/precSum (see class doc). */
  private[spatial] final case class Cand(
      lat: Double, lon: Double, precSum: Double, n: Int,
      fromMs: Long, toMs: Long, members: List[Member], seq: Long) {
    def sigma: Double = math.sqrt(n / precSum)
  }

  /** A closed cluster: the trellis's ClusterObservation. */
  final case class ClusterObs(
      id: Int, lat: Double, lon: Double, sigma: Double,
      fromMs: Long, toMs: Long, memberIdx: Vector[Int])

  private def mergeCand(c: Cand, o: Obs, idx: Int, seq: Long): Cand = {
    val s = math.max(o.accuracy, 1.0)
    val w = 1.0 / (s * s)
    val total = c.precSum + w
    Cand(
      lat = (c.lat * c.precSum + o.lat * w) / total,
      lon = (c.lon * c.precSum + o.lon * w) / total,
      precSum = total, n = c.n + 1,
      fromMs = math.min(c.fromMs, o.timeMs), toMs = math.max(c.toMs, o.timeMs),
      members = Member(o.lat, o.lon, s, idx) :: c.members, seq = seq)
  }

  private def newCand(o: Obs, idx: Int, seq: Long): Cand = {
    val s = math.max(o.accuracy, 1.0)
    Cand(o.lat, o.lon, 1.0 / (s * s), 1, o.timeMs, o.timeMs,
      Member(o.lat, o.lon, s, idx) :: Nil, seq)
  }

  /** Hellinger distance H (NOT squared — the reference thresholds H,
    * `location/Clustering.scala:161`) between the cluster distribution and
    * one member's distribution. */
  private def memberDistance(clusterLat: Double, clusterLon: Double,
      clusterSigma: Double, m: Member): Double =
    math.sqrt(Geo.hellingerSq(clusterLat, clusterLon, clusterSigma,
      m.lat, m.lon, m.sigma))

  /** One estimator step shared by the batch pass and the incremental
    * (streaming) variant: feed observation `o` into the candidate list,
    * returning (updated candidates most-recent-first, clusters closed by
    * this step, next seq). */
  private[spatial] def stepObs(
      cands0: List[Cand], o: Obs, idx: Int, seq0: Long,
      lookupMs: Long, lambda: Double): (List[Cand], List[Cand], Long) = {
    var cands = cands0
    var seq = seq0
    var closed = List.empty[Cand]
    def insert(c: Cand): Unit = {
      val (before, after) = cands.span(x =>
        x.toMs > c.toMs || (x.toMs == c.toMs && x.seq > c.seq))
      cands = before ::: c :: after
    }
    val (within, outside) = cands.partition(c => math.abs(c.toMs - o.timeMs) <= lookupMs)
    if (within.isEmpty && cands.nonEmpty) {
      // keep the most recent candidate even though it is out of window
      cands = List(cands.head)
      closed = outside.drop(1)
    } else {
      cands = within
      closed = outside
    }
    // most-recent-first merge attempt with the full-membership check
    val accepted = cands.iterator.zipWithIndex.flatMap { case (c, pos) =>
      seq += 1
      val merged = mergeCand(c, o, idx, seq)
      val sig = merged.sigma
      val ok = memberDistance(merged.lat, merged.lon, sig,
          Member(o.lat, o.lon, math.max(o.accuracy, 1.0), idx)) <= lambda &&
        c.members.forall(m => memberDistance(merged.lat, merged.lon, sig, m) <= lambda)
      if (ok) Some((pos, merged)) else None
    }.take(1).toList.headOption
    accepted match {
      case Some((pos, merged)) =>
        cands = cands.patch(pos, Nil, 1)
        insert(merged)
      case None =>
        seq += 1
        insert(newCand(o, idx, seq))
    }
    (cands, closed, seq)
  }

  /** The candidate-window clustering pass. Returns closed clusters in
    * closing order. `lookupMs = 0` degenerates to the greedy single-cluster
    * chain (the reference's stage-3 parametrization). */
  private[spatial] def clusterPass(
      obs: IndexedSeq[Obs], lookupMs: Long, lambda: Double): Vector[ClusterObs] = {
    var cands = List.empty[Cand] // kept sorted: most recent (toMs, seq) first
    var seq = 0L
    var nextId = 0
    val closed = Vector.newBuilder[ClusterObs]
    def close(c: Cand): Unit = {
      closed += ClusterObs(nextId, c.lat, c.lon, c.sigma, c.fromMs, c.toMs,
        c.members.reverseIterator.map(_.idx).toVector)
      nextId += 1
    }
    obs.zipWithIndex.foreach { case (o, idx) =>
      val (nextCands, closedNow, nextSeq) = stepObs(cands, o, idx, seq, lookupMs, lambda)
      cands = nextCands
      seq = nextSeq
      closedNow.foreach(close)
    }
    cands.foreach(close)
    closed.result()
  }

  // ---------------------------------------------------------------- stage B

  /** Trellis state keys (the reference's State ADT, `treillis/State.scala`):
    * cid = stationary-device cluster id, mIdx = index of the last
    * observation attributed to the carried device. */
  private sealed trait TState
  private case object Same extends TState
  private final case class Mov(cid: Int) extends TState
  private final case class Stat(cid: Int, mIdx: Int) extends TState

  /** Port of `StateGenerator.generator`: transitions out of `from` at layer
    * `i` toward observation `i+1`, with ground-distance costs. */
  private def transitions(
      from: TState, i: Int, obs: IndexedSeq[Obs],
      clusterOf: Int => Option[ClusterObs], clusters: Int => ClusterObs,
      movementMs: Long): List[(TState, Double)] = {
    val next = obs(i + 1)
    def d(a: Obs, b: Obs): Double =
      Haversine.distanceMeters(a.lat, a.lon, b.lat, b.lon)
    def dc(c: ClusterObs, b: Obs): Double =
      Haversine.distanceMeters(c.lat, c.lon, b.lat, b.lon)
    def movingStepOk(mIdx: Int): Boolean =
      next.timeMs - obs(mIdx).timeMs <= movementMs || mIdx == i
    def clusterStepOk(c: ClusterObs): Boolean = c.toMs >= next.timeMs
    val nextCluster = clusterOf(i + 1)
    from match {
      case Same =>
        val base = List[(TState, Double)]((Same, d(obs(i), next)))
        clusterOf(i) match {
          case Some(pc) if clusterStepOk(pc) && clusterOf(i) != nextCluster =>
            (Mov(pc.id), d(obs(i), next) + dc(pc, obs(i))) :: base
          case _ => base
        }
      case Mov(cid) if movingStepOk(i) =>
        val c = clusters(cid)
        val same = nextCluster match {
          case Some(nc) if nc.id == cid => List[(TState, Double)]((Same, dc(c, next) + d(obs(i), next)))
          case _ => Nil
        }
        val mov =
          if (clusterStepOk(c)) List[(TState, Double)]((Mov(cid), d(obs(i), next))) else Nil
        val stat = nextCluster match {
          case Some(nc) if nc.id == cid && clusterStepOk(nc) =>
            List[(TState, Double)]((Stat(cid, i), dc(c, next)))
          case _ => Nil
        }
        same ::: mov ::: stat
      case Stat(cid, mIdx) if movingStepOk(mIdx) =>
        val c = clusters(cid)
        val m = obs(mIdx)
        val same = nextCluster match {
          case Some(nc) if nc.id == cid => List[(TState, Double)]((Same, dc(c, next) + d(m, next)))
          case _ => Nil
        }
        val mov =
          if (clusterStepOk(c)) List[(TState, Double)]((Mov(cid), d(m, next))) else Nil
        val stat = nextCluster match {
          case Some(nc) if nc.id == cid && clusterStepOk(nc) =>
            List[(TState, Double)]((Stat(cid, mIdx), dc(c, next)))
          case _ => Nil
        }
        same ::: mov ::: stat
      case _ => Nil
    }
  }

  /** Beam-truncated forward expansion: per-layer reachable states ranked by
    * min accumulated cost, keeping at most `beam` states per layer (with a
    * fresh-start Same fallback when a frontier empties — the reference logs
    * a warning and force-flushes there). The beam is the scale bound the
    * reference lacks: interleaved multi-site traces accumulate one
    * Stationary state per re-entry point inside the movement window, which
    * is quadratic in observation rate; dominance-ranked truncation keeps
    * the frontier constant. Returns per-layer states + per-transition
    * costs. */
  private def forwardLayers(
      segObs: IndexedSeq[Obs], segAssigned: IndexedSeq[Option[ClusterObs]],
      clusters: Int => ClusterObs, movementMs: Long, beam: Int)
    : (IndexedSeq[IndexedSeq[TState]], collection.Map[(Int, TState, TState), Double]) = {
    val layers = new Array[IndexedSeq[TState]](segObs.length)
    val costs = collection.mutable.HashMap.empty[(Int, TState, TState), Double]
    var frontier: collection.immutable.ListMap[TState, Double] =
      collection.immutable.ListMap(Same -> 0.0)
    layers(0) = IndexedSeq(Same)
    var t = 0
    while (t < segObs.length - 1) {
      val nextCost = collection.mutable.LinkedHashMap.empty[TState, Double]
      frontier.foreach { case (s, acc) =>
        transitions(s, t, segObs, segAssigned, clusters, movementMs).foreach {
          case (to, w) =>
            val key = (t + 1, s, to)
            costs.get(key) match {
              case Some(prev) if prev <= w => ()
              case _ => costs(key) = w
            }
            val c = acc + w
            nextCost.get(to) match {
              case Some(prev) if prev <= c => ()
              case _ => nextCost(to) = c
            }
        }
      }
      frontier =
        if (nextCost.isEmpty) {
          // dead frontier: fresh-start at Same, with zero-cost bridge edges
          // so the decoder can pass through the break
          frontier.keysIterator.foreach(s => costs((t + 1, s, Same)) = 0.0)
          collection.immutable.ListMap(Same -> 0.0)
        } else collection.immutable.ListMap(
          nextCost.toSeq.sortBy(_._2).take(beam): _*)
      layers(t + 1) = frontier.keys.toIndexedSeq
      t += 1
    }
    (layers.toIndexedSeq, costs)
  }

  /** Trellis smoothing of one user's trace: returns the indices of the
    * observations attributed to the traveler (Same/Moving; Stationary =
    * device left behind is dropped). */
  private[spatial] def smooth(
      obs: IndexedSeq[Obs], assigned: IndexedSeq[Option[ClusterObs]],
      byId: Map[Int, ClusterObs], movementMs: Long, beam: Int = 32): Vector[Int] = {
    if (obs.isEmpty) return Vector.empty
    if (obs.length == 1) return Vector(0)
    val clusters: Int => ClusterObs = byId
    // forward frontier over the whole trace (= the reference's
    // findSingleNodes pass) to find singleton cut points
    val (layerSeq, fullCosts) =
      forwardLayers(obs, assigned, clusters, movementMs, beam)
    val segments = Viterbi.segmentAtSingletons(layerSeq)
    val kept = Vector.newBuilder[Int]
    kept += 0 // the global head anchors as Same (carried) by construction
    segments.foreach { seg =>
      // Segments must decode re-anchored at Same (the reference's
      // estimate(), `StateEstimator.scala:59`). When the cut layer IS
      // [Same] — the head of every trace, and every dead-frontier reset —
      // the full-trace pass already explored exactly the re-anchored
      // frontier sequence (a singleton start shifts every accumulator by
      // one constant, so state sets, orderings, and beam truncation are
      // identical), and its layers + transition costs are reused without
      // a second forward pass. Only a non-Same singleton cut still needs
      // the per-segment re-run, because re-anchoring genuinely changes
      // which transitions leave the cut.
      val reuse = layerSeq(seg.head) == IndexedSeq[TState](Same)
      val (segLayers, costs, offset) =
        if (reuse) (seg.map(layerSeq).toIndexedSeq, fullCosts, seg.head)
        else {
          val segObs = seg.map(obs).toIndexedSeq
          val segAssigned = seg.map(assigned).toIndexedSeq
          val (l, c) = forwardLayers(segObs, segAssigned, clusters, movementMs, beam)
          (l, c, 0)
        }
      val (path, _) = Viterbi.decode[TState](
        segLayers,
        emitScore = (_, _) => 0.0,
        transScore = (t2, from, to) =>
          costs.get((t2 + offset, from, to)).map(-_).getOrElse(Double.NegativeInfinity))
      // the segment head was decided by the previous segment (or is the
      // global head): keep indices 1.. of this segment
      var p = 1
      while (p < seg.length) {
        segLayers(p)(path(p)) match {
          case Stat(_, _) => ()
          case _ => kept += seg(p)
        }
        p += 1
      }
    }
    kept.result().distinct.sorted
  }

  // ---------------------------------------------------------------- driver

  private def processUser(
      userObs: IndexedSeq[Obs],
      minStayMs: Long, lookupMs: Long, movementMs: Long, lambda: Double,
      minFinalStayMs: Long): Iterator[Stay] = {
    if (userObs.isEmpty) return Iterator.empty
    val user = userObs.head.user
    // stage 1: candidate-window clustering; clusters >= minStay become the
    // trellis's cluster observations (`LocationStayEnricher.scala:82-95`)
    val clusters = clusterPass(userObs, lookupMs, lambda)
      .filter(c => c.toMs - c.fromMs >= minStayMs)
    val byId = clusters.map(c => c.id -> c).toMap
    val assigned = {
      val arr = Array.fill[Option[ClusterObs]](userObs.length)(None)
      clusters.foreach(c => c.memberIdx.foreach(i => arr(i) = Some(c)))
      arr.toIndexedSeq
    }
    // stage 2: trellis smoothing drops device-left-behind observations
    val keptIdx = smooth(userObs, assigned, byId, movementMs)
    val kept = keptIdx.map(userObs)
    // stage 3: greedy re-cluster (lookup 0, min stay 0) -> final stays
    clusterPass(kept, 0L, lambda).iterator
      .filter(c => c.toMs - c.fromMs >= minFinalStayMs)
      .map(c => Stay(user, c.fromMs, c.toMs, c.lat, c.lon, c.memberIdx.size))
  }

  // ---------------------------------------------------------- streaming

  /** Serializable per-user streaming state: the open candidate clusters
    * (members as (lat, lon, sigma) triples) and the running seq counter. */
  final case class OpenCand(lat: Double, lon: Double, precSum: Double, n: Int,
      fromMs: Long, toMs: Long, members: Seq[(Double, Double, Double)], seq: Long)
  final case class UserWindowState(cands: Seq[OpenCand], nextSeq: Long, nextIdx: Int)

  private def toOpen(c: Cand): OpenCand =
    OpenCand(c.lat, c.lon, c.precSum, c.n, c.fromMs, c.toMs,
      c.members.map(m => (m.lat, m.lon, m.sigma)), c.seq)
  private def fromOpen(o: OpenCand): Cand =
    Cand(o.lat, o.lon, o.precSum, o.n, o.fromMs, o.toMs,
      o.members.map(m => Member(m._1, m._2, m._3, 0)).toList, o.seq)

  /** Incremental (Structured Streaming) candidate-window stay extraction —
    * the stateful stage-1 counterpart of [[extractStays]] (the reference
    * re-runs its trellis stages in batch after this stream, and so does
    * this engine: trellis smoothing needs lookahead over closed clusters).
    * State per user = the open candidate set, bounded by the lookup
    * window; each micro-batch's observations are processed in event-time
    * order and candidate clusters are emitted as stays the moment they
    * fall out of the window and pass `minStayMs`. Assumes per-user
    * in-order delivery across batches (same contract as
    * [[StayExtraction.extractStaysIncremental]]). */
  def extractStaysIncremental(
      obs: Dataset[Obs],
      minStayMs: Long = DefaultMinStayMs,
      lookupMs: Long = DefaultLookupMs,
      lambda: Double = DefaultLambda): Dataset[Stay] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = obs.sparkSession
    import spark.implicits._
    obs.groupByKey(_.user)
      .flatMapGroupsWithState[UserWindowState, Stay](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Obs], state: GroupState[UserWindowState]) =>
          val st = state.getOption.getOrElse(UserWindowState(Seq.empty, 0L, 0))
          var cands = st.cands.map(fromOpen).toList
          var seq = st.nextSeq
          var idx = st.nextIdx
          val out = scala.collection.mutable.ListBuffer[Stay]()
          def emit(c: Cand): Unit =
            if (c.toMs - c.fromMs >= minStayMs)
              out += Stay(user, c.fromMs, c.toMs, c.lat, c.lon, c.members.size)
          rows.toSeq.sortBy(o => (o.timeMs, o.lat, o.lon)).foreach { o =>
            val (nextCands, closedNow, nextSeq) =
              stepObs(cands, o, idx, seq, lookupMs, lambda)
            cands = nextCands
            seq = nextSeq
            idx += 1
            closedNow.foreach(emit)
          }
          state.update(UserWindowState(cands.map(toOpen), seq, idx))
          out.iterator
      }
  }

  /** Groups a (user, time)-sorted row iterator into per-user chunks and
    * streams each through `f` — memory bound is one user's trace. */
  private final class PerUserIterator(
      rows: Iterator[Obs], f: IndexedSeq[Obs] => Iterator[Stay])
    extends Iterator[Stay] {
    private val in = rows.buffered
    private var out: Iterator[Stay] = Iterator.empty
    private def advance(): Unit = {
      while (!out.hasNext && in.hasNext) {
        val u = in.head.user
        val chunk = IndexedSeq.newBuilder[Obs]
        while (in.hasNext && in.head.user == u) chunk += in.next()
        out = f(chunk.result())
      }
    }
    override def hasNext: Boolean = { advance(); out.hasNext }
    override def next(): Stay = { advance(); out.next() }
  }
}
