package graft.algo

/** Trellis decoding (Viterbi / max-product) — counterpart of the
  * reference's movement-state estimator, which decodes stay-vs-move device
  * states as a shortest path through a state trellis
  * (`spatial/src/main/com/thymeflow/spatial/location/treillis/
  * StateEstimator.scala:19-141`). Runs per user-segment (segments bounded by
  * single-state frontier cuts), so state stays small and the decode is
  * driver-free, inside per-group functions.
  */
object Viterbi {

  /** Decode the max-score state sequence.
    *
    * @param states    per-step candidate states
    * @param emitScore log-score of state at step i
    * @param transScore log-score of transition (stepIndex, from, to);
    *                   -Inf forbids
    * @return best state index per step, and its total log-score */
  def decode[S](
      states: IndexedSeq[IndexedSeq[S]],
      emitScore: (Int, S) => Double,
      transScore: (Int, S, S) => Double): (IndexedSeq[Int], Double) = {
    require(states.nonEmpty && states.forall(_.nonEmpty), "empty trellis")
    val T = states.length
    val delta = Array.tabulate(states(0).length)(j => emitScore(0, states(0)(j)))
    val back = Array.fill(T)(Array.empty[Int])
    var prev = delta
    for (t <- 1 until T) {
      val cur = Array.fill(states(t).length)(Double.NegativeInfinity)
      val bp = Array.fill(states(t).length)(-1)
      for (j <- states(t).indices) {
        var best = Double.NegativeInfinity
        var bestI = -1
        for (i <- states(t - 1).indices) {
          val s = prev(i) + transScore(t, states(t - 1)(i), states(t)(j))
          if (s > best) { best = s; bestI = i }
        }
        cur(j) = best + emitScore(t, states(t)(j))
        // all transitions forbidden (-Inf): pin a deterministic
        // predecessor so the -Inf-scored path is still WELL-FORMED —
        // bestI = -1 used to index back(t)(-1) in the traceback
        bp(j) = if (bestI < 0) 0 else bestI
      }
      back(t) = bp
      prev = cur
    }
    val lastBest = prev.indices.maxBy(prev)
    val path = new Array[Int](T)
    path(T - 1) = lastBest
    for (t <- T - 1 until 0 by -1) path(t - 1) = back(t)(path(t))
    (path.toIndexedSeq, prev(lastBest))
  }

  /** Split a trellis at steps with exactly one candidate state ("single
    * node" frontiers, the reference's sessionization cut): each segment can
    * be decoded independently — this is what bounds memory per group. */
  def segmentAtSingletons[S](states: IndexedSeq[IndexedSeq[S]]): Seq[Range] = {
    if (states.length <= 1) return Seq(states.indices) // 1-step trellis
    val cuts = states.indices.filter(i => states(i).size == 1)
    if (cuts.isEmpty) Seq(states.indices)
    else {
      val bounds = (0 +: cuts) :+ (states.length - 1)
      bounds.sliding(2).collect {
        case Seq(a, b) if b > a => a to b
      }.toSeq.distinct
    }
  }
}
