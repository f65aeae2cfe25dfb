package graft.algo

import scala.collection.mutable

/** Single-source shortest paths over an adjacency function — the engine's
  * counterpart of the reference's generic shortest-path module
  * (`graph/src/main/com/thymeflow/graph/ShortestPath.scala:13-305`, backed by
  * a Fibonacci heap). Graphs on this path are small (per-user trellises,
  * name-part graphs), so a binary heap with lazy deletion is within a
  * constant factor of decrease-key and far simpler; the operator is invoked
  * per-group inside distributed stages, never on the global graph.
  */
object Dijkstra {

  /** @param neighbors node -> (neighbor, non-negative edge weight)
    * @param stop      early-exit predicate on settled nodes
    * @return (distances, predecessor map) for all settled nodes */
  def run[N](
      source: N,
      neighbors: N => Iterable[(N, Double)],
      stop: N => Boolean = (_: N) => false): (Map[N, Double], Map[N, N]) = {
    val dist = mutable.HashMap[N, Double](source -> 0.0)
    val pred = mutable.HashMap[N, N]()
    val settled = mutable.HashSet[N]()
    implicit val ord: Ordering[(Double, N)] = Ordering.by[(Double, N), Double](_._1).reverse
    val pq = mutable.PriorityQueue[(Double, N)]((0.0, source))
    var done = false
    while (pq.nonEmpty && !done) {
      val (d, u) = pq.dequeue()
      if (!settled(u) && d <= dist.getOrElse(u, Double.PositiveInfinity)) {
        settled += u
        if (stop(u)) done = true
        else neighbors(u).foreach { case (v, w) =>
          require(w >= 0, s"negative edge weight $w")
          val nd = d + w
          if (nd < dist.getOrElse(v, Double.PositiveInfinity)) {
            dist(v) = nd
            pred(v) = u
            pq.enqueue((nd, v))
          }
        }
      }
    }
    (dist.toMap.filter(kv => settled(kv._1)), pred.toMap)
  }

  /** Shortest path source→target as a node list (empty if unreachable). */
  def path[N](source: N, target: N, neighbors: N => Iterable[(N, Double)]): List[N] = {
    val (dist, pred) = run(source, neighbors, stop = (n: N) => n == target)
    if (!dist.contains(target)) Nil
    else {
      var acc: List[N] = List(target)
      while (acc.head != source) acc = pred(acc.head) :: acc
      acc
    }
  }
}
