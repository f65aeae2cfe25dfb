package graft.algo

import scala.collection.mutable

/** Min-cost max-flow via successive shortest paths with potentials —
  * counterpart of the reference's
  * `graph/src/main/com/thymeflow/graph/FlowAlgorithms.scala:24-106`, which
  * backs its term-to-text sequence alignment. Graphs are per-record and
  * tiny; invoked inside UDFs/per-group functions.
  *
  * Negative edge costs are handled by the LABEL-CORRECTING behavior of
  * the path search (improved labels re-enqueue — there is no separate
  * Bellman-Ford initialization), which is exact but can degrade beyond
  * Dijkstra's bound on pathological negative-heavy graphs.
  * PRECONDITION: no negative-cost cycle with residual capacity — the
  * label correction would improve around it forever. The per-record
  * alignment graphs this backs are DAG-shaped and satisfy it by
  * construction.
  */
object MinCostFlow {

  final class Graph(n: Int) {
    private[MinCostFlow] val to = mutable.ArrayBuffer[Int]()
    private[MinCostFlow] val capacity = mutable.ArrayBuffer[Double]()
    private[MinCostFlow] val cost = mutable.ArrayBuffer[Double]()
    private[MinCostFlow] val head = Array.fill(n)(mutable.ArrayBuffer[Int]())
    val size: Int = n

    /** Add a directed edge with capacity and per-unit cost. */
    def addEdge(u: Int, v: Int, cap: Double, c: Double): Unit = {
      head(u) += to.length; to += v; capacity += cap; cost += c
      head(v) += to.length; to += u; capacity += 0.0; cost += -c
    }
  }

  /** @return (total flow pushed, total cost) for max-flow from s to t. */
  def solve(g: Graph, s: Int, t: Int, maxFlow: Double = Double.PositiveInfinity): (Double, Double) = {
    val n = g.size
    val pot = Array.fill(n)(0.0)
    var flow = 0.0
    var totalCost = 0.0
    var continue = true
    while (continue && flow < maxFlow) {
      // Dijkstra on reduced costs
      val dist = Array.fill(n)(Double.PositiveInfinity)
      val prevEdge = Array.fill(n)(-1)
      dist(s) = 0.0
      implicit val ord: Ordering[(Double, Int)] = Ordering.by[(Double, Int), Double](_._1).reverse
      val pq = mutable.PriorityQueue[(Double, Int)]((0.0, s))
      while (pq.nonEmpty) {
        val (d, u) = pq.dequeue()
        if (d <= dist(u)) {
          g.head(u).foreach { eid =>
            if (g.capacity(eid) > 1e-12) {
              val v = g.to(eid)
              val nd = d + g.cost(eid) + pot(u) - pot(v)
              if (nd < dist(v) - 1e-12) {
                dist(v) = nd; prevEdge(v) = eid; pq.enqueue((nd, v))
              }
            }
          }
        }
      }
      if (dist(t).isInfinity) continue = false
      else {
        for (i <- 0 until n if !dist(i).isInfinity) pot(i) += dist(i)
        // bottleneck along the path
        var push = maxFlow - flow
        var v = t
        while (v != s) { val e = prevEdge(v); push = math.min(push, g.capacity(e)); v = g.to(e ^ 1) }
        v = t
        while (v != s) {
          val e = prevEdge(v)
          g.capacity(e) -= push
          g.capacity(e ^ 1) += push
          totalCost += push * g.cost(e)
          v = g.to(e ^ 1)
        }
        flow += push
      }
    }
    (flow, totalCost)
  }
}
