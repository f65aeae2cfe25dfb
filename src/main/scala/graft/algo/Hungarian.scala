package graft.algo

/** Min-cost bipartite assignment (Hungarian algorithm, O(n³)) — the
  * counterpart of the reference's `graph/src/main/com/thymeflow/graph/
  * BipartiteMatching.scala:35-308`, used to optimally align name tokens
  * during fuzzy matching (`thymeflow/.../BipartiteMatchingDistance.scala`).
  * Matrices here are tiny (token counts ≤ ~10), so this runs inside
  * per-candidate-pair UDFs — never distributed itself.
  *
  * Implementation: standard potentials + augmenting-path formulation (the
  * "Jonker-Volgenant style" textbook variant).
  */
object Hungarian {

  /** @param cost rows x cols cost matrix, rows <= cols
    * @return (assignment: for each row the chosen col, total cost) */
  def solve(cost: Array[Array[Double]]): (Array[Int], Double) = {
    val n = cost.length
    if (n == 0) return (Array.empty, 0.0)
    val m = cost(0).length
    require(n <= m, s"rows $n must be <= cols $m (pad the matrix)")
    val INF = Double.PositiveInfinity
    // 1-indexed potentials over rows (u) and cols (v); p(j) = row matched to col j
    val u = Array.fill(n + 1)(0.0)
    val v = Array.fill(m + 1)(0.0)
    val p = Array.fill(m + 1)(0)
    val way = Array.fill(m + 1)(0)
    for (i <- 1 to n) {
      p(0) = i
      var j0 = 0
      val minv = Array.fill(m + 1)(INF)
      val used = Array.fill(m + 1)(false)
      var continue = true
      while (continue) {
        used(j0) = true
        val i0 = p(j0)
        var delta = INF
        var j1 = -1
        for (j <- 1 to m if !used(j)) {
          val cur = cost(i0 - 1)(j - 1) - u(i0) - v(j)
          if (cur < minv(j)) { minv(j) = cur; way(j) = j0 }
          if (minv(j) < delta) { delta = minv(j); j1 = j }
        }
        for (j <- 0 to m) {
          if (used(j)) { u(p(j)) += delta; v(j) -= delta }
          else minv(j) -= delta
        }
        j0 = j1
        if (p(j0) == 0) continue = false
      }
      while (j0 != 0) {
        val j1 = way(j0)
        p(j0) = p(j1)
        j0 = j1
      }
    }
    val assignment = Array.fill(n)(-1)
    for (j <- 1 to m if p(j) != 0) assignment(p(j) - 1) = j - 1
    val total = assignment.zipWithIndex.map { case (j, i) => cost(i)(j) }.sum
    (assignment, total)
  }

  /** Similarity-oriented wrapper: maximize total similarity of a token
    * assignment. Accepts ANY shape: a wide-vs-narrow matrix (more rows
    * than columns) solves the transpose and inverts the map, leaving
    * unassignable rows at -1 — the scaladoc used to claim internal
    * padding that didn't exist, and rows > cols threw. */
  def maxSimilarityAssignment(sim: Array[Array[Double]]): (Array[Int], Double) = {
    if (sim.isEmpty) return (Array.empty, 0.0)
    if (sim.length > sim(0).length) {
      val t = Array.tabulate(sim(0).length, sim.length)((j, i) => sim(i)(j))
      val (a, total) = maxSimilarityAssignment(t)
      val out = Array.fill(sim.length)(-1)
      a.zipWithIndex.foreach { case (i, j) => if (i >= 0) out(i) = j }
      return (out, total)
    }
    val maxV = sim.map(_.max).max
    val cost = sim.map(_.map(maxV - _))
    val (assign, _) = solve(cost)
    val total = assign.zipWithIndex.map { case (j, i) => sim(i)(j) }.sum
    (assign, total)
  }
}
