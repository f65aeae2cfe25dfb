package graft.algo

/** Local sequence alignment (Smith-Waterman) over characters — counterpart
  * of the reference's term-to-text alignment used to mine email-localpart ↔
  * name patterns (`thymeflow/src/main/com/thymeflow/text/alignment/
  * TextAlignment.scala:28-315`). Inputs are short strings (names, email
  * localparts); invoked per candidate pair inside UDFs.
  */
object Alignment {

  final case class Result(score: Double, aSpan: (Int, Int), bSpan: (Int, Int))

  /** Smith-Waterman with affine-free scoring: match +m, mismatch -x, gap -g.
    * Returns the best local alignment score and the matched index spans
    * [start, end) in both strings. */
  def smithWaterman(
      a: String,
      b: String,
      matchScore: Double = 2.0,
      mismatch: Double = 1.0,
      gap: Double = 1.0): Result = {
    val n = a.length
    val m = b.length
    val h = Array.ofDim[Double](n + 1, m + 1)
    var best = 0.0
    var bi = 0
    var bj = 0
    for (i <- 1 to n; j <- 1 to m) {
      val diag = h(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) matchScore else -mismatch)
      val v = math.max(0.0, math.max(diag, math.max(h(i - 1)(j) - gap, h(i)(j - 1) - gap)))
      h(i)(j) = v
      if (v > best) { best = v; bi = i; bj = j }
    }
    // traceback for span starts
    var (i, j) = (bi, bj)
    var tracing = true
    while (tracing && i > 0 && j > 0 && h(i)(j) > 0) {
      val v = h(i)(j)
      val diag = h(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) matchScore else -mismatch)
      if (v == diag) { i -= 1; j -= 1 }
      else if (v == h(i - 1)(j) - gap) i -= 1
      else if (v == h(i)(j - 1) - gap) j -= 1
      else tracing = false // local alignment start reached
    }
    Result(best, (i, bi), (j, bj))
  }

  /** Normalized alignment similarity in [0, 1]: best local score over the
    * maximum achievable for the shorter string. */
  def similarity(a: String, b: String): Double = {
    if (a.isEmpty || b.isEmpty) 0.0
    else smithWaterman(a, b).score / (2.0 * math.min(a.length, b.length))
  }
}
