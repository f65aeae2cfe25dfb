package graft.functions

/** String-similarity kernels used by entity resolution (reference
  * `thymeflow/src/main/com/thymeflow/enricher/entityresolution/
  * EntityResolution.scala:54-202`): Levenshtein similarity, Jaro-Winkler,
  * and IDF-weighted soft-TF-IDF with optimal token alignment.
  * Pure JVM functions — invoked per candidate pair inside UDFs after
  * blocking, never on the full cross product.
  */
object Similarity {

  /** Levenshtein similarity 1 - dist/maxLen (Lucene getDistance shape). */
  def levenshteinSim(a: String, b: String): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    val d = levenshtein(a, b)
    1.0 - d.toDouble / math.max(a.length, b.length)
  }

  def levenshtein(a: String, b: String): Int = {
    val n = a.length
    val m = b.length
    if (n == 0) return m
    if (m == 0) return n
    var prev = Array.tabulate(m + 1)(identity)
    val cur = new Array[Int](m + 1)
    for (i <- 1 to n) {
      cur(0) = i
      for (j <- 1 to m) {
        val cost = if (a(i - 1) == b(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
      }
      Array.copy(cur, 0, prev, 0, m + 1)
    }
    prev(m)
  }

  /** Jaro similarity (standard definition). */
  def jaro(a: String, b: String): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    val window = math.max(0, math.max(a.length, b.length) / 2 - 1)
    val aMatched = new Array[Boolean](a.length)
    val bMatched = new Array[Boolean](b.length)
    var matches = 0
    for (i <- a.indices) {
      val lo = math.max(0, i - window)
      val hi = math.min(b.length - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatched(j) && a(i) == b(j)) {
          aMatched(i) = true; bMatched(j) = true; matches += 1; found = true
        }
        j += 1
      }
    }
    if (matches == 0) return 0.0
    var transpositions = 0
    var k = 0
    for (i <- a.indices if aMatched(i)) {
      while (!bMatched(k)) k += 1
      if (a(i) != b(k)) transpositions += 1
      k += 1
    }
    val m = matches.toDouble
    (m / a.length + m / b.length + (m - transpositions / 2.0) / m) / 3.0
  }

  /** Jaro-Winkler: Jaro boosted by common-prefix length (<=4), p=0.1. */
  def jaroWinkler(a: String, b: String): Double = {
    val j = jaro(a, b)
    val prefix = a.zip(b).take(4).takeWhile { case (x, y) => x == y }.size
    j + prefix * 0.1 * (1.0 - j)
  }

  /** Soft-TF-IDF with optimal one-to-one token alignment: tokens of the two
    * strings are aligned by max total Jaro-Winkler (Hungarian), aligned
    * pairs below `simThreshold` contribute nothing, the rest contribute
    * sim * w1 * w2; normalized by the weight-vector norms (cosine shape).
    * The bipartite refinement mirrors the reference's
    * BipartiteMatchingDistance used inside its soft-TF-IDF. */
  /** @param pruneBelow scores provably below this bound short-circuit to 0
    *                    BEFORE the similarity matrix / Hungarian alignment:
    *                    num <= best weight pairing (descending sort, since
    *                    every per-pair similarity <= 1), so
    *                    ub = sorted(w1)·sorted(w2) / (|w1||w2|) is a sound
    *                    upper bound — pairs with ub < pruneBelow cannot
    *                    pass a >= pruneBelow filter. */
  def softTfIdf(
      tokens1: Seq[String], weights1: Seq[Double],
      tokens2: Seq[String], weights2: Seq[Double],
      simThreshold: Double = 0.9,
      pruneBelow: Double = 0.0): Double = {
    if (tokens1.isEmpty || tokens2.isEmpty) return 0.0
    if (pruneBelow > 0.0) {
      val s1 = weights1.sorted(Ordering[Double].reverse)
      val s2 = weights2.sorted(Ordering[Double].reverse)
      val ub = s1.zip(s2).map { case (a, b) => a * b }.sum /
        (math.sqrt(weights1.map(w => w * w).sum) *
          math.sqrt(weights2.map(w => w * w).sum))
      if (ub < pruneBelow) return 0.0
    }
    val (small, smallW, large, largeW, flipped) =
      if (tokens1.size <= tokens2.size) (tokens1, weights1, tokens2, weights2, false)
      else (tokens2, weights2, tokens1, weights1, true)
    val sim = Array.tabulate(small.size, large.size) { (i, j) =>
      jaroWinkler(small(i), large(j))
    }
    val (assign, _) = graft.algo.Hungarian.maxSimilarityAssignment(sim)
    var num = 0.0
    for (i <- small.indices) {
      val j = assign(i)
      val s = sim(i)(j)
      if (s >= simThreshold) {
        val (w1, w2) = if (flipped) (largeW(j), smallW(i)) else (smallW(i), largeW(j))
        num += s * w1 * w2
      }
    }
    val n1 = math.sqrt(weights1.map(w => w * w).sum)
    val n2 = math.sqrt(weights2.map(w => w * w).sum)
    if (n1 == 0 || n2 == 0) 0.0 else num / (n1 * n2)
  }
}
