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

  /** Jaro similarity (standard definition). Allocation-free hot path —
    * this runs once per (token, token) cell of every candidate pair's
    * similarity matrix, i.e. tens of millions of times per resolution
    * query; while-loops over charAt keep it in the few-hundred-ns range. */
  def jaro(a: String, b: String): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 && lb == 0) return 1.0
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aMatched = new Array[Boolean](la)
    val bMatched = new Array[Boolean](lb)
    var matches = 0
    var i = 0
    while (i < la) {
      val ca = a.charAt(i)
      val hi = math.min(lb - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!bMatched(j) && ca == b.charAt(j)) {
          aMatched(i) = true; bMatched(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var transpositions = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatched(i)) {
        while (!bMatched(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    (m / la + m / lb + (m - transpositions / 2.0) / m) / 3.0
  }

  /** Jaro-Winkler: Jaro boosted by common-prefix length (<=4), p=0.1. */
  def jaroWinkler(a: String, b: String): Double = {
    val j = jaro(a, b)
    val maxPrefix = math.min(4, math.min(a.length, b.length))
    var prefix = 0
    while (prefix < maxPrefix && a.charAt(prefix) == b.charAt(prefix)) prefix += 1
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
      pruneBelow: Double = 0.0): Double =
    softTfIdfArrays(tokens1.toArray, weights1.toArray,
      tokens2.toArray, weights2.toArray, simThreshold, pruneBelow)

  /** Primitive-array core — every arithmetic step runs unboxed (the
    * Seq-based formulation cost ~200µs/pair in boxing/tuples; this
    * kernel is the per-candidate hot path of the whole resolver, called
    * directly by the [[SoftTfIdfScore]] native expression). */
  def softTfIdfArrays(
      t1: Array[String], w1: Array[Double],
      t2: Array[String], w2: Array[Double],
      simThreshold: Double,
      pruneBelow: Double): Double = {
    if (t1.isEmpty || t2.isEmpty) return 0.0
    def sumSq(w: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < w.length) { s += w(i) * w(i); i += 1 }
      s
    }
    val n1 = math.sqrt(sumSq(w1))
    val n2 = math.sqrt(sumSq(w2))
    if (pruneBelow > 0.0) {
      // descending-sorted weight dot product: a sound upper bound since
      // every per-pair similarity <= 1 (see scaladoc)
      val s1 = w1.clone; java.util.Arrays.sort(s1)
      val s2 = w2.clone; java.util.Arrays.sort(s2)
      var dot = 0.0
      var k = 0
      val kMax = math.min(s1.length, s2.length)
      while (k < kMax) { dot += s1(s1.length - 1 - k) * s2(s2.length - 1 - k); k += 1 }
      if (dot / (n1 * n2) < pruneBelow) return 0.0
    }
    val (small, smallW, large, largeW, flipped) =
      if (t1.length <= t2.length) (t1, w1, t2, w2, false)
      else (t2, w2, t1, w1, true)
    val sim = Array.ofDim[Double](small.length, large.length)
    var i = 0
    while (i < small.length) {
      var j = 0
      while (j < large.length) { sim(i)(j) = jaroWinkler(small(i), large(j)); j += 1 }
      i += 1
    }
    val (assign, _) = graft.algo.Hungarian.maxSimilarityAssignment(sim)
    var num = 0.0
    i = 0
    while (i < small.length) {
      val j = assign(i)
      val s = sim(i)(j)
      if (s >= simThreshold)
        num += (if (flipped) s * largeW(j) * smallW(i) else s * smallW(i) * largeW(j))
      i += 1
    }
    if (n1 == 0 || n2 == 0) 0.0 else num / (n1 * n2)
  }
}
