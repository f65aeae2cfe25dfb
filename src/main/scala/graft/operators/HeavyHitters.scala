package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT heavy hitters at corpus scale — the two-pass candidate-prune
  * algorithm (per-partition Misra–Gries summaries → exact verification),
  * the standard way to find "every item with frequency ≥ N/s" without a
  * full GROUP BY over a 100 TB column.
  *
  * Why not just groupBy(value).count()? For a high-cardinality column
  * (URLs, n-grams, user ids) that shuffles one row per DISTINCT value —
  * at 10¹¹ distinct keys the aggregation state dwarfs the answer, which
  * is at most `s` rows. Here:
  *
  *   pass 1 — each input partition is summarized by a Misra–Gries sketch
  *     with s counters (one sequential scan, O(s) state). MG guarantees
  *     each counter undercounts by at most n_p/(s+1); any value with
  *     partition frequency > n_p/(s+1) keeps a positive counter, so
  *     every GLOBAL heavy hitter (freq ≥ N/s, which forces freq_p ≥
  *     n_p/s > n_p/(s+1) in at least one partition) survives in at least
  *     one partition's sketch. The candidate union is ≤ partitions × s
  *     rows — driver-bounded metadata, not data.
  *   pass 2 — exact counts of the candidates only: the fact scan is
  *     filtered by a broadcast candidate set BEFORE the aggregation
  *     shuffle, then thresholded. No false negatives (pass-1 guarantee),
  *     no false positives (pass-2 exactness).
  *
  * The support threshold is the integer form freq·s ≥ N, so results are
  * engine-exact and the DuckDB oracle is a plain GROUP BY + HAVING.
  * Output: (value, cnt) for every value with cnt·s ≥ N.
  */
object HeavyHitters {

  /** Misra–Gries over one iterator: at most `s` surviving candidates. */
  private[operators] def misraGries(it: Iterator[String], s: Int): Iterator[String] = {
    val counters = new java.util.HashMap[String, Long](s * 2)
    while (it.hasNext) {
      val v = it.next()
      val c = counters.getOrDefault(v, 0L)
      if (c > 0L) counters.put(v, c + 1)
      else if (counters.size < s) counters.put(v, 1L)
      else {
        // decrement-all step; drop zeros
        val e = counters.entrySet().iterator()
        while (e.hasNext) {
          val kv = e.next()
          if (kv.getValue == 1L) e.remove() else kv.setValue(kv.getValue - 1)
        }
      }
    }
    val out = new Array[String](counters.size)
    val keys = counters.keySet().iterator()
    var i = 0
    while (keys.hasNext) { out(i) = keys.next(); i += 1 }
    out.iterator
  }

  /** Every value of `valueCol` with frequency ≥ N/`s` (support = 1/s),
    * with its EXACT count. `s` is also the per-partition sketch size. */
  def frequentItems(df: DataFrame, valueCol: String, s: Int): DataFrame = {
    require(s >= 2, "s (the inverse support) must be at least 2")
    val spark = df.sparkSession
    import spark.implicits._
    // NOT checkpointed: both passes recompute the (deterministic)
    // projection — two cheap scans beat materializing the full value
    // stream, which dominated the 40M-token probe. Callers passing a
    // non-deterministic frame must checkpoint it themselves.
    val values = df.select(col(valueCol).cast("string").as("v"))
      .where(col("v").isNotNull)
    val candidates = values.as[String]
      .mapPartitions(it => misraGries(it, s))
      .distinct()
      .toDF("v")
    // candidates ≤ partitions × s — broadcast, prune the scan pre-shuffle
    values.join(broadcast(candidates), "v")
      .groupBy(col("v"))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(values.agg(count(lit(1)).as("n"))))
      .where(col("cnt") * s >= col("n"))
      .select(col("v").as("value"), col("cnt"))
  }
}
