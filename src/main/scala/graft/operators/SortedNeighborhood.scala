package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sorted-neighborhood blocking (Hernández & Stolfo, SIGMOD 1995): sort
  * records by a blocking key and emit every pair within a sliding window
  * of `w` consecutive ranks — the classic entity-resolution complement
  * to token blocking (J3) and prefix filtering (J10): it catches
  * near-duplicates whose ERRORS hit the very tokens blocking would key
  * on (typos, truncations), because proximity in sort order survives
  * small edits that set-overlap keys do not.
  *
  * Scale shape: the textbook formulation is a global ORDER BY + sliding
  * window — on Spark that would be `Window.orderBy(...)` over
  * everything, a single-task sort. Here the global rank comes from a
  * range-partitioned sort + `zipWithIndex` (each partition learns only
  * its offset — the sort stays parallel), and the window pairing is a
  * bounded explode (each rank joins its next w−1 ranks on equality), so
  * every stage is shuffle-bounded by n·(w−1). Ties in the key are
  * ordered by id: the rank is total and deterministic under any
  * partitioning, which is what makes the result oracle-stable.
  */
object SortedNeighborhood {

  /** Pairs (id1, id2, rank distance) with ids ordered by rank; `keyCol`
    * is the blocking key (normalize/case-fold upstream). */
  def pairs(df: DataFrame, idCol: String, keyCol: String, w: Int): DataFrame = {
    require(w >= 2, "window must cover at least 2 records")
    val spark = df.sparkSession
    import spark.implicits._
    // both the probe explode and the equi-join read the ranked frame;
    // the lazy checkpoint keeps the range-sort from running twice
    val ranked = df.select(col(keyCol).as("k"), col(idCol).as("id"))
      .orderBy(col("k"), col("id"))
      .as[(String, Long)].rdd.zipWithIndex
      .map { case ((_, id), r) => (id, r) }
      .toDF("id", "rank")
      .localCheckpoint(false)

    // bounded explode: rank r probes ranks r+1 … r+w-1; the equi-join on
    // the probed rank is a plain hash join, no range or window needed
    val probes = ranked.select(col("id").as("id1"), col("rank"),
      explode(sequence(col("rank") + 1, col("rank") + (w - 1))).as("rank2"))
    probes.join(ranked.select(col("id").as("id2"), col("rank").as("rank2")), "rank2")
      .select(col("id1"), col("id2"),
        (col("rank2") - col("rank")).cast("long").as("dist"))
  }
}
