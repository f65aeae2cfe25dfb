package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion — the standard way to combine heterogeneous
  * retrieval rankings (BM25 + vector ANN being the hybrid-search
  * pairing) without comparable scores: each list contributes
  * `1 / (c + rank)` and documents are re-ranked by the sum. Rank is
  * all that crosses the fusion boundary, so the rankers can be
  * incompatible engines entirely (a lexical index and an IVF probe).
  *
  * Scores are exact integers in ppm (`1e6 div (c + rank)` per list,
  * summed) — the fused ORDER is identical to the float formulation
  * for c ≥ 1 at any realistic depth, and the hash-stable integer
  * makes the fusion verifiable bit-for-bit.
  *
  * Scale shape: a union of (id, rank) lists — already tiny, each
  * ranker having applied its own top-k — one groupBy on the doc id,
  * and a TakeOrdered for the fused top-k. Nothing here touches the
  * corpus. */
object Rrf {

  /** Fuse per-list ranks. Each input carries (idCol, rankCol) with
    * rank starting at 1; documents absent from a list contribute 0.
    * Output: (idCol, n_lists, rrf_ppm), fused top-`k` by
    * (rrf_ppm desc, id). */
  def fuse(rankings: Seq[DataFrame], idCol: String, rankCol: String,
      c: Int = 60, k: Int = 50): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    val tagged = rankings
      .map(_.select(col(idCol), col(rankCol).cast("long").as("_rank")))
      .reduce(_ unionAll _)
    tagged
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_lists"),
        sum(expr(s"1000000 div ($c + _rank)")).cast("long").as("rrf_ppm"))
      .orderBy(col("rrf_ppm").desc, col(idCol))
      .limit(k)
  }
}
