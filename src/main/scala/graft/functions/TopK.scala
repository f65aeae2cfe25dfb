package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact per-group top-k as a typed [[Aggregator]] — the scale-friendly
  * alternative to `row_number() OVER (PARTITION BY ... ORDER BY ...)`:
  * the window form sorts every group in full; this aggregator keeps a
  * bounded k-element buffer per group (partial aggregation, map-side
  * combine), so shuffle volume is O(groups·k) instead of O(rows).
  *
  * Ordering: descending by score, ties broken by ascending id —
  * deterministic, matching the engine's window-based queries. */
object TopK {

  type Entry = (Double, Long) // (score, id)

  private def better(a: Entry, b: Entry): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  final class TopKAggregator(k: Int)
      extends Aggregator[Entry, List[Entry], Seq[Entry]] {
    require(k >= 1, s"topK needs k >= 1, got $k") // k=0 NPE'd in reduce
    override def zero: List[Entry] = Nil

    private def insert(buf: List[Entry], e: Entry): List[Entry] = {
      // sorted (best-first) insert into a list of size <= k
      val (before, after) = buf.span(better(_, e))
      val merged = before ::: (e :: after)
      if (merged.length > k) merged.take(k) else merged
    }

    override def reduce(buf: List[Entry], e: Entry): List[Entry] =
      if (buf.length == k && better(buf.last, e)) buf else insert(buf, e)

    override def merge(a: List[Entry], b: List[Entry]): List[Entry] =
      b.foldLeft(a)(reduce)

    override def finish(r: List[Entry]): Seq[Entry] = r
    override def bufferEncoder: Encoder[List[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Entry]]()
    override def outputEncoder: Encoder[Seq[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
  }

  /** Column form: `groupBy(key).agg(topK(3, $"score", $"id"))` yielding an
    * array of (score, id) structs, best first. */
  def topK(k: Int, score: Column, id: Column): Column = {
    import org.apache.spark.sql.functions.udaf
    udaf(new TopKAggregator(k),
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Entry]())
      .apply(score.cast("double"), id.cast("long"))
  }
}
