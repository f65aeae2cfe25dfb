package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Streaming heavy-hitter candidates — the live sibling of
  * [[graft.operators.HeavyHitters]]: a Misra–Gries summary per group
  * key held in `mapGroupsWithState`, continued across micro-batches.
  * "What are the top domains/tokens/users RIGHT NOW, over the whole
  * stream so far, in bounded memory" — the batch two-pass answer needs
  * the history; this keeps O(s) counters per group instead.
  *
  * The MG invariant composes over any arrival order: after n elements,
  * each surviving counter undercounts its value's true stream count by
  * at most n/(s+1), and every value with true count > n/(s+1) IS
  * present. Emitted rows carry the counter (`cnt_min`, a lower bound)
  * and the group's running `n` so consumers can apply the ±n/(s+1)
  * band; exact counts, when wanted, come from one verification pass
  * over the archived stream (the batch operator's pass 2).
  *
  * State per group: ≤ s (value, count) pairs + n — independent of
  * stream length; update mode emits each group's refreshed summary per
  * batch. */
object StreamingTopK {

  case class MgSummary(group: String, n: Long, values: Map[String, Long])

  private[streaming] def continueMg(state: Map[String, Long],
      incoming: Iterator[String], s: Int): Map[String, Long] = {
    val counters = new java.util.HashMap[String, Long](s * 2)
    state.foreach { case (k, v) => counters.put(k, v) }
    incoming.foreach { v =>
      val c = counters.getOrDefault(v, 0L)
      if (c > 0L) counters.put(v, c + 1)
      else if (counters.size < s) counters.put(v, 1L)
      else {
        val e = counters.entrySet().iterator()
        while (e.hasNext) {
          val kv = e.next()
          if (kv.getValue == 1L) e.remove() else kv.setValue(kv.getValue - 1)
        }
      }
    }
    import scala.jdk.CollectionConverters._
    counters.asScala.toMap
  }

  /** `stream` must carry string columns `group` and `value`. Returns a
    * streaming Dataset of per-group summaries (update each batch). */
  def summaries(stream: DataFrame, s: Int): Dataset[MgSummary] = {
    require(s >= 2, "s must be at least 2")
    val spark = stream.sparkSession
    import spark.implicits._
    stream.select(col("group").cast("string"), col("value").cast("string"))
      .as[(String, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[MgSummary, MgSummary](GroupStateTimeout.NoTimeout) {
        case (g, rows, state: GroupState[MgSummary]) =>
          val prev = state.getOption.getOrElse(MgSummary(g, 0L, Map.empty))
          var n = prev.n
          val counted = rows.map { r => n += 1; r._2 }
          val values = continueMg(prev.values, counted, s) // drains => n final
          val next = MgSummary(g, n, values)
          state.update(next)
          next
      }
  }

  /** Convenience wiring to a per-batch sink for tests/operations. */
  def start(stream: DataFrame, s: Int, checkpointDir: String)(
      sink: (Dataset[MgSummary], Long) => Unit): StreamingQuery =
    summaries(stream, s).writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (ds: Dataset[MgSummary], id: Long) => sink(ds, id) }
      .start()
}
