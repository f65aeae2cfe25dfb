package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Streaming SCD type-2 maintenance — the live sibling of
  * [[graft.operators.Scd.type2]]: change events arrive as a stream and
  * per-key validity episodes are maintained in `flatMapGroupsWithState`.
  * A CLOSED episode (value superseded by a change) is emitted exactly
  * once, at the batch where its successor arrives; the currently-open
  * episode lives in state (value + valid_from + tie id), so state is
  * O(1) per key forever.
  *
  * Ordering contract: within a batch events are sorted by (ts, tie)
  * before folding, matching the batch builder's window order; LATE
  * events older than the open episode's start are rejected to an
  * `late = true` audit row rather than silently rewriting history
  * (append-mode state cannot retract an emitted episode — the batch
  * rebuild is the repair path, exactly the reference's
  * recompute-and-swap discipline, `LocationStayEnricher.scala:80-123`).
  *
  * Convergence (spec-enforced): in-order streams produce, as closed ∪
  * open episodes, exactly `Scd.type2` of the accumulated log. */
object StreamingScd {

  case class OpenState(value: String, validFrom: Timestamp, tie: Long)

  /** (key, value, valid_from, valid_to, late): `valid_to` null for the
    * open episode row emitted each batch the key changes/appears. */
  case class Episode(key: String, value: String, valid_from: Timestamp,
      valid_to: Option[Timestamp], late: Boolean)

  /** `stream` needs columns key (string), value (string), ts
    * (timestamp), tie (long). */
  def episodes(stream: DataFrame): Dataset[Episode] = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream.select(col("key").cast("string"), col("value").cast("string"),
      col("ts").cast("timestamp"), col("tie").cast("long"))
      .as[(String, String, Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenState, Episode](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case (key, rows, state: GroupState[OpenState]) =>
          val sorted = rows.toSeq.sortBy(r => (r._3.getTime, r._4))
          val out = scala.collection.mutable.ArrayBuffer[Episode]()
          var open = state.getOption
          var openDirty = false
          sorted.foreach { case (_, v, ts, tie) =>
            open match {
              case None =>
                open = Some(OpenState(v, ts, tie)); openDirty = true
              case Some(o) =>
                val cmp = ts.getTime.compareTo(o.validFrom.getTime) match {
                  case 0 => tie.compareTo(o.tie)
                  case c => c
                }
                if (cmp < 0)
                  out += Episode(key, v, ts, None, late = true)
                else if (v != o.value) {
                  out += Episode(key, o.value, o.validFrom, Some(ts),
                    late = false)
                  open = Some(OpenState(v, ts, tie)); openDirty = true
                }
              // same value: episode continues, nothing to emit
            }
          }
          open.foreach(state.update)
          if (openDirty)
            out += Episode(key, open.get.value, open.get.validFrom, None,
              late = false)
          out.iterator
      }
  }

  /** Wiring to a per-batch sink. */
  def start(stream: DataFrame, checkpointDir: String)(
      sink: (Dataset[Episode], Long) => Unit): StreamingQuery =
    episodes(stream).writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (ds: Dataset[Episode], id: Long) => sink(ds, id) }
      .start()
}
