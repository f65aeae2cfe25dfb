package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming backward as-of enrichment — the live counterpart of
  * [[graft.operators.AsOfJoin]]: a single keyed stream carries BUILD
  * rows (state updates: quotes, sensor snapshots, profile versions) and
  * PROBE rows (events to enrich); every probe is matched to the build
  * row with the greatest timestamp not after its own, among those the
  * stream has delivered so far.
  *
  * Semantics under disorder (the honest contract, stated rather than
  * hidden): the per-key build history is kept SORTED BY EVENT TIME and
  * probes binary-search it, so late PROBES still match event-time
  * correctly against everything already ingested; only a build arriving
  * after a probe was already emitted is missed (fixing that requires
  * watermark-buffering probes — a different latency/completeness
  * trade). Within one micro-batch, rows are processed in event-time
  * order with builds before probes at equal timestamps — exactly the
  * batch operator's tie rule.
  *
  * State is bounded: each key retains the newest `maxStatePerKey` build
  * rows (oldest trimmed), so a hot key cannot grow state without limit.
  *
  * Scale shape: one `groupByKey` exchange; state lives in the state
  * store (RocksDB/HDFS-backed at scale), per-key work is
  * O(batch·log state). */
object StreamingAsOf {

  /** One stream, two row kinds: `isBuild` rows carry `value`; probe rows
    * carry `probeId`. */
  final case class Event(key: Long, tsMicros: Long, isBuild: Boolean,
      value: Double, probeId: Long)

  final case class Match(probeId: Long, key: Long, tsMicros: Long,
      matchTs: Option[Long], matchValue: Option[Double])

  /** Sorted parallel arrays (times ascending). */
  final case class History(times: Array[Long], values: Array[Double])

  /** Greatest index with times(i) <= ts, or -1. */
  private def floorIndex(times: Array[Long], ts: Long): Int = {
    var lo = 0; var hi = times.length - 1; var ans = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (times(mid) <= ts) { ans = mid; lo = mid + 1 } else hi = mid - 1
    }
    ans
  }

  def enrich(events: Dataset[Event], maxStatePerKey: Int = 1024): Dataset[Match] = {
    import events.sparkSession.implicits._
    require(maxStatePerKey > 0, "maxStatePerKey must be positive")
    events.groupByKey(_.key)
      .flatMapGroupsWithState[History, Match](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[Event], state: GroupState[History]) =>
          val h = state.getOption.getOrElse(History(Array.empty, Array.empty))
          var times = h.times
          var values = h.values
          val out = scala.collection.mutable.ArrayBuffer[Match]()
          // event-time order, builds before probes at equal ts
          val batch = rows.toArray.sortBy(e => (e.tsMicros, !e.isBuild))
          batch.foreach { e =>
            if (e.isBuild) {
              // insert keeping sort. NOTE this copies both state arrays
              // per build row (O(n) each, n <= maxStatePerKey = bounded
              // work) — correct and cap-bounded, not the O(1) append a
              // growable buffer would give a hot in-order key; revisit
              // if per-key build rates make the copies show up
              val at = floorIndex(times, e.tsMicros) + 1
              times = (times.take(at) :+ e.tsMicros) ++ times.drop(at)
              values = (values.take(at) :+ e.value) ++ values.drop(at)
              if (times.length > maxStatePerKey) {
                times = times.takeRight(maxStatePerKey)
                values = values.takeRight(maxStatePerKey)
              }
            } else {
              val i = floorIndex(times, e.tsMicros)
              out += (if (i < 0) Match(e.probeId, key, e.tsMicros, None, None)
                      else Match(e.probeId, key, e.tsMicros,
                        Some(times(i)), Some(values(i))))
            }
          }
          state.update(History(times, values))
          out.iterator
      }
  }
}
