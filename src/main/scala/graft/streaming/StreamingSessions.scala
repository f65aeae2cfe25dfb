package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming event-time session windows — the live counterpart of the
  * batch gap-sessionization (SparkEntry q20: a new session starts when
  * the gap since the previous event exceeds the threshold). Sessions
  * close — and are emitted exactly once, in append mode — when the
  * event-time watermark passes `session end + gap`, so no earlier event
  * can legally extend them anymore.
  *
  * Late data inside the watermark allowance is handled structurally:
  * per-key state is a SET of disjoint open intervals, not a single
  * cursor, so an out-of-order event can extend an interval backwards or
  * BRIDGE two provisional sessions into one (the cursor formulation gets
  * that case wrong). Convergence contract: with every event inside the
  * allowance, emitted sessions equal the batch q20 grouping.
  *
  * State is bounded twice over: the watermark closes old intervals each
  * batch, and `maxOpen` caps intervals per key — when a hot key exceeds
  * it, the OLDEST interval is force-closed and emitted (a deliberate,
  * visible completeness trade under pathological skew, same policy as
  * `StreamingAsOf.maxStatePerKey`).
  *
  * Scale shape: one `groupByKey` exchange; state store holds
  * O(keys · open intervals); per-batch work is O(events · log intervals).
  */
object StreamingSessions {

  final case class SEvent(key: Long, ts: java.sql.Timestamp, weight: Double)
  final case class Open(start: Long, end: Long, n: Long, sum: Double)
  final case class SessState(open: List[Open])
  final case class Closed(key: Long, startMs: Long, endMs: Long,
      n: Long, sum: Double, forced: Boolean)

  /** `gapMs`: max silence inside one session. `delay`: watermark
    * allowance for late events (Spark interval string). */
  def sessions(
      events: Dataset[SEvent],
      gapMs: Long,
      delay: String = "0 seconds",
      maxOpen: Int = 64): Dataset[Closed] = {
    import events.sparkSession.implicits._
    require(gapMs > 0 && maxOpen > 0)

    events.withWatermark("ts", delay)
      .groupByKey(_.key)
      .flatMapGroupsWithState[SessState, Closed](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, rows: Iterator[SEvent], state: GroupState[SessState]) =>
          var open = state.getOption.map(_.open).getOrElse(Nil)

          // fold new events in: merge every interval within `gapMs`
          rows.foreach { e =>
            val t = e.ts.getTime
            val (touch, keep) = open.partition(s =>
              t >= s.start - gapMs && t <= s.end + gapMs)
            val merged = touch.foldLeft(Open(t, t, 1L, e.weight)) { (a, s) =>
              Open(math.min(a.start, s.start), math.max(a.end, s.end),
                a.n + s.n, a.sum + s.sum)
            }
            open = merged :: keep
          }
          open = open.sortBy(_.start)

          val wm = state.getCurrentWatermarkMs()
          // watermark-closed sessions emit exactly once
          val (closed, stillOpen) = open.partition(_.end + gapMs <= wm)
          // hot-key cap: force-close oldest intervals beyond maxOpen
          val excess = stillOpen.length - maxOpen
          val (forcedOut, retained) =
            if (excess > 0) stillOpen.splitAt(excess) else (Nil, stillOpen)

          if (retained.isEmpty) state.remove()
          else {
            state.update(SessState(retained))
            // wake when the earliest surviving session becomes closable
            // (must be strictly beyond the current watermark)
            val at = retained.map(_.end + gapMs).min
            state.setTimeoutTimestamp(math.max(at, wm + 1))
          }

          (closed.map(s => Closed(key, s.start, s.end, s.n, s.sum, forced = false)) ++
            forcedOut.map(s => Closed(key, s.start, s.end, s.n, s.sum, forced = true)))
            .iterator
      }
  }
}
