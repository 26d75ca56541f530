package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One input event of the streaming interval identifier. */
final case class StreamEvent(groupKey: String, ts: Timestamp, order: Long,
                             marker: String)

/** Emitted assignment: enumerated interval id per (group, order). */
final case class StreamIid(groupKey: String, order: Long, iids: Long)

/** Per-group streaming state: closed-interval count so far, whether the
  * latest interval's closing end-run may still extend (last-end configs
  * only), and the buffered, not-yet-finalized events
  * (ts millis, order, marker).
  */
final case class IntervalBuffer(count: Long,
                                openExtendable: Boolean,
                                pending: Seq[(Long, Long, String)])

/** Interval identification over an unbounded stream.
  *
  * The batch operator's unbounded `Window.partitionBy().orderBy()` is
  * unsupported on streams (reference flags streaming as out of scope:
  * SURVEY.md §2.10), so this is the stateful re-formulation:
  * `flatMapGroupsWithState` keyed by the group column, buffering events
  * per group and finalizing exactly the prefix whose interval assignment
  * can no longer change:
  *
  *   - event-time ordering is restored inside the buffer; only events at
  *     or below the current watermark are eligible (later events may
  *     still arrive above it);
  *   - an eligible prefix is emitted up to the first still-open start
  *     marker (rows before it are either inside a closed start..end span
  *     or provably non-interval), so emission never has to be retracted;
  *   - state per group is the closed-interval count plus the undecided
  *     suffix — bounded by marker-gap length, not stream length.
  *
  * All four span configs are supported. Last-end configs
  * (`endUseFirst = false`) have the extra wrinkle that an interval's
  * closing end-run can extend across batches (any future consecutive end
  * marker moves the interval end), so the state carries an
  * `openExtendable` flag: rows up to the latest confirmed end are emitted
  * with their (final) interval id, rows after it stay buffered until a
  * start marker breaks the run, and a leading end-run in a later batch
  * re-attaches to the carried interval count.
  *
  * Scale: state is per-group and O(open-gap); shuffle is the single
  * keyBy(group) exchange any stateful op pays. Watermark delay bounds
  * both lateness tolerance and emission latency.
  *
  * Boundary note: Spark's stateful operators drop arriving rows whose
  * event time is at or below the current watermark, so events timestamped
  * exactly at the initial watermark (epoch 0) never reach the operator —
  * the buffered-prefix predicate here (`ts <= watermark` is final)
  * mirrors that drop convention.
  *
  * State bound: the undecided suffix is normally bounded by marker-gap
  * length, but a group whose open interval NEVER closes (a start marker
  * with no end forever) would grow state without bound on an unbounded
  * stream. `maxPending` is the escape hatch: when a group's buffer
  * exceeds it, the oldest overflow rows are force-finalized as
  * non-interval (id 0) and evicted — an abandoned open interval can no
  * longer close retroactively (and an abandoned extendable end-run can
  * no longer extend), the same finality trade a watermark makes for late
  * data. The default (`Int.MaxValue`) keeps the exact unbounded
  * semantics and is only safe when every interval provably closes;
  * on a production stream SET A REAL BOUND. Recommended sizing: the
  * buffer holds at most one open marker gap plus one watermark horizon
  * of events, so `maxPending ~= peakGroupEventsPerSec * (p999
  * intervalDurationSec + watermarkDelaySec) * 4` (the 4x is headroom
  * for bursts); eviction then never fires on well-formed data and
  * still caps a poisoned group at a few thousand buffered rows. The
  * soak spec (StreamingIntervalSpec "soak: 20 batches...") pins that
  * eviction keeps pace batch-by-batch under a never-closing group.
  */
final class StreamingIntervalIdentifier(markerStart: String,
                                        markerEnd: String,
                                        startUseFirst: Boolean = false,
                                        endUseFirst: Boolean = true,
                                        maxPending: Int = Int.MaxValue)
    extends Serializable {

  require(maxPending > 0, "maxPending must be positive")

  /** Pair collapsed start/end events over `markers`; returns ids (0 = no
    * interval), the cut index before which assignment is final given that
    * no event can ever be inserted below `markers` positions again, the
    * carried interval count, and (last-end configs) whether the final
    * interval's end-run may still extend into future batches.
    * `baseCount` numbers intervals across batches; `openExtendable` marks
    * a carried still-extendable end-run from the previous batch.
    */
  private[streaming] def assign(markers: Seq[String], baseCount: Long,
                                openExtendable: Boolean = false)
      : (Seq[Long], Int, Long, Boolean) = {
    val events = markers.zipWithIndex.collect {
      case (m, i) if m == markerStart || m == markerEnd =>
        (i, m == markerStart)
    }
    // collapse runs (keep first or last start / first or last end)
    val kept = Vector.newBuilder[(Int, Boolean)]
    var run = List.empty[(Int, Boolean)]
    def flush(): Unit = if (run.nonEmpty) {
      val keepFirst = if (run.head._2) startUseFirst else endUseFirst
      kept += (if (keepFirst) run.last else run.head)
      run = Nil
    }
    events.foreach { ev =>
      if (run.nonEmpty && run.head._2 != ev._2) flush()
      run = ev :: run
    }
    flush()
    val seq = kept.result()
    val ids = Array.fill(markers.size)(0L)
    var count = baseCount
    var lastClosedEnd = -1
    var k = 0
    // a carried extendable end-run: a leading end (before any start)
    // extends the PREVIOUS interval rather than opening id 0 noise
    if (openExtendable && seq.nonEmpty && !seq.head._2) {
      (0 to seq.head._1).foreach(i => ids(i) = baseCount)
      lastClosedEnd = seq.head._1
      k = 1
    }
    while (k < seq.size - 1) {
      if (seq(k)._2 && !seq(k + 1)._2) {
        count += 1
        (seq(k)._1 to seq(k + 1)._1).foreach(i => ids(i) = count)
        lastClosedEnd = seq(k + 1)._1
        k += 2
      } else k += 1
    }
    // first raw start marker after the last closed interval is still open
    val firstOpenStart = markers.zipWithIndex.indexWhere {
      case (m, i) => i > lastClosedEnd && m == markerStart
    }
    if (endUseFirst) {
      val cut = if (firstOpenStart == -1) markers.size else firstOpenStart
      (ids.toSeq, cut, count, false)
    } else {
      // last-end: the final interval stays extendable while no start
      // marker follows its last end; rows after that end are undecided
      val stillOpen = lastClosedEnd >= 0 && firstOpenStart == -1 &&
        !markers.drop(lastClosedEnd + 1).exists(_ == markerStart)
      val carryOpen = stillOpen ||
        (openExtendable && events.isEmpty) // nothing arrived: stay open
      val cut =
        if (firstOpenStart != -1) firstOpenStart
        else if (stillOpen) lastClosedEnd + 1
        else if (openExtendable && events.isEmpty) 0
        else markers.size
      (ids.toSeq, cut, count, carryOpen)
    }
  }

  private def step(key: String, events: Iterator[StreamEvent],
                   state: GroupState[IntervalBuffer]): Iterator[StreamIid] = {
    val prev = state.getOption.getOrElse(IntervalBuffer(0L, false, Nil))
    val all = (prev.pending ++ events.map(e =>
      (e.ts.getTime, e.order, e.marker))).sortBy(t => (t._2, t._1))
    val wm = state.getCurrentWatermarkMs()
    val (ripe, unripe) = all.partition(_._1 <= wm)
    val (ids, cut, newCount, openExt) =
      assign(ripe.map(_._3), prev.count, prev.openExtendable)
    val emitted = ripe.take(cut).zip(ids.take(cut)).map {
      case ((_, order, _), id) => StreamIid(key, order, id)
    }
    // every closed interval ends before the cut (cut = first open start
    // after the last closed end / last confirmed end), so the carried
    // count is final
    val remaining = ripe.drop(cut) ++ unripe
    // state-bound eviction: force-finalize the oldest overflow rows as
    // non-interval and abandon the open region (see class doc)
    val overflow = remaining.size - maxPending
    val (evicted, kept) =
      if (overflow > 0) remaining.splitAt(overflow) else (Nil, remaining)
    val keptOpenExt = openExt && overflow <= 0
    state.update(IntervalBuffer(newCount, keptOpenExt, kept))
    // a watermark-only advance does not re-invoke the function for a key
    // without new data; an event-time timeout just above the current
    // watermark makes the next advance flush the buffered suffix
    if (kept.nonEmpty) state.setTimeoutTimestamp(wm + 1)
    (emitted ++ evicted.map { case (_, order, _) =>
      StreamIid(key, order, 0L)
    }).iterator
  }

  /** Apply to a streaming DataFrame with columns
    * (groupKey string, ts timestamp, order long, marker string); the
    * caller sets `withWatermark("ts", ...)` upstream. The order column
    * must be non-decreasing in event time within a group (e.g. a sequence
    * number assigned in event-time order) — the watermark bounds lateness
    * in `ts`, and order-alignment makes the below-watermark prefix the
    * final row order.
    */
  def transform(df: DataFrame): Dataset[StreamIid] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.selectExpr("groupKey", "ts", "order", "marker").as[StreamEvent]
      .groupByKey(_.groupKey)
      .flatMapGroupsWithState[IntervalBuffer, StreamIid](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(step)
  }
}
