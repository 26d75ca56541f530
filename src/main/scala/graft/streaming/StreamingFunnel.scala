package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One input event of the streaming funnel. */
final case class FunnelEvent(groupKey: String, ts: Timestamp,
                             eventType: String)

/** Emitted fact: `groupKey` completed funnel step `stepIndex`
  * (0-based, = its position in the step list) at event-time millis
  * `ts`. Append-only: a completed step's time is FINAL under the
  * watermark (see class doc), so rows are never retracted.
  */
final case class FunnelStepDone(groupKey: String, stepIndex: Int,
                                step: String, ts: Long)

/** Per-key streaming state: completed-step times so far (a prefix of
  * the step list), buffered above-watermark events, and the event-time
  * instant past which the key's state may be dropped (`Long.MaxValue`
  * = never; see [[StreamingFunnel]]'s TTL knobs).
  */
final case class FunnelBuffer(times: Seq[Long],
                              pending: Seq[(Long, String)],
                              expireAtMs: Long = Long.MaxValue)

/** Ordered funnel over an unbounded stream — the streaming counterpart
  * of the batch [[graft.operators.Funnel]]: per key, step i completes
  * at the first event of its type AT OR AFTER the completion of step
  * i-1. The batch operator's conditional-min window chain needs the
  * whole history; this is the stateful re-formulation:
  * `flatMapGroupsWithState` keyed by the funnel key, folding events in
  * event-time order and finalizing exactly the below-watermark prefix.
  *
  * Finality argument (why Append mode is honest): the fold state after
  * processing the ordered event prefix up to the watermark is a
  * function of that prefix alone — later events only append, and Spark
  * drops late rows at or below the watermark before stateful
  * operators, so no event can ever be inserted below an already-folded
  * position. A completed step's time therefore never changes, and each
  * is emitted exactly once, the batch it completes.
  *
  * Scale: state per key is the (<= steps) completed times plus the
  * above-watermark buffer — bounded by the watermark horizon, not the
  * stream; the shuffle is the single keyBy exchange any stateful op
  * pays. `maxPending` is the poisoned-key escape hatch (same trade as
  * [[StreamingIntervalIdentifier]]): past it the oldest buffered
  * above-watermark events are dropped — on well-formed streams with a
  * sane watermark it never fires.
  *
  * State LIFECYCLE (round-9 ADVICE — the previous revision held every
  * key's state forever, so the store grew with key cardinality, not
  * the horizon). All rules are defined in EVENT time, so the output is
  * a function of the event stream alone — never of batching or
  * delivery order:
  *   - a COMPLETED funnel's outcome is final up to the retention
  *     horizon `H = t(last step) + completedRetentionMs`: events with
  *     `ts <= H` are swallowed forever; events with `ts > H` belong to
  *     the key's NEXT episode — they are buffered (bounded by
  *     `maxPending`) until the watermark passes `H`, then fold as a
  *     fresh funnel which may emit a second episode's step facts
  *     (duplicate step indices across episodes are the semantics, not
  *     a bug). With the default `completedRetentionMs = 0` the state
  *     is dropped the batch the horizon finalizes (nothing at or
  *     before the completion instant can matter) and any strictly
  *     later step events deterministically start the next episode;
  *     `Long.MaxValue` keeps a times-only tombstone forever (the
  *     explicit at-most-one-episode choice — bounded per key, but the
  *     store then grows with completed-key cardinality again);
  *   - `idleTtlMs` optionally expires keys that never complete: a key
  *     whose own activity clock (the larger of its last folded step
  *     time and the largest event timestamp it has ever shown) falls
  *     `idleTtlMs` of EVENT time behind the watermark is dropped (its
  *     partial progress restarts if it ever returns) — anchored to the
  *     key's events, not the processing batch, so the reap instant is
  *     batching-independent like every other rule here. Default off —
  *     an incomplete funnel is then the one state class that persists,
  *     which matches the batch semantics exactly.
  */
final class StreamingFunnel(steps: Seq[String],
                            maxPending: Int = Int.MaxValue,
                            completedRetentionMs: Long = 0L,
                            idleTtlMs: Long = Long.MaxValue)
    extends Serializable {
  require(steps.size >= 2, "a funnel needs at least 2 steps")
  require(steps.distinct.size == steps.size, "steps must be distinct")
  require(maxPending > 0, "maxPending must be positive")
  require(completedRetentionMs >= 0L,
    "completedRetentionMs must be >= 0")
  require(idleTtlMs > 0L, "idleTtlMs must be positive")

  private def satAdd(a: Long, b: Long): Long =
    if (b == Long.MaxValue || a > Long.MaxValue - b) Long.MaxValue
    else a + b

  /** Fold `events` (sorted by (ts, step index), all at or below the
    * watermark) into the completed-times prefix. Ties chain (an event
    * at the exact completion instant of the previous step counts),
    * matching the batch operator's closed-interval convention.
    *
    * The step-index tiebreak is load-bearing: a one-pass fold over a
    * ts-only sort can visit a step-2 event that TIES with the step-1
    * completion instant BEFORE the step-1 event itself and skip it,
    * where the batch conditional-min window counts it. Sorting equal
    * timestamps in step order makes the fold reach each step's
    * completing event before any same-instant successor candidate, so
    * the fold computes exactly the batch fixed point
    * `t_k = min{ts >= t_(k-1) : step k}` (found by the
    * FunnelPropertySpec randomized cross-check).
    */
  private[streaming] def fold(times0: Seq[Long],
                              events: Seq[(Long, String)]): Seq[Long] = {
    var times = times0
    events.foreach { case (ts, tpe) =>
      if (times.size < steps.size && tpe == steps(times.size) &&
          (times.isEmpty || ts >= times.last))
        times = times :+ ts
    }
    times
  }

  /** Fold one episode: consume `events` (already in (ts, step) order)
    * into `times0` until the funnel completes, returning the new times
    * and the UNCONSUMED suffix (events from the completion point on —
    * the tombstone's to judge against the retention horizon).
    * Non-matching events before completion are discarded, exactly as
    * in [[fold]].
    */
  private[streaming] def foldEpisode(times0: Seq[Long],
      events: Seq[(Long, String)])
      : (Seq[Long], Seq[(Long, String)]) = {
    var times = times0
    var i = 0
    while (i < events.size && times.size < steps.size) {
      val (ts, tpe) = events(i)
      if (tpe == steps(times.size) && (times.isEmpty || ts >= times.last))
        times = times :+ ts
      i += 1
    }
    (times, events.drop(i))
  }

  private def step(key: String, events: Iterator[FunnelEvent],
                   state: GroupState[FunnelBuffer])
      : Iterator[FunnelStepDone] = {
    val wm = state.getCurrentWatermarkMs()
    val prev = state.getOption.getOrElse(FunnelBuffer(Nil, Nil))
    val fresh = events.map(e => (e.ts.getTime, e.eventType)).toSeq
    // the key's own activity clock: the largest event timestamp it has
    // ever shown (buffered or fresh, whether or not it folds) — the
    // idle-TTL anchor, so the reap instant is a function of the event
    // stream alone, never of which batch a delivery landed in
    val maxSeen = ((prev.pending ++ fresh).map(_._1) :+ Long.MinValue).max
    var pool = (prev.pending ++ fresh)
      .sortBy { case (ts, tpe) => (ts, steps.indexOf(tpe)) }
    var times = prev.times
    val out = Seq.newBuilder[FunnelStepDone]
    def bounded(evs: Seq[(Long, String)]): Seq[(Long, String)] =
      if (evs.size > maxPending) evs.takeRight(maxPending) else evs
    var parked = false
    while (!parked) {
      if (times.size == steps.size) {
        // completed episode: its retention horizon is fixed in EVENT
        // time — ts at or below it is FINAL (swallowed); strictly-later
        // events belong to the key's next episode. Deterministic in the
        // event stream: whether a re-entry event arrives before or
        // after the watermark passes the horizon cannot change whether
        // it is swallowed (the previous revision judged by ARRIVAL and
        // slid the horizon per batch)
        val h = satAdd(times.last, completedRetentionMs)
        pool = pool.filter(_._1 > h)
        if (wm >= h) times = Nil // horizon finalized: next episode
        else {
          state.update(FunnelBuffer(times, bounded(pool), h))
          if (h != Long.MaxValue)
            state.setTimeoutTimestamp(math.max(h, wm + 1))
          parked = true
        }
      } else {
        val (ripe, unripe) = pool.partition(_._1 <= wm)
        val before = times.size
        val (t2, rest) = foldEpisode(times, ripe)
        times = t2
        out ++= times.zipWithIndex.drop(before).map { case (t, idx) =>
          FunnelStepDone(key, idx, steps(idx), t)
        }
        pool = rest ++ unripe
        if (times.size < steps.size) {
          // incomplete: park. pool here is all above-watermark (an
          // incomplete foldEpisode consumed or discarded every ripe
          // event), bounded with oldest-first eviction
          val kept = bounded(pool)
          // idle expiry fires only when the configured horizon has
          // truly elapsed — the wm+1 flush timeout must never be
          // mistaken for it and drop partial progress. The horizon is
          // anchored to the key's own activity in EVENT time (last
          // folded step or last event seen, whichever is later), NOT
          // the processing batch's watermark — a wm anchor made the
          // reap instant depend on delivery batching (round-10 ADVICE)
          val exp =
            if (idleTtlMs == Long.MaxValue) Long.MaxValue
            else {
              val anchored = Seq(
                if (prev.expireAtMs != Long.MaxValue) prev.expireAtMs
                else Long.MinValue,
                if (maxSeen != Long.MinValue) satAdd(maxSeen, idleTtlMs)
                else Long.MinValue,
                if (times.nonEmpty) satAdd(times.last, idleTtlMs)
                else Long.MinValue).max
              if (anchored == Long.MinValue) satAdd(wm, idleTtlMs)
              else anchored
            }
          if (times.isEmpty && kept.isEmpty) state.remove()
          else if (state.hasTimedOut && fresh.isEmpty && kept.isEmpty &&
              wm >= exp)
            state.remove()
          else {
            state.update(FunnelBuffer(times, kept, exp))
            // a watermark-only advance does not re-invoke the function
            // for a key without new data; the event-time timeout makes
            // the next advance flush the buffered suffix (and, when
            // configured, the idle horizon reap the key)
            if (kept.nonEmpty) state.setTimeoutTimestamp(wm + 1)
            else if (exp != Long.MaxValue)
              state.setTimeoutTimestamp(math.max(exp, wm + 1))
          }
          parked = true
        }
        // else: completed this pass — loop into the tombstone branch
      }
    }
    out.result().iterator
  }

  /** Apply to a streaming DataFrame with columns
    * (groupKey string, ts timestamp, eventType string); the caller sets
    * `withWatermark("ts", ...)` upstream. Non-step event types are
    * filtered out before the stateful operator (they can never change
    * the fold, so they should not ride the shuffle or the state).
    */
  def transform(df: DataFrame): Dataset[FunnelStepDone] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.selectExpr("groupKey", "ts", "eventType").as[FunnelEvent]
      .filter(e => steps.contains(e.eventType))
      .groupByKey(_.groupKey)
      .flatMapGroupsWithState[FunnelBuffer, FunnelStepDone](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(step)
  }
}
