package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.GraftError
import graft.ParameterError

/** Streaming time-window funnel — the live face of
  * [[graft.events.Events.windowFunnel]]: per user, the deepest
  * strictly-ordered step₁ < … < stepₖ chain whose last event falls
  * within `windowMicros` of its own first, maintained incrementally
  * and emitted whenever a user's best depth improves.
  *
  * State per user is 2k+2 numbers: for each level, the COMMITTED
  * anchor (max chain-start over events strictly before the current
  * event time) and a PENDING anchor for updates at the current event
  * time — the two-phase split is what preserves the batch operator's
  * strict-order semantics (equal-timestamp events never chain) across
  * any micro-batch segmentation, because a tie arriving in a LATER
  * batch still sees only the strictly-earlier committed anchors.
  * Batch parity is exact (integer µs, no floats) — the spec replays
  * the identical arrival sequence through the batch operator and
  * asserts equal final depths.
  *
  * Ordering contract: event-time-ordered arrival PER USER across
  * micro-batches (within a batch the fold sorts). A regression
  * (ts < the user's committed clock) fails loudly — a funnel depth
  * silently computed on out-of-order data would be wrong, not stale.
  * Scale: state is O(users · k) longs; one shuffle on the user key.
  */
object StreamingFunnel {

  final case class FunnelEvent(user: String, step: Int, micros: Long)
  final case class FunnelState(
      lastTs: Long, committed: Array[Long], pending: Array[Long], best: Int)
  final case class FunnelDepth(user: String, depth: Int)

  /** Stream (or batch) frame → per-user best depths, UPDATE mode,
    * emitted when the depth improves. `steps` maps event types to
    * levels 1..k; other event types must be filtered upstream. */
  def funnelDepths(
      events: DataFrame,
      steps: Seq[String],
      windowMicros: Long,
      userCol: String = "user_id",
      tsCol: String = "ts",
      typeCol: String = "event_type"): Dataset[FunnelDepth] = {
    if (steps.size < 2)
      throw new ParameterError(s"funnel needs >= 2 steps: $steps")
    if (steps.distinct.size != steps.size)
      throw new ParameterError(s"duplicate funnel steps: ${steps.mkString(", ")}")
    if (windowMicros <= 0)
      throw new ParameterError(s"window must be positive µs: $windowMicros")
    val spark = events.sparkSession
    import spark.implicits._
    val stepIdx = steps.zipWithIndex.map { case (s, i) => (s, i + 1) }.toMap
    val stepCol = steps.zipWithIndex.foldLeft(lit(0)) { case (acc, (s, i)) =>
      when(col(typeCol) === s, lit(i + 1)).otherwise(acc)
    }
    val _ = stepIdx // documented mapping; the column above encodes it
    events
      .select(col(userCol).cast("string").as("user"),
        stepCol.as("step"),
        unix_micros(col(tsCol).cast("timestamp")).as("micros"))
      .where(col("step") >= 1)
      .as[FunnelEvent]
      .groupByKey(_.user)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        fold(steps.size, windowMicros))
  }

  private[graft] def fold(k: Int, windowMicros: Long)(
      user: String,
      rows: Iterator[FunnelEvent],
      state: GroupState[FunnelState]): Iterator[FunnelDepth] = {
    val st = state.getOption.getOrElse(FunnelState(
      Long.MinValue, Array.fill(k)(Long.MinValue),
      Array.fill(k)(Long.MinValue), 0))
    var lastTs = st.lastTs
    val committed = st.committed.clone()
    val pending = st.pending.clone()
    var best = st.best
    val prevBest = best
    // within a micro-batch the iterator order is not guaranteed
    rows.toArray.sortBy(e => (e.micros, e.step)).foreach { e =>
      if (e.micros < lastTs)
        throw new GraftError(
          s"streaming funnel: out-of-order event for user $user " +
            s"(${e.micros} µs < committed clock $lastTs µs) — the " +
            "ordered-arrival contract is violated; depth would be wrong")
      if (e.micros > lastTs) {
        // time advanced: pending anchors become strictly-before
        var i = 0
        while (i < k) {
          if (pending(i) > committed(i)) committed(i) = pending(i)
          i += 1
        }
        lastTs = e.micros
      }
      val j = e.step
      if (j == 1) {
        if (e.micros > pending(0)) pending(0) = e.micros
        if (best < 1) best = 1
      } else {
        val anchor = committed(j - 2) // strictly-before max chain start
        if (anchor != Long.MinValue) {
          if (anchor > pending(j - 1)) pending(j - 1) = anchor
          if (e.micros - anchor <= windowMicros && j > best) best = j
        }
      }
    }
    state.update(FunnelState(lastTs, committed, pending, best))
    if (best > prevBest) Iterator.single(FunnelDepth(user, best))
    else Iterator.empty
  }
}
