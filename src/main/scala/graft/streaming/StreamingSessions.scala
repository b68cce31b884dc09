package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-based sessionization — the continuous-ingest companion
  * to the batch [[graft.events.Events.sessionize]]: the same
  * gap-over-threshold rule, run as keyed state per user with an
  * event-time timeout, so a session CLOSES (and is emitted exactly
  * once, append mode) when the watermark passes its last event plus the
  * gap — not when a batch boundary happens to fall.
  *
  * Scale notes:
  *  - State is ONE small record per user with an open session (start,
  *    last, count) — eviction is the event-time timeout itself, so the
  *    store is bounded by concurrently-active users, the same bound the
  *    batch shuffle pays per partition.
  *  - Within a micro-batch a user's rows sort by (micros, eventId) —
  *    bounded by one user's arrivals per batch — matching the batch
  *    operator's deterministic tie order.
  *  - Events later than the watermark delay are dropped by Spark before
  *    the state function (the standard lateness trade; the batch
  *    operator, with hindsight, would have counted them).
  */
object StreamingSessions {

  final case class Ev(userId: Long, ts: Timestamp, eventId: Long) {
    /** exact integer microseconds (Timestamp carries ms + nanos) */
    def micros: Long = ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L
  }
  final case class OpenSession(start: Long, last: Long, n: Long)
  final case class ClosedSession(
      userId: Long, startTs: Timestamp, endTs: Timestamp,
      nEvents: Long, durationSec: Double)

  private def toTs(micros: Long): Timestamp = {
    val t = new Timestamp(micros / 1000)
    t.setNanos(((micros % 1000000L) * 1000L).toInt)
    t
  }

  /** Closed sessions of a streaming event frame. `watermarkDelay`
    * bounds accepted lateness (and therefore state lifetime); gap and
    * tie-break semantics match the batch operator exactly. */
  def sessions(
      events: DataFrame,
      gapSeconds: Long,
      userCol: String = "user_id",
      tsCol: String = "ts",
      eventIdCol: String = "event_id",
      watermarkDelay: String = "10 minutes"): Dataset[ClosedSession] = {
    if (gapSeconds <= 0)
      throw new graft.ParameterError(s"gapSeconds must be positive: $gapSeconds")
    val spark = events.sparkSession
    import spark.implicits._
    events
      // normalize the event-time type BEFORE the watermark: any cast
      // AFTER it builds a new expression without the watermark tag, and
      // the event-time timeout then fails analysis. The tagged column
      // itself (a bare alias keeps attribute metadata) flows into the
      // state function; micros derive in the encoder.
      .withColumn("__wmts", col(tsCol).cast("timestamp"))
      .withWatermark("__wmts", watermarkDelay)
      .select(
        col(userCol).cast("long").as("userId"),
        col("__wmts").as("ts"),
        col(eventIdCol).cast("long").as("eventId"))
      .as[Ev]
      .groupByKey(_.userId)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        step(gapSeconds))
  }

  /** Per-user state transition: extend the open session while gaps stay
    * within the threshold, close (emit) on a larger gap, and arm an
    * event-time timeout at last + gap so quiet users close via the
    * watermark instead of lingering forever. */
  private[graft] def step(gapSeconds: Long)(
      userId: Long,
      rows: Iterator[Ev],
      state: GroupState[OpenSession]): Iterator[ClosedSession] = {
    val gapMicros = gapSeconds * 1000000L
    def close(s: OpenSession): ClosedSession =
      ClosedSession(userId, toTs(s.start), toTs(s.last), s.n,
        (s.last - s.start) / 1e6)
    if (state.hasTimedOut) {
      val out = state.getOption.map(close).toList
      state.remove()
      return out.iterator
    }
    val sorted = rows.toArray.sortBy(e => (e.micros, e.eventId))
    val closed = scala.collection.mutable.ListBuffer.empty[ClosedSession]
    var open = state.getOption
    for (e <- sorted) {
      open = open match {
        case Some(s) if e.micros - s.last <= gapMicros =>
          Some(OpenSession(s.start, math.max(s.last, e.micros), s.n + 1))
        case Some(s) =>
          closed += close(s)
          Some(OpenSession(e.micros, e.micros, 1))
        case None =>
          Some(OpenSession(e.micros, e.micros, 1))
      }
    }
    open.foreach { s =>
      state.update(s)
      state.setTimeoutTimestamp(s.last / 1000L + gapSeconds * 1000L)
    }
    closed.iterator
  }
}
