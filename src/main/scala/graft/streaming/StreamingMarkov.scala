package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.GraftError

/** Streaming first-order Markov transition counter — the live face of
  * the batch `ev35_markov` operator: per user, every consecutive
  * event-type pair (ordered by event-time µs with the event-id
  * tiebreak, the session-family contract) emits one transition row;
  * downstream aggregation (`groupBy(from_type, to_type).count`) then
  * matches the batch transition matrix exactly on any micro-batch
  * segmentation of the same arrivals.
  *
  * State per user is ONE (type, µs, event_id) triple — the last seen
  * event — so the keyed-state store holds O(users) small rows (cf. the
  * funnel's 2k+2 longs; this is lighter). Within a batch the fold
  * sorts; ACROSS batches ordered arrival per user is a contract and a
  * regression raises (a transition matrix silently built from
  * out-of-order arrivals would be wrong, not stale — the
  * StreamingFunnel stance). Ties: equal (µs, event_id) cannot occur
  * (event ids are unique); equal µs with different ids order by id,
  * identically in the batch operator.
  */
object StreamingMarkov {

  final case class MarkovEvent(
      user: String, eventType: String, micros: Long, eventId: Long)
  final case class LastEvent(eventType: String, micros: Long, eventId: Long)
  final case class Transition(user: String, fromType: String, toType: String)

  /** Stream (or batch) frame → per-transition rows, APPEND mode. */
  def transitions(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      typeCol: String = "event_type",
      idCol: String = "event_id"): Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col(userCol).cast("string").as("user"),
        col(typeCol).cast("string").as("eventType"),
        unix_micros(col(tsCol).cast("timestamp")).as("micros"),
        col(idCol).cast("long").as("eventId"))
      .as[MarkovEvent]
      .groupByKey(_.user)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        fold)
  }

  private[graft] def fold(
      user: String,
      rows: Iterator[MarkovEvent],
      state: GroupState[LastEvent]): Iterator[Transition] = {
    var last = state.getOption.orNull
    val out = Seq.newBuilder[Transition]
    rows.toArray.sortBy(e => (e.micros, e.eventId)).foreach { e =>
      if (last != null) {
        if (e.micros < last.micros ||
          (e.micros == last.micros && e.eventId < last.eventId))
          throw new GraftError(
            s"streaming markov: out-of-order event for user $user " +
              s"(${e.micros} µs/id ${e.eventId} < committed " +
              s"${last.micros} µs/id ${last.eventId}) — the ordered-" +
              "arrival contract is violated; the matrix would be wrong")
        out += Transition(user, last.eventType, e.eventType)
      }
      last = LastEvent(e.eventType, e.micros, e.eventId)
    }
    if (last != null) state.update(last)
    out.result().iterator
  }
}
