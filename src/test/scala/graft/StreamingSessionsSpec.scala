package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingSessions

/** Streaming sessionization: cross-batch session extension, gap-split,
  * and watermark-timeout close — the decisive properties a batch rerun
  * can't show. */
class StreamingSessionsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("NATIVE session_window aggregate streams in append mode; closed " +
    "sessions equal the batch run on the same arrivals (ev23)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val events = input.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "0 seconds")
    val q = graft.events.Events.sessionWindows(events, gapSeconds = 1800)
      .writeStream.outputMode("append")
      .format("memory").queryName("ssess_native")
      .start()
    val arrivals = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:10:00")),
      (2L, ts("2024-01-01 10:05:00")),
      (1L, ts("2024-01-01 11:00:00"))) // ≥30 m after 10:10 → new session
    try {
      arrivals.grouped(2).foreach { b => input.addData(b); q.processAllAvailable() }
      // flush: advance the watermark far past every session's end
      input.addData((99L, ts("2024-01-02 00:00:00")))
      q.processAllAvailable()
      val streamed = spark.table("ssess_native")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3)))
        .toSet
      // batch replay of the SAME operator over all closed-session
      // arrivals (the flusher's own session never closes, so exclude it)
      val batch = graft.events.Events.sessionWindows(
        arrivals.toDF("user_id", "ts"), gapSeconds = 1800)
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3)))
        .toSet
      assert(streamed == batch, s"$streamed != $batch")
      assert(batch.map(t => (t._1, t._4)) ==
        Set((1L, 2L), (2L, 1L), (1L, 1L))) // user 1: 2-event + 1-event
    } finally q.stop()
  }

  test("sessions extend across micro-batches, split on gap, and close " +
    "via the event-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long)]
    val events = input.toDF().toDF("user_id", "ts", "event_id")
    val qname = "ssess_out"
    val q = StreamingSessions.sessions(
      events, gapSeconds = 600, watermarkDelay = "0 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName(qname)
      .start()
    try {
      // batch 1: two events 5 min apart — one open session
      input.addData((1L, ts("2024-01-01 10:00:00"), 1L),
        (1L, ts("2024-01-01 10:05:00"), 2L))
      q.processAllAvailable()
      assert(spark.table(qname).count() == 0) // still open

      // batch 2: +5 min extends the SAME session across the batch
      // boundary (state, not batch-local windows)
      input.addData((1L, ts("2024-01-01 10:10:00"), 3L))
      q.processAllAvailable()
      assert(spark.table(qname).count() == 0)

      // batch 3: an 11-min gap closes session 1 inline and opens a new
      // one; a second user's far-future event then advances the
      // watermark past the new session's timeout
      input.addData((1L, ts("2024-01-01 10:21:00"), 4L))
      q.processAllAvailable()
      input.addData((2L, ts("2024-01-01 12:00:00"), 5L))
      q.processAllAvailable()
      // one more batch so the armed timeout fires under the advanced
      // watermark
      input.addData((2L, ts("2024-01-01 12:00:01"), 6L))
      q.processAllAvailable()

      val out = spark.table(qname).as[StreamingSessions.ClosedSession]
        .collect().map(s => (s.userId, s.startTs.toString, s.nEvents,
          s.durationSec)).toSet
      // session 1: events 1-3, 10:00 → 10:10
      assert(out.contains((1L, "2024-01-01 10:00:00.0", 3L, 600.0)))
      // session 2: the lone 10:21 event, closed by timeout
      assert(out.contains((1L, "2024-01-01 10:21:00.0", 1L, 0.0)))
    } finally q.stop()
  }

  test("duplicate timestamps keep the batch operator's (ts, event_id) " +
    "order and count all events") {
    // driver-level check of the state transition itself
    val evs = Iterator(
      StreamingSessions.Ev(7L, ts("2024-01-01 00:00:01"), 2L),
      StreamingSessions.Ev(7L, ts("2024-01-01 00:00:01"), 1L),
      StreamingSessions.Ev(7L, ts("2024-01-01 00:00:05"), 3L))
    val state = org.apache.spark.sql.streaming.TestGroupState.create[
      StreamingSessions.OpenSession](
      org.apache.spark.api.java.Optional.empty(),
      org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout,
      1000L, org.apache.spark.api.java.Optional.of(0L), hasTimedOut = false)
    val closed = StreamingSessions.step(600L)(7L, evs, state).toList
    assert(closed.isEmpty)
    assert(state.get.n == 3L)
    assert(state.get.start == ts("2024-01-01 00:00:01").getTime * 1000L)
    assert(state.get.last == ts("2024-01-01 00:00:05").getTime * 1000L)
  }
}
