package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingJoin

/** Stream–stream interval attribution join: batch equivalence on
  * on-time arrivals, cross-batch matching, and the right-open horizon
  * boundary. */
class StreamingJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("stream-stream interval join matches the batch formulation " +
    "row-for-row on on-time arrivals; horizon boundary is right-open") {
    implicit val sqlCtx = spark.sqlContext
    val touches = MemoryStream[(Long, Timestamp, Long)]
    val convs = MemoryStream[(Long, Timestamp, Long)]
    val q = StreamingJoin.attributionJoin(
      touches.toDF().toDF("user_id", "ts", "event_id"),
      convs.toDF().toDF("user_id", "ts", "event_id"),
      horizonSeconds = 3600, watermarkDelay = "0 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("sj_out")
      .start()
    val touchRows = Seq(
      (3L, ts("2024-01-01 09:00:00"), 103L), // earliest touch FIRST —
      // anything behind the advancing global watermark would be dropped
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-01 10:30:00"), 101L),
      (2L, ts("2024-01-01 10:00:00"), 102L))
    val convRows = Seq(
      (3L, ts("2024-01-01 09:59:59"), 202L), // matches 103 at the last
      // second — and must arrive before the global watermark passes
      // touch 103's horizon, or its state is (correctly) gone
      (1L, ts("2024-01-01 10:45:00"), 200L), // matches 100 and 101
      (2L, ts("2024-01-01 11:00:00"), 201L), // exactly +1h after 102 → NO match (right-open)
      (4L, ts("2024-01-01 10:00:00"), 203L)) // no touch — no match
    try {
      // interleave across micro-batches: touch 101 arrives AFTER the
      // conversion it must match — state buffering does the work
      touches.addData(touchRows.take(2)); q.processAllAvailable()
      convs.addData(convRows.take(2)); q.processAllAvailable()
      touches.addData(touchRows.drop(2)); q.processAllAvailable()
      convs.addData(convRows.drop(2)); q.processAllAvailable()
      val streamed = spark.table("sj_out")
        .select("touch_id", "conv_id", "lag_sec")
        .as[(Long, Long, Double)].collect().toSet
      val batch = StreamingJoin.attributionJoinBatch(
        touchRows.toDF("user_id", "ts", "event_id"),
        convRows.toDF("user_id", "ts", "event_id"), horizonSeconds = 3600)
        .select("touch_id", "conv_id", "lag_sec")
        .as[(Long, Long, Double)].collect().toSet
      assert(streamed == batch, s"$streamed != $batch")
      assert(streamed == Set(
        (100L, 200L, 2700.0), (101L, 200L, 900.0), (103L, 202L, 3599.0)))
    } finally q.stop()
  }

  test("watermark-expired touches stop matching (bounded state is a " +
    "semantics contract, not just memory hygiene)") {
    implicit val sqlCtx = spark.sqlContext
    val touches = MemoryStream[(Long, Timestamp, Long)]
    val convs = MemoryStream[(Long, Timestamp, Long)]
    val q = StreamingJoin.attributionJoin(
      touches.toDF().toDF("user_id", "ts", "event_id"),
      convs.toDF().toDF("user_id", "ts", "event_id"),
      horizonSeconds = 60, watermarkDelay = "0 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("sj_expire")
      .start()
    try {
      touches.addData(Seq((1L, ts("2024-01-01 10:00:00"), 1L)))
      q.processAllAvailable()
      // advance BOTH watermarks far past touch+horizon
      touches.addData(Seq((9L, ts("2024-01-01 12:00:00"), 9L)))
      convs.addData(Seq((9L, ts("2024-01-01 12:00:00"), 90L)))
      q.processAllAvailable()
      // a conversion inside the old touch's horizon, arriving late —
      // the touch's state is gone; no resurrection
      convs.addData(Seq((1L, ts("2024-01-01 10:00:30"), 91L)))
      q.processAllAvailable()
      val got = spark.table("sj_expire")
        .select("touch_id", "conv_id").as[(Long, Long)].collect().toSet
      assert(got == Set((9L, 90L)))
    } finally q.stop()
  }
}
