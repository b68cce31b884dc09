package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.panel.Intervals

/** Bucketized range join: exact BETWEEN semantics, single emission per
  * match across bin boundaries, loud degenerate-interval guards. */
class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("pointInInterval: inclusive endpoints, one row per match even " +
    "when the interval spans many bins, non-matches dropped") {
    val points = Seq(
      ("u1", ts("2024-01-01 09:00:00"), 1L), // == start: inclusive
      ("u1", ts("2024-01-01 09:59:59"), 2L), // inside, later bin
      ("u1", ts("2024-01-01 10:00:00"), 3L), // == end: inclusive
      ("u1", ts("2024-01-01 10:00:01"), 4L), // one past end
      ("u2", ts("2024-01-01 09:30:00"), 5L)) // right time, wrong key
      .toDF("user_id", "ts", "event_id")
    val iv = Seq(("u1", ts("2024-01-01 09:00:00"), ts("2024-01-01 10:00:00")))
      .toDF("user_id", "start_ts", "end_ts")
    // 10-min bins: the interval covers 7 bins — each point still
    // matches exactly once (a point lives in ONE bin)
    val out = Intervals.pointInInterval(points, iv, Seq("user_id"))
      .select("event_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 2L, 3L))
  }

  test("pointInInterval: degenerate intervals fail loudly, not explode") {
    val points = Seq(("u1", ts("2024-01-01 09:00:00"), 1L))
      .toDF("user_id", "ts", "event_id")
    val inverted = Seq(("u1", ts("2024-01-01 10:00:00"), ts("2024-01-01 09:00:00")))
      .toDF("user_id", "start_ts", "end_ts")
    val e1 = intercept[Exception](
      Intervals.pointInInterval(points, inverted, Seq("user_id")).collect())
    assert(e1.getMessage.contains("before start"), e1.getMessage)
    val openEnded = Seq(("u1", ts("2024-01-01 09:00:00"), ts("2034-01-01 09:00:00")))
      .toDF("user_id", "start_ts", "end_ts")
    val e2 = intercept[Exception](
      Intervals.pointInInterval(points, openEnded, Seq("user_id")).collect())
    assert(e2.getMessage.contains("widen the bucket"), e2.getMessage)
    intercept[IllegalArgumentException](
      Intervals.pointInInterval(points, inverted, Seq("user_id"), bucket = 0L))
  }

  test("pointInInterval plans an equi-join on (keys, bin) — no " +
    "broadcast-nested-loop from the range predicate") {
    val points = Seq(("u1", ts("2024-01-01 09:05:00"), 1L))
      .toDF("user_id", "ts", "event_id")
    val iv = Seq(("u1", ts("2024-01-01 09:00:00"), ts("2024-01-01 10:00:00")))
      .toDF("user_id", "start_ts", "end_ts")
    val plan = Intervals.pointInInterval(points, iv, Seq("user_id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("intervalOverlap: one row per overlapping pair (even across many " +
    "shared bins), touching endpoints count, disjoint pairs drop (j9)") {
    val a = Seq(
      ("u1", ts("2024-01-01 09:00:00"), ts("2024-01-01 11:00:00"), "a1"),
      ("u1", ts("2024-01-01 13:00:00"), ts("2024-01-01 13:30:00"), "a2"))
      .toDF("user_id", "start_ts", "end_ts", "a_id")
    val b = Seq(
      // overlaps a1 over 10:00-11:00 — SEVEN shared 10-min bins
      ("u1", ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00"), "b1"),
      // touches a1 exactly at its end instant: inclusive overlap
      ("u1", ts("2024-01-01 11:00:00"), ts("2024-01-01 11:15:00"), "b2"),
      // disjoint from everything
      ("u1", ts("2024-01-01 20:00:00"), ts("2024-01-01 21:00:00"), "b3"))
      .toDF("user_id", "r_start_ts", "r_end_ts", "b_id")
    val out = Intervals.intervalOverlap(a, b, Seq("user_id"))
      .select("a_id", "b_id").as[(String, String)].collect().sorted
    assert(out.toSeq == Seq(("a1", "b1"), ("a1", "b2")))
  }
}
