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

  test("asofJoin: latest in-tolerance match, equal instants match, " +
    "stale matches null out, same-ts right rows collapse (j10)") {
    def t(s: String) = Timestamp.valueOf(s)
    val views = Seq(
      ("u1", t("2024-01-01 10:01:40"), "v1"), // 100s
      ("u1", t("2024-01-01 10:03:20"), "v2"), // 200s
      ("u2", t("2024-01-01 10:00:50"), "v3")) // no right rows at all
      .toDF("user_id", "ts", "view_id")
    val quotes = Seq(
      ("u1", t("2024-01-01 10:01:30"), 1.0), // duplicate instant:
      ("u1", t("2024-01-01 10:01:30"), 0.5), //   collapses to max 1.0
      ("u1", t("2024-01-01 10:01:40"), 2.0), // equal ts to v1
      ("u1", t("2024-01-01 10:02:30"), 3.0)) // 50s before v2
      .toDF("user_id", "ts", "value")
    val out = Intervals.asofJoin(
      views, quotes, Seq("user_id"), toleranceMicros = 30L * 1000000L)
      .collect().map(r => r.getAs[String]("view_id") ->
        (Option(r.get(r.fieldIndex("value"))),
          Option(r.get(r.fieldIndex("asof_age_us"))))).toMap
    // v1: the equal-instant quote wins, age 0
    assert(out("v1") == ((Some(2.0), Some(0L))))
    // v2: latest quote is 50 s old — beyond the 30 s tolerance
    assert(out("v2") == ((None, None)))
    assert(out("v3") == ((None, None)))
    // unlimited tolerance: v2 attaches the 50 s-old quote
    val loose = Intervals.asofJoin(views, quotes, Seq("user_id"))
      .collect().map(r => r.getAs[String]("view_id") ->
        Option(r.get(r.fieldIndex("value")))).toMap
    assert(loose("v2") == Some(3.0))
    // duplicate-instant collapse is the per-column max
    val dup = Intervals.asofJoin(
      views.where($"view_id" === "v1"), quotes.where($"value" <= 1.0),
      Seq("user_id")).head
    assert(dup.getAs[Double]("value") == 1.0)
  }

  test("asofJoinNearest: closest match either direction, ties prefer " +
    "backward, tolerance caps the chosen distance (j14)") {
    def t(s: String) = Timestamp.valueOf(s)
    val views = Seq(
      ("u", t("2024-01-01 10:01:30"), "before"),   //  90s: fwd 10s
      ("u", t("2024-01-01 10:02:20"), "backward"), // 140s: 40 back vs 60 fwd
      ("u", t("2024-01-01 10:02:30"), "tie"),      // 150s: 50/50 → backward
      ("u", t("2024-01-01 10:03:30"), "after"),    // 210s: back 10s
      ("u", t("2024-01-01 10:10:00"), "far"))      // 600s: nearest 400s away
      .toDF("user_id", "ts", "view_id")
    val quotes = Seq(
      ("u", t("2024-01-01 10:01:40"), 1.0),  // 100s
      ("u", t("2024-01-01 10:03:20"), 2.0))  // 200s
      .toDF("user_id", "ts", "value")
    val out = Intervals.asofJoinNearest(
      views, quotes, Seq("user_id"), toleranceMicros = 120L * 1000000L)
      .collect().map(r => r.getAs[String]("view_id") ->
        (Option(r.get(r.fieldIndex("value"))),
          Option(r.get(r.fieldIndex("asof_age_us"))),
          Option(r.getAs[String]("asof_dir")))).toMap
    assert(out("before") == ((Some(1.0), Some(10000000L), Some("forward"))))
    assert(out("backward") == ((Some(1.0), Some(40000000L), Some("backward"))))
    assert(out("tie") == ((Some(1.0), Some(50000000L), Some("backward"))))
    assert(out("after") == ((Some(2.0), Some(10000000L), Some("backward"))))
    assert(out("far") == ((None, None, None))) // 400 s > 120 s tolerance
  }
}
