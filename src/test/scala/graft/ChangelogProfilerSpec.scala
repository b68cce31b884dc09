package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.panel.Changelog
import graft.sources.Profiler

/** CDC compaction, SCD Type-2 intervals, and the column profiler on
  * hand-checkable fixtures (the catalog queries cdc1/scd1/prof1 pin the
  * same operators against DuckDB at sf0.01). */
class ChangelogProfilerSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("latestSnapshot: last op wins, delete tombstones drop the entity") {
    val log = Seq(
      // entity 1: insert → update (survives with v=20)
      (1L, ts("2024-01-01 00:00:00"), 1L, false, 10L),
      (1L, ts("2024-01-02 00:00:00"), 2L, false, 20L),
      // entity 2: insert → delete (dropped)
      (2L, ts("2024-01-01 00:00:00"), 3L, false, 30L),
      (2L, ts("2024-01-03 00:00:00"), 4L, true, 0L),
      // entity 3: delete then REINSERT later (survives — order matters)
      (3L, ts("2024-01-01 00:00:00"), 5L, true, 0L),
      (3L, ts("2024-01-02 00:00:00"), 6L, false, 40L),
      // entity 4: same ts — tiebreaker decides (higher op_id wins)
      (4L, ts("2024-01-01 00:00:00"), 7L, false, 50L),
      (4L, ts("2024-01-01 00:00:00"), 8L, false, 60L)
    ).toDF("entity", "ts", "op_id", "is_delete", "v")

    val snap = Changelog
      .latestSnapshot(log, col("entity"), Seq(col("ts"), col("op_id")), col("is_delete"))
      .select("entity", "v").as[(Long, Long)].collect().toMap
    assert(snap == Map(1L -> 20L, 3L -> 40L, 4L -> 60L))
  }

  test("scd2: runs collapse, intervals chain, exactly one current version") {
    val log = Seq(
      // A: x,x,y,x → 3 runs
      (1L, ts("2024-01-01 00:00:00"), 1L, "x"),
      (1L, ts("2024-01-02 00:00:00"), 2L, "x"),
      (1L, ts("2024-01-03 00:00:00"), 3L, "y"),
      (1L, ts("2024-01-04 00:00:00"), 4L, "x"),
      // B: single event
      (2L, ts("2024-02-01 00:00:00"), 5L, "z"),
      // C: null state forms its own run (null-safe comparison)
      (3L, ts("2024-03-01 00:00:00"), 6L, null),
      (3L, ts("2024-03-02 00:00:00"), 7L, null),
      (3L, ts("2024-03-03 00:00:00"), 8L, "w")
    ).toDF("entity", "ts", "op_id", "state")

    val out = Changelog.scd2(log, "entity", "ts", "op_id", "state")
      .orderBy("entity", "version").collect()

    val a = out.filter(_.getLong(0) == 1L)
    assert(a.map(r => (r.getInt(1), r.getString(2))).toSeq ==
      Seq((1, "x"), (2, "y"), (3, "x")))
    // intervals chain: each valid_to equals the next valid_from
    assert(a(0).getTimestamp(4) == a(1).getTimestamp(3))
    assert(a(1).getTimestamp(4) == a(2).getTimestamp(3))
    assert(a(2).isNullAt(4) && a(2).getBoolean(5))
    assert(a.count(_.getBoolean(5)) == 1)

    val b = out.filter(_.getLong(0) == 2L)
    assert(b.length == 1 && b(0).getBoolean(5))

    val cRuns = out.filter(_.getLong(0) == 3L)
    assert(cRuns.map(r => Option(r.getString(2))).toSeq == Seq(None, Some("w")))
  }

  test("profiler: exact counts, nulls, distinct, lexicographic min/max") {
    val df = Seq(
      (Some(1L), Some("b")),
      (Some(2L), None),
      (Some(10L), Some("a")),
      (None, Some("a"))
    ).toDF("k", "s")
    val prof = Profiler.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    val k = prof("k")
    assert(k.getLong(1) == 4 && k.getLong(2) == 1 && k.getLong(3) == 3)
    // lexicographic on the string cast: "1" < "10" < "2"
    assert(k.getString(4) == "1" && k.getString(5) == "2")
    val s = prof("s")
    assert(s.getLong(2) == 1 && s.getLong(3) == 2)
    assert(s.getString(4) == "a" && s.getString(5) == "b")
  }

  test("scd2 plan: one entity exchange feeds both window passes") {
    val log = Seq((1L, ts("2024-01-01 00:00:00"), 1L, "x"))
      .toDF("entity", "ts", "op_id", "state")
    val plan = Changelog.scd2(log, "entity", "ts", "op_id", "state")
      .queryExecution.executedPlan.toString
    // both windows hash-partition on the entity key only — the second
    // window must reuse the first's partitioning (no re-exchange between)
    val exchanges = "hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 1, s"expected ≤1 entity exchange, plan:\n$plan")
  }

  test("fact→SCD2 join honors [valid_from, valid_to) at exact boundaries") {
    import spark.implicits._
    // dim changelog: state A at 10:00, B at 12:00 → A valid [10,12), B [12,∞)
    val dim = graft.panel.Changelog.scd2(
      Seq((1L, "2024-01-01 10:00:00", 1L, "A"), (1L, "2024-01-01 12:00:00", 2L, "B"))
        .toDF("u", "s", "op", "st")
        .select($"u", to_timestamp($"s").as("ts"), $"op", $"st"),
      entity = "u", ts = "ts", tie = "op", state = "st")
      .withColumn("__end", coalesce($"valid_to", to_timestamp(lit("2024-12-31"))))
    // facts at 11:59:59 (→A), exactly 12:00 (→B, the ')' boundary),
    // 13:00 (→B), and 09:00 (before any version → dropped)
    val facts = Seq((1L, "2024-01-01 11:59:59", 10L), (1L, "2024-01-01 12:00:00", 11L),
      (1L, "2024-01-01 13:00:00", 12L), (1L, "2024-01-01 09:00:00", 13L))
      .toDF("u", "s", "fid").select($"u", to_timestamp($"s").as("ts"), $"fid")
    val got = graft.panel.Intervals.pointInInterval(
      facts, dim, keyCols = Seq("u"), tsCol = "ts",
      startCol = "valid_from", endCol = "__end", bucket = 3600000000L)
      .where($"valid_to".isNull || $"ts" < $"valid_to")
      .select($"fid", $"state").as[(Long, String)].collect().toMap
    assert(got === Map(10L -> "A", 11L -> "B", 12L -> "B"))
  }
}
