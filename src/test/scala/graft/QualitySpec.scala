package graft

import org.apache.spark.sql.functions._

import graft.sources.Quality

/** Expectation semantics on hand-checkable fixtures: null predicates are
  * violations, one scan evaluates all rules, and orphan checks treat a
  * null FK as unmatched. The dq1 catalog query pins the same operator
  * against DuckDB at sf0.01. */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("expect: null predicate counts as a violation; one row per rule") {
    val df = Seq(Some(5), Some(50), None, Some(-1)).toDF("v")
    val report = Quality.expect(df, Seq(
      "positive" -> (col("v") > 0),
      "null_ok" -> (col("v").isNull || col("v") > 0)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // v=None: (v > 0) is null → violation; null_ok admits it
    assert(report == Map("positive" -> (4L, 2L), "null_ok" -> (4L, 1L)))
  }

  test("expect: all rules evaluate in one aggregate pass (single scan)") {
    val df = Seq(1, 2, 3).toDF("v")
    val plan = Quality.expect(df, Seq(
      "a" -> (col("v") > 0), "b" -> (col("v") < 10), "c" -> (col("v") =!= 2)))
      .queryExecution.executedPlan.toString
    assert("LocalTableScan|Scan".r.findAllIn(plan).length == 1,
      s"expected one scan, plan:\n$plan")
  }

  test("orphans: unmatched and null child keys count; matched don't") {
    val child = Seq(Some(1), Some(2), Some(99), None).toDF("fk")
    val parent = Seq(1, 2, 3).toDF("pk")
    val row = Quality.orphans("fk_check", child, "fk", parent, "pk").head()
    assert(row.getString(0) == "fk_check")
    assert(row.getLong(1) == 4 && row.getLong(2) == 2)
  }
}
