package graft

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.ml.Validation

/** Purged k-fold / walk-forward assignment tables: block structure,
  * embargo strips, bounded output, and parameter guards. */
class ValidationSpec extends SparkSpec {
  import spark.implicits._

  // 10 trading dates, one row each (distinctness is the operator's job)
  private lazy val panel = (1 to 10)
    .map(i => (Date.valueOf(f"2024-01-$i%02d"), i.toDouble))
    .toDF("date", "x")
    .unionAll(Seq((Date.valueOf("2024-01-05"), 99.0)).toDF("date", "x"))

  test("purgedFolds: contiguous test blocks cover all dates exactly once") {
    val out = Validation.purgedFolds(panel, nFolds = 5, embargoDays = 1)
    // 10 dates × 5 folds
    assert(out.count() == 50)
    val tests = out.where($"role" === "test")
      .groupBy("fold").agg(count(lit(1)).as("n"), min("date").as("mn"), max("date").as("mx"))
      .orderBy("fold").collect()
    assert(tests.length == 5)
    assert(tests.forall(_.getLong(1) == 2)) // 10 dates / 5 folds
    // blocks are contiguous and ordered
    val maxes = tests.map(_.getDate(3).toLocalDate)
    assert(maxes.sorted.sameElements(maxes))
    assert(out.where($"role" === "test").count() == 10)
  }

  test("purgedFolds: embargo strips sit immediately beside the block") {
    val out = Validation.purgedFolds(panel, nFolds = 5, embargoDays = 1)
    // fold 2 tests Jan 3-4 → purged Jan 2 and Jan 5, train = the rest
    val roles = out.where($"fold" === 2)
      .collect().map(r => r.getDate(1).toString -> r.getString(2)).toMap
    assert(roles("2024-01-03") == "test" && roles("2024-01-04") == "test")
    assert(roles("2024-01-02") == "purged" && roles("2024-01-05") == "purged")
    assert(roles("2024-01-01") == "train" && roles("2024-01-06") == "train")
  }

  test("purgedFolds: embargoDays=0 means train right up to the block") {
    val out = Validation.purgedFolds(panel, nFolds = 5, embargoDays = 0)
    assert(out.where($"role" === "purged").count() == 0)
  }

  test("walkForward: split s tests block s+1, trains before the embargo") {
    val out = Validation.walkForward(panel, nSplits = 4, embargoDays = 1)
    assert(out.count() == 40) // 10 dates × 4 splits
    // split 1: blocks of 2 → test Jan 3-4, embargo Jan 2, train Jan 1,
    // unused Jan 5-10
    val roles = out.where($"split" === 1)
      .collect().map(r => r.getDate(1).toString -> r.getString(2)).toMap
    assert(roles("2024-01-03") == "test" && roles("2024-01-04") == "test")
    assert(roles("2024-01-02") == "purged")
    assert(roles("2024-01-01") == "train")
    assert(roles("2024-01-07") == "unused" && roles("2024-01-10") == "unused")
    // the last split has no unused tail
    assert(out.where($"split" === 4 && $"role" === "unused").count() == 0)
  }

  test("parameter guards") {
    intercept[ParameterError](Validation.purgedFolds(panel, nFolds = 1))
    intercept[ParameterError](Validation.purgedFolds(panel, embargoDays = -1))
    intercept[ParameterError](Validation.walkForward(panel, nSplits = 0))
    intercept[ParameterError](Validation.walkForward(panel, embargoDays = -1))
  }
}
