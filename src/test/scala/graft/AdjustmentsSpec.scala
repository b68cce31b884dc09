package graft

import org.apache.spark.sql.functions._

import graft.panel.{Adjustments, Panel}
import graft.panel.Panel.Keys

/** Back-adjustment goldens: strict-future application, multiplicative
  * composition, untouched sids, loud non-positive factors. */
class AdjustmentsSpec extends SparkSpec {
  import spark.implicits._

  private implicit val k: Keys = Panel.eod

  test("backAdjust: factors apply to strictly earlier bars and compose; " +
    "action-free sids keep factor 1") {
    val panel = Seq(
      ("A", "2024-01-01", 100.0), ("A", "2024-01-15", 50.0),
      ("A", "2024-02-01", 60.0), ("B", "2024-01-10", 7.0))
      .toDF("sid", "date", "close")
      .withColumn("date", to_date(col("date")))
    val actions = Seq(
      ("A", "2024-01-15", 0.5), // 2:1 split ON a bar date → earlier bars only
      ("A", "2024-02-01", 2.0))
      .toDF("sid", "date", "factor")
      .withColumn("date", to_date(col("date")))
    val out = Adjustments.backAdjust(panel, actions)
      .collect().map(r => (r.getString(0), r.getDate(1).toString) -> r).toMap
    // d1 sees both actions: 0.5·2 = 1 (nano-nat logs cancel EXACTLY)
    assert(out(("A", "2024-01-01")).getAs[Double]("adj_factor") == 1.0)
    assert(out(("A", "2024-01-01")).getAs[Double]("adj_close") == 100.0)
    // the same-date split does NOT touch its own bar; the later ×2 does
    assert(out(("A", "2024-01-15")).getAs[Double]("adj_factor") == 2.0)
    assert(out(("A", "2024-01-15")).getAs[Double]("adj_close") == 100.0)
    // nothing after the last bar → untouched
    assert(out(("A", "2024-02-01")).getAs[Double]("adj_factor") == 1.0)
    assert(out(("A", "2024-02-01")).getAs[Double]("adj_close") == 60.0)
    assert(out(("B", "2024-01-10")).getAs[Double]("adj_factor") == 1.0)
    // panel columns survive the union round-trip
    assert(out(("A", "2024-01-15")).getAs[Double]("close") == 50.0)
  }

  test("backAdjust: non-positive factors fail loudly") {
    val panel = Seq(("A", "2024-01-02", 10.0)).toDF("sid", "date", "close")
      .withColumn("date", to_date(col("date")))
    val bad = Seq(("A", "2024-01-05", 0.0)).toDF("sid", "date", "factor")
      .withColumn("date", to_date(col("date")))
    val e = intercept[Exception](
      Adjustments.backAdjust(panel, bad).collect())
    assert(e.getMessage.contains("adjustment factor must be positive"))
  }
}
