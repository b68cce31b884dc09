package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.panel.Panel
import graft.pipeline.{Backtest, Strategy}

/** The reference's basic long-only golden test, reproduced exactly:
  * BuyBelow10 over the 2-sid × 4-date EOD fixture
  * (reference _tests/test_backtest.py:108-401; fixture values
  * _tests/test_backtest.py:125-160, FIXTURES.md §1).
  */
class BacktestGoldenSpec extends SparkSpec {
  import spark.implicits._

  object BuyBelow10 extends Strategy {
    val code = "buy-below-10"
    def pricesToSignals(prices: DataFrame): DataFrame =
      prices.withColumn("signal", (col("close") < 10).cast("int"))
  }

  private lazy val prices: DataFrame = Seq(
    // sid, date, close, volume (test_backtest.py:129-158)
    ("FI12345", "2018-05-01", 9.00, 5000.0),
    ("FI12345", "2018-05-02", 11.00, 16000.0),
    ("FI12345", "2018-05-03", 10.50, 8800.0),
    ("FI12345", "2018-05-04", 9.99, 9900.0),
    ("FI23456", "2018-05-01", 9.89, 15000.0),
    ("FI23456", "2018-05-02", 11.00, 14000.0),
    ("FI23456", "2018-05-03", 8.50, 28800.0),
    ("FI23456", "2018-05-04", 10.50, 17000.0))
    .toDF("sid", "date", "close", "volume")
    .withColumn("date", to_date($"date"))

  private lazy val results: Map[(String, String, String), Option[Double]] =
    Backtest.run(BuyBelow10, prices)
      .collect()
      .map { r: Row =>
        (r.getString(r.fieldIndex("field")), r.getString(r.fieldIndex("sid")),
          r.getDate(r.fieldIndex("date")).toString) ->
          (if (r.isNullAt(r.fieldIndex("value"))) None
           else Some(r7(r.getDouble(r.fieldIndex("value")))))
      }
      .toMap

  private val dates = Seq("2018-05-01", "2018-05-02", "2018-05-03", "2018-05-04")

  private def check(field: String, sid: String, expected: Seq[Option[Double]]): Unit =
    assert(
      dates.map(d => results((field, sid, d))) == expected,
      s"$field/$sid: got ${dates.map(d => results((field, sid, d)))}")

  test("results panel has the 10 standard fields") {
    assert(results.keySet.map(_._1) == graft.model.Fields.results.toSet)
  }

  test("Signal (test_backtest.py:212-229)") {
    check("Signal", "FI12345", Seq(Some(1.0), Some(0.0), Some(0.0), Some(1.0)))
    check("Signal", "FI23456", Seq(Some(1.0), Some(0.0), Some(1.0), Some(0.0)))
  }

  test("Weight (test_backtest.py:238-248)") {
    check("Weight", "FI12345", Seq(Some(0.5), Some(0.0), Some(0.0), Some(1.0)))
    check("Weight", "FI23456", Seq(Some(0.5), Some(0.0), Some(1.0), Some(0.0)))
  }

  test("AbsWeight (test_backtest.py:250-267)") {
    check("AbsWeight", "FI12345", Seq(Some(0.5), Some(0.0), Some(0.0), Some(1.0)))
    check("AbsWeight", "FI23456", Seq(Some(0.5), Some(0.0), Some(1.0), Some(0.0)))
  }

  test("NetExposure: first period NaN, then lagged weights (test_backtest.py:269-286)") {
    check("NetExposure", "FI12345", Seq(None, Some(0.5), Some(0.0), Some(0.0)))
    check("NetExposure", "FI23456", Seq(None, Some(0.5), Some(0.0), Some(1.0)))
  }

  test("AbsExposure (test_backtest.py:288-305)") {
    check("AbsExposure", "FI12345", Seq(None, Some(0.5), Some(0.0), Some(0.0)))
    check("AbsExposure", "FI23456", Seq(None, Some(0.5), Some(0.0), Some(1.0)))
  }

  test("TotalHoldings (test_backtest.py:307-324)") {
    check("TotalHoldings", "FI12345", Seq(Some(0.0), Some(1.0), Some(0.0), Some(0.0)))
    check("TotalHoldings", "FI23456", Seq(Some(0.0), Some(1.0), Some(0.0), Some(1.0)))
  }

  test("Turnover (test_backtest.py:326-343)") {
    check("Turnover", "FI12345", Seq(None, Some(0.5), Some(0.5), Some(0.0)))
    check("Turnover", "FI23456", Seq(None, Some(0.5), Some(0.5), Some(1.0)))
  }

  test("Commission and Slippage are zero without cost models (test_backtest.py:345-378)") {
    for (f <- Seq("Commission", "Slippage"); sid <- Seq("FI12345", "FI23456"))
      check(f, sid, Seq(Some(0.0), Some(0.0), Some(0.0), Some(0.0)))
  }

  test("Return: pct_change × twice-lagged weight (test_backtest.py:380-400)") {
    check("Return", "FI12345", Seq(Some(0.0), Some(0.0), Some(-0.0227273), Some(-0.0)))
    check("Return", "FI23456", Seq(Some(0.0), Some(0.0), Some(-0.1136364), Some(0.0)))
  }

  test("start-date truncation drops warm-up rows (base.py:1395-1398)") {
    val truncated = Backtest.run(
      BuyBelow10, prices, cfg = Backtest.Config(startDate = Some("2018-05-03")))
    val remaining = truncated.select("date").distinct().collect().map(_.get(0).toString).sorted
    assert(remaining.toSeq == Seq("2018-05-03", "2018-05-04"))
  }

  test("labelSids renames sids to Symbol(Sid) (D24, base.py:1390-1393)") {
    val master = Seq(("FI12345", "ABC"), ("FI23456", "DEF"))
      .toDF("sid", "symbol")
    val labeled = Backtest.run(BuyBelow10, prices, master = Some(master),
      cfg = Backtest.Config(labelSids = true))
    val sids = labeled.select("sid").distinct().as[String].collect().toSet
    assert(sids == Set("ABC(FI12345)", "DEF(FI23456)"))
  }

  test("allocation scales weights (base.py:1342; test_backtest.py:1736)") {
    val scaled = Backtest.run(BuyBelow10, prices, cfg = Backtest.Config(allocation = 0.5))
    val w = scaled.where($"field" === "Weight" && $"sid" === "FI12345" &&
      $"date" === "2018-05-01").select("value").head.getDouble(0)
    assert(r7(w) == 0.25)
  }
}
