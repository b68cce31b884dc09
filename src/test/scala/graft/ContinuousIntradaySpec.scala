package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.panel.Panel
import graft.pipeline.{Backtest, Strategy}

/** The reference's continuous intraday golden test:
  * BuyBelow10ShortAbove10ContIntraday (_tests/test_backtest.py:1322-1560).
  * Unlike the once-a-day variant, the WHOLE pipeline runs at
  * (date, time) grain: lags, turnover, and returns cross day boundaries
  * along the (date, time) row sequence — exactly pandas' MultiIndex
  * ordering. Expected values below derived with the reference's own
  * formulas in pandas (verified against the test's listed values).
  */
class ContinuousIntradaySpec extends SparkSpec {
  import spark.implicits._

  object ContIntraday extends Strategy {
    val code = "cont-intraday"
    override def keys: Panel.Keys = Panel.intraday
    def pricesToSignals(prices: DataFrame): DataFrame =
      prices.withColumn("signal",
        when(col("close") <= 10, 1).otherwise(-1))
  }

  // fixture: test_backtest.py:1340-1371 (2 sids × 2 dates × 3 times)
  private lazy val prices = Seq(
    ("FI12345", "2018-05-01", "10:00:00", 9.6),
    ("FI12345", "2018-05-01", "11:00:00", 10.45),
    ("FI12345", "2018-05-01", "12:00:00", 10.12),
    ("FI12345", "2018-05-02", "10:00:00", 15.45),
    ("FI12345", "2018-05-02", "11:00:00", 8.67),
    ("FI12345", "2018-05-02", "12:00:00", 12.30),
    ("FI23456", "2018-05-01", "10:00:00", 10.56),
    ("FI23456", "2018-05-01", "11:00:00", 12.01),
    ("FI23456", "2018-05-01", "12:00:00", 10.50),
    ("FI23456", "2018-05-02", "10:00:00", 9.80),
    ("FI23456", "2018-05-02", "11:00:00", 13.40),
    ("FI23456", "2018-05-02", "12:00:00", 7.50))
    .toDF("sid", "date", "time", "close")
    .withColumn("date", to_date($"date"))

  private lazy val results: Map[(String, String, String, String), Option[Double]] =
    Backtest.run(ContIntraday, prices)
      .collect()
      .map { r =>
        (r.getAs[String]("field"), r.getAs[String]("sid"),
          r.getAs[java.sql.Date]("date").toString, r.getAs[String]("time")) ->
          Option(r.getAs[java.lang.Double]("value")).map(v => r7(v))
      }
      .toMap

  private val slots = Seq(
    ("2018-05-01", "10:00:00"), ("2018-05-01", "11:00:00"), ("2018-05-01", "12:00:00"),
    ("2018-05-02", "10:00:00"), ("2018-05-02", "11:00:00"), ("2018-05-02", "12:00:00"))

  private def check(field: String, sid: String, expected: Seq[Option[Double]]): Unit =
    assert(slots.map { case (d, t) => results((field, sid, d, t)) } == expected,
      s"$field/$sid: got ${slots.map { case (d, t) => results((field, sid, d, t)) }}")

  test("Signal: ±1 at every bar") {
    check("Signal", "FI12345",
      Seq(Some(1.0), Some(-1.0), Some(-1.0), Some(-1.0), Some(1.0), Some(-1.0)))
    check("Signal", "FI23456",
      Seq(Some(-1.0), Some(-1.0), Some(-1.0), Some(1.0), Some(-1.0), Some(1.0)))
  }

  test("Weight: equal weights per (date, time) slot") {
    check("Weight", "FI12345",
      Seq(Some(0.5), Some(-0.5), Some(-0.5), Some(-0.5), Some(0.5), Some(-0.5)))
    check("Weight", "FI23456",
      Seq(Some(-0.5), Some(-0.5), Some(-0.5), Some(0.5), Some(-0.5), Some(0.5)))
  }

  test("NetExposure: lag crosses the day boundary along (date,time) rows") {
    check("NetExposure", "FI12345",
      Seq(None, Some(0.5), Some(-0.5), Some(-0.5), Some(-0.5), Some(0.5)))
    check("NetExposure", "FI23456",
      Seq(None, Some(-0.5), Some(-0.5), Some(-0.5), Some(0.5), Some(-0.5)))
  }

  test("Turnover across bars incl. overnight") {
    check("Turnover", "FI12345",
      Seq(None, Some(0.5), Some(1.0), Some(0.0), Some(0.0), Some(1.0)))
    check("Turnover", "FI23456",
      Seq(None, Some(0.5), Some(0.0), Some(0.0), Some(1.0), Some(1.0)))
  }

  test("Return: pct_change × twice-lagged position, overnight included") {
    check("Return", "FI12345",
      Seq(Some(0.0), Some(0.0), Some(-0.0157895), Some(-0.2633399), Some(0.2194175), Some(-0.2093426)))
    check("Return", "FI23456",
      Seq(Some(0.0), Some(0.0), Some(0.0628643), Some(0.0333333), Some(-0.1836735), Some(-0.2201493)))
  }
}
