package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.alloc.Weights
import graft.panel.Panel
import graft.pipeline.{Backtest, Strategy}

/** The reference's once-a-day intraday golden test: ShortAbove10Intraday
  * (_tests/test_backtest.py:1026-1320). Signals derive from the 09:30
  * cross-section of an intraday panel (P2), positions are entered same
  * day and closed daily (POSITIONS_CLOSED_DAILY → turnover = 2×|position|,
  * base.py:260, 708-710); returns span 09:30→15:30.
  */
class IntradaySpec extends SparkSpec {
  import spark.implicits._

  object ShortAbove10Intraday extends Strategy {
    val code = "short-above-10"
    override def positionsClosedDaily = true

    /** Collapse the intraday panel to a daily frame of time-slices (P2 +
      * A3: one row per (sid, date) with the named time crossings). */
    def pricesToSignals(prices: DataFrame): DataFrame =
      prices
        .groupBy("sid", "date")
        .agg(
          max(when(col("time") === "09:30:00", col("open"))).as("open_0930"),
          max(when(col("time") === "09:30:00", col("close"))).as("close_0930"),
          max(when(col("time") === "15:30:00", col("close"))).as("close_1530"))
        .withColumn("signal", -(col("open_0930") > 10).cast("int"))

    override def signalsToTargetWeights(panel: DataFrame): DataFrame =
      panel.withColumn("weight", Weights.fixedWeights(col("signal"), 0.25))

    /** Enter on the same day (no lag). */
    override def targetWeightsToPositions(panel: DataFrame): DataFrame =
      panel.withColumn("position", col("weight"))

    /** Hold 09:30 → 15:30 within the day. */
    override def positionsToGrossReturns(panel: DataFrame): DataFrame =
      panel.withColumn("gross",
        (col("close_1530") - col("close_0930")) / col("close_0930") * col("position"))
  }

  // fixture: test_backtest.py:1063-1107 (2 sids × 3 dates × 2 times)
  private lazy val prices = Seq(
    ("FI12345", "2018-05-01", "09:30:00", 9.6, 9.88),
    ("FI12345", "2018-05-01", "15:30:00", 10.45, 10.34),
    ("FI12345", "2018-05-02", "09:30:00", 10.12, 10.23),
    ("FI12345", "2018-05-02", "15:30:00", 15.45, 16.45),
    ("FI12345", "2018-05-03", "09:30:00", 8.67, 8.90),
    ("FI12345", "2018-05-03", "15:30:00", 12.30, 11.30),
    ("FI23456", "2018-05-01", "09:30:00", 10.56, 9.89),
    ("FI23456", "2018-05-01", "15:30:00", 12.01, 11.0),
    ("FI23456", "2018-05-02", "09:30:00", 10.50, 8.50),
    ("FI23456", "2018-05-02", "15:30:00", 9.80, 10.50),
    ("FI23456", "2018-05-03", "09:30:00", 13.40, 14.10),
    ("FI23456", "2018-05-03", "15:30:00", 14.50, 15.60))
    .toDF("sid", "date", "time", "close", "open")
    .withColumn("date", to_date($"date"))

  private lazy val results: Map[(String, String, String), Double] =
    Backtest.run(ShortAbove10Intraday, prices)
      .collect()
      .map { r =>
        (r.getAs[String]("field"), r.getAs[String]("sid"),
          r.getAs[java.sql.Date]("date").toString) ->
          r7(Option(r.getAs[java.lang.Double]("value")).map(_.toDouble).getOrElse(Double.NaN))
      }
      .toMap

  private val dates = Seq("2018-05-01", "2018-05-02", "2018-05-03")

  private def check(field: String, sid: String, expected: Seq[Double]): Unit =
    assert(dates.map(d => results((field, sid, d))) == expected,
      s"$field/$sid: got ${dates.map(d => results((field, sid, d)))}")

  test("Signal: short above 10 at the open (test_backtest.py:1135-1149)") {
    check("Signal", "FI12345", Seq(0.0, -1.0, 0.0))
    check("Signal", "FI23456", Seq(0.0, 0.0, -1.0))
  }

  test("Weight: fixed 0.25 (test_backtest.py:1151-1165)") {
    check("Weight", "FI12345", Seq(0.0, -0.25, 0.0))
    check("Weight", "FI23456", Seq(0.0, 0.0, -0.25))
  }

  test("NetExposure: same-day entry, no lag (test_backtest.py:1183-1197)") {
    check("NetExposure", "FI12345", Seq(0.0, -0.25, 0.0))
    check("NetExposure", "FI23456", Seq(0.0, 0.0, -0.25))
  }

  test("Turnover: 2× positions when closed daily (test_backtest.py:1231-1245)") {
    check("Turnover", "FI12345", Seq(0.0, 0.5, 0.0))
    check("Turnover", "FI23456", Seq(0.0, 0.0, 0.5))
  }

  test("TotalHoldings (test_backtest.py:1215-1229)") {
    check("TotalHoldings", "FI12345", Seq(0.0, 1.0, 0.0))
    check("TotalHoldings", "FI23456", Seq(0.0, 0.0, 1.0))
  }

  test("Return: 09:30→15:30 move × short position (test_backtest.py:1304-1320)") {
    check("Return", "FI12345", Seq(0.0, -0.13167, 0.0))
    check("Return", "FI23456", Seq(0.0, 0.0, -0.0205224))
  }

  test("POSITIONS_CLOSED_DAILY golden: turnover 2×|position| and slippage " +
    "(test_positions_closed_daily.py:34-247)") {
    object WithSlippage extends Strategy {
      val code = "short-above-10-slip"
      override def positionsClosedDaily = true
      override def slippageBps = 10.0
      def pricesToSignals(prices: DataFrame): DataFrame =
        ShortAbove10Intraday.pricesToSignals(prices)
      override def signalsToTargetWeights(panel: DataFrame): DataFrame =
        ShortAbove10Intraday.signalsToTargetWeights(panel)
      override def targetWeightsToPositions(panel: DataFrame): DataFrame =
        ShortAbove10Intraday.targetWeightsToPositions(panel)
      override def positionsToGrossReturns(panel: DataFrame): DataFrame =
        ShortAbove10Intraday.positionsToGrossReturns(panel)
    }
    val out = Backtest.run(WithSlippage, prices).collect()
      .map(r => (r.getAs[String]("field"), r.getAs[String]("sid"),
        r.getAs[java.sql.Date]("date").toString) ->
        r7(Option(r.getAs[java.lang.Double]("value")).map(_.toDouble).getOrElse(Double.NaN)))
      .toMap
    def s(f: String, sid: String) = dates.map(d => out((f, sid, d)))
    assert(s("Turnover", "FI12345") == Seq(0.0, 0.5, 0.0))
    assert(s("Slippage", "FI12345") == Seq(0.0, 0.0005, 0.0)) // 10 bps × 0.5
    assert(s("Slippage", "FI23456") == Seq(0.0, 0.0, 0.0005))
  }

  test("positions NOT closed daily: turnover is |diff|, in and out " +
    "(test_positions_closed_daily.py:248-461)") {
    object NotClosedDaily extends Strategy {
      val code = "short-above-10-open"
      override def slippageBps = 10.0
      def pricesToSignals(prices: DataFrame): DataFrame =
        ShortAbove10Intraday.pricesToSignals(prices)
      override def signalsToTargetWeights(panel: DataFrame): DataFrame =
        ShortAbove10Intraday.signalsToTargetWeights(panel)
      override def targetWeightsToPositions(panel: DataFrame): DataFrame =
        ShortAbove10Intraday.targetWeightsToPositions(panel)
      override def positionsToGrossReturns(panel: DataFrame): DataFrame =
        ShortAbove10Intraday.positionsToGrossReturns(panel)
    }
    val out = Backtest.run(NotClosedDaily, prices).collect()
      .map(r => (r.getAs[String]("field"), r.getAs[String]("sid"),
        r.getAs[java.sql.Date]("date").toString) ->
        r7(Option(r.getAs[java.lang.Double]("value")).map(_.toDouble).getOrElse(Double.NaN)))
      .toMap
    def s(f: String, sid: String) = dates.map(d => out((f, sid, d)))
    // first bar: pandas diff yields NaN → null here
    assert(s("Turnover", "FI12345").drop(1) == Seq(0.25, 0.25))
    assert(s("Turnover", "FI12345").head.isNaN)
    assert(s("Turnover", "FI23456").drop(1) == Seq(0.0, 0.25))
    assert(s("Slippage", "FI12345") == Seq(0.0, 0.00025, 0.00025))
    assert(s("Slippage", "FI23456") == Seq(0.0, 0.0, 0.00025))
  }
}
