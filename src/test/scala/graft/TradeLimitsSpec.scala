package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.pipeline.Strategy
import graft.trade.Trade

/** D17 trade-side position limits, mirroring the reference golden test
  * (_tests/test_limit_position_sizes.py:1436-1583): BuyBelow10ShortAbove10
  * with per-sid long/short max-share panels; the signal-date slice clamps
  * target quantities before order stubs.
  */
class TradeLimitsSpec extends SparkSpec {
  import spark.implicits._

  // fixture: test_limit_position_sizes.py:1471-1492 ("Open" → close)
  private lazy val prices: DataFrame = Seq(
    ("FI12345", "2018-05-01", 9.00),
    ("FI12345", "2018-05-02", 11.00),
    ("FI12345", "2018-05-03", 10.50),
    ("FI23456", "2018-05-01", 9.89),
    ("FI23456", "2018-05-02", 11.00),
    ("FI23456", "2018-05-03", 8.50))
    .toDF("sid", "date", "close")
    .withColumn("date", to_date($"date"))

  // limits: test_limit_position_sizes.py:1453-1468
  private lazy val maxShares: DataFrame = Seq(
    ("FI12345", "2018-05-01", 1200.0),
    ("FI12345", "2018-05-02", 1200.0),
    ("FI12345", "2018-05-03", 1350.0),
    ("FI23456", "2018-05-01", 2300.0),
    ("FI23456", "2018-05-02", 2300.0),
    ("FI23456", "2018-05-03", 2199.0))
    .toDF("sid", "date", "max_quantity")
    .withColumn("date", to_date($"date"))

  object LongShort10 extends Strategy {
    val code = "long-short-10"
    def pricesToSignals(prices: DataFrame): DataFrame =
      prices.withColumn("signal",
        when(col("close") <= 10, 1).otherwise(-1))
    override def limitPositionSizes(
        prices: DataFrame): (Option[DataFrame], Option[DataFrame]) =
      (Some(maxShares), Some(maxShares))
  }

  private def runTrade(strategy: Strategy): Map[(String, String), (String, Double)] = {
    val master = Seq(("FI12345", "USD", "STK", 1.0, 1.0), ("FI23456", "USD", "STK", 1.0, 1.0))
      .toDF("sid", "currency", "secType", "priceMagnifier", "multiplier")
    val allocations = Seq(("U123", 1.0)).toDF("account", "allocation")
    val balances = Seq(("U123", "USD", 60000.0)).toDF("account", "currency", "netLiquidation")
    val rates = Seq(("USD", "USD", 1.0)).toDF("baseCurrency", "quoteCurrency", "rate")
    val positions = Seq.empty[(String, String, Double)].toDF("sid", "account", "quantity")
    val openOrders = Seq.empty[(String, String, Double, String, String)]
      .toDF("sid", "account", "remaining", "action", "orderRef")
    Trade.run(strategy, prices, master, allocations, balances, rates,
      positions, openOrders, signalDate = "2018-05-03")
      .collect()
      .map { r: Row =>
        (r.getString(r.fieldIndex("sid")), r.getString(r.fieldIndex("account"))) ->
          ((r.getString(r.fieldIndex("action")), r.getLong(r.fieldIndex("totalQuantity")).toDouble))
      }.toMap
  }

  test("target quantities clamp to the signal-date limits " +
    "(test_limit_position_sizes.py:1547-1583)") {
    val orders = runTrade(LongShort10)
    // unclamped: -0.5*60000/10.50 → -2857 ; +0.5*60000/8.50 → +3529
    assert(orders(("FI12345", "U123")) == (("SELL", 1350.0)))
    assert(orders(("FI23456", "U123")) == (("BUY", 2199.0)))
  }

  test("no limits → unclamped quantities (test_limit_position_sizes.py:1303)") {
    val noLimits = new Strategy {
      val code = "long-short-10"
      def pricesToSignals(prices: DataFrame): DataFrame =
        prices.withColumn("signal",
          when(col("close") <= 10, 1).otherwise(-1))
    }
    val orders = runTrade(noLimits)
    assert(orders(("FI12345", "U123")) == (("SELL", 2857.0)))
    assert(orders(("FI23456", "U123")) == (("BUY", 3529.0)))
  }

  test("short-only limits leave longs unclamped " +
    "(test_limit_position_sizes.py:1584)") {
    val shortOnly = new Strategy {
      val code = "long-short-10"
      def pricesToSignals(prices: DataFrame): DataFrame =
        prices.withColumn("signal",
          when(col("close") <= 10, 1).otherwise(-1))
      override def limitPositionSizes(
          prices: DataFrame): (Option[DataFrame], Option[DataFrame]) =
        (None, Some(maxShares))
    }
    val orders = runTrade(shortOnly)
    assert(orders(("FI12345", "U123")) == (("SELL", 1350.0)))
    assert(orders(("FI23456", "U123")) == (("BUY", 3529.0)))
  }
}
