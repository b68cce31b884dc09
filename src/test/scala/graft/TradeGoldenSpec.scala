package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.alloc.Weights
import graft.panel.Panel.Keys
import graft.pipeline.Strategy
import graft.trade.Trade

/** The reference's trade() golden tests reproduced value-exact:
  * basic long-only (_tests/test_trade.py:26-151), no-orders
  * (test_trade.py:152), and multi-account with existing positions
  * (test_trade.py:1761-1948), plus the ALLOW_REBALANCE=False gate
  * over the same fixture (base.py:1782-1786, test_allow_rebalance.py).
  */
class TradeGoldenSpec extends SparkSpec {
  import spark.implicits._

  private lazy val prices: DataFrame = Seq(
    // test_trade.py:49-62
    ("FI12345", "2018-05-01", 9.00), ("FI12345", "2018-05-02", 11.00),
    ("FI12345", "2018-05-03", 10.50),
    ("FI23456", "2018-05-01", 9.89), ("FI23456", "2018-05-02", 11.00),
    ("FI23456", "2018-05-03", 8.50))
    .toDF("sid", "date", "close").withColumn("date", to_date($"date"))

  private lazy val master: DataFrame =
    Seq(("FI12345", "USD", "STK", 1.0, 1.0), ("FI23456", "USD", "STK", 1.0, 1.0))
      .toDF("sid", "currency", "secType", "priceMagnifier", "multiplier")

  private lazy val rates: DataFrame =
    Seq(("USD", "USD", 1.0)).toDF("baseCurrency", "quoteCurrency", "rate")

  private lazy val noPositions =
    Seq.empty[(String, String, Double)].toDF("sid", "account", "quantity")
  private lazy val noOrders =
    Seq.empty[(String, String, Double, String, String)]
      .toDF("sid", "account", "remaining", "action", "orderRef")

  private def ordersOf(df: DataFrame): Map[(String, String), (String, Double)] =
    df.collect().map { r: Row =>
      (r.getString(r.fieldIndex("sid")), r.getString(r.fieldIndex("account"))) ->
        ((r.getString(r.fieldIndex("action")), r.getLong(r.fieldIndex("totalQuantity")).toDouble))
    }.toMap

  object BuyBelow10 extends Strategy {
    val code = "buy-below-10"
    def pricesToSignals(prices: DataFrame): DataFrame =
      prices.withColumn("signal", (col("close") < 10).cast("int"))
  }

  test("basic long-only: default methods end-to-end (test_trade.py:26-151)") {
    val allocations = Seq(("U123", 1.0)).toDF("account", "allocation")
    val balances = Seq(("U123", "USD", 55000.0))
      .toDF("account", "currency", "netLiquidation")
    val orders = Trade.run(BuyBelow10, prices, master, allocations, balances,
      rates, noPositions, noOrders, signalDate = "2018-05-03")
    assert(orders.columns.toSet ==
      Set("sid", "account", "action", "orderRef", "totalQuantity", "orderType", "tif"))
    // 1.0 weight × 1.0 allocation × 55K / 8.50 = 6471 (test_trade.py:131)
    assert(ordersOf(orders) == Map(("FI23456", "U123") -> (("BUY", 6471.0))))
    val decorated = orders.head
    assert(decorated.getAs[String]("orderType") == "MKT")
    assert(decorated.getAs[String]("tif") == "DAY")
    assert(decorated.getAs[String]("orderRef") == "buy-below-10")
  }

  test("no orders: zero signals → empty orders table (test_trade.py:152)") {
    object BuyBelow1 extends Strategy {
      val code = "buy-below-1"
      def pricesToSignals(prices: DataFrame): DataFrame =
        prices.withColumn("signal", (col("close") < 1).cast("int"))
    }
    val allocations = Seq(("U123", 1.0)).toDF("account", "allocation")
    val balances = Seq(("U123", "USD", 55000.0))
      .toDF("account", "currency", "netLiquidation")
    val orders = Trade.run(BuyBelow1, prices, master, allocations, balances,
      rates, noPositions, noOrders, signalDate = "2018-05-03")
    assert(orders.count() == 0)
  }

  object BuyBelow10Fixed extends Strategy {
    val code = "buy-below-10"
    def pricesToSignals(prices: DataFrame): DataFrame =
      prices.withColumn("signal", (col("close") < 10).cast("int"))
    override def signalsToTargetWeights(panel: DataFrame): DataFrame =
      panel.withColumn("weight", Weights.fixedWeights(col("signal"), 0.5))
  }

  // fixture test_trade.py:1832-1876
  private lazy val fourAccounts =
    Seq(("U123", 0.5), ("DU234", 0.3), ("U999", 0.6), ("DU111", 0.2))
      .toDF("account", "allocation")
  private lazy val fourBalances = Seq(
    ("U123", "USD", 85000.0), ("DU234", "USD", 450000.0),
    ("U999", "USD", 56000.0), ("DU111", "USD", 150000.0))
    .toDF("account", "currency", "netLiquidation")
  private lazy val heldPositions = Seq(
    ("FI23456", "U123", 400.0),
    ("FI23456", "DU234", 7941.0), // exactly the target → no order
    ("FI12345", "DU234", 300.0), // signal gone → close position
    ("FI23456", "DU111", -300.0))
    .toDF("sid", "account", "quantity")

  test("existing positions across accounts (test_trade.py:1761-1948)") {
    val orders = Trade.run(BuyBelow10Fixed, prices, master, fourAccounts,
      fourBalances, rates, heldPositions, noOrders, signalDate = "2018-05-03")
    assert(ordersOf(orders) == Map(
      ("FI12345", "DU234") -> (("SELL", 300.0)), // close open position
      ("FI23456", "U123") -> (("BUY", 2100.0)), // 0.5×0.5×85K/8.50 − 400
      ("FI23456", "U999") -> (("BUY", 1976.0)), // 0.6×0.5×56K/8.50
      ("FI23456", "DU111") -> (("BUY", 2065.0)))) // 0.2×0.5×150K/8.50 + 300
  }

  test("ALLOW_REBALANCE=0.25: same-direction changes below the threshold " +
    "are suppressed (test_allow_rebalance.py:332-514)") {
    val pricesMR = Seq(
      ("FI12345", "2018-05-01", 9.00), ("FI12345", "2018-05-02", 11.00),
      ("FI12345", "2018-05-03", 9.50),
      ("FI23456", "2018-05-01", 8.90), ("FI23456", "2018-05-02", 12.00),
      ("FI23456", "2018-05-03", 10.50))
      .toDF("sid", "date", "close").withColumn("date", to_date($"date"))
    val allocations = Seq(("U123", 0.5), ("DU234", 0.3), ("U999", 0.5))
      .toDF("account", "allocation")
    val balances = Seq(
      ("U123", "USD", 85000.0), ("DU234", "USD", 450000.0), ("U999", "USD", 200000.0))
      .toDF("account", "currency", "netLiquidation")
    val positions = Seq(
      ("FI12345", "U123", 2000.0), // |237/2000| < 0.25 → suppressed
      ("FI12345", "U999", 3000.0), // |2263/3000| ≥ 0.25 → rebalanced
      ("FI12345", "DU234", -4.0), // switches sides → always allowed
      ("FI23456", "DU234", -7.0)) // closes (target 0) → always allowed
      .toDF("sid", "account", "quantity")
    val orders = Trade.run(BuyBelow10Fixed, pricesMR, master, allocations,
      balances, rates, positions, noOrders, signalDate = "2018-05-03",
      rebalance = Trade.RebalanceThreshold(0.25))
    assert(ordersOf(orders) == Map(
      ("FI12345", "DU234") -> (("BUY", 7109.0)), // 0.3×0.5×450K/9.50 + 4
      ("FI12345", "U999") -> (("BUY", 2263.0)), // 0.5×0.5×200K/9.50 − 3000
      ("FI23456", "DU234") -> (("BUY", 7.0)))) // close the short
  }

  test("reindex_like_orders decorates orders with prior closes as limit " +
    "prices (test_orders.py:362-511)") {
    val pricesLS = Seq(
      ("FI12345", "2018-05-01", 9.00), ("FI12345", "2018-05-02", 11.00),
      ("FI12345", "2018-05-03", 10.50),
      ("FI23456", "2018-05-01", 9.89), ("FI23456", "2018-05-02", 11.25),
      ("FI23456", "2018-05-03", 8.50))
      .toDF("sid", "date", "close").withColumn("date", to_date($"date"))
    object LongShort10 extends Strategy {
      val code = "long-short-10"
      def pricesToSignals(prices: DataFrame): DataFrame =
        prices.withColumn("signal",
          when(col("close") <= 10, 1).otherwise(-1))
      override def signalsToTargetWeights(panel: DataFrame): DataFrame =
        panel.withColumn("weight", Weights.fixedWeights(col("signal"), 0.25))
      override def orderStubsToOrders(stubs: DataFrame, prices: DataFrame): DataFrame = {
        implicit val k: Keys = keys
        val priorCloses = prices.withColumn("prior_close",
          graft.panel.Panel.lagBySid(col("close")))
        Trade.reindexLikeOrders(stubs, priorCloses, "prior_close", "2018-05-03")
          .withColumn("exchange", lit("SMART"))
          .withColumn("orderType", lit("LMT"))
          .withColumnRenamed("prior_close", "lmtPrice")
          .withColumn("tif", lit("Day"))
      }
    }
    val allocations = Seq(("U123", 0.5)).toDF("account", "allocation")
    val balances = Seq(("U123", "USD", 85000.0))
      .toDF("account", "currency", "netLiquidation")
    val orders = Trade.run(LongShort10, pricesLS, master, allocations, balances,
      rates, noPositions, noOrders, signalDate = "2018-05-03")
    val rows = orders.collect().map { r: Row =>
      r.getString(r.fieldIndex("sid")) ->
        ((r.getString(r.fieldIndex("action")), r.getLong(r.fieldIndex("totalQuantity")).toDouble,
          r.getDouble(r.fieldIndex("lmtPrice")), r.getString(r.fieldIndex("orderType"))))
    }.toMap
    // −0.25×0.5×85K/10.50 → SELL 1012 @ prior close 11.00;
    // +0.25×0.5×85K/8.50 → BUY 1250 @ prior close 11.25
    assert(rows("FI12345") == (("SELL", 1012.0, 11.0, "LMT")))
    assert(rows("FI23456") == (("BUY", 1250.0, 11.25, "LMT")))
  }

  test("continuous intraday: review date with time slices the latest bar " +
    "before it (test_trade.py:730-871)") {
    val contPrices = Seq(
      ("FI12345", "2018-05-01", "10:00:00", 9.6), ("FI12345", "2018-05-01", "11:00:00", 10.45),
      ("FI12345", "2018-05-01", "12:00:00", 10.12), ("FI12345", "2018-05-02", "10:00:00", 15.45),
      ("FI12345", "2018-05-02", "11:00:00", 8.67), ("FI12345", "2018-05-02", "12:00:00", 12.30),
      ("FI23456", "2018-05-01", "10:00:00", 10.56), ("FI23456", "2018-05-01", "11:00:00", 12.01),
      ("FI23456", "2018-05-01", "12:00:00", 10.50), ("FI23456", "2018-05-02", "10:00:00", 9.80),
      ("FI23456", "2018-05-02", "11:00:00", 13.40), ("FI23456", "2018-05-02", "12:00:00", 7.50))
      .toDF("sid", "date", "time", "close").withColumn("date", to_date($"date"))
    object ContIntraday extends Strategy {
      val code = "c-intraday-pivot-10"
      override def keys: graft.panel.Panel.Keys =
        graft.panel.Panel.Keys(sid = "sid", order = Seq("date", "time"), dateCol = "date")
      def pricesToSignals(prices: DataFrame): DataFrame =
        prices.withColumn("signal", when(col("close") <= 10, 1).otherwise(-1))
    }
    val allocations = Seq(("U123", 1.0)).toDF("account", "allocation")
    val balances = Seq(("U123", "USD", 60000.0))
      .toDF("account", "currency", "netLiquidation")
    val (sd, tt) = Trade.resolveSignalDateTime(
      "America/New_York", reviewDate = Some("2018-05-02 12:05:00"))
    assert((sd, tt) == (("2018-05-02", "12:05:00")))
    val orders = Trade.run(ContIntraday, contPrices, master, allocations,
      balances, rates, noPositions, noOrders,
      signalDate = sd, tradeTime = Some(tt))
    // signal time = 12:00 (latest bar < 12:05): FI12345 12.30 → short,
    // FI23456 7.50 → long; equal weights ±0.5 at that slot
    assert(ordersOf(orders) == Map(
      ("FI12345", "U123") -> (("SELL", 2439.0)), // 0.5×60K/12.30
      ("FI23456", "U123") -> (("BUY", 4000.0)))) // 0.5×60K/7.50
  }

  test("short-only once-a-day intraday: signals from the 09:30 slice, " +
    "contract values from the day's last bar (test_trade.py:581-729)") {
    val intradayPrices = Seq(
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
    object ShortAbove10 extends Strategy {
      val code = "short-above-10"
      def pricesToSignals(prices: DataFrame): DataFrame =
        prices.groupBy("sid", "date")
          .agg(max(when(col("time") === "09:30:00", col("open"))).as("open_0930"))
          .withColumn("signal", -(col("open_0930") > 10).cast("int"))
      override def signalsToTargetWeights(panel: DataFrame): DataFrame =
        panel.withColumn("weight", Weights.fixedWeights(col("signal"), 0.25))
    }
    val allocations = Seq(("U123", 1.0)).toDF("account", "allocation")
    val balances = Seq(("U123", "USD", 60000.0))
      .toDF("account", "currency", "netLiquidation")
    val orders = Trade.run(ShortAbove10, intradayPrices, master, allocations,
      balances, rates, noPositions, noOrders, signalDate = "2018-05-03")
    // −0.25 × 60K ÷ 14.50 (the 15:30 close, NOT the 09:30 signal bar)
    assert(ordersOf(orders) == Map(("FI23456", "U123") -> (("SELL", 1034.0))))
  }

  test("CONTRACT_VALUE_REFERENCE_FIELD: alternate price field, and the " +
    "no-candidate error (test_trade.py:872-1123)") {
    val auctionPrices = prices.withColumnRenamed("close", "auction_close")
    def strat(field: Option[String]) = new Strategy {
      val code = "buy-below-10"
      override def contractValueReferenceField: Option[String] = field
      def pricesToSignals(prices: DataFrame): DataFrame =
        prices.withColumn("signal", (col("auction_close") < 10).cast("int"))
    }
    val allocations = Seq(("U123", 1.0)).toDF("account", "allocation")
    val balances = Seq(("U123", "USD", 55000.0))
      .toDF("account", "currency", "netLiquidation")
    // explicit field: same quantities as the basic golden (6471)
    val orders = Trade.run(strat(Some("auction_close")), auctionPrices, master,
      allocations, balances, rates, noPositions, noOrders, signalDate = "2018-05-03")
    assert(ordersOf(orders) == Map(("FI23456", "U123") -> (("BUY", 6471.0))))
    // no candidate field and no override → the reference's error
    val e = intercept[IllegalArgumentException] {
      Trade.run(strat(None), auctionPrices, master, allocations, balances,
        rates, noPositions, noOrders, signalDate = "2018-05-03")
    }
    assert(e.getMessage.startsWith(
      "Can't identify a suitable field to use to calculate contract values"))
  }

  test("FX: contract value ≡ 1 and conversion uses the Symbol's base " +
    "currency, not the Currency field (test_trade.py:2974-3125)") {
    val fxPrices = Seq(
      ("FI12345", "2018-05-01", 1.20), ("FI12345", "2018-05-02", 1.10),
      ("FI12345", "2018-05-03", 1.25),
      ("FI23456", "2018-05-01", 100.89), ("FI23456", "2018-05-02", 112.0),
      ("FI23456", "2018-05-03", 118.50))
      .toDF("sid", "date", "close").withColumn("date", to_date($"date"))
    // EUR.USD quoted in USD; USD.JPY quoted in JPY — conversion must
    // follow the Symbol (EUR / USD), not the Currency (USD / JPY)
    val fxMaster = Seq(
      ("FI12345", "USD", "CASH", 1.0, 1.0, "EUR"),
      ("FI23456", "JPY", "CASH", 1.0, 1.0, "USD"))
      .toDF("sid", "currency", "secType", "priceMagnifier", "multiplier", "symbol")
    object FxLongShort extends Strategy {
      val code = "fx-long-short-10"
      def pricesToSignals(prices: DataFrame): DataFrame =
        prices.withColumn("signal", when(col("close") <= 10, 1).otherwise(-1))
      override def signalsToTargetWeights(panel: DataFrame): DataFrame =
        panel.withColumn("weight", Weights.fixedWeights(col("signal"), 0.25))
    }
    val allocations = Seq(("U123", 0.5)).toDF("account", "allocation")
    val balances = Seq(("U123", "USD", 85000.0))
      .toDF("account", "currency", "netLiquidation")
    val fxRates = Seq(("USD", "USD", 1.0), ("USD", "EUR", 0.7))
      .toDF("baseCurrency", "quoteCurrency", "rate")
    val orders = Trade.run(FxLongShort, fxPrices, fxMaster, allocations,
      balances, fxRates, noPositions, noOrders, signalDate = "2018-05-03")
    assert(ordersOf(orders) == Map(
      ("FI12345", "U123") -> (("BUY", 7437.0)), // 0.5×0.25×85K × 0.7 ÷ 1
      ("FI23456", "U123") -> (("SELL", 10625.0)))) // 0.5×0.25×85K × 1 ÷ 1
  }

  test("price magnifier and multiplier scale target quantities " +
    "(test_trade.py:2632-2800)") {
    val futPrices = Seq(
      ("FI12345", "2018-05-03", 10.50), ("FI23456", "2018-05-03", 8.50),
      ("FI34567", "2018-05-03", 11.50))
      .toDF("sid", "date", "close").withColumn("date", to_date($"date"))
    val futMaster = Seq(
      ("FI12345", "USD", "FUT", 1.0, 20.0), // cv = 10.50×20
      ("FI23456", "USD", "FUT", 1.0, 50.0), // cv = 8.50×50
      ("FI34567", "USD", "FUT", 10.0, 1.0)) // cv = 11.50/10
      .toDF("sid", "currency", "secType", "priceMagnifier", "multiplier")
    object FutLongShort extends Strategy {
      val code = "long-short-10"
      def pricesToSignals(prices: DataFrame): DataFrame =
        prices.withColumn("signal", when(col("close") <= 10, 1).otherwise(-1))
      override def signalsToTargetWeights(panel: DataFrame): DataFrame =
        panel.withColumn("weight", Weights.fixedWeights(col("signal"), 0.25))
    }
    val allocations = Seq(("U123", 0.5)).toDF("account", "allocation")
    val balances = Seq(("U123", "USD", 85000.0))
      .toDF("account", "currency", "netLiquidation")
    val orders = Trade.run(FutLongShort, futPrices, futMaster, allocations,
      balances, rates, noPositions, noOrders, signalDate = "2018-05-03")
    assert(ordersOf(orders) == Map(
      ("FI12345", "U123") -> (("SELL", 51.0)), // 10625 / 210
      ("FI23456", "U123") -> (("BUY", 25.0)), // 10625 / 425
      ("FI34567", "U123") -> (("SELL", 9239.0)))) // 10625 / 1.15
  }

  test("ALLOW_REBALANCE=False suppresses same-direction adjustments " +
    "(base.py:1782-1786, test_allow_rebalance.py:167)") {
    val orders = Trade.run(BuyBelow10Fixed, prices, master, fourAccounts,
      fourBalances, rates, heldPositions, noOrders, signalDate = "2018-05-03",
      rebalance = Trade.NoRebalance)
    // U123's long→long top-up is suppressed; closing FI12345 (target 0) and
    // DU111's short→long flip are NOT rebalances and go through unchanged
    assert(ordersOf(orders) == Map(
      ("FI12345", "DU234") -> (("SELL", 300.0)),
      ("FI23456", "U999") -> (("BUY", 1976.0)),
      ("FI23456", "DU111") -> (("BUY", 2065.0))))
  }

  // ---- D20 CALENDAR: exchange-calendar signal-date resolution ----

  object BuyBelow1OnTsej extends Strategy {
    val code = "buy-below-1"
    override def calendar: Option[String] = Some("TSEJ")
    def pricesToSignals(prices: DataFrame): DataFrame =
      prices.withColumn("signal", (col("close") < 1).cast("int"))
  }

  // test_trade_date_validation.py:1364-1381 fixture: FI23456 closes at
  // 0.99 on 2018-05-02 — the only below-1 close in the panel
  private lazy val calPrices: DataFrame = Seq(
    ("FI12345", "2018-05-01", 9.00), ("FI12345", "2018-05-02", 11.00),
    ("FI12345", "2018-05-03", 10.50),
    ("FI23456", "2018-05-01", 9.89), ("FI23456", "2018-05-02", 0.99),
    ("FI23456", "2018-05-03", 8.50))
    .toDF("sid", "date", "close").withColumn("date", to_date($"date"))

  test("CALENDAR open: signal date is today in the CALENDAR timezone " +
    "(base.py:751-753, test_trade_date_validation.py:1344)") {
    val calendars = Seq(("TSEJ", "open", "2018-05-02T09:00:00", "Japan"))
      .toDF("exchange", "status", "since", "timezone")
    // 2018-05-02 10:40 in Japan = 2018-05-01 21:40 in New York — the
    // strategy timezone alone would pick the WRONG date (05-01)
    val now = () => java.time.Instant.parse("2018-05-02T01:40:00Z")
    val (signalDate, _) = graft.trade.Calendars.resolveForStrategy(
      BuyBelow1OnTsej, "America/New_York", Some(calendars), None, now)
    assert(signalDate == "2018-05-02")
    val allocations = Seq(("U123", 1.0)).toDF("account", "allocation")
    val balances = Seq(("U123", "USD", 55000.0))
      .toDF("account", "currency", "netLiquidation")
    val orders = Trade.run(BuyBelow1OnTsej, calPrices, master, allocations,
      balances, rates, noPositions, noOrders, signalDate = signalDate)
    // 1.0 × 55K / 0.99 = 55556 (test_trade_date_validation.py:1480-1489)
    assert(ordersOf(orders) == Map(("FI23456", "U123") -> (("BUY", 55556.0))))
  }

  test("CALENDAR closed: signal date is the exchange's last close " +
    "(base.py:745-750, test_trade_date_validation.py:1489)") {
    val calendars = Seq(("TSEJ", "closed", "2018-05-01T14:00:00", "Japan"))
      .toDF("exchange", "status", "since", "timezone")
    val now = () => java.time.Instant.parse("2018-05-02T01:40:00Z")
    val (signalDate, tradeTime) = graft.trade.Calendars.resolveForStrategy(
      BuyBelow1OnTsej, "America/New_York", Some(calendars), None, now)
    assert(signalDate == "2018-05-01" && tradeTime == "14:00:00")
    // no below-1 close on 05-01 → no orders
    val allocations = Seq(("U123", 1.0)).toDF("account", "allocation")
    val balances = Seq(("U123", "USD", 55000.0))
      .toDF("account", "currency", "netLiquidation")
    val orders = Trade.run(BuyBelow1OnTsej, calPrices, master, allocations,
      balances, rates, noPositions, noOrders, signalDate = signalDate)
    assert(orders.isEmpty)
  }

  test("review date beats CALENDAR; missing statuses raise (base.py:738-744)") {
    val calendars = Seq(("TSEJ", "closed", "2018-05-01T14:00:00", "Japan"))
      .toDF("exchange", "status", "since", "timezone")
    assert(graft.trade.Calendars.resolveForStrategy(
      BuyBelow1OnTsej, "America/New_York", Some(calendars),
      reviewDate = Some("2018-05-03")) == (("2018-05-03", "23:59:59")))
    val err = intercept[IllegalArgumentException] {
      graft.trade.Calendars.resolveForStrategy(
        BuyBelow1OnTsej, "America/New_York", calendars = None)
    }
    assert(err.getMessage.contains("no calendar statuses"))
    val err2 = intercept[IllegalArgumentException] {
      graft.trade.Calendars.statusFor(calendars, "XNYS")
    }
    assert(err2.getMessage.contains("XNYS"))
  }

  test("runLive end-to-end: calendar resolution + freshness + orders " +
    "in one call (base.py:1572-1806 with 738-784)") {
    val calendars = Seq(("TSEJ", "open", "2018-05-02T09:00:00", "Japan"))
      .toDF("exchange", "status", "since", "timezone")
    val allocations = Seq(("U123", 1.0)).toDF("account", "allocation")
    val balances = Seq(("U123", "USD", 55000.0))
      .toDF("account", "currency", "netLiquidation")
    val now = () => java.time.Instant.parse("2018-05-02T01:40:00Z")
    val orders = Trade.runLive(BuyBelow1OnTsej, "America/New_York", calPrices,
      master, allocations, balances, rates, noPositions, noOrders,
      calendars = Some(calendars), now = now)
    assert(ordersOf(orders) == Map(("FI23456", "U123") -> (("BUY", 55556.0))))

    // stale prices: "now" two days past the panel, open calendar → the
    // resolved date is missing and the error names the max date (no
    // one-day hint — the gap is 2 days)
    val later = () => java.time.Instant.parse("2018-05-05T01:40:00Z")
    val err = intercept[IllegalArgumentException] {
      Trade.runLive(BuyBelow1OnTsej, "America/New_York", calPrices,
        master, allocations, balances, rates, noPositions, noOrders,
        calendars = Some(calendars), now = later)
    }
    assert(err.getMessage.contains("max date is 2018-05-03"))
  }

  test("staleness hint: a one-day gap without CALENDAR suggests setting it " +
    "(base.py:779-784, test_trade_date_validation.py:1338)") {
    implicit val k: Keys = graft.panel.Panel.eod
    val hint = "try setting CALENDAR"
    val oneDay = intercept[IllegalArgumentException] {
      Trade.requireFresh(calPrices, "2018-05-04")
    }
    assert(oneDay.getMessage.contains("max date is 2018-05-03") &&
      oneDay.getMessage.contains(hint))
    // calendar set, or a gap of more than one day → no hint
    val withCal = intercept[IllegalArgumentException] {
      Trade.requireFresh(calPrices, "2018-05-04", calendarSet = true)
    }
    assert(!withCal.getMessage.contains(hint))
    val twoDays = intercept[IllegalArgumentException] {
      Trade.requireFresh(calPrices, "2018-05-05")
    }
    assert(!twoDays.getMessage.contains(hint))
  }
}
