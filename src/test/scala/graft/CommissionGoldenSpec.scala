package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.costs.{CommissionModel, PercentageCommission}
import graft.pipeline.{Backtest, Strategy}

/** The reference's EOD commission-with-NLV golden test
  * (_tests/test_commissions.py:487-726): 1 bps percentage commission with
  * a 500 min commission against NLV 50,000 — the floor binds at
  * 500/50000 = 0.01 whenever any turnover occurs.
  */
class CommissionGoldenSpec extends SparkSpec {
  import spark.implicits._

  object BuyBelow10ShortAbove10 extends Strategy {
    val code = "long-short"
    override def commissionModel: Option[CommissionModel] = Some(
      PercentageCommission(brokerCommissionRate = 0.0001, minCommission = 500))
    def pricesToSignals(prices: DataFrame): DataFrame =
      prices.withColumn("signal", when(col("close") <= 10, 1).otherwise(-1))
  }

  private lazy val prices = Seq(
    ("FI12345", "2018-05-01", 9.00), ("FI12345", "2018-05-02", 11.00),
    ("FI12345", "2018-05-03", 10.50), ("FI12345", "2018-05-04", 9.99),
    ("FI23456", "2018-05-01", 9.89), ("FI23456", "2018-05-02", 11.00),
    ("FI23456", "2018-05-03", 8.50), ("FI23456", "2018-05-04", 10.50))
    .toDF("sid", "date", "close")
    .withColumn("date", to_date($"date"))

  private lazy val results: Map[(String, String, String), Option[Double]] =
    Backtest.run(BuyBelow10ShortAbove10, prices,
      cfg = Backtest.Config(nlv = Some(50000.0)))
      .collect()
      .map { r =>
        (r.getAs[String]("field"), r.getAs[String]("sid"),
          r.getAs[java.sql.Date]("date").toString) ->
          Option(r.getAs[java.lang.Double]("value")).map(v => r7(v.toDouble))
      }.toMap

  private val dates = Seq("2018-05-01", "2018-05-02", "2018-05-03", "2018-05-04")

  private def check(field: String, sid: String, expected: Seq[Option[Double]]): Unit =
    assert(dates.map(d => results((field, sid, d))) == expected,
      s"$field/$sid: got ${dates.map(d => results((field, sid, d)))}")

  test("per-security NLV from the master drives the min-commission floor " +
    "(base.py:1856-1860)") {
    // same model for both sids; NLV differs per security → floors differ
    object Floored extends Strategy {
      val code = "floored"
      override def commissionModel: Option[CommissionModel] = Some(
        PercentageCommission(brokerCommissionRate = 0.0001, minCommission = 500))
      def pricesToSignals(prices: DataFrame): DataFrame =
        prices.withColumn("signal", when(col("close") <= 10, 1).otherwise(-1))
    }
    val master = Seq(
      ("FI12345", "STK", 1.0, 1.0, 50000.0), // floor 500/50000 = 0.01
      ("FI23456", "STK", 1.0, 1.0, 250000.0)) // floor 500/250000 = 0.002
      .toDF("sid", "secType", "priceMagnifier", "multiplier", "nlv")
    val out = Backtest.run(Floored, prices, master = Some(master))
      .where($"field" === "Commission" && $"date" === "2018-05-02")
      .collect()
      .map(r => r.getAs[String]("sid") -> r7(r.getAs[Double]("value"))).toMap
    assert(out("FI12345") == 0.01)
    assert(out("FI23456") == 0.002)
  }

  test("futures commissions scale with multiplier and price magnifier " +
    "(test_commissions.py:2657-3052)") {
    val futPrices = Seq(
      ("FI12345", "2018-05-01", 900.0), ("FI12345", "2018-05-02", 1100.0),
      ("FI12345", "2018-05-03", 1050.0), ("FI12345", "2018-05-04", 999.0),
      ("FI23456", "2018-05-01", 900.0), ("FI23456", "2018-05-02", 1100.0),
      ("FI23456", "2018-05-03", 1050.0), ("FI23456", "2018-05-04", 999.0))
      .toDF("sid", "date", "close").withColumn("date", to_date($"date"))
    def run(master: DataFrame): Map[(String, String), Double] = {
      object FutLongShort extends Strategy {
        val code = "fut-long-short"
        override def commissionModel = Some(
          graft.costs.FuturesCommission(brokerCommissionPerContract = 2))
        def pricesToSignals(prices: DataFrame): DataFrame =
          prices.withColumn("signal",
            when(col("close") <= 1000, 1).otherwise(-1))
      }
      Backtest.run(FutLongShort, futPrices, master = Some(master))
        .where($"field" === "Commission")
        .collect()
        .map(r => (r.getAs[String]("sid"), r.getAs[java.sql.Date]("date").toString) ->
          (Option(r.getAs[java.lang.Double]("value")).map(v => r7(v.toDouble))
            .getOrElse(Double.NaN)))
        .toMap
    }
    // multiplier: FI12345 ×10, FI23456 ×20 — double the multiplier,
    // half the contracts, half the commission (test_commissions.py:2657)
    val byMult = run(Seq(
      ("FI12345", "FUT", Option(1.0), 10.0),
      ("FI23456", "FUT", Option.empty[Double], 20.0)) // null magnifier → 1
      .toDF("sid", "secType", "priceMagnifier", "multiplier"))
    assert(byMult(("FI12345", "2018-05-02")) == 0.0000909)
    assert(byMult(("FI12345", "2018-05-03")) == 0.0001905)
    assert(byMult(("FI12345", "2018-05-04")) == 0.0)
    assert(byMult(("FI23456", "2018-05-02")) == 0.0000455)
    assert(byMult(("FI23456", "2018-05-03")) == 0.0000952)
    // price magnifier: FI23456 ÷100 — 100× the contracts, 100× the
    // commission (test_commissions.py:2856)
    val byMag = run(Seq(
      ("FI12345", "FUT", 1.0, 10.0), ("FI23456", "FUT", 100.0, 10.0))
      .toDF("sid", "secType", "priceMagnifier", "multiplier"))
    assert(byMag(("FI12345", "2018-05-02")) == 0.0000909)
    assert(byMag(("FI23456", "2018-05-02")) == 0.0090909)
    assert(byMag(("FI23456", "2018-05-03")) == 0.0190476)
  }

  test("dispatch raises on an uncovered (secType,exchange,currency) group " +
    "(base.py:862-875)") {
    object Dispatched extends Strategy {
      val code = "dispatched"
      override def commissionBySecGroup = Map(
        ("STK", "NYSE", "USD") -> PercentageCommission(brokerCommissionRate = 0.0001))
      def pricesToSignals(prices: DataFrame): DataFrame =
        prices.withColumn("signal", lit(1))
    }
    val master = Seq(
      ("FI12345", "STK", "NYSE", "USD", 1.0, 1.0),
      ("FI23456", "FUT", "CME", "USD", 1.0, 1.0))
      .toDF("sid", "secType", "exchange", "currency", "priceMagnifier", "multiplier")
    val e = intercept[IllegalArgumentException] {
      Backtest.run(Dispatched, prices, master = Some(master))
    }
    assert(e.getMessage ==
      "expected a commission class for each combination of " +
        "(sectype,exchange,currency) but none is defined for (FUT,CME,USD)")
  }

  test("Commission: min floor binds on turnover days (test_commissions.py:688-706)") {
    check("Commission", "FI12345", Seq(None, Some(0.01), Some(0.01), Some(0.0)))
    check("Commission", "FI23456", Seq(None, Some(0.01), Some(0.01), Some(0.01)))
  }

  test("Return: gross − floored commissions (test_commissions.py:708-726)") {
    check("Return", "FI12345",
      Seq(None, Some(-0.01), Some(-0.0327273), Some(0.0242857)))
    check("Return", "FI23456",
      Seq(None, Some(-0.01), Some(-0.1236364), Some(-0.1276471)))
  }

  test("Signal: long below 10, short above (test_commissions.py:585-599)") {
    check("Signal", "FI12345", Seq(Some(1.0), Some(-1.0), Some(-1.0), Some(1.0)))
    check("Signal", "FI23456", Seq(Some(1.0), Some(-1.0), Some(1.0), Some(-1.0)))
  }
}
