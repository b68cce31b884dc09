package graft.model

/** Relational row types for the fixed-schema tables (SURVEY §1.4).
  * The price panel itself stays an untyped DataFrame because its field set
  * is dynamic (reference base.py:1865 reads fields from the data).
  */

/** Securities master row (reference base.py:1094-1096 fields +
  * computed Nlv base.py:1142). Small dimension — always broadcast. */
final case class Security(
    sid: String,
    symbol: String,
    secType: String, // STK | FUT | CASH
    currency: String,
    priceMagnifier: Double, // null→1 handled at load
    multiplier: Double, // null→1 handled at load
    exchange: String,
    timezone: String,
    nlv: Double)

/** Order row (reference stub fields base.py:657-692; user-decorated
  * fields base.py:483-545; bracket fields base.py:607-655). */
final case class Order(
    sid: String,
    account: String,
    action: String, // BUY | SELL
    orderRef: String,
    totalQuantity: Double,
    exchange: String = null,
    orderType: String = "MKT",
    tif: String = "DAY",
    lmtPrice: Option[Double] = None,
    orderId: Option[String] = None,
    parentId: Option[String] = None)

/** Account balance snapshot (reference base.py:1651-1661). */
final case class Balance(account: String, currency: String, netLiquidation: Double)

/** FX rate (reference base.py:1663-1668). */
final case class FxRate(baseCurrency: String, quoteCurrency: String, rate: Double)

/** Live position (reference base.py:1808-1824). */
final case class Position(sid: String, account: String, quantity: Double)

/** Open order remaining (reference base.py:1826-1846). */
final case class OpenOrder(
    sid: String,
    account: String,
    orderRef: String,
    remaining: Double,
    action: String)

/** Account allocation for trade() fan-out (reference base.py:1609-1616). */
final case class Allocation(account: String, allocation: Double)

object Fields {
  /** Backtest results panel field set (reference base.py:1355-1365;
    * asserted _tests/test_backtest.py:194-206). */
  val results: Seq[String] = Seq(
    "Signal", "Weight", "AbsWeight", "NetExposure", "AbsExposure",
    "TotalHoldings", "Turnover", "Commission", "Slippage", "Return")
  val benchmark = "Benchmark"
}
