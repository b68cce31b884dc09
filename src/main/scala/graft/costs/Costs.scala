package graft.costs

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.panel.Panel
import graft.panel.Panel.Keys
import graft.{GraftError, ParameterError}

/** Commission models (reference commission/{base,stk,fut,fx}.py, D8-D11).
  *
  * Each model is a parameter pack whose `commissions` method is a pure
  * Column expression over (contractValue, turnover[, nlv]) — codegen'd
  * arithmetic, no UDFs, no shuffles of its own. Commissions are expressed
  * as percentages of account equity, exactly as the reference.
  */
sealed trait CommissionModel {
  def commissions(contractValue: Column, turnover: Column, nlv: Option[Column]): Column

  /** Min-commission floor (reference commission/base.py:57-66): only
    * enforced when NLVs are available; the floor is minCommission/nlv. */
  protected def enforceMin(c: Column, nlv: Option[Column], minCommission: Double): Column =
    nlv match {
      case Some(n) if minCommission != 0 =>
        val minPct = Panel.safeDiv(lit(minCommission), n)
        when(c > 0 && c < minPct, minPct).otherwise(c)
      case _ => c
    }
}

/** D8 `PercentageCommission` (commission/base.py:123-171): blended broker
  * rate (+ optional tier-2) × turnover, floored at min, + exchange fee. */
final case class PercentageCommission(
    brokerCommissionRate: Double = 0,
    brokerCommissionRateTier2: Double = 0,
    tier2Ratio: Double = 0,
    exchangeFeeRate: Double = 0,
    minCommission: Double = 0)
    extends CommissionModel {
  def commissions(contractValue: Column, turnover: Column, nlv: Option[Column]): Column = {
    val rate =
      if (tier2Ratio != 0)
        (1 - tier2Ratio) * brokerCommissionRate + tier2Ratio * brokerCommissionRateTier2
      else brokerCommissionRate
    val broker = enforceMin(turnover * lit(rate), nlv, minCommission)
    broker + turnover * lit(exchangeFeeRate)
  }
}

/** D9 `PerShareCommission` (commission/stk.py:124-188): per-share cost as a
  * fraction of the (abs, non-zero) contract value × turnover, plus
  * maker/taker, value-based, and commission-based pass-through fees. */
final case class PerShareCommission(
    brokerCommissionPerShare: Double,
    brokerCommissionPerShareTier2: Double = 0,
    tier2Ratio: Double = 0,
    exchangeFeePerShare: Double = 0,
    makerFeePerShare: Double = 0,
    takerFeePerShare: Double = 0,
    makerRatio: Double = 0,
    percentageFeeRate: Double = 0,
    commissionPercentageFeeRate: Double = 0,
    minCommission: Double = 0)
    extends CommissionModel {
  def commissions(contractValue: Column, turnover: Column, nlv: Option[Column]): Column = {
    val exchangePerShare = exchangeFeePerShare +
      makerRatio * makerFeePerShare + (1 - makerRatio) * takerFeePerShare
    val perShare =
      if (tier2Ratio != 0)
        (1 - tier2Ratio) * brokerCommissionPerShare + tier2Ratio * brokerCommissionPerShareTier2
      else brokerCommissionPerShare
    // abs() of contract values: combos can have negative prices (stk.py:171)
    val safeCv = abs(when(contractValue =!= 0, contractValue))
    val brokerRaw = lit(perShare) / safeCv * turnover
    val broker = enforceMin(brokerRaw, nlv, minCommission)
    val shareFees = lit(exchangePerShare) / safeCv * turnover
    val valueFees = turnover * lit(percentageFeeRate)
    val commissionFees = broker * lit(commissionPercentageFeeRate)
    broker + shareFees + valueFees + commissionFees
  }
}

/** D10 `FuturesCommission` (commission/fut.py:62-80): fixed cost per
  * contract ÷ contract value × turnover. */
final case class FuturesCommission(
    brokerCommissionPerContract: Double = 0,
    exchangeFeePerContract: Double = 0,
    carryingFeePerContract: Double = 0)
    extends CommissionModel {
  def commissions(contractValue: Column, turnover: Column, nlv: Option[Column]): Column = {
    val costPerContract =
      brokerCommissionPerContract + exchangeFeePerContract + carryingFeePerContract
    Panel.safeDiv(lit(costPerContract), contractValue) * turnover
  }
}

object CommissionModel {
  /** D11 `SpotFXCommission` (commission/fx.py:17-52): 0.2 bps, no min. */
  val spotFX: PercentageCommission = PercentageCommission(brokerCommissionRate = 0.00002)
  val none: PercentageCommission = PercentageCommission()

  /** The reference's canned demo commission classes as parameter packs
    * (commission/stk.py:190-273, fut.py:82-122) — same names, same
    * numbers, so a migrating user keeps their COMMISSION_CLASS choices. */
  object Demo {
    val usStock = PerShareCommission(
      brokerCommissionPerShare = 0.005, minCommission = 1.00)
    val costPlusUSStock = PerShareCommission(
      brokerCommissionPerShare = 0.0035,
      exchangeFeePerShare = 0.0002 + 0.000119 / 2,
      makerFeePerShare = -0.002, takerFeePerShare = 0.00118, makerRatio = 0,
      commissionPercentageFeeRate = 0.000175 + 0.00056,
      percentageFeeRate = 0.0000231, minCommission = 0.35)
    val costPlusCanadaStock = PerShareCommission(
      brokerCommissionPerShare = 0.008,
      exchangeFeePerShare = 0.00017 + 0.00011,
      makerFeePerShare = -0.0019, takerFeePerShare = 0.003, makerRatio = 0,
      minCommission = 1.00)
    val australiaStock = PercentageCommission(
      brokerCommissionRate = 0.0008, minCommission = 5.00)
    val franceStock = PercentageCommission(
      brokerCommissionRate = 0.0008, exchangeFeeRate = 0.000095,
      minCommission = 1.25)
    val germanyStock = PercentageCommission(
      brokerCommissionRate = 0.0008, exchangeFeeRate = 0.000048 + 0.00001,
      minCommission = 1.25)
    val hongKongStock = PercentageCommission(
      brokerCommissionRate = 0.0008,
      exchangeFeeRate = 0.00005 + 0.00002 + 0.001 + 0.000027,
      minCommission = 18.00)
    val japanStock = PercentageCommission(
      brokerCommissionRate = 0.0005, exchangeFeeRate = 0.000004,
      minCommission = 80.00)
    val mexicoStock = PercentageCommission(
      brokerCommissionRate = 0.0010, minCommission = 60.00)
    val singaporeStock = PercentageCommission(
      brokerCommissionRate = 0.0008, exchangeFeeRate = 0.00034775 + 0.00008025,
      minCommission = 2.50)
    val ukStock = PercentageCommission(
      brokerCommissionRate = 0.0008, exchangeFeeRate = 0.000045 + 0.0025,
      minCommission = 1.00)
    val cmeEquityEMiniFixed = FuturesCommission(
      brokerCommissionPerContract = 0.85, exchangeFeePerContract = 1.18)
    val canadaCADFuturesTiered = FuturesCommission(
      brokerCommissionPerContract = 0.85,
      exchangeFeePerContract = 1.12 + 0.03 + 0.01)
    val koreaFutures = PercentageCommission(brokerCommissionRate = 0.00004)
    val koreaStockFutures = PercentageCommission(brokerCommissionRate = 0.0004)
  }
}

/** Slippage models (reference slippage/{fixed,borrowfee}.py, D13-D14). */
sealed trait SlippageModel {
  def slippage(turnover: Column, position: Column)(implicit k: Keys): Column
}

/** D13 `FixedSlippage` (slippage/fixed.py:45-64): turnover × one-way rate.
  * `SLIPPAGE_BPS` sugar = FixedSlippage(bps/10000) (base.py:916-917). */
final case class FixedSlippage(oneWaySlippage: Double = 0.0005) extends SlippageModel {
  def slippage(turnover: Column, position: Column)(implicit k: Keys): Column =
    turnover * lit(oneWaySlippage)
}

/** Volume-share slippage — the published Zipline/Quantopian
  * `VolumeShareSlippage` market-impact model, adapted to weight space:
  * impact fraction = priceImpact · volumeShare², where volumeShare =
  * min(sharesTraded / barVolume, volumeLimit) and sharesTraded is
  * derived from the weight-space turnover (turnover·NLV / price). Cost
  * in return space = turnover · priceImpact · volumeShare² (the same
  * convention as [[FixedSlippage]]: a fraction of NLV per bar).
  *
  * A zero/null-volume bar with nonzero turnover is charged AT the
  * volume limit — an illiquid bar is maximally impacted, not free (the
  * silent-0.0 benchmark lesson applied to costs). Requires `price` and
  * `volume` columns on the panel; pure per-row column algebra (no
  * windows beyond the turnover the caller already computed). */
final case class VolumeShareSlippage(
    nlv: Double,
    volumeLimit: Double = 0.025,
    priceImpact: Double = 0.1,
    priceCol: String = "close",
    volumeCol: String = "volume") extends SlippageModel {
  require(nlv > 0, s"nlv must be positive: $nlv")
  require(volumeLimit > 0, s"volumeLimit must be positive: $volumeLimit")
  def slippage(turnover: Column, position: Column)(implicit k: Keys): Column = {
    val shares = turnover * lit(nlv) / col(priceCol)
    val share =
      when(turnover === 0 || turnover.isNull, lit(0.0))
        .when(col(volumeCol).isNull || col(volumeCol) <= 0, lit(volumeLimit))
        .otherwise(least(shares / col(volumeCol), lit(volumeLimit)))
    turnover * lit(priceImpact) * share * share
  }
}

/** D14 `IBKRBorrowFees` (slippage/borrowfee.py:37-59): short positions ×
  * 1.02 collateral × (annual fee %/100/360) × days-held, where days-held
  * counts calendar days since the previous bar (weekends assessed ×3,
  * borrowfee.py:52-54). Requires a `borrowFee` column (annual %, as-of
  * joined onto the panel — see [[graft.trade.AsOf]]). */
final case class BorrowFees(borrowFeeCol: String = "borrow_fee") extends SlippageModel {
  def slippage(turnover: Column, position: Column)(implicit k: Keys): Column = {
    val daily = col(borrowFeeCol) / 100.0 / 360.0
    val daysHeld = coalesce(
      datediff(col(k.dateCol), lag(col(k.dateCol), 1).over(k.bySid)),
      lit(1))
    abs(when(position < 0, position).otherwise(lit(0.0))) *
      lit(1.02) * daily * daysHeld
  }
}

/** D31: square-root market-impact estimate — the published
  * institutional cost model (Almgren et al. 2005; Grinold & Kahn):
  * impact ≈ coef · σ_daily · √(Q / ADV), i.e. cost scales with the
  * square root of participation, not linearly (small orders are
  * nearly free, 2× the size costs √2×). The model every pre-trade
  * cost check runs; complements the fill-time [[VolumeShareSlippage]]
  * with an ex-ante per-order number. */
object SqrtImpact {
  /** Estimated impact in basis points for an order of `quantity`
    * shares against `adv` average daily volume and `sigma` daily
    * return volatility (PRE-ROUNDED, the voltarget stance — identical
    * inputs compute identically in any engine). Null — not 0 — when
    * ADV or σ is missing/non-positive: an unknown cost is not a free
    * trade. One per-row sqrt; 6dp. */
  def impactBps(
      quantity: Column,
      adv: Column,
      sigma: Column,
      coef: Double = 1.0): Column =
    round(when(adv > 0 && sigma > 0 && quantity > 0,
      sqrt(quantity.cast("double") / adv) * sigma * coef * 1e4), 6)
}

/** D7 contract values (reference base.py:1857-1913): price ÷ priceMagnifier
  * × multiplier; spot FX (secType CASH) contract value ≡ 1
  * (base.py:1906-1908). Magnifier/multiplier nulls default to 1. */
object ContractValues {
  def contractValue(
      price: Column,
      secType: Column,
      priceMagnifier: Column,
      multiplier: Column): Column =
    when(secType === "CASH", lit(1.0)).otherwise(
      price / coalesce(priceMagnifier, lit(1.0)) * coalesce(multiplier, lit(1.0)))

  /** CONTRACT_VALUE_REFERENCE_FIELD resolution (base.py:1862-1900):
    * explicit override, else the first present candidate price field
    * (history then realtime aggregates, lowercased to the panel's column
    * convention), else the reference's error. */
  val candidateFields: Seq[String] = Seq(
    "close", "open",
    "minuteclose_close", "secondclose_close", "lastprice_close",
    "bidprice_close", "askprice_close", "timesaleslastprice_close",
    "timesalesfilteredlastprice_close", "lastprice_mean", "bidprice_mean",
    "askprice_mean", "timesaleslastprice_mean",
    "timesalesfilteredlastprice_mean", "minuteopen_open", "secondopen_open",
    "lastprice_open", "bidprice_open", "askprice_open",
    "timesaleslastprice_open", "timesalesfilteredlastprice_open")

  def referenceField(columns: Seq[String], explicit: Option[String]): String =
    explicit.getOrElse(
      candidateFields.find(columns.contains).getOrElse(
        throw new ParameterError(
          "Can't identify a suitable field to use to calculate contract values. " +
            "Please set contractValueReferenceField = '<field>' to indicate " +
            "which price field to use to calculate contract values.")))
}
