package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.alloc.Weights
import graft.costs.{CommissionModel, SlippageModel}
import graft.panel.Panel
import graft.panel.Panel.Keys

/** The user-facing strategy contract — the engine's "UDF surface"
  * (SURVEY §2.9): whole-panel `DataFrame => DataFrame` hooks, mirroring
  * the four reference hooks (reference strategies/base.py:298-481).
  *
  * Unlike the reference (which threads separate wide matrices through each
  * hook), the Spark-native pipeline threads ONE long panel and each stage
  * appends a named column: `signal` → `weight` → `position` → `gross`.
  * That keeps a single lineage, so Catalyst plans all per-sid window ops
  * over one sort/exchange and all per-date aggregates over another —
  * two shuffles for the whole default pipeline regardless of how many
  * measures are derived.
  *
  * Panel contract: key columns `sid`, `date` (and `time` when intraday per
  * `keys`), plus field columns (`close`, `volume`, …) in lowercase.
  */
trait Strategy {

  /** Strategy code, used as the order ref (reference base.py:680). */
  def code: String

  def keys: Keys = Panel.eod

  /** Bars of history needed before the first tradeable date (reference
    * LOOKBACK_WINDOW, base.py:1050-1086). The scan is widened by this
    * much and results truncated back (W7). 0 = unset. */
  def lookbackWindow: Int = 0

  /** REBALANCE_INTERVAL-style offset alias (base.py:1068-1081): when the
    * strategy resamples to a periodic frequency, the inferred lookback is
    * widened by one interval's trading-day span. */
  def rebalanceInterval: Option[String] = None

  /** ACCOUNT_BALANCE_FIELD (base.py:1647-1649): balance field(s) used as
    * the equity basis for target quantities; with several, the LESSER
    * value per account applies. */
  def accountBalanceFields: Seq[String] = Seq("netLiquidation")

  /** CONTRACT_VALUE_REFERENCE_FIELD (base.py:1862-1900): which panel
    * price column feeds contract values; None = first present candidate
    * ("close", "open", realtime aggregates). */
  def contractValueReferenceField: Option[String] = None

  /** `*_WINDOW`-style params (base.py:1063-1065): the rolling windows the
    * strategy's signals use. When no explicit `lookbackWindow` is set,
    * the inferred lookback is their MAX (the reference scans class
    * attributes ending in _WINDOW; here they are declared). */
  def windowParams: Seq[Int] = Nil

  /** `*_INTERVAL`-style offset aliases (base.py:1068-1081): the widest
    * interval's trading-day span widens the inferred lookback so
    * periodic resampling still sees enough history. Defaults to the
    * single `rebalanceInterval`. */
  def intervalParams: Seq[String] = rebalanceInterval.toSeq

  /** Effective lookback bars (base.py:1050-1086): an explicit
    * `lookbackWindow` wins as-is; else max(windowParams) — 252 when
    * windows are declared-empty but an interval is — plus the widest
    * interval span. All unset → 0 (the engine skips scan widening; the
    * reference always widens by its 252 default because its data
    * service charges per-scan — a Spark scan prunes instead). The
    * reference counts business days from "today"; fixed trading-day
    * spans keep the plan deterministic. */
  final def effectiveLookback: Int =
    if (lookbackWindow > 0) lookbackWindow
    else if (windowParams.isEmpty && intervalParams.isEmpty) 0
    else {
      // an interval that intervalBars cannot parse contributes 0 bars
      // but still signals "history matters": the 252 default applies
      // (the reference's unparsable aliases are silently skipped the
      // same way, base.py:1073-1077)
      val base = if (windowParams.nonEmpty) windowParams.max else 252
      val spans = intervalParams.map(Strategy.intervalBars)
      base + (if (spans.nonEmpty) spans.max else 0)
    }

  /** Reference CALENDAR (base.py:742-757): exchange whose trading
    * calendar drives live-trading signal-date resolution — a closed
    * exchange dates signals to when it last closed. None = resolve from
    * the strategy timezone only. */
  def calendar: Option[String] = None

  /** Reference POSITIONS_CLOSED_DAILY (base.py:260): intraday strategies
    * whose turnover is 2× positions rather than diff. */
  def positionsClosedDaily: Boolean = false

  def commissionModel: Option[CommissionModel] = None

  /** Per-(secType, exchange, currency) commission dispatch (D12,
    * reference base.py:862-901). Used when non-empty; every group present
    * in the master must be covered. */
  def commissionBySecGroup: Map[(String, String, String), CommissionModel] = Map.empty

  def slippageModels: Seq[SlippageModel] = Nil

  /** Reference SLIPPAGE_BPS sugar (base.py:916-917). */
  def slippageBps: Double = 0.0

  /** Benchmark security for the results' Benchmark field (D19). */
  def benchmarkSid: Option[String] = None

  /** D19 BENCHMARK_DB (base.py:1421-1462): a separate END-OF-DAY
    * benchmark price frame `(sid, date, close)`. When set, benchmark
    * closes come from here — reindexed to the price panel's date grid
    * (and broadcast across intraday slots when results are intraday) —
    * instead of being extracted from the price panel. */
  def benchmarkPrices: Option[DataFrame] = None

  /** D19 BENCHMARK_TIME (base.py:1484-1499): once-a-day intraday
    * strategies (daily results over intraday prices) extract the daily
    * benchmark series at this intraday time. */
  def benchmarkTime: Option[String] = None

  // ---- the four pipeline hooks ----

  /** Hook 1 (required): derive a `signal` column from the price panel. */
  def pricesToSignals(prices: DataFrame): DataFrame

  /** Engine entry for hook 1, threading the backtest's `noCache` flag
    * (base.py:1310, `backtest(no_cache=...)`); MLStrategy routes it to
    * the M4 feature cache, plain strategies ignore it. */
  private[graft] def signalsWithCache(prices: DataFrame, noCache: Boolean): DataFrame =
    pricesToSignals(prices)

  /** Hook 2: `signal` → `weight`. Default: equal weights per date
    * (reference base.py:386-387 → weight.py:22). */
  def signalsToTargetWeights(panel: DataFrame): DataFrame = {
    implicit val k: Keys = keys
    panel.withColumn("weight", Weights.equalWeights(col("signal")))
  }

  /** Hook 3: `weight` → `position`. Default: enter the period after the
    * weight was allocated, i.e. lag 1 (reference base.py:434). */
  def targetWeightsToPositions(panel: DataFrame): DataFrame = {
    implicit val k: Keys = keys
    panel.withColumn("position", Panel.lagBySid(col("weight")))
  }

  /** Hook 4: `position` → `gross` return. Default: close-to-close return
    * × the position held over the period (reference base.py:479-480:
    * `closes.pct_change() * positions.shift()`). */
  def positionsToGrossReturns(panel: DataFrame): DataFrame = {
    implicit val k: Keys = keys
    panel.withColumn(
      "gross",
      Panel.pctChange(col("close")) * Panel.lagBySid(col("position")))
  }

  /** D16/D17 hook (reference limit_position_sizes, base.py:974-1048):
    * return (maxLong, maxShort) quantity panels, or None for no limits. */
  def limitPositionSizes(prices: DataFrame): (Option[DataFrame], Option[DataFrame]) =
    (None, None)

  /** S8 `save_to_results` (reference base.py:1502-1570): extra named
    * measures to union into the backtest results panel — e.g.
    * `"MAvg" -> Panel.rollingMean(col("close"), 50)`, the reference's
    * canonical example (base.py:1537). Each Column is evaluated against
    * the fully-derived panel (all four hooks have run, so any column a
    * hook appended is in scope). Names must not collide with the
    * standard result fields (base.py:1543-1557); backtest-only, ignored
    * by the trade path like the reference's is_trade no-op. */
  def customFields: Seq[(String, Column)] = Nil

  /** Order decoration hook (reference base.py:483-545): default MKT/DAY. */
  def orderStubsToOrders(stubs: DataFrame, prices: DataFrame): DataFrame =
    stubs
      .withColumn("orderType", lit("MKT"))
      .withColumn("tif", lit("DAY"))
}

object Strategy {

  /** Trading-day span of a pandas-style offset alias with an optional
    * leading multiplier ("W", "2W", "M", "Q", "A"/"Y"; base.py:1068-1081).
    * The reference counts business days in one interval anchored at
    * "today" (non-deterministic by ±2 days); these fixed spans are the
    * deterministic equivalents. Unknown aliases contribute 0, like the
    * reference's silent `except ValueError: continue`. */
  def intervalBars(alias: String): Int = {
    val (numPart, unitPart) = alias.span(_.isDigit)
    val n = if (numPart.isEmpty) 1 else numPart.toInt
    val unit = unitPart.toUpperCase match {
      case "D" | "B" => 1
      case "W" => 5
      case "M" | "ME" | "MS" => 22
      case "Q" | "QE" | "QS" => 65
      case "A" | "Y" | "YE" | "YS" => 260
      case _ => 0
    }
    n * unit
  }
}
