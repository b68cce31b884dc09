package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.costs.{CommissionModel, ContractValues, FixedSlippage}
import graft.panel.Panel
import graft.panel.Panel.Keys
import graft.{GraftError, ParameterError}

/** The backtest driver — reference `Moonshot.backtest()`
  * (strategies/base.py:1293-1400, lifecycle SURVEY §3.1).
  *
  * Builds one lazy DataFrame plan: panel → signals → weights → positions →
  * gross → costs → measures, then melts the measure columns into the long
  * results relation `(field, sid, date[, time], value)`. Catalyst sees the
  * whole pipeline at once; nothing materializes until the caller acts.
  */
object Backtest {

  final case class Config(
      allocation: Double = 1.0, // reference base.py:1342
      nlv: Option[Double] = None, // account equity for min-commission floors
      startDate: Option[String] = None, // truncation, base.py:1395-1398
      labelSids: Boolean = false, // base.py:1390-1393
      noCache: Boolean = false) // backtest(no_cache=...), base.py:1310

  /** Run the full backtest; returns the long results panel.
    *
    * @param prices field-pivoted long panel (sid, date[, time], close, …)
    * @param master optional securities master (sid, secType, currency,
    *               exchange, priceMagnifier, multiplier, symbol[, nlv]) —
    *               broadcast-joined when cost models need contract values.
    */
  def run(
      strategy: Strategy,
      prices: DataFrame,
      master: Option[DataFrame] = None,
      cfg: Config = Config()): DataFrame = {
    implicit val k: Keys = strategy.keys

    // hooks 1-2: signal, weight (base.py:1340-1342)
    var p = strategy.signalsWithCache(prices, cfg.noCache)
    p = strategy.signalsToTargetWeights(p)
    if (cfg.allocation != 1.0)
      p = p.withColumn("weight", col("weight") * lit(cfg.allocation))

    // D16 weight constraint would apply here when limitPositionSizes is
    // defined (base.py:1343); see Limits.constrainWeights.
    val (maxLong, maxShort) = strategy.limitPositionSizes(prices)
    if (maxLong.isDefined || maxShort.isDefined)
      p = Limits.constrainWeights(p, maxLong, maxShort, master, cfg.nlv,
        ContractValues.referenceField(p.columns, strategy.contractValueReferenceField))

    // hooks 3-4: position, gross (base.py:1344-1345)
    p = strategy.targetWeightsToPositions(p)
    p = strategy.positionsToGrossReturns(p)

    // D6 turnover (base.py:701-714): abs(diff(fillna(0))) — or 2×positions
    // when positions are closed daily. First bar per sid stays null (pandas
    // diff yields NaN there).
    val turnoverCol: Column =
      if (strategy.positionsClosedDaily) abs(col("position") * 2)
      else abs(Panel.diffBySid(Panel.zeroFill(col("position"))))
    p = p.withColumn("turnover", turnoverCol)

    // D8-D12 commissions + D13-D15 slippage over turnover
    p = withCommissions(strategy, p, master, cfg)
    p = withSlippage(strategy, p)

    // D18 net returns (base.py:1348)
    p = p.withColumn(
      "return",
      Panel.zeroFill(col("gross")) - col("commission") - col("slippage"))

    // A8 TotalHoldings (base.py:1351)
    p = p.withColumn(
      "total_holdings",
      when(Panel.zeroFill(col("position")) =!= 0, 1.0).otherwise(0.0))

    // S8 results union (base.py:1355-1388), fields in sorted order
    val standard: Seq[(String, Column)] = Seq(
      "AbsExposure" -> abs(col("position")),
      "AbsWeight" -> abs(col("weight")),
      "Commission" -> col("commission"),
      "NetExposure" -> col("position"),
      "Return" -> col("return"),
      "Signal" -> col("signal").cast("double"),
      "Slippage" -> col("slippage"),
      "TotalHoldings" -> col("total_holdings"),
      "Turnover" -> col("turnover"),
      "Weight" -> col("weight"))

    // S8 save_to_results custom fields (base.py:1502-1570): reserved
    // names rejected with the reference's error (base.py:1556-1557).
    // ("TotalHolding" is reserved verbatim alongside the actual
    // TotalHoldings field, matching base.py:1549.)
    val reserved = standard.map(_._1).toSet ++ Set("TotalHolding", "Benchmark")
    strategy.customFields.foreach { case (name, _) =>
      if (reserved.contains(name))
        throw new ParameterError(s"name $name is a reserved name")
    }
    val measures = standard ++ strategy.customFields.map {
      case (n, c) => n -> c.cast("double")
    }

    val keyCols = (k.group ++ (k.sid +: k.order)).distinct
    val projected = p.select(
      keyCols.map(col) ++ measures.map { case (n, c) => c.as(n) }: _*)
    var results = Panel.meltFields(projected, keyCols, measures.map(_._1))

    // D19 Benchmark field (base.py:1379-1380 → 1402-1500): the benchmark
    // sid's closes reindexed to the full date grid, ffilled, pct_changed.
    strategy.benchmarkSid.foreach { bs =>
      // a grouped (sweep/multi-book) melt would need per-group benchmark
      // rows; the single-series D19 contract doesn't define that — raise
      // here rather than let unionByName fail on the missing group cols
      if (k.group.nonEmpty)
        throw new ParameterError(
          "BENCHMARK is not supported with grouped keys (parameter sweep); " +
            "compute benchmark measures on a single-variant run")
      results = results.unionByName(benchmarkReturns(strategy, prices, bs))
    }

    // label sids as Symbol(Sid) (base.py:1390-1393)
    if (cfg.labelSids && master.isDefined) {
      val labels = master.get
        .select(col("sid"), concat(col("symbol"), lit("("), col("sid"), lit(")")).as("__label"))
      results = results
        .join(broadcast(labels), Seq("sid"), "left")
        .withColumn("sid", coalesce(col("__label"), col("sid")))
        .drop("__label")
    }

    // truncate at requested start date (base.py:1395-1398) — a plain
    // filter, so Catalyst prunes date partitions under it.
    cfg.startDate.fold(results)(s => results.where(col(k.dateCol) >= lit(s)))
  }

  /** D19 (base.py:1402-1500): benchmark return series as long rows
    * `(field=Benchmark, sid=benchmarkSid, date[, time], value)` —
    * `ffill().pct_change().fillna(0)` over the result grid exactly as
    * the reference (base.py:1500).
    *
    * Sources, mirroring `_get_benchmark`:
    *  - `strategy.benchmarkPrices` (BENCHMARK_DB, base.py:1421-1462):
    *    a separate EOD frame; its daily closes join the result grid on
    *    date, so intraday results broadcast the daily price across slots
    *    (the reference's reindex(level="Date"), base.py:1455-1456).
    *  - otherwise the price panel itself; once-a-day intraday strategies
    *    (daily results, intraday prices) slice at `benchmarkTime`
    *    (base.py:1484-1499), continuous-intraday results use the
    *    benchmark's full intraday series.
    *
    * The single-series ffill/pct_change runs as an unpartitioned Window —
    * one row per result slot, tiny by construction (the reference's
    * single benchmark column); the grid is the distinct result slots,
    * kept pruned before the join.
    *
    * Loud-failure contract (base.py:1482-1499): a benchmark sid absent
    * from the price data, or a BENCHMARK_TIME matching no bars, RAISES —
    * the left join below would otherwise ffill nothing and manufacture a
    * flat 0.0 Benchmark series, silently corrupting every
    * benchmark-relative measure downstream. The probes are bounded
    * driver actions over the sid-filtered scan (`isEmpty` = one
    * pushdown-pruned partial scan — the `requireFresh` cost class). */
  private def benchmarkReturns(
      strategy: Strategy,
      prices: DataFrame,
      benchmarkSid: String)(implicit k: Keys): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val intradayResults = k.order.size > 1
    val pricesHaveTime = prices.columns.contains("time")
    val grid = prices.select(k.order.map(col): _*).distinct()

    def requireRows(df: DataFrame, db: String): DataFrame = {
      if (df.isEmpty)
        throw new GraftError(
          s"BENCHMARK Sid $benchmarkSid is not in $db data")
      df
    }

    val closes: DataFrame = strategy.benchmarkPrices match {
      case Some(b) =>
        // base.py:1442-1444
        require(!b.columns.contains("time"),
          "only end-of-day databases are supported for BENCHMARK_DB")
        requireRows(
          b.where(col(k.sid) === benchmarkSid)
            .select(col(k.dateCol), col("close").as("__bc")),
          "BENCHMARK_DB")
      case None =>
        // base.py:1469-1477: the reference extracts the first candidate
        // field and raises MoonshotParameterError when it's absent —
        // its candidate loop can only ever accept "Close"
        if (!prices.columns.contains("close"))
          throw new ParameterError(
            s"Cannot extract BENCHMARK $benchmarkSid from prices data " +
              "without one of close, open, bid, ask, high, low")
        val own = requireRows(prices.where(col(k.sid) === benchmarkSid), "prices")
        if (pricesHaveTime && !intradayResults) {
          // once-a-day intraday: collapse to daily at BENCHMARK_TIME
          val t = strategy.benchmarkTime.getOrElse(
            throw new ParameterError(
              s"Cannot extract BENCHMARK $benchmarkSid from prices because " +
                "prices contains intraday prices but no BENCHMARK_TIME specified"))
          val sliced = own.where(col("time") === lit(t))
            .select(col(k.dateCol), col("close").as("__bc"))
          if (sliced.isEmpty)
            throw new GraftError(
              s"BENCHMARK_TIME $t is not in prices data")
          sliced
        } else own.select(k.order.map(col) :+ col("close").as("__bc"): _*)
    }

    // daily closes join on date only (broadcast across intraday slots)
    val joinKeys = if (closes.columns.contains("time")) k.order else Seq(k.dateCol)
    val w = Window.orderBy(k.order.map(col): _*)
    val filled = grid.join(closes, joinKeys, "left")
      .withColumn("__bc",
        last(col("__bc"), ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    filled
      .withColumn("value",
        coalesce(
          graft.panel.Panel.safeDiv(col("__bc"), lag(col("__bc"), 1).over(w)) - 1.0,
          lit(0.0)))
      .select(
        lit(benchmarkSid).as(k.sid) +: k.order.map(col) :+
          lit(graft.model.Fields.benchmark).as("field") :+ col("value"): _*)
  }

  /** D8-D12 (base.py:839-901): single model, or per-(secType, exchange,
    * currency) dispatch via a broadcast master join. No model → 0. */
  private def withCommissions(
      strategy: Strategy,
      panel: DataFrame,
      master: Option[DataFrame],
      cfg: Config)(implicit k: Keys): DataFrame = {
    // NLV source for min-commission floors: a per-security `nlv` column
    // on the master wins (the reference's securities-master Nlv, mapped
    // per currency, base.py:1856-1860); else the scalar Config.nlv.
    val masterHasNlv = master.exists(_.columns.contains("nlv"))
    val nlvCol =
      if (masterHasNlv) Some(col("nlv")) else cfg.nlv.map(v => lit(v))
    // CONTRACT_VALUE_REFERENCE_FIELD (base.py:1862-1900) — resolved only
    // when a commission model actually needs contract values
    lazy val cvField = ContractValues.referenceField(
      panel.columns, strategy.contractValueReferenceField)
    def cv: Column = ContractValues.contractValue(
      col(cvField), col("secType"), col("priceMagnifier"), col("multiplier"))

    if (strategy.commissionBySecGroup.nonEmpty) {
      val m = master.getOrElse(
        throw new ParameterError("commission dispatch requires a master"))
      // coverage validation (base.py:862-875): every (secType, exchange,
      // currency) group in the master must have a model — no silent null
      // commissions. The master is a broadcast-sized dimension, so the
      // distinct-groups check is a cheap driver-side aggregation.
      val required = m.select("secType", "exchange", "currency").distinct()
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
      val missing = required -- strategy.commissionBySecGroup.keySet
      if (missing.nonEmpty)
        throw new ParameterError(
          "expected a commission class for each combination of " +
            "(sectype,exchange,currency) but none is defined for " +
            missing.toSeq.sorted
              .map { case (s, e, c) => s"($s,$e,$c)" }.mkString(", "))
      val dispatchCols = Seq("sid", "secType", "exchange", "currency",
        "priceMagnifier", "multiplier") ++ (if (masterHasNlv) Seq("nlv") else Nil)
      val joined = panel.join(
        broadcast(m.select(dispatchCols.map(col): _*)), Seq("sid"), "left")
      // D12: fold per-group models into one nested when() expression
      val expr = strategy.commissionBySecGroup.foldLeft(lit(null).cast("double")) {
        case (acc, ((secType, exchange, currency), model)) =>
          val inGroup = col("secType") === secType &&
            col("exchange") === exchange && col("currency") === currency
          when(inGroup, model.commissions(cv, col("turnover"), nlvCol)).otherwise(acc)
      }
      joined
        .withColumn("commission", expr)
        .drop("secType", "exchange", "currency", "priceMagnifier", "multiplier", "nlv")
    } else
      strategy.commissionModel match {
        case None => panel.withColumn("commission", lit(0.0))
        case Some(model) =>
          master match {
            case Some(m) =>
              val cols = Seq("sid", "secType", "priceMagnifier", "multiplier") ++
                (if (masterHasNlv) Seq("nlv") else Nil)
              panel
                .join(broadcast(m.select(cols.map(col): _*)), Seq("sid"), "left")
                .withColumn("commission", model.commissions(cv, col("turnover"), nlvCol))
                .drop("secType", "priceMagnifier", "multiplier", "nlv")
            case None =>
              // no master: contract value = the raw reference price
              // (magnifier/multiplier 1)
              panel.withColumn(
                "commission",
                model.commissions(col(cvField), col("turnover"), nlvCol))
          }
      }
  }

  /** D13-D15 (base.py:903-919): sum of slippage classes + SLIPPAGE_BPS,
    * null-filled to 0. */
  private def withSlippage(strategy: Strategy, panel: DataFrame)(
      implicit k: Keys): DataFrame = {
    val models = strategy.slippageModels ++
      (if (strategy.slippageBps != 0) Seq(FixedSlippage(strategy.slippageBps / 10000.0))
       else Nil)
    val total = models.foldLeft(lit(0.0): Column) { (acc, m) =>
      acc + m.slippage(col("turnover"), col("position"))
    }
    panel.withColumn("slippage", Panel.zeroFill(total))
  }
}

/** D16 position-size limiter (reference base.py:921-972): weights →
  * quantities via NLV and (ffilled, abs, non-zero) contract values, clamp
  * to the per-sid long/short max-quantity panels, convert back to weights.
  */
object Limits {
  def constrainWeights(
      panel: DataFrame,
      maxLong: Option[DataFrame],
      maxShort: Option[DataFrame],
      master: Option[DataFrame],
      nlv: Option[Double],
      cvField: String = "close")(implicit k: Keys): DataFrame = {
    val m = master.getOrElse(
      throw new ParameterError("limit_position_sizes requires a master"))
    val nlvValue = nlv.getOrElse(
      throw new ParameterError("must provide NLVs if using limit_position_sizes"))

    var p = panel.join(
      broadcast(m.select("sid", "secType", "priceMagnifier", "multiplier")),
      Seq("sid"), "left")
    val cv0 = ContractValues.contractValue(
      col(cvField), col("secType"), col("priceMagnifier"), col("multiplier"))
    p = p.withColumn("__cv", Panel.ffill(cv0))

    // weights → integer quantities (base.py:952-956)
    val safeCv = abs(when(col("__cv") =!= 0, col("__cv")))
    p = p.withColumn(
      "__qty",
      coalesce(round(col("weight") * lit(nlvValue) / safeCv), lit(0.0)))

    // clamp (base.py:959-966)
    maxLong.foreach { ml =>
      p = p.join(ml.select(col(k.sid), col(k.dateCol), abs(col("max_quantity")).as("__maxL")),
        Seq(k.sid, k.dateCol), "left")
      p = p.withColumn("__qty",
        when(col("__maxL").isNotNull && col("__qty") > col("__maxL"), col("__maxL"))
          .otherwise(col("__qty")))
        .drop("__maxL")
    }
    maxShort.foreach { ms =>
      p = p.join(ms.select(col(k.sid), col(k.dateCol), (-abs(col("max_quantity"))).as("__maxS")),
        Seq(k.sid, k.dateCol), "left")
      p = p.withColumn("__qty",
        when(col("__maxS").isNotNull && col("__qty") < col("__maxS"), col("__maxS"))
          .otherwise(col("__qty")))
        .drop("__maxS")
    }

    // back to weights (base.py:969-971)
    p.withColumn("weight", col("__qty") * col("__cv") / lit(nlvValue))
      .drop("__cv", "__qty", "secType", "priceMagnifier", "multiplier")
  }

  /** D17 trade-side limiter (reference base.py:1738-1758): clamp the
    * (sid, account) target quantities to the signal-date slice of the
    * long/short max-quantity panels — longs capped at +|max|, shorts at
    * −|max|. The day's slice is one row per sid (≤ the trading universe),
    * so it broadcasts; the per-sid limit fans across accounts through the
    * equi-join, exactly as the reference applies one limit column to every
    * allocation (base.py:1744-1746). Intraday limit panels are sliced at
    * the exact signal time (`.loc[self._signal_time]`, base.py:1741). */
  def constrainQuantities(
      targets: DataFrame,
      maxLong: Option[DataFrame],
      maxShort: Option[DataFrame],
      signalDate: String,
      signalTime: Option[String] = None)(implicit k: Keys): DataFrame = {
    def slice(limits: DataFrame, as: String): DataFrame = {
      val onDate = limits.where(col(k.dateCol) === lit(signalDate))
      val atTime = signalTime match {
        case Some(t) if limits.columns.contains("time") =>
          onDate.where(col("time") === lit(t))
        case _ => onDate
      }
      atTime.select(col(k.sid), abs(col("max_quantity")).as(as))
    }
    var t = targets
    maxLong.foreach { ml =>
      t = t.join(broadcast(slice(ml, "__maxL")), Seq(k.sid), "left")
        .withColumn(
          "target_quantity",
          when(col("__maxL").isNotNull && col("target_quantity") > col("__maxL"),
            col("__maxL")).otherwise(col("target_quantity")))
        .drop("__maxL")
    }
    maxShort.foreach { ms =>
      t = t.join(broadcast(slice(ms, "__maxS")), Seq(k.sid), "left")
        .withColumn(
          "target_quantity",
          when(col("__maxS").isNotNull && col("target_quantity") < -col("__maxS"),
            -col("__maxS")).otherwise(col("target_quantity")))
        .drop("__maxS")
    }
    t
  }
}
