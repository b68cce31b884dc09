package graft.perf

import graft.StableCheckpoint._

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Post-backtest performance measures over the results melt — the
  * aggregate views (cumulative return, drawdown, CAGR, Sharpe) a user of
  * the reference computes from its results CSV with the companion
  * charting package (DailyPerformance-style; the reference engine itself
  * stops at the melt, SURVEY §3.1). Not reference-engine parity — a
  * convenience layer over the `Return` field.
  *
  * Scale shape: ONE hash aggregation collapses the (sid, date) melt to a
  * per-date series — integer-scaled so the cross-sid sum is order-free —
  * and the cumulative/drawdown pass is a single ordered window over that
  * ALREADY-AGGREGATED series (≤ one row per trading date by
  * construction, like the benchmark ffill in Backtest — the unpartitioned
  * window is bounded, not a data-volume sort).
  */
object Performance {

  /** Largest |per-row return| whose pico-scaling stays exact in a long
    * (Long.MaxValue / 1e12 ≈ 9.22e6 — i.e. a 922,000,000% single-day
    * return; anything near it is corrupted input, not a return). */
  private[graft] val MaxAbsReturn: Double = 9.0e6

  /** Per-date portfolio return: the cross-sid sum of the melt's `Return`
    * rows. Summed as integer picos (×1e12, exact in a long for |r| ≤
    * ~10⁶) so the unordered distributed sum is deterministic — a plain
    * double sum differs in the last ulp run-to-run and engine-to-engine.
    * Rows beyond [[MaxAbsReturn]] fail loudly (a corrupted melt should
    * never silently flip sign), and the CROSS-ROW accumulator is
    * decimal(38,0) — several near-bound rows on one date would wrap a
    * long sum even though each row passes the per-row check. */
  /** The per-row pico-scaled Return value with the loud corrupted-input
    * guard — shared by [[dailyReturns]] and the [[vsBenchmark]] one-pass
    * aggregation. */
  private def picoReturn: Column = when(
    abs(col("value")) > MaxAbsReturn,
    raise_error(format_string(
      "Return magnitude %s exceeds the exact pico-summation bound " +
        s"$MaxAbsReturn — corrupted results melt?", col("value"))).cast("long"))
    .otherwise(round(col("value") * 1e12).cast("long"))

  /** The exact cross-row accumulation of [[picoReturn]] back to a double
    * return (decimal(38,0) so near-bound rows can't wrap a long). */
  private def picoSum(pico: Column): Column =
    (sum(pico.cast(org.apache.spark.sql.types.DecimalType(38, 0)))
      .cast("double") / 1e12)

  def dailyReturns(results: DataFrame, dateCol: String = "date"): DataFrame =
    results
      .where(col("field") === "Return")
      .groupBy(col(dateCol))
      .agg(picoSum(picoReturn).as("return"))

  /** Running product of (1 + return) over the date-ordered window —
    * cumprod semantics without a product aggregate: exp∘Σln over |1+r|,
    * sign restored from the running count of negative factors, zero
    * factors pinning the product at 0 from then on. Sign-aware because a
    * leveraged day CAN lose more than 100% (1+r < 0); plain Σlog1p would
    * throw on it. */
  private def withCumFactor(daily: DataFrame, dateCol: String): DataFrame = {
    val w = Window.orderBy(col(dateCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val g = col("return") + 1
    daily
      .withColumn("__lnab", when(g =!= 0, log(abs(g))).otherwise(lit(0.0)))
      .withColumn("__negs", sum(when(g < 0, 1L).otherwise(0L)).over(w))
      .withColumn("__zeros", sum(when(g === 0, 1L).otherwise(0L)).over(w))
      .withColumn(
        "__cum",
        when(col("__zeros") > 0, 0.0).otherwise(
          exp(sum(col("__lnab")).over(w)) *
            (lit(1.0) - pmod(col("__negs"), lit(2)) * 2)))
      .withColumn("__peak", max(col("__cum")).over(w))
      .drop("__lnab", "__negs", "__zeros")
  }

  /** Daily performance series: (date, return, cum_return, drawdown).
    * Drawdown is the drop from the running peak of the compounded
    * curve (null while the peak is 0). */
  def dailySeries(results: DataFrame, dateCol: String = "date"): DataFrame =
    withCumFactor(dailyReturns(results, dateCol), dateCol)
      .select(
        col(dateCol),
        col("return"),
        round(col("__cum") - 1, 6).as("cum_return"),
        round(when(col("__peak") =!= 0, col("__cum") / col("__peak") - 1), 6)
          .as("drawdown"))

  /** Rolling annualized Sharpe over the per-date return series: for each
    * date, mean/std of the trailing `window` returns × √periodsPerYear,
    * null until a full window accrues (pandas min_periods semantics,
    * like the W6 family). Ordered ROWS frame over the already-aggregated
    * series — same bounded unpartitioned-window shape as [[dailySeries]]. */
  def rollingSharpe(
      results: DataFrame,
      window: Int,
      dateCol: String = "date",
      periodsPerYear: Int = 252): DataFrame = {
    val w = Window.orderBy(col(dateCol))
      .rowsBetween(-(window - 1), Window.currentRow)
    dailyReturns(results, dateCol)
      .select(
        col(dateCol),
        col("return"),
        round(
          when(count(col("return")).over(w) === window &&
            stddev_samp(col("return")).over(w) =!= 0, // flat window → null
            avg(col("return")).over(w) / stddev_samp(col("return")).over(w) *
              math.sqrt(periodsPerYear.toDouble)), 6)
          .as(s"rolling_sharpe_$window"))
  }

  /** Per-date (return, bench_return) joint series — shared by
    * [[vsBenchmark]] and [[rollingBeta]]. The melt's `Benchmark` rows
    * carry per-date benchmark RETURNS (D19: pct_change of the ffilled
    * benchmark closes), one row per date, combined with the per-date
    * portfolio return in ONE pass over the melt: both series come out
    * of a SINGLE `groupBy(date)` with conditional aggregates — a
    * `dailyReturns ⋈ filter(Benchmark)` join would run the whole
    * upstream backtest lineage once per differently-aliased join input
    * (the planner does not reuse exchanges across them — measured 3.7×
    * on the bench harness). Dates lacking either field drop out,
    * matching the inner join this replaces. Requires ≤ 1 Benchmark row
    * per date (daily results — the D19 contract); several rows per
    * date (an intraday melt) raise rather than silently averaging. */
  private def benchmarkJoined(results: DataFrame, dateCol: String): DataFrame = {
    val isRet = col("field") === "Return"
    val isBench = col("field") === "Benchmark"
    results
      .where(isRet || isBench)
      .groupBy(col(dateCol))
      .agg(
        picoSum(when(isRet, picoReturn)).as("return"),
        max(when(isBench, col("value"))).as("__b"),
        sum(when(isRet, 1L).otherwise(0L)).as("__nr"),
        sum(when(isBench, 1L).otherwise(0L)).as("__nb"))
      .where(col("__nr") > 0 && col("__nb") > 0)
      .withColumn("bench_return",
        when(col("__nb") > 1,
          raise_error(format_string(
            "found %s Benchmark rows on date %s — vsBenchmark needs daily " +
              "results (one Benchmark row per date); aggregate intraday " +
              "results to daily first", col("__nb"), col(dateCol).cast("string")))
            .cast("double"))
          .otherwise(col("__b")))
  }

  /** Benchmark-relative one-row summary over [[benchmarkJoined]]'s
    * joint series: sample beta (cov/var), alpha as the per-period
    * intercept × periodsPerYear, and correlation. Outputs rounded to
    * 6dp (unordered covariance/variance accumulation is engine noise
    * below that). */
  def vsBenchmark(
      results: DataFrame,
      dateCol: String = "date",
      periodsPerYear: Int = 252): DataFrame = {
    benchmarkJoined(results, dateCol)
      .agg(
        count(lit(1)).as("n_days"),
        covar_samp(col("return"), col("bench_return")).as("__cv"),
        var_samp(col("bench_return")).as("__vb"),
        avg(col("return")).as("__mur"),
        avg(col("bench_return")).as("__mub"),
        corr(col("return"), col("bench_return")).as("__corr"))
      .select(
        col("n_days"),
        round(when(col("__vb") =!= 0, col("__cv") / col("__vb")), 6).as("beta"),
        round(
          when(col("__vb") =!= 0,
            (col("__mur") - col("__cv") / col("__vb") * col("__mub")) *
              periodsPerYear), 6).as("alpha"),
        round(col("__corr"), 6).as("correlation"))
  }

  /** Rolling sample beta of the portfolio vs the melt's `Benchmark`
    * rows: for each date, cov/var over the trailing `window` joint
    * observations, null until a full window accrues or while the
    * benchmark variance is 0 (a flat-benchmark window has no defined
    * beta) — the [[rollingSharpe]] min_periods stance. Derived from the
    * SAME one-pass per-date aggregation as [[vsBenchmark]]; the rolling
    * pass is an ordered ROWS frame over the already-aggregated series
    * (bounded unpartitioned window, ≤ one row per trading date).
    * Output (date, return, bench_return, rolling_beta_N) rounded to 6
    * (windowed covariance accumulation order is engine noise below
    * that). */
  def rollingBeta(
      results: DataFrame,
      window: Int,
      dateCol: String = "date"): DataFrame = {
    val w = Window.orderBy(col(dateCol))
      .rowsBetween(-(window - 1), Window.currentRow)
    benchmarkJoined(results, dateCol)
      .select(
        col(dateCol),
        col("return"),
        col("bench_return"),
        // + 0.0 normalizes IEEE −0.0 (a tiny negative covariance rounds
        // to −0.0, which hashes differently — the D1 weights lesson)
        (round(
          when(count(lit(1)).over(w) === window &&
            var_samp(col("bench_return")).over(w) =!= 0,
            covar_samp(col("return"), col("bench_return")).over(w) /
              var_samp(col("bench_return")).over(w)), 6) + 0.0)
          .as(s"rolling_beta_$window"))
  }

  /** Per-sid return attribution: each sid's arithmetic contribution to
    * the portfolio's total return (Σ of its Return rows — the additive
    * attribution convention) plus days held and share of the total.
    *
    * ONE conditional aggregation over the melt (the vsBenchmark
    * stance): Return and NetExposure rows fold in the same
    * `groupBy(sid)`. Exactness: contributions accumulate as pico
    * decimals, and the grand total is a decimal window sum over the
    * ALREADY-AGGREGATED per-sid frame (bounded by |sids|, and decimal
    * addition is order-free — no float nondeterminism), so `share` is
    * one per-row IEEE division. */
  def attribution(results: DataFrame, dateCol: String = "date"): DataFrame = {
    val isRet = col("field") === "Return"
    val isNE = col("field") === "NetExposure"
    val perSid = results
      .where(isRet || isNE)
      .groupBy(col("sid"))
      .agg(
        sum(when(isRet, picoReturn).cast(
          org.apache.spark.sql.types.DecimalType(38, 0))).as("__p"),
        sum(when(isNE && col("value") =!= 0, 1L).otherwise(0L)).as("days_held"))
    val total = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    perSid
      .withColumn("__t", sum(col("__p")).over(total))
      .select(
        col("sid"),
        round(col("__p").cast("double") / 1e12, 6).as("contribution"),
        col("days_held"),
        round(when(col("__t") =!= 0,
          col("__p").cast("double") / col("__t").cast("double")), 6).as("share"))
  }

  /** Round-trip trades from the melt: maximal same-sign runs of
    * nonzero NetExposure per sid, with entry/exit dates, length, side,
    * and the trip's arithmetic return. Returns LAG positions in the
    * backtest (D18: today's Return = yesterday's position × today's
    * price move), so the return EARNED by the position held on date d
    * books on the NEXT row — each trip sums `lead(Return)` over its
    * run, in exact picos.
    *
    * Shape: one conditional aggregation collapses the melt to a
    * per-(sid, date) joint frame (one shuffle), two windows ride the
    * same sid hash partitioning, and the final rollup groups by
    * (sid, trip). Daily-results contract like [[vsBenchmark]]. */
  def roundTrips(results: DataFrame, dateCol: String = "date"): DataFrame = {
    val isRet = col("field") === "Return"
    val isNE = col("field") === "NetExposure"
    val joint = results
      .where(isRet || isNE)
      .groupBy(col("sid"), col(dateCol))
      .agg(
        max(when(isNE, col("value"))).as("__ne"),
        sum(when(isRet, picoReturn)).as("__pr"))
    val w = Window.partitionBy(col("sid")).orderBy(col(dateCol))
    val sgn = when(coalesce(col("__ne"), lit(0.0)) > 0, 1)
      .when(coalesce(col("__ne"), lit(0.0)) < 0, -1).otherwise(0)
    val trips = joint
      .withColumn("__fwd", lead(col("__pr"), 1).over(w))
      .withColumn("__sgn", sgn)
      .withColumn("__start",
        when(col("__sgn") =!= 0 &&
          coalesce(lag(col("__sgn"), 1).over(w), lit(0)) =!= col("__sgn"), 1L)
          .otherwise(0L))
      .withColumn("__trip", sum(col("__start")).over(w))
    trips
      .where(col("__sgn") =!= 0)
      .groupBy(col("sid"), col("__trip").as("trip"))
      .agg(
        min(col(dateCol)).as("entry_date"),
        max(col(dateCol)).as("exit_date"),
        count(lit(1)).as("n_days"),
        max(when(col("__sgn") > 0, "long").otherwise("short")).as("side"),
        (sum(col("__fwd").cast(
          org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast("double") / 1e12).as("__r"))
      .select(
        col("sid"), col("trip"), col("entry_date"), col("exit_date"),
        col("n_days"), col("side"), round(col("__r"), 6).as("trip_return"))
  }

  /** Calendar-month compounded returns over the per-date series:
    * Π(1+r) − 1 per month, with the [[withCumFactor]] sign/zero rules
    * (a > 100% loss flips the product's sign; a −100% day pins the
    * month at −1). The log-space sum is micro-nat-quantized (×10¹²,
    * rounded to integer, decimal accumulator) so the unordered
    * distributed sum is EXACT — a plain double Σln differs in the last
    * ulp run-to-run (the unigram-LM lesson). One hash aggregation over
    * the per-date series (itself one agg over the melt); no windows.
    * Output (month, n_days, monthly_return round 6). */
  def monthlyReturns(results: DataFrame, dateCol: String = "date"): DataFrame = {
    val g = col("return") + 1
    dailyReturns(results, dateCol)
      .groupBy(trunc(col(dateCol), "month").as("month"))
      .agg(
        count(lit(1)).as("n_days"),
        (sum(when(g =!= 0, round(log(abs(g)) * 1e12).cast("long")).otherwise(0L)
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast("double") / 1e12).as("__lnsum"),
        sum(when(g < 0, 1L).otherwise(0L)).as("__negs"),
        sum(when(g === 0, 1L).otherwise(0L)).as("__zeros"))
      .select(
        col("month"),
        col("n_days"),
        round(
          when(col("__zeros") > 0, -1.0).otherwise(
            exp(col("__lnsum")) *
              (lit(1.0) - pmod(col("__negs"), lit(2)) * 2) - 1), 6)
          .as("monthly_return"))
  }

  /** Risk-ratio one-row summary: annualized volatility (σ×√P), Sortino
    * (mean over downside deviation × √P, rf = 0, downside deviation as
    * the root mean square of the NEGATIVE returns over ALL periods —
    * the common convention), Calmar (CAGR / |max drawdown|), and hit
    * rate (fraction of positive days — exact integer count ratio).
    * Same bounded shape as [[summary]]: one hash agg over the per-date
    * series; outputs rounded to 6 (unordered float accumulation is
    * engine noise below that, the vsBenchmark stance). Sortino is null
    * for an all-non-negative series (no downside), Calmar null when
    * CAGR is undefined or the curve never drew down. */
  def ratios(
      results: DataFrame,
      dateCol: String = "date",
      periodsPerYear: Int = 252): DataFrame = {
    val p = periodsPerYear.toDouble
    val series = withCumFactor(dailyReturns(results, dateCol), dateCol)
      .withColumn("__dd",
        when(col("__peak") =!= 0, col("__cum") / col("__peak") - 1))
    series
      .agg(
        count(lit(1)).as("n_days"),
        max_by(col("__cum"), col(dateCol)).as("__end"),
        avg(col("return")).as("__mu"),
        stddev_samp(col("return")).as("__sigma"),
        avg(pow(least(col("return"), lit(0.0)), 2)).as("__dvar"),
        min(col("__dd")).as("__mdd"),
        sum(when(col("return") > 0, 1L).otherwise(0L)).as("__wins"))
      .select(
        col("n_days"),
        round(col("__sigma") * math.sqrt(p), 6).as("ann_volatility"),
        round(when(col("__dvar") > 0,
          col("__mu") / sqrt(col("__dvar")) * math.sqrt(p)), 6).as("sortino"),
        round(when(col("__mdd") < 0 && col("__end") > 0,
          (pow(col("__end"), lit(p) / col("n_days")) - 1) / -col("__mdd")), 6)
          .as("calmar"),
        round(col("__wins").cast("double") / col("n_days"), 6).as("hit_rate"))
  }

  /** Historical VaR/CVaR one-row summary at `confidence` (default 95%):
    * VaR is the exact linear-interpolated `1 − confidence` quantile of
    * the per-date return series (Spark `percentile` ≡ DuckDB
    * `quantile_cont` — the winsorize lesson), CVaR (expected shortfall)
    * the mean of the tail at or below it. The quantile rides a BOUNDED
    * unpartitioned window over the already-aggregated series (≤ one row
    * per trading date, the [[dailySeries]] stance), and the tail mean
    * re-quantizes the pico-exact returns to integers so the unordered
    * sum is deterministic; only the final division is IEEE. The tail is
    * never empty (the minimum return is ≤ any quantile). Outputs
    * (n_days, var_NN, cvar_NN) rounded to 6dp — interpolation libm
    * noise is below that. */
  def valueAtRisk(
      results: DataFrame,
      dateCol: String = "date",
      confidence: Double = 0.95): DataFrame = {
    require(confidence > 0 && confidence < 1,
      s"confidence must be in (0, 1): $confidence")
    val tag = math.round(confidence * 100).toString
    val whole = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    dailyReturns(results, dateCol)
      .withColumn("__v", percentile(col("return"), lit(1 - confidence)).over(whole))
      .agg(
        count(lit(1)).as("n_days"),
        round(max(col("__v")), 6).as(s"var_$tag"),
        round(
          sum(when(col("return") <= col("__v"),
            round(col("return") * 1e12).cast("long"))
            .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
            .cast("double") /
            sum(when(col("return") <= col("__v"), 1L).otherwise(0L)) / 1e12,
          6).as(s"cvar_$tag"))
  }

  /** Drawdown-episode table: maximal runs of underwater dates (compounded
    * curve below its running peak) with entry/trough/recovery dates,
    * length, and depth. Episode boundaries come from a running count of
    * NON-underwater dates (island detection — no self-join); the trough
    * is the episode's minimum ROUNDED drawdown, earliest date on ties:
    * selecting by the raw float would be cross-engine nondeterministic
    * when two dates sit within a libm ulp (the 6dp-rounding stance
    * applied to the ARGMIN, not just the output). Episodes are numbered
    * 1..k by start date. All windows are bounded by the per-date series
    * (≤ one row per trading date); depth rounds to 6dp. */
  def drawdowns(results: DataFrame, dateCol: String = "date"): DataFrame = {
    val ordered = Window.orderBy(col(dateCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val series = withCumFactor(dailyReturns(results, dateCol), dateCol)
      .withColumn("__dd",
        when(col("__peak") =!= 0, col("__cum") / col("__peak") - 1))
      .withColumn("__under",
        col("__dd").isNotNull && col("__dd") < 0)
      .withColumn("__isl",
        sum(when(col("__under"), 0L).otherwise(1L)).over(ordered))
    val episodes = series
      .where(col("__under"))
      .withColumn("__rdd", round(col("__dd"), 6))
      .groupBy(col("__isl"))
      .agg(
        min(col(dateCol)).as("start_date"),
        min_by(col(dateCol), struct(col("__rdd"), col(dateCol)))
          .as("trough_date"),
        max(col(dateCol)).as("end_date"),
        count(lit(1)).as("n_days"),
        min(col("__rdd")).as("depth"))
    episodes
      .select(
        row_number().over(Window.orderBy(col("start_date")))
          .cast("long").as("episode"),
        col("start_date"), col("trough_date"), col("end_date"),
        col("n_days"), col("depth"))
  }

  /** Volatility-targeting series: trailing realized vol of the per-date
    * portfolio return (annualized sample stddev over `window` dates,
    * null until a full window accrues — min_periods) and the exposure
    * scale for EACH date computed from the window ending the PRIOR
    * date (lagged one day, so the scale is tradeable — no lookahead).
    * scale = target/realized clamped to `maxLeverage`; a zero-vol
    * window scales at the clamp; dates with no usable trailing window
    * scale 1.0 (unscaled). Multiply a weight panel by `scale` joined
    * on date to get vol-targeted weights.
    *
    * The scale derives from the ROUNDED realized vol, so both sides of
    * the division are identical in any engine (the rolling-Sharpe 6dp
    * stance applied to an input, not just an output). Bounded
    * unpartitioned window over the per-date series, like
    * [[dailySeries]]. */
  def volTargetScale(
      results: DataFrame,
      targetVol: Double,
      window: Int,
      dateCol: String = "date",
      periodsPerYear: Int = 252,
      maxLeverage: Double = 3.0): DataFrame = {
    require(targetVol > 0, s"targetVol must be positive: $targetVol")
    require(window >= 2, s"window must be >= 2: $window")
    require(maxLeverage > 0, s"maxLeverage must be positive: $maxLeverage")
    val w = Window.orderBy(col(dateCol))
      .rowsBetween(-(window - 1), Window.currentRow)
    val ordered = Window.orderBy(col(dateCol))
    dailyReturns(results, dateCol)
      .withColumn("realized_vol",
        round(when(count(col("return")).over(w) === window,
          stddev_samp(col("return")).over(w) *
            math.sqrt(periodsPerYear.toDouble)), 6))
      .withColumn("__pv", lag(col("realized_vol"), 1).over(ordered))
      .withColumn("scale",
        coalesce(
          when(col("__pv") > 0,
            round(least(lit(targetVol) / col("__pv"), lit(maxLeverage)), 6))
            .when(col("__pv") === 0, lit(maxLeverage)),
          lit(1.0)))
      .drop("__pv")
  }

  /** One-row summary: n_days, total_return, CAGR (trading-day
    * annualization: (1+total)^(periodsPerYear/n) − 1), annualized Sharpe
    * (mean/std × √periodsPerYear, rf = 0), max drawdown. Outputs rounded
    * to 6 decimals — the last-ulp noise of avg/stddev/exp is engine-
    * dependent; the rounded values are not. */
  def summary(
      results: DataFrame,
      dateCol: String = "date",
      periodsPerYear: Int = 252): DataFrame = {
    val series = withCumFactor(dailyReturns(results, dateCol), dateCol)
      .withColumn("__dd",
        when(col("__peak") =!= 0, col("__cum") / col("__peak") - 1))
    series
      .agg(
        count(lit(1)).as("n_days"),
        max_by(col("__cum"), col(dateCol)).as("__end"),
        avg(col("return")).as("__mu"),
        stddev_samp(col("return")).as("__sigma"),
        min(col("__dd")).as("__mdd"))
      .select(
        col("n_days"),
        round(col("__end") - 1, 6).as("total_return"),
        // annualized growth is undefined once the compounded value goes
        // non-positive (a >100% loss happened) — null, not NaN
        round(when(col("__end") > 0,
          pow(col("__end"), lit(periodsPerYear.toDouble) / col("n_days")) - 1), 6)
          .as("cagr"),
        round(col("__mu") / col("__sigma") * math.sqrt(periodsPerYear.toDouble), 6)
          .as("sharpe"),
        round(col("__mdd"), 6).as("max_drawdown"))
  }

  /** Sharpe ratio with Lo's (2002) IID standard error and 95% CI —
    * the statistic every track-record comparison needs next to the
    * point estimate ("is 1.2 vs 0.9 even distinguishable at n=252?"):
    * SE(ŜR) = √((1 + ŜR²/2)/n) per period, annualized like the ratio.
    * Daily moments come from pico-quantized exact integer sums (the
    * captureRatios discipline — `summary`'s avg/stddev is absorbed by
    * 6dp rounding, but the CI arithmetic stacks three operations on
    * them, so the inputs are exact here). One melt pass, one
    * aggregation. Null when n < 2 or σ = 0.
    * Output (n_days, sharpe, se, ci_lo, ci_hi), all annualized. */
  def sharpeConfidence(
      results: DataFrame,
      dateCol: String = "date",
      periodsPerYear: Int = 252): DataFrame = {
    val dec = "decimal(38,0)"
    val ann = math.sqrt(periodsPerYear.toDouble)
    dailyReturns(results, dateCol)
      .select(round(col("return") * 1e12).cast(dec).as("__p"))
      .agg(
        count(lit(1)).as("n_days"),
        sum(col("__p")).as("__s"),
        sum(col("__p") * col("__p")).as("__ss"))
      .select(Seq(col("n_days")) ++ {
        val n = col("n_days").cast("double")
        val mup = col("__s").cast("double") / n
        val sgp = sqrt(greatest(
          (col("n_days").cast(dec) * col("__ss") - col("__s") * col("__s"))
            .cast("double") / (n * (col("n_days") - 1).cast("double")),
          lit(0.0)))
        val srD = mup / sgp
        val seD = sqrt((lit(1.0) + srD * srD / 2.0) / n)
        val ok = col("n_days") >= 2 && sgp > 0
        Seq(
          round(when(ok, srD * ann), 6).as("sharpe"),
          round(when(ok, seD * ann), 6).as("se"),
          (round(when(ok, (srD - lit(1.959964) * seD) * ann), 6) + 0.0)
            .as("ci_lo"),
          round(when(ok, (srD + lit(1.959964) * seD) * ann), 6).as("ci_hi"))
      }: _*)
  }

  /** Kelly criterion position fraction f* = μ/σ² over the daily return
    * series (the growth-optimal leverage; half-Kelly is what anyone
    * actually runs) — same pico-exact moment sums as
    * [[sharpeConfidence]], one aggregation. Null when n < 2 or σ = 0.
    * Output (n_days, kelly, half_kelly). */
  def kellyFraction(
      results: DataFrame,
      dateCol: String = "date"): DataFrame = {
    val dec = "decimal(38,0)"
    dailyReturns(results, dateCol)
      .select(round(col("return") * 1e12).cast(dec).as("__p"))
      .agg(
        count(lit(1)).as("n_days"),
        sum(col("__p")).as("__s"),
        sum(col("__p") * col("__p")).as("__ss"))
      .select(Seq(col("n_days")) ++ {
        val n = col("n_days").cast("double")
        val mu = col("__s").cast("double") / n / 1e12
        val vr = (col("n_days").cast(dec) * col("__ss") -
          col("__s") * col("__s")).cast("double") /
          (n * (col("n_days") - 1).cast("double")) / 1e24
        val ok = col("n_days") >= 2 && vr > 0
        Seq(
          (round(when(ok, mu / vr), 6) + 0.0).as("kelly"),
          (round(when(ok, mu / vr / 2.0), 6) + 0.0).as("half_kelly"))
      }: _*)
  }

  /** Up-/down-capture ratios vs the melt's `Benchmark` rows: mean
    * portfolio return on benchmark-up days over mean benchmark return
    * on those days (and the down-day analogue) — the institutional
    * "does it keep up in rallies / protect in selloffs" pair. Because
    * both sides divide by the same day count, each capture is the
    * RATIO OF EXACT PICO SUMS (returns re-quantized per row before the
    * conditional sums), so the only double op is one division per
    * ratio (6dp). Flat-benchmark days (b = 0) belong to neither side.
    * Null when a side has no days or a zero benchmark sum. */
  def captureRatios(results: DataFrame, dateCol: String = "date"): DataFrame = {
    val dec = "decimal(38,0)"
    def pico(c: Column) = round(c * 1e12).cast(dec)
    benchmarkJoined(results, dateCol)
      .select(col("return").as("__r"), col("bench_return").as("__b"))
      .agg(
        sum(when(col("__b") > 0, 1L).otherwise(0L)).as("n_up"),
        sum(when(col("__b") > 0, pico(col("__r")))).as("__ru"),
        sum(when(col("__b") > 0, pico(col("__b")))).as("__bu"),
        sum(when(col("__b") < 0, 1L).otherwise(0L)).as("n_down"),
        sum(when(col("__b") < 0, pico(col("__r")))).as("__rd"),
        sum(when(col("__b") < 0, pico(col("__b")))).as("__bd"))
      .select(
        col("n_up"), col("n_down"),
        (round(when(col("n_up") > 0 && col("__bu") =!= 0,
          col("__ru").cast("double") / col("__bu").cast("double")), 6) + 0.0)
          .as("up_capture"),
        (round(when(col("n_down") > 0 && col("__bd") =!= 0,
          col("__rd").cast("double") / col("__bd").cast("double")), 6) + 0.0)
          .as("down_capture"))
  }

  /** Multi-strategy portfolio combination: the per-date weighted sum of
    * each strategy's portfolio return — allocating a book across
    * backtests the way the reference's Moonchart notebooks combine
    * results CSVs. Each melt collapses through [[dailyReturns]] (exact
    * pico sums), the tagged union groups by date ONCE, and the k
    * per-strategy returns combine in FIXED column order (k is the
    * strategy count — a handful — so the fold is per-row arithmetic,
    * deterministic in any engine). A date missing from a strategy
    * contributes 0 (that book simply wasn't trading). Output (date,
    * ret_0…ret_{k−1}, combined_return round 6). */
  def combineReturns(
      strategies: Seq[(DataFrame, Double)],
      dateCol: String = "date"): DataFrame = {
    require(strategies.nonEmpty, "need at least one strategy")
    val tagged = strategies.zipWithIndex.map { case ((melt, _), i) =>
      dailyReturns(melt, dateCol)
        .select(col(dateCol), lit(i).as("__k"), col("return"))
    }.reduce(_ unionByName _)
    val perStrat = strategies.indices.map(i =>
      max(when(col("__k") === i, col("return"))).as(s"ret_$i"))
    val combined = strategies.zipWithIndex
      .map { case ((_, w), i) => coalesce(col(s"ret_$i"), lit(0.0)) * w }
      .reduce(_ + _)
    tagged
      .groupBy(col(dateCol))
      .agg(perStrat.head, perStrat.tail: _*)
      .withColumn("combined_return", round(combined, 6) + 0.0)
  }

  /** Risk-parity combination of strategy books: [[combineReturns]]
    * with the weights DERIVED — each book weighted ∝ 1/σ of its own
    * per-date return series, normalized to sum 1 (the equal-risk,
    * not equal-dollar, allocation every multi-strategy desk defaults
    * to). Each σ is the 6dp-rounded full-sample stddev and the
    * inverse-vol normalizer is an exact micro-integer ratio (the D27
    * inverseVolWeights discipline), so every weight is one division
    * of exact ints. The per-book vol frame is BOUNDED (k rows) — the
    * zero/degenerate-σ probe is a bounded driver action (the
    * requireFresh cost class) raising [[graft.ParameterError]]
    * loudly: a flat book would otherwise take infinite weight.
    * Output (date, ret_0…ret_{k−1}, weight_0…, combined_return). */
  def riskParityCombine(
      strategies: Seq[DataFrame],
      dateCol: String = "date"): DataFrame = {
    require(strategies.size >= 2, "need at least two strategy books")
    // the tagged union of every book's per-date series feeds BOTH the
    // vol probe and the blend — ONE lazy checkpoint, so all k backtest
    // melt pipelines materialize together in the probe job (per-book
    // sequential `.head` probes serialized k melt materializations on
    // the driver: measured 4.0 → ~1.7 s on the bench, the port1 shape
    // plus one bounded k-row probe)
    // plain (AQE-on) capture, the pagerank stable=false rationale: the
    // frame is tiny (dates × k rows), both consumers re-key it (groupBy
    // __k / groupBy date), and the k-backtest segment benefits from
    // AQE's runtime coalescing far more than from a declared
    // partitioning nobody downstream consumes
    val tagged = strategies.zipWithIndex.map { case (m, i) =>
      dailyReturns(m, dateCol)
        .select(col(dateCol), lit(i).as("__k"), col("return"))
    }.reduce(_ unionByName _).localCheckpoint(false)
    // bounded driver action: k rows, one grouped stddev job
    val volMap = tagged.groupBy(col("__k"))
      .agg(round(stddev_samp(col("return")), 6).as("v"))
      .collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    val vols = strategies.indices.map { i =>
      volMap.getOrElse(i, None) match {
        case Some(v) if v > 0 => v
        case bad =>
          throw new graft.ParameterError(
            s"strategy $i has degenerate volatility " +
              s"${bad.fold("null")(_.toString)} — " +
              "risk parity undefined for a flat book")
      }
    }
    val ivq = vols.map(v => math.round(1e6 / v))
    val total = ivq.sum.toDouble
    val weights = ivq.map(_ / total)
    val perStrat = strategies.indices.map(i =>
      max(when(col("__k") === i, col("return"))).as(s"ret_$i"))
    val combined = weights.zipWithIndex
      .map { case (w, i) => coalesce(col(s"ret_$i"), lit(0.0)) * w }
      .reduce(_ + _)
    val out = tagged
      .groupBy(col(dateCol))
      .agg(perStrat.head, perStrat.tail: _*)
      .withColumn("combined_return", round(combined, 6) + 0.0)
    weights.zipWithIndex.foldLeft(out) { case (df, (w, i)) =>
      df.withColumn(s"weight_$i", round(lit(w), 6))
    }
  }

  /** Active-return one-row summary vs the melt's `Benchmark` rows: the
    * benchmark-relative COUNTERPART of [[vsBenchmark]] (beta/alpha view)
    * — annualized active return (mean excess × periodsPerYear), tracking
    * error (stddev of excess × √periodsPerYear), and information ratio
    * (their per-period ratio). Same shape as [[vsBenchmark]]: the ONE
    * [[benchmarkJoined]] per-date pass feeds a single bounded
    * aggregation; 6dp rounding absorbs the unordered avg/stddev
    * accumulation ulps (the vsBenchmark precedent). Null TE/IR on a
    * single-day series (stddev_samp undefined) or flat excess (IR only). */
  def activeStats(
      results: DataFrame,
      dateCol: String = "date",
      periodsPerYear: Int = 252): DataFrame = {
    benchmarkJoined(results, dateCol)
      .select((col("return") - col("bench_return")).as("__a"))
      .agg(
        count(lit(1)).as("n_days"),
        avg(col("__a")).as("__mu"),
        stddev_samp(col("__a")).as("__sd"))
      .select(
        col("n_days"),
        // + 0.0 normalizes IEEE −0.0 (the rollingBeta lesson)
        (round(col("__mu") * periodsPerYear, 6) + 0.0).as("active_return_ann"),
        round(col("__sd") * math.sqrt(periodsPerYear.toDouble), 6)
          .as("tracking_error"),
        (round(when(col("__sd") =!= 0,
          col("__mu") / col("__sd") * math.sqrt(periodsPerYear.toDouble)), 6) + 0.0)
          .as("info_ratio"))
  }

  /** Omega ratio at `threshold` (default 0): Σ(r−τ)⁺ / Σ(τ−r)⁺ over the
    * per-date return series — the gain/loss-mass ratio that, unlike
    * Sharpe, uses the WHOLE distribution rather than its first two
    * moments. Both sums are EXACT pico sums (per-row excess re-quantized
    * ×10¹², decimal-accumulated) so the only IEEE op is the one final
    * division — the [[captureRatios]] stance. Null when there are no
    * sub-threshold days (the ratio diverges). One bounded hash agg over
    * the per-date series. Output (n_days, n_above, n_below, omega). */
  def omegaRatio(
      results: DataFrame,
      threshold: Double = 0.0,
      dateCol: String = "date"): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val r = col("return")
    dailyReturns(results, dateCol)
      .agg(
        count(lit(1)).as("n_days"),
        sum(when(r > threshold, 1L).otherwise(0L)).as("n_above"),
        sum(when(r < threshold, 1L).otherwise(0L)).as("n_below"),
        sum(when(r > threshold,
          round((r - threshold) * 1e12).cast("long")).otherwise(0L)
          .cast(dec)).as("__g"),
        sum(when(r < threshold,
          round((lit(threshold) - r) * 1e12).cast("long")).otherwise(0L)
          .cast(dec)).as("__l"))
      .select(
        col("n_days"), col("n_above"), col("n_below"),
        round(when(col("__l") =!= 0,
          col("__g").cast("double") / col("__l").cast("double")), 6)
          .as("omega"))
  }

  /** Ulcer index and Martin ratio: the root-mean-square drawdown of the
    * compounded curve (Peter Martin's pain measure — depth × duration
    * sensitive, unlike max drawdown's single worst point) and
    * CAGR / ulcer. Each date's drawdown is ROUNDED to 6dp before
    * squaring (the [[drawdowns]] argmin stance: the raw exp∘Σln curve
    * differs cross-engine in the last ulp, the rounded one doesn't),
    * then micro-quantized so the mean of squares is an exact decimal
    * sum — the only IEEE ops are the final sqrt and division. Dates
    * with an undefined drawdown (running peak pinned at 0 — the curve
    * hit a −100% day) are excluded from the mean. Martin is null when
    * the curve never drew down or CAGR is undefined ([[summary]]'s
    * rule). Bounded windows over the per-date series only. */
  def ulcerIndex(
      results: DataFrame,
      dateCol: String = "date",
      periodsPerYear: Int = 252): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val ddMicro = round(round(
      when(col("__peak") =!= 0, col("__cum") / col("__peak") - 1), 6) * 1e6)
      .cast("long")
    withCumFactor(dailyReturns(results, dateCol), dateCol)
      .withColumn("__ddu", ddMicro)
      .agg(
        count(lit(1)).as("n_days"),
        count(col("__ddu")).as("__nd"),
        max_by(col("__cum"), col(dateCol)).as("__end"),
        sum(col("__ddu").cast(dec) * col("__ddu").cast(dec)).as("__sq"))
      .select(
        col("n_days"),
        round(sqrt(col("__sq").cast("double") / col("__nd")) / 1e6, 6)
          .as("ulcer_index"),
        round(when(col("__sq") > 0 && col("__end") > 0,
          (pow(col("__end"),
            lit(periodsPerYear.toDouble) / col("n_days")) - 1) /
            (sqrt(col("__sq").cast("double") / col("__nd")) / 1e6)), 6)
          .as("martin_ratio"))
  }

  /** Longest win/loss streaks over the per-date return series: maximal
    * runs of consecutive positive (negative) days — island detection on
    * the return's sign, the [[drawdowns]] pattern, so no self-join. Flat
    * days (r = 0) break both kinds of streak. All-integer outputs — no
    * float path at all. Two bounded passes over the per-date series
    * (≤ one row per trading date). Output one row
    * (n_days, max_win_streak, max_loss_streak). */
  def streaks(results: DataFrame, dateCol: String = "date"): DataFrame = {
    val ordered = Window.orderBy(col(dateCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sgn = when(col("return") > 0, 1).when(col("return") < 0, -1)
      .otherwise(0)
    dailyReturns(results, dateCol)
      .withColumn("__sgn", sgn)
      .withColumn("__brk",
        when(coalesce(lag(col("__sgn"), 1).over(Window.orderBy(col(dateCol))),
          lit(99)) =!= col("__sgn"), 1L).otherwise(0L))
      .withColumn("__run", sum(col("__brk")).over(ordered))
      .groupBy(col("__run"))
      .agg(max(col("__sgn")).as("__s"), count(lit(1)).as("__len"))
      .agg(
        sum(col("__len")).as("n_days"),
        coalesce(max(when(col("__s") === 1, col("__len"))), lit(0L))
          .as("max_win_streak"),
        coalesce(max(when(col("__s") === -1, col("__len"))), lit(0L))
          .as("max_loss_streak"))
  }

  /** Per-sid risk contributions: each sid's share of portfolio
    * variance (covariance attribution — shares sum to 1 over a dense
    * melt) and its correlation to the portfolio — "which names
    * actually drive the book's risk", the variance-side complement of
    * [[attribution]]'s return shares. Computed as one pass over the
    * melt's Return rows joined to the per-date portfolio return
    * (bounded frame → broadcast), then a per-sid aggregation using
    * the explicit raw-moment algebra ([[momentStats]]' stance — the
    * only formulation both engines mirror exactly); population
    * moments, so the shares telescope exactly. Null share/corr when
    * the portfolio (or the sid) is flat. Output
    * (sid, n_days, risk_share, corr_port), 6dp. */
  def riskContributions(results: DataFrame, dateCol: String = "date"): DataFrame = {
    val rs = results
      .where(col("field") === "Return")
      .select(col("sid"), col(dateCol), col("value").as("__r"))
    val daily = dailyReturns(results, dateCol)
      .select(col(dateCol), col("return").as("__p"))
    rs
      .join(broadcast(daily), Seq(dateCol))
      .groupBy(col("sid"))
      .agg(
        count(lit(1)).as("n_days"),
        avg(col("__r")).as("__mi"),
        avg(col("__p")).as("__mp"),
        avg(col("__r") * col("__p")).as("__aip"),
        avg(col("__r") * col("__r")).as("__aii"),
        avg(col("__p") * col("__p")).as("__app"))
      .withColumn("__cov", col("__aip") - col("__mi") * col("__mp"))
      .withColumn("__vp", col("__app") - col("__mp") * col("__mp"))
      .withColumn("__vi", col("__aii") - col("__mi") * col("__mi"))
      .select(
        col("sid"), col("n_days"),
        (round(when(col("__vp") > 0, col("__cov") / col("__vp")), 6) + 0.0)
          .as("risk_share"),
        (round(when(col("__vp") > 0 && col("__vi") > 0,
          col("__cov") / sqrt(col("__vi") * col("__vp"))), 6) + 0.0)
          .as("corr_port"))
  }

  /** Financing (margin-interest) cost series: each date charges
    * (gross_leverage − `threshold`)⁺ · rate · days/360 — the broker
    * interest on the borrowed fraction of the book (a 2× book pays
    * carry on the 1× it borrowed; the D14 borrow fee covers the short
    * side's stock loan, this covers the CASH). Gross leverage is the
    * per-date sum of the melt's `AbsExposure` rows, micro-quantized so
    * the cross-sid sum is exact; `days` is the calendar gap since the
    * previous results date (weekends charge 3×, the D14/W9
    * convention; the first date charges 1). One hash agg + one
    * bounded lag window. Output (date, gross_leverage, days,
    * financing), 6dp. */
  def financingCosts(
      results: DataFrame,
      rate: Double,
      threshold: Double = 1.0,
      dateCol: String = "date"): DataFrame = {
    require(rate >= 0, s"rate must be >= 0: $rate")
    require(threshold >= 0, s"threshold must be >= 0: $threshold")
    val w = Window.orderBy(col(dateCol))
    results
      .where(col("field") === "AbsExposure")
      .groupBy(col(dateCol))
      // null AbsExposure (the first date's undefined lag position)
      // counts as zero leverage, not a null gross
      .agg((sum(coalesce(round(col("value") * 1e6).cast("long"), lit(0L)))
        .cast("double") / 1e6).as("__g"))
      .withColumn("days",
        coalesce(datediff(col(dateCol), lag(col(dateCol), 1).over(w)),
          lit(1)).cast("long"))
      .select(
        col(dateCol),
        round(col("__g"), 6).as("gross_leverage"),
        col("days"),
        round(greatest(col("__g") - threshold, lit(0.0)) * rate *
          col("days") / 360.0, 6).as("financing"))
  }

  /** Lead-lag cross-correlation vs the melt's Benchmark rows:
    * corr(r_t, b_{t−ℓ}) for ℓ ∈ [−maxLag, maxLag] — positive ℓ means
    * the benchmark LEADS the portfolio (a peak off ℓ = 0 is either
    * stale pricing or a genuinely lagged strategy; contemporaneous-only
    * beta misses both). ONE pass: all 2·maxLag + 1 shifts are window
    * expressions over the SAME ordered frame (one Window exec, one
    * sort of the bounded per-date series), unpivoted with `inline`
    * into (lag, __bl) rows and aggregated per lag — the 7-jobs-unioned
    * formulation this replaces re-derived the joint frame once per lag
    * (query wall-clock is dominated by the upstream backtest either
    * way at bench SF; the win is 7× fewer scans/jobs, which is what
    * scales). Engine `corr` ignores null pairs,
    * so the shifted edge rows drop per-lag exactly as the old
    * per-lag isNotNull filter did; n counts non-null shifts. 6dp
    * (the vsBenchmark precedent). Output (lag, n, ccf). */
  def crossCorrelation(
      results: DataFrame,
      maxLag: Int = 3,
      dateCol: String = "date"): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1: $maxLag")
    val joint = benchmarkJoined(results, dateCol)
      .select(col(dateCol), col("return").as("__r"),
        col("bench_return").as("__b"))
    val w = Window.orderBy(col(dateCol))
    // two projections: window functions can't sit inside a generator's
    // arguments, so shifts materialize as columns first, then unpivot
    val withShifts = joint.select(
      col("__r") +: (-maxLag to maxLag).map { l =>
        (if (l >= 0) lag(col("__b"), l).over(w)
         else lead(col("__b"), -l).over(w)).as(s"__b$l")
      }: _*)
    withShifts
      .select(col("__r"), inline(array((-maxLag to maxLag).map(l =>
        struct(lit(l.toLong).as("lag"), col(s"__b$l").as("__bl"))): _*)))
      .groupBy(col("lag"))
      .agg(
        count(col("__bl")).as("n"),
        (round(corr(col("__r"), col("__bl")), 6) + 0.0).as("ccf"))
  }

  /** Day-of-week seasonality of the per-date return series: mean
    * return and hit rate per weekday (1 = Monday … 7 = Sunday — ISO
    * numbering, NOT the engine's locale-dependent dayofweek). The mean
    * divides the exact per-weekday pico sum by the day count and
    * rounds the INTEGER quotient before scaling (the VWAP .5-boundary
    * lesson); the hit rate gets the same treatment at micro scale.
    * One bounded hash agg over the per-date series (≤ 7 output rows).
    * Output (day_of_week, n_days, mean_return, hit_rate). */
  def seasonality(results: DataFrame, dateCol: String = "date"): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    dailyReturns(results, dateCol)
      .groupBy((weekday(col(dateCol)) + 1).cast("long").as("day_of_week"))
      .agg(
        count(lit(1)).as("n_days"),
        sum(round(col("return") * 1e12).cast("long").cast(dec)).as("__s"),
        sum(when(col("return") > 0, 1L).otherwise(0L)).as("__w"))
      .select(
        col("day_of_week"), col("n_days"),
        (round(col("__s").cast("double") / col("n_days")) / 1e12 + 0.0)
          .as("mean_return"),
        (round(col("__w").cast("double") * 1e6 / col("n_days")) / 1e6)
          .as("hit_rate"))
  }

  /** Per-date portfolio concentration from the melt's `AbsWeight`
    * rows: the Herfindahl–Hirschman index Σ|wᵢ|² and its reciprocal,
    * the effective number of positions — "the book says 50 names but
    * is really 7 bets" as a daily series. Weights are micro-quantized
    * before squaring, so the HHI is an exact integer ratio under any
    * partitioning and 1/HHI divides the SAME exact sum (no
    * rounded-then-inverted drift). Dates with no nonzero weight emit
    * hhi 0 and a null effective_n. ONE hash aggregation over the melt
    * — the [[dailyReturns]] shape. */
  def concentration(results: DataFrame, dateCol: String = "date"): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val wMicro = round(col("value") * 1e6).cast("long").cast(dec)
    results
      .where(col("field") === "AbsWeight")
      .groupBy(col(dateCol))
      .agg(
        sum(when(col("value") =!= 0, 1L).otherwise(0L)).as("n_positions"),
        sum(wMicro * wMicro).as("__s"))
      .select(
        col(dateCol), col("n_positions"),
        round(col("__s").cast("double") / 1e12, 6).as("hhi"),
        round(when(col("__s") > 0, lit(1e12) / col("__s").cast("double")), 6)
          .as("effective_n"))
  }

  /** Distribution moments of the per-date return series: skewness
    * (m₃/m₂^1.5) and EXCESS kurtosis (m₄/m₂² − 3) via the explicit
    * raw-moment expansion — NOT the engine's `skewness`/`kurtosis`
    * builtins, whose small-sample corrections differ engine-to-engine
    * (Spark's are population-form, DuckDB's sample-form; the explicit
    * algebra is the only formulation both can mirror exactly). The mean
    * is the EXACT pico sum over n; the higher raw moments are double
    * averages whose accumulation-order noise sits ~10 orders below the
    * 6dp rounding. Null skew/kurt for a flat series (m₂ = 0). One
    * bounded hash agg. Output (n_days, mean, skewness, excess_kurtosis). */
  def momentStats(results: DataFrame, dateCol: String = "date"): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val r = col("return")
    dailyReturns(results, dateCol)
      .agg(
        count(lit(1)).as("n_days"),
        sum(round(r * 1e12).cast("long").cast(dec)).as("__s1"),
        avg(r * r).as("__a2"),
        avg(r * r * r).as("__a3"),
        avg(r * r * r * r).as("__a4"))
      .withColumn("__mu", col("__s1").cast("double") / 1e12 / col("n_days"))
      .withColumn("__m2", col("__a2") - col("__mu") * col("__mu"))
      .withColumn("__m3",
        col("__a3") - lit(3) * col("__mu") * col("__a2") +
          lit(2) * col("__mu") * col("__mu") * col("__mu"))
      .withColumn("__m4",
        col("__a4") - lit(4) * col("__mu") * col("__a3") +
          lit(6) * col("__mu") * col("__mu") * col("__a2") -
          lit(3) * pow(col("__mu"), 4))
      .select(
        col("n_days"),
        (round(col("__mu"), 6) + 0.0).as("mean"),
        (round(when(col("__m2") > 0,
          col("__m3") / pow(col("__m2"), 1.5)), 6) + 0.0).as("skewness"),
        (round(when(col("__m2") > 0,
          col("__m4") / (col("__m2") * col("__m2")) - 3), 6) + 0.0)
          .as("excess_kurtosis"))
  }
}
