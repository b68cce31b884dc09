package graft

import org.apache.spark.sql.functions._

import graft.panel.Panel.Keys
import graft.perf.Signals

/** Signal-evaluation goldens: Spearman IC (tie sharing, flat-side null,
  * sign), forward returns (shift(-h) null tail), and quantile-portfolio
  * means (deterministic ntile, null-forward exclusion). */
class SignalsSpec extends SparkSpec {
  import spark.implicits._

  private implicit val k: Keys = Keys(sid = "sid", order = Seq("date"))

  test("withForwardReturn: price(t+h)/price(t) − 1 per sid, null tail") {
    val df = Seq(
      ("A", "2024-01-01", 100.0), ("A", "2024-01-02", 110.0),
      ("A", "2024-01-03", 99.0), ("B", "2024-01-01", 50.0),
      ("B", "2024-01-02", 60.0)).toDF("sid", "date", "close")
    val out = Signals.withForwardReturn(df, horizon = 1)
      .orderBy("sid", "date")
      .select("sid", "fwd_return").as[(String, Option[Double])].collect()
    assert(out.toSeq == Seq(
      ("A", Some(110.0 / 100.0 - 1)), ("A", Some(99.0 / 110.0 - 1)),
      ("A", None), ("B", Some(60.0 / 50.0 - 1)), ("B", None)))
    // h beyond the sid's history → all null, not wraparound
    val far = Signals.withForwardReturn(df, horizon = 5)
    assert(far.where(col("fwd_return").isNotNull).count() == 0)
    intercept[IllegalArgumentException](Signals.withForwardReturn(df, 0))
  }

  test("infoCoefficient: ±1 on monotone cross-sections, tie sharing golden") {
    val df = Seq(
      // date 1: perfectly monotone increasing → ic 1
      ("2024-01-01", "A", 1.0, 0.01), ("2024-01-01", "B", 2.0, 0.02),
      ("2024-01-01", "C", 3.0, 0.03), ("2024-01-01", "D", 4.0, 0.04),
      // date 2: perfectly inverted → ic −1
      ("2024-01-02", "A", 1.0, 0.04), ("2024-01-02", "B", 2.0, 0.03),
      ("2024-01-02", "C", 3.0, 0.02), ("2024-01-02", "D", 4.0, 0.01),
      // date 3: signal ties share ranks — hand-computed Spearman:
      // x ranks (avg) = 1.5, 1.5, 3; y ranks = 1, 2, 3 →
      // ic = 18/√(18·24) = √3/2 ≈ 0.866025
      ("2024-01-03", "A", 1.0, 0.01), ("2024-01-03", "B", 1.0, 0.02),
      ("2024-01-03", "C", 2.0, 0.03))
      .toDF("date", "sid", "signal", "fwd")
    val out = Signals.infoCoefficient(df, col("signal"), col("fwd"))
      .orderBy("date")
      .select("date", "n", "ic").as[(String, Long, Option[Double])].collect()
    assert(out.toSeq == Seq(
      ("2024-01-01", 4L, Some(1.0)),
      ("2024-01-02", 4L, Some(-1.0)),
      ("2024-01-03", 3L, Some(0.866025))))
  }

  test("infoCoefficient: flat side → null ic; null rows excluded; n<2 → null") {
    val df = Seq(
      ("2024-01-01", "A", 5.0, 0.01), ("2024-01-01", "B", 5.0, 0.02),
      ("2024-01-01", "C", 5.0, 0.03), // flat signal: zero rank variance
      ("2024-01-02", "A", 1.0, 0.01), // singleton cross-section
      ("2024-01-03", "A", 1.0, 0.01), ("2024-01-03", "B", 2.0, 0.02),
      ("2024-01-03", "C", 3.0, Double.NaN))
      .toDF("date", "sid", "signal", "fwd")
      .withColumn("fwd", when(!isnan(col("fwd")), col("fwd")))
    val out = Signals.infoCoefficient(df, col("signal"), col("fwd"))
      .orderBy("date")
      .select("date", "n", "ic").as[(String, Long, Option[Double])].collect()
    assert(out.toSeq == Seq(
      ("2024-01-01", 3L, None),
      ("2024-01-02", 1L, None),
      // the C null-fwd row is excluded BEFORE ranking: remaining 2 rows
      // are monotone → 1
      ("2024-01-03", 2L, Some(1.0))))
  }

  test("icSummary: mean/ICIR/t/hit-rate goldens; null ICs excluded; " +
    "flat series → null ICIR") {
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ic = Seq(Some(0.5), Some(-0.5), Some(0.25), None).toDF("ic")
    val out = Signals.icSummary(ic).head
    val mean = 0.25 / 3 // Σic / n
    val std = math.sqrt((0.5 * 0.5 + 0.5 * 0.5 + 0.25 * 0.25 -
      3 * mean * mean) / 2) // sample std
    assert(out.getAs[Long]("n_dates") == 3L)
    assert(out.getAs[Double]("mean_ic") == r6(mean))
    assert(out.getAs[Double]("ic_ir") == r6(mean / std))
    assert(out.getAs[Double]("t_stat") == r6(mean / std * math.sqrt(3.0)))
    assert(out.getAs[Double]("hit_rate") == 0.666667)
    // flat series: std 0 → ICIR/t null, mean defined
    val flat = Signals.icSummary(Seq(0.1, 0.1, 0.1).toDF("ic")).head
    assert(flat.getAs[Double]("mean_ic") == 0.1)
    assert(flat.isNullAt(2) && flat.isNullAt(3))
    assert(flat.getAs[Double]("hit_rate") == 1.0)
  }

  test("quantileReturns: per-bin exact means, null-forward rows excluded") {
    val rows = (1 to 10).map { i =>
      ("2024-01-01", f"S$i%02d", i.toDouble, i / 100.0)
    } :+ (("2024-01-01", "S11", 99.0, Double.NaN))
    val df = rows.toDF("date", "sid", "signal", "fwd")
      .withColumn("fwd", when(!isnan(col("fwd")), col("fwd")))
    val out = Signals.quantileReturns(
      df, col("signal"), col("fwd"), q = 5, tiebreak = col("sid"))
      .orderBy("bin")
      .select("bin", "n", "mean_fwd").as[(Long, Long, Double)].collect()
    // 10 non-null rows → 2 per quintile; bin b holds signals 2b−1, 2b
    assert(out.toSeq == (1 to 5).map(b =>
      (b.toLong, 2L, ((2 * b - 1) + 2 * b) / 2.0 / 100.0)))
    intercept[IllegalArgumentException](
      Signals.quantileReturns(df, col("signal"), col("fwd"), 1, col("sid")))
  }

  test("icBootstrap: deterministic Poisson resamples, CI brackets the " +
    "mean, reruns identical (ic5)") {
    import org.apache.spark.sql.functions.col
    val ics = (1 to 40).map(i => (f"2024-01-$i%02d".take(10), // fake dates
      if (i <= 31) f"2024-01-$i%02d" else f"2024-02-${i - 31}%02d", 0.1 + (i % 5) * 0.05))
      .map { case (_, d, v) => (d, v) }
      .toDF("date", "ic")
    val s = graft.perf.Signals.icBootstrap(ics, b = 50).head
    assert(s.getAs[Long]("n_boot") == 50L)
    assert(s.getAs[Long]("n_dates") == 40L)
    val mean = s.getAs[Double]("mean_ic")
    val (lo, hi) = (s.getAs[Double]("ci_lo"), s.getAs[Double]("ci_hi"))
    assert(lo <= mean && mean <= hi)
    assert(lo >= 0.1 && hi <= 0.3) // resample means live inside the data range
    assert(lo < hi) // the series isn't constant, so the CI has width
    // fully deterministic: a second run is bit-identical
    val s2 = graft.perf.Signals.icBootstrap(ics, b = 50).head
    assert(s2.getAs[Double]("ci_lo") == lo && s2.getAs[Double]("ci_hi") == hi)
    intercept[IllegalArgumentException](
      graft.perf.Signals.icBootstrap(ics, b = 1))
    intercept[IllegalArgumentException](
      graft.perf.Signals.icBootstrap(ics, alpha = 0.0))
    // Poisson cutoffs: cumulative, increasing, e^-1 first, ~0.99998 last
    val cdf = graft.perf.Signals.PoissonCdf
    assert(math.abs(cdf.head - math.exp(-1.0)) < 1e-15)
    assert(cdf == cdf.sorted && cdf.last > 0.9999 && cdf.last < 1.0)
  }

  test("icDecay: mean per-date Spearman IC per horizon; shorter " +
    "horizons keep more dates (ic4)") {
    import org.apache.spark.sql.functions.col
    // close rises with sid but the forward return FALLS with sid on
    // every date → IC = −1 at every horizon that still has data
    val df = (for {
      (sid, base) <- Seq(("A", 10.0), ("B", 20.0), ("C", 30.0))
      (d, i) <- Seq("2024-01-01", "2024-01-02", "2024-01-03").zipWithIndex
    } yield (sid, d, base + i)).toDF("sid", "date", "close")
    val out = Signals.icDecay(df, col("close"), horizons = Seq(1, 2))
      .collect().map(r => r.getAs[Long]("horizon") ->
        (r.getAs[Long]("n_dates"), r.getAs[Double]("mean_ic"))).toMap
    assert(out(1L) == ((2L, -1.0))) // d1 and d2 have 1-day forwards
    assert(out(2L) == ((1L, -1.0))) // only d1 has a 2-day forward
    intercept[IllegalArgumentException](
      Signals.icDecay(df, col("close"), horizons = Nil))
    intercept[IllegalArgumentException](
      Signals.icDecay(df, col("close"), horizons = Seq(1, 1)))
  }

  test("icNeweyWest: positive autocorrelation shrinks t below IID, " +
    "alternation inflates it; mean matches icSummary (ic6)") {
    import spark.implicits._
    // persistent series: long runs of the same IC value
    val runs = (1 to 120).map(t =>
      (f"d$t%03d", if ((t - 1) / 20 % 2 == 0) 0.30 else -0.10))
      .toDF("date", "ic")
    val r = Signals.icNeweyWest(runs).head
    assert(r.getAs[Long]("n_dates") == 120L)
    assert(r.getAs[Double]("mean_ic") == 0.1)
    assert(r.getAs[Double]("t_nw") < r.getAs[Double]("t_iid"))
    // alternating series: negative lag-1 autocovariance → NW t larger
    val alt = (1 to 120).map(t =>
      (f"d$t%03d", if (t % 2 == 0) 0.30 else -0.10)).toDF("date", "ic")
    val a = Signals.icNeweyWest(alt).head
    assert(a.getAs[Double]("t_nw") > a.getAs[Double]("t_iid"))
    intercept[IllegalArgumentException](Signals.icNeweyWest(runs, lags = 0))
  }
}
