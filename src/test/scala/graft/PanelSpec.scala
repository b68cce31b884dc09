package graft

import org.apache.spark.sql.functions._

import graft.panel.Panel
import graft.panel.Panel.Keys

class PanelSpec extends SparkSpec {
  import spark.implicits._

  implicit val k: Keys = Panel.eod

  private lazy val df = Seq(
    ("A", "2024-01-01", Some(10.0)),
    ("A", "2024-01-02", Some(12.0)),
    ("A", "2024-01-03", None),
    ("A", "2024-01-04", Some(15.0)),
    ("B", "2024-01-01", Some(100.0)),
    ("B", "2024-01-02", Some(90.0)))
    .toDF("sid", "date", "value")
    .withColumn("date", to_date($"date"))

  private def col4(c: org.apache.spark.sql.Column): Map[(String, String), Option[Double]] =
    df.select($"sid", $"date", c.as("out"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap

  test("lag shifts within sid, null at series start (W1)") {
    val out = col4(Panel.lagBySid($"value"))
    assert(out(("A", "2024-01-01")).isEmpty)
    assert(out(("A", "2024-01-02")).contains(10.0))
    assert(out(("A", "2024-01-03")).contains(12.0))
    assert(out(("B", "2024-01-01")).isEmpty) // no bleed across sids
    assert(out(("B", "2024-01-02")).contains(100.0))
  }

  test("pctChange = value/prev − 1 over row order, not calendar (W3)") {
    val out = col4(Panel.pctChange($"value"))
    assert(out(("A", "2024-01-02")).map(r7).contains(0.2))
    assert(out(("A", "2024-01-03")).isEmpty) // null value → null
    assert(out(("B", "2024-01-02")).map(r7).contains(-0.1))
  }

  test("ffill carries last non-null forward (W5)") {
    val out = col4(Panel.ffill($"value"))
    assert(out(("A", "2024-01-03")).contains(12.0))
    assert(out(("A", "2024-01-04")).contains(15.0))
  }

  test("rollingMean yields null until n observations (W6, min_periods=n)") {
    val out = col4(Panel.rollingMean($"value", 2))
    assert(out(("A", "2024-01-01")).isEmpty)
    assert(out(("A", "2024-01-02")).contains(11.0))
    // null at 01-03 → only 1 non-null in frame → null
    assert(out(("A", "2024-01-03")).isEmpty)
  }

  test("diff (W4) and cumSum") {
    val d = col4(Panel.diffBySid($"value"))
    assert(d(("A", "2024-01-02")).contains(2.0))
    val c = col4(Panel.cumSum(coalesce($"value", lit(0.0))))
    assert(c(("A", "2024-01-04")).contains(37.0))
  }

  test("densify completes the sid×date grid with nulls (SURVEY §7.4 risk 1)") {
    val dense = Panel.densify(df)
    assert(dense.count() == 8) // 2 sids × 4 dates
    val bDates = dense.where($"sid" === "B").select("date").collect().map(_.get(0).toString)
    assert(bDates.sorted.toSeq ==
      Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"))
  }

  test("meltFields inverts a pivoted frame (R1)") {
    val wide = Seq(("A", 1.0, 2.0)).toDF("sid", "x", "y")
    val long = Panel.meltFields(wide, Seq("sid"), Seq("x", "y"))
    assert(long.collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet ==
      Set(("A", "x", 1.0), ("A", "y", 2.0)))
  }

  test("perDateRankAvg shares tied ranks, skips nulls (pandas rank axis=1)") {
    val xs = Seq(
      ("A", "2024-01-01", Some(5.0)),
      ("B", "2024-01-01", Some(5.0)),
      ("C", "2024-01-01", Some(9.0)),
      ("D", "2024-01-01", None))
      .toDF("sid", "date", "value").withColumn("date", to_date($"date"))
    val out = xs.select($"sid", Panel.perDateRankAvg($"value").as("r"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    // ties at 5.0 share (1+2)/2 = 1.5; 9.0 ranks 3; null gets no rank
    assert(out("A").contains(1.5) && out("B").contains(1.5))
    assert(out("C").contains(3.0))
    assert(out("D").isEmpty)
  }

  test("zscore is null on a flat slot; demean centers the slot") {
    val xs = Seq(
      ("A", "2024-01-01", 4.0), ("B", "2024-01-01", 8.0),
      ("A", "2024-01-02", 7.0), ("B", "2024-01-02", 7.0))
      .toDF("sid", "date", "value").withColumn("date", to_date($"date"))
    val z = xs.select($"sid", $"date".cast("string"), Panel.zscore($"value").as("z"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    // sample std of (4,8) = 2√2; (4−6)/2√2 = −1/√2
    assert(z(("A", "2024-01-01")).map(r7).contains(r7(-1 / math.sqrt(2))))
    assert(z(("A", "2024-01-02")).isEmpty) // flat slot: σ = 0 → null
    val d = xs.select($"sid", $"date".cast("string"), Panel.demean($"value").as("d"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(d(("A", "2024-01-01")) == -2.0 && d(("B", "2024-01-01")) == 2.0)
  }

  test("quantileBin buckets each slot 1..q with deterministic ties") {
    val xs = (1 to 10).map(i => (s"S$i", "2024-01-01", i.toDouble))
      .toDF("sid", "date", "value").withColumn("date", to_date($"date"))
    val out = xs.select($"sid", Panel.quantileBin($"value", 5, $"sid").as("q"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(out("S1") == 1 && out("S2") == 1)
    assert(out("S9") == 5 && out("S10") == 5)
  }

  test("winsorize clamps to the slot's [lo, hi] exact quantiles") {
    val xs = (1 to 100).map(i => (s"S$i", "2024-01-01", i.toDouble))
      .toDF("sid", "date", "value").withColumn("date", to_date($"date"))
    val out = xs.select($"sid", Panel.winsorize($"value", 0.05, 0.95).as("w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // interpolated p05 of 1..100 = 1 + 0.05×99 = 5.95; p95 = 95.05
    assert(out("S1") == 5.95 && out("S3") == 5.95)
    assert(out("S100") == 95.05 && out("S98") == 95.05)
    assert(out("S50") == 50.0) // interior untouched
  }

  test("sidMaxDrawdown: trough vs running peak per sid; monotone " +
    "series → 0 (w21)") {
    implicit val k = Panel.eod
    val df = Seq(
      ("A", "2024-01-01", 100.0), ("A", "2024-01-02", 150.0),
      ("A", "2024-01-03", 75.0),  // −50% off the 150 peak
      ("A", "2024-01-04", 160.0), // recovery doesn't erase the trough
      ("B", "2024-01-01", 10.0), ("B", "2024-01-02", 20.0))
      .toDF("sid", "date", "close").withColumn("date", to_date($"date"))
    val out = Panel.sidMaxDrawdown(df)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_days"), r.getAs[Double]("max_drawdown"))).toMap
    assert(out("A") == ((4L, -0.5)))
    assert(out("B") == ((2L, 0.0)))
  }

  test("sidMoments: symmetric series reads skew 0, a one-sided outlier " +
    "skews negative and fattens the tail (w26)") {
    implicit val k = Panel.eod
    // A: 8 returns of exactly ±1% (4 each) → skew 0, kurtosis of a
    // two-point symmetric distribution = −2 (platykurtic limit)
    val pa = (1 to 8).scanLeft(100.0) { (p, t) =>
      p * (if (t % 2 == 1) 1.01 else 0.99) }
    // B: mostly flat with one crash
    val pb = Seq(100.0, 100.0, 100.0, 100.0, 100.0, 100.0, 60.0, 60.0, 60.0, 60.0)
    val rows = pa.zipWithIndex.map { case (p, i) => ("A", f"d${i + 1}%02d", p) } ++
      pb.zipWithIndex.map { case (p, i) => ("B", f"d${i + 1}%02d", p) }
    val out = Panel.sidMoments(rows.toDF("sid", "date", "close"))
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_days"), r.getAs[Double]("skewness"),
          r.getAs[Double]("excess_kurtosis")))).toMap
    assert(out("A")._1 == 8L)
    assert(out("A")._2 == 0.0, out.toString) // exactly symmetric
    assert(out("A")._3 == -2.0, out.toString)
    assert(out("B")._2 < -2.0, out.toString) // crash → strong left skew
    assert(out("B")._3 > 3.0, out.toString)  // and a fat tail
  }

  test("withRollingBeta: the benchmark itself reads beta 1, a 2x-levered " +
    "clone reads 2, null until the window fills (w25)") {
    implicit val k = Panel.eod
    val rows = (1 to 6).flatMap { t =>
      val b = if (t % 2 == 0) 0.01 else -0.02 // benchmark return path
      Seq(("B", f"d$t%02d", b), ("L", f"d$t%02d", 2 * b),
        ("N", f"d$t%02d", Double.NaN)) // N: no return → never fills
    }.toDF("sid", "date", "ret")
      .withColumn("ret", when(isnan(col("ret")), lit(null)).otherwise(col("ret")))
    val bench = rows.where(col("sid") === "B")
      .select(col("date"), col("ret").as("bret"))
    val out = Panel.withRollingBeta(
      rows.join(bench, Seq("date"), "left"), col("ret"), col("bret"),
      window = 3)
      .collect().map(r => (r.getAs[String]("date"), r.getAs[String]("sid")) ->
        (if (r.isNullAt(r.fieldIndex("beta_3"))) None
         else Some(r.getAs[Double]("beta_3")))).toMap
    assert(out(("d02", "B")).isEmpty) // window not filled
    assert(out(("d03", "B")).contains(1.0))
    assert(out(("d06", "L")).contains(2.0))
    assert(out(("d06", "N")).isEmpty)
    intercept[IllegalArgumentException](
      Panel.withRollingBeta(rows, col("ret"), col("ret"), window = 1))
  }

  test("sidUnderwaterDuration: spell lengths between highs, open tail " +
    "spell reported, monotone series → 0 (w24)") {
    implicit val k = Panel.eod
    val df = Seq(
      ("A", "d1", 100.0), ("A", "d2", 90.0), ("A", "d3", 95.0),
      ("A", "d4", 110.0), // recovery closes a 2-day spell
      ("A", "d5", 105.0), ("A", "d6", 104.0), // open 2-day tail spell
      ("B", "d1", 10.0), ("B", "d2", 20.0)) // monotone: never underwater
      .toDF("sid", "date", "close")
    val out = Panel.sidUnderwaterDuration(df)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_days"), r.getAs[Long]("max_underwater"),
          r.getAs[Long]("open_underwater")))).toMap
    assert(out("A") == ((6L, 2L, 2L)))
    assert(out("B") == ((2L, 0L, 0L)))
  }

  test("varianceRatio: perfect mean reversion → 0, flat series → null " +
    "(w20)") {
    implicit val k = Panel.eod
    // A oscillates 100↔110: every 2-period log return is exactly 0
    val rows = (1 to 6).map(i =>
      ("A", f"2024-01-0$i", if (i % 2 == 1) 100.0 else 110.0)) ++
      (1 to 6).map(i => ("B", f"2024-01-0$i", 50.0)) // flat: no variance
    val df = rows.toDF("sid", "date", "close")
      .withColumn("date", to_date($"date"))
    val out = Panel.varianceRatio(df, q = 2)
      .collect().map(r => r.getString(0) ->
        Option(r.get(r.fieldIndex("vr_2")))).toMap
    assert(out("A") == Some(0.0))
    assert(out("B").isEmpty)
    intercept[IllegalArgumentException](Panel.varianceRatio(df, q = 1))
  }

  test("withRobustZscore: median/MAD scaling shrugs off the outlier; " +
    "zero MAD → null (px8)") {
    val xs = Seq(1.0, 2.0, 3.0, 10.0).zipWithIndex
      .map { case (v, i) => (s"S$i", "2024-01-01", v) }
      .toDF("sid", "date", "value").withColumn("date", to_date($"date"))
    val out = Panel.withRobustZscore(xs, $"value")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    // med 2.5; |d| = [1.5, .5, .5, 7.5] → MAD = (.5 + 1.5)/2 = 1.0
    def q6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out("S0") == q6(0.6745 * (1.0 - 2.5)))
    assert(out("S1") == q6(0.6745 * (2.0 - 2.5)))
    assert(out("S3") == q6(0.6745 * (10.0 - 2.5)))
    // majority-constant slot: MAD 0 → null
    val flat = Seq(5.0, 5.0, 5.0, 9.0).zipWithIndex
      .map { case (v, i) => (s"S$i", "2024-01-01", v) }
      .toDF("sid", "date", "value").withColumn("date", to_date($"date"))
    val f = Panel.withRobustZscore(flat, $"value").collect()
    assert(f.forall(_.isNullAt(3)))
  }

  test("EventStudy.align keys rows by trading-day offset, drops edges") {
    import graft.panel.EventStudy
    // sid A trades 1,2,3,5 Jan (gap on the 4th): offsets are ROW
    // offsets, so the +1 neighbor of Jan 3 is Jan 5, not the gap
    val panel = Seq(
      ("A", "2024-01-01", 1.0), ("A", "2024-01-02", 2.0),
      ("A", "2024-01-03", 3.0), ("A", "2024-01-05", 5.0),
      ("B", "2024-01-01", 9.0))
      .toDF("sid", "date", "value").withColumn("date", to_date($"date"))
    val events = Seq(("A", "2024-01-03"), ("B", "2024-01-01"))
      .toDF("sid", "date").withColumn("date", to_date($"date"))
    val out = EventStudy.align(panel, events, 1, 1, Seq("value"))
      .select($"sid", $"event_date".cast("string"), $"offset", $"value")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)) -> r.getDouble(3))
      .toMap
    assert(out(("A", "2024-01-03", 0)) == 3.0)
    assert(out(("A", "2024-01-03", -1)) == 2.0)
    assert(out(("A", "2024-01-03", 1)) == 5.0) // row offset skips the gap
    assert(out(("B", "2024-01-01", 0)) == 9.0)
    // B has no −1/+1 rows: edge offsets drop out (inner join)
    assert(out.size == 4)
  }

  test("safeDiv guards zero denominators (§2.7)") {
    val out = Seq((1.0, 0.0), (4.0, 2.0)).toDF("a", "b")
      .select(Panel.safeDiv($"a", $"b").as("q")).collect()
    assert(out(0).isNullAt(0) && out(1).getDouble(0) == 2.0)
  }

  test("autocorrelation: ±1 on linear/alternating series, flat → null, " +
    "pairless sids absent, lag guard (w11)") {
    val df = Seq(
      ("A", 1, 1.0), ("A", 2, 2.0), ("A", 3, 3.0), ("A", 4, 4.0), ("A", 5, 5.0),
      ("B", 1, 1.0), ("B", 2, -1.0), ("B", 3, 1.0), ("B", 4, -1.0), ("B", 5, 1.0),
      ("C", 1, 5.0), ("C", 2, 5.0), ("C", 3, 5.0),
      ("D", 1, 7.0)) // a single bar has no (t, t−1) pair at all
      .toDF("sid", "date", "v")
    val out = Panel.autocorrelation(df, col("v"), lagK = 1)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    assert(out("A") == ((4L, Some(1.0))))   // linear ramp
    assert(out("B") == ((4L, Some(-1.0))))  // perfect alternation
    assert(out("C") == ((2L, None)))        // flat: zero variance
    assert(!out.contains("D"))
    intercept[IllegalArgumentException](Panel.autocorrelation(df, col("v"), 0))
  }

  test("resampleOhlcv: first/last by order key regardless of row order, " +
    "exact volume, per-bucket bounds (w12)") {
    val bars = Seq( // deliberately shuffled input row order
      ("A", "2024-01-20", 30.0, 5.0), ("A", "2024-01-05", 10.0, 2.0),
      ("A", "2024-01-12", 40.0, 1.0), ("A", "2024-02-03", 7.0, 4.0),
      ("B", "2024-01-31", 100.0, 10.0))
      .toDF("sid", "date", "close", "volume")
      .withColumn("date", to_date(col("date")))
    val out = Panel.resampleOhlcv(bars,
      to_date(date_trunc("month", col("date"))), col("close"), col("volume"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString) -> r).toMap
    val a = out(("A", "2024-01-01"))
    assert(a.getAs[Double]("open") == 10.0)   // earliest bar, not first row
    assert(a.getAs[Double]("high") == 40.0 && a.getAs[Double]("low") == 10.0)
    assert(a.getAs[Double]("close") == 30.0)  // latest bar
    assert(a.getAs[Long]("volume") == 8L && a.getAs[Long]("n_bars") == 3L)
    val feb = out(("A", "2024-02-01"))
    assert(feb.getAs[Double]("open") == 7.0 && feb.getAs[Double]("close") == 7.0)
    assert(out(("B", "2024-01-01")).getAs[Long]("volume") == 10L)
  }

  test("residualReturns: beta recovers exact exposure, residual zero for " +
    "a pure-beta sid, null until the window fills (px6)") {
    // B is flat so m = A/2 exactly; A is 2× the market → beta 2, resid 0
    val df = Seq(
      ("A", "2024-01-01", 0.02), ("B", "2024-01-01", 0.0),
      ("A", "2024-01-02", 0.04), ("B", "2024-01-02", 0.0),
      ("A", "2024-01-03", -0.02), ("B", "2024-01-03", 0.0),
      ("A", "2024-01-04", 0.06), ("B", "2024-01-04", 0.0))
      .toDF("sid", "date", "ret")
    val out = Panel.residualReturns(df, col("ret"), window = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    // first bar: window not full → null beta and resid
    assert(out(("A", "2024-01-01")).isNullAt(3))
    val a2 = out(("A", "2024-01-02"))
    assert(a2.getAs[Double]("beta_2") == 2.0)
    assert(a2.getAs[Double]("resid") == 0.0)
    assert(a2.getAs[Double]("mkt_ret") == 0.02)
    val b2 = out(("B", "2024-01-02"))
    assert(b2.getAs[Double]("beta_2") == 0.0)
    assert(b2.getAs[Double]("resid") == 0.0)
    assert(out(("A", "2024-01-04")).getAs[Double]("beta_2") == 2.0)
    intercept[IllegalArgumentException](
      Panel.residualReturns(df, col("ret"), window = 1))
  }

  test("correlationMatrix: ±1 on scaled/inverted books, pairwise-complete " +
    "n, bounded-set guards (px7)") {
    val df = Seq(
      ("A", "d1", 0.01), ("A", "d2", 0.02), ("A", "d3", 0.03),
      ("B", "d1", 0.02), ("B", "d2", 0.04), ("B", "d3", 0.06),
      ("C", "d1", -0.01), ("C", "d2", -0.02), ("C", "d3", -0.03),
      ("D", "d2", 0.05)) // one overlapping date → n=1, corr null
      .toDF("sid", "date", "ret")
    val out = Panel.correlationMatrix(df, col("ret"), Seq("A", "B", "C", "D"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(out(("A", "B")) == ((3L, Some(1.0))))
    assert(out(("A", "C")) == ((3L, Some(-1.0))))
    assert(out(("B", "C")) == ((3L, Some(-1.0))))
    assert(out(("A", "D")) == ((1L, None)))
    assert(out.size == 6)
    intercept[IllegalArgumentException](
      Panel.correlationMatrix(df, col("ret"), Seq("A")))
    intercept[IllegalArgumentException](
      Panel.correlationMatrix(df, col("ret"), (1 to 51).map(_.toString)))
  }

  test("cointegrationScreen: exact-linear pair recovers beta/alpha with " +
    "stationary-spread crdw; a trending non-pair scores near 0 (coint1)") {
    val rnd = new scala.util.Random(7)
    var wa = 100.0
    val rows = (1 to 400).flatMap { t =>
      wa *= math.exp(rnd.nextGaussian() * 0.01)
      val d = f"d$t%04d"
      // B = exactly A²·e (log: 2·logA + 1); C an independent walk seeded
      // off a different stream slice
      Seq(("A", d, wa), ("B", d, wa * wa * math.E),
        ("C", d, 100.0 * math.exp(0.015 * t + math.sin(t * 0.77) * 0.2)))
    }.toDF("sid", "date", "close")
    val out = Panel.cointegrationScreen(rows, col("close"), Seq("A", "B", "C"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ab = out(("A", "B"))
    assert(ab.getAs[Long]("n") == 400L)
    // log B = 2·log A + 1 exactly → β = 0.5 regressing A on B
    assert(math.abs(ab.getAs[Double]("beta") - 0.5) < 1e-3)
    assert(math.abs(ab.getAs[Double]("alpha") + 0.5) < 1e-2)
    // residuals are quantization dust → tiny std; crdw well above the
    // Sargan-Bhargava bound (perfectly stationary spread)
    assert(ab.getAs[Double]("resid_std") < 1e-4)
    assert(ab.getAs[Double]("crdw") > 1.0)
    // step-2 ADF: the stationary spread rejects no-cointegration hard
    assert(ab.getAs[Double]("adf_t") < -3.34, ab.toString)
    // A vs the smooth trending C: spread inherits A's random walk →
    // CRDW collapses toward 0 (no cointegration)
    val ac = out(("A", "C"))
    assert(ac.getAs[Double]("crdw") < 0.5, ac.toString)
    intercept[IllegalArgumentException](
      Panel.cointegrationScreen(rows, col("close"), Seq("A")))
  }

  test("spreadZSignal: band logic — spike shorts the spread, dip longs " +
    "it, interior flat, null until the window fills (coint2)") {
    implicit val k = Panel.eod
    // B pinned at 1 (ln B = 0), β = 1, α = 0 → spread = ln A exactly
    val rows = (1 to 30).flatMap { t =>
      val s =
        if (t == 25) 0.05 else if (t == 28) -0.05
        else ((t % 5) - 2) * 0.001 // tame oscillation
      Seq(("A", f"d$t%02d", math.exp(s)), ("B", f"d$t%02d", 1.0))
    }.toDF("sid", "date", "close")
    val out = Panel.spreadZSignal(rows, col("close"), "A", "B",
      beta = 1.0, alpha = 0.0, window = 10)
      .collect().map(r => r.getString(0) ->
        ((Option(r.get(r.fieldIndex("z"))), r.get(r.fieldIndex("signal"))))).toMap
    assert(out("d05")._1.isEmpty && out("d05")._2 == null) // warming up
    assert(out("d25")._2 == -1) // +5σ-ish spike → short the spread
    assert(out("d28")._2 == 1)  // deep dip → long
    assert(out("d20")._2 == 0)  // inside the bands
    intercept[IllegalArgumentException](
      Panel.spreadZSignal(rows, col("close"), "A", "B", 1.0, 0.0, window = 1))
    intercept[IllegalArgumentException](
      Panel.spreadZSignal(rows, col("close"), "A", "B", 1.0, 0.0, 10, entryZ = 0))
  }

  test("hurstExponent: iid returns sit near H=0.5, an antipersistent " +
    "series reads lower (w22)") {
    val rnd = new scala.util.Random(11)
    var pw = 100.0; var pm = 100.0; var lastR = 0.0
    val rows = (1 to 1024).flatMap { t =>
      val e = rnd.nextGaussian() * 0.01
      pw *= math.exp(e) // iid log returns → H ≈ 0.5
      // antipersistent: strong negative autocorrelation
      val r2 = -0.6 * lastR + e; lastR = r2; pm *= math.exp(r2)
      val d = f"d$t%04d"
      Seq(("W", d, pw), ("M", d, pm))
    }.toDF("sid", "date", "close")
    val h = Panel.hurstExponent(rows)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_scales"), r.getAs[Double]("hurst")))).toMap
    assert(h("W")._1 == 4L)
    assert(math.abs(h("W")._2 - 0.5) < 0.12, h.toString)
    assert(h("M")._2 < h("W")._2 - 0.1, h.toString) // mean reversion ↓H
    intercept[IllegalArgumentException](
      Panel.hurstExponent(rows, scales = Seq(2)))
    intercept[IllegalArgumentException](
      Panel.hurstExponent(rows, scales = Seq(2, 2, 4)))
  }

  test("rangeVolatility: Parkinson/Garman-Klass goldens, flat bar → 0, " +
    "degenerate bar → null (w13)") {
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val e = math.exp(1.0)
    val bars = Seq(
      // h/l = e → ln(h/l) = 1: parkinson = √(1/(4ln2)); c=o → gk = √0.5
      ("A", 1.0, e, 1.0, 1.0),
      ("B", 5.0, 5.0, 5.0, 5.0),   // flat bar: zero range
      ("C", 1.0, 0.0, 0.0, 1.0))   // degenerate (non-positive range)
      .toDF("sid", "open", "high", "low", "close")
    val out = Panel.rangeVolatility(bars)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("A").getAs[Double]("parkinson") ==
      r6(math.sqrt(1.0 / (4.0 * math.log(2.0)))))
    assert(out("A").getAs[Double]("garman_klass") == r6(math.sqrt(0.5)))
    assert(out("B").getAs[Double]("parkinson") == 0.0)
    assert(out("B").getAs[Double]("garman_klass") == 0.0)
    assert(out("C").isNullAt(out("C").fieldIndex("parkinson")))
  }

  test("ewmaBySid matches pandas ewm(halflife=1, adjust=True) within quantization") {
    implicit val k: Panel.Keys = Panel.eod
    val vals: Seq[Option[Double]] =
      Seq(Some(10.0), Some(12.0), None, Some(11.0), Some(15.0), Some(14.0))
    val df = vals.zipWithIndex.map { case (v, i) =>
      ("A", java.sql.Date.valueOf(f"2024-01-${i + 1}%02d"), v)
    }.toDF("sid", "date", "close")
    val got = Panel.ewmaBySid(df, "close", "ewma", horizon = 50)
      .orderBy("date").collect().map(r =>
        if (r.isNullAt(r.fieldIndex("ewma"))) None
        else Some(r.getAs[Double]("ewma")))
    // pandas ewm(halflife=1, adjust=True, ignore_na=False): weights 2^-gap
    // by ROW distance; nulls excluded from both sums but still age others
    val expect = vals.indices.map { i =>
      val terms = (0 to i).flatMap(j => vals(j).map(x => (x, math.pow(2.0, -(i - j)))))
      if (terms.isEmpty) None
      else Some(terms.map(t => t._1 * t._2).sum / terms.map(_._2).sum)
    }
    got.zip(expect).zipWithIndex.foreach { case ((g, e), i) =>
      (g, e) match {
        case (Some(gv), Some(ev)) => assert(math.abs(gv - ev) < 1e-4, s"row $i")
        case (gv, ev) => assert(gv == ev, s"row $i")
      }
    }
    // null row: weights decay by ROW distance, so the missing row still
    // ages earlier values — row 3 terms: 11·1, 12·2⁻², 10·2⁻³
    assert(math.abs(got(3).get - (11.0 + 3.0 + 1.25) / (1.0 + 0.25 + 0.125)) < 1e-4)
    assertThrows[IllegalArgumentException](
      Panel.ewmaBySid(df, "close", "ewma", horizon = 64))
  }
}
