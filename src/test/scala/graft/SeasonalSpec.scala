package graft

import java.sql.Date

import graft.panel.Seasonal

/** Seasonal decomposition + naive-forecast evaluation goldens on
  * hand-checkable series: the additive identity close = trend +
  * seasonal + residual holds row-exactly, seasonal re-centers to mean
  * zero across a sid's observed weekdays, only full 7-row windows emit,
  * and MASE/sMAPE match a by-hand computation. The ts2/ts3 catalog
  * queries pin the same operators against DuckDB at sf0.01. */
class SeasonalSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String): Date = Date.valueOf(s)

  // 21 consecutive days, trend +1/day plus a weekday bump on Mondays
  private lazy val panel = (0 until 21).map { i =>
    val base = 100.0 + i
    val dt = d("2024-01-01").toLocalDate.plusDays(i) // 2024-01-01 is a Monday
    val bump = if (dt.getDayOfWeek.getValue == 1) 7.0 else 0.0
    ("s1", Date.valueOf(dt), base + bump)
  }.toDF("sid", "date", "close")

  test("decompose: additive identity, zero-mean seasonal, full windows only") {
    val r = Seasonal.decompose(panel).collect()
    // 21 rows, centered 7-row window → rows 3..17 emit (15 rows)
    assert(r.length == 15)
    r.foreach { row =>
      val close = row.getDouble(2); val t = row.getDouble(3)
      val s = row.getDouble(4); val res = row.getDouble(5)
      assert(math.abs(close - (t + s + res)) < 1e-5,
        s"additive identity broke: $row")
    }
    // seasonal depends only on weekday; Monday carries the bump
    val bySeas = r.map(row => (row.getDate(1).toLocalDate.getDayOfWeek.getValue,
      row.getDouble(4))).distinct
    assert(bySeas.length == 7) // one seasonal value per weekday
    val monday = bySeas.find(_._1 == 1).get._2
    assert(monday > 5.0, s"Monday bump not in seasonal: $monday")
    // re-centered: observed-weekday seasonal values sum to ~0
    assert(math.abs(bySeas.map(_._2).sum) < 1e-4)
  }

  test("forecastEval: exact MAE/MASE/sMAPE on a by-hand series") {
    // lag=2 on 6 points keeps the arithmetic checkable
    val p = Seq(100.0, 102.0, 104.0, 106.0, 104.0, 108.0).zipWithIndex
      .map { case (v, i) => ("x", d(s"2024-02-0${i + 1}"), v) }
      .toDF("sid", "date", "close")
    val r = Seasonal.forecastEval(p, lag = 2).head()
    // f_t = c_{t-2}: errors |104-100|,|106-102|,|104-104|,|108-106| = 4,4,0,2
    assert(r.getAs[Long]("n_eval") == 4)
    assert(math.abs(r.getAs[Double]("mae") - 2.5) < 1e-9)
    // one-step naive MAE: |2|,|2|,|2|,|-2|,|4| → 12/5 = 2.4 ⇒ MASE 2.5/2.4
    assert(math.abs(r.getAs[Double]("mase") - 2.5 / 2.4) < 1e-6)
    val smape = Seq((400.0, 20400.0), (400.0, 20800.0), (0.0, 20800.0),
      (200.0, 21400.0)).map { case (e, s) => 2 * e / s }.sum / 4
    assert(math.abs(r.getAs[Double]("smape") - smape) < 1e-6)
    // a flat series: MASE null (zero one-step MAE), sMAPE 0
    val flat = Seq.tabulate(5)(i => ("f", d(s"2024-03-0${i + 1}"), 50.0))
      .toDF("sid", "date", "close")
    val fr = Seasonal.forecastEval(flat, lag = 2).head()
    assert(fr.isNullAt(3) && fr.getAs[Double]("smape") == 0.0)
  }

  test("strength: matches variances computed from the collected " +
    "components; constant series yields null") {
    val r = Seasonal.strength(panel).head()
    // replay from decompose output (bounded collect)
    val comp = Seasonal.decompose(panel).collect().map(x =>
      (math.round(x.getDouble(3) * 1e6), math.round(x.getDouble(4) * 1e6),
        math.round(x.getDouble(5) * 1e6)))
    def variance(xs: Seq[Double]) = {
      val n = xs.size; val mu = xs.sum / n
      xs.map(x => x * x).sum / n - mu * mu
    }
    val vr = variance(comp.map(_._3.toDouble).toSeq)
    val vt = variance(comp.map(c => (c._1 + c._3).toDouble).toSeq)
    val vs = variance(comp.map(c => (c._2 + c._3).toDouble).toSeq)
    assert(r.getAs[Long]("n") == comp.length)
    assert(math.abs(r.getAs[Double]("f_trend") -
      math.max(0.0, 1.0 - vr / vt)) < 1e-4)
    assert(math.abs(r.getAs[Double]("f_seasonal") -
      math.max(0.0, 1.0 - vr / vs)) < 1e-4)
    // the fixture has a real trend and a real Monday bump
    assert(r.getAs[Double]("f_trend") > 0.5)
    assert(r.getAs[Double]("f_seasonal") > 0.5)
    // constant series: all variances 0 → null strengths
    val flat = (0 until 14).map(i =>
      ("f", Date.valueOf(d("2024-03-01").toLocalDate.plusDays(i)), 50.0))
      .toDF("sid", "date", "close")
    val fr = Seasonal.strength(flat).head()
    assert(fr.isNullAt(2) && fr.isNullAt(3))
  }

  test("meanReversionHalfLife: exact rho on a noiseless AR(1); random " +
    "walk and constant series yield null") {
    // x_t = 2^(8−t): y = 0.5·x exactly → rho = 0.5, half-life = 1 day
    val geo = (0 until 9).map(i =>
      ("g", Date.valueOf(d("2024-01-01").toLocalDate.plusDays(i)),
        math.pow(2.0, 8 - i)))
      .toDF("sid", "date", "close")
    val g = Seasonal.meanReversionHalfLife(geo).head()
    assert(g.getAs[Long]("n") == 8)
    assert(g.getAs[Double]("rho") == 0.5)
    assert(g.getAs[Double]("half_life") == 1.0)
    // a pure trend fits rho = 1 → not mean-reverting → null half-life
    val walk = (0 until 10).map(i =>
      ("w", Date.valueOf(d("2024-02-01").toLocalDate.plusDays(i)),
        100.0 + i)).toDF("sid", "date", "close")
    val w = Seasonal.meanReversionHalfLife(walk).head()
    assert(w.getAs[Double]("rho") == 1.0 && w.isNullAt(3))
    // constant series: zero variance → null rho AND half-life
    val flat = (0 until 5).map(i =>
      ("f", Date.valueOf(d("2024-03-01").toLocalDate.plusDays(i)), 7.0))
      .toDF("sid", "date", "close")
    val f = Seasonal.meanReversionHalfLife(flat).head()
    assert(f.isNullAt(2) && f.isNullAt(3))
  }

  test("conformalInterval: constant-error series → q_hat equals the " +
    "error, full coverage, exact ceil-rank k") {
    val p = (0 until 30).map(i =>
      ("s1", Date.valueOf(d("2024-01-01").toLocalDate.plusDays(i)),
        100.0 + i))
      .toDF("sid", "date", "close")
    // close rises 1/day → every lag-7 error is exactly 700 cents
    val r = Seasonal.conformalInterval(p, lag = 7, alphaPct = 10).head()
    val nCal = r.getAs[Long]("n_cal"); val nTest = r.getAs[Long]("n_test")
    assert(nCal + nTest == 23) // 30 rows − 7 lag
    assert(r.getAs[Long]("k") == ((nCal + 1) * 90 + 99) / 100)
    assert(r.getAs[Long]("q_hat_cents") == 700L)
    assert(r.getAs[Double]("coverage") == 1.0)
    assert(r.getAs[Double]("alpha") == 0.1)
    intercept[IllegalArgumentException] {
      Seasonal.conformalInterval(p, alphaPct = 0)
    }
  }

  test("holt: hand-replayed integer recursion, including the negative-" +
    "trend truncating division; forecast is lagged level+trend") {
    import org.apache.spark.sql.functions._
    // days with counts 10, 10, 4 (declining → negative trend state)
    val ev = Seq.tabulate(10)(i => (i, "2024-03-01 10:00:00")) ++
      Seq.tabulate(10)(i => (100 + i, "2024-03-02 10:00:00")) ++
      Seq.tabulate(4)(i => (200 + i, "2024-03-03 10:00:00"))
    val df = ev.toDF("event_id", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = Seasonal.holt(df).orderBy("day")
      .select("y", "level_micro", "trend_micro", "forecast_micro")
      .collect()
    // l0 = 10e6, b0 = 0; l1 = (3·10e6 + 7·10e6)/10 = 10e6, b1 = 0
    assert(out(0).getLong(1) == 10000000L && out(0).getLong(2) == 0L)
    assert(out(0).isNullAt(3))
    assert(out(1).getLong(1) == 10000000L && out(1).getLong(2) == 0L)
    assert(out(1).getLong(3) == 10000000L)
    // l2 = (3·4e6 + 7·10e6)/10 = 8.2e6; b2 = (1·(8.2e6−10e6) + 0)/10 =
    // −1800000/10 = −180000 (truncation exact: divides evenly here)
    assert(out(2).getLong(1) == 8200000L && out(2).getLong(2) == -180000L)
    assert(out(2).getLong(3) == 10000000L)
    intercept[IllegalArgumentException] {
      Seasonal.holt(df.limit(5)) // a single day cannot seed the trend
    }
  }
}
