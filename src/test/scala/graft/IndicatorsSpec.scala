package graft

import org.apache.spark.sql.functions._

import graft.panel.{Indicators, Panel}
import graft.panel.Panel.Keys

/** Technical-indicator goldens: ATR true-range cases (gap bars), RSI
  * gain/loss ratios, warm-up and flat-window nulls. */
class IndicatorsSpec extends SparkSpec {
  import spark.implicits._

  private implicit val k: Keys = Panel.eod

  test("atr: TR covers range and gaps, trailing mean exact, null until " +
    "the window fills (w14)") {
    val bars = Seq(
      ("A", "d1", 10.0, 8.0, 9.0),  // first bar: TR = h − l = 2
      ("A", "d2", 9.0, 7.0, 8.0),   // max(2, 0, 2) = 2
      ("A", "d3", 15.0, 14.0, 15.0)) // gap up: max(1, 7, 6) = 7
      .toDF("sid", "date", "high", "low", "close")
    val out = Indicators.atr(bars, window = 2)
      .orderBy("date").collect()
    assert(out.map(_.getAs[Double]("tr")).toSeq == Seq(2.0, 2.0, 7.0))
    assert(out(0).isNullAt(out(0).fieldIndex("atr_2")))
    assert(out(1).getAs[Double]("atr_2") == 2.0)
    assert(out(2).getAs[Double]("atr_2") == 4.5)
    intercept[IllegalArgumentException](Indicators.atr(bars, 0))
  }

  test("efficiencyRatio: straight line → 1, round trip → 0, flat " +
    "window → null, null until filled (w23)") {
    val bars = (Seq(
      ("A", "d1", 10.0), ("A", "d2", 11.0), ("A", "d3", 12.0), // monotone
      ("B", "d1", 10.0), ("B", "d2", 12.0), ("B", "d3", 10.0), // round trip
      ("C", "d1", 5.0), ("C", "d2", 5.0), ("C", "d3", 5.0)))   // flat
      .toDF("sid", "date", "close")
    val out = Indicators.efficiencyRatio(bars, window = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(r.fieldIndex("ker_2"))) None
         else Some(r.getAs[Double]("ker_2")))).toMap
    assert(out(("A", "d2")).isEmpty) // only 1 change in the frame
    assert(out(("A", "d3")).contains(1.0)) // |2|/2: pure trend
    assert(out(("B", "d3")).contains(0.0)) // |0|/4: pure churn
    assert(out(("C", "d3")).isEmpty) // zero path length → undefined
    intercept[IllegalArgumentException](Indicators.efficiencyRatio(bars, 0))
  }

  test("rsi: 100·ΣG/(ΣG+ΣL) goldens, all-loss → 0, flat window → null, " +
    "first bar's undefined change never fills the window (w15)") {
    val bars = Seq(
      ("A", "d1", 10.0), ("A", "d2", 12.0), ("A", "d3", 11.0),
      ("A", "d4", 11.0), ("A", "d5", 9.0),
      ("B", "d1", 5.0), ("B", "d2", 5.0), ("B", "d3", 5.0))
      .toDF("sid", "date", "close")
    val out = Indicators.rsi(bars, window = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out(("A", "d1")).isEmpty)
    assert(out(("A", "d2")).isEmpty) // only ONE defined change so far
    assert(out(("A", "d3")) == Some(66.666667)) // G=2, L=1
    assert(out(("A", "d4")) == Some(0.0))       // changes −1, 0 → all loss
    assert(out(("A", "d5")) == Some(0.0))
    assert(out(("B", "d3")).isEmpty) // flat: ΣG+ΣL = 0 → undefined
  }

  test("stochasticK: position in the rolling range, flat range → null " +
    "(w16)") {
    val bars = Seq(
      ("A", "d1", 10.0, 8.0, 9.0), ("A", "d2", 12.0, 9.0, 11.0),
      ("A", "d3", 11.0, 10.0, 10.0),
      ("B", "d1", 5.0, 5.0, 5.0), ("B", "d2", 5.0, 5.0, 5.0))
      .toDF("sid", "date", "high", "low", "close")
    val out = Indicators.stochasticK(bars, window = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toMap
    assert(out(("A", "d1")).isEmpty) // window not full
    // d2: H=12, L=8, close 11 → (11−8)/4·100 = 75
    assert(out(("A", "d2")) == Some(75.0))
    // d3: H=12, L=9, close 10 → 1/3·100
    assert(out(("A", "d3")) == Some(33.333333))
    assert(out(("B", "d2")).isEmpty) // flat range
  }

  test("obv: signed volume cumsum; first bar and flat days contribute 0 " +
    "(w17)") {
    val bars = Seq(
      ("A", "d1", 10.0, 100L), ("A", "d2", 12.0, 50L),
      ("A", "d3", 12.0, 70L), ("A", "d4", 11.0, 30L))
      .toDF("sid", "date", "close", "volume")
    val out = Indicators.obv(bars).orderBy("date")
      .select("obv").as[Long].collect()
    assert(out.toSeq == Seq(0L, 50L, 50L, 20L))
  }

  test("bollinger: exact-micro SMA mid, bands from the rounded rolling " +
    "stddev, null until the window fills (w18)") {
    val bars = Seq(
      ("A", "d1", 10.0), ("A", "d2", 14.0), ("A", "d3", 12.0))
      .toDF("sid", "date", "close")
    val out = Indicators.bollinger(bars, window = 2)
      .orderBy("date").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("bb_mid_2")))
    // window (10, 14): mid 12, sd_samp = |14−10|/√2 = 2.828427
    val sd1 = math.rint(math.sqrt(8.0) * 1e6) / 1e6
    assert(out(1).getAs[Double]("bb_mid_2") == 12.0)
    assert(out(1).getAs[Double]("bb_up_2") == 12.0 + 2 * sd1)
    assert(out(1).getAs[Double]("bb_dn_2") == 12.0 - 2 * sd1)
    // window (14, 12): mid 13, sd = √2
    val sd2 = math.rint(math.sqrt(2.0) * 1e6) / 1e6
    assert(out(2).getAs[Double]("bb_mid_2") == 13.0)
    assert(out(2).getAs[Double]("bb_up_2") == 13.0 + 2 * sd2)
    intercept[IllegalArgumentException](Indicators.bollinger(bars, 1))
  }

  test("vwap: micro-exact notional over exact volume, zero-volume " +
    "window → null (w19)") {
    val bars = Seq(
      ("A", "d1", 10.0, 100L), ("A", "d2", 20.0, 300L),
      ("A", "d3", 30.0, 0L), ("A", "d4", 40.0, 0L))
      .toDF("sid", "date", "close", "volume")
    val out = Indicators.vwap(bars, window = 2).orderBy("date").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("vwap_2")))
    // (10·100 + 20·300) / 400 = 17.5
    assert(out(1).getAs[Double]("vwap_2") == 17.5)
    // (20·300 + 30·0) / 300 = 20
    assert(out(2).getAs[Double]("vwap_2") == 20.0)
    // both bars zero-volume → undefined
    assert(out(3).isNullAt(out(3).fieldIndex("vwap_2")))
  }
}
