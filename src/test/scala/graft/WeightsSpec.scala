package graft

import org.apache.spark.sql.functions._

import graft.alloc.Weights
import graft.panel.Panel
import graft.panel.Panel.Keys

/** Property checks from SURVEY §5: equal weights sum to ≤ cap; neutralized
  * long Σ equals short Σ; capped fixed weights never exceed the cap. */
class WeightsSpec extends SparkSpec {
  import spark.implicits._

  implicit val k: Keys = Panel.eod

  // deterministic pseudo-random signal panel: 20 sids × 30 dates, signals ∈ {-1,0,1}
  private lazy val signals = {
    val rows = for {
      sid <- 1 to 20
      d <- 1 to 30
    } yield {
      val h = (sid * 31 + d * 17) % 5
      val sig = if (h == 0) 0.0 else if (h % 2 == 0) 1.0 else -1.0
      (f"S$sid%02d", f"2024-01-$d%02d", sig)
    }
    rows.toDF("sid", "date", "signal").withColumn("date", to_date($"date"))
  }

  // ---- reference golden values (_tests/test_weight_allocations.py) ----

  private def panel3(sigs: Seq[(Double, Double, Double)]) =
    sigs.zipWithIndex.flatMap { case ((a, b, c), i) =>
      Seq(("FI12345", f"2024-01-${i + 1}%02d", a),
        ("FI23456", f"2024-01-${i + 1}%02d", b),
        ("FI34567", f"2024-01-${i + 1}%02d", c))
    }.toDF("sid", "date", "signal").withColumn("date", to_date($"date"))

  private def weightsOf(df: org.apache.spark.sql.DataFrame): Map[(String, String), Double] =
    df.collect().map(r => (r.getAs[String]("sid"), r.getAs[java.sql.Date]("date").toString) ->
      r7(r.getAs[Double]("w"))).toMap

  private def series(m: Map[(String, String), Double], sid: String, n: Int): Seq[Double] =
    (1 to n).map(i => m((sid, f"2024-01-$i%02d")))

  test("allocate_equal_weights golden (test_weight_allocations.py:27-53)") {
    val sigs = Seq((1.0, 0.0), (1.0, -1.0), (1.0, 1.0), (0.0, 0.0), (0.0, -1.0))
      .zipWithIndex.flatMap { case ((a, b), i) =>
        Seq(("FI12345", f"2024-01-${i + 1}%02d", a), ("FI23456", f"2024-01-${i + 1}%02d", b))
      }.toDF("sid", "date", "signal").withColumn("date", to_date($"date"))
    val w1 = weightsOf(sigs.withColumn("w", Weights.equalWeights($"signal", cap = 1.0)))
    assert(series(w1, "FI12345", 5) == Seq(1.0, 0.5, 0.5, 0.0, 0.0))
    assert(series(w1, "FI23456", 5) == Seq(0.0, -0.5, 0.5, 0.0, -1.0))
    val w2 = weightsOf(sigs.withColumn("w", Weights.equalWeights($"signal", cap = 0.5)))
    assert(series(w2, "FI12345", 5) == Seq(0.5, 0.25, 0.25, 0.0, 0.0))
    assert(series(w2, "FI23456", 5) == Seq(0.0, -0.25, 0.25, 0.0, -0.5))
  }

  test("allocate_fixed_weights + capped golden (test_weight_allocations.py:55-107)") {
    val p = panel3(Seq((1, 0, 1), (1, -1, 1), (1, 1, 1), (0, 0, -1), (0, -1, -1))
      .map { case (a, b, c) => (a.toDouble, b.toDouble, c.toDouble) })
    val fixed = weightsOf(p.withColumn("w", Weights.fixedWeights($"signal", 0.34)))
    assert(series(fixed, "FI23456", 5) == Seq(0.0, -0.34, 0.34, 0.0, -0.34))
    // cap 1.5 never binds
    val c15 = weightsOf(p.withColumn("w",
      Weights.fixedWeightsCapped($"signal", 0.34, cap = 1.5)))
    assert(series(c15, "FI34567", 5) == Seq(0.34, 0.34, 0.34, -0.34, -0.34))
    // cap 0.81: days with |sum| 1.02 fall back to equal weights ×0.81
    val c081 = weightsOf(p.withColumn("w",
      Weights.fixedWeightsCapped($"signal", 0.34, cap = 0.81)))
    assert(series(c081, "FI12345", 5) == Seq(0.34, 0.27, 0.27, 0.0, 0.0))
    assert(series(c081, "FI23456", 5) == Seq(0.0, -0.27, 0.27, 0.0, -0.34))
    assert(series(c081, "FI34567", 5) == Seq(0.34, 0.27, 0.27, -0.34, -0.34))
  }

  test("allocate_market_neutral_fixed_weights_capped golden " +
    "(test_weight_allocations.py:108-139)") {
    val p = panel3(Seq((1, 0, 1), (1, -1, 1), (1, 1, -1), (0, 1, -1), (0, -1, -1))
      .map { case (a, b, c) => (a.toDouble, b.toDouble, c.toDouble) })
    val un = weightsOf(p.withColumn("w",
      Weights.marketNeutralFixedWeightsCapped($"signal", 0.34, cap = 1.2, neutralize = false)))
    assert(series(un, "FI12345", 5) == Seq(0.3, 0.3, 0.3, 0.0, 0.0))
    assert(series(un, "FI23456", 5) == Seq(0.0, -0.34, 0.3, 0.34, -0.3))
    assert(series(un, "FI34567", 5) == Seq(0.3, 0.3, -0.34, -0.34, -0.3))
    val nt = weightsOf(p.withColumn("w",
      Weights.marketNeutralFixedWeightsCapped($"signal", 0.34, cap = 1.2)))
    assert(series(nt, "FI12345", 5) == Seq(0.0, 0.17, 0.17, 0.0, 0.0))
    assert(series(nt, "FI23456", 5) == Seq(0.0, -0.34, 0.17, 0.34, 0.0))
    assert(series(nt, "FI34567", 5) == Seq(0.0, 0.17, -0.34, -0.34, 0.0))
  }

  test("equal weights: |weights| sum to cap on active days, 0 otherwise (D1)") {
    val sums = signals
      .withColumn("w", Weights.equalWeights($"signal"))
      .groupBy("date").agg(sum(abs($"w")).as("s"), sum(abs($"signal")).as("nsig"))
      .collect()
    sums.foreach { r =>
      val (s, nsig) = (r.getDouble(1), r.getDouble(2))
      if (nsig > 0) assert(math.abs(s - 1.0) < 1e-9, s"day sum $s != 1")
      else assert(s == 0.0)
    }
  }

  test("neutralized weights: long total == short total per date (D5)") {
    val w = signals.withColumn("w", Weights.neutralizeWeights($"signal" * 0.1))
    val perDate = w.groupBy("date").agg(
      sum(when($"w" > 0, $"w").otherwise(0.0)).as("long"),
      sum(when($"w" < 0, -$"w").otherwise(0.0)).as("short"))
      .collect()
    perDate.foreach { r =>
      val (l, s) = (r.getDouble(1), r.getDouble(2))
      if (l > 0 && s > 0) assert(math.abs(l - s) < 1e-9, s"long $l != short $s")
    }
  }

  test("fixed capped weights never exceed the cap (D3)") {
    val w = signals.withColumn("w", Weights.fixedWeightsCapped($"signal", 0.2, cap = 1.0))
    val sums = w.groupBy("date").agg(sum(abs($"w")).as("s")).collect()
    sums.foreach(r => assert(r.getDouble(1) <= 1.0 + 1e-9))
  }

  test("market-neutral capped: each side ≤ cap/2 (D4)") {
    val w = signals.withColumn("w",
      Weights.marketNeutralFixedWeightsCapped($"signal", 0.2, cap = 1.0))
    val perDate = w.groupBy("date").agg(
      sum(when($"w" > 0, $"w").otherwise(0.0)).as("long"),
      sum(when($"w" < 0, -$"w").otherwise(0.0)).as("short"))
      .collect()
    perDate.foreach { r =>
      assert(r.getDouble(1) <= 0.5 + 1e-9)
      assert(r.getDouble(2) <= 0.5 + 1e-9)
    }
  }

  test("equal weights divide by active count (weight.py:22-36 example)") {
    val df = Seq(
      ("A", "2024-01-01", 1.0), ("B", "2024-01-01", 1.0),
      ("C", "2024-01-01", 0.0), ("A", "2024-01-02", -1.0))
      .toDF("sid", "date", "signal").withColumn("date", to_date($"date"))
    val out = df.select($"sid", $"date", Weights.equalWeights($"signal").as("w"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString) -> r.getDouble(2)).toMap
    assert(out(("A", "2024-01-01")) == 0.5)
    assert(out(("C", "2024-01-01")) == 0.0)
    assert(out(("A", "2024-01-02")) == -1.0)
  }

  test("inverseVolWeights: capital ∝ 1/vol, per-date |w| sums to 1, " +
    "null/zero-vol rows weight 0 (d27)") {
    val df = Seq(
      // date 1: vols 0.01 and 0.02 → weights 2/3 and −1/3
      ("A", "2024-01-01", 1.0, Some(0.01)), ("B", "2024-01-01", -1.0, Some(0.02)),
      // date 2: one null vol (warm-up) → all capital to the other
      ("A", "2024-01-02", 1.0, None), ("B", "2024-01-02", 1.0, Some(0.05)),
      // date 3: nothing allocatable
      ("A", "2024-01-03", 1.0, None))
      .toDF("sid", "date", "signal", "vol")
    val out = df.select(col("sid"), col("date"),
      Weights.inverseVolWeights(col("signal"), col("vol")).as("w"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(math.abs(out(("A", "2024-01-01")) - 2.0 / 3) < 1e-12)
    assert(math.abs(out(("B", "2024-01-01")) + 1.0 / 3) < 1e-12)
    assert(out(("A", "2024-01-02")) == 0.0)
    assert(out(("B", "2024-01-02")) == 1.0)
    assert(out(("A", "2024-01-03")) == 0.0)
  }

  test("betaHedge: per-date −Σ w·β on the hedge sid; missing betas " +
    "contribute 0; zero net beta → +0.0 (d30)") {
    val weights = Seq(
      ("A", "2024-01-01", 0.5), ("B", "2024-01-01", 0.5),
      ("A", "2024-01-02", 1.0), ("C", "2024-01-02", -1.0))
      .toDF("sid", "date", "weight")
    val betas = Seq(("A", 1.2), ("B", 0.8)).toDF("sid", "beta") // C unknown
    val byDate = Weights.betaHedge(weights, betas, "SPY")
      .collect().map(r => r.getAs[String]("date") ->
        (r.getAs[String]("sid"), r.getAs[Double]("hedge_weight"))).toMap
    // d1: −(0.5·1.2 + 0.5·0.8) = −1.0 ; d2: C has no beta → −(1.0·1.2)
    assert(byDate("2024-01-01") == (("SPY", -1.0)))
    assert(byDate("2024-01-02") == (("SPY", -1.2)))
    // exactly offsetting book: hedge is +0.0, not −0.0
    val flat = Seq(("A", "2024-01-01", 0.5), ("B", "2024-01-01", -0.75))
      .toDF("sid", "date", "weight")
    val fb = Seq(("A", 1.5), ("B", 1.0)).toDF("sid", "beta")
    val h = Weights.betaHedge(flat, fb, "SPY").head.getAs[Double]("hedge_weight")
    assert(h == 0.0 && (1.0 / h) > 0) // +0.0, not −0.0
  }

  test("constrainShortsByBorrow: shorts clamp at the locate cap, " +
    "missing locate → +0.0 unshortable, longs untouched (d33)") {
    val weights = Seq(
      ("A", "2024-01-01", -0.10), // capped at 0.05
      ("B", "2024-01-01", -0.02), // under the cap → unchanged
      ("C", "2024-01-01", -0.10), // no locate → 0
      ("D", "2024-01-01", 0.30))  // long → untouched
      .toDF("sid", "date", "weight")
    val borrow = Seq(("A", 0.05), ("B", 0.05)).toDF("sid", "max_short_weight")
    val out = Weights.constrainShortsByBorrow(weights, borrow)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Double]("weight"), r.getAs[Boolean]("was_constrained")))).toMap
    assert(out("A") == ((-0.05, true)))
    assert(out("B") == ((-0.02, false)))
    assert(out("C")._2 && out("C")._1 == 0.0 && (1.0 / out("C")._1) > 0) // +0.0
    assert(out("D") == ((0.30, false)))
  }
}
