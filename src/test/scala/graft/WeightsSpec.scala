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
}
