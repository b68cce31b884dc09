package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.{Backtest, Strategy}

/** D16 position-size limiter (reference base.py:921-972 +
  * limit_position_sizes hook base.py:974-1048): weights → integer
  * quantities via NLV and contract values, clamped per sid/date by the
  * max-quantity panels, converted back to weights.
  */
class LimitsSpec extends SparkSpec {
  import spark.implicits._

  // close=10 throughout: weight 0.5 × nlv 1000 / 10 = 50 shares
  private lazy val prices = Seq(
    ("A", "2024-01-01", 10.0), ("A", "2024-01-02", 10.0),
    ("B", "2024-01-01", 10.0), ("B", "2024-01-02", 10.0))
    .toDF("sid", "date", "close").withColumn("date", to_date($"date"))

  private lazy val master = Seq(
    ("A", "STK", 1.0, 1.0), ("B", "STK", 1.0, 1.0))
    .toDF("sid", "secType", "priceMagnifier", "multiplier")

  object LimitedStrategy extends Strategy {
    val code = "limited"
    def pricesToSignals(prices: DataFrame): DataFrame =
      prices.withColumn("signal", lit(1)) // both long every day → weight 0.5
    override def limitPositionSizes(prices: DataFrame): (Option[DataFrame], Option[DataFrame]) = {
      // cap sid A at 30 shares long; B unlimited (null row absent)
      val maxLong = Seq(("A", "2024-01-01", 30.0), ("A", "2024-01-02", 30.0))
        .toDF("sid", "date", "max_quantity")
        .withColumn("date", to_date($"date"))
      (Some(maxLong), None)
    }
  }

  test("weights are clamped via quantity space and converted back (D16)") {
    val results = Backtest.run(LimitedStrategy, prices, Some(master),
      Backtest.Config(nlv = Some(1000.0)))
    val w = results.where($"field" === "Weight" && $"date" === "2024-01-01")
      .collect().map(r => r.getAs[String]("sid") -> r.getAs[Double]("value")).toMap
    // A: 50 shares → clamped 30 → 30×10/1000 = 0.3; B: unclamped 0.5
    assert(r7(w("A")) == 0.3)
    assert(r7(w("B")) == 0.5)
  }

  test("short limits clamp the negative side (base.py:963-966)") {
    object ShortLimited extends Strategy {
      val code = "short-limited"
      def pricesToSignals(prices: DataFrame): DataFrame =
        prices.withColumn("signal", lit(-1))
      override def signalsToTargetWeights(panel: DataFrame): DataFrame =
        panel.withColumn("weight", lit(-0.5))
      override def limitPositionSizes(prices: DataFrame): (Option[DataFrame], Option[DataFrame]) = {
        val maxShort = Seq(("A", "2024-01-01", 20.0), ("A", "2024-01-02", 20.0))
          .toDF("sid", "date", "max_quantity")
          .withColumn("date", to_date($"date"))
        (None, Some(maxShort))
      }
    }
    val results = Backtest.run(ShortLimited, prices, Some(master),
      Backtest.Config(nlv = Some(1000.0)))
    val w = results.where($"field" === "Weight" && $"date" === "2024-01-01")
      .collect().map(r => r.getAs[String]("sid") -> r.getAs[Double]("value")).toMap
    // A: −50 shares → clamped −20 → −0.2; B unclamped −0.5
    assert(r7(w("A")) == -0.2)
    assert(r7(w("B")) == -0.5)
  }

  test("limits without NLV raise the reference's parameter error (base.py:930)") {
    val err = intercept[IllegalArgumentException] {
      Backtest.run(LimitedStrategy, prices, Some(master)).collect()
    }
    assert(err.getMessage.toLowerCase.contains("nlv"))
  }
}
