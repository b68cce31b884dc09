package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ml.{Features, LinearPredictor, MLStrategy, PanelPredictor}
import graft.panel.Panel
import graft.pipeline.Backtest

class MlSpec extends SparkSpec {
  import spark.implicits._

  implicit val k: Panel.Keys = Panel.eod

  private lazy val prices = Seq(
    ("A", "2024-01-01", 100.0), ("A", "2024-01-02", 110.0),
    ("A", "2024-01-03", 99.0), ("A", "2024-01-04", 108.9),
    ("B", "2024-01-01", 50.0), ("B", "2024-01-02", 45.0),
    ("B", "2024-01-03", 49.5), ("B", "2024-01-04", 44.55))
    .toDF("sid", "date", "close").withColumn("date", to_date($"date"))

  test("laggedReturns + assemble build the feature array (M1)") {
    val (f, _) = (Features.laggedReturns(prices, Seq(1, 2)), ())
    val assembled = Features.assemble(f, Seq("return_1d", "return_2d"))
    val row = assembled.where($"sid" === "A" && $"date" === "2024-01-03")
      .select("features").head.getSeq[Double](0)
    assert(r7(row.head) == r7(99.0 / 110.0 - 1))
    assert(r7(row(1)) == r7(99.0 / 100.0 - 1))
    // warm-up rows: missing lags are zero-filled (ml.py:480)
    val first = assembled.where($"sid" === "A" && $"date" === "2024-01-01")
      .select("features").head.getSeq[Double](0)
    assert(first == Seq(0.0, 0.0))
  }

  test("LinearPredictor computes w·x + b; logistic squashes to (0,1) (M2)") {
    val df = Seq((Seq(1.0, 2.0))).toDF("features")
    val linear = LinearPredictor(Seq(0.5, -0.25), intercept = 1.0)
      .predict(df).select("prediction").head.getDouble(0)
    assert(linear == 1.0 + 0.5 - 0.5)
    val p = LinearPredictor(Seq(10.0, 0.0), logistic = true)
      .predict(df).select("prediction").head.getDouble(0)
    assert(p > 0.999 && p < 1.0)
  }

  test("MLStrategy runs end-to-end through the backtest pipeline (§3.3)") {
    object MomentumML extends MLStrategy {
      val code = "ml-momentum"
      val predictor: PanelPredictor = LinearPredictor(Seq(1.0), intercept = 0.0)
      def pricesToFeatures(prices: DataFrame): (DataFrame, Seq[String]) =
        (Features.laggedReturns(prices, Seq(1)), Seq("return_1d"))
      def predictionsToSignals(panel: DataFrame): DataFrame =
        panel.withColumn("signal", ($"prediction" > 0).cast("int"))
    }
    val results = Backtest.run(MomentumML, prices)
    assert(results.count() == 80) // 10 fields × 8 rows
    // signal on A/01-02 = 1 (return +10%), on B/01-02 = 0 (−10%)
    val sig = results.where($"field" === "Signal" && $"date" === "2024-01-02")
      .collect().map(r => r.getAs[String]("sid") -> r.getAs[Double]("value")).toMap
    assert(sig("A") == 1.0 && sig("B") == 0.0)
  }
}
