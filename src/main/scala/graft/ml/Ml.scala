package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.panel.Panel
import graft.panel.Panel.Keys
import graft.pipeline.Strategy

/** ML-strategy surface — reference `MoonshotML` (ml.py:354-517, SURVEY
  * §2.9/§3.3).
  *
  * M1 feature assembly: the reference stacks per-feature panels into a
  * sample×feature matrix (ml.py:444-487). Long-format equivalent: each
  * feature is a column on the panel; [[Features.assemble]] packs them into
  * an `array<double>` column (nulls → 0, mirroring ml.py:480 fillna(0)).
  *
  * M2 predict: sklearn/Keras models don't exist on the JVM; the seam is
  * [[PanelPredictor]] — any `DataFrame => DataFrame` adding a `prediction`
  * column. [[LinearPredictor]] is the built-in, fully-distributed baseline
  * (a dot product in codegen'd column algebra — no UDF, no model server).
  * Real model parity would load ONNX/PMML inside mapPartitions; the
  * dataflow is identical.
  *
  * M3 predictions → signals: predictions stay on the long panel; the
  * user hook turns them into a `signal` column (ml.py:301-352).
  */
object Features {

  /** M1: pack feature columns into `features: array<double>`, null→0. */
  def assemble(df: DataFrame, featureCols: Seq[String], out: String = "features"): DataFrame =
    df.withColumn(out,
      array(featureCols.map(c => coalesce(col(c).cast("double"), lit(0.0))): _*))

  /** Standard lagged-return features over a close panel (the reference's
    * canonical example, ml.py:190-196). */
  def laggedReturns(df: DataFrame, lags: Seq[Int], closeCol: String = "close")(
      implicit k: Keys): DataFrame =
    lags.foldLeft(df) { (d, n) =>
      d.withColumn(s"return_${n}d",
        Panel.ieeeDiv(col(closeCol), Panel.lagBySid(col(closeCol), n)) - 1.0)
    }
}

/** M2 seam: adds a `prediction` column to a panel with a `features`
  * array column. */
trait PanelPredictor extends Serializable {
  def predict(df: DataFrame, featuresCol: String = "features"): DataFrame
}

/** Linear/logistic baseline predictor: w·x + b, optionally squashed.
  * Pure column algebra → whole-stage codegen, shuffles nothing. */
final case class LinearPredictor(
    weights: Seq[Double],
    intercept: Double = 0.0,
    logistic: Boolean = false)
    extends PanelPredictor {
  def predict(df: DataFrame, featuresCol: String = "features"): DataFrame = {
    val dot = weights.zipWithIndex
      .map { case (w, i) => element_at(col(featuresCol), i + 1) * lit(w) }
      .foldLeft(lit(intercept): Column)(_ + _)
    val p = if (logistic) lit(1.0) / (lit(1.0) + exp(-dot)) else dot
    df.withColumn("prediction", p)
  }
}

/** Reference `MoonshotML`: `prices_to_signals` is replaced by
  * features → predict → `predictions_to_signals` (ml.py:412-517). */
trait MLStrategy extends Strategy {
  def predictor: PanelPredictor

  /** Hook: add feature columns; return (panel, featureColumnNames)
    * (reference prices_to_features, ml.py:227-298). */
  def pricesToFeatures(prices: DataFrame): (DataFrame, Seq[String])

  /** Hook: `prediction` → `signal` (reference ml.py:301-352). */
  def predictionsToSignals(panel: DataFrame): DataFrame

  final def pricesToSignals(prices: DataFrame): DataFrame = {
    val (withFeatures, featureCols) = pricesToFeatures(prices)
    val assembled = Features.assemble(withFeatures, featureCols)
    predictionsToSignals(predictor.predict(assembled))
  }
}
