package graft

import org.apache.spark.sql.functions._

import graft.panel.Panel.Keys
import graft.perf.FactorModel

/** Fama-MacBeth goldens: exact-fit recovery, singular/thin guards, and
  * the pass-2 premia t-stats. */
class FactorModelSpec extends SparkSpec {
  import spark.implicits._

  private implicit val k: Keys = Keys(sid = "sid", order = Seq("date"))

  test("crossSectionalRegression recovers an exact fit: y = 0.5 + 2·f1 − f2") {
    val df = Seq(
      ("2024-01-01", "A", 0.0, 0.0, 0.5),
      ("2024-01-01", "B", 1.0, 0.0, 2.5),
      ("2024-01-01", "C", 0.0, 1.0, -0.5),
      ("2024-01-01", "D", 1.0, 1.0, 1.5))
      .toDF("date", "sid", "f1", "f2", "y")
    val out = FactorModel.crossSectionalRegression(
      df, col("y"), col("f1"), col("f2")).head
    assert(out.getAs[Long]("n") == 4L)
    assert(out.getAs[Double]("alpha") == 0.5)
    assert(out.getAs[Double]("beta1") == 2.0)
    assert(out.getAs[Double]("beta2") == -1.0)
  }

  test("withCrossSectionalResiduals: exact fit → zero residuals; a row " +
    "off the plane keeps its distance; null inputs → null (px9)") {
    val df = Seq(
      ("2024-01-01", "A", 0.0, 0.0, Some(0.5)),
      ("2024-01-01", "B", 1.0, 0.0, Some(2.5)),
      ("2024-01-01", "C", 0.0, 1.0, Some(-0.5)),
      ("2024-01-01", "D", 1.0, 1.0, Some(1.5)),
      ("2024-01-02", "A", 0.0, 0.0, Option.empty[Double]))
      .toDF("date", "sid", "f1", "f2", "y")
    val out = FactorModel.withCrossSectionalResiduals(
      df, col("y"), col("f1"), col("f2"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        Option(r.get(r.fieldIndex("resid2")))).toMap
    // the d1 plane fits exactly → residuals all +0.0
    Seq("A", "B", "C", "D").foreach { s =>
      assert(out(("2024-01-01", s)) == Some(0.0), s)
    }
    assert(out(("2024-01-02", "A")).isEmpty) // null y, unfittable date
    // perturb one row: its residual absorbs most of the shift
    val bent = df.where(col("y").isNotNull)
      .withColumn("y", when(col("sid") === "D", 2.5).otherwise(col("y")))
    val r = FactorModel.withCrossSectionalResiduals(
      bent, col("y"), col("f1"), col("f2"))
      .collect().map(x => x.getString(1) -> x.getAs[Double]("resid2")).toMap
    assert(r("D") > 0.2) // D sits above its own date's best plane
    assert(math.abs(r.values.sum) < 1e-4) // residuals ≈ mean-zero
  }

  test("crossSectionalRegression: thin (n<3) and collinear dates → null " +
    "coefficients, not garbage") {
    val df = Seq(
      // n = 2: underdetermined for 3 unknowns
      ("2024-01-01", "A", 0.0, 0.0, 0.5), ("2024-01-01", "B", 1.0, 0.0, 2.5),
      // f2 = 2·f1: exactly collinear design
      ("2024-01-02", "A", 0.0, 0.0, 0.5), ("2024-01-02", "B", 1.0, 2.0, 2.5),
      ("2024-01-02", "C", 2.0, 4.0, 4.5), ("2024-01-02", "D", 3.0, 6.0, 6.5),
      // f2 constant: collinear with the intercept column
      ("2024-01-03", "A", 0.0, 7.0, 0.5), ("2024-01-03", "B", 1.0, 7.0, 2.5),
      ("2024-01-03", "C", 2.0, 7.0, 4.5))
      .toDF("date", "sid", "f1", "f2", "y")
    val out = FactorModel.crossSectionalRegression(
      df, col("y"), col("f1"), col("f2")).orderBy("date").collect()
    out.foreach { r =>
      assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4), r.toString)
    }
    // null factor rows are excluded, not zero-filled
    val withNull = Seq(
      ("2024-01-01", "A", 0.0, 0.0, 0.5), ("2024-01-01", "B", 1.0, 0.0, 2.5),
      ("2024-01-01", "C", 0.0, 1.0, -0.5), ("2024-01-01", "D", 1.0, 1.0, 1.5),
      ("2024-01-01", "E", Double.NaN, 0.0, 9.9))
      .toDF("date", "sid", "f1", "f2", "y")
      .withColumn("f1", when(!isnan(col("f1")), col("f1")))
    val r = FactorModel.crossSectionalRegression(
      withNull, col("y"), col("f1"), col("f2")).head
    assert(r.getAs[Long]("n") == 4L && r.getAs[Double]("beta1") == 2.0)
  }

  test("riskPremia: mean and t = mean/std·√n over the coefficient series; " +
    "flat and thin guards") {
    val coeffs = Seq(
      (0.1, 2.0, 0.5), (0.3, 2.0, 0.7)).toDF("alpha", "beta1", "beta2")
    val out = FactorModel.riskPremia(coeffs).head
    // alpha: mean 0.2, sample std √0.02 → t = 0.2/√0.02·√2 = 2 exactly
    assert(out.getAs[Long]("n_alpha") == 2L)
    assert(out.getAs[Double]("mean_alpha") == 0.2)
    assert(out.getAs[Double]("t_alpha") == 2.0)
    // beta1 flat → std 0 → t null, mean exact
    assert(out.getAs[Double]("mean_beta1") == 2.0)
    assert(out.isNullAt(out.fieldIndex("t_beta1")))
    // beta2: mean 0.6, std √0.02 → t = 0.6/√0.02·√2 = 6
    assert(out.getAs[Double]("mean_beta2") == 0.6)
    assert(out.getAs[Double]("t_beta2") == 6.0)
    // single row: mean defined, t null
    val one = FactorModel.riskPremia(
      Seq((0.1, 2.0, 0.5)).toDF("alpha", "beta1", "beta2")).head
    assert(one.getAs[Double]("mean_alpha") == 0.1)
    assert(one.isNullAt(one.fieldIndex("t_alpha")))
  }
}
