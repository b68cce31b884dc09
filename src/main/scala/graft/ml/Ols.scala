package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordinary least squares by normal equations in ONE distributed pass —
  * the 100 TB regression path: every moment the solve needs (n, Σxᵢ,
  * Σxᵢxⱼ, Σxᵢy, Σy, Σy²) is a map-side-combinable integer aggregate, so
  * the whole fit is a single `agg` over the fact table and the solve is
  * scalar algebra ON THE ONE RESULT ROW — no driver loop, no second
  * scan, no collect.
  *
  * This closed form covers two features + intercept (3×3 Cramer written
  * out); for wider designs use [[Pca.gram]] for X'X and a driver-side
  * bounded d×d solve (the pca2 pattern) — the data pass is identical,
  * only the solve grows.
  *
  * Cross-engine exactness: inputs are integer units (the caller passes
  * already-integered columns — whole dollars, not cents, for y when y²
  * sums approach 2⁶³), the moment sums are exact BIGINTs, and the Cramer
  * determinants/R² are ONE fixed IEEE expression tree over those exact
  * integers — the oracle spells the identical shape, so 6dp rounding
  * agrees bit-for-bit. Contract: moment sums must stay under 2⁵³ for the
  * double cast to be exact (raise the unit granularity on bigger data).
  */
object Ols {

  /** Fit y ~ 1 + x1 + x2. All three columns must already be integral
    * (LONG). Output: one row (n, beta0, beta1, beta2, r2), 6dp. */
  def ols2(df: DataFrame, yCol: String, x1Col: String, x2Col: String): DataFrame =
    fit2(df, yCol, x1Col, x2Col, lambda = 0L)

  /** Ridge (L2) variant: λ adds to the slope diagonal of X'X — the
    * intercept is NOT penalized (standard practice; shrinking the mean
    * would bias every prediction). λ is an exact integer in the same
    * squared units as the moments, so the only change to the solve is
    * two integer additions before the double cast — the data pass, the
    * Cramer shape, and the cross-engine determinism argument are all
    * unchanged. `r2` reports the UNPENALIZED residual of the shrunk
    * coefficients (what a holdout would see), so λ→∞ drives it toward
    * the intercept-only 0. */
  def ridge2(df: DataFrame, yCol: String, x1Col: String, x2Col: String,
      lambda: Long): DataFrame = {
    require(lambda > 0, s"lambda must be positive: $lambda (use ols2 for 0)")
    fit2(df, yCol, x1Col, x2Col, lambda)
  }

  /** The whole regularization path in ONE data pass: the moments are
    * computed once, then each λ is a ROW (a bounded literal explode on
    * the single moment row) and the solve/R² expressions run per λ —
    * grid search without rescanning the facts. λ = 0 reproduces OLS
    * exactly (same expressions, same IEEE), so the path embeds its own
    * unregularized anchor. Output: one row per λ, ascending. */
  def ridgePath(df: DataFrame, yCol: String, x1Col: String, x2Col: String,
      lambdas: Seq[Long]): DataFrame = {
    require(lambdas.nonEmpty && lambdas.forall(_ >= 0),
      s"lambdas must be non-negative: $lambdas")
    require(lambdas.distinct.size == lambdas.size, s"duplicate lambdas")
    solve(
      momentsOf(df, yCol, x1Col, x2Col)
        .select(col("*"),
          explode(array(lambdas.sorted.map(lit): _*)).as("lambda")),
      col("lambda"), Seq(col("lambda")))
  }

  private def momentsOf(df: DataFrame, yCol: String, x1Col: String,
      x2Col: String): DataFrame = {
    val (y, x1, x2) = (col(yCol), col(x1Col), col(x2Col))
    df.agg(
      count(lit(1)).as("n"),
      sum(x1).as("s1"), sum(x2).as("s2"), sum(y).as("sy"),
      sum(x1 * x1).as("s11"), sum(x1 * x2).as("s12"), sum(x2 * x2).as("s22"),
      sum(x1 * y).as("s1y"), sum(x2 * y).as("s2y"), sum(y * y).as("syy"))
  }

  private def fit2(df: DataFrame, yCol: String, x1Col: String, x2Col: String,
      lambda: Long): DataFrame =
    solve(momentsOf(df, yCol, x1Col, x2Col), lit(lambda), Seq.empty)

  private def solve(moments: DataFrame, lambda: Column,
      keyCols: Seq[Column]): DataFrame = {
    def d(c: String): Column = col(c).cast("double")
    val (n, s1, s2, sy) = (d("n"), d("s1"), d("s2"), d("sy"))
    // ridge: λ on the slope diagonal as an INTEGER add before the cast
    // — penalized moments steer the SOLVE only; the residual below uses
    // the RAW moments (r2 is the unpenalized fit of the shrunk betas)
    val s11 = (col("s11") + lambda).cast("double")
    val s22 = (col("s22") + lambda).cast("double")
    val s12 = d("s12")
    val (r11, r22) = (d("s11"), d("s22"))
    val (s1y, s2y, syy) = (d("s1y"), d("s2y"), d("syy"))
    val det = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s12 - s11 * s2)
    val det0 = sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) +
      s2 * (s1y * s12 - s11 * s2y)
    val det1 = n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s2y - s1y * s2)
    val det2 = n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) +
      sy * (s1 * s12 - s11 * s2)
    // singular/collinear design (e.g. a constant regressor): det = 0
    // would give NaN betas — emit null instead, the house
    // null-on-degenerate convention (assortativity, mannWhitney)
    def safe(num: Column): Column = when(det =!= 0.0, num / det)
    val b0 = safe(det0)
    val b1 = safe(det1)
    val b2 = safe(det2)
    val sse = syy - lit(2.0) * (b0 * sy + b1 * s1y + b2 * s2y) +
      (b0 * b0 * n + b1 * b1 * r11 + b2 * b2 * r22 +
        lit(2.0) * b0 * b1 * s1 + lit(2.0) * b0 * b2 * s2 +
        lit(2.0) * b1 * b2 * s12)
    val sst = syy - sy * sy / n
    moments.select(
      keyCols :+ col("n") :+
        round(b0, 6).as("beta0") :+
        round(b1, 6).as("beta1") :+
        round(b2, 6).as("beta2") :+
        round(lit(1.0) - sse / sst, 6).as("r2"): _*)
  }
}
