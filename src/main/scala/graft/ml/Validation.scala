package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ParameterError

/** Time-series cross-validation planning — purged walk-forward folds
  * (López de Prado 2018, "Advances in Financial Machine Learning" ch. 7:
  * k-fold over time with an embargo strip so labels that overlap the
  * test window never leak into training).
  *
  * The output is a (fold, date, role) ASSIGNMENT TABLE over the
  * distinct trading dates, not a copy of the panel: bounded by
  * |dates| × nFolds rows by construction, so callers join it to the
  * data-volume panel by date (a broadcast join — the assignment table
  * is tiny) and filter `role`. One distinct-date aggregation, one
  * bounded unpartitioned window (the benchmark-series stance), one
  * bounded crossJoin. */
object Validation {

  /** Fold assignment per (fold, date): `test` for dates inside fold
    * `fold`'s contiguous block, `purged` for dates within
    * `embargoDays` TRADING days of the block on either side (the
    * embargo strip — dropped from training), `train` otherwise.
    * Blocks are `ntile(nFolds)` over the ordered distinct dates
    * (earlier folds take the remainder — standard ntile). */
  def purgedFolds(
      panel: DataFrame,
      dateCol: String = "date",
      nFolds: Int = 5,
      embargoDays: Int = 0): DataFrame = {
    if (nFolds < 2) throw new ParameterError(s"nFolds must be >= 2: $nFolds")
    if (embargoDays < 0)
      throw new ParameterError(s"embargoDays must be >= 0: $embargoDays")
    val wd = Window.orderBy(col("date"))
    val d = panel.select(col(dateCol).as("date")).distinct()
      .withColumn("__rk", row_number().over(wd))
      .withColumn("__dfold", ntile(nFolds).over(wd))
    val bounds = d.groupBy(col("__dfold").as("fold"))
      .agg(min(col("__rk")).as("__mn"), max(col("__rk")).as("__mx"))
    d.crossJoin(broadcast(bounds))
      .select(
        col("fold"),
        col("date"),
        when(col("__rk").between(col("__mn"), col("__mx")), "test")
          .when(
            col("__rk").between(col("__mn") - embargoDays, col("__mn") - 1) ||
              col("__rk").between(col("__mx") + 1, col("__mx") + embargoDays),
            "purged")
          .otherwise("train")
          .as("role"))
  }

  /** Expanding walk-forward splits: for split s (1..nSplits), train on
    * everything up to the s-th boundary, test on the next block — the
    * classic backtest-honest evaluation schedule. Same bounded
    * assignment-table shape as [[purgedFolds]]: ntile(nSplits + 1)
    * blocks; split s trains on blocks ≤ s (minus the embargo strip
    * immediately before the test block) and tests on block s + 1;
    * later blocks are outside the split (`unused`). */
  def walkForward(
      panel: DataFrame,
      dateCol: String = "date",
      nSplits: Int = 4,
      embargoDays: Int = 0): DataFrame = {
    if (nSplits < 1) throw new ParameterError(s"nSplits must be >= 1: $nSplits")
    if (embargoDays < 0)
      throw new ParameterError(s"embargoDays must be >= 0: $embargoDays")
    val wd = Window.orderBy(col("date"))
    val d = panel.select(col(dateCol).as("date")).distinct()
      .withColumn("__rk", row_number().over(wd))
      .withColumn("__blk", ntile(nSplits + 1).over(wd))
    val testStarts = d.groupBy(col("__blk")).agg(min(col("__rk")).as("__ts"))
      .where(col("__blk") > 1)
      .select((col("__blk") - 1).as("split"), col("__ts"))
    d.crossJoin(broadcast(testStarts))
      .select(
        col("split"),
        col("date"),
        when(col("__blk") === col("split") + 1, "test")
          .when(col("__blk") > col("split") + 1, "unused")
          .when(col("__rk") >= col("__ts") - embargoDays, "purged")
          .otherwise("train")
          .as("role"))
  }
}
