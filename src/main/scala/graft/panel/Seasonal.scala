package graft.panel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series seasonal structure over the (sid, date, close) panel:
  * additive trend/seasonal/residual decomposition (the classical-
  * decomposition core of STL, period = ISO weekday) and naive-forecast
  * error baselines (MASE / sMAPE — Hyndman & Koehler 2006), the
  * yardsticks every forecasting pipeline reports before any model.
  *
  * Scale shape: one sid-partitioned window pass for the rolling sums,
  * one (sid, weekday) aggregate (≤ 7·|sids| rows), one per-sid
  * aggregate, and two sid-keyed equi-joins — everything shuffles on
  * the sid key once and stays there (AQE-friendly, no unpartitioned
  * windows, no row explosion).
  *
  * Exactness: prices become exact cents; every SUM is over BIGINTs
  * (7·c − Σ₇c detrending keeps the rational trend exact; the weekday
  * means stay integer-numerator rationals; the weekday-mean adjustment
  * multiplies through by the weekday count instead of dividing), and
  * the only doubles are fixed-shape per-row IEEE expressions of those
  * integers, 6dp. */
object Seasonal {

  /** TS2: classical additive decomposition, period = ISO weekday.
    * trend = centered 7-row rolling mean (full windows only);
    * seasonal = per-(sid, weekday) mean of (close − trend), re-centered
    * to mean 0 across the sid's observed weekdays; residual = the rest.
    *
    * Quantization: the weekday mean s_d = num_d/(7·cnt_d) cents is
    * micro-quantized at 1e12 (one rounding per weekday cell); the
    * re-centering is EXACT in that quantized space — s_d·K − Σs (K =
    * observed weekdays ≤ 7) — so both engines see identical integers
    * until the final 6dp rounding. Output price units.
    *
    * Output (sid, date, close, trend, seasonal, residual) on rows with
    * a full trend window. */
  def decompose(
      panel: DataFrame,
      sidCol: String = "sid",
      dateCol: String = "date",
      closeCol: String = "close"): DataFrame = {
    val c = round(col(closeCol) * 100).cast("long")
    val w7 = Window.partitionBy(col(sidCol)).orderBy(col(dateCol))
      .rowsBetween(-3, 3)
    val rows = panel
      .select(col(sidCol).as("sid"), col(dateCol).as("date"), c.as("__c"))
      .withColumn("__s7", sum(col("__c")).over(w7))
      .withColumn("__k7", count(lit(1)).over(w7))
      .where(col("__k7") === 7)
      .withColumn("__dow", ((dayofweek(col("date")) + 5) % 7 + 1).cast("long"))
      .localCheckpoint(eager = false) // feeds the weekday cells AND the output
    val cells = rows
      .groupBy(col("sid"), col("__dow"))
      .agg(sum(col("__c") * 7 - col("__s7")).as("__num"),
        count(lit(1)).as("__cnt"))
      .select(col("sid"), col("__dow"),
        round(col("__num").cast("double")
          / (col("__cnt") * 7).cast("double") * 1e12).cast("long").as("__sq"))
    val perSid = cells
      .groupBy(col("sid"))
      .agg(count(lit(1)).as("__K"), sum(col("__sq")).as("__S"))
    val seas = (col("__sq") * col("__K") - col("__S")).cast("double") /
      col("__K").cast("double") / 1e12 / 100.0
    rows
      .join(cells, Seq("sid", "__dow"))
      .join(perSid, Seq("sid"))
      .select(
        col("sid"), col("date"),
        (col("__c").cast("double") / 100.0).as("close"),
        round(col("__s7").cast("double") / 7.0 / 100.0, 6).as("trend"),
        round(seas, 6).as("seasonal"),
        round(col("__c").cast("double") / 100.0
          - col("__s7").cast("double") / 7.0 / 100.0 - seas, 6)
          .as("residual"))
  }

  /** TS3: naive-forecast evaluation per sid — forecast f_t = c_{t−lag}
    * (seasonal-naive at `lag` = 7), scored with MAE (price units),
    * MASE (MAE vs the in-sample one-step naive MAE — the scale-free
    * "did you beat persistence" number), and sMAPE (each per-row term
    * 2|c−f|/(c+f) micro-quantized at 1e12 before the order-free BIGINT
    * sum; prices are positive so the denominator never degenerates).
    * Sids with no full lag window, or a flat series (zero one-step
    * MAE), emit null MASE rather than ±inf.
    *
    * Output (sid, n_eval, mae, mase, smape). */
  def forecastEval(
      panel: DataFrame,
      lag: Int = 7,
      sidCol: String = "sid",
      dateCol: String = "date",
      closeCol: String = "close"): DataFrame = {
    require(lag >= 1, s"lag must be >= 1: $lag")
    val c = round(col(closeCol) * 100).cast("long")
    val w = Window.partitionBy(col(sidCol)).orderBy(col(dateCol))
    val rows = panel
      .select(col(sidCol).as("sid"), col(dateCol).as("date"), c.as("__c"))
      .withColumn("__f", lag_(col("__c"), lag, w))
      .withColumn("__p", lag_(col("__c"), 1, w))
    rows
      .groupBy(col("sid"))
      .agg(
        count(col("__f")).as("n_eval"),
        sum(abs(col("__c") - col("__f"))).as("__e7"),
        count(col("__p")).as("__n1"),
        sum(abs(col("__c") - col("__p"))).as("__e1"),
        sum(when(col("__f").isNotNull,
          round(lit(2.0) * abs(col("__c") - col("__f")).cast("double")
            / (col("__c") + col("__f")).cast("double") * 1e12).cast("long"))
          .otherwise(0L)).as("__sm"))
      .where(col("n_eval") > 0)
      .select(
        col("sid"), col("n_eval"),
        round(col("__e7").cast("double") / col("n_eval").cast("double")
          / 100.0, 6).as("mae"),
        round(when(col("__n1") > 0 && col("__e1") > 0,
          (col("__e7").cast("double") / col("n_eval").cast("double"))
            / (col("__e1").cast("double") / col("__n1").cast("double"))), 6)
          .as("mase"),
        round(col("__sm").cast("double") / 1e12
          / col("n_eval").cast("double"), 6).as("smape"))
  }

  // scala-side alias: functions.lag collides with the `lag` parameter
  private def lag_(c: org.apache.spark.sql.Column, n: Int,
      w: org.apache.spark.sql.expressions.WindowSpec) =
    org.apache.spark.sql.functions.lag(c, n).over(w)
}
