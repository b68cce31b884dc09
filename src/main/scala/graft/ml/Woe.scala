package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weight-of-evidence / information-value binning — the credit-scoring
  * feature screen (Siddiqi, "Credit Risk Scorecards"): bin a continuous
  * feature into equal-frequency bins, then per bin
  * WOE = ln((good_b/G)/(bad_b/B)) and the bin's IV contribution
  * (good_b/G − bad_b/B)·WOE. Features with IV below ~0.02 carry no
  * signal; above ~0.5 are suspiciously strong.
  *
  * Binning is rank-proportional — bin = ⌊(rank−1)·bins/N⌋+1 over the
  * total order (value cents, tiebreakers, badness) — NOT a global
  * ntile window: an unpartitioned ntile would single-partition the
  * fact table. The global rank decomposes as a TWO-LEVEL scan over
  * ROWS (r8 — the PrefixSum shape applied to ranks): rows bucket by a
  * fixed value width, row_number runs per bucket partition, and each
  * bucket's exclusive row-count prefix (the only unpartitioned window,
  * over OCCUPIED BUCKETS — a physical-range bound) shifts the local
  * numbers to global ranks. One full-table exchange (the bucket hash),
  * one sort, no distinct-value histogram join — the previous
  * histogram-join formulation paid a 583k-key groupBy plus a
  * table-sized equi-join on near-continuous columns (measured 3.4 s →
  * 1.7 s on ml30 at sf0.1).
  *
  * Counts are exact integers; each WOE is one fixed IEEE expression
  * over integer ratios (identical in any engine), null for bins with a
  * zero cell — a zero cell means the bin separates perfectly and the
  * scorecard needs a coarser binning, which nulling surfaces louder
  * than Laplace smoothing would.
  */
object Woe {

  def woeIv(
      df: DataFrame,
      badCol: String,
      valueCol: String,
      tieCols: Seq[String],
      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins >= 2: $bins")
    val bucketWidth = 1e6 // $10,000 of cents per bucket — range-bounded
    val rows = df.select(
      Seq(when(col(badCol), 1L).otherwise(0L).as("__bad"),
        round(col(valueCol) * 100).cast("long").as("__v")) ++
        tieCols.map(col): _*)
      .withColumn("__b",
        floor(col("__v").cast("double") / lit(bucketWidth)).cast("long"))
    val n = rows.agg(count(lit(1)).as("__N"))
    // exclusive bucket offsets: occupied buckets only (range-bounded)
    val offsets = rows.groupBy(col("__b"))
      .agg(count(lit(1)).as("__bc"))
      .select(col("__b"),
        coalesce(sum(col("__bc")).over(
          Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)).as("__off"))
    val ord = (col("__v") +: tieCols.map(col)) :+ col("__bad")
    val wb = Window.partitionBy("__b").orderBy(ord: _*)
    // tieCols must be a unique key per value level (ml30 passes the
    // lineitem PK). A duplicate means the caller's tiebreaker is not
    // the key they think it is — which rows share a bin boundary then
    // depends on an arbitrary total order, so raise loudly instead of
    // resolving silently. The check is a lag over the SAME bucket sort
    // the rank rides — equal (value, tieCols) structs on adjacent rows
    // — so it costs nothing (the SetJoin guard lesson; __bad stays a
    // belt-and-braces final tiebreaker and never decides under
    // uniqueness).
    val keyStruct = struct(col("__v") +: tieCols.map(col): _*)
    val binned = rows
      .withColumn("__rin", row_number().over(wb).cast("long"))
      .withColumn("__dupkey",
        keyStruct === lag(keyStruct, 1).over(wb))
      .where(when(col("__dupkey"), raise_error(lit(
        s"woeIv: tieCols (${tieCols.mkString(", ")}) do not uniquely " +
          "key rows within a value level; pass a unique tiebreaker key")))
        .otherwise(lit(true)))
      .join(broadcast(offsets), Seq("__b")) // range-bounded bucket frame
      .crossJoin(broadcast(n)) // one scalar row — bounded by design
      .withColumn("__rank", col("__off") + col("__rin"))
      .withColumn("bin",
        call_function("div", (col("__rank") - 1L) * bins, col("__N")) + 1L)
    val byBin = binned.groupBy(col("bin"))
      .agg(count(lit(1)).as("__n"), sum(col("__bad")).as("n_bad"))
      .withColumn("n_good", col("__n") - col("n_bad"))
    val totals = byBin.agg(
      sum(col("n_good")).as("__G"), sum(col("n_bad")).as("__B"))
    val pg = col("n_good").cast("double") / col("__G")
    val pb = col("n_bad").cast("double") / col("__B")
    val woe = when(col("n_good") > 0 && col("n_bad") > 0, log(pg / pb))
    byBin
      .crossJoin(broadcast(totals)) // one scalar row — bounded by design
      .select(
        col("bin"), col("n_good"), col("n_bad"),
        round(woe, 6).as("woe"),
        round((pg - pb) * woe, 6).as("iv_term"))
  }
}
