package graft.panel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix sums over a distinct-value histogram frame.
  *
  * The "bounded distinct-cents histogram" discipline (qn1/Woe/KS/
  * Mann-Whitney) assumed the per-value frame was small enough for ONE
  * unpartitioned cumulative window. Round 8 measured the assumption
  * failing in-repo: `l_extendedprice` at sf0.1 has 583k distinct cents
  * across 600k rows — near-continuous values make the histogram the
  * table, and the single-task window becomes the scale ceiling.
  *
  * This helper is the classic two-level scan: values bucket by a FIXED
  * integer width, per-bucket subtotals take the only unpartitioned
  * window (rows = occupied buckets ≤ value-range/width — bounded by
  * the PHYSICAL range of the column, not by data cardinality), and
  * within-bucket prefixes run under a partitioned window. For cents
  * columns the default width (10⁶ = $10,000 per bucket) keeps the
  * bucket frame ≤ ~10³ rows for any plausible price range; callers
  * with wider domains pass a wider width.
  */
object PrefixSum {

  /** Adds one inclusive-prefix column per (outName, sumCol) pair:
    * `outName` = Σ sumCol over all rows with value ≤ this row's `vCol`
    * (ascending order). `hist` must hold ONE row per distinct `vCol`
    * (a histogram frame); `vCol` must be numeric with a bucketWidth
    * that makes floor(v/width) exact (integral cents with the default,
    * or a power-of-two width for fractional score domains). */
  def inclusive(
      hist: DataFrame,
      vCol: String,
      sums: Seq[(String, String)],
      bucketWidth: Double = 1e6): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    // floor division (not truncation): negative values must bucket
    // monotonically. Exact for cents columns (|v| < 2^53, width 10⁶);
    // fractional domains pass a binary-exact width (ksDrift: 2⁻⁶ for
    // [0,1] scores → ≤ 65 buckets).
    val withB = hist.withColumn("__psb",
      floor(col(vCol).cast("double") / lit(bucketWidth)).cast("long"))
    // exclusive per-bucket offsets: the only unpartitioned window runs
    // over occupied buckets (range/width-bounded by construction)
    val aggs = sums.map { case (_, c) => sum(col(c)).as(s"__pst_$c") }
    val offsets = withB
      .groupBy(col("__psb"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("__psb") +: sums.map { case (_, c) =>
        coalesce(
          sum(col(s"__pst_$c")).over(
            Window.orderBy("__psb").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)).as(s"__pso_$c")
      }: _*)
    val wIn = Window.partitionBy("__psb").orderBy(vCol)
      .rowsBetween(Window.unboundedPreceding, 0)
    val joined = withB.join(broadcast(offsets), Seq("__psb")) // range-bounded
    sums.foldLeft(joined) { case (df, (out, c)) =>
      df.withColumn(out, col(s"__pso_$c") + sum(col(c)).over(wIn))
    }.drop("__psb" +: sums.map { case (_, c) => s"__pso_$c" }: _*)
  }
}
