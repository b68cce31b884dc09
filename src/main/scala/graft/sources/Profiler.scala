package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-pass column profiler: per-column row/null/distinct counts and
  * lexicographic min/max (values cast to string so one long schema fits
  * every column type). The moral equivalent of `df.describe()` but
  * hash-oracle-able: every statistic is exact and order-free.
  *
  * Plan shape: ONE aggregate over the table computes all statistics
  * (Catalyst expands the multiple exact count-distincts into a single
  * multi-pass expand-aggregate — still one scan of the parquet), then a
  * codegen `stack` reshapes the single row into one row per column. No
  * driver-side iteration: profiling a 100 TB table is one distributed
  * aggregation whose result is `ncols` rows.
  */
object Profiler {

  def profile(df: DataFrame): DataFrame = {
    val cols = df.columns
    val aggs = count(lit(1)).as("__n") +: cols.flatMap(c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        count_distinct(col(c)).as(s"${c}__distinct"),
        min(col(c).cast("string")).as(s"${c}__min"),
        max(col(c).cast("string")).as(s"${c}__max")))
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols
      .map(c => s"'$c', `${c}__nulls`, `${c}__distinct`, `${c}__min`, `${c}__max`")
      .mkString(", ")
    row
      .selectExpr(
        "__n",
        s"stack(${cols.length}, $stackArgs) as (column, n_nulls, n_distinct, min_str, max_str)")
      .select(
        col("column"), col("__n").as("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_str"), col("max_str"))
  }
}
