package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering — the
  * Delta OPTIMIZE ZORDER / Iceberg sort-order primitive. A table laid
  * out by one column prunes scans on that column only; interleaving the
  * bits of two (or more) bounded dimensions gives every file a small
  * bounding box in ALL of them, so min/max footer stats prune
  * predicates on any participating column.
  *
  * Scale shape: clustering IS a global sort, and the operator spells
  * that honestly — [[zorderWrite]] range-partitions on the z-value
  * (Spark's sampled RangePartitioner: one pass to sample bounds, one
  * shuffle to place rows) and sorts within partitions before writing;
  * no single-partition stage anywhere. The z-value itself is pure
  * per-row bit arithmetic (codegen'd, no UDF).
  *
  * [[zoneMap]] is the audit view: group rows by a z-PREFIX (quadtree
  * cell) and report each cell's per-dimension bounding box — the
  * numbers a 100 TB capacity plan reads to decide whether clustering
  * pays. Prefix cells rather than fixed row counts on purpose: the
  * cell id is pure per-row arithmetic (no global rank — a
  * row_number-over-total-order would be a single-partition window),
  * the groupBy key space is 4^prefixBits-bounded so partial
  * aggregation collapses it map-side, and real writers even out the
  * row counts with range partitioning anyway ([[zorderWrite]]).
  */
object Layout {

  /** Morton z-value: interleave the low `bits` bits of `x` (even
    * positions) and `y` (odd positions). Inputs must already be
    * non-negative and bucketized to `bits` width — pass e.g.
    * `datediff(col, lit("1970-01-01"))` for dates; values beyond the
    * width are masked (callers choose bits to cover their range). */
  def zvalue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).map { b =>
      (shiftright(xl, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b))) +
        (shiftright(yl, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b + 1)))
    }.reduce(_ + _)
  }

  /** Cluster `df` by z(xCol, yCol) and write parquet: range-partition
    * on the z-value into `numFiles` output files, sort within each, so
    * every file covers a compact z-range (⇒ compact x/y boxes). */
  def zorderWrite(df: DataFrame, xCol: Column, yCol: Column,
      outDir: String, numFiles: Int, bits: Int = 16): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    val bounds = df.agg(
      min(xCol.cast("long")).as("__xlo"), max(xCol.cast("long")).as("__xhi"),
      min(yCol.cast("long")).as("__ylo"), max(yCol.cast("long")).as("__yhi"))
    df.crossJoin(bounds) // one scalar row — bounded by design
      .withColumn("__z", zvalue(
        normalize(xCol, col("__xlo"), col("__xhi"), bits),
        normalize(yCol, col("__ylo"), col("__yhi"), bits), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z", "__xlo", "__xhi", "__ylo", "__yhi")
      .write.mode("overwrite").parquet(outDir)
  }

  /** Scale a non-negative dimension into [0, 2^bits) by its global
    * [lo, hi] range — EXACT integer arithmetic (`div`, never a double
    * division: id ranges can exceed 2^53 where doubles go inexact). */
  private def normalize(c: Column, lo: Column, hi: Column, bits: Int): Column =
    call_function("div",
      (c.cast("long") - lo) * lit(1L << bits), hi - lo + lit(1L))

  /** Quadtree-cell zone map: each dimension is range-normalized into
    * the `bits` width (raw values would collapse into one cell whenever
    * the data spans few high bits), rows are grouped by the top
    * `prefixBits` bit PAIRS of the z-value (each pair splits both
    * dimensions once, so a cell is an axis-aligned box), and each cell
    * reports n_rows plus the min/max of both dimensions. Narrow boxes
    * everywhere ⇒ z-clustering prunes predicates on either column.
    * One scalar min/max row crossJoined back (bounded), then one
    * bounded-key aggregate — no sort. */
  def zoneMap(df: DataFrame, xCol: Column, yCol: Column,
      prefixBits: Int = 4, bits: Int = 16): DataFrame = {
    require(prefixBits >= 1 && prefixBits <= bits,
      s"prefixBits must be in [1, $bits], got $prefixBits")
    val dims = df.select(xCol.cast("long").as("__x"), yCol.cast("long").as("__y"))
    val bounds = dims.agg(
      min(col("__x")).as("__xlo"), max(col("__x")).as("__xhi"),
      min(col("__y")).as("__ylo"), max(col("__y")).as("__yhi"))
    val cell = shiftright(
      zvalue(
        normalize(col("__x"), col("__xlo"), col("__xhi"), bits),
        normalize(col("__y"), col("__ylo"), col("__yhi"), bits), bits),
      2 * (bits - prefixBits))
    dims.crossJoin(bounds) // one scalar row — bounded by design
      .select(col("__x"), col("__y"), cell.as("cell_id"))
      .groupBy("cell_id")
      .agg(count(lit(1)).as("n_rows"),
        min(col("__x")).as("min_x"), max(col("__x")).as("max_x"),
        min(col("__y")).as("min_y"), max(col("__y")).as("max_y"))
  }

  /** Small-file compaction plan (Delta OPTIMIZE / Iceberg rewrite
    * planning): pack files into `targetBytes` bins by descending size
    * (big files anchor bins, small files fill them — the standard
    * deterministic cumulative-sum packing; true FFD is a sequential
    * recurrence and buys little at these fill rates). Returns one row
    * per bin: file count, byte total, fill ratio.
    *
    * The window runs over FILE METADATA (one row per file — a listing,
    * not data; 100 TB at 128 MB/file is ~800 k rows, driver-table
    * scale), which is the same cardinality class any table-format
    * manifest scan handles. */
  def compactionPlan(
      files: DataFrame,
      fileCol: String,
      sizeCol: String,
      targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val ordered = Window.orderBy(col(sizeCol).desc, col(fileCol))
    files
      .withColumn("__cum", sum(col(sizeCol)).over(
        ordered.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("bin_id",
        call_function("div", col("__cum") - lit(1L), lit(targetBytes)))
      .groupBy("bin_id")
      .agg(count(lit(1)).as("n_files"),
        sum(col(sizeCol)).as("bytes"),
        (sum(col(sizeCol)).cast("double") / targetBytes).as("fill_ratio"))
  }
}
