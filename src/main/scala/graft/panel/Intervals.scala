package graft.panel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join at scale — trade↔quote matching,
  * event↔session attribution, bar↔halt overlap. A raw
  * `p.ts BETWEEN i.start AND i.end` theta-join has no equi key, so
  * Spark plans a broadcast-nested-loop (O(points × intervals)
  * comparisons — a scale killer). The standard fix (the bucketized
  * range-join technique): quantize time into fixed-width bins, explode
  * each interval into the bins it covers, EQUI-join points to intervals
  * on (keys…, bin), and re-apply the exact predicate.
  *
  * Cost: |points| + Σ(span/width) interval bin rows through one hash
  * equi-join shuffle, plus exact comparisons only within shared bins —
  * no nested loop anywhere. A point lives in exactly one bin, so a
  * matching interval meets it exactly once: no dedup pass needed.
  * `maxBinsPerInterval` fails LOUDLY on degenerate intervals (an
  * open-ended interval would otherwise explode into millions of rows
  * inside one task); widen `bucket` instead of raising the cap.
  */
object Intervals {

  /** Inner-join `points` (event rows with `tsCol`) to `intervals`
    * (rows with `[startCol, endCol]`, both inclusive) on equal
    * `keyCols` and ts ∈ [start, end]. `bucket` is the bin width as a
    * microsecond count (e.g. 600000000L = 10 min). */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      keyCols: Seq[String],
      tsCol: String = "ts",
      startCol: String = "start_ts",
      endCol: String = "end_ts",
      bucket: Long = 600000000L,
      maxBinsPerInterval: Int = 10000): DataFrame = {
    require(bucket > 0, s"bucket width must be positive micros: $bucket")
    // cast handles TIMESTAMP_NTZ sources (unix_micros only accepts
    // TIMESTAMP; the session runs UTC so the reading is unambiguous)
    def bin(c: String) = floor(unix_micros(col(c).cast("timestamp")) / bucket)
    val nb = bin(endCol) - bin(startCol) + 1
    // the guard must sit INSIDE the sequence bounds — a standalone
    // guarded column would be pruned by the optimizer and never fire
    val guardedNb =
      when(col(endCol) < col(startCol),
        raise_error(format_string(
          "interval end %s before start %s",
          col(endCol).cast("string"), col(startCol).cast("string")))
          .cast("long"))
        .when(nb > maxBinsPerInterval,
          raise_error(format_string(
            s"interval [%s, %s] spans %s bins (> $maxBinsPerInterval): " +
              "widen the bucket or split the interval",
            col(startCol).cast("string"), col(endCol).cast("string"),
            nb.cast("string"))).cast("long"))
        .otherwise(nb)
    val ivs = intervals.withColumn("__bin",
      explode(sequence(bin(startCol), bin(startCol) + guardedNb - 1)))
    points
      .withColumn("__bin", bin(tsCol))
      .join(ivs, keyCols :+ "__bin", "inner")
      .where(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bin")
  }
}
