package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as pure relational
  * algebra — the fixed-size frequency summary that answers point count
  * queries with one-sided error: estimates never undercount, and
  * overshoot exceeds 2N/width with probability < 2^−depth per key.
  *
  * Build shape (the 100 TB path): counts are FIRST reduced to the
  * per-key frame (map-side combine does the heavy lifting), then each
  * key fans out to `depth` (row, bucket) cells and ONE groupBy produces
  * the d×w cell grid — a bounded artifact (depth·width rows) that
  * broadcasts anywhere. Cell buckets come from the catalog's md5 unit
  * hash (engine-independent by construction — DuckDB spells the same
  * bytes), not xxhash/murmur whose implementations differ per engine.
  *
  * Sketches built on disjoint corpus shards MERGE by cellwise sum
  * (same (row, bucket, n) schema → union + groupBy), the property that
  * makes the sketch a streaming/partial aggregate rather than a scan.
  */
object Cms {

  /** Row-`r` bucket for a key: md5("cms r|key") folded into [0, width). */
  def bucket(key: Column, r: Int, width: Int): Column =
    pmod(conv(substring(md5(concat_ws("|", lit(s"cms$r"), key)), 1, 8),
      16, 10).cast("long"), lit(width.toLong))

  /** Build the d×w cell grid from raw rows: per-key reduce, then a
    * depth-way fan-out over the KEY frame only, one final groupBy. */
  def build(df: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth in [1,16]: $depth")
    require(width >= 2, s"width >= 2: $width")
    val perKey = df.groupBy(col(keyCol)).agg(count(lit(1)).as("__c"))
    perKey
      .select(explode(array((0 until depth).map { r =>
        struct(lit(r).as("__r"), bucket(col(keyCol), r, width).as("__b"))
      }: _*)).as("__cell"), col("__c"))
      .groupBy(col("__cell.__r").as("row"), col("__cell.__b").as("bucket"))
      .agg(sum(col("__c")).as("n"))
  }

  /** Point estimates for a key frame: min over the key's depth cells.
    * The sketch is bounded (depth·width rows) and broadcast. The join is
    * a LEFT join with absent cells coalesced to 0: a key that was never
    * inserted has empty cells in the true sketch, and CMS answers 0 for
    * it (min over zeros) rather than silently dropping the key or
    * min-ing over only the cells that happen to collide with inserts. */
  def estimate(
      keys: DataFrame,
      sketch: DataFrame,
      keyCol: String,
      depth: Int,
      width: Int): DataFrame = {
    val fanned = keys
      .select(col(keyCol), explode(array((0 until depth).map { r =>
        struct(lit(r).as("row"), bucket(col(keyCol), r, width).as("bucket"))
      }: _*)).as("__cell"))
      .select(col(keyCol), col("__cell.row").as("row"),
        col("__cell.bucket").as("bucket"))
    fanned
      .join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("n"), lit(0L))).as("est"))
  }
}
