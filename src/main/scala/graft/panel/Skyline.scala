package graft.panel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto skyline (maximize one metric, minimize the other) as pure
  * window algebra — the classic "which entities are not dominated"
  * analytics operator (Börzsönyi et al., ICDE 2001).
  *
  * A point b is dominated iff some point has strictly higher `maxCol`
  * with `minCol` ≤ b's, or equal `maxCol` with strictly lower `minCol`.
  * In 2-D that test needs only (a) the prefix-min of `minCol` over
  * strictly-greater `maxCol` levels and (b) the min of `minCol` within
  * b's own level — no pairwise join at all:
  * level-aggregate → one ordered prefix-min over the LEVEL frame →
  * broadcast back. Ties on both coordinates are all kept (standard
  * skyline semantics: equal points do not dominate each other).
  *
  * Scale: the exact pass runs a single-partition window over DISTINCT
  * `maxCol` levels, so it is for entity frames (post-aggregation), not
  * raw rows. For huge entity frames, `prePruneBuckets` > 1 first runs
  * the SAME dominance test inside `pmod(hash(id), buckets)` buckets — a
  * bucket-local skyline is always a superset of the global one (a point
  * dominated by a bucket-mate is dominated globally; restricting the
  * comparison set only keeps extra points, never drops a survivor), the
  * buckets are deterministic, and the global pass then sees only the
  * union of bucket skylines (≈ O(skyline) per bucket in practice). The
  * output is identical for any bucket count — pruning is lossless.
  */
object Skyline {

  def skyline2d(
      points: DataFrame,
      idCol: String,
      maxCol: String,
      minCol: String,
      prePruneBuckets: Int = 1): DataFrame = {
    require(prePruneBuckets >= 1, s"prePruneBuckets >= 1: $prePruneBuckets")

    def survivors(pts: DataFrame, bucketed: Boolean): DataFrame = {
      val part = if (bucketed) Seq(col("__b")) else Seq.empty
      val lvlKeys = part :+ col("__mx")
      val levels = pts.groupBy(lvlKeys: _*).agg(min(col("__mn")).as("__lq"))
      val wDesc = Window.partitionBy(part: _*).orderBy(col("__mx").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val annotated = levels
        .withColumn("__strict", min(col("__lq")).over(wDesc))
      val joined =
        if (bucketed) pts.join(annotated, Seq("__b", "__mx"))
        else pts.join(broadcast(annotated), Seq("__mx"))
      joined.where(
        (col("__strict").isNull || col("__strict") > col("__mn")) &&
          !(col("__lq") < col("__mn")))
        .select(col("__id"), col("__mx"), col("__mn"))
    }

    val base = points.select(
      col(idCol).as("__id"), col(maxCol).as("__mx"), col(minCol).as("__mn"))
    val pruned =
      if (prePruneBuckets == 1) base
      else survivors(
        base.withColumn("__b", pmod(hash(col("__id")), lit(prePruneBuckets))),
        bucketed = true)
    survivors(pruned, bucketed = false)
      .select(col("__id").as(idCol), col("__mx").as(maxCol),
        col("__mn").as(minCol))
  }
}
