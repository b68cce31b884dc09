package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.panel.Changelog

/** Continuously-maintained aggregate view over a CDC stream — the
  * streaming face of [[Changelog.mergeAggView]]: every micro-batch is
  * reduced to SIGNED (n, sum) partials and merged into the stored view
  * with the SAME retraction algebra the batch refresh uses, so live
  * maintenance and backfill agree by construction (the
  * StreamingViewSpec equivalence proof). This is what Spark's built-in
  * streaming aggregation cannot do: update-mode aggs only ever ADD —
  * an upstream delete needs the signed-partial merge.
  *
  * Storage: the view is parquet at `viewDir`, republished per batch
  * via write-to-scratch + atomic rename (readers never observe a
  * half-written view; the scratch dir lives under the same parent so
  * the rename is a metadata move). State size ∝ |view keys|, not
  * stream length; each batch costs |view| + |batch| — at warehouse
  * scale the view itself would be key-partitioned parquet and the
  * merge a partition-wise join, the same shape Delta/Hudi MERGE runs.
  *
  * Restart semantics — exactly-once via two mechanisms:
  *  1. The published view dir carries an `_applied_<batchId>` marker
  *     file (underscore-prefixed, so parquet readers ignore it like
  *     `_SUCCESS`; it survives even a view that retracted to zero
  *     rows). foreachBatch replays the last uncommitted batch after a
  *     crash; the replay sees the marker's id >= batchId and SKIPS the
  *     merge — the signed-partial merge is never double-applied.
  *  2. The publish itself is crash-recoverable: a failure between
  *     rename(target, old) and rename(scratch, target) leaves the
  *     target absent but `.old_<id>` present — every batch begins by
  *     rolling the newest `.old_*` back to the target before reading
  *     the base, so accumulated view state is never silently dropped
  *     to empty. Leftover `.inprogress_*` scratch dirs are cleared.
  */
object StreamingView {

  /** Start maintaining the view. `cdc` must be a streaming frame with
    * columns: keys..., `op` (+1 insert / −1 retract), `valueCents`. */
  def maintain(
      cdc: DataFrame,
      keys: Seq[String],
      viewDir: String,
      checkpointDir: String): StreamingQuery = {
    val keyCols = keys.map(col)
    cdc.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, keys, viewDir)
      }
      .start()
  }

  /** One micro-batch's merge + publish — idempotent per batchId and
    * crash-recoverable (see object doc). Public so the spec can drive
    * the replay and mid-publish-crash paths directly. */
  def applyBatch(
      batch: DataFrame,
      batchId: Long,
      keys: Seq[String],
      viewDir: String): Unit = {
    val keyCols = keys.map(col)
    val spark = batch.sparkSession
    val partials = batch
      .select(keyCols :+ col("op").cast("long").as("n_rows") :+
        (col("op") * col("valueCents")).cast("long").as("sum_cents"): _*)
      .groupBy(keyCols: _*)
      .agg(sum(col("n_rows")).as("n_rows"),
        sum(col("sum_cents")).as("sum_cents"))
    val fs = new Path(viewDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new Path(viewDir)
    // crash recovery: a publish that died mid-swap left the target
    // absent and the previous view parked at `.old_<id>` — roll the
    // newest one back so the base is never silently empty. Stale
    // scratch dirs from dead publishes are cleared unconditionally.
    if (!fs.exists(target)) {
      val olds = fs.globStatus(new Path(s"$viewDir.old_*"))
      if (olds != null && olds.nonEmpty) {
        val newest = olds.maxBy(_.getPath.getName
          .stripPrefix(new Path(viewDir).getName + ".old_").toLong)
        fs.rename(newest.getPath, target): Unit
      }
    }
    Option(fs.globStatus(new Path(s"$viewDir.inprogress_*")))
      .getOrElse(Array.empty).foreach(s => fs.delete(s.getPath, true))
    val exists = fs.exists(target)
    // replay guard: foreachBatch re-runs the last uncommitted batch
    // after a crash; if the view already carries this batch's
    // `_applied_*` marker the merge was applied and published —
    // skip (exactly-once). The marker is a dir-local file, so the
    // atomic rename publishes view rows and stamp together.
    val appliedId =
      if (!exists) -1L
      else Option(fs.globStatus(new Path(s"$viewDir/_applied_*")))
        .getOrElse(Array.empty)
        .map(_.getPath.getName.stripPrefix("_applied_").toLong)
        .foldLeft(-1L)(math.max)
    if (appliedId < batchId) {
      val base =
        if (exists) spark.read.parquet(viewDir)
        else partials.limit(0) // empty, same schema
      val merged = Changelog.mergeAggView(base, partials, keys)
      val scratch = new Path(s"$viewDir.inprogress_$batchId")
      merged.write.mode("overwrite").parquet(scratch.toString)
      fs.create(new Path(scratch, s"_applied_$batchId"), true).close()
      // atomic publish: same-parent rename (the Sources cache
      // discipline) — readers see the old view or the new one
      val old = new Path(s"$viewDir.old_$batchId")
      if (fs.exists(target)) fs.rename(target, old)
      fs.rename(scratch, target)
      fs.delete(old, true): Unit
    }
  }
}
