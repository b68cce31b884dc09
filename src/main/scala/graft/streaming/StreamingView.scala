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
  * Restart semantics: foreachBatch replays the last uncommitted batch
  * after a crash, and this merge is NOT idempotent per replay —
  * production would stamp the view with the batch id and skip
  * already-applied batches (exactly-once via the id check). The id is
  * threaded through for that purpose; the spec documents the contract.
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
        val base =
          if (fs.exists(target)) spark.read.parquet(viewDir)
          else partials.limit(0) // empty, same schema
        val merged = Changelog.mergeAggView(base, partials, keys)
        val scratch = new Path(s"$viewDir.inprogress_$batchId")
        merged.write.mode("overwrite").parquet(scratch.toString)
        // atomic publish: same-parent rename (the Sources cache
        // discipline) — readers see the old view or the new one
        val old = new Path(s"$viewDir.old_$batchId")
        if (fs.exists(target)) fs.rename(target, old)
        fs.rename(scratch, target)
        fs.delete(old, true): Unit
      }
      .start()
  }
}
