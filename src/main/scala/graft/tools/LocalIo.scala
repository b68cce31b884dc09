package graft.tools

import org.apache.spark.sql.SparkSession

/** Session tuning shared by the harness mains (Bench / Verify /
  * profiling tools): shuffle-scratch I/O + the AQE coalescing floor.
  * Guide §2.1/§6: shuffle throughput is bounded by the node's LOCAL
  * storage as often as by the network.
  *
  * Two findings on this host (r12, jstack-attributed):
  *  - `spark.file.transferTo`'s NIO path concatenates each map task's
  *    per-partition shuffle files via FileChannel.map/unmap; under
  *    virtualization every unmap0 is a cross-vCPU TLB shootdown, and a
  *    trivial 32-task shuffle stage spent ~250 ms/task there. Plain
  *    streamed copies (`transferTo=false`) cost ~23 ms/task. For LARGE
  *    sequential merges on bare metal, zero-copy transferTo wins — so
  *    the default is only flipped here, not hard-coded in operators,
  *    and `SPARK_GRAFT_TRANSFER_TO=true` restores it.
  *  - `spark.local.dir` defaults to /tmp on the slow root FS; shuffle
  *    and spill scratch belongs on the fastest node-local device. Here
  *    that is the RAM-backed /dev/shm (the bench's whole shuffle
  *    working set is MBs); on a production node point
  *    SPARK_GRAFT_LOCAL_DIR at the NVMe scratch array instead.
  */
object LocalIo {
  def tune(builder: SparkSession.Builder): SparkSession.Builder = {
    builder.config("spark.file.transferTo",
      sys.env.getOrElse("SPARK_GRAFT_TRANSFER_TO", "false"))
    // r13 (ADVICE): the tmpfs default is additionally gated on free
    // space — a spill-heavy run on a tight host would otherwise exhaust
    // /dev/shm (typically 50% of RAM) and die with a "No space left on
    // device" that reads as a disk problem rather than memory pressure.
    // Below 8 GiB free the default falls back to Spark's own /tmp; the
    // explicit env override is always honored.
    val shm = new java.io.File("/dev/shm")
    val shmOk = shm.isDirectory && shm.canWrite &&
      shm.getUsableSpace >= 8L * 1024 * 1024 * 1024
    val localDir = sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR",
      if (shmOk) "/dev/shm/graft-spark-local" else "")
    if (localDir.nonEmpty) builder.config("spark.local.dir", localDir)
    // AQE partition-coalescing floor. parallelismFirst (default on)
    // coalesces down to totalBytes/defaultParallelism but never below
    // this floor — and the 1 MB default under-parallelizes every stage
    // whose rows are narrow but CPU-dense downstream (window/melt
    // panels, NB scoring, text quality). That case is not local-only:
    // at cluster scale any intermediate frame smaller than cores × 1 MB
    // (post-aggregation panels, scored holdouts) hits the same floor
    // with far more idle cores. 64k keeps such stages core-wide;
    // partitions above the advisory size are untouched at any scale.
    // Measured (sf0.1, after the transferTo fix): backtest_pipeline
    // 1.63 → 1.06 s, d19 1.74 → 1.04 s, cl2 1.88 → 1.14 s.
    builder.config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
      sys.env.getOrElse("SPARK_GRAFT_MIN_COALESCE", "64k"))
    builder
  }
}
