package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingView

/** Streaming incremental view maintenance: the live view equals the
  * batch merge of the same CDC partials, retractions and all. */
class StreamingViewSpec extends SparkSpec {
  import spark.implicits._

  test("foreachBatch view merge: retractions apply across micro-batches; " +
    "final view equals the one-shot batch merge of the same log") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("sview").toString
    val viewDir = s"$dir/view"
    val input = MemoryStream[(Long, Int, Long)]
    val q = StreamingView.maintain(
      input.toDF().toDF("k", "op", "valueCents"),
      keys = Seq("k"), viewDir = viewDir, checkpointDir = s"$dir/ckpt")
    val batches = Seq(
      Seq((1L, 1, 100L), (2L, 1, 50L)),
      Seq((2L, -1, 50L), (1L, 1, 20L)), // delete k=2 entirely
      Seq((3L, 1, 70L), (1L, -1, 100L))) // retract one k=1 row
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      val live = spark.read.parquet(viewDir)
        .select("k", "n_rows", "sum_cents").as[(Long, Long, Long)]
        .collect().toSet
      assert(live == Set((1L, 1L, 20L), (3L, 1L, 70L))) // k=2 dropped out
      // one-shot batch merge of the SAME signed log — backfill path
      val log = batches.flatten.toDF("k", "op", "valueCents")
        .select(col("k"), col("op").cast("long").as("n_rows"),
          (col("op") * col("valueCents")).cast("long").as("sum_cents"))
      val batchView = graft.panel.Changelog
        .mergeAggView(log.limit(0), log, Seq("k"))
        .select("k", "n_rows", "sum_cents").as[(Long, Long, Long)]
        .collect().toSet
      assert(live == batchView)
    } finally q.stop()
  }

  test("replay of an already-applied batch is a no-op (exactly-once via " +
    "the _applied_<id> marker), and a crash between the two publish " +
    "renames is recovered from the parked .old_<id> dir") {
    val dir = java.nio.file.Files.createTempDirectory("sview2").toString
    val viewDir = s"$dir/view"
    def view: Set[(Long, Long, Long)] = spark.read.parquet(viewDir)
      .select("k", "n_rows", "sum_cents").as[(Long, Long, Long)]
      .collect().toSet
    val b0 = Seq((1L, 1, 100L), (2L, 1, 50L)).toDF("k", "op", "valueCents")
    StreamingView.applyBatch(b0, 0L, Seq("k"), viewDir)
    assert(view == Set((1L, 1L, 100L), (2L, 1L, 50L)))
    // foreachBatch replay after a crash: same batch, same id — the
    // marker must make the signed merge idempotent (no doubling)
    StreamingView.applyBatch(b0, 0L, Seq("k"), viewDir)
    assert(view == Set((1L, 1L, 100L), (2L, 1L, 50L)))
    // crash mid-publish: simulate dying between rename(target, old)
    // and rename(scratch, target) — target gone, state parked at .old_
    val fs = new org.apache.hadoop.fs.Path(viewDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(viewDir),
      new org.apache.hadoop.fs.Path(s"$viewDir.old_1"))
    val b1 = Seq((1L, 1, 20L)).toDF("k", "op", "valueCents")
    StreamingView.applyBatch(b1, 1L, Seq("k"), viewDir)
    // recovered base (not empty!) + batch 1 applied once
    assert(view == Set((1L, 2L, 120L), (2L, 1L, 50L)))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$viewDir.old_1")))
  }
}
