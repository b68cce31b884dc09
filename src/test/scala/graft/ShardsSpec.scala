package graft

import org.apache.spark.sql.functions._

import graft.text.Shards

/** Training-shard writer: deterministic md5 assignment, file-size
  * bounding, and a manifest that actually detects content drift. */
class ShardsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) =
    (0 until n).map(i => (i.toLong, s"document body number $i with words"))
      .toDF("doc_id", "text")

  test("manifest is deterministic across writes and totals conserve " +
    "the corpus; maxRecordsPerFile bounds files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shards_spec")
    val d = docs(40)
    val m1 = Shards.writeTrainingShards(d, s"$dir/a", shards = 4,
      maxRecordsPerFile = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(3))).sorted
    val m2 = Shards.writeTrainingShards(d, s"$dir/b", shards = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(3))).sorted
    assert(m1.toSeq == m2.toSeq) // assignment + crc independent of write opts
    assert(m1.map(_._2).sum == 40L) // every doc landed exactly once
    // file bound: a shard with k rows writes ceil(k/3) data files
    val shard0Files = new java.io.File(s"$dir/a/__shard=${m1.head._1}")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(shard0Files >= (m1.head._2 + 2) / 3)
  }

  test("readShards prunes at the file listing: partition filter on " +
    "__shard, no post-scan filter on data columns") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shards_read")
    val manifest = Shards.writeTrainingShards(docs(60), s"$dir/s", shards = 4)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val wanted = manifest.keySet.toSeq.sorted.take(2)
    val rd = Shards.readShards(spark, s"$dir/s", wanted)
    // correctness: exactly the wanted shards' docs, nothing else
    assert(rd.count() == wanted.map(manifest).sum)
    assert(rd.select("__shard").distinct().collect()
      .map(_.getInt(0)).sorted.toSeq == wanted)
    // plan: the shard predicate must be a PartitionFilter (pruned at
    // listing time), never a pushed/post-scan data filter
    val scan = rd.queryExecution.executedPlan.collectLeaves().mkString("\n")
    assert(scan.contains("PartitionFilters: ["), scan)
    assert(scan.matches("(?s).*PartitionFilters: \\[[^\\]]*__shard[^\\]]*\\].*"),
      scan)
    assert(!scan.matches("(?s).*PushedFilters: \\[[^\\]]*__shard[^\\]]*\\].*"),
      scan)
    intercept[ParameterError](Shards.readShards(spark, s"$dir/s", Nil))
  }

  test("content drift flips the shard's crc; other shards unaffected") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shards_spec2")
    val base = Shards.writeTrainingShards(docs(20), s"$dir/c", shards = 2)
      .collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
    val mutated = docs(20).withColumn("text",
      when(col("doc_id") === 7L, lit("tampered body")).otherwise(col("text")))
    val drift = Shards.writeTrainingShards(mutated, s"$dir/d", shards = 2)
      .collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
    val changed = base.keySet.filter(k => base(k) != drift(k))
    assert(changed.size == 1) // exactly doc 7's shard
    intercept[ParameterError](
      Shards.writeTrainingShards(docs(2), s"$dir/e", shards = 0))
  }
}
