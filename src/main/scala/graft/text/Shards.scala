package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ParameterError

/** Final-stage training-shard writer — the "last mile" of a data
  * pipeline: deterministic shard assignment, a partitioned parquet
  * write, and an INTEGRITY MANIFEST computed from the files as
  * written (not from the input frame), so the manifest certifies the
  * write's own roundtrip.
  *
  * Shard assignment uses the repo's md5 [[Sampling.hashUnit]] (NOT
  * Spark's murmur `hash`): engine-independent, so downstream loaders
  * in any runtime — and the SQL oracle — reproduce the mapping
  * bit-for-bit, and re-sharding a grown corpus moves only new ids.
  * The per-shard `content_crc` is an ORDER-FREE exact integer sum of
  * a per-row md5 prefix: any lost, duplicated, or corrupted row
  * changes it, and it can be re-verified shard-by-shard without
  * reading any other shard.
  *
  * Scale shape: one write (each task streams rows to its partition
  * directories; `maxRecordsPerFile` bounds file sizes for loader
  * parallelism), one read-back aggregation pruned to the partition
  * column + text. At 100 TB the manifest pass is a scan-bound
  * map-side-partial aggregation over `shards` groups. */
object Shards {

  /** Write `docs` to `dir` partitioned into `shards` deterministic
    * shards; return the manifest `(shard, n_docs, n_tokens,
    * content_crc)` computed from the WRITTEN files. */
  def writeTrainingShards(
      docs: DataFrame,
      dir: String,
      shards: Int = 16,
      idCol: String = "doc_id",
      textCol: String = "text",
      seed: String = "shard",
      maxRecordsPerFile: Long = 0L): DataFrame = {
    if (shards <= 0)
      throw new ParameterError(s"shards must be positive: $shards")
    docs
      .withColumn("__shard",
        floor(Sampling.hashUnit(col(idCol), seed) * shards).cast("int"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("__shard")
      .parquet(dir)
    docs.sparkSession.read.parquet(dir)
      .groupBy(col("__shard").cast("int").as("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col(textCol)).cast("long"))
          .as("n_tokens"),
        sum(conv(substring(md5(col(textCol)), 1, 8), 16, 10).cast("long"))
          .as("content_crc"))
  }

  /** Loader side: read only `shardIds` from a sharded dataset. The
    * predicate is on the PARTITION column, so Catalyst prunes at the
    * file listing — a 1/16 shard read touches 1/16 of the files, never
    * a full scan + filter (ShardsSpec pins the plan's PartitionFilters).
    * This is how distributed trainers map ranks to data: each rank
    * reads its shard set with zero coordination and zero wasted IO. */
  def readShards(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      shardIds: Seq[Int]): DataFrame = {
    if (shardIds.isEmpty)
      throw new ParameterError("shardIds must be non-empty")
    spark.read.parquet(dir)
      .where(col("__shard").isin(shardIds: _*))
  }
}
