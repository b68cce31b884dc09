package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ParameterError

/** GPT-style sequence packing: concatenate documents in a deterministic
  * order and cut the token stream into fixed-budget training sequences,
  * emitting which sequence(s) each document lands in (a document
  * straddling a boundary appears in both — the standard
  * concat-then-chunk pretraining prep).
  *
  * Scale design: a single global token stream would need an
  * unpartitioned running sum (one giant sort). Instead the corpus is
  * split into `shards` INDEPENDENT streams by a stable md5 hash of the
  * doc id — the cumulative sum then runs per shard
  * (`Window.partitionBy(shard)`), so the only shuffle is a hash
  * exchange on shard and parallelism is `shards`-wide. Set `shards`
  * ≳ 4× cluster cores for 100 TB; sequence ids are (shard, seq_id)
  * pairs. Shard assignment, ordering, and therefore packing are fully
  * deterministic — reruns, retries, and cluster resizes produce the
  * identical packing (same property as [[Sampling.hashUnit]]).
  */
object Packing {

  /** One row per (document, training sequence) incidence:
    * (shard, seq_id, id, tok_in_seq). `tok_in_seq` is how many of the
    * document's tokens fall in that sequence; per (shard, seq_id) they
    * sum to exactly `budget` except each shard's last. Empty docs are
    * dropped (they contribute no tokens). */
  def packSequences(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      budget: Int = 512,
      shards: Int = 8,
      seed: String = "pack"): DataFrame = {
    if (budget <= 0) throw new ParameterError(s"budget must be positive: $budget")
    if (shards <= 0) throw new ParameterError(s"shards must be positive: $shards")
    val shard = conv(substring(md5(concat_ws("|", lit(seed), col(idCol))), 1, 8), 16, 10)
      .cast("long") % shards
    val base = docs
      .select(col(idCol),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("__n"),
        shard.as("shard"))
      .where(col("__n") > 0)
    val w = Window.partitionBy("shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // integer `div`, not float division: exact at any stream length
    val withOff = base
      .withColumn("__off", sum(col("__n")).over(w) - col("__n"))
    val firstSeq = expr(s"__off div $budget")
    val lastSeq = expr(s"(__off + __n - 1) div $budget")
    withOff
      .select(col("shard"), col(idCol), col("__n"), col("__off"),
        explode(sequence(firstSeq, lastSeq)).as("seq_id"))
      .select(
        col("shard"), col("seq_id"), col(idCol),
        (least(col("__off") + col("__n"), (col("seq_id") + 1) * budget)
          - greatest(col("__off"), col("seq_id") * budget)).as("tok_in_seq"))
  }
}
