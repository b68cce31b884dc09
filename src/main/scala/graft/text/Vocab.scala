package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ParameterError

/** Vocabulary construction and out-of-vocabulary measurement — the
  * tokenizer-prep stage of a training pipeline (fix a top-V word list
  * on the corpus, then measure each document's OOV mass; a high OOV
  * rate flags encoding damage, boilerplate, or out-of-domain text).
  *
  * Scale shape: the count aggregation is one shuffle on the word
  * (map-side partials collapse repeats early); top-V selection is
  * `orderBy(...).limit(V)` — Catalyst's TakeOrderedAndProject, a
  * per-partition top-V then a V-row driver merge, NOT a global sort.
  * The vocabulary is ≤ V rows by construction, so the OOV probe join
  * always broadcasts. */
object Vocab {

  /** The word stream `(idCol, __s)` — [[graft.dedup.Dedup.shingleRows]]
    * unigrams with the empty-split artifact removed (blank docs emit
    * "" from the word split; not a word). */
  private def words(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.dedup.Dedup.shingleRows(docs, idCol, textCol, n = 1)
      .where(col("__s") =!= "")

  /** Top-V vocabulary: (word, cnt, rank), rank 1..V by count
    * descending with lexicographic tie-break (deterministic — count
    * ties are common in any real corpus). */
  def vocabulary(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      topV: Int = 10000): DataFrame = {
    if (topV <= 0) throw new ParameterError(s"topV must be positive: $topV")
    import org.apache.spark.sql.expressions.Window
    val counts = words(docs, idCol, textCol)
      .groupBy(col("__s").as("word"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(topV)
    // rank over the ≤ V-row result — bounded unpartitioned window
    counts.withColumn("rank",
      row_number().over(Window.orderBy(col("cnt").desc, col("word"))))
  }

  /** Per-doc OOV measurement against a `(word, ...)` vocabulary frame:
    * (idCol, n_tokens, n_oov, oov_rate). Token occurrences count
    * multiplicatively (OOV MASS, not distinct types). Docs with no
    * words emit n_tokens = 0 and a null rate. */
  def oovRates(
      docs: DataFrame,
      vocab: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val stats = words(docs, idCol, textCol)
      .join(broadcast(vocab.select(col("word").as("__v"))),
        col("__s") === col("__v"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("__v").isNull, 1L).otherwise(0L)).as("n_oov"))
    docs.select(col(idCol))
      .join(stats, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        round(col("n_oov").cast("double") / col("n_tokens"), 6).as("oov_rate"))
  }
}
