package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ParameterError

/** BM25 keyword retrieval over a document corpus (Robertson-Spärck
  * Jones probabilistic model — the lexical baseline every RAG /
  * data-curation pipeline keeps next to its embedding index).
  *
  * Scale design: for a FIXED query term set there is no inverted index
  * to build — per-term term frequencies are per-row column algebra on
  * the scan (`size(filter(words, _ = term))`), corpus statistics (N,
  * Σdl, per-term document frequencies) are ONE tiny aggregate row
  * broadcast back, and scoring is codegen'd arithmetic. Net cost: one
  * scan + one scalar agg + a top-k — no explode, no posting-list
  * shuffle. Determinism: the per-document score sums query terms in
  * FIXED column order (not a `groupBy().sum()` whose addition order is
  * partition-dependent), so results reproduce bit-for-bit across
  * engines and cluster sizes.
  */
object Retrieval {

  /** Top-k documents by BM25 score for `queryTerms` (matched against
    * [[TextAnalysis.normWords]] tokens). Returns (id, score) with
    * score rounded to 6 so last-ulp `ln` differences between math
    * libraries can't change the output; ties break by id. */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      topK: Int = 20,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    if (queryTerms.isEmpty) throw new ParameterError("queryTerms must be non-empty")
    if (queryTerms.distinct.size != queryTerms.size)
      throw new ParameterError(s"duplicate query terms: ${queryTerms.mkString(", ")}")

    val words = TextAnalysis.normWords(col(textCol))
    val dl = when(length(trim(col(textCol))) === 0, 0).otherwise(size(words)).cast("long")
    def tf(term: String): Column = size(filter(words, w => w === lit(term))).cast("long")

    // materialize the narrow (id, dl, tf…) frame once: it feeds both
    // the stats aggregate and the scoring pass, and without a common
    // exchange nothing dedups the two corpus scans + tokenizations
    // (the crossNearDuplicates lesson) — this IS the "one scan" the
    // design comment promises. LAZY checkpoint: the frame is
    // corpus-row-count-sized, so materialization waits for the caller's
    // first action instead of running jobs at construction time; the
    // stats subquery computes it, the scoring pass reuses it.
    val perDoc = docs.select(
      col(idCol) +: dl.as("__dl") +:
        queryTerms.zipWithIndex.map { case (t, i) => tf(t).as(s"__tf$i") }: _*)
      .localCheckpoint(eager = false)

    // one scalar row: N, Σdl, df_i — integer aggregates only, so the
    // unordered combine is exact (see Verify gotchas on float sums)
    val aggs = count(lit(1)).as("__N") +: sum(col("__dl")).as("__sumdl") +:
      queryTerms.indices
        .map(i => sum(when(col(s"__tf$i") > 0, 1L).otherwise(0L)).as(s"__df$i"))
    val stats = perDoc.agg(aggs.head, aggs.tail: _*)

    val scored = perDoc.crossJoin(broadcast(stats))
    // dl/avgdl as dl*N/Σdl: every operand integer-exact, one division
    val lenNorm = col("__dl").cast("double") * col("__N") / col("__sumdl")
    val termScores = queryTerms.indices.map { i =>
      val tfc = col(s"__tf$i").cast("double")
      val idf = log(lit(1.0) + (col("__N") - col(s"__df$i") + 0.5) / (col(s"__df$i") + 0.5))
      idf * tfc * (k1 + 1) / (tfc + lit(k1) * (lit(1 - b) + lit(b) * lenNorm))
    }
    scored
      .select(col(idCol), round(termScores.reduce(_ + _), 6).as("score"))
      .where(col("score") > 0)
      .orderBy(col("score").desc, col(idCol))
      .limit(topK)
  }
}
