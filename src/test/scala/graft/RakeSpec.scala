package graft

import graft.text.Rake

/** RAKE goldens on a hand-scored corpus: stopword islands become
  * phrases, word score = degree/frequency, phrase score = Σ word
  * scores, deterministic (score desc, phrase) top-K, and the
  * maxPhraseLen cap re-scores the surviving vocabulary. The tx29
  * catalog query pins the operator against DuckDB at sf0.01. */
class RakeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox and the lazy dog"),
    (2L, "quick brown fox in a deep learning era"),
    (3L, "deep learning"))
    .toDF("doc_id", "text")

  test("keywords: hand-computed degree/frequency scores and ordering") {
    val r = Rake.keywords(docs, topK = 10).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getDouble(2))).toSeq
    // quick/brown/fox: freq 2, degree 6 → 3.0 each; deep/learning:
    // freq 2, degree 5 → 2.5; era 3.0; lazy/dog 2.0
    assert(r == Seq(
      "quick brown fox" -> ((2L, 9.0)),
      "deep learning era" -> ((1L, 8.0)),
      "deep learning" -> ((1L, 5.0)),
      "lazy dog" -> ((1L, 4.0))))
    // topK truncates deterministically
    assert(Rake.keywords(docs, topK = 2).collect().map(_.getString(0))
      .toSeq == Seq("quick brown fox", "deep learning era"))
  }

  test("keywords: maxPhraseLen drops long runs BEFORE word scoring") {
    val r = Rake.keywords(docs, topK = 10, maxPhraseLen = 2).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getDouble(2))).toSeq
    // 3-word phrases gone; deep now freq 1 degree 2 → both phrases 4.0,
    // tie broken by phrase text
    assert(r == Seq(
      "deep learning" -> ((1L, 4.0)),
      "lazy dog" -> ((1L, 4.0))))
    intercept[ParameterError] { Rake.keywords(docs, topK = 0) }
  }
}
