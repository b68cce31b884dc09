package graft

import org.apache.spark.sql.functions._

import graft.text.Bpe

/** BPE merge learning vs an independent driver-side reference
  * implementation of the Sennrich algorithm (greedy left-to-right
  * merge, (freq DESC, l, r) tie-break), including the repeated-symbol
  * run cases where naive regex replacement diverges. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // ---- reference implementation (plain Scala, no Spark) ----
  private def refMerge(toks: Vector[String], l: String, r: String): Vector[String] =
    toks.foldLeft(Vector.empty[String]) { (acc, t) =>
      if (acc.nonEmpty && acc.last == l && t == r)
        acc.init :+ (l + r)
      else acc :+ t
    }

  private def refLearn(
      words: Map[String, Long], k: Int): Seq[(String, String, Long)] = {
    var vocab = words.toSeq.map { case (w, f) =>
      (w.split("").toVector :+ Bpe.EndMarker, f)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    for (_ <- 1 to k) {
      val counts = vocab.flatMap { case (t, f) =>
        t.sliding(2).filter(_.size == 2).map(p => (p(0), p(1)) -> f)
      }.groupMapReduce(_._1)(_._2)(_ + _)
      if (counts.nonEmpty) {
        val ((l, r), f) = counts.minBy { case ((l, r), f) => (-f, l, r) }
        out += ((l, r, f))
        vocab = vocab.map { case (t, fr) => (refMerge(t, l, r), fr) }
      }
    }
    out.toSeq
  }

  private def docsOf(words: Map[String, Long]) =
    words.toSeq.zipWithIndex.map { case ((w, f), i) =>
      (i.toLong, Seq.fill(f.toInt)(w).mkString(" "))
    }.toDF("doc_id", "text")

  test("learnMerges matches the reference on a hand corpus, including " +
    "the end-marker distinction") {
    val words = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val got = Bpe.learnMerges(docsOf(words), numMerges = 6)
      .orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == refLearn(words, 6))
    // the classic outcome: "es"/"est"/"est_" family dominates
    assert(got.map(m => m._1 + m._2).contains("es"))
  }

  test("repeated-symbol runs merge with exact greedy semantics " +
    "(aaaa -> [aa, aa], aaa -> [aa, a], abab -> [ab, ab])") {
    val words = Map("aaaa" -> 10L, "aaa" -> 7L, "abab" -> 5L)
    val ref = refLearn(words, 4)
    val got = Bpe.learnMerges(docsOf(words), numMerges = 4)
      .orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == ref)
    // step 1 merges (a,a): freq = 3·10 + 2·7 + 0·5 = 44 under greedy
    // (aaaa has 3 adjacent pairs, aaa has 2 — COUNTED, not merged, mass)
    assert(got.head == (("a", "a", 44L)))
  }

  test("learnMergesHeap (the vocabulary-scale driver-heap path) learns " +
    "the IDENTICAL merge list to learnMerges, ties and exhaustion included") {
    for (words <- Seq(
        Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L),
        Map("aaaa" -> 10L, "aaa" -> 7L, "abab" -> 5L),
        // tie-heavy: equal-frequency pairs exercise the (l, r) tie-break
        Map("ab" -> 3L, "cd" -> 3L, "ef" -> 3L))) {
      val docs = docsOf(words)
      val a = Bpe.learnMerges(docs, numMerges = 8)
        .orderBy("step").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      val b = Bpe.learnMergesHeap(docs, numMerges = 8)
        .orderBy("step").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      assert(a == b, s"divergence on $words")
    }
    // scale sanity: a merge count far beyond the job-per-merge comfort
    // zone finishes on the heap path (vocab-bounded work per merge)
    val big = Bpe.learnMergesHeap(
      docsOf(Map("internationalization" -> 4L, "internationalisation" -> 3L,
        "interoperability" -> 5L, "intercontinental" -> 2L)), numMerges = 60)
      .collect()
    assert(big.length > 20) // exhausts the tiny vocab, stops early
  }

  test("encode: distinct words tokenize once; doc token counts match " +
    "the reference fold; wordless docs emit 0") {
    val words = Map("newest" -> 4L, "widest" -> 2L, "low" -> 3L)
    val docs = Seq(
      (1L, "newest widest low"),
      (2L, "newest newest"),
      (3L, "???")) // no normalized words
      .toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docsOf(words), numMerges = 5)
    val got = Bpe.encode(docs, merges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference tokenization of each word under the learned merges
    val ms = refLearn(words, 5)
    def tokCount(w: String): Long = {
      var t = w.split("").toVector :+ Bpe.EndMarker
      ms.foreach { case (l, r, _) => t = refMerge(t, l, r) }
      t.size.toLong
    }
    assert(got(1L) == tokCount("newest") + tokCount("widest") + tokCount("low"))
    assert(got(2L) == 2 * tokCount("newest"))
    assert(got(3L) == 0L)
  }

  test("numMerges beyond exhaustion stops early; bad params raise") {
    // single 1-char word: "a _" has one pair, then "a_" has none
    val docs = Seq((1L, "a a a")).toDF("doc_id", "text")
    val m = Bpe.learnMerges(docs, numMerges = 10).collect()
    assert(m.length == 1)
    assert(m.head.getString(1) == "a" && m.head.getString(2) == "_")
    intercept[ParameterError] { Bpe.learnMerges(docs, 0) }
  }
}
