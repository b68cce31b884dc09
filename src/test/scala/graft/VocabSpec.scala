package graft

import org.apache.spark.sql.functions._

import graft.text.Vocab

/** Vocabulary top-V selection (deterministic tie-break) and per-doc
  * OOV mass. */
class VocabSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "alpha beta gamma alpha"),
    (2L, "alpha beta delta"),
    (3L, "epsilon! epsilon?"),
    (4L, ""))
    .toDF("doc_id", "text")

  test("vocabulary counts multiplicatively and ranks with word tie-break") {
    val v = Vocab.vocabulary(docs, topV = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    // alpha ×3; beta ×2, epsilon ×2 tie → beta before epsilon
    assert(v.toSeq == Seq(("alpha", 3L, 1), ("beta", 2L, 2), ("epsilon", 2L, 3)))
  }

  test("oovRates: token mass, not distinct types; blank docs null rate") {
    val v = Vocab.vocabulary(docs, topV = 3) // alpha, beta, epsilon
    val out = Vocab.oovRates(docs, v)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)))).toMap
    assert(out(1L) == ((4L, 1L, Some(0.25)))) // gamma OOV once of 4 tokens
    assert(out(2L) == ((3L, 1L, Some(round3(1.0 / 3)))))
    assert(out(3L) == ((2L, 0L, Some(0.0))))
    assert(out(4L) == ((0L, 0L, None))) // wordless: null rate
  }

  private def round3(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("topV guard") {
    intercept[ParameterError](Vocab.vocabulary(docs, topV = 0))
  }

  test("collocations: PMI goldens — a glued pair outranks independent " +
    "co-occurrence; minCount floors; deterministic order") {
    import org.apache.spark.sql.functions.col
    // "new york" always adjacent; "the" floats freely
    val corpus = Seq(
      (1L, "new york the cat"),
      (2L, "new york the dog"),
      (3L, "the cat saw new york"))
      .toDF("doc_id", "text")
    val out = Vocab.collocations(corpus, minCount = 2, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // unigram total 13; bigram total 10; c(new york)=3, c(new)=c(york)=3
    val pmiNY = round3(math.log((3.0 / 10) / ((3.0 / 13) * (3.0 / 13))))
    assert(out(("new", "york")) == ((3L, pmiNY)))
    // "york the" occurs twice: c(the)=3
    val pmiYT = round3(math.log((2.0 / 10) / ((3.0 / 13) * (3.0 / 13))))
    assert(out(("york", "the")) == ((2L, pmiYT)))
    assert(pmiNY > pmiYT)
    // pairs under minCount are absent
    assert(!out.contains(("the", "cat")) || out(("the", "cat"))._1 >= 2)
    intercept[ParameterError](Vocab.collocations(corpus, minCount = 0))
    intercept[ParameterError](Vocab.collocations(corpus, topK = 0))
  }

  test("zipfFit: least-squares slope/R² of ln(count) on ln(rank) " +
    "(tx21)") {
    // counts a=8 b=4 c=2 d=1 → ranks 1..4
    val docs = Seq((1L, "a a a a a a a a b b b b c c d")).toDF("doc_id", "text")
    val s = Vocab.zipfFit(docs).head
    assert(s.getAs[Long]("n_types") == 4L)
    assert(s.getAs[Long]("n_tokens") == 15L)
    // closed-form least squares over the four (ln rank, ln cnt) points
    val xs = Seq(1.0, 2.0, 3.0, 4.0).map(math.log)
    val ys = Seq(8.0, 4.0, 2.0, 1.0).map(math.log)
    val mx = xs.sum / 4; val my = ys.sum / 4
    val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
    val vx = xs.map(x => (x - mx) * (x - mx)).sum
    val vy = ys.map(y => (y - my) * (y - my)).sum
    val slope = cov / vx
    assert(math.abs(s.getAs[Double]("zipf_slope") - slope) < 1e-6)
    assert(s.getAs[Double]("zipf_slope") < 0) // frequency falls with rank
    val r2 = cov * cov / (vx * vy)
    assert(math.abs(s.getAs[Double]("zipf_r2") - r2) < 1e-6)
  }

  test("heapsFit: exact full-corpus endpoints, sub-linear growth, " +
    "rerun-identical (tx26)") {
    val rnd = new scala.util.Random(11)
    val words = (1 to 40).map(i => s"w$i")
    val docs = (1L to 30L).map(i =>
      (i, Seq.fill(20)(words(rnd.nextInt(words.size))).mkString(" ")))
      .toDF("doc_id", "text")
    val s = Vocab.heapsFit(docs).head
    assert(s.getAs[Long]("n_full") == 600L) // 30 docs × 20 tokens
    assert(s.getAs[Long]("v_full") <= 40L && s.getAs[Long]("v_full") > 20L)
    assert(s.getAs[Long]("n_points") >= 5L)
    // vocabulary grows SUB-linearly in tokens
    val beta = s.getAs[Double]("heaps_beta")
    assert(beta > 0.0 && beta < 1.0)
    val again = Vocab.heapsFit(docs).head
    assert(again.getAs[Double]("heaps_beta") == beta)
    intercept[ParameterError](Vocab.heapsFit(docs, fractions = Seq(1.5)))
  }
}
