package graft

import org.apache.spark.sql.functions._

import graft.dedup.{Bloom, Dedup}

/** Bloom-filter n-gram membership: no false negatives vs the exact
  * gram join, bounded filter size, gram-less docs, parameter guards,
  * and the broadcast probe plan. */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ref = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "pack my box with five dozen liquor jugs right now"))
    .toDF("doc_id", "text")

  private lazy val corpus = Seq(
    (10L, "he said the quick brown fox jumps over the fence"), // quotes a ref 5-gram
    (11L, "completely unrelated sentences about weather patterns in spring"),
    (12L, "tiny"), // < 5 words → no grams
    (13L, "pack my box with five dozen liquor jugs right now")) // verbatim ref doc
    .toDF("doc_id", "text")

  test("no false negatives: every exact-overlap doc is flagged") {
    val exact = Dedup.ngramOverlap(corpus, ref, n = 5)
      .select("corpus_id").as[Long].collect().toSet
    val bloom = Bloom.contaminated(corpus, ref, n = 5, mBits = 1 << 14, k = 4)
    val flagged = bloom.where(col("contaminated")).select("doc_id")
      .as[Long].collect().toSet
    assert(exact.subsetOf(flagged), s"exact $exact not within bloom $flagged")
    // verbatim copy: every gram hits
    val row13 = bloom.where($"doc_id" === 13L).collect().head
    assert(row13.getAs[Long]("n_hits") == row13.getAs[Long]("n_grams"))
  }

  test("filter is the distinct set-bit relation, bounded by mBits") {
    val filt = Bloom.build(ref, n = 5, mBits = 1 << 10, k = 4)
    val positions = filt.as[Long].collect()
    assert(positions.length == positions.distinct.length)
    assert(positions.forall(p => p >= 0 && p < (1 << 10)))
    // 2 docs × 6 grams × ≤4 positions each
    assert(positions.length <= 48)
  }

  test("gram-less docs emit n_grams = 0 and are never contaminated") {
    val out = Bloom.contaminated(corpus, ref, n = 5, mBits = 1 << 14, k = 4)
      .where($"doc_id" === 12L).collect().head
    assert(out.getAs[Long]("n_grams") == 0L)
    assert(!out.getAs[Boolean]("contaminated"))
  }

  test("disjoint-vocabulary doc is clean at this m/k (deterministic)") {
    val out = Bloom.contaminated(corpus, ref, n = 5, mBits = 1 << 16, k = 4)
      .where($"doc_id" === 11L).collect().head
    assert(out.getAs[Long]("n_hits") == 0L)
  }

  test("probe joins the filter by broadcast") {
    val out = Bloom.contaminated(corpus, ref, n = 5, mBits = 1 << 14, k = 4)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("parameter guards") {
    intercept[ParameterError](Bloom.build(ref, mBits = 0))
    intercept[ParameterError](Bloom.build(ref, k = 0))
    intercept[ParameterError](Bloom.build(ref, k = 17))
    intercept[ParameterError](Bloom.probe(corpus, Bloom.build(ref), minHits = 0))
  }
}
