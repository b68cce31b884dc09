package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.sim.Similarity
import graft.text.Packing

/** Physical-plan shape tripwires for the round-4 operator families
  * (PLANS.md is the prose record; these assertions catch drift). Each
  * test pins the property that makes the operator scale — shuffle
  * count, broadcast direction, top-k pushdown — not the full plan
  * text.
  */
class PlanShapeSpec extends SparkSpec {
  import spark.implicits._

  /** Final AQE plan (post-execution), minus the Initial Plan echo. */
  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  private def count(plan: String, token: String): Int =
    token.r.findAllIn(plan).size

  private lazy val docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta"),
    (2L, "alpha beta gamma delta epsilon zeta eta theta"),
    (3L, "one two three four five six seven eight nine ten"),
    (4L, "completely different words in this document body here"))
    .toDF("doc_id", "text")

  test("pk1: packing shuffles ONCE (hash exchange on shard) — no global " +
    "sort, no second exchange") {
    val plan = finalPlan(Packing.packSequences(docs, "doc_id", "text",
      budget = 8, shards = 2))
    // the per-shard running sum needs exactly one hash exchange; a
    // global-stream regression would add a single-partition exchange
    assert(count(plan, "Exchange hashpartitioning") == 1, plan)
    assert(!plan.contains("Exchange SinglePartition"), plan)
  }

  test("dd14: redaction joins the corpus gram stream against a BROADCAST " +
    "distinct ref-gram set — never a pair join of the two corpora") {
    val ref = Seq((100L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val plan = finalPlan(
      Dedup.redactContaminated(docs, ref, n = 5))
    assert(plan.contains("BroadcastHashJoin"), plan)
    // corpus tokens must reach the collision join directly — any
    // SortMergeJoin here would mean the ref side stopped broadcasting
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("sim7: IVFADC search broadcasts the query side and caps per-query " +
    "rows with the Spark-4 top-k pushdown (WindowGroupLimit)") {
    val vecs = Seq(
      (0L, Seq(0f, 0f, 0f, 0f)), (1L, Seq(0f, 0f, 10f, 10f)),
      (2L, Seq(10f, 10f, 0f, 0f)), (3L, Seq(10f, 10f, 10f, 10f)),
      (4L, Seq(1f, 1f, 1f, 1f)), (5L, Seq(9f, 9f, 9f, 9f)))
      .toDF("vec_id", "embedding")
    val centroids = Similarity.kmeansCentroids(vecs, k = 2, iters = 2)
    val codebook = Seq(
      (0, 0, Seq(0f, 0f)), (0, 1, Seq(10f, 10f)),
      (1, 0, Seq(0f, 0f)), (1, 1, Seq(10f, 10f)))
      .toDF("subspace", "code", "subcentroid")
    val plan = finalPlan(Similarity.ivfadcTopK(
      vecs.where($"vec_id" < 2), vecs, centroids, codebook, k = 3))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("ic1/fm1: the signal-eval family is agg+window only — no joins " +
    "anywhere in the plan") {
    implicit val k: graft.panel.Panel.Keys = graft.panel.Panel.eod
    val panel = Seq(
      ("A", "2024-01-01", 10.0, 0.01), ("B", "2024-01-01", 20.0, 0.02),
      ("A", "2024-01-02", 11.0, 0.03), ("B", "2024-01-02", 21.0, 0.04))
      .toDF("sid", "date", "close", "fwd")
    val ic = graft.perf.Signals.infoCoefficient(panel, col("close"), col("fwd"))
    assert(!finalPlan(ic).contains("Join"), finalPlan(ic))
    val fm = graft.perf.FactorModel.crossSectionalRegression(
      panel, col("fwd"), col("close"), col("close") * 2 + col("fwd"))
    assert(!finalPlan(fm).contains("Join"), finalPlan(fm))
  }

  test("adj1: back-adjustment is union+window — no joins (the actions " +
    "ride the bar stream)") {
    implicit val k: graft.panel.Panel.Keys = graft.panel.Panel.eod
    val panel = Seq(("A", java.sql.Date.valueOf("2024-01-01"), 10.0))
      .toDF("sid", "date", "close")
    val actions = Seq(("A", java.sql.Date.valueOf("2024-02-01"), 0.5))
      .toDF("sid", "date", "factor")
    val plan = finalPlan(graft.panel.Adjustments.backAdjust(panel, actions))
    assert(!plan.contains("Join"), plan)
  }
}
