package graft

import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.execution.{LocalTableScanExec, SparkPlan}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Catalog-wide physical-plan tripwire: every SparkEntry.queries entry
  * is planned against sf0.001 and must not contain a CartesianProduct,
  * nor a BroadcastNestedLoopJoin whose broadcast side isn't PROVABLY
  * BOUNDED — a grouping-free aggregate (1 row by construction), a
  * literal local relation, or a limit — unless the query is on the
  * explicit allowlist of intentional bounded fan-outs. PLANS.md records
  * why each family is safe; this spec automates the drift guard it
  * previously provided only narratively: a refactor that silently turns
  * an equi-join into a nested loop fails here, not at 100 TB. */
class CatalogPlanSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** Intentional data-dependent-but-dimension-bounded nested-loop
    * fan-outs (each documented at its operator):
    *  - sim* ANN queries: a ≤5-row query set nested-loops the corpus —
    *    brute-force/rerank top-k is definitionally all-pairs vs queries
    *  - trade_full/trade_cal/d17: account fan-out (≤|accounts| dim)
    *  - sw1: 3 strategy variants crossed onto one tagged pipeline
    *  - ml8/ml9: ≤|folds| boundary frames onto the panel
    *  - r7: trading-calendar densify (dates × sids dimension grid)
    *  - coint1: ≤6-row sid-pair frame drives per-pair regressions
    *  - sd2/sd3: ≤k sampled prototype centroids onto the vector stream */
  private val bnljAllow: Set[String] = Set(
    "sim1_bruteforce_topk", "sim3_ivf_topk", "sim4_ivf_nprobe",
    "sim6_pq_topk", "sim7_ivfadc", "sim8_index_search", "sim9_rank_eval",
    "sim10_hard_negatives", "sim13_matryoshka", "sim14_nprobe_recall",
    "ir4_rrf", // ≤5-row filtered query set drives the fused rank lists
    "trade_full", "trade_cal", "d17_trade_limits", "sw1_param_sweep",
    "ml8_purged_cv", "ml9_walk_forward", "r7_densify", "coint1_pairs",
    "sd2_prototypes", "sd3_semantic_decontam",
    "ml40_cluster_eval", // ≤k trained centroids + checkpointed 1-row reductions (opaque)
    "cl2_nb_classify", // ≤|labels| model stats, checkpointed (opaque)
    "ml33_nb_learning_curve", // cl2's classify chain × |fractions|
    "ml38_source_ablation", // cl2's classify chain × (|ablate|+1)
    "ml39_mcnemar", // cl2's classify chain × 2 paired models
    "sk5_hll_overlap", // |event_type|² sketch pairs — dimension-bounded
    "ev20_retention_fit", // ≤maxOffset per-offset caps behind a filter
    "ct1_chisq", // contingency-grid completion: distinct(d1) × distinct(d2), both dimension-bounded
    "qn1_quantile_norm") // rank lookup vs the distinct-cents histogram (value-domain-bounded broadcast)

  /** A broadcast side is provably bounded when its subtree ends in a
    * grouping-free aggregate (scalar — exactly one row), a literal
    * local relation, a literal-bounded Range, or a limit. A
    * ReusedExchange holds its original exchange as a FIELD (it is a
    * leaf in the tree), so boundedness recurses into it explicitly.
    * Broadcast subtrees are small; a collectFirst over them can't
    * false-positive on data-scale nodes because anything row-scale
    * under a broadcast would be the very bug this spec exists to
    * catch. */
  private def provablyBounded(p: SparkPlan): Boolean =
    p.collectFirst {
      case a: BaseAggregateExec if a.groupingExpressions.isEmpty => true
      case _: LocalTableScanExec => true
      case _: org.apache.spark.sql.execution.RangeExec => true
      case l if l.nodeName.contains("Limit") => true
      // orderBy().limit(n) plans as TakeOrderedAndProject — a global
      // limit in disguise (ab1's two 1-row variant frames)
      case t if t.nodeName.contains("TakeOrdered") => true
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        provablyBounded(r.child)
    }.contains(true)

  test("no catalog query plans CartesianProduct; BroadcastNestedLoopJoin " +
    "only with provably-bounded broadcast sides or on the allowlist") {
    val sc = spark.sparkContext
    // static plans: AQE wraps the tree in AdaptiveSparkPlanExec whose
    // children aren't walkable pre-execution; join strategy decisions
    // under inspection here are made statically anyway
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
        // s1_universes needs nation keys 1/2 present among suppliers —
        // a data-scale artifact of the tiny sf, not a plan property
        val dir = if (name == "s1_universes") "/root/testdata/sf0.01" else sfDir
        val finding =
          try {
            val plan = fn(spark, dir).queryExecution.executedPlan
            val carts = plan.collect { case c: CartesianProductExec => c }
            val loops = plan.collect {
              case j: BroadcastNestedLoopJoinExec
                  if !bnljAllow(name) &&
                    !provablyBounded(j.buildSide match {
                      case BuildLeft => j.left
                      case BuildRight => j.right
                    }) => j
            }
            if (carts.nonEmpty || loops.nonEmpty)
              Some(s"$name: cartesian=${carts.size} unbounded-bnlj=${loops.size}")
            else None
          } catch {
            case e: Throwable =>
              Some(s"$name: failed to plan: " +
                s"${Option(e.getMessage).getOrElse(e.getClass.getName).take(120)}")
          }
        // keep the sweep honest: eager queries checkpoint state; drop it
        sc.getPersistentRDDs.values.foreach(_.unpersist(false))
        finding
      }
      assert(bad.isEmpty, s"\n${bad.mkString("\n")}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
  }
}
