package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec, ShuffleQueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.functions._

/** AQE-ON companion to [[CatalogPlanSpec]]'s static budgets: at 100×
  * scale the join-strategy, coalescing and skew decisions are made by
  * adaptive execution, so the static plan is not the plan that runs.
  * This suite EXECUTES every budgeted pipeline at sf0.001 with AQE on
  * and walks the adaptive FINAL plan (each materialized query stage,
  * recursively), asserting the shuffle-exchange count still matches the
  * pinned budget — with per-query documented deltas where AQE
  * legitimately changes the shape. Reused exchanges count 0, as in the
  * static suite: stage reuse is the optimization the budget protects.
  *
  * A skew-parity case closes the audit: the engine's explicit salted
  * join and AQE's own skew-split handling of the PLAIN hot-key join
  * must agree row-for-row, and with the skew thresholds forced low the
  * adaptive plan must actually mark the skewed join — proof the engine
  * composes with (rather than fights) AQE's runtime re-planning. */
class CatalogPlanAqeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** Shuffle count over the ADAPTIVE final plan. QueryStageExec nodes
    * are leaves holding their materialized subtree in a field, so the
    * walk recurses into `plan` explicitly; nested AdaptiveSparkPlanExec
    * (broadcast stages re-plan their subtree adaptively) recurse into
    * their own final plan. */
  private def countAdaptiveShuffles(p: SparkPlan): Int = {
    // subquery-held plans (DPP/scalar) carry real exchanges — counted
    // in both audits so static and adaptive budgets are comparable
    val subs = p.subqueries.map(countAdaptiveShuffles).sum
    subs + (p match {
      case a: AdaptiveSparkPlanExec => countAdaptiveShuffles(a.executedPlan)
      case _: ReusedExchangeExec => 0
      case q: QueryStageExec => countAdaptiveShuffles(q.plan)
      case s: ShuffleExchangeExec =>
        1 + s.children.map(countAdaptiveShuffles).sum
      case other => other.children.map(countAdaptiveShuffles).sum
    })
  }

  /** Budget deltas under AQE, documented per entry. Positive = AQE's
    * final plan carries MORE exchanges than the static plan; negative =
    * AQE improved the shape; absent = the static budget holds exactly.
    * (Before r8's stableCheckpoint, mb1/sp15/sim8-class pipelines paid
    * +1..+3 here: checkpoint capture under AQE lost the declared hash
    * partitioning and every consumer re-shuffled — the fix makes the
    * static shape the shape AQE runs.) */
  private val aqeDelta: Map[String, Int] = Map.empty
  // (r7 carried dd21 at -1 — AQE converting the survivor-pick SMJ to
  // broadcast; the r8 size-adaptive CC made the static and adaptive
  // shapes identical again, so the table is currently empty.)

  test("shuffle budgets hold in the ADAPTIVE final plan " +
    "(AQE on, executed at sf0.001)") {
    val sc = spark.sparkContext
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try {
      val findings = PlanBudgets.shuffleBudgets.toSeq.sortBy(_._1).flatMap {
        case (name, budget) =>
          val expected = budget + aqeDelta.getOrElse(name, 0)
          // s1_universes-style data needs: none here — all budgeted
          // queries run on the standard sf0.001 tables
          val df = SparkEntry.queries(name)(spark, sfDir)
          df.collect() // materializes every adaptive stage → final plan
          val actual = countAdaptiveShuffles(df.queryExecution.executedPlan)
          sc.getPersistentRDDs.values.foreach(_.unpersist(false))
          if (actual != expected)
            Some(s"$name: adaptive final plan has $actual shuffles, " +
              s"expected $expected (static ${budget} + delta ${aqeDelta.getOrElse(name, 0)})")
          else None
      }
      assert(findings.isEmpty, s"\n${findings.mkString("\n")}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
  }

  test("the adaptive tripwire fires: a gratuitous repartition shows up " +
    "in the AQE final plan too") {
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try {
      val base = SparkEntry.queries("mb1_frequent_pairs")(spark, sfDir)
      base.collect()
      val clean = countAdaptiveShuffles(base.queryExecution.executedPlan)
      val regressed = base.repartition(7, col(base.columns.head))
      regressed.collect()
      val actual = countAdaptiveShuffles(regressed.queryExecution.executedPlan)
      assert(actual == clean + 1,
        s"expected exactly one added adaptive shuffle: clean=$clean got=$actual")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
  }

  test("skew parity: the salted join and AQE's skew-split of the plain " +
    "join return identical rows, and AQE marks the join skewed") {
    import spark.implicits._
    val aqeConfs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      // force the skew machinery at toy scale: any partition over 16 KB
      // splits, and never broadcast (keep the SMJ shape skew handling
      // applies to)
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16384",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8192",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = aqeConfs.map { case (k, _) => k -> spark.conf.getOption(k) }
    aqeConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // hot-key fact: 40k rows on THREE keys, one key holding 90%
      val fact = spark.range(40000).select(
        when($"id" % 10 < 9, "HOT").when($"id" % 10 === 9, "B")
          .otherwise("C").as("k"),
        $"id".as("v"),
        // padding makes the hot partition's bytes cross the threshold
        lpad($"id".cast("string"), 64, "x").as("pad"))
      val dim = Seq(("HOT", 1L), ("B", 2L), ("C", 3L), ("COLD", 4L))
        .toDF("k", "dk")
      // Compare the RAW join (no downstream operator): AQE only splits
      // a skewed join when nothing above it REUSES the join's
      // partitioning — an agg keyed on the join key suppresses the
      // split, because splitting would break the clustering the agg
      // consumes and force an extra shuffle. That suppression is itself
      // why the explicit salted join stays in the toolbox: it
      // pre-commits the spread, and the post-join agg keys on the
      // unsalted column afterwards.
      val plain = fact.join(dim, Seq("k")).select($"k", $"v", $"dk")
      val plainRows = plain.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).sorted
      // AQE actually engaged its skew handling on the plain join
      val planStr = (plain.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }).treeString
      assert(planStr.contains("skew=true"),
        s"expected a skew-marked join in the adaptive plan:\n$planStr")
      val salted = graft.panel.Skew.saltedJoin(fact, dim, "k", salts = 8)
        .select($"k", $"v", $"dk")
        .collect().map(r =>
          (r.getString(0), r.getLong(1), r.getLong(2))).sorted
      assert(salted.sameElements(plainRows),
        "salted join must be row-identical to AQE's skew-split plain join")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
