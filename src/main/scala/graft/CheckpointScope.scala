package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lifecycle management for `localCheckpoint` blocks inside a
  * multi-stage composition.
  *
  * Per-query, lazy local checkpoints are the right tool (they are why
  * near-dup went 458 → 175 s: shared frames evaluate once instead of
  * once per consumer). But a checkpointed block is released only when
  * the JVM garbage-collects the RDD reference and the async
  * ContextCleaner catches up — in a long-lived session composing many
  * operators (a real 100 TB pipeline chaining dedup → soft-weights →
  * sampling), block-manager pressure accumulates and executors pay for
  * state no one will read again. The round-5 bench artifact measured
  * exactly that: mid-run queries inflated 4-9× vs their fresh-session
  * cost purely from unreleased checkpoint state.
  *
  * [[CheckpointScope.scoped]] is the composition-level fix: frames
  * checkpointed through the scope are TRACKED, the composition's
  * result is eagerly checkpointed on exit (so it is self-contained —
  * its data no longer depends on any intermediate's blocks), and every
  * tracked intermediate is then unpersisted. The price is eagerness at
  * scope exit (one materialization of the result), which is what
  * "after consumption" means for a lazy engine; the result frame
  * itself stays a normal checkpointed frame the CALLER owns (a
  * harness like Bench/Verify sweeps it via `getPersistentRDDs` between
  * queries; a pipeline passes it to the next scope).
  *
  * Threading contract: block tracking snapshots
  * `sparkContext.getPersistentRDDs` around each checkpoint call, so a
  * scope must not race OTHER persist activity on the same
  * SparkContext. Compositions here are single-threaded (Spark
  * parallelism lives below the driver API), so this holds by
  * construction.
  */
final class CheckpointScope private[graft] (spark: SparkSession) {
  private val tracked = scala.collection.mutable.ArrayBuffer.empty[Int]

  /** `df.localCheckpoint(eager)` with the backing blocks tracked for
    * release at scope exit. Drop-in replacement for a bare
    * `localCheckpoint` inside [[CheckpointScope.scoped]].
    *
    * `stable = true` (default) captures the plan with AQE off so the
    * frame's declared partitioning survives into the LogicalRDD (see
    * [[StableCheckpoint]]) — right for big frames whose partitioning
    * downstream joins consume. Pass `stable = false` for per-ROUND
    * iteration state (labels, ranks, frontiers): those frames are
    * small, get re-keyed next round anyway, and benefit more from
    * AQE's runtime coalescing inside the round's own job (measured:
    * gr3 8.0 → 5.x s at sf0.1 when the rounds kept AQE). */
  def checkpoint(df: DataFrame, eager: Boolean = false,
      stable: Boolean = true): DataFrame = {
    import StableCheckpoint._
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = if (stable) df.stableCheckpoint(eager) else df.localCheckpoint(eager)
    tracked ++= (sc.getPersistentRDDs.keySet -- before)
    out
  }

  private[graft] def release(): Unit = {
    val sc = spark.sparkContext
    tracked.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
    tracked.clear()
  }
}

object CheckpointScope {

  /** Run `body` with a fresh scope; eagerly checkpoint its result
    * (making it independent of every intermediate), release EVERY
    * persistent RDD registered during the body — scope-tracked or
    * checkpointed bare inside a library call the body composed — and
    * return the self-contained result. On failure the body's blocks
    * are released before the exception propagates: a throwing
    * pipeline leaks nothing. */
  def scoped(spark: SparkSession)(body: CheckpointScope => DataFrame): DataFrame = {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    def releaseSince(): Unit =
      (sc.getPersistentRDDs.keySet -- before).foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
    val scope = new CheckpointScope(spark)
    val result =
      try body(scope)
      catch { case e: Throwable => releaseSince(); throw e }
    // Eager, and AFTER the intermediate-id snapshot: the result's
    // blocks must exist before the intermediates they derive from are
    // dropped — a lazy checkpoint here would recompute through
    // already-unpersisted truncated lineage.
    val bodyIds = sc.getPersistentRDDs.keySet -- before
    val out = { import StableCheckpoint._; result.stableCheckpoint(eager = true) }
    bodyIds.foreach(id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
    out
  }
}

/** AQE-safe plan capture for local checkpoints.
  *
  * `Dataset.localCheckpoint` records the captured physical plan's
  * output partitioning into the replacement `LogicalRDD` — the property
  * that makes a repartition→checkpoint→N-consumers chain exchange-free
  * downstream. With adaptive execution enabled, the captured plan is an
  * `AdaptiveSparkPlanExec` whose output partitioning is UNKNOWN at
  * capture time, so every downstream consumer silently re-shuffles
  * (measured with AQE on: mb1 2→4 exchanges, sim8 1→4, sp15 0→1 —
  * exactly the silent-at-sf0.01, fatal-at-100-TB regression class the
  * plan audits exist to catch). `stableCheckpoint` therefore captures
  * the checkpointed SEGMENT's plan with AQE flipped off for the
  * duration of the `localCheckpoint` call: the declared partitioning
  * then holds at materialization because the captured static plan is
  * what runs. The segment's own execution forgoes AQE runtime
  * re-planning — the audited static shape is what the shuffle budgets
  * pin, so the static plan IS the contract.
  *
  * The session-conf flip would be visible to concurrent planners on
  * the same session for the duration of the call, so captures are
  * SERIALIZED under a global lock: two threads checkpointing
  * concurrently (or one checkpointing while another plans) can no
  * longer interleave set/restore and capture an AQE-wrapped
  * (UnknownPartitioning) plan or leave AQE off for an unrelated query.
  * The lock holds only for plan capture + (for lazy checkpoints)
  * registration; an EAGER checkpoint does materialize inside it —
  * concurrent eager captures queue, which is the documented price of a
  * correct flip (compositions here are single-threaded anyway). */
object StableCheckpoint {

  /** Test-observable probe: called with the checkpointed SEGMENT's
    * physical plan (captured with AQE off) on every stableCheckpoint.
    * Checkpoints truncate published plans to ExistingRDD scans, so a
    * plan audit walking only final plans is blind to everything above
    * a checkpoint — this hook is how WindowPlanSpec sees those
    * segments. No-op in production. */
  @volatile var planProbe: org.apache.spark.sql.execution.SparkPlan => Unit =
    _ => ()

  private val captureLock = new Object

  implicit final class Syntax[T](private val ds: org.apache.spark.sql.Dataset[T])
      extends AnyVal {
    def stableCheckpoint(eager: Boolean = false): org.apache.spark.sql.Dataset[T] =
      captureLock.synchronized {
        val conf = ds.sparkSession.conf
        val key = "spark.sql.adaptive.enabled"
        val was = conf.get(key, "true")
        conf.set(key, "false")
        try {
          planProbe(ds.queryExecution.executedPlan)
          ds.localCheckpoint(eager)
        } finally conf.set(key, was)
      }
    def stableCheckpoint(): org.apache.spark.sql.Dataset[T] =
      stableCheckpoint(eager = true)
  }
}
