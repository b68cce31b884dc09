package graft.panel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-log operators: CDC latest-wins compaction and SCD Type-2
  * dimension builds. Neither exists in the reference (its state tables
  * are point-in-time snapshots, moonshot reads them whole); both are
  * table-stakes for a Spark warehouse feeding the same pipelines, so they
  * join the catalog as first-class extension operators.
  *
  * Scale shape: both operators shuffle ONCE on the entity key (the
  * window partition). At 100 TB the changelog is date-partitioned parquet
  * and the entity hash-exchange is the only data movement — the same
  * shape Delta/Hudi merge-on-read compaction uses. No driver-side state,
  * no joins, no iteration.
  */
object Changelog {

  /** Latest-wins CDC compaction: an upsert/delete log → the current
    * snapshot. `order` must be a TOTAL order within an entity (ts plus a
    * unique tiebreaker) or the surviving row is nondeterministic.
    * Entities whose last operation `isDelete` drop out (tombstones).
    */
  def latestSnapshot(
      log: DataFrame,
      entity: Column,
      order: Seq[Column],
      isDelete: Column): DataFrame = {
    val w = Window.partitionBy(entity).orderBy(order.map(_.desc): _*)
    log.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1 && !isDelete)
      .drop("__rn")
  }

  /** SCD Type-2 validity intervals from a state changelog: consecutive
    * rows with an unchanged `state` collapse into one run
    * (gaps-and-islands: a lag marks change points, and only change points
    * survive — no groupBy, so the run collapse and the interval windows
    * reuse ONE entity exchange). Each run becomes a version row with
    * `[valid_from, valid_to)` bounds (`valid_to` null = open interval),
    * a 1-based `version`, and `is_current`.
    *
    * `ts`/`tie` must totally order events within an entity; `state` is
    * compared with null-safe equality so a null state forms its own runs.
    */
  def scd2(
      log: DataFrame,
      entity: String,
      ts: String,
      tie: String,
      state: String): DataFrame = {
    val w = Window.partitionBy(col(entity)).orderBy(col(ts), col(tie))
    val changes = log
      .withColumn("__prev", lag(col(state), 1).over(w))
      // change point = first event of the entity, or state differs from
      // the previous event's (null-safe: null→'x' and 'x'→null both open
      // a new run; row 1's lag is null, caught by the rn check below)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1 || !(col("__prev") <=> col(state)))
    val wr = Window.partitionBy(col(entity)).orderBy(col(ts), col(tie))
    changes.select(
        col(entity),
        row_number().over(wr).as("version"),
        col(state).as("state"),
        col(ts).as("valid_from"),
        lead(col(ts), 1).over(wr).as("valid_to"))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Incremental maintenance of a per-key (count, sum) aggregate view —
    * the retractable-aggregate algebra behind materialized-view engines
    * (and Spark's own streaming update mode): the view is kept as
    * mergeable PARTIALS (n, sum), a CDC batch arrives as signed partials
    * (insert = +1/+x, retract/delete = −1/−x), and the refreshed view is
    * `union → one groupBy(key)` — never a recompute over the base table.
    * Keys whose merged count reaches 0 drop out of the view; a negative
    * merged count means the delta retracted rows the base never had, and
    * the view is corrupt — that contract is enforced LOUDLY rather than
    * clamped, because a silent clamp would hide an upstream double-send.
    *
    * Scale: cost ∝ |view partials| + |delta|, one shuffle on the view
    * key; the base fact table is never re-read. Count and sum are the
    * canonical self-inverse aggregates; min/max are NOT retractable and
    * must not be routed through this (they need the scd2/latestSnapshot
    * recompute path).
    */
  def mergeAggView(
      base: DataFrame,
      delta: DataFrame,
      keys: Seq[String],
      nCol: String = "n_rows",
      sumCol: String = "sum_cents"): DataFrame = {
    val keyCols = keys.map(col)
    base.select(keyCols :+ col(nCol) :+ col(sumCol): _*)
      .unionByName(delta.select(keyCols :+ col(nCol) :+ col(sumCol): _*))
      .groupBy(keyCols: _*)
      .agg(sum(col(nCol)).as(nCol), sum(col(sumCol)).as(sumCol))
      .withColumn(nCol,
        when(col(nCol) < 0, raise_error(concat(
          lit("mergeAggView: negative merged count for key "),
          concat_ws("/", keyCols: _*),
          lit(" — delta retracted rows the base does not have"))))
          .otherwise(col(nCol)))
      .where(col(nCol) > 0)
  }
}
