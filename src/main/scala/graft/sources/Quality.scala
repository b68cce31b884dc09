package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (the Great-Expectations /
  * dbt-test shape, Spark-native): each rule is a boolean Column over a
  * table, and the report is one row per rule with checked/violation
  * counts. The reference trusts its inputs (moonshot validates shapes,
  * not values); a 100 TB ingest cannot, so this joins the catalog as an
  * extension operator.
  *
  * Plan shape: ALL predicate rules for a table evaluate in ONE aggregate
  * pass over it (`sum(case)` per rule — one scan, no matter how many
  * rules), then a codegen `stack` reshapes the single row to one row per
  * rule. Referential checks are separate left-anti joins (broadcast when
  * the parent's key side is small, shuffle otherwise — Catalyst picks).
  * Nothing is collected: the report IS a DataFrame, so it can gate a
  * pipeline with a loud `require` on `sum(n_violations)` or be written
  * alongside the data as an audit artifact.
  */
object Quality {

  /** One aggregate pass: for each (name, mustHold) rule, count rows where
    * the predicate is null-or-false. `n_checked` is the table's row count
    * (every rule sees every row; express null-tolerance inside the
    * predicate with `isNull ||`). */
  def expect(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    val aggs = count(lit(1)).as("__n") +: rules.map { case (name, pred) =>
      sum(when(pred, 0L).otherwise(1L)).as(s"__v_$name")
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs =
      rules.map { case (name, _) => s"'$name', `__v_$name`" }.mkString(", ")
    row
      .selectExpr("__n",
        s"stack(${rules.length}, $stackArgs) as (rule, n_violations)")
      .select(col("rule"), col("__n").as("n_checked"), col("n_violations"))
  }

  /** Referential-integrity rule: child rows whose `childKey` has no match
    * in the parent's `parentKey` (nulls in the child key count as
    * orphans — an FK that is null is a violation here; model nullable
    * FKs by filtering the child first). Same (rule, n_checked,
    * n_violations) schema as [[expect]] so reports union cleanly. */
  def orphans(
      name: String,
      child: DataFrame,
      childKey: String,
      parent: DataFrame,
      parentKey: String): DataFrame = {
    val total = child.agg(count(lit(1)).as("n_checked"))
    val missing = child
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    total.crossJoin(missing) // two 1-row aggregates — bounded by design
      .select(lit(name).as("rule"), col("n_checked"), col("n_violations"))
  }
}
