package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Co-located joins via bucketing — the 100 TB technique for repeated
  * large-dimension joins: both sides bucketed by the join key at write
  * time join WITHOUT a shuffle (no Exchange on either side). Local proof
  * of the plan shape the engine relies on at cluster scale.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without an exchange on either side") {
    // (warehouse dir is a per-session temp directory — see TestSpark)
    val n = 10000
    val facts = spark.range(n).select(
      col("id").as("sid"), (col("id") % 97).cast("double").as("close"))
    val dims = spark.range(n).select(
      col("id").as("sid"), concat(lit("SYM"), col("id")).as("symbol"))

    facts.write.mode("overwrite").bucketBy(8, "sid").sortBy("sid")
      .saveAsTable("graft_prices_bucketed")
    dims.write.mode("overwrite").bucketBy(8, "sid").sortBy("sid")
      .saveAsTable("graft_master_bucketed")

    val joined = spark.table("graft_prices_bucketed")
      .hint("shuffle_merge") // force a (potentially shuffled) merge join...
      .join(spark.table("graft_master_bucketed"), "sid")
    val plan = joined.queryExecution.executedPlan.toString

    // ...and bucketing makes both Exchanges unnecessary
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected no shuffle for the bucketed join, got:\n$plan")
    assert(joined.count() == n)

    // contrast: the same join over unbucketed data shuffles both sides
    val unbucketed = facts.hint("shuffle_merge").join(dims, "sid")
    assert(unbucketed.queryExecution.executedPlan.toString
      .contains("Exchange hashpartitioning"))

    spark.sql("DROP TABLE graft_prices_bucketed")
    spark.sql("DROP TABLE graft_master_bucketed")
  }

  test("writePrices publishes a date-partitioned sid-bucketed layout: " +
    "partition pruning + shuffle-free join AND per-sid window") {
    import graft.sources.Sources
    val panel = spark.range(4000).select(
      (col("id") % 40).as("sid"),
      date_add(lit("2024-01-01").cast("date"), (col("id") % 5).cast("int"))
        .as("date"),
      (col("id") % 97).cast("double").as("close"))
    Sources.writePrices(panel, "graft_panel_pub", buckets = 8)
    val dims = spark.range(40).select(
      col("id").as("sid"), concat(lit("SYM"), col("id")).as("symbol"))
    Sources.writePrices(dims, "graft_dims_pub", buckets = 8, partitionCol = None)

    // date predicate prunes partitions at the source (not a post-filter)
    val oneDay = Sources.pricesTable(spark, "graft_panel_pub",
      Sources.PriceQuery(startDate = Some("2024-01-03"), endDate = Some("2024-01-03")))
    assert(oneDay.count() == 800)
    val scanMeta = oneDay.queryExecution.executedPlan.toString
    assert(scanMeta.contains("PartitionFilters") &&
      scanMeta.contains("2024-01-03"),
      s"expected the date filter in PartitionFilters, got:\n$scanMeta")

    // bucketed join: no exchange on either side
    val joined = Sources.pricesTable(spark, "graft_panel_pub")
      .hint("shuffle_merge")
      .join(spark.table("graft_dims_pub"), "sid")
    assert(!joined.queryExecution.executedPlan.toString
      .contains("Exchange hashpartitioning"))
    assert(joined.count() == 4000)

    // per-sid window (the §2.6 family) rides the bucket layout:
    // sort yes, shuffle no
    implicit val k: graft.panel.Panel.Keys = graft.panel.Panel.eod
    val lagged = Sources.pricesTable(spark, "graft_panel_pub")
      .withColumn("prev", graft.panel.Panel.lagBySid(col("close")))
    val lagPlan = lagged.queryExecution.executedPlan.toString
    assert(!lagPlan.contains("Exchange hashpartitioning"),
      s"expected the per-sid window to reuse bucket partitioning, got:\n$lagPlan")
    assert(lagged.where(col("prev").isNotNull).count() > 0)

    spark.sql("DROP TABLE graft_panel_pub")
    spark.sql("DROP TABLE graft_dims_pub")
  }
}
