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
}
