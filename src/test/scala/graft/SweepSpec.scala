package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.panel.Panel.Keys
import graft.pipeline.{Backtest, Strategy}

/** Parameter-sweep semantics: `Keys.group` partitions every per-sid
  * window and cross-sectional slot by the variant dimension, so one
  * plan over one scan reproduces N independent backtests exactly. */
class SweepSpec extends SparkSpec {
  import spark.implicits._

  private def panel: DataFrame = Seq(
    ("A", "2024-01-01", 10.0), ("A", "2024-01-02", 12.0),
    ("A", "2024-01-03", 9.0), ("A", "2024-01-04", 15.0),
    ("B", "2024-01-01", 40.0), ("B", "2024-01-02", 30.0),
    ("B", "2024-01-03", 45.0), ("B", "2024-01-04", 20.0))
    .toDF("sid", "date", "close")
    .withColumn("date", to_date($"date"))

  private class Thresh(t: Double, ks: Keys) extends Strategy {
    val code = "sweep-spec"
    override def keys: Keys = ks
    def pricesToSignals(prices: DataFrame): DataFrame =
      prices.withColumn("signal",
        (col("close") < coalesce(col("threshold"), lit(t))).cast("int"))
  }

  private def melt(df: DataFrame): Map[(String, String, String), Double] =
    df.na.drop(Seq("value"))
      .collect()
      .map(r => (r.getAs[String]("sid"), r.getAs[java.sql.Date]("date").toString,
        r.getAs[String]("field")) -> r.getAs[Double]("value"))
      .toMap

  test("grouped sweep reproduces each variant's independent run exactly") {
    val variants = Seq(("lo", 15.0), ("hi", 35.0)).toDF("variant", "threshold")
    val swept = Backtest.run(
      new Thresh(Double.NaN, Keys(group = Seq("variant"))),
      panel.crossJoin(broadcast(variants)))
    for ((v, t) <- Seq(("lo", 15.0), ("hi", 35.0))) {
      val single = Backtest.run(
        new Thresh(t, Keys()),
        panel.withColumn("threshold", lit(t)))
      assert(melt(swept.where(col("variant") === v).drop("variant")) ==
        melt(single),
        s"variant $v diverged from its independent run")
    }
  }

  test("sweep melt carries the variant key through the results") {
    val variants = Seq(("lo", 15.0), ("hi", 35.0)).toDF("variant", "threshold")
    val swept = Backtest.run(
      new Thresh(Double.NaN, Keys(group = Seq("variant"))),
      panel.crossJoin(broadcast(variants)))
    assert(swept.columns.contains("variant"))
    // per-variant row counts are the full melt (10 fields × 8 bars)
    val counts = swept.groupBy("variant").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("lo" -> 80L, "hi" -> 80L))
  }

  test("BENCHMARK with grouped keys raises the sweep contract error") {
    val variants = Seq(("lo", 15.0)).toDF("variant", "threshold")
    val st = new Thresh(Double.NaN, Keys(group = Seq("variant"))) {
      override def benchmarkSid: Option[String] = Some("A")
    }
    val e = intercept[ParameterError] {
      Backtest.run(st, panel.crossJoin(broadcast(variants)))
    }
    assert(e.getMessage.contains("not supported with grouped keys"))
  }

  test("the sweep plan scans the price source ONCE (the point of the op)") {
    val dir = java.nio.file.Files.createTempDirectory("sweep_plan").toString
    panel.write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val variants = Seq(("lo", 15.0), ("hi", 35.0)).toDF("variant", "threshold")
    val swept = Backtest.run(
      new Thresh(Double.NaN, Keys(group = Seq("variant"))),
      stored.crossJoin(broadcast(variants)))
      .groupBy("variant").count()
    swept.collect()
    val plan = swept.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("Scan parquet".r.findAllIn(plan).size == 1, plan)
  }
}
