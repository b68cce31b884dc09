package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.alloc.Weights
import graft.panel.Panel
import graft.pipeline.{Backtest, Strategy}

/** D19 benchmark returns, mirroring the reference golden tests
  * (_tests/test_benchmark.py): in-panel EOD, BENCHMARK_TIME collapse for
  * once-a-day intraday strategies, BENCHMARK_DB separate source, and the
  * two parameter errors.
  */
class BenchmarkSpec extends SparkSpec {
  import spark.implicits._

  private def benchmarkSeries(results: DataFrame): Seq[(String, Double)] =
    results.where($"field" === "Benchmark")
      .orderBy("date")
      .collect()
      .map(r => r.getAs[java.sql.Date]("date").toString -> r7(r.getAs[Double]("value")))
      .toSeq

  // fixture test_benchmark.py:234-268 (same closes as the backtest golden)
  private lazy val eodPrices: DataFrame = Seq(
    ("FI12345", "2018-05-01", 9.00), ("FI12345", "2018-05-02", 11.00),
    ("FI12345", "2018-05-03", 10.50), ("FI12345", "2018-05-04", 9.99),
    ("FI23456", "2018-05-01", 9.89), ("FI23456", "2018-05-02", 11.00),
    ("FI23456", "2018-05-03", 8.50), ("FI23456", "2018-05-04", 10.50))
    .toDF("sid", "date", "close").withColumn("date", to_date($"date"))

  // fixture test_benchmark.py:1297-1320 (close only, 2 times per day)
  private lazy val intradayPrices: DataFrame = Seq(
    ("FI12345", "2018-05-01", "09:30:00", 9.6),
    ("FI12345", "2018-05-01", "15:30:00", 10.45),
    ("FI12345", "2018-05-02", "09:30:00", 10.12),
    ("FI12345", "2018-05-02", "15:30:00", 15.45),
    ("FI12345", "2018-05-03", "09:30:00", 8.67),
    ("FI12345", "2018-05-03", "15:30:00", 12.30),
    ("FI23456", "2018-05-01", "09:30:00", 10.56),
    ("FI23456", "2018-05-01", "15:30:00", 12.01),
    ("FI23456", "2018-05-02", "09:30:00", 10.50),
    ("FI23456", "2018-05-02", "15:30:00", 9.80),
    ("FI23456", "2018-05-03", "09:30:00", 13.40),
    ("FI23456", "2018-05-03", "15:30:00", 14.50))
    .toDF("sid", "date", "time", "close").withColumn("date", to_date($"date"))

  private def dailyIntradayStrategy(
      bSid: Option[String] = None,
      bTime: Option[String] = None,
      bPrices: Option[DataFrame] = None): Strategy =
    new Strategy {
      val code = "short-above-10"
      override def positionsClosedDaily = true
      override def benchmarkSid: Option[String] = bSid
      override def benchmarkTime: Option[String] = bTime
      override def benchmarkPrices: Option[DataFrame] = bPrices
      def pricesToSignals(prices: DataFrame): DataFrame =
        prices.groupBy("sid", "date")
          .agg(max(when(col("time") === "09:30:00", col("close"))).as("close_0930"),
            max(when(col("time") === "15:30:00", col("close"))).as("close_1530"))
          .withColumn("signal", -(col("close_0930") > 10).cast("int"))
      override def signalsToTargetWeights(panel: DataFrame): DataFrame =
        panel.withColumn("weight", Weights.fixedWeights(col("signal"), 0.25))
      override def targetWeightsToPositions(panel: DataFrame): DataFrame =
        panel.withColumn("position", col("weight"))
      override def positionsToGrossReturns(panel: DataFrame): DataFrame =
        panel.withColumn("gross",
          (col("close_1530") - col("close_0930")) / col("close_0930") * col("position"))
    }

  test("in-panel EOD benchmark: ffill.pct_change.fillna(0) " +
    "(test_benchmark.py:216-341)") {
    val strategy = new Strategy {
      val code = "buy-below-10"
      override def benchmarkSid: Option[String] = Some("FI23456")
      def pricesToSignals(prices: DataFrame): DataFrame =
        prices.withColumn("signal", (col("close") < 10).cast("int"))
    }
    assert(benchmarkSeries(Backtest.run(strategy, eodPrices)) == Seq(
      "2018-05-01" -> 0.0, // fillna(0) on the first pct_change
      "2018-05-02" -> r7(11.0 / 9.89 - 1), // 0.1122346
      "2018-05-03" -> r7(8.50 / 11.0 - 1), // -0.2272727
      "2018-05-04" -> r7(10.50 / 8.50 - 1))) // 0.2352941
  }

  test("once-a-day intraday: BENCHMARK_TIME collapses to daily " +
    "(test_benchmark.py:1258-1392)") {
    val results = Backtest.run(
      dailyIntradayStrategy(bSid = Some("FI12345"), bTime = Some("15:30:00")),
      intradayPrices)
    assert(benchmarkSeries(results) == Seq(
      "2018-05-01" -> 0.0,
      "2018-05-02" -> 0.4784689, // 15.45/10.45 - 1
      "2018-05-03" -> -0.2038835)) // 12.30/15.45 - 1
  }

  test("BENCHMARK_DB: separate EOD source reindexed to the result dates " +
    "(test_benchmark.py:1394-1551)") {
    val benchDb = Seq(
      ("FI34567", "2018-05-01", 199.60),
      ("FI34567", "2018-05-02", 210.45),
      ("FI34567", "2018-05-03", 210.12))
      .toDF("sid", "date", "close").withColumn("date", to_date($"date"))
    val results = Backtest.run(
      dailyIntradayStrategy(bSid = Some("FI34567"), bPrices = Some(benchDb)),
      intradayPrices)
    assert(benchmarkSeries(results) == Seq(
      "2018-05-01" -> 0.0,
      "2018-05-02" -> 0.0543587, // 210.45/199.60 - 1
      "2018-05-03" -> -0.0015681)) // 210.12/210.45 - 1
  }

  test("continuous intraday: benchmark is the intraday series itself " +
    "(test_benchmark.py:1661-1780)") {
    val contPrices = Seq(
      ("FI12345", "2018-05-01", "10:00:00", 9.6), ("FI12345", "2018-05-01", "11:00:00", 10.45),
      ("FI12345", "2018-05-01", "12:00:00", 10.12), ("FI12345", "2018-05-02", "10:00:00", 15.45),
      ("FI12345", "2018-05-02", "11:00:00", 8.67), ("FI12345", "2018-05-02", "12:00:00", 12.30),
      ("FI23456", "2018-05-01", "10:00:00", 10.56), ("FI23456", "2018-05-01", "11:00:00", 12.01),
      ("FI23456", "2018-05-01", "12:00:00", 10.50), ("FI23456", "2018-05-02", "10:00:00", 9.80),
      ("FI23456", "2018-05-02", "11:00:00", 13.40), ("FI23456", "2018-05-02", "12:00:00", 7.50))
      .toDF("sid", "date", "time", "close").withColumn("date", to_date($"date"))
    val contStrategy = new Strategy {
      val code = "c-intraday"
      override def keys: Panel.Keys =
        Panel.Keys(sid = "sid", order = Seq("date", "time"), dateCol = "date")
      override def benchmarkSid: Option[String] = Some("FI23456")
      def pricesToSignals(prices: DataFrame): DataFrame =
        prices.withColumn("signal", (col("close") <= 10).cast("int"))
    }
    val bench = Backtest.run(contStrategy, contPrices)
      .where($"field" === "Benchmark")
      .orderBy("date", "time")
      .collect()
      .map(r => (r.getAs[java.sql.Date]("date").toString, r.getAs[String]("time")) ->
        r7(r.getAs[Double]("value")))
      .toSeq
    assert(bench == Seq(
      ("2018-05-01", "10:00:00") -> 0.0, // fillna(0)
      ("2018-05-01", "11:00:00") -> 0.1373106, // 12.01/10.56 − 1
      ("2018-05-01", "12:00:00") -> -0.1257286,
      ("2018-05-02", "10:00:00") -> -0.0666667, // overnight slot-to-slot
      ("2018-05-02", "11:00:00") -> 0.3673469,
      ("2018-05-02", "12:00:00") -> -0.4402985))
  }

  test("errors: benchmark sid absent from prices / BENCHMARK_DB raises " +
    "instead of a silent flat 0.0 series (base.py:1482-1485)") {
    val strategy = new Strategy {
      val code = "buy-below-10"
      override def benchmarkSid: Option[String] = Some("FI99999")
      def pricesToSignals(prices: DataFrame): DataFrame =
        prices.withColumn("signal", (col("close") < 10).cast("int"))
    }
    val e = intercept[GraftError] { Backtest.run(strategy, eodPrices) }
    assert(e.getMessage == "BENCHMARK Sid FI99999 is not in prices data")

    val benchDb = Seq(("FI34567", "2018-05-01", 199.60))
      .toDF("sid", "date", "close").withColumn("date", to_date($"date"))
    val e2 = intercept[GraftError] {
      Backtest.run(
        dailyIntradayStrategy(bSid = Some("FI00000"), bPrices = Some(benchDb)),
        intradayPrices)
    }
    assert(e2.getMessage == "BENCHMARK Sid FI00000 is not in BENCHMARK_DB data")
  }

  test("errors: BENCHMARK_TIME matching no bars raises (base.py:1497-1499)") {
    val e = intercept[GraftError] {
      Backtest.run(
        dailyIntradayStrategy(bSid = Some("FI12345"), bTime = Some("10:00:00")),
        intradayPrices)
    }
    assert(e.getMessage == "BENCHMARK_TIME 10:00:00 is not in prices data")
  }

  test("errors: no close field to extract the benchmark from " +
    "(base.py:1469-1477)") {
    val pricesNoClose = eodPrices.withColumnRenamed("close", "px")
    val strategy = new Strategy {
      val code = "no-close"
      override def benchmarkSid: Option[String] = Some("FI23456")
      def pricesToSignals(prices: DataFrame): DataFrame =
        prices.withColumn("signal", (col("px") < 10).cast("int"))
      override def positionsToGrossReturns(panel: DataFrame): DataFrame = {
        implicit val k: Panel.Keys = keys
        panel.withColumn("gross",
          Panel.pctChange(col("px")) * Panel.lagBySid(col("position")))
      }
    }
    val e = intercept[ParameterError] { Backtest.run(strategy, pricesNoClose) }
    assert(e.getMessage.contains("without one of close, open, bid, ask, high, low"))
  }

  test("errors: missing BENCHMARK_TIME; intraday BENCHMARK_DB " +
    "(test_benchmark.py:743-865, 987)") {
    val noTime = intercept[IllegalArgumentException] {
      Backtest.run(dailyIntradayStrategy(bSid = Some("FI12345")), intradayPrices)
        .count()
    }
    assert(noTime.getMessage.contains("no BENCHMARK_TIME specified"))

    val intradayDb = intercept[IllegalArgumentException] {
      Backtest.run(
        dailyIntradayStrategy(bSid = Some("FI12345"), bPrices = Some(intradayPrices)),
        intradayPrices).count()
    }
    assert(intradayDb.getMessage.contains("only end-of-day databases are supported"))
  }
}
