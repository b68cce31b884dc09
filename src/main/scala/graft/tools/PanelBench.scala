package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{Backtest, Strategy}

/** Backtest-pipeline scale bench (BASELINE.md): deterministic synthetic
  * panels of N sids × T days through the full default §3.1 pipeline.
  * Panel generated distributed (spark.range cross join) — no driver
  * materialization; closes are a deterministic function of (sid, day).
  */
object PanelBench {
  object Momentum extends Strategy {
    val code = "bench"
    def pricesToSignals(prices: DataFrame): DataFrame =
      prices.withColumn("signal", (col("close") % 7 < 3).cast("int"))
  }

  def panel(spark: SparkSession, sids: Int, days: Int): DataFrame = {
    val s = spark.range(sids).select(col("id").as("sidn"))
    val d = spark.range(days).select(col("id").as("dayn"))
    s.crossJoin(d)
      .select(
        concat(lit("S"), col("sidn")).as("sid"),
        date_add(lit(java.sql.Date.valueOf("2015-01-01")), col("dayn").cast("int")).as("date"),
        // deterministic pseudo-price in [10, 110)
        (pmod(col("sidn") * 31 + col("dayn") * 17, lit(100)) + 10.0).as("close"))
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // args: pairs of sids days (e.g. "10000 10000" = 100 M bars)
    val shapes =
      if (args.nonEmpty) {
        require(args.length % 2 == 0 && args.forall(_.matches("\\d+")),
          s"usage: PanelBench [<sids> <days>]... — got: ${args.mkString(" ")}")
        args.toSeq.map(_.toInt).grouped(2).map(p => (p(0), p(1))).toSeq
      } else Seq((1000, 1000), (10000, 2500))
    shapes.foreach { case (sids, days) =>
      val p = panel(spark, sids, days)
      // warm the generation path
      p.count()
      val t0 = System.nanoTime()
      val n = Backtest.run(Momentum, p).count()
      val secs = (System.nanoTime() - t0) / 1e9
      val rows = sids.toLong * days
      println(f"[panelbench] ${sids}sids x ${days}d (${rows / 1000000.0}%.1fM bars) -> " +
        f"$n results rows in $secs%.1f s (${rows / secs / 1e6}%.1f M bars/s)")

      // signal-eval family at the same scale: Spearman IC (two rank
      // windows + one hash agg) and the Fama-MacBeth Cramer pass (one
      // hash agg of nine exact moments) — both should track the scan,
      // not add join/sort cliffs
      implicit val k: graft.panel.Panel.Keys = graft.panel.Panel.eod
      val withFwd = graft.perf.Signals.withForwardReturn(p, horizon = 1)
      val t1 = System.nanoTime()
      val icN = graft.perf.Signals
        .infoCoefficient(withFwd, col("close"), col("fwd_return")).count()
      val icSecs = (System.nanoTime() - t1) / 1e9
      println(f"[panelbench] ic over ${rows / 1000000.0}%.1fM bars -> " +
        f"$icN dates in $icSecs%.1f s (${rows / icSecs / 1e6}%.1f M bars/s)")
      val fmIn = withFwd
        .withColumn("mom", col("close") / lag(col("close"), 1).over(k.bySid) - 1)
        .withColumn("lvl", col("close") / 100.0)
      val t2 = System.nanoTime()
      val fmN = graft.perf.FactorModel.crossSectionalRegression(
        fmIn, col("fwd_return"), col("mom"), col("lvl")).count()
      val fmSecs = (System.nanoTime() - t2) / 1e9
      println(f"[panelbench] fama-macbeth over ${rows / 1000000.0}%.1fM bars -> " +
        f"$fmN dates in $fmSecs%.1f s (${rows / fmSecs / 1e6}%.1f M bars/s)")

      // Hurst at full width (per-sid windows + bounded explode) and the
      // cointegration screen over a 10-sid book carved from the same
      // panel (the book is bounded by contract; the cost is the scan)
      val t3 = System.nanoTime()
      val hN = graft.panel.Panel.hurstExponent(p).count()
      val hSecs = (System.nanoTime() - t3) / 1e9
      println(f"[panelbench] hurst over ${rows / 1000000.0}%.1fM bars -> " +
        f"$hN sids in $hSecs%.1f s (${rows / hSecs / 1e6}%.1f M bars/s)")
      val book = (0 until 10).map(i => s"S$i")
      val t4 = System.nanoTime()
      val cN = graft.panel.Panel
        .cointegrationScreen(p, col("close"), book).count()
      val cSecs = (System.nanoTime() - t4) / 1e9
      println(f"[panelbench] coint 10-sid book over ${rows / 1000000.0}%.1fM bars -> " +
        f"$cN pairs in $cSecs%.1f s")
    }
    spark.stop()
  }
}
