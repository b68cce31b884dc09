package graft

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ml.{Features, LinearPredictor, MLStrategy, PanelPredictor}
import graft.sources.Sources
import graft.sources.Sources.ResultCache
import graft.pipeline.Backtest

/** S7/M4 result cache: hit, miss, dependency-mtime invalidation, and the
  * backtest `noCache` bypass (reference _cache.py:59-184, base.py:1258-1279,
  * ml.py:426-433).
  */
class CacheSpec extends SparkSpec {
  import spark.implicits._

  private def newCache(): (ResultCache, String) = {
    val dir = Files.createTempDirectory("graft_cache").toString
    (new ResultCache(spark, dir), dir)
  }

  private def df(v: Double): DataFrame =
    Seq(("A", v)).toDF("sid", "x")

  test("hit: second call serves the cached parquet, compute runs once") {
    val (cache, _) = newCache()
    var computes = 0
    def get() = cache.getOrCompute("k1") { computes += 1; df(1.0) }
    assert(get().collect().map(_.getDouble(1)).toSeq == Seq(1.0))
    assert(get().collect().map(_.getDouble(1)).toSeq == Seq(1.0))
    assert(computes == 1)
  }

  test("miss: a different key recomputes") {
    val (cache, _) = newCache()
    var computes = 0
    cache.getOrCompute("k1") { computes += 1; df(1.0) }.collect()
    cache.getOrCompute("k2") { computes += 1; df(2.0) }.collect()
    assert(computes == 2)
  }

  test("invalidation: a dependency modified after caching recomputes") {
    val (cache, _) = newCache()
    val dep = Files.createTempFile("graft_dep", ".txt")
    var computes = 0
    def get() = cache.getOrCompute("k1", dependsOn = Seq(dep.toString)) {
      computes += 1; df(computes.toDouble)
    }
    assert(get().head.getDouble(1) == 1.0)
    assert(get().head.getDouble(1) == 1.0) // still fresh
    // touch the dependency into the future → stale
    Files.setLastModifiedTime(dep,
      FileTime.fromMillis(System.currentTimeMillis() + 60000))
    assert(get().head.getDouble(1) == 2.0)
    assert(computes == 2)
  }

  test("cachedPrices: open-ended query depends on the source mtime; " +
    "noCache bypasses (base.py:1258-1279)") {
    val (cache, _) = newCache()
    val src = Files.createTempDirectory("graft_prices")
    Seq(("A", "2024-01-01", 10.0)).toDF("sid", "date", "close")
      .write.mode("overwrite").parquet(src.toString)
    val q = Sources.PriceQuery() // no endDate → open-ended
    assert(Sources.cachedPrices(spark, src.toString, q, cache).count() == 1)
    // append new data, bump the dir mtime past the cache write
    Seq(("B", "2024-01-02", 11.0)).toDF("sid", "date", "close")
      .write.mode("append").parquet(src.toString)
    Files.setLastModifiedTime(src,
      FileTime.fromMillis(System.currentTimeMillis() + 60000))
    // open-ended query sees the new data (cache invalidated)
    assert(Sources.cachedPrices(spark, src.toString, q, cache).count() == 2)
    // noCache always re-reads the source directly
    assert(Sources.cachedPrices(spark, src.toString, q, cache, noCache = true)
      .count() == 2)
  }

  test("interrupted write recovery: a marker-less cache dir is replaced " +
    "atomically, and no .tmp dirs are left behind") {
    val (cache, dir) = newCache()
    cache.getOrCompute("k1")(df(1.0)).collect()
    // simulate a crash mid-write under the OLD non-atomic scheme: a cache
    // entry directory with data but no _SUCCESS marker
    val entry = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(p => !Paths.get(p).getFileName.toString.startsWith(".tmp-")).head
    Files.deleteIfExists(Paths.get(entry, "_SUCCESS"))
    var computes = 0
    val recovered = cache.getOrCompute("k1") { computes += 1; df(2.0) }
    assert(recovered.head.getDouble(1) == 2.0) // stale wreckage not served
    assert(computes == 1)
    assert(Files.exists(Paths.get(entry, "_SUCCESS"))) // entry republished
    // subsequent call hits the repaired entry
    assert(cache.getOrCompute("k1") { computes += 1; df(3.0) }
      .head.getDouble(1) == 2.0)
    assert(computes == 1)
    // the atomic-publish temp dirs are renamed away, never accumulated
    val leftovers = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(p => Paths.get(p).getFileName.toString.startsWith(".tmp-"))
    assert(leftovers.isEmpty)
  }

  test("MLStrategy feature cache: hit across backtests, noCache bypass " +
    "(ml.py:426-433)") {
    val (cache, _) = newCache()
    var featureBuilds = 0
    object CachedML extends MLStrategy {
      val code = "cached-ml"
      val predictor: PanelPredictor = LinearPredictor(Seq(1.0))
      override def featureCache: Option[ResultCache] = Some(cache)
      def pricesToFeatures(prices: DataFrame): (DataFrame, Seq[String]) = {
        featureBuilds += 1
        (prices.withColumn("f", col("close") * 2), Seq("f"))
      }
      def predictionsToSignals(panel: DataFrame): DataFrame =
        panel.withColumn("signal", (col("prediction") > 0).cast("int"))
    }
    val prices = Seq(
      ("A", "2024-01-01", 1.0), ("A", "2024-01-02", 2.0))
      .toDF("sid", "date", "close").withColumn("date", to_date($"date"))
    assert(Backtest.run(CachedML, prices).count() == 20)
    assert(Backtest.run(CachedML, prices).count() == 20)
    assert(featureBuilds == 1) // second run hits the cache
    Backtest.run(CachedML, prices, cfg = Backtest.Config(noCache = true)).count()
    assert(featureBuilds == 2) // no_cache bypasses (and refreshes)
  }
}
