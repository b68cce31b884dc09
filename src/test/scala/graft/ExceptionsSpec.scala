package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.panel.Panel
import graft.pipeline.{Backtest, Strategy}
import graft.trade.Trade

/** Typed error hierarchy — reference exceptions.py:15-18. Migrating
  * callers catch `ParameterError` (misconfiguration) and `GraftError`
  * (data-dependent runtime failures) distinctly, exactly as they caught
  * `MoonshotParameterError` / `MoonshotError`; messages are unchanged
  * from the previously-asserted texts. */
class ExceptionsSpec extends SparkSpec {
  import spark.implicits._

  implicit val k: Panel.Keys = Panel.eod

  private lazy val prices = Seq(
    ("A", "2024-01-01", 100.0), ("A", "2024-01-02", 110.0))
    .toDF("sid", "date", "close").withColumn("date", to_date($"date"))

  test("stale prices raise GraftError (base.py:782 MoonshotError), " +
    "catchable as the base type but NOT a ParameterError") {
    val e = intercept[GraftError] {
      Trade.requireFresh(prices, "2024-02-01")
    }
    assert(e.getMessage.contains("is the underlying data up-to-date?"))
    assert(!e.isInstanceOf[ParameterError])
    // legacy catch sites keep working: GraftError IS an IllegalArgumentException
    assert(e.isInstanceOf[IllegalArgumentException])
  }

  test("reserved save-to-results name raises ParameterError " +
    "(base.py:1563 MoonshotParameterError)") {
    object BadCustom extends Strategy {
      val code = "bad-custom"
      override def customFields: Seq[(String, org.apache.spark.sql.Column)] =
        Seq("Weight" -> col("close"))
      def pricesToSignals(p: DataFrame): DataFrame =
        p.withColumn("signal", lit(1))
    }
    val e = intercept[ParameterError] {
      Backtest.run(BadCustom, prices)
    }
    assert(e.getMessage.contains("reserved name"))
    // ParameterError extends GraftError, mirroring the reference hierarchy
    assert(e.isInstanceOf[GraftError])
  }

  test("LLM-pipeline operator misconfiguration raises ParameterError: " +
    "kmeans k, DSIR buckets, budget-selection buckets, sample rates") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    val vecs = Seq((1L, Seq(1f, 2f))).toDF("vec_id", "embedding")
    import graft.text.{LangModel, Sampling}
    import graft.sim.Similarity
    intercept[ParameterError](Similarity.kmeansCentroids(vecs, k = 0))
    intercept[ParameterError](Similarity.kmeansCentroids(vecs, k = 2, iters = -1))
    intercept[ParameterError](LangModel.dsirLogWeights(docs, docs, docs, buckets = 0))
    intercept[ParameterError](Sampling.selectByTokenBudget(
      docs, "doc_id", lit(0.5), lit(1L), budget = 10, buckets = 0))
    intercept[ParameterError](Sampling.sampleByHash(docs, "doc_id", 1.5))
  }

  test("unknown modelType raises ParameterError (ml.py:216 family)") {
    val p = java.nio.file.Files.createTempFile("graft_badmodel", ".json")
    java.nio.file.Files.writeString(p, """{"modelType":"keras"}""")
    val e = intercept[ParameterError] {
      graft.ml.ModelPredictor.load(spark, p.toString)
    }
    assert(e.getMessage.contains("unknown modelType"))
  }
}
