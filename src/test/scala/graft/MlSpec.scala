package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ml.{DecisionTreeModel, Features, ForestModel, GbtModel, LinearPredictor, MLStrategy, ModelPredictor, OpaquePredictor, PanelPredictor}
import graft.panel.Panel
import graft.pipeline.Backtest

class MlSpec extends SparkSpec {
  import spark.implicits._

  implicit val k: Panel.Keys = Panel.eod

  private lazy val prices = Seq(
    ("A", "2024-01-01", 100.0), ("A", "2024-01-02", 110.0),
    ("A", "2024-01-03", 99.0), ("A", "2024-01-04", 108.9),
    ("B", "2024-01-01", 50.0), ("B", "2024-01-02", 45.0),
    ("B", "2024-01-03", 49.5), ("B", "2024-01-04", 44.55))
    .toDF("sid", "date", "close").withColumn("date", to_date($"date"))

  test("laggedReturns + assemble build the feature array (M1)") {
    val (f, _) = (Features.laggedReturns(prices, Seq(1, 2)), ())
    val assembled = Features.assemble(f, Seq("return_1d", "return_2d"))
    val row = assembled.where($"sid" === "A" && $"date" === "2024-01-03")
      .select("features").head.getSeq[Double](0)
    assert(r7(row.head) == r7(99.0 / 110.0 - 1))
    assert(r7(row(1)) == r7(99.0 / 100.0 - 1))
    // warm-up rows: missing lags are zero-filled (ml.py:480)
    val first = assembled.where($"sid" === "A" && $"date" === "2024-01-01")
      .select("features").head.getSeq[Double](0)
    assert(first == Seq(0.0, 0.0))
  }

  test("LinearPredictor computes w·x + b; logistic squashes to (0,1) (M2)") {
    val df = Seq((Seq(1.0, 2.0))).toDF("features")
    val linear = LinearPredictor(Seq(0.5, -0.25), intercept = 1.0)
      .predict(df).select("prediction").head.getDouble(0)
    assert(linear == 1.0 + 0.5 - 0.5)
    val p = LinearPredictor(Seq(10.0, 0.0), logistic = true)
      .predict(df).select("prediction").head.getDouble(0)
    assert(p > 0.999 && p < 1.0)
  }

  test("ModelPredictor loads linear, logistic, and tree specs from JSON " +
    "(ml.py:211-225)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_models")
    def write(name: String, json: String): String = {
      val p = dir.resolve(name)
      java.nio.file.Files.writeString(p, json)
      p.toString
    }
    val lin = ModelPredictor.load(spark,
      write("lin.json", """{"modelType":"linear","weights":[0.5,-0.25],"intercept":1.0}"""))
    val df = Seq((Seq(1.0, 2.0))).toDF("features")
    assert(lin.predict(df).select("prediction").head.getDouble(0) == 1.0)

    val logit = ModelPredictor.load(spark,
      write("logit.json", """{"modelType":"logistic","weights":[10.0,0.0],"intercept":0.0}"""))
    val p = logit.predict(df).select("prediction").head.getDouble(0)
    assert(p > 0.999 && p < 1.0)

    val tree = ModelPredictor.load(spark, write("tree.json",
      """{"modelType":"tree","classes":[0,1],"nodes":[
        |{"feature":0,"threshold":0.5,"left":1,"right":2},
        |{"feature":-1,"threshold":0.0,"left":-1,"right":-1,"value":[1.0,0.0]},
        |{"feature":-1,"threshold":0.0,"left":-1,"right":-1,"value":[0.0,1.0]}]}"""
        .stripMargin.replace("\n", "")))
    val probas = tree.predict(Seq(Seq(0.0, 7.0), Seq(1.0, 7.0)).toDF("features"))
      .select("prediction").collect().map(_.getDouble(0)).toSeq
    assert(probas == Seq(0.0, 1.0)) // P(class=1) column, ml.py:494-509
  }

  test("regressor trees squeeze 1-wide leaf outputs; unknown shapes raise " +
    "(ml.py:491-509)") {
    def tree(values: Array[Array[Double]], classes: Seq[Long]) =
      OpaquePredictor(DecisionTreeModel(
        features = Array(0, -1, -1), thresholds = Array(0.5, 0.0, 0.0),
        lefts = Array(1, -1, -1), rights = Array(2, -1, -1),
        values = Array(Array.empty[Double]) ++ values, classes = classes))
    val df = Seq(Seq(0.0), Seq(1.0)).toDF("features")
    // regressor: leaves carry a single value → prediction is that value
    val reg = tree(Array(Array(1.25), Array(-2.5)), Seq.empty)
    assert(reg.predict(df).select("prediction").collect().map(_.getDouble(0)).toSeq
      == Seq(1.25, -2.5))
    // 3-class proba output → the reference's NotImplementedError shape
    val multi = tree(Array(Array(0.1, 0.2, 0.7), Array(0.7, 0.2, 0.1)), Seq(0L, 1L, 2L))
    val e = intercept[org.apache.spark.SparkException] {
      multi.predict(df).collect()
    }
    assert(e.getMessage.contains("Don't know what to do with predictions having shape (3,)")
      || Option(e.getCause).exists(_.getMessage.contains("shape (3,)")))
  }

  test("ForestModel normalizes each tree's leaf counts, then averages " +
    "(sklearn RandomForest predict_proba semantics)") {
    def stump(leftCounts: Array[Double], rightCounts: Array[Double]) =
      DecisionTreeModel(
        features = Array(0, -1, -1), thresholds = Array(0.5, 0.0, 0.0),
        lefts = Array(1, -1, -1), rights = Array(2, -1, -1),
        values = Array(Array.empty, leftCounts, rightCounts),
        classes = Seq(0L, 1L))
    val forest = ForestModel(Array(
      stump(Array(6.0, 2.0), Array(2.0, 6.0)),   // → P1 0.25 | 0.75
      stump(Array(2.0, 2.0), Array(1.0, 3.0))),  // → P1 0.5  | 0.75
      classes = Seq(0L, 1L))
    // x=0 routes left: mean(2/8, 2/4) = 0.375; x=1 right: mean(6/8, 3/4) = 0.75
    assert(forest.scores(Array(0.0)).toSeq == Seq(0.625, 0.375))
    assert(forest.scores(Array(1.0)).toSeq == Seq(0.25, 0.75))
    // already-normalized leaves are a fixpoint (probability leaves work too)
    val probForest = ForestModel(Array(
      stump(Array(1.0, 0.0), Array(0.0, 1.0)),
      stump(Array(1.0, 0.0), Array(0.0, 1.0))), classes = Seq(0L, 1L))
    assert(probForest.scores(Array(1.0)).toSeq == Seq(0.0, 1.0))
    // 1-wide leaves (regression forest): mean of raw leaf values
    val regForest = ForestModel(Array(
      stump(Array(1.0), Array(3.0)).copy(classes = Nil),
      stump(Array(2.0), Array(5.0)).copy(classes = Nil)), classes = Nil)
    assert(regForest.scores(Array(1.0)).toSeq == Seq(4.0))
  }

  test("ModelPredictor loads a forest spec; predict keeps P(class=1) " +
    "(test_ml.py:844 ensemble variant)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_forest_spec")
    val p = dir.resolve("forest.json")
    java.nio.file.Files.writeString(p,
      """{"modelType":"forest","classes":[0,1],"trees":[[
        |{"feature":0,"threshold":0.5,"left":1,"right":2},
        |{"feature":-1,"threshold":0.0,"left":-1,"right":-1,"value":[6,2]},
        |{"feature":-1,"threshold":0.0,"left":-1,"right":-1,"value":[2,6]}],[
        |{"feature":0,"threshold":0.5,"left":1,"right":2},
        |{"feature":-1,"threshold":0.0,"left":-1,"right":-1,"value":[2,2]},
        |{"feature":-1,"threshold":0.0,"left":-1,"right":-1,"value":[1,3]}]]}"""
        .stripMargin.replace("\n", ""))
    val forest = ModelPredictor.load(spark, p.toString)
    val probas = forest.predict(Seq(Seq(0.0), Seq(1.0)).toDF("features"))
      .select("prediction").collect().map(_.getDouble(0)).toSeq
    assert(probas == Seq(0.375, 0.75))
  }

  test("predict_proba golden: DecisionTreeML backtest (test_ml.py:844-1000)") {
    // fixture test_ml.py:874-897; model = perfectly-fit tree on close>10,
    // predict_proba → P(class=1); signals = proba < 0.5 (long below 10)
    val goldenPrices = Seq(
      ("FI12345", "2018-05-01", 9.00), ("FI12345", "2018-05-02", 11.00),
      ("FI12345", "2018-05-03", 10.50), ("FI12345", "2018-05-04", 9.99),
      ("FI23456", "2018-05-01", 9.89), ("FI23456", "2018-05-02", 11.00),
      ("FI23456", "2018-05-03", 8.50), ("FI23456", "2018-05-04", 10.50))
      .toDF("sid", "date", "close").withColumn("date", to_date($"date"))

    object DecisionTreeML extends MLStrategy {
      val code = "tree-ml"
      val predictor: PanelPredictor = OpaquePredictor(DecisionTreeModel(
        features = Array(0, -1, -1),
        thresholds = Array(0.5, 0.0, 0.0),
        lefts = Array(1, -1, -1),
        rights = Array(2, -1, -1),
        values = Array(Array.empty, Array(1.0, 0.0), Array(0.0, 1.0)),
        classes = Seq(0L, 1L)))
      def pricesToFeatures(prices: DataFrame): (DataFrame, Seq[String]) = {
        val f = prices
          .withColumn("feature1", ($"close" > 10).cast("double"))
          .withColumn("feature2", ($"close" > 10).cast("double"))
        (f, Seq("feature1", "feature2"))
      }
      def predictionsToSignals(panel: DataFrame): DataFrame =
        panel.withColumn("signal", ($"prediction" < 0.5).cast("int"))
    }

    val results = Backtest.run(DecisionTreeML, goldenPrices)
      .collect()
      .map(r => (r.getAs[String]("field"), r.getAs[String]("sid"),
        r.getAs[java.sql.Date]("date").toString) ->
        Option(r.getAs[Any]("value")).map(v => r7(v.asInstanceOf[Double])))
      .toMap
    val dates = Seq("2018-05-01", "2018-05-02", "2018-05-03", "2018-05-04")
    def series(f: String, sid: String) = dates.map(d => results((f, sid, d)))
    // test_ml.py:955-971
    assert(series("Signal", "FI12345") == Seq(Some(1.0), Some(0.0), Some(0.0), Some(1.0)))
    assert(series("Signal", "FI23456") == Seq(Some(1.0), Some(0.0), Some(1.0), Some(0.0)))
    // test_ml.py:973-989
    assert(series("Weight", "FI12345") == Seq(Some(0.5), Some(0.0), Some(0.0), Some(1.0)))
    assert(series("Weight", "FI23456") == Seq(Some(0.5), Some(0.0), Some(1.0), Some(0.0)))
  }

  test("LinearPredictor over an assembled feature array stays in compiled " +
    "codegen (element_at on an inlined CreateArray breaks Janino)") {
    // under the default FALLBACK mode a Janino failure silently degrades
    // the whole stage to interpreted row processing — force CODEGEN_ONLY
    // so a regression fails the suite instead of a benchmark
    val df = Seq(("A", 1.0, 2.0), ("B", 3.0, 4.0)).toDF("sid", "f1", "f2")
    val assembled = Features.assemble(df, Seq("f1", "f2"))
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val out = LinearPredictor(Seq(1.0, 10.0), intercept = 0.5)
        .predict(assembled)
        .select(sum($"prediction")).head
      assert(out.getDouble(0) == (0.5 + 1.0 + 20.0) + (0.5 + 3.0 + 40.0))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("MLStrategy runs end-to-end through the backtest pipeline (§3.3)") {
    object MomentumML extends MLStrategy {
      val code = "ml-momentum"
      val predictor: PanelPredictor = LinearPredictor(Seq(1.0), intercept = 0.0)
      def pricesToFeatures(prices: DataFrame): (DataFrame, Seq[String]) =
        (Features.laggedReturns(prices, Seq(1)), Seq("return_1d"))
      def predictionsToSignals(panel: DataFrame): DataFrame =
        panel.withColumn("signal", ($"prediction" > 0).cast("int"))
    }
    val results = Backtest.run(MomentumML, prices)
    assert(results.count() == 80) // 10 fields × 8 rows
    // signal on A/01-02 = 1 (return +10%), on B/01-02 = 0 (−10%)
    val sig = results.where($"field" === "Signal" && $"date" === "2024-01-02")
      .collect().map(r => r.getAs[String]("sid") -> r.getAs[Double]("value")).toMap
    assert(sig("A") == 1.0 && sig("B") == 0.0)
  }

  test("classificationMetrics: tie-aware AUC, accuracy, logloss, brier " +
    "goldens; one-class AUC null; non-binary label raises (ml4)") {
    val preds = Seq(
      (0.9, 1L), (0.9, 0L), (0.8, 1L), (0.3, 0L), (0.3, 1L), (0.1, 0L))
      .toDF("prediction", "label")
    val m = graft.ml.Evaluation.classificationMetrics(preds).head
    assert(m.getAs[Long]("n") == 6L && m.getAs[Long]("positives") == 3L)
    // pairs: 0.9→(tie ½ + 1 + 1), 0.8→2, 0.3→(tie ½ + 1) = 6 of 9
    assert(m.getAs[Double]("auc") == 0.666667)
    assert(m.getAs[Double]("accuracy") == 0.666667)
    // −[ln.9+ln.1+ln.8+ln.7+ln.3+ln.9]/6, micro-nat-quantized
    assert(m.getAs[Double]("logloss") == 0.716183)
    // [.01+.81+.04+.09+.49+.01]/6
    assert(m.getAs[Double]("brier") == 0.241667)

    val oneClass = Seq((0.9, 1L), (0.2, 1L)).toDF("prediction", "label")
    val o = graft.ml.Evaluation.classificationMetrics(oneClass).head
    assert(o.isNullAt(2) && o.getAs[Double]("accuracy") == 0.5)

    val bad = Seq((0.9, 2L)).toDF("prediction", "label")
    assertThrows[Exception] {
      graft.ml.Evaluation.classificationMetrics(bad).head
    }
  }

  test("calibrationBins: closed last edge, exact rates, micro-quantized " +
    "means; averagePrecision: ΔR·P over descending thresholds (ml5/ml6)") {
    val preds = Seq(
      (0.9, 1L), (0.9, 0L), (0.8, 1L), (0.3, 0L), (0.3, 1L), (0.1, 0L))
      .toDF("prediction", "label")
    val bins = graft.ml.Evaluation.calibrationBins(preds)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(bins(9L) == ((2L, 0.9, 0.5)))
    assert(bins(8L) == ((1L, 0.8, 1.0)))
    assert(bins(3L) == ((2L, 0.3, 0.5)))
    assert(bins(1L) == ((1L, 0.1, 0.0)))
    assert(bins.size == 4) // empty bins absent
    // score exactly 1.0 lands in the LAST bin, not a phantom bin 10
    val edge = Seq((1.0, 1L)).toDF("prediction", "label")
    assert(graft.ml.Evaluation.calibrationBins(edge)
      .head.getLong(0) == 9L)

    val ap = graft.ml.Evaluation.averagePrecision(preds).head
    // thresholds desc: P=(1/2, 2/3, 3/5, 3/6), ΔR=(1/3, 1/3, 1/3, 0)
    // → 1/6 + 2/9 + 1/5 = 0.588889
    assert(ap.getAs[Long]("n") == 6L && ap.getAs[Long]("positives") == 3L)
    assert(ap.getAs[Double]("average_precision") == 0.588889)
    // no positives → null, not 0
    val nopos = Seq((0.9, 0L), (0.1, 0L)).toDF("prediction", "label")
    assert(graft.ml.Evaluation.averagePrecision(nopos).head.isNullAt(2))
  }

  test("regressionMetrics: rmse/mae goldens, R² identity, constant " +
    "actuals → null R² (ml7)") {
    val preds = Seq((2.5, 2.0), (1.0, 2.0), (3.0, 4.0))
      .toDF("prediction", "label")
    val m = graft.ml.Evaluation.regressionMetrics(preds).head
    assert(m.getAs[Long]("n") == 3L)
    // mse = (0.25+1+1)/3; sst = 24 − 64/3; r2 = 1 − 2.25/(8/3)
    assert(m.getAs[Double]("rmse") == 0.866025)
    assert(m.getAs[Double]("mae") == 0.833333)
    assert(m.getAs[Double]("r2") == 0.15625)
    val const = Seq((1.0, 2.0), (2.0, 2.0)).toDF("prediction", "label")
    assert(graft.ml.Evaluation.regressionMetrics(const).head.isNullAt(3))
  }

  test("GbtModel: additive raw scores, sigmoid squash, leaf-width guard (ml10)") {
    def stump(left: Double, right: Double) =
      DecisionTreeModel(
        features = Array(0, -1, -1), thresholds = Array(0.5, 0.0, 0.0),
        lefts = Array(1, -1, -1), rights = Array(2, -1, -1),
        values = Array(Array.empty, Array(left), Array(right)),
        classes = Nil)
    // raw = 0.25 + 0.5·(t0 + t1): x=0 → 0.25+0.5·(0.5+0.25)=0.625
    val gbt = GbtModel(Array(stump(0.5, -0.75), stump(0.25, 0.875)),
      learningRate = 0.5, baseScore = 0.25)
    assert(gbt.scores(Array(0.0)).toSeq == Seq(0.625))
    assert(gbt.scores(Array(1.0)).toSeq == Seq(0.25 + 0.5 * (-0.75 + 0.875)))
    // logistic: sigmoid of the same raw score (predict_proba P(class=1))
    val cls = gbt.copy(logistic = true)
    assert(cls.scores(Array(0.0)).toSeq == Seq(1.0 / (1.0 + math.exp(-0.625))))
    // per-class count leaves are a forest shape, not a gbt shape — loud
    val wide = DecisionTreeModel(
      features = Array(-1), thresholds = Array(0.0),
      lefts = Array(-1), rights = Array(-1),
      values = Array(Array(1.0, 2.0)), classes = Seq(0L, 1L))
    intercept[IllegalArgumentException](GbtModel(Array(wide)))
  }

  test("ModelPredictor loads a gbt spec; defaults lr=1, base=0, raw output") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gbt_spec")
    val p = dir.resolve("gbt.json")
    java.nio.file.Files.writeString(p,
      """{"modelType":"gbt","trees":[[
        |{"feature":0,"threshold":0.5,"left":1,"right":2},
        |{"feature":-1,"threshold":0.0,"left":-1,"right":-1,"value":[1.5]},
        |{"feature":-1,"threshold":0.0,"left":-1,"right":-1,"value":[-2.0]}]]}"""
        .stripMargin.replace("\n", ""))
    val gbt = ModelPredictor.load(spark, p.toString)
    val raw = gbt.predict(Seq(Seq(0.0), Seq(1.0)).toDF("features"))
      .select("prediction").collect().map(_.getDouble(0)).toSeq
    assert(raw == Seq(1.5, -2.0))
    // logistic spec: P(class=1) through the sigmoid
    val p2 = dir.resolve("gbt_cls.json")
    java.nio.file.Files.writeString(p2,
      """{"modelType":"gbt","learningRate":2.0,"baseScore":1.0,"logistic":true,
        |"trees":[[{"feature":-1,"threshold":0.0,"left":-1,"right":-1,"value":[0.5]}]]}"""
        .stripMargin.replace("\n", ""))
    val cls = ModelPredictor.load(spark, p2.toString)
    val probas = cls.predict(Seq(Seq(0.0)).toDF("features"))
      .select("prediction").collect().map(_.getDouble(0)).toSeq
    assert(probas == Seq(1.0 / (1.0 + math.exp(-2.0))))
  }

  test("prCurve: cumulative operating points per distinct score; null " +
    "recall with no positives (ml11)") {
    val preds = Seq((0.9, 1L), (0.9, 0L), (0.5, 1L), (0.1, 0L))
      .toDF("prediction", "label")
    val out = graft.ml.Evaluation.prCurve(preds)
      .orderBy(col("threshold").desc)
      .select("threshold", "tp", "fp", "precision", "recall")
      .as[(Double, Long, Long, Double, Double)].collect()
    assert(out.toSeq == Seq(
      (0.9, 1L, 1L, 0.5, 0.5),
      (0.5, 2L, 1L, 0.666667, 1.0),
      (0.1, 2L, 2L, 0.5, 1.0)))
    val nopos = Seq((0.9, 0L), (0.1, 0L)).toDF("prediction", "label")
    val r = graft.ml.Evaluation.prCurve(nopos).orderBy(col("threshold").desc).head
    assert(r.getAs[Double]("precision") == 0.0 && r.isNullAt(4))
  }

  test("scalerFit/scalerTransform: exact moment goldens, z recovery, " +
    "degenerate std → null (ml12)") {
    val df = Seq((1.0, 5.0), (2.0, 5.0), (3.0, 5.0)).toDF("x", "c")
    val stats = graft.ml.Features.scalerFit(df, Seq("x", "c")).head
    assert(stats.getAs[Long]("n_x") == 3L)
    assert(stats.getAs[Double]("mean_x") == 2.0)
    assert(stats.getAs[Double]("std_x") == 1.0)
    assert(stats.getAs[Double]("std_c") == 0.0) // constant feature
    val z = graft.ml.Features.scalerTransform(df,
      graft.ml.Features.scalerFit(df, Seq("x", "c")), Seq("x", "c"))
      .orderBy("x").collect()
    assert(z.map(_.getAs[Double]("x_z")).toSeq == Seq(-1.0, 0.0, 1.0))
    // zero-std feature: null z, not ±Infinity
    assert(z.forall(_.isNullAt(z.head.fieldIndex("c_z"))))
    intercept[IllegalArgumentException](graft.ml.Features.scalerFit(df, Nil))
  }

  test("ksDrift: exact D over pooled distinct values, asymptotic p, " +
    "identical samples → 0 (ml13)") {
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val a = Seq(1.0, 2.0, 3.0).toDF("prediction")
    val b = Seq(3.0, 4.0).toDF("prediction")
    val s = graft.ml.Evaluation.ksDrift(a, b).head
    assert(s.getAs[Long]("n_a") == 3L && s.getAs[Long]("n_b") == 2L)
    // CDFs diverge most at v=2: |2/3 − 0/2| = 2/3
    assert(s.getAs[Double]("ks") == r6(2.0 / 3))
    val m = 3.0 * 2.0 / 5.0
    val d = 4.0 / 6.0 // max|ca·nb − cb·na| / (na·nb)
    assert(s.getAs[Double]("p_value") ==
      r6(math.min(1.0, 2.0 * math.exp(-2.0 * m * d * d))))
    // identical distributions: D = 0, p clamps to 1
    val same = graft.ml.Evaluation.ksDrift(a, a).head
    assert(same.getAs[Double]("ks") == 0.0)
    assert(same.getAs[Double]("p_value") == 1.0)
  }

  test("confusionAt: exact matrix, balanced accuracy, MCC; degenerate " +
    "marginal → null (ml20)") {
    val preds = Seq((0.9, 1L), (0.8, 0L), (0.3, 1L), (0.1, 0L))
      .toDF("prediction", "label")
    val s = graft.ml.Evaluation.confusionAt(preds).head
    assert((s.getAs[Long]("tp"), s.getAs[Long]("fp"),
      s.getAs[Long]("tn"), s.getAs[Long]("fn")) == ((1L, 1L, 1L, 1L)))
    assert(s.getAs[Double]("accuracy") == 0.5)
    assert(s.getAs[Double]("balanced_accuracy") == 0.5)
    assert(s.getAs[Double]("mcc") == 0.0)
    val perfect = Seq((0.9, 1L), (0.1, 0L)).toDF("prediction", "label")
    assert(graft.ml.Evaluation.confusionAt(perfect)
      .head.getAs[Double]("mcc") == 1.0)
    // one-class labels: TNR undefined → balanced/MCC null
    val onecls = Seq((0.9, 1L), (0.1, 1L)).toDF("prediction", "label")
    val o = graft.ml.Evaluation.confusionAt(onecls).head
    assert(o.isNullAt(o.fieldIndex("balanced_accuracy")))
    assert(o.isNullAt(o.fieldIndex("mcc")))
  }

  test("liftAtPercent: integer-exact k, whole-tie cut, lift over the " +
    "base rate (ml19)") {
    // 10 rows: scores 1.0(pos), .9(pos), .8(neg), then 7 at .1 (2 pos)
    val preds = (Seq((1.0, 1L), (0.9, 1L), (0.8, 0L)) ++
      Seq.fill(5)((0.1, 0L)) ++ Seq.fill(2)((0.1, 1L)))
      .toDF("prediction", "label")
    val s = graft.ml.Evaluation.liftAtPercent(preds, percent = 20).head
    // k = ceil(10·0.2) = 2; the cut lands exactly after score .9
    assert(s.getAs[Long]("n") == 10L && s.getAs[Long]("k") == 2L)
    assert(s.getAs[Long]("n_taken") == 2L && s.getAs[Long]("pos_taken") == 2L)
    assert(s.getAs[Double]("precision_at_k") == 1.0)
    assert(s.getAs[Double]("base_rate") == 0.4)
    assert(s.getAs[Double]("lift") == 2.5)
    // a tie straddling k: k = ceil(10·0.5) = 5 but the .1 block is
    // indivisible → the whole block (all 10 rows) is taken
    val t = graft.ml.Evaluation.liftAtPercent(preds, percent = 50).head
    assert(t.getAs[Long]("k") == 5L && t.getAs[Long]("n_taken") == 10L)
    intercept[graft.ParameterError](
      graft.ml.Evaluation.liftAtPercent(preds, percent = 0))
  }

  test("quantileLoss: pinball goldens — under-prediction costs τ, " +
    "over-prediction 1−τ (ml18)") {
    val preds = Seq((1.0, 2.0), (2.0, 2.0)).toDF("prediction", "label")
    val s = graft.ml.Evaluation.quantileLoss(preds).head
    assert(s.getAs[Long]("n") == 2L)
    // d = +1 and 0: mean losses τ/2 per tau
    assert(s.getAs[Double]("pinball_10") == 0.05)
    assert(s.getAs[Double]("pinball_50") == 0.25)
    assert(s.getAs[Double]("pinball_90") == 0.45)
    // over-prediction flips the weights: d = −1 costs 1−τ
    val over = Seq((3.0, 2.0)).toDF("prediction", "label")
    val o = graft.ml.Evaluation.quantileLoss(over).head
    assert(o.getAs[Double]("pinball_10") == 0.9)
    assert(o.getAs[Double]("pinball_90") == 0.1)
    intercept[graft.ParameterError](
      graft.ml.Evaluation.quantileLoss(preds, taus = Nil))
    intercept[graft.ParameterError](
      graft.ml.Evaluation.quantileLoss(preds, taus = Seq(1.0)))
  }

  test("bestThreshold: F1 argmax with lowest-threshold tiebreak " +
    "(ml17)") {
    // scores: 0.9 (pos), 0.7 (neg), 0.5 (pos), 0.3 (neg)
    // t=0.9: tp1 fp0 fn1 → F1 2/3 ; t=0.5: tp2 fp1 fn0 → F1 4/5 (best)
    val preds = Seq((0.9, 1L), (0.7, 0L), (0.5, 1L), (0.3, 0L))
      .toDF("prediction", "label")
    val s = graft.ml.Evaluation.bestThreshold(preds).head
    assert(s.getAs[Double]("threshold") == 0.5)
    assert(s.getAs[Long]("tp") == 2L && s.getAs[Long]("fp") == 1L &&
      s.getAs[Long]("fn") == 0L)
    assert(s.getAs[Double]("f1") == 0.8)
    // exact F1 tie: (tp,fp,fn) = (1,0,1) at 0.9 and (2,2,0) at 0.5
    // both give F1 = 2/3 → the LOWEST threshold wins
    val tied = Seq((0.9, 1L), (0.7, 0L), (0.6, 0L), (0.5, 1L))
      .toDF("prediction", "label")
    val f = graft.ml.Evaluation.bestThreshold(tied).head
    assert(f.getAs[Double]("threshold") == 0.5)
    assert(f.getAs[Double]("f1") == 0.666667)
  }

  test("expectedCalibrationError: bin-weighted |gap| golden; a " +
    "perfectly calibrated frame → 0 (ml15)") {
    // bin 1 (score .15): 4 rows, event rate .25, gap .1
    // bin 8 (score .85): 1 row, event rate 1, gap .15
    val preds = Seq(
      (0.15, 1L), (0.15, 0L), (0.15, 0L), (0.15, 0L), (0.85, 1L))
      .toDF("prediction", "label")
    val s = graft.ml.Evaluation.expectedCalibrationError(preds).head
    assert(s.getAs[Long]("n") == 5L && s.getAs[Long]("n_bins") == 2L)
    // (4·0.1 + 1·0.15) / 5 = 0.11
    assert(s.getAs[Double]("ece") == 0.11)
    val cal = Seq((0.5, 1L), (0.5, 0L)).toDF("prediction", "label")
    assert(graft.ml.Evaluation.expectedCalibrationError(cal)
      .head.getAs[Double]("ece") == 0.0)
  }

  test("brierDecomposition: Murphy identity holds exactly for bin-" +
    "constant forecasts; perfect hard forecasts zero everything but " +
    "resolution (ml22)") {
    // bin-constant scores → brier = rel − res + unc exactly
    val preds = Seq(
      (0.15, 1L), (0.15, 0L), (0.15, 0L), (0.15, 0L), (0.85, 1L))
      .toDF("prediction", "label")
    val s = graft.ml.Evaluation.brierDecomposition(preds).head
    val (b, rel, res, unc) = (s.getAs[Double]("brier"),
      s.getAs[Double]("reliability"), s.getAs[Double]("resolution"),
      s.getAs[Double]("uncertainty"))
    // brier = (0.85² + 3·0.15² + 0.15²)/5 = 0.1625
    assert(math.abs(b - 0.1625) < 1e-9)
    assert(math.abs(b - (rel - res + unc)) < 1e-6)
    // ȳ = 0.4 → unc = 0.24; rates .25/1 vs base .4 → res = (4·.0225+1·.36)/5
    assert(unc == 0.24)
    assert(math.abs(res - 0.09) < 1e-6)
    // oracle-style hard forecasts: reliability 0, resolution = unc
    val hard = Seq((0.0, 0L), (0.0, 0L), (1.0, 1L), (1.0, 1L))
      .toDF("prediction", "label")
    val h = graft.ml.Evaluation.brierDecomposition(hard).head
    assert(h.getAs[Double]("brier") == 0.0)
    assert(h.getAs[Double]("reliability") == 0.0)
    assert(h.getAs[Double]("resolution") == h.getAs[Double]("uncertainty"))
  }

  test("aucBySegment: each slice matches aucDelong on that slice; a " +
    "one-class segment yields null (ml28)") {
    val preds = Seq(
      // segment A: separable → AUC 1 ; segment B: tied case → 0.875
      ("A", 0.9, 1L), ("A", 0.8, 1L), ("A", 0.2, 0L), ("A", 0.1, 0L),
      ("B", 0.8, 1L), ("B", 0.5, 1L), ("B", 0.5, 0L), ("B", 0.3, 0L),
      ("C", 0.7, 1L), ("C", 0.6, 1L)) // positives only
      .toDF("seg", "prediction", "label")
    val out = graft.ml.Evaluation.aucBySegment(preds, "seg")
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"),
          Option(r.get(r.fieldIndex("auc")))))).toMap
    assert(out("A") == ((2L, 2L, Some(1.0))))
    assert(out("B") == ((2L, 2L, Some(0.875))))
    assert(out("C") == ((2L, 0L, None)))
  }

  test("gainsTable: value-tied deciles, cumulative capture reaches 1, " +
    "a perfect ranker captures everything in the top bucket (ml27)") {
    // 10 rows, distinct scores, positives at the top 3 scores
    val preds = (1 to 10).map(i => (i / 10.0, if (i >= 8) 1L else 0L))
      .toDF("prediction", "label")
    val out = graft.ml.Evaluation.gainsTable(preds)
      .collect().map(r => r.getAs[Long]("decile") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_pos"),
          r.getAs[Double]("cum_capture")))).toMap
    assert(out(1L) == ((1L, 1L, 0.333333))) // top decile: score 1.0, pos
    assert(out(3L)._3 == 1.0) // all 3 positives inside the top 3 deciles
    assert(out(10L)._3 == 1.0)
    assert(out.values.map(_._1).sum == 10L)
    // ties share a decile: 10 equal scores → ONE bucket (decile 10)
    val tied = (1 to 10).map(i => (0.5, if (i <= 2) 1L else 0L))
      .toDF("prediction", "label")
    val t = graft.ml.Evaluation.gainsTable(tied).collect()
    assert(t.length == 1 && t.head.getAs[Long]("decile") == 10L)
    assert(t.head.getAs[Double]("cum_capture") == 1.0)
  }

  test("costThreshold: heavy FN cost pushes the threshold DOWN relative " +
    "to best-F1; symmetric costs recover accuracy argmax (ml26)") {
    // scores .9/.7 positive-ish, .6/.5 mixed, .2 negative
    val preds = Seq(
      (0.9, 1L), (0.7, 1L), (0.6, 0L), (0.5, 1L), (0.2, 0L))
      .toDF("prediction", "label")
    // FN = −10: capture ALL positives → threshold 0.5 despite the FP
    val heavy = graft.ml.Evaluation.costThreshold(
      preds, uTp = 1.0, uFp = -1.0, uFn = -10.0, uTn = 0.0).head
    assert(heavy.getAs[Double]("threshold") == 0.5)
    assert(heavy.getAs[Long]("fn") == 0L && heavy.getAs[Long]("fp") == 1L)
    // utility = 3·1 + 1·(−1) = 2
    assert(heavy.getAs[Double]("utility") == 2.0)
    // FP = −10 flips it: stay precise at 0.7
    val precise = graft.ml.Evaluation.costThreshold(
      preds, uTp = 1.0, uFp = -10.0, uFn = 0.0, uTn = 0.0).head
    assert(precise.getAs[Double]("threshold") == 0.7)
    assert(precise.getAs[Long]("fp") == 0L && precise.getAs[Long]("tn") == 2L)
  }

  test("aucDelong: separable data → AUC 1 se 0; hand DeLong golden " +
    "with ties; tiny class → null se (ml23)") {
    // perfect separation: every pos above every neg
    val sep = Seq((0.9, 1L), (0.8, 1L), (0.2, 0L), (0.1, 0L))
      .toDF("prediction", "label")
    val s = graft.ml.Evaluation.aucDelong(sep).head
    assert(s.getAs[Long]("n_pos") == 2L && s.getAs[Long]("n_neg") == 2L)
    assert(s.getAs[Double]("auc") == 1.0 && s.getAs[Double]("se") == 0.0)
    assert(s.getAs[Double]("ci_lo") == 1.0 && s.getAs[Double]("ci_hi") == 1.0)
    // hand golden with a tie: pos {0.8, 0.5}, neg {0.5, 0.3}
    // V10(0.8) = 1, V10(0.5) = (1 + .5)/2 = .75 → AUC = .875
    // S10 = (1−.875)²+(.75−.875)² /1 = .03125 ; V01: (0+.5·1)/2=.25, 0 →
    // S01 = .03125 ; var = .03125/2·2 = .03125 → se = .176777
    val tied = Seq((0.8, 1L), (0.5, 1L), (0.5, 0L), (0.3, 0L))
      .toDF("prediction", "label")
    val t = graft.ml.Evaluation.aucDelong(tied).head
    assert(t.getAs[Double]("auc") == 0.875)
    assert(math.abs(t.getAs[Double]("se") - 0.176777) < 1e-6)
    assert(math.abs(t.getAs[Double]("ci_lo") -
      math.max(0, 0.875 - 1.959964 * 0.17677669529663687)) < 1e-5)
    // one positive: DeLong variance undefined → null se, null CI
    val one = Seq((0.8, 1L), (0.5, 0L), (0.3, 0L)).toDF("prediction", "label")
    val o = graft.ml.Evaluation.aucDelong(one).head
    assert(o.isNullAt(o.fieldIndex("se")))
  }

  test("cohenKappa: exact-integer chance correction; constant raters " +
    "→ null; null labels dropped (ml16)") {
    // confusion: a=1∩b=1: 2, a=0∩b=0: 1, a=1∩b=0: 1 → po = 3/4
    // marginals a: 3/1 ; b: 2/2 → pe·16 = 3·2 + 1·2 = 8 → pe = 1/2
    val df = Seq(
      (1L, 1L), (1L, 1L), (1L, 0L), (0L, 0L))
      .toDF("label", "label2")
    val s = graft.ml.Evaluation.cohenKappa(df).head
    assert(s.getAs[Long]("n") == 4L && s.getAs[Long]("agree") == 3L)
    // κ = (po − pe)/(1 − pe) = (3/4 − 1/2)/(1/2) = 0.5
    assert(s.getAs[Double]("kappa") == 0.5)
    // both raters constant: denominator 0 → null
    val const = Seq((1L, 1L), (1L, 1L)).toDF("label", "label2")
    val c = graft.ml.Evaluation.cohenKappa(const).head
    assert(c.isNullAt(c.fieldIndex("kappa")))
    // null rows dropped before counting
    val withNull = Seq(
      (Some(1L), Some(1L)), (Some(1L), None), (None, Some(0L)))
      .toDF("label", "label2")
    assert(graft.ml.Evaluation.cohenKappa(withNull).head.getAs[Long]("n") == 1L)
  }

  test("psiDrift: per-bin contributions with ε-floored empty sides; " +
    "identical distributions → 0 (ml14)") {
    val e = Seq(0.05, 0.15, 0.15, 0.95).toDF("prediction")
    val a = Seq(0.05, 0.85, 0.85, 0.95).toDF("prediction")
    val rows = graft.ml.Evaluation.psiDrift(e, a)
      .collect().map(r => r.getAs[Long]("bin") -> r).toMap
    assert(rows.keySet == Set(0L, 1L, 8L, 9L))
    // bin 1: expected-only (2/4 vs ε) ; bin 8 is its mirror
    assert(rows(1L).getAs[Long]("n_expected") == 2L &&
      rows(1L).getAs[Long]("n_actual") == 0L)
    val c1 = (1e-6 - 0.5) * math.log(1e-6 / 0.5)
    assert(math.abs(rows(1L).getAs[Double]("contribution") - c1) < 1e-5)
    assert(math.abs(rows(8L).getAs[Double]("contribution") - c1) < 1e-5)
    // matched bins contribute 0; the total is the two floored bins
    assert(rows(0L).getAs[Double]("contribution") == 0.0)
    val psi = rows(0L).getAs[Double]("psi")
    assert(rows.values.forall(_.getAs[Double]("psi") == psi))
    assert(math.abs(psi - 2 * c1) < 1e-5)
    // identical frames: every contribution and the total are exactly 0
    val same = graft.ml.Evaluation.psiDrift(e, e).collect()
    assert(same.forall(_.getAs[Double]("psi") == 0.0))
    intercept[graft.ParameterError](graft.ml.Evaluation.psiDrift(e, a, bins = 0))
    intercept[graft.ParameterError](
      graft.ml.Evaluation.psiDrift(e, a, lo = 1.0, hi = 0.0))
  }

  test("clusterAgreement: perfect match scores 1/1, a plain-Scala ARI " +
    "replication matches, degenerate partitions go null") {
    import spark.implicits._
    val perfect = Seq((0, "a"), (0, "a"), (1, "b"), (1, "b"), (2, "c"))
      .toDF("cl", "lb")
    val p = graft.ml.Evaluation.clusterAgreement(perfect, "cl", "lb").head()
    assert(p.getAs[Double]("ari") == 1.0 && p.getAs[Double]("nmi") == 1.0)

    // sklearn's classic: labels 0011, clusters 0012
    val mixed = Seq((0, "x"), (0, "x"), (1, "y"), (2, "y")).toDF("cl", "lb")
    val m = graft.ml.Evaluation.clusterAgreement(mixed, "cl", "lb").head()
    // plain-Scala replication of Hubert-Arabie
    val cont = Map((0, "x") -> 2L, (1, "y") -> 1L, (2, "y") -> 1L)
    def c2(x: Long) = x * (x - 1) / 2.0
    val sij = cont.values.map(c2).sum
    val sa = cont.groupBy(_._1._1).values.map(v => c2(v.values.sum)).sum
    val sb = cont.groupBy(_._1._2).values.map(v => c2(v.values.sum)).sum
    val e = sa * sb / c2(4)
    val ari = (sij - e) / ((sa + sb) / 2 - e)
    assert(math.abs(m.getAs[Double]("ari") - ari) < 1e-6) // 6dp output
    assert(m.getAs[Long]("n") == 4 && m.getAs[Long]("n_clusters") == 3)

    // one cluster, several labels: ARI 0 (chance), NMI undefined
    val one = Seq((7, "a"), (7, "b"), (7, "b")).toDF("cl", "lb")
    val o = graft.ml.Evaluation.clusterAgreement(one, "cl", "lb").head()
    assert(o.getAs[Double]("ari") == 0.0 && o.isNullAt(4))
    // fully degenerate: both sides constant → both null
    val const = Seq((1, "z"), (1, "z")).toDF("cl", "lb")
    val k = graft.ml.Evaluation.clusterAgreement(const, "cl", "lb").head()
    assert(k.isNullAt(3) && k.isNullAt(4))
  }
}
