package graft

import org.apache.spark.sql.functions._

import graft.text.Classifier

/** Hashed n-gram NB classifier: count-model exactness, argmax/margin
  * semantics, featureless-doc handling, and the broadcast scoring plan. */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private lazy val labeled = Seq(
    ("hq", "clean well written prose about science and method"),
    ("hq", "careful prose about science method and evidence"),
    ("lq", "buy now click here buy now win win"),
    ("lq", "click here now win money buy click"))
    .toDF("label", "text")

  test("nbModel counts hashed unigram+bigram occurrences per label") {
    val m = Classifier.nbModel(labeled, buckets = 1 << 20)
    // "hq" docs: 8 + 7 words → 15 unigrams + 7 + 6 bigrams = 28 features
    val perLabel = m.groupBy("label").agg(sum("cnt").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perLabel("hq") == 28)
    assert(perLabel("lq") == 28)
    // a repeated feature counts multiplicatively ("buy now" twice in doc 3)
    assert(m.where($"cnt" > 1).count() > 0)
  }

  test("nbClassify predicts the label whose features dominate; margin > 0") {
    val docs = Seq(
      (1L, "prose about science and careful evidence"),
      (2L, "click here to win money now"))
      .toDF("doc_id", "text")
    val out = Classifier.nbClassify(docs, labeled, buckets = 1 << 20)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(3))).toMap
    assert(out(1L)._1 == "hq")
    assert(out(2L)._1 == "lq")
    assert(out.values.forall(_._2 > 0.0), s"margins must be positive: $out")
  }

  test("docs with no normalized words are dropped, not scored") {
    val docs = Seq((1L, "science method"), (2L, ""), (3L, "!!! ???"))
      .toDF("doc_id", "text")
    val out = Classifier.nbClassify(docs, labeled, buckets = 256)
    assert(out.select("doc_id").as[Long].collect().toSet == Set(1L))
  }

  test("single-label training: margin is exactly 0.0 (no runner-up)") {
    val one = labeled.where($"label" === "hq")
    val out = Classifier.nbClassify(
      Seq((1L, "anything at all")).toDF("doc_id", "text"), one, buckets = 256)
      .collect()
    assert(out.length == 1)
    assert(out.head.getString(1) == "hq")
    assert(out.head.getDouble(3) == 0.0)
  }

  test("scoring joins broadcast (the model is bounded by construction)") {
    val docs = Seq((1L, "science method"), (2L, "click money"))
      .toDF("doc_id", "text")
    val out = Classifier.nbClassify(docs, labeled, buckets = 256)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("buckets must be positive") {
    intercept[ParameterError] {
      Classifier.nbModel(labeled, buckets = 0)
    }
  }

  // ---- logistic regression ----

  private val lrData = Seq(
    (1L, 1L, "good great fine"),
    (2L, 1L, "good nice work"),
    (3L, 0L, "bad awful mess"),
    (4L, 0L, "bad poor junk"),
    (5L, 1L, "great good solid"),
    (6L, 0L, "awful bad broken"))

  /** The engine's feature map, replicated driver-side: unigram+bigram
    * buckets (md5-prefix hash) plus the bias pseudo-bucket. */
  private def denseFeats(text: String, buckets: Int): Map[Long, Long] = {
    import graft.functions.MinHashShingles.shingleStrings
    val fs = (shingleStrings(text, 1) ++ shingleStrings(text, 2))
      .filter(_.nonEmpty)
      .map(s => java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(s).substring(0, 8),
        16) % buckets)
    fs.groupBy(identity).map { case (b, xs) => b -> xs.length.toLong } +
      (Classifier.BiasBucket -> 1L)
  }

  private def halfUp(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("logregTrain matches an independently-computed dense GD exactly") {
    val buckets = 64; val iters = 3; val lr = 0.5
    val df = lrData.toDF("doc_id", "label", "text")
    val model = Classifier.logregTrain(
      df, buckets = buckets, iterations = iters, learningRate = lr)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // dense driver-side replication of the same micro-quantized GD
    val docs = lrData.map { case (_, y, text) => (y, denseFeats(text, buckets)) }
    val n = docs.length.toDouble
    var w = Map.empty[Long, Long] // micro weights
    for (_ <- 1 to iters) {
      val resid = docs.map { case (y, f) =>
        val zm = f.map { case (b, x) => w.getOrElse(b, 0L) * x }.sum
        val p = 1.0 / (1.0 + math.exp(-(zm.toDouble / 1e6)))
        (halfUp((p - y) * 1e6), f)
      }
      val grad = resid.flatMap { case (rm, f) =>
        f.map { case (b, x) => b -> rm * x }
      }.groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).sum }
      w = (w.keySet ++ grad.keySet).map { b =>
        b -> (w.getOrElse(b, 0L) -
          halfUp(lr * (grad.getOrElse(b, 0L).toDouble / n +
            0.0 * w.getOrElse(b, 0L).toDouble / 1e6)))
      }.toMap
    }
    val expect = w.map { case (b, wm) => b -> wm / 1e6 }
    assert(model == expect)
    // discriminative sanity: "good" buckets positive, "bad" negative
    def b(s: String): Long = denseFeats(s, buckets).keys.filter(_ >= 0).head
    assert(model(b("good")) > 0 && model(b("bad")) < 0)
  }

  test("logregScore: exact sigmoid of the micro logit; bias-only docs " +
    "still score") {
    val buckets = 64
    val df = lrData.toDF("doc_id", "label", "text")
    val model = Classifier.logregTrain(df, buckets = buckets, iterations = 2)
    val docs = Seq((10L, "good great"), (11L, "bad awful"), (12L, "???"))
      .toDF("doc_id", "text")
    val p = Classifier.logregScore(docs, model, buckets = buckets)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(p.keySet == Set(10L, 11L, 12L)) // wordless doc scored via bias
    assert(p(10L) > 0.5 && p(11L) < 0.5)
    // exact: replicate doc 10's logit from the model frame
    val wm = model.collect()
      .map(r => r.getLong(0) -> math.round(r.getDouble(1) * 1e6)).toMap
    val zm = denseFeats("good great", buckets)
      .map { case (b, x) => wm.getOrElse(b, 0L) * x }.sum
    val expect = BigDecimal(1.0 / (1.0 + math.exp(-(zm.toDouble / 1e6))))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(p(10L) == expect)
  }

  test("logregTrain parameter validation") {
    val df = lrData.toDF("doc_id", "label", "text")
    intercept[ParameterError] { Classifier.logregTrain(df, iterations = 0) }
    intercept[ParameterError] { Classifier.logregTrain(df, learningRate = 0.0) }
    intercept[ParameterError] {
      Classifier.logregTrain(df.where(lit(false))).collect()
    }
  }

  test("nbSourceAblation: full row has delta 0; removing a label's " +
    "only source hurts; n_train shrinks by the ablated mass") {
    import spark.implicits._
    // sA carries all 'en' docs, sB all 'fr' docs — distinctive words
    val docs = (0 until 40).map { i =>
      if (i % 2 == 0) (i.toLong, "hello world common text", "en", "sA")
      else (i.toLong, "bonjour monde texte commune", "fr", "sB")
    }.toDF("doc_id", "text", "lang", "source")
    val r = Classifier.nbSourceAblation(docs, "lang", Seq("sA", "sB"))
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(3), x.getDouble(4), x.getDouble(5))).toMap
    val (fullTrain, _, fullAcc, fullDelta) = r("(none)")
    assert(fullDelta == 0.0)
    assert(fullAcc == 1.0) // perfectly separable vocabulary
    // each ablation removes that source's pool docs from training
    assert(r("sA")._1 < fullTrain && r("sB")._1 < fullTrain)
    assert(r("sA")._1 + r("sB")._1 == fullTrain)
    // a model that never saw a label misclassifies that label's
    // holdout docs: both ablations lose accuracy
    assert(r("sA")._4 < 0.0 && r("sB")._4 < 0.0)
    intercept[IllegalArgumentException] {
      Classifier.nbSourceAblation(docs, "lang", Nil)
    }
  }

  test("nbMcNemar: disagreements counted per holdout doc; statistic " +
    "is (b-c)^2/(b+c); never-disagreeing models yield null") {
    import spark.implicits._
    val docs = (0 until 40).map { i =>
      if (i % 2 == 0) (i.toLong, "hello world common text", "en", "sA")
      else (i.toLong, "bonjour monde texte commune", "fr", "sB")
    }.toDF("doc_id", "text", "lang", "source")
    // removing sB blinds the model to 'fr': it loses exactly the fr
    // holdout docs the full model gets right → c = 0
    val r = Classifier.nbMcNemar(docs, "lang", excludeSource = "sB").head()
    val b = r.getAs[Long]("b"); val c = r.getAs[Long]("c")
    assert(b > 0 && c == 0)
    assert(math.abs(r.getAs[Double]("chisq") -
      (b - c).toDouble * (b - c) / (b + c)) < 1e-9)
    // excluding a source with no training mass changes nothing → null
    val same = Classifier.nbMcNemar(docs, "lang", excludeSource = "zzz")
      .head()
    assert(same.getAs[Long]("b") == 0 && same.getAs[Long]("c") == 0)
    assert(same.isNullAt(3))
  }
}
