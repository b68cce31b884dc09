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
}
