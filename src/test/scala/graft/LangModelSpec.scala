package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.text.{LangModel, Sampling}

class LangModelSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def bucket(gram: String, buckets: Int): Long =
    java.lang.Long.parseLong(md5hex(gram).substring(0, 8), 16) % buckets

  test("crossEntropy golden: add-one unigram LM, OOV ceiling, dropped " +
    "empty docs (tx10)") {
    // ref counts: a→2, b→1; T=3, V=2 → denominator T+V = 5
    val ref = Seq((0L, "a a b")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a"), // ce = ln5 − ln3
      (2L, "c"), // OOV: ce = ln5 − ln1 = ln5 (the ceiling)
      (3L, "a b"), // ce = ln5 − (ln3 + ln2)/2
      (4L, "  "), // no tokens → dropped
      (5L, "!!!")) // normalizes to nothing → dropped
      .toDF("doc_id", "text")
    val out = LangModel.crossEntropy(docs, ref)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    def q6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L)._1 == 1 && out(1L)._2 == q6(math.log(5) - math.log(3)))
    assert(out(2L)._2 == q6(math.log(5)))
    assert(out(2L)._3 == 5.0) // perplexity of the OOV ceiling = T+V
    assert(out(3L)._1 == 2)
    assert(out(3L)._2 == q6(math.log(5) - (math.log(3) + math.log(2)) / 2))
    // in-domain text scores strictly below the OOV ceiling
    assert(out(1L)._2 < out(2L)._2)
  }

  test("crossEntropy is invariant under repartitioning (micro-nat " +
    "integer sums, not float accumulation)") {
    val ref = Seq.tabulate(50)(i => (i.toLong, s"alpha beta w$i gamma"))
      .toDF("doc_id", "text")
    val docs = Seq.tabulate(20)(i => (i.toLong, s"alpha w${i % 7} beta gamma delta"))
      .toDF("doc_id", "text")
    val a = LangModel.crossEntropy(docs, ref)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val b = LangModel.crossEntropy(docs.repartition(7), ref.repartition(3))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(a == b)
  }

  test("dsirLogWeights golden: target-like docs weigh positive, " +
    "raw-only docs negative, symmetric magnitudes (sp4)") {
    val B = 1024
    // distinct feature buckets by construction of the test strings
    assert(bucket("x y", B) != bucket("p q", B))
    val target = Seq((0L, "x y")).toDF("doc_id", "text")
    val raw = Seq((0L, "p q")).toDF("doc_id", "text")
    val docs = Seq((1L, "x y"), (2L, "p q"), (3L, "z")).toDF("doc_id", "text")
    val out = LangModel.dsirLogWeights(docs, target, raw, buckets = B)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    def q6(x: Double) = math.rint(x * 1e6) / 1e6
    // Tt = Tr = 1 → the totals shift cancels; per-feature term is
    // ln(ct+1) − ln(cr+1) = ±ln2
    assert(out(1L) == ((1L, q6(math.log(2)))))
    assert(out(2L) == ((1L, q6(-math.log(2)))))
    assert(!out.contains(3L)) // single word: no bigram features
  }

  test("dsirLogWeights: feature count = words − 1; repartition-invariant") {
    val target = Seq((0L, "spark streams shuffle data fast")).toDF("doc_id", "text")
    val raw = Seq((0L, "pandas frames copy data slowly"), (1L, "other filler rows here"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, "spark streams shuffle data"), // 3 bigrams, target-like
      (2L, "pandas frames copy data slowly too")) // raw-like
      .toDF("doc_id", "text")
    val a = LangModel.dsirLogWeights(docs, target, raw, buckets = 4096)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a.find(_._1 == 1L).get._2 == 3L)
    assert(a.find(_._1 == 2L).get._2 == 5L)
    assert(a.find(_._1 == 1L).get._3 > 0)
    assert(a.find(_._1 == 2L).get._3 < 0)
    val b = LangModel.dsirLogWeights(docs.repartition(5), target, raw, buckets = 4096)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b)
  }

  test("perplexityBuckets: when-chain labels against ascending cutoffs; " +
    "boundary scores take the lower bucket (tx13)") {
    val scored = Seq((1L, 1.0), (2L, 2.0), (3L, 2.5), (4L, 9.9))
      .toDF("doc_id", "cross_entropy")
    val out = LangModel.perplexityBuckets(scored, Seq(2.0, 3.0))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out == Map(1L -> "head", 2L -> "head", 3L -> "middle", 4L -> "tail"))
    intercept[graft.ParameterError] {
      LangModel.perplexityBuckets(scored, Seq(3.0, 2.0)) // not ascending
    }
    intercept[graft.ParameterError] {
      LangModel.perplexityBuckets(scored, Seq(2.0), Seq("only")) // label arity
    }
  }

  test("hashSampleQuantiles: k-th smallest under the (value, id) total " +
    "order, invariant under repartitioning; empty sample raises") {
    import graft.text.Sampling
    val df = (1L to 100L).map(i => (i, i.toDouble)).toDF("doc_id", "v")
    val cuts = Sampling.hashSampleQuantiles(
      df, "doc_id", "v", Seq(1.0 / 3, 2.0 / 3), rate = 0.5, seed = "q")
    val cuts2 = Sampling.hashSampleQuantiles(
      df.repartition(7), "doc_id", "v", Seq(1.0 / 3, 2.0 / 3), rate = 0.5, seed = "q")
    assert(cuts == cuts2)
    // replay: the sampled values sorted; cutoffs are the ceil(f·n)-th
    val samp = Sampling.sampleByHash(df, "doc_id", 0.5, "q")
      .collect().map(_.getDouble(1)).sorted
    def kth(f: Double) = samp(math.ceil(f * samp.length).toInt - 1)
    assert(cuts == Seq(kth(1.0 / 3), kth(2.0 / 3)))
    assert(cuts.head < cuts.last)
    intercept[graft.ParameterError] {
      Sampling.hashSampleQuantiles(df, "doc_id", "v", Seq(0.5), rate = 0.0)
    }
    intercept[graft.ParameterError] {
      Sampling.hashSampleQuantiles(df, "doc_id", "v", Seq(1.5), rate = 0.5)
    }
  }

  test("weightedSample: heavy rows win more often, selection exactly " +
    "reproducible, non-positive weights drop (sp10)") {
    // one huge-weight row among many light ones: it should (almost)
    // always make a k=5 cut — ln(u)/w → 0⁻ as w grows
    val df = ((1L to 50L).map(i => (i, 1.0)) :+ (99L, 1e9))
      .toDF("doc_id", "w")
    val picked = Sampling.weightedSample(df, "doc_id", "w", k = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(picked.contains(99L))
    assert(picked.size == 5)
    // deterministic: second run identical
    val again = Sampling.weightedSample(df, "doc_id", "w", k = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(again == picked)
    // zero/negative/null weights can never be sampled
    val bad = Seq((1L, 0.0), (2L, -3.0), (3L, 5.0)).toDF("doc_id", "w")
    assert(Sampling.weightedSample(bad, "doc_id", "w", k = 10)
      .select("doc_id").as[Long].collect().toSeq == Seq(3L))
    intercept[graft.ParameterError](
      Sampling.weightedSample(df, "doc_id", "w", k = 0))
  }

  test("corpusDivergence: add-one-smoothed KL/JS goldens; identical " +
    "corpora → 0 (tx22)") {
    val a = Seq((1L, "x x y")).toDF("doc_id", "text")
    val b = Seq((2L, "x y y z")).toDF("doc_id", "text")
    val s = LangModel.corpusDivergence(a, b).head
    assert(s.getAs[Long]("vocab_size") == 3L)
    assert(s.getAs[Long]("n_tokens_a") == 3L)
    assert(s.getAs[Long]("n_tokens_b") == 4L)
    // p = (cA+1)/(3+3), q = (cB+1)/(4+3) over {x, y, z}
    val p = Seq(3.0 / 6, 2.0 / 6, 1.0 / 6)
    val q = Seq(2.0 / 7, 3.0 / 7, 2.0 / 7)
    def kl(u: Seq[Double], v: Seq[Double]) =
      u.zip(v).map { case (x, y) => x * math.log(x / y) }.sum
    assert(math.abs(s.getAs[Double]("kl_ab") - kl(p, q)) < 1e-6)
    assert(math.abs(s.getAs[Double]("kl_ba") - kl(q, p)) < 1e-6)
    val m = p.zip(q).map { case (x, y) => (x + y) / 2 }
    val js = 0.5 * (kl(p, m) + kl(q, m))
    assert(math.abs(s.getAs[Double]("js") - js) < 1e-6)
    assert(s.getAs[Double]("js") <= math.log(2) + 1e-9) // JS ≤ ln 2
    val same = LangModel.corpusDivergence(a, a).head
    assert(same.getAs[Double]("kl_ab") == 0.0)
    assert(same.getAs[Double]("js") == 0.0)
  }
}
