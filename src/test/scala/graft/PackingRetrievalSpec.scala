package graft

import org.apache.spark.sql.functions._

import graft.text.{Packing, Retrieval, Sampling, TextAnalysis}

/** Sequence packing, BM25 retrieval, and mixture reweighting: semantic
  * invariants + plan shape (the tx/pk/ir/sp oracle queries pin
  * cross-engine numerics; these pin the properties).
  */
class PackingRetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "a b c d e"),          // 5 tokens
    (2L, "f g h"),              // 3
    (3L, "i j k l m n o p"),    // 8
    (4L, ""),                   // empty -> dropped
    (5L, "q r s t u v")         // 6
  ).toDF("doc_id", "text")

  test("packing: every token lands in exactly one sequence slot") {
    val packed = Packing.packSequences(docs, "doc_id", "text", budget = 4, shards = 2)
    val perDoc = packed.groupBy("doc_id").agg(sum("tok_in_seq").as("t"))
      .as[(Long, Long)].collect().toMap
    assert(perDoc == Map(1L -> 5L, 2L -> 3L, 3L -> 8L, 5L -> 6L))
  }

  test("packing: sequences are full except each shard's last") {
    val packed = Packing.packSequences(docs, "doc_id", "text", budget = 4, shards = 2)
    val bySeq = packed.groupBy("shard", "seq_id").agg(sum("tok_in_seq").as("t"))
      .orderBy("shard", "seq_id")
      .as[(Long, Long, Long)].collect()
    bySeq.groupBy(_._1).foreach { case (_, seqs) =>
      seqs.init.foreach { case (_, _, t) => assert(t == 4L, s"non-final seq not full: $seqs") }
      assert(seqs.last._3 <= 4L)
    }
    // ids are dense from 0 per shard
    bySeq.groupBy(_._1).foreach { case (_, seqs) =>
      assert(seqs.map(_._2).toSeq == seqs.indices.map(_.toLong))
    }
  }

  test("packing: deterministic across repartitioning; one exchange in the plan") {
    val a = Packing.packSequences(docs, "doc_id", "text", budget = 4, shards = 2)
      .collect().toSet
    val b = Packing.packSequences(docs.repartition(7), "doc_id", "text", budget = 4, shards = 2)
      .collect().toSet
    assert(a == b)
    val plan = Packing.packSequences(docs, "doc_id", "text", budget = 4, shards = 2)
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange hashpartitioning").length == 2,
      s"expected exactly one hash exchange (on shard):\n$plan")
  }

  test("bm25: frequency, rarity, and absence behave") {
    val corpus = Seq(
      (1L, "spark spark spark runs fast"),
      (2L, "spark runs"),
      (3L, "plain words only here"),
      (4L, "common common common common"),
      (5L, "common word")
    ).toDF("doc_id", "text")
    val top = Retrieval.bm25TopK(corpus, "doc_id", "text", Seq("spark"), topK = 10)
      .as[(Long, Double)].collect()
    // only docs containing the term; more occurrences rank higher
    assert(top.map(_._1).toSeq == Seq(1L, 2L))
    assert(top(0)._2 > top(1)._2)
    // a rarer term outscores a common one at equal tf
    val two = Retrieval.bm25TopK(corpus, "doc_id", "text", Seq("word", "common"), topK = 10)
      .as[(Long, Double)].collect().toMap
    assert(two(5L) > two(4L) || two.size == 2) // doc5 has rare 'word' + 'common'
  }

  test("mixture rates: limiting stratum keeps everything, mix hits target") {
    val df = (1 to 100).map(i => (i.toLong, "w " * (if (i <= 25) 4 else 12), if (i <= 25) "a" else "b"))
      .toDF("doc_id", "text", "source")
    val rates = Sampling.mixtureRates(df, "source",
      TextAnalysis.tokenCount(col("text")), targets = Map("a" -> 0.5, "b" -> 0.5))
      .as[(String, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    // tokens: a = 25*4 = 100, b = 75*12 = 900; lambda = min(200, 1800) = 200
    assert(rates("a")._2 == 100L && rates("b")._2 == 900L)
    assert(rates("a")._4 == 1.0)                    // limiting stratum keeps all
    assert(rates("b")._4 == 0.111111)               // 100/900 rounded to 6
    assert(rates("a")._3 == 0.1 && rates("b")._3 == 0.9)
  }

  test("temperature rates: α-scaled target mix, binding stratum keeps all, " +
    "α=1 is the natural mix, empty stratum rate 0 (sp7)") {
    // direct token counts per stratum: a 90, b 10, c 0 (empty docs)
    val df = Seq(("a", 90L), ("b", 10L), ("c", 0L)).toDF("source", "n")
    val half = Sampling.temperatureRates(df, "source", col("n"), alpha = 0.5)
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(half("a")._3 == 0.9 && half("b")._3 == 0.1 && half("c")._3 == 0.0)
    // q ∝ √p: √0.9/(√0.9+√0.1) = 3/4 exactly (√0.9 = 3√0.1 in reals;
    // float noise is sub-6dp)
    assert(half("a")._4 == 0.75 && half("b")._4 == 0.25 && half("c")._4 == 0.0)
    // w = p^(α−1): smallest nonzero share binds → b keeps everything,
    // a keeps (0.1/0.9)^0.5 = 1/3
    assert(half("b")._5 == 1.0)
    assert(half("a")._5 == 0.333333)
    assert(half("c")._5 == 0.0)
    // α = 1: natural mix, every stratum keeps everything
    val nat = Sampling.temperatureRates(df, "source", col("n"), alpha = 1.0)
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(nat("a")._4 == 0.9 && nat("a")._5 == 1.0 && nat("b")._5 == 1.0)
    intercept[ParameterError](
      Sampling.temperatureRates(df, "source", col("n"), alpha = -0.1))
  }

  test("tfidf: tf, df, the Salton weight, and the minDf prune (ir2)") {
    val docs = Seq(
      (1L, "apple banana apple"), (2L, "banana cherry"),
      (3L, "Unique, WORDS only!")) // normalization folds case/punct
      .toDF("doc_id", "text")
    val all = Retrieval.tfidf(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(all((1L, "apple")) == ((2L, 1L, 2.197225))) // 2·ln(3/1)
    assert(all((1L, "banana")) == ((1L, 2L, 0.405465))) // ln(3/2)
    assert(all((2L, "banana")) == ((1L, 2L, 0.405465)))
    assert(all((3L, "unique")) == ((1L, 1L, 1.098612))) // ln 3, normalized
    assert(all.size == 7)
    // df >= 2 keeps exactly the shared term's rows
    val pruned = Retrieval.tfidf(docs, "doc_id", "text", minDf = 2)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(pruned == Set((1L, "banana"), (2L, "banana")))
    intercept[graft.ParameterError] {
      Retrieval.tfidf(docs, "doc_id", "text", minDf = 0)
    }
    // plan tripwire: the (id, term) checkpoint feeds BOTH the df agg
    // and the output join — the tokenize/explode must appear ZERO times
    // in the final plan (it lives behind the checkpoint's Scan
    // ExistingRDD); a Generate node here means the lazy checkpoint was
    // dropped and the corpus tokenizes once per aliased consumer
    val plan = Retrieval.tfidf(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"), plan)
  }

  test("phraseMatches: overlapping counts, mixed lengths, normalization, " +
    "and loud empty-phrase failure") {
    val docs = Seq(
      (1L, "the cat sat on the cat sat mat"),
      (2L, "a cat sat here"),
      (3L, "unrelated words entirely"),
      (4L, "cat cat cat"))
      .toDF("doc_id", "text")
    val phrases = Seq(
      (10L, "Cat Sat!"),     // normalizes to "cat sat" (len 2)
      (20L, "cat"),          // unigram
      (30L, "cat cat"))      // overlapping in doc 4: positions 1,2
      .toDF("phrase_id", "phrase")
    val out = Retrieval.phraseMatches(docs, phrases)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((10L, 1L)) == 2) // "cat sat" twice in doc 1
    assert(out((10L, 2L)) == 1)
    assert(out.get((10L, 3L)).isEmpty)
    assert(out((20L, 4L)) == 3) // unigram counts every occurrence
    assert(out((30L, 4L)) == 2) // overlapping "cat cat"
    intercept[graft.ParameterError] {
      Retrieval.phraseMatches(docs, Seq((1L, "!!!")).toDF("phrase_id", "phrase"))
    }
    intercept[graft.ParameterError] {
      Retrieval.phraseMatches(docs,
        phrases.where($"phrase_id" < 0))
    }
  }

  test("mixture rates: a targeted stratum with ZERO tokens cannot zero " +
    "the binding constraint for everyone else") {
    val df = Seq(
      (1L, "w w w w", "a"), (2L, "w w w w", "a"),
      (3L, "   ", "empty")) // targeted but token-less
      .toDF("doc_id", "text", "source")
    val rates = Sampling.mixtureRates(df, "source",
      TextAnalysis.tokenCount(col("text")), targets = Map("a" -> 0.5, "empty" -> 0.5))
      .as[(String, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(rates("a")._4 == 1.0) // NOT dragged to 0 by the empty stratum
    assert(rates("empty")._2 == 0L && rates("empty")._4 == 1.0)
  }

  test("rrfFuse: 1/(k+rank) terms sum exactly across lists, rank by " +
    "fused score with doc tiebreak (ir4)") {
    val l1 = Seq(("A", 1), ("B", 2)).toDF("doc", "rank")
    val l2 = Seq(("B", 1), ("C", 2)).toDF("doc", "rank")
    val out = Retrieval.rrfFuse(Seq(l1, l2), "doc", kRrf = 0, topK = 10)
      .orderBy("rank")
      .select("doc", "n_lists", "rrf_score", "rank")
      .as[(String, Long, Double, Int)].collect()
    // B: 1/2 + 1/1 = 1.5; A: 1.0; C: 0.5
    assert(out.toSeq == Seq(
      ("B", 2L, 1.5, 1), ("A", 1L, 1.0, 2), ("C", 1L, 0.5, 3)))
    // topK truncates the fused list
    assert(Retrieval.rrfFuse(Seq(l1, l2), "doc", kRrf = 0, topK = 1)
      .count() == 1)
    intercept[ParameterError](Retrieval.rrfFuse(Nil, "doc"))
    intercept[ParameterError](Retrieval.rrfFuse(Seq(l1), "doc", kRrf = -1))
  }

  test("queryLikelihoodTopK: matches a driver-side Dirichlet replication; " +
    "cf=0 terms drop; guards (ir5)") {
    val corpus = Seq(
      (1L, "spark spark joins data"),
      (2L, "spark framework"),
      (3L, "plain words only here")
    ).toDF("doc_id", "text")
    val mu = 2000.0
    // corpus: tokens per doc 4/2/4, C = 10; cf(spark) = 3, cf(plain) = 1
    def ref(tf: Long, cf: Long, dl: Long, c: Long): Double =
      math.log((tf + mu * cf / c) / (dl + mu))
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Retrieval.queryLikelihoodTopK(
      corpus, "doc_id", "text", Seq("spark", "plain"), topK = 10)
      .as[(Long, Double)].collect().toMap
    assert(got(1L) == r6(ref(2, 3, 4, 10) + ref(0, 1, 4, 10)))
    assert(got(2L) == r6(ref(1, 3, 2, 10) + ref(0, 1, 2, 10)))
    assert(got(3L) == r6(ref(0, 3, 4, 10) + ref(1, 1, 4, 10)))
    // a term absent from the whole corpus contributes nothing
    val drop = Retrieval.queryLikelihoodTopK(
      corpus, "doc_id", "text", Seq("spark", "zzzmissing"), topK = 10)
      .as[(Long, Double)].collect().toMap
    assert(drop(1L) == r6(ref(2, 3, 4, 10)))
    intercept[ParameterError](
      Retrieval.queryLikelihoodTopK(corpus, "doc_id", "text", Nil))
    intercept[ParameterError](
      Retrieval.queryLikelihoodTopK(corpus, "doc_id", "text",
        Seq("a", "a")))
    intercept[ParameterError](
      Retrieval.queryLikelihoodTopK(corpus, "doc_id", "text",
        Seq("a"), mu = 0.0))
  }

  test("retrieval population contract: null-text docs are invisible to " +
    "bm25 / query-likelihood / tfidf — scores identical with and " +
    "without them (the corpus is the non-null-text docs)") {
    val base = Seq(
      (1L, "spark join window spark"),
      (2L, "spark engines run queries"),
      (3L, "completely unrelated words here"))
      .toDF("doc_id", "text")
    val withNulls = base.unionByName(Seq(
      (4L, null.asInstanceOf[String]), (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    assert(
      rows(Retrieval.bm25TopK(withNulls, "doc_id", "text", Seq("spark"))) ==
      rows(Retrieval.bm25TopK(base, "doc_id", "text", Seq("spark"))))
    assert(
      rows(Retrieval.queryLikelihoodTopK(
        withNulls, "doc_id", "text", Seq("spark"))) ==
      rows(Retrieval.queryLikelihoodTopK(base, "doc_id", "text", Seq("spark"))))
    assert(
      rows(Retrieval.tfidf(withNulls, "doc_id", "text")
        .orderBy("doc_id", "term")) ==
      rows(Retrieval.tfidf(base, "doc_id", "text").orderBy("doc_id", "term")))
  }

  test("curriculumOrder: round-robin positions match the definitional " +
    "global rank; guards (sp16)") {
    // band 0: docs 1, 2 (low score); band 1: docs 3, 4, 5
    val docs = Seq(
      (1L, 0.10), (2L, 0.15), (3L, 0.90), (4L, 0.95), (5L, 0.99))
      .toDF("doc_id", "score")
    val got = Sampling.curriculumOrder(docs, "doc_id", col("score"), bands = 2)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // global order by (pos_in_band, band): 1, 3, 2, 4, 5
    assert(got(1L) == ((0L, 1L, 1L)))
    assert(got(3L) == ((1L, 1L, 2L)))
    assert(got(2L) == ((0L, 2L, 3L)))
    assert(got(4L) == ((1L, 2L, 4L)))
    assert(got(5L) == ((1L, 3L, 5L)))
    // score = 1.0 lands in the top band, not band `bands`
    val edge = Sampling.curriculumOrder(
      Seq((7L, 1.0)).toDF("doc_id", "score"), "doc_id", col("score"),
      bands = 4).as[(Long, Long, Long, Long)].collect().head
    assert(edge == ((7L, 3L, 1L, 1L)))
    intercept[ParameterError](
      Sampling.curriculumOrder(docs, "doc_id", col("score"), bands = 1))
  }
}
