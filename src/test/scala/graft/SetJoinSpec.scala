package graft

import org.apache.spark.sql.functions._

import graft.dedup.SetJoin

/** AllPairs/PPJoin exactness: the prefix-filtered join must equal a
  * brute-force pairwise Jaccard computed independently on the driver,
  * and the prefix filter must actually prune (fewer candidate rows than
  * the full token join would emit). */
class SetJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select($"doc_id", $"text")

  /** driver-side brute force over the same 3-gram shingle sets. */
  private def bruteForce(theta: Double): Set[(Long, Long, Long, Long)] = {
    val sets = docs.collect().map { r =>
      val ws = r.getString(1).toLowerCase.split(" ", -1)
      val sh = ws.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      (r.getLong(0), sh)
    }.filter(_._2.nonEmpty)
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = (sa & sb).size.toLong
      union = sa.size + sb.size - inter
      if inter * 1000000L >= math.round(theta * 1e6) * union
    } yield (ia, ib, inter, union)).toSet
  }

  test("SortedIntersectCount: merge count equals Set intersection; " +
    "survives CODEGEN_ONLY; rejects nullable elements and wrong types") {
    import graft.functions.SortedIntersect.countNative
    val cases = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 5L, 10L)), // partial overlap
      (Seq.empty[Long], Seq(1L, 2L)), // empty side
      (Seq(7L), Seq(7L)), // full overlap
      (Seq(1L, 2L, 3L), Seq(4L, 5L))) // disjoint
    val prevFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val prevFallback = spark.conf.get("spark.sql.codegen.fallback")
    def run(): Seq[Long] = cases.toDF("a", "b")
      .select(countNative($"a", $"b")).as[Long].collect().toSeq
    val expected = cases.map { case (a, b) => (a.toSet & b.toSet).size.toLong }
    assert(run() == expected) // default (codegen) path
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run() == expected) // interpreted path agrees bit-for-bit
    finally {
      prevFactory match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
      spark.conf.set("spark.sql.codegen.fallback", prevFallback)
    }
    // loud contract: nullable elements have no merge position
    val nullable = Seq((Seq(Some(1L), None), Seq(Some(1L))))
      .toDF("a", "b")
    intercept[org.apache.spark.sql.AnalysisException] {
      nullable.select(countNative($"a", $"b")).collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq(("x", "y")).toDF("a", "b")
        .select(countNative($"a", $"b")).collect()
    }
  }

  test("prefix-filtered join == brute force at theta 0.5 and 0.3") {
    for (theta <- Seq(0.5, 0.3)) {
      val got = SetJoin.prefixFilterJoin(docs, theta = theta)
        .select("doc_a", "doc_b", "inter_size", "union_size")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got === bruteForce(theta), s"theta=$theta")
    }
  }

  test("jaccard column is inter/union and >= theta") {
    val rows = SetJoin.prefixFilterJoin(docs, theta = 0.5).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (i, u, j) = (r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(j == i.toDouble / u && j >= 0.5)
    }
  }

  test("maxBucket guard raises on oversized prefix buckets " +
    "instead of passing lossily (r8: the exactness guarantee is the " +
    "operator's contract)") {
    // every doc identical -> one giant bucket per prefix token
    val clones = spark.range(0, 50)
      .select($"id".as("doc_id"), lit("a b c d e f g h").as("text"))
    val full = SetJoin.prefixFilterJoin(clones, theta = 0.9)
    assert(full.count() === 50L * 49 / 2) // default maxBucket admits them
    // 50 identical docs, 8 words → 6 shingles, prefix p = 6−⌈5.4⌉+1 = 1
    // → one 50-row bucket over the cap → raise_error at materialization
    val e = intercept[Exception] {
      SetJoin.prefixFilterJoin(clones, theta = 0.9, maxBucket = 10).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("maxBucket=10")), e.toString)
  }

  test("docs shorter than the shingle width drop out instead of erroring") {
    val tiny = Seq((1L, "one two"), (2L, "a b c d"), (3L, "a b c d")).toDF("doc_id", "text")
    val out = SetJoin.prefixFilterJoin(tiny, theta = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(out === Set((2L, 3L)))
  }
}
