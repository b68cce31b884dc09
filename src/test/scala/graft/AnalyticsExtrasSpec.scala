package graft

import org.apache.spark.sql.functions._

import graft.panel.{Changelog, Skyline}
import graft.sketch.Cms
import graft.sources.Quality

/** Round-6 session-4 analytics batch: CUSUM, Nelson–Aalen, skyline,
  * incremental view maintenance, Count-Min sketch. */
class AnalyticsExtrasSpec extends SparkSpec {
  import spark.implicits._

  // ---- CUSUM ----------------------------------------------------------

  test("cusum: closed form equals the sequential Page recurrence") {
    // one group, hand-computable series with a level shift at t=5
    val xs = Seq(0.0, 1.0, -1.0, 0.0, 10.0, 11.0, 9.0, 10.0)
    val df = xs.zipWithIndex.map { case (v, i) => (1L, i.toLong, v) }
      .toDF("g", "t", "v")
    val out = Quality.cusum(df, "g", "v", Seq("t"), "t",
      kCents = 100L, hCents = 500L)
      .orderBy("t").collect()
    // sequential reference: S+ = max(0, S+ + x - mu - k), mu = mean
    val cents = xs.map(v => math.round(v * 100))
    val n = cents.length
    val mu = cents.sum.toDouble / n
    var sp = 0.0
    var sn = 0.0
    val expected = cents.zipWithIndex.flatMap { case (c, i) =>
      sp = math.max(0.0, sp + c - mu - 100)
      sn = math.max(0.0, sn + mu - 100 - c)
      if (sp > 500 || sn > 500) Some((i.toLong, r7(sp / 100), r7(sn / 100)))
      else None
    }
    assert(out.map(r => (r.getLong(0),
      r7(r.getDouble(3)), r7(r.getDouble(4)))).toSeq == expected)
    assert(expected.nonEmpty) // the shift must actually alarm
  }

  test("cusum: in-control series with ample allowance raises no alarm") {
    val df = (0 until 50).map(i => (1L, i.toLong, if (i % 2 == 0) 1.0 else -1.0))
      .toDF("g", "t", "v")
    assert(Quality.cusum(df, "g", "v", Seq("t"), "t", 300L, 100L).count() == 0)
  }

  // ---- Nelson–Aalen ---------------------------------------------------

  test("nelsonAalen: hand-computed hazard; FH survival dominates KM") {
    // users with lifetimes 0,0,1,2 days; censor horizon 1 day
    val day = 86400000000L // micros
    val ev = Seq(
      (1L, 0L), (2L, 0L), // lifetime 0
      (3L, 0L), (3L, day), // lifetime 1
      (4L, 0L), (4L, 2 * day) // lifetime 2 = corpus max ⇒ censored
    ).map { case (u, us) => (u, new java.sql.Timestamp(us / 1000)) }
      .toDF("user_id", "ts")
    val na = graft.events.Events.nelsonAalen(ev, censorDays = 1)
      .orderBy("t").collect()
    // risk sets: t=0 n=4 d=2; t=1 n=2 d=1 (u4 censored at max day)
    assert(na.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((0L, 4L, 2L), (1L, 2L, 1L)))
    assert(na.map(_.getDouble(3)).toSeq == Seq(0.5, 1.0))
    val km = graft.events.Events.kaplanMeier(ev, censorDays = 1)
      .orderBy("t").collect().map(_.getDouble(3))
    // exp(-H) >= KM product-limit pointwise (standard inequality)
    na.map(_.getDouble(4)).zip(km).foreach { case (fh, s) => assert(fh >= s) }
  }

  // ---- Skyline --------------------------------------------------------

  test("skyline2d: dominance semantics incl. ties; pre-prune lossless") {
    val pts = Seq(
      (1L, 100L, 10L), // dominated by 3 (same rev, lower qty)
      (2L, 90L, 5L), // dominated by 3 (higher rev, same qty)
      (3L, 100L, 5L), // skyline
      (4L, 100L, 5L), // duplicate of 3 — both kept
      (5L, 80L, 5L), // dominated by 3 (lower rev, same qty)
      (6L, 120L, 50L), // skyline (highest rev)
      (7L, 50L, 1L) // skyline (lowest qty)
    ).toDF("id", "rev", "qty")
    val expected = Set(3L, 4L, 6L, 7L)
    for (b <- Seq(1, 4, 16)) {
      val got = Skyline.skyline2d(pts, "id", "rev", "qty", prePruneBuckets = b)
        .select("id").as[Long].collect().toSet
      assert(got == expected, s"buckets=$b")
    }
  }

  // ---- mergeAggView ---------------------------------------------------

  test("mergeAggView: retraction algebra; zero-count keys drop; " +
    "over-retraction raises") {
    val base = Seq((1L, 2L, 200L), (2L, 1L, 50L)).toDF("k", "n_rows", "sum_cents")
    val delta = Seq(
      (1L, -1L, -120L), // retract one row of key 1
      (2L, -1L, -50L), // retract key 2 entirely
      (3L, 1L, 70L) // new key
    ).toDF("k", "n_rows", "sum_cents")
    val out = Changelog.mergeAggView(base, delta, Seq("k"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 1L, 80L), (3L, 1L, 70L)))
    val bad = Seq((2L, -5L, -10L)).toDF("k", "n_rows", "sum_cents")
    val e = intercept[Exception] {
      Changelog.mergeAggView(base, bad, Seq("k")).collect()
    }
    assert(e.getMessage.contains("negative merged count"))
  }

  // ---- OLS ------------------------------------------------------------

  test("ols2: exact linear data recovers coefficients with r2 = 1") {
    // y = 3 + 2*x1 - x2 exactly, on a non-degenerate integer design
    val rows = for (x1 <- 0L to 9L; x2 <- 0L to 9L)
      yield (3 + 2 * x1 - x2, x1, x2)
    val out = graft.ml.Ols.ols2(rows.toDF("y", "x1", "x2"), "y", "x1", "x2")
      .collect().head
    assert(out.getLong(0) == 100L)
    assert((out.getDouble(1), out.getDouble(2), out.getDouble(3)) ==
      ((3.0, 2.0, -1.0)))
    assert(out.getDouble(4) == 1.0)
  }

  test("ols2: slope-only data yields near-zero residual r2 below 1") {
    val rows = (0L to 99L).map(i => (2 * i + (i % 3), i, i % 7))
    val out = graft.ml.Ols.ols2(rows.toDF("y", "x1", "x2"), "y", "x1", "x2")
      .collect().head
    assert(out.getDouble(4) > 0.99 && out.getDouble(4) <= 1.0)
  }

  test("ridge2: shrinks slope magnitudes monotonically in lambda and " +
    "never beats OLS in-sample") {
    val rows = (0L to 99L).map(i => (3 + 2 * i - (i % 7), i, i % 7))
      .toDF("y", "x1", "x2")
    val ols = graft.ml.Ols.ols2(rows, "y", "x1", "x2").collect().head
    val r1 = graft.ml.Ols.ridge2(rows, "y", "x1", "x2", 10000L).collect().head
    val r2 = graft.ml.Ols.ridge2(rows, "y", "x1", "x2", 1000000L).collect().head
    def slopes(r: org.apache.spark.sql.Row) =
      math.abs(r.getDouble(2)) + math.abs(r.getDouble(3))
    assert(slopes(ols) > slopes(r1) && slopes(r1) > slopes(r2))
    assert(ols.getDouble(4) >= r1.getDouble(4) &&
      r1.getDouble(4) >= r2.getDouble(4)) // in-sample r2 only shrinks
  }

  test("permutationImportance2: informative feature gains MSE, " +
    "zero-weight feature's delta is exactly 0") {
    // y depends on x1 only (b2 = 0 in the fit), x2 varies independently
    val rows = (0L until 200L).map(i => (5 + 3 * i, i, (i * 7) % 13, i))
      .toDF("y", "x1", "x2", "id")
    val out = graft.ml.Ols.permutationImportance2(
        rows, "y", "x1", "x2", idCols = Seq("id"), buckets = 8)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(out("__base")._1 == 0.0 && out("__base")._2 == 0.0)
    // permuting the feature the model relies on must raise MSE
    assert(out("x1")._2 > 0.0 && out("x1")._1 == out("x1")._2)
    // b2 = 0: permuting x2 cannot change any residual — delta EXACTLY 0
    assert(out("x2")._2 == 0.0)
  }

  test("permutationImportance2: rotation preserves the per-bucket " +
    "multiset (deltas are bounded by the worst pairing)") {
    // pathological y: one extreme outlier; the permuted MSE can move a
    // lot but never past the all-pairs worst case, and n is unchanged
    val rows = ((0L until 50L).map(i => (i % 10, i, (i * 3) % 5, i)) :+
      ((1000L, 50L, 4L, 50L))).toDF("y", "x1", "x2", "id")
    val out = graft.ml.Ols.permutationImportance2(
        rows, "y", "x1", "x2", idCols = Seq("id"), buckets = 4)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out.size == 3 && out.values.forall(v => !v.isNaN && v >= 0.0))
  }

  test("linearShap2: closed-form attribution on the exact grid — " +
    "mean|phi_j| = |b_j| * MAD(x_j), shares sum to 1") {
    // y = 3 + 2*x1 - x2 on the 10x10 grid: MAD(0..9 uniform) = 2.5
    val rows = for (x1 <- 0L to 9L; x2 <- 0L to 9L)
      yield (3 + 2 * x1 - x2, x1, x2)
    val out = graft.ml.Ols.linearShap2(
        rows.toDF("y", "x1", "x2"), "y", "x1", "x2")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out("x1") == ((2.0, 5.0, 0.666667)))
    assert(out("x2") == ((-1.0, 2.5, 0.333333)))
  }

  test("linearShap2: singular design yields null rows, not NaN") {
    // constant x2 is collinear with the intercept -> det = 0
    val rows = (0L to 20L).map(i => (2 * i, i, 5L)).toDF("y", "x1", "x2")
    val out = graft.ml.Ols.linearShap2(rows, "y", "x1", "x2").collect()
    assert(out.length == 2 && out.forall(r => r.isNullAt(1) && r.isNullAt(2)))
  }

  test("permutationImportance2: duplicate id key raises loudly") {
    val rows = (Seq((1L, 1L, 1L, 7L), (2L, 2L, 2L, 7L)) ++
      (10L until 40L).map(i => (i, i, i % 5, i))).toDF("y", "x1", "x2", "id")
    val e = intercept[Exception] {
      graft.ml.Ols.permutationImportance2(
        rows, "y", "x1", "x2", idCols = Seq("id"), buckets = 4).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("duplicate id key")), e.toString)
  }

  // ---- WOE / IV -------------------------------------------------------

  test("woeIv: hand case; zero-cell bins null out; bins partition rows") {
    // 8 rows, 2 bins of 4: low bin all good, high bin 3 bad 1 good
    val df = Seq(
      (1.0, false, 1L), (2.0, false, 2L), (3.0, false, 3L), (4.0, false, 4L),
      (5.0, true, 5L), (6.0, true, 6L), (7.0, true, 7L), (8.0, false, 8L))
      .toDF("v", "bad", "id")
    val out = graft.ml.Woe.woeIv(df, "bad", "v", Seq("id"), bins = 2)
      .orderBy("bin").collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((4L, 0L), (1L, 3L))) // (n_good, n_bad) per bin
    assert(out(0).isNullAt(3)) // zero bad cell → null woe
    val woe = math.log((1.0 / 5) / (3.0 / 3))
    assert(out(1).getDouble(3) == math.rint(woe * 1e6) / 1e6)
  }

  test("woeIv: non-unique (value, tieCols) raises " +
    "instead of resolving ties silently") {
    val df = Seq(
      (1.0, false, 1L), (1.0, true, 1L), // same value AND same tie key
      (2.0, false, 2L), (3.0, true, 3L))
      .toDF("v", "bad", "id")
    // raise_error fires at materialization (it rides the rank window's
    // shuffle — no separate validation job)
    val e = intercept[Exception] {
      graft.ml.Woe.woeIv(df, "bad", "v", Seq("id"), bins = 2).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("tieCols")), e.toString)
    // duplicate tie key at DIFFERENT value levels is fine — uniqueness
    // is required per value level only
    val ok = Seq(
      (1.0, false, 1L), (2.0, true, 1L), (3.0, false, 2L), (4.0, true, 2L))
      .toDF("v", "bad", "id")
    assert(graft.ml.Woe.woeIv(ok, "bad", "v", Seq("id"), bins = 2)
      .collect().length == 2)
  }

  // ---- featureMi ------------------------------------------------------

  test("featureMi: class-exclusive token has positive MI, " +
    "uniform token has zero") {
    val docs = Seq(
      (1L, "alpha common", "a"), (2L, "alpha common", "a"),
      (3L, "beta common", "b"), (4L, "beta common", "b"))
      .toDF("doc_id", "text", "source")
    val mi = graft.text.Vocab.featureMi(docs, "source", topV = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(mi("common") == 0.0) // present in every doc — no information
    assert(mi("alpha") == mi("beta")) // symmetric exclusives
    // perfectly class-predictive binary feature: MI = H(class) = ln 2
    assert(mi("alpha") == math.rint(math.log(2) * 1e6) / 1e6)
  }

  // ---- kCore ----------------------------------------------------------

  test("kCore: K5 plus a pendant chain peels to exactly the clique; " +
    "deep peeling raises loudly at maxIters") {
    // K5 on 0..4 (every node degree 4) + chain 4-10-11-12 hanging off
    val k5 = for (a <- 0L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val chain = Seq((4L, 10L), (10L, 11L), (11L, 12L))
    val edges = (k5 ++ chain).toDF("src", "dst")
    val core = graft.graph.PageRank.kCore(edges, k = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core.keySet == Set(0L, 1L, 2L, 3L, 4L))
    assert(core.values.forall(_ == 4L)) // inside the core K5 is 4-regular
    // a 12-node path with k=2 peels two ends per round — 6 rounds;
    // maxIters=2 must raise, not return a half-peeled set
    val path = (0L until 11L).map(i => (i, i + 1)).toDF("src", "dst")
    val e = intercept[graft.GraftError](
      graft.graph.PageRank.kCore(path, k = 2, maxIters = 2).collect())
    assert(e.getMessage.contains("did not converge"))
  }

  // ---- cepPatterns ----------------------------------------------------

  test("cepPatterns: journey order is (ts, id)-deterministic; regexes " +
    "match subsequences, not adjacency (except when written adjacent)") {
    val ts0 = new java.sql.Timestamp(0L)
    def t(s: Long) = new java.sql.Timestamp(ts0.getTime + s * 1000)
    val ev = Seq(
      (1L, t(1), 10L, "view"), (1L, t(2), 11L, "error"),
      (1L, t(3), 12L, "click"), (1L, t(4), 13L, "purchase"),
      (2L, t(1), 20L, "error"), (2L, t(1), 21L, "error"), // same ts: id order
      (3L, t(5), 30L, "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = graft.events.Events.cepPatterns(ev, Seq(
      "vcp" -> "v.*c.*p", "ee" -> "ee", "pe" -> "p.*e"))
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out("vcp") == ((1L, 0.333333))) // user 1: v e c p matches across gaps
    assert(out("ee") == ((1L, 0.333333))) // user 2 only (adjacent errors)
    assert(out("pe") == ((0L, 0.0))) // nobody errors after purchasing
  }

  // ---- nbLearningCurve ------------------------------------------------

  test("nbLearningCurve: nested fractions grow the training set " +
    "monotonically; full-pool model separates a separable corpus") {
    val docs = (0L until 200L).map { i =>
      val lang = if (i % 2 == 0) "aa" else "bb"
      val text = if (lang == "aa") "alpha alpha beta" else "gamma delta gamma"
      (i, text, lang)
    }.toDF("doc_id", "text", "lang")
    val out = graft.text.Classifier
      .nbLearningCurve(docs, "lang", fractions = Seq(0.3, 1.0))
      .orderBy("fraction").collect()
    assert(out(0).getLong(1) < out(1).getLong(1)) // n_train grows
    assert(out(0).getLong(2) == out(1).getLong(2)) // same holdout
    // perfectly separable vocab: the full model must be perfect
    assert(out(1).getDouble(4) == 1.0)
  }

  // ---- freshnessAnomalies ---------------------------------------------

  test("freshnessAnomalies: spike flags, steady days don't, early days " +
    "abstain — against a literal mean/std reference") {
    // 10 steady days around 100 (alternating 98/102), then a 300 spike,
    // then recovery
    val counts = ((1 to 10).map(d =>
      (d, if (d % 2 == 0) 102L else 98L)) :+ ((11, 300L)) :+ ((12, 100L)))
      .map { case (d, n) => (f"2024-01-$d%02d", n) }.toDF("day", "n_rows")
    val out = Quality.freshnessAnomalies(counts, "day", "n_rows")
      .orderBy("day").collect()
      .map(r => (r.getString(0), if (r.isNullAt(2)) None else Some(r.getBoolean(2))))
    assert(out(0)._2.isEmpty && out(1)._2.isEmpty) // < minObs trailing
    assert(out(10) == ("2024-01-11", Some(true))) // the spike
    // steady mid-window days are not anomalous
    (4 to 9).foreach(i => assert(out(i)._2.contains(false), s"day ${i + 1}"))
    // recovery day: trailing window now CONTAINS the 300 spike, which
    // inflates sigma — 100 is within 2 sigma of the polluted window
    assert(out(11)._2.contains(false))
    // literal reference for the spike day: trailing 7 = {98,102}*...,
    // mean 100, var 4, z=2 → |300-100| = 200 > 2*2: definitely true
    val trailing = (4 to 10).map(d => if (d % 2 == 0) 102.0 else 98.0)
    val mean = trailing.sum / trailing.size
    val varr = trailing.map(v => (v - mean) * (v - mean)).sum / trailing.size
    assert(math.abs(300.0 - mean) > 2 * math.sqrt(varr))
  }

  // ---- snapshotDiff ---------------------------------------------------

  test("snapshotDiff: all four statuses; nulls compare equal") {
    val old = Seq((1L, Some(10L)), (2L, Some(20L)), (3L, None), (4L, Some(40L)))
      .toDF("k", "v")
    val neu = Seq((1L, Some(10L)), (2L, Some(21L)), (3L, None), (5L, Some(50L)))
      .toDF("k", "v")
    val out = Quality.snapshotDiff(old, neu, Seq("k"), Seq("v"))
      .select("k", "status").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "unchanged", 4L -> "removed", 5L -> "added"))
  }

  // ---- Count-Min ------------------------------------------------------

  test("cms: estimates never undercount; exact when collision-free; " +
    "shard merge = whole-corpus build") {
    val rows = (1 to 40).flatMap(k => Seq.fill(k % 5 + 1)(k.toLong)).toDF("k")
    val (d, w) = (4, 1024)
    val sketch = Cms.build(rows, "k", d, w)
    assert(sketch.agg(sum("n")).as[Long].head() ==
      rows.count() * d) // total mass = N per row of the grid
    val exact = rows.groupBy("k").agg(count(lit(1)).as("exact"))
    val est = Cms.estimate(exact, sketch, "k", d, w)
    val joined = exact.join(est, "k")
      .select(col("exact"), col("est")).as[(Long, Long)].collect()
    joined.foreach { case (ex, es) => assert(es >= ex) }
    // width 1024 ≫ 40 keys: at least one hash row is collision-free for
    // every key, so min-over-rows is exact here
    joined.foreach { case (ex, es) => assert(es == ex) }
    // a never-inserted key must get a well-defined estimate (0 here:
    // width ≫ keys so at least one of its cells is empty), not be
    // silently dropped by an inner join
    val absent = Seq(9999L).toDF("k")
    assert(Cms.estimate(absent, sketch, "k", d, w)
      .select("est").as[Long].collect().toSeq == Seq(0L))
    // mergeability: two disjoint shards' grids cellwise-summed ==
    // whole-corpus grid
    val shardA = Cms.build(rows.where(col("k") <= 20), "k", d, w)
    val shardB = Cms.build(rows.where(col("k") > 20), "k", d, w)
    val merged = shardA.unionByName(shardB)
      .groupBy("row", "bucket").agg(sum("n").as("n"))
    assert(merged.except(sketch).isEmpty && sketch.except(merged).isEmpty)
  }

  test("bloom: no false negatives ever; definite negatives exist at " +
    "this sizing; shard merge (union-distinct) = whole-corpus build") {
    import graft.sketch.Bloom
    val (k, m) = (4, 1 << 14)
    val keys = (1L to 200L).toDF("k")
    val bloom = Bloom.build(keys, "k", k, m)
    val probed = Bloom.probe((1L to 2000L).toDF("k"), bloom, "k", k, m)
      .as[(Long, Boolean)].collect().toMap
    (1L to 200L).foreach(key => assert(probed(key), s"false negative $key"))
    // 16384 bits, 800 set: absent keys overwhelmingly probe false
    assert((201L to 2000L).count(probed(_)) < 100)
    // bitwise-OR merge: sharded builds union-distinct to the whole
    val shardA = Bloom.build(keys.where(col("k") <= 100), "k", k, m)
    val shardB = Bloom.build(keys.where(col("k") > 100), "k", k, m)
    val merged = shardA.unionByName(shardB).distinct()
    assert(merged.except(bloom).isEmpty && bloom.except(merged).isEmpty)
  }

  test("cuped: when post equals pre exactly, rho_sq = 1 and the " +
    "adjusted arm means collapse to the pooled mean") {
    import graft.events.Events
    // 40 users, each with one pre purchase and one identical post
    // purchase: X = Y per user, so X explains ALL the variance
    val rows = (1L to 40L).flatMap { u =>
      val v = (u % 7 + 1).toDouble
      Seq((u, "purchase", "2024-01-10 00:00:00", v),
        (u, "purchase", "2024-01-20 00:00:00", v))
    }.toDF("user_id", "event_type", "ts", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = Events.cuped(rows, splitDate = "2024-01-15")
      .orderBy("variant").collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("rho_sq") - 1.0) < 1e-9)
      assert(math.abs(r.getAs[Double]("theta") - 1.0) < 1e-9)
    }
    // both adjusted means equal the pooled post mean (variance removed)
    val adj = out.map(_.getAs[Double]("mean_adj"))
    assert(math.abs(adj(0) - adj(1)) < 1e-6)
  }
}
