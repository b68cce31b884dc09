package graft

import org.apache.spark.sql.functions._

import graft.sources.Quality

/** Expectation semantics on hand-checkable fixtures: null predicates are
  * violations, one scan evaluates all rules, and orphan checks treat a
  * null FK as unmatched. The dq1 catalog query pins the same operator
  * against DuckDB at sf0.01. */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("kAnonymity: class-size histogram and risk flag") {
    val df = Seq((1, "a"), (1, "a"), (1, "a"), (1, "b"),
      (2, "a"), (2, "a"), (2, "b")).toDF("n", "s")
    val r = Quality.kAnonymity(df, Seq("n", "s"), threshold = 2)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getInt(3))).toMap
    assert(r == Map(1L -> ((2L, 2L, 1)), 2L -> ((1L, 2L, 0)),
      3L -> ((1L, 3L, 0))))
    intercept[IllegalArgumentException] {
      Quality.kAnonymity(df, Nil)
    }
  }

  test("lDiversity: distinct-l, micro-nat entropy-l, and the risk flag") {
    val df = Seq(
      ("n1", "x"), ("n1", "x"), ("n1", "y"), // class n1: counts (2,1)
      ("n2", "x"), ("n2", "x"),              // class n2: uniform single value
      ("n3", "x"), ("n3", "y"), ("n3", "z")) // class n3: 3 distinct, uniform
      .toDF("q", "s")
    val r = Quality.lDiversity(df, Seq("q"), "s", l = 3)
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getDouble(3), x.getInt(4)))).toMap
    // replicate the micro-nat quantization exactly
    def entropyL(counts: Seq[Long]): Double = {
      val n = counts.sum.toDouble
      val micro = counts.map(c =>
        math.round(-(c / n) * math.log(c / n) * 1e6)).sum
      BigDecimal(math.exp(micro / 1e6))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(r("n1") == ((3L, 2L, entropyL(Seq(2L, 1L)), 1)))
    assert(r("n2") == ((2L, 1L, 1.0, 1)))
    assert(r("n3") == ((3L, 3L, entropyL(Seq(1L, 1L, 1L)), 0)))
    intercept[IllegalArgumentException] {
      Quality.lDiversity(df, Nil, "s")
    }
  }

  test("functionalDependencies: holds/violations on a crafted table; " +
    "null lhs is its own class, null rhs ignored") {
    val df = Seq(
      ("a", Some("x"), 1), ("a", Some("x"), 2), // a→x consistent
      ("b", Some("y"), 1), ("b", Some("z"), 1), // b violates →rhs2
      (null, Some("x"), 1), (null, None, 1))    // null lhs class
      .toDF("c1", "c2", "c3")
    val r = Quality.functionalDependencies(df, Seq("c1", "c2"))
      .collect().map(x => (x.getString(0), x.getString(1)) ->
        (x.getLong(2), x.getLong(3), x.getInt(4))).toMap
    // c1→c2: classes a (x), b (y,z → violation), null (x; the null c2
    // is ignored by the distinct count) → 3 classes, 1 violating
    assert(r(("c1", "c2")) == ((3L, 1L, 0)))
    // c2→c1: x → {a, null} — but the null c1 is IGNORED by the
    // distinct count (documented SQL semantics), so x→c1 holds;
    // 4 classes (x, y, z, null-c2), 0 violating
    assert(r(("c2", "c1")) == ((4L, 0L, 1)))
    val ok = Quality.functionalDependencies(
      Seq(("k1", "v"), ("k2", "v")).toDF("k", "v"), Seq("k", "v"))
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getInt(4))
      .toMap
    assert(ok(("k", "v")) == 1) // k → v holds
    assert(ok(("v", "k")) == 0) // v → k violated
    intercept[IllegalArgumentException] {
      Quality.functionalDependencies(df, Seq("c1"))
    }
  }

  test("psiTrend: identical distribution scores 0; a collapsed " +
    "distribution scores the hand-computed floored PSI") {
    import org.apache.spark.sql.functions.to_timestamp
    // baseline days 1-3: values 10/60 evenly; day 4 same; day 5 all 10
    val rows =
      (1 to 4).flatMap(day => Seq.fill(2)(10.0) ++ Seq.fill(2)(60.0))
        .zipWithIndex.map { case (v, i) =>
          (s"2024-01-0${i / 4 + 1} 00:00:00", v) } ++
      Seq.fill(4)(10.0).map(v => ("2024-01-05 00:00:00", v))
    val ev = rows.toDF("s", "value")
      .withColumn("ts", to_timestamp(col("s"))).drop("s")
    val r = graft.ml.Evaluation.psiTrend(ev, baselineDays = 3)
      .collect().map(x => x.getDate(0).toString ->
        (x.getLong(1), x.getDouble(2))).toMap
    assert(r("2024-01-04") == ((4L, 0.0))) // same mix → every term ln(1)
    val eps = 1e-6
    val expected = (1.0 - 0.5) * math.log(1.0 / 0.5) +
      (eps - 0.5) * math.log(eps / 0.5)
    assert(r("2024-01-05")._1 == 4L)
    assert(math.abs(r("2024-01-05")._2 - expected) < 1e-4)
  }

  test("benford: leading digit of exact cents, log10 expectations, " +
    "positives only") {
    val df = Seq(123.00, 19.99, 250.00, 3.50, 0.01, 999.99, -5.0, 0.0)
      .toDF("v")
    val r = Quality.benford(df, "v").collect()
      .map(x => x.getString(0) -> x).toMap
    // cents: 12300→1, 1999→1, 25000→2, 350→3, 1→1, 99999→9; ≤0 dropped
    assert(r.keySet == Set("1", "2", "3", "9"))
    assert(r("1").getAs[Long]("n") == 3 && r("9").getAs[Long]("n") == 1)
    assert(math.abs(r("1").getAs[Double]("exp_p") - math.log10(2.0)) < 1e-6)
    assert(math.abs(r("9").getAs[Double]("exp_p") -
      math.log10(10.0 / 9.0)) < 1e-6)
    assert(math.abs(r("1").getAs[Double]("obs_p") - 0.5) < 1e-9)
    // χ² term: (n − p·N)²/(p·N) at N=6
    val e1 = math.log10(2.0) * 6
    assert(math.abs(r("1").getAs[Double]("chi2_term") -
      (3 - e1) * (3 - e1) / e1) < 1e-4)
  }

  test("expect: null predicate counts as a violation; one row per rule") {
    val df = Seq(Some(5), Some(50), None, Some(-1)).toDF("v")
    val report = Quality.expect(df, Seq(
      "positive" -> (col("v") > 0),
      "null_ok" -> (col("v").isNull || col("v") > 0)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // v=None: (v > 0) is null → violation; null_ok admits it
    assert(report == Map("positive" -> (4L, 2L), "null_ok" -> (4L, 1L)))
  }

  test("expect: all rules evaluate in one aggregate pass (single scan)") {
    val df = Seq(1, 2, 3).toDF("v")
    val plan = Quality.expect(df, Seq(
      "a" -> (col("v") > 0), "b" -> (col("v") < 10), "c" -> (col("v") =!= 2)))
      .queryExecution.executedPlan.toString
    assert("LocalTableScan|Scan".r.findAllIn(plan).length == 1,
      s"expected one scan, plan:\n$plan")
  }

  test("orphans: unmatched and null child keys count; matched don't") {
    val child = Seq(Some(1), Some(2), Some(99), None).toDF("fk")
    val parent = Seq(1, 2, 3).toDF("pk")
    val row = Quality.orphans("fk_check", child, "fk", parent, "pk").head()
    assert(row.getString(0) == "fk_check")
    assert(row.getLong(1) == 4 && row.getLong(2) == 2)
  }

  test("madOutliers: Hampel flag in exact cents; masking-resistant; zero-MAD convention") {
    // group a: values 1..9 plus a 100.0 spike. median=5.5 (med2=1100);
    // devs2 |2v-1100| sorted = 100,100,300,300,500,500,700,700,900,18900
    // → middle two 500+500 → mad4=1000 (MAD=2.5 dollars).
    // flag: 2*dev2 > 5*mad4=5000 → dev2>2500 → only the spike (18900).
    // With mean/stddev the spike inflates sigma to ~29.7 → z≈3.2 would
    // need k<=3: the median screen flags it at k=5 comfortably.
    val a = (1 to 9).map(v => ("a", v.toDouble, v.toLong)) :+ (("a", 100.0, 10L))
    // group b: constant values → mad4=0 → no flags by default
    val b = (11 to 15).map(i => ("b", 7.0, i.toLong))
    val df = (a ++ b).toDF("g", "v", "id")
    val got = Quality.madOutliers(df, "g", "v", "id", k = 5)
    val rows = got.collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(10L))
    val r = rows.head
    assert(r.getAs[Long]("value_cents") == 10000L)
    assert(r.getAs[Long]("med2_cents") == 1100L)
    assert(r.getAs[Long]("dev2_cents") == 18900L)
    assert(r.getAs[Long]("mad4_cents") == 1000L)
    // flagZeroMad=true flags every non-median row of the degenerate group
    val zf = Quality.madOutliers(df.where($"g" === "b"), "g", "v", "id",
      k = 5, flagZeroMad = true)
    assert(zf.count() == 0) // all values equal the median → dev2 = 0 everywhere
  }

  test("winsorize clamps to exact order-statistic bounds") {
    // 20 values 1..20 dollars: k_lo = ceil(20*0.05) = 1 → lo = 100 cents;
    // k_hi = ceil(20*0.95) = 19 → hi = 1900 cents. 20.0 clamps to 19.0;
    // nothing clamps below (the minimum IS the p5 order stat at n=20).
    val df = (1 to 20).map(i => ("g", i.toDouble, i.toLong)).toDF("g", "v", "id")
    val rows = Quality.winsorize(df, "g", "v", "id").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.values.forall(r =>
      r.getAs[Long]("lo_cents") == 100L && r.getAs[Long]("hi_cents") == 1900L))
    assert(rows(20L).getAs[Long]("wins_cents") == 1900L)
    assert(rows(1L).getAs[Long]("wins_cents") == 100L)
    assert(rows(10L).getAs[Long]("wins_cents") == 1000L)
    assertThrows[IllegalArgumentException](
      Quality.winsorize(df, "g", "v", "id", loBp = 9500, hiBp = 500))
  }

  test("theilSen recovers a slope through an outlier that bends OLS") {
    // y = 3x dollars with one wild point at x=10 (y=1000): 45 pairwise
    // slopes, the 9 involving the outlier are extreme, the median stays 3.
    val pts = ((0 to 9).map(x => ("g", x.toLong, 3.0 * x)) :+ (("g", 10L, 1000.0)))
      .toDF("g", "x", "v")
    val r = Quality.theilSen(pts, "g", col("x"), "v").head()
    assert(r.getAs[Long]("n_pairs") == 55)
    assert(r.getAs[Double]("slope_cents_per_x") == 300.0) // 3 $/x = 300 cents/x
    // OLS for contrast bends to ~20x the true slope
    val ols = pts.agg((covar_pop($"x", $"v") / var_pop($"x")).as("b")).head().getDouble(0)
    assert(ols > 30.0)
    // guard: the pair expansion must be an explicit opt-in
    val big = (0 until 60).map(i => ("g", i.toLong, i.toDouble)).toDF("g", "x", "v")
    val e = intercept[Exception](
      Quality.theilSen(big, "g", col("x"), "v", maxPoints = 50).collect())
    assert(e.getMessage.contains("theilSen") || e.getCause != null)
  }

  test("quantileNormalize: identity on a single group; shifted group lands on reference order stats") {
    // one group == reference → every value maps to itself
    val one = (1 to 9).map(i => ("a", i.toDouble, i.toLong)).toDF("g", "v", "id")
    Quality.quantileNormalize(one, "g", "v", "id").collect().foreach { r =>
      assert(r.getAs[Long]("norm_cents") == r.getAs[Long]("value_cents"))
    }
    // group b is a +1000 shift of group a: after normalization b's rank-r
    // value must land on the REFERENCE order stat at ceil(r*N/ng)
    val two = ((1 to 4).map(i => ("a", i.toDouble, i.toLong)) ++
      (1 to 4).map(i => ("b", 1000.0 + i, 100L + i))).toDF("g", "v", "id")
    val got = Quality.quantileNormalize(two, "g", "v", "id")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("norm_cents")).toMap
    // all cents sorted: 100,200,300,400,100100,...,100400 (N=8)
    val ref = Seq(100L, 200L, 300L, 400L, 100100L, 100200L, 100300L, 100400L)
    for (r <- 1 to 4) {
      val k = (r * 8 + 3) / 4 // ceil(r*N/ng)
      assert(got(r.toLong) == ref(k - 1), s"group a rank $r")
      assert(got(100L + r) == ref(k - 1), s"group b rank $r")
    }
  }
}
