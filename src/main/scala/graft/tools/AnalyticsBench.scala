package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale rows for the session-4 analytics family (BASELINE.md):
  * CUSUM, skyline, Count-Min, fuzzy join, incremental view merge —
  * deterministic synthetic frames generated distributed via
  * spark.range (no driver materialization), plus the adversarial
  * shapes each operator's guard exists for.
  *
  * Adversarials:
  *  - skyline: a fully-correlated frontier (y = x) makes EVERY point a
  *    skyline point — the level window sees n levels, the worst case
  *    for the exact pass; bucket pre-pruning must not drop any.
  *  - fuzzy: every name shares one blocking token → the block guard
  *    must drop the flood loudly instead of materializing n² pairs.
  *  - cusum: one group holding 1% of the corpus (hot entity) rides the
  *    same window algebra — no per-group driver state to blow up.
  */
object AnalyticsBench {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def release(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
    }

    // ---- CUSUM: 10M rows, 100k groups (+1 hot group with 1% of rows)
    for (n <- Seq(1000000L, 10000000L)) {
      val rows = spark.range(n).select(
        when(pmod(col("id"), lit(100)) === 0, 0L)
          .otherwise(pmod(hash(col("id"), lit(7)).cast("long"), lit(100000)))
          .as("g"),
        col("id").as("t"),
        (pmod(hash(col("id"), lit(9)).cast("long"), lit(2000)).cast("double")
          / 100.0 + when(col("id") % 97 === 0, 50.0).otherwise(0.0)).as("v"))
      rows.count() // warm generation
      val (alarms, s) = time(graft.sources.Quality
        .cusum(rows, "g", "v", Seq("t"), "t", kCents = 500L, hCents = 2000L)
        .count())
      println(f"cusum n=$n: $s%.2f s, $alarms alarms " +
        f"(${s * 1e9 / n}%.0f ns/row)")
      release()
    }

    // ---- Skyline: 10M random points; 1M fully-correlated adversarial
    for (n <- Seq(1000000L, 10000000L)) {
      val pts = spark.range(n).select(col("id"),
        pmod(hash(col("id"), lit(3)).cast("long"), lit(1000000)).as("rev"),
        pmod(hash(col("id"), lit(4)).cast("long"), lit(1000000)).as("qty"))
      pts.count()
      val (k, s) = time(graft.panel.Skyline
        .skyline2d(pts, "id", "rev", "qty", prePruneBuckets = 64).count())
      println(f"skyline n=$n: $s%.2f s, $k survivors")
      release()
    }
    val corr = spark.range(1000000L).select(col("id"),
      col("id").as("rev"), col("id").as("qty"))
    val (kc, sc) = time(graft.panel.Skyline
      .skyline2d(corr, "id", "rev", "qty", prePruneBuckets = 64).count())
    println(f"skyline adversarial-correlated n=1M: $sc%.2f s, " +
      f"$kc survivors (must be 1000000 — every point is optimal)")
    release()

    // ---- Count-Min: build + estimate over 10M rows, ~1M keys
    for (n <- Seq(1000000L, 10000000L)) {
      val rows = spark.range(n).select(
        pmod(hash(col("id"), lit(5)).cast("long"), lit(1000000)).as("k"))
      rows.count()
      val ((cells, est), s) = time {
        val sk = graft.sketch.Cms.build(rows, "k", depth = 4, width = 4096)
        val keys = rows.groupBy("k").agg(count(lit(1)).as("exact"))
        (sk.count(),
          graft.sketch.Cms.estimate(keys, sk, "k", 4, 4096).count())
      }
      println(f"cms n=$n: $s%.2f s ($cells cells, $est keys estimated)")
      release()
    }

    // ---- Fuzzy join: 100k-name dictionaries, realistic blocks; then
    // the one-block flood (guard must drop, not explode)
    val prefixes = Seq("alpha", "beta", "gamma", "delta", "omega",
      "sigma", "kappa", "lambda", "theta", "zeta")
    def names(n: Long, salt: Int): DataFrame =
      spark.range(n).select(col("id"),
        concat_ws(" ",
          element_at(typedLit(prefixes), (pmod(col("id"), lit(10)) + 1).cast("int")),
          conv(pmod(hash(col("id"), lit(salt)).cast("long"), lit(100000)), 10, 16))
          .as("name"))
    // block = prefix word + first hex char (~160 blocks of ~600 names:
    // Σ|L_b|·|R_b| ≈ 60M JW pairs — blocking IS the cost model; the
    // first-word-only variant (10 blocks of 10k → 10⁹ pairs) is exactly
    // the mistake the maxBlock guard turns from a hang into a drop)
    for (n <- Seq(100000L)) {
      val l = names(n, 11); val r = names(n, 11) // same salt: real matches
      l.count(); r.count()
      val blockFine = (c: org.apache.spark.sql.Column) =>
        concat(split(c, " ").getItem(0), substring(split(c, " ").getItem(1), 1, 1))
      val (m, s) = time(graft.text.Fuzzy.fuzzyJoin(
        l, r, "id", "id", "name", "name",
        blockFine, minSim = 0.95, maxBlock = 20000).count())
      println(f"fuzzy n=$n blocked: $s%.2f s, $m matches")
      release()
      // explicit drop opt-in (r11: the default now RAISES on an
      // oversized block — this row times the recall-tolerant path)
      val (fm, fs) = time(graft.text.Fuzzy.fuzzyJoin(
        l.withColumn("name", concat(lit("same "), col("name"))),
        r.withColumn("name", concat(lit("same "), col("name"))),
        "id", "id", "name", "name",
        c => split(c, " ").getItem(0), minSim = 0.95, maxBlock = 20000,
        dropOversized = true).count())
      println(f"fuzzy adversarial one-block n=$n: $fs%.2f s, $fm matches " +
        "(opt-in guard drops the flood — must not be n^2)")
      release()
    }

    // ---- Incremental view merge: 10M-key view + 1M-row delta
    val base = spark.range(10000000L).select(col("id").as("k"),
      lit(3L).as("n_rows"),
      (pmod(hash(col("id")), lit(100000)).cast("long") * 3).as("sum_cents"))
    val delta = spark.range(1000000L).select(
      (col("id") * 10).as("k"),
      when(col("id") % 4 === 0, -1L).otherwise(1L).as("n_rows"),
      when(col("id") % 4 === 0, -100L).otherwise(100L).as("sum_cents"))
    base.count(); delta.count()
    val (vk, vs) = time(graft.panel.Changelog
      .mergeAggView(base, delta, Seq("k")).count())
    println(f"mergeAggView 10M base + 1M delta: $vs%.2f s, $vk keys " +
      "(cost is view+delta — the 100 TB base is never re-read)")

    spark.stop()
  }
}
