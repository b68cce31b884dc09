package graft

import org.apache.spark.sql.functions._

import graft.functions.JaroWinklerSimilarity
import graft.functions.JaroWinklerSimilarity.jaroWinklerNative
import graft.text.Fuzzy

/** Jaro–Winkler native expression + blocked fuzzy join. */
class FuzzySpec extends SparkSpec {
  import spark.implicits._

  test("jaro_winkler: textbook reference values; DuckDB empty " +
    "convention; symmetry") {
    // classic record-linkage reference pairs (Winkler 1990 literature)
    val cases = Seq(
      ("martha", "marhta", 0.961111),
      ("dwayne", "duane", 0.84),
      ("dixon", "dicksonx", 0.813333),
      ("abc", "xyz", 0.0),
      ("a", "a", 1.0),
      ("", "", 0.0), // DuckDB convention: either side empty → 0
      ("ab", "", 0.0))
    val out = cases.map(c => (c._1, c._2)).toDF("a", "b")
      .select(round(jaroWinklerNative(col("a"), col("b")), 6).as("jw"),
        round(jaroWinklerNative(col("b"), col("a")), 6).as("wj"))
      .collect()
    cases.zip(out).foreach { case ((a, b, exp), r) =>
      assert(r.getDouble(0) == exp, s"jw($a, $b)")
      assert(r.getDouble(1) == r.getDouble(0), s"symmetry($a, $b)")
    }
  }

  test("jaro_winkler survives CODEGEN_ONLY (no interpreted fallback) " +
    "and equals the interpreted path") {
    val prevFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val prevFallback = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val pairs = Seq(("small ring", "small rin"), ("red widget", "red gadget"))
        .toDF("a", "b")
      val gen = pairs.select(jaroWinklerNative(col("a"), col("b"))).as[Double]
        .collect().toSeq
      val interp = Seq(
        JaroWinklerSimilarity.similarity(
          org.apache.spark.unsafe.types.UTF8String.fromString("small ring"),
          org.apache.spark.unsafe.types.UTF8String.fromString("small rin")),
        JaroWinklerSimilarity.similarity(
          org.apache.spark.unsafe.types.UTF8String.fromString("red widget"),
          org.apache.spark.unsafe.types.UTF8String.fromString("red gadget")))
      assert(gen == interp)
    } finally {
      prevFactory match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
      spark.conf.set("spark.sql.codegen.fallback", prevFallback)
    }
  }

  test("fuzzyJoin: blocking bounds candidates; an oversized block raises " +
    "by default (the fz1 oracle scores ALL blocked pairs — a silent " +
    "drop would diverge from it); dropOversized drops, never explodes") {
    val left = Seq((1L, "acme corp"), (2L, "acme inc"), (3L, "zenith ltd"))
      .toDF("id", "name")
    val right = Seq((10L, "acme corpx"), (11L, "zenith ltd"), (12L, "nadir co"))
      .toDF("id", "name")
    val out = Fuzzy.fuzzyJoin(left, right, "id", "id", "name", "name",
      n => split(n, " ").getItem(0), minSim = 0.9)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    // acme corp ~ acme corpx (0.98), zenith exact; acme inc vs corpx
    // scores below 0.9; nadir blocks alone
    assert(out == Set((1L, 10L), (3L, 11L)))
    // degenerate block: every row shares one key, maxBlock = 2
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    val e = intercept[Exception] {
      Fuzzy.fuzzyJoin(left, right, "id", "id", "name", "name",
        _ => lit("same"), minSim = 0.01, maxBlock = 2).count()
    }
    assert(messages(e).exists(_.contains("exceeds maxBlock")), e.toString)
    // opt-in: left side (3 rows) drops entirely, right side drops too
    val flood = Fuzzy.fuzzyJoin(left, right, "id", "id", "name", "name",
      _ => lit("same"), minSim = 0.01, maxBlock = 2, dropOversized = true)
    assert(flood.count() == 0)
  }

  test("reciprocalBestMatch: mutual argmax only; ties break by " +
    "partner id ascending") {
    import spark.implicits._
    val scores = Seq(
      ("A", "x", 0.9), ("A", "y", 0.8), ("B", "x", 0.95), ("B", "y", 0.7),
      ("C", "z", 0.85))
      .toDF("l_id", "r_id", "jw")
    val r = Fuzzy.reciprocalBestMatch(scores).collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getDouble(2)).toMap
    // x prefers B (0.95) over A (0.9): (A,x) dies, (B,x) mutual;
    // A's best is x, so (A,y) dies even though y prefers A
    assert(r == Map(("B", "x") -> 0.95, ("C", "z") -> 0.85))
    val tied = Seq(("D", "p", 0.9), ("D", "q", 0.9)).toDF("l_id", "r_id", "jw")
    val t = Fuzzy.reciprocalBestMatch(tied).collect()
      .map(x => (x.getString(0), x.getString(1)))
    assert(t.toSeq == Seq(("D", "p"))) // id-ascending tie-break
  }
}
