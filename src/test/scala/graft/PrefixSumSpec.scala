package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.panel.PrefixSum

/** Direct contract tests for the two-level bucket scan — the helper
  * ~15 catalog queries stand on (qn1/Woe/KS/Mann-Whitney/conformal/
  * eval family/ev17/ev37). Each prefix result is checked EXACTLY
  * against the naive single-window formulation it replaces; the naive
  * form is the spec, the scan is the scale-safe implementation. */
class PrefixSumSpec extends SparkSpec {

  import spark.implicits._

  /** Naive reference: one unpartitioned inclusive window. */
  private def naive(hist: DataFrame, vCol: String,
      sums: Seq[(String, String)]): DataFrame =
    sums.foldLeft(hist) { case (df, (out, c)) =>
      df.withColumn(out, sum(col(c)).over(
        Window.orderBy(col(vCol))
          .rowsBetween(Window.unboundedPreceding, 0)))
    }

  private def sortedRows(df: DataFrame, vCol: String): Seq[Seq[Any]] =
    df.orderBy(col(vCol)).collect().toSeq.map(_.toSeq)

  test("inclusive (fixed width) matches the naive window exactly — " +
    "negative values bucket monotonically, multi-sum pairs ride once") {
    val hist = Seq(
      (-2100000L, 3L, 10L), (-1L, 1L, 2L), (0L, 5L, 1L),
      (999999L, 2L, 4L), (1000000L, 7L, 6L), (3500000L, 11L, 8L))
      .toDF("__v", "__a", "__b")
    val got = PrefixSum.inclusive(hist, "__v",
      Seq("__ca" -> "__a", "__cb" -> "__b"))
    val want = naive(hist, "__v", Seq("__ca" -> "__a", "__cb" -> "__b"))
    assert(sortedRows(got, "__v") == sortedRows(want, "__v"))
  }

  test("inclusiveAuto matches naive on continuous doubles, on a wide " +
    "integer domain, and on the span=0 single-value edge") {
    val cont = (1 to 500).map(i =>
      (math.sin(i.toDouble) * 1000.0, i.toLong)).toDF("__v", "__c")
    assert(sortedRows(PrefixSum.inclusiveAuto(cont, "__v", Seq("__s" -> "__c")), "__v")
      == sortedRows(naive(cont, "__v", Seq("__s" -> "__c")), "__v"))
    val wide = Seq((0L, 1L), (1L, 2L), (1000000000000L, 3L), (-5000000000L, 4L))
      .toDF("__v", "__c")
    assert(sortedRows(PrefixSum.inclusiveAuto(wide, "__v", Seq("__s" -> "__c")), "__v")
      == sortedRows(naive(wide, "__v", Seq("__s" -> "__c")), "__v"))
    val const = Seq((42.0, 7L)).toDF("__v", "__c")
    assert(PrefixSum.inclusiveAuto(const, "__v", Seq("__s" -> "__c"))
      .select("__s").head().getLong(0) == 7L)
  }

  test("grouped inclusiveAuto: prefixes reset per group and equal the " +
    "per-group naive window — groups with disjoint value ranges probe " +
    "independent widths") {
    // group "a": small domain; group "b": values 10^9 apart — a shared
    // width would degenerate one of them
    val hist = (
      (1 to 50).map(i => ("a", i.toDouble, i.toLong)) ++
        (1 to 50).map(i => ("b", i * 1e9, (100 + i).toLong))
      ).toDF("__g", "__v", "__c")
    val got = PrefixSum.inclusiveAuto(
      hist, "__v", Seq("__s" -> "__c"), partCols = Seq("__g"))
    val want = hist.withColumn("__s", sum(col("__c")).over(
      Window.partitionBy("__g").orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, 0)))
    assert(got.orderBy("__g", "__v").collect().toSeq.map(_.toSeq)
      == want.orderBy("__g", "__v").collect().toSeq.map(_.toSeq))
    // reset proof: group b's first prefix is ITS own count, not a+its
    val bFirst = got.where(col("__g") === "b").orderBy("__v").head()
    assert(bFirst.getAs[Long]("__s") == 101L)
  }

  test("null and NaN order values RAISE loudly (the r8 advice " +
    "contract) instead of silently dropping from the offsets join") {
    val withNull = Seq((Some(1.0), 1L), (None, 2L), (Some(3.0), 3L))
      .toDF("__v", "__c")
    val e1 = intercept[Exception] {
      PrefixSum.inclusiveAuto(withNull, "__v", Seq("__s" -> "__c")).collect()
    }
    assert(e1.getMessage != null && e1.getMessage.contains("PrefixSum"))
    val withNan = Seq((1.0, 1L), (Double.NaN, 2L)).toDF("__v", "__c")
    val e2 = intercept[Exception] {
      PrefixSum.inclusive(withNan, "__v", Seq("__s" -> "__c"),
        bucketWidth = 0.5).collect()
    }
    assert(e2.getMessage != null && e2.getMessage.contains("PrefixSum"))
  }

  test("plan shape: the only unpartitioned window orders the bucket " +
    "key; value windows are bucket-partitioned") {
    val hist = (1 to 100).map(i => (i.toDouble / 7.0, i.toLong))
      .toDF("__v", "__c")
    // static plan: AQE wraps the tree and hides children pre-execution
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try PrefixSum.inclusiveAuto(hist, "__v", Seq("__s" -> "__c"))
        .queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExecBase => w
    }
    assert(windows.nonEmpty)
    windows.filter(_.partitionSpec.isEmpty).foreach { w =>
      assert(w.orderSpec.exists(_.child.references.exists(_.name == "__psb")),
        s"unpartitioned window not on the bucket key: $w")
    }
  }

  test("exactQuantiles: order statistics with the micro-integer ceiling " +
    "rank (a18)") {
    import spark.implicits._
    // group a: 1..10; group b: 1..150 — q=0.9 on n=150 is the IEEE trap:
    // 0.9*150 = 135.00000000000003 in binary, naive ceil says 136; the
    // micro-quantized rank says 135
    val df = ((1 to 10).map(i => ("a", i.toLong)) ++
      (1 to 150).map(i => ("b", i.toLong))).toDF("g", "v")
    val r = graft.panel.Quantiles.exactQuantiles(
      df, Seq("g"), col("v"), qs = Seq(0.5, 0.9, 1.0))
      .collect().map(x => (x.getString(0), x.getDouble(1)) ->
        ((x.getLong(2), x.getLong(3)))).toMap
    assert(r(("a", 0.5)) == ((10L, 5L)))
    assert(r(("a", 0.9)) == ((10L, 9L)))
    assert(r(("a", 1.0)) == ((10L, 10L)))
    assert(r(("b", 0.5)) == ((150L, 75L)))
    assert(r(("b", 0.9)) == ((150L, 135L))) // not 136
    assert(r(("b", 1.0)) == ((150L, 150L)))
    // ties: the k-th order statistic of a constant run is that value
    val ties = Seq(("t", 1L), ("t", 2L), ("t", 2L), ("t", 2L), ("t", 9L))
      .toDF("g", "v")
    val rt = graft.panel.Quantiles.exactQuantiles(
      ties, Seq("g"), col("v"), qs = Seq(0.5))
      .collect().map(x => x.getLong(3)).head
    assert(rt == 2L)
    intercept[ParameterError](
      graft.panel.Quantiles.exactQuantiles(df, Seq("g"), col("v"), Nil))
    intercept[ParameterError](
      graft.panel.Quantiles.exactQuantiles(df, Seq("g"), col("v"), Seq(1.5)))
    intercept[ParameterError](
      graft.panel.Quantiles.exactQuantiles(df, Seq("g"), col("v"),
        Seq(0.5, 0.5)))
  }
}
