package graft

import graft.text.Sampling

/** IPF raking goldens: three passes on a well-conditioned grid land
  * both weighted marginals on uniform, under-represented cells get
  * up-weighted, and mass is conserved. The sp14 catalog query pins the
  * unrolled fixpoint against DuckDB at sf0.01. */
class RakingSpec extends SparkSpec {
  import spark.implicits._

  test("rakingWeights: both marginals uniform after 3 passes; scarce " +
    "cells up-weighted; mass conserved") {
    // skewed 2×2: (a,x)=30, (a,y)=10, (b,x)=10, (b,y)=10
    val rows = Seq.fill(30)(("a", "x")) ++ Seq.fill(10)(("a", "y")) ++
      Seq.fill(10)(("b", "x")) ++ Seq.fill(10)(("b", "y"))
    val df = rows.toDF("lang", "source")
    val r = Sampling.rakingWeights(df, "lang", "source").collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        (x.getLong(2), x.getDouble(3), x.getDouble(4))).toMap
    assert(r.size == 4)
    // fitted shares: each row marginal and each col marginal ≈ 1/2
    def share(k: (String, String)) = r(k)._3
    val rowA = share(("a", "x")) + share(("a", "y"))
    val colX = share(("a", "x")) + share(("b", "x"))
    assert(math.abs(rowA - 0.5) < 1e-3, s"row marginal $rowA")
    assert(math.abs(colX - 0.5) < 1e-3, s"col marginal $colX")
    // total fitted mass conserved at ~1
    assert(math.abs(r.values.map(_._3).sum - 1.0) < 1e-3)
    // the over-represented cell is down-weighted, scarce b-cells up
    assert(r(("a", "x"))._2 < 1.0)
    assert(r(("b", "y"))._2 > 1.0)
    intercept[ParameterError] {
      Sampling.rakingWeights(df, "lang", "source", iterations = 0)
    }
  }
}
