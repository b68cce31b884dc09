package graft

import org.apache.spark.sql.functions._

import graft.ml.Encoding

/** Target-encoding goldens: out-of-fold sums only (a category's own
  * fold never leaks into its encoding), smoothing shrinks thin cells
  * toward the fold prior, and the whole table matches a plain-Scala
  * replay with the same md5 folds. The cl6 catalog query pins the
  * operator against DuckDB at sf0.01. */
class EncodingSpec extends SparkSpec {
  import spark.implicits._

  test("targetEncode: matches a per-cell replay; leakage-safety and " +
    "shrinkage are visible in the numbers") {
    val rows = (1 to 60).map { i =>
      val cat = Seq("a", "b", "c")(i % 3)
      (i.toLong, cat, (i % 10) * 1.0 + (if (cat == "a") 100.0 else 0.0))
    }
    val df = rows.toDF("id", "cat", "y")
    val out = Encoding.targetEncode(df, "cat", "y", "id",
      folds = 3, smoothing = 10.0, seed = "te")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap

    // replay with the engine's own fold hash (bounded collect)
    val folds = df.select($"id",
        floor(graft.text.Sampling.hashUnit(col("id"), "te") * 3).cast("long"))
      .as[(Long, Long)].collect().toMap
    val cells = rows.groupBy { case (id, cat, _) => (cat, folds(id)) }
      .map { case (k, xs) =>
        k -> (xs.size.toLong, xs.map(x => math.round(x._3 * 100)).sum) }
    val byCat = cells.groupBy(_._1._1).map { case (c, m) =>
      c -> (m.values.map(_._1).sum, m.values.map(_._2).sum) }
    val byFold = cells.groupBy(_._1._2).map { case (f, m) =>
      f -> (m.values.map(_._1).sum, m.values.map(_._2).sum) }
    val (ng, sg) = (cells.values.map(_._1).sum, cells.values.map(_._2).sum)
    assert(out.keySet == cells.keySet)
    cells.foreach { case ((c, f), (n, s)) =>
      val (nc, sc) = byCat(c); val (nf, sf) = byFold(f)
      val prior = (sg - sf).toDouble / (ng - nf) / 100.0
      val enc = ((sc - s).toDouble / 100.0 + 10.0 * prior) /
        ((nc - n).toDouble + 10.0)
      val (on, op, oe) = out((c, f))
      assert(on == n)
      assert(math.abs(op - prior) < 1e-6, s"prior mismatch at ($c,$f)")
      assert(math.abs(oe - enc) < 1e-6, s"encoding mismatch at ($c,$f)")
    }
    // leakage-safety: category a's mean (~104.5) dominates it elsewhere;
    // its encodings sit near the a-mean, b/c encodings near their own
    val aEnc = out.collect { case (("a", _), (_, _, e)) => e }
    assert(aEnc.forall(e => e > 50.0), s"a-encodings too shrunk: $aEnc")
    val bEnc = out.collect { case (("b", _), (_, _, e)) => e }
    assert(bEnc.forall(e => e < 50.0))
    intercept[ParameterError] {
      Encoding.targetEncode(df, "cat", "y", "id", folds = 1)
    }
  }
}
