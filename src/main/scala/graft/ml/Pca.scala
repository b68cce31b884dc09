package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ParameterError

/** PCA over an embedding column — the whitening/level-0 reduction step
  * of embedding curation pipelines (SemDeDup clusters in a reduced
  * space; Matryoshka-style truncation evaluation wants the variance
  * captured per direction).
  *
  * Decomposition strategy for Spark: the DATA pass is distributed (one
  * aggregate computes the d×d Gram/scatter matrix; d is the embedding
  * dimension, 64-4096 — dimension-bounded), the EIGEN step runs on the
  * driver over that d×d matrix (a bounded collect, the same contract as
  * the PQ codebook validation), and the projection is a per-row
  * codegen'd expression with the loadings inlined as literals — zero
  * shuffles after the Gram aggregate.
  *
  * Determinism (the PageRank pico-exact stance): Gram terms are
  * quantized per row (`round(eᵢ·eⱼ·q)` — identical IEEE inputs in any
  * engine) and summed as exact integers, so the matrix is order-free
  * under any partitioning; the power iteration runs in integer
  * fixed-point (products and sums of BIGINTs, normalization by the
  * max-|u| component via a double division + trunc — deterministic
  * per-value, no tie rule in play), so a SQL oracle replays every step
  * as unrolled CTEs.
  *
  * Overflow contract: the iteration needs `max|G_micro|·10⁶·d < 2⁶³`,
  * i.e. with unit-norm embeddings roughly `n·10⁶·d·max|eᵢeⱼ| < 2⁶³` —
  * ~10⁸ vectors at d=64. Beyond that, shrink `gramQuantum` (the Gram
  * scale cancels in the normalized iteration); [[topComponent]] checks
  * the bound loudly instead of wrapping.
  */
object Pca {

  /** Upper triangle (i ≤ j, 0-based) of the quantized Gram matrix
    * Σ_rows round(eᵢ·eⱼ·quantum): `(i, j, g_q)`.
    *
    * Per-partition imperative accumulation (one of the two documented
    * mapPartitions seams is exactly this shape): a posexplode² outer
    * product would materialize n·d(d+1)/2 rows — a 2 080× row
    * amplification at d=64, ruinous on 100 TB of embeddings — while
    * the accumulator emits d(d+1)/2 partial rows PER PARTITION. The
    * per-term `rint(eᵢ·eⱼ·quantum)` happens before any addition and
    * partials merge by exact integer sum, so the result is identical
    * to the expression form under any partitioning (PcaSpec pins it
    * against a driver brute force). Partial overflow bound:
    * quantum·max|eᵢeⱼ|·rows-per-partition < 2⁶³ — at the pico default
    * and unit-norm vectors, ~10⁷ rows per partition. */
  def gram(embs: DataFrame, vecCol: String = "embedding",
      quantum: Double = 1e12): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    embs.select(col(vecCol)).as[Seq[Float]]
      .mapPartitions { it =>
        var acc: Array[Long] = null
        var d = 0
        it.foreach { v =>
          if (acc == null) { d = v.length; acc = new Array[Long](d * (d + 1) / 2) }
          require(v.length == d, s"ragged embedding: ${v.length} != $d")
          var i = 0
          var k = 0
          while (i < d) {
            val ei = v(i).toDouble
            var j = i
            while (j < d) {
              // half-AWAY-from-zero, matching Spark round()/DuckDB
              // round() (rint would be half-even; Math.round half-up —
              // both diverge from the oracle on negative .5 ties)
              val t = ei * v(j).toDouble * quantum
              acc(k) += (if (t >= 0) math.floor(t + 0.5) else math.ceil(t - 0.5)).toLong
              k += 1; j += 1
            }
            i += 1
          }
        }
        if (acc == null) Iterator.empty
        else {
          var i = 0; var k = 0
          val out = new scala.collection.mutable.ArrayBuffer[(Long, Long, Long)](acc.length)
          while (i < d) {
            var j = i
            while (j < d) { out += ((i.toLong, j.toLong, acc(k))); k += 1; j += 1 }
            i += 1
          }
          out.iterator
        }
      }
      .toDF("i", "j", "g_q")
      .groupBy("i", "j").agg(sum(col("g_q")).as("g_q"))
  }

  /** Top principal direction as micro fixed-point loadings
    * (index → round-to-trunc(vᵢ·10⁶), normalized so the max-|·|
    * component is exactly ±10⁶), via `steps` integer power-iteration
    * steps over the micro-quantized Gram matrix. Driver-side over the
    * d×d collect (bounded); the heavy pass is the distributed [[gram]].
    */
  def topComponent(embs: DataFrame, vecCol: String = "embedding",
      steps: Int = 8): Array[Long] = {
    if (steps <= 0) throw new ParameterError(s"steps must be positive: $steps")
    val tri = gram(embs, vecCol, quantum = 1e6).collect() // bounded: d(d+1)/2 rows
    if (tri.isEmpty) throw new ParameterError("topComponent: no vectors")
    val d = tri.map(_.getLong(1)).max.toInt + 1
    val g = Array.ofDim[Long](d, d)
    tri.foreach { r =>
      val (i, j, v) = (r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2))
      g(i)(j) = v; g(j)(i) = v
    }
    val gMax = g.flatten.map(math.abs).max
    if (gMax > Long.MaxValue / 1000000L / d)
      throw new ParameterError(
        s"topComponent: Gram magnitude $gMax overflows the fixed-point " +
          s"iteration at d=$d; shrink gramQuantum (see object doc)")
    var v = Array.fill(d)(1000000L)
    for (_ <- 1 to steps) {
      val u = Array.tabulate(d) { i =>
        var acc = 0L
        var j = 0
        while (j < d) { acc += g(i)(j) * v(j); j += 1 }
        acc
      }
      // pivot: max |u| component, smallest index on ties — fixes both
      // the scale and the sign of the iterate
      var k = 0
      var i = 1
      while (i < d) { if (math.abs(u(i)) > math.abs(u(k))) k = i; i += 1 }
      val vsel = u(k)
      if (vsel == 0L)
        throw new ParameterError("topComponent: zero Gram matrix")
      // toLong truncates toward zero — DuckDB trunc() semantics, NOT
      // CAST(AS BIGINT) (which rounds): keep the two engines aligned
      v = u.map(ui => (ui.toDouble / vsel.toDouble * 1e6).toLong)
    }
    v
  }

  /** Per-row projection onto fixed-point `loadings` (micro scale):
    * `score_q = Σⱼ round(eⱼ·loadingⱼ)` — per-term rounding keeps the
    * 64-term sum exact-integer, the whole thing one codegen'd
    * expression with the loadings as literals (no join, no shuffle). */
  def project(embs: DataFrame, idCol: String, vecCol: String,
      loadings: Array[Long]): DataFrame = {
    val lv = array(loadings.map(lit): _*)
    embs.select(col(idCol),
      aggregate(
        zip_with(col(vecCol), lv,
          (e, w) => round(e.cast("double") * w).cast("long")),
        lit(0L), (acc, x) => acc + x).as("score_q"))
  }
}
