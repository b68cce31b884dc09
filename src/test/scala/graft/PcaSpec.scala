package graft

import org.apache.spark.sql.functions._

import graft.ml.Pca

/** PCA: Gram matrix vs driver math, power-iterate convergence to the
  * dominant eigendirection, projection algebra, degenerate contracts. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private lazy val embs = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("gram pico upper-triangle == driver brute force") {
    val vecs = embs.select($"embedding").collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    val d = vecs.head.length
    val expect = (for (i <- 0 until d; j <- i until d) yield {
      val s = vecs.map { v =>
        val t = v(i) * v(j) * 1e12 // half-away-from-zero (engine/oracle rule)
        (if (t >= 0) math.floor(t + 0.5) else math.ceil(t - 0.5)).toLong
      }.sum
      ((i.toLong, j.toLong), s)
    }).toMap
    val got = Pca.gram(embs).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got === expect)
  }

  test("topComponent recovers a planted dominant direction") {
    // spiked covariance: strong common direction + deterministic small
    // noise — the eigengap is wide, so 8 fixed-point steps converge.
    // (On near-isotropic data — e.g. the random test embeddings — the
    // spectrum is flat and ANY power method converges slowly; the
    // operator's contract is determinism of the 8-step iterate, which
    // the pca2/pca3 oracles pin on exactly that data.)
    val d = 16
    val spike = Array.tabulate(d)(j => math.sin(j + 1.0))
    val sn = math.sqrt(spike.map(x => x * x).sum)
    val unit = spike.map(_ / sn)
    val rows = (0 until 200).map { r =>
      val noise = Array.tabulate(d)(j => 0.05 * math.cos(3.0 * r + 7.0 * j))
      (r.toLong, Array.tabulate(d)(j => (5.0 * unit(j) + noise(j)).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val v = Pca.topComponent(df).map(_.toDouble / 1e6)
    val cos = math.abs(
      v.zip(unit).map { case (a, b) => a * b }.sum /
        math.sqrt(v.map(x => x * x).sum))
    assert(cos > 0.999, s"cosine to the planted direction was $cos")
    // pivot contract: the max-|.| loading is exactly +-1e6
    assert(Pca.topComponent(df).map(math.abs).max == 1000000L)
  }

  test("project == per-row rounded dot product with the loadings") {
    val loadings = Pca.topComponent(embs)
    val got = Pca.project(embs, "vec_id", "embedding", loadings)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = embs.select($"vec_id", $"embedding").collect().map { r =>
      val v = r.getSeq[Float](1)
      r.getLong(0) -> v.indices.map { j =>
        val t = v(j).toDouble * loadings(j)
        (if (t >= 0) math.floor(t + 0.5) else math.ceil(t - 0.5)).toLong
      }.sum
    }.toMap
    assert(got === expect)
  }

  test("zero matrix and empty input raise loudly") {
    val zero = Seq((1L, Array(0f, 0f)), (2L, Array(0f, 0f)))
      .toDF("vec_id", "embedding")
    assertThrows[ParameterError](Pca.topComponent(zero))
    val empty = zero.where($"vec_id" < 0)
    assertThrows[ParameterError](Pca.topComponent(empty))
  }
}
