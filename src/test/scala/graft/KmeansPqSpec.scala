package graft

import org.apache.spark.sql.functions._

import graft.sim.Similarity

/** K-means centroid training and product-quantization ADC search. */
class KmeansPqSpec extends SparkSpec {
  import spark.implicits._

  private def centroidMap(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Double]] =
    df.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toList).toMap

  test("kmeansCentroids golden: 2D, k=2 converges to the two column " +
    "means; iters=0 returns the seeds (sim5)") {
    val pts = Seq(
      (0L, Seq(0f, 0f)), (1L, Seq(0f, 2f)),
      (2L, Seq(10f, 0f)), (3L, Seq(10f, 2f)))
      .toDF("vec_id", "embedding")
    val seeds = centroidMap(Similarity.kmeansCentroids(pts, k = 2, iters = 0))
    assert(seeds == Map(0L -> List(0.0, 0.0), 1L -> List(0.0, 2.0)))
    // iter 1: cell0 ← {p0, p2}, cell1 ← {p1, p3} → (5,0) / (5,2);
    // iter 2 reassigns identically → fixed point
    for (it <- Seq(1, 2, 3)) {
      val c = centroidMap(Similarity.kmeansCentroids(pts, k = 2, iters = it))
      assert(c == Map(0L -> List(5.0, 0.0), 1L -> List(5.0, 2.0)), s"iters=$it")
    }
  }

  test("kmeansCentroids: a cell losing every vector keeps its previous " +
    "centroid; ties assign to the lower cell") {
    val pts = Seq(
      (0L, Seq(0f, 0f)), (1L, Seq(0f, 0f)), (2L, Seq(9f, 9f)))
      .toDF("vec_id", "embedding")
    // duplicate seeds (0,0)/(0,0): every point ties to cell 0, cell 1
    // empties and must survive with its seed centroid
    val c = centroidMap(Similarity.kmeansCentroids(pts, k = 2, iters = 1))
    assert(c(0L) == List(3.0, 3.0))
    assert(c(1L) == List(0.0, 0.0))
  }

  test("kmeansCentroids is invariant under repartitioning (micro-integer " +
    "component sums)") {
    val pts = spark.range(100).select(
      col("id").as("vec_id"),
      array((0 until 8).map(d =>
        (sin(col("id") * (d + 1)) * 3.7).cast("float")): _*).as("embedding"))
    val a = centroidMap(Similarity.kmeansCentroids(pts, k = 5, iters = 3))
    val b = centroidMap(Similarity.kmeansCentroids(pts.repartition(7), k = 5, iters = 3))
    assert(a == b)
    assert(a.keySet == Set(0L, 1L, 2L, 3L, 4L))
    assert(a.values.forall(_.length == 8))
  }

  private lazy val codebook = Seq(
    (0, 0, Seq(0f, 0f)), (0, 1, Seq(10f, 10f)),
    (1, 0, Seq(0f, 0f)), (1, 1, Seq(10f, 10f)))
    .toDF("subspace", "code", "subcentroid")

  test("pqEncode picks the nearest sub-centroid per subspace, codes in " +
    "subspace order (sim6)") {
    val vecs = Seq(
      (1L, Seq(1f, 0f, 9f, 9f)),
      (2L, Seq(9f, 9f, 1f, 1f)),
      (3L, Seq(0f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val codes = Similarity.pqEncode(vecs, codebook)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    assert(codes == Map(
      1L -> List(0, 1), 2L -> List(1, 0), 3L -> List(0, 0)))
  }

  test("pqTopK golden: ADC distance = sum of per-subspace exact " +
    "query-to-centroid distances; ascending rank, self excluded") {
    val vecs = Seq(
      (1L, Seq(1f, 0f, 9f, 9f)), // codes (0, 1)
      (2L, Seq(9f, 9f, 1f, 1f)), // codes (1, 0)
      (0L, Seq(0f, 0f, 10f, 10f))) // the query; codes (0, 1)
      .toDF("vec_id", "embedding")
    val encoded = Similarity.pqEncode(vecs, codebook)
    val out = Similarity.pqTopK(
      vecs.where(col("vec_id") === 0), encoded, codebook, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    // q subvectors: (0,0) and (10,10).
    // v1 → dt[0][code 0] + dt[1][code 1] = 0 + 0 = 0
    // v2 → dt[0][code 1] + dt[1][code 0] = 200 + 200 = 400
    assert(out.toList == List((0L, 1L, 0.0, 1), (0L, 2L, 400.0, 2)))
  }

  test("ivfadcTopK prunes candidates to the probed cells and scores by " +
    "ADC; nprobe widens the reach (sim7)") {
    val vecs = Seq(
      (0L, Seq(0f, 0f, 0f, 0f)), (1L, Seq(0f, 0f, 10f, 10f)),
      (2L, Seq(10f, 10f, 0f, 0f)), (3L, Seq(10f, 10f, 10f, 10f)))
      .toDF("vec_id", "embedding")
    val centroids = Seq(
      (0L, Seq(0f, 0f, 0f, 0f)), (1L, Seq(10f, 10f, 10f, 10f)))
      .toDF("cell_id", "centroid")
    // cells: v0→0; v1, v2 tie (200 vs 200) → lower cell 0; v3→1
    val q = vecs.where(col("vec_id") === 0)
    val one = Similarity.ivfadcTopK(q, vecs, centroids, codebook, k = 5)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toList
    assert(one == List((1L, 200.0), (2L, 200.0))) // v3 pruned: other cell
    val two = Similarity.ivfadcTopK(q, vecs, centroids, codebook, k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toList
    assert(two == List((1L, 200.0), (2L, 200.0), (3L, 400.0)))
  }

  test("published index search matches ivfadcTopK; the codes scan is " +
    "dynamically partition-pruned to the probed cells (sim8)") {
    val vecs = Seq(
      (0L, Seq(0f, 0f, 0f, 0f)), (1L, Seq(0f, 0f, 10f, 10f)),
      (2L, Seq(10f, 10f, 0f, 0f)), (3L, Seq(10f, 10f, 10f, 10f)))
      .toDF("vec_id", "embedding")
    // Int cell ids: the read-back partition column is inferred Int, and
    // a cast on the partition key would silently disable DPP
    val centroids = Seq(
      (0, Seq(0f, 0f, 0f, 0f)), (1, Seq(10f, 10f, 10f, 10f)))
      .toDF("cell_id", "centroid")
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_test").toString
    try {
      Similarity.writeIvfadcIndex(dir, vecs, centroids, codebook)
      val q = vecs.where(col("vec_id") === 0)
      val fromIndex = Similarity.searchIvfadcIndex(spark, dir, q, k = 5)
      val inMemory = Similarity.ivfadcTopK(q, vecs, centroids, codebook, k = 5)
      assert(fromIndex.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet ==
        inMemory.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet)
      // the IVF probe happens at the STORAGE layer: the parquet scan of
      // the codes carries a dynamic-pruning filter on cell_id, so only
      // the probed cells' files are read. At KB test scale the planner's
      // cost heuristic (scan bytes × fallbackFilterRatio > build size)
      // says pruning isn't worth it — raise the ratio to see the
      // at-scale plan, where the codes dwarf any query batch
      val stats = spark.conf.get(
        "spark.sql.optimizer.dynamicPartitionPruning.useStats")
      val ratio = spark.conf.get(
        "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio")
      try {
        spark.conf.set(
          "spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
        spark.conf.set(
          "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio",
          "100000")
        // the DPP rule looks for a surviving selective Filter on the
        // query side — over a LocalRelation the filter constant-folds
        // away first, so back the queries with parquet as production would
        vecs.write.mode("overwrite").parquet(s"$dir/vecs")
        val qp = spark.read.parquet(s"$dir/vecs").where(col("vec_id") === 0)
        val plan = Similarity.searchIvfadcIndex(spark, dir, qp, k = 5)
          .queryExecution.executedPlan.toString
        assert(plan.toLowerCase.contains("dynamicpruning"), plan)
      } finally {
        spark.conf.set(
          "spark.sql.optimizer.dynamicPartitionPruning.useStats", stats)
        spark.conf.set(
          "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", ratio)
      }
    } finally {
      def del(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(del))
        f.delete(): Unit
      }
      del(new java.io.File(dir))
    }
  }

  test("PQ validation: malformed codebooks raise ParameterError, " +
    "non-tiling vectors fail loudly instead of encoding a prefix") {
    val vecs = Seq((1L, Seq(1f, 0f, 9f, 9f))).toDF("vec_id", "embedding")
    // codes not dense within a subspace
    val gappy = Seq((0, 0, Seq(0f, 0f)), (0, 2, Seq(10f, 10f)),
      (1, 0, Seq(0f, 0f)), (1, 1, Seq(10f, 10f)))
      .toDF("subspace", "code", "subcentroid")
    intercept[ParameterError](Similarity.pqEncode(vecs, gappy))
    // subspaces not dense
    val skipped = Seq((0, 0, Seq(0f, 0f)), (2, 0, Seq(0f, 0f)))
      .toDF("subspace", "code", "subcentroid")
    intercept[ParameterError](Similarity.pqEncode(vecs, skipped))
    // non-uniform sub-dimension
    val ragged = Seq((0, 0, Seq(0f, 0f)), (1, 0, Seq(0f, 0f, 0f)))
      .toDF("subspace", "code", "subcentroid")
    intercept[ParameterError](Similarity.pqEncode(vecs, ragged))
    // 6-dim vector cannot tile the 2×2 codebook → runtime raise, not a
    // silent prefix encode
    val bad = Seq((1L, Seq(1f, 0f, 9f, 9f, 1f, 1f))).toDF("vec_id", "embedding")
    val e = intercept[Exception](Similarity.pqEncode(bad, codebook).collect())
    assert(e.getMessage != null &&
      (e.getMessage.contains("does not tile") ||
        Option(e.getCause).exists(_.getMessage.contains("does not tile"))))
  }

  test("end-to-end ANN train→index→search: kmeans centroids (double " +
    "precision) feed ivfadcTopK over float vectors") {
    val vecs = Seq(
      (0L, Seq(0f, 0f, 0f, 0f)), (1L, Seq(0f, 0f, 10f, 10f)),
      (2L, Seq(10f, 10f, 0f, 0f)), (3L, Seq(10f, 10f, 10f, 10f)),
      (4L, Seq(1f, 1f, 1f, 1f)), (5L, Seq(9f, 9f, 9f, 9f)))
      .toDF("vec_id", "embedding")
    val trained = Similarity.kmeansCentroids(vecs, k = 2, iters = 2)
    val out = Similarity.ivfadcTopK(
      vecs.where(col("vec_id") === 0), vecs, trained, codebook,
      k = 5, nprobe = 1)
      .collect().map(r => r.getLong(1)).toList
    // v0's trained cell contains the low-corner points; every returned
    // neighbor must come from it and be ADC-ordered
    assert(out.nonEmpty && out.forall(Set(1L, 2L, 4L).contains))
  }

  test("pqTopK plan shape: the encoded corpus streams once — no " +
    "Generate/explode, queries + codebook broadcast, rank-limited top-k") {
    val vecs = Seq(
      (0L, Seq(0f, 0f, 0f, 0f)), (1L, Seq(0f, 0f, 10f, 10f)),
      (2L, Seq(10f, 10f, 0f, 0f)), (3L, Seq(10f, 10f, 10f, 10f)))
      .toDF("vec_id", "embedding")
    val encoded = Similarity.pqEncode(vecs, codebook)
    val out = Similarity.pqTopK(
      vecs.where(col("vec_id") === 0), encoded, codebook, k = 2)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"),
      "ADC scoring must not explode the corpus codes")
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastNestedLoopJoin"),
      "query+distance-table side must broadcast")
    assert(plan.contains("WindowGroupLimit"),
      "top-k must execute rank-limited, not sort-everything")
    assert(out.count() == 2)
  }

  test("pqTopK matches brute force when quantization is lossless " +
    "(vectors ON the codebook grid)") {
    // every vector IS a codebook point → ADC distance = true distance
    val vecs = Seq(
      (0L, Seq(0f, 0f, 0f, 0f)), (1L, Seq(0f, 0f, 10f, 10f)),
      (2L, Seq(10f, 10f, 0f, 0f)), (3L, Seq(10f, 10f, 10f, 10f)))
      .toDF("vec_id", "embedding")
    val encoded = Similarity.pqEncode(vecs, codebook)
    val pq = Similarity.pqTopK(vecs.where(col("vec_id") === 0), encoded, codebook, k = 3)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toList
    // true squared distances from v0: v1 = 200, v2 = 200, v3 = 400
    assert(pq == List((1L, 200.0), (2L, 200.0), (3L, 400.0)))
  }
}
