package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Two paths:
  *  - [[bruteForceTopK]] — exact cosine top-k. The queries side is small
  *    and broadcast; the corpus streams through one pass; top-k is a
  *    per-query window rank. Cost O(|Q|·|corpus|·d) FLOPs fully
  *    distributed — correct baseline at any scale where |Q| is bounded.
  *  - [[signLshTopK]] — sign-pattern (hyperplane-sign) LSH: bucket by the
  *    sign bits of `dims` fixed components, search only the query's
  *    bucket. The bucket join is an equi-join; recall trades off with
  *    bucket count exactly as random-hyperplane LSH (the "hyperplanes"
  *    are the coordinate axes — deterministic, engine-independent).
  *
  * Dot products use `zip_with` + `aggregate` over the array columns —
  * sequential, deterministic summation order (left-to-right), so results
  * are bit-reproducible across engines, unlike a shuffled float sum.
  */
object Similarity {

  /** Codegen'd native dot product ([[graft.functions.DotProduct]]) —
    * bit-identical to the HOF formulation
    * `aggregate(zip_with(a,b,_*_), 0d, _+_)` (same sequential double
    * accumulation; equivalence asserted in DedupSimSpec), ~6× faster
    * because higher-order functions evaluate interpreted. */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotProduct.dotNative(a, b)

  /** The pure-builtin formulation, kept as the portability reference. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d > 0, dot(a, b) / d).otherwise(0.0)
  }

  /** Codegen'd native squared distance ([[graft.functions.SquaredDistance]])
    * — bit-identical to [[euclideanHof]] (same sequential accumulation),
    * keeps the IVF cell-assignment loop in whole-stage codegen. */
  def euclidean(a: Column, b: Column): Column =
    sqrt(graft.functions.SquaredDistance.squaredDistanceNative(a, b))

  /** The pure-builtin formulation, kept as the portability reference. */
  def euclideanHof(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val diff = x.cast("double") - y.cast("double")
        diff * diff
      }),
      lit(0.0),
      (acc, v) => acc + v))

  /** cosine from a pairwise dot and per-side norms precomputed once per
    * vector — identical IEEE result to [[cosine]] (same op order), but
    * the norm aggregates run |corpus| times instead of |pairs| times.
    * zip_with/aggregate are interpreted (no codegen), so trimming HOF
    * evaluations per pair is the lever. */
  def cosinePrenormed(a: Column, b: Column, na: Column, nb: Column): Column = {
    val d = na * nb
    when(d > 0, dot(a, b) / d).otherwise(0.0)
  }

  /** Exact cosine top-k of `corpus` for each row of `queries`.
    * Output: (query_id, neighbor_id, cosine, rank). Ties broken by
    * neighbor id for full determinism. */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      norm(col(vecCol)).as("__qn"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      norm(col(vecCol)).as("__cn"))
    val scored = c
      .crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        round(cosinePrenormed(col("__qv"), col("__cv"), col("__qn"), col("__cn")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Coarse LSH bucket key: sign bits of the first `dims` vector
    * components, e.g. "+-+-". element_at is 1-based (parity with SQL). */
  def signBucket(vec: Column, dims: Int = 4): Column =
    concat_ws("", (1 to dims).map(i =>
      when(element_at(vec, i) >= 0, lit("+")).otherwise(lit("-"))): _*)

  /** LSH-bucketed ANN: search only within the query's sign bucket.
    * Same output shape as bruteForceTopK; recall < 1 by design. */
  def signLshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      dims: Int = 4): DataFrame = {
    val q = queries.select(
      col(idCol).as("query_id"), col(vecCol).as("__qv"),
      norm(col(vecCol)).as("__qn"),
      signBucket(col(vecCol), dims).as("__bk"))
    val c = corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      norm(col(vecCol)).as("__cn"),
      signBucket(col(vecCol), dims).as("__bk"))
    val scored = c
      .join(broadcast(q), "__bk")
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        round(cosinePrenormed(col("__qv"), col("__cv"), col("__qn"), col("__cn")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** IVF-probe ANN: assign corpus AND queries to their nearest centroid
    * cell ([[assignCells]]), then exact cosine top-k WITHIN the query's
    * cell only. The probe is an equi-join on cell_id with the (small)
    * query side broadcast — the corpus streams once, reading only
    * |corpus|/|cells| candidates per query in expectation. This is the
    * ANN scale path when sign-buckets ([[signLshTopK]]) are too coarse:
    * cell granularity follows the centroid count, not 2^dims. Recall < 1
    * by design; `nprobe` > 1 probes the query's nprobe nearest cells
    * (union) for materially better recall at nprobe× the candidate
    * volume — the corpus keeps its single-cell assignment, so each
    * (query, neighbor) pair still appears at most once and no dedup
    * shuffle is needed. */
  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      centroids: DataFrame, // (cell_id, centroid array<float>)
      idCol: String,
      vecCol: String,
      k: Int,
      nprobe: Int = 1): DataFrame = {
    val c = assignCells(corpus, centroids, vecCol, idCol)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
        norm(col(vecCol)).as("__cn"), col("cell_id"))
    val qAssigned =
      if (nprobe <= 1) assignCells(queries, centroids, vecCol, idCol)
      else probeCells(queries, centroids, vecCol, idCol, nprobe)
    val q = qAssigned
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
        norm(col(vecCol)).as("__qn"), col("cell_id"))
    val scored = c
      .join(broadcast(q), "cell_id")
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        round(cosinePrenormed(col("__qv"), col("__cv"), col("__qn"), col("__cn")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Multi-probe assignment: each vector's `nprobe` nearest cells — one
    * output row per (vector, probed cell). For the QUERY side of
    * [[ivfTopK]], which is small by contract (it gets broadcast), so the
    * row_number window over the ×|centroids| blowup is driver-trivial;
    * the corpus side should keep [[assignCells]]'s sort-free min_by. */
  def probeCells(
      vectors: DataFrame,
      centroids: DataFrame, // (cell_id, centroid array<float>)
      vecCol: String,
      idCol: String = "vec_id",
      nprobe: Int = 2): DataFrame = {
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("__dist"), col("cell_id"))
    vectors
      .crossJoin(broadcast(centroids))
      .withColumn("__dist", euclidean(col(vecCol), col("centroid")))
      .withColumn("__probe", row_number().over(w))
      .where(col("__probe") <= nprobe)
      .drop("__dist", "__probe", "centroid")
  }

  /** IVF-style coarse quantization: assign each vector to its nearest of
    * `centroids` (small, broadcast); ANN then probes only matching cells.
    * Centroids come from any upstream clustering (e.g. sampled k-means).
    *
    * Scale shape: broadcast cross join → `min_by` hash aggregation keyed
    * on the vector id. The partial (map-side) aggregate collapses the
    * ×|centroids| row blowup before the single shuffle on `idCol`, and
    * no sort is needed — strictly better than a row_number window over
    * the blown-up relation. Ties break on the lower cell_id. */
  def assignCells(
      vectors: DataFrame,
      centroids: DataFrame, // (cell_id, centroid array<float>)
      vecCol: String,
      idCol: String = "vec_id"): DataFrame = {
    val others = vectors.columns.filter(_ != idCol)
    val best = vectors
      .crossJoin(broadcast(centroids))
      .withColumn("__dist", euclidean(col(vecCol), col("centroid")))
      .groupBy(col(idCol))
      .agg(min_by(
        struct(others.map(col) :+ col("cell_id"): _*),
        struct(col("__dist"), col("cell_id"))).as("__best"))
    best.select(
      col(idCol) +: others.map(c => col(s"__best.`$c`")) :+ col("__best.cell_id"): _*)
  }
}
