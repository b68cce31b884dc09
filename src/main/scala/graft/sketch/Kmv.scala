package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al.
  * 2002; Beyer et al. 2007) as pure relational algebra — the
  * bottom-k order statistic of a uniform hash estimates cardinality
  * as (k−1)/θ where θ is the k-th smallest hash mapped to [0, 1).
  * Unlike HLL it supports set INTERSECTION estimates (the k smallest
  * of a union are computable from two sketches), and unlike
  * approx_count_distinct its state is a plain k-row frame that joins,
  * unions, and persists like any other table.
  *
  * Hashes come from the catalog's md5 unit hash (15 hex chars →
  * [0, 2⁶⁰), engine-independent by construction — DuckDB spells the
  * same bytes), so the estimate is DETERMINISTIC and the oracle
  * replays it exactly: this sketch is hash-pinned by the gate, not
  * just bound-checked.
  *
  * Selection shape: the bottom-k per group is TWO bounded window
  * passes, never one global sort — rank within (group, hash mod
  * `fanout`) salt lanes first (each lane keeps ≤ k rows), then rank
  * the surviving ≤ fanout·k rows per group. The second window's
  * input is bounded by construction (fanout·k rows per group — a
  * parameter product, not data cardinality), the same two-level
  * discipline as panel.PrefixSum. Sketches built on disjoint shards
  * merge by union + the same re-rank, which is what makes the build
  * a partial aggregate at 100 TB.
  */
object Kmv {

  /** Domain size of [[unitHash]]: 16¹⁵ = 2⁶⁰. */
  val HashDomain: Double = math.pow(2.0, 60)

  /** Engine-independent uniform hash for a key: the first 60 bits of
    * md5("kmv|key") as a long in [0, 2⁶⁰) — equal to the oracle's
    * `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`, computed by the
    * native [[graft.functions.Md5Prefix60]] kernel (digest + shift, no
    * hex-string round-trip; KmvSpec pins equality with the builtin
    * conv/substring/md5 chain). */
  def unitHash(key: Column): Column =
    graft.functions.Md5Prefix60.md5Prefix60(
      concat_ws("|", lit("kmv"), key))

  /** Per-group KMV sketch frame: the k smallest distinct key hashes,
    * `(groupCols..., __h, __rk)` with `__rk` in [1, k]. Bounded output
    * (k rows per group); both windows are bounded by construction
    * (salt lanes then fanout·k). */
  def sketch(
      df: DataFrame,
      keyCol: String,
      groupCols: Seq[String],
      k: Int,
      fanout: Int = 64): DataFrame = {
    require(k >= 16, s"k >= 16 for a usable error bound: $k")
    require(fanout >= 1, s"fanout >= 1: $fanout")
    val g = groupCols.map(col)
    // distinct BEFORE hashing: (group, key) and (group, hash) have the
    // same cardinality (hash is a function of key), and md5 on the
    // deduplicated frame skips every duplicate row's digest. Null keys
    // are EXCLUDED (the count_distinct stance — concat_ws would
    // otherwise silently fold them onto the constant-"kmv" hash)
    val hashed = df
      .where(col(keyCol).isNotNull)
      .select(g :+ col(keyCol).as("__k"): _*)
      .distinct()
      .select(g :+ unitHash(col("__k")).as("__h"): _*)
    bottomK(hashed, groupCols, k, fanout)
  }

  /** Bottom-k rows by `__h` per group (carrying any other columns):
    * the two-level salt-lane selection — rank within (group, h mod
    * fanout) lanes first (each keeps ≤ k), then rank the surviving
    * ≤ fanout·k rows per group. Input must be distinct on
    * (groupCols, __h). */
  private[graft] def bottomK(
      hashed: DataFrame,
      groupCols: Seq[String],
      k: Int,
      fanout: Int): DataFrame = {
    val g = groupCols.map(col)
    val lane = Window
      .partitionBy(g :+ pmod(col("__h"), lit(fanout.toLong)): _*)
      .orderBy(col("__h"))
    val grp = Window.partitionBy(g: _*).orderBy(col("__h"))
    hashed
      .withColumn("__lr", row_number().over(lane))
      .where(col("__lr") <= k) // ≤ fanout·k rows per group survive
      .withColumn("__rk", row_number().over(grp))
      .where(col("__rk") <= k)
      .drop("__lr")
  }

  /** Pairwise set-overlap estimates from per-group [[sketch]] frames —
    * the operation KMV supports and HLL does not do exactly: the
    * bottom-k of A ∪ B is computable from the two sketches alone, and
    * of those k union-minima the fraction ρ/k present in BOTH sketches
    * estimates |A∩B| / |A∪B| (Beyer et al. 2007), so
    * est(A∩B) = ρ/k · est(A∪B) — every ingredient a deterministic
    * function of the md5 hashes, so the oracle replays the estimate
    * EXACTLY (contrast sk5's HLL inclusion-exclusion, which is only
    * bound-checked). Sub-k pairs (both sketches complete) report the
    * exact union and intersection counts.
    *
    * Shape: the pair frame is |groups|² — dimension-bounded (the sk5
    * stance); merged sketches attach via two group-key equi-joins;
    * the union bottom-k is the same two-level lane selection. Output
    * (group_a, group_b, n_kept, est_union, est_intersection). */
  def overlapEstimates(
      sk: DataFrame,
      groupCol: String,
      k: Int,
      fanout: Int = 64): DataFrame = {
    val groups = sk.select(col(groupCol).as("__g")).distinct()
    val pairs = groups.as("x").join(groups.as("y"),
      col("x.__g") < col("y.__g"))
      .select(col("x.__g").as("__ga"), col("y.__g").as("__gb"))
    def side(tag: String, key: Column) = sk
      .select(col(groupCol).as("__k0"), col("__h"))
      .join(pairs, col("__k0") === key)
      .select(col("__ga"), col("__gb"), col("__h"),
        lit(tag == "a").as("__ina"), lit(tag == "b").as("__inb"))
    val merged = side("a", col("__ga")).unionByName(side("b", col("__gb")))
      .groupBy(col("__ga"), col("__gb"), col("__h"))
      .agg(max(col("__ina")).as("__ina"), max(col("__inb")).as("__inb"))
    bottomK(merged, Seq("__ga", "__gb"), k, fanout)
      .groupBy(col("__ga").as("group_a"), col("__gb").as("group_b"))
      .agg(count(lit(1)).as("n_kept"),
        max(when(col("__rk") === k, col("__h"))).as("__theta"),
        sum(when(col("__ina") && col("__inb"), 1L).otherwise(0L)).as("__rho"))
      .select(col("group_a"), col("group_b"), col("n_kept"),
        round(when(col("__theta").isNull, col("n_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble) /
            (col("__theta").cast("double") / lit(HashDomain))), 6)
          .as("est_union"),
        round(when(col("__theta").isNull, col("__rho").cast("double"))
          .otherwise(col("__rho").cast("double") / lit(k.toDouble) *
            (lit((k - 1).toDouble) /
              (col("__theta").cast("double") / lit(HashDomain)))), 6)
          .as("est_intersection"))
  }

  /** Distinct-count estimates from a [[sketch]] frame: one row per
    * group, `(groupCols..., n_kept, estimate)`. A group with fewer
    * than k distinct hashes is EXACT (estimate = its kept-row count);
    * otherwise estimate = (k−1)/θ with θ = k-th smallest hash scaled
    * to [0, 1), rounded 6dp (both engines divide the same integers —
    * IEEE-exact replay). */
  def estimate(sk: DataFrame, groupCols: Seq[String], k: Int): DataFrame = {
    val g = groupCols.map(col)
    sk.groupBy(g: _*)
      .agg(count(lit(1)).as("n_kept"),
        max(when(col("__rk") === k, col("__h"))).as("__theta"))
      .select(g ++ Seq(col("n_kept"),
        round(when(col("__theta").isNull, col("n_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble) /
            (col("__theta").cast("double") / lit(HashDomain))), 6)
          .as("estimate")): _*)
  }
}
