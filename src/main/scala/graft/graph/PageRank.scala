package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ParameterError

/** Weighted PageRank by power iteration — link analysis for
  * web-corpus curation (domain authority as a quality prior: a
  * RefinedWeb-style pipeline weights documents by where the link graph
  * says they sit, not just what they contain).
  *
  * Scale shape per iteration: ONE equi-join of the node-rank frame
  * onto the edge list keyed by source (both shuffle on the node key —
  * NOT a broadcast: at web scale the rank frame is billions of rows),
  * one sum per destination, one bounded dangling-mass scalar row
  * crossJoined back. Edge transition probabilities w/W_src are
  * precomputed once. Everything else is per-row arithmetic; iteration
  * count is fixed (power iteration, not convergence-polled).
  *
  * Determinism (the logreg-GD stance): ranks live as pico-quantized
  * BIGINTs; each edge contribution rounds r_src·(w/W_src) to picos
  * per-row (identical IEEE inputs in any engine), so the per-dst sums
  * are exact integer additions and a SQL oracle can replay every
  * iteration as unrolled CTEs. */
object PageRank {

  /** `(node, rank)` after `iterations` damped power steps over
    * `edges` (srcCol, dstCol, weightCol; weights must be positive).
    * Ranks sum to ~1 (pico-rounding drift only). Dangling mass is
    * redistributed uniformly. */
  def pagerank(
      edges: DataFrame,
      iterations: Int,
      damping: Double = 0.85,
      srcCol: String = "src",
      dstCol: String = "dst",
      weightCol: String = "weight"): DataFrame = {
    if (iterations <= 0)
      throw new ParameterError(s"iterations must be positive: $iterations")
    if (damping <= 0 || damping >= 1)
      throw new ParameterError(s"damping must be in (0, 1): $damping")
    val nodes = edges.select(col(srcCol).as("node"))
      .unionByName(edges.select(col(dstCol).as("node")))
      .distinct()
      .localCheckpoint(eager = false)
    // transition probability per edge: w / W_src, precomputed once
    val probs = edges
      .join(edges.groupBy(col(srcCol)).agg(sum(col(weightCol)).as("__W")),
        srcCol)
      .select(col(srcCol).as("__s"), col(dstCol).as("__d"),
        (col(weightCol).cast("double") / col("__W")).as("__p"))
      .localCheckpoint(eager = false)
    val n = nodes.count()
    if (n == 0) throw new ParameterError("pagerank: empty edge list")
    val basePico = math.round((1.0 - damping) / n * 1e12)
    val initPico = math.round(1.0 / n * 1e12)

    var ranks = nodes.withColumn("__r", lit(initPico))
    for (_ <- 1 to iterations) {
      val contribs = probs
        .join(ranks.select(col("node").as("__s"), col("__r")), "__s")
        .groupBy(col("__d").as("node"))
        .agg(sum(round(col("__r").cast("double") * col("__p"), 0).cast("long"))
          .as("__c"))
      // dangling mass: ranks on nodes with no out-edges, one scalar row
      val dangling = ranks
        .join(probs.select(col("__s").as("node")).distinct(),
          Seq("node"), "left_anti")
        .agg(coalesce(sum(col("__r")), lit(0L)).as("__dm"))
      ranks = ranks.select(col("node"))
        .join(contribs, Seq("node"), "left")
        .crossJoin(dangling)
        .select(col("node"),
          (lit(basePico) +
            round(lit(damping) * (coalesce(col("__c"), lit(0L)) +
              round(col("__dm").cast("double") / n, 0).cast("long"))
              .cast("double"), 0).cast("long")).as("__r"))
        .localCheckpoint(eager = false)
    }
    ranks.select(col("node"), (col("__r").cast("double") / 1e12).as("rank"))
  }
}
