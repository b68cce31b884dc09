package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ParameterError

/** Deterministic sampling and splitting for training-data pipelines.
  *
  * Everything keys on a STABLE HASH of an id column rather than an RNG:
  * the same row lands in the same sample/split on every run, every
  * engine, and every cluster size — the property training pipelines need
  * for reproducible corpora and leak-free train/test boundaries (a
  * `rand()`-based sample changes membership under retries/speculative
  * tasks). md5-derived like the dedup family, so the DuckDB oracle
  * reproduces membership bit-for-bit.
  *
  * All operators are codegen'd column predicates on the scan —
  * shuffle-free, volume-linear, trivially pushed past column pruning.
  */
object Sampling {

  /** Uniform hash in [0, 1): first 8 md5 hex chars of (seed|id) as a
    * 32-bit integer scaled by 2⁻³². ~9.3 decimal digits of resolution —
    * plenty for sampling rates; exactly reproducible in any engine with
    * md5 + hex parsing. */
  def hashUnit(id: Column, seed: String = "0"): Column =
    conv(substring(md5(concat_ws("|", lit(seed), id)), 1, 8), 16, 10)
      .cast("double") / 4294967296.0

  /** Deterministic Bernoulli sample: keep rows whose id-hash falls below
    * `rate`. Two samples at rates r1 < r2 with the same seed are NESTED
    * (the r1 sample is a subset of the r2 sample) — growing a corpus
    * keeps every previously selected row. */
  def sampleByHash(df: DataFrame, idCol: String, rate: Double, seed: String = "0"): DataFrame = {
    if (rate < 0 || rate > 1)
      throw new ParameterError(s"sample rate must be in [0, 1]: $rate")
    df.where(hashUnit(col(idCol), seed) < rate)
  }

  /** Per-stratum rates (e.g. downsample crawl data, keep all curated
    * data): `rates` maps stratum value → rate; strata absent from the
    * map keep `defaultRate`. The stratum column stays a plain codegen'd
    * when-chain — no join, no shuffle. */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 0.0,
      seed: String = "0"): DataFrame = {
    (rates.values.toSeq :+ defaultRate).foreach { r =>
      if (r < 0 || r > 1) throw new ParameterError(s"sample rate must be in [0, 1]: $r")
    }
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, r)) =>
      when(col(stratumCol) === k, r).otherwise(acc)
    }
    df.where(hashUnit(col(idCol), seed) < rate)
  }

  /** Deterministic train/val/test (or any weighted) split: each row gets
    * the first split whose cumulative weight exceeds its id-hash.
    * Weights must sum to 1 (tolerance 1e-9). Splits are STABLE under
    * corpus growth and independent of row order/partitioning; use a
    * different `seed` than any sampling pass so membership is
    * uncorrelated with sample selection. */
  def splitByHash(
      df: DataFrame,
      idCol: String,
      splits: Seq[(String, Double)],
      seed: String = "split",
      outCol: String = "split"): DataFrame = {
    if (splits.isEmpty) throw new ParameterError("splits must be non-empty")
    val total = splits.map(_._2).sum
    if (math.abs(total - 1.0) > 1e-9)
      throw new ParameterError(s"split weights must sum to 1: $total")
    val h = hashUnit(col(idCol), seed)
    // decimal accumulation: double 0.8+0.1 is 0.9000000000000001, which
    // would disagree with the 0.9 a user (or the oracle) writes down
    val cum = splits
      .scanLeft(BigDecimal(0))((acc, s) => acc + BigDecimal(s._2.toString)).tail
      .map(_.toDouble)
    // strict left-to-right when-chain on cumulative bounds; the final
    // split is the unconditional tail so hash 0.999999… can't fall out
    val expr = splits.init.zip(cum.init).foldRight(lit(splits.last._1): Column) {
      case (((name, _), bound), acc) => when(h < bound, name).otherwise(acc)
    }
    df.withColumn(outCol, expr)
  }
}
