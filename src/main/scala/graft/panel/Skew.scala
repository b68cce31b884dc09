package graft.panel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew handling for shuffled equi-joins (SURVEY scale rules; the
  * technique the engine reaches for when AQE's runtime skew-split is not
  * available — e.g. a deliberately partitioned write, or a skew so hot a
  * single post-split partition still dominates).
  *
  * `saltedJoin` appends a salt ∈ [0, salts) to the big (fact) side's join
  * key and replicates the small-but-unbroadcastable (dim) side once per
  * salt value, so one hot key's rows spread over `salts` reducers instead
  * of melting one. Join semantics are unchanged: every fact row still
  * meets every dim row of its key exactly once (the dim replica with the
  * matching salt). Cost: dim side ×salts — use for dims too big to
  * broadcast but far smaller than the fact side.
  */
object Skew {

  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    // any per-row spread works — salt values never reach the output
    val saltedFact = fact.withColumn(
      "__salt", pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val saltedDim = dim.withColumn(
      "__salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedFact
      .join(saltedDim, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
