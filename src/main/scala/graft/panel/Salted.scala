package graft.panel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ParameterError

/** Explicit key salting for SKEWED equi-joins — the manual remedy when
  * AQE's runtime skew split can't apply (static plans, non-shuffle-join
  * strategies pinned by hints, or a dimension too large to broadcast
  * but small enough to replicate `salts` ways).
  *
  * The problem shape: a fact table joining on a LOW-CARDINALITY or
  * heavy-tailed key (3 returnflags, one bot user, one giant domain)
  * sort-merges into as many tasks as there are distinct hot keys — a
  * 1000-executor cluster idles behind 3 stragglers. Salting re-keys
  * the join on (key, salt): each fact row takes ONE deterministic salt
  * from a row-unique column's hash (so the join stays row-identical,
  * no duplicate matches), while the dim side replicates every row
  * across ALL `salts` — join cost |fact| + |dim|·salts, parallelism
  * min(distinct keys · salts, partitions).
  *
  * Result-identical to the plain equi-join BY CONSTRUCTION: every fact
  * row meets exactly the one replicated dim row carrying its salt.
  * The oracle therefore runs the PLAIN join — the hash-equality proof
  * that salting changed the plan, not the answer.
  */
object Salted {

  /** Inner equi-join of `fact` ⋈ `dim` on `key`, spread over `salts`
    * sub-keys. `rowIdCol` must be unique per fact row (drives the
    * deterministic salt assignment). Dim rows must be unique per key
    * (the usual dimension contract — violations would duplicate in the
    * plain join identically). */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      rowIdCol: String,
      salts: Int = 32): DataFrame = {
    if (salts < 1) throw new ParameterError(s"salts must be >= 1: $salts")
    val f = fact.withColumn("__salt",
      pmod(xxhash64(col(rowIdCol)), lit(salts.toLong)))
    val d = dim.select(
      col("*"),
      explode(sequence(lit(0L), lit(salts - 1L))).as("__salt"))
    f.join(d, Seq(key, "__salt")).drop("__salt")
  }
}
