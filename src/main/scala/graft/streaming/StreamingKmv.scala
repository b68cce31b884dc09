package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ParameterError
import graft.sketch.Kmv

/** Streaming KMV distinct counting — the continuous "how many unique
  * users/keys so far" a live ingest dashboard reads, with state
  * BOUNDED at k longs per group regardless of the key universe (the
  * property that makes it deployable where a distinct-count state
  * would grow without limit; the streaming analogue of the batch
  * [[graft.sketch.Kmv]] stance).
  *
  * The bottom-k of a union is the bottom-k of the merged bottom-k's,
  * so arrivals fold into state in ANY batch segmentation and the
  * result depends only on the arrival SET — [[StreamingKmvSpec]] pins
  * stream-vs-batch parity against [[Kmv.estimate]] exactly: the hash
  * is the same md5 unit hash, the estimate the same (k−1)/θ division
  * and 6dp rounding, so a streamed group and a batch scan of the same
  * rows report the IDENTICAL estimate. */
object StreamingKmv {

  final case class Keyed(group: String, h: Long)
  final case class KmvState(hashes: Array[Long])
  final case class Estimate(group: String, n_kept: Long, estimate: Double)

  /** Stream (or batch) frame → per-group running distinct estimates,
    * emitted in UPDATE mode each micro-batch. `stateTtl` evicts idle
    * groups (the [[StreamingHeavyHitters.topKeys]] contract). */
  def distinctEstimates(
      events: DataFrame,
      groupCol: String,
      keyCol: String,
      k: Int = 256,
      stateTtl: Option[String] = None): Dataset[Estimate] = {
    if (k < 16) throw new ParameterError(s"k >= 16 for a usable error bound: $k")
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .where(col(keyCol).isNotNull) // the count_distinct stance (batch Kmv)
      .select(col(groupCol).cast("string").as("group"),
        Kmv.unitHash(col(keyCol)).as("h"))
      .as[Keyed]
      .groupByKey(_.group)
      .flatMapGroupsWithState(OutputMode.Update, timeoutConf)(
        fold(k, stateTtl))
  }

  /** Per-group transition: merge the batch's hashes into the bottom-k,
    * persist, emit the estimate. The merged set is distinct-by-hash
    * (KMV is a distinct sketch), kept sorted ascending so the k-th
    * element is θ. */
  private[graft] def fold(k: Int, stateTtl: Option[String] = None)(
      group: String,
      rows: Iterator[Keyed],
      state: GroupState[KmvState]): Iterator[Estimate] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val set = scala.collection.mutable.TreeSet.empty[Long]
    state.getOption.foreach(s => set ++= s.hashes)
    rows.foreach { r =>
      if (set.size < k) set += r.h
      else if (r.h < set.max && !set.contains(r.h)) {
        set += r.h
        set -= set.max
      }
    }
    val arr = set.toArray // ascending
    state.update(KmvState(arr))
    stateTtl.foreach(state.setTimeoutDuration)
    val est =
      if (arr.length < k) arr.length.toDouble
      else {
        val theta = arr(k - 1).toDouble / Kmv.HashDomain
        BigDecimal((k - 1).toDouble / theta)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    Iterator.single(Estimate(group, arr.length.toLong, est))
  }
}
