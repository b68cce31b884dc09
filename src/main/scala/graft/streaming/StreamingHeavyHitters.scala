package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ParameterError

/** Streaming heavy hitters — the Space-Saving summary (Metwally,
  * Agrawal & El Abbadi 2005) as keyed streaming state: the continuous
  * answer to "which keys are hot RIGHT NOW" (scraper IPs on an ingest
  * log, runaway dedup buckets, hot sids) without counting every key
  * ever seen.
  *
  * Sharding: keys hash into `shards` state groups, so each key lives
  * in exactly ONE shard's summary — per-shard results are globally
  * correct for their keys with no cross-shard merge, and the state
  * store is bounded by shards × capacity entries regardless of the
  * key universe (the streaming analogue of the batch `maxBucket`
  * stance: bounded memory by construction, error bounded and
  * REPORTED, never an unbounded map).
  *
  * Space-Saving guarantees, per shard with capacity m over n arrivals:
  * `count` overestimates a key's true frequency by at most its `err`
  * (the evicted minimum it inherited), true frequency ≥ count − err,
  * and any key with true frequency > n/m is IN the summary. Capacity
  * sizes to the 1/support you care about, not to the traffic.
  */
object StreamingHeavyHitters {

  final case class ShardedKey(shard: Int, key: String)
  /** `count` is the Space-Saving upper bound; `err` its max
    * overestimate (0 for keys tracked since their first arrival). */
  final case class HeavyHitter(shard: Int, key: String, count: Long, err: Long)
  final case class ShardState(
      keys: Array[String], counts: Array[Long], errs: Array[Long])

  /** Stream (or batch) frame → per-shard Space-Saving summaries,
    * emitted in UPDATE mode each micro-batch (every batch re-emits the
    * full summary of each shard that saw data — the consumer upserts
    * by (shard, key)). `minCount` suppresses the noise tail at emit
    * time only; the summary itself always keeps `capacity` entries.
    * `stateTtl` evicts idle shards like [[StreamingDedup.nearPairs]]. */
  def topKeys(
      events: DataFrame,
      keyCol: String,
      capacity: Int = 100,
      shards: Int = 32,
      minCount: Long = 1L,
      stateTtl: Option[String] = None): Dataset[HeavyHitter] = {
    if (capacity < 1) throw new ParameterError(s"capacity must be >= 1: $capacity")
    if (shards < 1) throw new ParameterError(s"shards must be >= 1: $shards")
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .select(pmod(hash(col(keyCol)), lit(shards)).cast("int").as("shard"),
        col(keyCol).cast("string").as("key"))
      .as[ShardedKey]
      .groupByKey(_.shard)
      .flatMapGroupsWithState(OutputMode.Update, timeoutConf)(
        summarize(capacity, minCount, stateTtl))
  }

  /** The per-shard transition: fold the batch's arrivals through the
    * Space-Saving update, persist, emit the summary.
    *
    * Uses the paper's Stream-Summary structure: entries grouped into
    * count buckets (a TreeMap over ≤ capacity+1 distinct counts, each
    * an insertion-ordered key set), so increment and eviction are
    * O(log buckets) instead of the naive O(capacity) min scan — the
    * StreamStateBench tail-churn workload (nearly every arrival
    * evicting) measured 4.16 M arrivals/s vs 51 k/s (82×). Eviction takes the OLDEST entry at the minimum count —
    * deterministic for a given arrival order. */
  private[graft] def summarize(
      capacity: Int, minCount: Long, stateTtl: Option[String] = None)(
      shard: Int,
      rows: Iterator[ShardedKey],
      state: GroupState[ShardState]): Iterator[HeavyHitter] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val cnt = scala.collection.mutable.HashMap[String, Long]()
    val err = scala.collection.mutable.HashMap[String, Long]()
    val buckets = new java.util.TreeMap[Long, java.util.LinkedHashSet[String]]()
    def link(k: String, c: Long): Unit =
      buckets.computeIfAbsent(c, _ => new java.util.LinkedHashSet[String]())
        .add(k): Unit
    def unlink(k: String, c: Long): Unit = {
      val set = buckets.get(c)
      set.remove(k)
      if (set.isEmpty) buckets.remove(c): Unit
    }
    state.getOption.foreach { s =>
      var i = 0
      while (i < s.keys.length) {
        cnt.put(s.keys(i), s.counts(i))
        err.put(s.keys(i), s.errs(i))
        link(s.keys(i), s.counts(i))
        i += 1
      }
    }
    rows.foreach { r =>
      cnt.get(r.key) match {
        case Some(c) =>
          unlink(r.key, c); link(r.key, c + 1)
          cnt.put(r.key, c + 1)
        case None if cnt.size < capacity =>
          cnt.put(r.key, 1L); err.put(r.key, 0L); link(r.key, 1L)
        case None =>
          val minEntry = buckets.firstEntry()
          val mc = minEntry.getKey
          val victim = minEntry.getValue.iterator().next()
          unlink(victim, mc)
          cnt.remove(victim); err.remove(victim)
          cnt.put(r.key, mc + 1); err.put(r.key, mc); link(r.key, mc + 1)
      }
    }
    // Persist in bucket order (ascending count, insertion order within
    // a bucket): the restore loop re-links in array order, so each
    // bucket's LinkedHashSet order — and hence the eviction victim — is
    // reproduced across micro-batch boundaries. A HashMap-order dump
    // here would scramble bucket insertion order at every batch edge,
    // making results depend on batch segmentation, not arrival order.
    val keys = {
      val b = scala.collection.mutable.ArrayBuffer.empty[String]
      buckets.values.forEach(set => set.forEach(k => b += k))
      b.toArray
    }
    state.update(ShardState(keys, keys.map(cnt), keys.map(err)))
    stateTtl.foreach(state.setTimeoutDuration)
    keys.iterator.collect {
      case k if cnt(k) >= minCount => HeavyHitter(shard, k, cnt(k), err(k))
    }.toSeq.sortBy(h => (-h.count, h.key)).iterator
  }
}
