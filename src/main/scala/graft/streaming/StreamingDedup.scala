package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.dedup.Dedup

/** Streaming near-duplicate detection — the continuous-ingest companion
  * to the batch [[graft.dedup.Dedup.simhashNearPairs]].
  *
  * Shape: the simhash fingerprint is a pure per-row column expression
  * (no windows, no aggregations), so it runs under any streaming output
  * mode; band keys explode exactly like the batch hamming-LSH path; and
  * within-bucket matching becomes KEYED STATE — each (band, key) group
  * keeps the last `maxState` fingerprints it has seen and emits a match
  * row whenever a new document lands within `maxHamming` of a kept one.
  * Matches are found ACROSS micro-batches (the whole point of the
  * streaming path: a duplicate arriving an hour after its original is
  * still caught, bounded only by the state cap, not the batch boundary).
  *
  * Scale notes:
  *  - State per bucket is a capped ring (newest `maxState` kept): the
  *    streaming analogue of the batch `maxBucket` guard — a degenerate
  *    bucket forgets oldest fingerprints instead of growing without
  *    bound. 2×8 bytes × maxState × live buckets bounds the state store.
  *  - A pair that agrees on several bands is emitted once per agreeing
  *    band (append-mode state is per-group; cross-group dedup would need
  *    another shuffle). Downstream consumers dedup per micro-batch with
  *    `dropDuplicates` or tolerate the multiplicity, like the batch
  *    path's pre-`distinct()` stream.
  */
object StreamingDedup {

  final case class BandedDoc(bucket: String, docId: Long, simhash: Long)
  final case class NearMatch(idA: Long, idB: Long, hamming: Int)
  final case class BucketState(ids: Array[Long], hashes: Array[Long])

  /** Per-row fingerprint + exploded band keys — usable on a streaming or
    * batch frame. The bucket key embeds the band index, so one stateful
    * grouping covers all bands (mirrors the batch melt). */
  def banded(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      bits: Int = 64,
      bands: Int = 8): DataFrame = {
    val width = bits / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val bandArr = array((0 until bands).map(b =>
      shiftright(col("simhash"), b * width).bitwiseAND(mask)): _*)
    // the native one-pass expression, not Dedup.simhash: the HOF form
    // re-walks the word array once per bit (64 interpreted passes/row at
    // the default width) — too slow for continuous ingest — and the
    // codegen'd exploded aggregation (simhashDf) cannot run before
    // flatMapGroupsWithState in append mode. Fingerprints are
    // bit-identical across all forms (spec-asserted).
    docs
      .withColumn("simhash",
        graft.functions.SimHash.simhashNative(col(textCol), bits))
      .select(col(idCol).as("docId"), col("simhash"),
        posexplode(bandArr).as(Seq("__band", "__key")))
      .select(
        concat_ws(":", col("__band"), col("__key")).as("bucket"),
        col("docId"), col("simhash"))
  }

  /** Streaming near-pairs: groupByKey(bucket) + flatMapGroupsWithState.
    * Append mode. `stateTtl` (e.g. "2 hours") evicts a bucket's state
    * after that long without new arrivals — the state-store analogue of
    * a dedup watermark: duplicates farther apart than the TTL are no
    * longer caught, and the store stays bounded by ACTIVE buckets
    * instead of all buckets ever seen. None = state lives for the run
    * (the `maxState` ring still caps each bucket). */
  def nearPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxHamming: Int = 3,
      bits: Int = 64,
      bands: Int = 8,
      maxState: Int = 1000,
      stateTtl: Option[String] = None): Dataset[NearMatch] = {
    require(maxHamming < bands, "pigeonhole banding needs maxHamming < bands")
    val spark = docs.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    banded(docs, idCol, textCol, bits, bands)
      .as[BandedDoc]
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(
        OutputMode.Append, timeoutConf)(
        matchWithinBucket(maxHamming, maxState, stateTtl))
  }

  /** The per-bucket state transition: compare each arriving fingerprint
    * against the kept ones (popcount), emit matches, append to the ring.
    * A timed-out invocation drops the bucket's state and emits nothing. */
  private[graft] def matchWithinBucket(
      maxHamming: Int, maxState: Int, stateTtl: Option[String] = None)(
      bucket: String,
      rows: Iterator[BandedDoc],
      state: GroupState[BucketState]): Iterator[NearMatch] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    require(maxState > 0, "maxState must be positive")
    // Fixed-capacity ring + hash membership: O(1) append/evict and O(1)
    // re-delivery probe per arrival (the previous `ids :+ id` copied both
    // state arrays per arrival — a burst of m docs into one hot bucket
    // cost O(m·maxState) allocations). The O(size) popcount scan per
    // arrival is inherent to within-bucket matching.
    val prior = state.getOption
    val priorIds = prior.map(_.ids).getOrElse(Array.empty[Long])
    val priorHashes = prior.map(_.hashes).getOrElse(Array.empty[Long])
    val cap = maxState
    val ids = new Array[Long](cap)
    val hashes = new Array[Long](cap)
    val n0 = math.min(priorIds.length, cap) // newest cap entries survive
    System.arraycopy(priorIds, priorIds.length - n0, ids, 0, n0)
    System.arraycopy(priorHashes, priorHashes.length - n0, hashes, 0, n0)
    var head = 0 // ring index of the oldest kept entry
    var size = n0
    val seen = new java.util.HashSet[java.lang.Long](cap * 2)
    var i = 0
    while (i < size) { seen.add(ids(i)); i += 1 }
    val out = scala.collection.mutable.ListBuffer.empty[NearMatch]
    rows.foreach { doc =>
      // at-least-once sources re-deliver: a docId still in the ring
      // already emitted its matches — skip entirely, so duplicates
      // neither re-emit nor evict real fingerprints from the ring
      if (seen.add(doc.docId)) {
        var j = 0
        while (j < size) { // oldest→newest, matching the pre-ring order
          val idx = (head + j) % cap
          val d = java.lang.Long.bitCount(hashes(idx) ^ doc.simhash)
          if (d <= maxHamming)
            out += NearMatch(
              math.min(ids(idx), doc.docId), math.max(ids(idx), doc.docId), d)
          j += 1
        }
        if (size < cap) {
          val idx = (head + size) % cap
          ids(idx) = doc.docId; hashes(idx) = doc.simhash; size += 1
        } else { // full: overwrite the oldest in place
          seen.remove(ids(head))
          ids(head) = doc.docId; hashes(head) = doc.simhash
          head = (head + 1) % cap
        }
      }
    }
    // materialize oldest→newest for the state encoder
    val outIds = new Array[Long](size)
    val outHashes = new Array[Long](size)
    i = 0
    while (i < size) {
      val idx = (head + i) % cap
      outIds(i) = ids(idx); outHashes(i) = hashes(idx)
      i += 1
    }
    state.update(BucketState(outIds, outHashes))
    stateTtl.foreach(state.setTimeoutDuration)
    out.iterator
  }
}
