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

  /** Streaming exact-duplicate suppression: emit only the FIRST
    * occurrence of each document body (md5 of the lowercased trimmed
    * text — [[graft.dedup.Dedup.exactGroups]]' content key) across the
    * stream's lifetime — the continuous-ingest analogue of
    * [[graft.dedup.Dedup.exactGroups]]' keep-first rule. Built on
    * Spark's own dedup state rather than custom
    * flatMapGroupsWithState: `dropDuplicates` keeps one fingerprint
    * per distinct body forever; passing `eventTimeCol` + `delay`
    * switches to `dropDuplicatesWithinWatermark`, whose state evicts
    * once the watermark passes a fingerprint's last-seen event time —
    * the bounded-state form a 24/7 ingest needs (duplicates farther
    * apart than the delay are no longer suppressed: the
    * [[nearPairs]] stateTtl trade, made by the same watermark
    * mechanism every stateful Spark pipeline already uses).
    * Works identically on a batch frame (keep-any semantics there —
    * batch `dropDuplicates` has no arrival order). */
  def exactDedupStream(
      docs: DataFrame,
      textCol: String = "text",
      eventTimeCol: Option[String] = None,
      delay: String = "1 hour"): DataFrame = {
    // md5(lower(trim(…))): the SAME content key as the batch
    // exactGroups, so batch-deduped history and streamed ingest agree
    // on what "exact duplicate" means
    val fp = docs.withColumn("__fp", md5(lower(trim(col(textCol)))))
    val out = eventTimeCol match {
      case Some(t) =>
        fp.withWatermark(t, delay).dropDuplicatesWithinWatermark("__fp")
      case None => fp.dropDuplicates("__fp")
    }
    out.drop("__fp")
  }

  /** Streaming exact n-gram decontamination flags: for each arriving
    * document, emit one row per DISTINCT word n-gram it shares with a
    * STATIC reference set (eval benchmarks) — (id, gram md5). The
    * gram space matches the batch [[graft.dedup.Dedup.ngramOverlap]]
    * exactly, so a doc flagged here is precisely a doc the batch
    * operator would flag; a doc sharing k distinct grams emits k rows
    * (count them for the batch operator's `hits`, or dedup downstream —
    * the [[nearPairs]] per-band multiplicity stance; collapsing to one
    * row per doc would need a stateful streaming aggregation for
    * nothing the consumer can't do).
    *
    * Shape: the stream side is ONE native shingle pass per row +
    * posexplode (stateless, append-safe — no window, no watermark, no
    * state store); the reference side is a batch frame collapsed to
    * distinct gram hashes, broadcast into a stream-static LEFT SEMI
    * equi-join — re-probed per micro-batch at broadcast-hash cost.
    * `broadcastRef = false` degrades to a shuffled stream-static join
    * for an oversized reference, cost still ∝ collision mass. */
  def contaminatedIds(
      docs: DataFrame,
      ref: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 13,
      broadcastRef: Boolean = true): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val refGrams = Dedup.shingleRows(ref, idCol, textCol, n)
      .select(md5(col("__s")).as("__h")).distinct()
    docs
      .select(col(idCol), explode(array_distinct(
        graft.functions.MinHashShingles.shingleArrayNative(col(textCol), n)))
        .as("__s"))
      .select(col(idCol), md5(col("__s")).as("__h"))
      .join(if (broadcastRef) broadcast(refGrams) else refGrams, Seq("__h"),
        "left_semi")
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
    // Zero-copy ring over (prior state ++ append buffer): the prior
    // arrays are scanned in place (no copy-in, no hash set — the
    // re-delivery membership probe FUSES into the popcount scan each
    // arrival already pays), new arrivals land in a growable primitive
    // buffer, and eviction advances a start offset over the logical
    // concatenation. Per arrival: one O(live) scan + amortized-O(1)
    // append. The previous `ids :+ id` copied both state arrays per
    // arrival — a burst of m docs into one hot bucket cost
    // O(m·maxState) allocations.
    val prior = state.getOption
    val baseIds = prior.map(_.ids).getOrElse(Array.empty[Long])
    val baseHashes = prior.map(_.hashes).getOrElse(Array.empty[Long])
    val baseLen = baseIds.length
    val cap = maxState
    var bufIds = new Array[Long](8)
    var bufHashes = new Array[Long](8)
    var bufLen = 0
    var start = math.max(0, baseLen - cap) // oldest live logical index
    val out = scala.collection.mutable.ListBuffer.empty[NearMatch]
    val pending = new scala.collection.mutable.ArrayBuffer[NearMatch](4)
    rows.foreach { doc =>
      pending.clear()
      // at-least-once sources re-deliver: a docId still in the ring
      // already emitted its matches — skip entirely (discard pending),
      // so duplicates neither re-emit nor evict real fingerprints
      var isMember = false
      var li = start
      val total = baseLen + bufLen
      while (li < total && !isMember) { // oldest→newest
        val inBase = li < baseLen
        val id = if (inBase) baseIds(li) else bufIds(li - baseLen)
        if (id == doc.docId) isMember = true
        else {
          val h = if (inBase) baseHashes(li) else bufHashes(li - baseLen)
          val d = java.lang.Long.bitCount(h ^ doc.simhash)
          if (d <= maxHamming)
            pending += NearMatch(
              math.min(id, doc.docId), math.max(id, doc.docId), d)
        }
        li += 1
      }
      if (!isMember) {
        out ++= pending
        if (bufLen == bufIds.length) { // double the append buffer
          bufIds = java.util.Arrays.copyOf(bufIds, bufLen * 2)
          bufHashes = java.util.Arrays.copyOf(bufHashes, bufLen * 2)
        }
        bufIds(bufLen) = doc.docId
        bufHashes(bufLen) = doc.simhash
        bufLen += 1
        if (baseLen + bufLen - start > cap) start += 1 // forget oldest
      }
    }
    // materialize the live window oldest→newest for the state encoder
    val size = baseLen + bufLen - start
    val outIds = new Array[Long](size)
    val outHashes = new Array[Long](size)
    val fromBase = math.max(0, baseLen - start)
    if (fromBase > 0) {
      System.arraycopy(baseIds, start, outIds, 0, fromBase)
      System.arraycopy(baseHashes, start, outHashes, 0, fromBase)
    }
    val bufFrom = math.max(0, start - baseLen)
    System.arraycopy(bufIds, bufFrom, outIds, fromBase, bufLen - bufFrom)
    System.arraycopy(bufHashes, bufFrom, outHashes, fromBase, bufLen - bufFrom)
    state.update(BucketState(outIds, outHashes))
    stateTtl.foreach(state.setTimeoutDuration)
    out.iterator
  }
}
