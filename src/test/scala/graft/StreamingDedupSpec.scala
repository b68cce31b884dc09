package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}

import graft.streaming.StreamingDedup

/** Streaming near-dup: simhash banding + keyed state. The decisive
  * property is the CROSS-micro-batch match — a duplicate arriving in a
  * later batch is caught against state from an earlier one, so the two
  * batches run through ONE continuous query (a restart would reset the
  * un-checkpointed state).
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog again and again today"

  test("cross-batch near-duplicates are caught via bucket state; " +
    "unrelated docs are not") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val qname = "sdedup_out"
    val q = StreamingDedup.nearPairs(docs, maxHamming = 7)
      .writeStream.outputMode("append")
      .format("memory").queryName(qname)
      .start()
    try {
      // batch 1: the original + an unrelated doc
      input.addData((1L, base),
        (9L, "completely different content about spark engines and data pipelines"))
      q.processAllAvailable()
      assert(spark.table(qname).count() == 0) // nothing near yet

      // batch 2: an exact dup of doc 1 (hamming 0) — matched against STATE
      input.addData((2L, base))
      q.processAllAvailable()
      val matches = spark.table(qname).as[StreamingDedup.NearMatch]
        .collect().map(m => (m.idA, m.idB, m.hamming)).toSet
      assert(matches == Set((1L, 2L, 0))) // the one logical pair...
      // ...emitted once per agreeing band (identical fingerprints agree
      // on all 8) — the documented per-band multiplicity
      assert(spark.table(qname).count() == 8L)
    } finally q.stop()
  }

  test("state ring cap bounds degenerate buckets (streaming maxState guard)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val qname = "sdedup_cap"
    val q = StreamingDedup.nearPairs(docs, maxHamming = 3, maxState = 2)
      .writeStream.outputMode("append")
      .format("memory").queryName(qname)
      .start()
    try {
      // four identical docs in order: with only the newest 2 kept per
      // bucket, each arrival matches the ≤2 predecessors still in the
      // ring → pairs (1,2),(1,3),(2,3),(2,4),(3,4) but NOT the
      // forgotten (1,4)
      input.addData((1L, base), (2L, base), (3L, base), (4L, base))
      q.processAllAvailable()
      val pairs = spark.table(qname).as[StreamingDedup.NearMatch]
        .collect().map(m => (m.idA, m.idB)).toSet
      assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)))
    } finally q.stop()
  }

  test("matchWithinBucket unit: popcount filter and pair ordering") {
    val state = TestGroupState.create[StreamingDedup.BucketState](
      org.apache.spark.api.java.Optional.empty[StreamingDedup.BucketState](),
      GroupStateTimeout.NoTimeout, 0L,
      org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)
    val out = StreamingDedup.matchWithinBucket(maxHamming = 1, maxState = 10)(
      "b", Iterator(
        StreamingDedup.BandedDoc("b", 5L, 0x0FL),
        StreamingDedup.BandedDoc("b", 3L, 0x0EL), // hamming 1 from 0x0F
        StreamingDedup.BandedDoc("b", 7L, 0xF0L)), // far from both
      state).toList
    assert(out == List(StreamingDedup.NearMatch(3L, 5L, 1)))
    assert(state.get.ids.toSeq == Seq(5L, 3L, 7L)) // all three retained
  }

  test("re-delivered docIds are idempotent: no duplicate emits, no ring " +
    "eviction (at-least-once sources)") {
    val state = TestGroupState.create[StreamingDedup.BucketState](
      org.apache.spark.api.java.Optional.empty[StreamingDedup.BucketState](),
      GroupStateTimeout.NoTimeout, 0L,
      org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)
    val doc = StreamingDedup.BandedDoc("b", 1L, 0x0FL)
    val near = StreamingDedup.BandedDoc("b", 2L, 0x0EL)
    val out = StreamingDedup.matchWithinBucket(maxHamming = 1, maxState = 10)(
      "b", Iterator(doc, doc, near, doc), state).toList
    // the pair emits ONCE; re-deliveries of doc 1 add nothing
    assert(out == List(StreamingDedup.NearMatch(1L, 2L, 1)))
    assert(state.get.ids.toSeq == Seq(1L, 2L)) // ring holds each id once
  }

  test("randomized equivalence: the fused-scan ring transition matches a " +
    "naive reference model across bursts, re-deliveries, and evictions") {
    // reference model: per arrival, scan kept fingerprints oldest→newest,
    // emit matches unless the docId is already kept, append, trim to the
    // newest maxState — the semantics the round-3 array-append implemented
    def reference(maxHamming: Int, maxState: Int, arrivals: Seq[StreamingDedup.BandedDoc],
        prior: Option[StreamingDedup.BucketState])
        : (List[StreamingDedup.NearMatch], Seq[Long], Seq[Long]) = {
      var ids = prior.map(_.ids.toSeq).getOrElse(Seq.empty)
      var hashes = prior.map(_.hashes.toSeq).getOrElse(Seq.empty)
      val out = List.newBuilder[StreamingDedup.NearMatch]
      arrivals.foreach { doc =>
        if (!ids.contains(doc.docId)) {
          ids.zip(hashes).foreach { case (id, h) =>
            val d = java.lang.Long.bitCount(h ^ doc.simhash)
            if (d <= maxHamming)
              out += StreamingDedup.NearMatch(
                math.min(id, doc.docId), math.max(id, doc.docId), d)
          }
          ids :+= doc.docId; hashes :+= doc.simhash
          if (ids.length > maxState) {
            ids = ids.takeRight(maxState); hashes = hashes.takeRight(maxState)
          }
        }
      }
      (out.result(), ids, hashes)
    }
    def freshState(prior: Option[StreamingDedup.BucketState]) =
      TestGroupState.create[StreamingDedup.BucketState](
        prior.map(org.apache.spark.api.java.Optional.of[StreamingDedup.BucketState])
          .getOrElse(org.apache.spark.api.java.Optional.empty()),
        GroupStateTimeout.NoTimeout, 0L,
        org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)

    val rnd = new scala.util.Random(0xC0FFEE)
    (1 to 200).foreach { trial =>
      val maxState = 1 + rnd.nextInt(8)
      val maxHamming = rnd.nextInt(4)
      // small id/hash spaces force collisions, re-deliveries, and matches
      val nBatches = 1 + rnd.nextInt(4)
      var state: Option[StreamingDedup.BucketState] = None
      var refState: Option[StreamingDedup.BucketState] = None
      (1 to nBatches).foreach { _ =>
        val batch = Seq.fill(rnd.nextInt(12))(StreamingDedup.BandedDoc(
          "b", rnd.nextInt(10).toLong, rnd.nextInt(16).toLong))
        val st = freshState(state)
        val got = StreamingDedup.matchWithinBucket(maxHamming, maxState)(
          "b", batch.iterator, st).toList
        val (want, wantIds, wantHashes) = reference(maxHamming, maxState, batch, refState)
        assert(got == want, s"trial $trial maxState=$maxState ham=$maxHamming batch=$batch")
        assert(st.get.ids.toSeq == wantIds && st.get.hashes.toSeq == wantHashes,
          s"trial $trial state mismatch")
        state = Some(st.get)
        refState = Some(StreamingDedup.BucketState(wantIds.toArray, wantHashes.toArray))
      }
    }
  }

  test("stateTtl: a timed-out bucket drops its state and emits nothing; " +
    "live invocations arm the timeout") {
    val timedOut = TestGroupState.create[StreamingDedup.BucketState](
      org.apache.spark.api.java.Optional.of(
        StreamingDedup.BucketState(Array(1L), Array(0L))),
      GroupStateTimeout.ProcessingTimeTimeout, 1000L,
      org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = true)
    val out = StreamingDedup.matchWithinBucket(3, 10, Some("2 hours"))(
      "b", Iterator.empty, timedOut).toList
    assert(out.isEmpty)
    assert(timedOut.isRemoved) // evicted, not re-armed

    val live = TestGroupState.create[StreamingDedup.BucketState](
      org.apache.spark.api.java.Optional.empty[StreamingDedup.BucketState](),
      GroupStateTimeout.ProcessingTimeTimeout, 1000L,
      org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)
    StreamingDedup.matchWithinBucket(3, 10, Some("2 hours"))(
      "b", Iterator(StreamingDedup.BandedDoc("b", 1L, 0L)), live).toList
    assert(live.exists) // state kept...
    assert(live.getTimeoutTimestampMs.isPresent ||
      live.isUpdated) // ...and the TTL armed (processing-time timeout set)
  }

  test("exactDedupStream suppresses later occurrences of a body across " +
    "micro-batches; batch replay of a suppressed dup stays suppressed") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = StreamingDedup.exactDedupStream(input.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append")
      .format("memory").queryName("sdedup_exact")
      .start()
    try {
      input.addData((1L, base), (2L, "something else entirely for batch one"))
      q.processAllAvailable()
      // same body, later batch → suppressed against the dedup state
      input.addData((3L, base), (4L, "a third distinct body arrives fine"))
      q.processAllAvailable()
      input.addData((5L, base)) // and again
      q.processAllAvailable()
      val ids = spark.table("sdedup_exact").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 2L, 4L))
    } finally q.stop()
  }

  test("exactDedupStream batch-equivalence oracle: survivors of a " +
    "micro-batched run equal the batch dropExactDuplicates survivors " +
    "when arrival order is id order") {
    implicit val sqlCtx = spark.sqlContext
    // 9 arrivals, 4 distinct bodies, duplicates landing across batches
    val arrivals = Seq(
      (1L, "body one"), (2L, "body two"), (3L, "body one"),
      (4L, "body three"), (5L, "body two"), (6L, "body four"),
      (7L, "body one"), (8L, "body four"), (9L, "body three"))
    val input = MemoryStream[(Long, String)]
    val q = StreamingDedup.exactDedupStream(
      input.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append")
      .format("memory").queryName("sdedup_equiv")
      .start()
    try {
      arrivals.grouped(3).foreach { b => input.addData(b); q.processAllAvailable() }
      val streamed = spark.table("sdedup_equiv").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      // batch replay over the full frame: min-id-per-content survivors,
      // which equals first-arrival when ids ascend in arrival order
      val batch = graft.dedup.Dedup.dropExactDuplicates(
        arrivals.toDF("doc_id", "text"))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(streamed == batch && batch == Set(1L, 2L, 4L, 6L))
    } finally q.stop()
  }

  test("contaminatedIds flags stream docs sharing an n-gram with the " +
    "static reference — one row per distinct shared gram, batch-equal") {
    implicit val sqlCtx = spark.sqlContext
    val ref = Seq((900L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = StreamingDedup.contaminatedIds(docs, ref, n = 5)
      .writeStream.outputMode("append")
      .format("memory").queryName("sdedup_decon")
      .start()
    try {
      input.addData(
        // quotes grams "alpha beta gamma delta epsilon" AND
        // "beta gamma delta epsilon zeta" → 2 distinct shared grams
        (10L, "intro alpha beta gamma delta epsilon zeta outro"),
        (11L, "nothing shared with the benchmark set at all here"))
      q.processAllAvailable()
      // a later batch re-probes the same static reference
      input.addData((12L, "alpha beta gamma delta epsilon"))
      q.processAllAvailable()
      val out = spark.table("sdedup_decon").select("doc_id")
        .collect().map(_.getLong(0)).toSeq
      assert(out.count(_ == 10L) == 2 && out.count(_ == 12L) == 1 &&
        !out.contains(11L))
      // flag parity with the batch operator on the same frames
      val batchDocs = Seq(
        (10L, "intro alpha beta gamma delta epsilon zeta outro"),
        (11L, "nothing shared with the benchmark set at all here"),
        (12L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
      val batch = graft.dedup.Dedup.ngramOverlap(batchDocs, ref, n = 5)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(batch == Map(10L -> 2L, 12L -> 1L))
    } finally q.stop()
  }
}
