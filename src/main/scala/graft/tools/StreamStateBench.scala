package graft.tools

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.streaming.GroupState

import graft.streaming.StreamingDedup
import graft.streaming.StreamingDedup.{BandedDoc, BucketState, NearMatch}

/** Micro-bench for the per-event hot path of streaming near-dup: a burst
  * of m arrivals into ONE hot bucket through `matchWithinBucket`
  * (ring-buffer state), vs the pre-ring reference implementation
  * (`ids :+ id` array copies) inlined here for comparison. No Spark
  * session — the state transition is a pure function of
  * (rows, prior state).
  *
  * Usage: runMain graft.tools.StreamStateBench [arrivals maxState]
  */
object StreamStateBench {

  /** Minimal driver-side GroupState for benching the transition. */
  private final class Mem(var v: Option[BucketState])
      extends GroupState[BucketState] {
    def exists: Boolean = v.isDefined
    def get: BucketState = v.get
    def getOption: Option[BucketState] = v
    def update(s: BucketState): Unit = v = Some(s)
    def remove(): Unit = v = None
    def hasTimedOut: Boolean = false
    def setTimeoutDuration(d: Long): Unit = ()
    def setTimeoutDuration(d: String): Unit = ()
    def setTimeoutTimestamp(t: Long): Unit = ()
    def setTimeoutTimestamp(t: Long, add: String): Unit = ()
    def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
    def setTimeoutTimestamp(t: java.sql.Date, add: String): Unit = ()
    def getCurrentWatermarkMs(): Long = 0L
    def getCurrentProcessingTimeMs(): Long = 0L
  }

  /** The pre-ring transition (round-3 code): full array copy per arrival. */
  private def legacy(maxHamming: Int, maxState: Int)(
      rows: Iterator[BandedDoc], state: GroupState[BucketState]): Iterator[NearMatch] = {
    var ids = state.getOption.map(_.ids).getOrElse(Array.empty[Long])
    var hashes = state.getOption.map(_.hashes).getOrElse(Array.empty[Long])
    val out = ListBuffer.empty[NearMatch]
    rows.foreach { doc =>
      if (!ids.contains(doc.docId)) {
        var i = 0
        while (i < ids.length) {
          val d = java.lang.Long.bitCount(hashes(i) ^ doc.simhash)
          if (d <= maxHamming)
            out += NearMatch(
              math.min(ids(i), doc.docId), math.max(ids(i), doc.docId), d)
          i += 1
        }
        ids = ids :+ doc.docId
        hashes = hashes :+ doc.simhash
        if (ids.length > maxState) {
          ids = ids.drop(ids.length - maxState)
          hashes = hashes.drop(hashes.length - maxState)
        }
      }
    }
    state.update(BucketState(ids, hashes))
    out.iterator
  }

  def main(args: Array[String]): Unit = {
    val arrivals = if (args.length > 0) args(0).toInt else 100000
    val maxState = if (args.length > 1) args(1).toInt else 1000
    // far-apart fingerprints: exercise the scan, emit few matches
    def docs: Iterator[BandedDoc] =
      Iterator.range(0, arrivals).map(i => BandedDoc("b", i.toLong, i.toLong * 0x9E3779B97F4A7C15L))

    def run(name: String, mode: String)(
        f: (Iterator[BandedDoc], GroupState[BucketState]) => Iterator[NearMatch]): Unit = {
      // warm-up round then measured round. "steady": one arrival per
      // invocation (state round-trips through arrays each trigger);
      // "burst": all arrivals in ONE invocation (hot-bucket micro-batch).
      (1 to 2).foreach { round =>
        val st = new Mem(None)
        var matches = 0L
        val t0 = System.nanoTime()
        if (mode == "steady") docs.foreach(d => matches += f(Iterator.single(d), st).size)
        else matches = f(docs, st).size.toLong
        val secs = (System.nanoTime() - t0) / 1e9
        if (round == 2)
          println(f"[streamstate] $name%-26s $mode%-6s $arrivals arrivals, maxState=$maxState: " +
            f"$secs%6.2f s (${arrivals / secs / 1e3}%8.1f k-arrivals/s, $matches matches)")
      }
    }

    for (mode <- Seq("steady", "burst")) {
      run("fused-scan ring (current)", mode)((rows, st) =>
        StreamingDedup.matchWithinBucket(maxHamming = 3, maxState)("b", rows, st))
      run("array append (round 3)", mode)(legacy(maxHamming = 3, maxState))
    }

    // heavy-hitters transition on a Zipf-ish arrival mix (hot key 10%,
    // long tail) — one shard, capacity = maxState
    import graft.streaming.StreamingHeavyHitters
    import graft.streaming.StreamingHeavyHitters.{HeavyHitter, ShardedKey, ShardState}
    final class MemHH(var v: Option[ShardState]) extends GroupState[ShardState] {
      def exists: Boolean = v.isDefined
      def get: ShardState = v.get
      def getOption: Option[ShardState] = v
      def update(s: ShardState): Unit = v = Some(s)
      def remove(): Unit = v = None
      def hasTimedOut: Boolean = false
      def setTimeoutDuration(d: Long): Unit = ()
      def setTimeoutDuration(d: String): Unit = ()
      def setTimeoutTimestamp(t: Long): Unit = ()
      def setTimeoutTimestamp(t: Long, add: String): Unit = ()
      def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
      def setTimeoutTimestamp(t: java.sql.Date, add: String): Unit = ()
      def getCurrentWatermarkMs(): Long = 0L
      def getCurrentProcessingTimeMs(): Long = 0L
    }
    def keys: Iterator[ShardedKey] = Iterator.range(0, arrivals).map { i =>
      val k = if (i % 10 == 0) "hot" else s"k${(i * 2654435761L) % (arrivals / 4)}"
      ShardedKey(0, k)
    }
    (1 to 2).foreach { round =>
      val st = new MemHH(None)
      val t0 = System.nanoTime()
      var emitted = 0L
      // batch granularity 10k arrivals — the state round-trips per batch
      keys.grouped(10000).foreach { g =>
        emitted += StreamingHeavyHitters.summarize(maxState, 1L)(
          0, g.iterator, st).size
      }
      val secs = (System.nanoTime() - t0) / 1e9
      if (round == 2) {
        val top = st.v.get.keys.zip(st.v.get.counts).maxBy(_._2)
        println(f"[streamstate] space-saving hh           batch  $arrivals arrivals, " +
          f"capacity=$maxState: $secs%6.2f s " +
          f"(${arrivals / secs / 1e3}%8.1f k-arrivals/s, top=${top._1}:${top._2})")
      }
    }

    // Funnel keyed-state row (r8): `arrivals` users × an 8-event
    // journey each through the pure fold transition (the per-user path
    // every micro-batch executes), one state round-trip per event —
    // the worst batch granularity. State is exactly 2k+2 longs + the
    // depth int per user; the printed footprint is what a 1M-user
    // keyed-state store holds, tracked here so growth regressions in
    // FunnelState are as loud as throughput ones.
    import graft.streaming.StreamingFunnel
    import graft.streaming.StreamingFunnel.{FunnelEvent, FunnelState}
    final class MemF(var v: Option[FunnelState]) extends GroupState[FunnelState] {
      def exists: Boolean = v.isDefined
      def get: FunnelState = v.get
      def getOption: Option[FunnelState] = v
      def update(s: FunnelState): Unit = v = Some(s)
      def remove(): Unit = v = None
      def hasTimedOut: Boolean = false
      def setTimeoutDuration(d: Long): Unit = ()
      def setTimeoutDuration(d: String): Unit = ()
      def setTimeoutTimestamp(t: Long): Unit = ()
      def setTimeoutTimestamp(t: Long, add: String): Unit = ()
      def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
      def setTimeoutTimestamp(t: java.sql.Date, add: String): Unit = ()
      def getCurrentWatermarkMs(): Long = 0L
      def getCurrentProcessingTimeMs(): Long = 0L
    }
    val k = 4
    val fold = StreamingFunnel.fold(k, windowMicros = 3600L * 1000000L) _
    val eventsPerUser = 8
    (1 to 2).foreach { round =>
      val t0 = System.nanoTime()
      var emitted = 0L
      var u = 0
      while (u < arrivals) {
        val st = new MemF(None)
        var e = 0
        while (e < eventsPerUser) {
          // steps 1..4 then noise re-entries; strictly increasing ts
          val step = (e % k) + 1
          emitted += fold(s"u$u",
            Iterator.single(FunnelEvent(s"u$u", step, e * 1000000L)), st).size
          e += 1
        }
        u += 1
      }
      val secs = (System.nanoTime() - t0) / 1e9
      val n = arrivals.toLong * eventsPerUser
      val stateBytes = arrivals.toLong * (2L * k + 2) * 8
      if (round == 2)
        println(f"[streamstate] funnel fold k=$k            steady $n events over $arrivals users: " +
          f"$secs%6.2f s (${n / secs / 1e3}%8.1f k-events/s, " +
          f"emitted=$emitted, state=${stateBytes / 1048576.0}%.1f MiB)")
    }

    // KMV fold (r9): `arrivals` pre-hashed keys into ONE group's
    // bottom-k state, batch granularity 10k. Steady-state arrivals are
    // almost always ABOVE the current θ (the TreeSet max check rejects
    // without mutating), so the hot path is a contains-free compare —
    // state is k longs per group, period.
    import graft.streaming.StreamingKmv
    import graft.streaming.StreamingKmv.{Keyed, KmvState}
    final class MemK(var v: Option[KmvState]) extends GroupState[KmvState] {
      def exists: Boolean = v.isDefined
      def get: KmvState = v.get
      def getOption: Option[KmvState] = v
      def update(s: KmvState): Unit = v = Some(s)
      def remove(): Unit = v = None
      def hasTimedOut: Boolean = false
      def setTimeoutDuration(d: Long): Unit = ()
      def setTimeoutDuration(d: String): Unit = ()
      def setTimeoutTimestamp(t: Long): Unit = ()
      def setTimeoutTimestamp(t: Long, add: String): Unit = ()
      def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
      def setTimeoutTimestamp(t: java.sql.Date, add: String): Unit = ()
      def getCurrentWatermarkMs(): Long = 0L
      def getCurrentProcessingTimeMs(): Long = 0L
    }
    def kmvKeys: Iterator[Keyed] = Iterator.range(0, arrivals)
      .map(i => Keyed("g", (i.toLong * 0x9E3779B97F4A7C15L) >>> 4)) // [0, 2^60)
    (1 to 2).foreach { round =>
      val st = new MemK(None)
      val t0 = System.nanoTime()
      var est = 0.0
      kmvKeys.grouped(10000).foreach { g =>
        est = StreamingKmv.fold(256)("g", g.iterator, st).next().estimate
      }
      val secs = (System.nanoTime() - t0) / 1e9
      if (round == 2)
        println(f"[streamstate] kmv fold k=256            batch  $arrivals arrivals, one group: " +
          f"$secs%6.2f s (${arrivals / secs / 1e3}%8.1f k-arrivals/s, " +
          f"est=$est%.0f, state=${st.v.get.hashes.length * 8} bytes)")
    }
  }
}
