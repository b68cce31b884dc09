package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingFunnel
import graft.streaming.StreamingFunnel.FunnelDepth

/** Streaming window funnel: per-user anchor state across micro-batches
  * equals the batch operator on the same arrival sequence, including
  * the equal-timestamp strictness across a batch boundary. */
class StreamingFunnelSpec extends SparkSpec {
  import spark.implicits._

  private val W = 3600L * 1000000L // 1 hour

  private def ts(us: Long): Timestamp = new Timestamp(us / 1000)

  test("stream-vs-batch-replay parity: final depths equal the batch " +
    "windowFunnel histogram; a tie split across batches never chains") {
    implicit val sqlCtx = spark.sqlContext
    // deterministic multi-user log, globally time-ordered. User 7:
    // view and click at the SAME µs but in DIFFERENT batches (must not
    // chain); a later click at +60s completes depth 2, purchase at
    // +90s completes 3. User 8: chain spread beyond the window (stays
    // at 2 via a tighter pair). Users 0-5: hash-spread sequences.
    val base = 1700000000000000L
    def e(u: Long, step: String, offUs: Long) = (u, step, base + offUs)
    val batch1 = Seq(
      e(7, "view", 0L),
      e(8, "view", 0L),
      e(0, "view", 1000000L), e(1, "view", 1000000L),
      e(2, "click", 1000000L), // click with no prior view: no chain
      e(3, "view", 2000000L),
      e(8, "click", 1800L * 1000000L)) // within W of its view
    val batch2 = Seq(
      e(7, "click", 0L), // SAME µs as user 7's batch-1 view — no chain
      e(0, "click", 3000000L),
      e(1, "purchase", 3000000L), // purchase without click: depth stays 1
      e(3, "click", 4000000L),
      e(8, "purchase", 7200L * 1000000L)) // > W from the view: stays 2
    val batch3 = Seq(
      e(7, "click", 60L * 1000000L),
      e(0, "purchase", 5000000L),
      e(7, "purchase", 90L * 1000000L),
      e(3, "purchase", 3700L * 1000000L)) // 3698s from its view: > W? no — 3700-2=3698 > 3600: stays 2
    val input = MemoryStream[(Long, String, Long)]
    val events = input.toDF().toDF("user_id", "event_type", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val q = StreamingFunnel.funnelDepths(
      events, Seq("view", "click", "purchase"), W)
      .writeStream.outputMode("update")
      .format("memory").queryName("funnel_out")
      .start()
    try {
      Seq(batch1, batch2, batch3).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
      val live = spark.table("funnel_out").as[FunnelDepth].collect()
        .groupBy(_.user).map { case (u, ds) => u.toLong -> ds.map(_.depth).max }
      // batch replay of the SAME log through the batch operator
      val all = (batch1 ++ batch2 ++ batch3).toDF("user_id", "event_type", "us")
        .withColumn("ts", timestamp_micros(col("us")))
      val batchDepths = graft.events.Events.windowFunnel(
        all, Seq("view", "click", "purchase"), W)
        .as[(Long, Long)].collect().toMap
      val liveHist = live.values.groupBy(identity)
        .map { case (d, xs) => d.toLong -> xs.size.toLong }
      assert(liveHist == batchDepths,
        s"stream=$liveHist batch=$batchDepths per-user=$live")
      // the specific semantics under test
      assert(live(7L) == 3) // tie never chained; the +60s click did
      assert(live(8L) == 2) // purchase outside the window
      assert(live(1L) == 1) // purchase without a click stays depth 1
      assert(!live.contains(2L)) // click-only user: no view, no row
    } finally q.stop()
  }

  test("out-of-order arrival fails loudly instead of computing a wrong " +
    "depth") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val st = TestGroupState.create[StreamingFunnel.FunnelState](
      org.apache.spark.api.java.Optional.empty[StreamingFunnel.FunnelState](),
      GroupStateTimeout.NoTimeout, 0L,
      org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)
    val fold = StreamingFunnel.fold(3, W) _
    fold("u", Iterator(
      StreamingFunnel.FunnelEvent("u", 1, 2000000L)), st)
    intercept[GraftError] {
      fold("u", Iterator(
        StreamingFunnel.FunnelEvent("u", 2, 1000000L)), st)
    }
  }
}
