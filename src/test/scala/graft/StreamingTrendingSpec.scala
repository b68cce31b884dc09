package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}

import graft.streaming.StreamingTrending
import graft.streaming.StreamingTrending.{KeyEvent, Trend, TrendState}

/** Decayed trending scores as keyed streaming state: the fold is the
  * exact per-event contribution in reals, so any micro-batch
  * segmentation (and out-of-order arrival) matches the closed-form
  * Σ 2^(−Δt/halfLife) to float precision. */
class StreamingTrendingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("fold transition: halving per half-life, late event adds its " +
    "decayed weight, anchor tracks the max event time") {
    val state = TestGroupState.create[TrendState](
      org.apache.spark.api.java.Optional.empty[TrendState](),
      GroupStateTimeout.NoTimeout, 0L,
      org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)
    val hl = 60e6 // one minute
    // t=0, t=60s (one half-life), then a LATE event back at t=30s
    val rows = Seq(0L, 60000000L, 30000000L)
      .map(KeyEvent("k", _)).iterator
    val out = StreamingTrending.fold(hl, 0.0, None)("k", rows, state).toSeq
    assert(out.size == 1)
    val t = out.head
    assert(t.anchorMicros == 60000000L)
    // score at anchor: 2^-1 (t0) + 1 (t60) + 2^-0.5 (late t30)
    val expect = 0.5 + 1.0 + math.pow(2.0, -0.5)
    assert(math.abs(t.score - expect) < 1e-12)
  }

  test("stream across micro-batches matches the closed-form decayed " +
    "sum AND a one-pass batch replay") {
    implicit val sqlCtx = spark.sqlContext
    val arrivals = Seq(
      ("x", "2024-01-01 00:00:00"), ("y", "2024-01-01 00:00:30"),
      ("x", "2024-01-01 00:01:00"), ("x", "2024-01-01 00:01:30"),
      ("y", "2024-01-01 00:03:00"), ("x", "2024-01-01 00:02:00"),
      ("x", "2024-01-01 00:04:00"))
    val input = MemoryStream[(String, Timestamp)]
    val q = StreamingTrending.trendingScores(
      input.toDF().toDF("key", "ts"), "key", "ts", halfLifeSeconds = 60)
      .writeStream.outputMode("update")
      .format("memory").queryName("trend_out")
      .start()
    try {
      arrivals.grouped(3).foreach { b =>
        input.addData(b.map { case (k, s) => (k, ts(s)) })
        q.processAllAvailable()
      }
    } finally q.stop()
    // latest emission per key (update mode appends to the memory sink)
    val last = spark.table("trend_out").as[Trend].collect()
      .groupBy(_.key).map { case (k, hs) =>
        k -> hs.maxBy(t => (t.anchorMicros, t.score)) }
    // closed form at each key's max event time
    def micros(s: String) = ts(s).getTime * 1000L
    val byKey = arrivals.groupBy(_._1)
    byKey.foreach { case (k, evs) =>
      val times = evs.map(e => micros(e._2))
      val anchor = times.max
      val expect = times.map(t =>
        math.pow(2.0, (t - anchor).toDouble / 60e6)).sum
      assert(last(k).anchorMicros == anchor)
      assert(math.abs(last(k).score - expect) < 1e-9,
        s"key $k: ${last(k).score} vs $expect")
    }
    // one-pass batch replay ends in the same state
    val batch = StreamingTrending.trendingScores(
      arrivals.map { case (k, s) => (k, ts(s)) }.toDF("key", "ts")
        .coalesce(1),
      "key", "ts", halfLifeSeconds = 60)
      .collect().map(t => t.key -> t).toMap
    byKey.keys.foreach { k =>
      assert(batch(k).anchorMicros == last(k).anchorMicros)
      assert(math.abs(batch(k).score - last(k).score) < 1e-9)
    }
    intercept[ParameterError] {
      StreamingTrending.trendingScores(
        Seq(("a", ts("2024-01-01 00:00:00"))).toDF("key", "ts"),
        "key", "ts", halfLifeSeconds = 0)
    }
  }
}
