package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingBars

/** Streaming OHLCV: bars assemble across micro-batches, close on
  * watermark passage, and equal the batch aggregation of the same
  * trades (the live-equals-backfill contract). */
class StreamingBarsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("bars merge trades across micro-batches and match the batch " +
    "aggregation; watermark closes bars in event-time order") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, Double, Double, Long)]
    val trades = input.toDF().toDF("sid", "ts", "price", "size", "trade_id")
    val qname = "sbars_out"
    val q = StreamingBars.ohlcvStream(trades, "1 minute", "0 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName(qname)
      .start()
    try {
      // batch 1: two trades of minute :00 arrive OUT of order
      input.addData(
        ("A", ts("2024-01-01 09:00:40"), 11.0, 3.0, 2L),
        ("A", ts("2024-01-01 09:00:10"), 10.0, 2.0, 1L))
      q.processAllAvailable()
      // batch 2: one more :00 trade (same bar, later batch) + a :01
      // trade that advances the watermark past :01 so bar :00 closes
      input.addData(
        ("A", ts("2024-01-01 09:00:55"), 9.0, 1.0, 3L),
        ("A", ts("2024-01-01 09:01:05"), 20.0, 5.0, 4L),
        ("A", ts("2024-01-01 09:02:01"), 21.0, 1.0, 5L))
      q.processAllAvailable()
      input.addData(("A", ts("2024-01-01 09:03:30"), 22.0, 1.0, 6L))
      q.processAllAvailable()
      val bars = spark.table(qname)
        .select("sid", "bar_start", "open", "high", "low", "close",
          "volume", "n_trades")
        .as[(String, Timestamp, Double, Double, Double, Double, Long, Long)]
        .collect().map(r => r._2.toString -> r).toMap
      // bar :00 saw trades from BOTH batches: open by earliest ts (not
      // arrival), close by latest, volume exact
      val b0 = bars("2024-01-01 09:00:00.0")
      assert((b0._3, b0._4, b0._5, b0._6, b0._7, b0._8) ==
        ((10.0, 11.0, 9.0, 9.0, 6L, 3L)))
      val b1 = bars("2024-01-01 09:01:00.0")
      assert((b1._3, b1._6, b1._7) == ((20.0, 20.0, 5L)))
      // live equals backfill: the batch form of the same aggregation
      // over the same trades yields the identical bar rows
      val all = Seq(
        ("A", ts("2024-01-01 09:00:40"), 11.0, 3.0, 2L),
        ("A", ts("2024-01-01 09:00:10"), 10.0, 2.0, 1L),
        ("A", ts("2024-01-01 09:00:55"), 9.0, 1.0, 3L),
        ("A", ts("2024-01-01 09:01:05"), 20.0, 5.0, 4L))
        .toDF("sid", "ts", "price", "size", "trade_id")
      val batch = StreamingBars.ohlcvStream(all, "1 minute", "0 seconds")
        .select("sid", "bar_start", "open", "high", "low", "close",
          "volume", "n_trades")
        .as[(String, Timestamp, Double, Double, Double, Double, Long, Long)]
        .collect().map(r => r._2.toString -> r).toMap
      assert(batch("2024-01-01 09:00:00.0") == bars("2024-01-01 09:00:00.0"))
      assert(batch("2024-01-01 09:01:00.0") == bars("2024-01-01 09:01:00.0"))
    } finally q.stop()
  }
}
