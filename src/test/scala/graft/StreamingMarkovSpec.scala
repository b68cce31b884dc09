package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.streaming.StreamingMarkov

/** Streaming Markov transitions: the keyed last-event state across
  * micro-batches must reproduce the batch lead()-window transition
  * matrix on the same arrivals — the honest check for stateful ops. */
class StreamingMarkovSpec extends SparkSpec {
  import spark.implicits._

  test("stream-vs-batch-replay parity: aggregated transition counts " +
    "equal the batch lead() matrix on any batch segmentation") {
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000000000L
    // (user, type, µs offset, event_id) — user 5's pair is split across
    // batches; user 6 has two events at the SAME µs (id tiebreak)
    val all = Seq(
      (1L, "view", 0L, 10L), (1L, "click", 1000000L, 11L),
      (2L, "view", 0L, 12L), (2L, "view", 2000000L, 13L),
      (5L, "click", 500000L, 14L),
      (6L, "view", 3000000L, 15L), (6L, "click", 3000000L, 16L),
      (1L, "purchase", 5000000L, 17L),
      (5L, "purchase", 6000000L, 18L),
      (2L, "click", 7000000L, 19L))
    val batches = Seq(all.take(5), all.slice(5, 8), all.drop(8))
    val input = MemoryStream[(Long, String, Long, Long)]
    val events = input.toDF().toDF("user_id", "event_type", "us", "event_id")
      .withColumn("ts", timestamp_micros(col("us") + base))
    val q = StreamingMarkov.transitions(events)
      .writeStream.outputMode("append")
      .format("memory").queryName("markov_out").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      val streamed = spark.table("markov_out")
        .groupBy("fromType", "toType").count()
        .as[(String, String, Long)].collect().toSet
      // batch replay: lead() over (µs, id) per user
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      val batch = all.toDF("user_id", "event_type", "us", "event_id")
        .withColumn("to_type", lead(col("event_type"), 1).over(w))
        .where(col("to_type").isNotNull)
        .groupBy(col("event_type"), col("to_type")).count()
        .as[(String, String, Long)].collect().toSet
      assert(streamed == batch && batch.nonEmpty)
    } finally q.stop()
  }

  test("out-of-order arrival raises instead of silently building a " +
    "wrong matrix") {
    val st = new org.apache.spark.sql.streaming.GroupState[StreamingMarkov.LastEvent] {
      var v: Option[StreamingMarkov.LastEvent] = None
      def exists: Boolean = v.isDefined
      def get: StreamingMarkov.LastEvent = v.get
      def getOption: Option[StreamingMarkov.LastEvent] = v
      def update(s: StreamingMarkov.LastEvent): Unit = v = Some(s)
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
    StreamingMarkov.fold("u",
      Iterator(StreamingMarkov.MarkovEvent("u", "view", 100L, 1L)), st).toList
    intercept[GraftError] {
      StreamingMarkov.fold("u",
        Iterator(StreamingMarkov.MarkovEvent("u", "click", 99L, 2L)), st).toList
    }
  }
}
