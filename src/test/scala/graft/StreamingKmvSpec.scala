package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sketch.Kmv
import graft.streaming.StreamingKmv

/** Streaming KMV: the bounded bottom-k state across micro-batches must
  * reproduce the batch sketch's estimate on the same arrivals, for any
  * batch segmentation — bottom-k of a union is order-free. */
class StreamingKmvSpec extends SparkSpec {
  import spark.implicits._

  test("stream-vs-batch parity: the streamed estimate equals " +
    "Kmv.estimate on the same rows; state stays <= k hashes") {
    implicit val sqlCtx = spark.sqlContext
    val k = 32
    // two groups: 'big' exceeds k distinct keys, 'small' stays under
    val all = (0 until 300).map(i => ("big", s"k${i % 120}")) ++
      (0 until 20).map(i => ("small", s"s${i % 7}"))
    val batches = Seq(all.take(100), all.slice(100, 250), all.drop(250))
    val input = MemoryStream[(String, String)]
    val q = StreamingKmv.distinctEstimates(
      input.toDF().toDF("g", "key"), "g", "key", k = k)
      .writeStream.outputMode("update")
      .format("memory").queryName("kmv_out").start()
    try {
      // parity at EVERY batch boundary: this micro-batch's emissions
      // (the table rows added by it) must equal the batch sketch over
      // the PREFIX of arrivals so far — stronger than an end-state
      // check, and free of any reliance on sink row order
      var seen = 0L
      var fed = Seq.empty[(String, String)]
      batches.foreach { b =>
        input.addData(b)
        q.processAllAvailable()
        fed = fed ++ b
        val rows = spark.table("kmv_out").collect()
        val emitted = rows.drop(seen.toInt)
          .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
        seen = rows.length.toLong
        val batchRef = Kmv.estimate(
          Kmv.sketch(fed.toDF("g", "key"), "key", Seq("g"), k), Seq("g"), k)
          .as[(String, Long, Double)].collect()
          .map(r => r._1 -> ((r._2, r._3))).toMap
        // every group fed in this micro-batch re-emitted its estimate
        b.map(_._1).distinct.foreach { g =>
          assert(emitted(g) == batchRef(g),
            s"group $g: streamed=${emitted(g)} batch=${batchRef(g)}")
        }
      }
      val finalRef = Kmv.estimate(
        Kmv.sketch(all.toDF("g", "key"), "key", Seq("g"), k), Seq("g"), k)
        .as[(String, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(finalRef("small") == ((7L, 7.0))) // sub-k group is exact
      assert(finalRef("big")._1 == k.toLong)
    } finally q.stop()
  }

  test("fold is segmentation-invariant: one batch vs per-row batches " +
    "give identical state and estimate") {
    val rows = (0 until 90).map(i => StreamingKmv.Keyed("g", (i * 37 % 61).toLong))
    def run(chunks: Seq[Seq[StreamingKmv.Keyed]]): (Seq[Long], Double) = {
      var st: Option[StreamingKmv.KmvState] = None
      var last: StreamingKmv.Estimate = null
      chunks.foreach { c =>
        val gs = new org.apache.spark.sql.streaming.GroupState[StreamingKmv.KmvState] {
          var v: Option[StreamingKmv.KmvState] = st
          def exists: Boolean = v.isDefined
          def get: StreamingKmv.KmvState = v.get
          def getOption: Option[StreamingKmv.KmvState] = v
          def update(s: StreamingKmv.KmvState): Unit = v = Some(s)
          def remove(): Unit = v = None
          def hasTimedOut: Boolean = false
          def setTimeoutDuration(d: Long): Unit = ()
          def setTimeoutDuration(d: String): Unit = ()
          def setTimeoutTimestamp(t: Long): Unit = ()
          def setTimeoutTimestamp(t: Long, d: String): Unit = ()
          def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
          def setTimeoutTimestamp(t: java.sql.Date, d: String): Unit = ()
          def getCurrentWatermarkMs(): Long = 0L
          def getCurrentProcessingTimeMs(): Long = 0L
        }
        last = StreamingKmv.fold(16)( "g", c.iterator, gs).next()
        st = gs.getOption
      }
      (st.get.hashes.toSeq, last.estimate)
    }
    val whole = run(Seq(rows))
    val perRow = run(rows.map(Seq(_)))
    assert(whole == perRow)
    assert(whole._1.size <= 16 && whole._1 == whole._1.sorted)
  }
}
