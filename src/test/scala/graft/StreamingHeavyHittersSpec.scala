package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}

import graft.streaming.StreamingHeavyHitters
import graft.streaming.StreamingHeavyHitters.{HeavyHitter, ShardedKey, ShardState}

/** Space-Saving heavy hitters as keyed streaming state: counts
  * accumulate ACROSS micro-batches, capacity bounds per-shard state
  * with the published error guarantee, sharding keeps each key's
  * truth in one group. */
class StreamingHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("counts accumulate across micro-batches; update mode re-emits " +
    "the summary; hot key dominates") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val events = input.toDF().toDF("ip")
    val qname = "hh_out"
    val q = StreamingHeavyHitters.topKeys(events, "ip", capacity = 10,
      shards = 4)
      .writeStream.outputMode("update")
      .format("memory").queryName(qname)
      .start()
    try {
      input.addData("bot", "bot", "bot", "u1", "u2")
      q.processAllAvailable()
      val b1 = spark.table(qname).as[HeavyHitter].collect()
        .map(h => h.key -> h.count).toMap
      assert(b1("bot") == 3L && b1("u1") == 1L)

      input.addData("bot", "bot", "u3")
      q.processAllAvailable()
      // update mode appends re-emissions to the memory sink: take the
      // LATEST count per key
      val latest = spark.table(qname).as[HeavyHitter].collect()
        .groupBy(_.key).map { case (k, hs) => k -> hs.map(_.count).max }
      assert(latest("bot") == 5L) // 3 + 2 across batches, via state
      assert(latest("u3") == 1L)
    } finally q.stop()
  }

  test("space-saving transition: capacity bound, eviction inherits the " +
    "minimum as err, guarantee count - err <= true <= count") {
    val state = TestGroupState.create[ShardState](
      org.apache.spark.api.java.Optional.empty[ShardState](),
      GroupStateTimeout.NoTimeout, 0L,
      org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)
    // capacity 2: a, a, b, then c evicts the minimum (b, count 1)
    val rows = Seq("a", "a", "b", "c").map(ShardedKey(0, _)).iterator
    val out = StreamingHeavyHitters.summarize(2, 1L)(0, rows, state)
      .toSeq.map(h => h.key -> ((h.count, h.err))).toMap
    assert(out.size == 2)
    assert(out("a") == ((2L, 0L))) // tracked since first arrival: exact
    assert(out("c") == ((2L, 1L))) // inherited b's count; true freq 1 ≥ 2−1
    assert(!out.contains("b"))
    // the invariant: count − err ≤ true ≤ count (true: a=2, c=1)
    assert(out("a")._1 - out("a")._2 <= 2 && 2 <= out("a")._1)
    assert(out("c")._1 - out("c")._2 <= 1 && 1 <= out("c")._1)
    // keys with true frequency > n/m (4/2 = 2) must be present: none
    // strictly exceed 2 here, but 'a' at the bound is — spot the
    // stronger practical case with capacity 1 over a skewed run
    val st2 = TestGroupState.create[ShardState](
      org.apache.spark.api.java.Optional.empty[ShardState](),
      GroupStateTimeout.NoTimeout, 0L,
      org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)
    val skew = Seq("x", "y", "x", "x", "z", "x").map(ShardedKey(0, _)).iterator
    val out2 = StreamingHeavyHitters.summarize(1, 1L)(0, skew, st2).toSeq
    assert(out2.head.key == "x") // the majority key survives capacity 1
    intercept[graft.ParameterError](
      StreamingHeavyHitters.topKeys(Seq("a").toDF("ip"), "ip", capacity = 0))
  }

  test("batch-equivalence oracle: the same arrival sequence split across " +
    "micro-batches ends in EXACTLY the one-pass batch summary — " +
    "eviction churn included (state roundtrip preserves bucket order)") {
    implicit val sqlCtx = spark.sqlContext
    // 12 keys over capacity 3 with constant churn: nearly every arrival
    // past the warm-up evicts, so any batch-boundary scrambling of the
    // bucket insertion order would pick different victims and diverge
    val arrivals = Seq(
      "a", "b", "c", "d", "a", "e", "f", "a", "g", "b",
      "h", "i", "a", "j", "b", "k", "l", "a", "c", "m")
    val batches = arrivals.grouped(7).toSeq // 7 + 7 + 6
    @volatile var last: Seq[(String, Long, Long)] = Nil
    val input = MemoryStream[String]
    val q = StreamingHeavyHitters.topKeys(
      input.toDF().toDF("ip"), "ip", capacity = 3, shards = 1)
      .writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[HeavyHitter], _: Long) =>
        val rows = df.collect().map(h => (h.key, h.count, h.err)).toSeq
        if (rows.nonEmpty) last = rows // every batch re-emits the summary
      }
      .start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    // one-pass batch replay: flatMapGroupsWithState runs in batch mode
    // with empty initial state; coalesce(1) pins the arrival order
    val batch = StreamingHeavyHitters.topKeys(
      arrivals.toDF("ip").coalesce(1), "ip", capacity = 3, shards = 1)
      .collect().map(h => (h.key, h.count, h.err)).toSeq
    assert(last.sorted == batch.sorted,
      s"stream end-state $last != batch replay $batch")
    // and the Space-Saving contract holds against true frequencies:
    // any key with true freq > n/m (20/3) must be present — 'a' (6)
    assert(batch.exists(_._1 == "a"))
    val truth = arrivals.groupBy(identity).view.mapValues(_.size.toLong)
    batch.foreach { case (k, count, err) =>
      assert(count - err <= truth(k) && truth(k) <= count,
        s"$k: count=$count err=$err true=${truth(k)}")
    }
  }
}
