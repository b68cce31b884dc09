package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.events.Events

/** Event-analytics scale bench (BASELINE.md): deterministic synthetic
  * logs generated distributed, timed through the interval-sweep
  * active-users op and gap sessionization.
  *
  * Shapes: a uniform log (users × events each, timestamps hash-spread
  * over 90 days), and the BOT adversarial — one user carrying 1M
  * events — which is the documented skew bound of the user-partitioned
  * family: the bot shows up as ONE hot partition (its window sorts 1M
  * rows in one task), not a job failure; activeUsers additionally
  * collapses the bot to ≤ 90 user-days BEFORE any window, so the
  * sweep never sees the skew at all. */
object EventsBench {

  def uniform(spark: SparkSession, users: Long, perUser: Long): DataFrame =
    spark.range(users * perUser).select(
      col("id").as("event_id"),
      pmod(hash(col("id"), lit(7)).cast("long"), lit(users)).as("user_id"),
      // xxhash64, not the 32-bit murmur: a 32-bit value pmod 90 days
      // of MICROseconds never leaves the first half hour
      timestamp_micros(
        lit(1700000000000000L) +
          pmod(xxhash64(col("id"), lit(11)),
            lit(90L * 86400000000L))).as("ts"))

  def bot(spark: SparkSession, botEvents: Long): DataFrame =
    spark.range(botEvents).select(
      col("id").as("event_id"),
      lit(0L).as("user_id"),
      timestamp_micros(lit(1700000000000000L) + col("id") * 1000000L).as("ts"))

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val shapes: Seq[(String, DataFrame)] = Seq(
      "uniform 1M users x 10" -> uniform(spark, 1000000L, 10L),
      "uniform 1M users x 50" -> uniform(spark, 1000000L, 50L),
      "bot 1M events, 1 user" ->
        uniform(spark, 100000L, 10L).unionByName(bot(spark, 1000000L)))

    shapes.foreach { case (name, ev) =>
      ev.count() // warm generation
      val (nAu, tAu) = time {
        Events.activeUsers(ev, window = 28).agg(
          count(lit(1)), max(col("active_28"))).head
      }
      val (nSe, tSe) = time {
        Events.sessionize(ev, gapSeconds = 1800)
          .agg(max(col("session_idx"))).head
      }
      // Markov attribution over hash-typed events: the transition
      // count is the only data-volume stage — everything after is
      // dimension-sized regardless of event count
      val typed = ev.withColumn("event_type",
        element_at(
          array(lit("view"), lit("click"), lit("signup"), lit("purchase")),
          (pmod(hash(col("event_id"), lit(3)).cast("long"), lit(4)) + 1)
            .cast("int")))
      val (mk, tMk) = time {
        Events.markovAttribution(
          typed, Seq("view", "click", "signup"), "purchase")
          .agg(max(col("base_p"))).head
      }
      // gini rides the same typed frame; rfm needs a value column
      val (gi, tGi) = time {
        Events.activityGini(typed).agg(max(col("gini"))).head
      }
      val valued = typed.withColumn("value",
        (pmod(hash(col("event_id"), lit(5)).cast("long"), lit(10000L))
          .cast("double") / 100.0))
      val (rf, tRf) = time {
        Events.rfmSegments(valued).agg(
          count(lit(1)), sum(col("n_users"))).head
      }
      println(f"$name%-24s activeUsers: days=${nAu.getLong(0)}%4d " +
        f"maxActive=${nAu.getLong(1)}%8d ${tAu}%6.1f s | " +
        f"sessionize: maxIdx=${nSe.getLong(0)}%7d ${tSe}%6.1f s | " +
        f"markov: baseP=${mk.getDouble(0)}%6.4f ${tMk}%6.1f s | " +
        f"gini: max=${gi.getDouble(0)}%6.4f ${tGi}%6.1f s | " +
        f"rfm: cells=${rf.getLong(0)}%3d users=${rf.getLong(1)}%8d ${tRf}%6.1f s")
    }
    spark.stop()
  }
}
