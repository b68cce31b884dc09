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
        // dime quantum: at 50M events the per-user monetary sums exceed
        // the default cent histogram's maxBins guard — coarsening the
        // quantum is the guard's documented remedy, exercised here
        Events.rfmSegments(valued, monetaryQuantumCents = 10L).agg(
          count(lit(1)), sum(col("n_users"))).head
      }
      // survival family (r7 rows): log-rank collapses to per-user
      // (first, last) in ONE agg before anything else — the bot's 1M
      // rows reduce map-side to one user row; RMST rides the same
      // bounded distinct-day Kaplan-Meier curve
      val (lr, tLr) = time {
        Events.logRank(ev, censorDays = 7).agg(max(col("chisq"))).head
      }
      val (rm, tRm) = time {
        Events.rmst(ev, tauDays = 30L, censorDays = 7)
          .agg(max(col("rmst"))).head
      }
      // nearest-direction as-of join (j14): views pick up the nearest
      // purchase within 1h either way. User-partitioned window carry —
      // the bot shape is the documented skew bound (its 1M events sort
      // in one task; completes, not fails)
      val views = typed.where(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id"))
      val purchases = valued.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
      val (aj, tAj) = time {
        graft.panel.Intervals.asofJoinNearest(
          views, purchases, Seq("user_id"),
          toleranceMicros = 3600L * 1000000L)
          .agg(count(lit(1)), count(col("value"))).head
      }
      println(f"$name%-24s activeUsers: days=${nAu.getLong(0)}%4d " +
        f"maxActive=${nAu.getLong(1)}%8d ${tAu}%6.1f s | " +
        f"sessionize: maxIdx=${nSe.getLong(0)}%7d ${tSe}%6.1f s | " +
        f"markov: baseP=${mk.getDouble(0)}%6.4f ${tMk}%6.1f s | " +
        f"gini: max=${gi.getDouble(0)}%6.4f ${tGi}%6.1f s | " +
        f"rfm: cells=${rf.getLong(0)}%3d users=${rf.getLong(1)}%8d ${tRf}%6.1f s | " +
        f"logrank: chi2=${lr.getDouble(0)}%8.2f ${tLr}%6.1f s | " +
        f"rmst: d=${rm.getDouble(0)}%6.2f ${tRm}%6.1f s | " +
        f"asofNearest: rows=${aj.getLong(0)}%8d hit=${aj.getLong(1)}%8d ${tAj}%6.1f s")
    }
    spark.stop()
  }
}
