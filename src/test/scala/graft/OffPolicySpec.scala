package graft

import org.apache.spark.sql.functions._

import graft.ml.OffPolicy

/** Off-policy evaluation golden: IPS/SNIPS against an independent
  * plain-Scala replay of the estimator (empirical propensities, md5
  * uniform target policy, per-user first-action/reward extraction).
  * The ml35 catalog query pins the same operator against a DuckDB
  * row_number reformulation at sf0.01. */
class OffPolicySpec extends SparkSpec {
  import spark.implicits._

  test("ipsSnips: matches a per-user replay with exact propensities") {
    // 30 users, 3 action types; rewards = purchase strictly after the
    // first event; user u's first action cycles (view, click, search)
    val rows = (1 to 30).flatMap { u =>
      val first = Seq("view", "click", "search")(u % 3)
      val buys = u % 4 == 0 // 7 users convert post-first-event
      Seq((u * 10L, u.toLong, first, s"2024-01-01 0${u % 8}:00:00")) ++
        (if (buys)
          Seq((u * 10L + 1, u.toLong, "purchase", "2024-01-02 00:00:00"))
        else Nil)
    }
    val ev = rows.toDF("event_id", "user_id", "event_type", "s")
      .withColumn("ts", to_timestamp($"s")).drop("s")
    val r = OffPolicy.ipsSnips(ev, seed = "pi").head()

    // independent replay
    val hash = ev.select($"user_id",
        graft.text.Sampling.hashUnit(col("user_id"), "pi"))
      .distinct().as[(Long, Double)].collect().toMap
    val logged = (1 to 30).map { u =>
      (u.toLong, Seq("view", "click", "search")(u % 3), u % 4 == 0)
    }
    // NOTE: 'purchase' is never a FIRST action here, so the action set
    // is exactly the three cycled types
    val actions = logged.map(_._2).distinct.sorted
    val k = actions.size
    val nA = logged.groupBy(_._2).map { case (a, xs) => a -> xs.size }
    val matched = logged.filter { case (u, a, _) =>
      actions(math.floor(hash(u) * k).toInt) == a }
    val ips = matched.map { case (_, a, rw) =>
      (if (rw) 1.0 else 0.0) / nA(a) }.sum
    val w = matched.map { case (_, a, _) => 1.0 / nA(a) }.sum
    assert(r.getAs[Long]("n_users") == 30)
    assert(r.getAs[Long]("n_matched") == matched.size)
    assert(math.abs(r.getAs[Double]("ips") - ips) < 1e-6)
    assert(math.abs(r.getAs[Double]("snips") - ips / w) < 1e-6)
    assert(matched.nonEmpty) // fixture sanity: the policy matched someone
  }

  test("ipsSnips: a purchase AT the first timestamp is not a reward; " +
    "a lone first purchase is its own logged action") {
    val ev = Seq(
      // user 1: purchase at the same micros as the first event → r=0
      (1L, 1L, "view", "2024-01-01 00:00:00"),
      (2L, 1L, "purchase", "2024-01-01 00:00:00"),
      // user 2: first event IS a purchase, nothing after → action
      // 'purchase', r=0
      (3L, 2L, "purchase", "2024-01-01 01:00:00"))
      .toDF("event_id", "user_id", "event_type", "s")
      .withColumn("ts", to_timestamp($"s")).drop("s")
    val r = OffPolicy.ipsSnips(ev, seed = "pi").head()
    assert(r.getAs[Long]("n_users") == 2)
    assert(r.getAs[Double]("ips") == 0.0)
  }
}
