package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.events.Events

/** Event analytics goldens: gap sessionization (boundary-exact),
  * first-occurrence funnel semantics, day cohorts, transition counts. */
class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private lazy val log = Seq(
    // user 1: two sessions split by a 31-min gap; duplicate-ts events
    (1L, 1L, ts("2024-01-01 10:00:00"), "view"),
    (2L, 1L, ts("2024-01-01 10:10:00"), "click"),
    (3L, 1L, ts("2024-01-01 10:10:00"), "view"), // same ts: id breaks tie
    (4L, 1L, ts("2024-01-01 10:41:00.000001"), "purchase"), // 31m 1µs gap
    // user 2: one session; funnel reaches view→click but purchase FIRST
    // occurred before click → stage 3 not reached
    (5L, 2L, ts("2024-01-02 09:00:00"), "view"),
    (6L, 2L, ts("2024-01-02 09:01:00"), "purchase"),
    (7L, 2L, ts("2024-01-02 09:02:00"), "click"),
    (8L, 2L, ts("2024-01-03 09:00:00"), "view")) // day-1 retention
    .toDF("event_id", "user_id", "ts", "event_type")

  test("sessionize: gap strictly over the threshold opens a session; " +
    "exactly-at-gap does not") {
    val s = Events.sessionize(log, gapSeconds = 1860) // 31 min
      .select("event_id", "session_idx")
      .as[(Long, Long)].collect().toMap
    // 31m1µs > 31m ⇒ event 4 starts session 2
    assert(s(1L) == 1L && s(2L) == 1L && s(3L) == 1L && s(4L) == 2L)
    assert(s(5L) == 1L && s(7L) == 1L)
    // with a 32-minute gap everything is one session
    val s2 = Events.sessionize(log, gapSeconds = 1920)
      .select("event_id", "session_idx").as[(Long, Long)].collect().toMap
    assert(s2(4L) == 1L)
    intercept[ParameterError] { Events.sessionize(log, 0) }
  }

  test("sessionStats: counts, bounds, exact duration") {
    val st = Events.sessionStats(log, gapSeconds = 1860)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(5))).toMap
    assert(st((1L, 1L))._1 == 3L) // events 1-3
    assert(st((1L, 1L))._2 == 600.0) // 10:00 → 10:10
    assert(st((1L, 2L))._1 == 1L)
    assert(st((1L, 2L))._2 == 0.0)
  }

  test("funnel: first-occurrence ordering; out-of-order first step " +
    "blocks later stages") {
    val f = Events.funnel(log, Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(f(1L) == (("view", 2L)))     // both users viewed
    assert(f(2L) == (("click", 2L)))    // both clicked after first view
    // user 1 purchased after click; user 2's FIRST purchase predates click
    assert(f(3L) == (("purchase", 1L)))
    intercept[ParameterError] { Events.funnel(log, Seq.empty) }
    intercept[ParameterError] { Events.funnel(log, Seq("a", "a")) }
  }

  test("retentionCohorts: first-day cohorts with distinct-user offsets") {
    val r = Events.retentionCohorts(log)
      .collect().map(x => (x.getDate(0).toString, x.getLong(1)) -> x.getLong(2))
      .toMap
    assert(r(("2024-01-01", 0L)) == 1L) // user 1's only day
    assert(r(("2024-01-02", 0L)) == 1L) // user 2 cohort
    assert(r(("2024-01-02", 1L)) == 1L) // user 2 active next day
    assert(r.size == 3)
  }

  test("countAnomalies: flat history scores a spike; partial windows " +
    "and flat windows are null") {
    // type A: 1/day for 7 days then a 10-count spike on day 8
    val rows = (1 to 7).map(d =>
      (d.toLong, 9L, ts(f"2024-01-0$d 12:00:00"), "A")) ++
      (100L to 109L).map(i => (i, 9L, ts("2024-01-08 12:00:00"), "A"))
    val log = rows.toDF("event_id", "user_id", "ts", "event_type")
    val out = Events.countAnomalies(log, window = 7)
      .collect().map(r => r.getDate(1).toString ->
        (Option(r.get(5)), r.getBoolean(6))).toMap
    assert(out("2024-01-07")._1 == None) // flat window: σ = 0 → null z
    assert(!out("2024-01-07")._2)
    // day 8 window = [1,1,1,1,1,1,10]: mean 16/7, σ = stddev_samp
    val cnts = Seq(1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 10.0)
    val mu = BigDecimal(cnts.sum / 7)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sd = BigDecimal(math.sqrt(
      cnts.map(c => math.pow(c - cnts.sum / 7, 2)).sum / 6))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val z = BigDecimal((10.0 - mu) / sd)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out("2024-01-08") == ((Some(z), z >= 2.0)))
    assert(out("2024-01-03")._1 == None) // partial window
    intercept[ParameterError] { Events.countAnomalies(log, 1) }
  }

  test("transitions: per-user consecutive bigrams with deterministic " +
    "tie order") {
    val t = Events.transitions(log, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // user 1: view→click, click→view (same-ts tie by id), view→purchase
    // user 2: view→purchase, purchase→click, click→view (next day)
    assert(t(("view", "click")) == 1L)
    assert(t(("click", "view")) == 2L)
    assert(t(("view", "purchase")) == 2L)
    assert(t(("purchase", "click")) == 1L)
    assert(t.values.sum == 6L) // 8 events − 2 users
  }

  test("attribution: first/last touch per conversion, null when no prior " +
    "touch, exact seconds since last touch (ev7)") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 09:00:00")
    def t(sec: Int) = new java.sql.Timestamp(ts0.getTime + sec * 1000L)
    val ev = Seq(
      (1L, "u1", "view", t(0)), (2L, "u1", "click", t(10)),
      (3L, "u1", "purchase", t(25)), (4L, "u1", "click", t(40)),
      (5L, "u1", "purchase", t(100)),
      (6L, "u2", "purchase", t(5)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = Events.attribution(ev, Seq("view", "click"), "purchase")
      .collect().map(r => r.getLong(1) -> r).toMap
    val c3 = out(3L)
    assert(c3.getAs[Long]("first_touch_id") == 1L)
    assert(c3.getAs[String]("first_touch_type") == "view")
    assert(c3.getAs[Long]("last_touch_id") == 2L)
    assert(c3.getAs[Double]("sec_since_touch") == 15.0)
    val c5 = out(5L)
    assert(c5.getAs[Long]("first_touch_id") == 1L) // first touch is stable
    assert(c5.getAs[Long]("last_touch_id") == 4L)  // latest click wins
    assert(c5.getAs[Double]("sec_since_touch") == 60.0)
    val c6 = out(6L) // conversion with no touch history: kept, nulls
    assert(c6.isNullAt(c6.fieldIndex("first_touch_id")))
    assert(c6.isNullAt(c6.fieldIndex("sec_since_touch")))
    intercept[IllegalArgumentException](Events.attribution(ev, Nil, "purchase"))
  }

  test("conversionLag: first-view→first-purchase seconds, interpolated " +
    "percentiles; pre-touch and non-converting users excluded (ev8)") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 09:00:00")
    def t(sec: Int) = new java.sql.Timestamp(ts0.getTime + sec * 1000L)
    val ev = Seq(
      (1L, "u1", "view", t(0)), (2L, "u1", "purchase", t(100)),
      (3L, "u2", "view", t(0)), (4L, "u2", "purchase", t(50)),
      (5L, "u3", "purchase", t(10)), (6L, "u3", "view", t(20)), // converted first
      (7L, "u4", "view", t(0))) // never converts
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = Events.conversionLag(ev, "view", "purchase").head
    assert(out.getAs[Long]("n_users") == 2L)
    // lags [50, 100]: p25 = 62.5, p50 = 75, p90 = 95 (linear interpolation)
    assert(out.getAs[Double]("p25") == 62.5)
    assert(out.getAs[Double]("p50") == 75.0)
    assert(out.getAs[Double]("p90") == 95.0)
    intercept[IllegalArgumentException](
      Events.conversionLag(ev, "view", "purchase", percentiles = Seq(1.5)))
  }

  test("burstiness: periodic user → −1, bursty user > 0, corpus " +
    "roll-up exact (ev15)") {
    // A: metronome every 10 s (σ = 0 → B = −1)
    val a = (0 to 4).map(i =>
      (i.toLong, 1L, ts(f"2024-01-01 10:00:${i * 10}%02d")))
    // B: three quick hits then a long silence
    val bGaps = Seq(1L, 1L, 1L, 100L)
    val bTimes = bGaps.scanLeft(0L)(_ + _)
    val b = bTimes.zipWithIndex.map { case (t, i) =>
      (100L + i, 2L, new java.sql.Timestamp(
        ts("2024-01-01 12:00:00").getTime + t * 1000L))
    }
    val ev = (a ++ b).toDF("event_id", "user_id", "ts")
    val s = Events.burstiness(ev).head
    assert(s.getAs[Long]("n_users") == 2L)
    val gs = bGaps.map(_ * 1e6) // µs
    val mu = gs.sum / 4
    val sg = math.sqrt(gs.map(g => g * g).sum / 4 - mu * mu)
    val bB = math.rint((sg - mu) / (sg + mu) * 1e6) / 1e6
    val expectedMean = math.rint((-1e6 + bB * 1e6) / 2) / 1e6
    // 2µ tolerance: this replication uses rint (half-even) while the
    // engine rounds half-up — the ORACLE pins the exact value
    assert(math.abs(s.getAs[Double]("mean_burstiness") - expectedMean) < 2e-6)
    assert(s.getAs[Double]("frac_bursty") == 0.5)
    intercept[graft.ParameterError](Events.burstiness(ev, minGaps = 0))
  }

  test("markovAttribution: removal effects from the K-step chain " +
    "golden; validations (ev14)") {
    // u1: view → purchase ; u2: view → (loss) ; u3: click → purchase
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "view"),
      (2L, 1L, ts("2024-01-01 10:05:00"), "purchase"),
      (3L, 2L, ts("2024-01-01 11:00:00"), "view"),
      (4L, 3L, ts("2024-01-01 12:00:00"), "click"),
      (5L, 3L, ts("2024-01-01 12:05:00"), "purchase"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = Events.markovAttribution(ev, Seq("view", "click"), "purchase")
      .collect().map(r => r.getString(0) -> r).toMap
    // base: START→view 2/3 · view→CONV 1/2  +  START→click 1/3 · 1 = 2/3
    assert(math.abs(out("view").getAs[Double]("base_p") - 2.0 / 3) < 1e-9)
    // removing either channel kills its 1/3 of conversion mass
    assert(out("view").getAs[Double]("removal_effect") == 0.333333)
    assert(out("click").getAs[Double]("removal_effect") == 0.333333)
    assert(out("view").getAs[Double]("share") == 0.5)
    assert(out("click").getAs[Double]("share") == 0.5)
    assert(math.abs(out("click").getAs[Double]("removed_p") - 1.0 / 3) < 1e-6)
    intercept[graft.ParameterError](
      Events.markovAttribution(ev, Nil, "purchase"))
    intercept[graft.ParameterError](
      Events.markovAttribution(ev, Seq("purchase"), "purchase"))
    intercept[graft.ParameterError](
      Events.markovAttribution(ev, Seq("view"), "purchase", steps = 0))
  }

  test("cohortLtv: signup-week cohorts, exact cents, non-payers " +
    "dilute the per-user value (ev13)") {
    val ev = Seq(
      // cohort of Mon 2024-01-01: u1 pays twice, u2 never pays
      (1L, 1L, ts("2024-01-01 10:00:00"), "purchase", Some(10.0)),
      (2L, 1L, ts("2024-01-03 10:00:00"), "purchase", Some(5.0)),
      (3L, 2L, ts("2024-01-02 10:00:00"), "view", None),
      // next week's cohort: u3 pays on age 1
      (4L, 3L, ts("2024-01-08 10:00:00"), "view", None),
      (5L, 3L, ts("2024-01-09 10:00:00"), "purchase", Some(7.0)))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = Events.cohortLtv(ev)
      .collect().map(r => (r.getAs[java.sql.Date]("cohort").toString,
        r.getAs[Long]("age_days")) ->
        (r.getAs[Long]("n_users"), r.getAs[Double]("cum_value_per_user"))).toMap
    // $10 over 2 users → 5/user; +$5 by age 2 → 7.5/user
    assert(out(("2024-01-01", 0L)) == ((2L, 5.0)))
    assert(out(("2024-01-01", 2L)) == ((2L, 7.5)))
    assert(out(("2024-01-08", 1L)) == ((1L, 7.0)))
    assert(out.size == 3)
  }

  test("kaplanMeier: censoring-correct survival steps; full-death " +
    "cohort pins the curve at 0 (ev11)") {
    def d(day: Int) = ts(f"2024-01-$day%02d 10:00:00")
    val ev = Seq(
      (1L, 1L, d(1)),                    // u1: lifetime 0, churned
      (2L, 2L, d(1)), (3L, 2L, d(3)),    // u2: lifetime 2, churned
      (4L, 3L, d(1)), (5L, 3L, d(10)))   // u3: lifetime 9, CENSORED
      .toDF("event_id", "user_id", "ts")
    val out = Events.kaplanMeier(ev, censorDays = 7)
      .collect().map(r => r.getAs[Long]("t") ->
        (r.getAs[Long]("n_risk"), r.getAs[Long]("n_events"),
          r.getAs[Double]("survival"))).toMap
    // steps only at event times; the censored user never counts as a death
    assert(out.keySet == Set(0L, 2L))
    assert(out(0L) == ((3L, 1L, 0.666667))) // 1 − 1/3
    assert(out(2L) == ((2L, 1L, 0.333333))) // × (1 − 1/2)
    // the longest-lived user is ALWAYS censored under this rule (their
    // last day IS the corpus edge), so the curve can never reach 0 —
    // the d = n zero-pin guard stays purely defensive
    val heavy = Seq(
      (1L, 1L, d(1)), (2L, 2L, d(1)), (3L, 3L, d(1)), (4L, 4L, d(10)))
      .toDF("event_id", "user_id", "ts")
    val k = Events.kaplanMeier(heavy, censorDays = 7)
      .collect().map(r => r.getAs[Long]("t") -> r.getAs[Double]("survival")).toMap
    // three dur-0 churns against the one censored survivor: 1 − 3/4
    assert(k(0L) == 0.25)
    assert(k.values.forall(_ > 0.0))
    intercept[graft.ParameterError](Events.kaplanMeier(ev, censorDays = 0))
  }

  test("abTest: deterministic arm split, exact counts, pooled " +
    "two-proportion z golden (ev10)") {
    import graft.text.Sampling
    // many users so both arms are populated; conversion iff user % 3 == 0
    val ev = (1L to 60L).flatMap { u =>
      Seq((u * 10, u, ts("2024-01-01 10:00:00"), "view")) ++
        (if (u % 3 == 0) Seq((u * 10 + 1, u, ts("2024-01-01 11:00:00"), "purchase"))
         else Nil)
    }.toDF("event_id", "user_id", "ts", "event_type")
    val s = Events.abTest(ev, "purchase").head
    val na = s.getAs[Long]("n_a"); val nb = s.getAs[Long]("n_b")
    val ca = s.getAs[Long]("conv_a"); val cb = s.getAs[Long]("conv_b")
    assert(na + nb == 60L && ca + cb == 20L)
    assert(na > 0 && nb > 0)
    // replay the arm assignment: counts must match the hash split
    val expA = (1L to 60L).count { u =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ab|$u".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h, 16).toDouble / 4294967296.0 < 0.5
    }
    assert(na == expA)
    // z from the same pooled formula
    val (pa, pb) = (ca.toDouble / na, cb.toDouble / nb)
    val p = (ca + cb).toDouble / (na + nb)
    val z = (pa - pb) / math.sqrt(p * (1 - p) * (1.0 / na + 1.0 / nb))
    assert(math.abs(s.getAs[Double]("z_score") - z) < 1e-5)
    // degenerate: everyone converts → null z
    val all = (1L to 10L).map(u => (u, u, ts("2024-01-01 10:00:00"), "purchase"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val d = Events.abTest(all, "purchase").head
    assert(d.isNullAt(d.fieldIndex("z_score")))
  }

  test("activeUsers: interval-sweep rolling actives — one row per user " +
    "per covered day, clipped at the last observed day (ev9)") {
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00")), (2L, 1L, ts("2024-01-01 11:00:00")),
      (3L, 1L, ts("2024-01-02 10:00:00")),
      (4L, 2L, ts("2024-01-01 10:00:00")), (5L, 2L, ts("2024-01-05 10:00:00")))
      .toDF("event_id", "user_id", "ts")
    val out = Events.activeUsers(ev, window = 3)
      .collect().map(r => r.getAs[java.sql.Date]("date").toString ->
        (r.getAs[Long]("dau"), r.getAs[Long]("active_3"))).toMap
    // u1: [d1,d1] then [d2,d4] ; u2: [d1,d3] then [d5,d5]
    assert(out("2024-01-01") == ((2L, 2L)))
    assert(out("2024-01-02") == ((1L, 2L)))
    assert(out("2024-01-03") == ((0L, 2L)))
    assert(out("2024-01-04") == ((0L, 1L)))
    assert(out("2024-01-05") == ((1L, 1L)))
    assert(out.size == 5)
    intercept[graft.ParameterError](Events.activeUsers(ev, window = 0))
  }

  test("windowedConversion: inside-window converts count, outside and " +
    "pre-touch conversions don't, and a pre-touch conversion does NOT " +
    "mask a later in-window one; denominators are touched users (ev22)") {
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "view"),   // converts at +30m
      (2L, 1L, ts("2024-01-01 10:30:00"), "purchase"),
      (3L, 2L, ts("2024-01-01 10:00:00"), "view"),   // converts at +2h: out
      (4L, 2L, ts("2024-01-01 12:00:00"), "purchase"),
      (5L, 3L, ts("2024-01-01 10:00:00"), "purchase"), // pre-touch convert
      (6L, 3L, ts("2024-01-01 11:00:00"), "view"),
      (7L, 4L, ts("2024-01-01 10:00:00"), "view"),   // never converts
      (8L, 5L, ts("2024-01-01 09:00:00"), "purchase"), // never views
      // user 6: pre-touch purchase PLUS an in-window one after the
      // first view — the global-min formulation wrongly dropped this
      (9L, 6L, ts("2024-01-01 09:00:00"), "purchase"),
      (10L, 6L, ts("2024-01-01 10:00:00"), "view"),
      (11L, 6L, ts("2024-01-01 10:30:00"), "purchase"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = graft.events.Events.windowedConversion(
      ev, "view", "purchase", windowSeconds = 3600).head
    assert(out.getAs[Long]("n_touched") == 5L) // users 1-4 and 6 viewed
    assert(out.getAs[Long]("n_converted") == 2L) // users 1 and 6 in window
    assert(out.getAs[Double]("rate") == 0.4)
    intercept[graft.ParameterError](
      graft.events.Events.windowedConversion(ev, "view", "purchase", 0))
    // plan pin: the first-touch window and the per-user aggregation both
    // hash-partition on the user key — Catalyst plans ONE row-scale
    // exchange (the final one-row agg adds only a SinglePartition one)
    val plan = graft.events.Events.windowedConversion(
      ev, "view", "purchase", windowSeconds = 3600)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }

  test("sessionCooccurrence: hand-computed lift over mixed sessions; " +
    "far-apart events split sessions and earn no pair (ev21)") {
    // 4 sessions (4 users, one session each): {a,b} {a,b} {a} {b} →
    // P(a)=P(b)=3/4, P(ab)=1/2 → lift = (2·4)/(3·3) = 0.888889
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "a"),
      (2L, 1L, ts("2024-01-01 10:01:00"), "b"),
      (3L, 2L, ts("2024-01-01 10:00:00"), "a"),
      (4L, 2L, ts("2024-01-01 10:01:00"), "b"),
      (5L, 3L, ts("2024-01-01 10:00:00"), "a"),
      (6L, 4L, ts("2024-01-01 10:00:00"), "b"),
      // user 5: a and b 2h apart → DIFFERENT sessions, no pair
      (7L, 5L, ts("2024-01-01 10:00:00"), "a"),
      (8L, 5L, ts("2024-01-01 12:30:00"), "b"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = graft.events.Events.sessionCooccurrence(ev)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n_sessions"), r.getAs[Double]("lift")))).toMap
    // 6 sessions total; a in 4, b in 4, together in 2 → lift 12/16
    assert(out(("a", "b")) == ((2L, 0.75)))
    assert(out.size == 1)
    intercept[ParameterError](
      Events.sessionCooccurrence(ev, maxTypes = 1).collect())
  }

  test("retentionDecay: exact-exponential cohort recovers lambda and " +
    "half-life; censoring keeps young cohorts out of deep offsets " +
    "(ev20)") {
    // 64 users start day 1; halve daily for 4 offsets: R(d) = 2^-d →
    // λ = ln 2, half-life exactly 1 day. A cohort born on the LAST
    // observed day can reach no offset at all — censoring must exclude
    // it from every denominator or the curve is polluted.
    val rows = (0 to 4).flatMap { d =>
      (1 to 64 / (1 << d)).map(u =>
        (d * 1000L + u, u.toLong, ts(f"2024-01-0${d + 1} 10:00:00"), "view"))
    } ++ (1 to 5).map(u => (9000L + u, 500L + u, ts("2024-01-05 10:00:00"), "view"))
    val ev = rows.toDF("event_id", "user_id", "ts", "event_type")
    val out = graft.events.Events.retentionDecay(ev).head
    assert(out.getAs[Long]("n_points") == 4L)
    assert(math.abs(out.getAs[Double]("lambda") - math.log(2.0)) < 1e-6)
    assert(math.abs(out.getAs[Double]("half_life_days") - 1.0) < 1e-6)
    intercept[graft.ParameterError](
      graft.events.Events.retentionDecay(ev, maxOffset = 1))
  }

  test("hourlyProfile: ISO dow mapping (Monday=1), distinct users per " +
    "cell (ev19)") {
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 09:30:00"), "view"), // a Monday
      (2L, 2L, ts("2024-01-01 09:45:00"), "view"),
      (3L, 1L, ts("2024-01-01 09:50:00"), "view"), // same user again
      (4L, 1L, ts("2024-01-07 23:10:00"), "view")) // a Sunday
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = Events.hourlyProfile(ev)
      .collect().map(r => (r.getAs[Long]("dow"), r.getAs[Long]("hour")) ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("n_users")))).toMap
    assert(out((1L, 9L)) == ((3L, 2L)))
    assert(out((7L, 23L)) == ((1L, 1L)))
    assert(out.size == 2)
  }

  test("newVsReturning: first-ever day counts as new, later days " +
    "returning; multiple events one day count once (ev18)") {
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "view"),
      (2L, 1L, ts("2024-01-01 11:00:00"), "view"), // same day, same user
      (3L, 1L, ts("2024-01-02 10:00:00"), "view"),
      (4L, 2L, ts("2024-01-02 10:00:00"), "view"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = Events.newVsReturning(ev)
      .collect().map(r => r.getAs[java.sql.Date]("date").toString ->
        ((r.getAs[Long]("new_users"), r.getAs[Long]("returning_users"),
          r.getAs[Long]("dau")))).toMap
    assert(out("2024-01-01") == ((1L, 0L, 1L)))
    assert(out("2024-01-02") == ((1L, 1L, 2L))) // u2 new, u1 returning
  }

  test("activityGini: histogram-telescoped Lorenz mass matches the " +
    "textbook rank form; uniform counts give gini 0 (ev16)") {
    // counts [1,1,1,1,6]: N=5, S=10, W=1+2+3+4+30=40 → G=0.4
    val ev = ((1L to 4L).map(u => (u, u, ts("2024-01-01 10:00:00"), "view")) ++
      (5L to 10L).map(i => (i + 10L, 5L, ts("2024-01-01 10:00:00"), "view")))
      .toDF("event_id", "user_id", "ts", "event_type")
    val g = Events.activityGini(ev).head
    assert(g.getAs[Long]("n_users") == 5L)
    assert(g.getAs[Long]("total_events") == 10L)
    assert(math.abs(g.getAs[Double]("gini") - 0.4) < 1e-9)
    // perfectly uniform activity → 0 concentration
    val uni = (1L to 6L).map(u => (u, (u - 1) / 2 + 1, // 3 users × 2 events
      ts("2024-01-01 10:00:00"), "view"))
      .toDF("event_id", "user_id", "ts", "event_type")
    assert(Events.activityGini(uni).head.getAs[Double]("gini") == 0.0)
  }

  test("rfmSegments: value-tied quintile bins — ties share a bin, " +
    "heaviest fifth lands in bin 5, recency bin 1 is most recent (ev17)") {
    // 5 users, distinct frequencies 1..5 (user u emits u events), user 5
    // most recent, user 1 stalest; only user 5 purchases
    val ev = (1L to 5L).flatMap { u =>
      (1L to u).map { i =>
        (u * 100 + i, u, ts(s"2024-01-0$u 10:00:00"),
          if (u == 5L && i == 1L) "purchase" else "view", 12.345)
      }
    }.toDF("event_id", "user_id", "ts", "event_type", "value")
    val rows = Events.rfmSegments(ev).collect()
    assert(rows.map(_.getAs[Long]("n_users")).sum == 5L)
    // user 5: most events (f_bin 5), most recent (r_bin 1), only payer
    // (m_bin 5), monetary 1235 cents (round half-up of 1234.5)
    val payer = rows.find(_.getAs[Long]("monetary_cents") > 0).get
    assert(payer.getAs[Long]("f_bin") == 5L)
    assert(payer.getAs[Long]("r_bin") == 1L)
    assert(payer.getAs[Long]("m_bin") == 5L)
    assert(payer.getAs[Long]("monetary_cents") == 1235L)
    // user 1: one event, stalest → r_bin 5, f_bin 1; zero monetary ties
    // with users 1-4 → they share ONE m_bin (value-tied binning), and
    // 4 of 5 users ⇒ ceil(5·4/5) = bin 4
    val stale = rows.find(r => r.getAs[Long]("f_bin") == 1L).get
    assert(stale.getAs[Long]("r_bin") == 5L)
    assert(stale.getAs[Long]("m_bin") == 4L)
  }

  test("rfmSegments: maxBins breach raises by default (the oracle-pinned " +
    "binning contract); autoCoarsen opt-in coarsens by powers of 10, " +
    "matching the explicit coarse quantum; raises past the 10^8 range " +
    "(ev17)") {
    // 5 payers with cents 101..105: quantum 1 → 5 monetary bins; under
    // maxBins = 3 the default RAISES (silently departing from the
    // requested quantum would diverge from any result pinned against
    // it), and the autoCoarsen opt-in must pick 10 (all collapse to
    // 100 → 1 bin ≤ 3)
    val ev = (1L to 5L).map { u =>
      (u, u, ts(s"2024-01-0$u 10:00:00"), "purchase", 1.00 + u * 0.01)
    }.toDF("event_id", "user_id", "ts", "event_type", "value")
    val eDefault = intercept[ParameterError] {
      Events.rfmSegments(ev, maxBins = 3L).collect()
    }
    assert(eDefault.getMessage.contains("autoCoarsen=true"))
    val auto = Events.rfmSegments(ev, maxBins = 3L, autoCoarsen = true)
      .orderBy("r_bin", "f_bin", "m_bin").collect()
    val explicit = Events.rfmSegments(ev, monetaryQuantumCents = 10L)
      .orderBy("r_bin", "f_bin", "m_bin").collect()
    assert(auto.toSeq == explicit.toSeq)
    // exact cents survive the coarsened binning: 101+...+105
    assert(auto.map(_.getAs[Long]("monetary_cents")).sum == 515L)
    // two monetary values 10^10 cents apart stay distinct at every
    // candidate quantum ≤ 10^8 → the loud raise still fires under
    // autoCoarsen
    val wide = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "purchase", 0.01),
      (2L, 2L, ts("2024-01-02 10:00:00"), "purchase", 1.0e8))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val e = intercept[ParameterError] {
      Events.rfmSegments(wide, maxBins = 1L, autoCoarsen = true).collect()
    }
    assert(e.getMessage.contains("auto-coarsening range"))
    // quantum already past Long.MaxValue/10: the coarser-candidate list
    // is empty (the first 10q iterate overflows) — must be the intended
    // ParameterError, not a bare NoSuchElementException (ADVICE r10).
    // maxBins = 0 forces the probe path even though the giant quantum
    // collapses every value to one bin.
    val eOv = intercept[ParameterError] {
      Events.rfmSegments(wide, monetaryQuantumCents = Long.MaxValue / 5L,
        maxBins = 0L, autoCoarsen = true).collect()
    }
    assert(eOv.getMessage.contains("overflow"))
  }

  test("rollingActiveUsers == per-window brute force (gaps, merges, W=1)") {
    import spark.implicits._
    // user 1 active on 1,2,10 (island merge within W, then a gap);
    // user 2 active on 5 only; day 20 far out so the spine has a long
    // all-zero tail the sweep must still emit
    val act = Seq((1L, "2024-03-01"), (1L, "2024-03-02"), (1L, "2024-03-10"),
      (2L, "2024-03-05"), (3L, "2024-03-20"))
    val ev = act.toDF("user_id", "d")
      .select($"user_id", to_timestamp($"d").as("ts"))
    for (w <- Seq(1, 7)) {
      val got = graft.events.Events.rollingActiveUsers(ev, windowDays = w)
        .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toMap
      val days = act.map(_._2).sorted
      val spine = Iterator.iterate(java.time.LocalDate.parse(days.head))(_.plusDays(1))
        .takeWhile(!_.isAfter(java.time.LocalDate.parse(days.last))).toSeq
      val expect = spine.map { d =>
        val lo = d.minusDays(w - 1)
        d.toString -> act.collect { case (u, ad)
          if !java.time.LocalDate.parse(ad).isBefore(lo) &&
             !java.time.LocalDate.parse(ad).isAfter(d) => u }.distinct.size.toLong
      }.toMap
      assert(got === expect, s"windowDays=$w")
    }
  }

  test("chiSquare: margins multiply out; independent table gives zero terms") {
    import spark.implicits._
    // perfectly independent 2x2: O == E everywhere → every term 0
    val ind = Seq.tabulate(60) { i =>
      (i.toLong, if (i % 2 == 0) "a" else "b", (i % 3).toLong)
    }.toDF("id", "t", "d")
    val z = graft.events.Events.chiSquare(ind, col("t"), col("d")).collect()
    assert(z.length == 6 && z.forall(_.getAs[Long]("chi2_term_micro") == 0L))
    // dependent: type a only on d=0 — chi2 = n (=4) for a 2x2 with
    // perfect association; cells (a,0)=2,(b,1)=2
    val dep = Seq((1L, "a", 0L), (2L, "a", 0L), (3L, "b", 1L), (4L, "b", 1L))
      .toDF("id", "t", "d")
    val terms = graft.events.Events.chiSquare(dep, col("t"), col("d"))
      .collect().map(_.getAs[Long]("chi2_term_micro")).sum
    assert(terms == 4000000L)
  }

  test("abConversionZ: counts, pooled z, and significance on a known split") {
    import spark.implicits._
    // variant 0: 4 users, 3 convert; variant 1: 4 users, 1 converts
    val ev = (0 until 8).flatMap { u =>
      val conv = if (u % 2 == 0) u < 6 else u == 1
      Seq((u * 10L, u.toLong, "view", "2024-01-01 00:00:00")) ++
        (if (conv) Seq((u * 10L + 1, u.toLong, "purchase", "2024-01-01 01:00:00")) else Nil)
    }.toDF("event_id", "user_id", "event_type", "s")
      .withColumn("ts", to_timestamp($"s")).drop("s")
    val r = graft.events.Events.abConversionZ(ev, col("user_id") % 2, "purchase").head()
    assert(r.getAs[Long]("n_a") == 4 && r.getAs[Long]("conv_a") == 3)
    assert(r.getAs[Long]("n_b") == 4 && r.getAs[Long]("conv_b") == 1)
    val p1 = 0.75; val p2 = 0.25; val pp = 0.5
    val z = (p1 - p2) / math.sqrt(pp * (1 - pp) * (1.0 / 4 + 1.0 / 4))
    assert(math.abs(r.getAs[Double]("z") - z) < 1e-12)
    assert(!r.getAs[Boolean]("significant_95")) // z ≈ 1.414 < 1.96
  }

  test("logRank: matches an independent plain-Scala computation of the " +
    "Mantel statistic on a mixed censoring fixture") {
    import spark.implicits._
    // 40 users, two events each: first day varies, lifetime u%7 days;
    // users whose last day is the corpus max are censored (censorDays=1)
    val rows = (1 to 40).flatMap { u =>
      val f = (u % 5) + 1
      val l = f + (u % 7)
      Seq((u * 100L, u.toLong, f"2024-01-$f%02d 08:00:00", "view"),
        (u * 100L + 1, u.toLong, f"2024-01-$l%02d 18:00:00", "click"))
    }
    val ev = rows.toDF("event_id", "user_id", "s", "event_type")
      .withColumn("ts", to_timestamp($"s")).drop("s")
    val r = Events.logRank(ev, censorDays = 1, seed = "lr").head()

    // independent reference: arms from the same md5 unit, then the
    // textbook per-event-time loop over exact risk sets (no
    // quantization — the engine's 1e12 grid is far inside 1e-6)
    val arms = ev.select($"user_id",
        graft.text.Sampling.hashUnit(col("user_id"), "lr") < 0.5)
      .distinct().as[(Long, Boolean)].collect().toMap
    val perUser = (1 to 40).map { u =>
      val dur = u % 7
      (dur.toLong, arms(u.toLong))
    }
    val maxL = (1 to 40).map(u => (u % 5) + 1 + (u % 7)).max
    val obs = (1 to 40).map { u =>
      val f = (u % 5) + 1; val l = f + (u % 7)
      (l - f.toLong, maxL - l >= 1, arms(u.toLong))
    }
    var o1 = 0.0; var e1 = 0.0; var v = 0.0; var times = 0
    obs.map(_._1).distinct.sorted.foreach { t =>
      val atRisk = obs.filter(_._1 >= t)
      val n = atRisk.size.toDouble
      val n1 = atRisk.count(_._3).toDouble
      val deaths = obs.filter(o => o._1 == t && o._2)
      val d = deaths.size.toDouble
      if (d > 0) {
        times += 1
        o1 += deaths.count(_._3)
        e1 += n1 * d / n
        if (n > 1) v += d * n1 / n * (n - n1) / n * (n - d) / (n - 1)
      }
    }
    assert(r.getAs[Long]("n_times") == times)
    assert(r.getAs[Long]("o1") == o1.toLong)
    assert(math.abs(r.getAs[Double]("e1") - e1) < 1e-6)
    assert(math.abs(r.getAs[Double]("var") - v) < 1e-6)
    assert(math.abs(r.getAs[Double]("chisq") -
      (o1 - e1) * (o1 - e1) / v) < 1e-4)
    assert(perUser.map(_._1).max == 6) // fixture sanity: 7 lifetimes
  }

  test("mannWhitney: doubled ranks and tie-corrected z match a " +
    "sort-based reference; all-tied values yield null z") {
    import spark.implicits._
    val vals = Seq(1.50, 2.00, 2.00, 3.25, 0.99, 2.00, 5.00, 1.50,
      4.10, 0.99, 7.77, 3.25)
    val ev = vals.zipWithIndex.map { case (v, i) =>
      (i * 10L, (i % 7).toLong, "purchase", v, "2024-01-01 00:00:00")
    }.toDF("event_id", "user_id", "event_type", "value", "s")
      .withColumn("ts", to_timestamp($"s")).drop("s")
    val r = Events.mannWhitney(ev, seed = "mw").head()

    val arms = ev.select($"user_id",
        graft.text.Sampling.hashUnit(col("user_id"), "mw") < 0.5)
      .distinct().as[(Long, Boolean)].collect().toMap
    val obs = vals.zipWithIndex.map { case (v, i) =>
      (math.round(v * 100), arms((i % 7).toLong)) }
    // sort-based average ranks (different algorithm from the engine's
    // histogram cumsum)
    val sorted = obs.map(_._1).sorted
    val rankOf = sorted.zipWithIndex.groupBy(_._1)
      .map { case (v, xs) => v -> xs.map(_._2 + 1).sum.toDouble / xs.size }
    val n1 = obs.count(_._2); val n2 = obs.size - n1
    val rr1 = obs.filter(_._2).map(o => rankOf(o._1)).sum
    val u1 = rr1 - n1 * (n1 + 1) / 2.0
    val ties = obs.groupBy(_._1).values.map(_.size.toLong)
    val tt = ties.map(t => t * t * t - t).sum
    val n = obs.size
    val varU = n1.toDouble * n2 / 12.0 *
      ((n + 1) - tt.toDouble / n / (n - 1))
    val z = (u1 - n1.toDouble * n2 / 2.0) / math.sqrt(varU)
    assert(r.getAs[Long]("n1") == n1 && r.getAs[Long]("n2") == n2)
    assert(r.getAs[Long]("r1_x2") == math.round(rr1 * 2))
    assert(r.getAs[Long]("u1_x2") == math.round(u1 * 2))
    assert(r.getAs[Long]("tie_term") == tt)
    assert(math.abs(r.getAs[Double]("z") - z) < 1e-6)

    // degenerate: every value identical → variance 0 → null z
    val flat = Seq.tabulate(6)(i =>
      (i.toLong, i.toLong, "purchase", 2.0, "2024-01-01 00:00:00"))
      .toDF("event_id", "user_id", "event_type", "value", "s")
      .withColumn("ts", to_timestamp($"s")).drop("s")
    assert(Events.mannWhitney(flat, seed = "mw").head().isNullAt(5))
  }

  test("positionAttribution: 40/20/40 with exact micro remainders; " +
    "1- and 2-touch journeys; post-conversion touches excluded") {
    import spark.implicits._
    val ev = Seq(
      // u1: 5 touches then purchase → 0.4 + 3 middles sharing 0.2 + 0.4
      (1L, 1L, "view"), (2L, 1L, "click"), (3L, 1L, "view"),
      (4L, 1L, "click"), (5L, 1L, "view"), (6L, 1L, "purchase"),
      (7L, 1L, "click"), // after the first conversion: no credit
      // u2: single touch → full credit
      (10L, 2L, "click"), (11L, 2L, "purchase"),
      // u3: two touches → 0.5 each
      (20L, 3L, "view"), (21L, 3L, "click"), (22L, 3L, "purchase"),
      // u4: no conversion → nothing
      (30L, 4L, "view"))
      .map { case (id, u, t0) => (id, u, t0, f"2024-01-01 00:${id}%02d:00") }
      .toDF("event_id", "user_id", "event_type", "s")
      .withColumn("ts", to_timestamp($"s")).drop("s")
    val r = Events.positionAttribution(ev, Seq("view", "click"), "purchase")
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getDouble(2))).toMap
    // u1 credits: view 0.4 (i=1) + middles i=3 view, i=5 view 0.4 (i=k)
    //   middle base = 200000 // 3 = 66666, rem 2 → middles get
    //   66667, 66667, 66666 micros (i=2 click, i=3 view, i=4 click)
    // u2: click 1.0; u3: view 0.5, click 0.5
    val viewCredit = 0.4 + 0.066667 + 0.4 + 0.5
    val clickCredit = 0.066667 + 0.066666 + 1.0 + 0.5
    assert(r("view")._1 == 4L && r("click")._1 == 4L)
    assert(math.abs(r("view")._2 - viewCredit) < 1e-9)
    assert(math.abs(r("click")._2 - clickCredit) < 1e-9)
    // every conversion hands out exactly 1.0
    assert(math.abs(r.values.map(_._2).sum - 3.0) < 1e-9)
  }

  test("rmst: area under a hand-built KM step curve, tail to tau, " +
    "tau before the first event time") {
    import spark.implicits._
    // durations: u1=2 (event), u2=2 (event), u3=5 (censored at corpus
    // max), u4=0 (censored) → one KM step at t=2: S = 1/3
    val ev = Seq(
      (1L, 1L, "2024-01-01"), (2L, 1L, "2024-01-03"),
      (3L, 2L, "2024-01-02"), (4L, 2L, "2024-01-04"),
      (5L, 3L, "2024-01-01"), (6L, 3L, "2024-01-06"),
      (7L, 4L, "2024-01-06"))
      .toDF("event_id", "user_id", "d")
      .withColumn("ts", to_timestamp($"d")).drop("d")
      .withColumn("event_type", lit("view"))
    // RMST(4) = 1·2 + (1/3)·2
    val r4 = Events.rmst(ev, tauDays = 4L, censorDays = 1).head()
    assert(r4.getAs[Long]("tau") == 4L)
    assert(math.abs(r4.getAs[Double]("rmst") - (2.0 + 2.0 / 3)) < 1e-5)
    // τ=1 ends before the first drop: RMST = τ exactly
    val r1 = Events.rmst(ev, tauDays = 1L, censorDays = 1).head()
    assert(r1.getAs[Double]("rmst") == 1.0)
    intercept[ParameterError] { Events.rmst(ev, tauDays = 0L) }
  }

  test("skipGrams: every (from, to, gap) within the window, exact " +
    "counts, gap capped at maxGap") {
    import spark.implicits._
    // user 1: a b c d  → gap1: ab,bc,cd; gap2: ac,bd; gap3: ad
    // user 2: a a      → gap1: aa
    val ev = Seq(
      (1L, 1L, "a"), (2L, 1L, "b"), (3L, 1L, "c"), (4L, 1L, "d"),
      (5L, 2L, "a"), (6L, 2L, "a"))
      .map { case (id, u, t) => (id, u, t, s"2024-01-01 00:0$id:00") }
      .toDF("event_id", "user_id", "event_type", "s")
      .withColumn("ts", to_timestamp($"s")).drop("s")
    val r = Events.skipGrams(ev, maxGap = 2).collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2)) ->
        x.getLong(3)).toMap
    assert(r == Map(
      ("a", "b", 1L) -> 1L, ("b", "c", 1L) -> 1L, ("c", "d", 1L) -> 1L,
      ("a", "a", 1L) -> 1L, ("a", "c", 2L) -> 1L, ("b", "d", 2L) -> 1L))
    intercept[ParameterError] { Events.skipGrams(ev, maxGap = 0) }
  }

  test("windowFunnel: later-occurrence chains count (unlike funnel's " +
    "first-occurrence rule); equal-ts events never chain; the window " +
    "bound is inclusive and measured from the chain's own first event") {
    def depths(rows: Seq[(Long, Long, Timestamp, String)], winUs: Long) =
      Events.windowFunnel(
        rows.toDF("event_id", "user_id", "ts", "event_type"),
        Seq("view", "click", "purchase"), windowMicros = winUs)
        .as[(Long, Long)].collect().toMap
    // user 1: purchase BEFORE the click's view→click chain — the
    // first-occurrence funnel would stop at 2, windowFunnel finds the
    // later view→click→purchase chain (view at 10:02)
    val laterChain = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "purchase"),
      (2L, 1L, ts("2024-01-01 10:02:00"), "view"),
      (3L, 1L, ts("2024-01-01 10:03:00"), "click"),
      (4L, 1L, ts("2024-01-01 10:04:00"), "purchase"))
    assert(depths(laterChain, 3600L * 1000000L) == Map(3L -> 1L))
    // equal timestamps: click at the SAME µs as the view cannot chain
    val tied = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "view"),
      (2L, 1L, ts("2024-01-01 10:00:00"), "click"))
    assert(depths(tied, 3600L * 1000000L) == Map(1L -> 1L))
    // inclusive boundary, anchored at the chain's OWN view: the chain
    // via the 10:00 view spans exactly 240 s (in), via 9:00 it's over
    val boundary = Seq(
      (1L, 1L, ts("2024-01-01 09:00:00"), "view"),
      (2L, 1L, ts("2024-01-01 10:00:00"), "view"),
      (3L, 1L, ts("2024-01-01 10:02:00"), "click"),
      (4L, 1L, ts("2024-01-01 10:04:00"), "purchase"))
    assert(depths(boundary, 240L * 1000000L) == Map(3L -> 1L))
    assert(depths(boundary, 239L * 1000000L) == Map(2L -> 1L))
    // a user with clicks but no view never enters the histogram
    val viewless = Seq((1L, 9L, ts("2024-01-01 10:00:00"), "click"))
    assert(depths(viewless, 3600L * 1000000L) == Map.empty[Long, Long])
  }
}
