package graft

import org.apache.spark.sql.functions._

import graft.trade.{AsOf, Trade}

class TradeSpec extends SparkSpec {
  import spark.implicits._

  test("positionsAndOrders: full outer + SELL negation (base.py:1845-1851)") {
    val positions = Seq(("S1", "U1", 100.0), ("S2", "U1", -50.0))
      .toDF("sid", "account", "quantity")
    val openOrders = Seq(
      ("S1", "U1", "x", 10.0, "BUY"),
      ("S1", "U1", "x", 4.0, "SELL"),
      ("S3", "U1", "x", 7.0, "BUY"))
      .toDF("sid", "account", "orderRef", "remaining", "action")
    val out = Trade.positionsAndOrders(positions, openOrders)
      .collect().map(r => (r.getString(0), r.getDouble(2))).toMap
    assert(out("S1") == 106.0) // 100 + 10 − 4
    assert(out("S2") == -50.0) // position only
    assert(out("S3") == 7.0) // order only (outer side)
  }

  test("netQuantities honors ALLOW_REBALANCE gates (base.py:1774-1796)") {
    val targets = Seq(("S1", "U1", 100.0), ("S2", "U1", -100.0), ("S3", "U1", 50.0))
      .toDF("sid", "account", "target_quantity")
    val held = Seq(("S1", "U1", 95.0), ("S2", "U1", 10.0))
      .toDF("sid", "account", "quantity")

    def net(g: Trade.Rebalance) =
      Trade.netQuantities(targets, held, g).collect()
        .map(r => r.getString(0) -> r.getDouble(2)).toMap

    val allow = net(Trade.AllowRebalance)
    assert(allow("S1") == 5.0 && allow("S2") == -110.0 && allow("S3") == 50.0)

    // same-direction top-up suppressed entirely
    val no = net(Trade.NoRebalance)
    assert(no("S1") == 0.0) // rebalance of an existing long
    assert(no("S2") == -110.0) // direction flip is not a rebalance
    assert(no("S3") == 50.0) // new position

    // threshold: 5/95 ≈ 5.3% < 25% → suppressed
    val thresh = net(Trade.RebalanceThreshold(0.25))
    assert(thresh("S1") == 0.0 && thresh("S2") == -110.0 && thresh("S3") == 50.0)
  }

  test("orderStubs: signed → BUY/SELL, zeros dropped (base.py:657-692)") {
    val net = Seq(("S1", "U1", 5.0), ("S2", "U1", -3.0), ("S3", "U1", 0.0))
      .toDF("sid", "account", "net_quantity")
    val stubs = Trade.orderStubs(net, "strat").collect()
      .map(r => (r.getString(0), r.getString(2), r.getLong(4))).toList.sortBy(_._1)
    assert(stubs == List(("S1", "BUY", 5L), ("S2", "SELL", 3L)))
  }

  test("childOrders reverse the action and link ParentId via positional " +
    "ids, reference shape row.suffix (base.py:607-655)") {
    val orders = Seq(
      ("S2", "U1", "SELL", "strat", 3.0),
      ("S1", "U1", "BUY", "strat", 5.0))
      .toDF("sid", "account", "action", "orderRef", "totalQuantity")
    val parents = Trade.withOrderIds(orders, suffix = "99")
      .collect().map(r => r.getAs[String]("sid") -> r.getAs[String]("orderId")).toMap
    // positions follow (sid, account) order, not input order
    assert(parents == Map("S1" -> "0.99", "S2" -> "1.99"))
    val children = Trade.childOrders(Trade.withOrderIds(orders, suffix = "99"))
      .collect().map(r => (r.getAs[String]("sid"), r.getAs[String]("action"),
        r.getAs[String]("parentId"))).toSet
    assert(children == Set(("S1", "SELL", "0.99"), ("S2", "BUY", "1.99")))
    // pre-assigned ids are respected, not overwritten
    val custom = orders.withColumn("orderId", concat_ws("-", $"sid", $"orderRef"))
    assert(Trade.childOrders(custom).collect()
      .map(_.getAs[String]("parentId")).toSet == Set("S1-strat", "S2-strat"))
  }

  test("AsOf.join picks most recent value at or before probe date (J6)") {
    val probes = Seq(("A", "2024-01-05", 1), ("A", "2024-01-10", 2), ("A", "2024-01-02", 3))
      .toDF("sid", "date", "probe_id").withColumn("date", to_date($"date"))
    val values = Seq(("A", "2024-01-01", 10.0), ("A", "2024-01-05", 50.0), ("A", "2024-01-08", 80.0))
      .toDF("sid", "date", "fee").withColumn("date", to_date($"date"))
    val out = AsOf.join(probes, values, "sid", "date", Seq("fee"))
      .collect().map(r => r.getAs[Int]("probe_id") -> r.getAs[Double]("fee")).toMap
    assert(out(3) == 10.0) // Jan 02 → Jan 01 value
    assert(out(1) == 50.0) // Jan 05 → same-day value
    assert(out(2) == 80.0) // Jan 10 → Jan 08 value
  }

  test("resolveSignalDateTime: review date wins, else now in strategy tz (D20)") {
    assert(Trade.resolveSignalDateTime("America/New_York", Some("2024-03-15")) ==
      ("2024-03-15", "23:59:59"))
    // 2024-06-01T18:30:00Z = 14:30 in New York, 03:30 next day in Tokyo
    val fixed = () => java.time.Instant.parse("2024-06-01T18:30:00Z")
    assert(Trade.resolveSignalDateTime("America/New_York", None, fixed) ==
      ("2024-06-01", "14:30:00"))
    assert(Trade.resolveSignalDateTime("Asia/Tokyo", None, fixed) ==
      ("2024-06-02", "03:30:00"))
  }

  test("requireFresh raises a staleness error naming max date (base.py:777-784)") {
    implicit val k: graft.panel.Panel.Keys = graft.panel.Panel.eod
    val panel = Seq(("A", "2024-01-02", 1.0)).toDF("sid", "date", "value")
      .withColumn("date", to_date($"date"))
    Trade.requireFresh(panel, "2024-01-02") // ok
    val err = intercept[IllegalArgumentException] {
      Trade.requireFresh(panel, "2024-01-05")
    }
    assert(err.getMessage.contains("2024-01-05") && err.getMessage.contains("stale"))
  }

  test("todayWeights: latest bar before trade time; no earlier bar raises " +
    "(W10/D20, base.py:794-806, test_trade_date_validation.py:189)") {
    implicit val k: graft.panel.Panel.Keys =
      graft.panel.Panel.Keys(sid = "sid", order = Seq("date", "time"), dateCol = "date")
    val panel = Seq(
      ("A", "2024-01-02", "09:30:00", 1.0), ("A", "2024-01-02", "11:00:00", 2.0),
      ("A", "2024-01-02", "15:30:00", 3.0))
      .toDF("sid", "date", "time", "weight")
      .withColumn("date", to_date($"date"))
    val picked = Trade.todayWeights(panel, "2024-01-02", Some("12:00:00"))
      .select("weight").head.getDouble(0)
    assert(picked == 2.0) // 11:00 bar, strictly before noon
    val e = intercept[IllegalArgumentException] {
      Trade.todayWeights(panel, "2024-01-02", Some("09:00:00"))
    }
    assert(e.getMessage.contains("no times earlier than trade time 09:00:00"))
    // stale date: earlier times exist in history but not on the signal date
    // (base.py:810-830)
    val stale = intercept[IllegalArgumentException] {
      Trade.todayWeights(panel, "2024-01-03", Some("12:00:00"))
    }
    assert(stale.getMessage.contains(
      "no 12:00:00 data found in prices DataFrame for signal date 2024-01-03"))
  }

  test("targetQuantities: weights × alloc × NLV × FX ÷ contract value (D21)") {
    val weights = Seq(("S1", 0.5, 100.0)).toDF("sid", "weight", "close")
    val master = Seq(("S1", "JPY", "STK", 1.0, 1.0))
      .toDF("sid", "currency", "secType", "priceMagnifier", "multiplier")
    val allocations = Seq(("U1", 0.5)).toDF("account", "allocation")
    val balances = Seq(("U1", "USD", 1000000.0)).toDF("account", "currency", "netLiquidation")
    val rates = Seq(("USD", "JPY", 110.0)).toDF("baseCurrency", "quoteCurrency", "rate")
    val out = Trade.targetQuantities(weights, master, allocations, balances, rates).head
    // 0.5 × 0.5 × 1,000,000 × 110 / 100 = 275,000
    assert(out.getAs[Long]("target_quantity") == 275000L)
  }

  test("targetQuantities: ACCOUNT_BALANCE_FIELD uses the lesser of several " +
    "balance fields (base.py:1647-1671, test_trade.py:1440)") {
    val weights = Seq(("S1", 0.5, 100.0)).toDF("sid", "weight", "close")
    val master = Seq(("S1", "USD", "STK", 1.0, 1.0))
      .toDF("sid", "currency", "secType", "priceMagnifier", "multiplier")
    val allocations = Seq(("U1", 1.0)).toDF("account", "allocation")
    val balances = Seq(("U1", "USD", 1000000.0, 800000.0))
      .toDF("account", "currency", "netLiquidation", "previousEquity")
    val rates = Seq(("USD", "USD", 1.0)).toDF("baseCurrency", "quoteCurrency", "rate")
    val out = Trade.targetQuantities(weights, master, allocations, balances, rates,
      balanceFields = Seq("netLiquidation", "previousEquity")).head
    // lesser equity basis: 0.5 × 1.0 × 800,000 / 100 = 4,000
    assert(out.getAs[Long]("target_quantity") == 4000L)
  }

  test("intervalBars + effectiveLookback (base.py:1050-1086)") {
    import graft.pipeline.Strategy
    assert(Strategy.intervalBars("W") == 5)
    assert(Strategy.intervalBars("2W") == 10)
    assert(Strategy.intervalBars("Q") == 65)
    assert(Strategy.intervalBars("junk") == 0)
    val s = new Strategy {
      val code = "iv"
      override def rebalanceInterval: Option[String] = Some("M")
      def pricesToSignals(p: org.apache.spark.sql.DataFrame) = p
    }
    assert(s.effectiveLookback == 252 + 22)
    val explicit = new Strategy {
      val code = "iv2"
      override def lookbackWindow = 30
      override def rebalanceInterval: Option[String] = Some("M")
      def pricesToSignals(p: org.apache.spark.sql.DataFrame) = p
    }
    assert(explicit.effectiveLookback == 30) // explicit window wins as-is
  }

  test("lookback inferred from window/interval params " +
    "(test_prices.py:272,371: max window + widest interval)") {
    import graft.pipeline.Strategy
    val windows = new Strategy {
      val code = "w"
      override def windowParams: Seq[Int] = Seq(20, 50)
      def pricesToSignals(p: org.apache.spark.sql.DataFrame) = p
    }
    assert(windows.effectiveLookback == 50) // max window, NOT 252
    val both = new Strategy {
      val code = "wi"
      override def windowParams: Seq[Int] = Seq(20, 50)
      override def intervalParams: Seq[String] = Seq("W", "M")
      def pricesToSignals(p: org.apache.spark.sql.DataFrame) = p
    }
    assert(both.effectiveLookback == 50 + 22) // + widest interval span
    val none = new Strategy {
      val code = "n"
      def pricesToSignals(p: org.apache.spark.sql.DataFrame) = p
    }
    assert(none.effectiveLookback == 0) // unset: engine skips widening
    // an interval that intervalBars cannot parse still signals "history
    // matters": the 252 default applies, 0 extra bars (base.py:1073-1077)
    val unparsable = new Strategy {
      val code = "u"
      override def rebalanceInterval: Option[String] = Some("30min")
      def pricesToSignals(p: org.apache.spark.sql.DataFrame) = p
    }
    assert(unparsable.effectiveLookback == 252)
  }

  test("reindexLikeOrders raises on a time-indexed panel without a " +
    "signal time (test_orders.py:213, base.py:595-599)") {
    implicit val k: graft.panel.Panel.Keys = graft.panel.Panel.eod
    val orders = Seq(("A", "U1", "BUY", "x", 5L))
      .toDF("sid", "account", "action", "orderRef", "totalQuantity")
    val intradayPanel = Seq(
      ("A", "2024-01-02", "09:30:00", 10.0), ("A", "2024-01-02", "15:30:00", 11.0))
      .toDF("sid", "date", "time", "close")
      .withColumn("date", to_date($"date"))
    val err = intercept[IllegalArgumentException] {
      Trade.reindexLikeOrders(orders, intradayPanel, "close", "2024-01-02")
    }
    assert(err.getMessage.contains("take a cross-section first"))
    // with a signal time the slice is well-defined
    val ok = Trade.reindexLikeOrders(
      orders, intradayPanel, "close", "2024-01-02", Some("15:30:00"))
    assert(ok.head.getAs[Double]("close") == 11.0)
  }

  test("inferTimezone: one master timezone infers; several raise " +
    "(test_prices.py:670, base.py:1117-1125)") {
    import graft.sources.Sources
    val one = Seq(("FI1", "America/New_York"), ("FI2", "America/New_York"))
      .toDF("sid", "timezone")
    assert(Sources.inferTimezone(one) == "America/New_York")
    assert(Sources.inferTimezone(one, explicit = Some("Asia/Tokyo")) == "Asia/Tokyo")
    val two = Seq(("FI1", "America/New_York"), ("FI2", "Japan"))
      .toDF("sid", "timezone")
    val err = intercept[IllegalArgumentException] {
      Sources.inferTimezone(two)
    }
    assert(err.getMessage.contains(
      "cannot infer timezone because multiple timezones are present"))
    assert(err.getMessage.contains("America/New_York") &&
      err.getMessage.contains("Japan"))
  }

  test("targetQuantities: self-rate ≡ 1 when currencies match (base.py:1720)") {
    val weights = Seq(("S1", 0.1, 50.0)).toDF("sid", "weight", "close")
    val master = Seq(("S1", "USD", "STK", 1.0, 1.0))
      .toDF("sid", "currency", "secType", "priceMagnifier", "multiplier")
    val allocations = Seq(("U1", 1.0)).toDF("account", "allocation")
    val balances = Seq(("U1", "USD", 100000.0)).toDF("account", "currency", "netLiquidation")
    val rates = spark.emptyDataFrame
      .select(lit("x").as("baseCurrency"), lit("x").as("quoteCurrency"), lit(1.0).as("rate"))
      .limit(0)
    val out = Trade.targetQuantities(weights, master, allocations, balances, rates).head
    assert(out.getAs[Long]("target_quantity") == 200L)
  }

  test("twapSlices: remainder-first integer split, zero slices dropped, " +
    "duplicate times raise (d28)") {
    val stubs = Seq(
      ("S1", "U1", "BUY", "demo", 10L),
      ("S2", "U1", "SELL", "demo", 2L))
      .toDF("sid", "account", "action", "orderRef", "totalQuantity")
    val out = Trade.twapSlices(stubs,
      times = Seq("09:30:00", "12:00:00", "15:30:00"), suffix = "7")
      .collect().map(r => (r.getString(0), r.getAs[Int]("slice_idx")) -> r).toMap
    // 10 over 3 → 4/3/3 at the three times
    assert(out(("S1", 0)).getAs[Long]("quantity") == 4L)
    assert(out(("S1", 1)).getAs[Long]("quantity") == 3L)
    assert(out(("S1", 2)).getAs[Long]("quantity") == 3L)
    assert(out(("S1", 1)).getAs[String]("slice_time") == "12:00:00")
    assert(out(("S1", 0)).getAs[String]("parentId") == "0.7")
    // 2 over 3 → 1/1 and the third slice vanishes
    assert(out(("S2", 0)).getAs[Long]("quantity") == 1L)
    assert(out(("S2", 1)).getAs[Long]("quantity") == 1L)
    assert(!out.contains(("S2", 2)))
    assert(out.size == 5)
    intercept[graft.ParameterError](Trade.twapSlices(stubs, Seq("a", "a")))
    intercept[graft.ParameterError](Trade.twapSlices(stubs, Nil))
  }

  test("reconcilePositions: each break class labeled, diff signed " +
    "toward the broker (d40)") {
    val expected = Seq(("S1", "U1", 100L), ("S2", "U1", 50L), ("S3", "U1", 10L))
      .toDF("sid", "account", "quantity")
    val reported = Seq(("S1", "U1", 100L), ("S2", "U1", 45L), ("S4", "U1", 7L))
      .toDF("sid", "account", "quantity")
    val out = Trade.reconcilePositions(expected, reported)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[String]("status"), r.getAs[Long]("diff")))).toMap
    assert(out("S1") == (("MATCHED", 0L)))
    assert(out("S2") == (("QTY_DIFF", -5L))) // broker shows 5 fewer
    assert(out("S3") == (("MISSING_AT_BROKER", -10L)))
    assert(out("S4") == (("UNEXPECTED_AT_BROKER", 7L)))
  }

  test("crossOrders: per-sid BUY/SELL netting, running-sum allocation " +
    "in account order, one-sided sids cross nothing (d35)") {
    val stubs = Seq(
      // S1: buys 30+20, sells 35 → cross 35: U1 gets 30, U2 gets 5
      ("S1", "U1", "BUY", "a", 30L), ("S1", "U2", "BUY", "a", 20L),
      ("S1", "U3", "SELL", "a", 35L),
      // S2: only buys → nothing crosses
      ("S2", "U1", "BUY", "a", 10L))
      .toDF("sid", "account", "action", "orderRef", "totalQuantity")
    val out = Trade.crossOrders(stubs)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getAs[Long]("crossed_qty"), r.getAs[Long]("external_qty")))).toMap
    assert(out(("S1", "U1", "BUY")) == ((30L, 0L)))
    assert(out(("S1", "U2", "BUY")) == ((5L, 15L)))
    assert(out(("S1", "U3", "SELL")) == ((35L, 0L)))
    assert(out(("S2", "U1", "BUY")) == ((0L, 10L)))
    // conservation: crossed BUY mass equals crossed SELL mass per sid
    val s1 = out.filter(_._1._1 == "S1")
    assert(s1.filter(_._1._3 == "BUY").values.map(_._1).sum ==
      s1.filter(_._1._3 == "SELL").values.map(_._1).sum)
  }

  test("almgrenSlices: sinh schedule front-loads, slices telescope to " +
    "the full quantity, zero tails dropped (d32)") {
    val stubs = Seq(("S1", "U1", "BUY", "demo", 1000L))
      .toDF("sid", "account", "action", "orderRef", "totalQuantity")
    val times = Seq("09:30:00", "12:00:00", "15:30:00")
    val qty = Trade.almgrenSlices(stubs, times, kappaT = 2.0, suffix = "7")
      .collect().map(r => r.getAs[Int]("slice_idx") -> r.getAs[Long]("quantity"))
      .toMap
    // fractions sinh(2(3−j)/3)/sinh(2): 1, .5178…, .1994… → 482/318/200-ish
    assert(qty.values.sum == 1000L)
    assert(qty(0) > qty(1) && qty(1) > qty(2)) // risk aversion front-loads
    val f1 = math.rint(math.sinh(2.0 * 2 / 3) / math.sinh(2.0) * 1e12) / 1e12
    assert(qty(0) == 1000L - math.rint(1000 * f1).toLong)
    // a tiny order trades only its leading slices — zero tail dropped
    val tiny = Seq(("S2", "U1", "BUY", "demo", 1L))
      .toDF("sid", "account", "action", "orderRef", "totalQuantity")
    val tq = Trade.almgrenSlices(tiny, times, kappaT = 2.0, suffix = "7")
      .collect()
    assert(tq.map(_.getAs[Long]("quantity")).sum == 1L && tq.length == 1)
    intercept[graft.ParameterError](
      Trade.almgrenSlices(stubs, times, kappaT = 0.0))
  }

  test("capByParticipation: floor clamp at rate·ADV, missing ADV drops " +
    "the order, flags only clamped rows (d29)") {
    val stubs = Seq(
      ("S1", "U1", "BUY", "demo", 100L),  // clamped to 50
      ("S2", "U1", "SELL", "demo", 30L),  // under the cap
      ("S3", "U1", "BUY", "demo", 10L))   // no ADV → untradeable
      .toDF("sid", "account", "action", "orderRef", "totalQuantity")
    val adv = Seq(("S1", 1000.0), ("S2", 1000.0)).toDF("sid", "adv")
    val out = Trade.capByParticipation(stubs, adv, rate = 0.05)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("totalQuantity"), r.getAs[Boolean]("was_capped")))).toMap
    assert(out("S1") == ((50L, true)))
    assert(out("S2") == ((30L, false)))
    assert(!out.contains("S3"))
    intercept[graft.ParameterError](Trade.capByParticipation(stubs, adv, 0.0))
    intercept[graft.ParameterError](Trade.capByParticipation(stubs, adv, 1.5))
  }
}
