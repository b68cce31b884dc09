package graft

import org.apache.spark.sql.functions._

import graft.costs._
import graft.panel.Panel

class CostsSpec extends SparkSpec {
  import spark.implicits._

  implicit val k: Panel.Keys = Panel.eod

  test("PercentageCommission: rate × turnover + exchange fee (D8)") {
    val df = Seq((0.5, 100.0)).toDF("turnover", "cv")
    val model = PercentageCommission(brokerCommissionRate = 0.001, exchangeFeeRate = 0.0002)
    val c = df.select(model.commissions($"cv", $"turnover", None).as("c")).head.getDouble(0)
    assert(r7(c) == r7(0.5 * 0.001 + 0.5 * 0.0002))
  }

  test("min commission floor only binds when 0 < commission < floor (base.py:57-66)") {
    val model = PercentageCommission(brokerCommissionRate = 0.001, minCommission = 2.5)
    val nlv = Some(lit(1000000.0))
    val out = Seq(0.0, 0.000001, 0.5).toDF("turnover")
      .select($"turnover", model.commissions(lit(100.0), $"turnover", nlv).as("c"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(out(0.0) == 0.0) // zero stays zero
    assert(out(0.000001) == 2.5 / 1000000.0) // floored
    assert(r7(out(0.5)) == r7(0.0005)) // above floor: unfloored
  }

  test("tier-2 blending (commission/base.py:147-153)") {
    val model = PercentageCommission(
      brokerCommissionRate = 0.001, brokerCommissionRateTier2 = 0.0005, tier2Ratio = 0.4)
    val c = Seq(1.0).toDF("t")
      .select(model.commissions(lit(100.0), $"t", None)).head.getDouble(0)
    assert(r7(c) == r7(0.6 * 0.001 + 0.4 * 0.0005))
  }

  test("PerShareCommission: per-share ÷ |contract value| × turnover (D9)") {
    val model = PerShareCommission(brokerCommissionPerShare = 0.005)
    val c = Seq(1.0).toDF("t")
      .select(model.commissions(lit(50.0), $"t", None)).head.getDouble(0)
    assert(r7(c) == r7(0.005 / 50.0))
  }

  test("FuturesCommission: cost per contract ÷ contract value (D10)") {
    val model = FuturesCommission(brokerCommissionPerContract = 0.85, exchangeFeePerContract = 1.18)
    val c = Seq(1.0).toDF("t")
      .select(model.commissions(lit(50000.0), $"t", None)).head.getDouble(0)
    assert(r7(c) == r7(2.03 / 50000.0))
  }

  test("SpotFX commission is 0.2 bps with no min (D11)") {
    val c = Seq(1.0).toDF("t")
      .select(CommissionModel.spotFX.commissions(lit(1.0), $"t", Some(lit(1000.0))))
      .head.getDouble(0)
    assert(c == 0.00002)
  }

  test("contract values: price/magnifier×multiplier; CASH ≡ 1 (D7)") {
    val out = Seq(
      ("STK", 100.0, 1.0, 1.0),
      ("FUT", 50.0, 10.0, 20.0),
      ("CASH", 1.1, 1.0, 1.0))
      .toDF("secType", "price", "mag", "mult")
      .select($"secType",
        ContractValues.contractValue($"price", $"secType", $"mag", $"mult").as("cv"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("STK") == 100.0)
    assert(out("FUT") == 100.0) // 50/10×20
    assert(out("CASH") == 1.0)
  }

  test("FixedSlippage and SLIPPAGE_BPS equivalence (D13)") {
    val df = Seq((0.5, 0.25)).toDF("turnover", "position")
    val viaClass = df.select(
      FixedSlippage(0.0005).slippage($"turnover", $"position")).head.getDouble(0)
    assert(viaClass == 0.00025)
  }

  test("demo commission catalog matches the reference's parameter packs " +
    "(commission/stk.py:190-273, fut.py:82-122)") {
    import CommissionModel.Demo
    val df = Seq((200.0, 0.5)).toDF("cv", "turnover") // cv 200, half the book turned
    def c(m: CommissionModel, nlv: Option[Double] = None): Double =
      df.select(m.commissions($"cv", $"turnover", nlv.map(lit))).head.getDouble(0)
    // US per-share: 0.005/200 × 0.5 = 0.0000125 (no NLV → no floor)
    assert(c(Demo.usStock) == 0.005 / 200.0 * 0.5)
    // floor binds: 1.00/10000 = 1e-4 > raw 1.25e-5
    assert(c(Demo.usStock, nlv = Some(10000.0)) == 1.00 / 10000.0)
    // percentage: 8 bps × 0.5 + 0.95 bps exchange fee × 0.5
    assert(r7(c(Demo.franceStock)) == r7(0.0008 * 0.5 + 0.000095 * 0.5))
    // futures: (0.85 + 1.18)/200 × 0.5
    assert(r7(c(Demo.cmeEquityEMiniFixed)) == r7(2.03 / 200.0 * 0.5))
    assert(c(Demo.koreaFutures) == 0.00004 * 0.5)
  }

  test("IBKRBorrowFees golden: shorts × 1.02 × rate/360 × days held, " +
    "weekends ×3 (_tests/slippage/test_slippage.py:45-87)") {
    // fixture: positions + as-of borrow-fee rates per (sid, date)
    val panel = Seq(
      ("FI12345", "2018-06-01", 0.10, 1.75), ("FI12345", "2018-06-02", 0.00, 1.75),
      ("FI12345", "2018-06-03", -0.20, 1.75), ("FI12345", "2018-06-04", -0.20, 1.85),
      ("FI12345", "2018-06-05", -0.10, 1.85), ("FI12345", "2018-06-08", 0.50, 1.85),
      ("FI12345", "2018-06-09", -0.25, 1.20),
      ("FI23456", "2018-06-01", -0.17, 8.00), ("FI23456", "2018-06-02", 0.32, 8.00),
      ("FI23456", "2018-06-03", 0.23, 8.23), ("FI23456", "2018-06-04", 0.00, 8.50),
      ("FI23456", "2018-06-05", -0.40, 0.25), ("FI23456", "2018-06-08", -0.40, 0.25),
      ("FI23456", "2018-06-09", -0.40, 0.25))
      .toDF("sid", "date", "position", "borrow_fee")
      .withColumn("date", to_date($"date"))
    val fees = panel
      .select($"sid", $"date",
        BorrowFees().slippage(lit(0.0), $"position").as("fee"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        math.rint(r.getDouble(2) * 1e9) / 1e9)
      .toMap
    def f(sid: String, d: String) = fees((sid, d))
    assert(f("FI12345", "2018-06-01") == 0.0)
    assert(f("FI12345", "2018-06-02") == 0.0)
    assert(f("FI12345", "2018-06-03") == 0.000009917)
    assert(f("FI12345", "2018-06-04") == 0.000010483)
    assert(f("FI12345", "2018-06-05") == 0.000005242)
    assert(f("FI12345", "2018-06-08") == 0.0)
    assert(f("FI12345", "2018-06-09") == 0.0000085)
    assert(f("FI23456", "2018-06-01") == 0.000038533) // 0.17×1.02×8/36000
    assert(f("FI23456", "2018-06-02") == 0.0)
    assert(f("FI23456", "2018-06-03") == 0.0)
    assert(f("FI23456", "2018-06-04") == 0.0)
    assert(f("FI23456", "2018-06-05") == 0.000002833)
    assert(f("FI23456", "2018-06-08") == 0.0000085) // 3× for the weekend gap
    assert(f("FI23456", "2018-06-09") == 0.000002833)
  }

  test("VolumeShareSlippage: impact = turnover·k·share², capped at the " +
    "volume limit; illiquid bars charge the limit; zero turnover free") {
    val m = VolumeShareSlippage(nlv = 1024.0)
    val df = Seq(
      // (close, volume, turnover)
      ("cap", 2.0, 1024.0, 0.5),      // share 256/1024 = 0.25 → capped 0.025
      ("open", 2.0, 1e6, 0.5),        // share 256/1e6, uncapped
      ("dry", 2.0, 0.0, 0.5),         // zero volume + turnover → limit
      ("flat", 2.0, 1024.0, 0.0))     // no trade → no impact
      .toDF("sid", "close", "volume", "turnover")
    val out = df.select(col("sid"),
      m.slippage(col("turnover"), lit(0.0)).as("s"))
      .as[(String, Double)].collect().toMap
    assert(out("cap") == 0.5 * 0.1 * 0.025 * 0.025)
    val share = 0.5 * 1024.0 / 2.0 / 1e6
    assert(out("open") == 0.5 * 0.1 * share * share)
    assert(out("dry") == 0.5 * 0.1 * 0.025 * 0.025)
    assert(out("flat") == 0.0)
    intercept[IllegalArgumentException](VolumeShareSlippage(nlv = 0.0))
    intercept[IllegalArgumentException](
      VolumeShareSlippage(nlv = 1.0, volumeLimit = 0.0))
  }

  test("SqrtImpact: coef·σ·√(Q/ADV) in bps; unknown ADV/σ → null, " +
    "not free (d31)") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      ("a", 100L, Some(400.0), Some(0.02)),  // √0.25·0.02·1e4 = 100 bps
      ("b", 400L, Some(400.0), Some(0.02)),  // √1 → 200 bps (√-scaling)
      ("c", 100L, None, Some(0.02)),         // no ADV
      ("d", 100L, Some(400.0), None),        // no σ
      ("e", 0L, Some(400.0), Some(0.02)))    // nothing to trade
      .toDF("sid", "q", "adv", "sigma")
    val out = df.select(col("sid"),
      graft.costs.SqrtImpact.impactBps(col("q"), col("adv"), col("sigma"))
        .as("bps"))
      .collect().map(r => r.getString(0) ->
        Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(out("a") == Some(100.0))
    assert(out("b") == Some(200.0)) // 4× the size, 2× the cost
    assert(out("c").isEmpty && out("d").isEmpty && out("e").isEmpty)
  }
}
