package graft

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.pipeline.{Backtest, Strategy}

/** S8 save_to_results custom result fields, mirroring the reference
  * golden test (_tests/test_save_custom_dataframe.py:490-609): BuyBelow10
  * saves `DollarVolume = close × volume` and the results panel grows an
  * extra field with exact values; reserved names are rejected
  * (test_save_custom_dataframe.py:35-124, base.py:1543-1557).
  */
class SaveCustomSpec extends SparkSpec {
  import spark.implicits._

  private lazy val prices: DataFrame = Seq(
    // same fixture as test_save_custom_dataframe.py:508-540
    ("FI12345", "2018-05-01", 9.00, 5000.0),
    ("FI12345", "2018-05-02", 11.00, 16000.0),
    ("FI12345", "2018-05-03", 10.50, 8800.0),
    ("FI12345", "2018-05-04", 9.99, 9900.0),
    ("FI23456", "2018-05-01", 9.89, 15000.0),
    ("FI23456", "2018-05-02", 11.00, 14000.0),
    ("FI23456", "2018-05-03", 8.50, 28800.0),
    ("FI23456", "2018-05-04", 10.50, 17000.0))
    .toDF("sid", "date", "close", "volume")
    .withColumn("date", to_date($"date"))

  private def buyBelow10(custom: Seq[(String, Column)]): Strategy =
    new Strategy {
      val code = "buy-below-10"
      def pricesToSignals(prices: DataFrame): DataFrame =
        prices.withColumn("signal", (col("close") < 10).cast("int"))
      override def customFields: Seq[(String, Column)] = custom
    }

  test("custom DollarVolume joins the results fields with exact values " +
    "(test_save_custom_dataframe.py:577-609)") {
    val results = Backtest.run(
      buyBelow10(Seq("DollarVolume" -> (col("close") * col("volume")))), prices)
    val fields = results.select("field").distinct().as[String].collect().toSet
    assert(fields == graft.model.Fields.results.toSet + "DollarVolume")

    val dv = results.where($"field" === "DollarVolume")
      .collect()
      .map { r: Row =>
        (r.getString(r.fieldIndex("sid")), r.getDate(r.fieldIndex("date")).toString) ->
          r.getDouble(r.fieldIndex("value"))
      }.toMap
    assert(dv(("FI12345", "2018-05-01")) == 45000.0) // 9 * 5000
    assert(dv(("FI12345", "2018-05-02")) == 176000.0) // 11 * 16000
    assert(dv(("FI12345", "2018-05-03")) == 92400.0) // 10.50 * 8800
    assert(dv(("FI12345", "2018-05-04")) == 98901.0) // 9.99 * 9900
    assert(dv(("FI23456", "2018-05-01")) == 148350.0) // 9.89 * 15000
    assert(dv(("FI23456", "2018-05-02")) == 154000.0) // 11 * 14000
    assert(dv(("FI23456", "2018-05-03")) == 244800.0) // 8.50 * 28800
    assert(dv(("FI23456", "2018-05-04")) == 178500.0) // 10.50 * 17000
  }

  test("reserved names are rejected (test_save_custom_dataframe.py:35-124)") {
    for (name <- Seq("Signal", "Weight", "TotalHolding", "Benchmark")) {
      val e = intercept[IllegalArgumentException] {
        Backtest.run(buyBelow10(Seq(name -> (col("close") * col("volume")))), prices)
      }
      assert(e.getMessage == s"name $name is a reserved name")
    }
  }
}
