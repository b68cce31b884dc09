package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming OHLCV bar builder — the continuous form of
  * [[graft.panel.Panel.resampleOhlcv]]: a trade stream becomes
  * interval bars through a watermarked event-time window aggregation.
  * Same aggregate semantics as the batch op (min_by/max_by firsts and
  * lasts over the (ts, tiebreak) total order, exact long volume), so a
  * bar computed live equals the bar a batch backfill would produce from
  * the same trades — asserted in StreamingBarsSpec.
  *
  * Scale shape: Structured Streaming keeps ONE aggregation state row
  * per open (sid, window); the watermark closes and emits bars once
  * event time passes window end + delay, bounding state by the number
  * of instruments × windows inside the allowed lateness (not by trade
  * volume). All aggregates are declarative (no flatMapGroupsWithState),
  * so Spark's own state store handles retries/recovery. */
object StreamingBars {

  def ohlcvStream(
      trades: DataFrame,
      interval: String,
      watermarkDelay: String,
      tsCol: String = "ts",
      sidCol: String = "sid",
      priceCol: String = "price",
      sizeCol: String = "size",
      tiebreakCol: String = "trade_id"): DataFrame = {
    val orderKey = struct(col(tsCol), col(tiebreakCol))
    trades
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(col(sidCol), window(col(tsCol), interval))
      .agg(
        min_by(col(priceCol), orderKey).as("open"),
        max(col(priceCol)).as("high"),
        min(col(priceCol)).as("low"),
        max_by(col(priceCol), orderKey).as("close"),
        sum(col(sizeCol).cast("long")).as("volume"),
        count(lit(1)).as("n_trades"))
      .select(
        col(sidCol), col("window.start").as("bar_start"),
        col("window.end").as("bar_end"),
        col("open"), col("high"), col("low"), col("close"),
        col("volume"), col("n_trades"))
  }
}
