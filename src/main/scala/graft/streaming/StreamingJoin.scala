package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream–stream event-time interval join — the attribution primitive
  * run continuously: match each conversion to the touches that preceded
  * it within a horizon, while BOTH sides keep arriving.
  *
  * Spark's stream-stream join buffers both sides in state; the interval
  * condition plus watermarks is what makes that state BOUNDED — the
  * planner derives each side's eviction point from the time-range
  * predicate (a touch can be dropped once the conversion watermark
  * passes touch_ts + horizon; a conversion once the touch watermark
  * passes its ts), so state size ∝ horizon × arrival rate, not stream
  * length. Without the interval bounds the same join would buffer
  * forever — the horizon is a correctness-of-resources contract, not an
  * optimization.
  *
  * Semantics match the batch formulation exactly on on-time data:
  * inner join on the key with touch_ts ≤ conv_ts < touch_ts + horizon
  * (left-closed, right-open — a conversion at exactly touch+horizon is
  * NOT attributed). Late arrivals beyond the watermark delay are
  * dropped by Spark before the join (the standard lateness trade; batch
  * with hindsight would have matched them) — the StreamingJoinSpec
  * batch-equivalence check runs on on-time fixtures where the two
  * agree row-for-row.
  */
object StreamingJoin {

  /** Join streaming `touches` to streaming `conversions` on `keyCol`
    * within `[touch_ts, touch_ts + horizonSeconds)`. Both inputs must
    * be streaming frames with event-time columns named `tsCol`. Output:
    * (key, touch_id, conv_id, touch_ts, conv_ts, lag_sec). */
  def attributionJoin(
      touches: DataFrame,
      conversions: DataFrame,
      horizonSeconds: Long,
      keyCol: String = "user_id",
      tsCol: String = "ts",
      idCol: String = "event_id",
      watermarkDelay: String = "10 minutes"): DataFrame = {
    if (horizonSeconds <= 0)
      throw new graft.ParameterError(
        s"horizonSeconds must be positive: $horizonSeconds")
    val t = touches.select(
      col(keyCol).as("key"), col(tsCol).cast("timestamp").as("touch_ts"),
      col(idCol).as("touch_id"))
      .withWatermark("touch_ts", watermarkDelay)
    val c = conversions.select(
      col(keyCol).as("__ckey"), col(tsCol).cast("timestamp").as("conv_ts"),
      col(idCol).as("conv_id"))
      .withWatermark("conv_ts", watermarkDelay)
    t.join(c,
      col("key") === col("__ckey") &&
        col("conv_ts") >= col("touch_ts") &&
        col("conv_ts") < col("touch_ts") + expr(s"INTERVAL $horizonSeconds SECONDS"))
      .select(col("key"), col("touch_id"), col("conv_id"),
        col("touch_ts"), col("conv_ts"),
        (unix_micros(col("conv_ts")) - unix_micros(col("touch_ts")))
          .cast("double").divide(1e6).as("lag_sec"))
  }

  /** The batch formulation of the SAME join — the equivalence oracle
    * for the streaming plan (and the backfill path: one code shape for
    * replay and live). */
  def attributionJoinBatch(
      touches: DataFrame,
      conversions: DataFrame,
      horizonSeconds: Long,
      keyCol: String = "user_id",
      tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    val t = touches.select(
      col(keyCol).as("key"), col(tsCol).cast("timestamp").as("touch_ts"),
      col(idCol).as("touch_id"))
    val c = conversions.select(
      col(keyCol).as("__ckey"), col(tsCol).cast("timestamp").as("conv_ts"),
      col(idCol).as("conv_id"))
    t.join(c,
      col("key") === col("__ckey") &&
        col("conv_ts") >= col("touch_ts") &&
        col("conv_ts") < col("touch_ts") + expr(s"INTERVAL $horizonSeconds SECONDS"))
      .select(col("key"), col("touch_id"), col("conv_id"),
        col("touch_ts"), col("conv_ts"),
        (unix_micros(col("conv_ts")) - unix_micros(col("touch_ts")))
          .cast("double").divide(1e6).as("lag_sec"))
  }
}
