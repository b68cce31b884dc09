package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ParameterError

/** Streaming trending scores — per-key exponentially time-decayed
  * activity: score_T(key) = Σ_events 2^(−(T − tᵢ)/halfLife), the
  * "what's hot, weighted by recency" number behind trending topics,
  * surging error signatures, and burst-aware rate limits. A key that
  * stops arriving halves every `halfLifeSeconds`; steady arrivals
  * converge to rate·halfLife/ln2.
  *
  * State per key is two numbers — (anchorMicros, score AT the anchor)
  * — because the decayed sum only ever needs rescaling: folding an
  * event at t ≥ anchor gives score·2^((anchor−t)/hl) + 1 with the
  * anchor advanced; a LATE event at t < anchor just adds
  * 2^((t−anchor)/hl). Both are the mathematically exact contribution
  * of each event in reals, so out-of-order arrival (and any micro-
  * batch segmentation) costs only last-ulp float noise, never
  * correctness — the spec pins stream-vs-batch parity at 1e-9.
  * Consumers normalize to any read time T as score·2^((anchor−T)/hl).
  *
  * Scale shape: state is O(distinct keys) × 16 bytes with optional
  * TTL eviction (idle keys decay toward 0 anyway — `minScore`
  * suppresses emitting them, TTL reclaims the state). One shuffle on
  * the key, no windows, no joins.
  */
object StreamingTrending {

  final case class KeyEvent(key: String, micros: Long)
  final case class TrendState(anchorMicros: Long, score: Double)
  /** `score` is AT `anchorMicros` (the key's latest seen event time). */
  final case class Trend(key: String, anchorMicros: Long, score: Double)

  /** Stream (or batch) frame → per-key decayed scores, emitted in
    * UPDATE mode for every key that saw data this micro-batch. */
  def trendingScores(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      halfLifeSeconds: Long,
      minScore: Double = 0.0,
      stateTtl: Option[String] = None): Dataset[Trend] = {
    if (halfLifeSeconds < 1)
      throw new ParameterError(s"halfLifeSeconds must be >= 1: $halfLifeSeconds")
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .select(col(keyCol).cast("string").as("key"),
        unix_micros(col(tsCol).cast("timestamp")).as("micros"))
      .as[KeyEvent]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update, timeoutConf)(
        fold(halfLifeSeconds * 1e6, minScore, stateTtl))
  }

  private[graft] def fold(
      halfLifeMicros: Double, minScore: Double, stateTtl: Option[String])(
      key: String,
      rows: Iterator[KeyEvent],
      state: GroupState[TrendState]): Iterator[Trend] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    var anchor = state.getOption.map(_.anchorMicros).getOrElse(Long.MinValue)
    var score = state.getOption.map(_.score).getOrElse(0.0)
    rows.foreach { e =>
      if (anchor == Long.MinValue) { anchor = e.micros; score = 1.0 }
      else if (e.micros >= anchor) {
        score = score *
          math.pow(2.0, (anchor - e.micros).toDouble / halfLifeMicros) + 1.0
        anchor = e.micros
      } else {
        score += math.pow(2.0, (e.micros - anchor).toDouble / halfLifeMicros)
      }
    }
    state.update(TrendState(anchor, score))
    stateTtl.foreach(state.setTimeoutDuration)
    if (score >= minScore) Iterator.single(Trend(key, anchor, score))
    else Iterator.empty
  }
}
