package graft.panel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.panel.Panel.Keys

/** Event-study alignment: slice each sid's series into a trading-day
  * window around its events and re-key rows by RELATIVE offset, the
  * `df.shift(±k)` stacking a pandas user runs to build CAR curves
  * (reference strategies compose this on the backtest melt; the engine
  * exposes it as a first-class panel op).
  *
  * Offsets are ROW offsets within the sid's ordered series (trading
  * days), not calendar days — identical to the reference's positional
  * `shift` semantics over its dense wide frame (base.py:434), so
  * weekends/halts don't stretch the window.
  *
  * Scale shape: NO range join. The panel gets a per-sid row number (one
  * window pass over the existing bySid ordering); the event side —
  * always ≪ panel — explodes the BOUNDED offset range (pre+post+1 rows
  * per event) and equi-joins on (sid, rowNumber). Cost is
  * |events|×window extra rows on the small side and one equi-join
  * shuffle (broadcast when the event side fits); the panel is scanned
  * once. A `panel.rn BETWEEN ev.rn−pre AND ev.rn+post` range join would
  * instead explode the join planner at 100 TB.
  */
object EventStudy {

  /** Align `valueCols` of `panel` around `events`.
    *
    * @param events frame keyed like the panel (sid + order cols), one
    *               row per event — e.g. the output of a signal filter.
    *               Extra columns are carried through (event metadata).
    * @param pre    trading days BEFORE the event to include (≥ 0)
    * @param post   trading days after the event to include (≥ 0)
    * @return one row per (event, offset) with the aligned values:
    *         event keys, `offset` in [−pre, +post], the event's order
    *         cols as `event_<col>`, and `valueCols` at the offset row.
    *         Offsets that fall off the series edge drop out (inner
    *         join), matching pandas shift-then-stack NaN drops.
    */
  def align(
      panel: DataFrame,
      events: DataFrame,
      pre: Int,
      post: Int,
      valueCols: Seq[String])(implicit k: Keys): DataFrame = {
    require(pre >= 0 && post >= 0, "pre and post must be >= 0")
    val rn = row_number().over(k.bySid)
    val keyed = panel.select(
      (col(k.sid) +: k.order.map(col)) ++ valueCols.map(col): _*)
      .withColumn("__rn", rn)
    // events inherit their row number from the panel rows they key
    val evKeys = k.sid +: k.order
    val ev = events
      .join(keyed.select((evKeys :+ "__rn").map(col): _*), evKeys)
      .withColumnsRenamed(k.order.map(c => c -> s"event_$c").toMap)
      .withColumn("offset", explode(lit((-pre to post).toArray)))
      .withColumn("__rn", col("__rn") + col("offset"))
    ev.join(keyed.drop(k.order: _*), Seq(k.sid, "__rn"))
      .drop("__rn")
  }
}
