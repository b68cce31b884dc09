package graft

/** Second half of [[Oracles]] (split r8 for file size; same
  * byte-identical oracle SQL, proven by the oracle_sql.json diff
  * at split time). */
private[graft] object OraclesB {
  import OracleCtes._

  val all: Map[String, String] = Map(
    // ML18: pinball loss at τ = 10/50/90 — per-row losses micro-
    // quantized, integer-quotient means. The (τ−1) factors are the
    // SCALA-evaluated doubles inlined (SQL-side decimal `0.9 - 1`
    // differs from IEEE `0.9 - 1` by an ulp)
    "ml18_pinball" -> {
      def b(t: Double, a: String) =
        s"""    CAST(round(greatest((y - s) * $t, (y - s) * ${t - 1}) * 1e6)
           |      AS HUGEINT) AS $a""".stripMargin
      s"""WITH $panelCte,
         |pr AS (
         |  SELECT least(1.0::DOUBLE, round(close / 60000.0, 1)) AS s,
         |         close / 60000.0 AS y
         |  FROM panel),
         |q AS (
         |  SELECT
         |${b(0.1, "l10")},
         |${b(0.5, "l50")},
         |${b(0.9, "l90")}
         |  FROM pr)
         |SELECT count(*)::BIGINT AS n,
         |  round(sum(l10)::DOUBLE / count(*)) / 1e6 AS pinball_10,
         |  round(sum(l50)::DOUBLE / count(*)) / 1e6 AS pinball_50,
         |  round(sum(l90)::DOUBLE / count(*)) / 1e6 AS pinball_90
         |FROM q""".stripMargin
    },

    // D31: square-root impact — exact-int participation under one
    // sqrt, 6dp-rounded σ input, null on unknown ADV/σ
    "d31_sqrt_impact" ->
      s"""WITH $panelCte,
         |stubs AS (
         |  SELECT CAST(s_suppkey AS VARCHAR) AS sid,
         |         CAST(round(s_acctbal) AS BIGINT) AS "totalQuantity"
         |  FROM supplier WHERE s_acctbal > 0),
         |adv AS (
         |  SELECT CAST(l_suppkey AS VARCHAR) AS sid,
         |         sum(CAST(l_quantity AS BIGINT))::DOUBLE / count(*) AS adv
         |  FROM lineitem GROUP BY 1),
         |rr AS (
         |  SELECT sid, close / lag(close) OVER (PARTITION BY sid
         |    ORDER BY date) - 1 AS r
         |  FROM panel),
         |sg AS (
         |  SELECT CAST(sid AS VARCHAR) AS sid,
         |         round(stddev_samp(r), 6) AS sigma
         |  FROM rr GROUP BY 1)
         |SELECT s.sid, s."totalQuantity", round(a.adv, 6) AS adv, g.sigma,
         |  round(CASE WHEN a.adv > 0 AND g.sigma > 0
         |              AND s."totalQuantity" > 0
         |        THEN sqrt(s."totalQuantity"::DOUBLE / a.adv)
         |           * g.sigma * 1.0 * 1e4 END, 6) AS impact_bps
         |FROM stubs s LEFT JOIN adv a ON s.sid = a.sid
         |             LEFT JOIN sg g ON s.sid = g.sid""".stripMargin,

    // ML17: best-F1 operating point over the ml11 chain — the F1
    // ordering key is the same IEEE double from exact ints in both
    // engines; ties resolve to the lowest threshold
    // Kelly — pico moments, f* = mu/var, same op order as the engine
    "perf_kelly" ->
      s"""WITH $perfRetCte,
         |q AS (SELECT CAST(round(r * 1e12) AS HUGEINT) AS p FROM ret),
         |ag AS (SELECT count(*) AS n, sum(p) AS s, sum(p * p) AS ss
         |       FROM q),
         |fin AS (
         |  SELECT n, s::DOUBLE / n / 1e12 AS mu,
         |    (n * ss - s * s)::DOUBLE / (n::DOUBLE * (n - 1)) / 1e24 AS vr
         |  FROM ag)
         |SELECT CAST(n AS BIGINT) AS n_days,
         |  round(CASE WHEN n >= 2 AND vr > 0 THEN mu / vr END, 6) + 0.0
         |    AS kelly,
         |  round(CASE WHEN n >= 2 AND vr > 0 THEN mu / vr / 2.0 END, 6)
         |    + 0.0 AS half_kelly
         |FROM fin""".stripMargin,

    // ML26: utility argmax over the threshold sweep; tn = maxFp − fp
    "ml26_cost_threshold" ->
      s"""WITH $panelCte,
         |pr AS (
         |  SELECT least(1.0::DOUBLE, round(close / 60000.0, 1)) AS s,
         |         CASE WHEN close >= 22000 THEN 1 ELSE 0 END AS y
         |  FROM panel),
         |sc AS (
         |  SELECT s, CAST(sum(y) AS BIGINT) AS p, count(*)::BIGINT AS c
         |  FROM pr GROUP BY 1),
         |cm AS (
         |  SELECT *,
         |    CAST(sum(p) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED PRECEDING
         |                      AND CURRENT ROW) AS BIGINT) AS tp,
         |    CAST(sum(c - p) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED
         |                          PRECEDING AND CURRENT ROW) AS BIGINT) AS fp,
         |    CAST(sum(p) OVER () AS BIGINT) AS tot,
         |    CAST(sum(c - p) OVER () AS BIGINT) AS totn
         |  FROM sc),
         |u AS (
         |  SELECT s AS threshold, tp, fp,
         |    CAST(tot - tp AS BIGINT) AS fn,
         |    CAST(totn - fp AS BIGINT) AS tn,
         |    tp * 1.0 + fp * (-1.0) + (tot - tp) * (-10.0)
         |      + (totn - fp) * 0.0 AS ut
         |  FROM cm)
         |SELECT threshold, tp, fp, fn, tn,
         |  CAST(round(ut, 6) AS DOUBLE) AS utility
         |FROM u ORDER BY ut DESC, threshold LIMIT 1""".stripMargin,

    "ml17_best_threshold" ->
      s"""WITH $panelCte,
         |pr AS (
         |  SELECT least(1.0::DOUBLE, round(close / 60000.0, 1)) AS s,
         |         CASE WHEN close >= 22000 THEN 1 ELSE 0 END AS y
         |  FROM panel),
         |sc AS (
         |  SELECT s, CAST(sum(y) AS BIGINT) AS p, count(*)::BIGINT AS c
         |  FROM pr GROUP BY 1),
         |cm AS (
         |  SELECT *,
         |    CAST(sum(p) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED PRECEDING
         |                      AND CURRENT ROW) AS BIGINT) AS tp,
         |    CAST(sum(c - p) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED
         |                          PRECEDING AND CURRENT ROW) AS BIGINT) AS fp,
         |    CAST(sum(p) OVER () AS BIGINT) AS tot
         |  FROM sc),
         |f AS (
         |  SELECT s AS threshold, tp, fp, CAST(tot - tp AS BIGINT) AS fn,
         |    round(tp::DOUBLE / (tp + fp), 6) AS precision,
         |    round(CASE WHEN tot > 0 THEN tp::DOUBLE / tot END, 6) AS recall,
         |    CASE WHEN 2*tp + fp + (tot - tp) > 0
         |         THEN 2.0 * tp / CAST(2*tp + fp + (tot - tp) AS DOUBLE)
         |    END AS f1r
         |  FROM cm)
         |SELECT threshold, tp, fp, fn, precision, recall,
         |  round(f1r, 6) AS f1
         |FROM f ORDER BY f1r DESC NULLS LAST, threshold LIMIT 1""".stripMargin,

    // D28: TWAP slices — integer split with remainder-first, zero
    // slices dropped, parent ids positional "row.0"
    "d28_twap_slices" ->
      """WITH stubs AS (
        |  SELECT CAST(s_suppkey AS VARCHAR) AS sid, 'U1' AS account,
        |         CASE WHEN s_suppkey % 2 = 0 THEN 'BUY' ELSE 'SELL' END AS action,
        |         'demo' AS "orderRef", CAST(round(s_acctbal) AS BIGINT) AS tq
        |  FROM supplier WHERE s_acctbal > 0),
        |parents AS (
        |  SELECT *, CAST(row_number() OVER (ORDER BY sid, account) - 1 AS VARCHAR)
        |            || '.0' AS pid
        |  FROM stubs),
        |sl AS (
        |  SELECT p.*, t.i,
        |    CASE t.i WHEN 0 THEN '09:30:00' WHEN 1 THEN '12:00:00'
        |             ELSE '15:30:00' END AS slice_time,
        |    tq // 3 + (CASE WHEN t.i < tq % 3 THEN 1 ELSE 0 END) AS quantity
        |  FROM parents p CROSS JOIN range(0, 3) t(i))
        |SELECT sid, account, action, "orderRef", pid AS "parentId",
        |       CAST(i AS INT) AS slice_idx, slice_time, quantity
        |FROM sl WHERE quantity > 0""".stripMargin,

    // D40: reconciliation — planted breaks through the full outer join
    "d40_reconcile" ->
      """WITH expected AS (
        |  SELECT CAST(s_suppkey AS VARCHAR) AS sid, 'U1' AS account,
        |         CAST(round(s_acctbal) AS BIGINT) AS eq
        |  FROM supplier WHERE s_suppkey % 2 = 0 AND s_acctbal > 0),
        |reported AS (
        |  SELECT CAST(s_suppkey AS VARCHAR) AS sid, 'U1' AS account,
        |         CAST(round(s_acctbal) AS BIGINT)
        |           + CASE WHEN s_suppkey % 5 = 0 THEN 10 ELSE 0 END AS rq
        |  FROM supplier
        |  WHERE s_acctbal > 0
        |    AND (s_suppkey % 2 = 1 OR s_suppkey % 7 <> 0)
        |    AND (s_suppkey % 2 = 0 OR s_suppkey % 3 = 0))
        |SELECT coalesce(e.sid, r.sid) AS sid,
        |  coalesce(e.account, r.account) AS account,
        |  e.eq AS expected_qty, r.rq AS reported_qty,
        |  coalesce(r.rq, 0) - coalesce(e.eq, 0) AS diff,
        |  CASE WHEN e.eq IS NOT NULL AND r.rq IS NOT NULL
        |            AND coalesce(r.rq, 0) - coalesce(e.eq, 0) = 0
        |       THEN 'MATCHED'
        |       WHEN e.eq IS NOT NULL AND r.rq IS NOT NULL THEN 'QTY_DIFF'
        |       WHEN r.rq IS NULL THEN 'MISSING_AT_BROKER'
        |       ELSE 'UNEXPECTED_AT_BROKER' END AS status
        |FROM expected e
        |FULL OUTER JOIN reported r
        |  ON e.sid = r.sid AND e.account = r.account""".stripMargin,

    // D35: crossing — per-sid BUY/SELL totals, running-sum clamp in
    // (account, orderRef) order on each side
    "d35_cross_orders" ->
      """WITH stubs AS (
        |  SELECT CAST(s_suppkey AS VARCHAR) AS sid,
        |         CASE WHEN s_suppkey % 3 = 0 THEN 'U2' ELSE 'U1' END AS account,
        |         CASE WHEN s_suppkey % 2 = 0 THEN 'BUY' ELSE 'SELL' END AS action,
        |         'demo' AS "orderRef",
        |         CAST(round(s_acctbal) AS BIGINT) AS tq
        |  FROM supplier WHERE s_acctbal > 0),
        |allst AS (
        |  SELECT * FROM stubs
        |  UNION ALL
        |  SELECT sid, 'U3', 'SELL', 'demo', 100 FROM stubs
        |  WHERE action = 'BUY'),
        |tot AS (
        |  SELECT *,
        |    least(
        |      coalesce(sum(CASE WHEN action = 'BUY' THEN tq END)
        |        OVER (PARTITION BY sid), 0),
        |      coalesce(sum(CASE WHEN action = 'SELL' THEN tq END)
        |        OVER (PARTITION BY sid), 0)) AS crossq,
        |    coalesce(sum(tq) OVER (PARTITION BY sid, action
        |      ORDER BY account, "orderRef"
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        |  FROM allst)
        |SELECT sid, account, action, "orderRef",
        |  tq AS "totalQuantity",
        |  CAST(greatest(0, least(tq, crossq - cb)) AS BIGINT) AS crossed_qty,
        |  CAST(tq - greatest(0, least(tq, crossq - cb)) AS BIGINT) AS external_qty
        |FROM tot""".stripMargin,

    // D32: Almgren-Chriss — the sinh schedule fractions are computed
    // HERE with the same JVM arithmetic the engine uses (Math.sinh,
    // 12-dp rint) and inlined as literals, so both engines quantize
    // shares from bit-identical constants
    "d32_almgren" -> {
      val n = 3; val kT = 2.0
      val f = (0 to n).map(j => math.rint(math.sinh(kT * (n - j).toDouble / n) /
        math.sinh(kT) * 1e12) / 1e12)
      s"""WITH stubs AS (
        |  SELECT CAST(s_suppkey AS VARCHAR) AS sid, 'U1' AS account,
        |         CASE WHEN s_suppkey % 2 = 0 THEN 'BUY' ELSE 'SELL' END AS action,
        |         'demo' AS "orderRef", CAST(round(s_acctbal) AS BIGINT) AS tq
        |  FROM supplier WHERE s_acctbal > 0),
        |parents AS (
        |  SELECT *, CAST(row_number() OVER (ORDER BY sid, account) - 1 AS VARCHAR)
        |            || '.0' AS pid
        |  FROM stubs),
        |sl AS (
        |  SELECT p.*, t.i,
        |    CASE t.i WHEN 0 THEN '09:30:00' WHEN 1 THEN '12:00:00'
        |             ELSE '15:30:00' END AS slice_time,
        |    CAST(round(tq * (CASE t.i WHEN 0 THEN ${f(0)} WHEN 1 THEN ${f(1)}
        |                     ELSE ${f(2)} END)) AS BIGINT)
        |    - CAST(round(tq * (CASE t.i WHEN 0 THEN ${f(1)} WHEN 1 THEN ${f(2)}
        |                       ELSE ${f(3)} END)) AS BIGINT) AS quantity
        |  FROM parents p CROSS JOIN range(0, 3) t(i))
        |SELECT sid, account, action, "orderRef", pid AS "parentId",
        |       CAST(i AS INT) AS slice_idx, slice_time, quantity
        |FROM sl WHERE quantity > 0""".stripMargin
    },

    // J9: interval overlap replayed as the plain predicate join
    "j9_overlap_join" ->
      """WITH e AS (
        |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |         CAST(ts AS TIMESTAMP) AS ts, event_type
        |  FROM events),
        |a AS (SELECT user_id, day, min(ts) AS start_ts FROM e GROUP BY 1, 2),
        |b AS (SELECT user_id, day, min(ts) AS r_start_ts FROM e
        |      WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT a.user_id, a.day, a.start_ts, b.r_start_ts
        |FROM a JOIN b ON a.user_id = b.user_id AND a.day = b.day
        |WHERE a.start_ts <= b.r_start_ts + INTERVAL 3 HOUR
        |  AND b.r_start_ts <= a.start_ts + INTERVAL 2 HOUR""".stripMargin,

    // ML12: scaler — exact HUGEINT micro moments → one stats row,
    // per-row (x − mean)/std
    "ml12_scaler" ->
      s"""WITH $panelCte,
         |rr AS (
         |  SELECT sid, date, close,
         |    close / lag(close) OVER (PARTITION BY sid ORDER BY date) - 1 AS ret
         |  FROM panel),
         |ag AS (
         |  SELECT
         |    count(close) AS nc, sum(CAST(round(close * 1e6) AS HUGEINT)) AS sc,
         |    sum(CAST(round(close * 1e6) AS HUGEINT)
         |      * CAST(round(close * 1e6) AS HUGEINT)) AS ssc,
         |    count(ret) AS nr, sum(CAST(round(ret * 1e6) AS HUGEINT)) AS sr,
         |    sum(CAST(round(ret * 1e6) AS HUGEINT)
         |      * CAST(round(ret * 1e6) AS HUGEINT)) AS ssr
         |  FROM rr),
         |st AS (
         |  SELECT
         |    round(CASE WHEN nc > 0 THEN CAST(sc AS DOUBLE) / CAST(nc AS DOUBLE)
         |      / 1e6 END, 6) + 0.0 AS mc,
         |    round(CASE WHEN nc >= 2 THEN sqrt((CAST(ssc AS DOUBLE) * CAST(nc AS DOUBLE)
         |      - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE))
         |      / (CAST(nc AS DOUBLE) * (CAST(nc AS DOUBLE) - 1))) / 1e6 END, 6) AS dc,
         |    round(CASE WHEN nr > 0 THEN CAST(sr AS DOUBLE) / CAST(nr AS DOUBLE)
         |      / 1e6 END, 6) + 0.0 AS mr,
         |    round(CASE WHEN nr >= 2 THEN sqrt((CAST(ssr AS DOUBLE) * CAST(nr AS DOUBLE)
         |      - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE))
         |      / (CAST(nr AS DOUBLE) * (CAST(nr AS DOUBLE) - 1))) / 1e6 END, 6) AS dr
         |  FROM ag)
         |SELECT sid, date,
         |  round(CASE WHEN dc > 0 THEN (close - mc) / dc END, 6) + 0.0 AS close_z,
         |  round(CASE WHEN dr > 0 THEN (ret - mr) / dr END, 6) + 0.0 AS ret_z
         |FROM rr, st""".stripMargin,

    // EV7: first/last-touch attribution — one cumulative frame per user
    "ev7_attribution" -> {
      def t(c: String) = s"CASE WHEN event_type IN ('view','click') THEN $c END"
      s"""WITH e AS (
         |  SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
         |  FROM events),
         |m AS (
         |  SELECT *,
         |    first_value(${t("event_id")} IGNORE NULLS) OVER w AS fid,
         |    first_value(${t("event_type")} IGNORE NULLS) OVER w AS fty,
         |    last_value(${t("event_id")} IGNORE NULLS) OVER w AS lid,
         |    last_value(${t("event_type")} IGNORE NULLS) OVER w AS lty,
         |    last_value(${t("ts")} IGNORE NULLS) OVER w AS lts
         |  FROM e
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |SELECT user_id, event_id AS conversion_id,
         |  fid AS first_touch_id, fty AS first_touch_type,
         |  lid AS last_touch_id, lty AS last_touch_type,
         |  (epoch_us(ts) - epoch_us(lts)) / 1e6 AS sec_since_touch
         |FROM m WHERE event_type = 'purchase'""".stripMargin
    },

    // PX6: market-residualized returns — exact pico market mean, rounded
    // trailing beta, r − β·m
    "px6_residual" ->
      s"""WITH $panelCte,
         |rr AS (
         |  SELECT sid, date,
         |    close / lag(close) OVER (PARTITION BY sid ORDER BY date) - 1 AS ret
         |  FROM panel),
         |mm AS (
         |  SELECT *,
         |    CASE WHEN count(ret) OVER (PARTITION BY date) > 0
         |         THEN CAST(sum(CAST(round(ret * 1e12) AS HUGEINT))
         |                OVER (PARTITION BY date) AS DOUBLE)
         |              / count(ret) OVER (PARTITION BY date) / 1e12 END AS m
         |  FROM rr),
         |bb AS (
         |  SELECT *,
         |    round(CASE WHEN count(ret) OVER f = 21 AND var_samp(m) OVER f <> 0
         |               THEN covar_samp(ret, m) OVER f / var_samp(m) OVER f
         |          END, 6) + 0.0 AS beta_21
         |  FROM mm
         |  WINDOW f AS (PARTITION BY sid ORDER BY date
         |               ROWS BETWEEN 20 PRECEDING AND CURRENT ROW))
         |SELECT sid, date, round(m, 6) + 0.0 AS mkt_ret, beta_21,
         |  round(ret - beta_21 * m, 6) + 0.0 AS resid
         |FROM bb""".stripMargin,

    // W11: per-sid lag-1 return autocorrelation — exact HUGEINT micro
    // moments, one double division per sid
    "w11_autocorr" ->
      s"""WITH $panelCte,
         |rr AS (
         |  SELECT sid, date,
         |    close / lag(close) OVER (PARTITION BY sid ORDER BY date) - 1 AS ret
         |  FROM panel),
         |pr AS (
         |  SELECT sid, ret AS yv,
         |    lag(ret) OVER (PARTITION BY sid ORDER BY date) AS xv
         |  FROM rr),
         |b AS (SELECT * FROM pr WHERE yv IS NOT NULL AND xv IS NOT NULL),
         |m AS (
         |  SELECT sid, CAST(round(yv * 1e6) AS HUGEINT) AS y,
         |         CAST(round(xv * 1e6) AS HUGEINT) AS x
         |  FROM b),
         |st AS (
         |  SELECT sid, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         |         sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy
         |  FROM m GROUP BY sid)
         |SELECT sid, CAST(n AS BIGINT) AS n,
         |  round(CASE WHEN n >= 2 AND n*sxx - sx*sx <> 0 AND n*syy - sy*sy <> 0
         |    THEN CAST(n*sxy - sx*sy AS DOUBLE) /
         |      sqrt(CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE))
         |    END, 6) + 0.0 AS acf
         |FROM st""".stripMargin,

    // J8: range join replayed as a plain BETWEEN join (the oracle can
    // afford the theta-join; the engine buckets it into an equi-join)
    "j8_interval_join" ->
      """WITH e AS (
        |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |         CAST(ts AS TIMESTAMP) AS ts, event_id
        |  FROM events),
        |iv AS (SELECT user_id, day, min(ts) AS s FROM e GROUP BY 1, 2)
        |SELECT e.user_id, e.day, e.event_id
        |FROM e JOIN iv ON e.user_id = iv.user_id AND e.day = iv.day
        |WHERE e.ts >= iv.s AND e.ts <= iv.s + INTERVAL 1 HOUR""".stripMargin,

    // D27: inverse-vol weights — rounded trailing vol, micro-quantized
    // 1/vol, exact integer per-date normalizer
    "d27_inverse_vol" ->
      s"""WITH $panelCte,
         |rr AS (
         |  SELECT sid, date, close,
         |    close / lag(close) OVER (PARTITION BY sid ORDER BY date) - 1 AS ret
         |  FROM panel),
         |vv AS (
         |  SELECT *, CASE WHEN count(ret) OVER f = 21
         |                 THEN round(stddev_samp(ret) OVER f, 6) END AS vol
         |  FROM rr
         |  WINDOW f AS (PARTITION BY sid ORDER BY date
         |               ROWS BETWEEN 20 PRECEDING AND CURRENT ROW)),
         |sg AS (
         |  SELECT *, CASE WHEN close < 30000 THEN 1.0 ELSE -1.0 END AS signal
         |  FROM vv),
         |qq AS (
         |  SELECT *, CASE WHEN signal <> 0 AND vol > 0
         |                 THEN CAST(round(abs(signal) / vol * 1e6) AS BIGINT)
         |                 ELSE 0 END AS ivq
         |  FROM sg),
         |tt AS (
         |  SELECT *, CAST(sum(ivq) OVER (PARTITION BY date) AS BIGINT) AS tot
         |  FROM qq)
         |SELECT sid, date,
         |  (CASE WHEN tot <> 0 THEN CAST(sign(signal) AS DOUBLE) * ivq::DOUBLE / tot
         |        ELSE 0.0 END) + 0.0 AS weight
         |FROM tt""".stripMargin,

    // W12: monthly OHLCV — min_by/max_by firsts/lasts, exact long volume
    "w12_ohlcv" ->
      """WITH panelv AS (
        |  SELECT l_suppkey AS sid, CAST(l_shipdate AS DATE) AS date,
        |         max(l_extendedprice) AS close,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS volume
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT sid, CAST(date_trunc('month', date) AS DATE) AS bucket,
        |  min_by(close, date) AS open, max(close) AS high, min(close) AS low,
        |  max_by(close, date) AS close,
        |  CAST(sum(CAST(volume AS BIGINT)) AS BIGINT) AS volume,
        |  count(*) AS n_bars
        |FROM panelv GROUP BY 1, 2""".stripMargin,

    // W14: ATR — per-bar true range, exact micro rolling mean
    "w14_atr" ->
      """WITH bars AS (
        |  SELECT l_suppkey AS sid, CAST(l_shipdate AS DATE) AS date,
        |         max(l_extendedprice) AS h, min(l_extendedprice) AS l,
        |         max(l_extendedprice) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |pc AS (
        |  SELECT *, lag(c) OVER (PARTITION BY sid ORDER BY date) AS prevc
        |  FROM bars),
        |tr AS (
        |  SELECT sid, date,
        |    CASE WHEN prevc IS NULL THEN h - l
        |         ELSE greatest(h - l, abs(h - prevc), abs(l - prevc)) END AS tr
        |  FROM pc),
        |m AS (SELECT *, CAST(round(tr * 1e6) AS HUGEINT) AS trm FROM tr)
        |SELECT sid, date, tr,
        |  round(CASE WHEN count(trm) OVER f = 14
        |             THEN CAST(sum(trm) OVER f AS DOUBLE) / 14 / 1e6 END, 6)
        |    AS atr_14
        |FROM m
        |WINDOW f AS (PARTITION BY sid ORDER BY date
        |             ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)""".stripMargin,

    // W15: Cutler RSI — 100·ΣG/(ΣG+ΣL) over exact micro change sums
    // W23: Kaufman ER — micro bar changes, exact windowed path/net sums
    "w23_efficiency" ->
      s"""WITH $panelCte,
         |d AS (
         |  SELECT sid, date,
         |    CAST(round(close * 1e6) AS HUGEINT) -
         |    CAST(round(lag(close) OVER (PARTITION BY sid ORDER BY date)
         |      * 1e6) AS HUGEINT) AS dd
         |  FROM panel),
         |r AS (
         |  SELECT sid, date,
         |    count(dd) OVER w AS c,
         |    sum(abs(dd)) OVER w AS path,
         |    abs(sum(dd) OVER w) AS net
         |  FROM d
         |  WINDOW w AS (PARTITION BY sid ORDER BY date
         |               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
         |SELECT sid, date,
         |  round(CASE WHEN c = 10 AND path <> 0
         |        THEN net::DOUBLE / path::DOUBLE END, 6) AS ker_10
         |FROM r""".stripMargin,

    "w15_rsi" ->
      s"""WITH $panelCte,
         |d AS (
         |  SELECT sid, date,
         |    CAST(round(close * 1e6) AS HUGEINT)
         |      - lag(CAST(round(close * 1e6) AS HUGEINT))
         |        OVER (PARTITION BY sid ORDER BY date) AS df
         |  FROM panel),
         |gl AS (
         |  SELECT sid, date,
         |    CASE WHEN df IS NULL THEN NULL
         |         WHEN df > 0 THEN df ELSE 0 END AS g,
         |    CASE WHEN df IS NULL THEN NULL
         |         WHEN df < 0 THEN -df ELSE 0 END AS l
         |  FROM d)
         |SELECT sid, date,
         |  round(CASE WHEN count(g) OVER f = 14
         |               AND sum(g) OVER f + sum(l) OVER f <> 0
         |             THEN CAST(sum(g) OVER f AS DOUBLE) * 100.0
         |               / CAST(sum(g) OVER f + sum(l) OVER f AS DOUBLE) END, 6)
         |    AS rsi_14
         |FROM gl
         |WINDOW f AS (PARTITION BY sid ORDER BY date
         |             ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)""".stripMargin,

    // W16: stochastic %K — order-free rolling extremes
    "w16_stochastic" ->
      """WITH bars AS (
        |  SELECT l_suppkey AS sid, CAST(l_shipdate AS DATE) AS date,
        |         max(l_extendedprice) AS h, min(l_extendedprice) AS l,
        |         max(l_extendedprice) AS c
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT sid, date,
        |  round(CASE WHEN count(c) OVER f = 14
        |               AND max(h) OVER f <> min(l) OVER f
        |             THEN (c - min(l) OVER f) * 100.0
        |               / (max(h) OVER f - min(l) OVER f) END, 6) + 0.0
        |    AS stoch_k_14
        |FROM bars
        |WINDOW f AS (PARTITION BY sid ORDER BY date
        |             ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)""".stripMargin,

    // W17: on-balance volume — signed exact long cumsum
    "w17_obv" ->
      """WITH bars AS (
        |  SELECT l_suppkey AS sid, CAST(l_shipdate AS DATE) AS date,
        |         max(l_extendedprice) AS close,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS vol
        |  FROM lineitem GROUP BY 1, 2),
        |d AS (
        |  SELECT *, CAST(round(close * 1e6) AS HUGEINT)
        |    - lag(CAST(round(close * 1e6) AS HUGEINT))
        |      OVER (PARTITION BY sid ORDER BY date) AS df
        |  FROM bars)
        |SELECT sid, date,
        |  CAST(sum(CASE WHEN df IS NULL OR df = 0 THEN 0
        |                WHEN df > 0 THEN vol ELSE -vol END)
        |    OVER (PARTITION BY sid ORDER BY date ROWS UNBOUNDED PRECEDING)
        |    AS BIGINT) AS obv
        |FROM d""".stripMargin,

    // W13: Parkinson / Garman-Klass range volatility over the monthly
    // OHLC bars (constants inlined as the JVM's exact doubles)
    "w13_range_vol" -> {
      val c4ln2 = 4.0 * math.log(2.0)
      val c2ln2m1 = 2.0 * math.log(2.0) - 1.0
      """WITH panelv AS (
        |  SELECT l_suppkey AS sid, CAST(l_shipdate AS DATE) AS date,
        |         max(l_extendedprice) AS close,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS volume
        |  FROM lineitem GROUP BY 1, 2),
        |bars AS (
        |  SELECT sid, CAST(date_trunc('month', date) AS DATE) AS bucket,
        |    min_by(close, date) AS o, max(close) AS h, min(close) AS l,
        |    max_by(close, date) AS c
        |  FROM panelv GROUP BY 1, 2)
        |SELECT sid, bucket,
        |  round(CASE WHEN h > 0 AND l > 0 AND h >= l
        |""".stripMargin +
        s"""        THEN sqrt(ln(h / l) * ln(h / l) / $c4ln2) END, 6) AS parkinson,
           |  round(CASE WHEN h > 0 AND l > 0 AND h >= l AND o > 0 AND c > 0
           |        THEN sqrt(greatest(0.0, ln(h / l) * ln(h / l) * 0.5
           |          - $c2ln2m1 * ln(c / o) * ln(c / o))) END, 6) AS garman_klass
           |FROM bars""".stripMargin
    },

    // back-adjustment: pico-nat-quantized ln factors, reverse running
    // sum (same-date actions sort after the bar), exp at the bar
    "adj1_back_adjust" ->
      s"""WITH $panelCte,
         |acts AS (
         |  SELECT s_suppkey AS sid, DATE '1995-06-15' AS date,
         |         CAST(round(ln(0.5) * 1e12) AS BIGINT) AS lq
         |  FROM supplier WHERE s_suppkey % 7 = 0
         |  UNION ALL
         |  SELECT s_suppkey, DATE '1997-01-10', CAST(round(ln(2.0) * 1e12) AS BIGINT)
         |  FROM supplier WHERE s_suppkey % 3 = 0),
         |u AS (
         |  SELECT sid, date, close, 0 AS tag, CAST(NULL AS BIGINT) AS lq FROM panel
         |  UNION ALL
         |  SELECT sid, date, NULL, 1, lq FROM acts),
         |sc AS (
         |  SELECT *, sum(lq) OVER (PARTITION BY sid ORDER BY date DESC, tag ASC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ls
         |  FROM u)
         |SELECT sid, date, close,
         |  round(exp(coalesce(ls, 0) / 1e12), 9) AS adj_factor,
         |  round(close * round(exp(coalesce(ls, 0) / 1e12), 9), 6) AS adj_close
         |FROM sc WHERE tag = 0""".stripMargin,

    // D26: volume-share (price-impact) slippage — the Zipline model;
    // zero/null-volume bars with turnover are charged at the limit
    "d26_volume_slippage" ->
      """WITH panelv AS (
        |  SELECT l_suppkey AS sid, CAST(l_shipdate AS DATE) AS date,
        |         max(l_extendedprice) AS close,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS volume
        |  FROM lineitem GROUP BY 1, 2),
        |sig AS (
        |  SELECT sid, date, close, volume,
        |         CAST(close < 30000 AS INT) AS signal FROM panelv),
        |wts AS (
        |  SELECT *, CAST(signal AS DOUBLE) /
        |    (CASE WHEN sum(abs(signal)) OVER (PARTITION BY date) <> 0
        |          THEN sum(abs(signal)) OVER (PARTITION BY date) ELSE 1 END) AS weight
        |  FROM sig),
        |pos AS (
        |  SELECT *, lag(weight) OVER (PARTITION BY sid ORDER BY date) AS position
        |  FROM wts),
        |trn AS (
        |  SELECT *, abs(coalesce(position, 0) -
        |    lag(coalesce(position, 0)) OVER (PARTITION BY sid ORDER BY date)) AS turnover
        |  FROM pos),
        |sh AS (
        |  SELECT *, CASE WHEN turnover = 0 OR turnover IS NULL THEN 0.0
        |                 WHEN volume IS NULL OR volume <= 0 THEN 0.025
        |                 ELSE least(turnover * 1000000.0 / close / volume, 0.025)
        |            END AS vshare
        |  FROM trn)
        |SELECT sid, date, turnover * 0.1 * vshare * vshare AS slippage
        |FROM sh""".stripMargin,

    // up/down capture: conditional pico sums over the benchmark joint
    // series; capture = Σr/Σb per side (the means' ratio)
    "perf_capture" ->
      s"""WITH $perfRetCte,
         |dates AS (SELECT DISTINCT date FROM panel),
         |bcl AS (SELECT date, close FROM panel WHERE sid = 1),
         |bf AS (
         |  SELECT d.date,
         |    last_value(bcl.close IGNORE NULLS) OVER (ORDER BY d.date
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
         |  FROM dates d LEFT JOIN bcl ON d.date = bcl.date),
         |br AS (
         |  SELECT date, coalesce(c / lag(c) OVER (ORDER BY date) - 1, 0.0) AS b
         |  FROM bf),
         |j AS (SELECT ret.date, r, b FROM ret JOIN br ON ret.date = br.date),
         |ag AS (
         |  SELECT
         |    CAST(sum(CASE WHEN b > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
         |    sum(CASE WHEN b > 0 THEN CAST(round(r * 1e12) AS HUGEINT) END) AS ru,
         |    sum(CASE WHEN b > 0 THEN CAST(round(b * 1e12) AS HUGEINT) END) AS bu,
         |    CAST(sum(CASE WHEN b < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_down,
         |    sum(CASE WHEN b < 0 THEN CAST(round(r * 1e12) AS HUGEINT) END) AS rd,
         |    sum(CASE WHEN b < 0 THEN CAST(round(b * 1e12) AS HUGEINT) END) AS bd
         |  FROM j)
         |SELECT n_up, n_down,
         |  round(CASE WHEN n_up > 0 AND bu <> 0
         |             THEN CAST(ru AS DOUBLE) / CAST(bu AS DOUBLE) END, 6) + 0.0
         |    AS up_capture,
         |  round(CASE WHEN n_down > 0 AND bd <> 0
         |             THEN CAST(rd AS DOUBLE) / CAST(bd AS DOUBLE) END, 6) + 0.0
         |    AS down_capture
         |FROM ag""".stripMargin,

    // D29: 5% ADV participation cap — floor clamp, missing ADV drops
    "d29_adv_cap" ->
      """WITH stubs AS (
        |  SELECT CAST(s_suppkey AS VARCHAR) AS sid, 'U1' AS account,
        |         CASE WHEN s_suppkey % 2 = 0 THEN 'BUY' ELSE 'SELL' END AS action,
        |         'demo' AS "orderRef", CAST(round(s_acctbal) AS BIGINT) AS tq
        |  FROM supplier WHERE s_acctbal > 0),
        |adv AS (
        |  SELECT CAST(l_suppkey AS VARCHAR) AS sid,
        |         CAST(CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS DOUBLE)
        |           / count(*) AS adv
        |  FROM lineitem GROUP BY 1)
        |SELECT s.sid, s.account, s.action, s."orderRef",
        |  CASE WHEN a.adv IS NULL THEN 0
        |       ELSE least(s.tq, CAST(floor(a.adv * 0.05) AS BIGINT))
        |  END AS "totalQuantity",
        |  (a.adv IS NULL OR s.tq > CAST(floor(a.adv * 0.05) AS BIGINT))
        |    AS was_capped
        |FROM stubs s LEFT JOIN adv a ON s.sid = a.sid
        |WHERE CASE WHEN a.adv IS NULL THEN 0
        |           ELSE least(s.tq, CAST(floor(a.adv * 0.05) AS BIGINT)) END > 0"""
        .stripMargin,

    // EV8: conversion-lag percentiles — exact µs lags, quantile_cont
    "ev8_conversion_lag" ->
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |pu AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS f,
        |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t
        |  FROM e GROUP BY 1),
        |lg AS (
        |  SELECT (t - f) / 1e6 AS lag FROM pu
        |  WHERE f IS NOT NULL AND t IS NOT NULL AND t >= f)
        |SELECT count(*) AS n_users,
        |  round(quantile_cont(lag, 0.25), 6) AS p25,
        |  round(quantile_cont(lag, 0.5), 6) AS p50,
        |  round(quantile_cont(lag, 0.9), 6) AS p90
        |FROM lg""".stripMargin,

    // J10: tolerance as-of — DuckDB's NATIVE ASOF JOIN as the
    // independent formulation of the union+tag+window plan
    "j10_asof_tolerance" ->
      """WITH e AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |         event_type, value
        |  FROM events),
        |v AS (SELECT user_id, ts, event_id FROM e WHERE event_type = 'view'),
        |p0 AS (SELECT user_id, ts, max(value) AS value FROM e
        |       WHERE event_type = 'purchase' GROUP BY 1, 2),
        |j AS (
        |  SELECT v.user_id, v.event_id, p0.value,
        |    epoch_us(v.ts) - epoch_us(p0.ts) AS age
        |  FROM v ASOF LEFT JOIN p0
        |    ON v.user_id = p0.user_id AND v.ts >= p0.ts)
        |SELECT user_id, event_id,
        |  round(CASE WHEN age IS NOT NULL AND age <= 3600000000
        |             THEN value END, 6) AS value,
        |  CASE WHEN age IS NOT NULL AND age <= 3600000000
        |       THEN age END AS asof_age_us
        |FROM j""".stripMargin,

    // A/B conversion z-test: md5 arm split, exact counts, pooled z
    "ev10_ab_test" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c,
        |    CAST(CAST(concat('0x', substr(md5(concat_ws('|', 'ab', user_id)),
        |      1, 8)) AS BIGINT) AS DOUBLE) / 4294967296.0 < 0.5 AS a
        |  FROM events GROUP BY user_id),
        |st AS (
        |  SELECT CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN NOT a THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    CAST(sum(CASE WHEN a THEN c ELSE 0 END) AS BIGINT) AS conv_a,
        |    CAST(sum(CASE WHEN NOT a THEN c ELSE 0 END) AS BIGINT) AS conv_b
        |  FROM pu)
        |SELECT n_a, n_b, conv_a, conv_b,
        |  round(conv_a::DOUBLE * 1e6 / n_a) / 1e6 AS rate_a,
        |  round(conv_b::DOUBLE * 1e6 / n_b) / 1e6 AS rate_b,
        |  round(CASE WHEN n_a > 0 AND n_b > 0
        |          AND (conv_a + conv_b)::DOUBLE / (n_a::DOUBLE + n_b::DOUBLE) > 0
        |          AND (conv_a + conv_b)::DOUBLE / (n_a::DOUBLE + n_b::DOUBLE) < 1
        |        THEN (conv_a::DOUBLE / n_a::DOUBLE - conv_b::DOUBLE / n_b::DOUBLE)
        |           / sqrt(((conv_a + conv_b)::DOUBLE / (n_a::DOUBLE + n_b::DOUBLE))
        |                * (1.0 - (conv_a + conv_b)::DOUBLE
        |                       / (n_a::DOUBLE + n_b::DOUBLE))
        |                * (1.0 / n_a::DOUBLE + 1.0 / n_b::DOUBLE))
        |        END, 6) + 0.0 AS z_score
        |FROM st""".stripMargin,

    // EV30: skip-grams — 5 unrolled lead offsets over one shared
    // window, unioned then counted (exact integers only)
    "ev30_skipgrams" -> {
      val leads = (1 to 5).map(k =>
        s"lead(event_type, $k) OVER w AS t$k").mkString(",\n        |    ")
      val union = (1 to 5).map(k =>
        s"SELECT f, t$k AS t, $k AS gap FROM l WHERE t$k IS NOT NULL")
        .mkString("\n        |  UNION ALL\n        |  ")
      s"""WITH l AS (
        |  SELECT event_type AS f,
        |    $leads
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |u AS (
        |  $union)
        |SELECT f AS from_type, t AS to_type, CAST(gap AS BIGINT) AS gap,
        |  count(*)::BIGINT AS n
        |FROM u GROUP BY 1, 2, 3""".stripMargin
    },

    // EV31: RMST — ev11's KM chain as CTEs, then lag defaults (t=0,
    // S=1), per-step 1e12-quantized products, S(t_last) tail to τ=30
    "ev31_rmst" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    min(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS f,
        |    max(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS l
        |  FROM events GROUP BY 1),
        |mx AS (SELECT max(l) AS m FROM pu),
        |obs AS (
        |  SELECT CAST(date_diff('day', f, l) AS BIGINT) AS dur,
        |    CASE WHEN date_diff('day', l, (SELECT m FROM mx)) >= 1
        |         THEN 1 ELSE 0 END AS ev
        |  FROM pu),
        |bd AS (
        |  SELECT dur, count(*)::BIGINT AS c, CAST(sum(ev) AS BIGINT) AS d
        |  FROM obs GROUP BY 1),
        |nn AS (
        |  SELECT *, CAST(sum(c) OVER (ORDER BY dur DESC
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n
        |  FROM bd),
        |st AS (
        |  SELECT dur, n, d,
        |    CASE WHEN d < n
        |         THEN CAST(round(ln((n - d)::DOUBLE / n) * 1e12) AS BIGINT)
        |    END AS lnm,
        |    sum(CASE WHEN d = n THEN 1 ELSE 0 END)
        |      OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING) AS gone
        |  FROM nn WHERE d > 0),
        |km AS (
        |  SELECT dur AS t,
        |    round(CASE WHEN gone > 0 THEN 0.0
        |          ELSE exp(sum(lnm) OVER (ORDER BY dur
        |            ROWS UNBOUNDED PRECEDING)::DOUBLE / 1e12) END, 6)
        |      AS survival
        |  FROM st),
        |lg AS (
        |  SELECT t, survival,
        |    lag(t, 1, 0) OVER (ORDER BY t) AS pt,
        |    lag(survival, 1, 1.0) OVER (ORDER BY t) AS ps
        |  FROM km),
        |stp AS (
        |  SELECT CAST(sum(CAST(round(ps * (least(t, 30) - pt)::DOUBLE
        |    * 1e12) AS BIGINT)) AS BIGINT) AS stepq
        |  FROM lg WHERE pt < 30),
        |tl AS (SELECT max(t) AS tlast, arg_max(survival, t) AS sl FROM km),
        |tq AS (
        |  SELECT CASE WHEN tlast IS NOT NULL AND tlast < 30
        |           THEN CAST(round(sl * (30 - tlast)::DOUBLE * 1e12)
        |             AS BIGINT)
        |         WHEN tlast IS NULL THEN 30 * 1000000000000
        |         ELSE 0 END AS tailq
        |  FROM tl)
        |SELECT CAST(30 AS BIGINT) AS tau,
        |  round((coalesce(stepq, 0) + tailq)::DOUBLE / 1e12, 6) AS rmst
        |FROM stp, tq""".stripMargin,

    // J14: nearest as-of — candidate join + (distance, backward-first,
    // ts) rank (a different algorithm from the engine's two-frame
    // window carry), LEFT join keeps unmatched views
    "j14_asof_nearest" ->
      """WITH v AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS vt
        |  FROM events WHERE event_type = 'view'),
        |p AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS pt,
        |    max(value) AS value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |cand AS (
        |  SELECT v.user_id, v.event_id, p.value,
        |    CASE WHEN p.pt <= v.vt THEN v.vt - p.pt
        |         ELSE p.pt - v.vt END AS age,
        |    CASE WHEN p.pt <= v.vt THEN 0 ELSE 1 END AS dirn,
        |    row_number() OVER (PARTITION BY v.user_id, v.event_id
        |      ORDER BY CASE WHEN p.pt <= v.vt THEN v.vt - p.pt
        |                    ELSE p.pt - v.vt END,
        |               CASE WHEN p.pt <= v.vt THEN 0 ELSE 1 END, p.pt)
        |      AS rn
        |  FROM v JOIN p USING (user_id)
        |  WHERE (CASE WHEN p.pt <= v.vt THEN v.vt - p.pt
        |              ELSE p.pt - v.vt END) <= 3600000000)
        |SELECT v.user_id, v.event_id,
        |  round(c.value, 6) AS value, c.age AS asof_age_us,
        |  CASE WHEN c.dirn = 0 THEN 'backward'
        |       WHEN c.dirn = 1 THEN 'forward' END AS asof_dir
        |FROM v
        |LEFT JOIN (SELECT * FROM cand WHERE rn = 1) c
        |  ON v.user_id = c.user_id AND v.event_id = c.event_id"""
        .stripMargin,

    // Q4: order-priority — EXISTS semi-join on late lineitems over a
    // one-quarter slice
    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*)::BIGINT AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        |  AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_returnflag = 'R')
        |GROUP BY 1""".stripMargin,

    // Q18: large-volume orders — HAVING aggregate semi-joined back
    // onto its own fact table; exact quantity cents
    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
        |      AS qty_cents
        |  FROM lineitem GROUP BY 1
        |  HAVING CAST(sum(CAST(round(l_quantity * 100) AS BIGINT))
        |    AS BIGINT) > 25000)
        |SELECT c_name, c_custkey, o_orderkey,
        |  CAST(o_orderdate AS DATE) AS o_orderdate,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents,
        |  qty_cents
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN big ON o_orderkey = l_orderkey""".stripMargin,

    // Q2: correlated scalar subquery (min-cost supplier) — DuckDB
    // decorrelates it independently of Catalyst, so the two planners'
    // decorrelations check each other
    "q2_min_cost_supplier" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(MIN(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
        |      AS BIGINT) AS cost_cents
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT p.p_partkey, p.p_brand, s.s_name, n.n_name, ps.cost_cents
        |FROM part p
        |JOIN ps ON ps.l_partkey = p.p_partkey
        |JOIN supplier s ON s.s_suppkey = ps.l_suppkey
        |JOIN nation n ON n.n_nationkey = s.s_nationkey
        |JOIN region r ON r.r_regionkey = n.n_regionkey
        |WHERE r.r_name = 'EUROPE' AND p.p_size <= 15
        |  AND ps.cost_cents = (SELECT MIN(ps2.cost_cents) FROM ps ps2
        |                       WHERE ps2.l_partkey = p.p_partkey)""".stripMargin,

    // Q21: multi-semi + anti self-join (only supplier who failed)
    "q21_waiting_supplier" ->
      """SELECT s.s_name, count(*)::BIGINT AS numwait
        |FROM supplier s
        |JOIN lineitem l1
        |  ON l1.l_suppkey = s.s_suppkey AND l1.l_returnflag = 'R'
        |JOIN orders o
        |  ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
        |WHERE EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_returnflag = 'R')
        |GROUP BY s.s_name""".stripMargin,

    // Q11: group-HAVING vs a global scalar — integer-exact via
    // value·1000 > total (no division); HUGEINT discipline on the sums
    "q11_important_parts" ->
      """WITH v AS (
        |  SELECT l_partkey,
        |    CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
        |             * CAST(l_quantity AS BIGINT)) AS BIGINT) AS value_cents
        |  FROM lineitem
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation ON n_nationkey = s_nationkey
        |  WHERE n_name = 'NATION_7'
        |  GROUP BY 1)
        |SELECT l_partkey, value_cents
        |FROM v
        |WHERE value_cents * 1000 > (SELECT CAST(SUM(value_cents) AS BIGINT)
        |                            FROM v)""".stripMargin,

    // A16: Pareto 80/20 — exact cents, the top-80 membership decided
    // on INTEGERS (cum_prev·10 < tot·8), bounded brand frame
    "a16_pareto" ->
      """WITH rev AS (
        |  SELECT p_brand AS brand,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |      AS BIGINT) AS revenue_cents
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1),
        |w AS (
        |  SELECT *, CAST(sum(revenue_cents) OVER () AS BIGINT) AS tot,
        |    CAST(sum(revenue_cents) OVER (ORDER BY revenue_cents DESC,
        |      brand ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM rev)
        |SELECT brand, revenue_cents,
        |  round(revenue_cents::DOUBLE / tot::DOUBLE, 6) AS share,
        |  round(cum::DOUBLE / tot::DOUBLE, 6) AS cum_share,
        |  CASE WHEN (cum - revenue_cents) * 10 < tot * 8
        |       THEN 1 ELSE 0 END AS is_top80
        |FROM w""".stripMargin,

    // EV32: U-shaped attribution — first-conversion cutoff via a
    // window min over the (m, id) ROW, integer // credit split with
    // the same remainder-to-earliest-middles rule
    "ev32_position_attribution" ->
      """WITH e AS (
        |  SELECT user_id, event_type, event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS m,
        |    min(CASE WHEN event_type = 'purchase'
        |        THEN (epoch_us(CAST(ts AS TIMESTAMP)), event_id) END)
        |      OVER (PARTITION BY user_id) AS fc
        |  FROM events),
        |t AS (
        |  SELECT user_id, event_type, m, event_id,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY m, event_id) AS i,
        |    count(*) OVER (PARTITION BY user_id) AS k
        |  FROM e
        |  WHERE fc IS NOT NULL AND event_type IN ('view', 'click')
        |    AND (m, event_id) < fc),
        |c AS (
        |  SELECT event_type,
        |    CASE WHEN k = 1 THEN 1000000
        |         WHEN k = 2 THEN 500000
        |         WHEN i = 1 OR i = k THEN 400000
        |         ELSE (200000 // (k - 2)) +
        |           CASE WHEN i - 1 <= 200000 - (200000 // (k - 2)) * (k - 2)
        |                THEN 1 ELSE 0 END END AS credit
        |  FROM t)
        |SELECT event_type AS channel, count(*)::BIGINT AS n_touches,
        |  round(CAST(sum(credit) AS BIGINT)::DOUBLE / 1e6, 6) AS credit
        |FROM c GROUP BY 1""".stripMargin,

    // EV19: bounded 7×24 profile; DuckDB isodow = the engine's ISO map
    "ev19_hourly_profile" ->
      """SELECT CAST(isodow(CAST(ts AS TIMESTAMP)) AS BIGINT) AS dow,
        |  CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS hour,
        |  count(*)::BIGINT AS n_events,
        |  count(DISTINCT user_id)::BIGINT AS n_users
        |FROM events GROUP BY 1, 2""".stripMargin,

    // EV18: new/returning decomposition off first active day
    "ev18_new_returning" ->
      """WITH d AS (
        |  SELECT DISTINCT user_id,
        |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS date
        |  FROM events),
        |f AS (SELECT user_id, min(date) AS fd FROM d GROUP BY 1)
        |SELECT d.date,
        |  CAST(sum(CASE WHEN d.date = f.fd THEN 1 ELSE 0 END) AS BIGINT)
        |    AS new_users,
        |  CAST(sum(CASE WHEN d.date <> f.fd THEN 1 ELSE 0 END) AS BIGINT)
        |    AS returning_users,
        |  count(*)::BIGINT AS dau
        |FROM d JOIN f USING (user_id)
        |GROUP BY 1""".stripMargin,

    // W25: rolling beta — micro returns, exact windowed moments, one
    // division per emitted row
    "w25_rolling_beta" ->
      s"""WITH $panelCte,
         |rr AS (
         |  SELECT sid, date,
         |    close / lag(close) OVER (PARTITION BY sid ORDER BY date) - 1
         |      AS ret
         |  FROM panel),
         |b AS (SELECT date, ret AS bret FROM rr WHERE sid = 1),
         |j AS (SELECT rr.sid, rr.date, rr.ret, b.bret
         |      FROM rr LEFT JOIN b USING (date)),
         |q AS (
         |  SELECT sid, date,
         |    CASE WHEN ret IS NOT NULL AND bret IS NOT NULL
         |         THEN CAST(round(ret * 1e6) AS BIGINT) END AS x,
         |    CASE WHEN ret IS NOT NULL AND bret IS NOT NULL
         |         THEN CAST(round(bret * 1e6) AS BIGINT) END AS y
         |  FROM j),
         |w AS (
         |  SELECT sid, date,
         |    count(x) OVER win AS n,
         |    sum(x::HUGEINT) OVER win AS sx,
         |    sum(y::HUGEINT) OVER win AS sy,
         |    sum(x::HUGEINT * y) OVER win AS sxy,
         |    sum(y::HUGEINT * y) OVER win AS syy
         |  FROM q
         |  WINDOW win AS (PARTITION BY sid ORDER BY date
         |                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
         |SELECT sid, date,
         |  round(CASE WHEN n = 20 AND n * syy - sy * sy <> 0
         |        THEN (n * sxy - sx * sy)::DOUBLE
         |           / (n * syy - sy * sy)::DOUBLE END, 6) AS beta_20
         |FROM w""".stripMargin,

    // W24: underwater spells — spell ids from the running at-peak
    // count, exact close-vs-cummax comparison
    "w24_underwater" ->
      s"""WITH $panelCte,
         |p AS (
         |  SELECT sid, date, close,
         |    max(close) OVER (PARTITION BY sid ORDER BY date
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pk,
         |    CASE WHEN lead(close) OVER (PARTITION BY sid ORDER BY date)
         |         IS NULL THEN 1 ELSE 0 END AS lst
         |  FROM panel),
         |s AS (
         |  SELECT sid, date, CASE WHEN close < pk THEN 1 ELSE 0 END AS uw,
         |    lst,
         |    sum(CASE WHEN close < pk THEN 0 ELSE 1 END)
         |      OVER (PARTITION BY sid ORDER BY date
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS spell
         |  FROM p),
         |g AS (
         |  SELECT sid, spell, CAST(sum(uw) AS BIGINT) AS len,
         |    max(CASE WHEN lst = 1 AND uw = 1 THEN 1 ELSE 0 END) AS opn,
         |    count(*) AS days
         |  FROM s GROUP BY 1, 2)
         |SELECT sid, CAST(sum(days) AS BIGINT) AS n_days,
         |  coalesce(max(len), 0)::BIGINT AS max_underwater,
         |  CAST(coalesce(sum(CASE WHEN opn = 1 THEN len ELSE 0 END), 0)
         |    AS BIGINT) AS open_underwater
         |FROM g GROUP BY 1""".stripMargin,

    // EV16: activity Gini — same histogram-telescoped Lorenz algebra as
    // the engine (HUGEINT exact), gini micro-rounded
    "ev16_gini" ->
      """WITH pu AS (
        |  SELECT event_type, user_id, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |h AS (
        |  SELECT event_type, n, count(*) AS c FROM pu GROUP BY 1, 2),
        |r AS (
        |  SELECT event_type, n, c,
        |    coalesce(sum(c) OVER (PARTITION BY event_type ORDER BY n
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1
        |      AS rk
        |  FROM h),
        |blocks AS (
        |  SELECT event_type, c,
        |    CAST(n AS HUGEINT) * c AS s_blk,
        |    CAST(n AS HUGEINT) *
        |      (CAST(c AS HUGEINT) * rk + (c * (c - 1) // 2)) AS w_blk
        |  FROM r),
        |agg AS (
        |  SELECT event_type, sum(c) AS n_users, sum(s_blk) AS s,
        |    sum(w_blk) AS w
        |  FROM blocks GROUP BY 1)
        |SELECT event_type, n_users::BIGINT AS n_users,
        |  s::BIGINT AS total_events,
        |  round((2.0 * w::DOUBLE / (n_users::DOUBLE * s::DOUBLE)
        |    - (n_users + 1)::DOUBLE / n_users) * 1e6) / 1e6 + 0.0 AS gini
        |FROM agg""".stripMargin,

    // EV17: RFM — integer metrics (days/counts/cents), value-tied
    // quintile bins ceil(5·cum/N) over each metric histogram
    "ev17_rfm" ->
      """WITH anchor AS (
        |  SELECT max(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS a
        |  FROM events),
        |pu AS (
        |  SELECT user_id,
        |    min(date_diff('day', CAST(CAST(ts AS TIMESTAMP) AS DATE),
        |      (SELECT a FROM anchor))) AS rec,
        |    count(*) AS freq,
        |    coalesce(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END), 0)
        |      AS mon
        |  FROM events GROUP BY 1),
        |n AS (SELECT count(*) AS tot FROM pu),
        |rb AS (
        |  SELECT v, CAST(floor((cum * 5 - 1) / tot) AS BIGINT) + 1 AS bin
        |  FROM (SELECT rec AS v, sum(count(*)) OVER (ORDER BY rec
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |        FROM pu GROUP BY rec), n),
        |fb AS (
        |  SELECT v, CAST(floor((cum * 5 - 1) / tot) AS BIGINT) + 1 AS bin
        |  FROM (SELECT freq AS v, sum(count(*)) OVER (ORDER BY freq
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |        FROM pu GROUP BY freq), n),
        |mb AS (
        |  SELECT v, CAST(floor((cum * 5 - 1) / tot) AS BIGINT) + 1 AS bin
        |  FROM (SELECT mon AS v, sum(count(*)) OVER (ORDER BY mon
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |        FROM pu GROUP BY mon), n)
        |SELECT rb.bin AS r_bin, fb.bin AS f_bin, mb.bin AS m_bin,
        |  count(*)::BIGINT AS n_users,
        |  sum(pu.mon)::BIGINT AS monetary_cents
        |FROM pu
        |JOIN rb ON pu.rec = rb.v
        |JOIN fb ON pu.freq = fb.v
        |JOIN mb ON pu.mon = mb.v
        |GROUP BY 1, 2, 3""".stripMargin,

    // EV38: ev17 with the autoCoarsen policy replicated — the candidate
    // scan picks min q in {1,10,…,10⁸} whose quantized distinct count
    // fits maxBins = 100 (monotone nonincreasing in q, so min-fitting ==
    // the engine's finest-fitting; q = 1 fitting == the engine's happy
    // path). Quantization mirrors Spark's pmod ((m % q + q) % q) so
    // negative monetary sums round toward -inf in both engines; exact
    // cents still summed in the output.
    "ev38_rfm_autocoarsen" ->
      """WITH anchor AS (
        |  SELECT max(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS a
        |  FROM events),
        |pu AS (
        |  SELECT user_id,
        |    min(date_diff('day', CAST(CAST(ts AS TIMESTAMP) AS DATE),
        |      (SELECT a FROM anchor))) AS rec,
        |    count(*) AS freq,
        |    coalesce(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END), 0)
        |      AS mon
        |  FROM events GROUP BY 1),
        |cand AS (
        |  SELECT CAST(unnest([1, 10, 100, 1000, 10000, 100000,
        |                      1000000, 10000000, 100000000]) AS BIGINT)
        |    AS q),
        |counts AS (
        |  SELECT q, count(DISTINCT mon - ((mon % q + q) % q)) AS nq
        |  FROM pu CROSS JOIN cand GROUP BY q),
        |chosen AS (SELECT min(q) AS q FROM counts WHERE nq <= 100),
        |puq AS (
        |  SELECT user_id, rec, freq, mon,
        |    mon - ((mon % (SELECT q FROM chosen)
        |            + (SELECT q FROM chosen)) % (SELECT q FROM chosen))
        |      AS monq
        |  FROM pu),
        |n AS (SELECT count(*) AS tot FROM puq),
        |rb AS (
        |  SELECT v, CAST(floor((cum * 5 - 1) / tot) AS BIGINT) + 1 AS bin
        |  FROM (SELECT rec AS v, sum(count(*)) OVER (ORDER BY rec
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |        FROM puq GROUP BY rec), n),
        |fb AS (
        |  SELECT v, CAST(floor((cum * 5 - 1) / tot) AS BIGINT) + 1 AS bin
        |  FROM (SELECT freq AS v, sum(count(*)) OVER (ORDER BY freq
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |        FROM puq GROUP BY freq), n),
        |mb AS (
        |  SELECT v, CAST(floor((cum * 5 - 1) / tot) AS BIGINT) + 1 AS bin
        |  FROM (SELECT monq AS v, sum(count(*)) OVER (ORDER BY monq
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |        FROM puq GROUP BY monq), n)
        |SELECT rb.bin AS r_bin, fb.bin AS f_bin, mb.bin AS m_bin,
        |  count(*)::BIGINT AS n_users,
        |  sum(puq.mon)::BIGINT AS monetary_cents
        |FROM puq
        |JOIN rb ON puq.rec = rb.v
        |JOIN fb ON puq.freq = fb.v
        |JOIN mb ON puq.monq = mb.v
        |GROUP BY 1, 2, 3""".stripMargin,

    // EV15: burstiness — exact µs gaps, decimal raw moments per user,
    // micro-requantized corpus mean
    "ev15_burstiness" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS m
        |  FROM events),
        |g AS (
        |  SELECT user_id,
        |    m - lag(m) OVER (PARTITION BY user_id ORDER BY m, event_id) AS gp
        |  FROM e),
        |gg AS (SELECT user_id, gp FROM g WHERE gp IS NOT NULL),
        |pu AS (
        |  SELECT user_id, count(*) AS n,
        |    CAST(sum(gp) AS HUGEINT) AS s,
        |    CAST(sum(CAST(gp AS HUGEINT) * CAST(gp AS HUGEINT)) AS HUGEINT)
        |      AS ss
        |  FROM gg GROUP BY 1),
        |bs AS (
        |  SELECT user_id,
        |    round(CASE WHEN sg + mu > 0 THEN (sg - mu) / (sg + mu) END, 6)
        |      AS b
        |  FROM (
        |    SELECT user_id, mu,
        |      sqrt(greatest(ss::DOUBLE / n - mu * mu, 0.0)) AS sg
        |    FROM (SELECT user_id, n, ss, s::DOUBLE / n AS mu FROM pu
        |          WHERE n >= 2) q1) q2),
        |bn AS (SELECT * FROM bs WHERE b IS NOT NULL)
        |SELECT count(*)::BIGINT AS n_users,
        |  round(CAST(sum(CAST(round(b * 1e6) AS BIGINT)) AS BIGINT)::DOUBLE
        |    / count(*)) / 1e6 + 0.0 AS mean_burstiness,
        |  round(sum(CASE WHEN b > 0 THEN 1 ELSE 0 END)::DOUBLE * 1e6
        |    / count(*)) / 1e6 AS frac_bursty
        |FROM bn""".stripMargin,

    // Kaplan-Meier: exact risk/event counts, micro-nat log-space
    // survival product, d = n pins the curve at 0
    "ev11_kaplan_meier" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    min(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS f,
        |    max(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS l
        |  FROM events GROUP BY 1),
        |mx AS (SELECT max(l) AS m FROM pu),
        |obs AS (
        |  SELECT CAST(date_diff('day', f, l) AS BIGINT) AS dur,
        |    CASE WHEN date_diff('day', l, (SELECT m FROM mx)) >= 1
        |         THEN 1 ELSE 0 END AS ev
        |  FROM pu),
        |bd AS (
        |  SELECT dur, count(*)::BIGINT AS c, CAST(sum(ev) AS BIGINT) AS d
        |  FROM obs GROUP BY 1),
        |nn AS (
        |  SELECT *, CAST(sum(c) OVER (ORDER BY dur DESC
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n
        |  FROM bd),
        |st AS (
        |  SELECT dur, n, d,
        |    CASE WHEN d < n
        |         THEN CAST(round(ln((n - d)::DOUBLE / n) * 1e12) AS BIGINT)
        |    END AS lnm,
        |    sum(CASE WHEN d = n THEN 1 ELSE 0 END)
        |      OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING) AS gone
        |  FROM nn WHERE d > 0)
        |SELECT dur AS t, n AS n_risk, d AS n_events,
        |  round(CASE WHEN gone > 0 THEN 0.0
        |        ELSE exp(sum(lnm) OVER (ORDER BY dur
        |          ROWS UNBOUNDED PRECEDING)::DOUBLE / 1e12) END, 6)
        |    AS survival
        |FROM st""".stripMargin,

    // DAU + trailing-28-day actives via the interval sweep: per-user
    // disjoint coverage intervals → exact count(*) per day, no distinct
    "ev9_active_users" ->
      """WITH ev AS (
        |  SELECT DISTINCT user_id AS u, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
        |  FROM events),
        |mx AS (SELECT max(d) AS m FROM ev),
        |iv AS (
        |  SELECT u, d,
        |    least(coalesce(lead(d) OVER (PARTITION BY u ORDER BY d) - 1,
        |                   (SELECT m FROM mx)),
        |          d + 27, (SELECT m FROM mx)) AS e
        |  FROM ev),
        |ex AS (
        |  SELECT d, CAST(unnest(generate_series(CAST(d AS TIMESTAMP),
        |    CAST(e AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS date
        |  FROM iv)
        |SELECT date,
        |  CAST(sum(CASE WHEN date = d THEN 1 ELSE 0 END) AS BIGINT) AS dau,
        |  count(*)::BIGINT AS active_28
        |FROM ex GROUP BY 1""".stripMargin,

    // IC time-series summary over the ic1 per-date series: exact micro
    // re-quantization of the 6dp ICs → order-free HUGEINT sums
    // IC6: Newey-West — integer ×n demeaning, exact lag-product sums,
    // Bartlett weights interpolated as the engine's own double literals
    "ic6_newey_west" -> {
      val lags = 5
      val wts = (1 to lags).map(l => 2.0 * (1.0 - l.toDouble / (lags + 1)))
      val lagCols = (1 to lags)
        .map(l => s"lag(d, $l) OVER (ORDER BY date) AS d$l").mkString(",\n    ")
      val gammas = (1 to lags)
        .map(l => s"sum(d::HUGEINT * d$l) AS g$l").mkString(",\n    ")
      val lrv = (1 to lags)
        .map(l => s"+ ${wts(l - 1)} * (g$l::DOUBLE / nd)").mkString(" ")
      s"""WITH $panelCte,
         |fwd AS (
         |  SELECT sid, date, close,
         |    lead(close) OVER (PARTITION BY sid ORDER BY date) / close - 1 AS f
         |  FROM panel),
         |b AS (SELECT * FROM fwd WHERE f IS NOT NULL),
         |r AS (
         |  SELECT date,
         |    CAST(2*rank() OVER (PARTITION BY date ORDER BY close)
         |      + count(*) OVER (PARTITION BY date, close) - 1 AS HUGEINT) AS rx,
         |    CAST(2*rank() OVER (PARTITION BY date ORDER BY f)
         |      + count(*) OVER (PARTITION BY date, f) - 1 AS HUGEINT) AS ry
         |  FROM b),
         |st AS (
         |  SELECT date, count(*) AS n, sum(rx) AS sx, sum(ry) AS sy,
         |         sum(rx*rx) AS sxx, sum(ry*ry) AS syy, sum(rx*ry) AS sxy
         |  FROM r GROUP BY date),
         |ics AS (
         |  SELECT date,
         |    round(CASE WHEN n >= 2 AND n*sxx - sx*sx <> 0 AND n*syy - sy*sy <> 0
         |    THEN CAST(n*sxy - sx*sy AS DOUBLE) /
         |      sqrt(CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE))
         |    END, 6) + 0.0 AS ic
         |  FROM st),
         |mi AS (SELECT date, CAST(round(ic * 1e6) AS BIGINT) AS m FROM ics
         |       WHERE ic IS NOT NULL),
         |tot AS (SELECT count(*) AS n, CAST(sum(m) AS BIGINT) AS sm FROM mi),
         |dv AS (SELECT date, m * tot.n - tot.sm AS d FROM mi, tot),
         |lg AS (
         |  SELECT date, d,
         |    $lagCols
         |  FROM dv),
         |ag AS (
         |  SELECT count(*) AS n_dates, sum(d::HUGEINT * d) AS g0,
         |    $gammas
         |  FROM lg),
         |fy AS (
         |  SELECT ag.*, CAST(ag.n_dates AS DOUBLE) AS nd, tot.n, tot.sm
         |  FROM ag, tot),
         |fz AS (
         |  SELECT n_dates,
         |    sm::DOUBLE / nd / 1e6 AS mean,
         |    sqrt((g0::DOUBLE / nd) / nd) / n / 1e6 AS sd0,
         |    sqrt((g0::DOUBLE / nd $lrv) / nd) / n / 1e6 AS sdnw,
         |    (n_dates >= ${lags + 2}) AS ok
         |  FROM fy)
         |SELECT CAST(n_dates AS BIGINT) AS n_dates,
         |  round(CASE WHEN n_dates > 0 THEN mean END, 6) + 0.0 AS mean_ic,
         |  round(CASE WHEN ok AND sd0 > 0 THEN mean / sd0 END, 6) + 0.0
         |    AS t_iid,
         |  round(CASE WHEN ok AND sdnw > 0 THEN mean / sdnw END, 6) + 0.0
         |    AS t_nw
         |FROM fz""".stripMargin
    },

    "ic3_ic_summary" ->
      s"""WITH $panelCte,
         |fwd AS (
         |  SELECT sid, date, close,
         |    lead(close) OVER (PARTITION BY sid ORDER BY date) / close - 1 AS f
         |  FROM panel),
         |b AS (SELECT * FROM fwd WHERE f IS NOT NULL),
         |r AS (
         |  SELECT date,
         |    CAST(2*rank() OVER (PARTITION BY date ORDER BY close)
         |      + count(*) OVER (PARTITION BY date, close) - 1 AS HUGEINT) AS rx,
         |    CAST(2*rank() OVER (PARTITION BY date ORDER BY f)
         |      + count(*) OVER (PARTITION BY date, f) - 1 AS HUGEINT) AS ry
         |  FROM b),
         |st AS (
         |  SELECT date, count(*) AS n, sum(rx) AS sx, sum(ry) AS sy,
         |         sum(rx*rx) AS sxx, sum(ry*ry) AS syy, sum(rx*ry) AS sxy
         |  FROM r GROUP BY date),
         |ic AS (
         |  SELECT round(CASE WHEN n >= 2 AND n*sxx - sx*sx <> 0 AND n*syy - sy*sy <> 0
         |    THEN CAST(n*sxy - sx*sy AS DOUBLE) /
         |      sqrt(CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE))
         |    END, 6) + 0.0 AS ic
         |  FROM st),
         |mi AS (SELECT ic, CAST(round(ic * 1e6) AS HUGEINT) AS m FROM ic
         |       WHERE ic IS NOT NULL),
         |ag AS (
         |  SELECT count(*) AS n, sum(m) AS s, sum(m*m) AS ss,
         |         sum(CASE WHEN ic > 0 THEN 1 ELSE 0 END) AS hits
         |  FROM mi),
         |dd AS (
         |  SELECT n, hits, CAST(n AS DOUBLE) AS nd,
         |         CAST(s AS DOUBLE) AS sd, CAST(ss AS DOUBLE) AS ssd
         |  FROM ag),
         |fx AS (
         |  SELECT n, hits, nd, sd / nd / 1e6 AS mean,
         |         sqrt((ssd * nd - sd * sd) / (nd * (nd - 1))) / 1e6 AS std
         |  FROM dd)
         |SELECT CAST(n AS BIGINT) AS n_dates,
         |  round(CASE WHEN n > 0 THEN mean END, 6) + 0.0 AS mean_ic,
         |  round(CASE WHEN n >= 2 AND std <> 0 THEN mean / std END, 6) + 0.0
         |    AS ic_ir,
         |  round(CASE WHEN n >= 2 AND std <> 0 THEN mean / std * sqrt(nd) END, 6)
         |    + 0.0 AS t_stat,
         |  round(CASE WHEN n > 0 THEN CAST(hits AS DOUBLE) / nd END, 6) AS hit_rate
         |FROM fx""".stripMargin,

    // Fama-MacBeth pass 1: per-date OLS of fwd return on (momentum,
    // scaled level) — HUGEINT micro moments, double Cramer with the
    // SAME parenthesization as the Spark expression tree
    "fm1_fama_macbeth" -> fmCoeffsSql,

    // PX9: residuals vs each date's two-factor fit — pf carries the raw
    // rows (nulls included), coefs join on date
    "px9_residual2" ->
      s"""WITH $fmCoeffsCtes
         |SELECT p.sid, p.date,
         |  round(CASE WHEN p.f IS NOT NULL AND p.mom IS NOT NULL
         |              AND p.lvl IS NOT NULL AND c.alpha IS NOT NULL
         |        THEN p.f - c.alpha - c.beta1 * p.mom - c.beta2 * p.lvl
         |        END, 6) + 0.0 AS resid2
         |FROM pf p
         |LEFT JOIN coefs c ON p.date = c.date""".stripMargin,

    // Fama-MacBeth pass 2: mean premia + t-stats over the pass-1
    // coefficient series (micro re-quantization of the 6dp outputs)
    "fm2_risk_premia" ->
      s"""WITH co AS ($fmCoeffsSql),
         |ag AS (
         |  SELECT
         |    count(alpha) AS na, sum(CAST(round(alpha * 1e6) AS HUGEINT)) AS s_a,
         |    sum(CAST(round(alpha * 1e6) AS HUGEINT)
         |      * CAST(round(alpha * 1e6) AS HUGEINT)) AS ss_a,
         |    count(beta1) AS n1, sum(CAST(round(beta1 * 1e6) AS HUGEINT)) AS s_1,
         |    sum(CAST(round(beta1 * 1e6) AS HUGEINT)
         |      * CAST(round(beta1 * 1e6) AS HUGEINT)) AS ss_1,
         |    count(beta2) AS n2, sum(CAST(round(beta2 * 1e6) AS HUGEINT)) AS s_2,
         |    sum(CAST(round(beta2 * 1e6) AS HUGEINT)
         |      * CAST(round(beta2 * 1e6) AS HUGEINT)) AS ss_2
         |  FROM co),
         |fx AS (
         |  SELECT *,
         |    CAST(na AS DOUBLE) AS nad, CAST(n1 AS DOUBLE) AS n1d,
         |    CAST(n2 AS DOUBLE) AS n2d,
         |    CAST(s_a AS DOUBLE) AS sad, CAST(ss_a AS DOUBLE) AS ssad,
         |    CAST(s_1 AS DOUBLE) AS s1d, CAST(ss_1 AS DOUBLE) AS ss1d,
         |    CAST(s_2 AS DOUBLE) AS s2d, CAST(ss_2 AS DOUBLE) AS ss2d
         |  FROM ag),
         |ms AS (
         |  SELECT *,
         |    sad / nad / 1e6 AS mean_a,
         |    sqrt((ssad * nad - sad * sad) / (nad * (nad - 1))) / 1e6 AS std_a,
         |    s1d / n1d / 1e6 AS mean_1,
         |    sqrt((ss1d * n1d - s1d * s1d) / (n1d * (n1d - 1))) / 1e6 AS std_1,
         |    s2d / n2d / 1e6 AS mean_2,
         |    sqrt((ss2d * n2d - s2d * s2d) / (n2d * (n2d - 1))) / 1e6 AS std_2
         |  FROM fx)
         |SELECT
         |  CAST(na AS BIGINT) AS n_alpha,
         |  round(CASE WHEN na > 0 THEN mean_a END, 6) + 0.0 AS mean_alpha,
         |  round(CASE WHEN na >= 2 AND std_a <> 0 THEN mean_a / std_a * sqrt(nad)
         |        END, 6) + 0.0 AS t_alpha,
         |  CAST(n1 AS BIGINT) AS n_beta1,
         |  round(CASE WHEN n1 > 0 THEN mean_1 END, 6) + 0.0 AS mean_beta1,
         |  round(CASE WHEN n1 >= 2 AND std_1 <> 0 THEN mean_1 / std_1 * sqrt(n1d)
         |        END, 6) + 0.0 AS t_beta1,
         |  CAST(n2 AS BIGINT) AS n_beta2,
         |  round(CASE WHEN n2 > 0 THEN mean_2 END, 6) + 0.0 AS mean_beta2,
         |  round(CASE WHEN n2 >= 2 AND std_2 <> 0 THEN mean_2 / std_2 * sqrt(n2d)
         |        END, 6) + 0.0 AS t_beta2
         |FROM ms""".stripMargin,

    // active-return summary vs the benchmark joint series: annualized
    // mean excess, tracking error, information ratio (6dp; sqrt is
    // IEEE-exact so both engines agree on √252)
    "perf_active" ->
      s"""WITH $perfRetCte,
         |dates AS (SELECT DISTINCT date FROM panel),
         |bcl AS (SELECT date, close FROM panel WHERE sid = 1),
         |bf AS (
         |  SELECT d.date,
         |    last_value(bcl.close IGNORE NULLS) OVER (ORDER BY d.date
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
         |  FROM dates d LEFT JOIN bcl ON d.date = bcl.date),
         |br AS (
         |  SELECT date, coalesce(c / lag(c) OVER (ORDER BY date) - 1, 0.0) AS b
         |  FROM bf),
         |j AS (SELECT ret.date, r - b AS a FROM ret JOIN br ON ret.date = br.date),
         |st AS (
         |  SELECT count(*) AS n_days, avg(a) AS mu, stddev_samp(a) AS sd FROM j)
         |SELECT CAST(n_days AS BIGINT) AS n_days,
         |  round(mu * 252, 6) + 0.0 AS active_return_ann,
         |  round(sd * sqrt(252), 6) AS tracking_error,
         |  round(CASE WHEN sd <> 0 THEN mu / sd * sqrt(252) END, 6) + 0.0
         |    AS info_ratio
         |FROM st""".stripMargin,

    // Omega at τ=0: gain and loss mass as exact integer pico sums over
    // the per-date series; the division is the only IEEE op
    "perf_omega" ->
      s"""WITH $perfRetCte
         |SELECT CAST(count(*) AS BIGINT) AS n_days,
         |  CAST(sum(CASE WHEN r > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
         |  CAST(sum(CASE WHEN r < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
         |  round(CASE
         |    WHEN sum(CASE WHEN r < 0 THEN CAST(round((0 - r) * 1e12) AS BIGINT)
         |             ELSE 0 END) <> 0
         |    THEN sum(CASE WHEN r > 0 THEN CAST(round(r * 1e12) AS BIGINT)
         |             ELSE 0 END)::DOUBLE /
         |         sum(CASE WHEN r < 0 THEN CAST(round((0 - r) * 1e12) AS BIGINT)
         |             ELSE 0 END)::DOUBLE
         |    END, 6) AS omega
         |FROM ret""".stripMargin,

    // Ulcer index: RMS of the 6dp-rounded drawdown, micro-quantized so
    // the mean of squares is exact; Martin = CAGR / ulcer
    "perf_ulcer" ->
      s"""WITH $perfPkCte,
         |dd AS (
         |  SELECT date, c,
         |    CAST(round(round(CASE WHEN p <> 0 THEN c / p - 1 END, 6) * 1e6)
         |      AS BIGINT) AS ddu
         |  FROM pk),
         |st AS (
         |  SELECT count(*) AS n_days, count(ddu) AS nd,
         |         arg_max(c, date) AS endc,
         |         sum(CAST(ddu AS HUGEINT) * CAST(ddu AS HUGEINT)) AS sq
         |  FROM dd)
         |SELECT CAST(n_days AS BIGINT) AS n_days,
         |  round(sqrt(sq::DOUBLE / nd) / 1e6, 6) AS ulcer_index,
         |  round(CASE WHEN sq > 0 AND endc > 0
         |             THEN (pow(endc, 252.0 / n_days) - 1) /
         |                  (sqrt(sq::DOUBLE / nd) / 1e6) END, 6) AS martin_ratio
         |FROM st""".stripMargin,

    // longest win/loss streaks: island detection on the return sign
    // (exact integers end-to-end)
    "perf_streaks" ->
      s"""WITH $perfRetCte,
         |sg AS (
         |  SELECT date, CASE WHEN r > 0 THEN 1 WHEN r < 0 THEN -1 ELSE 0 END
         |    AS sgn
         |  FROM ret),
         |br AS (
         |  SELECT date, sgn,
         |    CASE WHEN coalesce(lag(sgn) OVER (ORDER BY date), 99) <> sgn
         |         THEN 1 ELSE 0 END AS brk
         |  FROM sg),
         |rn AS (
         |  SELECT date, sgn, sum(brk) OVER (ORDER BY date
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
         |  FROM br),
         |runs AS (SELECT run, max(sgn) AS s, count(*) AS len FROM rn GROUP BY run)
         |SELECT CAST(sum(len) AS BIGINT) AS n_days,
         |  CAST(coalesce(max(CASE WHEN s = 1 THEN len END), 0) AS BIGINT)
         |    AS max_win_streak,
         |  CAST(coalesce(max(CASE WHEN s = -1 THEN len END), 0) AS BIGINT)
         |    AS max_loss_streak
         |FROM runs""".stripMargin,

    // skew/kurtosis via the explicit raw-moment expansion — engine
    // builtins disagree on small-sample corrections, the algebra doesn't
    "perf_moments" ->
      s"""WITH $perfRetCte,
         |st AS (
         |  SELECT count(*) AS n, sum(CAST(round(r * 1e12) AS BIGINT)) AS s1,
         |         avg(r * r) AS a2, avg(r * r * r) AS a3,
         |         avg(r * r * r * r) AS a4
         |  FROM ret),
         |m AS (SELECT n, s1::DOUBLE / 1e12 / n AS mu, a2, a3, a4 FROM st),
         |cm AS (
         |  SELECT n, mu, a2 - mu * mu AS m2,
         |         a3 - 3 * mu * a2 + 2 * mu * mu * mu AS m3,
         |         a4 - 4 * mu * a3 + 6 * mu * mu * a2 - 3 * pow(mu, 4) AS m4
         |  FROM m)
         |SELECT CAST(n AS BIGINT) AS n_days,
         |  round(mu, 6) + 0.0 AS mean,
         |  round(CASE WHEN m2 > 0 THEN m3 / pow(m2, 1.5) END, 6) + 0.0
         |    AS skewness,
         |  round(CASE WHEN m2 > 0 THEN m4 / (m2 * m2) - 3 END, 6) + 0.0
         |    AS excess_kurtosis
         |FROM cm""".stripMargin,

    // W18: Bollinger bands — micro-exact SMA mid; bands from the
    // 6dp-rounded rolling sample stddev (rounded BEFORE the band math)
    "w18_bollinger" ->
      s"""WITH $panelCte,
         |b AS (
         |  SELECT sid, date,
         |    CASE WHEN count(close) OVER w = 20
         |         THEN round(CAST(sum(CAST(round(close * 1e6) AS BIGINT))
         |              OVER w AS DOUBLE) / 20 / 1e6, 6) END AS mid,
         |    CASE WHEN count(close) OVER w = 20
         |         THEN round(stddev_samp(close) OVER w, 6) END AS sd
         |  FROM panel
         |  WINDOW w AS (PARTITION BY sid ORDER BY date
         |               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
         |SELECT sid, date, mid AS bb_mid_20,
         |  round(mid + 2.0 * sd, 6) AS bb_up_20,
         |  round(mid - 2.0 * sd, 6) AS bb_dn_20
         |FROM b""".stripMargin,

    // W19: rolling VWAP — micro-exact notional / exact long volume
    "w19_vwap" ->
      """WITH bars AS (
        |  SELECT l_suppkey AS sid, CAST(l_shipdate AS DATE) AS date,
        |         max(l_extendedprice) AS close,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS vol
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT sid, date,
        |  CASE WHEN count(close) OVER w = 10
        |        AND sum(vol) OVER w <> 0
        |       THEN round(CAST(sum(CAST(round(close * vol * 1e6) AS HUGEINT))
        |            OVER w AS DOUBLE) / (sum(vol) OVER w)) / 1e6
        |  END AS vwap_10
        |FROM bars
        |WINDOW w AS (PARTITION BY sid ORDER BY date
        |             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)""".stripMargin,

    // portfolio concentration: per-date HHI over micro-quantized
    // AbsWeight values + the effective position count from the SAME sum
    "perf_hhi" ->
      s"""WITH $turnoverCte
         |SELECT date,
         |  CAST(sum(CASE WHEN abs(weight) <> 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_positions,
         |  round(sum(CAST(round(abs(weight) * 1e6) AS HUGEINT)
         |          * CAST(round(abs(weight) * 1e6) AS HUGEINT))::DOUBLE
         |        / 1e12, 6) AS hhi,
         |  round(CASE WHEN sum(CAST(round(abs(weight) * 1e6) AS HUGEINT)
         |          * CAST(round(abs(weight) * 1e6) AS HUGEINT)) > 0
         |        THEN 1e12 / sum(CAST(round(abs(weight) * 1e6) AS HUGEINT)
         |          * CAST(round(abs(weight) * 1e6) AS HUGEINT))::DOUBLE
         |        END, 6) AS effective_n
         |FROM wts GROUP BY date""".stripMargin,

    // ML15: expected calibration error — bin-weighted |gap| over the
    // ml5 bins; gaps are exact micro ints (6dp-rounded bin outputs)
    "ml15_ece" ->
      s"""WITH $panelCte,
         |pr AS (
         |  SELECT least(1.0::DOUBLE, round(close / 60000.0, 1)) AS s,
         |         CASE WHEN close >= 22000 THEN 1 ELSE 0 END AS y
         |  FROM panel),
         |cb AS (
         |  SELECT CAST(least(floor(s * 10), 9) AS BIGINT) AS bin,
         |    count(*)::BIGINT AS n,
         |    round(CAST(sum(CAST(round(s * 1e12) AS BIGINT)) AS BIGINT)::DOUBLE
         |          / 1e12 / count(*), 6) AS mp,
         |    round(sum(y)::DOUBLE / count(*), 6) AS er
         |  FROM pr GROUP BY 1)
         |SELECT CAST(sum(n) AS BIGINT) AS n, count(*)::BIGINT AS n_bins,
         |  round(sum(CAST(round(abs(er - mp) * 1e6) AS HUGEINT)
         |          * CAST(n AS HUGEINT))::DOUBLE / sum(n) / 1e6, 6) AS ece
         |FROM cb""".stripMargin,

    // ML22: Brier decomposition — pico-quantized per-row/per-bin terms,
    // resolution via the one-pass identity Σn·ȳ_k² − N·ȳ²
    "ml22_brier" ->
      s"""WITH $panelCte,
         |pr AS (
         |  SELECT least(1.0::DOUBLE, round(close / 60000.0, 1)) AS s,
         |         CASE WHEN close >= 22000 THEN 1 ELSE 0 END AS y
         |  FROM panel),
         |cb AS (
         |  SELECT CAST(least(floor(s * 10), 9) AS BIGINT) AS bin,
         |    count(*)::BIGINT AS n,
         |    CAST(sum(y) AS BIGINT) AS p,
         |    CAST(sum(CAST(round(s * 1e12) AS BIGINT)) AS HUGEINT) AS ssum,
         |    CAST(sum(CAST(round((s - y) * (s - y) * 1e12) AS BIGINT))
         |      AS HUGEINT) AS sq
         |  FROM pr GROUP BY 1),
         |cb2 AS (
         |  SELECT n, p, sq,
         |    ssum::DOUBLE / 1e12 / n AS mean, p::DOUBLE / n AS rate
         |  FROM cb),
         |ag AS (
         |  SELECT CAST(sum(n) AS BIGINT) AS n, count(*)::BIGINT AS n_bins,
         |    sum(sq) AS b, CAST(sum(p) AS BIGINT) AS ptot,
         |    sum(CAST(round((mean - rate) * (mean - rate) * 1e12)
         |      AS HUGEINT) * CAST(n AS HUGEINT)) AS rel,
         |    sum(CAST(round(rate * rate * 1e12) AS HUGEINT)
         |      * CAST(n AS HUGEINT)) AS r2
         |  FROM cb2)
         |SELECT n, n_bins,
         |  round(b::DOUBLE / 1e12 / n, 6) AS brier,
         |  round(rel::DOUBLE / 1e12 / n, 6) AS reliability,
         |  round(greatest(r2::DOUBLE / 1e12 / n
         |    - (ptot::DOUBLE / n) * (ptot::DOUBLE / n), 0.0), 6)
         |    AS resolution,
         |  round((ptot::DOUBLE / n) * (1.0 - ptot::DOUBLE / n), 6)
         |    AS uncertainty
         |FROM ag""".stripMargin,

    // ML27: gains table — value-tied score deciles, exact counts,
    // bounded decile cumulative
    "ml27_gains" ->
      s"""WITH $panelCte,
         |pr AS (
         |  SELECT least(1.0::DOUBLE, round(close / 60000.0, 1)) AS s,
         |         CASE WHEN close >= 22000 THEN 1 ELSE 0 END AS y
         |  FROM panel),
         |h AS (
         |  SELECT s, count(*)::BIGINT AS c, CAST(sum(y) AS BIGINT) AS p
         |  FROM pr GROUP BY 1),
         |cm AS (
         |  SELECT *,
         |    sum(c) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED PRECEDING
         |                 AND CURRENT ROW) AS cum,
         |    sum(c) OVER () AS tot, sum(p) OVER () AS pt
         |  FROM h),
         |dx AS (
         |  SELECT CAST(floor((cum * 10 - 1) / tot) AS BIGINT) + 1 AS decile,
         |         c, p, pt
         |  FROM cm),
         |g AS (
         |  SELECT decile, CAST(sum(c) AS BIGINT) AS n,
         |         CAST(sum(p) AS BIGINT) AS n_pos, max(pt) AS pt
         |  FROM dx GROUP BY 1)
         |SELECT decile, n, n_pos,
         |  round(CASE WHEN pt > 0
         |        THEN sum(n_pos) OVER (ORDER BY decile ROWS BETWEEN
         |             UNBOUNDED PRECEDING AND CURRENT ROW)::DOUBLE / pt
         |        END, 6) AS cum_capture
         |FROM g""".stripMargin,

    // EV20: retention decay — censoring-corrected pooled curve, nano
    // log points, integer OLS sums, ln2 as the shared literal
    "ev20_retention_fit" ->
      """WITH d AS (
        |  SELECT DISTINCT user_id,
        |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
        |  FROM events),
        |ch AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY 1),
        |rc AS (
        |  SELECT cohort_day,
        |    date_diff('day', cohort_day, day) AS day_offset,
        |    count(*) AS n_users
        |  FROM d JOIN ch USING (user_id) GROUP BY 1, 2),
        |sz AS (SELECT cohort_day, n_users AS csize FROM rc
        |       WHERE day_offset = 0),
        |mx AS (SELECT max(cohort_day + day_offset::INT) AS mxd FROM rc),
        |den AS (
        |  SELECT o.d AS day_offset, CAST(sum(sz.csize) AS BIGINT) AS cap
        |  FROM sz, mx, (SELECT unnest(range(1, 31)) AS d) o
        |  WHERE date_diff('day', sz.cohort_day, mx.mxd) >= o.d
        |  GROUP BY 1),
        |ac AS (
        |  SELECT day_offset, CAST(sum(n_users) AS BIGINT) AS act
        |  FROM rc WHERE day_offset BETWEEN 1 AND 30 GROUP BY 1),
        |pts AS (
        |  SELECT den.day_offset AS x,
        |    CAST(round(ln(ac.act::DOUBLE / den.cap::DOUBLE) * 1e9)
        |      AS BIGINT) AS y
        |  FROM den JOIN ac USING (day_offset)
        |  WHERE den.cap > 0 AND ac.act > 0),
        |ag AS (
        |  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x::HUGEINT * x) AS sxx, sum(x::HUGEINT * y) AS sxy
        |  FROM pts),
        |fin AS (
        |  SELECT n,
        |    CASE WHEN n >= 2 AND n * sxx - sx * sx <> 0
        |         THEN -((n * sxy - sx * sy)::DOUBLE
        |            / (n * sxx - sx * sx)::DOUBLE / 1e9) END AS lambda
        |  FROM ag)
        |SELECT CAST(n AS BIGINT) AS n_points,
        |  round(lambda, 6) + 0.0 AS lambda,
        |  round(CASE WHEN lambda > 0 THEN 0.6931471805599453 / lambda END,
        |        6) + 0.0 AS half_life_days
        |FROM fin""".stripMargin,

    // ML23: DeLong — half-count placements over the score histogram,
    // HUGEINT moments, one double division per output term
    "ml23_auc_delong" ->
      s"""WITH $panelCte,
         |pr AS (
         |  SELECT least(1.0::DOUBLE, round(close / 60000.0, 1)) AS s,
         |         CASE WHEN close >= 22000 THEN 1 ELSE 0 END AS y
         |  FROM panel),
         |h AS (
         |  SELECT s, CAST(sum(y) AS BIGINT) AS cp,
         |         CAST(sum(1 - y) AS BIGINT) AS cn
         |  FROM pr GROUP BY 1),
         |pl AS (
         |  SELECT cp, cn,
         |    coalesce(sum(cn) OVER (ORDER BY s
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS nb,
         |    coalesce(sum(cp) OVER (ORDER BY s
         |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0)
         |      AS pa
         |  FROM h),
         |ag AS (
         |  SELECT CAST(sum(cp) AS BIGINT) AS n_pos,
         |    CAST(sum(cn) AS BIGINT) AS n_neg,
         |    sum(cp::HUGEINT * (nb * 2 + cn)) AS s10,
         |    sum(cp::HUGEINT * (nb * 2 + cn) * (nb * 2 + cn)) AS ss10,
         |    sum(cn::HUGEINT * (pa * 2 + cp)) AS s01,
         |    sum(cn::HUGEINT * (pa * 2 + cp) * (pa * 2 + cp)) AS ss01
         |  FROM pl),
         |fin AS (
         |  SELECT n_pos, n_neg,
         |    s10::DOUBLE / (n_pos::DOUBLE * n_neg::DOUBLE * 2.0) AS auc,
         |    CASE WHEN n_pos >= 2 AND n_neg >= 2 THEN
         |      sqrt(greatest(
         |        ((ss10::DOUBLE - s10::DOUBLE * s10::DOUBLE / n_pos)
         |          / (n_pos - 1) / (n_neg::DOUBLE * n_neg * 4.0)) / n_pos
         |        + ((ss01::DOUBLE - s01::DOUBLE * s01::DOUBLE / n_neg)
         |          / (n_neg - 1) / (n_pos::DOUBLE * n_pos * 4.0)) / n_neg,
         |        0.0)) END AS se
         |  FROM ag)
         |SELECT n_pos, n_neg, round(auc, 6) AS auc, round(se, 6) AS se,
         |  round(greatest(0.0, auc - 1.959964 * se), 6) + 0.0 AS ci_lo,
         |  round(least(1.0, auc + 1.959964 * se), 6) AS ci_hi
         |FROM fin""".stripMargin,

    // ML28: per-segment AUC — the ml23 half-count algebra partitioned
    // by segment
    "ml28_auc_segments" ->
      s"""WITH $panelCte,
         |pr AS (
         |  SELECT sid % 3 AS segment,
         |         least(1.0::DOUBLE, round(close / 60000.0, 1)) AS s,
         |         CASE WHEN close >= 22000 THEN 1 ELSE 0 END AS y
         |  FROM panel),
         |h AS (
         |  SELECT segment, s, CAST(sum(y) AS BIGINT) AS cp,
         |         CAST(sum(1 - y) AS BIGINT) AS cn
         |  FROM pr GROUP BY 1, 2),
         |pl AS (
         |  SELECT segment, cp, cn,
         |    coalesce(sum(cn) OVER (PARTITION BY segment ORDER BY s
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS nb
         |  FROM h),
         |ag AS (
         |  SELECT segment, CAST(sum(cp) AS BIGINT) AS n_pos,
         |    CAST(sum(cn) AS BIGINT) AS n_neg,
         |    sum(cp::HUGEINT * (nb * 2 + cn)) AS s10
         |  FROM pl GROUP BY 1)
         |SELECT segment, n_pos, n_neg,
         |  round(CASE WHEN n_pos > 0 AND n_neg > 0
         |        THEN s10::DOUBLE / (n_pos::DOUBLE * n_neg::DOUBLE * 2.0)
         |        END, 6) AS auc
         |FROM ag""".stripMargin,

    // ML16: Cohen's kappa — exact-integer observed/expected agreement,
    // one division
    "ml16_kappa" ->
      s"""WITH $panelCte,
         |pr AS (
         |  SELECT CAST(close >= 22000 AS BIGINT) AS a,
         |    CAST(least(1.0::DOUBLE, round(close / 60000.0, 1)) >= 0.5
         |      AS BIGINT) AS b
         |  FROM panel),
         |tot AS (
         |  SELECT count(*)::BIGINT AS n,
         |    CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS agree
         |  FROM pr),
         |m1 AS (SELECT a AS k, count(*)::HUGEINT AS n1 FROM pr GROUP BY 1),
         |m2 AS (SELECT b AS k, count(*)::HUGEINT AS n2 FROM pr GROUP BY 1),
         |p AS (SELECT coalesce(sum(n1 * n2), 0) AS pe2
         |      FROM m1 JOIN m2 USING (k))
         |SELECT n, agree,
         |  round(CASE WHEN CAST(n AS HUGEINT) * n <> pe2
         |             THEN (CAST(n AS HUGEINT) * agree - pe2)::DOUBLE
         |                / (CAST(n AS HUGEINT) * n - pe2)::DOUBLE END, 6)
         |    AS kappa
         |FROM tot, p""".stripMargin,

    "j11_salted_join" ->
      s"""SELECT s_nationkey,
         |  CAST(sum(${c("l_extendedprice")}) AS BIGINT) AS rev_cents,
         |  count(*) AS n
         |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         |GROUP BY s_nationkey""".stripMargin,

    // EV26: same md5 arms, same histogram-rank deciles, same
    // cumulative Qini expression
    "ev26_qini" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c,
        |    CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS s
        |  FROM events GROUP BY 1),
        |put AS (
        |  SELECT *, CAST(CAST(concat('0x',
        |    substr(md5(concat_ws('|', 'uplift', user_id)), 1, 8))
        |    AS BIGINT) AS DOUBLE) / 4294967296.0 >= 0.5 AS t
        |  FROM pu),
        |h AS (SELECT s, count(*)::BIGINT AS hc FROM pu GROUP BY 1),
        |hh AS (
        |  SELECT s, CAST(sum(hc) OVER (ORDER BY s DESC
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) - hc AS lo
        |  FROM h),
        |n AS (SELECT count(*)::BIGINT AS N FROM pu),
        |rk AS (
        |  SELECT t, c, lo + row_number() OVER (PARTITION BY put.s
        |    ORDER BY user_id) AS rank
        |  FROM put JOIN hh ON put.s = hh.s),
        |b AS (
        |  SELECT (rank - 1) * 10 // (SELECT N FROM n) + 1 AS decile, t, c
        |  FROM rk),
        |d AS (
        |  SELECT decile,
        |    CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS n_treated,
        |    CAST(sum(CASE WHEN NOT t THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_control,
        |    CAST(sum(CASE WHEN t THEN c ELSE 0 END) AS BIGINT)
        |      AS conv_treated,
        |    CAST(sum(CASE WHEN NOT t THEN c ELSE 0 END) AS BIGINT)
        |      AS conv_control
        |  FROM b GROUP BY 1),
        |cm AS (
        |  SELECT *,
        |    CAST(sum(n_treated) OVER w AS BIGINT) AS cnt,
        |    CAST(sum(n_control) OVER w AS BIGINT) AS cnc,
        |    CAST(sum(conv_treated) OVER w AS BIGINT) AS cct,
        |    CAST(sum(conv_control) OVER w AS BIGINT) AS ccc
        |  FROM d WINDOW w AS (ORDER BY decile ROWS UNBOUNDED PRECEDING))
        |SELECT decile, n_treated, n_control, conv_treated, conv_control,
        |  round(CASE WHEN cnc > 0
        |    THEN cct::DOUBLE - ccc::DOUBLE * (cnt::DOUBLE / cnc) END, 6)
        |    AS qini
        |FROM cm""".stripMargin,

    // W31: same event-time range frame — DuckDB RANGE BETWEEN over
    // epoch micros with the identical inclusive bounds
    "w31_time_range_window" ->
      """WITH r AS (
        |  SELECT event_id, user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |    CAST(round(value*100) AS BIGINT) AS v
        |  FROM events)
        |SELECT event_id, user_id,
        |  CAST(sum(v) OVER (PARTITION BY user_id ORDER BY us
        |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS hour_sum_cents,
        |  CAST(count(*) OVER (PARTITION BY user_id ORDER BY us
        |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS hour_n
        |FROM r""".stripMargin,

    // Q5: the star join recomputed declaratively; per-row revenue
    // rounded to cents BEFORE the sum (order-free)
    "q5_nation_revenue" ->
      """SELECT r_name, n_name,
        |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
        |    AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  count(*)::BIGINT AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |  AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2""".stripMargin,

    // FZ1: DuckDB's own jaro_winkler_similarity scores the same
    // blocked pairs — cross-implementation, not a transcribed formula
    "fz1_fuzzy_match" ->
      """WITH names AS (
        |  SELECT DISTINCT p_name FROM part),
        |dirty AS (
        |  SELECT DISTINCT CASE WHEN length(p_name) % 2 = 1
        |    THEN substr(p_name, 1, length(p_name) - 1)
        |    ELSE p_name END AS dirty_name
        |  FROM names)
        |SELECT n.p_name AS clean_name, d.dirty_name,
        |  round(jaro_winkler_similarity(n.p_name, d.dirty_name), 6) AS jw
        |FROM names n JOIN dirty d
        |  ON split_part(n.p_name, ' ', 1) = split_part(d.dirty_name, ' ', 1)
        |WHERE round(jaro_winkler_similarity(n.p_name, d.dirty_name), 6)
        |  >= 0.85""".stripMargin,

    // ER2: reciprocal best match — fz1's candidate scores, rank-1 per
    // side by (jw DESC, partner ASC), mutual pairs only (the window
    // ranks are a different algorithm from the engine's min_by)
    "er2_reciprocal_best" ->
      """WITH names AS (
        |  SELECT DISTINCT p_name FROM part),
        |dirty AS (
        |  SELECT DISTINCT CASE WHEN length(p_name) % 2 = 1
        |    THEN substr(p_name, 1, length(p_name) - 1)
        |    ELSE p_name END AS dirty_name
        |  FROM names),
        |sc AS (
        |  SELECT n.p_name AS l_id, d.dirty_name AS r_id,
        |    round(jaro_winkler_similarity(n.p_name, d.dirty_name), 6) AS jw
        |  FROM names n JOIN dirty d
        |    ON split_part(n.p_name, ' ', 1) = split_part(d.dirty_name, ' ', 1)
        |  WHERE round(jaro_winkler_similarity(n.p_name, d.dirty_name), 6)
        |    >= 0.85),
        |rl AS (
        |  SELECT *, row_number() OVER (PARTITION BY l_id
        |    ORDER BY jw DESC, r_id) AS kl
        |  FROM sc),
        |rr AS (
        |  SELECT l_id, r_id, row_number() OVER (PARTITION BY r_id
        |    ORDER BY jw DESC, l_id) AS kr
        |  FROM sc)
        |SELECT rl.l_id AS clean_name, rl.r_id AS dirty_name, rl.jw
        |FROM rl JOIN rr ON rl.l_id = rr.l_id AND rl.r_id = rr.r_id
        |WHERE rl.kl = 1 AND rr.kr = 1""".stripMargin,

    // A15: same cumulative-weight crossing rule, same total order
    "a15_weighted_median" ->
      """WITH r AS (
        |  SELECT l_returnflag AS flag,
        |    CAST(round(l_extendedprice*100) AS BIGINT) AS v,
        |    CAST(round(l_quantity) AS BIGINT) AS wt,
        |    l_orderkey AS ok, l_linenumber AS ln
        |  FROM lineitem),
        |c AS (
        |  SELECT *,
        |    CAST(sum(wt) OVER (PARTITION BY flag ORDER BY v, ok, ln
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumw,
        |    CAST(sum(wt) OVER (PARTITION BY flag) AS BIGINT) AS totw
        |  FROM r)
        |SELECT flag, CAST(min(v) AS BIGINT) AS wmedian_cents,
        |  CAST(max(totw) AS BIGINT) AS total_weight
        |FROM c WHERE cumw * 2 >= totw
        |GROUP BY flag""".stripMargin,

    // DQ2: the oracle rebuilds the simulated new snapshot and
    // classifies with the same full-outer + null-safe equality
    "dq2_snapshot_diff" ->
      """WITH old AS (
        |  SELECT o_orderkey,
        |    CAST(round(o_totalprice*100) AS BIGINT) AS price_cents,
        |    o_orderstatus
        |  FROM orders),
        |new AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 13 = 0 THEN price_cents + 100
        |         ELSE price_cents END AS price_cents,
        |    o_orderstatus
        |  FROM old WHERE o_orderkey % 29 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, price_cents, o_orderstatus
        |  FROM old WHERE o_orderkey % 31 = 0),
        |d AS (
        |  SELECT coalesce(old.o_orderkey, new.o_orderkey) AS k,
        |    CASE WHEN old.o_orderkey IS NULL THEN 'added'
        |         WHEN new.o_orderkey IS NULL THEN 'removed'
        |         WHEN old.price_cents IS NOT DISTINCT FROM new.price_cents
        |          AND old.o_orderstatus IS NOT DISTINCT FROM new.o_orderstatus
        |           THEN 'unchanged'
        |         ELSE 'changed' END AS status
        |  FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey)
        |SELECT status, count(*)::BIGINT AS n_keys,
        |  CAST(sum(k) AS BIGINT) AS key_checksum
        |FROM d GROUP BY status""".stripMargin,

    // ML29: the SAME moment sums and the SAME Cramer/R² expression
    // shape (identical IEEE tree over identical exact integers)
    "ml29_ols_normal" ->
      """WITH m AS (
        |  SELECT count(*)::BIGINT AS n,
        |    CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
        |    CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x1*x1) AS BIGINT) AS s11,
        |    CAST(sum(x1*x2) AS BIGINT) AS s12,
        |    CAST(sum(x2*x2) AS BIGINT) AS s22,
        |    CAST(sum(x1*y) AS BIGINT) AS s1y,
        |    CAST(sum(x2*y) AS BIGINT) AS s2y,
        |    CAST(sum(y*y) AS BIGINT) AS syy
        |  FROM (
        |    SELECT CAST(round(l_extendedprice) AS BIGINT) AS y,
        |      CAST(round(l_quantity) AS BIGINT) AS x1,
        |      CAST(round(l_discount*100) AS BIGINT) AS x2
        |    FROM lineitem)),
        |d AS (
        |  SELECT n, n::DOUBLE AS nd, s1::DOUBLE AS s1, s2::DOUBLE AS s2,
        |    sy::DOUBLE AS sy, s11::DOUBLE AS s11, s12::DOUBLE AS s12,
        |    s22::DOUBLE AS s22, s1y::DOUBLE AS s1y, s2y::DOUBLE AS s2y,
        |    syy::DOUBLE AS syy
        |  FROM m),
        |dets AS (
        |  SELECT *,
        |    nd*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2)
        |      + s2*(s1*s12 - s11*s2) AS det,
        |    sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y)
        |      + s2*(s1y*s12 - s11*s2y) AS det0,
        |    nd*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2)
        |      + s2*(s1*s2y - s1y*s2) AS det1,
        |    nd*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2)
        |      + sy*(s1*s12 - s11*s2) AS det2
        |  FROM d),
        |bs AS (
        |  SELECT *, det0/det AS b0, det1/det AS b1, det2/det AS b2
        |  FROM dets)
        |SELECT n,
        |  round(b0, 6) AS beta0, round(b1, 6) AS beta1,
        |  round(b2, 6) AS beta2,
        |  round(1.0 - (syy - 2.0*(b0*sy + b1*s1y + b2*s2y)
        |    + (b0*b0*nd + b1*b1*s11 + b2*b2*s22
        |       + 2.0*b0*b1*s1 + 2.0*b0*b2*s2 + 2.0*b1*b2*s12))
        |    / (syy - sy*sy/nd), 6) AS r2
        |FROM bs""".stripMargin,

    // ML43: closed-form linear SHAP — unrounded Cramer betas, exact
    // integer feature means, 1e-6-quantized absolute deviations
    "ml43_linear_shap" ->
      """WITH base AS (
        |  SELECT CAST(round(l_extendedprice) AS BIGINT) AS y,
        |    CAST(round(l_quantity) AS BIGINT) AS x1,
        |    CAST(round(l_discount*100) AS BIGINT) AS x2
        |  FROM lineitem),
        |m AS (
        |  SELECT count(*)::BIGINT AS n,
        |    CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
        |    CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x1*x1) AS BIGINT) AS s11,
        |    CAST(sum(x1*x2) AS BIGINT) AS s12,
        |    CAST(sum(x2*x2) AS BIGINT) AS s22,
        |    CAST(sum(x1*y) AS BIGINT) AS s1y,
        |    CAST(sum(x2*y) AS BIGINT) AS s2y
        |  FROM base),
        |d AS (
        |  SELECT n::DOUBLE AS nd, s1::DOUBLE AS s1, s2::DOUBLE AS s2,
        |    sy::DOUBLE AS sy, s11::DOUBLE AS s11, s12::DOUBLE AS s12,
        |    s22::DOUBLE AS s22, s1y::DOUBLE AS s1y, s2y::DOUBLE AS s2y
        |  FROM m),
        |dets AS (
        |  SELECT *,
        |    nd*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2)
        |      + s2*(s1*s12 - s11*s2) AS det,
        |    nd*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2)
        |      + s2*(s1*s2y - s1y*s2) AS det1,
        |    nd*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2)
        |      + sy*(s1*s12 - s11*s2) AS det2
        |  FROM d),
        |bs AS (SELECT det1/det AS b1, det2/det AS b2 FROM dets),
        |s AS (
        |  SELECT count(*)::BIGINT AS cnt,
        |    CAST(sum(CAST(round(abs(x1::DOUBLE - s1::DOUBLE / n::DOUBLE)
        |      * 1e6) AS BIGINT)) AS HUGEINT) AS m1,
        |    CAST(sum(CAST(round(abs(x2::DOUBLE - s2::DOUBLE / n::DOUBLE)
        |      * 1e6) AS BIGINT)) AS HUGEINT) AS m2
        |  FROM base CROSS JOIN m),
        |f AS (
        |  SELECT b1, b2,
        |    abs(b1) * (m1::DOUBLE / 1e6 / cnt) AS mas1,
        |    abs(b2) * (m2::DOUBLE / 1e6 / cnt) AS mas2
        |  FROM s CROSS JOIN bs)
        |SELECT 'x_qty' AS feature, round(b1, 6) AS beta,
        |  round(mas1, 6) AS mean_abs_shap,
        |  round(CASE WHEN mas1 + mas2 <> 0 THEN mas1 / (mas1 + mas2) END, 6)
        |    + 0.0 AS share
        |FROM f
        |UNION ALL
        |SELECT 'x_disc_pct', round(b2, 6), round(mas2, 6),
        |  round(CASE WHEN mas1 + mas2 <> 0 THEN mas2 / (mas1 + mas2) END, 6)
        |    + 0.0
        |FROM f""".stripMargin,

    // ML42: the same Cramer betas UNROUNDED, the same bucket-rotation
    // permutation (md5 unit hash → bucket, lead + first_value wrap),
    // and the same 1e-4-quantized exact residual sums — every IEEE
    // expression tree spelled with the engine's association order
    "ml42_perm_importance" ->
      """WITH base AS (
        |  SELECT CAST(round(l_extendedprice) AS BIGINT) AS y,
        |    CAST(round(l_quantity) AS BIGINT) AS x1,
        |    CAST(round(l_discount*100) AS BIGINT) AS x2,
        |    l_orderkey, l_linenumber, l_partkey, l_suppkey
        |  FROM lineitem),
        |m AS (
        |  SELECT count(*)::BIGINT AS n,
        |    CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
        |    CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x1*x1) AS BIGINT) AS s11,
        |    CAST(sum(x1*x2) AS BIGINT) AS s12,
        |    CAST(sum(x2*x2) AS BIGINT) AS s22,
        |    CAST(sum(x1*y) AS BIGINT) AS s1y,
        |    CAST(sum(x2*y) AS BIGINT) AS s2y
        |  FROM base),
        |d AS (
        |  SELECT n::DOUBLE AS nd, s1::DOUBLE AS s1, s2::DOUBLE AS s2,
        |    sy::DOUBLE AS sy, s11::DOUBLE AS s11, s12::DOUBLE AS s12,
        |    s22::DOUBLE AS s22, s1y::DOUBLE AS s1y, s2y::DOUBLE AS s2y
        |  FROM m),
        |dets AS (
        |  SELECT *,
        |    nd*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2)
        |      + s2*(s1*s12 - s11*s2) AS det,
        |    sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y)
        |      + s2*(s1y*s12 - s11*s2y) AS det0,
        |    nd*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2)
        |      + s2*(s1*s2y - s1y*s2) AS det1,
        |    nd*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2)
        |      + sy*(s1*s12 - s11*s2) AS det2
        |  FROM d),
        |bs AS (
        |  SELECT det0/det AS b0, det1/det AS b1, det2/det AS b2 FROM dets),
        |p AS (
        |  SELECT y, x1, x2,
        |    coalesce(lead(x1) OVER w, first_value(x1) OVER wf) AS x1p,
        |    coalesce(lead(x2) OVER w, first_value(x2) OVER wf) AS x2p
        |  FROM (
        |    SELECT *, CAST(floor(CAST(CAST(concat('0x',
        |      substr(md5(concat_ws('|', 'perm', concat_ws('#',
        |        l_orderkey, l_linenumber, l_partkey, l_suppkey))), 1, 8))
        |      AS BIGINT) AS DOUBLE) / 4294967296.0 * 4096) AS BIGINT) AS pb
        |    FROM base)
        |  WINDOW w AS (PARTITION BY pb
        |      ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey),
        |    wf AS (PARTITION BY pb
        |      ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)),
        |s AS (
        |  SELECT count(*)::BIGINT AS n,
        |    CAST(sum(CAST(round((y::DOUBLE - (b0 + b1*x1 + b2*x2))
        |      * (y::DOUBLE - (b0 + b1*x1 + b2*x2)) * 1e4) AS BIGINT))
        |      AS HUGEINT) AS sb,
        |    CAST(sum(CAST(round((y::DOUBLE - (b0 + b1*x1p + b2*x2))
        |      * (y::DOUBLE - (b0 + b1*x1p + b2*x2)) * 1e4) AS BIGINT))
        |      AS HUGEINT) AS s1m,
        |    CAST(sum(CAST(round((y::DOUBLE - (b0 + b1*x1 + b2*x2p))
        |      * (y::DOUBLE - (b0 + b1*x1 + b2*x2p)) * 1e4) AS BIGINT))
        |      AS HUGEINT) AS s2m
        |  FROM p CROSS JOIN bs)
        |SELECT '__base' AS feature,
        |  round(sb::DOUBLE / 1e4 / n, 6) AS mse, 0.0 AS delta_mse FROM s
        |UNION ALL
        |SELECT 'x_qty', round(s1m::DOUBLE / 1e4 / n, 6),
        |  round((s1m - sb)::DOUBLE / 1e4 / n, 6) + 0.0 FROM s
        |UNION ALL
        |SELECT 'x_disc_pct', round(s2m::DOUBLE / 1e4 / n, 6),
        |  round((s2m - sb)::DOUBLE / 1e4 / n, 6) + 0.0 FROM s""".stripMargin,

    // ML30: same rank decomposition (histogram prefix + per-value tie
    // index) and the same fixed WOE/IV expression shapes
    "ml30_woe_iv" ->
      """WITH r AS (
        |  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS bad,
        |    CAST(round(l_extendedprice*100) AS BIGINT) AS v,
        |    l_orderkey, l_linenumber
        |  FROM lineitem),
        |h AS (
        |  SELECT v, count(*)::BIGINT AS c FROM r GROUP BY 1),
        |hh AS (
        |  SELECT v, CAST(sum(c) OVER (ORDER BY v
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) - c AS lo
        |  FROM h),
        |n AS (SELECT count(*)::BIGINT AS N FROM r),
        |rk AS (
        |  SELECT bad,
        |    lo + row_number() OVER (PARTITION BY r.v
        |      ORDER BY l_orderkey, l_linenumber) AS rank
        |  FROM r JOIN hh ON r.v = hh.v),
        |b AS (
        |  SELECT bad, (rank - 1) * 10 // (SELECT N FROM n) + 1 AS bin
        |  FROM rk),
        |bb AS (
        |  SELECT bin, count(*)::BIGINT AS nb,
        |    CAST(sum(bad) AS BIGINT) AS n_bad
        |  FROM b GROUP BY 1),
        |g AS (
        |  SELECT bin, nb - n_bad AS n_good, n_bad FROM bb),
        |t AS (
        |  SELECT CAST(sum(n_good) AS BIGINT) AS G,
        |    CAST(sum(n_bad) AS BIGINT) AS B FROM g)
        |SELECT bin, n_good, n_bad,
        |  round(CASE WHEN n_good > 0 AND n_bad > 0
        |    THEN ln((n_good::DOUBLE / G) / (n_bad::DOUBLE / B)) END, 6)
        |    AS woe,
        |  round((n_good::DOUBLE / G - n_bad::DOUBLE / B) *
        |    CASE WHEN n_good > 0 AND n_bad > 0
        |      THEN ln((n_good::DOUBLE / G) / (n_bad::DOUBLE / B)) END, 6)
        |    AS iv_term
        |FROM g, t""".stripMargin,

    // ML31: ml29's moments with λ added to the slope diagonal for the
    // solve; the residual uses the raw moments
    "ml31_ridge" ->
      """WITH m AS (
        |  SELECT count(*)::BIGINT AS n,
        |    CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
        |    CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x1*x1) AS BIGINT) AS s11,
        |    CAST(sum(x1*x2) AS BIGINT) AS s12,
        |    CAST(sum(x2*x2) AS BIGINT) AS s22,
        |    CAST(sum(x1*y) AS BIGINT) AS s1y,
        |    CAST(sum(x2*y) AS BIGINT) AS s2y,
        |    CAST(sum(y*y) AS BIGINT) AS syy
        |  FROM (
        |    SELECT CAST(round(l_extendedprice) AS BIGINT) AS y,
        |      CAST(round(l_quantity) AS BIGINT) AS x1,
        |      CAST(round(l_discount*100) AS BIGINT) AS x2
        |    FROM lineitem)),
        |d AS (
        |  SELECT n, n::DOUBLE AS nd, s1::DOUBLE AS s1, s2::DOUBLE AS s2,
        |    sy::DOUBLE AS sy,
        |    (s11 + 10000000)::DOUBLE AS s11, s12::DOUBLE AS s12,
        |    (s22 + 10000000)::DOUBLE AS s22,
        |    s11::DOUBLE AS r11, s22::DOUBLE AS r22,
        |    s1y::DOUBLE AS s1y, s2y::DOUBLE AS s2y, syy::DOUBLE AS syy
        |  FROM m),
        |dets AS (
        |  SELECT *,
        |    nd*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2)
        |      + s2*(s1*s12 - s11*s2) AS det,
        |    sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y)
        |      + s2*(s1y*s12 - s11*s2y) AS det0,
        |    nd*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2)
        |      + s2*(s1*s2y - s1y*s2) AS det1,
        |    nd*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2)
        |      + sy*(s1*s12 - s11*s2) AS det2
        |  FROM d),
        |bs AS (
        |  SELECT *, det0/det AS b0, det1/det AS b1, det2/det AS b2
        |  FROM dets)
        |SELECT n,
        |  round(b0, 6) AS beta0, round(b1, 6) AS beta1,
        |  round(b2, 6) AS beta2,
        |  round(1.0 - (syy - 2.0*(b0*sy + b1*s1y + b2*s2y)
        |    + (b0*b0*nd + b1*b1*r11 + b2*b2*r22
        |       + 2.0*b0*b1*s1 + 2.0*b0*b2*s2 + 2.0*b1*b2*s12))
        |    / (syy - sy*sy/nd), 6) AS r2
        |FROM bs""".stripMargin,

    // ML32: the same moment row crossed with the λ list, identical
    // per-λ expressions
    "ml32_ridge_path" ->
      """WITH m AS (
        |  SELECT count(*)::BIGINT AS n,
        |    CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
        |    CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x1*x1) AS BIGINT) AS s11,
        |    CAST(sum(x1*x2) AS BIGINT) AS s12,
        |    CAST(sum(x2*x2) AS BIGINT) AS s22,
        |    CAST(sum(x1*y) AS BIGINT) AS s1y,
        |    CAST(sum(x2*y) AS BIGINT) AS s2y,
        |    CAST(sum(y*y) AS BIGINT) AS syy
        |  FROM (
        |    SELECT CAST(round(l_extendedprice) AS BIGINT) AS y,
        |      CAST(round(l_quantity) AS BIGINT) AS x1,
        |      CAST(round(l_discount*100) AS BIGINT) AS x2
        |    FROM lineitem)),
        |ml AS (
        |  SELECT m.*, CAST(l AS BIGINT) AS lambda
        |  FROM m, unnest([0, 10000000, 100000000]) AS t(l)),
        |d AS (
        |  SELECT n, lambda, n::DOUBLE AS nd, s1::DOUBLE AS s1,
        |    s2::DOUBLE AS s2, sy::DOUBLE AS sy,
        |    (s11 + lambda)::DOUBLE AS s11, s12::DOUBLE AS s12,
        |    (s22 + lambda)::DOUBLE AS s22,
        |    s11::DOUBLE AS r11, s22::DOUBLE AS r22,
        |    s1y::DOUBLE AS s1y, s2y::DOUBLE AS s2y, syy::DOUBLE AS syy
        |  FROM ml),
        |dets AS (
        |  SELECT *,
        |    nd*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2)
        |      + s2*(s1*s12 - s11*s2) AS det,
        |    sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y)
        |      + s2*(s1y*s12 - s11*s2y) AS det0,
        |    nd*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2)
        |      + s2*(s1*s2y - s1y*s2) AS det1,
        |    nd*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2)
        |      + sy*(s1*s12 - s11*s2) AS det2
        |  FROM d),
        |bs AS (
        |  SELECT *, det0/det AS b0, det1/det AS b1, det2/det AS b2
        |  FROM dets)
        |SELECT lambda, n,
        |  round(b0, 6) AS beta0, round(b1, 6) AS beta1,
        |  round(b2, 6) AS beta2,
        |  round(1.0 - (syy - 2.0*(b0*sy + b1*s1y + b2*s2y)
        |    + (b0*b0*nd + b1*b1*r11 + b2*b2*r22
        |       + 2.0*b0*b1*s1 + 2.0*b0*b2*s2 + 2.0*b1*b2*s12))
        |    / (syy - sy*sy/nd), 6) AS r2
        |FROM bs""".stripMargin,

    // SK5: exact overlap in SQL; the sketch estimate is engine-side
    // and the contract boolean must come out TRUE (the sk1 discipline)
    "sk5_hll_overlap" ->
      """WITH ut AS (
        |  SELECT DISTINCT user_id AS u, event_type AS t FROM events),
        |types AS (SELECT DISTINCT event_type AS t FROM events),
        |pairs AS (
        |  SELECT a.t AS type_a, b.t AS type_b
        |  FROM types a JOIN types b ON a.t < b.t),
        |ov AS (
        |  SELECT x.t AS type_a, y.t AS type_b, count(*)::BIGINT AS exact_overlap
        |  FROM ut x JOIN ut y ON x.u = y.u AND x.t < y.t
        |  GROUP BY 1, 2)
        |SELECT p.type_a, p.type_b,
        |  coalesce(ov.exact_overlap, 0) AS exact_overlap,
        |  TRUE AS approx_ok
        |FROM pairs p LEFT JOIN ov
        |  ON p.type_a = ov.type_a AND p.type_b = ov.type_b""".stripMargin,

    // SK4: Count-Min rebuilt in SQL — same md5 buckets, same min-over-
    // rows estimate, same all-integer contract arithmetic
    // EV33: depth by EXISTS over explicit chains — the definitional
    // spec; agreement proves the engine's greedy anchor maximization
    // finds every feasible chain (43.2B µs = 12 h window)
    "ev33_window_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
        |  WHERE event_type IN ('view', 'click', 'purchase')),
        |d3 AS (
        |  SELECT DISTINCT v.user_id FROM e v
        |  JOIN e c ON c.user_id = v.user_id AND c.event_type = 'click'
        |    AND v.event_type = 'view' AND v.us < c.us
        |  JOIN e p ON p.user_id = v.user_id AND p.event_type = 'purchase'
        |    AND c.us < p.us AND p.us - v.us <= 43200000000),
        |d2 AS (
        |  SELECT DISTINCT v.user_id FROM e v
        |  JOIN e c ON c.user_id = v.user_id AND c.event_type = 'click'
        |    AND v.event_type = 'view' AND v.us < c.us
        |    AND c.us - v.us <= 43200000000),
        |d1 AS (SELECT DISTINCT user_id FROM e WHERE event_type = 'view'),
        |depth AS (
        |  SELECT d1.user_id,
        |    CASE WHEN d3.user_id IS NOT NULL THEN 3
        |         WHEN d2.user_id IS NOT NULL THEN 2 ELSE 1 END AS depth
        |  FROM d1
        |  LEFT JOIN d2 ON d1.user_id = d2.user_id
        |  LEFT JOIN d3 ON d1.user_id = d3.user_id)
        |SELECT depth::BIGINT AS depth, count(*)::BIGINT AS n_users
        |FROM depth GROUP BY 1""".stripMargin,

    // SK6: same md5 bit positions replayed — the filter AND its false
    // positives are deterministic, so the boolean column hash-matches
    "sk6_bloom" ->
      """WITH ins AS (SELECT DISTINCT o_custkey AS custkey FROM orders),
        |bits AS (
        |  SELECT DISTINCT CAST(CAST(concat('0x',
        |      substr(md5(concat_ws('|', 'bloom' || i, custkey)), 1, 8))
        |      AS BIGINT) % 4096 AS BIGINT) AS bit
        |  FROM ins, unnest([0, 1, 2, 3]) AS t(i)),
        |fan AS (
        |  SELECT c_custkey AS custkey, CAST(CAST(concat('0x',
        |      substr(md5(concat_ws('|', 'bloom' || i, c_custkey)), 1, 8))
        |      AS BIGINT) % 4096 AS BIGINT) AS bit
        |  FROM customer, unnest([0, 1, 2, 3]) AS t(i))
        |SELECT custkey,
        |  CAST(sum(CASE WHEN b.bit2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) = 4
        |    AS maybe_present
        |FROM fan LEFT JOIN (SELECT bit, bit AS bit2 FROM bits) b USING (bit)
        |GROUP BY 1""".stripMargin,

    // AB4: the SAME driver-quantized integer constants — the oracle
    // never evaluates a log
    "ab4_sprt" -> {
      val (lnR1, lnR0, hi, lo) =
        graft.events.Events.sprtConstants(0.38, 0.46, 0.05, 0.2)
      s"""WITH ud AS (
         |  SELECT CAST(ts AS DATE) AS day, user_id,
         |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS conv
         |  FROM events WHERE user_id % 2 = 1
         |  GROUP BY 1, 2),
         |d AS (
         |  SELECT day, count(*)::BIGINT AS trials,
         |    CAST(sum(conv) AS BIGINT) AS conversions
         |  FROM ud GROUP BY 1),
         |c AS (
         |  SELECT day, trials, conversions,
         |    CAST(sum(conversions) OVER (ORDER BY day
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) * $lnR1 +
         |    CAST(sum(trials - conversions) OVER (ORDER BY day
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) * $lnR0 AS llr_micro
         |  FROM d)
         |SELECT day, trials, conversions, llr_micro,
         |  CASE WHEN llr_micro >= $hi THEN 'accept_h1'
         |       WHEN llr_micro <= $lo THEN 'accept_h0'
         |       ELSE 'continue' END AS decision
         |FROM c""".stripMargin
    },

    // AB3: CUPED — exact integer moments, IEEE ratio arithmetic in the
    // Spark expression order (double-cast sums, n·Sxy − Sx·Sy shapes)
    "ab3_cuped" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |                   AND ts < TIMESTAMP '2024-01-15'
        |             THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |                   AND NOT (ts < TIMESTAMP '2024-01-15')
        |             THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |g AS (
        |  SELECT count(*)::BIGINT AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM pu),
        |a AS (
        |  SELECT CAST(user_id % 2 AS INT) AS variant,
        |    count(*)::BIGINT AS n_users,
        |    CAST(sum(x) AS BIGINT) AS ax, CAST(sum(y) AS BIGINT) AS ay
        |  FROM pu GROUP BY 1),
        |m AS (
        |  SELECT a.variant, a.n_users, a.ax, a.ay,
        |    g.n::DOUBLE * g.sxy::DOUBLE - g.sx::DOUBLE * g.sy::DOUBLE AS covn,
        |    g.n::DOUBLE * g.sxx::DOUBLE - g.sx::DOUBLE * g.sx::DOUBLE AS varxn,
        |    g.n::DOUBLE * g.syy::DOUBLE - g.sy::DOUBLE * g.sy::DOUBLE AS varyn,
        |    g.sx::DOUBLE / g.n::DOUBLE AS meanx
        |  FROM a, g)
        |SELECT variant, n_users,
        |  round(ay::DOUBLE / n_users::DOUBLE, 6) AS mean_post,
        |  round(ay::DOUBLE / n_users::DOUBLE -
        |    (CASE WHEN varxn <> 0 THEN covn / varxn END) *
        |    (ax::DOUBLE / n_users::DOUBLE - meanx), 6) AS mean_adj,
        |  round(CASE WHEN varxn <> 0 THEN covn / varxn END, 6) AS theta,
        |  round(CASE WHEN varxn <> 0 AND varyn <> 0
        |        THEN covn * covn / (varxn * varyn) END, 6) AS rho_sq
        |FROM m""".stripMargin,

    "sk4_cms_contract" ->
      """WITH pk AS (
        |  SELECT user_id, count(*)::BIGINT AS exact FROM events GROUP BY 1),
        |fan AS (
        |  SELECT user_id, exact, r, CAST(CAST(concat('0x',
        |      substr(md5(concat_ws('|', 'cms' || r, user_id)), 1, 8))
        |      AS BIGINT) % 256 AS BIGINT) AS b
        |  FROM pk, unnest([0, 1, 2, 3]) AS t(r)),
        |cells AS (
        |  SELECT r, b, CAST(sum(exact) AS BIGINT) AS n
        |  FROM fan GROUP BY 1, 2),
        |est AS (
        |  SELECT user_id, CAST(min(n) AS BIGINT) AS est
        |  FROM fan JOIN cells USING (r, b)
        |  GROUP BY 1),
        |tot AS (SELECT count(*)::BIGINT AS N FROM events)
        |SELECT count(*)::BIGINT AS n_keys,
        |  CAST(sum(CASE WHEN est < exact THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_underestimates,
        |  CAST(sum(CASE WHEN (est - exact) * 256 > 2 * N THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outside_bound,
        |  CAST(max(est - exact) AS BIGINT) AS max_overestimate
        |FROM pk JOIN est USING (user_id), tot""".stripMargin,

    // MV1: the oracle computes the view FROM SCRATCH over the
    // logically-equivalent fact set (base minus retracted plus new) —
    // the engine only ever touches partials, so a hash match proves
    // the incremental algebra equals the recompute
    "mv1_incremental_view" ->
      """SELECT o_custkey, count(*)::BIGINT AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
        |    AS revenue_cents
        |FROM orders
        |WHERE (o_orderdate < TIMESTAMP '1998-01-01' AND o_orderkey % 17 <> 0)
        |   OR o_orderdate >= TIMESTAMP '1998-01-01'
        |GROUP BY 1
        |HAVING count(*) > 0""".stripMargin,

    // SKY1: dominance spelled directly as NOT EXISTS — a different
    // algorithm from the engine's level prefix-min windows
    "sky1_pareto" ->
      """WITH pts AS (
        |  SELECT l_suppkey AS sid,
        |    CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)
        |      AS revenue_cents,
        |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
        |      AS qty_units
        |  FROM lineitem GROUP BY 1)
        |SELECT sid, revenue_cents, qty_units
        |FROM pts b
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM pts a
        |  WHERE a.revenue_cents >= b.revenue_cents
        |    AND a.qty_units <= b.qty_units
        |    AND (a.revenue_cents > b.revenue_cents
        |         OR a.qty_units < b.qty_units))""".stripMargin,

    // CDC2: cdc1's compaction restricted to the AS-OF cutoff
    "cdc2_time_travel" ->
      s"""WITH r AS (
         |  SELECT user_id, event_id, event_type, ${c("value")} AS val_cents,
         |    row_number() OVER (PARTITION BY user_id
         |                       ORDER BY ts DESC, event_id DESC) AS rn
         |  FROM events
         |  WHERE CAST(ts AS TIMESTAMP) <= TIMESTAMP '2024-01-15 00:00:00')
         |SELECT user_id, event_id AS last_event_id, val_cents AS last_val_cents
         |FROM r WHERE rn = 1 AND event_type <> 'error'""".stripMargin,

    // DQ3: same trailing-week integer 2σ test — no sqrt anywhere
    "dq3_freshness" ->
      """WITH d AS (
        |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    count(*)::BIGINT AS n_rows
        |  FROM events GROUP BY 1),
        |w AS (
        |  SELECT *,
        |    count(*) OVER t AS n,
        |    CAST(sum(n_rows) OVER t AS BIGINT) AS s,
        |    CAST(sum(n_rows * n_rows) OVER t AS BIGINT) AS q
        |  FROM d WINDOW t AS (ORDER BY day ROWS BETWEEN 7 PRECEDING
        |    AND 1 PRECEDING))
        |SELECT day, n_rows,
        |  CASE WHEN n >= 3 THEN
        |    (n * n_rows - s) * (n * n_rows - s) > 4 * (n * q - s * s)
        |  END AS is_anomalous
        |FROM w""".stripMargin,

    "cdc1_snapshot" ->
      s"""WITH r AS (
         |  SELECT user_id, event_id, event_type, ${c("value")} AS val_cents,
         |    row_number() OVER (PARTITION BY user_id
         |                       ORDER BY ts DESC, event_id DESC) AS rn
         |  FROM events)
         |SELECT user_id, event_id AS last_event_id, val_cents AS last_val_cents
         |FROM r WHERE rn = 1 AND event_type <> 'error'""".stripMargin,

    "scd1_type2" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type
        |  FROM events),
        |m AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    lag(event_type) OVER w AS prev,
        |    row_number() OVER w AS rn
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id,
        |  CAST(row_number() OVER w2 AS INT) AS version,
        |  event_type AS state,
        |  ts AS valid_from,
        |  lead(ts) OVER w2 AS valid_to,
        |  lead(ts) OVER w2 IS NULL AS is_current
        |FROM m
        |WHERE rn = 1 OR prev IS DISTINCT FROM event_type
        |WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,

    // J12: scd2 replay (the scd1 oracle's lag/rn/lead) + a direct
    // BETWEEN join — the engine's bucketized equi-join must agree
    "j12_scd_join" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
        |    event_type, value
        |  FROM events),
        |m AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    lag(event_type) OVER w AS prev,
        |    row_number() OVER w AS rn
        |  FROM ev WHERE event_type <> 'purchase'
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |d AS (
        |  SELECT user_id,
        |    CAST(row_number() OVER w2 AS BIGINT) AS version,
        |    event_type AS state,
        |    ts AS valid_from,
        |    lead(ts) OVER w2 AS valid_to
        |  FROM m
        |  WHERE rn = 1 OR prev IS DISTINCT FROM event_type
        |  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |f AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS purchase_cents
        |  FROM ev WHERE event_type = 'purchase')
        |SELECT f.event_id, f.user_id, f.purchase_cents, d.state, d.version
        |FROM f JOIN d ON f.user_id = d.user_id
        |  AND f.ts >= d.valid_from
        |  AND (d.valid_to IS NULL OR f.ts < d.valid_to)""".stripMargin,

    // SK3: the exact side is ev24's brute force; the sketch side is
    // engine-internal (datasketches HLL), pinned only through the
    // hashed error-contract bool — the sk1/sk2 discipline
    "sk3_hll_rolling" ->
      """WITH spine AS (
        |  SELECT unnest(generate_series(
        |    (SELECT min(CAST(ts AS DATE)) FROM events),
        |    (SELECT max(CAST(ts AS DATE)) FROM events),
        |    INTERVAL 1 DAY))::DATE AS day)
        |SELECT s.day, count(DISTINCT e.user_id)::BIGINT AS active_users,
        |  TRUE AS approx_ok
        |FROM spine s
        |LEFT JOIN events e
        |  ON CAST(e.ts AS DATE) BETWEEN s.day - 6 AND s.day
        |GROUP BY s.day""".stripMargin,

    // QN1: quantile-normalization replay — same within-group ranks,
    // same ⌈r·N/ng⌉ target rank, same cumulative-histogram lookup
    "qn1_quantile_norm" ->
      s"""WITH r AS (
         |  SELECT event_type AS g, ${c("value")} AS v, event_id,
         |    row_number() OVER (PARTITION BY event_type
         |                       ORDER BY ${c("value")}, event_id) AS r,
         |    count(*) OVER (PARTITION BY event_type) AS ng
         |  FROM events),
         |n AS (SELECT count(*) AS n FROM events),
         |h AS (
         |  SELECT v AS hv, count(*) AS c
         |  FROM (SELECT ${c("value")} AS v FROM events) GROUP BY 1),
         |hh AS (SELECT hv, c, sum(c) OVER (ORDER BY hv) AS cum FROM h)
         |SELECT r.event_id, r.g AS event_type,
         |  CAST(r.v AS BIGINT) AS value_cents,
         |  CAST(hh.hv AS BIGINT) AS norm_cents
         |FROM r CROSS JOIN n
         |JOIN hh ON ((r.r * n.n + r.ng - 1) // r.ng) > (hh.cum - hh.c)
         |       AND ((r.r * n.n + r.ng - 1) // r.ng) <= hh.cum""".stripMargin,

    // CP1: compaction-plan replay — same size-desc cumulative packing
    "cp1_compaction_plan" ->
      """WITH f AS (
        |  SELECT l_orderkey % 500 AS file_id,
        |    count(*) * 100 AS bytes
        |  FROM lineitem GROUP BY 1),
        |p AS (
        |  SELECT bytes,
        |    sum(bytes) OVER (ORDER BY bytes DESC, file_id) AS cum
        |  FROM f)
        |SELECT CAST((cum - 1) // 400000 AS BIGINT) AS bin_id,
        |  count(*) AS n_files,
        |  CAST(sum(bytes) AS BIGINT) AS bytes,
        |  CAST(sum(bytes) AS BIGINT)::DOUBLE / 400000 AS fill_ratio
        |FROM p GROUP BY 1""".stripMargin,

    // TS1: Theil–Sen replay — same pair expansion, same (slope, xa, xb)
    // total order, same middle-order-statistic sum (only two nonzero
    // addends → FP-commutative, order-free)
    // TS2: classical decomposition — integer 7·c−Σ₇c detrending, the
    // weekday mean 1e12-quantized ONCE per cell, re-centering done as
    // sq·K−S in quantized space (exact), fixed IEEE shapes to 6dp
    "ts2_decompose" ->
      s"""WITH $panelCte,
         |r AS (
         |  SELECT sid, date, CAST(round(close * 100) AS BIGINT) AS c,
         |    CAST(sum(CAST(round(close * 100) AS BIGINT)) OVER (
         |      PARTITION BY sid ORDER BY date
         |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS s7,
         |    count(*) OVER (PARTITION BY sid ORDER BY date
         |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS k7
         |  FROM panel),
         |f AS (
         |  SELECT sid, date, c, s7, CAST(isodow(date) AS BIGINT) AS dow
         |  FROM r WHERE k7 = 7),
         |cells AS (
         |  SELECT sid, dow,
         |    CAST(round(CAST(sum(c * 7 - s7) AS BIGINT)::DOUBLE
         |      / (count(*) * 7)::DOUBLE * 1e12) AS BIGINT) AS sq
         |  FROM f GROUP BY 1, 2),
         |ps AS (
         |  SELECT sid, count(*)::BIGINT AS k, CAST(sum(sq) AS BIGINT) AS s
         |  FROM cells GROUP BY 1)
         |SELECT f.sid, f.date, c::DOUBLE / 100.0 AS close,
         |  round(s7::DOUBLE / 7.0 / 100.0, 6) AS trend,
         |  round((sq * k - s)::DOUBLE / k::DOUBLE / 1e12 / 100.0, 6)
         |    AS seasonal,
         |  round(c::DOUBLE / 100.0 - s7::DOUBLE / 7.0 / 100.0
         |    - (sq * k - s)::DOUBLE / k::DOUBLE / 1e12 / 100.0, 6)
         |    AS residual
         |FROM f
         |JOIN cells ON f.sid = cells.sid AND f.dow = cells.dow
         |JOIN ps ON f.sid = ps.sid""".stripMargin,

    // W32: AR(1) half-life — HUGEINT regression moments (Spark:
    // decimal(38,0)), one Cramer ρ division, −ln2/lnρ as a final
    // per-row transcendental, null outside (0,1)
    "w32_mean_reversion" ->
      s"""WITH $panelCte,
         |r AS (
         |  SELECT sid, CAST(round(close * 100) AS BIGINT) AS y,
         |    lag(CAST(round(close * 100) AS BIGINT), 1) OVER (
         |      PARTITION BY sid ORDER BY date) AS x
         |  FROM panel),
         |ag AS (
         |  SELECT sid, count(*)::BIGINT AS n,
         |    sum(x::HUGEINT) AS sx, sum(y::HUGEINT) AS sy,
         |    sum(x::HUGEINT * y) AS sxy, sum(x::HUGEINT * x) AS sxx
         |  FROM r WHERE x IS NOT NULL GROUP BY 1)
         |SELECT sid, n,
         |  round(CASE WHEN (n * sxx - sx * sx)::DOUBLE > 0 THEN
         |    (n * sxy - sx * sy)::DOUBLE / (n * sxx - sx * sx)::DOUBLE
         |    END, 6) AS rho,
         |  round(CASE WHEN (n * sxx - sx * sx)::DOUBLE > 0
         |      AND (n * sxy - sx * sy)::DOUBLE
         |        / (n * sxx - sx * sx)::DOUBLE > 0
         |      AND (n * sxy - sx * sy)::DOUBLE
         |        / (n * sxx - sx * sx)::DOUBLE < 1
         |    THEN -ln(2.0) / ln((n * sxy - sx * sy)::DOUBLE
         |      / (n * sxx - sx * sx)::DOUBLE)
         |    END, 6) AS half_life
         |FROM ag""".stripMargin,

    // TS4: strength — ts2's component chain re-quantized to micro
    // integers, HUGEINT raw moments (Spark: decimal(38,0)), the w26
    // variance shapes, null on constant composites
    // A17: mode by (count DESC, value ASC) rank over the bounded
    // (status, priority) grid
    "a17_group_mode" ->
      """WITH c AS (
        |  SELECT o_orderstatus, o_orderpriority, count(*)::BIGINT AS n
        |  FROM orders GROUP BY 1, 2),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY o_orderstatus
        |    ORDER BY n DESC, o_orderpriority) AS rn
        |  FROM c)
        |SELECT o_orderstatus, o_orderpriority AS mode_priority,
        |  n AS mode_n
        |FROM r WHERE rn = 1""".stripMargin,

    // DQ8: per-column census — a UNION ALL of one COUNT row per column
    "dq8_profile" -> {
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      cols.map { c =>
        s"""SELECT '$c' AS "column", count(*)::BIGINT AS n_rows,
           |  count($c)::BIGINT AS n_nonnull,
           |  count(DISTINCT $c)::BIGINT AS n_distinct
           |FROM lineitem""".stripMargin
      }.mkString("\nUNION ALL\n")
    },

    // Q22: same anti + scalar-average shape; DuckDB AVG(BIGINT) is the
    // same exact-integer-over-count double division Spark runs
    "q22_sales_opportunity" ->
      """SELECT c_nationkey,
        |  count(*)::BIGINT AS numcust,
        |  CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
        |    AS totacctbal_cents
        |FROM customer c
        |WHERE CAST(round(c_acctbal * 100) AS BIGINT) > (
        |    SELECT avg(CAST(round(c_acctbal * 100) AS BIGINT))
        |    FROM customer WHERE c_acctbal > 0.0)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey
        |      AND o.o_orderdate >= TIMESTAMP '2001-01-01')
        |GROUP BY c_nationkey""".stripMargin,

    // J15: the PLAIN (unsalted) join — hash equality proves the salted
    // plan computes the identical relation
    "j15_salted_join" ->
      """WITH fs AS (
        |  SELECT l_returnflag,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |      AS flag_cents,
        |    count(*)::BIGINT AS flag_n
        |  FROM lineitem GROUP BY 1)
        |SELECT li.l_returnflag, count(*)::BIGINT AS n,
        |  CAST(sum(CAST(round(li.l_extendedprice * 100) AS BIGINT) * fs.flag_n
        |           - fs.flag_cents) AS BIGINT) AS dev_weighted_cents
        |FROM lineitem li JOIN fs USING (l_returnflag)
        |GROUP BY 1""".stripMargin,

    // TS5: the Holt recursion replayed as a linear recursive CTE —
    // DuckDB's // floors, the engine truncates toward zero, so the
    // division is sign-split; all states exact BIGINT micros
    "ts5_holt" -> {
      def tdiv(x: String) =
        s"CASE WHEN ($x) >= 0 THEN ($x) // 10 ELSE -((-($x)) // 10) END"
      val lNext = tdiv("3 * x.y * 1000000 + 7 * (h.l + h.b)")
      val bNext = tdiv("1 * (t.l2 - t.l) + 9 * t.b")
      s"""WITH RECURSIVE daily AS (
         |  SELECT CAST(ts AS DATE) AS day, count(*)::BIGINT AS y
         |  FROM events GROUP BY 1),
         |idx AS (
         |  SELECT day, y, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i
         |  FROM daily),
         |nn AS (SELECT CAST(max(i) AS BIGINT) AS m FROM idx),
         |h(i, l, b) AS (
         |  SELECT CAST(1 AS BIGINT),
         |    (SELECT y FROM idx WHERE i = 1) * 1000000,
         |    ((SELECT y FROM idx WHERE i = 2)
         |      - (SELECT y FROM idx WHERE i = 1)) * 1000000
         |  UNION ALL
         |  SELECT t.i, t.l2, $bNext
         |  FROM (
         |    SELECT h.i + 1 AS i, h.l AS l, h.b AS b, $lNext AS l2
         |    FROM h JOIN idx x ON x.i = h.i + 1
         |    WHERE h.i < (SELECT m FROM nn)) t)
         |SELECT x.day, x.y, h.l AS level_micro, h.b AS trend_micro,
         |  lag(h.l + h.b) OVER (ORDER BY h.i) AS forecast_micro
         |FROM h JOIN idx x ON x.i = h.i""".stripMargin
    },

    "ts4_strength" ->
      s"""WITH $panelCte,
         |r AS (
         |  SELECT sid, date, CAST(round(close * 100) AS BIGINT) AS c,
         |    CAST(sum(CAST(round(close * 100) AS BIGINT)) OVER (
         |      PARTITION BY sid ORDER BY date
         |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS s7,
         |    count(*) OVER (PARTITION BY sid ORDER BY date
         |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS k7
         |  FROM panel),
         |f AS (
         |  SELECT sid, date, c, s7, CAST(isodow(date) AS BIGINT) AS dow
         |  FROM r WHERE k7 = 7),
         |cells AS (
         |  SELECT sid, dow,
         |    CAST(round(CAST(sum(c * 7 - s7) AS BIGINT)::DOUBLE
         |      / (count(*) * 7)::DOUBLE * 1e12) AS BIGINT) AS sq
         |  FROM f GROUP BY 1, 2),
         |ps AS (
         |  SELECT sid, count(*)::BIGINT AS k, CAST(sum(sq) AS BIGINT) AS s
         |  FROM cells GROUP BY 1),
         |comp AS (
         |  SELECT f.sid,
         |    CAST(round(round(s7::DOUBLE / 7.0 / 100.0, 6) * 1e6)
         |      AS BIGINT) AS tq,
         |    CAST(round(round((sq * k - s)::DOUBLE / k::DOUBLE / 1e12
         |      / 100.0, 6) * 1e6) AS BIGINT) AS sq6,
         |    CAST(round(round(c::DOUBLE / 100.0 - s7::DOUBLE / 7.0 / 100.0
         |      - (sq * k - s)::DOUBLE / k::DOUBLE / 1e12 / 100.0, 6) * 1e6)
         |      AS BIGINT) AS rq
         |  FROM f
         |  JOIN cells ON f.sid = cells.sid AND f.dow = cells.dow
         |  JOIN ps ON f.sid = ps.sid),
         |ag AS (
         |  SELECT sid, count(*)::BIGINT AS n,
         |    sum(rq::HUGEINT) AS r1, sum(rq::HUGEINT * rq) AS r2,
         |    sum((tq + rq)::HUGEINT) AS t1,
         |    sum((tq + rq)::HUGEINT * (tq + rq)) AS t2,
         |    sum((sq6 + rq)::HUGEINT) AS s1,
         |    sum((sq6 + rq)::HUGEINT * (sq6 + rq)) AS s2
         |  FROM comp GROUP BY 1)
         |SELECT sid, n,
         |  round(CASE WHEN t2::DOUBLE / n::DOUBLE
         |      - (t1::DOUBLE / n::DOUBLE) * (t1::DOUBLE / n::DOUBLE) > 0
         |    THEN greatest(0.0, 1.0 -
         |      (r2::DOUBLE / n::DOUBLE
         |        - (r1::DOUBLE / n::DOUBLE) * (r1::DOUBLE / n::DOUBLE))
         |      / (t2::DOUBLE / n::DOUBLE
         |        - (t1::DOUBLE / n::DOUBLE) * (t1::DOUBLE / n::DOUBLE)))
         |    END, 6) AS f_trend,
         |  round(CASE WHEN s2::DOUBLE / n::DOUBLE
         |      - (s1::DOUBLE / n::DOUBLE) * (s1::DOUBLE / n::DOUBLE) > 0
         |    THEN greatest(0.0, 1.0 -
         |      (r2::DOUBLE / n::DOUBLE
         |        - (r1::DOUBLE / n::DOUBLE) * (r1::DOUBLE / n::DOUBLE))
         |      / (s2::DOUBLE / n::DOUBLE
         |        - (s1::DOUBLE / n::DOUBLE) * (s1::DOUBLE / n::DOUBLE)))
         |    END, 6) AS f_seasonal
         |FROM ag""".stripMargin,

    // TS3: seasonal-naive forecast errors — integer |Δ| sums, per-row
    // sMAPE terms 1e12-quantized, flat series → null MASE
    "ts3_forecast_eval" ->
      s"""WITH $panelCte,
         |r AS (
         |  SELECT sid, CAST(round(close * 100) AS BIGINT) AS c,
         |    lag(CAST(round(close * 100) AS BIGINT), 7) OVER (
         |      PARTITION BY sid ORDER BY date) AS f,
         |    lag(CAST(round(close * 100) AS BIGINT), 1) OVER (
         |      PARTITION BY sid ORDER BY date) AS p
         |  FROM panel),
         |a AS (
         |  SELECT sid,
         |    count(f)::BIGINT AS n_eval,
         |    CAST(sum(abs(c - f)) AS BIGINT) AS e7,
         |    count(p)::BIGINT AS n1,
         |    CAST(sum(abs(c - p)) AS BIGINT) AS e1,
         |    CAST(sum(CASE WHEN f IS NOT NULL THEN
         |      CAST(round(2.0 * abs(c - f)::DOUBLE / (c + f)::DOUBLE * 1e12)
         |        AS BIGINT) ELSE 0 END) AS BIGINT) AS sm
         |  FROM r GROUP BY 1)
         |SELECT sid, n_eval,
         |  round(e7::DOUBLE / n_eval::DOUBLE / 100.0, 6) AS mae,
         |  round(CASE WHEN n1 > 0 AND e1 > 0 THEN
         |    (e7::DOUBLE / n_eval::DOUBLE) / (e1::DOUBLE / n1::DOUBLE)
         |    END, 6) AS mase,
         |  round(sm::DOUBLE / 1e12 / n_eval::DOUBLE, 6) AS smape
         |FROM a WHERE n_eval > 0""".stripMargin,

    // ML36: split-conformal — exact |error| cents, md5 calibration
    // split, ⌈(n+1)(1−α)⌉ via integer division, order statistic from
    // the cumulative histogram, integer coverage ratio
    "ml36_conformal" ->
      s"""WITH $panelCte,
         |r0 AS (
         |  SELECT sid, date, CAST(round(close * 100) AS BIGINT) AS c,
         |    lag(CAST(round(close * 100) AS BIGINT), 7) OVER (
         |      PARTITION BY sid ORDER BY date) AS f
         |  FROM panel),
         |r AS (
         |  SELECT abs(c - f) AS err,
         |    CAST(CAST(concat('0x', substr(md5(concat_ws('|', 'cf', sid,
         |      date)), 1, 8)) AS BIGINT) AS DOUBLE) / 4294967296.0 < 0.5
         |      AS cal
         |  FROM r0 WHERE f IS NOT NULL),
         |kq AS (
         |  SELECT CAST(sum(CASE WHEN cal THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_cal,
         |    CAST(sum(CASE WHEN NOT cal THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_test
         |  FROM r),
         |k2 AS (SELECT *, ((n_cal + 1) * 90 + 99) // 100 AS k FROM kq),
         |h AS (SELECT err, count(*)::BIGINT AS cnt FROM r WHERE cal
         |      GROUP BY 1),
         |hc AS (
         |  SELECT err, CAST(sum(cnt) OVER (ORDER BY err
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         |  FROM h),
         |q AS (SELECT min(err) AS q_hat_cents FROM hc, k2 WHERE cum >= k),
         |cov AS (
         |  SELECT CAST(sum(CASE WHEN err <= (SELECT q_hat_cents FROM q)
         |    THEN 1 ELSE 0 END) AS BIGINT) AS covn
         |  FROM r WHERE NOT cal)
         |SELECT CAST(10 AS DOUBLE) / 100.0 AS alpha,
         |  n_cal, n_test, k, (SELECT q_hat_cents FROM q) AS q_hat_cents,
         |  round(CASE WHEN n_test > 0 THEN
         |    coalesce((SELECT covn FROM cov), 0)::DOUBLE / n_test::DOUBLE
         |    END, 6) AS coverage
         |FROM k2""".stripMargin,

    // ML35: IPS/SNIPS — rn=1 first action (a different algorithm from
    // the engine's min-struct), md5 uniform target policy, per-action
    // 1e12-quantized terms
    "ml35_offpolicy" ->
      """WITH e AS (
        |  SELECT user_id, event_type, event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS m,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn,
        |    min(epoch_us(CAST(ts AS TIMESTAMP)))
        |      OVER (PARTITION BY user_id) AS fm
        |  FROM events),
        |pu AS (
        |  SELECT user_id,
        |    max(CASE WHEN rn = 1 THEN event_type END) AS a,
        |    max(CASE WHEN event_type = 'purchase' AND m > fm
        |        THEN 1 ELSE 0 END) AS r
        |  FROM e GROUP BY 1),
        |ac AS (
        |  SELECT a, count(*)::BIGINT AS na,
        |    row_number() OVER (ORDER BY a) AS idx
        |  FROM pu GROUP BY a),
        |kf AS (
        |  SELECT count(*)::BIGINT AS kk, CAST(sum(na) AS BIGINT) AS nu
        |  FROM ac),
        |mt AS (
        |  SELECT pu.a, pu.r
        |  FROM pu
        |  JOIN ac ON ac.idx = CAST(floor(CAST(CAST(concat('0x', substr(md5(
        |      concat_ws('|', 'pi', pu.user_id)), 1, 8)) AS BIGINT) AS DOUBLE)
        |      / 4294967296.0 * (SELECT kk FROM kf)) AS BIGINT) + 1
        |  WHERE pu.a = ac.a),
        |pa AS (
        |  SELECT mt.a, count(*)::BIGINT AS ma, CAST(sum(mt.r) AS BIGINT) AS mra
        |  FROM mt GROUP BY 1),
        |fin AS (
        |  SELECT CAST(sum(ma) AS BIGINT) AS nm,
        |    CAST(sum(CAST(round(mra::DOUBLE / na::DOUBLE * 1e12) AS BIGINT))
        |      AS BIGINT) AS ipsq,
        |    CAST(sum(CAST(round(ma::DOUBLE / na::DOUBLE * 1e12) AS BIGINT))
        |      AS BIGINT) AS wq
        |  FROM pa JOIN ac ON pa.a = ac.a)
        |SELECT (SELECT nu FROM kf) AS n_users,
        |  coalesce(nm, 0) AS n_matched,
        |  round(coalesce(ipsq, 0)::DOUBLE / 1e12, 6) AS ips,
        |  round(CASE WHEN wq > 0 THEN ipsq::DOUBLE / wq::DOUBLE END, 6)
        |    AS snips
        |FROM fin""".stripMargin,

    "ts1_theilsen" ->
      s"""WITH $panelCte,
         |pts AS (
         |  SELECT sid,
         |    CAST(date - DATE '1992-01-01' AS BIGINT) AS x,
         |    ${c("close")} AS y
         |  FROM panel WHERE sid <= 8),
         |pr AS (
         |  SELECT a.sid AS g, a.x AS xa, b.x AS xb,
         |    (b.y - a.y)::DOUBLE / (b.x - a.x)::DOUBLE AS slope
         |  FROM pts a JOIN pts b ON a.sid = b.sid AND a.x < b.x),
         |r AS (
         |  SELECT g, slope,
         |    row_number() OVER (PARTITION BY g ORDER BY slope, xa, xb) AS rn,
         |    count(*) OVER (PARTITION BY g) AS np
         |  FROM pr)
         |SELECT g AS sid, CAST(max(np) AS BIGINT) AS n_pairs,
         |  sum(slope * (CAST(rn = (np + 1) // 2 AS INT)
         |               + CAST(rn = (np + 2) // 2 AS INT))) / 2.0
         |    AS slope_cents_per_x
         |FROM r GROUP BY g""".stripMargin,

    // A14: grouping sets — DuckDB's GROUPING() bit order matches
    // grouping_id() (MSB = first listed column), verified like a9/a10
    "a14_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS rev_cents,
        |  count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
        |                        (o_orderstatus, o_orderpriority))""".stripMargin,

    "a9_rollup" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
         |  CAST(sum(${c("l_extendedprice")}) AS BIGINT) AS rev_cents,
         |  count(*) AS n
         |FROM lineitem
         |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,

    "a10_cube" ->
      s"""SELECT o_orderstatus, o_orderpriority,
         |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
         |  CAST(sum(${c("o_totalprice")}) AS BIGINT) AS total_cents,
         |  count(*) AS n
         |FROM orders
         |GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin,

    // two-level partial merge ≡ one-level aggregate exactly (integer
    // partials); the oracle uses the single-level form with the SAME
    // final per-row double expression
    "a11_merge_partials" ->
      s"""WITH p AS (SELECT l_suppkey AS sid, ${c("l_extendedprice")} AS v
         |           FROM lineitem)
         |SELECT sid, count(*) AS n,
         |  CAST(sum(v) AS BIGINT) AS sum_c,
         |  min(v) AS min_c, max(v) AS max_c,
         |  CAST(sum(v::HUGEINT * v) AS BIGINT) AS sumsq_c,
         |  (CAST(sum(v::HUGEINT * v) AS DOUBLE)
         |    - CAST(sum(v) AS DOUBLE) * CAST(sum(v) AS DOUBLE) / count(*))
         |    / (count(*) - 1) AS var_c2
         |FROM p GROUP BY sid""".stripMargin,

    // PORT3: same micro-return moments; kelly = S·n/(n·S2 − S²)·1e6 in
    // the Spark expression order
    "port3_kelly" ->
      """WITH p AS (
        |  SELECT l_suppkey AS sid, CAST(l_shipdate AS DATE) AS date,
        |    CAST(round(max(l_extendedprice) * 100) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |r AS (
        |  SELECT sid,
        |    CAST(round((c::DOUBLE / prev::DOUBLE - 1.0) * 1e6) AS BIGINT) AS r
        |  FROM (SELECT sid, c,
        |          lag(c) OVER (PARTITION BY sid ORDER BY date) AS prev
        |        FROM p) x
        |  WHERE prev IS NOT NULL AND prev <> 0),
        |m AS (
        |  SELECT sid, count(*)::BIGINT AS n_days,
        |    CAST(sum(r) AS BIGINT) AS s, CAST(sum(r * r) AS BIGINT) AS s2
        |  FROM r GROUP BY 1)
        |SELECT sid, n_days,
        |  round(s::DOUBLE / n_days::DOUBLE / 1e6, 6) AS mean_ret,
        |  round(CASE WHEN n_days::DOUBLE * s2::DOUBLE - s::DOUBLE * s::DOUBLE
        |               <> 0
        |        THEN s::DOUBLE * n_days::DOUBLE
        |          / (n_days::DOUBLE * s2::DOUBLE - s::DOUBLE * s::DOUBLE)
        |          * 1e6 END, 6) AS kelly
        |FROM m""".stripMargin,

    // W33: the same bounded 5-array sorted in SQL — list() window +
    // list_sort; median = element 3 of the sorted 5-list, exact ints
    "w33_hampel" ->
      """WITH p AS (
        |  SELECT l_suppkey AS sid, CAST(l_shipdate AS DATE) AS date,
        |    CAST(round(max(l_extendedprice) * 100) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |a AS (
        |  SELECT sid, date, c,
        |    list(c) OVER (PARTITION BY sid ORDER BY date
        |      ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS arr
        |  FROM p),
        |m AS (
        |  SELECT sid, date, c,
        |    CASE WHEN len(arr) = 5
        |         THEN list_sort(arr)[3] END AS med_cents,
        |    arr
        |  FROM a)
        |SELECT sid, date, c AS close_cents, med_cents,
        |  CASE WHEN med_cents IS NOT NULL
        |       THEN list_sort(list_transform(arr, v -> abs(v - med_cents)))[3]
        |       END AS mad_cents,
        |  CASE WHEN med_cents IS NOT NULL
        |       THEN abs(c - med_cents) >
        |         list_sort(list_transform(arr, v -> abs(v - med_cents)))[3] * 3
        |       END AS is_spike
        |FROM m""".stripMargin,

    "w27_interpolate" ->
      s"""WITH $panelCte,
         |g AS (
         |  SELECT sid, date,
         |    CASE WHEN (sid + day(date)) % 4 = 0 THEN NULL ELSE close END
         |      AS close_g
         |  FROM panel),
         |w AS (
         |  SELECT sid, date, close_g,
         |    last_value(close_g IGNORE NULLS) OVER
         |      (PARTITION BY sid ORDER BY date
         |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
         |    max(CASE WHEN close_g IS NOT NULL THEN date END) OVER
         |      (PARTITION BY sid ORDER BY date
         |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
         |    first_value(close_g IGNORE NULLS) OVER
         |      (PARTITION BY sid ORDER BY date
         |       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         |    min(CASE WHEN close_g IS NOT NULL THEN date END) OVER
         |      (PARTITION BY sid ORDER BY date
         |       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
         |  FROM g)
         |SELECT sid, date,
         |  CASE WHEN close_g IS NOT NULL THEN close_g
         |       WHEN pv IS NULL THEN nv
         |       WHEN nv IS NULL THEN pv
         |       ELSE pv + (nv - pv)
         |         * (CAST(date_diff('day', pd, date) AS DOUBLE)
         |            / date_diff('day', pd, nd))
         |  END AS filled
         |FROM w""".stripMargin,

    "prof1_columns" ->
      """SELECT 'doc_id' AS "column", count(*) AS n_rows,
        |  count(*) - count(doc_id) AS n_nulls,
        |  count(DISTINCT doc_id) AS n_distinct,
        |  min(CAST(doc_id AS VARCHAR)) AS min_str,
        |  max(CAST(doc_id AS VARCHAR)) AS max_str
        |FROM documents
        |UNION ALL
        |SELECT 'text', count(*), count(*) - count(text),
        |  count(DISTINCT text), min(text), max(text) FROM documents
        |UNION ALL
        |SELECT 'lang', count(*), count(*) - count(lang),
        |  count(DISTINCT lang), min(lang), max(lang) FROM documents
        |UNION ALL
        |SELECT 'source', count(*), count(*) - count(source),
        |  count(DISTINCT source), min(source), max(source) FROM documents
        |UNION ALL
        |SELECT 'n_chars', count(*), count(*) - count(n_chars),
        |  count(DISTINCT n_chars), min(CAST(n_chars AS VARCHAR)),
        |  max(CAST(n_chars AS VARCHAR)) FROM documents""".stripMargin,

    // the oracle pins exact counts and that the error bound HELD (the
    // boolean hashes — a drifting sketch turns the row red)
    "sk1_hll_contract" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        |  TRUE AS approx_ok
        |FROM events GROUP BY event_type""".stripMargin,

    "sk2_quantile_contract" ->
      """SELECT event_type, count(value) AS n_vals, TRUE AS approx_ok
        |FROM events GROUP BY event_type""".stripMargin,

    "a12_median_cents" ->
      s"""WITH v AS (
         |  SELECT event_type, ${c("value")} AS v, event_id,
         |    row_number() OVER (PARTITION BY event_type
         |                       ORDER BY ${c("value")}, event_id) AS rn,
         |    count(*) OVER (PARTITION BY event_type) AS n
         |  FROM events)
         |SELECT event_type, max(n) AS n,
         |  CAST(sum(v * (CAST(rn = (n + 1) // 2 AS BIGINT)
         |                + CAST(rn = (n + 2) // 2 AS BIGINT))) AS BIGINT)
         |    AS med2_cents
         |FROM v GROUP BY event_type""".stripMargin,

    // ZO1: range-normalize each dimension into 16 bits with exact
    // integer division, Morton-interleave bit-by-bit (16 bit-pairs,
    // the engine's exact shift/mask/scale arithmetic), cell = top-4
    // pairs
    "zo1_zonemap" -> {
      val interleave = (0 until 16).map(b =>
        s"(((xn >> $b) & 1) << ${2 * b}) + (((yn >> $b) & 1) << ${2 * b + 1})")
        .mkString(" + ")
      s"""WITH b AS (
         |  SELECT l_suppkey AS x,
         |    CAST(CAST(l_shipdate AS DATE) - DATE '1992-01-01' AS BIGINT) AS y
         |  FROM lineitem),
         |bounds AS (
         |  SELECT min(x) AS xlo, max(x) AS xhi, min(y) AS ylo, max(y) AS yhi
         |  FROM b),
         |n AS (
         |  SELECT x, y,
         |    (x - xlo) * 65536 // (xhi - xlo + 1) AS xn,
         |    (y - ylo) * 65536 // (yhi - ylo + 1) AS yn
         |  FROM b, bounds),
         |z AS (SELECT x, y, ($interleave) AS z FROM n)
         |SELECT z >> 24 AS cell_id, count(*) AS n_rows,
         |  min(x) AS min_x, max(x) AS max_x,
         |  CAST(min(y) AS BIGINT) AS min_y, CAST(max(y) AS BIGINT) AS max_y
         |FROM z GROUP BY 1""".stripMargin
    },

    // AD1: Hampel outliers replayed with the same doubled/quadrupled
    // integer fixed-point (med2 = 2·median cents, mad4 = 4·MAD cents;
    // flag when 2·dev2 > k·mad4) — integer comparisons only
    "ad1_mad_outliers" ->
      s"""WITH v AS (
         |  SELECT event_type AS g, ${c("value")} AS v, event_id,
         |    row_number() OVER (PARTITION BY event_type
         |                       ORDER BY ${c("value")}, event_id) AS rn,
         |    count(*) OVER (PARTITION BY event_type) AS n
         |  FROM events),
         |m AS (
         |  SELECT g, CAST(sum(v * (CAST(rn = (n + 1) // 2 AS BIGINT)
         |                          + CAST(rn = (n + 2) // 2 AS BIGINT)))
         |             AS BIGINT) AS med2
         |  FROM v GROUP BY g),
         |d AS (
         |  SELECT v.g, v.v, v.event_id, m.med2,
         |    abs(v.v * 2 - m.med2) AS dev2,
         |    row_number() OVER (PARTITION BY v.g
         |      ORDER BY abs(v.v * 2 - m.med2), v.event_id) AS rn,
         |    count(*) OVER (PARTITION BY v.g) AS n
         |  FROM v JOIN m ON v.g = m.g),
         |md AS (
         |  SELECT g, CAST(sum(dev2 * (CAST(rn = (n + 1) // 2 AS BIGINT)
         |                             + CAST(rn = (n + 2) // 2 AS BIGINT)))
         |             AS BIGINT) AS mad4
         |  FROM d GROUP BY g)
         |SELECT d.event_id, d.g AS event_type,
         |  CAST(d.v AS BIGINT) AS value_cents,
         |  d.med2 AS med2_cents,
         |  CAST(d.dev2 AS BIGINT) AS dev2_cents,
         |  md.mad4 AS mad4_cents
         |FROM d JOIN md ON d.g = md.g
         |WHERE d.dev2 * 2 > md.mad4 * 5 AND md.mad4 > 0""".stripMargin,

    // W30: winsorize replay — same all-integer rank arithmetic
    // ((n·bp + 9999) // 10000) and exact order-statistic bounds
    "w30_winsorize" ->
      s"""WITH v AS (
         |  SELECT event_type AS g, ${c("value")} AS v, event_id,
         |    row_number() OVER (PARTITION BY event_type
         |                       ORDER BY ${c("value")}, event_id) AS rn,
         |    count(*) OVER (PARTITION BY event_type) AS n
         |  FROM events),
         |b AS (
         |  SELECT g,
         |    CAST(sum(CASE WHEN rn = (n * 500 + 9999) // 10000
         |             THEN v ELSE 0 END) AS BIGINT) AS lo,
         |    CAST(sum(CASE WHEN rn = (n * 9500 + 9999) // 10000
         |             THEN v ELSE 0 END) AS BIGINT) AS hi
         |  FROM v GROUP BY 1)
         |SELECT v.event_id, v.g AS event_type,
         |  CAST(v.v AS BIGINT) AS value_cents,
         |  least(greatest(v.v, b.lo), b.hi) AS wins_cents,
         |  b.lo AS lo_cents, b.hi AS hi_cents
         |FROM v JOIN b ON v.g = b.g""".stripMargin,

    // CT1: χ² contingency replay — observed counts exact, expected =
    // row·col/total in the same double op order, per-cell term
    // micro-rounded
    // DQ7: FD discovery — one subquery per ordered pair (a genuinely
    // different plan from the engine's fused multi-countDistinct)
    "dq7_fd_discovery" -> {
      val cols = Seq("p_name", "p_brand", "p_type", "p_size")
      val pairs = for { l <- cols; r <- cols if l != r } yield
        s"""SELECT '$l' AS lhs, '$r' AS rhs,
           |  count(*)::BIGINT AS n_lhs_values,
           |  CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_violating,
           |  CASE WHEN sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) = 0
           |       THEN 1 ELSE 0 END AS holds
           |FROM (SELECT $l, count(DISTINCT $r) AS c FROM part
           |      GROUP BY 1)""".stripMargin
      pairs.mkString("\nUNION ALL\n")
    },

    // DQ6: k-anonymity — equivalence-class size histogram over the
    // quasi-identifier pair; exact integers
    // A18: exact quantiles — definitional row_number order statistic
    // at the same micro-integer ceiling rank
    "a18_quantiles_exact" ->
      """WITH e AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events),
        |n AS (SELECT event_type, count(*)::BIGINT AS n FROM e GROUP BY 1),
        |r AS (
        |  SELECT event_type, v, row_number() OVER (
        |    PARTITION BY event_type ORDER BY v) AS rn
        |  FROM e),
        |t AS (
        |  SELECT event_type, n, q,
        |    CAST((CAST(round(q * 1e6) AS BIGINT) * n + 999999) // 1000000
        |      AS BIGINT) AS k
        |  FROM n, unnest([0.5::DOUBLE, 0.9::DOUBLE, 0.99::DOUBLE]) AS u(q))
        |SELECT t.event_type, t.q, t.n, r.v AS value
        |FROM t JOIN r ON r.event_type = t.event_type AND r.rn = t.k""".stripMargin,

    // IC7: rank autocorrelation — ic1's exact-HUGEINT Spearman with a
    // per-sid lag instead of a forward return
    "ic7_rank_autocorr" ->
      s"""WITH $panelCte,
         |pv AS (
         |  SELECT sid, date, close,
         |    lag(close) OVER (PARTITION BY sid ORDER BY date) AS prev
         |  FROM panel),
         |b AS (SELECT * FROM pv WHERE close IS NOT NULL AND prev IS NOT NULL),
         |r AS (
         |  SELECT date,
         |    CAST(2*rank() OVER (PARTITION BY date ORDER BY close)
         |      + count(*) OVER (PARTITION BY date, close) - 1 AS HUGEINT) AS rx,
         |    CAST(2*rank() OVER (PARTITION BY date ORDER BY prev)
         |      + count(*) OVER (PARTITION BY date, prev) - 1 AS HUGEINT) AS ry
         |  FROM b),
         |st AS (
         |  SELECT date, count(*) AS n, sum(rx) AS sx, sum(ry) AS sy,
         |         sum(rx*rx) AS sxx, sum(ry*ry) AS syy, sum(rx*ry) AS sxy
         |  FROM r GROUP BY date)
         |SELECT date, CAST(n AS BIGINT) AS n,
         |  round(CASE WHEN n >= 2 AND n*sxx - sx*sx <> 0 AND n*syy - sy*sy <> 0
         |    THEN CAST(n*sxy - sx*sy AS DOUBLE) /
         |      sqrt(CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE))
         |    END, 6) + 0.0 AS rank_autocorr
         |FROM st""".stripMargin,

    // SK7: the KMV bottom-k replays exactly — same md5 unit hash,
    // same (k−1)/θ division over the same integers
    "sk7_kmv" ->
      """WITH h AS (
        |  SELECT DISTINCT l_returnflag,
        |    CAST(concat('0x',
        |      substr(md5(concat_ws('|', 'kmv', l_orderkey)), 1, 15))
        |      AS BIGINT) AS h
        |  FROM lineitem),
        |rk AS (
        |  SELECT l_returnflag, h, row_number() OVER (
        |    PARTITION BY l_returnflag ORDER BY h) AS rk
        |  FROM h),
        |est AS (
        |  SELECT l_returnflag, count(*)::BIGINT AS n_kept,
        |    round(CASE
        |      WHEN max(CASE WHEN rk = 256 THEN h END) IS NULL
        |        THEN CAST(count(*) AS DOUBLE)
        |      ELSE 255.0 / (max(CASE WHEN rk = 256 THEN h END)
        |        / 1152921504606846976.0) END, 6) AS estimate
        |  FROM rk WHERE rk <= 256 GROUP BY 1),
        |ex AS (
        |  SELECT l_returnflag,
        |    count(DISTINCT l_orderkey)::BIGINT AS exact_orders
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, n_kept, estimate, exact_orders,
        |  round(abs(estimate - exact_orders) / exact_orders, 6) AS rel_err
        |FROM est JOIN ex USING (l_returnflag)""".stripMargin,

    // SK8: the KMV overlap replays exactly — union bottom-k over the
    // two bottom-k sets, membership flags, the same two divisions
    "sk8_kmv_overlap" ->
      """WITH h AS (
        |  SELECT DISTINCT l_returnflag AS g,
        |    CAST(concat('0x',
        |      substr(md5(concat_ws('|', 'kmv', l_orderkey)), 1, 15))
        |      AS BIGINT) AS h
        |  FROM lineitem),
        |rk AS (
        |  SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rk
        |  FROM h),
        |sk AS (SELECT g, h FROM rk WHERE rk <= 256),
        |gs AS (SELECT DISTINCT g FROM sk),
        |pr AS (SELECT x.g AS ga, y.g AS gb FROM gs x JOIN gs y ON x.g < y.g),
        |mg AS (
        |  SELECT ga, gb, h,
        |    max(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS ina,
        |    max(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS inb
        |  FROM (
        |    SELECT pr.ga, pr.gb, sk.h, 'a' AS side
        |    FROM pr JOIN sk ON sk.g = pr.ga
        |    UNION ALL
        |    SELECT pr.ga, pr.gb, sk.h, 'b' AS side
        |    FROM pr JOIN sk ON sk.g = pr.gb)
        |  GROUP BY 1, 2, 3),
        |ub AS (
        |  SELECT *, row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS urk
        |  FROM mg),
        |es AS (
        |  SELECT ga, gb, count(*)::BIGINT AS n_kept,
        |    max(CASE WHEN urk = 256 THEN h END) AS theta,
        |    CAST(sum(CASE WHEN ina = 1 AND inb = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS rho
        |  FROM ub WHERE urk <= 256 GROUP BY 1, 2),
        |ex AS (
        |  SELECT x.g AS ga, y.g AS gb, count(*)::BIGINT AS exact_overlap
        |  FROM (SELECT DISTINCT l_returnflag AS g, l_orderkey AS o
        |        FROM lineitem) x
        |  JOIN (SELECT DISTINCT l_returnflag AS g, l_orderkey AS o
        |        FROM lineitem) y
        |    ON x.o = y.o AND x.g < y.g
        |  GROUP BY 1, 2)
        |SELECT es.ga AS group_a, es.gb AS group_b, n_kept,
        |  round(CASE WHEN theta IS NULL THEN CAST(n_kept AS DOUBLE)
        |    ELSE 255.0 / (theta / 1152921504606846976.0) END, 6)
        |    AS est_union,
        |  round(CASE WHEN theta IS NULL THEN CAST(rho AS DOUBLE)
        |    ELSE CAST(rho AS DOUBLE) / 256.0
        |      * (255.0 / (theta / 1152921504606846976.0)) END, 6)
        |    AS est_intersection,
        |  CAST(coalesce(exact_overlap, 0) AS BIGINT) AS exact_overlap
        |FROM es LEFT JOIN ex ON ex.ga = es.ga AND ex.gb = es.gb""".stripMargin,

    // DQ12: l-diversity — micro-nat-quantized entropy terms (the tx17
    // discipline), one exp + round at the end
    "dq12_ldiversity" ->
      """WITH b AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    CAST(floor(CAST(round(c_acctbal * 100) AS BIGINT) / 100000)
        |      AS BIGINT) AS balance_band
        |  FROM customer),
        |pv AS (
        |  SELECT c_nationkey, c_mktsegment, balance_band,
        |    count(*)::BIGINT AS c
        |  FROM b GROUP BY 1, 2, 3),
        |pn AS (
        |  SELECT *, sum(c) OVER (
        |    PARTITION BY c_nationkey, c_mktsegment) AS n
        |  FROM pv),
        |t AS (
        |  SELECT c_nationkey, c_mktsegment, c, n,
        |    CAST(round(-(CAST(c AS DOUBLE) / n)
        |      * ln(CAST(c AS DOUBLE) / n) * 1e6) AS BIGINT) AS tm
        |  FROM pn)
        |SELECT c_nationkey, c_mktsegment,
        |  CAST(max(n) AS BIGINT) AS class_size,
        |  count(*)::BIGINT AS distinct_l,
        |  round(exp(CAST(sum(tm) AS DOUBLE) / 1e6), 6) AS entropy_l,
        |  CASE WHEN count(*) < 3 THEN 1 ELSE 0 END AS at_risk
        |FROM t GROUP BY 1, 2""".stripMargin,

    "dq6_kanonymity" ->
      """WITH cls AS (
        |  SELECT c_nationkey, c_mktsegment, count(*)::BIGINT AS k
        |  FROM customer GROUP BY 1, 2)
        |SELECT k, count(*)::BIGINT AS n_classes,
        |  CAST(sum(k) AS BIGINT) AS n_rows,
        |  CASE WHEN k < 5 THEN 1 ELSE 0 END AS at_risk
        |FROM cls GROUP BY k""".stripMargin,

    // ML37: per-day PSI vs the first-week baseline — full literal bin
    // spine, eps-floored fractions, 1e12-quantized terms per (day, bin)
    "ml37_psi_trend" ->
      """WITH r AS (
        |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
        |    CAST(least(greatest(floor((value - 0.0) / 50.0), 0), 9)
        |      AS BIGINT) AS bin
        |  FROM events),
        |d0 AS (SELECT min(d) AS d0 FROM r),
        |base AS (
        |  SELECT bin, count(*)::BIGINT AS nb
        |  FROM r, d0 WHERE date_diff('day', d0, d) < 7 GROUP BY 1),
        |tbl AS (SELECT CAST(sum(nb) AS BIGINT) AS tbv FROM base),
        |daily AS (
        |  SELECT d, bin, count(*)::BIGINT AS na
        |  FROM r, d0 WHERE date_diff('day', d0, d) >= 7 GROUP BY 1, 2),
        |spine AS (SELECT CAST(unnest(range(0, 10)) AS BIGINT) AS bin),
        |grid AS (
        |  SELECT ds.d, s.bin,
        |    coalesce(b.nb, 0) AS nb, coalesce(dl.na, 0) AS na
        |  FROM (SELECT DISTINCT d FROM daily) ds
        |  CROSS JOIN spine s
        |  LEFT JOIN base b ON s.bin = b.bin
        |  LEFT JOIN daily dl ON ds.d = dl.d AND s.bin = dl.bin),
        |g2 AS (
        |  SELECT *, CAST(sum(na) OVER (PARTITION BY d) AS BIGINT) AS ta,
        |    (SELECT tbv FROM tbl) AS tbv
        |  FROM grid)
        |SELECT d AS day, CAST(sum(na) AS BIGINT) AS n_rows,
        |  round(CAST(sum(CAST(round(
        |    (greatest(na::DOUBLE / ta, 1e-6) - greatest(nb::DOUBLE / tbv, 1e-6))
        |    * ln(greatest(na::DOUBLE / ta, 1e-6)
        |         / greatest(nb::DOUBLE / tbv, 1e-6))
        |    * 1e12) AS BIGINT)) AS BIGINT)::DOUBLE / 1e12, 6) AS psi
        |FROM g2 GROUP BY 1""".stripMargin,

    // CL6: out-of-fold smoothed target encoding — md5 folds, exact
    // BIGINT cell/marginal sums, prior and encoding as fixed IEEE
    // shapes of those integers
    "cl6_target_encoding" ->
      """WITH c AS (
        |  SELECT event_type AS category,
        |    CAST(floor(CAST(CAST(concat('0x', substr(md5(concat_ws('|',
        |      'te', event_id)), 1, 8)) AS BIGINT) AS DOUBLE)
        |      / 4294967296.0 * 5) AS BIGINT) AS fold,
        |    CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events),
        |cells AS (
        |  SELECT category, fold, count(*)::BIGINT AS n_rows,
        |    CAST(sum(v) AS BIGINT) AS s
        |  FROM c GROUP BY 1, 2),
        |pc AS (
        |  SELECT category, CAST(sum(n_rows) AS BIGINT) AS nc,
        |    CAST(sum(s) AS BIGINT) AS sc
        |  FROM cells GROUP BY 1),
        |pf AS (
        |  SELECT fold, CAST(sum(n_rows) AS BIGINT) AS nf,
        |    CAST(sum(s) AS BIGINT) AS sf
        |  FROM cells GROUP BY 1),
        |g AS (
        |  SELECT CAST(sum(n_rows) AS BIGINT) AS ng,
        |    CAST(sum(s) AS BIGINT) AS sg
        |  FROM cells)
        |SELECT cells.category, cells.fold, cells.n_rows,
        |  round(CASE WHEN ng > nf THEN
        |    (sg - sf)::DOUBLE / (ng - nf)::DOUBLE / 100.0 END, 6) AS prior,
        |  round(CASE WHEN ng > nf THEN
        |    ((sc - s)::DOUBLE / 100.0 + 20.0 *
        |      ((sg - sf)::DOUBLE / (ng - nf)::DOUBLE / 100.0))
        |    / ((nc - n_rows)::DOUBLE + 20.0) END, 6) AS encoding
        |FROM cells
        |JOIN pc USING (category)
        |JOIN pf USING (fold), g""".stripMargin,

    // MB1: frequent pairs — DISTINCT incidence, maxBasket guard,
    // self-join pair counts (the engine's one-pass explode is the
    // different-algorithm cross-check), support vs guarded baskets
    "mb1_frequent_pairs" ->
      """WITH bi AS (
        |  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
        |  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
        |g AS (SELECT b, i, count(*) OVER (PARTITION BY b) AS nsz FROM bi),
        |ok AS (SELECT * FROM g WHERE nsz <= 1000),
        |nb AS (SELECT count(DISTINCT b)::BIGINT AS N FROM ok),
        |p AS (
        |  SELECT a.i AS item1, c.i AS item2, count(*)::BIGINT AS n
        |  FROM ok a JOIN ok c ON a.b = c.b AND a.i < c.i
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT item1, item2, n,
        |  round(n::DOUBLE / (SELECT N FROM nb)::DOUBLE, 6) AS support
        |FROM p""".stripMargin,

    // MB2: association rules both directions off the ≥3 pairs;
    // lift goes DOUBLE after the first product (BIGINT na·nc would
    // overflow past ~3e9 baskets — same shape as the engine)
    "mb2_assoc_rules" ->
      """WITH bi AS (
        |  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
        |  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
        |g AS (SELECT b, i, count(*) OVER (PARTITION BY b) AS nsz FROM bi),
        |ok AS (SELECT * FROM g WHERE nsz <= 1000),
        |nb AS (SELECT count(DISTINCT b)::BIGINT AS N FROM ok),
        |ic AS (SELECT i, count(*)::BIGINT AS ni FROM ok GROUP BY 1),
        |p AS (
        |  SELECT a.i AS item1, c.i AS item2, count(*)::BIGINT AS n
        |  FROM ok a JOIN ok c ON a.b = c.b AND a.i < c.i
        |  GROUP BY 1, 2 HAVING count(*) >= 3),
        |r AS (
        |  SELECT item1 AS antecedent, item2 AS consequent, n FROM p
        |  UNION ALL
        |  SELECT item2 AS antecedent, item1 AS consequent, n FROM p)
        |SELECT r.antecedent, r.consequent, r.n, a.ni AS n_ante,
        |  c.ni AS n_cons,
        |  round(r.n::DOUBLE / a.ni::DOUBLE, 6) AS confidence,
        |  round(r.n::DOUBLE * (SELECT N FROM nb) / a.ni / c.ni, 6) AS lift
        |FROM r
        |JOIN ic a ON r.antecedent = a.i
        |JOIN ic c ON r.consequent = c.i""".stripMargin,

    // DQ4: Benford — leading digit of the exact cents INTEGER's
    // decimal string (no float log10 edge); expected probabilities
    // ln-based, 1e12-quantized before use (9 scale-independent
    // constants, so a green hash here is green at every SF)
    "dq4_benford" ->
      """WITH d AS (
        |  SELECT substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
        |      AS VARCHAR), 1, 1) AS digit,
        |    count(*)::BIGINT AS n
        |  FROM orders WHERE o_totalprice > 0 GROUP BY 1),
        |w AS (
        |  SELECT *, CAST(sum(n) OVER () AS BIGINT) AS tot,
        |    CAST(round(ln((digit::DOUBLE + 1.0) / digit::DOUBLE)
        |      / ln(10.0) * 1e12) AS BIGINT) AS expq
        |  FROM d)
        |SELECT digit, n,
        |  round(n::DOUBLE / tot::DOUBLE, 6) AS obs_p,
        |  round(expq::DOUBLE / 1e12, 6) AS exp_p,
        |  round((n::DOUBLE - expq::DOUBLE / 1e12 * tot::DOUBLE)
        |    * (n::DOUBLE - expq::DOUBLE / 1e12 * tot::DOUBLE)
        |    / (expq::DOUBLE / 1e12 * tot::DOUBLE), 6) AS chi2_term
        |FROM w""".stripMargin,

    "ct1_chisq" ->
      """WITH obs AS (
        |  SELECT event_type AS d1,
        |    CAST(isodow(CAST(ts AS TIMESTAMP)) AS BIGINT) AS d2,
        |    count(*)::BIGINT AS o
        |  FROM events GROUP BY 1, 2),
        |cells AS (
        |  SELECT g1.d1, g2.d2, coalesce(o.o, 0)::BIGINT AS o
        |  FROM (SELECT DISTINCT d1 FROM obs) g1
        |  CROSS JOIN (SELECT DISTINCT d2 FROM obs) g2
        |  LEFT JOIN obs o ON o.d1 = g1.d1 AND o.d2 = g2.d2),
        |m AS (
        |  SELECT d1, d2, o,
        |    sum(o) OVER (PARTITION BY d1) AS rt,
        |    sum(o) OVER (PARTITION BY d2) AS ct,
        |    sum(o) OVER () AS tot
        |  FROM cells)
        |SELECT d1, d2, o,
        |  rt::DOUBLE * ct::DOUBLE / tot::DOUBLE AS expected,
        |  CAST(round((o::DOUBLE - expected) * (o::DOUBLE - expected)
        |             / expected * 1000000) AS BIGINT) AS chi2_term_micro
        |FROM m""".stripMargin,

    // AB1: two-proportion z replay — identical expression tree (the
    // one sqrt is IEEE-correctly-rounded, so bit-equal cross-engine)
    "ab1_ztest" ->
      """WITH pu AS (
        |  SELECT user_id, user_id % 2 AS v,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS cv
        |  FROM events GROUP BY 1),
        |s AS (SELECT v, count(*)::BIGINT AS n, CAST(sum(cv) AS BIGINT) AS conv
        |      FROM pu GROUP BY 1),
        |a AS (SELECT v AS variant_a, n AS n_a, conv AS conv_a
        |      FROM s ORDER BY v LIMIT 1),
        |b AS (SELECT v AS variant_b, n AS n_b, conv AS conv_b
        |      FROM s ORDER BY v DESC LIMIT 1)
        |SELECT variant_a, n_a, conv_a, variant_b, n_b, conv_b,
        |  (conv_a::DOUBLE / n_a::DOUBLE - conv_b::DOUBLE / n_b::DOUBLE)
        |    / sqrt(((conv_a + conv_b)::DOUBLE / (n_a + n_b)::DOUBLE)
        |           * (1.0 - (conv_a + conv_b)::DOUBLE / (n_a + n_b)::DOUBLE)
        |           * (1.0 / n_a::DOUBLE + 1.0 / n_b::DOUBLE)) AS z,
        |  abs(z) >= 1.96 AS significant_95
        |FROM a, b""".stripMargin,

    "dq1_expectations" ->
      """SELECT 'quantity_in_range' AS rule, count(*) AS n_checked,
        |  CAST(sum(CASE WHEN l_quantity >= 1 AND l_quantity <= 50
        |           THEN 0 ELSE 1 END) AS BIGINT) AS n_violations
        |FROM lineitem
        |UNION ALL
        |SELECT 'quantity_le_25', count(*),
        |  CAST(sum(CASE WHEN l_quantity <= 25 THEN 0 ELSE 1 END) AS BIGINT)
        |FROM lineitem
        |UNION ALL
        |SELECT 'discount_in_range', count(*),
        |  CAST(sum(CASE WHEN l_discount >= 0 AND l_discount <= 0.1
        |           THEN 0 ELSE 1 END) AS BIGINT)
        |FROM lineitem
        |UNION ALL
        |SELECT 'price_positive', count(*),
        |  CAST(sum(CASE WHEN l_extendedprice > 0 THEN 0 ELSE 1 END) AS BIGINT)
        |FROM lineitem
        |UNION ALL
        |SELECT 'shipdate_not_null', count(*),
        |  CAST(sum(CASE WHEN l_shipdate IS NOT NULL THEN 0 ELSE 1 END)
        |    AS BIGINT)
        |FROM lineitem
        |UNION ALL
        |SELECT 'totalprice_positive', count(*),
        |  CAST(sum(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END) AS BIGINT)
        |FROM orders
        |UNION ALL
        |SELECT 'status_known', count(*),
        |  CAST(sum(CASE WHEN o_orderstatus IN ('O', 'F', 'P')
        |           THEN 0 ELSE 1 END) AS BIGINT)
        |FROM orders
        |UNION ALL
        |SELECT 'lineitem_order_fk', (SELECT count(*) FROM lineitem),
        |  (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |UNION ALL
        |SELECT 'orders_customer_fk', (SELECT count(*) FROM orders),
        |  (SELECT count(*) FROM orders o WHERE NOT EXISTS
        |    (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))""".stripMargin,

    "px10_rank_family" ->
      s"""WITH $panelCte
         |SELECT sid, date, close,
         |  CAST(rank() OVER bv AS BIGINT) AS rnk,
         |  CAST(dense_rank() OVER bv AS BIGINT) AS drnk,
         |  percent_rank() OVER bv AS prnk,
         |  cume_dist() OVER bv AS cdist,
         |  CAST(ntile(4) OVER tot AS BIGINT) AS quartile
         |FROM panel
         |WINDOW bv AS (PARTITION BY sid ORDER BY close),
         |       tot AS (PARTITION BY sid ORDER BY close, date)""".stripMargin,

    "a13_mode" ->
      """WITH cnt AS (
        |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q,
        |         count(*) AS n_mode
        |  FROM lineitem GROUP BY 1, 2),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY l_returnflag
        |    ORDER BY n_mode DESC, q) AS rn
        |  FROM cnt)
        |SELECT l_returnflag, q AS mode_qty, n_mode FROM r WHERE rn = 1""".stripMargin,

    // DQ9: exact integer CDF cross-multiplication over the distinct-cents
    // histogram; D and the critical value are single IEEE expressions
    "dq9_ks_drift" ->
      s"""WITH v AS (
         |  SELECT l_returnflag AS f, ${c("l_extendedprice")} AS v
         |  FROM lineitem WHERE l_returnflag IN ('R', 'N')),
         |hist AS (
         |  SELECT v,
         |         CAST(sum(CASE WHEN f = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         |         CAST(sum(CASE WHEN f = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS c2
         |  FROM v GROUP BY 1),
         |cum AS (
         |  SELECT v,
         |         CAST(sum(c1) OVER (ORDER BY v
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cf1,
         |         CAST(sum(c2) OVER (ORDER BY v
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cf2
         |  FROM hist),
         |tot AS (
         |  SELECT CAST(sum(CASE WHEN f = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         |         CAST(sum(CASE WHEN f = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS n2
         |  FROM v),
         |dm AS (
         |  SELECT n1, n2, CAST(max(abs(cf1 * n2 - cf2 * n1)) AS BIGINT) AS dmax
         |  FROM cum, tot GROUP BY 1, 2)
         |SELECT n1, n2,
         |       round(CAST(dmax AS DOUBLE) / CAST(n1 * n2 AS DOUBLE), 6) AS d_stat,
         |       round(1.358 * sqrt(CAST(n1 + n2 AS DOUBLE) / CAST(n1 * n2 AS DOUBLE)), 6) AS d_crit,
         |       CAST(dmax AS DOUBLE) / CAST(n1 * n2 AS DOUBLE) >
         |         1.358 * sqrt(CAST(n1 + n2 AS DOUBLE) / CAST(n1 * n2 AS DOUBLE)) AS drift
         |FROM dm""".stripMargin,

    // DQ10: PSI over $1000 cents buckets, pre-1995 vs 1995+; one ln per
    // bin row (final per-row transcendental), zero cells null the term
    "dq10_psi" ->
      s"""WITH li AS (
         |  SELECT ${c("l_extendedprice")} // 100000 AS bin,
         |         l_shipdate < TIMESTAMP '1995-01-01' AS old
         |  FROM lineitem),
         |b AS (
         |  SELECT bin,
         |         CAST(sum(CASE WHEN old THEN 1 ELSE 0 END) AS BIGINT) AS c_old,
         |         CAST(sum(CASE WHEN NOT old THEN 1 ELSE 0 END) AS BIGINT) AS c_new
         |  FROM li GROUP BY 1),
         |tot AS (
         |  SELECT CAST(sum(c_old) AS BIGINT) AS n_old,
         |         CAST(sum(c_new) AS BIGINT) AS n_new FROM b)
         |SELECT bin, c_old, c_new,
         |       round(CAST(c_old AS DOUBLE) / CAST(n_old AS DOUBLE), 6) AS frac_old,
         |       round(CAST(c_new AS DOUBLE) / CAST(n_new AS DOUBLE), 6) AS frac_new,
         |       CASE WHEN c_old > 0 AND c_new > 0 THEN
         |         round((CAST(c_new AS DOUBLE) / CAST(n_new AS DOUBLE)
         |              - CAST(c_old AS DOUBLE) / CAST(n_old AS DOUBLE))
         |           * ln((CAST(c_new AS DOUBLE) / CAST(n_new AS DOUBLE))
         |              / (CAST(c_old AS DOUBLE) / CAST(n_old AS DOUBLE))), 6)
         |       END AS psi_term
         |FROM b, tot""".stripMargin,

    // DQ11: Benford audit — digit from the cents string; expected shares
    // are the SAME full-precision literals inlined on both engines
    "dq11_benford" ->
      s"""WITH d AS (
         |  SELECT CAST(substr(CAST(${c("l_extendedprice")} AS VARCHAR), 1, 1) AS BIGINT) AS digit
         |  FROM lineitem),
         |g AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
         |t AS (SELECT CAST(sum(n) AS BIGINT) AS "__N" FROM g),
         |e(digit, ef) AS (VALUES
         |  (1, CAST(0.3010299956639812 AS DOUBLE)), (2, CAST(0.17609125905568124 AS DOUBLE)),
         |  (3, CAST(0.12493873660829992 AS DOUBLE)), (4, CAST(0.09691001300805642 AS DOUBLE)),
         |  (5, CAST(0.07918124604762482 AS DOUBLE)), (6, CAST(0.06694678963061322 AS DOUBLE)),
         |  (7, CAST(0.05799194697768673 AS DOUBLE)), (8, CAST(0.05115252244738129 AS DOUBLE)),
         |  (9, CAST(0.04575749056067514 AS DOUBLE)))
         |SELECT g.digit, g.n,
         |       round(CAST(g.n AS DOUBLE) / CAST("__N" AS DOUBLE), 6) AS frac,
         |       round(e.ef, 6) AS benford_frac,
         |       round(CAST(g.n AS DOUBLE) / CAST("__N" AS DOUBLE) - e.ef, 6) AS deviation
         |FROM g, t JOIN e ON e.digit = g.digit""".stripMargin,

    // EV35: per-user consecutive event-type transitions ordered by
    // (epoch µs, event_id) — the session-family tiebreak contract
    "ev35_markov" ->
      """WITH seq AS (
        |  SELECT event_type AS from_type,
        |         lead(event_type) OVER (PARTITION BY user_id
        |           ORDER BY epoch_us(ts), event_id) AS to_type
        |  FROM events),
        |tr AS (
        |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        |  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |       round(CAST(n AS DOUBLE) /
        |         CAST(CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS DOUBLE), 6) AS p
        |FROM tr""".stripMargin,

    // EV37: Gini from the bounded events-per-user count histogram —
    // closed-form tie-group rank sums, integer until the final division
    "ev37_gini" ->
      """WITH per AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1),
        |hist AS (SELECT c, CAST(count(*) AS BIGINT) AS m FROM per GROUP BY 1),
        |cum AS (
        |  SELECT c, m,
        |         CAST(coalesce(sum(m) OVER (ORDER BY c
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
        |  FROM hist),
        |a AS (
        |  SELECT CAST(sum(c * (cb * m + (m * (m + 1)) // 2)) AS BIGINT) AS s,
        |         CAST(sum(c * m) AS BIGINT) AS t,
        |         CAST(sum(m) AS BIGINT) AS n_users
        |  FROM cum)
        |SELECT n_users, t AS n_events,
        |       round((2.0 * CAST(s AS DOUBLE)
        |            - CAST(n_users + 1 AS DOUBLE) * CAST(t AS DOUBLE))
        |         / (CAST(n_users AS DOUBLE) * CAST(t AS DOUBLE)), 6) AS gini
        |FROM a""".stripMargin,

    // ML41: closed-form logistic calibration — z exact ((25−q)/4, a
    // power-of-two division of an integral quantity), p micro-quantized
    // at 1e6 (≤50 distinct z values), integer Brier sums
    "ml41_calibration" ->
      """WITH rows_ AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS q,
        |         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
        |         CAST(round(1e6 / (1.0 + exp(-(CAST(25 - CAST(l_quantity AS BIGINT) AS DOUBLE) / 4.0)))) AS BIGINT) AS p6
        |  FROM lineitem)
        |SELECT (q - 1) // 5 AS bin,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(y) AS BIGINT) AS n_pos,
        |       round(CAST(sum(p6) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1e6, 6) AS mean_pred,
        |       round(CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS emp_rate,
        |       round(CAST(sum((p6 - y * 1000000) * (p6 - y * 1000000)) AS DOUBLE)
        |         / CAST(count(*) AS DOUBLE) / 1e12, 6) AS brier
        |FROM rows_ GROUP BY 1""".stripMargin,

  )
}
