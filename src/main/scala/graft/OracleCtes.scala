package graft

/** Shared CTE/expression helpers for the split Oracles files
  * (one import point so entry bodies keep their bare helper
  * names byte-for-byte). */
private[graft] object OracleCtes {

  /** round-to-integer-cents: exact bigint arithmetic both engines. */
  def c(x: String) = s"CAST(round(($x)*100) AS BIGINT)"

  val panelCte =
    """panel AS (
      |  SELECT l_suppkey AS sid, CAST(l_shipdate AS DATE) AS date,
      |         max(l_extendedprice) AS close
      |  FROM lineitem GROUP BY 1, 2)""".stripMargin

  /** Engle-Granger CTE chain (micro log prices, decimal OLS moments,
    * re-quantized residuals, DW + ADF sums) ending in the screen's
    * output as CTE `scr` — shared by coint1 (select *) and coint2
    * (best-pair spread replay). */
  val cointCtes =
    s"""$panelCte,
         |m AS (
         |  SELECT CAST(sid AS VARCHAR) AS s, date,
         |         CAST(round(ln(close) * 1e6) AS BIGINT) AS v
         |  FROM panel
         |  WHERE close > 0 AND CAST(sid AS VARCHAR) IN ('1','2','3','4')),
         |pj AS (
         |  SELECT a.s AS sa, b.s AS sb, a.date AS date, a.v AS y, b.v AS x
         |  FROM m a JOIN m b
         |    ON a.date = b.date AND CAST(a.s AS BIGINT) < CAST(b.s AS BIGINT)),
         |st AS (
         |  SELECT sa, sb, count(*) AS n, sum(x::HUGEINT) AS sx,
         |         sum(y::HUGEINT) AS sy, sum(x::HUGEINT * x) AS sxx,
         |         sum(x::HUGEINT * y) AS sxy
         |  FROM pj GROUP BY 1, 2),
         |co AS (
         |  SELECT sa, sb, n, sx, sy,
         |    CASE WHEN n >= 3 AND n * sxx - sx * sx <> 0
         |         THEN (n * sxy - sx * sy)::DOUBLE
         |            / (n * sxx - sx * sx)::DOUBLE END AS beta
         |  FROM st),
         |co2 AS (
         |  SELECT *, (sy::DOUBLE - beta * sx::DOUBLE) / n::DOUBLE AS alpha
         |  FROM co),
         |er AS (
         |  SELECT p.sa, p.sb, p.date,
         |    CAST(round(p.y - c.alpha - c.beta * p.x) AS BIGINT) AS e
         |  FROM pj p JOIN co2 c ON p.sa = c.sa AND p.sb = c.sb
         |  WHERE c.beta IS NOT NULL),
         |ed AS (
         |  SELECT sa, sb, e,
         |    e - lag(e) OVER (PARTITION BY sa, sb ORDER BY date) AS d,
         |    lag(e) OVER (PARTITION BY sa, sb ORDER BY date) AS pv
         |  FROM er),
         |ag AS (
         |  SELECT sa, sb, count(d) AS cnd,
         |         sum(e::HUGEINT * e) AS see,
         |         sum(d::HUGEINT * d) AS sdd,
         |         sum(pv::HUGEINT * pv) AS spp,
         |         sum(pv::HUGEINT * d) AS spd
         |  FROM ed GROUP BY 1, 2),
         |ad AS (
         |  SELECT *, spd::DOUBLE / spp::DOUBLE AS phi,
         |    (sdd::DOUBLE - (spd::DOUBLE / spp::DOUBLE) * spd::DOUBLE)
         |      / (cnd - 1)::DOUBLE AS s2
         |  FROM ag),
         |scr AS (
         |  SELECT c.sa AS sid_a, c.sb AS sid_b, CAST(c.n AS BIGINT) AS n,
         |    round(c.beta, 6) + 0.0 AS beta,
         |    round(c.alpha / 1e6, 6) + 0.0 AS alpha,
         |    round(CASE WHEN see > 0 THEN sdd::DOUBLE / see::DOUBLE END, 6)
         |      + 0.0 AS crdw,
         |    round(CASE WHEN cnd >= 3 AND spp > 0 AND s2 > 0
         |          THEN phi / sqrt(s2 / spp::DOUBLE) END, 6) + 0.0 AS adf_t,
         |    round(sqrt(see::DOUBLE / c.n::DOUBLE) / 1e6, 6) + 0.0
         |      AS resid_std
         |  FROM co2 c
         |  LEFT JOIN ad ON c.sa = ad.sa AND c.sb = ad.sb)"""
      .stripMargin

  val sigCte =
    s"""$panelCte,
       |sig AS (
       |  SELECT sid, date, close, CAST(close < 30000 AS INT) AS signal FROM panel),
       |wts AS (
       |  SELECT *, CAST(signal AS DOUBLE) /
       |    (CASE WHEN sum(abs(signal)) OVER (PARTITION BY date) <> 0
       |          THEN sum(abs(signal)) OVER (PARTITION BY date) ELSE 1 END) AS weight
       |  FROM sig)""".stripMargin

  val turnoverCte =
    s"""$sigCte,
       |pos AS (
       |  SELECT *, lag(weight) OVER (PARTITION BY sid ORDER BY date) AS position FROM wts),
       |trn AS (
       |  SELECT *, abs(coalesce(position, 0) -
       |    lag(coalesce(position, 0)) OVER (PARTITION BY sid ORDER BY date)) AS turnover
       |  FROM pos)""".stripMargin

  /** perf_* shared return series: demo melt Return rows (damped ×0.001,
    * same op order as the Spark query) → per-date exact pico sum. The
    * single source of truth for the damping/scaling constants across
    * perf_daily/perf_summary/perf_rolling/perf_benchmark. */
  /** Parameterized damped-return chain (the perfRetCte machinery with a
    * selectable signal threshold and CTE suffix) — port1 combines two. */
  def retChain(th: Int, sfx: String): String =
    s"""sig$sfx AS (
       |  SELECT sid, date, close, CAST(close < $th AS INT) AS signal FROM panel),
       |wts$sfx AS (
       |  SELECT *, CAST(signal AS DOUBLE) /
       |    (CASE WHEN sum(abs(signal)) OVER (PARTITION BY date) <> 0
       |          THEN sum(abs(signal)) OVER (PARTITION BY date) ELSE 1 END) AS weight
       |  FROM sig$sfx),
       |pos$sfx AS (
       |  SELECT *, lag(weight) OVER (PARTITION BY sid ORDER BY date) AS position
       |  FROM wts$sfx),
       |gro$sfx AS (
       |  SELECT *, (close / lag(close) OVER (PARTITION BY sid ORDER BY date) - 1) *
       |    lag(position) OVER (PARTITION BY sid ORDER BY date) AS gross
       |  FROM pos$sfx),
       |ret$sfx AS (
       |  SELECT date,
       |    CAST(sum(CAST(round((coalesce(gross, 0.0) * 0.001) * 1e12) AS BIGINT))
       |      AS BIGINT) / 1e12 AS r$sfx
       |  FROM gro$sfx GROUP BY date)""".stripMargin

  val perfRetCte =
    s"""$turnoverCte,
       |gro AS (
       |  SELECT *, (close / lag(close) OVER (PARTITION BY sid ORDER BY date) - 1) *
       |    lag(position) OVER (PARTITION BY sid ORDER BY date) AS gross
       |  FROM trn),
       |ret AS (
       |  SELECT date,
       |    CAST(sum(CAST(round((coalesce(gross, 0.0) * 0.001) * 1e12) AS BIGINT))
       |      AS BIGINT) / 1e12 AS r
       |  FROM gro GROUP BY date)""".stripMargin


  /** Shared Fama-MacBeth pass-1 SQL: per-date Cramer coefficients
    * (the fm1 result; fm2 wraps it as a CTE). */
  val fmCoeffsCtes =
    s"""$panelCte,
         |pf AS (
         |  SELECT sid, date, close,
         |    close / lag(close) OVER (PARTITION BY sid ORDER BY date) - 1 AS mom,
         |    close / 10000.0 AS lvl,
         |    lead(close) OVER (PARTITION BY sid ORDER BY date) / close - 1 AS f
         |  FROM panel),
         |b AS (SELECT * FROM pf
         |      WHERE f IS NOT NULL AND mom IS NOT NULL AND lvl IS NOT NULL),
         |m AS (
         |  SELECT date,
         |    CAST(round(f * 1e6) AS HUGEINT) AS y,
         |    CAST(round(mom * 1e6) AS HUGEINT) AS x1,
         |    CAST(round(lvl * 1e6) AS HUGEINT) AS x2
         |  FROM b),
         |ag AS (
         |  SELECT date, count(*) AS n,
         |    sum(x1) AS s1, sum(x2) AS s2,
         |    sum(x1*x1) AS s11, sum(x2*x2) AS s22, sum(x1*x2) AS s12,
         |    sum(y) AS sy, sum(x1*y) AS s1y, sum(x2*y) AS s2y
         |  FROM m GROUP BY date),
         |dd AS (
         |  SELECT date, n, CAST(n AS DOUBLE) AS nd,
         |    CAST(s1 AS DOUBLE) AS s1d, CAST(s2 AS DOUBLE) AS s2d,
         |    CAST(s11 AS DOUBLE) AS s11d, CAST(s22 AS DOUBLE) AS s22d,
         |    CAST(s12 AS DOUBLE) AS s12d, CAST(sy AS DOUBLE) AS syd,
         |    CAST(s1y AS DOUBLE) AS s1yd, CAST(s2y AS DOUBLE) AS s2yd
         |  FROM ag),
         |cr AS (
         |  SELECT date, n,
         |    nd * (s11d * s22d - s12d * s12d) AS t1,
         |    s1d * (s1d * s22d - s12d * s2d) AS t2,
         |    s2d * (s1d * s12d - s11d * s2d) AS t3,
         |    syd * (s11d * s22d - s12d * s12d)
         |      - s1d * (s1yd * s22d - s12d * s2yd)
         |      + s2d * (s1yd * s12d - s11d * s2yd) AS det_a,
         |    nd * (s1yd * s22d - s12d * s2yd)
         |      - syd * (s1d * s22d - s12d * s2d)
         |      + s2d * (s1d * s2yd - s1yd * s2d) AS det_b1,
         |    nd * (s11d * s2yd - s1yd * s12d)
         |      - s1d * (s1d * s2yd - s1yd * s2d)
         |      + syd * (s1d * s12d - s11d * s2d) AS det_b2
         |  FROM dd),
         |fx AS (
         |  SELECT date, n, det_a, det_b1, det_b2, t1 - t2 + t3 AS det,
         |    abs(t1) + abs(t2) + abs(t3) AS mag
         |  FROM cr),
         |ok AS (
         |  SELECT *, n >= 3 AND mag > 0 AND abs(det) > mag * 1e-9 AS good
         |  FROM fx),
         |coefs AS (
         |  SELECT date, n,
         |    round(CASE WHEN good THEN det_a / det / 1e6 END, 6) + 0.0 AS alpha,
         |    round(CASE WHEN good THEN det_b1 / det END, 6) + 0.0 AS beta1,
         |    round(CASE WHEN good THEN det_b2 / det END, 6) + 0.0 AS beta2
         |  FROM ok)""".stripMargin

  val fmCoeffsSql =
    s"""WITH $fmCoeffsCtes
       |SELECT date, n, alpha, beta1, beta2 FROM coefs""".stripMargin

  /** ... plus the sign-aware running product of (1+r) and its peak. */
  val perfPkCte =
    s"""$perfRetCte,
       |cum AS (
       |  SELECT date, r,
       |    CASE WHEN sum(CASE WHEN 1 + r = 0 THEN 1 ELSE 0 END) OVER w > 0 THEN 0.0
       |         ELSE exp(sum(CASE WHEN 1 + r <> 0 THEN ln(abs(1 + r))
       |                          ELSE 0.0 END) OVER w) *
       |              (1.0 - (sum(CASE WHEN 1 + r < 0 THEN 1 ELSE 0 END) OVER w % 2) * 2)
       |    END AS c
       |  FROM ret
       |  WINDOW w AS (ORDER BY date ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |pk AS (
       |  SELECT *, max(c) OVER (ORDER BY date
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
       |  FROM cum)""".stripMargin

  /** The default backtest's full 10-field melt — used by
    * `backtest_pipeline` directly and by `p8_truncation` wrapped in the
    * start-date cut. */
  val backtestMeltSql =
    s"""WITH $turnoverCte,
       |gro AS (
       |  SELECT *, (close / lag(close) OVER (PARTITION BY sid ORDER BY date) - 1) *
       |    lag(position) OVER (PARTITION BY sid ORDER BY date) AS gross
       |  FROM trn),
       |m AS (SELECT sid, date, signal, weight, position, gross, turnover FROM gro)
       |SELECT sid, date, 'AbsExposure' AS field, abs(position) AS value FROM m
       |UNION ALL SELECT sid, date, 'AbsWeight', abs(weight) FROM m
       |UNION ALL SELECT sid, date, 'Commission', 0.0 FROM m
       |UNION ALL SELECT sid, date, 'NetExposure', position FROM m
       |UNION ALL SELECT sid, date, 'Return', coalesce(gross, 0.0) FROM m
       |UNION ALL SELECT sid, date, 'Signal', CAST(signal AS DOUBLE) FROM m
       |UNION ALL SELECT sid, date, 'Slippage', 0.0 FROM m
       |UNION ALL SELECT sid, date, 'TotalHoldings',
       |  CASE WHEN coalesce(position, 0) <> 0 THEN 1.0 ELSE 0.0 END FROM m
       |UNION ALL SELECT sid, date, 'Turnover', turnover FROM m
       |UNION ALL SELECT sid, date, 'Weight', weight FROM m""".stripMargin

  /** §3.2 trade lifecycle SQL, parameterized by the signal-date CTE body:
    * `trade_full` uses the last panel date, `trade_cal` the second-to-last
    * (a closed exchange's last-close date). */
  def tradeFullSql(lastd: String): String =
    s"""WITH $sigCte,
       |lastd AS ($lastd),
       |today AS (
       |  SELECT sid, weight, close FROM wts JOIN lastd ON wts.date = lastd.d),
       |mast AS (
       |  SELECT sid, CASE WHEN sid % 4 = 0 THEN 'JPY' ELSE 'USD' END AS qc
       |  FROM (SELECT DISTINCT sid FROM panel)),
       |accounts AS (
       |  SELECT * FROM (VALUES
       |    ('U1', 0.6, 'USD', 1000000.0),
       |    ('U2', 0.4, 'EUR', 500000.0)) AS t(account, allocation, bc, nlv)),
       |rates AS (
       |  SELECT * FROM (VALUES
       |    ('USD', 'JPY', 110.0), ('EUR', 'USD', 1.1),
       |    ('EUR', 'JPY', 121.0)) AS t(bc, qc, rate)),
       |fanned AS (
       |  SELECT today.sid, today.weight, today.close, m.qc,
       |         a.account, a.allocation, a.bc, a.nlv
       |  FROM today JOIN mast m ON today.sid = m.sid CROSS JOIN accounts a),
       |withrate AS (
       |  SELECT f.*, CASE WHEN f.bc = f.qc THEN 1.0 ELSE r.rate END AS rate
       |  FROM fanned f LEFT JOIN rates r ON f.bc = r.bc AND f.qc = r.qc),
       |targets AS (
       |  SELECT sid, account,
       |    CAST(coalesce(round(weight * allocation * nlv * rate /
       |      abs(CASE WHEN close <> 0 THEN close END)), 0) AS BIGINT) AS tq
       |  FROM withrate),
       |pos AS (
       |  SELECT s_suppkey AS sid, 'U1' AS account, round(s_acctbal / 100) AS q
       |  FROM supplier WHERE s_suppkey % 5 = 0),
       |oo AS (
       |  SELECT s_suppkey AS sid, 'U2' AS account,
       |    sum(CASE WHEN s_suppkey % 2 = 0 THEN round(s_acctbal / 200)
       |             ELSE -round(s_acctbal / 200) END) AS rem
       |  FROM supplier WHERE s_suppkey % 7 = 0 GROUP BY 1, 2),
       |held AS (
       |  SELECT coalesce(pos.sid, oo.sid) AS sid,
       |         coalesce(pos.account, oo.account) AS account,
       |         coalesce(q, 0) + coalesce(rem, 0) AS quantity
       |  FROM pos FULL OUTER JOIN oo ON pos.sid = oo.sid AND pos.account = oo.account),
       |net AS (
       |  SELECT t.sid, t.account, coalesce(h.quantity, 0) AS held, t.tq,
       |         t.tq - coalesce(h.quantity, 0) AS nq
       |  FROM targets t LEFT JOIN held h
       |    ON t.sid = h.sid AND t.account = h.account),
       |gated AS (
       |  SELECT sid, account,
       |    CASE WHEN ((tq > 0 AND held > 0) OR (tq < 0 AND held < 0))
       |              AND abs(nq / held) < 0.25
       |         THEN 0 ELSE nq END AS nq
       |  FROM net)
       |SELECT sid, account, CASE WHEN nq > 0 THEN 'BUY' ELSE 'SELL' END AS action,
       |       'demo' AS "orderRef", CAST(round(abs(nq)) AS BIGINT) AS "totalQuantity"
       |FROM gated WHERE nq <> 0 AND round(nq) <> 0""".stripMargin
}
