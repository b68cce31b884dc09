package graft

/** Shared CTE/expression helpers for the split TextOracles files
  * (one import point so entry bodies keep their bare helper
  * names byte-for-byte). */
private[graft] object TextOracleCtes {

  /** occurrences of literal m in txt via the replace-length trick. */
  def occ(txt: String, m: String) =
    s"CAST((length($txt) - length(replace($txt, '$m', ''))) / ${m.length} AS BIGINT)"

  def langScore(lang: String): String = {
    val markers = graft.text.TextAnalysis.langMarkers(lang)
    markers.map(m => occ("lt", m)).mkString(" + ")
  }

  /** lowercased text padded with spaces, as a CTE column `lt`. */
  val ltCte = "lt AS (SELECT *, ' ' || lower(text) || ' ' AS lt FROM documents)"

  /** Merge steps the bpe1/bpe2 oracles unroll — must equal the
    * `numMerges` TextQueries passes to Bpe.learnMerges. */
  val BpeSteps = 10

  /** Power-iteration steps the pca2/pca3 oracles unroll — must equal
    * Pca.topComponent's default `steps`. */
  val PcaSteps = 8

  /** Micro-quantized Gram + PcaSteps unrolled integer power steps
    * (u = G·v as exact BIGINT sums; pivot = max-|u| component, smallest
    * index on ties; renormalize via double division + trunc — trunc,
    * NOT CAST, because DuckDB's BIGINT cast rounds while the engine's
    * toLong truncates). MATERIALIZED where a CTE is read twice. */
  val pcaPowerCtes: String = {
    val base =
      """idx AS (SELECT unnest(range(1, 65)) AS i),
        |g AS MATERIALIZED (
        |  SELECT a.i AS i, b.i AS j,
        |    CAST(sum(CAST(round(e.embedding[a.i]::DOUBLE * e.embedding[b.i]::DOUBLE
        |                        * 1000000) AS BIGINT)) AS BIGINT) AS gv
        |  FROM embeddings e, idx a, idx b GROUP BY 1, 2),
        |v0 AS (SELECT i, CAST(1000000 AS BIGINT) AS val FROM idx)""".stripMargin
    val steps = (1 to PcaSteps).map { k =>
      s"""u$k AS MATERIALIZED (
         |  SELECT g.i AS i, CAST(sum(g.gv * v.val) AS BIGINT) AS val
         |  FROM g JOIN v${k - 1} v ON g.j = v.i GROUP BY 1),
         |s$k AS (SELECT val FROM u$k ORDER BY abs(val) DESC, i LIMIT 1),
         |v$k AS MATERIALIZED (
         |  SELECT u.i,
         |    CAST(trunc(u.val::DOUBLE / s.val::DOUBLE * 1000000) AS BIGINT) AS val
         |  FROM u$k u, s$k s)""".stripMargin
    }
    (base +: steps).mkString(",\n")
  }

  /** Word-freq vocab (double-space token encoding) + [[BpeSteps]]
    * unrolled merge steps b1/v1 .. bN/vN. MATERIALIZED because each
    * v(k) is referenced twice (pair argmax + merge pass) — without it
    * DuckDB's CTE inlining recomputes the whole chain per reference. */
  val bpeVocabCtes: String = {
    val base =
      """wf AS MATERIALIZED (
        |  SELECT s AS word, count(*)::BIGINT AS freq
        |  FROM (SELECT unnest(w) AS s FROM words) WHERE s <> '' GROUP BY 1),
        |v0 AS MATERIALIZED (
        |  SELECT word,
        |    '  ' || array_to_string(list_append(string_split(word, ''), '_'),
        |                            '  ') || '  ' AS seq,
        |    freq FROM wf)""".stripMargin
    val steps = (1 to BpeSteps).map { k =>
      s"""b$k AS MATERIALIZED (
         |  SELECT $k AS step, l, r, CAST(sum(freq) AS BIGINT) AS pair_freq
         |  FROM (SELECT c[i] AS l, c[i + 1] AS r, freq
         |        FROM (SELECT string_split(trim(seq), '  ') AS c, freq
         |              FROM v${k - 1}) x,
         |             unnest(range(1, len(c))) AS t(i))
         |  GROUP BY l, r ORDER BY pair_freq DESC, l, r LIMIT 1),
         |v$k AS MATERIALIZED (
         |  SELECT word,
         |    replace(seq, ' ' || b.l || '  ' || b.r || ' ',
         |                 ' ' || b.l || b.r || ' ') AS seq,
         |    freq
         |  FROM v${k - 1}, b$k b)""".stripMargin
    }
    (base +: steps).mkString(",\n")
  }

  val wordsCte =
    """words AS (
      |  SELECT doc_id,
      |    regexp_split_to_array(trim(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g')),
      |                          '\s+') AS w
      |  FROM documents)""".stripMargin

  val shinglesCte =
    s"""$wordsCte,
       |sh AS (
       |  SELECT doc_id,
       |    CASE WHEN len(w) >= 3
       |         THEN list_transform(range(1, len(w) - 1),
       |                             i -> array_to_string(w[i:i+2], ' '))
       |         ELSE [] END AS sh
       |  FROM words)""".stripMargin

  /** 4 bands × 2 rows of md5-salted minhashes (salts 0..7). */
  val sigCte = {
    val bands = (0 until 4).map { b =>
      val m0 = s"list_min(list_transform(sh, s -> md5('${2 * b}|' || s)))"
      val m1 = s"list_min(list_transform(sh, s -> md5('${2 * b + 1}|' || s)))"
      s"md5($m0 || '|' || $m1) AS band_$b"
    }
    s"""$shinglesCte,
       |sig AS (
       |  SELECT doc_id, sh, ${bands.mkString(",\n    ")}
       |  FROM sh WHERE len(sh) > 0)""".stripMargin
  }

  /** corpus/ref n-gram CTEs for the exact-overlap decontamination
    * oracles: distinct word n-grams per doc, eval set = doc_id < 50. */
  def overlapCte(n: Int) =
    s"""$wordsCte,
       |gr AS (
       |  SELECT doc_id,
       |    CASE WHEN len(w) >= $n
       |         THEN list_transform(range(1, len(w) - ${n - 2}),
       |                             i -> array_to_string(w[i:i+${n - 1}], ' '))
       |         ELSE [] END AS g
       |  FROM words),
       |ref AS (SELECT DISTINCT * FROM
       |  (SELECT unnest(g) AS s FROM gr WHERE doc_id < 50)),
       |cg AS (SELECT DISTINCT * FROM
       |  (SELECT doc_id, unnest(g) AS s FROM gr WHERE doc_id >= 50))""".stripMargin

  val candidatesCte = {
    val unions = (0 until 4).map { b =>
      s"""SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM sig a JOIN sig b ON a.band_$b = b.band_$b AND a.doc_id < b.doc_id"""
        .stripMargin
    }
    s"""$sigCte,
       |cand AS (
       |  ${unions.mkString("\n  UNION\n  ")})""".stripMargin
  }

  /** double-cast dot product over 64-dim float lists. */
  def dot(a: String, b: String) =
    s"list_sum(list_transform(range(1, 65), i -> $a[i]::DOUBLE * $b[i]::DOUBLE))"

  def cosine(a: String, b: String) =
    s"(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})))"

  /** Gopher-filter CTE chain (words → grams/lines → per-doc fractions in
    * `fr`), shared by tx8 and the pipeline_text composition. Fractions
    * are rounded to 6 BEFORE any keep comparison, exactly as the Spark
    * side computes them. */
  val gopherCtes =
    s"""$wordsCte,
       |grams AS (
       |  SELECT doc_id,
       |    CASE WHEN len(w) >= 2
       |         THEN list_transform(range(1, len(w)),
       |                             i -> array_to_string(w[i:i+1], ' '))
       |         ELSE [] END AS g2,
       |    CASE WHEN len(w) >= 3
       |         THEN list_transform(range(1, len(w) - 1),
       |                             i -> array_to_string(w[i:i+2], ' '))
       |         ELSE [] END AS g3
       |  FROM words),
       |ln AS (
       |  SELECT doc_id,
       |    list_filter(string_split(text, chr(10)), l -> trim(l) <> '') AS ls
       |  FROM documents),
       |base AS (
       |  SELECT doc_id,
       |    CASE WHEN length(trim(text)) = 0 THEN 0
       |         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS tok,
       |    CASE WHEN len(regexp_split_to_array(trim(text), '\\s+')) > 0
       |         THEN length(regexp_replace(trim(text), '\\s+', '', 'g'))::DOUBLE /
       |              len(regexp_split_to_array(trim(text), '\\s+'))
       |         ELSE 0.0 END AS mwl,
       |    ${occ("text", "#")} + ${occ("text", "...")} + ${occ("text", "…")} AS syms
       |  FROM documents),
       |fr AS (
       |  SELECT b.doc_id, b.tok, b.mwl,
       |    CASE WHEN len(g.g2) > 0
       |         THEN round(list_max(list_transform(g.g2,
       |                x -> len(list_filter(g.g2, y -> y = x))))::DOUBLE / len(g.g2), 6)
       |         ELSE 0.0 END AS top2,
       |    CASE WHEN len(g.g3) > 0
       |         THEN round(1.0 - len(list_distinct(g.g3))::DOUBLE / len(g.g3), 6)
       |         ELSE 0.0 END AS dup3,
       |    CASE WHEN len(l.ls) > 0
       |         THEN round(1.0 - len(list_distinct(l.ls))::DOUBLE / len(l.ls), 6)
       |         ELSE 0.0 END AS dupline,
       |    CASE WHEN len(l.ls) > 0
       |         THEN round(len(list_filter(l.ls,
       |                x -> substr(ltrim(x), 1, 1) IN ('-', '*', '•')))::DOUBLE
       |              / len(l.ls), 6)
       |         ELSE 0.0 END AS bullet,
       |    CASE WHEN len(l.ls) > 0
       |         THEN round(len(list_filter(l.ls,
       |                x -> ends_with(rtrim(x), '...') OR ends_with(rtrim(x), '…')))::DOUBLE
       |              / len(l.ls), 6)
       |         ELSE 0.0 END AS ellip,
       |    CASE WHEN b.tok > 0 THEN round(b.syms::DOUBLE / b.tok, 6)
       |         ELSE 0.0 END AS sym
       |  FROM base b JOIN grams g ON b.doc_id = g.doc_id
       |              JOIN ln l ON b.doc_id = l.doc_id)""".stripMargin

  /** The composite keep predicate over `fr`'s columns (Rae et al. 2021
    * Table A1 thresholds, word floor lowered to 20 — TextAnalysis
    * .gopherKeep). */
  val gopherKeepSql =
    "tok >= 20 AND tok <= 100000 AND mwl >= 3 AND mwl <= 10 " +
      "AND sym < 0.1 AND dupline < 0.30 AND bullet < 0.90 " +
      "AND ellip < 0.30 AND top2 < 0.20 AND dup3 < 0.60"

  /** Shared base CTEs of the logistic-regression oracles: the hashed
    * unigram+bigram stream (cl1's feat), per-doc counts with the bias
    * pseudo-bucket −1, 0/1 is-English labels on the training split, and
    * the empty iteration-0 weight frame. */
  val logregBaseCtes =
    s"""$wordsCte,
       |gr AS (
       |  SELECT doc_id,
       |    CASE WHEN len(w) >= 2
       |         THEN list_transform(range(1, len(w)),
       |                             i -> array_to_string(w[i:i+1], ' '))
       |         ELSE [] END AS g
       |  FROM words),
       |feat AS (
       |  SELECT doc_id,
       |    CAST(concat('0x', substr(md5(s), 1, 8)) AS BIGINT) % 256 AS b
       |  FROM (SELECT doc_id, unnest(w) AS s FROM words
       |        UNION ALL
       |        SELECT doc_id, unnest(g) AS s FROM gr)
       |  WHERE s <> ''),
       |fx AS (
       |  SELECT doc_id, b, count(*)::BIGINT AS x
       |  FROM feat WHERE doc_id < 400 GROUP BY 1, 2
       |  UNION ALL
       |  SELECT doc_id, CAST(-1 AS BIGINT), CAST(1 AS BIGINT)
       |  FROM documents WHERE doc_id < 400),
       |lab AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
       |        FROM documents WHERE doc_id < 400),
       |nn AS (SELECT count(*)::DOUBLE AS n FROM lab),
       |w0 AS (SELECT CAST(NULL AS BIGINT) AS b, CAST(NULL AS BIGINT) AS wm
       |       WHERE 1 = 0)""".stripMargin

  /** One unrolled GD iteration: micro-integer logits (exact), per-row
    * sigmoid, micro-rounded residuals, per-bucket gradient sum, and the
    * half-up-rounded step — the identical arithmetic, same operation
    * order, as Classifier.logregTrain with lr = 0.5, l2 = 0. */
  def logregIterCte(i: Int): String =
    s"""z$i AS (
       |  SELECT l.doc_id, l.y, coalesce(s.zm, 0) AS zm
       |  FROM lab l LEFT JOIN (
       |    SELECT fx.doc_id, CAST(sum(w.wm * fx.x) AS BIGINT) AS zm
       |    FROM fx JOIN w${i - 1} w ON fx.b = w.b GROUP BY fx.doc_id) s
       |  ON l.doc_id = s.doc_id),
       |r$i AS (
       |  SELECT doc_id,
       |    CAST(round((1.0 / (1.0 + exp(-(zm::DOUBLE / 1e6))) - y) * 1e6)
       |      AS BIGINT) AS rm
       |  FROM z$i),
       |g$i AS (
       |  SELECT b, CAST(sum(rm * x) AS BIGINT) AS g
       |  FROM fx JOIN r$i USING (doc_id) GROUP BY b),
       |w$i AS (
       |  SELECT coalesce(w.b, g.b) AS b,
       |    coalesce(w.wm, 0) -
       |      CAST(round(0.5 * (coalesce(g.g, 0)::DOUBLE / (SELECT n FROM nn)))
       |        AS BIGINT) AS wm
       |  FROM w${i - 1} w FULL JOIN g$i g ON w.b = g.b)""".stripMargin

  val logregTrainedCtes: String =
    (logregBaseCtes +: (1 to 3).map(logregIterCte)).mkString(",\n")

  /** One unrolled PageRank power step: per-edge contributions rounded
    * to picos (exact integer sums per dst), dangling mass via anti-set,
    * damped base — the identical arithmetic as graph.PageRank with
    * damping 0.85. */
  def pagerankIterCte(i: Int): String =
    s"""c$i AS (
       |  SELECT pr.dst AS node,
       |    CAST(sum(CAST(round(r.r * pr.p) AS BIGINT)) AS BIGINT) AS c
       |  FROM pr JOIN r${i - 1} r ON pr.src = r.node GROUP BY 1),
       |dg$i AS (
       |  SELECT coalesce(sum(r.r), 0) AS dm FROM r${i - 1} r
       |  WHERE r.node NOT IN (SELECT DISTINCT src FROM pr)),
       |r$i AS (
       |  SELECT n.node,
       |    (SELECT CAST(round((1.0 - 0.85) / count(*) * 1e12) AS BIGINT)
       |     FROM nodes) +
       |    CAST(round(0.85 * (coalesce(c.c, 0) +
       |      CAST(round(dg$i.dm / (SELECT count(*) FROM nodes)) AS BIGINT)))
       |      AS BIGINT) AS r
       |  FROM nodes n LEFT JOIN c$i c USING (node) CROSS JOIN dg$i)""".stripMargin

  val pagerankCtes: String =
    (Seq(
      """ed AS (
        |  SELECT a.source AS src, b.source AS dst, count(*)::DOUBLE AS w
        |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |  GROUP BY 1, 2)""".stripMargin,
      """nodes AS (
        |  SELECT DISTINCT node FROM
        |    (SELECT src AS node FROM ed UNION SELECT dst FROM ed))""".stripMargin,
      """pr AS (
        |  SELECT src, dst, w / tw AS p FROM
        |    (SELECT *, sum(w) OVER (PARTITION BY src) AS tw FROM ed))""".stripMargin,
      """r0 AS (
        |  SELECT node,
        |    (SELECT CAST(round(1.0 / count(*) * 1e12) AS BIGINT) FROM nodes)
        |      AS r
        |  FROM nodes)""".stripMargin) ++ (1 to 3).map(pagerankIterCte))
      .mkString(",\n")
}
