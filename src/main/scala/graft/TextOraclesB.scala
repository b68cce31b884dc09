package graft

/** Second half of [[TextOracles]] (split r8 for file size; same
  * byte-identical oracle SQL, proven by the oracle_sql.json diff
  * at split time). */
private[graft] object TextOraclesB {
  import TextOracleCtes._

  val all: Map[String, String] = Map(
    // IR5: Dirichlet query likelihood — same tokenization and scalar
    // stats row as ir1, per-row fixed-order IEEE log terms
    "ir5_query_likelihood" -> {
      val terms = Seq("spark", "join", "window")
      def tf(i: Int, term: String) =
        s"len(list_filter(w, x -> x = '$term'))::BIGINT AS tf$i"
      val scores = terms.indices.map { i =>
        s"""CASE WHEN cf$i > 0
           | THEN ln((tf$i + 2000.0::DOUBLE * cf$i / C) / (dl + 2000.0::DOUBLE))
           | ELSE 0.0::DOUBLE END""".stripMargin.replace("\n", "")
      }
      s"""WITH wd AS (
         |  SELECT doc_id, text,
         |    regexp_split_to_array(trim(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g')),
         |                          '\\s+') AS w
         |  FROM documents WHERE text IS NOT NULL),
         |tf AS (
         |  SELECT doc_id,
         |    CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(w) END::BIGINT AS dl,
         |    ${terms.zipWithIndex.map { case (t, i) => tf(i, t) }.mkString(",\n    ")}
         |  FROM wd),
         |st AS (
         |  SELECT CAST(sum(dl) AS BIGINT) AS C,
         |    ${terms.indices.map(i =>
             s"CAST(sum(tf$i) AS BIGINT) AS cf$i").mkString(",\n    ")}
         |  FROM tf)
         |SELECT doc_id, round(${scores.mkString(" + ")}, 6) AS score
         |FROM tf, st
         |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin
    },

    // SP16: curriculum ordering — tx3's quality formula, band =
    // min(floor(q·10), 9), per-band rank, then the DEFINITIONAL global
    // round-robin rank (the engine derives the same position from the
    // band-size frame without a global window)
    "sp16_curriculum" -> {
      val stop = langScore("en")
      s"""WITH $ltCte,
         |comp AS (
         |  SELECT doc_id,
         |    CASE WHEN length(trim(text)) = 0 THEN 0
         |         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS tok,
         |    length(text) AS n,
         |    length(regexp_replace(trim(text), '\\s+', '', 'g')) AS nospace,
         |    (length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))) AS alpha,
         |    (length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))) AS digit,
         |    ($stop) AS stops
         |  FROM lt),
         |ratios AS (
         |  SELECT doc_id,
         |    CASE WHEN tok > 0 THEN nospace::DOUBLE / tok ELSE 0.0 END AS mwl,
         |    CASE WHEN n > 0 THEN alpha::DOUBLE / n ELSE 0.0 END AS ar,
         |    CASE WHEN n > 0 THEN digit::DOUBLE / n ELSE 0.0 END AS dr,
         |    CASE WHEN tok > 0 THEN stops::DOUBLE / tok ELSE 0.0 END AS sr
         |  FROM comp),
         |q AS (
         |  SELECT doc_id,
         |    round(ar * 0.4 + (CASE WHEN mwl >= 3 AND mwl <= 10 THEN 1.0 ELSE 0.0 END) * 0.2 +
         |          least(sr * 5.0, 1.0) * 0.2 + (1.0 - least(dr * 5.0, 1.0)) * 0.2, 6) AS quality
         |  FROM ratios),
         |b AS (
         |  SELECT doc_id,
         |    CAST(least(floor(quality * 10), 9) AS BIGINT) AS band
         |  FROM q),
         |p AS (
         |  SELECT doc_id, band,
         |    CAST(row_number() OVER (PARTITION BY band ORDER BY doc_id)
         |      AS BIGINT) AS pos_in_band
         |  FROM b)
         |SELECT doc_id, band, pos_in_band,
         |  CAST(row_number() OVER (ORDER BY pos_in_band, band)
         |    AS BIGINT) AS curriculum_pos
         |FROM p""".stripMargin
    },

    // corpus report: language pick (tx2), Gopher keep (tx8 CTEs),
    // quality (tx3 formula), micro-quantized quality mean
    "tx12_corpus_report" -> {
      val stop = langScore("en")
      val scores = Seq("de", "en", "es", "fr", "it")
        .map(l => s"(${langScore(l)}) AS s_$l").mkString(", ")
      s"""WITH $ltCte,
         |$gopherCtes,
         |sc AS (SELECT doc_id, $scores FROM lt),
         |pick AS (
         |  SELECT doc_id,
         |    CASE WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_it)
         |              AND greatest(s_de, s_en, s_es, s_fr, s_it) > 0 THEN 'de'
         |         WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_it)
         |              AND greatest(s_de, s_en, s_es, s_fr, s_it) > 0 THEN 'en'
         |         WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_it)
         |              AND greatest(s_de, s_en, s_es, s_fr, s_it) > 0 THEN 'es'
         |         WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_it)
         |              AND greatest(s_de, s_en, s_es, s_fr, s_it) > 0 THEN 'fr'
         |         WHEN s_it = greatest(s_de, s_en, s_es, s_fr, s_it)
         |              AND greatest(s_de, s_en, s_es, s_fr, s_it) > 0 THEN 'it'
         |         ELSE 'und' END AS lang_id
         |  FROM sc),
         |qual AS (
         |  SELECT doc_id,
         |    round((CASE WHEN n > 0 THEN alpha::DOUBLE / n ELSE 0.0 END) * 0.4 +
         |      (CASE WHEN (CASE WHEN tok > 0 THEN nospace::DOUBLE / tok ELSE 0.0 END)
         |                 >= 3 AND
         |                 (CASE WHEN tok > 0 THEN nospace::DOUBLE / tok ELSE 0.0 END)
         |                 <= 10 THEN 1.0 ELSE 0.0 END) * 0.2 +
         |      least((CASE WHEN tok > 0 THEN stops::DOUBLE / tok ELSE 0.0 END) * 5.0,
         |            1.0) * 0.2 +
         |      (1.0 - least((CASE WHEN n > 0 THEN digit::DOUBLE / n ELSE 0.0 END) * 5.0,
         |                   1.0)) * 0.2, 6) AS quality,
         |    tok
         |  FROM (
         |    SELECT doc_id,
         |      CASE WHEN length(trim(text)) = 0 THEN 0
         |           ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS tok,
         |      length(text) AS n,
         |      length(regexp_replace(trim(text), '\\s+', '', 'g')) AS nospace,
         |      (length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))) AS alpha,
         |      (length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))) AS digit,
         |      ($stop) AS stops
         |    FROM lt)),
         |keepv AS (SELECT doc_id, CAST($gopherKeepSql AS INT) AS keep FROM fr)
         |SELECT p.lang_id, d.source, count(*)::BIGINT AS docs,
         |  CAST(sum(q.tok) AS BIGINT) AS tokens,
         |  round(sum(k.keep)::DOUBLE / count(*), 6) AS keep_rate,
         |  round(CAST(sum(CAST(round(q.quality * 1000000) AS BIGINT)) AS BIGINT)::DOUBLE
         |        / count(*) / 1000000, 6) AS mean_quality
         |FROM documents d
         |JOIN pick p USING (doc_id)
         |JOIN qual q USING (doc_id)
         |JOIN keepv k USING (doc_id)
         |GROUP BY 1, 2""".stripMargin
    },

    "tx11_normalize" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    text || ' cafe' || chr(769) || ' A' || chr(778) || ' ring' ||
        |    chr(7) || 'bell  wide   gaps' || chr(9) || chr(9) || 'tabs ' AS t
        |  FROM documents)
        |SELECT doc_id,
        |  md5(trim(regexp_replace(regexp_replace(nfc_normalize(t),
        |      '[\x00-\x08\x0B-\x1F\x7F]', '', 'g'),
        |      '[ \t]+', ' ', 'g'))) AS clean_md5,
        |  length(nfc_normalize(t))::BIGINT AS nfc_len,
        |  length(t)::BIGINT AS raw_len
        |FROM p""".stripMargin,

    "tx10_lm_score" ->
      s"""WITH $wordsCte,
         |tok AS (SELECT doc_id, t FROM
         |  (SELECT doc_id, unnest(w) AS t FROM words) WHERE t <> ''),
         |cnt AS (SELECT t, count(*) AS c FROM tok WHERE doc_id < 250 GROUP BY 1),
         |stats AS (SELECT CAST(sum(c) AS BIGINT) AS tmass, count(*)::BIGINT AS v
         |          FROM cnt),
         |scored AS (
         |  SELECT tok.doc_id, count(*)::BIGINT AS n_tokens,
         |    CAST(sum(CAST(round(ln(coalesce(cnt.c, 0) + 1.0) * 1000000) AS BIGINT))
         |         AS BIGINT) AS s
         |  FROM tok LEFT JOIN cnt USING (t) GROUP BY 1)
         |SELECT doc_id, n_tokens,
         |  round(ln((tmass + v)::DOUBLE) - s::DOUBLE / 1000000 / n_tokens, 6)
         |    AS cross_entropy,
         |  round(exp(ln((tmass + v)::DOUBLE) - s::DOUBLE / 1000000 / n_tokens), 4)
         |    AS perplexity
         |FROM scored CROSS JOIN stats""".stripMargin,

    // tx10's scoring chain + CCNet sampled cutoffs: the rate-0.5 md5
    // sample's 1/3- and 2/3-quantiles under the (score, id) total order,
    // replayed as max-over-the-k-smallest; bucket labels by when-chain
    "tx13_ppl_buckets" ->
      s"""WITH $wordsCte,
         |tok AS (SELECT doc_id, t FROM
         |  (SELECT doc_id, unnest(w) AS t FROM words) WHERE t <> ''),
         |cnt AS (SELECT t, count(*) AS c FROM tok WHERE doc_id < 250 GROUP BY 1),
         |stats AS (SELECT CAST(sum(c) AS BIGINT) AS tmass, count(*)::BIGINT AS v
         |          FROM cnt),
         |scored AS (
         |  SELECT tok.doc_id, count(*)::BIGINT AS n_tokens,
         |    CAST(sum(CAST(round(ln(coalesce(cnt.c, 0) + 1.0) * 1000000) AS BIGINT))
         |         AS BIGINT) AS s
         |  FROM tok LEFT JOIN cnt USING (t) GROUP BY 1),
         |ce AS (
         |  SELECT doc_id,
         |    round(ln((tmass + v)::DOUBLE) - s::DOUBLE / 1000000 / n_tokens, 6)
         |      AS cross_entropy
         |  FROM scored CROSS JOIN stats),
         |samp AS (
         |  SELECT doc_id, cross_entropy FROM ce
         |  WHERE CAST(CAST(concat('0x', substr(md5(concat_ws('|', 'tx13', doc_id)), 1, 8))
         |        AS BIGINT) AS DOUBLE) / 4294967296.0 < 0.5),
         |nn AS (SELECT count(*)::BIGINT AS n FROM samp),
         |rk AS (SELECT cross_entropy,
         |         row_number() OVER (ORDER BY cross_entropy, doc_id) AS rn
         |       FROM samp),
         |cuts AS (SELECT
         |  (SELECT max(cross_entropy) FROM rk, nn WHERE rn <= ceil(n * (1.0/3))) AS c1,
         |  (SELECT max(cross_entropy) FROM rk, nn WHERE rn <= ceil(n * (2.0/3))) AS c2)
         |SELECT doc_id, cross_entropy,
         |  CASE WHEN cross_entropy <= c1 THEN 'head'
         |       WHEN cross_entropy <= c2 THEN 'middle'
         |       ELSE 'tail' END AS bucket
         |FROM ce CROSS JOIN cuts""".stripMargin,

    "sp4_dsir_weights" ->
      s"""WITH $wordsCte,
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
         |  FROM (SELECT doc_id, unnest(g) AS s FROM gr)),
         |tc AS (SELECT b, count(*) AS ct FROM feat
         |       WHERE doc_id IN (SELECT doc_id FROM documents WHERE source = 'src0')
         |       GROUP BY 1),
         |rc AS (SELECT b, count(*) AS cr FROM feat GROUP BY 1),
         |tbl AS (
         |  SELECT b,
         |    CAST(round((ln(coalesce(ct, 0) + 1.0) - ln(coalesce(cr, 0) + 1.0))
         |               * 1000000) AS BIGINT) AS m
         |  FROM tc FULL OUTER JOIN rc USING (b)),
         |tot AS (SELECT (SELECT CAST(sum(ct) AS BIGINT) FROM tc) AS tt,
         |               (SELECT CAST(sum(cr) AS BIGINT) FROM rc) AS tr),
         |sc AS (
         |  SELECT feat.doc_id, count(*)::BIGINT AS n_features,
         |    CAST(sum(coalesce(tbl.m, 0)) AS BIGINT) AS s
         |  FROM feat LEFT JOIN tbl USING (b) GROUP BY 1)
         |SELECT doc_id, n_features,
         |  round(s::DOUBLE / 1000000 / n_features
         |        + ln((tr + 256)::DOUBLE) - ln((tt + 256)::DOUBLE), 6) AS log_weight
         |FROM sc CROSS JOIN tot""".stripMargin,

    // SP12: sp4's weight chain → exp → the sp10 A-ES replay
    "sp12_dsir_sample" ->
      s"""WITH $wordsCte,
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
         |  FROM (SELECT doc_id, unnest(g) AS s FROM gr)),
         |tc AS (SELECT b, count(*) AS ct FROM feat
         |       WHERE doc_id IN (SELECT doc_id FROM documents WHERE source = 'src0')
         |       GROUP BY 1),
         |rc AS (SELECT b, count(*) AS cr FROM feat GROUP BY 1),
         |tbl AS (
         |  SELECT b,
         |    CAST(round((ln(coalesce(ct, 0) + 1.0) - ln(coalesce(cr, 0) + 1.0))
         |               * 1000000) AS BIGINT) AS m
         |  FROM tc FULL OUTER JOIN rc USING (b)),
         |tot AS (SELECT (SELECT CAST(sum(ct) AS BIGINT) FROM tc) AS tt,
         |               (SELECT CAST(sum(cr) AS BIGINT) FROM rc) AS tr),
         |sc AS (
         |  SELECT feat.doc_id, count(*)::BIGINT AS n_features,
         |    CAST(sum(coalesce(tbl.m, 0)) AS BIGINT) AS s
         |  FROM feat LEFT JOIN tbl USING (b) GROUP BY 1),
         |lw AS (
         |  SELECT doc_id,
         |    round(exp(round(s::DOUBLE / 1000000 / n_features
         |      + ln((tr + 256)::DOUBLE) - ln((tt + 256)::DOUBLE), 6)), 6)
         |      AS dsir_w
         |  FROM sc CROSS JOIN tot),
         |h AS (
         |  SELECT doc_id, dsir_w,
         |    round(ln(CAST(CAST(concat('0x', substr(md5(concat_ws('|', 'dsir',
         |      doc_id)), 1, 8)) AS BIGINT) AS DOUBLE) / 4294967296.0)
         |      / dsir_w, 9) AS sample_key
         |  FROM lw WHERE dsir_w IS NOT NULL AND dsir_w > 0)
         |SELECT doc_id, dsir_w, sample_key
         |FROM h ORDER BY sample_key DESC, doc_id LIMIT 100""".stripMargin,

    "dd13_line_dedup" ->
      """WITH planted AS (
        |  SELECT doc_id,
        |    text || chr(10) || 'Shared boilerplate footer' || chr(10) ||
        |    'row ' || doc_id::VARCHAR AS text
        |  FROM documents),
        |ls AS (SELECT doc_id, string_split(text, chr(10)) AS a FROM planted),
        |ln AS (
        |  SELECT doc_id, s.i AS p, s.l AS l FROM (
        |    SELECT doc_id, unnest(list_transform(a, (x, i) -> {'i': i, 'l': x})) AS s
        |    FROM ls)
        |  WHERE trim(s.l) <> ''),
        |kept AS (
        |  SELECT doc_id, p, l FROM ln
        |  QUALIFY row_number() OVER (PARTITION BY l ORDER BY doc_id, p) = 1)
        |SELECT doc_id, md5(string_agg(l, chr(10) ORDER BY p)) AS text_md5
        |FROM kept GROUP BY 1""".stripMargin,

    "dd14_redact_spans" ->
      s"""WITH $wordsCte,
         |tok AS (
         |  SELECT doc_id, s.i AS p, s.l AS tokn FROM (
         |    SELECT doc_id, unnest(list_transform(w, (x, i) -> {'i': i, 'l': x})) AS s
         |    FROM words)
         |  WHERE s.l <> '' AND doc_id >= 50),
         |gr AS (
         |  SELECT doc_id, s.i AS p, s.g AS g FROM (
         |    SELECT doc_id,
         |      unnest(CASE WHEN len(w) >= 5
         |             THEN list_transform(range(1, len(w) - 3),
         |                    i -> {'i': i, 'g': array_to_string(w[i:i+4], ' ')})
         |             ELSE [] END) AS s
         |    FROM words WHERE doc_id >= 50)),
         |refs AS (SELECT DISTINCT * FROM (
         |  SELECT unnest(CASE WHEN len(w) >= 5
         |           THEN list_transform(range(1, len(w) - 3),
         |                  i -> array_to_string(w[i:i+4], ' '))
         |           ELSE [] END) AS g
         |  FROM words WHERE doc_id < 50)),
         |covered AS (
         |  SELECT DISTINCT gr.doc_id, gr.p + t.o AS p
         |  FROM gr JOIN refs USING (g), range(0, 5) t(o)),
         |kept AS (
         |  SELECT t.doc_id, t.p, t.tokn
         |  FROM tok t LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.p = c.p
         |  WHERE c.doc_id IS NULL)
         |SELECT doc_id, count(*)::BIGINT AS n_tokens,
         |  md5(string_agg(tokn, ' ' ORDER BY p)) AS redacted_md5
         |FROM kept GROUP BY 1""".stripMargin,

    // most-frequent trigrams with occurrence and doc counts
    "tx14_top_ngrams" ->
      s"""WITH $shinglesCte,
         |g AS (SELECT doc_id, unnest(sh) AS ngram FROM sh)
         |SELECT ngram, count(*)::BIGINT AS occurrences,
         |  count(DISTINCT doc_id)::BIGINT AS docs
         |FROM g GROUP BY 1 HAVING count(*) >= 2
         |ORDER BY occurrences DESC, ngram LIMIT 50""".stripMargin,

    // best doc per source under (tx3 quality DESC, doc_id): the ranking
    // uses the 6-rounded quality BOTH engines agree on exactly
    "dd17_source_best" -> {
      val stop = langScore("en")
      s"""WITH $ltCte,
         |comp AS (
         |  SELECT doc_id, source,
         |    CASE WHEN length(trim(text)) = 0 THEN 0
         |         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS tok,
         |    length(text) AS n,
         |    length(regexp_replace(trim(text), '\\s+', '', 'g')) AS nospace,
         |    (length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))) AS alpha,
         |    (length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))) AS digit,
         |    ($stop) AS stops
         |  FROM lt),
         |q AS (
         |  SELECT doc_id, source,
         |    round((CASE WHEN n > 0 THEN alpha::DOUBLE / n ELSE 0.0 END) * 0.4 +
         |      (CASE WHEN tok > 0 AND nospace::DOUBLE / tok >= 3
         |                 AND nospace::DOUBLE / tok <= 10
         |            THEN 1.0 ELSE 0.0 END) * 0.2 +
         |      least((CASE WHEN tok > 0 THEN stops::DOUBLE / tok ELSE 0.0 END)
         |            * 5.0, 1.0) * 0.2 +
         |      (1.0 - least((CASE WHEN n > 0 THEN digit::DOUBLE / n
         |                    ELSE 0.0 END) * 5.0, 1.0)) * 0.2, 6) AS quality
         |  FROM comp)
         |SELECT source, doc_id, quality FROM q
         |QUALIFY row_number()
         |  OVER (PARTITION BY source
         |        ORDER BY quality DESC NULLS LAST, doc_id) = 1""".stripMargin
    },

    // ExactSubstr self-dedup: rank every 5-gram occurrence by
    // (doc_id, position); rank > 1 occurrences excise their 5 covered
    // tokens; docs reassemble from survivors in original order
    "dd16_exact_substrings" ->
      s"""WITH $wordsCte,
         |tok AS (
         |  SELECT doc_id, s.i AS p, s.l AS tokn FROM (
         |    SELECT doc_id, unnest(list_transform(w, (x, i) -> {'i': i, 'l': x})) AS s
         |    FROM words)
         |  WHERE s.l <> ''),
         |gr AS (
         |  SELECT doc_id, s.i AS p, s.g AS g FROM (
         |    SELECT doc_id,
         |      unnest(CASE WHEN len(w) >= 5
         |             THEN list_transform(range(1, len(w) - 3),
         |                    i -> {'i': i, 'g': array_to_string(w[i:i+4], ' ')})
         |             ELSE [] END) AS s
         |    FROM words)),
         |ranked AS (
         |  SELECT doc_id, p,
         |    row_number() OVER (PARTITION BY g ORDER BY doc_id, p) AS rn
         |  FROM gr),
         |covered AS (
         |  SELECT DISTINCT r.doc_id, r.p + t.o AS p
         |  FROM ranked r, range(0, 5) t(o) WHERE r.rn > 1),
         |kept AS (
         |  SELECT t.doc_id, t.p, t.tokn
         |  FROM tok t LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.p = c.p
         |  WHERE c.doc_id IS NULL)
         |SELECT doc_id, count(*)::BIGINT AS n_tokens,
         |  md5(string_agg(tokn, ' ' ORDER BY p)) AS dedup_md5
         |FROM kept GROUP BY 1""".stripMargin,

    "dd11_ngram_overlap" ->
      s"""WITH ${overlapCte(5)}
         |SELECT cg.doc_id AS corpus_id, count(*)::BIGINT AS hits
         |FROM cg JOIN ref USING (s)
         |GROUP BY 1""".stripMargin,

    // containment = hits over the doc's own distinct gram count; the
    // flag compares the 6-decimal-rounded fraction, as the Spark side
    "dd15_containment" ->
      s"""WITH ${overlapCte(5)}
         |SELECT corpus_id, n_grams, hits,
         |  round(hits::DOUBLE / n_grams, 6) AS containment,
         |  round(hits::DOUBLE / n_grams, 6) >= 0.7 AS contaminated
         |FROM (
         |  SELECT cg.doc_id AS corpus_id, count(*)::BIGINT AS n_grams,
         |    CAST(sum(CASE WHEN ref.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |      AS hits
         |  FROM cg LEFT JOIN ref USING (s)
         |  GROUP BY 1)""".stripMargin,

    // URL normalization: the oracle derives the EXPECTED canonical form
    // independently from the construction recipe (scheme/host lowered,
    // www and utm_source stripped, fragment dropped, path case kept) —
    // pinning every rule at corpus scale rather than re-running the
    // regex chain
    "ur1_normalize" ->
      """SELECT doc_id,
        |  'https://' || lower(source) || '.com/' || lang || '/Doc/' ||
        |    doc_id || '?page=' || (doc_id % 7) AS url_norm,
        |  lower(source) || '.com' AS domain
        |FROM documents""".stripMargin,

    // exact-URL dedup: tracking-only query variants collapse per
    // (source, lang) page → lowest doc_id survives
    "ur2_url_dedup" ->
      """SELECT doc_id, source, lang FROM (
        |  SELECT doc_id, source, lang,
        |    row_number() OVER (PARTITION BY source, lang ORDER BY doc_id)
        |      AS rn
        |  FROM documents) WHERE rn = 1""".stripMargin,

    // domain cap: crawl.{source}.co.uk registers as {source}.co.uk
    // (multi-part suffix), ≤ 25 docs per domain by (md5(id), id)
    "ur3_domain_cap" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents) WHERE rn <= 25""".stripMargin,

    // top-V vocabulary: count over the unigram stream (empty-split
    // artifact dropped), deterministic (cnt DESC, word) tie-break
    "tx15_vocab" ->
      s"""WITH $wordsCte,
         |tok AS (SELECT doc_id, unnest(w) AS s FROM words),
         |c AS (SELECT s AS word, count(*)::BIGINT AS cnt
         |      FROM tok WHERE s <> '' GROUP BY 1),
         |r AS (SELECT word, cnt,
         |        CAST(row_number() OVER (ORDER BY cnt DESC, word) AS BIGINT)
         |          AS "rank"
         |      FROM c)
         |SELECT * FROM r WHERE "rank" <= 100""".stripMargin,

    // per-doc OOV mass vs the same top-100 vocabulary; wordless docs
    // emit 0 tokens with a null rate
    // ML33: cl2's NB scoring chain, parameterized per training
    // fraction (nested md5 samples), accuracy over the fixed holdout
    "ml33_nb_learning_curve" -> {
      def hu(seedExpr: String): String =
        s"CAST(CAST(concat('0x', substr(md5(concat_ws('|', $seedExpr, " +
          "doc_id)), 1, 8)) AS BIGINT) AS DOUBLE) / 4294967296.0"
      val inHoldout = s"${hu("'lc'")} >= 0.8"
      def inTrain(f: String): String =
        s"${hu("'lc'")} < 0.8 AND ${hu("'lc-f'")} < $f"
      def curve(tag: String, f: String): String =
        s"""model_$tag AS (
           |  SELECT d.lang AS label, f.b, count(*) AS cnt,
           |    CAST(round(ln(count(*) + 1.0) * 1000000) AS BIGINT) AS m
           |  FROM feat f JOIN documents d USING (doc_id)
           |  WHERE ${inTrain(f)} GROUP BY 1, 2),
           |tot_$tag AS (
           |  SELECT label, CAST(sum(cnt) AS BIGINT) AS T
           |  FROM model_$tag GROUP BY 1),
           |pri_$tag AS (
           |  SELECT lang AS label, count(*) AS nl
           |  FROM documents WHERE ${inTrain(f)} GROUP BY 1),
           |nn_$tag AS (SELECT CAST(sum(nl) AS BIGINT) AS N FROM pri_$tag),
           |stats_$tag AS (
           |  SELECT label, ln(nl::DOUBLE / N) AS prior,
           |    ln((T + 256)::DOUBLE) AS lntb
           |  FROM tot_$tag JOIN pri_$tag USING (label) CROSS JOIN nn_$tag),
           |sc_$tag AS (
           |  SELECT f.doc_id, s.label,
           |    CAST(CAST(sum(coalesce(mo.m, 0)) AS BIGINT) AS DOUBLE)
           |      / 1000000
           |      - count(*)::DOUBLE * s.lntb + s.prior AS score
           |  FROM (SELECT doc_id, b FROM feat WHERE $inHoldout) f
           |  CROSS JOIN stats_$tag s
           |  LEFT JOIN model_$tag mo ON mo.label = s.label AND mo.b = f.b
           |  GROUP BY f.doc_id, s.label, s.lntb, s.prior),
           |r_$tag AS (
           |  SELECT doc_id, label,
           |    row_number() OVER (PARTITION BY doc_id
           |      ORDER BY score DESC, label) AS rn
           |  FROM sc_$tag),
           |acc_$tag AS (
           |  SELECT CAST($f AS DOUBLE) AS fraction,
           |    (SELECT count(*)::BIGINT FROM documents WHERE ${inTrain(f)})
           |      AS n_train,
           |    count(*)::BIGINT AS n_holdout,
           |    CAST(sum(CASE WHEN r.label = d.lang THEN 1 ELSE 0 END)
           |      AS BIGINT) AS n_correct,
           |    round(sum(CASE WHEN r.label = d.lang THEN 1 ELSE 0 END)::DOUBLE
           |      / count(*), 6) AS accuracy
           |  FROM r_$tag r JOIN documents d USING (doc_id) WHERE rn = 1)"""
          .stripMargin
      s"""WITH $wordsCte,
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
         |${curve("a", "0.25")},
         |${curve("b", "0.5")},
         |${curve("c", "1.0")}
         |SELECT * FROM acc_a
         |UNION ALL SELECT * FROM acc_b
         |UNION ALL SELECT * FROM acc_c""".stripMargin
    },

    // ML38: source ablation — ml33's NB chain instantiated once per
    // excluded source (same feature hashing, same micro-nat model
    // quantization, same deterministic argmax), deltas vs acc_full
    "ml38_source_ablation" -> {
      def hu(seedExpr: String): String =
        s"CAST(CAST(concat('0x', substr(md5(concat_ws('|', $seedExpr, " +
          "doc_id)), 1, 8)) AS BIGINT) AS DOUBLE) / 4294967296.0"
      val inHoldout = s"${hu("'ab'")} >= 0.8"
      def inTrain(excl: Option[String]): String =
        s"${hu("'ab'")} < 0.8" +
          excl.map(s => s" AND source <> '$s'").getOrElse("")
      def chain(tag: String, excl: Option[String], label: String): String =
        s"""model_$tag AS (
           |  SELECT d.lang AS label, f.b, count(*) AS cnt,
           |    CAST(round(ln(count(*) + 1.0) * 1000000) AS BIGINT) AS m
           |  FROM feat f JOIN documents d USING (doc_id)
           |  WHERE ${inTrain(excl)} GROUP BY 1, 2),
           |tot_$tag AS (
           |  SELECT label, CAST(sum(cnt) AS BIGINT) AS T
           |  FROM model_$tag GROUP BY 1),
           |pri_$tag AS (
           |  SELECT lang AS label, count(*) AS nl
           |  FROM documents WHERE ${inTrain(excl)} GROUP BY 1),
           |nn_$tag AS (SELECT CAST(sum(nl) AS BIGINT) AS N FROM pri_$tag),
           |stats_$tag AS (
           |  SELECT label, ln(nl::DOUBLE / N) AS prior,
           |    ln((T + 256)::DOUBLE) AS lntb
           |  FROM tot_$tag JOIN pri_$tag USING (label) CROSS JOIN nn_$tag),
           |sc_$tag AS (
           |  SELECT f.doc_id, s.label,
           |    CAST(CAST(sum(coalesce(mo.m, 0)) AS BIGINT) AS DOUBLE)
           |      / 1000000
           |      - count(*)::DOUBLE * s.lntb + s.prior AS score
           |  FROM (SELECT doc_id, b FROM feat WHERE $inHoldout) f
           |  CROSS JOIN stats_$tag s
           |  LEFT JOIN model_$tag mo ON mo.label = s.label AND mo.b = f.b
           |  GROUP BY f.doc_id, s.label, s.lntb, s.prior),
           |r_$tag AS (
           |  SELECT doc_id, label,
           |    row_number() OVER (PARTITION BY doc_id
           |      ORDER BY score DESC, label) AS rn
           |  FROM sc_$tag),
           |acc_$tag AS (
           |  SELECT '$label' AS excluded_source,
           |    (SELECT count(*)::BIGINT FROM documents
           |     WHERE ${inTrain(excl)}) AS n_train,
           |    count(*)::BIGINT AS n_holdout,
           |    CAST(sum(CASE WHEN r.label = d.lang THEN 1 ELSE 0 END)
           |      AS BIGINT) AS n_correct,
           |    round(sum(CASE WHEN r.label = d.lang THEN 1 ELSE 0 END)::DOUBLE
           |      / count(*), 6) AS accuracy
           |  FROM r_$tag r JOIN documents d USING (doc_id) WHERE rn = 1)"""
          .stripMargin
      val sources = Seq("src0", "src5", "src10", "src15")
      val chains = chain("full", None, "(none)") +: sources.zipWithIndex
        .map { case (s, i) => chain(s"a$i", Some(s), s) }
      val selects = ("full" +: sources.indices.map(i => s"a$i"))
        .map(t => s"SELECT * FROM acc_$t")
        .mkString("\n        |  UNION ALL ")
      s"""WITH $wordsCte,
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
         |${chains.mkString(",\n")},
         |uni AS (
         |  ${selects})
         |SELECT u.*,
         |  round(u.accuracy - (SELECT accuracy FROM acc_full), 6)
         |    AS delta_vs_full
         |FROM uni u""".stripMargin
    },

    // SP14: IPF raking — 3 unrolled row/col scaling passes, each
    // re-rounding micro masses (MATERIALIZED per step; the gr5 lesson)
    "sp14_raking" -> {
      def scale(prev: String, tag: String, dim: String,
          target: String): String =
        s"""$tag AS MATERIALIZED (
           |  SELECT row_val, col_val, n,
           |    CAST(round(m::DOUBLE * ((SELECT N FROM dims)::DOUBLE
           |      * 1000000.0 / (SELECT $target FROM dims)::DOUBLE
           |      / S::DOUBLE)) AS BIGINT) AS m
           |  FROM (SELECT *, CAST(sum(m) OVER (PARTITION BY $dim)
           |          AS BIGINT) AS S
           |        FROM $prev))""".stripMargin
      val steps = (1 to 3).flatMap { i =>
        val prev = if (i == 1) "cells0" else s"c${i - 1}"
        Seq(scale(prev, s"r$i", "row_val", "R"),
          scale(s"r$i", s"c$i", "col_val", "C"))
      }.mkString(",\n")
      s"""WITH cells0 AS MATERIALIZED (
         |  SELECT lang AS row_val, source AS col_val,
         |    count(*)::BIGINT AS n, count(*)::BIGINT * 1000000 AS m
         |  FROM documents GROUP BY 1, 2),
         |dims AS (
         |  SELECT CAST(sum(n) AS BIGINT) AS N,
         |    count(DISTINCT row_val)::BIGINT AS R,
         |    count(DISTINCT col_val)::BIGINT AS C
         |  FROM cells0),
         |$steps
         |SELECT row_val, col_val, n,
         |  round(m::DOUBLE / 1e6 / n::DOUBLE, 6) AS weight,
         |  round(m::DOUBLE / 1e6 / (SELECT N FROM dims)::DOUBLE, 6)
         |    AS fitted_share
         |FROM c3""".stripMargin
    },

    // ML39: McNemar — ml38's two NB chains to per-doc predictions,
    // exact disagreement cells, one IEEE division
    "ml39_mcnemar" -> {
      def hu(seedExpr: String): String =
        s"CAST(CAST(concat('0x', substr(md5(concat_ws('|', $seedExpr, " +
          "doc_id)), 1, 8)) AS BIGINT) AS DOUBLE) / 4294967296.0"
      val inHoldout = s"${hu("'ab'")} >= 0.8"
      def inTrain(excl: Option[String]): String =
        s"${hu("'ab'")} < 0.8" +
          excl.map(s => s" AND source <> '$s'").getOrElse("")
      def chain(tag: String, excl: Option[String]): String =
        s"""model_$tag AS (
           |  SELECT d.lang AS label, f.b, count(*) AS cnt,
           |    CAST(round(ln(count(*) + 1.0) * 1000000) AS BIGINT) AS m
           |  FROM feat f JOIN documents d USING (doc_id)
           |  WHERE ${inTrain(excl)} GROUP BY 1, 2),
           |tot_$tag AS (
           |  SELECT label, CAST(sum(cnt) AS BIGINT) AS T
           |  FROM model_$tag GROUP BY 1),
           |pri_$tag AS (
           |  SELECT lang AS label, count(*) AS nl
           |  FROM documents WHERE ${inTrain(excl)} GROUP BY 1),
           |nn_$tag AS (SELECT CAST(sum(nl) AS BIGINT) AS N FROM pri_$tag),
           |stats_$tag AS (
           |  SELECT label, ln(nl::DOUBLE / N) AS prior,
           |    ln((T + 256)::DOUBLE) AS lntb
           |  FROM tot_$tag JOIN pri_$tag USING (label) CROSS JOIN nn_$tag),
           |sc_$tag AS (
           |  SELECT f.doc_id, s.label,
           |    CAST(CAST(sum(coalesce(mo.m, 0)) AS BIGINT) AS DOUBLE)
           |      / 1000000
           |      - count(*)::DOUBLE * s.lntb + s.prior AS score
           |  FROM (SELECT doc_id, b FROM feat WHERE $inHoldout) f
           |  CROSS JOIN stats_$tag s
           |  LEFT JOIN model_$tag mo ON mo.label = s.label AND mo.b = f.b
           |  GROUP BY f.doc_id, s.label, s.lntb, s.prior),
           |r_$tag AS (
           |  SELECT doc_id, label,
           |    row_number() OVER (PARTITION BY doc_id
           |      ORDER BY score DESC, label) AS rn
           |  FROM sc_$tag)""".stripMargin
      s"""WITH $wordsCte,
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
         |${chain("full", None)},
         |${chain("abl", Some("src0"))},
         |cells AS (
         |  SELECT count(*)::BIGINT AS n_holdout,
         |    CAST(sum(CASE WHEN pf.label = d.lang AND pa.label <> d.lang
         |      THEN 1 ELSE 0 END) AS BIGINT) AS b,
         |    CAST(sum(CASE WHEN pf.label <> d.lang AND pa.label = d.lang
         |      THEN 1 ELSE 0 END) AS BIGINT) AS c
         |  FROM (SELECT doc_id, label FROM r_full WHERE rn = 1) pf
         |  JOIN (SELECT doc_id, label FROM r_abl WHERE rn = 1) pa
         |    USING (doc_id)
         |  JOIN documents d USING (doc_id))
         |SELECT n_holdout, b, c,
         |  round(CASE WHEN b + c > 0 THEN
         |    ((b - c) * (b - c))::DOUBLE / (b + c)::DOUBLE END, 6) AS chisq
         |FROM cells""".stripMargin
    },

    // CL5: same presence counts, complete grid, and per-cell
    // micro-nat quantization as Vocab.featureMi
    "cl5_feature_mi" ->
      s"""WITH $wordsCte,
         |tok AS (SELECT doc_id, s FROM
         |  (SELECT doc_id, unnest(w) AS s FROM words) WHERE s <> ''),
         |vcab AS (
         |  SELECT s AS word FROM tok GROUP BY 1
         |  ORDER BY count(*) DESC, s LIMIT 50),
         |pres AS (
         |  SELECT DISTINCT tok.doc_id, tok.s AS word
         |  FROM tok JOIN vcab ON tok.s = vcab.word),
         |presc AS (
         |  SELECT p.word, d.source AS c
         |  FROM pres p JOIN documents d USING (doc_id)),
         |ntc AS (
         |  SELECT word, c, count(*)::BIGINT AS ntc FROM presc GROUP BY 1, 2),
         |nc AS (
         |  SELECT source AS c, count(*)::BIGINT AS nc
         |  FROM documents GROUP BY 1),
         |nt AS (
         |  SELECT word, CAST(sum(ntc) AS BIGINT) AS nt FROM ntc GROUP BY 1),
         |nn AS (SELECT count(*)::BIGINT AS N FROM documents),
         |grid AS (
         |  SELECT v.word, nc.nc,
         |    coalesce(ntc.ntc, 0) AS ntc, nt.nt, nn.N
         |  FROM vcab v CROSS JOIN nc
         |  LEFT JOIN ntc ON ntc.word = v.word AND ntc.c = nc.c
         |  JOIN nt ON nt.word = v.word, nn),
         |q AS (
         |  SELECT word, CAST(round((
         |    CASE WHEN ntc > 0
         |      THEN ntc::DOUBLE / N *
         |        ln((ntc*N)::DOUBLE / (nt*nc)::DOUBLE) ELSE 0.0 END
         |    + CASE WHEN (nc - ntc) > 0 AND N > nt
         |      THEN (nc - ntc)::DOUBLE / N *
         |        ln(((nc - ntc)*N)::DOUBLE / ((N - nt)*nc)::DOUBLE)
         |      ELSE 0.0 END) * 1e12) AS BIGINT) AS q
         |  FROM grid)
         |SELECT word, round(CAST(sum(q) AS BIGINT)::DOUBLE / 1e12, 6) AS mi
         |FROM q GROUP BY 1""".stripMargin,

    "tx16_oov" ->
      s"""WITH $wordsCte,
         |tok AS (SELECT doc_id, s FROM
         |  (SELECT doc_id, unnest(w) AS s FROM words) WHERE s <> ''),
         |c AS (SELECT s AS word, count(*)::BIGINT AS cnt
         |      FROM tok GROUP BY 1),
         |v AS (SELECT word FROM
         |  (SELECT word, row_number() OVER (ORDER BY cnt DESC, word) AS rn
         |   FROM c) WHERE rn <= 100),
         |st AS (
         |  SELECT t.doc_id, count(*)::BIGINT AS n_tokens,
         |    CAST(sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_oov
         |  FROM tok t LEFT JOIN v ON t.s = v.word
         |  GROUP BY 1)
         |SELECT d.doc_id, coalesce(st.n_tokens, 0) AS n_tokens,
         |  coalesce(st.n_oov, 0) AS n_oov,
         |  round(st.n_oov::DOUBLE / st.n_tokens, 6) AS oov_rate
         |FROM documents d LEFT JOIN st ON d.doc_id = st.doc_id""".stripMargin,

    // encoding-damage census: exact artifact counts + the conservative
    // suspect verdict
    "tx24_encoding" ->
      """SELECT doc_id, n_replacement, n_control, n_mojibake,
        |  (n_replacement > 0 OR n_control > 0 OR n_mojibake > 2) AS suspect
        |FROM (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '�')) AS BIGINT)
        |      AS n_replacement,
        |    CAST(len(regexp_extract_all(text,
        |      '[\x00-\x08\x0B\x0C\x0E-\x1F]')) AS BIGINT) AS n_control,
        |    CAST(len(regexp_extract_all(text, 'Ã|â€')) AS BIGINT)
        |      AS n_mojibake
        |  FROM documents) q""".stripMargin,

    // Flesch reading ease: exact sentence/word/vowel-group counts,
    // per-row IEEE score at 6dp
    "tx23_readability" ->
      """SELECT doc_id, n_sentences, n_words, n_syllables,
        |  round(CASE WHEN n_words > 0 AND n_sentences > 0
        |    THEN 206.835 - 1.015 * n_words::DOUBLE / n_sentences
        |       - 84.6 * n_syllables::DOUBLE / n_words END, 6) AS flesch
        |FROM (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split_regex(text, '[.!?]+'),
        |      s -> trim(s) <> '')) AS BIGINT) AS n_sentences,
        |    CAST(len(list_filter(regexp_split_to_array(
        |      trim(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g')),
        |      '\s+'), w -> w <> '')) AS BIGINT) AS n_words,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
        |      AS BIGINT) AS n_syllables
        |  FROM documents) q""".stripMargin,

    // SP10: A-ES weighted sample — ln(u)/w keys rounded to 9dp, top-k
    // by (key DESC, id)
    "sp10_weighted_sample" ->
      """WITH h AS (
        |  SELECT doc_id, source, n_chars,
        |    round(ln(CAST(CAST(concat('0x', substr(md5(concat_ws('|', 'ws',
        |      doc_id)), 1, 8)) AS BIGINT) AS DOUBLE) / 4294967296.0)
        |      / n_chars, 9) AS sample_key
        |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0)
        |SELECT doc_id, source, n_chars, sample_key
        |FROM h ORDER BY sample_key DESC, doc_id LIMIT 100""".stripMargin,

    // Zipf fit over the top-100 word frequencies: exact counts/ranks,
    // regr_slope/regr_r2 of ln(count) on ln(rank) (both engines use the
    // SQL-standard covariance algebra; 6dp absorbs accumulation ulps)
    "tx21_zipf" ->
      s"""WITH $wordsCte,
         |tok AS (SELECT doc_id, unnest(w) AS s FROM words),
         |c AS (SELECT s AS word, count(*)::BIGINT AS cnt
         |      FROM tok WHERE s <> '' GROUP BY 1),
         |r AS (SELECT word, cnt,
         |        CAST(row_number() OVER (ORDER BY cnt DESC, word) AS BIGINT)
         |          AS rn
         |      FROM c),
         |v AS (SELECT * FROM r WHERE rn <= 100)
         |SELECT CAST(count(*) AS BIGINT) AS n_types,
         |  CAST(sum(cnt) AS BIGINT) AS n_tokens,
         |  round(regr_slope(ln(cnt), ln(rn)), 6) AS zipf_slope,
         |  round(regr_r2(ln(cnt), ln(rn)), 6) AS zipf_r2
         |FROM v""".stripMargin,

    // Heaps fit: nested samples via per-word min doc-hash — one pass,
    // fraction literals are the Scala doubles inlined
    "tx26_heaps" -> {
      val fr = (1 to 10).map(_ / 10.0).mkString(", ")
      s"""WITH $wordsCte,
         |tok AS (SELECT doc_id, s FROM
         |  (SELECT doc_id, unnest(w) AS s FROM words) q WHERE s <> ''),
         |tu AS (
         |  SELECT doc_id, s,
         |    CAST(CAST(concat('0x', substr(md5(concat_ws('|', 'heaps',
         |      doc_id)), 1, 8)) AS BIGINT) AS DOUBLE) / 4294967296.0 AS u
         |  FROM tok),
         |pw AS (SELECT s, min(u) AS umin FROM tu GROUP BY s),
         |fr AS (SELECT unnest([$fr]) AS f),
         |vv AS (
         |  SELECT fr.f,
         |    CAST(sum(CASE WHEN pw.umin < fr.f THEN 1 ELSE 0 END) AS BIGINT)
         |      AS v
         |  FROM fr, pw GROUP BY fr.f),
         |nn AS (
         |  SELECT fr.f,
         |    CAST(sum(CASE WHEN tu.u < fr.f THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n
         |  FROM fr, tu GROUP BY fr.f),
         |pt AS (SELECT vv.f, v, n FROM vv JOIN nn ON vv.f = nn.f
         |       WHERE v > 0 AND n > 0)
         |SELECT count(*)::BIGINT AS n_points,
         |  round(regr_slope(ln(v), ln(n)), 6) AS heaps_beta,
         |  round(regr_r2(ln(v), ln(n)), 6) AS heaps_r2,
         |  max(v) AS v_full, max(n) AS n_full
         |FROM pt""".stripMargin
    },

    // KL/JS between the even/odd doc_id halves: add-one smoothing over
    // the union vocab, per-word contributions quantized to integer
    // picos before the sum (the micro-nat determinism pattern)
    "tx22_divergence" ->
      s"""WITH $wordsCte,
         |tk AS (SELECT doc_id, s FROM
         |  (SELECT doc_id, unnest(w) AS s FROM words) WHERE s <> ''),
         |ca AS (SELECT s, count(*)::BIGINT AS c FROM tk
         |       WHERE doc_id % 2 = 0 GROUP BY 1),
         |cb AS (SELECT s, count(*)::BIGINT AS c FROM tk
         |       WHERE doc_id % 2 = 1 GROUP BY 1),
         |j AS (SELECT coalesce(ca.c, 0) AS x, coalesce(cb.c, 0) AS y
         |      FROM ca FULL OUTER JOIN cb ON ca.s = cb.s),
         |st AS (SELECT count(*)::BIGINT AS V, CAST(sum(x) AS BIGINT) AS na,
         |              CAST(sum(y) AS BIGINT) AS nb FROM j),
         |k AS (SELECT V, na, nb,
         |        (x + 1)::DOUBLE / (na + V) AS p,
         |        (y + 1)::DOUBLE / (nb + V) AS q
         |      FROM j, st)
         |SELECT CAST(max(V) AS BIGINT) AS vocab_size,
         |  CAST(max(na) AS BIGINT) AS n_tokens_a,
         |  CAST(max(nb) AS BIGINT) AS n_tokens_b,
         |  round(sum(CAST(round(p * ln(p / q) * 1e12) AS HUGEINT))::DOUBLE
         |    / 1e12, 6) AS kl_ab,
         |  round(sum(CAST(round(q * ln(q / p) * 1e12) AS HUGEINT))::DOUBLE
         |    / 1e12, 6) AS kl_ba,
         |  round(sum(CAST(round(0.5 * (p * ln(p / ((p + q) / 2)) +
         |    q * ln(q / ((p + q) / 2))) * 1e12) AS HUGEINT))::DOUBLE
         |    / 1e12, 6) AS js
         |FROM k""".stripMargin,

    // Bloom membership, bit-exact: same md5-slice double hashing as the
    // engine (h1 = md5[1..14], h2 = md5[15..28] forced odd, both mod m
    // BEFORE the i·h2 multiply), filter = distinct positions over the
    // ref grams, gram hit = all k probe positions set
    "dd19_bloom" ->
      s"""WITH ${overlapCte(5)},
         |filt AS (
         |  SELECT DISTINCT
         |    ((CAST(concat('0x', substr(md5(s), 1, 14)) AS BIGINT) % 65536) +
         |     i * ((CAST(concat('0x', substr(md5(s), 15, 14)) AS BIGINT) | 1)
         |          % 65536)) % 65536 AS pos
         |  FROM ref CROSS JOIN (SELECT unnest(range(4)) AS i)),
         |cgpos AS (
         |  SELECT doc_id, s,
         |    ((CAST(concat('0x', substr(md5(s), 1, 14)) AS BIGINT) % 65536) +
         |     i * ((CAST(concat('0x', substr(md5(s), 15, 14)) AS BIGINT) | 1)
         |          % 65536)) % 65536 AS pos
         |  FROM cg CROSS JOIN (SELECT unnest(range(4)) AS i)),
         |gh AS (
         |  SELECT c.doc_id, c.s,
         |    CAST(sum(CASE WHEN f.pos IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |      AS nset
         |  FROM cgpos c LEFT JOIN filt f ON c.pos = f.pos
         |  GROUP BY 1, 2),
         |dh AS (
         |  SELECT doc_id, count(*)::BIGINT AS n_grams,
         |    CAST(sum(CASE WHEN nset = 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
         |  FROM gh GROUP BY 1)
         |SELECT d.doc_id, coalesce(n_grams, 0) AS n_grams,
         |  coalesce(n_hits, 0) AS n_hits,
         |  coalesce(n_hits, 0) >= 1 AS contaminated
         |FROM documents d LEFT JOIN dh USING (doc_id)
         |WHERE d.doc_id >= 50""".stripMargin,

    "dd12_exact_decontaminated" ->
      s"""WITH ${overlapCte(5)}
         |SELECT doc_id FROM documents
         |WHERE doc_id >= 50 AND doc_id NOT IN (
         |  SELECT DISTINCT cg.doc_id FROM cg JOIN ref USING (s))""".stripMargin,

    "dd6_embedding_neardup" -> {
      val cos = cosine("a.embedding", "b.embedding")
      s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b, round($cos, 4) AS cosine
         |FROM embeddings a JOIN embeddings b
         |  ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE $cos >= 0.3""".stripMargin
    },

    // SIM12: diversity = 2·(E‖x‖² − ‖Ex‖²) from per-dim exact sums
    "sim12_diversity" ->
      """WITH dims AS (
        |  SELECT unnest(generate_series(1, len(embedding))) AS d, embedding
        |  FROM embeddings),
        |vals AS (
        |  SELECT d, CAST(round(embedding[d]::DOUBLE * 1e6) AS HUGEINT) AS q
        |  FROM dims),
        |pd AS (
        |  SELECT d, count(*)::BIGINT AS n, sum(q) AS s, sum(q * q) AS ss
        |  FROM vals GROUP BY d),
        |fold AS (
        |  SELECT max(n) AS n, count(*)::BIGINT AS n_dims,
        |    sum(ss::DOUBLE / n / 1e12) AS msn,
        |    sum((s::DOUBLE / n / 1e6) * (s::DOUBLE / n / 1e6)) AS csn
        |  FROM pd)
        |SELECT n, n_dims, round(msn, 6) AS mean_sq_norm,
        |  round(csn, 6) AS centroid_sq_norm,
        |  round(2.0 * (msn - csn), 6) AS diversity
        |FROM fold""".stripMargin,

    // SIM11: centroid drift — per-dim micro-exact means (1-based list
    // index ↔ posexplode's 0-based: only the grouping key, never output)
    "sim11_centroid_drift" ->
      """WITH dims AS (
        |  SELECT vec_id % 2 = 0 AS ga,
        |    unnest(generate_series(1, len(embedding))) AS d, embedding
        |  FROM embeddings),
        |vals AS (SELECT ga, d, embedding[d]::DOUBLE AS x FROM dims),
        |pd AS (
        |  SELECT d,
        |    sum(CASE WHEN ga THEN CAST(round(x * 1e6) AS BIGINT) END) AS sa,
        |    CAST(sum(CASE WHEN ga THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |    sum(CASE WHEN NOT ga THEN CAST(round(x * 1e6) AS BIGINT) END) AS sb,
        |    CAST(sum(CASE WHEN NOT ga THEN 1 ELSE 0 END) AS BIGINT) AS nb
        |  FROM vals GROUP BY d),
        |ct AS (
        |  SELECT d, na, nb,
        |    sa::DOUBLE / na / 1e6 AS ca, sb::DOUBLE / nb / 1e6 AS cb
        |  FROM pd)
        |SELECT count(*)::BIGINT AS n_dims,
        |  max(na) AS n_a, max(nb) AS n_b,
        |  round(CASE WHEN sum(ca*ca) > 0 AND sum(cb*cb) > 0
        |        THEN sum(ca*cb) / sqrt(sum(ca*ca) * sum(cb*cb)) END, 6)
        |    AS cosine,
        |  round(sqrt(sum((ca-cb)*(ca-cb))), 6) AS l2
        |FROM ct""".stripMargin,

    "sim1_bruteforce_topk" -> {
      val cos = cosine("q.embedding", "c.embedding")
      s"""WITH scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |         round($cos, 6) AS cosine
         |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
         |  WHERE q.vec_id < 5),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
         |FROM ranked WHERE rank <= 5""".stripMargin
    },

    // SIM15: the greedy unrolled step by step (MATERIALIZED selections,
    // the bpe/pagerank discipline); picks argmax unrounded mmr with the
    // (mmr DESC, cand_id) tie rule, emits 6dp
    "sim15_mmr" -> {
      val cos = cosine("a.embedding", "b.embedding")
      val qcos = cosine("q.embedding", "c.embedding")
      val steps = (2 to 5).map { t =>
        s"""sel$t AS MATERIALIZED (
           |  SELECT query_id, cand_id, CAST($t AS BIGINT) AS pick_order,
           |         round(mmr, 6) AS mmr_score
           |  FROM (
           |    SELECT x.query_id, x.cand_id, x.mmr,
           |      row_number() OVER (PARTITION BY x.query_id
           |        ORDER BY x.mmr DESC, x.cand_id) AS rn
           |    FROM (
           |      SELECT c.query_id, c.cand_id,
           |        0.5::DOUBLE * c.rel - 0.5::DOUBLE * m.ms AS mmr
           |      FROM cand c
           |      JOIN (SELECT p.query_id, p.ca AS cand_id, max(p.sim) AS ms
           |            FROM ps p
           |            JOIN u${t - 1} s
           |              ON p.query_id = s.query_id AND p.cb = s.cand_id
           |            GROUP BY 1, 2) m
           |        ON c.query_id = m.query_id AND c.cand_id = m.cand_id
           |      WHERE NOT EXISTS (SELECT 1 FROM u${t - 1} s2
           |        WHERE s2.query_id = c.query_id
           |          AND s2.cand_id = c.cand_id)) x) y
           |  WHERE rn = 1),
           |u$t AS MATERIALIZED (
           |  SELECT query_id, cand_id FROM u${t - 1}
           |  UNION ALL SELECT query_id, cand_id FROM sel$t)""".stripMargin
      }
      s"""WITH cand AS MATERIALIZED (
         |  SELECT query_id, cand_id, rel FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |      round($qcos, 6) AS rel,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY round($qcos, 6) DESC, c.vec_id) AS rank
         |    FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
         |    WHERE q.vec_id < 5) r
         |  WHERE rank <= 20),
         |cv AS MATERIALIZED (
         |  SELECT cand.query_id, cand.cand_id, e.embedding
         |  FROM cand JOIN embeddings e ON e.vec_id = cand.cand_id),
         |ps AS MATERIALIZED (
         |  SELECT a.query_id, a.cand_id AS ca, b.cand_id AS cb,
         |    round($cos, 6) AS sim
         |  FROM cv a JOIN cv b
         |    ON a.query_id = b.query_id AND a.cand_id <> b.cand_id),
         |sel1 AS MATERIALIZED (
         |  SELECT query_id, cand_id, CAST(1 AS BIGINT) AS pick_order,
         |         round(mmr, 6) AS mmr_score
         |  FROM (
         |    SELECT query_id, cand_id,
         |      0.5::DOUBLE * rel - 0.5::DOUBLE * 0.0::DOUBLE AS mmr,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY 0.5::DOUBLE * rel DESC, cand_id) AS rn
         |    FROM cand) z
         |  WHERE rn = 1),
         |u1 AS MATERIALIZED (SELECT query_id, cand_id FROM sel1),
         |${steps.mkString(",\n")}
         |SELECT * FROM sel1 UNION ALL SELECT * FROM sel2
         |UNION ALL SELECT * FROM sel3 UNION ALL SELECT * FROM sel4
         |UNION ALL SELECT * FROM sel5""".stripMargin
    },

    // SIM13: recall@10 of the 16-dim-prefix ranking vs the full-64
    // ranking — both replayed with the sim1 tie rule
    "sim13_matryoshka" -> {
      val cosF = cosine("q.embedding", "c.embedding")
      val cosT = cosine("q.e16", "c.e16")
      s"""WITH t AS (
         |  SELECT vec_id, embedding, embedding[1:16] AS e16
         |  FROM embeddings),
         |sf AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |         round($cosF, 6) AS cosine
         |  FROM t q JOIN t c ON q.vec_id <> c.vec_id
         |  WHERE q.vec_id < 5),
         |rf AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY cosine DESC, neighbor_id) AS rank FROM sf)
         |  WHERE rank <= 10),
         |st AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |         round($cosT, 6) AS cosine
         |  FROM t q JOIN t c ON q.vec_id <> c.vec_id
         |  WHERE q.vec_id < 5),
         |rt AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY cosine DESC, neighbor_id) AS rank FROM st)
         |  WHERE rank <= 10)
         |SELECT rf.query_id,
         |  CAST(sum(CASE WHEN rt.neighbor_id IS NULL THEN 0 ELSE 1 END)
         |    AS BIGINT) AS hits,
         |  round(sum(CASE WHEN rt.neighbor_id IS NULL THEN 0 ELSE 1 END)
         |    / 10.0, 6) AS recall
         |FROM rf
         |LEFT JOIN rt ON rf.query_id = rt.query_id
         |            AND rf.neighbor_id = rt.neighbor_id
         |GROUP BY 1""".stripMargin
    },

    // ranking eval: sim1's ranked list at k=10 vs same-label relevance;
    // DCG/IDCG terms micro-quantized to exact integer sums
    "sim9_rank_eval" -> {
      val cos = cosine("q.embedding", "c.embedding")
      s"""WITH scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |         round($cos, 6) AS cosine
         |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
         |  WHERE q.vec_id < 5),
         |ranked AS (
         |  SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY cosine DESC, neighbor_id) AS rank
         |  FROM scored),
         |rk AS (SELECT * FROM ranked WHERE rank <= 10),
         |rel AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
         |  FROM embeddings q JOIN embeddings c
         |    ON q.label = c.label AND q.vec_id <> c.vec_id
         |  WHERE q.vec_id < 5),
         |rc AS (SELECT query_id, count(*)::BIGINT AS n_rel FROM rel GROUP BY 1),
         |h AS (
         |  SELECT r.query_id, count(*)::BIGINT AS n_hits,
         |    min(r.rank) AS minr,
         |    CAST(sum(CAST(round(1e6 / log2(r.rank + 1)) AS BIGINT)) AS BIGINT)
         |      AS dcgm
         |  FROM rk r JOIN rel USING (query_id, neighbor_id) GROUP BY 1),
         |j AS (
         |  SELECT b.query_id, coalesce(rc.n_rel, 0) AS n_rel,
         |    coalesce(h.n_hits, 0) AS n_hits, h.minr, h.dcgm
         |  FROM (SELECT DISTINCT query_id FROM rk) b
         |  LEFT JOIN rc USING (query_id) LEFT JOIN h USING (query_id)),
         |gt AS (
         |  SELECT i, CAST(sum(gm) OVER (ORDER BY i
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         |  FROM (SELECT i, CAST(round(1e6 / log2(i + 1)) AS BIGINT) AS gm
         |        FROM range(1, 11) t(i)))
         |SELECT query_id, n_rel, n_hits,
         |  CASE WHEN n_rel > 0
         |       THEN round(n_hits::DOUBLE / n_rel, 6) END AS recall_at_k,
         |  coalesce(round(1.0 / minr, 6), 0.0) AS mrr,
         |  CASE WHEN n_rel > 0
         |       THEN round(coalesce(dcgm, 0)::DOUBLE / gt.cum, 6)
         |  END AS ndcg_at_k
         |FROM j LEFT JOIN gt ON gt.i = least(j.n_rel, 10)""".stripMargin
    },

    // hard negatives: sim1's scored pairs restricted to label mismatch
    "sim10_hard_negatives" -> {
      val cos = cosine("q.embedding", "c.embedding")
      s"""WITH scored AS (
         |  SELECT q.vec_id AS anchor_id, c.vec_id AS negative_id,
         |         round($cos, 6) AS cosine
         |  FROM embeddings q JOIN embeddings c
         |    ON q.label <> c.label
         |  WHERE q.vec_id < 5),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY anchor_id
         |    ORDER BY cosine DESC, negative_id) AS rank
         |  FROM scored)
         |SELECT anchor_id, negative_id, cosine, CAST(rank AS INT) AS rank
         |FROM ranked WHERE rank <= 5""".stripMargin
    },

    "sim2_lsh_topk" -> {
      val cos = cosine("q.embedding", "c.embedding")
      def bucket(v: String) =
        s"concat(CASE WHEN $v[1] >= 0 THEN '+' ELSE '-' END," +
          s" CASE WHEN $v[2] >= 0 THEN '+' ELSE '-' END," +
          s" CASE WHEN $v[3] >= 0 THEN '+' ELSE '-' END," +
          s" CASE WHEN $v[4] >= 0 THEN '+' ELSE '-' END)"
      s"""WITH scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |         round($cos, 6) AS cosine
         |  FROM embeddings q JOIN embeddings c
         |    ON ${bucket("q.embedding")} = ${bucket("c.embedding")}
         |   AND q.vec_id <> c.vec_id
         |  WHERE q.vec_id < 5),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
         |FROM ranked WHERE rank <= 5""".stripMargin
    },

    "sim3_ivf_topk" -> {
      val cos = cosine("q.embedding", "c.embedding")
      def sqDist(a: String, b: String) =
        s"sqrt(list_sum(list_transform(range(1, 65), " +
          s"i -> ($a[i]::DOUBLE - $b[i]::DOUBLE) * ($a[i]::DOUBLE - $b[i]::DOUBLE))))"
      s"""WITH cent AS (
         |  SELECT e2.label AS cell_id, e2.embedding AS centroid
         |  FROM (SELECT label, min(vec_id) AS cid FROM embeddings GROUP BY 1) m
         |  JOIN embeddings e2 ON e2.vec_id = m.cid),
         |asgn AS (
         |  SELECT vec_id, cell_id FROM (
         |    SELECT e.vec_id, c.cell_id,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${sqDist("e.embedding", "c.centroid")}, c.cell_id) AS rn
         |    FROM embeddings e CROSS JOIN cent c)
         |  WHERE rn = 1),
         |scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |         round($cos, 6) AS cosine
         |  FROM embeddings q
         |  JOIN asgn qa ON q.vec_id = qa.vec_id
         |  JOIN asgn ca ON ca.cell_id = qa.cell_id
         |  JOIN embeddings c ON c.vec_id = ca.vec_id
         |  WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
         |FROM ranked WHERE rank <= 5""".stripMargin
    },

    // nprobe=2 IVF: queries search their TWO nearest cells; the corpus
    // keeps single-cell assignment, so (query, neighbor) pairs are unique
    "sim4_ivf_nprobe" -> {
      val cos = cosine("q.embedding", "c.embedding")
      def sqDist(a: String, b: String) =
        s"sqrt(list_sum(list_transform(range(1, 65), " +
          s"i -> ($a[i]::DOUBLE - $b[i]::DOUBLE) * ($a[i]::DOUBLE - $b[i]::DOUBLE))))"
      s"""WITH cent AS (
         |  SELECT e2.label AS cell_id, e2.embedding AS centroid
         |  FROM (SELECT label, min(vec_id) AS cid FROM embeddings GROUP BY 1) m
         |  JOIN embeddings e2 ON e2.vec_id = m.cid),
         |ranked_cells AS (
         |  SELECT e.vec_id, c.cell_id,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${sqDist("e.embedding", "c.centroid")}, c.cell_id) AS rn
         |  FROM embeddings e CROSS JOIN cent c),
         |asgn AS (SELECT vec_id, cell_id FROM ranked_cells WHERE rn = 1),
         |qasgn AS (SELECT vec_id, cell_id FROM ranked_cells WHERE rn <= 2),
         |scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |         round($cos, 6) AS cosine
         |  FROM embeddings q
         |  JOIN qasgn qa ON q.vec_id = qa.vec_id
         |  JOIN asgn ca ON ca.cell_id = qa.cell_id
         |  JOIN embeddings c ON c.vec_id = ca.vec_id
         |  WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
         |FROM ranked WHERE rank <= 5""".stripMargin
    },

    // SIM14: IVF recall curve — the sim4 replay at three probe budgets
    // against the sim1 brute-force ground truth
    "sim14_nprobe_recall" -> {
      val cos = cosine("q.embedding", "c.embedding")
      def sqDist(a: String, b: String) =
        s"sqrt(list_sum(list_transform(range(1, 65), " +
          s"i -> ($a[i]::DOUBLE - $b[i]::DOUBLE) * ($a[i]::DOUBLE - $b[i]::DOUBLE))))"
      val probes = Seq(1, 2, 4)
      val perNp = probes.map { np =>
        s"""sc$np AS (
           |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |         round($cos, 6) AS cosine
           |  FROM embeddings q
           |  JOIN rc qa ON q.vec_id = qa.vec_id AND qa.rn <= $np
           |  JOIN asgn ca ON ca.cell_id = qa.cell_id
           |  JOIN embeddings c ON c.vec_id = ca.vec_id
           |  WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id),
           |r$np AS (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT *, row_number() OVER (PARTITION BY query_id
           |      ORDER BY cosine DESC, neighbor_id) AS rank FROM sc$np)
           |  WHERE rank <= 5)""".stripMargin
      }
      val blocks = probes.map { np =>
        s"""SELECT $np AS nprobe,
           |  count(DISTINCT g.query_id)::BIGINT AS n_queries,
           |  round(sum(CASE WHEN r$np.neighbor_id IS NULL THEN 0 ELSE 1
           |        END)::DOUBLE
           |    / (count(DISTINCT g.query_id) * 5)::DOUBLE, 6)
           |    AS mean_recall
           |FROM gt g
           |LEFT JOIN r$np ON g.query_id = r$np.query_id
           |             AND g.neighbor_id = r$np.neighbor_id""".stripMargin
      }
      s"""WITH cent AS (
         |  SELECT e2.label AS cell_id, e2.embedding AS centroid
         |  FROM (SELECT label, min(vec_id) AS cid FROM embeddings GROUP BY 1) m
         |  JOIN embeddings e2 ON e2.vec_id = m.cid),
         |rc AS (
         |  SELECT e.vec_id, c.cell_id,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${sqDist("e.embedding", "c.centroid")}, c.cell_id) AS rn
         |  FROM embeddings e CROSS JOIN cent c),
         |asgn AS (SELECT vec_id, cell_id FROM rc WHERE rn = 1),
         |sg AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |         round($cos, 6) AS cosine
         |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
         |  WHERE q.vec_id < 5),
         |gt AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY cosine DESC, neighbor_id) AS rank FROM sg)
         |  WHERE rank <= 5),
         |${perNp.mkString(",\n")}
         |${blocks.mkString("\nUNION ALL\n")}""".stripMargin
    },

    // one Lloyd iteration from the 8 lowest-vec_id seeds; per-dim means
    // as exact micro-integer sums (matches kmeansCentroids' quantization)
    "sim5_kmeans" -> {
      def sqDist(a: String, b: String) =
        s"sqrt(list_sum(list_transform(range(1, 65), " +
          s"i -> ($a[i]::DOUBLE - $b[i]::DOUBLE) * ($a[i]::DOUBLE - $b[i]::DOUBLE))))"
      s"""WITH cent AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell_id,
         |         list_transform(embedding, x -> x::DOUBLE) AS centroid
         |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)),
         |asgn AS (
         |  SELECT vec_id, cell_id FROM (
         |    SELECT e.vec_id, c.cell_id,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${sqDist("e.embedding", "c.centroid")}, c.cell_id) AS rn
         |    FROM embeddings e CROSS JOIN cent c)
         |  WHERE rn = 1),
         |px AS (
         |  SELECT a.cell_id, t.i AS dim,
         |    CAST(round(e.embedding[t.i + 1]::DOUBLE * 1000000) AS BIGINT) AS xm
         |  FROM asgn a JOIN embeddings e USING (vec_id), range(0, 64) t(i))
         |SELECT cell_id, CAST(dim AS INT) AS dim,
         |  CAST(sum(xm) AS BIGINT)::DOUBLE / count(*) / 1000000 AS value
         |FROM px GROUP BY 1, 2""".stripMargin
    },

    // ML40: sd1's trained-quantizer assignment chain, then the
    // contingency grid — HUGEINT pair counts (Spark decimal), 1e12
    // micro-nat entropy/MI terms, one fixed ARI expression
    "ml40_cluster_eval" -> {
      def sqDist(a: String, b: String) =
        s"sqrt(list_sum(list_transform(range(1, 65), " +
          s"i -> ($a[i]::DOUBLE - $b[i]::DOUBLE) * ($a[i]::DOUBLE - $b[i]::DOUBLE))))"
      val nn = "(SELECT n0 FROM nf)"
      s"""WITH cent0 AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell_id,
         |         list_transform(embedding, x -> x::DOUBLE) AS centroid
         |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)),
         |asgn0 AS (
         |  SELECT vec_id, cell_id FROM (
         |    SELECT e.vec_id, c.cell_id,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${sqDist("e.embedding", "c.centroid")}, c.cell_id)
         |        AS rn
         |    FROM embeddings e CROSS JOIN cent0 c)
         |  WHERE rn = 1),
         |px AS (
         |  SELECT a.cell_id, t.i AS dim,
         |    CAST(round(e.embedding[t.i + 1]::DOUBLE * 1000000) AS BIGINT)
         |      AS xm
         |  FROM asgn0 a JOIN embeddings e USING (vec_id), range(0, 64) t(i)),
         |cm AS (
         |  SELECT cell_id, dim,
         |    CAST(sum(xm) AS BIGINT)::DOUBLE / count(*) / 1000000 AS value
         |  FROM px GROUP BY 1, 2),
         |cent AS (
         |  SELECT cell_id, list(value ORDER BY dim) AS centroid
         |  FROM cm GROUP BY 1),
         |asgn AS (
         |  SELECT vec_id, cell_id FROM (
         |    SELECT e.vec_id, c.cell_id,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${sqDist("e.embedding", "c.centroid")}, c.cell_id)
         |        AS rn
         |    FROM embeddings e CROSS JOIN cent c)
         |  WHERE rn = 1),
         |cont AS (
         |  SELECT a.cell_id AS u, e.label AS v, count(*)::BIGINT AS n
         |  FROM asgn a JOIN embeddings e USING (vec_id) GROUP BY 1, 2),
         |nf AS (SELECT CAST(sum(n) AS BIGINT) AS n0 FROM cont),
         |am AS (SELECT u, CAST(sum(n) AS BIGINT) AS a FROM cont GROUP BY 1),
         |bm AS (SELECT v, CAST(sum(n) AS BIGINT) AS b FROM cont GROUP BY 1),
         |aagg AS (
         |  SELECT count(*)::BIGINT AS n_clusters,
         |    sum(a::HUGEINT * (a - 1)) AS sa2,
         |    CAST(sum(CAST(round(a::DOUBLE / $nn * ln(a::DOUBLE / $nn)
         |      * 1e12) AS BIGINT)) AS BIGINT) AS huq
         |  FROM am),
         |bagg AS (
         |  SELECT count(*)::BIGINT AS n_labels,
         |    sum(b::HUGEINT * (b - 1)) AS sb2,
         |    CAST(sum(CAST(round(b::DOUBLE / $nn * ln(b::DOUBLE / $nn)
         |      * 1e12) AS BIGINT)) AS BIGINT) AS hvq
         |  FROM bm),
         |cagg AS (
         |  SELECT sum(n::HUGEINT * (n - 1)) AS sij2,
         |    CAST(sum(CAST(round(c.n::DOUBLE / $nn * ln(c.n::DOUBLE * $nn
         |      / (am.a::DOUBLE * bm.b::DOUBLE)) * 1e12) AS BIGINT))
         |      AS BIGINT) AS miq
         |  FROM cont c JOIN am USING (u) JOIN bm USING (v))
         |SELECT $nn AS n, n_clusters, n_labels,
         |  round(CASE WHEN (sa2::DOUBLE + sb2::DOUBLE) / 2.0
         |      - sa2::DOUBLE * sb2::DOUBLE
         |        / ($nn::HUGEINT * ($nn - 1))::DOUBLE <> 0.0 THEN
         |    (sij2::DOUBLE - sa2::DOUBLE * sb2::DOUBLE
         |        / ($nn::HUGEINT * ($nn - 1))::DOUBLE)
         |    / ((sa2::DOUBLE + sb2::DOUBLE) / 2.0
         |       - sa2::DOUBLE * sb2::DOUBLE
         |         / ($nn::HUGEINT * ($nn - 1))::DOUBLE) END, 6) AS ari,
         |  round(CASE WHEN huq < 0 AND hvq < 0 THEN
         |    miq::DOUBLE / 1e12 / sqrt((-(huq::DOUBLE) / 1e12)
         |      * (-(hvq::DOUBLE) / 1e12)) END, 6) AS nmi
         |FROM cagg, aagg, bagg""".stripMargin
    },

    // SemDeDup: sim5's one-Lloyd k-means replayed into centroid lists,
    // nearest-centroid assignment (euclid, tie cell_id), within-cell
    // cosine pairs ≥ τ, each pair dropping its higher-(centroid-cosine,
    // id) member — survivors by NOT IN
    "sd1_semdedup" -> {
      def sqDist(a: String, b: String) =
        s"sqrt(list_sum(list_transform(range(1, 65), " +
          s"i -> ($a[i]::DOUBLE - $b[i]::DOUBLE) * ($a[i]::DOUBLE - $b[i]::DOUBLE))))"
      s"""WITH cent0 AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell_id,
         |         list_transform(embedding, x -> x::DOUBLE) AS centroid
         |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)),
         |asgn0 AS (
         |  SELECT vec_id, cell_id FROM (
         |    SELECT e.vec_id, c.cell_id,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${sqDist("e.embedding", "c.centroid")}, c.cell_id) AS rn
         |    FROM embeddings e CROSS JOIN cent0 c)
         |  WHERE rn = 1),
         |px AS (
         |  SELECT a.cell_id, t.i AS dim,
         |    CAST(round(e.embedding[t.i + 1]::DOUBLE * 1000000) AS BIGINT) AS xm
         |  FROM asgn0 a JOIN embeddings e USING (vec_id), range(0, 64) t(i)),
         |cm AS (
         |  SELECT cell_id, dim,
         |    CAST(sum(xm) AS BIGINT)::DOUBLE / count(*) / 1000000 AS value
         |  FROM px GROUP BY 1, 2),
         |cent AS (
         |  SELECT cell_id, list(value ORDER BY dim) AS centroid FROM cm GROUP BY 1),
         |asgn AS (
         |  SELECT vec_id, cell_id FROM (
         |    SELECT e.vec_id, c.cell_id,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${sqDist("e.embedding", "c.centroid")}, c.cell_id) AS rn
         |    FROM embeddings e CROSS JOIN cent c)
         |  WHERE rn = 1),
         |prio AS (
         |  SELECT e.vec_id, a.cell_id,
         |    ${cosine("e.embedding", "c.centroid")} AS cc
         |  FROM embeddings e JOIN asgn a USING (vec_id)
         |  JOIN cent c USING (cell_id)),
         |pairs AS (
         |  SELECT p1.vec_id AS v1, p1.cc AS cc1, p2.vec_id AS v2, p2.cc AS cc2
         |  FROM prio p1 JOIN prio p2
         |    ON p1.cell_id = p2.cell_id AND p1.vec_id < p2.vec_id
         |  JOIN embeddings e1 ON e1.vec_id = p1.vec_id
         |  JOIN embeddings e2 ON e2.vec_id = p2.vec_id
         |  WHERE ${cosine("e1.embedding", "e2.embedding")} >= 0.3),
         |losers AS (
         |  SELECT DISTINCT CASE WHEN (cc1, v1) >= (cc2, v2) THEN v1 ELSE v2 END
         |    AS vec_id FROM pairs)
         |SELECT p.vec_id, p.cell_id, round(p.cc, 6) AS cent_cos
         |FROM prio p
         |WHERE p.vec_id NOT IN (SELECT vec_id FROM losers)""".stripMargin
    },

    // SSL-prototypes: sd1's trained-quantizer assignment + centroid
    // cosine, then per cell drop rank ≤ ⌊m/2⌋ under (cc DESC, id)
    "sd2_prototypes" -> {
      def sqDist(a: String, b: String) =
        s"sqrt(list_sum(list_transform(range(1, 65), " +
          s"i -> ($a[i]::DOUBLE - $b[i]::DOUBLE) * ($a[i]::DOUBLE - $b[i]::DOUBLE))))"
      s"""WITH cent0 AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell_id,
         |         list_transform(embedding, x -> x::DOUBLE) AS centroid
         |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)),
         |asgn0 AS (
         |  SELECT vec_id, cell_id FROM (
         |    SELECT e.vec_id, c.cell_id,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${sqDist("e.embedding", "c.centroid")}, c.cell_id) AS rn
         |    FROM embeddings e CROSS JOIN cent0 c)
         |  WHERE rn = 1),
         |px AS (
         |  SELECT a.cell_id, t.i AS dim,
         |    CAST(round(e.embedding[t.i + 1]::DOUBLE * 1000000) AS BIGINT) AS xm
         |  FROM asgn0 a JOIN embeddings e USING (vec_id), range(0, 64) t(i)),
         |cm AS (
         |  SELECT cell_id, dim,
         |    CAST(sum(xm) AS BIGINT)::DOUBLE / count(*) / 1000000 AS value
         |  FROM px GROUP BY 1, 2),
         |cent AS (
         |  SELECT cell_id, list(value ORDER BY dim) AS centroid FROM cm GROUP BY 1),
         |asgn AS (
         |  SELECT vec_id, cell_id FROM (
         |    SELECT e.vec_id, c.cell_id,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${sqDist("e.embedding", "c.centroid")}, c.cell_id) AS rn
         |    FROM embeddings e CROSS JOIN cent c)
         |  WHERE rn = 1),
         |prio AS (
         |  SELECT e.vec_id, a.cell_id,
         |    ${cosine("e.embedding", "c.centroid")} AS cc
         |  FROM embeddings e JOIN asgn a USING (vec_id)
         |  JOIN cent c USING (cell_id)),
         |ranked AS (
         |  SELECT vec_id, cell_id, cc,
         |    row_number() OVER (PARTITION BY cell_id ORDER BY cc DESC, vec_id)
         |      AS rk,
         |    count(*) OVER (PARTITION BY cell_id) AS m
         |  FROM prio)
         |SELECT vec_id, cell_id, round(cc, 6) AS cent_cos
         |FROM ranked WHERE rk > floor(0.5 * m)""".stripMargin
    },

    // PQ/ADC: 8×8-dim subspaces, sub-codebooks = subvectors of vec_id
    // 0..7; encode picks the nearest sub-centroid per (vector, subspace),
    // search sums the 8 query→sub-centroid distances in subspace order
    "sim6_pq_topk" -> {
      def sq8(a: String, b: String) =
        s"list_sum(list_transform(range(1, 9), " +
          s"i -> ($a::DOUBLE - $b::DOUBLE) * ($a::DOUBLE - $b::DOUBLE)))"
      val encDist = sq8("e.embedding[cb.subspace * 8 + i]", "cb.sc[i]")
      val adcDist =
        "list_sum(list_transform(range(0, 8), s -> " +
          "list_sum(list_transform(range(1, 9), i -> " +
          "(q.embedding[s * 8 + i]::DOUBLE - cbn.cbl[s + 1][c.codes[s + 1] + 1][i]::DOUBLE) * " +
          "(q.embedding[s * 8 + i]::DOUBLE - cbn.cbl[s + 1][c.codes[s + 1] + 1][i]::DOUBLE)))))"
      s"""WITH cb AS (
         |  SELECT t.s AS subspace, e.vec_id AS code,
         |         e.embedding[t.s * 8 + 1 : t.s * 8 + 8] AS sc
         |  FROM embeddings e, range(0, 8) t(s) WHERE e.vec_id < 8),
         |enc AS (
         |  SELECT vec_id, subspace, code FROM (
         |    SELECT e.vec_id, cb.subspace, cb.code,
         |      row_number() OVER (PARTITION BY e.vec_id, cb.subspace
         |        ORDER BY $encDist, cb.code) AS rn
         |    FROM embeddings e CROSS JOIN cb)
         |  WHERE rn = 1),
         |encl AS (
         |  SELECT vec_id, list(code ORDER BY subspace) AS codes
         |  FROM enc GROUP BY 1),
         |cb1 AS (SELECT subspace, list(sc ORDER BY code) AS cents
         |        FROM cb GROUP BY 1),
         |cbn AS (SELECT list(cents ORDER BY subspace) AS cbl FROM cb1),
         |scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |         round($adcDist, 6) AS adist
         |  FROM embeddings q, encl c, cbn
         |  WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY adist, neighbor_id) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, adist, CAST(rank AS INT) AS rank
         |FROM ranked WHERE rank <= 5""".stripMargin
    },

    // IVFADC = sim3's cell assignment ∘ sim6's ADC scoring
    // sim8 searches the PUBLISHED index: same inputs, same semantics,
    // same replay — only the Spark-side storage path differs
    "sim8_index_search" -> sim7IvfadcSql,

    "sim7_ivfadc" -> sim7IvfadcSql,

    "mm1_binary_meta" ->
      """WITH media AS (
        |  SELECT doc_id, text, encode(text) AS payload,
        |         '\xFF\xD8\xFF\xE0'::BLOB || encode(text) AS jpeg_payload
        |  FROM documents)
        |SELECT doc_id,
        |  octet_length(payload)::BIGINT AS byte_len,
        |  md5(text) AS content_md5,
        |  CASE WHEN upper(substring(hex(payload), 1, 16)) LIKE 'FFD8FF%' THEN 'jpeg'
        |       WHEN upper(substring(hex(payload), 1, 16)) LIKE '89504E47%' THEN 'png'
        |       WHEN upper(substring(hex(payload), 1, 16)) LIKE '47494638%' THEN 'gif'
        |       WHEN upper(substring(hex(payload), 1, 16)) LIKE '52494646%' THEN 'riff'
        |       WHEN upper(substring(hex(payload), 1, 16)) LIKE '494433%' THEN 'mp3'
        |       WHEN upper(substring(hex(payload), 1, 16)) LIKE '1A45DFA3%' THEN 'mkv/webm'
        |       ELSE 'unknown' END AS fmt_raw,
        |  CASE WHEN upper(substring(hex(jpeg_payload), 1, 16)) LIKE 'FFD8FF%' THEN 'jpeg'
        |       ELSE 'unknown' END AS fmt_jpeg
        |FROM media""".stripMargin,

    // simhash fingerprints + near pairs; the oracle computes fingerprints
    // the definitional way and pairs all-pairs (fine in DuckDB at oracle
    // scale) — the Spark side must agree through its banded-LSH path
    "dd5_simhash" ->
      """WITH words AS (
        |  SELECT doc_id,
        |    unnest(list_distinct(string_split_regex(
        |      trim(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g')),
        |      '\s+'))) AS w
        |  FROM documents),
        |h AS (
        |  SELECT doc_id,
        |    CAST(CAST('0x' || substring(md5(w), 1, 8) AS UBIGINT) AS BIGINT) AS hv
        |  FROM words),
        |v AS (
        |  SELECT doc_id, i,
        |    sum(CASE WHEN (hv >> i) & 1 = 1 THEN 1 ELSE -1 END) AS vote
        |  FROM h CROSS JOIN (SELECT unnest(range(0, 32)) AS i) bits
        |  GROUP BY 1, 2),
        |fp AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN vote > 0 THEN 1::BIGINT << i ELSE 0::BIGINT END)
        |         AS BIGINT) AS simhash
        |  FROM v GROUP BY 1)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin,

    // DD27: the 64-bit fingerprint replay — word hash = two spliced
    // 32-bit md5 halves (the mm5 UBIGINT-splice pattern; the cast to
    // BIGINT wraps to the same two's-complement long as the engine's
    // shiftleft|bitwiseOR); bit 63's 1<<63 term sums exactly through
    // DuckDB's HUGEINT accumulator before the BIGINT cast
    "dd27_simhash_prod" ->
      """WITH words AS (
        |  SELECT doc_id,
        |    unnest(list_distinct(string_split_regex(
        |      trim(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g')),
        |      '\s+'))) AS w
        |  FROM documents),
        |h0 AS (
        |  SELECT doc_id,
        |    CAST(CAST('0x' || substring(md5(w), 1, 8) AS UBIGINT)
        |      AS HUGEINT) AS hi,
        |    CAST(CAST('0x' || substring(md5(w), 9, 8) AS UBIGINT)
        |      AS HUGEINT) AS lo
        |  FROM words),
        |h AS (
        |  -- explicit two's-complement wrap: DuckDB's UBIGINT->BIGINT
        |  -- cast raises on the sign bit instead of wrapping
        |  SELECT doc_id,
        |    CAST(hi * 4294967296::HUGEINT + lo
        |      - CASE WHEN hi >= 2147483648::HUGEINT
        |             THEN 18446744073709551616::HUGEINT
        |             ELSE 0::HUGEINT END AS BIGINT) AS hv
        |  FROM h0),
        |v AS (
        |  SELECT doc_id, i,
        |    sum(CASE WHEN (hv >> i) & 1 = 1 THEN 1 ELSE -1 END) AS vote
        |  FROM h CROSS JOIN (SELECT unnest(range(0, 64)) AS i) bits
        |  GROUP BY 1, 2),
        |fp0 AS (
        |  SELECT doc_id,
        |    sum(CASE WHEN vote > 0 THEN 1::HUGEINT << i
        |        ELSE 0::HUGEINT END) AS s
        |  FROM v GROUP BY 1),
        |fp AS (
        |  -- same two's-complement wrap for the bit-63 term
        |  SELECT doc_id,
        |    CAST(s - CASE WHEN s >= 9223372036854775808::HUGEINT
        |             THEN 18446744073709551616::HUGEINT
        |             ELSE 0::HUGEINT END AS BIGINT) AS simhash
        |  FROM fp0)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin,

    // DD28: identical brute-force all-pairs replay — the blocked
    // candidate generator is pigeonhole-complete at hamming <= 3 like
    // the banded one, so both engines return the same set
    "dd28_simhash_blocked" ->
      """WITH words AS (
        |  SELECT doc_id,
        |    unnest(list_distinct(string_split_regex(
        |      trim(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g')),
        |      '\s+'))) AS w
        |  FROM documents),
        |h0 AS (
        |  SELECT doc_id,
        |    CAST(CAST('0x' || substring(md5(w), 1, 8) AS UBIGINT)
        |      AS HUGEINT) AS hi,
        |    CAST(CAST('0x' || substring(md5(w), 9, 8) AS UBIGINT)
        |      AS HUGEINT) AS lo
        |  FROM words),
        |h AS (
        |  -- explicit two's-complement wrap: DuckDB's UBIGINT->BIGINT
        |  -- cast raises on the sign bit instead of wrapping
        |  SELECT doc_id,
        |    CAST(hi * 4294967296::HUGEINT + lo
        |      - CASE WHEN hi >= 2147483648::HUGEINT
        |             THEN 18446744073709551616::HUGEINT
        |             ELSE 0::HUGEINT END AS BIGINT) AS hv
        |  FROM h0),
        |v AS (
        |  SELECT doc_id, i,
        |    sum(CASE WHEN (hv >> i) & 1 = 1 THEN 1 ELSE -1 END) AS vote
        |  FROM h CROSS JOIN (SELECT unnest(range(0, 64)) AS i) bits
        |  GROUP BY 1, 2),
        |fp0 AS (
        |  SELECT doc_id,
        |    sum(CASE WHEN vote > 0 THEN 1::HUGEINT << i
        |        ELSE 0::HUGEINT END) AS s
        |  FROM v GROUP BY 1),
        |fp AS (
        |  -- same two's-complement wrap for the bit-63 term
        |  SELECT doc_id,
        |    CAST(s - CASE WHEN s >= 9223372036854775808::HUGEINT
        |             THEN 18446744073709551616::HUGEINT
        |             ELSE 0::HUGEINT END AS BIGINT) AS simhash
        |  FROM fp0)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin,

    // DD29: the incremental (index + batch) path is complete at
    // hamming <= 3 like dd28, restricted to pairs involving a batch
    // doc (doc_id >= 400) — so the pin is the SAME brute-force replay
    // with that filter; build/search parameter agreement on the engine
    // side is what the shared-key-derivation contract guarantees
    "dd29_incremental_simhash" ->
      """WITH words AS (
        |  SELECT doc_id,
        |    unnest(list_distinct(string_split_regex(
        |      trim(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g')),
        |      '\s+'))) AS w
        |  FROM documents),
        |h0 AS (
        |  SELECT doc_id,
        |    CAST(CAST('0x' || substring(md5(w), 1, 8) AS UBIGINT)
        |      AS HUGEINT) AS hi,
        |    CAST(CAST('0x' || substring(md5(w), 9, 8) AS UBIGINT)
        |      AS HUGEINT) AS lo
        |  FROM words),
        |h AS (
        |  -- explicit two's-complement wrap: DuckDB's UBIGINT->BIGINT
        |  -- cast raises on the sign bit instead of wrapping
        |  SELECT doc_id,
        |    CAST(hi * 4294967296::HUGEINT + lo
        |      - CASE WHEN hi >= 2147483648::HUGEINT
        |             THEN 18446744073709551616::HUGEINT
        |             ELSE 0::HUGEINT END AS BIGINT) AS hv
        |  FROM h0),
        |v AS (
        |  SELECT doc_id, i,
        |    sum(CASE WHEN (hv >> i) & 1 = 1 THEN 1 ELSE -1 END) AS vote
        |  FROM h CROSS JOIN (SELECT unnest(range(0, 64)) AS i) bits
        |  GROUP BY 1, 2),
        |fp0 AS (
        |  SELECT doc_id,
        |    sum(CASE WHEN vote > 0 THEN 1::HUGEINT << i
        |        ELSE 0::HUGEINT END) AS s
        |  FROM v GROUP BY 1),
        |fp AS (
        |  -- same two's-complement wrap for the bit-63 term
        |  SELECT doc_id,
        |    CAST(s - CASE WHEN s >= 9223372036854775808::HUGEINT
        |             THEN 18446744073709551616::HUGEINT
        |             ELSE 0::HUGEINT END AS BIGINT) AS simhash
        |  FROM fp0)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        |  AND (a.doc_id >= 400 OR b.doc_id >= 400)""".stripMargin,

    // MM5: stub pHash = md5 splice (payload is the UTF-8 text bytes, so
    // md5(text) = md5(payload)); the banded engine path is pigeonhole-
    // complete at hamming ≤ 3 < 4 bands, so the all-pairs replay here
    // returns the same set
    "mm5_phash_pairs" ->
      """WITH media AS (
        |  SELECT doc_id AS media_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text FROM documents WHERE doc_id < 50),
        |fp AS (
        |  SELECT media_id,
        |    CAST('0x' || substring(md5(text), 1, 8) AS UBIGINT)
        |      * 4294967296::UBIGINT
        |      + CAST('0x' || substring(md5(text), 9, 8) AS UBIGINT) AS h
        |  FROM media)
        |SELECT a.media_id AS id_a, b.media_id AS id_b,
        |       CAST(bit_count(xor(a.h, b.h)) AS BIGINT) AS hamming
        |FROM fp a JOIN fp b ON a.media_id < b.media_id
        |WHERE bit_count(xor(a.h, b.h)) <= 3""".stripMargin,

    // REAL decoded content: the Spark side encodes a gradient PNG with
    // javax.imageio, DECODES it back, and sums channels; the oracle
    // never touches a codec — the fixture's channel values are
    // closed-form in (x, y, id), and PNG's lossless roundtrip makes the
    // decoded sums equal the analytic sums exactly
    "mm2_media_features" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, 8 + doc_id % 8 AS w, 8 + doc_id % 5 AS h
        |  FROM documents),
        |px AS (
        |  SELECT media_id, w, h, x, y
        |  FROM m, unnest(range(0, w)) t1(x), unnest(range(0, h)) t2(y))
        |SELECT media_id,
        |  CAST(max(w) AS INTEGER) AS width, CAST(max(h) AS INTEGER) AS height,
        |  CAST(sum((x * 7 + y * 13 + media_id) % 256) AS BIGINT) AS sum_r,
        |  CAST(sum((x * 3 + y * 5 + 2 * media_id) % 256) AS BIGINT) AS sum_g,
        |  CAST(sum((x * 11 + y + 3 * media_id) % 256) AS BIGINT) AS sum_b
        |FROM px GROUP BY 1""".stripMargin,

    // REAL resize: nearest-neighbor sampling rule src = ((x·w)//16,
    // (y·h)//8) replayed analytically over the fixture's closed form
    "mm3_resize" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, 8 + doc_id % 8 AS w, 8 + doc_id % 5 AS h
        |  FROM documents),
        |px AS (
        |  SELECT media_id, (x * w) // 16 AS sx, (y * h) // 8 AS sy
        |  FROM m, unnest(range(0, 16)) t1(x), unnest(range(0, 8)) t2(y))
        |SELECT media_id,
        |  CAST(16 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
        |  CAST(sum((sx * 7 + sy * 13 + media_id) % 256) AS BIGINT) AS sum_r,
        |  CAST(sum((sx * 3 + sy * 5 + 2 * media_id) % 256) AS BIGINT) AS sum_g,
        |  CAST(sum((sx * 11 + sy + 3 * media_id) % 256) AS BIGINT) AS sum_b
        |FROM px GROUP BY 1""".stripMargin,

    // SH1: the engine writes shards and manifests the FILES; the oracle
    // replays the md5 shard assignment and the order-free checksum
    // analytically — agreement proves the write-read roundtrip lost,
    // duplicated, and corrupted nothing
    "sh1_training_shards" ->
      """WITH s AS (
        |  SELECT doc_id, text,
        |    CAST(floor(CAST(CAST(concat('0x',
        |        substr(md5(concat_ws('|', 'shard', doc_id)), 1, 8))
        |      AS BIGINT) AS DOUBLE) / 4294967296.0 * 16) AS INTEGER) AS shard
        |  FROM documents)
        |SELECT shard, count(*)::BIGINT AS n_docs,
        |  CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE len(regexp_split_to_array(trim(text), '\s+')) END)
        |    AS BIGINT) AS n_tokens,
        |  CAST(sum(CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT))
        |    AS BIGINT) AS content_crc
        |FROM s GROUP BY 1""".stripMargin,

    // bomb adversarial: forged-width payloads (even ids) must come back
    // all-null from the header-first maxPixels rejection; intact odd
    // ids decode to the closed-form sums — the oracle replays the
    // PARITY RULE, which is exactly the guard's observable contract
    "mm7_bomb_guard" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, 8 + doc_id % 8 AS w, 8 + doc_id % 5 AS h
        |  FROM documents),
        |px AS (
        |  SELECT media_id, w, h, x, y
        |  FROM m, unnest(range(0, w)) t1(x), unnest(range(0, h)) t2(y)),
        |ok AS (
        |  SELECT media_id,
        |    CAST(max(w) AS INTEGER) AS width, CAST(max(h) AS INTEGER) AS height,
        |    CAST(sum((x * 7 + y * 13 + media_id) % 256) AS BIGINT) AS sum_r,
        |    CAST(sum((x * 3 + y * 5 + 2 * media_id) % 256) AS BIGINT) AS sum_g,
        |    CAST(sum((x * 11 + y + 3 * media_id) % 256) AS BIGINT) AS sum_b
        |  FROM px GROUP BY 1)
        |SELECT media_id,
        |  CASE WHEN media_id % 2 = 0 THEN NULL ELSE width END AS width,
        |  CASE WHEN media_id % 2 = 0 THEN NULL ELSE height END AS height,
        |  CASE WHEN media_id % 2 = 0 THEN NULL ELSE sum_r END AS sum_r,
        |  CASE WHEN media_id % 2 = 0 THEN NULL ELSE sum_g END AS sum_g,
        |  CASE WHEN media_id % 2 = 0 THEN NULL ELSE sum_b END AS sum_b
        |FROM ok""".stripMargin,

    // REAL decoded audio: the Spark side encodes a sawtooth WAV with
    // javax.sound.sampled, DECODES it back, and sums 16-bit samples;
    // the oracle never touches a codec — the fixture's samples are
    // closed-form in (n, id), and PCM's lossless roundtrip makes the
    // decoded statistics equal the analytic ones exactly. Even ids have
    // their RIFF magic zeroed → all-null from the decoder (parity rule).
    "mm8_wav_features" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, 64 + doc_id % 32 AS ns FROM documents),
        |s AS (
        |  SELECT media_id, ns, unnest(range(0, ns)) AS n FROM m),
        |v AS (
        |  SELECT media_id, ns,
        |    ((n * 37 + media_id * 101) % 65536) - 32768 AS amp
        |  FROM s),
        |ok AS (
        |  SELECT media_id,
        |    CAST(8000 AS INTEGER) AS sample_rate,
        |    CAST(max(ns) AS BIGINT) AS n_samples,
        |    CAST(max(ns) * 125 AS BIGINT) AS duration_us,
        |    CAST(sum(amp) AS BIGINT) AS sum_amp,
        |    CAST(max(abs(amp)) AS BIGINT) AS peak_abs,
        |    CAST(sum(amp * amp) AS BIGINT) AS sum_sq
        |  FROM v GROUP BY 1)
        |SELECT media_id,
        |  CASE WHEN media_id % 2 = 0 THEN NULL ELSE sample_rate END AS sample_rate,
        |  CASE WHEN media_id % 2 = 0 THEN NULL ELSE n_samples END AS n_samples,
        |  CASE WHEN media_id % 2 = 0 THEN NULL ELSE duration_us END AS duration_us,
        |  CASE WHEN media_id % 2 = 0 THEN NULL ELSE sum_amp END AS sum_amp,
        |  CASE WHEN media_id % 2 = 0 THEN NULL ELSE peak_abs END AS peak_abs,
        |  CASE WHEN media_id % 2 = 0 THEN NULL ELSE sum_sq END AS sum_sq
        |FROM ok""".stripMargin,

    // PNG IHDR parse vs the analytic fixture dimensions: checks the
    // real encoder's bytes carry the right header AND the column-
    // algebra parser reads them correctly — no decoder on either side
    "mm6_png_meta" ->
      """SELECT doc_id AS media_id, 'png' AS fmt,
        |  CAST(8 + doc_id % 8 AS INTEGER) AS png_width,
        |  CAST(8 + doc_id % 5 AS INTEGER) AS png_height
        |FROM documents""".stripMargin,

    // frame stub = 32-byte windows every 24 bytes, at most 5 per doc
    "mm4_frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
        |         octet_length(encode(text)) AS len
        |  FROM documents),
        |f AS (
        |  SELECT media_id, hx,
        |         unnest(range(0, least(5,
        |           CASE WHEN len >= 32 THEN (len - 32) // 24 + 1 ELSE 0 END)))
        |           AS frame_idx
        |  FROM m)
        |SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
        |  CAST(32 AS BIGINT) AS frame_len,
        |  md5(upper(substring(hx, CAST(frame_idx * 48 + 1 AS BIGINT), 64))) AS frame_md5
        |FROM f""".stripMargin,

    // GR9: min-hop distances as a recursive closure — UNION dedups
    // (node, dist) pairs and the dist < 6 guard bounds the walk; the
    // engine's frontier expansion must find the same minima
    // GR10: the engine's 3 synchronous LPA rounds unrolled — each round
    // is the same (node, label) vote count + (count DESC, label ASC)
    // argmax; integer-only, so the unrolled replay lands exactly
    "gr10_label_prop" ->
      """WITH d AS (SELECT doc_id FROM documents),
        |e0 AS (
        |  SELECT a.doc_id AS u, b.doc_id AS v
        |  FROM d a JOIN d b
        |    ON a.doc_id // 10 = b.doc_id // 10 AND a.doc_id < b.doc_id
        |  UNION ALL
        |  SELECT doc_id, doc_id + 1 FROM d WHERE doc_id % 10 = 9),
        |e AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
        |l0 AS (SELECT DISTINCT u AS node, u AS l FROM e),
        |v1 AS (
        |  SELECT e.u, l.l, count(*)::BIGINT AS c
        |  FROM e JOIN l0 l ON e.v = l.node GROUP BY e.u, l.l),
        |l1 AS (
        |  SELECT u AS node, l FROM (
        |    SELECT u, l, row_number() OVER (
        |      PARTITION BY u ORDER BY c DESC, l) AS rn FROM v1)
        |  WHERE rn = 1),
        |v2 AS (
        |  SELECT e.u, l.l, count(*)::BIGINT AS c
        |  FROM e JOIN l1 l ON e.v = l.node GROUP BY e.u, l.l),
        |l2 AS (
        |  SELECT u AS node, l FROM (
        |    SELECT u, l, row_number() OVER (
        |      PARTITION BY u ORDER BY c DESC, l) AS rn FROM v2)
        |  WHERE rn = 1),
        |v3 AS (
        |  SELECT e.u, l.l, count(*)::BIGINT AS c
        |  FROM e JOIN l2 l ON e.v = l.node GROUP BY e.u, l.l),
        |l3 AS (
        |  SELECT u AS node, l FROM (
        |    SELECT u, l, row_number() OVER (
        |      PARTITION BY u ORDER BY c DESC, l) AS rn FROM v3)
        |  WHERE rn = 1)
        |SELECT node, l AS community FROM l3""".stripMargin,

    // GR12: synchronous Louvain round from singletons — the min-degree
    // neighbor argmin (the k_i·k_j < 2m acceptance is a theorem on
    // simple graphs, so no predicate appears)
    "gr12_louvain_round" ->
      """WITH d AS (SELECT doc_id FROM documents),
        |e0 AS (
        |  SELECT a.doc_id AS u, b.doc_id AS v
        |  FROM d a JOIN d b
        |    ON a.doc_id // 10 = b.doc_id // 10 AND a.doc_id < b.doc_id
        |  UNION ALL
        |  SELECT doc_id, doc_id + 1 FROM d WHERE doc_id % 10 = 9),
        |e AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
        |deg AS (SELECT u AS n, count(*)::BIGINT AS k FROM e GROUP BY 1)
        |SELECT u AS node, v AS community FROM (
        |  SELECT e.u, e.v, row_number() OVER (
        |    PARTITION BY e.u ORDER BY dv.k, e.v) AS rn
        |  FROM e JOIN deg dv ON dv.n = e.v)
        |WHERE rn = 1""".stripMargin,

    // GR11: the same 3 unrolled LPA rounds feed Newman modularity —
    // e_c, d_c, m are exact integers; the two divisions replay 6dp
    "gr11_modularity" ->
      """WITH d AS (SELECT doc_id FROM documents),
        |e0 AS (
        |  SELECT a.doc_id AS u, b.doc_id AS v
        |  FROM d a JOIN d b
        |    ON a.doc_id // 10 = b.doc_id // 10 AND a.doc_id < b.doc_id
        |  UNION ALL
        |  SELECT doc_id, doc_id + 1 FROM d WHERE doc_id % 10 = 9),
        |e AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
        |l0 AS (SELECT DISTINCT u AS node, u AS l FROM e),
        |v1 AS (
        |  SELECT e.u, l.l, count(*)::BIGINT AS c
        |  FROM e JOIN l0 l ON e.v = l.node GROUP BY e.u, l.l),
        |l1 AS (
        |  SELECT u AS node, l FROM (
        |    SELECT u, l, row_number() OVER (
        |      PARTITION BY u ORDER BY c DESC, l) AS rn FROM v1)
        |  WHERE rn = 1),
        |v2 AS (
        |  SELECT e.u, l.l, count(*)::BIGINT AS c
        |  FROM e JOIN l1 l ON e.v = l.node GROUP BY e.u, l.l),
        |l2 AS (
        |  SELECT u AS node, l FROM (
        |    SELECT u, l, row_number() OVER (
        |      PARTITION BY u ORDER BY c DESC, l) AS rn FROM v2)
        |  WHERE rn = 1),
        |v3 AS (
        |  SELECT e.u, l.l, count(*)::BIGINT AS c
        |  FROM e JOIN l2 l ON e.v = l.node GROUP BY e.u, l.l),
        |l3 AS (
        |  SELECT u AS node, l FROM (
        |    SELECT u, l, row_number() OVER (
        |      PARTITION BY u ORDER BY c DESC, l) AS rn FROM v3)
        |  WHERE rn = 1),
        |m AS (SELECT count(*)::BIGINT AS m FROM e0),
        |deg AS (
        |  SELECT node, count(*)::BIGINT AS deg FROM (
        |    SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0)
        |  GROUP BY 1),
        |dc AS (
        |  SELECT l.l AS community, count(*)::BIGINT AS n_nodes,
        |    CAST(sum(deg) AS BIGINT) AS degree_sum
        |  FROM deg d JOIN l3 l USING (node) GROUP BY 1),
        |ie AS (
        |  SELECT la.l AS community, count(*)::BIGINT AS intra_edges
        |  FROM e0
        |  JOIN l3 la ON e0.u = la.node
        |  JOIN l3 lb ON e0.v = lb.node AND la.l = lb.l
        |  GROUP BY 1)
        |SELECT dc.community, n_nodes,
        |  CAST(coalesce(intra_edges, 0) AS BIGINT) AS intra_edges,
        |  degree_sum,
        |  round(CAST(coalesce(intra_edges, 0) AS DOUBLE) / m.m
        |    - (CAST(degree_sum AS DOUBLE) / (2.0 * m.m))
        |    * (CAST(degree_sum AS DOUBLE) / (2.0 * m.m)), 6) AS q_contrib
        |FROM dc LEFT JOIN ie USING (community), m""".stripMargin,

    "gr9_bfs_layers" ->
      """WITH RECURSIVE ch AS (
        |  SELECT doc_id AS sa,
        |    lead(doc_id) OVER (PARTITION BY source ORDER BY doc_id) AS sb
        |  FROM documents),
        |pr AS (SELECT sa, sb FROM ch WHERE sb IS NOT NULL),
        |eda AS (SELECT sa, sb FROM pr UNION SELECT sb, sa FROM pr),
        |sd AS (SELECT min(doc_id) AS node FROM documents GROUP BY source),
        |reach(node, dist) AS (
        |  SELECT node, 0 FROM sd
        |  UNION
        |  SELECT e.sb, r.dist + 1
        |  FROM reach r JOIN eda e ON e.sa = r.node
        |  WHERE r.dist < 6)
        |SELECT node, CAST(min(dist) AS BIGINT) AS dist
        |FROM reach GROUP BY 1""".stripMargin,

    // components as min-reachable-id: the recursive closure is the
    // definitional spec the engine's min-label propagation must match
    "gr3_components" ->
      """WITH RECURSIVE li AS (
        |  SELECT l_orderkey AS ok, CAST(l_shipdate AS DATE) AS d,
        |         l_suppkey AS sid
        |  FROM lineitem),
        |p AS (
        |  SELECT DISTINCT a.sid AS ia, b.sid AS ib
        |  FROM li a JOIN li b
        |    ON a.ok = b.ok AND a.d = b.d AND a.sid < b.sid),
        |e AS (SELECT ia AS s, ib AS t FROM p
        |      UNION ALL SELECT ib, ia FROM p),
        |nodes AS (SELECT DISTINCT s AS id FROM e),
        |reach AS (
        |  SELECT id, id AS r FROM nodes
        |  UNION
        |  SELECT e.s, reach.r FROM e JOIN reach ON e.t = reach.id)
        |SELECT id, min(r) AS cluster FROM reach GROUP BY id""".stripMargin,

    // pca1: quantized Gram upper triangle — per-term pico rounding +
    // integer sums, order-free in both engines (1-based DuckDB array
    // indexing mapped back to the engine's 0-based i/j)
    "pca1_gram" ->
      """WITH idx AS (SELECT unnest(range(1, 65)) AS i)
        |SELECT a.i - 1 AS i, b.i - 1 AS j,
        |  CAST(sum(CAST(round(e.embedding[a.i]::DOUBLE * e.embedding[b.i]::DOUBLE
        |                      * 1000000000000) AS BIGINT)) AS BIGINT) AS g_q
        |FROM embeddings e, idx a, idx b
        |WHERE b.i >= a.i
        |GROUP BY 1, 2""".stripMargin,

    "pca2_power" ->
      s"""WITH $pcaPowerCtes
         |SELECT i - 1 AS dim_idx, val AS loading_fixed FROM v$PcaSteps""".stripMargin,

    "pca3_project" ->
      s"""WITH $pcaPowerCtes
         |SELECT e.vec_id,
         |  CAST(sum(CAST(round(e.embedding[v.i]::DOUBLE * v.val) AS BIGINT))
         |    AS BIGINT) AS score_q
         |FROM embeddings e, v$PcaSteps v
         |GROUP BY 1""".stripMargin,

    // wn1: winnowing replay — identical Horner polynomial (base 257
    // mod 2^31−1) via per-position explode + window min + rn ≥ w
    // (window-level formulation vs the engine's in-array one: same
    // fingerprint sets, different shape)
    "tx32_zipf_slope" ->
      s"""WITH $wordsCte,
         |flat AS (SELECT unnest(w) AS word FROM words),
         |freq AS (
         |  SELECT word, CAST(count(*) AS BIGINT) AS n
         |  FROM flat WHERE word <> '' GROUP BY 1
         |  ORDER BY n DESC, word LIMIT 100),
         |ranked AS (
         |  SELECT CAST(round(ln(CAST(row_number() OVER (ORDER BY n DESC, word) AS DOUBLE)) * 1e6) AS BIGINT) AS x,
         |         CAST(round(ln(CAST(n AS DOUBLE)) * 1e6) AS BIGINT) AS y
         |  FROM freq),
         |a AS (
         |  SELECT CAST(count(*) AS BIGINT) AS k,
         |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |         CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(x * y) AS BIGINT) AS sxy
         |  FROM ranked)
         |SELECT k,
         |       round(CAST(k * sxy - sx * sy AS DOUBLE)
         |         / CAST(k * sxx - sx * sx AS DOUBLE), 6) AS zipf_slope,
         |       round((CAST(sy AS DOUBLE)
         |            - (CAST(k * sxy - sx * sy AS DOUBLE)
         |               / CAST(k * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
         |         / CAST(k AS DOUBLE) / 1e6, 6) AS intercept_ln
         |FROM a""".stripMargin,

    "tx31_source_novelty" ->
      s"""WITH $shinglesCte,
         |g AS (SELECT doc_id, unnest(sh) AS s FROM sh),
         |ss AS (
         |  SELECT DISTINCT d.source AS source, g.s AS s
         |  FROM g JOIN documents d USING (doc_id)),
         |bysh AS (SELECT s, CAST(count(*) AS BIGINT) AS nsrc FROM ss GROUP BY 1)
         |SELECT source,
         |       CAST(count(*) AS BIGINT) AS n_shingles,
         |       CAST(sum(CASE WHEN nsrc = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
         |       round(CAST(sum(CASE WHEN nsrc = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         |         / CAST(count(*) AS DOUBLE), 6) AS novelty
         |FROM ss JOIN bysh USING (s)
         |GROUP BY 1""".stripMargin,

    "wn1_winnow_pairs" -> {
      val horner = (1 until 20).foldLeft(
        "CAST(ascii(substring(t, i, 1)) AS BIGINT)") { (acc, j) =>
        s"(($acc * 257 + ascii(substring(t, i + $j, 1))) % 2147483647)"
      }
      s"""WITH lt AS (
         |  SELECT doc_id, lower(text) AS t FROM documents
         |  WHERE length(lower(text)) >= 29),
         |hs AS (
         |  SELECT doc_id, i, $horner AS h
         |  FROM lt, unnest(range(1, length(t) - 18)) AS u(i)),
         |wins AS (
         |  SELECT doc_id,
         |    min(h) OVER (PARTITION BY doc_id ORDER BY i
         |                 ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS f,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY i) AS rn
         |  FROM hs),
         |fp AS (SELECT DISTINCT doc_id, f FROM wins WHERE rn >= 10)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  count(*)::BIGINT AS shared
         |FROM fp a JOIN fp b ON a.f = b.f AND a.doc_id < b.doc_id
         |GROUP BY 1, 2
         |HAVING count(*) >= 3""".stripMargin
    },

    // er1: ppj1's brute-force pairs → recursive-CTE closure (the gr3
    // discipline) → survivorship window. Both the pair set AND the
    // component labels come from independent algorithms.
    "er1_entities" ->
      """WITH RECURSIVE w AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
        |          FOR i IN range(1, len(ws) - 1)]) AS t
        |  FROM w WHERE len(ws) >= 3),
        |tok AS (SELECT doc_id, unnest(t) AS token FROM sh),
        |sz AS (SELECT doc_id, count(*) AS s FROM tok GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
        |  FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |p AS (
        |  SELECT da, db FROM inter
        |  JOIN sz sa ON da = sa.doc_id JOIN sz sb ON db = sb.doc_id
        |  WHERE i * 1000000 >= 500000 * (sa.s + sb.s - i)),
        |e AS (SELECT da AS s, db AS t FROM p
        |      UNION ALL SELECT db, da FROM p),
        |nodes AS (SELECT DISTINCT s AS id FROM e),
        |reach AS (
        |  SELECT id, id AS r FROM nodes
        |  UNION
        |  SELECT e.s, reach.r FROM e JOIN reach ON e.t = reach.id),
        |lab AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id),
        |ent AS (
        |  SELECT d.doc_id, coalesce(l.cluster, d.doc_id) AS entity, d.n_chars
        |  FROM documents d LEFT JOIN lab l ON d.doc_id = l.id),
        |rk AS (
        |  SELECT entity, doc_id,
        |    row_number() OVER (PARTITION BY entity
        |                       ORDER BY n_chars DESC, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY entity) AS n
        |  FROM ent)
        |SELECT entity, CAST(max(n) AS BIGINT) AS n_members,
        |  max(CASE WHEN rn = 1 THEN doc_id END) AS canonical_doc
        |FROM rk GROUP BY entity""".stripMargin,

    // ppj1: brute-force θ-Jaccard join — deliberately a DIFFERENT
    // algorithm from the engine's AllPairs prefix filter (token
    // equi-join intersection counts, no prefix pruning), so the
    // lossless-ness of the prefix filter is what the hash pins.
    // Integer threshold form (inter·10⁶ ≥ θ·10⁶·union) keeps floats
    // out of the filter; jaccard is one per-row IEEE division.
    "ppj1_prefix_join" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
        |          FOR i IN range(1, len(ws) - 1)]) AS t
        |  FROM w WHERE len(ws) >= 3),
        |tok AS (SELECT doc_id, unnest(t) AS token FROM sh),
        |sz AS (SELECT doc_id, count(*) AS s FROM tok GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
        |  FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT da AS doc_a, db AS doc_b,
        |  CAST(i AS BIGINT) AS inter_size,
        |  CAST(sa.s + sb.s - i AS BIGINT) AS union_size,
        |  CAST(i AS DOUBLE) / (sa.s + sb.s - i) AS jaccard
        |FROM inter
        |JOIN sz sa ON da = sa.doc_id
        |JOIN sz sb ON db = sb.doc_id
        |WHERE i * 1000000 >= 500000 * (sa.s + sb.s - i)""".stripMargin
  )

  /** IVFADC replay (sim3's cell assignment ∘ sim6's ADC scoring) —
    * shared by sim7 (in-memory index) and sim8 (published index). */
  private lazy val sim7IvfadcSql: String = {
      def sqDist(a: String, b: String) =
        s"sqrt(list_sum(list_transform(range(1, 65), " +
          s"i -> ($a[i]::DOUBLE - $b[i]::DOUBLE) * ($a[i]::DOUBLE - $b[i]::DOUBLE))))"
      def sq8(a: String, b: String) =
        s"list_sum(list_transform(range(1, 9), " +
          s"i -> ($a::DOUBLE - $b::DOUBLE) * ($a::DOUBLE - $b::DOUBLE)))"
      val encDist = sq8("e.embedding[cb.subspace * 8 + i]", "cb.sc[i]")
      val adcDist =
        "list_sum(list_transform(range(0, 8), s -> " +
          "list_sum(list_transform(range(1, 9), i -> " +
          "(q.embedding[s * 8 + i]::DOUBLE - cbn.cbl[s + 1][c.codes[s + 1] + 1][i]::DOUBLE) * " +
          "(q.embedding[s * 8 + i]::DOUBLE - cbn.cbl[s + 1][c.codes[s + 1] + 1][i]::DOUBLE)))))"
      s"""WITH cent AS (
         |  SELECT e2.label AS cell_id, e2.embedding AS centroid
         |  FROM (SELECT label, min(vec_id) AS cid FROM embeddings GROUP BY 1) m
         |  JOIN embeddings e2 ON e2.vec_id = m.cid),
         |asgn AS (
         |  SELECT vec_id, cell_id FROM (
         |    SELECT e.vec_id, c.cell_id,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${sqDist("e.embedding", "c.centroid")}, c.cell_id) AS rn
         |    FROM embeddings e CROSS JOIN cent c)
         |  WHERE rn = 1),
         |cb AS (
         |  SELECT t.s AS subspace, e.vec_id AS code,
         |         e.embedding[t.s * 8 + 1 : t.s * 8 + 8] AS sc
         |  FROM embeddings e, range(0, 8) t(s) WHERE e.vec_id < 8),
         |enc AS (
         |  SELECT vec_id, subspace, code FROM (
         |    SELECT e.vec_id, cb.subspace, cb.code,
         |      row_number() OVER (PARTITION BY e.vec_id, cb.subspace
         |        ORDER BY $encDist, cb.code) AS rn
         |    FROM embeddings e CROSS JOIN cb)
         |  WHERE rn = 1),
         |encl AS (
         |  SELECT vec_id, list(code ORDER BY subspace) AS codes
         |  FROM enc GROUP BY 1),
         |cb1 AS (SELECT subspace, list(sc ORDER BY code) AS cents
         |        FROM cb GROUP BY 1),
         |cbn AS (SELECT list(cents ORDER BY subspace) AS cbl FROM cb1),
         |scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |         round($adcDist, 6) AS adist
         |  FROM embeddings q
         |  JOIN asgn qa ON q.vec_id = qa.vec_id
         |  JOIN asgn ca ON ca.cell_id = qa.cell_id
         |  JOIN encl c ON c.vec_id = ca.vec_id, cbn
         |  WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY adist, neighbor_id) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, adist, CAST(rank AS INT) AS rank
         |FROM ranked WHERE rank <= 5""".stripMargin
  }
}
