package graft.queries

/** DuckDB oracle SQL for every query in [[RelationalQueries]] — the
  * independent ground truth the driver executes against the same parquet
  * tables. Formulas mirror the Spark side EXACTLY (same rounding, same
  * tiebreaks, same border handling); see determinism rules in
  * RelationalQueries' scaladoc.
  */
object Oracles {

  private val win =
    "WINDOW win AS (PARTITION BY source ORDER BY doc_id ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING)"

  private val statsCte =
    s"""WITH s1 AS (
       |  SELECT doc_id, source, n_chars,
       |         avg(n_chars) OVER win AS m,
       |         coalesce(stddev_pop(n_chars) OVER win, 0) AS s
       |  FROM documents $win
       |)""".stripMargin

  val all: Map[String, String] = Map(
    "q_window_stats" ->
      s"""SELECT doc_id, round(avg(n_chars) OVER win, 4) AS wmean,
         |       round(coalesce(stddev_pop(n_chars) OVER win, 0), 4) AS wstd
         |FROM documents $win ORDER BY doc_id""".stripMargin,

    "q_sauvola" ->
      s"""$statsCte
         |SELECT doc_id, thr, CASE WHEN n_chars > thr THEN 1 ELSE 0 END AS keep
         |FROM (SELECT doc_id, n_chars, round(m * (1 + 0.2 * (s / 128.0 - 1)), 4) AS thr FROM s1)
         |ORDER BY doc_id""".stripMargin,

    "q_niblack" ->
      s"""$statsCte
         |SELECT doc_id, thr, CASE WHEN n_chars > thr THEN 1 ELSE 0 END AS keep
         |FROM (SELECT doc_id, n_chars, round(m + 0.2 * s, 4) AS thr FROM s1)
         |ORDER BY doc_id""".stripMargin,

    "q_nick" ->
      s"""$statsCte
         |SELECT doc_id, thr, CASE WHEN n_chars > thr THEN 1 ELSE 0 END AS keep
         |FROM (SELECT doc_id, n_chars, round(m - 0.1 * sqrt(m*m + s*s), 4) AS thr FROM s1)
         |ORDER BY doc_id""".stripMargin,

    "q_wolfjolion" ->
      s"""$statsCte, s2 AS (
         |  SELECT doc_id, m, s,
         |         greatest(max(s) OVER (PARTITION BY source), 1e-9) AS smax,
         |         min(n_chars) OVER (PARTITION BY source) AS mn
         |  FROM s1)
         |SELECT doc_id, round(m + 0.5 * (s / smax - 1) * (m - mn), 4) AS thr
         |FROM s2 ORDER BY doc_id""".stripMargin,

    "q_feng" ->
      s"""$statsCte, s2 AS (
         |  SELECT doc_id, m, s,
         |         greatest(max(s) OVER (PARTITION BY source), 1e-9) AS rs,
         |         min(n_chars) OVER (PARTITION BY source) AS mn
         |  FROM s1)
         |SELECT doc_id,
         |       round(0.25 * m + (0.2 * pow(s/rs, 2.0)) * (s/rs) * (m - mn)
         |             + (0.03 * pow(s/rs, 2.0)) * mn, 4) AS thr
         |FROM s2 ORDER BY doc_id""".stripMargin,

    "q_meanc" ->
      s"""$statsCte
         |SELECT doc_id, thr, CASE WHEN n_chars > thr THEN 1 ELSE 0 END AS keep
         |FROM (SELECT doc_id, n_chars, round(m - 10.0, 4) AS thr FROM s1)
         |ORDER BY doc_id""".stripMargin,

    "q_gaussadaptive" ->
      """WITH g AS (
        |  SELECT doc_id, n_chars,
        |    coalesce(lag(n_chars, 1) OVER w, n_chars) AS l1,
        |    coalesce(lag(n_chars, 2) OVER w, n_chars) AS l2,
        |    coalesce(lead(n_chars, 1) OVER w, n_chars) AS r1,
        |    coalesce(lead(n_chars, 2) OVER w, n_chars) AS r2
        |  FROM documents WINDOW w AS (PARTITION BY source ORDER BY doc_id))
        |SELECT doc_id,
        |       round(0.0545*(l2+r2) + 0.2442*(l1+r1) + 0.4026*n_chars - 10.0, 4) AS thr
        |FROM g ORDER BY doc_id""".stripMargin,

    "q_medianmean" ->
      """WITH g AS (
        |  SELECT doc_id, source, n_chars,
        |    coalesce(lag(n_chars, 1) OVER w, n_chars) AS a,
        |    coalesce(lead(n_chars, 1) OVER w, n_chars) AS c2
        |  FROM documents WINDOW w AS (PARTITION BY source ORDER BY doc_id)),
        |m3 AS (
        |  SELECT doc_id, source,
        |         greatest(least(a, n_chars), least(greatest(a, n_chars), c2)) AS med3
        |  FROM g)
        |SELECT doc_id, med3,
        |       round(avg(med3) OVER (PARTITION BY source ORDER BY doc_id
        |             ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING) - 10.0, 4) AS thr
        |FROM m3 ORDER BY doc_id""".stripMargin,

    "q_mokji" ->
      """WITH nb AS (
        |  SELECT source, n_chars,
        |    greatest(coalesce(lag(n_chars) OVER w, n_chars), n_chars,
        |             coalesce(lead(n_chars) OVER w, n_chars)) AS mx
        |  FROM documents WINDOW w AS (PARTITION BY source ORDER BY doc_id)),
        |agg AS (
        |  SELECT source,
        |    cast(sum(CASE WHEN mx - n_chars >= 20 THEN mx + n_chars ELSE 0 END) AS BIGINT) AS num,
        |    cast(sum(CASE WHEN mx - n_chars >= 20 THEN 2 ELSE 0 END) AS BIGINT) AS den
        |  FROM nb GROUP BY source)
        |SELECT source, round(coalesce(num / nullif(den, 0), -1.0), 4) AS thr
        |FROM agg ORDER BY source""".stripMargin,

    "q_otsu" ->
      """WITH ext AS (
        |  SELECT doc_id, source, n_chars,
        |    min(n_chars) OVER (PARTITION BY source) AS mn,
        |    max(n_chars) OVER (PARTITION BY source) AS mx
        |  FROM documents),
        |b AS (
        |  SELECT source,
        |    least(cast(floor((n_chars - mn) * 32.0 / greatest(mx - mn, 1)) AS INT), 31) AS bin
        |  FROM ext),
        |h AS (SELECT source, bin, count(*) AS c FROM b GROUP BY 1, 2),
        |t AS (
        |  SELECT source, bin, c,
        |    sum(c) OVER (PARTITION BY source) AS tot,
        |    sum(bin * c) OVER (PARTITION BY source) AS sumAll,
        |    sum(c) OVER (PARTITION BY source ORDER BY bin) AS wB,
        |    sum(bin * c) OVER (PARTITION BY source ORDER BY bin) AS sumB
        |  FROM h),
        |d AS (
        |  SELECT source, bin,
        |    wB, tot,
        |    sumB * 1.0 / wB - (sumAll - sumB) * 1.0 / (tot - wB) AS diff
        |  FROM t WHERE wB > 0 AND wB < tot),
        |v AS (
        |  SELECT source, bin, (wB * (tot - wB)) * (diff * diff) AS between_var
        |  FROM d)
        |SELECT source, bin AS otsu_bin FROM v
        |QUALIFY row_number() OVER (PARTITION BY source ORDER BY between_var DESC, bin ASC) = 1
        |ORDER BY source""".stripMargin,

    "q_median_smooth" ->
      """WITH l AS (
        |  SELECT doc_id, source, CASE WHEN n_chars > 300 THEN 1 ELSE 0 END AS lab
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, lab,
        |    coalesce(lag(lab) OVER w, lab) AS a,
        |    coalesce(lead(lab) OVER w, lab) AS c2
        |  FROM l WINDOW w AS (PARTITION BY source ORDER BY doc_id))
        |SELECT doc_id, lab,
        |       greatest(least(a, lab), least(greatest(a, lab), c2)) AS sm
        |FROM g ORDER BY doc_id""".stripMargin,

    "q_dilate_erode" ->
      """WITH l AS (
        |  SELECT doc_id, source, CASE WHEN n_chars > 300 THEN 1 ELSE 0 END AS lab
        |  FROM documents)
        |SELECT doc_id, lab,
        |  max(lab) OVER w1 AS dil,
        |  min(lab) OVER w1 AS ero
        |FROM l WINDOW w1 AS (PARTITION BY source ORDER BY doc_id
        |                     ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
        |ORDER BY doc_id""".stripMargin,

    "q_remove_margins" ->
      """WITH r AS (
        |  SELECT doc_id, n_chars,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn,
        |    count(*) OVER (PARTITION BY source) AS cnt
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN (rn <= cnt * 0.1 OR rn > cnt - cnt * 0.1) AND n_chars < 150
        |       THEN 1 ELSE 0 END AS dropped
        |FROM r ORDER BY doc_id""".stripMargin,

    "q_remove_repeats" ->
      """WITH b AS (
        |  SELECT doc_id, source, floor(n_chars / 50.0) AS bucket
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, bucket,
        |    CASE WHEN lag(bucket) OVER w IS NULL OR bucket != lag(bucket) OVER w
        |         THEN 1 ELSE 0 END AS chg
        |  FROM b WINDOW w AS (PARTITION BY source ORDER BY doc_id)),
        |r AS (
        |  SELECT doc_id, source,
        |    sum(chg) OVER (PARTITION BY source ORDER BY doc_id) AS run_id
        |  FROM c),
        |rl AS (
        |  SELECT doc_id, count(*) OVER (PARTITION BY source, run_id) AS runlen
        |  FROM r)
        |SELECT doc_id, CASE WHEN runlen < 3 THEN 1 ELSE 0 END AS kept
        |FROM rl ORDER BY doc_id""".stripMargin,

    "q_tiny_isolated" ->
      """WITH s AS (
        |  SELECT doc_id, source, CASE WHEN n_chars < 150 THEN 1 ELSE 0 END AS small
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, small,
        |    coalesce(lag(small) OVER w, 0) AS ln,
        |    coalesce(lead(small) OVER w, 0) AS rn2
        |  FROM s WINDOW w AS (PARTITION BY source ORDER BY doc_id))
        |SELECT doc_id,
        |  CASE WHEN small = 1 AND ln = 0 AND rn2 = 0 THEN 1 ELSE 0 END AS dropped
        |FROM g ORDER BY doc_id""".stripMargin,

    "q_gamma_lut" ->
      """SELECT doc_id, round(pow(n_chars / 600.0, 2.2) * 255.0, 4) AS gamma_out
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_white_balance" ->
      """WITH p AS (
        |  SELECT doc_id, n_chars,
        |    quantile_cont(n_chars, 0.05) OVER (PARTITION BY source) AS p05,
        |    quantile_cont(n_chars, 0.95) OVER (PARTITION BY source) AS p95
        |  FROM documents)
        |SELECT doc_id,
        |  round((least(greatest(n_chars * 1.0, p05), p95) - p05) / (p95 - p05), 4) AS wb
        |FROM p ORDER BY doc_id""".stripMargin,

    // colorBalance (balanceColor.cpp:35-91): sqrt/square channel gammas +
    // HSV saturation scaling, all single correctly-rounded IEEE ops
    "q_color_balance" ->
      """WITH c AS (
        |  SELECT doc_id, source,
        |    len(string_split(text, ' ')) * 1.0 AS toks,
        |    len(list_distinct(string_split(text, ' '))) * 1.0 AS dtoks,
        |    n_chars
        |  FROM documents),
        |n AS (
        |  SELECT doc_id,
        |    toks / max(toks) OVER (PARTITION BY source) AS b,
        |    (n_chars * 1.0) / max(n_chars) OVER (PARTITION BY source) AS g,
        |    dtoks / max(dtoks) OVER (PARTITION BY source) AS r
        |  FROM c),
        |bal AS (
        |  SELECT doc_id, sqrt(b) AS bb, g, r * r AS rb FROM n),
        |hsv AS (
        |  SELECT doc_id, bb, g, rb,
        |    greatest(bb, g, rb) AS v, least(bb, g, rb) AS mn
        |  FROM bal),
        |sat AS (
        |  SELECT doc_id, bb, g, rb, v,
        |    CASE WHEN v > 0 THEN (v - mn) / v ELSE 0.0 END AS s
        |  FROM hsv)
        |SELECT doc_id,
        |  round(v - (v - bb) * s, 4) AS b_bal,
        |  round(v - (v - g) * s, 4) AS g_bal,
        |  round(v - (v - rb) * s, 4) AS r_bal
        |FROM sat ORDER BY doc_id""".stripMargin,

    // salted distinct count must equal the plain DISTINCT aggregate
    "q_salted_distinct" ->
      """SELECT source, count(DISTINCT text) AS n_distinct
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "q_gray_world" ->
      """WITH r AS (
        |  SELECT doc_id, n_chars,
        |    sqrt(avg(n_chars * n_chars) OVER (PARTITION BY source)) AS rms
        |  FROM documents)
        |SELECT doc_id, round(n_chars / rms, 4) AS gw FROM r ORDER BY doc_id""".stripMargin,

    "q_scale_range" ->
      """WITH r AS (
        |  SELECT doc_id, n_chars,
        |    min(n_chars) OVER (PARTITION BY source) AS mn,
        |    max(n_chars) OVER (PARTITION BY source) AS mx
        |  FROM documents)
        |SELECT doc_id,
        |  round((n_chars - mn) / (greatest(mx - mn, 1) * 1.0), 4) AS scaled
        |FROM r ORDER BY doc_id""".stripMargin,

    "q_equalize_hist" ->
      """SELECT doc_id,
        |  round(percent_rank() OVER (PARTITION BY source ORDER BY n_chars, doc_id), 4) AS rank_norm
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_hist" ->
      """SELECT source, cast(floor(n_chars / 50.0) AS INT) AS bucket, count(*) AS c
        |FROM documents GROUP BY 1, 2 ORDER BY source, bucket""".stripMargin,

    "q_canon" ->
      """WITH c AS (
        |  SELECT doc_id, trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g')) AS canon
        |  FROM documents)
        |SELECT doc_id, len(string_split(canon, ' ')) AS n_tokens,
        |       substring(canon, 1, 60) AS head
        |FROM c ORDER BY doc_id""".stripMargin,

    "q_quality_scores" ->
      """SELECT doc_id,
        |  round(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) / (length(text) * 1.0), 4) AS punct_ratio,
        |  round(length(regexp_replace(text, '[^0-9]', '', 'g')) / (length(text) * 1.0), 4) AS digit_ratio,
        |  round((length(text) - length(replace(text, ' ', ''))) / (length(text) * 1.0), 4) AS ws_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_lang_gate" ->
      "SELECT lang, count(*) AS n FROM documents GROUP BY 1 ORDER BY lang",

    "q_golden_join" ->
      """SELECT c.c_mktsegment AS seg, count(*) AS n,
        |       min(o.o_orderkey) AS min_ok, max(o.o_orderkey) AS max_ok
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY 1 ORDER BY seg""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_semi_join" ->
      """SELECT c_mktsegment AS seg, count(*) AS n FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |GROUP BY 1 ORDER BY seg""".stripMargin,

    "q_lineage_agg" ->
      """SELECT source, count(*) AS doc_count, cast(sum(n_chars) AS BIGINT) AS chars,
        |       min(doc_id) AS mn, max(doc_id) AS mx
        |FROM documents GROUP BY 1 ORDER BY source""".stripMargin,

    "q_topk" ->
      """SELECT source, rn, doc_id, n_chars FROM (
        |  SELECT source, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id ASC) AS rn
        |  FROM documents)
        |WHERE rn <= 3 ORDER BY source, rn""".stripMargin,

    "q_distinct_sources" ->
      """SELECT lang, count(DISTINCT source) AS n_sources
        |FROM documents GROUP BY 1 ORDER BY lang""".stripMargin,

    "q_dedup_exact" ->
      """SELECT md5(text) AS h, count(*) AS c, min(doc_id) AS keeper
        |FROM documents GROUP BY 1 ORDER BY h""".stripMargin,

    "q_minhash" ->
      """WITH w AS (
        |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w
        |  FROM documents),
        |sig AS (
        |  SELECT doc_id,
        |    min(md5(w || '#0')) AS m0, min(md5(w || '#1')) AS m1,
        |    min(md5(w || '#2')) AS m2, min(md5(w || '#3')) AS m3
        |  FROM w GROUP BY doc_id)
        |SELECT doc_id, m0, m1, m2, m3,
        |       substring(m0, 1, 4) || substring(m1, 1, 4) AS band
        |FROM sig ORDER BY doc_id""".stripMargin,

    "q_ngram_jaccard" ->
      """WITH t AS (
        |  SELECT doc_id, source, list_distinct(string_split(text, ' ')) AS toks
        |  FROM documents)
        |SELECT a.doc_id AS doc_id,
        |  round(len(list_intersect(a.toks, b.toks)) /
        |        (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)) * 1.0), 4) AS jaccard
        |FROM t a JOIN t b ON b.doc_id = a.doc_id + 1 AND a.source = b.source
        |ORDER BY a.doc_id""".stripMargin,

    "q_embed_norm" ->
      """SELECT vec_id,
        |  round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 3) AS l2
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q_ann_topk" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id % 50 = 0),
        |e AS (SELECT vec_id, embedding::DOUBLE[] AS dv FROM embeddings),
        |s AS (
        |  SELECT q.qid, e.vec_id, round(list_dot_product(q.qv, e.dv), 3) AS dot
        |  FROM q CROSS JOIN e WHERE e.vec_id != q.qid)
        |SELECT qid, row_number() OVER (PARTITION BY qid ORDER BY dot DESC, vec_id ASC) AS rn,
        |       vec_id, dot
        |FROM s
        |QUALIFY rn <= 3
        |ORDER BY qid, rn""".stripMargin,

    "q_lsh_bucket" ->
      """WITH x AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
        |         unnest(embedding::DOUBLE[]) AS v
        |  FROM embeddings),
        |d AS (
        |  SELECT vec_id,
        |    round(sum(v * ((pos * 37) % 13 - 6)), 3) AS d0,
        |    round(sum(v * ((pos * 37 + 17) % 13 - 6)), 3) AS d1
        |  FROM x GROUP BY vec_id)
        |SELECT vec_id,
        |  (CASE WHEN d0 > 0 THEN 2 ELSE 0 END) + (CASE WHEN d1 > 0 THEN 1 ELSE 0 END) AS bucket
        |FROM d ORDER BY vec_id""".stripMargin,

    "q_kuwahara" ->
      """WITH k AS (
        |  SELECT doc_id,
        |    avg(n_chars) OVER lw AS lm,
        |    coalesce(stddev_pop(n_chars) OVER lw, 0) AS ls,
        |    avg(n_chars) OVER rw AS rm,
        |    coalesce(stddev_pop(n_chars) OVER rw, 0) AS rs
        |  FROM documents
        |  WINDOW lw AS (PARTITION BY source ORDER BY doc_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
        |         rw AS (PARTITION BY source ORDER BY doc_id ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING))
        |SELECT doc_id, round(CASE WHEN ls <= rs THEN lm ELSE rm END, 4) AS kw
        |FROM k ORDER BY doc_id""".stripMargin,

    "q_sharpen" ->
      s"""SELECT doc_id,
         |  round(n_chars + 0.5 * (n_chars - avg(n_chars) OVER win), 4) AS sharp
         |FROM documents $win ORDER BY doc_id""".stripMargin,

    "q_variance_map" ->
      s"""SELECT doc_id,
         |  round(greatest(coalesce(var_pop(n_chars) OVER win, 0), 0.01), 4) AS varmap
         |FROM documents $win ORDER BY doc_id""".stripMargin,

    "q_skeleton" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS skel
        |  FROM documents)
        |SELECT doc_id, length(skel) AS skel_len, substring(skel, 1, 40) AS skel_head
        |FROM s ORDER BY doc_id""".stripMargin,

    "q_simhash" ->
      ("""WITH w AS (
        |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, CAST(('0x' || substr(md5(w), 1, 4)) AS INTEGER) AS h
        |  FROM w),
        |s AS (
        |  SELECT doc_id,
        |""".stripMargin +
        (0 until 16).map(b => s"    sum(((h >> $b) & 1) * 2 - 1) AS s$b").mkString(",\n") +
        "\n  FROM h GROUP BY doc_id)\nSELECT doc_id,\n  " +
        (0 until 16).map(b => s"(CASE WHEN s$b > 0 THEN ${1 << b} ELSE 0 END)").mkString(" + ") +
        " AS simhash\nFROM s ORDER BY doc_id"),

    "q_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(7 AS BIGINT), list_transform(string_split(substring(text, 1, 40), ''), c -> CAST(ascii(c) AS BIGINT))),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, event_id, cast(floor(epoch(ts)) AS BIGINT) AS ts_s,
        |    lag(cast(floor(epoch(ts)) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |n AS (
        |  SELECT user_id, event_id, ts_s,
        |    CASE WHEN prev IS NULL OR ts_s - prev > 1800 THEN 1 ELSE 0 END AS newsess
        |  FROM g),
        |s AS (
        |  SELECT user_id,
        |    sum(newsess) OVER (PARTITION BY user_id ORDER BY ts_s, event_id) AS sess
        |  FROM n)
        |SELECT user_id, cast(max(sess) AS BIGINT) AS n_sessions, count(*) AS n_events
        |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_canon_expr" ->
      """WITH c AS (
        |  SELECT doc_id, trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g')) AS canon
        |  FROM documents)
        |SELECT doc_id, len(string_split(canon, ' ')) AS n_tokens,
        |       substring(canon, 1, 60) AS head
        |FROM c ORDER BY doc_id""".stripMargin,

    // Char n-gram (1..3) language id: the oracle REPLAYS the frozen profile
    // table (graft.ops.LangProfiles.weightTable — same 25-language integer
    // per-mille weights the native LangIdExpr scores against) but recomputes
    // normalization, n-gram extraction, the integer occurrence-weight dot
    // product, the cosine-squared score dot²/‖w_L‖² (two IEEE double ops
    // over exact integers — bit-identical across engines) and the argmax
    // entirely in SQL.
    "q_lang_id" -> {
      def esc(s: String) = s.replace("'", "''")
      val rows = graft.ops.LangProfiles.weightTable
        .map { case (lang, g, w) => s"('$lang','${esc(g)}',$w)" }
        .mkString(",")
      s"""WITH t AS (
         |  SELECT doc_id,
         |    regexp_replace(translate(text,
         |      'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'),
         |      '[ \\t\\n\\r]+', ' ', 'g') AS txt
         |  FROM documents),
         |g AS (
         |  SELECT doc_id, substring(txt, i.i, l.l) AS gram
         |  FROM t,
         |    LATERAL (SELECT unnest(range(1, length(txt) + 1)) AS i) i,
         |    LATERAL (SELECT unnest([1, 2, 3]) AS l) l
         |  WHERE i.i + l.l <= length(txt) + 1),
         |p(lang, gram, w) AS (VALUES $rows),
         |nn AS (SELECT lang, sum(w::BIGINT * w)::BIGINT AS norm2 FROM p GROUP BY 1),
         |s AS (
         |  SELECT g.doc_id, p.lang, sum(p.w)::BIGINT AS dot
         |  FROM g JOIN p USING (gram) GROUP BY 1, 2),
         |sc AS (
         |  SELECT s.doc_id, s.lang,
         |    (s.dot::DOUBLE * s.dot::DOUBLE) / nn.norm2::DOUBLE AS score
         |  FROM s JOIN nn USING (lang) WHERE s.dot > 0),
         |b AS (
         |  SELECT doc_id, lang,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang ASC) AS rn
         |  FROM sc)
         |SELECT d.doc_id, coalesce(b.lang, 'und') AS lang_pred
         |FROM documents d LEFT JOIN b ON d.doc_id = b.doc_id AND b.rn = 1
         |ORDER BY d.doc_id""".stripMargin
    },

    // findAngle mode computation (deskew.cpp:139-206): min-line-length gate,
    // delta-bucket clustering, first-encountered-mode tie-break
    "q_angle" ->
      """WITH mx AS (SELECT source, max(n_chars) AS mx FROM documents GROUP BY 1),
        |l AS (
        |  SELECT d.source, d.doc_id, cast(floor(d.n_chars / 64.0) AS INT) AS bucket
        |  FROM documents d JOIN mx USING (source) WHERE d.n_chars * 8 >= mx.mx),
        |c AS (
        |  SELECT source, bucket, count(*) AS c, min(doc_id) AS first_id
        |  FROM l GROUP BY 1, 2),
        |r AS (
        |  SELECT source, bucket, c,
        |    row_number() OVER (PARTITION BY source ORDER BY c DESC, first_id ASC, bucket ASC) AS rn
        |  FROM c)
        |SELECT source, bucket AS angle_bucket, c AS n_lines
        |FROM r WHERE rn = 1 ORDER BY source""".stripMargin,

    // rotate 90° exact path: column-major position in a 4-wide row-major grid
    "q_rotate" ->
      """WITH g AS (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1 AS rn0,
        |    count(*) OVER (PARTITION BY source) AS cnt
        |  FROM documents)
        |SELECT source, doc_id,
        |  cast((rn0 % 4) * cast((cnt - cnt % 4) / 4 AS INT)
        |       + least(rn0 % 4, cnt % 4)
        |       + cast((rn0 - rn0 % 4) / 4 AS INT) AS INT) AS new_pos
        |FROM g ORDER BY source, new_pos""".stripMargin,

    "q_dedup_api" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY md5(text)) THEN 1 ELSE 0 END AS canonical
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_lsh_pairs" ->
      """WITH w AS (
        |  SELECT doc_id AS id, unnest(list_distinct(string_split(text, ' '))) AS w
        |  FROM documents),
        |sig AS (
        |  SELECT id,
        |    min(md5(w || '#0')) AS m0, min(md5(w || '#1')) AS m1,
        |    min(md5(w || '#2')) AS m2, min(md5(w || '#3')) AS m3,
        |    min(md5(w || '#4')) AS m4, min(md5(w || '#5')) AS m5,
        |    min(md5(w || '#6')) AS m6, min(md5(w || '#7')) AS m7
        |  FROM w GROUP BY id),
        |banded AS (
        |  SELECT id, 0 AS band, m0 || m1 AS band_key FROM sig UNION ALL
        |  SELECT id, 1, m2 || m3 FROM sig UNION ALL
        |  SELECT id, 2, m4 || m5 FROM sig UNION ALL
        |  SELECT id, 3, m6 || m7 FROM sig),
        |admitted AS (
        |  SELECT band, band_key FROM banded
        |  GROUP BY band, band_key HAVING count(*) <= 10000)
        |SELECT DISTINCT a.id AS id_a, b.id AS id_b
        |FROM banded a
        |JOIN admitted ad ON a.band = ad.band AND a.band_key = ad.band_key
        |JOIN banded b ON a.band = b.band AND a.band_key = b.band_key
        |WHERE a.id < b.id
        |ORDER BY id_a, id_b""".stripMargin,

    "q_ann_bucketed" ->
      """WITH x AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
        |         unnest(embedding::DOUBLE[]) AS v
        |  FROM embeddings),
        |d AS (
        |  SELECT vec_id,
        |    sum(v * ((pos * 37) % 13 - 6)) AS d0,
        |    sum(v * ((pos * 37 + 17) % 13 - 6)) AS d1
        |  FROM x GROUP BY vec_id),
        |bk AS (
        |  SELECT vec_id,
        |    (CASE WHEN d0 > 0 THEN 1 ELSE 0 END) + (CASE WHEN d1 > 0 THEN 2 ELSE 0 END) AS bucket
        |  FROM d),
        |e AS (SELECT vec_id, embedding::DOUBLE[] AS dv FROM embeddings),
        |q AS (SELECT e.vec_id AS qid, e.dv AS qv, bk.bucket
        |      FROM e JOIN bk ON e.vec_id = bk.vec_id WHERE e.vec_id % 50 = 0),
        |s AS (
        |  SELECT q.qid, e.vec_id,
        |         round(list_dot_product(q.qv, e.dv), 6) AS score
        |  FROM q JOIN bk ON q.bucket = bk.bucket
        |         JOIN e ON e.vec_id = bk.vec_id
        |  WHERE e.vec_id != q.qid)
        |SELECT qid, row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id ASC) AS rn,
        |       vec_id, score
        |FROM s QUALIFY rn <= 3 ORDER BY qid, rn""".stripMargin,

    "q_ivf_topk" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS dv FROM embeddings),
        |a AS (SELECT vec_id AS anchor_id, dv AS av FROM e WHERE vec_id % 37 = 0),
        |dist AS (
        |  -- same per-element (x-y)^2 accumulation as Spark's sqDist — the
        |  -- algebraic expansion dot(x,x)-2dot(x,y)+dot(y,y) rounds
        |  -- differently near a .5e-6 boundary and can tie-flip a cell
        |  -- assignment (ADVICE r2)
        |  SELECT e.vec_id, e.dv, a.anchor_id,
        |    round(list_sum(list_transform(list_zip(e.dv, a.av),
        |          s -> (s[1] - s[2]) * (s[1] - s[2]))), 6) AS d2
        |  FROM e CROSS JOIN a),
        |cells AS (
        |  SELECT vec_id, dv, anchor_id AS cell FROM dist
        |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, anchor_id ASC) = 1),
        |probes AS (
        |  SELECT vec_id AS qid, dv AS qv, anchor_id AS cell FROM dist
        |  WHERE vec_id % 50 = 0
        |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, anchor_id ASC) <= 2),
        |s AS (
        |  SELECT p.qid, c.vec_id, round(list_dot_product(p.qv, c.dv), 6) AS score
        |  FROM probes p JOIN cells c ON p.cell = c.cell
        |  WHERE c.vec_id != p.qid)
        |SELECT qid, row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id ASC) AS rn,
        |       vec_id, score
        |FROM s QUALIFY rn <= 3 ORDER BY qid, rn""".stripMargin,

    "q_embed_neardup" ->
      """WITH x AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
        |         unnest(embedding::DOUBLE[]) AS v
        |  FROM embeddings),
        |d AS (
        |  SELECT vec_id,
        |    sum(v * ((pos * 37) % 13 - 6)) AS d0,
        |    sum(v * ((pos * 37 + 17) % 13 - 6)) AS d1
        |  FROM x GROUP BY vec_id),
        |bk AS (
        |  SELECT vec_id,
        |    (CASE WHEN d0 > 0 THEN 1 ELSE 0 END) + (CASE WHEN d1 > 0 THEN 2 ELSE 0 END) AS bucket
        |  FROM d),
        |e AS (SELECT vec_id, embedding::DOUBLE[] AS dv FROM embeddings),
        |p AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    round(list_dot_product(ea.dv, eb.dv) /
        |      (sqrt(list_dot_product(ea.dv, ea.dv)) * sqrt(list_dot_product(eb.dv, eb.dv))), 6) AS cos
        |  FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        |  JOIN e ea ON ea.vec_id = a.vec_id JOIN e eb ON eb.vec_id = b.vec_id)
        |SELECT id_a, id_b, cos FROM p WHERE cos >= 0.35 ORDER BY id_a, id_b""".stripMargin,

    "q_multimodal" ->
      """SELECT doc_id, 'png' AS format,
        |  64 + doc_id % 64 AS width, 32 + doc_id % 32 AS height,
        |  cast(289 + doc_id % 256 AS BIGINT) AS bytes,
        |  cast(10000 AS BIGINT) AS feat_sum_e4
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_multimodal_pixels" ->
      """WITH xs AS (SELECT unnest(generate_series(0, 14)) AS x),
        |ys AS (SELECT unnest(generate_series(0, 6)) AS y),
        |g AS (
        |  SELECT d.doc_id, xs.x, ys.y,
        |         8 + d.doc_id % 8 AS w, 4 + d.doc_id % 4 AS h
        |  FROM documents d CROSS JOIN xs CROSS JOIN ys
        |  WHERE xs.x < 8 + d.doc_id % 8 AND ys.y < 4 + d.doc_id % 4)
        |SELECT doc_id, cast(max(w) AS BIGINT) AS width, cast(max(h) AS BIGINT) AS height,
        |       cast(sum((x*7 + y*13 + doc_id) % 256) AS BIGINT) AS sum_r,
        |       cast(sum((x*3 + y*5 + doc_id) % 256) AS BIGINT) AS sum_g,
        |       cast(sum((x + y + doc_id) % 256) AS BIGINT) AS sum_b
        |FROM g GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_multimodal_video" ->
      """WITH xs AS (SELECT unnest(generate_series(0, 14)) AS x),
        |ys AS (SELECT unnest(generate_series(0, 6)) AS y),
        |fs AS (SELECT unnest(generate_series(0, 10)) AS f),
        |g AS (
        |  SELECT d.doc_id, fs.f, xs.x, ys.y,
        |         8 + d.doc_id % 8 AS w, 4 + d.doc_id % 4 AS h
        |  FROM documents d CROSS JOIN xs CROSS JOIN ys CROSS JOIN fs
        |  WHERE xs.x < 8 + d.doc_id % 8 AND ys.y < 4 + d.doc_id % 4
        |    AND fs.f < 6 + d.doc_id % 5 AND fs.f % 2 = 0)
        |SELECT doc_id, cast(f AS BIGINT) AS frame_idx,
        |       cast(max(w) AS BIGINT) AS width, cast(max(h) AS BIGINT) AS height,
        |       cast(sum((x*7 + y*13 + f*17 + doc_id) % 256) AS BIGINT) AS sum_r,
        |       cast(sum((x*3 + y*5 + f*11 + doc_id) % 256) AS BIGINT) AS sum_g,
        |       cast(sum((x + y + f*7 + doc_id) % 256) AS BIGINT) AS sum_b
        |FROM g GROUP BY doc_id, f ORDER BY doc_id, f""".stripMargin,

    "q_multimodal_audio" ->
      """WITH is_ AS (SELECT unnest(generate_series(0, 298)) AS i),
        |s AS (
        |  SELECT d.doc_id, is_.i, (is_.i*31 + d.doc_id*7) % 2003 - 1001 AS smp
        |  FROM documents d CROSS JOIN is_
        |  WHERE is_.i < 200 + d.doc_id % 100),
        |w AS (SELECT *, lag(smp) OVER (PARTITION BY doc_id ORDER BY i) AS prev FROM s)
        |SELECT doc_id, cast(count(*) AS BIGINT) AS n_samples,
        |       cast(sum(abs(smp)) AS BIGINT) AS sum_abs,
        |       cast(max(abs(smp)) AS BIGINT) AS peak,
        |       cast(sum(CASE WHEN prev IS NOT NULL AND ((smp >= 0) != (prev >= 0))
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS crossings
        |FROM w GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_template_chrome" ->
      """WITH u AS (
        |  SELECT source, doc_id, unnest(string_split(text, ' ')) AS unit FROM documents),
        |du AS (SELECT DISTINCT source, doc_id, unit FROM u),
        |tot AS (SELECT source, count(DISTINCT doc_id) AS n_total FROM documents GROUP BY source)
        |SELECT du.source, du.unit, count(*) AS n_docs
        |FROM du JOIN tot ON du.source = tot.source
        |GROUP BY du.source, du.unit, tot.n_total
        |HAVING count(*) >= 2 AND count(*) >= 0.8 * tot.n_total
        |ORDER BY du.source, du.unit""".stripMargin,

    "q_template_strip" ->
      """WITH u AS (
        |  SELECT source, doc_id, unnest(string_split(text, ' ')) AS unit FROM documents),
        |du AS (SELECT DISTINCT source, doc_id, unit FROM u),
        |tot AS (SELECT source, count(DISTINCT doc_id) AS n_total FROM documents GROUP BY source),
        |chrome AS (
        |  SELECT du.source, du.unit FROM du JOIN tot ON du.source = tot.source
        |  GROUP BY du.source, du.unit, tot.n_total
        |  HAVING count(*) >= 2 AND count(*) >= 0.8 * tot.n_total),
        |strip AS (
        |  SELECT u.doc_id, count(*) AS n_after
        |  FROM u LEFT JOIN chrome c ON u.source = c.source AND u.unit = c.unit
        |  WHERE c.unit IS NULL GROUP BY u.doc_id)
        |SELECT d.doc_id, len(string_split(d.text, ' ')) AS n_before,
        |       coalesce(s.n_after, 0) AS n_after
        |FROM documents d LEFT JOIN strip s ON d.doc_id = s.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "q_event_windows" ->
      """SELECT event_type, cast(floor(epoch(ts) / 3600) AS BIGINT) AS hour_bucket,
        |       count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY event_type, hour_bucket""".stripMargin,

    "q_kuwahara_aniso" -> kuwaharaAnisoSql
  )

  /** FULL 1-D anisotropic Kuwahara at half=4 (mirrors
    * RelationalQueries.qKuwaharaAniso term-for-term; generated so the
    * integer Epanechnikov weights w(len,d) = len²+1−d² and the sector scan
    * order cannot drift between the two sides).
    */
  private def kuwaharaAnisoSql: String = {
    def wgt(len: Int, d: Int): Int = len * len + 1 - d * d
    // per-side per-length integer sums over existing neighbors
    val sums = (for (side <- Seq("l", "r"); len <- 1 to 4) yield {
      def t(expr: Int => String) = (1 to len)
        .map(k => s"CASE WHEN $side$k IS NULL THEN 0 ELSE ${expr(k)} END")
        .mkString(" + ")
      val ws = s"${wgt(len, 0)} + ${t(k => s"${wgt(len, k)}")} AS ws_$side$len"
      val wx = s"CAST(n_chars AS BIGINT) * ${wgt(len, 0)} + ${t(k => s"CAST($side$k AS BIGINT) * ${wgt(len, k)}")} AS wx_$side$len"
      val wq = s"CAST(n_chars AS BIGINT) * n_chars * ${wgt(len, 0)} + ${t(k => s"CAST($side$k AS BIGINT) * $side$k * ${wgt(len, k)}")} AS wq_$side$len"
      Seq(ws, wx, wq)
    }).flatten.mkString(",\n    ")
    def pick(pre: String, side: String, lenCol: String) =
      s"CASE $lenCol WHEN 4 THEN ${pre}_${side}4 WHEN 3 THEN ${pre}_${side}3 " +
        s"WHEN 2 THEN ${pre}_${side}2 ELSE ${pre}_${side}1 END"
    val sectors = Seq(("fl", "l", "heff"), ("nl", "l", "hnear"),
      ("nr", "r", "hnear"), ("fr", "r", "heff"))
    val means = sectors.map { case (tag, side, lc) =>
      s"CAST(${pick("wx", side, lc)} AS DOUBLE) / ${pick("ws", side, lc)} AS m_$tag"
    }.mkString(",\n    ")
    val vars = sectors.map { case (tag, side, lc) =>
      s"CAST(${pick("wq", side, lc)} AS DOUBLE) / ${pick("ws", side, lc)} - m_$tag * m_$tag AS v_$tag"
    }.mkString(",\n    ")
    s"""WITH base AS (
       |  SELECT doc_id, source, n_chars,
       |    lag(n_chars, 1) OVER w AS l1, lag(n_chars, 2) OVER w AS l2,
       |    lag(n_chars, 3) OVER w AS l3, lag(n_chars, 4) OVER w AS l4,
       |    lead(n_chars, 1) OVER w AS r1, lead(n_chars, 2) OVER w AS r2,
       |    lead(n_chars, 3) OVER w AS r3, lead(n_chars, 4) OVER w AS r4,
       |    coalesce(lag(n_chars, 1) OVER w, n_chars) + n_chars
       |      + coalesce(lead(n_chars, 1) OVER w, n_chars) AS s3
       |  FROM documents WINDOW w AS (PARTITION BY source ORDER BY doc_id)),
       |grad AS (
       |  SELECT *, coalesce(lead(s3, 1) OVER w, s3) - coalesce(lag(s3, 1) OVER w, s3) AS g
       |  FROM base WINDOW w AS (PARTITION BY source ORDER BY doc_id)),
       |coh AS (
       |  SELECT *, sum(g) OVER w4 AS gs, sum(abs(g)) OVER w4 AS ga
       |  FROM grad WINDOW w4 AS (PARTITION BY source ORDER BY doc_id
       |                          ROWS BETWEEN 4 PRECEDING AND 4 FOLLOWING)),
       |aniso AS (
       |  SELECT *,
       |    greatest(2, CAST(floor(4.0 / (1.0 + CASE WHEN ga > 0
       |      THEN CAST(abs(gs) AS DOUBLE) / ga ELSE 0.0 END)) AS INTEGER)) AS heff
       |  FROM coh),
       |hn AS (SELECT *, CASE WHEN heff >= 4 THEN 2 ELSE 1 END AS hnear FROM aniso),
       |sums AS (
       |  SELECT *,
       |    $sums
       |  FROM hn),
       |means AS (
       |  SELECT *,
       |    $means
       |  FROM sums),
       |vs AS (
       |  SELECT *,
       |    $vars
       |  FROM means)
       |SELECT doc_id, heff,
       |  round(CASE
       |    WHEN v_fl <= v_nl AND v_fl <= v_nr AND v_fl <= v_fr THEN m_fl
       |    WHEN v_nl <= v_nr AND v_nl <= v_fr THEN m_nl
       |    WHEN v_nr <= v_fr THEN m_nr
       |    ELSE m_fr END, 4) AS kwa
       |FROM vs ORDER BY doc_id""".stripMargin
  }
}
