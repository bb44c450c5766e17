package graft

/** The generated DuckDB oracle SQL for every [[SparkEntry.queries]]
  * key — split from [[SparkEntry]] in round 14 (the builders are
  * ~2.8k lines, roughly half of the old file) so the driver contract
  * stays reviewable. Content is IDENTICAL to the pre-split map: the
  * iterative trainers (k-means / PQ / BPE / PCA / Markov / MMR) are
  * unrolled MATERIALIZED CTE chains by necessity — DuckDB inlines CTE
  * references, so un-materialized training rounds re-expand
  * exponentially (see annMaterialized).
  *
  * Shared snapshot-window constants and the Markov state vocabulary
  * live on [[SparkEntry]] (the Spark side reads them too).
  */
private[graft] object SparkEntryOracles {

  import SparkEntry.{prevLo, prevHi, newLo, newHi, markovStates}

  /** Generated oracle for q129: quantize → exact Gram/sums → centered
    * covariance n·G − s_i·s_j → max-normalize → `iters` quantized power
    * steps → quantized projection, mirroring Pca.fitTopComponent op for
    * op (see its scaladoc for the bound analysis).
    */
  private def pcaPrelude(d: Int): String =
    s"""q AS MATERIALIZED (SELECT vec_id, ii.i,
       |    CAST(floor(CAST(embedding[CAST(ii.i AS INTEGER)] AS DOUBLE) * 16384.0) AS BIGINT) AS qv
       |  FROM embeddings, (SELECT unnest(range(1, ${d + 1})) AS i) ii),
       |g AS (SELECT a.i AS i, b.i AS j, CAST(sum(a.qv * b.qv) AS BIGINT) AS gg
       |  FROM q a JOIN q b ON a.vec_id = b.vec_id GROUP BY 1, 2),
       |sm AS (SELECT i, CAST(sum(qv) AS BIGINT) AS s FROM q GROUP BY 1),
       |nn AS (SELECT count(*) AS n FROM embeddings),
       |cov AS (SELECT g.i, g.j, CAST(nn.n * g.gg - si.s * sj.s AS BIGINT) AS c
       |  FROM g JOIN sm si ON si.i = g.i JOIN sm sj ON sj.i = g.j CROSS JOIN nn),
       |cm AS (SELECT max(abs(c)) AS m FROM cov),
       |cn AS MATERIALIZED (SELECT i, j, CAST(c AS DOUBLE) / CAST(m AS DOUBLE) AS c
       |  FROM cov CROSS JOIN cm)""".stripMargin

  /** One power-method loop as a CTE chain: `matrix` rows dotted against
    * the previous iterate, per-term floor-quantized, max-normalized.
    * Every y/x step is MATERIALIZED — each is referenced twice, and
    * without the hint DuckDB re-inlines the whole upstream chain per
    * reference (exponential re-evaluation).
    */
  private def pcaLoopSql(matrix: String, pfx: String, d: Int, iters: Int): String = {
    def step(prev: String, k: Int): String =
      s"""${pfx}t$k AS (SELECT $matrix.i AS i,
         |    CAST(floor($matrix.c * x.v * 1099511627776.0) AS BIGINT) AS tt
         |  FROM $matrix JOIN $prev x ON x.i = $matrix.j),
         |${pfx}y$k AS MATERIALIZED (SELECT i, CAST(sum(tt) AS BIGINT) AS y FROM ${pfx}t$k GROUP BY 1),
         |${pfx}m$k AS (SELECT max(abs(y)) AS m FROM ${pfx}y$k),
         |${pfx}x$k AS MATERIALIZED (SELECT i, CAST(y AS DOUBLE) / CAST(m AS DOUBLE) AS v
         |  FROM ${pfx}y$k CROSS JOIN ${pfx}m$k)""".stripMargin
    val x0 = s"${pfx}x0 AS (SELECT unnest(range(1, ${d + 1})) AS i, CAST(1.0 AS DOUBLE) AS v)"
    val steps = (1 to iters).map(k => step(s"${pfx}x${k - 1}", k))
    (x0 +: steps).mkString(",\n")
  }

  private def pcaSql(d: Int, iters: Int): String =
    s"""WITH ${pcaPrelude(d)},
       |${pcaLoopSql("cn", "", d, iters)},
       |pv AS (SELECT i, CAST(floor(v * 1048576.0) AS BIGINT) AS p FROM x$iters),
       |sc AS (SELECT q.vec_id, CAST(sum(q.qv * pv.p) AS BIGINT) AS score_q
       |  FROM q JOIN pv ON q.i = pv.i GROUP BY 1)
       |SELECT sc.vec_id, CAST(label AS BIGINT) AS label, score_q
       |FROM sc JOIN embeddings ON sc.vec_id = embeddings.vec_id
       |ORDER BY score_q DESC, sc.vec_id LIMIT 50""".stripMargin

  /** q133: deflate by the quantized first component (λ̂ and the
    * vvᵀ/vᵀv correction from exact p₁ products — see
    * Pca.fitTopTwoComponents), run the same loop on cn2, then a
    * label × sign-quadrant rollup of both projections.
    */
  private def pca2Sql(d: Int, iters: Int): String =
    s"""WITH ${pcaPrelude(d)},
       |${pcaLoopSql("cn", "", d, iters)},
       |pv1 AS MATERIALIZED (SELECT i, CAST(floor(v * 1048576.0) AS BIGINT) AS p FROM x$iters),
       |vtv AS (SELECT CAST(sum(p * p) AS BIGINT) AS s FROM pv1),
       |lt AS (SELECT CAST(sum(CAST(floor(cn.c * CAST(a.p * b.p AS DOUBLE)) AS BIGINT)) AS BIGINT) AS t
       |  FROM cn JOIN pv1 a ON a.i = cn.i JOIN pv1 b ON b.i = cn.j),
       |lam AS (SELECT CAST(t AS DOUBLE) / CAST(s AS DOUBLE) AS l FROM lt CROSS JOIN vtv),
       |cn2 AS MATERIALIZED (SELECT cn.i, cn.j,
       |    cn.c - lam.l * (CAST(a.p * b.p AS DOUBLE) / CAST(vtv.s AS DOUBLE)) AS c
       |  FROM cn JOIN pv1 a ON a.i = cn.i JOIN pv1 b ON b.i = cn.j
       |  CROSS JOIN lam CROSS JOIN vtv),
       |${pcaLoopSql("cn2", "z", d, iters)},
       |pv2 AS (SELECT i, CAST(floor(v * 1048576.0) AS BIGINT) AS p FROM zx$iters),
       |s1 AS (SELECT q.vec_id, CAST(sum(q.qv * pv1.p) AS BIGINT) AS s1q
       |  FROM q JOIN pv1 ON q.i = pv1.i GROUP BY 1),
       |s2 AS (SELECT q.vec_id, CAST(sum(q.qv * pv2.p) AS BIGINT) AS s2q
       |  FROM q JOIN pv2 ON q.i = pv2.i GROUP BY 1)
       |SELECT CAST(label AS BIGINT) AS label, s1q >= 0 AS pos1, s2q >= 0 AS pos2,
       |  count(*) AS n, CAST(sum(s1q) AS BIGINT) AS sum1_q, CAST(sum(s2q) AS BIGINT) AS sum2_q
       |FROM s1 JOIN s2 ON s1.vec_id = s2.vec_id
       |JOIN embeddings ON s1.vec_id = embeddings.vec_id
       |GROUP BY 1, 2, 3""".stripMargin

  /** Generated oracle for q123: pivot the k×k count grid into one row,
    * derive p_ij with the same zero-row self-loop rule, then chain
    * `iters` CTEs each computing x'_j as the SAME left-associated
    * ((x0·p0j) + x1·p1j) + … expression the Scala fold evaluates.
    */
  private def markovSql(states: Seq[String], iters: Int): String = {
    val ids = states.indices
    val k = states.size
    val nCols = ids
      .flatMap(i =>
        ids.map(j =>
          s"CAST(coalesce(max(CASE WHEN cur = '${states(i)}' AND nxt = '${states(j)}' " +
            s"THEN n END), 0) AS BIGINT) AS n_${i}_$j"
        )
      )
      .mkString(",\n    ")
    val rCols = ids
      .map(i => ids.map(j => s"n_${i}_$j").mkString(" + ") + s" AS r_$i")
      .mkString(",\n    ")
    val pCols = ids
      .flatMap(i =>
        ids.map(j =>
          s"CASE WHEN r_$i = 0 THEN ${if (i == j) "1.0" else "0.0"} " +
            s"ELSE CAST(n_${i}_$j AS DOUBLE) / CAST(r_$i AS DOUBLE) END AS p_${i}_$j"
        )
      )
      .mkString(",\n    ")
    val it0 = ids.map(j => s"CAST(1.0 AS DOUBLE) / $k AS x_$j").mkString(", ")
    def step(prev: String, cur: String): String = {
      val xs = ids
        .map(j => ids.map(i => s"x_$i * p_${i}_$j").reduce((a, b) => s"($a) + $b") + s" AS x_$j")
        .mkString(",\n    ")
      s"$cur AS (SELECT $xs FROM $prev, p)"
    }
    val steps = (1 to iters).map(n => step(if (n == 1) "it0" else s"it${n - 1}", s"it$n"))
    val finalRows = ids
      .map(i =>
        s"SELECT '${states(i)}' AS state, x_$i AS prob, r_$i AS out_transitions FROM it$iters, r"
      )
      .mkString("\nUNION ALL\n")
    s"""WITH pairs AS (SELECT event_type AS cur,
       |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
       |  FROM events),
       |tc AS (SELECT cur, nxt, count(*) AS n FROM pairs WHERE nxt IS NOT NULL GROUP BY 1, 2),
       |m AS (SELECT
       |    $nCols
       |  FROM tc),
       |r AS (SELECT *,
       |    $rCols
       |  FROM m),
       |p AS (SELECT *,
       |    $pCols
       |  FROM r),
       |it0 AS (SELECT $it0),
       |${steps.mkString(",\n")}
       |$finalRows""".stripMargin
  }

  def oracleSql: Map[String, String] = {
    val snapNew = snapSql(newLo, newHi)
    val snapPrev = snapSql(prevLo, prevHi)
    Map(
      "q01_pricing_summary" ->
        """SELECT l_returnflag, l_linestatus,
          |  CAST(round(sum(l_quantity),0) AS BIGINT) AS sum_qty,
          |  CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT) AS sum_price_cents,
          |  CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT) * (100 - CAST(round(l_discount*100,0) AS BIGINT))) AS BIGINT) AS revenue_e4,
          |  round(avg(l_quantity),4) AS avg_qty,
          |  count(*) AS n
          |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
          |GROUP BY l_returnflag, l_linestatus""".stripMargin,
      "q02_snapshot_diff" ->
        s"""WITH sn AS ($snapNew), so AS ($snapPrev)
           |SELECT
           |  CASE WHEN so.user_id IS NULL THEN 'insert'
           |       WHEN sn.user_id IS NULL THEN 'delete'
           |       ELSE 'update' END AS event_type,
           |  CAST(coalesce(sn.user_id, so.user_id) AS VARCHAR) AS key_value,
           |  CASE WHEN so.user_id IS NULL THEN 3
           |       WHEN sn.user_id IS NULL THEN 0
           |       ELSE CAST(so.value IS DISTINCT FROM sn.value AS INT)
           |          + CAST(so.etype IS DISTINCT FROM sn.etype AS INT)
           |          + CAST(so.props IS DISTINCT FROM sn.props AS INT) END AS n_changed,
           |  so.value AS old_value, sn.value AS new_value
           |FROM sn FULL OUTER JOIN so ON sn.user_id = so.user_id
           |WHERE NOT (sn.user_id IS NOT NULL AND so.user_id IS NOT NULL
           |  AND so.value IS NOT DISTINCT FROM sn.value
           |  AND so.etype IS NOT DISTINCT FROM sn.etype
           |  AND so.props IS NOT DISTINCT FROM sn.props)""".stripMargin,
      "q03_scd2_versions" ->
        """SELECT user_id, event_id, props AS data,
          |  epoch_us(ts) AS vf_us,
          |  epoch_us(lead(ts) OVER w) AS vt_us,
          |  (lead(ts) OVER w IS NULL) AS is_current
          |FROM events WHERE user_id < 30
          |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,
      "q04_current_state" ->
        """SELECT user_id, event_id, value FROM (
          |  SELECT user_id, event_id, value,
          |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          |  FROM events) WHERE rn = 1""".stripMargin,
      "q05_event_histogram" ->
        """SELECT coalesce(event_type, 'TOTAL') AS event_type, count(*) AS n
          |FROM events GROUP BY ROLLUP(event_type)""".stripMargin,
      "q06_daily_gapfill" -> gapfillSql,
      "q07_top_orders" ->
        """SELECT o_orderkey, CAST(round(o_totalprice*100,0) AS BIGINT) AS price_cents
          |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
      "q08_anomaly_scores" ->
        s"""WITH series AS ($gapfillSql),
           |s AS (SELECT date, value,
           |   avg(value) OVER w AS exp_raw,
           |   stddev_samp(value) OVER w AS std,
           |   count(*) OVER () AS n
           | FROM series
           | WINDOW w AS (ORDER BY date ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
           |sc AS (SELECT *, CASE WHEN exp_raw IS NULL OR std IS NULL
           |   THEN 0.0 ELSE abs(value - exp_raw)/greatest(std, 0.001) END AS score FROM s),
           |r AS (SELECT *, row_number() OVER (ORDER BY score DESC, date) AS rnk FROM sc)
           |SELECT date, value, round(coalesce(exp_raw, value),4) AS expected_value,
           |  round(score,4) AS score,
           |  (n >= 12 AND score > 2.0 AND rnk <= CAST(floor(n*0.25) AS BIGINT)) AS is_anomaly
           |FROM r""".stripMargin,
      "q09_unpivot_lineitem" ->
        """SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM lineitem
          |UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
          |UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
          |UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem""".stripMargin,
      "q10_pivot_events" ->
        """SELECT user_id,
          |  count(*) FILTER (WHERE event_type = 'click') AS n_click,
          |  count(*) FILTER (WHERE event_type = 'error') AS n_error,
          |  count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
          |  count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
          |  count(*) FILTER (WHERE event_type = 'view') AS n_view
          |FROM events GROUP BY user_id""".stripMargin,
      "q11_union_by_nation" ->
        """SELECT n_name, count(*) AS n FROM (
          |  SELECT c_nationkey AS nationkey FROM customer
          |  UNION ALL SELECT s_nationkey FROM supplier) u
          |JOIN nation ON n_nationkey = nationkey GROUP BY n_name""".stripMargin,
      "q12_customers_no_orders" ->
        """SELECT c_custkey FROM customer
          |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
          |  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          |  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00')""".stripMargin,
      "q13_scalar_functions" ->
        """SELECT p_partkey,
          |  regexp_replace(regexp_replace(regexp_replace(trim(p_type), '[^A-Za-z0-9]+', '_', 'g'), '^_+', ''), '_+$', '') AS type_sanitized,
          |  substr(md5(p_name), 1, 8) AS name_md5_8,
          |  split_part(p_brand, '#', 2) AS brand_id,
          |  upper(split_part(p_type, ' ', 1)) AS type_head,
          |  CAST(p_size AS DOUBLE) AS size_num
          |FROM part""".stripMargin,
      "q14_changed_columns" ->
        s"""WITH sn AS ($snapNew), so AS ($snapPrev),
           |j AS (SELECT sn.user_id,
           |   CAST(so.value AS VARCHAR) AS o_value, CAST(sn.value AS VARCHAR) AS n_value,
           |   so.etype AS o_etype, sn.etype AS n_etype,
           |   so.props AS o_props, sn.props AS n_props
           | FROM sn JOIN so ON sn.user_id = so.user_id)
           |SELECT CAST(user_id AS VARCHAR) AS key_value, 'value' AS col_name, o_value AS old_val, n_value AS new_val
           |  FROM j WHERE o_value IS DISTINCT FROM n_value
           |UNION ALL
           |SELECT CAST(user_id AS VARCHAR), 'etype', o_etype, n_etype
           |  FROM j WHERE o_etype IS DISTINCT FROM n_etype
           |UNION ALL
           |SELECT CAST(user_id AS VARCHAR), 'props', o_props, n_props
           |  FROM j WHERE o_props IS DISTINCT FROM n_props""".stripMargin,
      "q45_multikey_diff" -> {
        def msnap(lo: String, hi: String) =
          s"""SELECT user_id, event_type, value FROM (
             |  SELECT user_id, event_type, value,
             |    row_number() OVER (PARTITION BY user_id, event_type
             |                       ORDER BY ts DESC, event_id DESC) AS rn
             |  FROM events
             |  WHERE ts > TIMESTAMP '$lo' AND ts <= TIMESTAMP '$hi') WHERE rn = 1""".stripMargin
        s"""WITH sn AS (${msnap(newLo, newHi)}), so AS (${msnap(prevLo, prevHi)})
           |SELECT coalesce(sn.user_id, so.user_id) AS user_id,
           |  coalesce(sn.event_type, so.event_type) AS event_type,
           |  CASE WHEN so.user_id IS NULL THEN 'insert'
           |       WHEN sn.user_id IS NULL THEN 'delete'
           |       ELSE 'update' END AS change_type,
           |  so.value AS old_value, sn.value AS new_value
           |FROM sn FULL OUTER JOIN so
           |  ON sn.user_id = so.user_id AND sn.event_type = so.event_type
           |WHERE NOT (sn.user_id IS NOT NULL AND so.user_id IS NOT NULL
           |  AND so.value IS NOT DISTINCT FROM sn.value)""".stripMargin
      },
      "q15_prev_value_lookup" ->
        """SELECT event_id, user_id, value,
          |  lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
          |FROM events WHERE user_id < 10""".stripMargin,
      "q16_dedup_exact" ->
        """SELECT md5(text) AS fingerprint, min(doc_id) AS keeper, count(*) AS n_dups
          |FROM documents GROUP BY md5(text)""".stripMargin,
      "q17_ngram_jaccard" -> exactJaccardPairsSql,
      // valid for the LSH path because DedupSimilaritySpec pins
      // LSH pair set == exact pair set at threshold 0.5 on this corpus
      "q18_minhash_lsh" -> exactJaccardPairsSql,
      "q34_dedup_corpus" ->
        s"""WITH RECURSIVE $jaccardCtes,
           |pr AS (SELECT i, j
           |  FROM p JOIN c ca ON ca.doc_id = p.i JOIN c cb ON cb.doc_id = p.j
           |  WHERE CAST(inter AS DOUBLE)/(ca.n + cb.n - inter) >= 0.5),
           |edges AS (SELECT i AS id, j AS nb FROM pr UNION SELECT j AS id, i AS nb FROM pr),
           |walk(id, lbl) AS (
           |  SELECT DISTINCT id, id AS lbl FROM edges
           |  UNION
           |  SELECT e.id, w.lbl FROM edges e JOIN walk w ON w.id = e.nb),
           |comp AS (SELECT id, min(lbl) AS cluster FROM walk GROUP BY id)
           |SELECT d.doc_id FROM documents d LEFT JOIN comp ON comp.id = d.doc_id
           |WHERE comp.cluster IS NULL OR comp.cluster = d.doc_id""".stripMargin,
      "q19_simhash_pairs" -> simHashPairsSql,
      "q21_embedding_lsh" -> embeddingLshSql,
      "q20_embedding_topk" -> {
        def dot(x: String, y: String) =
          s"list_reduce(list_transform(range(1, 65), i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)), (a, b) -> a + b)"
        s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 20),
           |c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings),
           |p AS (SELECT qid, cid,
           |   ${dot("qv", "cv")} / (sqrt(${dot("qv", "qv")}) * sqrt(${dot("cv", "cv")})) AS cosine
           | FROM q, c WHERE qid <> cid),
           |r AS (SELECT qid, cid, cosine,
           |   row_number() OVER (PARTITION BY qid ORDER BY round(cosine, 6) DESC, cid) AS rn FROM p)
           |SELECT qid, cid, round(cosine, 4) AS cs4, rn AS rnk FROM r WHERE rn <= 5""".stripMargin
      },
      // Replays knnClassify: q20's exact top-5 CTE joined to the label
      // column, majority vote with the (votes desc, best_rank, label)
      // tiebreak. count(*) is BIGINT; the window sum is HUGEINT so it
      // is cast back; votes/k_used is DuckDB float division = Spark's
      // long/long division, IEEE-exact, rounded to 4dp.
      "q76_knn_classify" -> {
        def dot(x: String, y: String) =
          s"list_reduce(list_transform(range(1, 65), i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)), (a, b) -> a + b)"
        s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 20),
           |c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings),
           |p AS (SELECT qid, cid,
           |   ${dot("qv", "cv")} / (sqrt(${dot("qv", "qv")}) * sqrt(${dot("cv", "cv")})) AS cosine
           | FROM q, c WHERE qid <> cid),
           |r AS (SELECT qid, cid,
           |   row_number() OVER (PARTITION BY qid ORDER BY round(cosine, 6) DESC, cid) AS rn FROM p),
           |nn AS (SELECT qid, cid, rn FROM r WHERE rn <= 5),
           |v AS (SELECT nn.qid, e.label AS knn_label, CAST(count(*) AS BIGINT) AS votes,
           |   min(nn.rn) AS best_rank
           | FROM nn JOIN embeddings e ON e.vec_id = nn.cid
           | WHERE e.label IS NOT NULL GROUP BY 1, 2),
           |w AS (SELECT qid, knn_label, votes, best_rank,
           |   CAST(sum(votes) OVER (PARTITION BY qid) AS BIGINT) AS k_used,
           |   row_number() OVER (PARTITION BY qid
           |     ORDER BY votes DESC, best_rank, knn_label) AS pick FROM v)
           |SELECT qid, knn_label, votes, round(votes / k_used, 4) AS confidence
           |FROM w WHERE pick = 1""".stripMargin
      },
      "q22_langid" ->
        s"""WITH t AS ($wordsSql),
           |s AS (SELECT t.doc_id, d.text,
           |   len(list_filter(words, w -> w IN ('the','a','of','and','is'))) AS s_en,
           |   len(list_filter(words, w -> w IN ('der','die','und','das','ist'))) AS s_de,
           |   len(list_filter(words, w -> w IN ('le','la','les','et','est'))) AS s_fr,
           |   len(list_filter(words, w -> w IN ('el','los','las','es','y'))) AS s_es
           | FROM t JOIN documents d ON d.doc_id = t.doc_id)
           |SELECT doc_id,
           | CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
           |      WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
           |      WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
           |      WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
           |      WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
           |      ELSE 'es' END AS pred_lang
           |FROM s""".stripMargin,
      "q23_text_quality" ->
        s"""WITH t AS ($wordsSql),
           |s AS (SELECT t.doc_id, length(d.text) AS n_chars, len(words) AS n_words,
           |   len(list_distinct(words)) AS n_distinct,
           |   list_reduce(list_transform(words, w -> strlen(w)), (a, b) -> a + b) AS char_sum,
           |   len(list_filter(words, w -> w IN ('the','a','of','and','is'))) AS stop_hits
           | FROM t JOIN documents d ON d.doc_id = t.doc_id)
           |SELECT doc_id, n_chars, n_words, n_distinct,
           | floor(CAST(char_sum AS DOUBLE)/n_words * 10000)/10000 AS avg_word_len,
           | floor(CAST(n_distinct AS DOUBLE)/n_words * 10000)/10000 AS ttr,
           | floor(CAST(stop_hits AS DOUBLE)/n_words * 10000)/10000 AS stopword_ratio,
           | floor((0.4*least(CAST(n_words AS DOUBLE)/100.0, 1.0)
           |     + 0.3*(CAST(n_distinct AS DOUBLE)/n_words)
           |     + 0.3*(1.0 - CAST(stop_hits AS DOUBLE)/n_words)) * 10000)/10000 AS quality
           |FROM s""".stripMargin,
      "q24_token_count" ->
        s"""WITH t AS ($wordsSql)
           |SELECT t.doc_id, len(words) AS ws_tokens, (length(d.text) + 3) // 4 AS bpe_est
           |FROM t JOIN documents d ON d.doc_id = t.doc_id""".stripMargin,
      "q25_fingerprints" ->
        s"""WITH t AS ($wordsSql),
           |f AS (SELECT doc_id, md5(array_to_string(words, ' ')) AS fingerprint FROM t)
           |SELECT doc_id, fingerprint, count(*) OVER (PARTITION BY fingerprint) AS n_same FROM f""".stripMargin,
      "q43_gopher_quality" ->
        """WITH lined AS (
          |  SELECT doc_id,
          |    concat_ws(chr(10), text, substr(text, 1, 40), substr(text, 1, 40), 'unique tail') AS t
          |  FROM documents),
          |l AS (SELECT doc_id,
          |   list_filter(string_split(t, chr(10)), x -> trim(x) <> '') AS lines,
          |   list_filter(string_split(regexp_replace(lower(t), '[^a-z0-9]+', ' ', 'g'), ' '),
          |               w -> w <> '') AS words
          | FROM lined),
          |m AS (SELECT doc_id,
          |   len(lines) AS n_lines,
          |   len(lines) - len(list_distinct(lines)) AS n_dup_lines,
          |   coalesce(list_sum(list_transform(
          |     list_filter(lines, x -> len(list_filter(lines, y -> y = x)) > 1),
          |     x -> length(x))), 0) AS dup_chars,
          |   coalesce(list_sum(list_transform(lines, x -> length(x))), 0) AS total_chars,
          |   len(words) AS n_words,
          |   coalesce(list_sum(list_transform(words, w -> length(w))), 0) AS char_sum,
          |   len(list_filter(words, w -> regexp_matches(w, '[a-z]'))) AS alpha_words
          | FROM l)
          |SELECT doc_id, n_lines, n_dup_lines,
          |  floor(CAST(n_dup_lines AS DOUBLE)/n_lines*10000)/10000 AS frac_dup_lines,
          |  floor(CAST(dup_chars AS DOUBLE)/total_chars*10000)/10000 AS frac_chars_dup_lines,
          |  floor(CAST(char_sum AS DOUBLE)/n_words*10000)/10000 AS mean_word_len,
          |  floor(CAST(alpha_words AS DOUBLE)/n_words*10000)/10000 AS frac_alpha_words
          |FROM m""".stripMargin,
      "q44_pii_redaction" ->
        """WITH p AS (
          |  SELECT doc_id,
          |    text || ' contact user' || doc_id || '@example.com or https://ex.org/p/' || doc_id AS t
          |  FROM documents)
          |SELECT doc_id,
          |  regexp_replace(regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          |                 'https?://[^\s]+', '<URL>', 'g') AS redacted,
          |  len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
          |  len(regexp_extract_all(t, 'https?://[^\s]+')) AS n_urls
          |FROM p""".stripMargin,
      "q47_stratified_sample" ->
        """SELECT doc_id, lang FROM (
          |  SELECT doc_id, lang,
          |    row_number() OVER (PARTITION BY lang
          |                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
          |  FROM documents)
          |WHERE rn <= 20""".stripMargin,
      "q48_token_budget_mix" ->
        s"""WITH t AS ($wordsSql),
           |d AS (SELECT t.doc_id, doc.lang, CAST(len(words) AS BIGINT) AS n_tokens
           |      FROM t JOIN documents doc ON doc.doc_id = t.doc_id),
           |c AS (SELECT doc_id, lang, n_tokens,
           |   sum(n_tokens) OVER (PARTITION BY lang
           |                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           |                       ROWS UNBOUNDED PRECEDING) AS cum
           | FROM d)
           |SELECT doc_id, lang, n_tokens FROM c WHERE cum - n_tokens < 2000""".stripMargin,
      "q54_sequence_packing" ->
        s"""WITH t AS ($wordsSql),
           |d AS (SELECT t.doc_id, doc.lang, CAST(len(words) AS BIGINT) AS n_tokens
           |      FROM t JOIN documents doc ON doc.doc_id = t.doc_id)
           |SELECT doc_id, lang,
           |  CAST(floor((sum(n_tokens) OVER (PARTITION BY lang
           |     ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           |     ROWS UNBOUNDED PRECEDING) - n_tokens) / 4000.0) AS BIGINT) AS seq_id
           |FROM d""".stripMargin,
      "q57_source_mix" ->
        s"""WITH t AS ($wordsSql),
           |d AS (SELECT t.doc_id, doc.source, CAST(len(words) AS BIGINT) AS n
           |      FROM t JOIN documents doc ON doc.doc_id = t.doc_id),
           |s AS (SELECT source, count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS n_tokens
           |      FROM d GROUP BY source)
           |SELECT source, n_docs, n_tokens,
           |       floor(n_tokens * 10000.0 / (SELECT CAST(sum(n_tokens) AS BIGINT) FROM s)) / 10000.0 AS token_share
           |FROM s""".stripMargin,

      "q59_containment_dedup" ->
        s"""WITH t AS ($wordsSql),
           |sl AS (SELECT doc_id + 600000 AS doc_id, words[3:14] AS words
           |       FROM t WHERE doc_id % 31 = 0),
           |ad AS (SELECT doc_id, words FROM t UNION ALL SELECT doc_id, words FROM sl),
           |d AS (SELECT doc_id, array_to_string(words, ' ') AS s
           |      FROM ad WHERE len(words) >= 8)
           |SELECT a.doc_id AS inner_id, b.doc_id AS outer_id
           |FROM d a JOIN d b ON a.doc_id <> b.doc_id
           |WHERE position(' ' || a.s || ' ' IN ' ' || b.s || ' ') > 0""".stripMargin,

      // Replays duplicateSpans: stride-1 8-token grams (0-based
      // positions), corpus-wide count >= 2, gaps-and-islands run merge
      // (a position within 8 of its predecessor extends the span; the
      // NULL lag falls to the ELSE branch in both engines). Both sides
      // integer-only end to end — hash-exact by construction.
      "q65_duplicate_spans" -> {
        val k = 8
        s"""WITH w AS ($wordsSql),
           |g AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
           |             array_to_string(words[i + 1 : i + $k], ' ') AS gram
           |      FROM w, unnest(range(len(words) - ${k - 1})) AS u(i)
           |      WHERE len(words) >= $k),
           |dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
           |p AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (gram)),
           |m AS (SELECT doc_id, pos,
           |        CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= $k
           |             THEN 0 ELSE 1 END AS brk
           |      FROM p),
           |isl AS (SELECT doc_id, pos,
           |          sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
           |                         ROWS UNBOUNDED PRECEDING) AS island
           |        FROM m)
           |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
           |       CAST(max(pos) + $k AS BIGINT) AS span_end,
           |       CAST(max(pos) + $k - min(pos) AS BIGINT) AS span_tokens
           |FROM isl GROUP BY doc_id, island""".stripMargin
      },

      // Replays duplicateSpanFraction: q65's span CTE aggregated to
      // per-doc covered-token counts, LEFT-joined back to every doc
      // (unspanned docs 0), fraction = floor-trunc4 from integer counts
      // with the same left-associated double math as the operator.
      "q66_dup_span_fraction" -> {
        val k = 8
        s"""WITH w AS ($wordsSql),
           |g AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
           |             array_to_string(words[i + 1 : i + $k], ' ') AS gram
           |      FROM w, unnest(range(len(words) - ${k - 1})) AS u(i)
           |      WHERE len(words) >= $k),
           |dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
           |p AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (gram)),
           |m AS (SELECT doc_id, pos,
           |        CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= $k
           |             THEN 0 ELSE 1 END AS brk
           |      FROM p),
           |isl AS (SELECT doc_id, pos,
           |          sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
           |                         ROWS UNBOUNDED PRECEDING) AS island
           |        FROM m),
           |sp AS (SELECT doc_id, max(pos) + $k - min(pos) AS span_tokens
           |       FROM isl GROUP BY doc_id, island),
           |dt AS (SELECT doc_id, sum(span_tokens) AS dup_tokens FROM sp GROUP BY doc_id)
           |SELECT w.doc_id, CAST(len(w.words) AS BIGINT) AS n_tokens,
           |       CAST(coalesce(dt.dup_tokens, 0) AS BIGINT) AS dup_tokens,
           |       CASE WHEN len(w.words) > 0
           |            THEN floor(coalesce(dt.dup_tokens, 0) * 10000.0 / len(w.words)) / 10000.0
           |            ELSE 0.0 END AS dup_frac
           |FROM w LEFT JOIN dt USING (doc_id)""".stripMargin
      },

      // Replays semanticDedup: q21's pair CTEs (same planes, same
      // left-associated cosine) at threshold 0.3, then q34's
      // recursive-CTE component walk over the pair graph, survivors =
      // min-id per component plus every unpaired embedding, each with
      // its component size (1 when unpaired). Integer ids/counts and
      // the already-pinned cosine comparison — hash-exact.
      "q67_semantic_dedup" ->
        s"""WITH RECURSIVE $embeddingPairCtes,
           |pr AS (SELECT i, j FROM v WHERE cosine >= 0.3),
           |edges AS (SELECT i AS id, j AS nb FROM pr UNION SELECT j AS id, i AS nb FROM pr),
           |walk(id, lbl) AS (
           |  SELECT DISTINCT id, id AS lbl FROM edges
           |  UNION
           |  SELECT e.id, w.lbl FROM edges e JOIN walk w ON w.id = e.nb),
           |comp AS (SELECT id, min(lbl) AS cluster FROM walk GROUP BY id),
           |sizes AS (SELECT cluster, count(*) AS group_size FROM comp GROUP BY cluster)
           |SELECT e.vec_id, CAST(coalesce(s.group_size, 1) AS BIGINT) AS group_size
           |FROM embeddings e
           |LEFT JOIN comp ON comp.id = e.vec_id
           |LEFT JOIN sizes s ON s.cluster = comp.cluster
           |WHERE comp.cluster IS NULL OR comp.cluster = e.vec_id""".stripMargin,

      // Replays sourceSimilarityMatrix: same md5 60-bit shingle hash as
      // q19, same seeded slot-XOR literals (Dedup.sourceSimilaritySeeds),
      // min/xor/count are pure integer ops and 128 = 2^7 makes the
      // estimate division IEEE-exact — hash-exact end to end.
      "q68_source_similarity" -> sourceSimilaritySql,
      // q74: the q68 matrix wrapped with the recon ranking (est_jaccard
      // desc, ties by pair name) — row_number is deterministic here
      // because the ORDER BY is total over the pair grid
      "q74_corpus_recon" ->
        s"""SELECT CAST(row_number() OVER (
           |    ORDER BY est_jaccard DESC, source_a, source_b) AS BIGINT) AS rnk,
           |  source_a, source_b, matching_slots, est_jaccard
           |FROM ($sourceSimilaritySql)""".stripMargin,

      // Replays corpusFrequencyScore: BIGINT-exact df sums (DuckDB's
      // HUGEINT sum cast back), integer rare rule, one IEEE division
      // per output double — no libm anywhere.
      "q69_corpus_freq_quality" ->
        s"""WITH t AS ($wordsSql),
           |tok AS (SELECT doc_id, unnest(words) AS token FROM t),
           |dfreq AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY token),
           |n AS (SELECT count(*) AS n_docs FROM documents)
           |SELECT tok.doc_id,
           |  CAST(count(*) AS BIGINT) AS n_tokens,
           |  CAST(CAST(sum(df) AS BIGINT) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_df,
           |  CAST(sum(CASE WHEN df * 1000 <= n_docs * 100 THEN 1 ELSE 0 END) AS DOUBLE)
           |    / CAST(count(*) AS DOUBLE) AS rare_frac
           |FROM tok JOIN dfreq USING (token) CROSS JOIN n
           |GROUP BY tok.doc_id""".stripMargin,

      // Replays robustScore: quantile_cont is the same interpolated
      // order statistic as Spark's percentile (parity pinned by q51),
      // the consistency constant and threshold are e0 double literals,
      // and the score is one IEEE division — hash-exact, nulls agree
      // on MAD=0 groups.
      "q72_robust_anomaly" ->
        s"""WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
           |  FROM events GROUP BY event_type),
           |dev AS (SELECT e.event_id, e.event_type, e.value, abs(e.value - m.med) AS dev
           |  FROM events e JOIN med m USING (event_type)),
           |mad AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad FROM dev GROUP BY event_type)
           |SELECT d.event_id, d.event_type, d.value,
           |  CASE WHEN m.mad > 0 THEN d.dev / (1.4826e0 * m.mad) ELSE NULL END AS robust_z,
           |  CASE WHEN m.mad > 0 THEN d.dev / (1.4826e0 * m.mad) > 3.5e0 ELSE NULL END AS is_anomaly
           |FROM dev d JOIN mad m USING (event_type)""".stripMargin,

      // Replays randomProject: same seeded planes as literals, same
      // left-associated list_reduce dot fold (the q21-proven pattern),
      // same precomputed 1/sqrt(outDim) scale literal — bit-exact.
      "q70_random_projection" -> randomProjectionSql,

      // Replays sourceDivergence's determinism contract: IEEE-only
      // per-cell terms, DECIMAL(30,12) sums (order-independent), top-K
      // ties broken on (count desc, token asc) in both engines.
      "q60_source_divergence" ->
        s"""WITH w AS ($wordsSql),
           |tok AS (SELECT d.source, t.w
           |  FROM (SELECT doc_id, unnest(words) AS w FROM w) t
           |  JOIN documents d USING (doc_id)),
           |cq AS (SELECT w, count(*) AS cq FROM tok GROUP BY w),
           |top AS (SELECT w, cq FROM cq ORDER BY cq DESC, w LIMIT 200),
           |tq AS (SELECT sum(cq) AS tq FROM top),
           |sc AS (SELECT source, tok.w, count(*) AS cs
           |  FROM tok JOIN top USING (w) GROUP BY source, tok.w),
           |grid AS (SELECT s.source, t.w, t.cq, coalesce(sc.cs, 0) AS cs
           |  FROM (SELECT DISTINCT source FROM documents) s
           |  CROSS JOIN top t
           |  LEFT JOIN sc ON sc.source = s.source AND sc.w = t.w),
           |ts AS (SELECT source, sum(cs) AS ts FROM grid GROUP BY source),
           |terms AS (SELECT g.source, g.cs,
           |    CAST(abs(CAST(g.cs AS DOUBLE) / CAST(ts.ts AS DOUBLE)
           |             - CAST(g.cq AS DOUBLE) / CAST(tq.tq AS DOUBLE)) / 2.0
           |         AS DECIMAL(30,12)) AS tv_term,
           |    CAST((CAST(g.cs AS DOUBLE) / CAST(ts.ts AS DOUBLE)
           |          - CAST(g.cq AS DOUBLE) / CAST(tq.tq AS DOUBLE))
           |         * (CAST(g.cs AS DOUBLE) / CAST(ts.ts AS DOUBLE)
           |            - CAST(g.cq AS DOUBLE) / CAST(tq.tq AS DOUBLE))
           |         / (CAST(g.cq AS DOUBLE) / CAST(tq.tq AS DOUBLE))
           |         AS DECIMAL(30,12)) AS chi2_term
           |  FROM grid g JOIN ts USING (source) CROSS JOIN tq
           |  WHERE ts.ts > 0)
           |SELECT source, CAST(sum(tv_term) AS DOUBLE) AS tv_div,
           |  CAST(sum(chi2_term) AS DOUBLE) AS chi2_div,
           |  CAST(sum(cs) AS BIGINT) AS top_tokens
           |FROM terms GROUP BY source""".stripMargin,

      // Replays temperatureSample: sqrt is IEEE-correctly-rounded in
      // both engines, the normalizer sum is DECIMAL-exact, quotas fill
      // in md5(id) order — the draw is bit-identical.
      "q61_temperature_mix" ->
        """WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
          |z AS (SELECT CAST(sum(CAST(sqrt(CAST(n AS DOUBLE)) AS DECIMAL(30,12))) AS DOUBLE) AS z
          |      FROM c),
          |q AS (SELECT source,
          |        least(n, CAST(floor(2000.0 * sqrt(CAST(n AS DOUBLE)) / z) AS BIGINT)) AS k
          |      FROM c CROSS JOIN z),
          |r AS (SELECT doc_id, source,
          |        row_number() OVER (PARTITION BY source
          |                           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
          |      FROM documents)
          |SELECT r.doc_id, r.source FROM r JOIN q USING (source) WHERE rn <= q.k""".stripMargin,

      // Replays ngramRepetition relationally: per (doc, gram) counts,
      // best = max(count x gram chars), dup = mass of count>1 grams;
      // integer masses, IEEE division, least(1.0,.), floor-trunc4 —
      // deterministic in both engines.
      "q62_ngram_repetition" -> {
        def gram(n: Int) = (0 until n).map(k => s"words[i+$k]").mkString(" || ' ' || ")
        def stats(n: Int, name: String, mass: String) =
          s"""$name AS (SELECT doc_id, $mass AS m FROM (
             |  SELECT doc_id, g, count(*) AS c, length(g) - ${n - 1} AS l FROM (
             |    SELECT doc_id, unnest(list_transform(range(1, len(words) - ${n - 1} + 1),
             |                          i -> ${gram(n)})) AS g
             |    FROM w WHERE len(words) >= $n) GROUP BY doc_id, g)
             |  GROUP BY doc_id)""".stripMargin
        s"""WITH w AS ($wordsSql),
           |base AS (SELECT doc_id,
           |  list_reduce(list_prepend(CAST(0 AS BIGINT),
           |    list_transform(words, x -> CAST(length(x) AS BIGINT))), (a, b) -> a + b) AS tc
           |  FROM w),
           |${stats(2, "s2", "max(c * l)")},
           |${stats(3, "s3", "max(c * l)")},
           |${stats(5, "s5", "sum(CASE WHEN c > 1 THEN c * l ELSE 0 END)")}
           |SELECT b.doc_id,
           |  CASE WHEN tc > 0 THEN floor(least(1.0,
           |    CAST(coalesce(s2.m, 0) AS DOUBLE) / CAST(tc AS DOUBLE)) * 10000) / 10000
           |    ELSE 0.0 END AS top2_frac,
           |  CASE WHEN tc > 0 THEN floor(least(1.0,
           |    CAST(coalesce(s3.m, 0) AS DOUBLE) / CAST(tc AS DOUBLE)) * 10000) / 10000
           |    ELSE 0.0 END AS top3_frac,
           |  CASE WHEN tc > 0 THEN floor(least(1.0,
           |    CAST(coalesce(s5.m, 0) AS DOUBLE) / CAST(tc AS DOUBLE)) * 10000) / 10000
           |    ELSE 0.0 END AS dup5_frac
           |FROM base b LEFT JOIN s2 USING (doc_id) LEFT JOIN s3 USING (doc_id)
           |LEFT JOIN s5 USING (doc_id)""".stripMargin
      },

      // Replays skewProfile: integer counts, left-associated double
      // math, floor-trunc4, ties on the key's string form; NULL keys
      // fold into the '<null>' sentinel exactly like the operator (the
      // sentinel also sidesteps Spark-vs-DuckDB NULL-ordering skew on
      // a tied top-K boundary).
      "q64_skew_profile" ->
        """WITH c AS (SELECT coalesce(CAST(user_id AS VARCHAR), '<null>') AS key_value,
          |                  count(*) AS n
          |           FROM events GROUP BY 1),
          |t AS (SELECT CAST(sum(n) AS BIGINT) AS total_rows,
          |             CAST(count(*) AS BIGINT) AS n_keys FROM c)
          |SELECT key_value, n,
          |  floor(n * 10000.0 / total_rows) / 10000.0 AS share,
          |  floor(n * n_keys * 10000.0 / total_rows) / 10000.0 AS x_mean
          |FROM c CROSS JOIN t ORDER BY n DESC, key_value LIMIT 20""".stripMargin,

      // Replays chunkDocuments: inclusive 1-based list slices, floor
      // division + greatest(0,.) for the chunk count (identical to the
      // Spark formulation; see the operator's scaladoc on div vs //).
      "q63_chunk_documents" -> {
        val (chunk, overlap) = (64, 8)
        val stride = chunk - overlap
        s"""WITH w AS ($wordsSql)
           |SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
           |  array_to_string(words[i * $stride + 1 : i * $stride + $chunk], ' ') AS chunk_text,
           |  CAST(len(words[i * $stride + 1 : i * $stride + $chunk]) AS BIGINT) AS n_tokens
           |FROM w, unnest(range(0, greatest(0,
           |  CAST(floor(CAST(len(words) - ${overlap + 1} AS DOUBLE) / $stride) AS BIGINT)) + 1)) AS u(i)
           |WHERE len(words) > 0""".stripMargin
      },

      "q58_chatbot_rollup" ->
        """SELECT coalesce(event_type, 'TOTAL') AS event_type, count(*) AS n
          |FROM events
          |WHERE CAST(ts AS DATE) >=
          |  (SELECT max(CAST(ts AS DATE)) - INTERVAL 7 DAY FROM events)
          |GROUP BY ROLLUP(event_type)""".stripMargin,

      "q55_decontaminate" ->
        s"""WITH t AS ($wordsSql),
           |s AS (SELECT DISTINCT doc_id,
           |   unnest(list_transform(range(1, len(words)-1),
           |     i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS sh
           | FROM t WHERE len(words) >= 3),
           |ev AS (SELECT DISTINCT sh FROM s WHERE doc_id % 97 = 0),
           |m AS (SELECT s.doc_id, count(*) AS n_shared FROM s JOIN ev USING (sh)
           |      WHERE s.doc_id % 97 <> 0 GROUP BY s.doc_id)
           |SELECT d.doc_id, CAST(coalesce(m.n_shared, 0) AS BIGINT) AS n_shared,
           |       coalesce(m.n_shared, 0) > 0 AS contaminated
           |FROM documents d LEFT JOIN m ON m.doc_id = d.doc_id
           |WHERE d.doc_id % 97 <> 0""".stripMargin,

      "q56_incremental_dedup" ->
        """WITH n AS (
          |  SELECT doc_id, text FROM documents WHERE doc_id % 7 = 0
          |  UNION ALL
          |  SELECT doc_id + 1000000, text || ' v2' FROM documents WHERE doc_id % 7 = 1)
          |SELECT doc_id, md5(text) AS fingerprint FROM n
          |WHERE md5(text) NOT IN (SELECT md5(text) FROM documents)""".stripMargin,

      "q53_split_assignment" ->
        """SELECT doc_id,
          |  CASE WHEN b IS NULL THEN NULL
          |       WHEN b < 3277 THEN 'train'
          |       WHEN b < 3686 THEN 'val'
          |       ELSE 'test' END AS split
          |FROM (SELECT doc_id,
          |   (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 256
          | + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 16
          | + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) AS b
          |FROM documents)""".stripMargin,
      "q26_multimodal_meta" ->
        """SELECT doc_id, octet_length(CAST(text AS BLOB)) AS byte_len, md5(text) AS content_md5,
          |  octet_length(CAST(text AS BLOB)) % 640 AS fake_width,
          |  octet_length(CAST(text AS BLOB)) % 480 AS fake_height,
          |  octet_length(CAST(text AS BLOB)) % 16 + 1 AS n_frames
          |FROM documents""".stripMargin,
      "q27_asof_state" ->
        """SELECT user_id, event_id, props AS data FROM (
          |  SELECT user_id, event_id, props, ts AS valid_from,
          |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
          |  FROM events
          |  WHERE ts > TIMESTAMP '2024-01-01 00:00:00' AND ts <= TIMESTAMP '2024-01-20 00:00:00')
          |WHERE valid_from <= TIMESTAMP '2024-01-15 00:00:00'
          |  AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-15 00:00:00')""".stripMargin,
      "q28_every_nth" ->
        """SELECT user_id, event_id, seq FROM (
          |  SELECT user_id, event_id,
          |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
          |  FROM events)
          |WHERE seq % 10 = 0""".stripMargin,
      "q29_drop_allnull_rows" ->
        """SELECT * FROM (
          |  SELECT doc_id,
          |    CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END AS lang,
          |    CASE WHEN doc_id % 3 = 0 THEN NULL ELSE source END AS source
          |  FROM documents)
          |WHERE lang IS NOT NULL OR source IS NOT NULL""".stripMargin,
      "q30_json_roundtrip" ->
        """SELECT event_id, event_type, value FROM events WHERE user_id < 20""".stripMargin,
      "q46_range_join" ->
        """WITH o AS (SELECT o_custkey, o_orderkey, o_orderdate FROM orders WHERE o_custkey < 100),
          |iv AS (SELECT o_custkey, min(o_orderdate) AS lo,
          |         min(o_orderdate) + INTERVAL 90 DAY AS hi
          |       FROM o GROUP BY o_custkey)
          |SELECT o.o_custkey, o.o_orderkey, epoch_us(iv.lo) AS lo_us
          |FROM o JOIN iv ON o.o_custkey = iv.o_custkey
          |WHERE o.o_orderdate >= iv.lo AND o.o_orderdate < iv.hi""".stripMargin,
      "q49_referential_check" ->
        """SELECT o_custkey, count(*) AS n_orphans FROM orders
          |WHERE o_custkey IS NOT NULL
          |  AND NOT EXISTS (SELECT 1 FROM customer
          |    WHERE c_custkey = o_custkey AND c_custkey % 3 <> 0)
          |GROUP BY o_custkey""".stripMargin,
      "q50_interval_overlap" ->
        """WITH a AS (SELECT o_custkey, min(o_orderdate) AS lo,
          |         min(o_orderdate) + INTERVAL 120 DAY AS hi
          |       FROM orders WHERE year(o_orderdate) = 1995 GROUP BY o_custkey),
          |b AS (SELECT o_custkey, min(o_orderdate) AS lo,
          |         min(o_orderdate) + INTERVAL 120 DAY AS hi
          |       FROM orders WHERE year(o_orderdate) = 1996 GROUP BY o_custkey)
          |SELECT a.o_custkey, epoch_us(a.lo) AS lo_us, epoch_us(b.lo) AS r_lo_us
          |FROM a JOIN b ON a.o_custkey = b.o_custkey
          |WHERE a.lo < b.hi AND b.lo < a.hi""".stripMargin,
      "q41_salted_agg" ->
        """SELECT l_returnflag, count(*) AS n,
          |  CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT) AS sum_cents
          |FROM lineitem GROUP BY l_returnflag""".stripMargin,
      "q42_name_functions" ->
        """SELECT p_partkey,
          |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          |    p_name || ' (' || p_type || ') 50% & up',
          |    '[()]', '', 'g'), '&', 'and', 'g'), '%', 'pct', 'g'), '[ /]+', '_', 'g') AS metric_name,
          |  split_part(regexp_replace(p_name, ' ', '-', 'g'), '-', 1) AS stmt,
          |  list_extract(string_split(regexp_replace(p_name, ' ', '-', 'g'), '-'),
          |    len(string_split(regexp_replace(p_name, ' ', '-', 'g'), '-'))) AS freq,
          |  p_brand || '_' || substr(md5(p_name), 1, 8) AS content_id,
          |  upper(split_part(regexp_replace(regexp_replace(p_name, ' ', '-', 'g') || '.xlsx',
          |    '\.[^.]*$', ''), '-', 1)) AS company_id
          |FROM part""".stripMargin,
      "q51_percentiles" ->
        """SELECT lang,
          |  quantile_cont(n_chars, 0.5) AS p50,
          |  quantile_cont(n_chars, 0.9) AS p90,
          |  quantile_cont(n_chars, 0.99) AS p99,
          |  count(*) AS n
          |FROM documents GROUP BY lang""".stripMargin,
      "q52_shipping_priority" ->
        """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority,
          |  CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)
          |         * (100 - CAST(round(l_discount*100,0) AS BIGINT))) AS BIGINT) AS revenue_e4
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |WHERE c_mktsegment = 'BUILDING'
          |  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
          |  AND l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
          |GROUP BY l_orderkey, o_orderdate, o_orderpriority
          |ORDER BY revenue_e4 DESC, l_orderkey LIMIT 10""".stripMargin,
      "q38_distinct_agg" ->
        """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
          |  count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
          |FROM lineitem GROUP BY l_returnflag""".stripMargin,
      "q39_cube" ->
        """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
          |  coalesce(l_linestatus, 'ALL') AS l_linestatus,
          |  count(*) AS n, CAST(round(sum(l_quantity),0) AS BIGINT) AS sum_qty
          |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,
      "q36_topk_per_segment" ->
        """SELECT c_mktsegment, o_orderkey,
          |  CAST(round(o_totalprice*100,0) AS BIGINT) AS price_cents, rnk
          |FROM (
          |  SELECT c_mktsegment, o_orderkey, o_totalprice,
          |    row_number() OVER (PARTITION BY c_mktsegment
          |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
          |  FROM orders JOIN customer ON o_custkey = c_custkey)
          |WHERE rnk <= 3""".stripMargin,
      "q37_sessionize" ->
        """SELECT user_id, event_id,
          |  CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |                         ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
          |FROM (
          |  SELECT user_id, event_id, ts,
          |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
          |           OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
          |         THEN 1 ELSE 0 END AS is_new
          |  FROM events WHERE user_id < 20)""".stripMargin,
      "q35_asof_join" ->
        """SELECT p.user_id, p.event_id, c.click_id, epoch_us(c.click_ts) AS click_ts_us
          |FROM (SELECT user_id, event_id, ts FROM events
          |      WHERE event_type = 'purchase' AND user_id < 50) p
          |ASOF LEFT JOIN (SELECT user_id, event_id AS click_id, ts AS click_ts
          |                FROM events WHERE event_type = 'click') c
          |ON p.user_id = c.user_id AND c.click_ts <= p.ts""".stripMargin,
      "q32_top_tokens" ->
        s"""WITH t AS ($wordsSql), tok AS (SELECT unnest(words) AS token FROM t)
           |SELECT token, count(*) AS n FROM tok GROUP BY token
           |ORDER BY n DESC, token ASC LIMIT 20""".stripMargin,
      "q33_tfidf" ->
        s"""WITH t AS ($wordsSql),
           |tok AS (SELECT doc_id, unnest(words) AS token FROM t),
           |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
           |dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
           |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents)
           |SELECT doc_id, token, tf,
           |  floor(tf * ln((n_docs + 1.0)/(df + 1.0)) * 10000)/10000 AS tfidf
           |FROM tf JOIN dfreq USING (token) CROSS JOIN n WHERE doc_id < 50""".stripMargin,
      // identical model to q08 — the aggregator path must reproduce the
      // window path (also asserted at 1e-9 in ZScoreAggregatorSpec)
      "q31_anomaly_aggregator" -> {
        s"""WITH series AS ($gapfillSql),
           |s AS (SELECT date, value,
           |   avg(value) OVER w AS exp_raw,
           |   stddev_samp(value) OVER w AS std,
           |   count(*) OVER () AS n
           | FROM series
           | WINDOW w AS (ORDER BY date ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
           |sc AS (SELECT *, CASE WHEN exp_raw IS NULL OR std IS NULL
           |   THEN 0.0 ELSE abs(value - exp_raw)/greatest(std, 0.001) END AS score FROM s),
           |r AS (SELECT *, row_number() OVER (ORDER BY score DESC, date) AS rnk FROM sc)
           |SELECT date, value, round(coalesce(exp_raw, value),4) AS expected_value,
           |  round(score,4) AS score,
           |  (n >= 12 AND score > 2.0 AND rnk <= CAST(floor(n*0.25) AS BIGINT)) AS is_anomaly
           |FROM r""".stripMargin
      },
      // Same fixed-grid bin arithmetic and interpolation expression
      // shape as Sketches.binOf/quantilesFromSketch: every term is a
      // long or a literal-double IEEE op, so the estimates hash-match.
      "q77_sketch_quantiles" ->
        """WITH b AS (
          |  SELECT source,
          |    CAST(least(greatest(floor((CAST(n_chars AS DOUBLE) - 0.0) / 16.0), 0.0), 63.0) AS BIGINT) AS bin,
          |    count(*) AS n
          |  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2),
          |m AS (SELECT source, bin, n FROM b
          |      UNION ALL
          |      SELECT 'ALL' AS source, bin, CAST(sum(n) AS BIGINT) AS n FROM b GROUP BY 2),
          |c AS (SELECT source, bin, n,
          |    sum(n) OVER (PARTITION BY source ORDER BY bin) AS cum,
          |    sum(n) OVER (PARTITION BY source) AS total
          |  FROM m),
          |r AS (SELECT source, bin, n, cum, p, greatest(p * total, 1e-12) AS rank
          |  FROM c CROSS JOIN (SELECT unnest([0.5, 0.9, 0.99]) AS p)
          |  WHERE cum >= greatest(p * total, 1e-12)
          |    AND (cum - n) < greatest(p * total, 1e-12))
          |SELECT source, p,
          |  round(0.0 + (bin + (rank - (cum - n)) / n) * 16.0, 4) AS q_est
          |FROM r""".stripMargin,
      // Same segmentation (non-overlapping 8-token windows over the
      // normalized token stream), frequency threshold, and ordered
      // reconstruction as TextAnalysis.stripBoilerplate.
      "q78_boilerplate" ->
        """WITH t AS (
          |  SELECT doc_id,
          |    list_filter(string_split(regexp_replace(lower(
          |      'begin standard license header notice text follows now ' || text ||
          |      ' copyright footer all rights reserved forever here end'),
          |      '[^a-z0-9]+', ' ', 'g'), ' '), w -> w <> '') AS words
          |  FROM documents),
          |s AS (SELECT doc_id, u.pos AS pos, u.seg AS seg FROM (
          |  SELECT doc_id,
          |    unnest([{'pos': CAST(i AS BIGINT),
          |             'seg': array_to_string(words[(i*8+1):(i*8+8)], ' ')}
          |            for i in range(0, CAST(ceil(len(words)/8.0) AS BIGINT))]) AS u
          |  FROM t WHERE len(words) > 0)),
          |b AS (SELECT seg FROM s GROUP BY seg HAVING count(DISTINCT doc_id) >= 50),
          |f AS (SELECT s.doc_id, s.pos, s.seg, (b.seg IS NOT NULL) AS boiler
          |  FROM s LEFT JOIN b ON b.seg = s.seg)
          |SELECT doc_id, count(*) AS n_segs,
          |  CAST(sum(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
          |  floor(CAST(sum(CASE WHEN boiler THEN 1 ELSE 0 END) AS DOUBLE)/count(*)*10000)/10000
          |    AS frac_boiler,
          |  string_agg(seg, ' ' ORDER BY pos) FILTER (WHERE NOT boiler) AS clean_text
          |FROM f GROUP BY doc_id""".stripMargin,
      // Mirrors Dsir.importanceWeights exactly: same md5 bucketing, the
      // same deterministic glog polynomial (only IEEE-exact ops — bin
      // exponent, exact /2^e, two sqrts, fixed Horner), the same
      // ((a-b)-(c-d)) ratio shape, and exact long sums of the quantized
      // per-bucket ratios. glog is evaluated over the deduped value set
      // once and joined back.
      "q79_dsir_weights" ->
        s"""WITH t AS ($wordsSql),
           |g AS (SELECT doc_id,
           |    unnest(words || [words[i] || ' ' || words[i+1] for i in range(1, len(words))]) AS gram
           |  FROM t WHERE len(words) > 0),
           |gb AS (SELECT doc_id, ('0x' || substr(md5(gram), 1, 6))::BIGINT % 4096 AS bucket FROM g),
           |tg AS (SELECT gb.bucket FROM gb JOIN documents d USING (doc_id) WHERE d.lang = 'en'),
           |rc AS (SELECT bucket, count(*) AS r FROM gb GROUP BY 1),
           |tc AS (SELECT bucket, count(*) AS t FROM tg GROUP BY 1),
           |tot AS (SELECT (SELECT coalesce(sum(r), 0) FROM rc) AS bigR,
           |               (SELECT coalesce(sum(t), 0) FROM tc) AS bigT),
           |model AS (SELECT rc.bucket, coalesce(tc.t, 0) AS t, rc.r
           |  FROM rc LEFT JOIN tc USING (bucket)),
           |vals AS (SELECT DISTINCT v FROM (
           |  SELECT t + 1 AS v FROM model UNION ALL SELECT r + 1 FROM model
           |  UNION ALL SELECT bigT + 4096 FROM tot UNION ALL SELECT bigR + 4096 FROM tot)),
           |$glogChainSql,
           |lr AS (SELECT m.bucket,
           |    CAST(round((glt.glog - glr.glog - (glbt.glog - glbr.glog)) * 1000000000.0) AS BIGINT) AS lrq
           |  FROM model m
           |  CROSS JOIN tot
           |  JOIN gl glt ON glt.v = m.t + 1
           |  JOIN gl glr ON glr.v = m.r + 1
           |  JOIN gl glbt ON glbt.v = tot.bigT + 4096
           |  JOIN gl glbr ON glbr.v = tot.bigR + 4096)
           |SELECT gb.doc_id, count(*) AS n_grams,
           |  CAST(sum(lr.lrq) AS BIGINT) AS logw_q,
           |  CAST(sum(lr.lrq) AS DOUBLE) / 1000000000.0 AS logw
           |FROM gb JOIN lr USING (bucket)
           |GROUP BY 1""".stripMargin,
      // Same 16-bit rank scaling (exact integer multiply + floor div)
      // and the same 4-step mask-shift bit spread as ZOrder.spreadBits;
      // every op is integer, so the z-values match bit-for-bit.
      "q80_zorder" ->
        """WITH bnd AS (SELECT CAST(min(l_partkey) AS BIGINT) AS xlo, CAST(max(l_partkey) AS BIGINT) AS xhi,
          |                    CAST(min(l_suppkey) AS BIGINT) AS ylo, CAST(max(l_suppkey) AS BIGINT) AS yhi
          |             FROM lineitem),
          |r AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
          |    ((least(greatest(CAST(l_partkey AS BIGINT), xlo), xhi) - xlo) * 65535) // (xhi - xlo) AS rx,
          |    ((least(greatest(CAST(l_suppkey AS BIGINT), ylo), yhi) - ylo) * 65535) // (yhi - ylo) AS ry
          |  FROM lineitem CROSS JOIN bnd),
          |s1 AS (SELECT *, (rx | (rx << 8)) & 16711935 AS ax, (ry | (ry << 8)) & 16711935 AS ay FROM r),
          |s2 AS (SELECT *, (ax | (ax << 4)) & 252645135 AS bx, (ay | (ay << 4)) & 252645135 AS by FROM s1),
          |s3 AS (SELECT *, (bx | (bx << 2)) & 858993459 AS cx, (by | (by << 2)) & 858993459 AS cy FROM s2),
          |s4 AS (SELECT *, (cx | (cx << 1)) & 1431655765 AS dx, (cy | (cy << 1)) & 1431655765 AS dy FROM s3)
          |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
          |  (dx | (dy << 1)) AS zval,
          |  (dx | (dy << 1)) >> 26 AS zbucket
          |FROM s4""".stripMargin,
      // Same bin grid as q77, cum-below/total as exact integer window
      // sums over the bins, and the same least/greatest-clamped linear
      // interpolation expression shape as Sketches.cdfFromSketch.
      "q81_cdf_normalize" ->
        """WITH b AS (SELECT doc_id, source, n_chars,
          |    CAST(least(greatest(floor((CAST(n_chars AS DOUBLE) - 0.0) / 16.0), 0.0), 63.0) AS BIGINT) AS bin
          |  FROM documents WHERE n_chars IS NOT NULL),
          |h AS (SELECT source, bin, count(*) AS n FROM b GROUP BY 1, 2),
          |c AS (SELECT source, bin, n,
          |    sum(n) OVER (PARTITION BY source ORDER BY bin) - n AS cum_below,
          |    sum(n) OVER (PARTITION BY source) AS total FROM h)
          |SELECT b.doc_id, b.source, b.n_chars,
          |  (cum_below + n * least(greatest((CAST(b.n_chars AS DOUBLE) - (0.0 + bin * 16.0)) / 16.0, 0.0), 1.0)) / total AS cdf
          |FROM b JOIN c USING (source, bin)""".stripMargin,
      // q81's cdf shape with a GLOBAL (partitionless) window, then
      // pid = min(floor(cdf*16), 15) and per-pid aggregation.
      "q82_equidepth" ->
        """WITH b AS (SELECT doc_id, n_chars,
          |    CAST(least(greatest(floor((CAST(n_chars AS DOUBLE) - 0.0) / 16.0), 0.0), 63.0) AS BIGINT) AS bin
          |  FROM documents WHERE n_chars IS NOT NULL),
          |h AS (SELECT bin, count(*) AS n FROM b GROUP BY 1),
          |c AS (SELECT bin, n,
          |    sum(n) OVER (ORDER BY bin) - n AS cum_below,
          |    sum(n) OVER () AS total FROM h),
          |p AS (SELECT b.doc_id, b.n_chars,
          |    least(CAST(floor(((cum_below + n * least(greatest((CAST(b.n_chars AS DOUBLE) - (0.0 + bin * 16.0)) / 16.0, 0.0), 1.0)) / total) * 16) AS BIGINT), 15) AS pid
          |  FROM b JOIN c USING (bin))
          |SELECT pid, count(*) AS n_docs, min(n_chars) AS lo_chars, max(n_chars) AS hi_chars
          |FROM p GROUP BY 1""".stripMargin,
      // Mirrors Dsir.bigramSurprisal: context/bigram hashed counts from
      // one position pass, the shared glog polynomial over the deduped
      // value set, per-bucket quantization, exact long sums per doc.
      "q83_perplexity" ->
        s"""WITH t AS ($wordsSql),
           |p AS (SELECT doc_id,
           |    unnest([{'cb': ('0x' || substr(md5(words[i]), 1, 6))::BIGINT % 4096,
           |             'bb': ('0x' || substr(md5(words[i] || ' ' || words[i+1]), 1, 6))::BIGINT % 4096}
           |            for i in range(1, len(words))]) AS u
           |  FROM t WHERE len(words) >= 2),
           |pb AS (SELECT doc_id, u.cb AS cb, u.bb AS bb FROM p),
           |cu AS (SELECT cb, count(*) AS c FROM pb GROUP BY 1),
           |cbg AS (SELECT bb, count(*) AS c FROM pb GROUP BY 1),
           |vals AS (SELECT DISTINCT v FROM (
           |  SELECT c + 4096 AS v FROM cu UNION ALL SELECT c + 1 FROM cbg)),
           |$glogChainSql,
           |cuq AS (SELECT cb, CAST(round(gl.glog * 1000000000.0) AS BIGINT) AS glq_u
           |  FROM cu JOIN gl ON gl.v = cu.c + 4096),
           |bgq AS (SELECT bb, CAST(round(gl.glog * 1000000000.0) AS BIGINT) AS glq_b
           |  FROM cbg JOIN gl ON gl.v = cbg.c + 1)
           |SELECT pb.doc_id, count(*) AS n_bigrams,
           |  CAST(sum(glq_u - glq_b) AS BIGINT) AS nll_q,
           |  (CAST(sum(glq_u - glq_b) AS DOUBLE) / 1000000000.0) / count(*) AS avg_nll
           |FROM pb JOIN cuq USING (cb) JOIN bgq USING (bb)
           |GROUP BY 1""".stripMargin,
      // q53's md5-bucket split carve + q55's shingle shape (3-grams),
      // train grams distinct, semi-join per held-out split.
      "q84_split_leakage" ->
        s"""WITH t AS ($wordsSql),
           |sp AS (SELECT doc_id,
           |  CASE WHEN b IS NULL THEN NULL
           |       WHEN b < 3277 THEN 'train'
           |       WHEN b < 3686 THEN 'val'
           |       ELSE 'test' END AS split
           |FROM (SELECT doc_id,
           |   (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 256
           | + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 16
           | + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) AS b
           |FROM documents)),
           |s AS (SELECT DISTINCT doc_id,
           |   unnest(list_transform(range(1, len(words)-1),
           |     i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS sh
           | FROM t WHERE len(words) >= 3),
           |g AS (SELECT s.doc_id, s.sh, sp.split FROM s JOIN sp USING (doc_id)),
           |tr AS (SELECT DISTINCT sh FROM g WHERE split = 'train'),
           |cont AS (SELECT DISTINCT g.split, g.doc_id FROM g JOIN tr USING (sh)
           |         WHERE g.split <> 'train'),
           |tot AS (SELECT split, count(*) AS n_docs FROM sp WHERE split <> 'train' GROUP BY 1),
           |c AS (SELECT split, count(*) AS n_contaminated FROM cont GROUP BY 1)
           |SELECT tot.split, tot.n_docs,
           |  CAST(coalesce(c.n_contaminated, 0) AS BIGINT) AS n_contaminated,
           |  floor(CAST(coalesce(c.n_contaminated, 0) AS DOUBLE) / tot.n_docs * 10000) / 10000
           |    AS frac_contaminated
           |FROM tot LEFT JOIN c USING (split)""".stripMargin,
      // Same segmentation/reconstruction as q78, but the frequent set
      // comes from per-half distinct-doc counts SUMMED across the two
      // halves — the oracle mirrors the fold-and-merge model build, so
      // a hash match pins merged-fold == one-pass counts cross-engine.
      "q85_boiler_from_model" ->
        """WITH t AS (
          |  SELECT doc_id,
          |    list_filter(string_split(regexp_replace(lower(
          |      'begin standard license header notice text follows now ' || text ||
          |      ' copyright footer all rights reserved forever here end'),
          |      '[^a-z0-9]+', ' ', 'g'), ' '), w -> w <> '') AS words
          |  FROM documents),
          |s AS (SELECT doc_id, u.pos AS pos, u.seg AS seg FROM (
          |  SELECT doc_id,
          |    unnest([{'pos': CAST(i AS BIGINT),
          |             'seg': array_to_string(words[(i*8+1):(i*8+8)], ' ')}
          |            for i in range(0, CAST(ceil(len(words)/8.0) AS BIGINT))]) AS u
          |  FROM t WHERE len(words) > 0)),
          |b AS (SELECT seg FROM (
          |    SELECT seg, count(DISTINCT doc_id) AS n FROM s WHERE doc_id % 2 = 0 GROUP BY seg
          |    UNION ALL
          |    SELECT seg, count(DISTINCT doc_id) AS n FROM s WHERE doc_id % 2 <> 0 GROUP BY seg
          |  ) GROUP BY seg HAVING sum(n) >= 50),
          |f AS (SELECT s.doc_id, s.pos, s.seg, (b.seg IS NOT NULL) AS boiler
          |  FROM s LEFT JOIN b ON b.seg = s.seg)
          |SELECT doc_id, count(*) AS n_segs,
          |  CAST(sum(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
          |  floor(CAST(sum(CASE WHEN boiler THEN 1 ELSE 0 END) AS DOUBLE)/count(*)*10000)/10000
          |    AS frac_boiler,
          |  string_agg(seg, ' ' ORDER BY pos) FILTER (WHERE NOT boiler) AS clean_text
          |FROM f GROUP BY doc_id""".stripMargin,
      // The five-stage composition: q78's strip → q23's quality formula
      // on the REBUILT text → q83's surprisal fitted on the post-quality
      // survivors → min-id dedup on md5(clean text) → q79's DSIR ratio
      // chain with raw = the deduped survivors and target = lang='en',
      // cut at the exact (logw_q DESC, doc_id) rank. Two glog chains
      // (gla for the surprisal fit, glb for the DSIR ratios) because
      // their value sets derive from different stage outputs.
      "q86_curation_pipeline" ->
        """WITH rawd AS (
          |  SELECT doc_id, lang,
          |    'begin standard license header notice text follows now ' || text ||
          |    ' copyright footer all rights reserved forever here end' AS text
          |  FROM documents),
          |tok AS (SELECT doc_id,
          |    list_filter(string_split(regexp_replace(lower(text),
          |      '[^a-z0-9]+', ' ', 'g'), ' '), w -> w <> '') AS words
          |  FROM rawd),
          |sg AS (SELECT doc_id, u.pos AS pos, u.seg AS seg FROM (
          |  SELECT doc_id,
          |    unnest([{'pos': CAST(i AS BIGINT),
          |             'seg': array_to_string(words[(i*8+1):(i*8+8)], ' ')}
          |            for i in range(0, CAST(ceil(len(words)/8.0) AS BIGINT))]) AS u
          |  FROM tok WHERE len(words) > 0)),
          |boil AS (SELECT s.seg FROM sg s GROUP BY s.seg HAVING count(DISTINCT s.doc_id) >= 50),
          |clean AS (SELECT s.doc_id,
          |    string_agg(s.seg, ' ' ORDER BY s.pos) FILTER (WHERE b.seg IS NULL) AS text
          |  FROM sg s LEFT JOIN boil b ON b.seg = s.seg
          |  GROUP BY s.doc_id
          |  HAVING count(*) FILTER (WHERE b.seg IS NULL) > 0),
          |cw AS (SELECT doc_id, text,
          |    list_filter(string_split(text, ' '), w -> w <> '') AS words
          |  FROM clean),
          |qual AS (SELECT doc_id FROM (
          |  SELECT doc_id,
          |    floor((0.4*least(CAST(len(words) AS DOUBLE)/100.0, 1.0)
          |      + 0.3*(CAST(len(list_distinct(words)) AS DOUBLE)/len(words))
          |      + 0.3*(1.0 - CAST(len(list_filter(words,
          |          w -> w IN ('the','a','of','and','is'))) AS DOUBLE)/len(words)))
          |      * 10000)/10000 AS quality
          |  FROM cw WHERE len(words) > 0)
          |  WHERE quality >= 0.3),
          |sv AS (SELECT cw.doc_id, cw.text, cw.words FROM cw JOIN qual USING (doc_id)),
          |pp AS (SELECT doc_id,
          |    unnest([{'cb': ('0x' || substr(md5(words[i]), 1, 6))::BIGINT % 4096,
          |             'bb': ('0x' || substr(md5(words[i] || ' ' || words[i+1]), 1, 6))::BIGINT % 4096}
          |            for i in range(1, len(words))]) AS u
          |  FROM sv WHERE len(words) >= 2),
          |pb AS (SELECT doc_id, u.cb AS cb, u.bb AS bb FROM pp),
          |cu AS (SELECT cb, count(*) AS c FROM pb GROUP BY 1),
          |cbg AS (SELECT bb, count(*) AS c FROM pb GROUP BY 1),
          |valsa AS (SELECT DISTINCT v FROM (
          |  SELECT c + 4096 AS v FROM cu UNION ALL SELECT c + 1 FROM cbg)),
          |gla0 AS (SELECT v, CAST(length(bin(CAST(v AS BIGINT))) - 1 AS DOUBLE) AS e FROM valsa),
          |gla1 AS (SELECT v, e, sqrt(sqrt(CAST(v AS DOUBLE) / (2.0 ** e))) AS r FROM gla0),
          |gla2 AS (SELECT v, e, (r - 1.0) / (r + 1.0) AS z,
          |               ((r - 1.0) / (r + 1.0)) * ((r - 1.0) / (r + 1.0)) AS w FROM gla1),
          |gla AS (SELECT v, e * 0.6931471805599453 + 8.0 * (z * (1.0 + w * (1.0/3.0 +
          |    w * (1.0/5.0 + w * (1.0/7.0 + w * (1.0/9.0 + w * (1.0/11.0 +
          |    w * (1.0/13.0 + w * (1.0/15.0))))))))) AS glog FROM gla2),
          |cuq AS (SELECT cb, CAST(round(gla.glog * 1000000000.0) AS BIGINT) AS glq_u
          |  FROM cu JOIN gla ON gla.v = cu.c + 4096),
          |bgq AS (SELECT bb, CAST(round(gla.glog * 1000000000.0) AS BIGINT) AS glq_b
          |  FROM cbg JOIN gla ON gla.v = cbg.c + 1),
          |nll AS (SELECT pb.doc_id, count(*) AS n, CAST(sum(glq_u - glq_b) AS BIGINT) AS nllq
          |  FROM pb JOIN cuq USING (cb) JOIN bgq USING (bb) GROUP BY 1),
          |pplok AS (SELECT doc_id FROM nll
          |  WHERE (CAST(nllq AS DOUBLE) / 1000000000.0) / n <= 9.0),
          |sv2 AS (SELECT sv.doc_id, sv.text, sv.words FROM sv JOIN pplok USING (doc_id)),
          |keepid AS (SELECT min(doc_id) AS doc_id FROM sv2 GROUP BY md5(text)),
          |dd AS (SELECT sv2.doc_id, sv2.text, sv2.words FROM sv2 JOIN keepid USING (doc_id)),
          |g AS (SELECT doc_id,
          |    unnest(words || [words[i] || ' ' || words[i+1] for i in range(1, len(words))]) AS gram
          |  FROM dd WHERE len(words) > 0),
          |gb2 AS (SELECT doc_id, ('0x' || substr(md5(gram), 1, 6))::BIGINT % 4096 AS bucket FROM g),
          |tg2 AS (SELECT gb2.bucket FROM gb2 JOIN rawd USING (doc_id) WHERE rawd.lang = 'en'),
          |rc AS (SELECT bucket, count(*) AS r FROM gb2 GROUP BY 1),
          |tc AS (SELECT bucket, count(*) AS t FROM tg2 GROUP BY 1),
          |tot AS (SELECT (SELECT coalesce(sum(r), 0) FROM rc) AS bigR,
          |               (SELECT coalesce(sum(t), 0) FROM tc) AS bigT),
          |model AS (SELECT rc.bucket, coalesce(tc.t, 0) AS t, rc.r
          |  FROM rc LEFT JOIN tc USING (bucket)),
          |valsb AS (SELECT DISTINCT v FROM (
          |  SELECT t + 1 AS v FROM model UNION ALL SELECT r + 1 FROM model
          |  UNION ALL SELECT bigT + 4096 FROM tot UNION ALL SELECT bigR + 4096 FROM tot)),
          |glb0 AS (SELECT v, CAST(length(bin(CAST(v AS BIGINT))) - 1 AS DOUBLE) AS e FROM valsb),
          |glb1 AS (SELECT v, e, sqrt(sqrt(CAST(v AS DOUBLE) / (2.0 ** e))) AS r FROM glb0),
          |glb2 AS (SELECT v, e, (r - 1.0) / (r + 1.0) AS z,
          |               ((r - 1.0) / (r + 1.0)) * ((r - 1.0) / (r + 1.0)) AS w FROM glb1),
          |glb AS (SELECT v, e * 0.6931471805599453 + 8.0 * (z * (1.0 + w * (1.0/3.0 +
          |    w * (1.0/5.0 + w * (1.0/7.0 + w * (1.0/9.0 + w * (1.0/11.0 +
          |    w * (1.0/13.0 + w * (1.0/15.0))))))))) AS glog FROM glb2),
          |lr AS (SELECT m.bucket,
          |    CAST(round((glt.glog - glr.glog - (glbt.glog - glbr.glog)) * 1000000000.0) AS BIGINT) AS lrq
          |  FROM model m
          |  CROSS JOIN tot
          |  JOIN glb glt ON glt.v = m.t + 1
          |  JOIN glb glr ON glr.v = m.r + 1
          |  JOIN glb glbt ON glbt.v = tot.bigT + 4096
          |  JOIN glb glbr ON glbr.v = tot.bigR + 4096),
          |wts AS (SELECT gb2.doc_id, CAST(sum(lr.lrq) AS BIGINT) AS logw_q
          |  FROM gb2 JOIN lr USING (bucket) GROUP BY 1),
          |sc AS (SELECT dd.doc_id, dd.text, wts.logw_q FROM dd JOIN wts USING (doc_id)),
          |rk AS (SELECT doc_id, text, logw_q,
          |    row_number() OVER (ORDER BY logw_q DESC, doc_id) AS rn,
          |    count(*) OVER () AS cnt
          |  FROM sc)
          |SELECT doc_id, text, logw_q FROM rk
          |WHERE rn <= greatest(1, CAST(ceil(cnt * 0.5) AS BIGINT))""".stripMargin,
      // BM25: postings = (token, doc, tf, dl); idf = glog(2N+2) −
      // glog(2df+1) (the Lucene ln(1+(N−df+.5)/(df+.5)) rewritten to
      // integer glog arguments); per-term score quantized to a long,
      // per-(query,doc) exact long sums; ranks tie-broken by doc_id.
      // The glog CTE chain is the shared q83 shape over this query's
      // value set {2N+2} ∪ {2df+1}.
      "q87_bm25_topk" ->
        s"""WITH t AS ($wordsSql),
           |post AS (SELECT token, doc_id, dl, count(*) AS tf FROM (
           |    SELECT doc_id, len(words) AS dl, unnest(words) AS token FROM t)
           |  GROUP BY 1, 2, 3),
           |st AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl
           |  FROM (SELECT DISTINCT doc_id, dl FROM post)),
           |q AS (SELECT CAST(query_id AS BIGINT) AS query_id, qtext FROM (VALUES
           |    (1, 'spark join merge'),
           |    (2, 'window filter scan'),
           |    (3, 'customer vector data')) AS v(query_id, qtext)),
           |qt AS (SELECT query_id, unnest(list_distinct(list_filter(
           |    string_split(regexp_replace(lower(qtext), '[^a-z0-9]+', ' ', 'g'), ' '),
           |    w -> w <> ''))) AS token FROM q),
           |qtok AS (SELECT DISTINCT token FROM qt),
           |cand AS (SELECT p.* FROM post p JOIN qtok USING (token)),
           |dft AS (SELECT token, count(*) AS df FROM cand GROUP BY 1),
           |vals AS (SELECT DISTINCT v FROM (
           |  SELECT 2 * n_docs + 2 AS v FROM st UNION ALL SELECT 2 * df + 1 FROM dft)),
           |$glogChainSql,
           |gn AS (SELECT gl.glog AS glog_n FROM st JOIN gl ON gl.v = 2 * st.n_docs + 2),
           |idf AS (SELECT d.token, gn.glog_n - gl.glog AS idf
           |  FROM dft d JOIN gl ON gl.v = 2 * d.df + 1 CROSS JOIN gn),
           |term AS (SELECT c.token, c.doc_id,
           |    CAST(round(i.idf * ((c.tf * 2.2) / (c.tf + 1.2 * (0.25 + 0.75 *
           |      (c.dl / (CAST(st.sum_dl AS DOUBLE) / CAST(st.n_docs AS DOUBLE))))))
           |      * 1000000000.0) AS BIGINT) AS term_q
           |  FROM cand c JOIN idf i USING (token) CROSS JOIN st),
           |sc AS (SELECT qt.query_id, tm.doc_id, CAST(sum(tm.term_q) AS BIGINT) AS score_q
           |  FROM term tm JOIN qt USING (token) GROUP BY 1, 2),
           |rk AS (SELECT query_id, doc_id, score_q,
           |    row_number() OVER (PARTITION BY query_id ORDER BY score_q DESC, doc_id) AS rank
           |  FROM sc)
           |SELECT query_id, doc_id, rank, score_q,
           |  CAST(score_q AS DOUBLE) / 1000000000.0 AS score
           |FROM rk WHERE rank <= 5""".stripMargin,
      // NB: grams = unigrams + bigrams hashed md5→24bit→mod 4096 (the
      // q83 bucket shape); Laplace log-likelihoods and priors
      // quantized per model cell via the shared glog chain; scores are
      // exact integer sums prq + Σ_found llq + (n−n_found)·llq0.
      "q88_nb_classify" ->
        s"""WITH t AS ($wordsSql),
           |g AS (SELECT doc_id, ('0x' || substr(md5(gg), 1, 6))::BIGINT % 4096 AS bucket FROM (
           |    SELECT doc_id,
           |      unnest(words || [words[i] || ' ' || words[i+1] for i in range(1, len(words))]) AS gg
           |    FROM t)),
           |trl AS (SELECT doc_id, lang AS label FROM documents WHERE doc_id % 2 = 0),
           |trg AS (SELECT g.doc_id, g.bucket, trl.label FROM g JOIN trl USING (doc_id)),
           |pc AS (SELECT label, bucket, count(*) AS c FROM trg GROUP BY 1, 2),
           |lt AS (SELECT label, sum(c) AS tot FROM pc GROUP BY 1),
           |ld AS (SELECT label, count(*) AS docs_l FROM trl GROUP BY 1),
           |nn AS (SELECT sum(docs_l) AS n_docs FROM ld),
           |vals AS (SELECT DISTINCT v FROM (
           |  SELECT c + 1 AS v FROM pc UNION ALL SELECT tot + 4096 FROM lt
           |  UNION ALL SELECT docs_l FROM ld UNION ALL SELECT n_docs FROM nn)),
           |$glogChainSql,
           |llq AS (SELECT pc.label, pc.bucket,
           |    CAST(round((glc.glog - glt.glog) * 1000000000.0) AS BIGINT) AS llq
           |  FROM pc JOIN gl glc ON glc.v = pc.c + 1
           |    JOIN lt ON lt.label = pc.label JOIN gl glt ON glt.v = lt.tot + 4096),
           |l0 AS (SELECT lt.label,
           |    CAST(round((0.0 - glt.glog) * 1000000000.0) AS BIGINT) AS llq0,
           |    CAST(round((gld.glog - gln.glog) * 1000000000.0) AS BIGINT) AS prq
           |  FROM lt JOIN gl glt ON glt.v = lt.tot + 4096
           |    JOIN ld ON ld.label = lt.label JOIN gl gld ON gld.v = ld.docs_l
           |    CROSS JOIN nn JOIN gl gln ON gln.v = nn.n_docs),
           |te AS (SELECT doc_id, lang FROM documents WHERE doc_id % 2 <> 0),
           |teg AS (SELECT g.* FROM g JOIN te USING (doc_id)),
           |ng AS (SELECT doc_id, count(*) AS n_grams FROM teg GROUP BY 1),
           |found AS (SELECT teg.doc_id, m.label, sum(m.llq) AS fsum, count(*) AS fn
           |  FROM teg JOIN llq m ON m.bucket = teg.bucket GROUP BY 1, 2),
           |sc AS (SELECT te.doc_id, l.label,
           |    l.prq + coalesce(f.fsum, 0) +
           |      (coalesce(ng.n_grams, 0) - coalesce(f.fn, 0)) * l.llq0 AS score_q,
           |    coalesce(ng.n_grams, 0) AS n_grams
           |  FROM te CROSS JOIN l0 l
           |  LEFT JOIN ng ON ng.doc_id = te.doc_id
           |  LEFT JOIN found f ON f.doc_id = te.doc_id AND f.label = l.label),
           |rk AS (SELECT doc_id, label, score_q, n_grams,
           |    row_number() OVER (PARTITION BY doc_id ORDER BY score_q DESC, label) AS rn
           |  FROM sc)
           |SELECT rk.doc_id, te.lang, rk.label AS pred,
           |  CAST(rk.score_q AS BIGINT) AS score_q, CAST(rk.n_grams AS BIGINT) AS n_grams
           |FROM rk JOIN te ON te.doc_id = rk.doc_id WHERE rn = 1""".stripMargin,
      // Ordered funnel: each step's completion = min ts of that type
      // strictly after the previous step's completion.
      "q89_funnel" ->
        """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
          |  WHERE event_type = 'view' GROUP BY 1),
          |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
          |  JOIN s1 ON s1.user_id = e.user_id
          |  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
          |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
          |  JOIN s2 ON s2.user_id = e.user_id
          |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1)
          |SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name, count(*) AS users FROM s1
          |UNION ALL SELECT 2, 'click', count(*) FROM s2
          |UNION ALL SELECT 3, 'purchase', count(*) FROM s3""".stripMargin,
      // Retention triangle on integer week indices (floor(days/7)).
      "q90_retention" ->
        """WITH d AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
          |c AS (SELECT user_id, min(d) AS c FROM d GROUP BY 1)
          |SELECT CAST(floor((c.c - DATE '2024-01-01') / 7.0) AS BIGINT) AS cohort_week,
          |  CAST(floor((d.d - c.c) / 7.0) AS BIGINT) AS week_offset,
          |  count(DISTINCT d.user_id) AS users
          |FROM d JOIN c ON c.user_id = d.user_id
          |GROUP BY 1, 2""".stripMargin,
      "q91_local_supplier_volume" ->
        """SELECT n_name,
          |  CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)
          |       * (100 - CAST(round(l_discount*100,0) AS BIGINT))) AS BIGINT) AS revenue_e4,
          |  count(*) AS n_items
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |JOIN supplier ON l_suppkey = s_suppkey
          |JOIN nation ON s_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
          |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
          |GROUP BY n_name""".stripMargin,
      // Trailing-window actives: calendar join on the oracle side,
      // explode-into-window-ends on the Spark side — same set of
      // (day, user-in-window) pairs, exact distinct counts.
      "q92_rolling_actives" ->
        """WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
          |b AS (SELECT min(d) AS lo, max(d) AS hi FROM d),
          |cal AS (SELECT unnest(generate_series(b.lo, b.hi, INTERVAL 1 DAY))::DATE AS day FROM b)
          |SELECT strftime(cal.day, '%Y-%m-%d') AS day,
          |  count(DISTINCT d.user_id) AS active_users
          |FROM cal JOIN d ON d.d <= cal.day AND d.d > cal.day - 7
          |GROUP BY 1""".stripMargin,
      // E-S keys: e = (glog(2^24) - glog(h)) / w, h = md5-seeded 24-bit
      // uniform + 1; k smallest, ties by doc_id. Shared glog chain.
      "q93_weighted_sample" ->
        s"""WITH d AS (SELECT doc_id, n_chars,
          |    ('0x' || substr(md5('g93' || CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT + 1 AS h
          |  FROM documents),
          |vals AS (SELECT DISTINCT v FROM (SELECT h AS v FROM d UNION ALL SELECT 16777216)),
          |$glogChainSql,
          |ek AS (SELECT d.doc_id, d.n_chars,
          |    (glm.glog - glh.glog) / CAST(d.n_chars AS DOUBLE) AS es_key
          |  FROM d JOIN gl glh ON glh.v = d.h
          |  CROSS JOIN (SELECT glog FROM gl WHERE v = 16777216) glm(glog))
          |SELECT doc_id, n_chars, es_key FROM ek
          |ORDER BY es_key, doc_id LIMIT 100""".stripMargin,
      // Markov transitions: lead() over (ts, event_id) per user; p
      // from exact-long counts.
      "q94_event_transitions" ->
        """WITH s AS (SELECT event_type, lead(event_type) OVER (
          |    PARTITION BY user_id ORDER BY ts, event_id) AS nt FROM events),
          |c AS (SELECT event_type AS from_type, nt AS to_type, count(*) AS n
          |  FROM s WHERE nt IS NOT NULL GROUP BY 1, 2)
          |SELECT from_type, to_type, n,
          |  CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
          |FROM c""".stripMargin,
      "q95_returned_items" ->
        """WITH rev AS (
          |  SELECT o_custkey, sum(CAST(round(l_extendedprice*100,0) AS BIGINT)
          |       * (100 - CAST(round(l_discount*100,0) AS BIGINT))) AS revenue_e4
          |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |  WHERE l_returnflag = 'R'
          |    AND o_orderdate >= TIMESTAMP '1996-04-01 00:00:00'
          |    AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
          |  GROUP BY 1)
          |SELECT c_custkey, c_name, n_name, CAST(revenue_e4 AS BIGINT) AS revenue_e4,
          |  CAST(round(c_acctbal*100,0) AS BIGINT) AS acctbal_cents
          |FROM rev JOIN customer ON o_custkey = c_custkey
          |JOIN nation ON c_nationkey = n_nationkey
          |ORDER BY revenue_e4 DESC, c_custkey LIMIT 20""".stripMargin,
      // Lloyd's k-means, k=4, 3 centroid updates + final assignment —
      // the iteration unrolled as CTEs (shared with q104). Same init
      // (4 smallest ids), same tie-break (dist, cid), same exact-long
      // centroid sums.
      "q96_kmeans" ->
        s"""WITH $kmeansCtesSql
           |SELECT cid AS cluster, count(*) AS n,
           |  CAST(sum(x) AS BIGINT) AS sum_x, CAST(sum(y) AS BIGINT) AS sum_y
           |FROM a4 GROUP BY 1""".stripMargin,
      // Heavy hitters: exact SQL — the MG pass only prunes candidates,
      // the contract is exact counts of every token at ≥ 2% share.
      "q97_heavy_hitters" ->
        s"""WITH t AS ($wordsSql), tok AS (SELECT unnest(words) AS token FROM t),
           |n AS (SELECT count(*) AS total FROM tok)
           |SELECT token, count(*) AS n FROM tok CROSS JOIN n
           |GROUP BY token, n.total
           |HAVING count(*) >= CAST(ceil(0.02 * total) AS BIGINT)""".stripMargin,
      // Pearson from exact integer moments; the r expression mirrors
      // Stats.pearsonMatrix term for term (IEEE-identical).
      "q98_correlation" -> {
        val cols = Seq("qty", "price_d", "disc_c", "tax_c")
        val pairs = for { i <- cols.indices; j <- (i + 1) until cols.size }
          yield (cols(i), cols(j))
        val moments =
          cols.flatMap(c => Seq(s"sum($c) AS s_$c", s"sum($c*$c) AS ss_$c")) ++
            pairs.map { case (a, b) => s"sum($a*$b) AS sp_${a}_$b" }
        val outs = pairs.map { case (a, b) =>
          val den =
            s"""sqrt(CAST(n AS DOUBLE)*CAST(ss_$a AS DOUBLE)
               |       - CAST(s_$a AS DOUBLE)*CAST(s_$a AS DOUBLE))
               |   * sqrt(CAST(n AS DOUBLE)*CAST(ss_$b AS DOUBLE)
               |       - CAST(s_$b AS DOUBLE)*CAST(s_$b AS DOUBLE))""".stripMargin
          s"""SELECT '$a' AS col_a, '$b' AS col_b, n,
             |  CASE WHEN $den <> 0.0 THEN
             |  (CAST(n AS DOUBLE)*CAST(sp_${a}_$b AS DOUBLE)
             |     - CAST(s_$a AS DOUBLE)*CAST(s_$b AS DOUBLE))
             |  / ($den) END AS corr
             |FROM m""".stripMargin
        }
        s"""WITH l AS (SELECT CAST(round(l_quantity,0) AS BIGINT) AS qty,
           |    CAST(round(l_extendedprice,0) AS BIGINT) AS price_d,
           |    CAST(round(l_discount*100,0) AS BIGINT) AS disc_c,
           |    CAST(round(l_tax*100,0) AS BIGINT) AS tax_c FROM lineitem),
           |m AS (SELECT count(*) AS n, ${moments.mkString(", ")} FROM l)
           |${outs.mkString("\nUNION ALL\n")}""".stripMargin
      },
      // Entropy via the shared glog chain + exact quantized-long sums:
      // H = glog(N) − (Σ c·round(glog(c)·1e9)) / 1e9 / N.
      "q99_source_entropy" ->
        s"""WITH ws AS (SELECT source,
           |    list_filter(string_split(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' '),
           |                w -> w <> '') AS words FROM documents),
           |tok AS (SELECT source, unnest(words) AS token FROM ws),
           |c AS (SELECT source, token, count(*) AS n FROM tok GROUP BY 1, 2),
           |ns AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_tokens FROM c GROUP BY 1),
           |vals AS (SELECT DISTINCT v FROM (
           |  SELECT n AS v FROM c UNION ALL SELECT n_tokens FROM ns)),
           |$glogChainSql,
           |q AS (SELECT c.source,
           |    CAST(sum(c.n * CAST(round(g.glog * 1000000000.0) AS BIGINT)) AS BIGINT) AS sq
           |  FROM c JOIN gl g ON g.v = c.n GROUP BY 1)
           |SELECT ns.source, ns.n_tokens,
           |  g2.glog - CAST(q.sq AS DOUBLE) / 1000000000.0 / CAST(ns.n_tokens AS DOUBLE) AS entropy
           |FROM ns JOIN q ON q.source = ns.source
           |JOIN gl g2 ON g2.v = ns.n_tokens""".stripMargin,
      // PMI per (lang, source) cell: glog(n) + glog(N) − glog(n_x) −
      // glog(n_y) — one fixed expression per cell, no accumulation.
      "q100_lang_source_pmi" ->
        s"""WITH c AS (SELECT lang, source, count(*) AS n FROM documents GROUP BY 1, 2),
           |cx AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_x FROM c GROUP BY 1),
           |cy AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_y FROM c GROUP BY 1),
           |tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM c),
           |vals AS (SELECT DISTINCT v FROM (
           |  SELECT n AS v FROM c UNION ALL SELECT n_x FROM cx
           |  UNION ALL SELECT n_y FROM cy UNION ALL SELECT n_total FROM tot)),
           |$glogChainSql
           |SELECT c.lang, c.source, c.n,
           |  gn.glog + gt.glog - gx.glog - gy.glog AS pmi
           |FROM c JOIN cx USING (lang) JOIN cy USING (source) CROSS JOIN tot
           |JOIN gl gn ON gn.v = c.n
           |JOIN gl gx ON gx.v = cx.n_x
           |JOIN gl gy ON gy.v = cy.n_y
           |JOIN gl gt ON gt.v = tot.n_total""".stripMargin,
      "q101_promo_revenue" ->
        """WITH l AS (SELECT l_partkey,
          |    CAST(round(l_extendedprice*100,0) AS BIGINT)
          |      * (100 - CAST(round(l_discount*100,0) AS BIGINT)) AS rev
          |  FROM lineitem
          |  WHERE l_shipdate >= TIMESTAMP '1996-05-01 00:00:00'
          |    AND l_shipdate < TIMESTAMP '1996-06-01 00:00:00'),
          |m AS (SELECT
          |    CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) AS BIGINT)
          |      AS promo_revenue_e4,
          |    CAST(sum(rev) AS BIGINT) AS total_revenue_e4
          |  FROM l JOIN part ON l_partkey = p_partkey)
          |SELECT promo_revenue_e4, total_revenue_e4,
          |  100.0 * CAST(promo_revenue_e4 AS DOUBLE) / CAST(total_revenue_e4 AS DOUBLE)
          |    AS promo_pct
          |FROM m""".stripMargin,
      "q102_large_orders" ->
        """WITH lq AS (SELECT l_orderkey, sum(CAST(round(l_quantity,0) AS BIGINT)) AS total_qty
          |  FROM lineitem GROUP BY 1 HAVING total_qty >= 150)
          |SELECT o_orderkey, c_name, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
          |  CAST(round(o_totalprice*100,0) AS BIGINT) AS totalprice_cents,
          |  CAST(total_qty AS BIGINT) AS total_qty
          |FROM lq JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |ORDER BY total_qty DESC, o_orderkey LIMIT 100""".stripMargin,
      "q103_priority_returns" ->
        """SELECT o_orderpriority, count(*) AS n
          |FROM orders o
          |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
          |  AND EXISTS (SELECT 1 FROM lineitem l
          |    WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
          |GROUP BY 1""".stripMargin,
      // Same a4 assignment as q96, then the 25 smallest seeded-md5
      // keys per cluster (ties by id).
      "q104_cluster_sample" ->
        s"""WITH $kmeansCtesSql
           |SELECT cid AS cluster, id AS doc_id, x, y FROM (
           |  SELECT a4.*, row_number() OVER (PARTITION BY cid
           |    ORDER BY md5('g104' || CAST(id AS VARCHAR)), id) AS rn FROM a4)
           |WHERE rn <= 25""".stripMargin,
      // Integer-exact correlated-average threshold: qty*2*cnt < sum.
      "q106_small_qty_revenue" ->
        """WITH l AS (SELECT l_partkey, CAST(round(l_quantity,0) AS BIGINT) AS qty,
          |    CAST(round(l_extendedprice*100,0) AS BIGINT) AS pc FROM lineitem),
          |pp AS (SELECT l_partkey AS pk, CAST(sum(qty) AS BIGINT) AS sum_qty,
          |    count(*) AS cnt FROM l GROUP BY 1)
          |SELECT CAST(sum(pc) AS BIGINT) AS revenue_cents, count(*) AS n_items
          |FROM l JOIN pp ON l_partkey = pk
          |WHERE qty * 2 * cnt < sum_qty""".stripMargin,
      "q107_top_supplier" ->
        """WITH rev AS (SELECT l_suppkey,
          |    CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)
          |      * (100 - CAST(round(l_discount*100,0) AS BIGINT))) AS BIGINT) AS revenue_e4
          |  FROM lineitem
          |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
          |  GROUP BY 1)
          |SELECT s_suppkey, s_name, revenue_e4
          |FROM rev JOIN supplier ON l_suppkey = s_suppkey
          |WHERE revenue_e4 = (SELECT max(revenue_e4) FROM rev)""".stripMargin,
      // q22's prediction chain + labels -> confusion grid; frac from
      // exact-long counts.
      "q108_langid_confusion" ->
        s"""WITH t AS ($wordsSql),
           |s AS (SELECT t.doc_id, d.text, d.lang,
           |   len(list_filter(words, w -> w IN ('the','a','of','and','is'))) AS s_en,
           |   len(list_filter(words, w -> w IN ('der','die','und','das','ist'))) AS s_de,
           |   len(list_filter(words, w -> w IN ('le','la','les','et','est'))) AS s_fr,
           |   len(list_filter(words, w -> w IN ('el','los','las','es','y'))) AS s_es
           | FROM t JOIN documents d ON d.doc_id = t.doc_id),
           |p AS (SELECT doc_id, lang,
           | CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
           |      WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
           |      WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
           |      WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
           |      WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
           |      ELSE 'es' END AS pred_lang
           |FROM s),
           |g AS (SELECT lang, pred_lang, count(*) AS n FROM p GROUP BY 1, 2)
           |SELECT lang, pred_lang, n,
           |  CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY lang) AS DOUBLE) AS frac
           |FROM g""".stripMargin,
      // q77's sketch-quantile chain at p05/p95 -> per-source clamp ->
      // quantized-long sums (raw q_est, no rounding, mirrored exactly).
      "q110_winsorized_lengths" ->
        """WITH b AS (
          |  SELECT source,
          |    CAST(least(greatest(floor((CAST(n_chars AS DOUBLE) - 0.0) / 16.0), 0.0), 63.0) AS BIGINT) AS bin,
          |    count(*) AS n
          |  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2),
          |c AS (SELECT source, bin, n,
          |    sum(n) OVER (PARTITION BY source ORDER BY bin) AS cum,
          |    sum(n) OVER (PARTITION BY source) AS total
          |  FROM b),
          |r AS (SELECT source, bin, n, cum, p, greatest(p * total, 1e-12) AS rank
          |  FROM c CROSS JOIN (SELECT unnest([0.05, 0.95]) AS p)
          |  WHERE cum >= greatest(p * total, 1e-12)
          |    AND (cum - n) < greatest(p * total, 1e-12)),
          |q AS (SELECT source, p, 0.0 + (bin + (rank - (cum - n)) / n) * 16.0 AS q_est FROM r),
          |bounds AS (SELECT source,
          |    min(CASE WHEN p = 0.05 THEN q_est END) AS qlo,
          |    min(CASE WHEN p = 0.95 THEN q_est END) AS qhi
          |  FROM q GROUP BY 1),
          |w AS (SELECT d.source,
          |    least(greatest(CAST(d.n_chars AS DOUBLE), b.qlo), b.qhi) AS v
          |  FROM documents d JOIN bounds b ON b.source = d.source)
          |SELECT source, count(*) AS n_docs,
          |  CAST(sum(CAST(round(v * 10000, 0) AS BIGINT)) AS BIGINT) AS sum_winsor_q
          |FROM w GROUP BY 1""".stripMargin,
      // The parametric k-means chain at 3 features / k=3 / 2 rounds.
      "q112_kmeans_3d" ->
        s"""WITH ${kmeansCtes(
              kmeans2dFeatures :+ ("z" -> "length(text) - length(replace(text, 'e', ''))"),
              k = 3,
              iters = 2
            )}
           |SELECT cid AS cluster, count(*) AS n,
           |  CAST(sum(x) AS BIGINT) AS sum_x, CAST(sum(y) AS BIGINT) AS sum_y,
           |  CAST(sum(z) AS BIGINT) AS sum_z
           |FROM a3 GROUP BY 1""".stripMargin,
      "q111_mom_growth" ->
        """WITH m AS (SELECT o_orderpriority, strftime(o_orderdate, '%Y-%m') AS month,
          |    CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS month_cents
          |  FROM orders GROUP BY 1, 2),
          |g AS (SELECT o_orderpriority, month, month_cents,
          |    lag(month_cents) OVER (PARTITION BY o_orderpriority ORDER BY month) AS prev_cents
          |  FROM m)
          |SELECT o_orderpriority, month, month_cents, prev_cents,
          |  CASE WHEN prev_cents IS NOT NULL AND prev_cents <> 0
          |    THEN CAST(month_cents - prev_cents AS DOUBLE) / CAST(prev_cents AS DOUBLE)
          |  END AS growth
          |FROM g""".stripMargin,
      // Exact-moment OLS, mirrored term for term; single-x groups give
      // null slope/intercept in both engines.
      "q109_daily_trend" ->
        """WITH d AS (SELECT event_type,
          |    CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS x, count(*) AS y
          |  FROM events GROUP BY 1, 2),
          |m AS (SELECT event_type, count(*) AS n,
          |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
          |    CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(x*y) AS BIGINT) AS sxy
          |  FROM d GROUP BY 1)
          |SELECT event_type, n AS n_days,
          |  CASE WHEN CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
          |            - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE) <> 0.0
          |    THEN (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
          |       / (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
          |    END AS slope,
          |  CASE WHEN CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
          |            - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE) <> 0.0
          |    THEN (CAST(sy AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sxy AS DOUBLE))
          |       / (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
          |    END AS intercept
          |FROM m""".stripMargin,
      "q105_cumulative_revenue" ->
        """WITH m AS (SELECT o_orderpriority, strftime(o_orderdate, '%Y-%m') AS month,
          |    CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS month_cents
          |  FROM orders GROUP BY 1, 2)
          |SELECT o_orderpriority, month, month_cents,
          |  CAST(sum(month_cents) OVER (PARTITION BY o_orderpriority ORDER BY month
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents,
          |  CAST(sum(month_cents) OVER (PARTITION BY o_orderpriority ORDER BY month
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
          |    / CAST(sum(month_cents) OVER (PARTITION BY o_orderpriority) AS DOUBLE)
          |    AS cum_share
          |FROM m""".stripMargin
    ) ++ oracleSqlRound12 ++ annOracleSql
  }

  /** Oracles for the round-12 TPC-H shapes and distribution windows.
    * Mirrors the integer-exact conventions: revenue as e4, balances as
    * cents, the Q22 threshold cross-multiplied (bal·cnt > sum).
    */
  private def oracleSqlRound12: Map[String, String] = Map(
    "q113_nation_pair_volume" ->
      """SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
        |  CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
        |  CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)
        |    * (100 - CAST(round(l_discount*100,0) AS BIGINT))) AS BIGINT) AS revenue_e4,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ns ON s_nationkey = ns.n_nationkey
        |JOIN nation nc ON c_nationkey = nc.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND ns.n_name <> nc.n_name
        |GROUP BY 1, 2, 3""".stripMargin,
    "q114_market_share" ->
      """WITH asia_cust AS (
        |  SELECT c_custkey FROM customer
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'ASIA'),
        |n3_supp AS (
        |  SELECT s_suppkey FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_3')
        |SELECT CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
        |  CAST(sum(CASE WHEN l_suppkey IN (SELECT s_suppkey FROM n3_supp)
        |    THEN CAST(round(l_extendedprice*100,0) AS BIGINT)
        |      * (100 - CAST(round(l_discount*100,0) AS BIGINT)) ELSE 0 END) AS BIGINT)
        |    AS nation_rev_e4,
        |  CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)
        |    * (100 - CAST(round(l_discount*100,0) AS BIGINT))) AS BIGINT) AS total_rev_e4,
        |  CAST(sum(CASE WHEN l_suppkey IN (SELECT s_suppkey FROM n3_supp)
        |    THEN CAST(round(l_extendedprice*100,0) AS BIGINT)
        |      * (100 - CAST(round(l_discount*100,0) AS BIGINT)) ELSE 0 END) AS DOUBLE)
        |  / CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)
        |    * (100 - CAST(round(l_discount*100,0) AS BIGINT))) AS DOUBLE) AS mkt_share
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_custkey IN (SELECT c_custkey FROM asia_cust)
        |GROUP BY 1""".stripMargin,
    "q115_profit_by_nation" ->
      """SELECT n_name AS nation,
        |  CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
        |  CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)
        |      * (100 - CAST(round(l_discount*100,0) AS BIGINT))
        |    - CAST(round(p_retailprice*100,0) AS BIGINT)
        |      * CAST(round(l_quantity,0) AS BIGINT) * 100) AS BIGINT) AS profit_e4
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1, 2""".stripMargin,
    "q116_linestatus_priority" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)
        |    AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)
        |    AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1""".stripMargin,
    "q117_custdist" ->
      """WITH per_cust AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY 1)
        |SELECT c_count, count(*) AS custdist FROM per_cust GROUP BY 1""".stripMargin,
    "q118_disjunctive_revenue" ->
      """WITH l AS (SELECT l_partkey, CAST(round(l_quantity,0) AS BIGINT) AS qty,
        |    CAST(round(l_extendedprice*100,0) AS BIGINT)
        |      * (100 - CAST(round(l_discount*100,0) AS BIGINT)) AS rev
        |  FROM lineitem)
        |SELECT CAST(sum(rev) AS BIGINT) AS revenue_e4, count(*) AS n_items
        |FROM l JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND qty BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30 AND qty BETWEEN 10 AND 30)
        |   OR (p_brand = 'Brand#33' AND p_size BETWEEN 20 AND 50 AND qty BETWEEN 20 AND 50)""".stripMargin,
    "q119_sole_failing_supplier" ->
      """WITH per_os AS (
        |  SELECT l_orderkey, l_suppkey,
        |    max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_ret
        |  FROM lineitem GROUP BY 1, 2),
        |per_o AS (
        |  SELECT l_orderkey, count(*) AS n_supp, sum(has_ret) AS n_ret_supp,
        |    max(CASE WHEN has_ret = 1 THEN l_suppkey END) AS failing_supp
        |  FROM per_os GROUP BY 1
        |  HAVING count(*) >= 2 AND sum(has_ret) = 1)
        |SELECT s_name, count(*) AS numwait
        |FROM per_o JOIN supplier ON failing_supp = s_suppkey
        |GROUP BY 1""".stripMargin,
    "q120_idle_rich_customers" ->
      """WITH c AS (SELECT c_custkey, c_mktsegment,
        |    CAST(round(c_acctbal*100,0) AS BIGINT) AS bal_c FROM customer),
        |thr AS (SELECT CAST(sum(bal_c) AS BIGINT) AS sum_c, count(*) AS cnt
        |  FROM c WHERE bal_c > 0)
        |SELECT c_mktsegment, count(*) AS numcust,
        |  CAST(sum(bal_c) AS BIGINT) AS totacctbal_cents
        |FROM c, thr
        |WHERE bal_c * cnt > sum_c
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY 1""".stripMargin,
    "q121_length_deciles" ->
      """WITH d AS (SELECT source, doc_id, n_chars,
        |    CAST(ntile(10) OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS BIGINT)
        |      AS decile
        |  FROM documents)
        |SELECT source, decile, count(*) AS n,
        |  CAST(min(n_chars) AS BIGINT) AS min_chars,
        |  CAST(max(n_chars) AS BIGINT) AS max_chars,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM d GROUP BY 1, 2""".stripMargin,
    "q122_balance_ranks" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nationkey, c_custkey,
        |  CAST(round(c_acctbal*100,0) AS BIGINT) AS bal_c,
        |  percent_rank() OVER (PARTITION BY c_nationkey
        |    ORDER BY CAST(round(c_acctbal*100,0) AS BIGINT), c_custkey) AS pr,
        |  cume_dist() OVER (PARTITION BY c_nationkey
        |    ORDER BY CAST(round(c_acctbal*100,0) AS BIGINT), c_custkey) AS cd
        |FROM customer WHERE c_nationkey < 5""".stripMargin,
    "q123_markov_stationary" -> markovSql(markovStates, iters = 12),
    "q124_min_cost_supplier" ->
      """WITH l AS (SELECT l_partkey, l_suppkey,
        |    CAST(round(l_extendedprice*100,0) AS BIGINT) AS pc FROM lineitem),
        |mn AS (SELECT l_partkey AS pk, min(pc) AS m FROM l GROUP BY 1),
        |ch AS (SELECT l_partkey, min(l_suppkey) AS cheap_supp,
        |    CAST(min(pc) AS BIGINT) AS min_cents
        |  FROM l JOIN mn ON l_partkey = pk AND pc = m GROUP BY 1)
        |SELECT n_name AS nation, count(*) AS n_parts,
        |  CAST(sum(min_cents) AS BIGINT) AS sum_min_cents
        |FROM ch JOIN supplier ON cheap_supp = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1""".stripMargin,
    "q125_important_parts" ->
      """WITH pp AS (SELECT l_partkey,
        |    CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)
        |      * (100 - CAST(round(l_discount*100,0) AS BIGINT))) AS BIGINT) AS value_e4
        |  FROM lineitem GROUP BY 1),
        |tot AS (SELECT CAST(sum(value_e4) AS BIGINT) AS total_e4 FROM pp)
        |SELECT l_partkey, value_e4 FROM pp, tot
        |WHERE value_e4 * 1000 > total_e4""".stripMargin,
    "q126_part_supplier_counts" ->
      """SELECT p_brand, CAST(p_size AS BIGINT) AS p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#11' AND p_size IN (1, 5, 9, 13, 17)
        |GROUP BY 1, 2""".stripMargin,
    "q127_ewma_daily" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |con AS (SELECT event_type AS et, d + CAST(k AS INTEGER) AS td,
        |    n * (CAST(1 AS BIGINT) << CAST(29 - k AS INTEGER)) AS wn,
        |    CAST(1 AS BIGINT) << CAST(29 - k AS INTEGER) AS w
        |  FROM daily, (SELECT unnest(range(0, 30)) AS k) ks),
        |agg AS (SELECT et, td, CAST(sum(wn) AS BIGINT) AS num,
        |    CAST(sum(w) AS BIGINT) AS den
        |  FROM con GROUP BY 1, 2)
        |SELECT event_type, strftime(d, '%Y-%m-%d') AS day, n, num, den,
        |  CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS ewma
        |FROM agg JOIN daily ON et = event_type AND td = d""".stripMargin,
    "q128_dow_seasonality" ->
      """WITH daily0 AS (SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |daily AS (SELECT *, CAST(dayofweek(d) + 1 AS BIGINT) AS dow FROM daily0),
        |st AS (SELECT event_type AS et, dow AS sdow, count(*) AS nd,
        |    CAST(sum(n) AS BIGINT) AS tt
        |  FROM daily GROUP BY 1, 2)
        |SELECT event_type, dow, max(nd) AS n_days, max(tt) AS total,
        |  CAST(sum(CASE WHEN n * nd > tt * 2 THEN 1 ELSE 0 END) AS BIGINT) AS spike_days,
        |  CAST(sum(CASE WHEN n * nd * 2 < tt THEN 1 ELSE 0 END) AS BIGINT) AS quiet_days,
        |  CAST(max(tt) AS DOUBLE) / CAST(max(nd) AS DOUBLE) AS avg_n
        |FROM daily JOIN st ON event_type = et AND dow = sdow
        |GROUP BY 1, 2""".stripMargin,
    "q129_pca_projection" -> pcaSql(d = 64, iters = 30),
    "q130_grouping_sets" ->
      """SELECT n_name AS nation,
        |  CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
        |  CAST(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)
        |    * (100 - CAST(round(l_discount*100,0) AS BIGINT))) AS BIGINT) AS revenue_e4,
        |  CAST(GROUPING(n_name) AS BIGINT) AS g_nation,
        |  CAST(GROUPING(EXTRACT(year FROM l_shipdate)) AS BIGINT) AS g_year
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY GROUPING SETS ((n_name), (n_name, EXTRACT(year FROM l_shipdate)), ())""".stripMargin,
    "q131_trailing_week" ->
      """WITH daily AS (SELECT event_type,
        |    CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS di, count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, di, n,
        |  CAST(sum(n) OVER (PARTITION BY event_type ORDER BY di
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS trailing7
        |FROM daily""".stripMargin,
    "q132_repeat_customers" ->
      """WITH rep AS (
        |  SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1997)
        |SELECT c_mktsegment, count(*) AS n_repeat
        |FROM rep JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1""".stripMargin,
    "q133_pca_quadrants" -> pca2Sql(d = 64, iters = 30),
    "q134_fuzzy_part_names" ->
      """WITH names AS (SELECT DISTINCT p_name FROM part),
        |nb AS (SELECT p_name, substr(p_name, position(' ' IN p_name) + 1) AS blk FROM names)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS lev
        |FROM nb a JOIN nb b ON a.blk = b.blk AND a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 4""".stripMargin,
    "q135_cumulative_daily" ->
      """WITH daily AS (SELECT CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS di,
        |    count(*) AS n
        |  FROM events GROUP BY 1)
        |SELECT di, n, CAST(sum(n) OVER (ORDER BY di) AS BIGINT) AS cum_n
        |FROM daily""".stripMargin,
    "q136_ks_lengths" ->
      """WITH grid AS (SELECT CAST(n_chars AS BIGINT) AS v,
        |    CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |    CAST(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS c2
        |  FROM documents WHERE source IN ('src0', 'src1') GROUP BY 1),
        |c AS (SELECT v, CAST(sum(c1) OVER (ORDER BY v) AS BIGINT) AS k1,
        |    CAST(sum(c2) OVER (ORDER BY v) AS BIGINT) AS k2 FROM grid),
        |t AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2 FROM grid)
        |SELECT CAST(max(abs(k1*n2 - k2*n1)) AS BIGINT) AS ks_num,
        |  max(n1) AS n1, max(n2) AS n2,
        |  CAST(max(abs(k1*n2 - k2*n1)) AS DOUBLE)
        |    / CAST(max(n1) * max(n2) AS DOUBLE) AS ks
        |FROM c, t""".stripMargin,
    "q137_theil_sen" ->
      """WITH daily AS (SELECT event_type,
        |    CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS x, count(*) AS y
        |  FROM events GROUP BY 1, 2),
        |sl AS (SELECT a.event_type,
        |    CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope
        |  FROM daily a JOIN daily b ON a.event_type = b.event_type AND a.x < b.x),
        |med AS (SELECT event_type, count(*) AS n_pairs,
        |    quantile_cont(slope, 0.5) AS m FROM sl GROUP BY 1)
        |SELECT d.event_type, max(n_pairs) AS n_pairs, max(m) AS median_slope,
        |  quantile_cont(CAST(y AS DOUBLE) - m * CAST(x AS DOUBLE), 0.5) AS median_intercept
        |FROM daily d JOIN med ON d.event_type = med.event_type
        |GROUP BY 1""".stripMargin,
    "q138_chi2_independence" ->
      """WITH grid AS (SELECT event_type,
        |    CAST(dayofweek(CAST(ts AS DATE)) + 1 AS BIGINT) AS dow, count(*) AS o
        |  FROM events GROUP BY 1, 2),
        |rt AS (SELECT event_type AS et, CAST(sum(o) AS BIGINT) AS r FROM grid GROUP BY 1),
        |ct AS (SELECT dow AS dw, CAST(sum(o) AS BIGINT) AS c FROM grid GROUP BY 1),
        |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM grid),
        |cells AS (SELECT event_type, dow, n, o*n - r*c AS diff, n*r*c AS den
        |  FROM grid JOIN rt ON event_type = et JOIN ct ON dow = dw CROSS JOIN tot)
        |SELECT max(n) AS n,
        |  CAST((count(DISTINCT event_type) - 1) * (count(DISTINCT dow) - 1) AS BIGINT) AS dof,
        |  CAST(sum(CAST(floor(CAST(diff AS DOUBLE) * CAST(diff AS DOUBLE)
        |    / CAST(den AS DOUBLE) * 1000000.0) AS BIGINT)) AS BIGINT) AS chi2_q,
        |  CAST(sum(CAST(floor(CAST(diff AS DOUBLE) * CAST(diff AS DOUBLE)
        |    / CAST(den AS DOUBLE) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS chi2
        |FROM cells""".stripMargin,
    "q139_benford" ->
      s"""WITH digits AS (SELECT
         |    CAST(substr(CAST(CAST(round(o_totalprice*100,0) AS BIGINT) AS VARCHAR), 1, 1)
         |      AS BIGINT) AS digit,
         |    count(*) AS n_d
         |  FROM orders GROUP BY 1),
         |tot AS (SELECT CAST(sum(n_d) AS BIGINT) AS n FROM digits),
         |vals AS (SELECT unnest(range(1, 12)) AS v),
         |$glogChainSql
         |SELECT d.digit, d.n_d, tot.n,
         |  CAST(tot.n AS DOUBLE) * ((g1.glog - g0.glog) / g10.glog) AS expected,
         |  CAST(floor((CAST(d.n_d AS DOUBLE)
         |    - CAST(tot.n AS DOUBLE) * ((g1.glog - g0.glog) / g10.glog)) * 1000000.0)
         |    AS BIGINT) AS dev_q
         |FROM digits d CROSS JOIN tot
         |JOIN gl g0 ON g0.v = d.digit
         |JOIN gl g1 ON g1.v = d.digit + 1
         |JOIN gl g10 ON g10.v = 10""".stripMargin,
    "q140_activity_bitmaps" ->
      """WITH masks AS (SELECT user_id,
        |    bit_or(CAST(1 AS BIGINT) << dayofweek(CAST(ts AS DATE))) AS mask
        |  FROM events GROUP BY 1)
        |SELECT mask, count(*) AS n_users,
        |  CAST(bit_count(mask) AS BIGINT) AS days_active
        |FROM masks GROUP BY 1""".stripMargin,
    "q141_supplier_except_all" ->
      """WITH a AS (
        |  SELECT l_suppkey FROM lineitem WHERE EXTRACT(year FROM l_shipdate) = 1996
        |  EXCEPT ALL
        |  SELECT l_suppkey FROM lineitem WHERE EXTRACT(year FROM l_shipdate) = 1997)
        |SELECT l_suppkey, count(*) AS surplus FROM a GROUP BY 1""".stripMargin,
    "q142_brand_signature" ->
      """WITH b AS (SELECT DISTINCT n_name AS nation, p_brand
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey)
        |SELECT nation, count(*) AS n_brands,
        |  string_agg(p_brand, ',' ORDER BY p_brand) AS brand_csv
        |FROM b GROUP BY 1""".stripMargin,
    "q143_common_brands" ->
      """WITH p AS (SELECT DISTINCT CAST(s_nationkey AS BIGINT) AS nk, p_brand
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey),
        |x AS (SELECT a.nk,
        |    (SELECT count(*) FROM p c WHERE c.nk = a.nk
        |       AND c.p_brand IN (SELECT p_brand FROM p d WHERE d.nk = a.nk + 1))
        |      AS n_common,
        |    (SELECT coalesce(string_agg(c.p_brand, ',' ORDER BY c.p_brand), '')
        |       FROM p c WHERE c.nk = a.nk
        |       AND c.p_brand IN (SELECT p_brand FROM p d WHERE d.nk = a.nk + 1))
        |      AS common_csv
        |  FROM (SELECT DISTINCT nk FROM p) a
        |  WHERE a.nk < 6 AND EXISTS (SELECT 1 FROM p e WHERE e.nk = a.nk + 1))
        |SELECT nk, CAST(n_common AS BIGINT) AS n_common, common_csv FROM x""".stripMargin,
    "q144_capitalized_tokens" ->
      """SELECT source,
        |  CAST(sum(length(regexp_extract_all(text, '[A-Z][a-z]+'))) AS BIGINT) AS n_caps,
        |  count(*) AS n_docs
        |FROM documents GROUP BY 1""".stripMargin,
    "q145_month_end_orders" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM orders
        |WHERE CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE)
        |    - CAST(o_orderdate AS DATE) <= 3
        |GROUP BY 1""".stripMargin,
    "q146_mode_lang" ->
      """WITH c AS (SELECT source, lang, count(*) AS cnt
        |  FROM documents GROUP BY 1, 2),
        |r AS (SELECT source, lang, cnt,
        |    row_number() OVER (PARTITION BY source ORDER BY cnt DESC, lang DESC) AS rn,
        |    CAST(sum(cnt) OVER (PARTITION BY source) AS BIGINT) AS n_docs
        |  FROM c)
        |SELECT source, lang AS top_lang, cnt AS top_cnt, n_docs
        |FROM r WHERE rn = 1""".stripMargin,
    "q147_ship_delay" ->
      """WITH d AS (SELECT o_orderpriority,
        |    CAST(CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE) AS BIGINT) AS delay
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT o_orderpriority, count(*) AS n,
        |  min(delay) AS min_d, max(delay) AS max_d,
        |  CAST(sum(delay) AS BIGINT) AS sum_d,
        |  CAST(sum(delay) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_d,
        |  quantile_cont(delay, 0.5) AS median_d
        |FROM d GROUP BY 1""".stripMargin,
    "q148_incremental_semantic" -> incrementalSemanticSql,
    "q149_bpe_merges" -> bpeMergesSql,
    "q150_bpe_tokenize" -> bpeTokenizeSql,
    // Mirrors Stats.psiFromCounts exactly: Laplace-smoothed shares over
    // the full-outer key union, the same glog polynomial for each of the
    // four ln terms, ((p - q) * lr) * 1e9 in the same association order,
    // round-then-cast per key, exact BIGINT sum, one final /1e9.
    "q151_psi_drift" ->
      psiDriftSql,
    // q108's langid CTE -> confusion counts -> kappa from exact integer
    // moments: (A*N - E) / (N^2 - E), all BIGINT-exact here and
    // decimal-exact on the Spark side, cast to DOUBLE for the one
    // division. NULL on a perfect-chance denominator, matching Spark.
    "q152_lang_kappa" ->
      s"""WITH t AS ($wordsSql),
         |s AS (SELECT t.doc_id, d.text, d.lang,
         |   len(list_filter(words, w -> w IN ('the','a','of','and','is'))) AS s_en,
         |   len(list_filter(words, w -> w IN ('der','die','und','das','ist'))) AS s_de,
         |   len(list_filter(words, w -> w IN ('le','la','les','et','est'))) AS s_fr,
         |   len(list_filter(words, w -> w IN ('el','los','las','es','y'))) AS s_es
         | FROM t JOIN documents d ON d.doc_id = t.doc_id),
         |p AS (SELECT doc_id, lang,
         | CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
         |      WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
         |      WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
         |      WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
         |      WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
         |      ELSE 'es' END AS pred_lang
         |FROM s),
         |g AS (SELECT lang, pred_lang, count(*) AS n FROM p
         |  WHERE lang IS NOT NULL AND pred_lang IS NOT NULL GROUP BY 1, 2),
         |na AS (SELECT lang AS k, CAST(sum(n) AS BIGINT) AS n_a FROM g GROUP BY 1),
         |nb AS (SELECT pred_lang AS k, CAST(sum(n) AS BIGINT) AS n_b FROM g GROUP BY 1),
         |e AS (SELECT CAST(coalesce(sum(na.n_a * nb.n_b), 0) AS BIGINT) AS e_num
         |  FROM na JOIN nb USING (k)),
         |ag AS (SELECT CAST(sum(n) AS BIGINT) AS n_total,
         |  CAST(coalesce(sum(CASE WHEN lang = pred_lang THEN n END), 0) AS BIGINT) AS agree
         |  FROM g)
         |SELECT n_total, agree,
         |  CASE WHEN n_total * n_total <> e_num THEN
         |    CAST(agree * n_total - e_num AS DOUBLE) /
         |    CAST(n_total * n_total - e_num AS DOUBLE) END AS kappa
         |FROM ag CROSS JOIN e""".stripMargin,
    // Mirrors TextAnalysis.oovRate: top-300 vocab (count desc, token
    // asc), left join flags, counts per doc, left join back to ALL docs
    // (token-less docs keep a zero row), floor(n_oov*1e4/n_tokens)/1e4.
    "q153_oov_rate" ->
      s"""WITH t AS ($wordsSql),
         |tok AS (SELECT doc_id, unnest(words) AS token FROM t),
         |v AS (SELECT token FROM (SELECT token, count(*) AS n FROM tok GROUP BY 1
         |      ORDER BY n DESC, token ASC LIMIT 300)),
         |a AS (SELECT tok.doc_id, count(*) AS n_tokens,
         |      CAST(coalesce(sum(CASE WHEN v.token IS NULL THEN 1 END), 0) AS BIGINT) AS n_oov
         |  FROM tok LEFT JOIN v ON v.token = tok.token GROUP BY 1)
         |SELECT d.doc_id,
         |  CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(a.n_oov, 0) AS BIGINT) AS n_oov,
         |  CASE WHEN a.n_tokens > 0
         |    THEN floor(CAST(a.n_oov AS DOUBLE) * 10000.0 / CAST(a.n_tokens AS DOUBLE)) / 10000.0
         |    ELSE 0.0 END AS oov_rate
         |FROM documents d LEFT JOIN a ON a.doc_id = d.doc_id""".stripMargin,
    // q78's segmentation CTE at segTokens=2, then keep-first repeat
    // flagging via the same (doc_id, seg)-partitioned row_number and
    // the q78 rebuild (ordered string_agg, trunc4 fraction).
    "q154_strip_repeats" ->
      s"""WITH t AS ($wordsSql),
         |s AS (SELECT doc_id, u.pos AS pos, u.seg AS seg FROM (
         |  SELECT doc_id,
         |    unnest([{'pos': CAST(i AS BIGINT),
         |             'seg': array_to_string(words[(i*2+1):(i*2+2)], ' ')}
         |            for i in range(0, CAST(ceil(len(words)/2.0) AS BIGINT))]) AS u
         |  FROM t WHERE len(words) > 0)),
         |f AS (SELECT doc_id, pos, seg,
         |    row_number() OVER (PARTITION BY doc_id, seg ORDER BY pos) > 1 AS rep FROM s)
         |SELECT doc_id, count(*) AS n_segs,
         |  CAST(sum(CASE WHEN rep THEN 1 ELSE 0 END) AS BIGINT) AS n_repeated,
         |  floor(CAST(sum(CASE WHEN rep THEN 1 ELSE 0 END) AS DOUBLE)/count(*)*10000)/10000
         |    AS frac_repeated,
         |  string_agg(seg, ' ' ORDER BY pos) FILTER (WHERE NOT rep) AS clean_text
         |FROM f GROUP BY doc_id""".stripMargin,
    // The q151 PSI replay with a lang group column: per-lang totals,
    // smoothing, glog terms, quantized-long sums.
    "q155_psi_per_lang" ->
      s"""WITH r AS (SELECT lang, source AS k, CAST(count(*) AS BIGINT) AS n
         |  FROM documents WHERE doc_id % 2 = 0 GROUP BY 1, 2),
         |c AS (SELECT lang, source AS k, CAST(count(*) AS BIGINT) AS n
         |  FROM documents WHERE doc_id % 2 = 1 GROUP BY 1, 2),
         |j AS (SELECT coalesce(r.lang, c.lang) AS lang, coalesce(r.k, c.k) AS k,
         |    CAST(coalesce(r.n, 0) AS BIGINT) AS r, CAST(coalesce(c.n, 0) AS BIGINT) AS c
         |  FROM r FULL OUTER JOIN c ON r.lang = c.lang AND r.k = c.k),
         |tot AS (SELECT lang, CAST(sum(r) AS BIGINT) AS bigR, CAST(sum(c) AS BIGINT) AS bigC,
         |    CAST(count(*) AS BIGINT) AS k FROM j GROUP BY 1),
         |vals AS (SELECT DISTINCT v FROM (
         |  SELECT c + 1 AS v FROM j UNION ALL SELECT r + 1 FROM j
         |  UNION ALL SELECT bigC + k FROM tot UNION ALL SELECT bigR + k FROM tot)),
         |$glogChainSql,
         |terms AS (SELECT j.lang,
         |    CAST(round(((CAST(j.c + 1 AS DOUBLE) / CAST(tot.bigC + tot.k AS DOUBLE))
         |              - (CAST(j.r + 1 AS DOUBLE) / CAST(tot.bigR + tot.k AS DOUBLE)))
         |      * (gc.glog - gbc.glog - gr.glog + gbr.glog) * 1000000000.0) AS BIGINT) AS tq
         |  FROM j JOIN tot ON tot.lang = j.lang
         |  JOIN gl gc ON gc.v = j.c + 1
         |  JOIN gl gr ON gr.v = j.r + 1
         |  JOIN gl gbc ON gbc.v = tot.bigC + tot.k
         |  JOIN gl gbr ON gbr.v = tot.bigR + tot.k)
         |SELECT tot.lang, tot.k AS n_keys, tot.bigR AS ref_n, tot.bigC AS cur_n,
         |  CAST(t.sq AS DOUBLE) / 1000000000.0 AS psi
         |FROM tot JOIN (SELECT lang, CAST(sum(tq) AS BIGINT) AS sq FROM terms GROUP BY 1) t
         |  ON t.lang = tot.lang""".stripMargin,
    // Mirrors Stats.rocAuc: bounded score grid, running negative count
    // (the single-window oracle of the two-phase prefix sum), decimal-
    // factor numerator, one final division. Half-credit ties via
    // 2·negBelow + neg.
    "q156_roc_auc" ->
      """WITH g AS (SELECT CAST(floor(value) AS BIGINT) AS score,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS pos,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END) AS BIGINT) AS neg
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL GROUP BY 1),
        |c AS (SELECT pos, neg,
        |    CAST(sum(neg) OVER (ORDER BY score
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_neg
        |  FROM g),
        |a AS (SELECT CAST(coalesce(sum(pos), 0) AS BIGINT) AS n_pos,
        |    CAST(coalesce(sum(neg), 0) AS BIGINT) AS n_neg,
        |    coalesce(sum(CAST(pos AS DECIMAL(38,0)) *
        |      (CAST(2 AS DECIMAL(38,0)) * CAST(cum_neg - neg AS DECIMAL(38,0))
        |        + CAST(neg AS DECIMAL(38,0)))), CAST(0 AS DECIMAL(38,0))) AS num2
        |  FROM c)
        |SELECT n_pos, n_neg, CAST(num2 AS BIGINT) AS auc_num2x,
        |  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
        |    CAST(num2 AS DOUBLE) /
        |    CAST(CAST(2 AS DECIMAL(38,0)) * CAST(n_pos AS DECIMAL(38,0))
        |      * CAST(n_neg AS DECIMAL(38,0)) AS DOUBLE) END AS auc
        |FROM a""".stripMargin,
    // Mirrors Stats.calibrationBins: bin = floor((score·nBins) /
    // scale) in DOUBLE (the same IEEE shape), clamped to nBins−1;
    // exact per-bin longs; trunc4 acc/conf readbacks.
    "q157_calibration_bins" ->
      """WITH s AS (SELECT CAST(floor(value) AS BIGINT) AS score,
        |    CASE WHEN event_type IN ('purchase', 'signup') THEN 1 ELSE 0 END AS y
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL)
        |SELECT least(CAST(floor(CAST(score * 10 AS DOUBLE) / 500.0) AS BIGINT), 9) AS bin,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(y) AS BIGINT) AS n_pos,
        |  CAST(sum(score) AS BIGINT) AS sum_score,
        |  floor(CAST(sum(y) AS DOUBLE) * 10000.0 / CAST(count(*) AS DOUBLE)) / 10000.0 AS acc,
        |  floor(CAST(sum(score) AS DOUBLE) * 10000.0 /
        |    (CAST(count(*) AS DOUBLE) * 500.0)) / 10000.0 AS conf
        |FROM s GROUP BY 1""".stripMargin,
    // The q157 bins collapsed to ECE: per-bin |n_pos·scale − sum_score|
    // is an exact integer, one sum, one division by scale·N.
    "q158_ece" ->
      """WITH s AS (SELECT CAST(floor(value) AS BIGINT) AS score,
        |    CASE WHEN event_type IN ('purchase', 'signup') THEN 1 ELSE 0 END AS y
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |b AS (SELECT least(CAST(floor(CAST(score * 10 AS DOUBLE) / 500.0) AS BIGINT), 9) AS bin,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS n_pos,
        |    CAST(sum(score) AS BIGINT) AS sum_score
        |  FROM s GROUP BY 1),
        |e AS (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS n,
        |    coalesce(sum(abs(CAST(n_pos AS DECIMAL(38,0)) * CAST(500 AS DECIMAL(38,0))
        |      - CAST(sum_score AS DECIMAL(38,0)))), CAST(0 AS DECIMAL(38,0))) AS ece_num
        |  FROM b)
        |SELECT n, CAST(ece_num AS BIGINT) AS ece_num,
        |  CASE WHEN n > 0 THEN CAST(ece_num AS DOUBLE) /
        |    CAST(CAST(500 AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0)) AS DOUBLE) END AS ece
        |FROM e""".stripMargin,
    // Mirrors TextAnalysis.zipfProfile: top-200 tokens (count desc,
    // token asc), glog ranks/counts quantized at 10⁴ (the 2⁵³ bound —
    // see the op scaladoc), decimal-factor OLS moments, slope and
    // intercept each one fixed IEEE expression.
    "q159_zipf_profile" ->
      s"""WITH t AS ($wordsSql),
         |tok AS (SELECT unnest(words) AS token FROM t),
         |cnt AS (SELECT token, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY 1),
         |top AS (SELECT token, n FROM cnt ORDER BY n DESC, token ASC LIMIT 200),
         |rk AS (SELECT row_number() OVER (ORDER BY n DESC, token ASC) AS rank, n FROM top),
         |vals AS (SELECT DISTINCT v FROM (
         |  SELECT CAST(rank AS BIGINT) AS v FROM rk UNION ALL SELECT n FROM rk)),
         |$glogChainSql,
         |qd AS (SELECT CAST(round(gx.glog * 10000.0) AS BIGINT) AS xq,
         |    CAST(round(gy.glog * 10000.0) AS BIGINT) AS yq
         |  FROM rk JOIN gl gx ON gx.v = rk.rank JOIN gl gy ON gy.v = rk.n),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS k,
         |    CAST(sum(CAST(xq AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
         |    CAST(sum(CAST(yq AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
         |    CAST(sum(CAST(xq AS DECIMAL(38,0)) * CAST(xq AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxx,
         |    CAST(sum(CAST(xq AS DECIMAL(38,0)) * CAST(yq AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxy
         |  FROM qd)
         |SELECT k AS n_ranks,
         |  CASE WHEN CAST(k AS DECIMAL(38,0)) * sxx - sx * sx <> 0 THEN
         |    CAST(CAST(k AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE) /
         |    CAST(CAST(k AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE) END AS slope,
         |  CASE WHEN CAST(k AS DECIMAL(38,0)) * sxx - sx * sx <> 0 THEN
         |    CAST(sy AS DOUBLE) / 10000.0 / CAST(k AS DOUBLE) -
         |    (CAST(CAST(k AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE) /
         |     CAST(CAST(k AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE)) *
         |    (CAST(sx AS DOUBLE) / 10000.0 / CAST(k AS DOUBLE)) END AS intercept
         |FROM m""".stripMargin,
    // The q87 BM25 chain twice (k1/b = 1.2/0.75 and the exactly-
    // representable 0.5/0.5), k=20 each, fused by exact-integer
    // reciprocal-rank contributions 10⁹ // (60+rank).
    "q160_rrf_fusion" ->
      s"""WITH $bm25PairChainSql,
         |u AS (SELECT query_id, doc_id, 1000000000 // (60 + rank) AS c_q
         |    FROM rkA WHERE rank <= 20
         |  UNION ALL SELECT query_id, doc_id, 1000000000 // (60 + rank)
         |    FROM rkB WHERE rank <= 20),
         |f AS (SELECT query_id, doc_id, CAST(count(*) AS BIGINT) AS n_lists,
         |    CAST(sum(c_q) AS BIGINT) AS rrf_q FROM u GROUP BY 1, 2),
         |r AS (SELECT query_id, doc_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY rrf_q DESC, doc_id) AS rank,
         |    n_lists, rrf_q FROM f)
         |SELECT query_id, doc_id, rank, n_lists, rrf_q,
         |  CAST(rrf_q AS DOUBLE) / 1000000000.0 AS rrf
         |FROM r WHERE rank <= 10""".stripMargin,
    "q161_mmr_select" -> mmrOracleSql(k = 8, lamPerMille = 500, dim = 64),
    // The q160 pair chain, read back as per-query top-20 set overlap.
    "q167_retrieval_agreement" ->
      s"""WITH $bm25PairChainSql,
         |ja AS (SELECT query_id, doc_id FROM rkA WHERE rank <= 20),
         |jb AS (SELECT query_id, doc_id FROM rkB WHERE rank <= 20),
         |fo AS (SELECT coalesce(ja.query_id, jb.query_id) AS query_id,
         |    CASE WHEN ja.doc_id IS NOT NULL AND jb.doc_id IS NOT NULL THEN 1 ELSE 0 END AS b
         |  FROM ja FULL OUTER JOIN jb
         |    ON ja.query_id = jb.query_id AND ja.doc_id = jb.doc_id)
         |SELECT query_id, CAST(sum(b) AS BIGINT) AS n_both,
         |  CAST(count(*) AS BIGINT) AS n_union,
         |  floor(CAST(sum(b) AS DOUBLE) * 10000.0 / CAST(count(*) AS DOUBLE)) / 10000.0
         |    AS jaccard
         |FROM fo GROUP BY 1""".stripMargin,
    // q168 routes the SAME computation as q150 through the persisted
    // model table (fit → write → read → tokenize) — the round-trip must
    // be invisible in the result, so the oracle is q150's replay.
    "q168_bpe_model_tokenize" -> bpeTokenizeSql,
    "q169_image_dhash_pairs" -> imageDHashPairsSql,
    "q170_semantic_decontaminate" -> semanticDecontaminateSql,
    "q171_image_dedup_clusters" -> imageDedupClustersSql,
    "q172_drift_monitor" -> driftMonitorSql,
    "q173_bpe_apply_256" -> bpeApply256Sql,
    "q174_image_phash_pairs" -> imagePHashPairsSql,
    "q175_video_neardup_pairs" -> videoNearDupSql,
    // The q156 replay with a source partition: per-source grids,
    // PARTITION BY in the running negative count, per-source moments.
    "q162_auc_per_source" ->
      """WITH g AS (SELECT source, CAST(n_chars AS BIGINT) AS score,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS pos,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS neg
        |  FROM documents
        |  WHERE n_chars IS NOT NULL AND lang IS NOT NULL AND source IS NOT NULL
        |  GROUP BY 1, 2),
        |c AS (SELECT source, pos, neg,
        |    CAST(sum(neg) OVER (PARTITION BY source ORDER BY score
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_neg
        |  FROM g),
        |a AS (SELECT source, CAST(sum(pos) AS BIGINT) AS n_pos,
        |    CAST(sum(neg) AS BIGINT) AS n_neg,
        |    coalesce(sum(CAST(pos AS DECIMAL(38,0)) *
        |      (CAST(2 AS DECIMAL(38,0)) * CAST(cum_neg - neg AS DECIMAL(38,0))
        |        + CAST(neg AS DECIMAL(38,0)))), CAST(0 AS DECIMAL(38,0))) AS num2
        |  FROM c GROUP BY 1)
        |SELECT source, n_pos, n_neg, CAST(num2 AS BIGINT) AS auc_num2x,
        |  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
        |    CAST(num2 AS DOUBLE) /
        |    CAST(CAST(2 AS DECIMAL(38,0)) * CAST(n_pos AS DECIMAL(38,0))
        |      * CAST(n_neg AS DECIMAL(38,0)) AS DOUBLE) END AS auc
        |FROM a""".stripMargin,
    // Mirrors Stats.gini: per-user counts -> value grid -> running
    // count -> the division-free rank-sum expansion
    // v·(2·c·nBelow + c·(c+1)), num = t2 − (n+1)·S, den = n·S.
    "q163_gini_activity" ->
      """WITH u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS v FROM events GROUP BY 1),
        |g AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM u GROUP BY 1),
        |c2 AS (SELECT v, c, CAST(sum(c) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_c FROM g),
        |a AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n,
        |    coalesce(sum(CAST(v AS DECIMAL(38,0)) * CAST(c AS DECIMAL(38,0))),
        |      CAST(0 AS DECIMAL(38,0))) AS s,
        |    coalesce(sum(CAST(v AS DECIMAL(38,0)) *
        |      (CAST(2 AS DECIMAL(38,0)) * CAST(c AS DECIMAL(38,0))
        |         * CAST(cum_c - c AS DECIMAL(38,0))
        |       + CAST(c AS DECIMAL(38,0)) * (CAST(c AS DECIMAL(38,0))
        |         + CAST(1 AS DECIMAL(38,0))))), CAST(0 AS DECIMAL(38,0))) AS t2
        |  FROM c2)
        |SELECT n, CAST(s AS BIGINT) AS sum_v,
        |  CASE WHEN n > 0 AND s <> 0 THEN
        |    CAST(t2 - (CAST(n AS DECIMAL(38,0)) + CAST(1 AS DECIMAL(38,0))) * s AS DOUBLE) /
        |    CAST(CAST(n AS DECIMAL(38,0)) * s AS DOUBLE) END AS gini
        |FROM a""".stripMargin,
    // q84's 3-gram shingle shape: odd-id docs left-join the even-id
    // reference's distinct grams; trunc4 novelty, shingle-less docs
    // keep a zero row with null novelty.
    "q164_novelty" ->
      s"""WITH t AS ($wordsSql),
         |s AS (SELECT DISTINCT doc_id,
         |   unnest(list_transform(range(1, len(words) - 1),
         |     i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS sh
         | FROM t WHERE len(words) >= 3),
         |ref AS (SELECT DISTINCT sh FROM s WHERE doc_id % 2 = 0),
         |d AS (SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
         |    CAST(coalesce(sum(CASE WHEN ref.sh IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT)
         |      AS n_seen
         |  FROM s LEFT JOIN ref ON ref.sh = s.sh
         |  WHERE s.doc_id % 2 <> 0 GROUP BY 1)
         |SELECT doc.doc_id,
         |  CAST(coalesce(d.n_shingles, 0) AS BIGINT) AS n_shingles,
         |  CAST(coalesce(d.n_seen, 0) AS BIGINT) AS n_seen,
         |  CASE WHEN d.n_shingles > 0 THEN
         |    floor(CAST(d.n_shingles - d.n_seen AS DOUBLE) * 10000.0 /
         |      CAST(d.n_shingles AS DOUBLE)) / 10000.0 END AS novelty
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 2 <> 0) doc
         |LEFT JOIN d USING (doc_id)""".stripMargin,
    // Mirrors Stats.jsdFromCounts: full-outer count join, per-key
    // p/m = 2cR/(cR+rC) via ln2 + glog(cR) − glog(cR+rC), the paired
    // q-side term, ONE round-to-long per key, exact sum, /2e9.
    "q165_jsd_drift" ->
      jsdDriftSql,
    // Mirrors Stats.spearman: joint grid, doubled midranks
    // 2·nBelow + c + 1 from marginal running counts, decimal-factor
    // moments, one fixed IEEE expression with two exact sqrt calls.
    "q166_spearman" ->
      """WITH b AS (SELECT CAST(floor(l_quantity) AS BIGINT) AS vx,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS vy
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1995-02-01 00:00:00'
        |    AND l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
        |j AS (SELECT vx, vy, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1, 2),
        |mx AS (SELECT vx, CAST(sum(c) AS BIGINT) AS mc FROM j GROUP BY 1),
        |rx AS (SELECT vx, 2 * (CAST(sum(mc) OVER (ORDER BY vx
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - mc) + mc + 1
        |    AS r_vx FROM mx),
        |my AS (SELECT vy, CAST(sum(c) AS BIGINT) AS mc FROM j GROUP BY 1),
        |ry AS (SELECT vy, 2 * (CAST(sum(mc) OVER (ORDER BY vy
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - mc) + mc + 1
        |    AS r_vy FROM my),
        |m AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n,
        |    coalesce(sum(CAST(c AS DECIMAL(38,0)) * CAST(r_vx AS DECIMAL(38,0))),
        |      CAST(0 AS DECIMAL(38,0))) AS sx,
        |    coalesce(sum(CAST(c AS DECIMAL(38,0)) * CAST(r_vy AS DECIMAL(38,0))),
        |      CAST(0 AS DECIMAL(38,0))) AS sy,
        |    coalesce(sum(CAST(c AS DECIMAL(38,0)) * CAST(r_vx AS DECIMAL(38,0))
        |      * CAST(r_vx AS DECIMAL(38,0))), CAST(0 AS DECIMAL(38,0))) AS sxx,
        |    coalesce(sum(CAST(c AS DECIMAL(38,0)) * CAST(r_vy AS DECIMAL(38,0))
        |      * CAST(r_vy AS DECIMAL(38,0))), CAST(0 AS DECIMAL(38,0))) AS syy,
        |    coalesce(sum(CAST(c AS DECIMAL(38,0)) * CAST(r_vx AS DECIMAL(38,0))
        |      * CAST(r_vy AS DECIMAL(38,0))), CAST(0 AS DECIMAL(38,0))) AS sxy
        |  FROM j JOIN rx USING (vx) JOIN ry USING (vy))
        |SELECT n,
        |  CASE WHEN CAST(n AS DECIMAL(38,0)) * sxx - sx * sx > 0
        |        AND CAST(n AS DECIMAL(38,0)) * syy - sy * sy > 0 THEN
        |    CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE) /
        |    (sqrt(CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE)) *
        |     sqrt(CAST(CAST(n AS DECIMAL(38,0)) * syy - sy * sy AS DOUBLE))) END AS rho
        |FROM m""".stripMargin
  )

  /** Shared q160/q167 CTE chain: the q87 BM25 replay run twice over the
    * same postings/idf — parameterization A (Lucene defaults 1.2/0.75)
    * and B (the exactly-representable 0.5/0.5) — ending at the ranked
    * lists rkA/rkB. q160 fuses them; q167 reads their set overlap.
    */
  private lazy val bm25PairChainSql: String =
    s"""t AS ($wordsSql),
       |post AS (SELECT token, doc_id, dl, count(*) AS tf FROM (
       |    SELECT doc_id, len(words) AS dl, unnest(words) AS token FROM t)
       |  GROUP BY 1, 2, 3),
       |st AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl
       |  FROM (SELECT DISTINCT doc_id, dl FROM post)),
       |q AS (SELECT CAST(query_id AS BIGINT) AS query_id, qtext FROM (VALUES
       |    (1, 'spark join merge'),
       |    (2, 'customer vector data')) AS v(query_id, qtext)),
       |qt AS (SELECT query_id, unnest(list_distinct(list_filter(
       |    string_split(regexp_replace(lower(qtext), '[^a-z0-9]+', ' ', 'g'), ' '),
       |    w -> w <> ''))) AS token FROM q),
       |qtok AS (SELECT DISTINCT token FROM qt),
       |cand AS (SELECT p.* FROM post p JOIN qtok USING (token)),
       |dft AS (SELECT token, count(*) AS df FROM cand GROUP BY 1),
       |vals AS (SELECT DISTINCT v FROM (
       |  SELECT 2 * n_docs + 2 AS v FROM st UNION ALL SELECT 2 * df + 1 FROM dft)),
       |$glogChainSql,
       |gn AS (SELECT gl.glog AS glog_n FROM st JOIN gl ON gl.v = 2 * st.n_docs + 2),
       |idf AS (SELECT d.token, gn.glog_n - gl.glog AS idf
       |  FROM dft d JOIN gl ON gl.v = 2 * d.df + 1 CROSS JOIN gn),
       |termA AS (SELECT c.token, c.doc_id,
       |    CAST(round(i.idf * ((c.tf * 2.2) / (c.tf + 1.2 * (0.25 + 0.75 *
       |      (c.dl / (CAST(st.sum_dl AS DOUBLE) / CAST(st.n_docs AS DOUBLE))))))
       |      * 1000000000.0) AS BIGINT) AS term_q
       |  FROM cand c JOIN idf i USING (token) CROSS JOIN st),
       |termB AS (SELECT c.token, c.doc_id,
       |    CAST(round(i.idf * ((c.tf * 1.5) / (c.tf + 0.5 * (0.5 + 0.5 *
       |      (c.dl / (CAST(st.sum_dl AS DOUBLE) / CAST(st.n_docs AS DOUBLE))))))
       |      * 1000000000.0) AS BIGINT) AS term_q
       |  FROM cand c JOIN idf i USING (token) CROSS JOIN st),
       |scA AS (SELECT qt.query_id, tm.doc_id, CAST(sum(tm.term_q) AS BIGINT) AS score_q
       |  FROM termA tm JOIN qt USING (token) GROUP BY 1, 2),
       |scB AS (SELECT qt.query_id, tm.doc_id, CAST(sum(tm.term_q) AS BIGINT) AS score_q
       |  FROM termB tm JOIN qt USING (token) GROUP BY 1, 2),
       |rkA AS (SELECT query_id, doc_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY score_q DESC, doc_id) AS rank
       |  FROM scA),
       |rkB AS (SELECT query_id, doc_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY score_q DESC, doc_id) AS rank
       |  FROM scB)""".stripMargin

  /** Generated oracle for q161: replays [[graft.ops.Similarity.mmrSelect]]
    * pick for pick as a MATERIALIZED CTE chain (the q96/q129/q149
    * unrolled-loop discipline). Vectors quantize to floor(x·2^20)
    * BIGINTs; rel is the exact self-dot; step i cross-joins the i−1
    * 1-row previous picks, takes the max dot as msim, and argmaxes
    * `keep·rel − λ·msim` with id-asc ties — every value an exact BIGINT,
    * so the chain is bit-identical to the Spark loop.
    */
  private def mmrOracleSql(k: Int, lamPerMille: Int, dim: Int): String = {
    val keep = 1000L - lamPerMille
    def dot(a: String, b: String) =
      s"list_reduce(list_transform(range(1, ${dim + 1}), i -> $a[i] * $b[i]), (x, y) -> x + y)"
    val base =
      s"""base AS MATERIALIZED (SELECT vec_id AS id,
         |    [CAST(floor(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) * 1048576.0) AS BIGINT)
         |     for i in range(1, ${dim + 1})] AS qv
         |  FROM embeddings
         |  WHERE vec_id IS NOT NULL AND embedding IS NOT NULL AND len(embedding) = $dim),
         |rb AS MATERIALIZED (SELECT id, qv, ${dot("qv", "qv")} AS rel FROM base)""".stripMargin
    val s1 =
      s"""s1 AS MATERIALIZED (SELECT id, qv, rel, CAST(0 AS BIGINT) AS msim,
         |    $keep * rel AS mmr_q
         |  FROM rb ORDER BY $keep * rel DESC, id LIMIT 1)""".stripMargin
    val steps = (2 to k).map { i =>
      val prevs = (1 until i).map(j => s"CROSS JOIN s$j p$j").mkString(" ")
      val prevIds = (1 until i).map(j => s"p$j.id").mkString(", ")
      val dots = (1 until i).map(j => dot("b.qv", s"p$j.qv"))
      val msim = if (dots.size == 1) dots.head else s"greatest(${dots.mkString(", ")})"
      s"""s$i AS MATERIALIZED (SELECT id, qv, rel, msim,
         |    $keep * rel - $lamPerMille * msim AS mmr_q FROM (
         |    SELECT b.id, b.qv, b.rel, $msim AS msim
         |    FROM rb b $prevs WHERE b.id NOT IN ($prevIds))
         |  ORDER BY mmr_q DESC, id LIMIT 1)""".stripMargin
    }
    val out = (1 to k)
      .map(i => s"SELECT CAST($i AS BIGINT) AS rank, id, rel, msim AS msim_q, mmr_q FROM s$i")
      .mkString("\nUNION ALL ")
    (Seq("WITH " + base, s1) ++ steps).mkString(",\n") + "\n" + out
  }

  /** Generated oracle for q149: replays [[graft.ops.Bpe.fitMerges]]
    * merge for merge as a MATERIALIZED CTE chain — the q96/q129
    * unrolled-loop discipline applied to the last iterative-argmax
    * family. Per merge k: exact pair counts over vocab v(k−1), the
    * (cnt desc, l, r) argmax as a 1-row CTE, and the left-to-right
    * non-overlapping re-segmentation. The re-segmentation replays
    * Spark's array fold in STRING space (DuckDB's `list_reduce`
    * accumulator must share the element type): symbols joined by
    * chr(31) — impossible in the [a-z0-9]+ token alphabet — with
    * "last symbol == l" as `ends_with(acc, chr(31)||l)`, which is
    * exact because every symbol is sep-prefixed and sep-free.
    */
  /** The shared q149/q150 merge-learning CTE chain (vocabulary → per
    * merge k: pair counts, argmax, re-segmentation), carrying the WORD
    * through so q150 can map each word to its final segmentation.
    */
  private val BpeNMerges = 8
  private lazy val bpeChainCtes: String = {
    val sep = "chr(31)"
    def reseg(b: String): String =
      s"""list_filter(string_split(
         |      list_reduce(list_prepend('', syms), (acc, e) ->
         |        CASE WHEN e = $b.r AND ends_with(acc, $sep || $b.l)
         |             THEN acc[1:len(acc) - len($b.l)] || $b.l || $b.r
         |             ELSE acc || $sep || e END),
         |      $sep), s -> s <> '')""".stripMargin
    val stages = (1 to BpeNMerges).map { k =>
      s"""p$k AS (SELECT p.l AS l, p.r AS r, CAST(sum(freq) AS BIGINT) AS cnt
         |  FROM (SELECT freq,
         |          unnest(list_transform(range(1, len(syms)),
         |            i -> struct_pack(l := syms[i], r := syms[i+1]))) AS p
         |        FROM v${k - 1} WHERE len(syms) >= 2)
         |  GROUP BY 1, 2),
         |b$k AS MATERIALIZED (SELECT l, r FROM p$k ORDER BY cnt DESC, l, r LIMIT 1),
         |v$k AS MATERIALIZED (SELECT w, freq, ${reseg("b")} AS syms
         |  FROM v${k - 1} CROSS JOIN b$k b)""".stripMargin
    }
    s"""words AS MATERIALIZED (
       |  SELECT w, CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(words) AS w FROM ($wordsSql)) GROUP BY w),
       |v0 AS MATERIALIZED (
       |  SELECT w, freq, list_transform(range(1, len(w) + 1), i -> w[i]) AS syms
       |  FROM words),
       |${stages.mkString(",\n")}""".stripMargin
  }

  private lazy val bpeMergesSql: String = {
    val ranks = (1 to BpeNMerges)
      .map(k => s"SELECT ${k - 1} AS rank, l AS left_sym, r AS right_sym FROM b$k")
      .mkString("\nUNION ALL ")
    s"""WITH $bpeChainCtes
       |SELECT CAST(rank AS BIGINT) AS rank, left_sym, right_sym FROM ($ranks)""".stripMargin
  }

  /** Oracle for q150: the learned chain's FINAL segmentation (v8) maps
    * each word to its BPE token count; per-doc counts are one join +
    * sum, left-joined back to documents so token-less docs keep their
    * zero (Spark's `size(flatten(...))` of an empty array is 0).
    */
  private lazy val bpeTokenizeSql: String =
    s"""WITH $bpeChainCtes,
       |wl AS (SELECT w, CAST(len(syms) AS BIGINT) AS nt FROM v$BpeNMerges),
       |d AS (SELECT doc_id, unnest(words) AS w FROM ($wordsSql)),
       |cnt AS (SELECT doc_id, CAST(sum(nt) AS BIGINT) AS n_bpe
       |  FROM d JOIN wl USING (w) GROUP BY doc_id)
       |SELECT t.doc_id, coalesce(c.n_bpe, 0) AS n_bpe
       |FROM documents t LEFT JOIN cnt c ON t.doc_id = c.doc_id""".stripMargin

  /** Oracle for q173: replays [[graft.ops.Bpe.topCharBigrams]] (the
    * ranked top-256 character-bigram list — one windowed rank over the
    * char-seeded vocabulary's pair counts, same (cnt desc, l, r) ties)
    * and then applies all 256 merges in rank order through a RECURSIVE
    * CTE — state (w, syms, k), step k joins merge rank k and runs the
    * q149 string-fold re-segmentation with the JOINED merge's symbols;
    * recursion ends when no rank k exists. The unrolled-CTE discipline
    * replays a FIXED number of data-dependent argmax rounds; this
    * replays a data-INDEPENDENT rank list of any length, which is what
    * lets the oracle reach a production-scale merge count.
    */
  private lazy val bpeApply256Sql: String = {
    val sep = "chr(31)"
    val reseg =
      s"""list_filter(string_split(
         |      list_reduce(list_prepend('', s.syms), (acc, e) ->
         |        CASE WHEN e = m.r AND ends_with(acc, $sep || m.l)
         |             THEN acc[1:len(acc) - len(m.l)] || m.l || m.r
         |             ELSE acc || $sep || e END),
         |      $sep), x -> x <> '')""".stripMargin
    s"""WITH RECURSIVE
       |t AS MATERIALIZED ($wordsSql),
       |words AS MATERIALIZED (
       |  SELECT w, CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(words) AS w FROM t) GROUP BY w),
       |v0 AS MATERIALIZED (
       |  SELECT w, list_transform(range(1, len(w) + 1), i -> w[i]) AS syms
       |  FROM words),
       |mrg AS MATERIALIZED (
       |  SELECT CAST(row_number() OVER (ORDER BY cnt DESC, l, r) - 1 AS BIGINT) AS rank,
       |         l, r
       |  FROM (SELECT p.l AS l, p.r AS r, CAST(sum(freq) AS BIGINT) AS cnt
       |        FROM (SELECT freq,
       |                unnest(list_transform(range(1, len(syms)),
       |                  i -> struct_pack(l := syms[i], r := syms[i+1]))) AS p
       |              FROM (SELECT v0.syms, words.freq FROM v0 JOIN words USING (w))
       |              WHERE len(syms) >= 2)
       |        GROUP BY 1, 2)
       |  ORDER BY cnt DESC, l, r LIMIT 256),
       |seg(w, syms, k) AS (
       |  SELECT w, syms, CAST(0 AS BIGINT) AS k FROM v0
       |  UNION ALL
       |  SELECT s.w, $reseg AS syms, s.k + 1
       |  FROM seg s JOIN mrg m ON m.rank = s.k),
       |fin AS (SELECT w, syms FROM seg WHERE k = (SELECT count(*) FROM mrg)),
       |wl AS (SELECT w, CAST(len(syms) AS BIGINT) AS nt FROM fin),
       |d AS (SELECT doc_id, unnest(words) AS w FROM t),
       |cnt AS (SELECT doc_id, CAST(sum(nt) AS BIGINT) AS n_bpe
       |  FROM d JOIN wl USING (w) GROUP BY doc_id)
       |SELECT dd.doc_id, coalesce(c.n_bpe, 0) AS n_bpe
       |FROM documents dd LEFT JOIN cnt c ON dd.doc_id = c.doc_id""".stripMargin
  }

  /** Oracle for q148: replays
    * [[graft.ops.Dedup.semanticNearDupsAgainst]] — the q21 hyperplane
    * band-key replay (same seeded planes as double literals, same
    * left-associated `list_reduce` dot fold), cross-pair candidates
    * from the (band, bhash) equi-join restricted to the history/batch
    * split, and the exact-cosine verify over the raw vectors. The
    * band-key CTE is MATERIALIZED: DuckDB inlines plain CTE references,
    * and `k` is referenced twice with 16 × 64-term plane folds inside.
    */
  private lazy val semanticProbeCtes: String = {
    val bands = 4
    val bitsPerBand = 4
    val dim = 64
    val rnd = new scala.util.Random(42L)
    val planes: Seq[Seq[Double]] =
      Seq.fill(bands * bitsPerBand)(Seq.fill(dim)(rnd.nextGaussian()))
    def dotPlane(p: Seq[Double]): String = {
      val lit = p.map(dlit).mkString("[", ", ", "]")
      s"list_reduce(list_transform(range(1, ${dim + 1}), i -> CAST(embedding[i] AS DOUBLE) * ($lit)[i]), (a, b) -> a + b)"
    }
    def bandKey(b: Int): String =
      (0 until bitsPerBand).foldLeft("CAST(0 AS BIGINT)") { (acc, k) =>
        s"($acc * 2 + CASE WHEN ${dotPlane(planes(b * bitsPerBand + k))} > 0 THEN 1 ELSE 0 END)"
      }
    val bandSelects = (0 until bands)
      .map(b => s"SELECT vec_id, $b AS band, ${bandKey(b)} AS bhash FROM embeddings")
      .mkString("\nUNION ALL ")
    def dot(x: String, y: String) =
      s"list_reduce(list_transform(range(1, ${dim + 1}), i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)), (a, b) -> a + b)"
    s"""k AS MATERIALIZED ($bandSelects),
       |cand AS (SELECT DISTINCT a.vec_id AS i, b.vec_id AS j
       |  FROM k a JOIN k b ON a.band = b.band AND a.bhash = b.bhash
       |  WHERE a.vec_id % 5 <> 0 AND b.vec_id % 5 = 0),
       |v AS (SELECT i, j,
       |   ${dot("ei.embedding", "ej.embedding")} /
       |     (sqrt(${dot("ei.embedding", "ei.embedding")}) * sqrt(${dot("ej.embedding", "ej.embedding")})) AS cosine
       | FROM cand
       | JOIN embeddings ei ON ei.vec_id = cand.i
       | JOIN embeddings ej ON ej.vec_id = cand.j)""".stripMargin
  }

  private lazy val incrementalSemanticSql: String =
    s"""WITH $semanticProbeCtes
       |SELECT i, j, round(cosine, 4) AS cs4 FROM v WHERE cosine >= 0.3""".stripMargin

  /** Oracle for q170: the q148 probe chain aggregated per corpus doc —
    * count of matched eval vectors and the max rounded cosine, left-
    * joined back onto the corpus split so clean docs keep a
    * (0, NULL, false) row, mirroring
    * [[graft.ops.TextAnalysis.semanticDecontaminate]].
    */
  private lazy val semanticDecontaminateSql: String =
    s"""WITH $semanticProbeCtes,
       |f AS (SELECT i, CAST(count(*) AS BIGINT) AS n_matches,
       |    max(round(cosine, 4)) AS max_cs4
       |  FROM v WHERE cosine >= 0.3 GROUP BY i)
       |SELECT e.vec_id AS doc_id,
       |  CAST(coalesce(f.n_matches, 0) AS BIGINT) AS n_matches,
       |  f.max_cs4,
       |  (f.i IS NOT NULL) AS contaminated
       |FROM embeddings e LEFT JOIN f ON f.i = e.vec_id
       |WHERE e.vec_id % 5 <> 0""".stripMargin

  /** Shared shingle/pair CTE chain for the exact-Jaccard oracles
    * (q17/q18/q34): distinct word-3-gram shingles, per-doc counts, and
    * intersection counts per (i, j) candidate pair.
    */
  private lazy val jaccardCtes =
    s"""t AS ($wordsSql),
       |s AS (SELECT DISTINCT doc_id,
       |   unnest(list_transform(range(1, len(words)-1),
       |     i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS sh
       | FROM t WHERE len(words) >= 3),
       |c AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id),
       |p AS (SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS inter
       |  FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2)""".stripMargin

  private lazy val exactJaccardPairsSql =
    s"""WITH $jaccardCtes
       |SELECT i, j, floor(CAST(inter AS DOUBLE)/(ca.n + cb.n - inter) * 10000)/10000 AS jaccard
       |FROM p JOIN c ca ON ca.doc_id = p.i JOIN c cb ON cb.doc_id = p.j
       |WHERE CAST(inter AS DOUBLE)/(ca.n + cb.n - inter) >= 0.5""".stripMargin

  /** Oracle for q21: replays [[Dedup.embeddingNearDupPairs]]'s seeded
    * random-hyperplane banding in SQL. The planes come from the SAME
    * seeded RNG call sequence, embedded as double literals (Double
    * round-trips exactly through its shortest decimal representation),
    * and both engines fold the dot products left-to-right over doubles,
    * so bucket keys and cosines are bit-identical.
    */
  /** The LSH-candidate + exact-cosine CTE chain shared by the q21 and
    * q67 oracles: `k` (per-band bucket keys from the same seeded
    * hyperplanes the operator uses), `cand` (within-bucket pairs), `v`
    * (exact cosine per candidate, left-associated like Fns.cosine).
    */
  private lazy val embeddingPairCtes: String = {
    val bands = 4
    val bitsPerBand = 4
    val dim = 64
    val rnd = new scala.util.Random(42L)
    val planes: Seq[Seq[Double]] =
      Seq.fill(bands * bitsPerBand)(Seq.fill(dim)(rnd.nextGaussian()))
    // dlit: bare decimals in a LIST literal unify to a common DECIMAL
    // type and can drop low bits of mixed-scale coefficients — the e0
    // suffix keeps every plane element an exact DOUBLE (see dlit).
    def dotPlane(p: Seq[Double]): String = {
      val lit = p.map(dlit).mkString("[", ", ", "]")
      s"list_reduce(list_transform(range(1, ${dim + 1}), i -> CAST(embedding[i] AS DOUBLE) * ($lit)[i]), (a, b) -> a + b)"
    }
    def bandKey(b: Int): String =
      (0 until bitsPerBand).foldLeft("CAST(0 AS BIGINT)") { (acc, k) =>
        s"($acc * 2 + CASE WHEN ${dotPlane(planes(b * bitsPerBand + k))} > 0 THEN 1 ELSE 0 END)"
      }
    val bandSelects = (0 until bands)
      .map(b => s"SELECT vec_id, $b AS band, ${bandKey(b)} AS bhash FROM embeddings")
      .mkString("\nUNION ALL ")
    def dot(x: String, y: String) =
      s"list_reduce(list_transform(range(1, ${dim + 1}), i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)), (a, b) -> a + b)"
    s"""k AS ($bandSelects),
       |cand AS (SELECT DISTINCT a.vec_id AS i, b.vec_id AS j
       |  FROM k a JOIN k b ON a.band = b.band AND a.bhash = b.bhash AND a.vec_id < b.vec_id),
       |v AS (SELECT i, j,
       |   ${dot("ei.embedding", "ej.embedding")} /
       |     (sqrt(${dot("ei.embedding", "ei.embedding")}) * sqrt(${dot("ej.embedding", "ej.embedding")})) AS cosine
       | FROM cand
       | JOIN embeddings ei ON ei.vec_id = cand.i
       | JOIN embeddings ej ON ej.vec_id = cand.j)""".stripMargin
  }

  private lazy val embeddingLshSql: String =
    s"""WITH $embeddingPairCtes
       |SELECT i, j, round(cosine, 4) AS cs4 FROM v WHERE cosine >= 0.3""".stripMargin

  /** Oracle for q19: replays [[graft.ops.Dedup.simHashPairs]] —
    * md5-60-bit token hashes ([[graft.ops.Dedup.md5TokenHash]]), the
    * [[graft.plans.SimHash64]] vote fold (hash bit b lands at sim bit
    * 63-b; ties vote 0), 4x16-bit pigeonhole bands, and
    * `bit_count(xor)` hamming — entirely in DuckDB SQL, so the driver's
    * check is hash-exact end-to-end. DuckDB refuses `1::BIGINT << 63`,
    * so the top sim bit is added as the min-long literal; `>>` is
    * arithmetic in both engines and the `& 65535` mask makes band keys
    * agree regardless of sign.
    */
  /** Oracle for q70: replays [[graft.ops.Similarity.randomProject]] —
    * the same seeded Gaussian planes as double literals, the same
    * left-associated `list_reduce` dot fold from 0.0 (the pattern q21
    * proved bit-exact cross-engine), and the same precomputed
    * `1/sqrt(outDim)` scale literal.
    */
  private lazy val randomProjectionSql: String = {
    val dim = 64
    val outDim = 16
    val planes = graft.ops.Dedup.hyperplanes(dim, outDim, 4270L)
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    def dotPlane(p: Seq[Double]): String = {
      val plit = p.map(dlit).mkString("[", ", ", "]")
      s"list_reduce(list_transform(range(1, ${dim + 1}), i -> CAST(embedding[i] AS DOUBLE) * ($plit)[i]), (a, b) -> a + b)"
    }
    (0 until outDim)
      .map(j =>
        s"SELECT vec_id, $j AS dim_idx, (${dotPlane(planes(j))}) * ${dlit(scale)} AS value FROM embeddings"
      )
      .mkString("\nUNION ALL ")
  }

  /** A double literal DuckDB is guaranteed to PARSE as DOUBLE. A bare
    * decimal literal (`0.25`, `-0.3975857907408941`) parses as DECIMAL,
    * and inside a LIST literal the elements are unified to one common
    * DECIMAL type BEFORE any outer cast can intervene — which can drop
    * low digits of mixed-scale elements (observed: 9 of 64 plane
    * coefficients off by 1 ulp, q70 hash-mismatch). An exponent suffix
    * forces DOUBLE at the parser, and Scala's shortest-decimal toString
    * round-trips the exact bits.
    */
  private def dlit(d: Double): String = {
    val s = d.toString
    if (s.contains('E') || s.contains('e')) s else s + "e0"
  }

  /** Oracle for q68: replays [[graft.ops.Dedup.sourceSimilarityMatrix]]
    * — distinct (source, word-3-gram) shingles, the q19 md5 60-bit hash
    * per shingle, slot j = min(xor(hash, seed_j)) over the SAME seeded
    * literals the operator draws ([[graft.ops.Dedup.sourceSimilaritySeeds]]),
    * pair matching as an equi-join on (slot, value), zero-filled over
    * the full source-pair grid. Integer math throughout; the final
    * estimate divides by 128 = 2^7, which is IEEE-exact.
    */
  private lazy val sourceSimilaritySql: String = {
    val numSlots = 128
    val seedList = graft.ops.Dedup
      .sourceSimilaritySeeds(numSlots)
      .map(s => s"CAST($s AS BIGINT)")
      .mkString("[", ", ", "]")
    val hexToLong =
      "list_reduce(list_transform(range(1, 16), i -> " +
        "CAST(strpos('0123456789abcdef', substr(md5(sh), i, 1)) - 1 AS BIGINT)), " +
        "(a, b) -> a * 16 + b)"
    s"""WITH t AS (SELECT source,
       |  list_filter(string_split(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' '),
       |              w -> w <> '') AS words
       |  FROM documents),
       |s AS (SELECT DISTINCT source,
       |   unnest(list_transform(range(1, len(words)-1),
       |     i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS sh
       | FROM t WHERE len(words) >= 3),
       |h AS (SELECT source, $hexToLong AS h FROM s),
       |sl AS (SELECT source, g.j, min(xor(h, ($seedList)[g.j + 1])) AS v
       |  FROM h CROSS JOIN (SELECT unnest(range(0, $numSlots)) AS j) g
       |  GROUP BY source, g.j),
       |m AS (SELECT a.source AS sa, b.source AS sb, count(*) AS mt
       |  FROM sl a JOIN sl b ON a.j = b.j AND a.v = b.v AND a.source < b.source
       |  GROUP BY 1, 2),
       |src AS (SELECT DISTINCT source FROM s)
       |SELECT x.source AS source_a, y.source AS source_b,
       |  CAST(coalesce(mt, 0) AS BIGINT) AS matching_slots,
       |  CAST(coalesce(mt, 0) AS DOUBLE) / $numSlots AS est_jaccard
       |FROM src x JOIN src y ON x.source < y.source
       |LEFT JOIN m ON m.sa = x.source AND m.sb = y.source""".stripMargin
  }

  private lazy val simHashPairsSql: String = {
    val hexToLong =
      "list_reduce(list_transform(range(1, 16), i -> " +
        "CAST(strpos('0123456789abcdef', substr(md5(w), i, 1)) - 1 AS BIGINT)), " +
        "(a, b) -> a * 16 + b)"
    val simTerms = (0 until 64)
      .map { b =>
        val target = 63 - b
        val bitVal =
          if (target == 63) "CAST(-9223372036854775808 AS BIGINT)"
          else s"(CAST(1 AS BIGINT) << $target)"
        s"CASE WHEN SUM(CASE WHEN ((h >> $b) & 1) = 1 THEN 1 ELSE -1 END) > 0 " +
          s"THEN $bitVal ELSE CAST(0 AS BIGINT) END"
      }
      .mkString(" + ")
    s"""WITH w AS ($wordsSql),
       |tok AS (SELECT doc_id, unnest(words) AS w FROM w),
       |hs AS (SELECT doc_id, $hexToLong AS h FROM tok),
       |sh AS (SELECT doc_id, $simTerms AS simhash FROM hs GROUP BY doc_id),
       |s AS (SELECT d.doc_id, coalesce(sh.simhash, 0) AS simhash
       |      FROM documents d LEFT JOIN sh USING (doc_id)),
       |k AS (SELECT doc_id, simhash, b.band AS band,
       |             (simhash >> (b.band * 16)) & 65535 AS bhash
       |      FROM s, (SELECT unnest([0, 1, 2, 3]) AS band) b),
       |cand AS (SELECT DISTINCT a.doc_id AS i, b.doc_id AS j,
       |                a.simhash AS si, b.simhash AS sj
       |  FROM k a JOIN k b ON a.band = b.band AND a.bhash = b.bhash
       |  AND a.doc_id < b.doc_id)
       |SELECT i, j, CAST(bit_count(xor(si, sj)) AS BIGINT) AS hamming
       |FROM cand WHERE bit_count(xor(si, sj)) <= 16""".stripMargin
  }

  /** Oracle for q169: replays the whole perceptual-image-dedup
    * pipeline from the synthesized pixel function — the PNG
    * encode/decode the Spark side runs is LOSSLESS for 8-bit gray, so
    * the oracle computes the same bytes the raster stores:
    * [[graft.ops.Multimodal.synthGrayImages]]'s g(d, x, y), the
    * exact-integer 9×8 block means (4×4-pixel blocks, floor-div 16),
    * dHash gradient bits (bit j·8+i = cell(i,j) > cell(i+1,j); bit 63
    * via the min-long literal — DuckDB refuses `1::BIGINT << 63`),
    * then q19's banding/hamming tail verbatim. DuckDB sums BIGINT into
    * HUGEINT, so every aggregate is cast back before shifts/banding.
    */
  private lazy val imageDHashCtes: String =
    """g AS (SELECT d.doc_id AS d, t.x, t.y,
      |    (((3 + ((d.doc_id % 97) * 7) % 13) * t.x
      |      + (5 + ((d.doc_id % 97) * 11) % 17) * t.y
      |      + (1 + ((d.doc_id % 97) * 13) % 7) * t.x * t.y
      |      + (d.doc_id % 97) * 37) % 200
      |     + d.doc_id % 5
      |     + CASE WHEN (d.doc_id // 97) % 7 = 0 AND t.x < 4 AND t.y < 4
      |            THEN 40 ELSE 0 END) AS v
      |  FROM documents d,
      |       (SELECT x.range AS x, y.range AS y FROM range(0, 36) x, range(0, 32) y) t),
      |cl AS (SELECT d, x // 4 AS i, y // 4 AS j, CAST(sum(v) // 16 AS BIGINT) AS c
      |  FROM g GROUP BY 1, 2, 3),
      |bt AS (SELECT a.d, a.j * 8 + a.i AS pos
      |  FROM cl a JOIN cl b ON b.d = a.d AND b.j = a.j AND b.i = a.i + 1
      |  WHERE a.i < 8 AND a.c > b.c),
      |dh AS (SELECT d.doc_id AS doc_id,
      |    CAST(coalesce(sum(CASE WHEN pos = 63
      |        THEN CAST(-9223372036854775808 AS BIGINT)
      |        ELSE (CAST(1 AS BIGINT) << CAST(pos AS INTEGER)) END), 0) AS BIGINT) AS h
      |  FROM documents d LEFT JOIN bt ON bt.d = d.doc_id GROUP BY 1),
      |k AS (SELECT doc_id, h, b.band AS band, (h >> (b.band * 16)) & 65535 AS bhash
      |  FROM dh, (SELECT unnest([0, 1, 2, 3]) AS band) b),
      |cand AS (SELECT DISTINCT a.doc_id AS i, b.doc_id AS j, a.h AS hi, b.h AS hj
      |  FROM k a JOIN k b ON a.band = b.band AND a.bhash = b.bhash
      |    AND a.doc_id < b.doc_id)""".stripMargin

  private lazy val imageDHashPairsSql: String =
    s"""WITH $imageDHashCtes
       |SELECT i, j, CAST(bit_count(xor(hi, hj)) AS BIGINT) AS hamming
       |FROM cand WHERE bit_count(xor(hi, hj)) <= 10""".stripMargin

  /** Oracle for q171: the q169 pair chain + the q34 recursive
    * transitive-closure CTE — connected-component minima over the
    * verified hamming pairs, keepers = docs that are their own
    * component minimum (or untouched by any pair).
    */
  private lazy val imageDedupClustersSql: String =
    s"""WITH RECURSIVE $imageDHashCtes,
       |pr AS (SELECT i, j FROM cand WHERE bit_count(xor(hi, hj)) <= 10),
       |edges AS (SELECT i AS id, j AS nb FROM pr UNION SELECT j AS id, i AS nb FROM pr),
       |walk(id, lbl) AS (
       |  SELECT DISTINCT id, id AS lbl FROM edges
       |  UNION
       |  SELECT e.id, w.lbl FROM edges e JOIN walk w ON w.id = e.nb),
       |comp AS (SELECT id, min(lbl) AS cluster FROM walk GROUP BY id)
       |SELECT d.doc_id FROM documents d LEFT JOIN comp ON comp.id = d.doc_id
       |WHERE comp.cluster IS NULL OR comp.cluster = d.doc_id""".stripMargin

  /** Oracle for q174: the q169 replay at pHash-256 geometry — the same
    * integer pixel polynomial on the 68×64 wide corpus, 17×16 exact
    * block means (4×4-pixel blocks, floor-div 16), gradient bit
    * j·16+i packed into FOUR BIGINTs (bit 63 of each word via the
    * min-long literal), 8×32-bit banding with the arithmetic-shift +
    * mask key, and the 256-bit hamming as the sum of four
    * bit_count(xor) terms.
    */
  private lazy val imagePHashCtes: String = {
    val words = (0 until 4).map { k =>
      s"""CAST(coalesce(sum(CASE WHEN pos // 64 = $k THEN
         |        CASE WHEN pos % 64 = 63 THEN CAST(-9223372036854775808 AS BIGINT)
         |             ELSE (CAST(1 AS BIGINT) << CAST(pos % 64 AS INTEGER)) END
         |        END), 0) AS BIGINT) AS h$k""".stripMargin
    }.mkString(",\n    ")
    val bandSelects = (0 until 8).map { b =>
      s"SELECT doc_id, h0, h1, h2, h3, $b AS band, " +
        s"(h${b / 2} >> ${(b % 2) * 32}) & 4294967295 AS bhash FROM ph"
    }.mkString("\nUNION ALL ")
    s"""g AS (SELECT d.doc_id AS d, t.x, t.y,
       |    (((3 + ((d.doc_id % 97) * 7) % 13) * t.x
       |      + (5 + ((d.doc_id % 97) * 11) % 17) * t.y
       |      + (1 + ((d.doc_id % 97) * 13) % 7) * t.x * t.y
       |      + (d.doc_id % 97) * 37) % 200
       |     + d.doc_id % 5
       |     + CASE WHEN (d.doc_id // 97) % 7 = 0 AND t.x < 4 AND t.y < 4
       |            THEN 40 ELSE 0 END) AS v
       |  FROM documents d,
       |       (SELECT x.range AS x, y.range AS y FROM range(0, 68) x, range(0, 64) y) t),
       |cl AS (SELECT d, x // 4 AS i, y // 4 AS j, CAST(sum(v) // 16 AS BIGINT) AS c
       |  FROM g GROUP BY 1, 2, 3),
       |bt AS (SELECT a.d, a.j * 16 + a.i AS pos
       |  FROM cl a JOIN cl b ON b.d = a.d AND b.j = a.j AND b.i = a.i + 1
       |  WHERE a.i < 16 AND a.c > b.c),
       |ph AS (SELECT d.doc_id AS doc_id,
       |    $words
       |  FROM documents d LEFT JOIN bt ON bt.d = d.doc_id GROUP BY 1),
       |k AS ($bandSelects),
       |cand AS (SELECT DISTINCT a.doc_id AS i, b.doc_id AS j,
       |    a.h0 AS a0, a.h1 AS a1, a.h2 AS a2, a.h3 AS a3,
       |    b.h0 AS b0, b.h1 AS b1, b.h2 AS b2, b.h3 AS b3
       |  FROM k a JOIN k b ON a.band = b.band AND a.bhash = b.bhash
       |    AND a.doc_id < b.doc_id)""".stripMargin
  }

  private lazy val imagePHashPairsSql: String = {
    val ham = (0 until 4).map(k => s"bit_count(xor(a$k, b$k))").mkString(" + ")
    s"""WITH $imagePHashCtes
       |SELECT i, j, CAST($ham AS BIGINT) AS hamming
       |FROM cand WHERE $ham <= 24""".stripMargin
  }

  /** Oracle for q175: replays the video near-dup chain from the
    * [[graft.ops.Multimodal.synthVideoFrames]] pixel function — per
    * (video, frame) class id vcls·16 + f, the q169 block-mean/gradient
    * replay keyed by (d, f), frame hashes ordered into "fh:fh" gram
    * strings, then the q17 exact-all-pairs Jaccard shape at ≥ 0.5.
    * Exactness of the LSH side is structural: same-class clips have
    * IDENTICAL gram sets (Jaccard 1 → identical signatures → certain
    * band collision), cross-class clips share no grams.
    */
  private lazy val videoNearDupSql: String =
    """WITH vid AS (SELECT doc_id AS d, doc_id % 23 AS vcls
      |  FROM documents WHERE doc_id % 5 = 0),
      |fr AS (SELECT d, vcls, f.range AS f, vcls * 16 + f.range AS cid
      |  FROM vid, range(0, 10) f WHERE f.range < 6 + (vcls % 4)),
      |g AS (SELECT fr.d, fr.f, t.x, t.y,
      |    (((3 + (fr.cid * 7) % 13) * t.x
      |      + (5 + (fr.cid * 11) % 17) * t.y
      |      + (1 + (fr.cid * 13) % 7) * t.x * t.y
      |      + fr.cid * 37) % 200
      |     + fr.d % 5) AS v
      |  FROM fr,
      |       (SELECT x.range AS x, y.range AS y FROM range(0, 36) x, range(0, 32) y) t),
      |cl AS (SELECT d, f, x // 4 AS i, y // 4 AS j, CAST(sum(v) // 16 AS BIGINT) AS c
      |  FROM g GROUP BY 1, 2, 3, 4),
      |bt AS (SELECT a.d, a.f, a.j * 8 + a.i AS pos
      |  FROM cl a JOIN cl b ON b.d = a.d AND b.f = a.f AND b.j = a.j AND b.i = a.i + 1
      |  WHERE a.i < 8 AND a.c > b.c),
      |fh AS (SELECT fr.d, fr.f,
      |    CAST(coalesce(sum(CASE WHEN pos = 63
      |        THEN CAST(-9223372036854775808 AS BIGINT)
      |        ELSE (CAST(1 AS BIGINT) << CAST(pos AS INTEGER)) END), 0) AS BIGINT) AS h
      |  FROM fr LEFT JOIN bt ON bt.d = fr.d AND bt.f = fr.f GROUP BY 1, 2),
      |sq AS (SELECT d, list(h ORDER BY f) AS hs FROM fh GROUP BY d),
      |sh AS (SELECT DISTINCT d, unnest(list_transform(range(1, len(hs)),
      |    t -> CAST(hs[t] AS VARCHAR) || ':' || CAST(hs[t + 1] AS VARCHAR))) AS gram
      |  FROM sq WHERE len(hs) >= 2),
      |c AS (SELECT d, count(*) AS n FROM sh GROUP BY d),
      |p AS (SELECT a.d AS i, b.d AS j, count(*) AS inter
      |  FROM sh a JOIN sh b ON a.gram = b.gram AND a.d < b.d GROUP BY 1, 2)
      |SELECT i, j,
      |  floor(CAST(inter AS DOUBLE) / (ca.n + cb.n - inter) * 10000) / 10000 AS jaccard
      |FROM p JOIN c ca ON ca.d = p.i JOIN c cb ON cb.d = p.j
      |WHERE CAST(inter AS DOUBLE) / (ca.n + cb.n - inter) >= 0.5""".stripMargin

  /** Shared tokenization CTE (must mirror [[Fns.tokens]] exactly). */
  private val wordsSql =
    """SELECT doc_id,
      |  list_filter(string_split(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' '),
      |              w -> w <> '') AS words
      |FROM documents""".stripMargin

  /** Shared Lloyd's-k-means CTE chain for the q96/q104/q112 oracles,
    * parametric in the feature list ((name, SQL expr over documents)),
    * k, and iteration count: points `p(id, f...)`, init `c0` = the k
    * smallest ids, `iters` assign/update rounds, final assignment
    * `a<iters+1>` — mirroring `Cluster.kmeansAssignND` op for op (same
    * (dist, cid) tie-break with the distance summed left-to-right in
    * feature order, exact-long centroid sums, empty clusters keep
    * their previous centroid).
    */
  private def kmeansCtes(features: Seq[(String, String)], k: Int, iters: Int): String = {
    val fs = features.map(_._1)
    def assign(prev: String, out: String) = {
      val dist = fs
        .map(f => s"(CAST(p.$f AS DOUBLE)-c.c$f)*(CAST(p.$f AS DOUBLE)-c.c$f)")
        .mkString("\n             + ")
      s"""$out AS (SELECT id, ${fs.mkString(", ")}, cid FROM (
         |    SELECT p.id, ${fs.map(f => s"p.$f").mkString(", ")}, c.cid,
         |      row_number() OVER (PARTITION BY p.id
         |      ORDER BY $dist, c.cid) AS rn
         |    FROM p CROSS JOIN $prev c) WHERE rn = 1)""".stripMargin
    }
    def update(asn: String, prev: String, out: String) = {
      val coords = fs
        .map(f => s"coalesce(CAST(s.s$f AS DOUBLE)/CAST(s.n AS DOUBLE), c.c$f) AS c$f")
        .mkString(",\n    ")
      val sums = fs.map(f => s"sum($f) AS s$f").mkString(", ")
      s"""$out AS (SELECT c.cid,
         |    $coords
         |  FROM $prev c LEFT JOIN (SELECT cid, $sums,
         |      count(*) AS n FROM $asn GROUP BY 1) s ON s.cid = c.cid)""".stripMargin
    }
    val pCols = features.map { case (f, e) => s"CAST($e AS BIGINT) AS $f" }.mkString(",\n    ")
    val rounds = (1 to iters)
      .flatMap(i => Seq(assign(s"c${i - 1}", s"a$i"), update(s"a$i", s"c${i - 1}", s"c$i")))
    val finalAssign = assign(s"c$iters", s"a${iters + 1}")
    s"""p AS (SELECT doc_id AS id,
       |    $pCols
       |  FROM documents),
       |c0 AS (SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS BIGINT) AS cid,
       |    ${fs.map(f => s"CAST($f AS DOUBLE) AS c$f").mkString(", ")}
       |  FROM (SELECT * FROM p ORDER BY id LIMIT $k)),
       |${(rounds :+ finalAssign).mkString(",\n")}""".stripMargin
  }

  private val kmeans2dFeatures = Seq(
    "x" -> "n_chars",
    "y" -> "length(text) - length(replace(text, ' ', ''))"
  )

  private lazy val kmeansCtesSql: String = kmeansCtes(kmeans2dFeatures, k = 4, iters = 3)

  // ---------------------------------------------------------------
  // ANN oracles (q40/q71/q73/q75): replay the QUANTIZED training loops
  // (`Similarity.kmeansCentroids` / `pqTrain` — floor(x·2^20) inputs,
  // exact BIGINT cross-row sums, floor(sum/n) Lloyd means) as CTE
  // chains over long-format embeddings, then the probe + exact-rerank
  // + recall-gate pipeline. Every cross-row aggregate is an exact
  // integer sum (summation-order-free), every FP op a single pinned
  // IEEE expression mirrored from the Spark side, so the DuckDB result
  // hash-matches bit-for-bit — the same generated-oracle discipline as
  // the k-means (q96/q112), PCA (q129), and Markov (q123) chains.
  // ---------------------------------------------------------------

  /** Raw-vector cosine for the exact ranking stages: left fold over 64
    * products, mirroring CosineSimilarity.compute (q20's proven form).
    */
  private def annRawCos(x: String, y: String): String = {
    def dot(a: String, b: String) =
      s"list_reduce(list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (a, b) -> a + b)"
    s"${dot(x, y)} / (sqrt(${dot(x, x)}) * sqrt(${dot(y, y)}))"
  }

  /** Long-format quantized embeddings (pos 1..64, xq = floor(x·2^20))
    * plus per-vector quantized norms (constant across Lloyd rounds).
    */
  private val annBaseCtes =
    """eq AS (SELECT vec_id AS id, t.pos,
      |    CAST(floor(CAST(embedding[t.pos] AS DOUBLE) * 1048576.0) AS BIGINT) AS xq
      |  FROM embeddings, range(1, 65) t(pos)),
      |nv AS (SELECT id, sum(xq * xq) AS n2 FROM eq GROUP BY id)""".stripMargin

  /** The quantized Lloyd k-means chain (`Similarity.kmeansCentroids`):
    * c0 = first-nCells-by-id seeds, then `iters` assign/update rounds,
    * then one final scored ranking rk{iters+1} whose rn=1 rows are the
    * corpus assignment (a{iters+1}) and whose rn<=nProbe rows at
    * id<20 are the query probes. Assignment ranks round(cos, 6) DESC
    * with ties to the smallest cent id; empty cells keep their
    * previous centroid; means are floor(sum/n).
    */
  private def ivfChain(nCells: Int, iters: Int): String = {
    def assign(i: Int): String =
      s"""cn$i AS (SELECT cid, sum(cq * cq) AS n2 FROM c${i - 1} GROUP BY cid),
         |sc$i AS (SELECT e.id, c.cid, sum(e.xq * c.cq) AS dot
         |  FROM eq e JOIN c${i - 1} c ON c.pos = e.pos GROUP BY e.id, c.cid),
         |rk$i AS (SELECT s.id, s.cid, row_number() OVER (PARTITION BY s.id
         |    ORDER BY round(CAST(s.dot AS DOUBLE) / (sqrt(CAST(n.n2 AS DOUBLE)) * sqrt(CAST(cn.n2 AS DOUBLE))), 6) DESC,
         |    s.cid) AS rn
         |  FROM sc$i s JOIN nv n ON n.id = s.id JOIN cn$i cn ON cn.cid = s.cid),
         |a$i AS (SELECT id, cid FROM rk$i WHERE rn = 1)""".stripMargin
    def update(i: Int): String =
      s"""c$i AS (SELECT c.cid, c.pos,
         |    coalesce(CAST(floor(CAST(u.sx AS DOUBLE) / CAST(u.n AS DOUBLE)) AS BIGINT), c.cq) AS cq
         |  FROM c${i - 1} c LEFT JOIN (SELECT a.cid, e.pos, sum(e.xq) AS sx, count(*) AS n
         |      FROM a$i a JOIN eq e ON e.id = a.id GROUP BY a.cid, e.pos) u
         |    ON u.cid = c.cid AND u.pos = c.pos)""".stripMargin
    val c0 =
      s"""c0 AS (SELECT e.id AS cid, e.pos, e.xq AS cq FROM eq e
         |  WHERE e.id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT $nCells))""".stripMargin
    val rounds = (1 to iters).flatMap(i => Seq(assign(i), update(i)))
    (c0 +: rounds :+ assign(iters + 1)).mkString(",\n")
  }

  /** Query probes (top nProbe cells per query by the same scored-cell
    * ordering) and the probed candidate set (each corpus vector sits in
    * exactly one cell, so the join yields each (qid, cid) at most once).
    */
  private def ivfProbeCtes(iters: Int, nProbe: Int): String =
    s"""pr AS (SELECT id AS qid, cid FROM rk${iters + 1} WHERE id < 20 AND rn <= $nProbe),
       |cand AS (SELECT p.qid, a.id AS cid FROM pr p JOIN a${iters + 1} a ON a.cid = p.cid
       |  WHERE a.id <> p.qid)""".stripMargin

  /** Subspace long format for the PQ chains: sub = (pos-1)/subDim,
    * spos = (pos-1)%subDim — PqCodes' contiguous-slice layout.
    */
  private def pqSubspaceCte(src: String, from: String, subDim: Int): String =
    s"""$src AS (SELECT id, CAST((pos - 1) // $subDim AS INTEGER) AS sub,
       |    CAST((pos - 1) % $subDim AS INTEGER) AS spos, xq FROM $from)""".stripMargin

  /** The quantized PQ Lloyd chain (`Similarity.pqTrain` +
    * `pqEncode`) over `$src(id, sub, spos, xq)`: cb0 = sub-slices of
    * the first kCodes vectors by id (code = dense 0-based index in that
    * order), `iters` assign/update rounds (argmin of the exact-integer
    * L2, ties to the smallest code; floor(sum/n) means; empty codes
    * keep their centroid), then the final encode pass `pe`.
    */
  private def pqChain(src: String, kCodes: Int, iters: Int): String = {
    def assign(i: Int, out: String): String =
      s"""d$i AS (SELECT s.id, s.sub, c.code, sum((s.xq - c.cq) * (s.xq - c.cq)) AS d2
         |  FROM $src s JOIN cb${i - 1} c ON c.sub = s.sub AND c.spos = s.spos
         |  GROUP BY s.id, s.sub, c.code),
         |$out AS (SELECT id, sub, code FROM (SELECT id, sub, code,
         |    row_number() OVER (PARTITION BY id, sub ORDER BY d2, code) AS rn FROM d$i)
         |  WHERE rn = 1)""".stripMargin
    def update(i: Int): String =
      s"""cb$i AS (SELECT c.sub, c.code, c.spos,
         |    coalesce(CAST(floor(CAST(u.sx AS DOUBLE) / CAST(u.n AS DOUBLE)) AS BIGINT), c.cq) AS cq
         |  FROM cb${i - 1} c LEFT JOIN (SELECT p.sub, p.code, s.spos, sum(s.xq) AS sx, count(*) AS n
         |      FROM p$i p JOIN $src s ON s.id = p.id AND s.sub = p.sub
         |      GROUP BY p.sub, p.code, s.spos) u
         |    ON u.sub = c.sub AND u.code = c.code AND u.spos = c.spos)""".stripMargin
    val cb0 =
      s"""sd AS (SELECT id, CAST(row_number() OVER (ORDER BY id) - 1 AS INTEGER) AS code
         |  FROM (SELECT DISTINCT id FROM $src ORDER BY id LIMIT $kCodes)),
         |cb0 AS (SELECT s.sub, sd.code, s.spos, s.xq AS cq
         |  FROM sd JOIN $src s ON s.id = sd.id)""".stripMargin
    val rounds = (1 to iters).flatMap(i => Seq(assign(i, s"p$i"), update(i)))
    (cb0 +: rounds :+ assign(iters + 1, "pe")).mkString(",\n")
  }

  /** Residual-free reconstruction (`pqDecode`): codes -> codebook
    * centroids, back in (id, pos) long format, plus per-vector norms.
    */
  private def pqReconCtes(iters: Int, subDim: Int): String =
    s"""rv AS (SELECT p.id, (c.sub * $subDim + c.spos + 1) AS pos, c.cq
       |  FROM pe p JOIN cb$iters c ON c.sub = p.sub AND c.code = p.code),
       |rn2 AS (SELECT id, sum(cq * cq) AS n2 FROM rv GROUP BY id)""".stripMargin

  /** Stage 1 of the compressed search: exact-integer cosine of the
    * QUANTIZED query against the reconstructed corpus over the `cand`
    * set, shortlist k*rerank per query (round(cos,6) DESC, cid).
    */
  private def pqStage1Ctes(kTimesRerank: Int): String =
    s"""st AS (SELECT cd.qid, cd.cid, sum(q.xq * r.cq) AS dot
       |  FROM cand cd JOIN eq q ON q.id = cd.qid JOIN rv r ON r.id = cd.cid AND r.pos = q.pos
       |  GROUP BY cd.qid, cd.cid),
       |sl AS (SELECT qid, cid FROM (SELECT s.qid, s.cid,
       |    row_number() OVER (PARTITION BY s.qid
       |      ORDER BY round(CAST(s.dot AS DOUBLE) / (sqrt(CAST(n.n2 AS DOUBLE)) * sqrt(CAST(r2.n2 AS DOUBLE))), 6) DESC,
       |      s.cid) AS rn
       |  FROM st s JOIN nv n ON n.id = s.qid JOIN rn2 r2 ON r2.id = s.cid) WHERE rn <= $kTimesRerank)""".stripMargin

  /** Exact rescore of a candidate/shortlist CTE with raw-vector cosine,
    * top k per query — `bruteForceTopK`'s ranking over `$candSrc`.
    */
  private def annApxCtes(candSrc: String, k: Int): String =
    s"""aps AS (SELECT cd.qid, cd.cid, ${annRawCos("q.embedding", "c.embedding")} AS cosine
       |  FROM $candSrc cd JOIN embeddings q ON q.vec_id = cd.qid
       |  JOIN embeddings c ON c.vec_id = cd.cid),
       |apx AS (SELECT qid, cid FROM (SELECT qid, cid,
       |    row_number() OVER (PARTITION BY qid ORDER BY round(cosine, 6) DESC, cid) AS rn
       |  FROM aps) WHERE rn <= $k)""".stripMargin

  /** Exact brute-force top-5 per query (q20's CTE, projected to ids). */
  private lazy val annExactCtes =
    s"""exs AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
       |    ${annRawCos("q.embedding", "c.embedding")} AS cosine
       |  FROM embeddings q, embeddings c WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id),
       |ex AS (SELECT qid, cid FROM (SELECT qid, cid,
       |    row_number() OVER (PARTITION BY qid ORDER BY round(cosine, 6) DESC, cid) AS rn
       |  FROM exs) WHERE rn <= 5)""".stripMargin

  /** The recall-gate tail (`annRecallGate`): per-query hits, exact
    * corpus recall = CAST(Σhits AS DOUBLE) / (5.0 · CAST(n AS DOUBLE)).
    */
  private val annRecallTailSql =
    """hits AS (SELECT e.qid,
      |    CAST(sum(CASE WHEN a.cid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits
      |  FROM ex e LEFT JOIN apx a ON a.qid = e.qid AND a.cid = e.cid GROUP BY e.qid),
      |tot AS (SELECT CAST(sum(hits) AS BIGINT) AS th, count(*) AS nq FROM hits)
      |SELECT h.qid, h.hits, h.hits / 5.0 AS recall_at_5,
      |  CAST(t.th AS DOUBLE) / (5.0 * CAST(t.nq AS DOUBLE)) AS corpus_recall
      |FROM hits h CROSS JOIN tot t
      |WHERE CAST(t.th AS DOUBLE) / (5.0 * CAST(t.nq AS DOUBLE)) >= 0.9""".stripMargin

  /** DuckDB 1.0 INLINES every CTE reference (no auto-materialization),
    * so a chained training loop whose round CTEs each reference the
    * previous round 2-3 times re-expands the whole prefix per reference
    * — exponential plan blowup that exhausts file handles re-opening
    * the parquet scan. Every CTE in the ANN oracles is therefore
    * MATERIALIZED (each " AS (" here opens a CTE definition — window
    * frames use OVER, so the rewrite is unambiguous).
    */
  private def annMaterialized(sql: String): String =
    sql.replace(" AS (", " AS MATERIALIZED (")

  private lazy val annOracleSql: Map[String, String] = Map(
    // IVF: train 16 cells (3 Lloyd rounds), probe 8, exact-rank probed
    "q40_ivf_recall" -> annMaterialized(
      s"""WITH $annBaseCtes,
         |${ivfChain(16, 3)},
         |${ivfProbeCtes(3, 8)},
         |${annApxCtes("cand", 5)},
         |$annExactCtes,
         |$annRecallTailSql""".stripMargin),
    // flat PQ: m=8 codebooks of 256 (3 rounds), compressed scan over
    // the whole corpus, shortlist 5*16, exact rerank
    "q71_pq_recall" -> annMaterialized(
      s"""WITH $annBaseCtes,
         |${pqSubspaceCte("sq", "eq", 8)},
         |${pqChain("sq", 256, 3)},
         |${pqReconCtes(3, 8)},
         |cand AS (SELECT q.vec_id AS qid, c.vec_id AS cid FROM embeddings q, embeddings c
         |  WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id),
         |${pqStage1Ctes(80)},
         |${annApxCtes("sl", 5)},
         |$annExactCtes,
         |$annRecallTailSql""".stripMargin),
    // IVF-PQ: both quantizers, compressed scan over probed cells only
    "q73_ivfpq_recall" -> annMaterialized(
      s"""WITH $annBaseCtes,
         |${ivfChain(16, 3)},
         |${pqSubspaceCte("sq", "eq", 8)},
         |${pqChain("sq", 256, 3)},
         |${pqReconCtes(3, 8)},
         |${ivfProbeCtes(3, 8)},
         |${pqStage1Ctes(80)},
         |${annApxCtes("sl", 5)},
         |$annExactCtes,
         |$annRecallTailSql""".stripMargin),
    // residual IVF-PQ: codebooks train on and codes quantize the exact
    // integer residual v_q - centroid(cell); decode adds the cell back
    "q75_ivfpq_residual_recall" -> annMaterialized(
      s"""WITH $annBaseCtes,
         |${ivfChain(16, 3)},
         |req AS (SELECT e.id, e.pos, e.xq - c.cq AS xq
         |  FROM eq e JOIN a4 a ON a.id = e.id JOIN c3 c ON c.cid = a.cid AND c.pos = e.pos),
         |${pqSubspaceCte("sq", "req", 8)},
         |${pqChain("sq", 256, 3)},
         |rv AS (SELECT p.id, (cb.sub * 8 + cb.spos + 1) AS pos, ct.cq + cb.cq AS cq
         |  FROM pe p JOIN cb3 cb ON cb.sub = p.sub AND cb.code = p.code
         |  JOIN a4 a ON a.id = p.id
         |  JOIN c3 ct ON ct.cid = a.cid AND ct.pos = (cb.sub * 8 + cb.spos + 1)),
         |rn2 AS (SELECT id, sum(cq * cq) AS n2 FROM rv GROUP BY id),
         |${ivfProbeCtes(3, 8)},
         |${pqStage1Ctes(80)},
         |${annApxCtes("sl", 5)},
         |$annExactCtes,
         |$annRecallTailSql""".stripMargin)
  )

  /** The q151 PSI body over the fixed calendar split — shared with the
    * composed q172 drift-monitor oracle. */
  private lazy val psiDriftSql: String =
    s"""WITH r AS (SELECT event_type AS k, count(*) AS n FROM events
         |  WHERE ts > TIMESTAMP '2023-12-01 00:00:00' AND ts <= TIMESTAMP '2024-01-15 00:00:00'
         |  GROUP BY 1),
         |c AS (SELECT event_type AS k, count(*) AS n FROM events
         |  WHERE ts > TIMESTAMP '2024-01-15 00:00:00' AND ts <= TIMESTAMP '2024-03-01 00:00:00'
         |  GROUP BY 1),
         |j AS (SELECT coalesce(r.k, c.k) AS k,
         |    CAST(coalesce(r.n, 0) AS BIGINT) AS r, CAST(coalesce(c.n, 0) AS BIGINT) AS c
         |  FROM r FULL OUTER JOIN c ON r.k = c.k),
         |tot AS (SELECT CAST(sum(r) AS BIGINT) AS bigR, CAST(sum(c) AS BIGINT) AS bigC,
         |    CAST(count(*) AS BIGINT) AS k FROM j),
         |vals AS (SELECT DISTINCT v FROM (
         |  SELECT c + 1 AS v FROM j UNION ALL SELECT r + 1 FROM j
         |  UNION ALL SELECT bigC + k FROM tot UNION ALL SELECT bigR + k FROM tot)),
         |$glogChainSql,
         |terms AS (SELECT
         |    CAST(round(((CAST(j.c + 1 AS DOUBLE) / CAST(tot.bigC + tot.k AS DOUBLE))
         |              - (CAST(j.r + 1 AS DOUBLE) / CAST(tot.bigR + tot.k AS DOUBLE)))
         |      * (gc.glog - gbc.glog - gr.glog + gbr.glog) * 1000000000.0) AS BIGINT) AS tq
         |  FROM j CROSS JOIN tot
         |  JOIN gl gc ON gc.v = j.c + 1
         |  JOIN gl gr ON gr.v = j.r + 1
         |  JOIN gl gbc ON gbc.v = tot.bigC + tot.k
         |  JOIN gl gbr ON gbr.v = tot.bigR + tot.k)
         |SELECT tot.k AS n_keys, tot.bigR AS ref_n, tot.bigC AS cur_n,
         |  CAST((SELECT sum(tq) FROM terms) AS DOUBLE) / 1000000000.0 AS psi
         |FROM tot""".stripMargin

  /** The q165 JSD body over the same split (shared with q172). */
  private lazy val jsdDriftSql: String =
    s"""WITH r AS (SELECT event_type AS k, count(*) AS n FROM events
         |  WHERE ts > TIMESTAMP '2023-12-01 00:00:00' AND ts <= TIMESTAMP '2024-01-15 00:00:00'
         |  GROUP BY 1),
         |c AS (SELECT event_type AS k, count(*) AS n FROM events
         |  WHERE ts > TIMESTAMP '2024-01-15 00:00:00' AND ts <= TIMESTAMP '2024-03-01 00:00:00'
         |  GROUP BY 1),
         |j AS (SELECT CAST(coalesce(r.n, 0) AS BIGINT) AS r, CAST(coalesce(c.n, 0) AS BIGINT) AS c
         |  FROM r FULL OUTER JOIN c ON r.k = c.k),
         |tot AS (SELECT CAST(sum(r) AS BIGINT) AS bigR, CAST(sum(c) AS BIGINT) AS bigC,
         |    CAST(count(*) AS BIGINT) AS k FROM j),
         |vals AS (SELECT DISTINCT v FROM (
         |  SELECT j.c * tot.bigR AS v FROM j CROSS JOIN tot WHERE j.c > 0
         |  UNION ALL SELECT j.r * tot.bigC FROM j CROSS JOIN tot WHERE j.r > 0
         |  UNION ALL SELECT j.c * tot.bigR + j.r * tot.bigC FROM j CROSS JOIN tot)),
         |$glogChainSql,
         |terms AS (SELECT CAST(round((
         |    CASE WHEN j.c > 0 THEN (CAST(j.c AS DOUBLE) / CAST(tot.bigC AS DOUBLE)) *
         |      (0.6931471805599453 + gp.glog - gd.glog) ELSE 0.0 END
         |  + CASE WHEN j.r > 0 THEN (CAST(j.r AS DOUBLE) / CAST(tot.bigR AS DOUBLE)) *
         |      (0.6931471805599453 + gq.glog - gd.glog) ELSE 0.0 END
         |  ) * 1000000000.0) AS BIGINT) AS tq
         |  FROM j CROSS JOIN tot
         |  LEFT JOIN gl gp ON gp.v = j.c * tot.bigR
         |  LEFT JOIN gl gq ON gq.v = j.r * tot.bigC
         |  LEFT JOIN gl gd ON gd.v = j.c * tot.bigR + j.r * tot.bigC)
         |SELECT tot.k AS n_keys, tot.bigR AS ref_n, tot.bigC AS cur_n,
         |  CASE WHEN tot.bigR > 0 AND tot.bigC > 0 THEN
         |    CAST((SELECT sum(tq) FROM terms) AS DOUBLE) / 2000000000.0 END AS jsd
         |FROM tot""".stripMargin

  /** Oracle for q172: the two drift statistics over the SAME windows,
    * composed exactly like [[graft.streaming.DriftMonitor.driftFromCounts]]
    * — each body is a full WITH...SELECT nested as a CTE (DuckDB scopes
    * inner CTE names per body), one row out with the alert flags.
    */
  private lazy val driftMonitorSql: String =
    s"""WITH p AS ($psiDriftSql),
       |jj AS ($jsdDriftSql)
       |SELECT p.n_keys, p.ref_n, p.cur_n, p.psi, jj.jsd,
       |  p.psi >= 0.2 AS psi_alert, jj.jsd >= 0.1 AS jsd_alert
       |FROM p, jj""".stripMargin

  /** The deterministic-ln CTE chain (mirrors `Dsir.glog` op for op):
    * expects a `vals(v)` CTE of positive integers; yields `gl(v, glog)`.
    * ONE copy shared by every glog oracle (q79/q83/q87/q88/q93/q99/q100).
    */
  private val glogChainSql =
    """gl0 AS (SELECT v, CAST(length(bin(CAST(v AS BIGINT))) - 1 AS DOUBLE) AS e FROM vals),
      |gl1 AS (SELECT v, e, sqrt(sqrt(CAST(v AS DOUBLE) / (2.0 ** e))) AS r FROM gl0),
      |gl2 AS (SELECT v, e, (r - 1.0) / (r + 1.0) AS z,
      |               ((r - 1.0) / (r + 1.0)) * ((r - 1.0) / (r + 1.0)) AS w FROM gl1),
      |gl AS (SELECT v, e * 0.6931471805599453 + 8.0 * (z * (1.0 + w * (1.0/3.0 +
      |    w * (1.0/5.0 + w * (1.0/7.0 + w * (1.0/9.0 + w * (1.0/11.0 +
      |    w * (1.0/13.0 + w * (1.0/15.0))))))))) AS glog FROM gl2)""".stripMargin

  private def snapSql(lo: String, hi: String): String =
    s"""SELECT user_id, value, event_type AS etype, props FROM (
       |  SELECT user_id, value, event_type, props,
       |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
       |  FROM events
       |  WHERE ts > TIMESTAMP '$lo' AND ts <= TIMESTAMP '$hi') WHERE rn = 1""".stripMargin

  private val gapfillSql =
    """SELECT strftime(cal.d, '%Y-%m-%d') AS date, coalesce(cnt.value, 0.0) AS value
      |FROM (SELECT unnest(generate_series(DATE '2023-12-28', DATE '2024-02-03', INTERVAL 1 DAY))::DATE AS d) cal
      |LEFT JOIN (SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS DOUBLE) AS value
      |           FROM events WHERE event_type = 'error' GROUP BY 1) cnt USING (d)""".stripMargin
}
