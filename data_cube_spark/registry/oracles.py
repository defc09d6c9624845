"""DuckDB oracle SQL for every registry query (the driver
correctness contract): same keys as catalog.QUERIES, each SQL
producing identical column names/values on the same parquet
tables.
"""

from __future__ import annotations

from data_cube_spark.registry._shared import *  # noqa: F401,F403


def _pii_sql() -> str:
    """Oracle twin of q_pii_redaction, generated from the same
    PII_PATTERNS cascade (DuckDB regexp_replace needs the explicit 'g'
    flag; Spark's replaces all occurrences by default)."""
    from data_cube_spark.operators.pii import PII_PATTERNS

    sql = """
      WITH c0 AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com ip 10.0.'
                    || CAST(doc_id % 256 AS VARCHAR)
                    || '.7 ssn 123-45-6789 call +1 555-123-4567' AS t
        FROM documents)"""
    prev, acc = "c0", []
    for i, (kind, (pat, token)) in enumerate(PII_PATTERNS.items(), 1):
        carried = "".join(f"{c}, " for c in acc)
        sql += f""",
      c{i} AS (
        SELECT doc_id, {carried}
               len(regexp_extract_all(t, '{pat}')) AS n_{kind},
               regexp_replace(t, '{pat}', '{token}', 'g') AS t
        FROM {prev})"""
        prev = f"c{i}"
        acc.append(f"n_{kind}")
    kinds = ", ".join(f"n_{k}" for k in PII_PATTERNS)
    return sql + f"""
      SELECT doc_id, {kinds}, length(t) AS redacted_len,
             md5(t) AS redacted_md5
      FROM {prev}"""


_SCD2_CHG_SQL = """
      SELECT c_custkey, TIMESTAMP '1994-01-01' AS eff_ts,
             c_mktsegment AS segment FROM customer
      UNION ALL
      SELECT c_custkey, TIMESTAMP '1998-01-01',
             c_mktsegment || '-R2' FROM customer WHERE c_custkey % 2 = 0
      UNION ALL
      SELECT c_custkey, TIMESTAMP '2000-01-01',
             c_mktsegment || '-R3' FROM customer WHERE c_custkey % 3 = 0
"""


_SCD2_DIM_SQL = f"""
      SELECT c_custkey, segment, eff_ts AS valid_from,
             LEAD(eff_ts) OVER (PARTITION BY c_custkey ORDER BY eff_ts)
               AS valid_to
      FROM ({_SCD2_CHG_SQL})
"""


_SCD2_HISTORY_SQL = f"""
      SELECT c_custkey, segment, valid_from, valid_to,
             (valid_to IS NULL) AS is_current
      FROM ({_SCD2_DIM_SQL})
"""


def _langid_sql() -> str:
    counts = _lang_counts_sql()
    best = "greatest(" + ", ".join(f"c_{l}" for l in counts) + ")"
    case = "CASE WHEN best = 0 THEN 'und' " + " ".join(
        f"WHEN c_{l} = best THEN '{l}'" for l in counts
    ) + " END"
    inner = ", ".join(f"{expr} AS c_{l}" for l, expr in counts.items())
    return f"""
      WITH c AS (SELECT doc_id, {inner} FROM documents),
      b AS (SELECT doc_id, c_en, c_de, c_fr, c_es, {best} AS best FROM c)
      SELECT doc_id, {case} AS lang_pred, CAST(best AS BIGINT) AS stopword_hits FROM b
    """


def _quality_sql() -> str:
    en = LANG_STOPWORDS["en"]
    stop_pat = r"(?i)\b(" + "|".join(en) + r")\b"
    return f"""
      WITH f AS (
        SELECT doc_id,
          CAST(length(text) AS BIGINT) AS n_chars_calc,
          CAST(len(string_split_regex(TRIM(text), '\\s+')) AS BIGINT) AS n_tokens,
          CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS BIGINT) AS n_punct,
          CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS BIGINT) AS n_upper,
          CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digit,
          CAST(len(regexp_extract_all(text, '{stop_pat}')) AS BIGINT) AS n_stop,
          CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS BIGINT) AS nonspace
        FROM documents)
      SELECT doc_id, n_chars_calc, n_tokens,
             CAST(n_punct AS DOUBLE) / n_chars_calc AS punct_ratio,
             CAST(n_upper AS DOUBLE) / n_chars_calc AS upper_ratio,
             CAST(n_digit AS DOUBLE) / n_chars_calc AS digit_ratio,
             CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
             CAST(nonspace AS DOUBLE) / n_tokens AS mean_token_len
      FROM f
    """


def _ngram_jaccard_sql(threshold: float = 0.05, max_df: int | None = None) -> str:
    # mirror of the operator's max_df stop-shingle cap: drop high-document-
    # frequency shingles BEFORE sizes/intersections, exactly like
    # dedup.ngram_jaccard_pairs does
    cap = f"""
      freq AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING COUNT(*) <= {max_df}),
      sh AS (SELECT sh0.* FROM sh0 JOIN freq USING (shingle)),
    """ if max_df is not None else """
      sh AS (SELECT * FROM sh0),
    """
    return f"""
      WITH toks AS (
        SELECT doc_id, lang, source,
               string_split({_NORM_SQL}, ' ') AS t
        FROM documents),
      sh0 AS (
        SELECT DISTINCT doc_id, lang, source,
               array_to_string(t[i:i+2], ' ') AS shingle
        FROM (SELECT doc_id, lang, source, t,
                     unnest(generate_series(1, len(t) - 2)) AS i
              FROM toks WHERE len(t) >= 3)),
      {cap}
      sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
      inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n
        FROM sh a JOIN sh b
          ON a.shingle = b.shingle AND a.lang = b.lang AND a.source = b.source
         AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT id_a, id_b,
             CAST(i.n AS DOUBLE) / (sa.n + sb.n - i.n) AS jaccard
      FROM inter i JOIN sz sa ON sa.doc_id = i.id_a JOIN sz sb ON sb.doc_id = i.id_b
      WHERE CAST(i.n AS DOUBLE) / (sa.n + sb.n - i.n) >= {threshold}
    """


def _ngram_exact_sql(threshold: float) -> str:
    # uncapped, unblocked exact 3-gram set-Jaccard pairs — the ground
    # truth the prefix-filtered join must reproduce verbatim
    sql = _ngram_truth_sql(threshold).replace(
        ",\n             TRUE AS lsh_found", "")
    assert "lsh_found" not in sql, "truth SQL drifted; fix the strip"
    return sql


def _ngram_truth_sql(threshold: float) -> str:
    # all-pairs exact 3-gram Jaccard truth (NO blocking, NO frequency cap
    # — exactly the similarity MinHash estimates) for the LSH recall
    # invariant: every truth pair must have been found by the banded
    # candidate generator, so the oracle emits TRUE per pair
    return f"""
      WITH toks AS (
        SELECT doc_id, string_split({_NORM_SQL}, ' ') AS t FROM documents),
      sh AS (
        SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
              FROM toks WHERE len(t) >= 3)),
      sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
      inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n
        FROM sh a JOIN sh b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT id_a, id_b,
             CAST(i.n AS DOUBLE) / (sa.n + sb.n - i.n) AS jaccard,
             TRUE AS lsh_found
      FROM inter i JOIN sz sa ON sa.doc_id = i.id_a
                   JOIN sz sb ON sb.doc_id = i.id_b
      WHERE CAST(i.n AS DOUBLE) / (sa.n + sb.n - i.n) >= {threshold}
    """


def _incremental_truth_sql(threshold: float) -> str:
    # batch (odd) x corpus (even) exact-Jaccard truth for the incremental
    # MinHash recall invariant — no frequency cap, mirroring the
    # uncapped truth side of q_incremental_minhash_recall
    return f"""
      WITH toks AS (
        SELECT doc_id, string_split({_NORM_SQL}, ' ') AS t FROM documents),
      sh AS (
        SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
              FROM toks WHERE len(t) >= 3)),
      sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
      inter AS (
        SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id, COUNT(*) AS n
        FROM sh b JOIN sh c ON b.shingle = c.shingle
        WHERE b.doc_id % 2 = 1 AND c.doc_id % 2 = 0
        GROUP BY 1, 2)
      SELECT batch_id, corpus_id,
             CAST(i.n AS DOUBLE) / (sa.n + sb.n - i.n) AS jaccard,
             TRUE AS lsh_found
      FROM inter i JOIN sz sa ON sa.doc_id = i.batch_id
                   JOIN sz sb ON sb.doc_id = i.corpus_id
      WHERE CAST(i.n AS DOUBLE) / (sa.n + sb.n - i.n) >= {threshold}
    """


def _incremental_exact_sql(threshold: float) -> str:
    # uncapped batch x corpus exact-Jaccard pairs — the ground truth the
    # R x S prefix-filtered join must reproduce verbatim
    sql = _incremental_truth_sql(threshold).replace(
        ",\n             TRUE AS lsh_found", "")
    assert "lsh_found" not in sql, "truth SQL drifted; fix the strip"
    return sql


def _incremental_keep_sql(threshold: float, max_df: int) -> str:
    # mirror of operators/dedup.py::incremental_dedup_keep — odd doc_ids
    # are the batch, even the corpus; document frequency for the stop-
    # shingle cap is computed over BOTH sides (= all documents), sizes
    # after the cap, exactly like the operator
    return f"""
      WITH toks AS (
        SELECT doc_id, string_split({_NORM_SQL}, ' ') AS t FROM documents),
      sh0 AS (
        SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
              FROM toks WHERE len(t) >= 3)),
      freq AS (SELECT shingle FROM sh0 GROUP BY shingle
               HAVING COUNT(*) <= {max_df}),
      sh AS (SELECT sh0.* FROM sh0 JOIN freq USING (shingle)),
      sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
      inter AS (
        SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id, COUNT(*) AS n
        FROM sh b JOIN sh c ON b.shingle = c.shingle
        WHERE b.doc_id % 2 = 1 AND c.doc_id % 2 = 0
        GROUP BY 1, 2),
      dup AS (
        SELECT DISTINCT batch_id FROM inter i
        JOIN sz sa ON sa.doc_id = i.batch_id
        JOIN sz sb ON sb.doc_id = i.corpus_id
        WHERE CAST(i.n AS DOUBLE) / (sa.n + sb.n - i.n) >= {threshold})
      SELECT doc_id FROM documents
      WHERE doc_id % 2 = 1
        AND doc_id NOT IN (SELECT batch_id FROM dup)
    """


def _capped_edges_cte(threshold: float) -> str:
    """CTE chain ending in the DEGREE-CAPPED embedding near-pair edge set
    — the oracle twin of ``near_pairs(..., max_degree=...)`` +
    ``cap_pair_degree``: all-pairs exact cosine edges at ``threshold``,
    symmetrized, each node's top ``SEMANTIC_DEDUP_MAX_DEGREE`` by
    (cosine desc, neighbor asc), surviving edges re-normalized to
    id_a < id_b. Emitted WITHOUT a leading WITH so callers can prepend
    ``WITH RECURSIVE``."""
    from data_cube_spark.registry.similarity_mm import (
        SEMANTIC_DEDUP_MAX_DEGREE,
    )

    return f"""v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings),
      n AS (
        SELECT vec_id, vec,
               sqrt(list_sum(list_transform(vec, x -> x * x))) AS nrm
        FROM v),
      edges0 AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               list_dot_product(a.vec, b.vec) / (a.nrm * b.nrm) AS s
        FROM n a JOIN n b ON a.vec_id < b.vec_id
        WHERE list_dot_product(a.vec, b.vec) / (a.nrm * b.nrm)
                >= {threshold}),
      half AS (
        SELECT id_a AS node, id_b AS other, s FROM edges0
        UNION ALL SELECT id_b, id_a, s FROM edges0),
      keep AS (
        SELECT node, other FROM (
          SELECT node, other,
                 row_number() OVER (PARTITION BY node
                                    ORDER BY s DESC, other ASC) AS r
          FROM half)
        WHERE r <= {SEMANTIC_DEDUP_MAX_DEGREE}),
      edges AS (
        SELECT DISTINCT LEAST(node, other) AS id_a,
                        GREATEST(node, other) AS id_b
        FROM keep),"""


def _pipeline_pretraining_sql() -> str:
    # composition of the verified fragment oracles: dedup (min-id per
    # md5), decontamination (3-gram overlap vs the %97 eval set), langid
    # + quality (as _pipeline_sql), 90% train split, concat-and-chunk
    # packing (512 tokens, 8 shards)
    counts = _lang_counts_sql()
    best = "greatest(" + ", ".join(f"c_{l}" for l in counts) + ")"
    case = "CASE WHEN best = 0 THEN 'und' " + " ".join(
        f"WHEN c_{l} = best THEN '{l}'" for l in counts
    ) + " END"
    inner = ", ".join(f"{expr} AS c_{l}" for l, expr in counts.items())
    en = LANG_STOPWORDS["en"]
    stop_pat = r"(?i)\b(" + "|".join(en) + r")\b"
    return f"""
      WITH keep AS (
        SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
      d0 AS (SELECT doc.* FROM documents doc JOIN keep USING (doc_id)
             WHERE doc_id % 97 <> 0),
      toksA AS (
        SELECT doc_id, string_split({_NORM_SQL}, ' ') AS t FROM documents),
      shA AS (
        SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
              FROM toksA WHERE len(t) >= 3)),
      bench AS (SELECT DISTINCT shingle FROM shA WHERE doc_id % 97 = 0),
      szh AS (SELECT s.doc_id, COUNT(*) AS n_shingles
              FROM shA s JOIN d0 USING (doc_id) GROUP BY 1),
      hits AS (SELECT s.doc_id, COUNT(*) AS n_overlap
               FROM shA s JOIN d0 USING (doc_id) JOIN bench USING (shingle)
               GROUP BY 1),
      dirty AS (
        SELECT szh.doc_id FROM szh JOIN hits USING (doc_id)
        WHERE CAST(n_overlap AS DOUBLE) / n_shingles >= 0.5),
      d AS (SELECT * FROM d0
            WHERE doc_id NOT IN (SELECT doc_id FROM dirty)),
      lang AS (
        SELECT doc_id, {case.replace('best', '(' + best + ')')} AS lang_pred
        FROM (SELECT doc_id, {inner} FROM d)),
      feat AS (
        SELECT doc_id,
          CAST(len(string_split_regex(TRIM(text), '\\s+')) AS BIGINT) AS n_tokens,
          CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE)
            / length(text) AS punct_ratio,
          CAST(len(regexp_extract_all(text, '{stop_pat}')) AS DOUBLE)
            / len(string_split_regex(TRIM(text), '\\s+')) AS stopword_ratio,
          CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
            / len(string_split_regex(TRIM(text), '\\s+')) AS mean_token_len
        FROM d),
      scored AS (
        SELECT doc_id, n_tokens,
               least(stopword_ratio * 4, 1.0) * 0.5
               + CASE WHEN mean_token_len >= 3 AND mean_token_len <= 10
                      THEN 0.3 ELSE 0.0 END
               + CASE WHEN punct_ratio <= 0.1 THEN 0.2 ELSE 0.0 END AS quality
        FROM feat),
      good AS (
        SELECT s.doc_id, s.n_tokens
        FROM scored s JOIN lang l USING (doc_id)
        WHERE l.lang_pred = 'en' AND s.quality >= 0.5),
      train AS (
        SELECT * FROM good
        WHERE md5('split' || CAST(doc_id AS VARCHAR))
              < '{_hex_threshold(0.9)}'),
      sharded AS (
        SELECT doc_id, n_tokens,
               CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 8 AS INT) AS shard
        FROM train),
      c AS (
        SELECT doc_id, shard, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
                 - n_tokens AS "offset"
        FROM sharded)
      SELECT doc_id, shard, CAST("offset" // 512 AS BIGINT) AS seq,
             CAST("offset" AS BIGINT) AS "offset", n_tokens
      FROM c
    """


def _pipeline_sql() -> str:
    counts = _lang_counts_sql()
    best = "greatest(" + ", ".join(f"c_{l}" for l in counts) + ")"
    case = "CASE WHEN best = 0 THEN 'und' " + " ".join(
        f"WHEN c_{l} = best THEN '{l}'" for l in counts
    ) + " END"
    inner = ", ".join(f"{expr} AS c_{l}" for l, expr in counts.items())
    en = LANG_STOPWORDS["en"]
    stop_pat = r"(?i)\b(" + "|".join(en) + r")\b"
    return f"""
      WITH keep AS (
        SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
      d AS (SELECT doc.* FROM documents doc JOIN keep USING (doc_id)),
      lang AS (
        SELECT doc_id, {case.replace('best', '(' + best + ')')} AS lang_pred
        FROM (SELECT doc_id, {inner} FROM d)),
      feat AS (
        SELECT doc_id,
          CAST(len(string_split_regex(TRIM(text), '\\s+')) AS BIGINT) AS n_tokens,
          CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE)
            / length(text) AS punct_ratio,
          CAST(len(regexp_extract_all(text, '{stop_pat}')) AS DOUBLE)
            / len(string_split_regex(TRIM(text), '\\s+')) AS stopword_ratio,
          CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
            / len(string_split_regex(TRIM(text), '\\s+')) AS mean_token_len
        FROM d),
      scored AS (
        SELECT doc_id, n_tokens,
               least(stopword_ratio * 4, 1.0) * 0.5
               + CASE WHEN mean_token_len >= 3 AND mean_token_len <= 10
                      THEN 0.3 ELSE 0.0 END
               + CASE WHEN punct_ratio <= 0.1 THEN 0.2 ELSE 0.0 END AS quality
        FROM feat)
      SELECT s.doc_id, s.n_tokens, l.lang_pred,
             CAST(s.quality AS DOUBLE) AS quality
      FROM scored s JOIN lang l USING (doc_id)
      WHERE l.lang_pred = 'en' AND s.quality >= 0.5
    """


ORACLE: dict[str, str] = {
    "flagship_revenue_by_region": f"""
      SELECT r_name, {_MEASURE_SQL}
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY 1
    """,
    "dice_key_pushdown": f"""
      SELECT l_suppkey AS s_suppkey, {_MEASURE_SQL}
      FROM lineitem WHERE l_suppkey IN (0,1,2,3,4) GROUP BY 1
    """,
    "slice_scalar_drop": f"""
      SELECT l_orderkey AS o_orderkey, l_suppkey AS s_suppkey, {_MEASURE_SQL}
      FROM lineitem WHERE l_partkey = 0 GROUP BY 1, 2
    """,
    "attr_dice_snowflake": f"""
      SELECT l_suppkey AS s_suppkey, {_MEASURE_SQL}
      FROM lineitem
      WHERE l_suppkey IN (
        SELECT s_suppkey FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name IN ('EUROPE','ASIA'))
      GROUP BY 1
    """,
    "attr_dice_or": f"""
      SELECT l_suppkey AS s_suppkey, {_MEASURE_SQL}
      FROM lineitem
      WHERE l_suppkey IN (
        SELECT s_suppkey FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE' OR n_name = 'JAPAN')
      GROUP BY 1
    """,
    "collapse_prefilter": f"""
      SELECT l_suppkey AS s_suppkey, {_MEASURE_SQL}
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '1-URGENT' GROUP BY 1
    """,
    "aggregate_two_dims": f"""
      SELECT r_name, p_brand, {_MEASURE_SQL}
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      JOIN part ON l_partkey = p_partkey
      GROUP BY 1, 2
    """,
    "customer_region_revenue": f"""
      SELECT r_name AS cr_name, {_MEASURE_SQL}
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY 1
    """,
    "aggregate_from_summary": f"""
      SELECT CAST(year(o_orderdate) AS INT) AS d_year, {_MEASURE_SQL}
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1
    """,
    "drill_across_month": f"""
      WITH a AS (
        SELECT year(o_orderdate) AS d_year, month(o_orderdate) AS d_month,
               CAST({SQL_REV} AS DOUBLE) AS revenue, COUNT(*) AS n_lines
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2),
      b AS (
        SELECT year(o_orderdate) AS d_year, month(o_orderdate) AS d_month,
               COUNT(o_orderkey) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_price
        FROM orders GROUP BY 1, 2)
      SELECT CAST(d_year AS INT) AS d_year, CAST(d_month AS INT) AS d_month,
             revenue, n_lines, n_orders, total_price
      FROM a FULL OUTER JOIN b USING (d_year, d_month)
    """,
    "calendar_month_revenue": f"""
      SELECT CAST(year(o_orderdate) AS INT) AS d_year,
             CAST(month(o_orderdate) AS INT) AS d_month, {_MEASURE_SQL}
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2
    """,
    "apply_margin_max": f"""
      WITH grain AS ({SQL_GRAIN})
      SELECT s_suppkey, CAST(MAX(sum_qty) AS DOUBLE) AS max_qty,
             CAST(MAX(revenue) AS DOUBLE) AS max_revenue
      FROM grain GROUP BY 1
    """,
    "grand_total": f"SELECT {_MEASURE_SQL} FROM lineitem",
    "rollup_geo": f"""
      SELECT r_name, n_name, CAST({SQL_REV} AS DOUBLE) AS revenue,
             COUNT(*) AS n_lines,
             CAST(GROUPING(r_name) + GROUPING(n_name) AS INT) AS grouping_level
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP (r_name, n_name)
    """,
    "rollup_level_select": f"""
      SELECT r_name, n_name, CAST({SQL_QTY} AS DOUBLE) AS sum_qty,
             CAST(GROUPING(r_name) + GROUPING(n_name) AS INT) AS grouping_level
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP (r_name, n_name)
      HAVING GROUPING(r_name) + GROUPING(n_name) IN (1, 2)
    """,
    "rollup_hierarchy_q": f"""
      SELECT n_regionkey, n_nationkey, s_suppkey,
             CAST({SQL_REV} AS DOUBLE) AS revenue, COUNT(*) AS n_lines,
             CAST(GROUPING(n_regionkey) + GROUPING(n_nationkey)
                  + GROUPING(s_suppkey) AS INT) AS grouping_level
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      GROUP BY ROLLUP (n_regionkey, n_nationkey, s_suppkey)
    """,
    "cube_grouping_sets": f"""
      SELECT l_returnflag, l_linestatus, CAST({SQL_QTY} AS DOUBLE) AS sum_qty,
             COUNT(*) AS n_lines,
             CAST(GROUPING(l_returnflag) + GROUPING(l_linestatus) AS INT) AS grouping_level
      FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "denormalize_star": f"""
      WITH grain AS ({SQL_GRAIN})
      SELECT grain.o_orderkey, grain.p_partkey, grain.s_suppkey,
             CAST(sum_qty AS DOUBLE) AS sum_qty, CAST(revenue AS DOUBLE) AS revenue,
             n_lines, p_brand, s_name, n.n_name, r.r_name,
             cn.n_name AS cn_name, cr.r_name AS cr_name,
             o_orderpriority, CAST(year(o_orderdate) AS INT) AS d_year
      FROM grain
      JOIN part ON grain.p_partkey = part.p_partkey
      JOIN supplier ON grain.s_suppkey = supplier.s_suppkey
      JOIN nation n ON supplier.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      JOIN orders ON grain.o_orderkey = orders.o_orderkey
      JOIN customer ON orders.o_custkey = customer.c_custkey
      JOIN nation cn ON customer.c_nationkey = cn.n_nationkey
      JOIN region cr ON cn.n_regionkey = cr.r_regionkey
    """,
    "denormalize_na_fill": """
      WITH g AS (SELECT DISTINCT event_type FROM events),
      u AS (SELECT DISTINCT user_id FROM events),
      f AS (SELECT event_type, user_id,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
                   COUNT(*) AS n_events
            FROM events GROUP BY 1, 2)
      SELECT g.event_type, u.user_id, f.sum_value, f.n_events
      FROM g CROSS JOIN u
      LEFT JOIN f ON f.event_type = g.event_type AND f.user_id = u.user_id
    """,
    "pivot_flag_status": """
      SELECT l_returnflag,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (l_linestatus = 'F') AS DOUBLE) AS "F",
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (l_linestatus = 'O') AS DOUBLE) AS "O"
      FROM lineitem GROUP BY 1
    """,
    "topk_parts_per_brand": f"""
      WITH agg AS (
        SELECT p_brand, p_partkey, {SQL_REV} AS rev
        FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1, 2)
      SELECT p_brand, p_partkey, CAST(rev AS DOUBLE) AS revenue,
             CAST(row_number() OVER (PARTITION BY p_brand ORDER BY rev DESC, p_partkey) AS BIGINT) AS rank
      FROM agg QUALIFY rank <= 3
    """,
    "surrogate_key": """
      SELECT c_mktsegment,
             CAST(dense_rank() OVER (ORDER BY c_mktsegment) AS BIGINT) AS seg_key
      FROM (SELECT DISTINCT c_mktsegment FROM customer)
    """,
    "events_cube_from_table": """
      SELECT event_type,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
             COUNT(event_id) AS n_events
      FROM events GROUP BY 1
    """,
    "tpch_q1_pricing_summary": f"""
      SELECT l_returnflag, l_linestatus,
             CAST({SQL_QTY} AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             CAST({SQL_REV} AS DOUBLE) AS sum_disc_price,
             CAST({SQL_CHARGE} AS DOUBLE) AS sum_charge,
             CAST({SQL_QTY} AS DOUBLE) / COUNT(*) AS avg_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
             COUNT(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
      GROUP BY 1, 2
    """,
    "tpch_q3_shipping_priority": f"""
      SELECT l_orderkey AS o_orderkey, CAST({SQL_REV} AS DOUBLE) AS revenue,
             o_orderdate, o_orderpriority
      FROM lineitem
      JOIN orders ON l_orderkey = orders.o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY 1, 3, 4
      ORDER BY {SQL_REV} DESC, l_orderkey LIMIT 10
    """,
    "tpch_q5_local_supplier": f"""
      SELECT n.n_name, CAST({SQL_REV} AS DOUBLE) AS revenue, COUNT(*) AS n_lines
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n ON s_nationkey = n.n_nationkey
      JOIN region ON n.n_regionkey = r_regionkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE r_name = 'EUROPE' AND customer.c_nationkey = supplier.s_nationkey
        AND year(o_orderdate) = 1996
      GROUP BY 1
    """,
    "stats_by_flag": """
      SELECT l_returnflag,
             stddev_samp(l_quantity) AS sd_qty,
             var_samp(l_quantity) AS var_qty
      FROM lineitem GROUP BY 1
    """,
    "tpch_q6_forecast_revenue": """
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
             AS forecast_revenue,
             COUNT(*) AS n_lines
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07
        AND l_quantity < 24
    """,
    "tpch_q12_priority_counts": """
      SELECT l_returnflag,
             CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                      THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1
    """,
    "tpch_q14_promo_revenue": """
      SELECT 100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                   THEN CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))
                   ELSE 0 END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS promo_revenue_pct
      FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
    "tpch_q4_priority_returns": """
      SELECT o_orderpriority, COUNT(*) AS order_count
      FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      GROUP BY 1
    """,
    "tpch_q7_volume_shipping": f"""
      SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
             year(l_shipdate) AS l_year,
             CAST({SQL_REV} AS DOUBLE) AS revenue, COUNT(*) AS n_lines
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
         OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
      GROUP BY 1, 2, 3
    """,
    "tpch_q8_market_share": """
      SELECT year(o_orderdate) AS o_year,
             CAST(SUM(CASE WHEN sn.n_name = 'NATION_3'
                      THEN CAST(l_extendedprice AS DECIMAL(18,2))
                           * (1 - CAST(l_discount AS DECIMAL(18,2)))
                      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS mkt_share,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS total_revenue
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region ON cn.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
      GROUP BY 1
    """,
    "tpch_q10_returned_items": f"""
      SELECT c_custkey, c_name, CAST({SQL_REV} AS DOUBLE) AS revenue,
             c_acctbal, n_name
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY 1, 2, 4, 5
      ORDER BY {SQL_REV} DESC, c_custkey LIMIT 20
    """,
    "tpch_q13_order_distribution": """
      WITH per_cust AS (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY 1)
      SELECT c_count, COUNT(*) AS custdist FROM per_cust GROUP BY 1
    """,
    "tpch_q15_top_supplier": f"""
      WITH rev AS (
        SELECT l_suppkey, {SQL_REV} AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY 1)
      SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
      FROM rev JOIN supplier ON l_suppkey = s_suppkey
      WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
      ORDER BY s_suppkey
    """,
    "tpch_q17_small_qty_revenue": """
      WITH j AS (
        SELECT l_partkey, l_quantity, l_extendedprice
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand = 'Brand#1' AND p_size <= 10),
      t AS (
        SELECT l_partkey,
               0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                      / COUNT(*)) AS qty_thresh
        FROM j GROUP BY 1)
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
               AS avg_yearly,
             COUNT(*) AS n_lines
      FROM j JOIN t USING (l_partkey)
      WHERE l_quantity < qty_thresh
    """,
    "tpch_q18_large_orders": """
      WITH big AS (
        SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
        FROM lineitem GROUP BY 1
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 200)
      SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
             CAST(sum_qty AS DOUBLE) AS sum_qty
      FROM big
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
    "tpch_q19_disjunctive_revenue": f"""
      SELECT CAST({SQL_REV} AS DOUBLE) AS revenue, COUNT(*) AS n_lines
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 5
             AND l_quantity BETWEEN 1 AND 11)
         OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 10
             AND l_quantity BETWEEN 10 AND 20)
         OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
             AND l_quantity BETWEEN 20 AND 30)
    """,
    "tpch_q22_idle_balance": """
      WITH avg_bal AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS avg_bal
        FROM customer WHERE c_acctbal > 0)
      SELECT n_name, COUNT(*) AS numcust,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      FROM customer, avg_bal
      JOIN nation ON c_nationkey = n_nationkey
      WHERE c_acctbal > avg_bal
        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      GROUP BY 1
    """,
    "tpch_q2_min_cost_supplier": """
      WITH ps AS (
        SELECT l_partkey, l_suppkey,
               MIN(l_extendedprice / l_quantity) AS supply_cost
        FROM lineitem GROUP BY 1, 2)
      SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, s_suppkey,
             supply_cost
      FROM ps
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE' AND p_size = 15 AND p_type = 'STANDARD'
      QUALIFY supply_cost = MIN(supply_cost) OVER (PARTITION BY p_partkey)
      ORDER BY s_acctbal DESC, s_suppkey, p_partkey LIMIT 100
    """,
    "tpch_q9_product_profit": f"""
      SELECT n_name AS nation, year(o_orderdate) AS o_year,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))
                      - CAST(p_retailprice AS DECIMAL(18,2))
                        * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_profit,
             COUNT(*) AS n_lines
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE 'red%'
      GROUP BY 1, 2
    """,
    "tpch_q11_important_stock": f"""
      WITH val AS (
        SELECT l_partkey, {SQL_REV} AS value
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_7'
        GROUP BY 1)
      SELECT l_partkey AS p_partkey, CAST(value AS DOUBLE) AS part_value
      FROM val
      WHERE CAST(value AS DOUBLE) > 0.001 * (SELECT CAST(SUM(value) AS DOUBLE)
                                             FROM val)
    """,
    "tpch_q16_supplier_counts": """
      WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
      SELECT p_brand, p_type, p_size,
             COUNT(DISTINCT l_suppkey) AS supplier_cnt
      FROM ps JOIN part ON l_partkey = p_partkey
      WHERE p_brand <> 'Brand#5'
        AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
        AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 0)
      GROUP BY 1, 2, 3
    """,
    "tpch_q20_excess_stock": """
      WITH q96 AS (
        SELECT l_partkey, l_suppkey,
               SUM(CAST(l_quantity AS DECIMAL(18,2))) AS q96
        FROM lineitem WHERE year(l_shipdate) = 1996 GROUP BY 1, 2),
      qall AS (
        SELECT l_partkey, l_suppkey,
               SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qall
        FROM lineitem GROUP BY 1, 2)
      SELECT s_suppkey, s_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_4'
        AND s_suppkey IN (
          SELECT qall.l_suppkey
          FROM qall JOIN q96 USING (l_partkey, l_suppkey)
          WHERE qall.l_partkey IN (SELECT p_partkey FROM part
                                   WHERE p_name LIKE 'red%')
            AND qall > 2 * q96)
      ORDER BY s_name
    """,
    "tpch_q21_waiting_suppliers": """
      WITH sn AS (
        SELECT s_suppkey, s_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_2')
      SELECT s_name, COUNT(*) AS numwait
      FROM lineitem l1
      JOIN sn ON l1.l_suppkey = s_suppkey
      WHERE l1.l_returnflag = 'R'
        AND EXISTS (SELECT 1 FROM orders
                    WHERE o_orderkey = l1.l_orderkey AND o_orderstatus = 'F')
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_returnflag = 'R')
      GROUP BY 1
      ORDER BY numwait DESC, s_name LIMIT 100
    """,
    "dedup_exact": """
      SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
      FROM documents GROUP BY 1
    """,
    "dedup_fingerprint": f"""
      SELECT md5({_NORM_SQL}) AS content_hash, MIN(doc_id) AS keep_id,
             COUNT(*) AS n_dups
      FROM documents GROUP BY 1
    """,
    "dedup_keep_longest": f"""
      WITH g AS (
        SELECT md5({_NORM_SQL}) AS content_hash, doc_id, length(text) AS l,
               COUNT(*) OVER (PARTITION BY md5({_NORM_SQL})) AS n_dups,
               row_number() OVER (PARTITION BY md5({_NORM_SQL})
                                  ORDER BY length(text) DESC, doc_id ASC) AS rn
        FROM documents)
      SELECT content_hash, doc_id AS keep_id, n_dups FROM g WHERE rn = 1
    """,
    "text_token_count": r"""
      SELECT doc_id,
             CAST(len(string_split_regex(TRIM(text), '\s+')) AS BIGINT) AS n_tokens,
             CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS BIGINT) AS n_subwords
      FROM documents
    """,
    "text_quality": _quality_sql(),
    "text_langid": _langid_sql(),
    "text_fingerprint": f"SELECT doc_id, md5({_NORM_SQL}) AS fingerprint FROM documents",
    "text_repetition": r"""
      WITH d AS (
        SELECT doc_id, string_split_regex(TRIM(text), '\s+') AS toks
        FROM documents),
      c AS (
        SELECT doc_id, toks, len(toks) AS n,
               list_max(list_transform(list_distinct(toks),
                 t -> len(list_filter(toks, x -> x = t)))) AS top_tok
        FROM d),
      bg AS (
        SELECT doc_id, toks, n, top_tok,
               CASE WHEN n > 1
                 THEN list_transform(range(1, n), i -> toks[i] || ' ' || toks[i+1])
                 ELSE CAST([] AS VARCHAR[]) END AS bigrams
        FROM c)
      SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(toks)) AS DOUBLE) / n AS distinct_ratio,
             CAST(top_tok AS DOUBLE) / n AS top_token_frac,
             CASE WHEN len(bigrams) > 0
               THEN CAST(list_max(list_transform(list_distinct(bigrams),
                      t -> len(list_filter(bigrams, x -> x = t)))) AS DOUBLE)
                    / len(bigrams) END AS top_bigram_frac
      FROM bg
    """,
    "text_subwords": r"""
      SELECT doc_id,
             CAST(len(string_split_regex(TRIM(text), '\s+')) AS BIGINT) AS n_tokens_ws,
             CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS BIGINT) AS n_subwords
      FROM documents
    """,
    "ngram_jaccard_pairs": _ngram_jaccard_sql(max_df=NGRAM_MAX_DF),
    "jaccard_prefix_pairs": _ngram_exact_sql(0.5),
    "incremental_prefix_pairs": _incremental_exact_sql(0.5),
    "weighted_sample_docs": """
      WITH scored AS (
        SELECT doc_id, lang, n_chars,
               ln(CAST(('0x' || substr(md5('w' || CAST(doc_id AS VARCHAR)), 1, 15))::UBIGINT + 1 AS DOUBLE)
                  / CAST(power(16, 15) AS DOUBLE)) / CAST(n_chars AS DOUBLE) AS wkey
        FROM documents WHERE CAST(n_chars AS DOUBLE) > 0),
      r AS (
        SELECT doc_id, lang, n_chars,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY wkey DESC, doc_id ASC) AS rn
        FROM scored)
      SELECT doc_id, lang, n_chars FROM r WHERE rn <= 30
    """,
    "token_budget_sample_docs": """
      WITH c AS (
        SELECT doc_id, lang, n_chars,
               SUM(n_chars) OVER (
                 PARTITION BY lang
                 ORDER BY md5('budget' || CAST(doc_id AS VARCHAR))
                 ROWS UNBOUNDED PRECEDING) AS cum
        FROM documents)
      SELECT doc_id, lang, n_chars FROM c
      WHERE cum <= CASE lang WHEN 'en' THEN 5000 WHEN 'de' THEN 2000
                             WHEN 'zh' THEN 1000 ELSE 0 END
    """,
    "range_layout_prune": """
      SELECT event_type, COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-12'
      GROUP BY 1
    """,
    "zorder_layout_prune": """
      SELECT event_type, COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM events
      WHERE user_id < 200 AND value >= 50.0
      GROUP BY 1
    """,
    "dpp_partition_prune": """
      WITH cal AS (
        SELECT CAST(ts AS DATE) AS event_date, COUNT(*) AS n_day
        FROM events GROUP BY 1),
      busy AS (
        SELECT event_date FROM cal
        WHERE n_day >= 0.8 * (SELECT MAX(n_day) FROM cal))
      SELECT event_type, COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM events
      WHERE CAST(ts AS DATE) IN (SELECT event_date FROM busy)
      GROUP BY 1
    """,
    "corpus_snapshot_diff": """
      WITH old AS (
        SELECT doc_id, md5(text) AS old_hash FROM documents
        WHERE doc_id % 3 != 0),
      new AS (
        SELECT doc_id,
               md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2'
                        ELSE text END) AS new_hash
        FROM documents WHERE doc_id % 4 != 0)
      SELECT COALESCE(old.doc_id, new.doc_id) AS doc_id,
             CASE WHEN old_hash IS NULL THEN 'added'
                  WHEN new_hash IS NULL THEN 'removed'
                  WHEN old_hash = new_hash THEN 'unchanged'
                  ELSE 'changed' END AS status,
             old_hash, new_hash
      FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id
    """,
    "minhash_lsh_pairs": _ngram_truth_sql(0.5),
    "incremental_minhash_recall": _incremental_truth_sql(0.5),
    "simhash_pairs": r"""
      WITH n AS (
        SELECT doc_id,
               trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')) AS norm
        FROM documents),
      h AS (
        SELECT doc_id,
               md5(array_to_string(list_sort(list_distinct(
                 string_split_regex(norm, '\s+'))), ' ')) AS th
        FROM n WHERE norm != '')
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             TRUE AS simhash_found, TRUE AS hamming_zero,
             TRUE AS pairs_ordered_ok, TRUE AS hamming_bounded_ok
      FROM h a JOIN h b ON a.th = b.th AND a.doc_id < b.doc_id
    """,
    "documents_stream_ingest": """
      SELECT doc_id, md5(text) AS text_hash,
             TRUE AS stream_eq_batch, TRUE AS target_text_ok
      FROM documents WHERE doc_id % 2 = 1
    """,
    "dual_index_stream_ingest": """
      SELECT doc_id, md5(text) AS text_hash, TRUE AS stream_eq_batch,
             TRUE AS fp_eq_rebuild, TRUE AS mh_eq_rebuild
      FROM (
        SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, text
        FROM documents WHERE doc_id % 10 = 0
      ) t
    """,
    "prefix_stream_ingest": """
      SELECT doc_id, md5(text) AS text_hash, TRUE AS stream_eq_batch,
             TRUE AS sets_eq_rebuild, TRUE AS consistency_ok,
             TRUE AS refrozen_eq_rebuild
      FROM documents WHERE doc_id % 2 = 1
    """,
    "embedding_near_pairs_lsh": """
      WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings),
      n AS (
        SELECT vec_id, vec,
               sqrt(list_sum(list_transform(vec, x -> x * x))) AS nrm
        FROM v)
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             CAST(list_dot_product(a.vec, b.vec) / (a.nrm * b.nrm) AS DOUBLE)
               AS cosine,
             TRUE AS lsh_found
      FROM n a JOIN n b ON a.vec_id < b.vec_id
      WHERE list_dot_product(a.vec, b.vec) / (a.nrm * b.nrm) >= 0.45
    """,
    "ann_lsh_topk": """
      SELECT vec_id AS query_id, CAST(5 AS INT) AS n_exact,
             CAST(5 AS INT) AS n_matches, TRUE AS batch_recall_ok
      FROM embeddings WHERE vec_id < 10
    """,
    "ann_ivf_topk": """
      SELECT vec_id AS query_id, CAST(5 AS INT) AS n_exact,
             CAST(5 AS INT) AS n_matches, TRUE AS batch_recall_ok
      FROM embeddings WHERE vec_id < 10
    """,
    "sketch_error_bounds": """
      SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
             TRUE AS p50_in_band, TRUE AS p95_in_band,
             TRUE AS hll_within_5pct
      FROM events GROUP BY event_type
    """,
    "quantile_bins_approx_bound": """
      WITH ranked AS (
        SELECT l_returnflag, l_extendedprice AS v,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                  ORDER BY l_extendedprice) AS rn,
               COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        FROM lineitem),
      cuts AS (
        SELECT l_returnflag,
               MAX(CASE WHEN rn = GREATEST(CAST(CEIL(0.25 * n) AS BIGINT), 1)
                        THEN v END) AS c1,
               MAX(CASE WHEN rn = GREATEST(CAST(CEIL(0.5 * n) AS BIGINT), 1)
                        THEN v END) AS c2,
               MAX(CASE WHEN rn = GREATEST(CAST(CEIL(0.75 * n) AS BIGINT), 1)
                        THEN v END) AS c3
        FROM ranked GROUP BY l_returnflag)
      SELECT li.l_returnflag,
             CAST(CAST(li.l_extendedprice > c1 AS INT)
                  + CAST(li.l_extendedprice > c2 AS INT)
                  + CAST(li.l_extendedprice > c3 AS INT) AS INT) AS bin_id,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             TRUE AS within_tol
      FROM lineitem li JOIN cuts USING (l_returnflag)
      GROUP BY 1, 2
    """,
    "pack_greedy_check": r"""
      WITH d AS (
        SELECT doc_id,
               CAST(len(string_split_regex(TRIM(text), '\s+')) AS BIGINT)
                 AS n_tokens,
               CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 8 AS INT) AS shard
        FROM documents)
      SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs_distinct,
             CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
             CAST(0 AS BIGINT) AS n_over_capacity
      FROM d GROUP BY shard
    """,
    "incremental_dedup_keep": _incremental_keep_sql(0.05, NGRAM_MAX_DF),
    "embedding_centroids": """
      SELECT label, CAST(i - 1 AS INT) AS pos,
             CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(30,12))) AS DOUBLE) / COUNT(*) AS centroid_val
      FROM (SELECT label, unnest(embedding) AS v,
                   unnest(generate_series(1, len(embedding))) AS i
            FROM embeddings)
      GROUP BY 1, 2
    """,
    "multimodal_frames": """
      SELECT CAST(doc_id AS BIGINT) AS asset_id,
             CAST(unnest(generate_series(
                    0,
                    greatest(CAST(octet_length(encode(text)) // 1000 AS INT) - 1, 0),
                    30)) AS INT) AS frame_index
      FROM documents
    """,
    "multimodal_resize": """
      SELECT CAST(doc_id AS BIGINT) AS asset_id,
             CAST(32 AS INT) AS height, CAST(24 AS INT) AS width
      FROM documents
    """,
    "multimodal_meta": """
      SELECT CAST(doc_id AS BIGINT) AS asset_id, 'image' AS media_type,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             md5(text) AS content_hash
      FROM documents
    """,
    "multimodal_decode": """
      SELECT CAST(doc_id AS BIGINT) AS asset_id,
             CAST(8 + doc_id % 17 AS INT) AS height,
             CAST(8 + (doc_id * 7) % 23 AS INT) AS width,
             CAST(3 AS INT) AS channels,
             'png' AS decode_ok
      FROM documents
    """,
    "multimodal_audio": """
      SELECT CAST(doc_id AS BIGINT) AS asset_id,
             CAST(50 + (doc_id % 50) * 10 AS BIGINT) AS duration_ms,
             ROUND((1 + doc_id % 9) / 10.0 * 32768) / 32768.0 AS rms
      FROM documents
    """,
    "extract_custom_j": f"""
      SELECT p_brand,
             CAST({SQL_REV} AS DOUBLE) AS revenue,
             COUNT(DISTINCT l_partkey) AS n_parts,
             CAST({SQL_QTY} AS DOUBLE) / COUNT(*) AS avg_qty
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE l_suppkey IN (
        SELECT s_suppkey FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA')
      GROUP BY 1
    """,
    "measures_heterogeneous": """
      SELECT l_returnflag,
             CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
             CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price,
             CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc,
             COUNT(*) AS n_lines
      FROM lineitem GROUP BY 1
    """,
    "distinct_counts": """
      SELECT o_orderpriority,
             COUNT(DISTINCT o_custkey) AS n_customers,
             COUNT(*) AS n_orders
      FROM orders GROUP BY 1
    """,
    "udaf_median": """
      SELECT l_returnflag, CAST(median(l_quantity) AS DOUBLE) AS median_qty
      FROM lineitem GROUP BY 1
    """,
    "window_running_total": """
      WITH m AS (
        SELECT year(o_orderdate) AS o_year, month(o_orderdate) AS o_month,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS _m
        FROM orders GROUP BY 1, 2)
      SELECT o_year, o_month, CAST(_m AS DOUBLE) AS month_total,
             CAST(SUM(_m) OVER (ORDER BY o_year, o_month
                                ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_total
      FROM m
    """,
    "format_currency": """
      WITH s AS (
        SELECT o_orderpriority,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        FROM orders GROUP BY 1)
      SELECT o_orderpriority,
             '$' || format('{:,}', cents // 100) || '.' ||
             lpad(CAST(cents % 100 AS VARCHAR), 2, '0') AS total
      FROM s
    """,
    "pivot_formatted": """
      WITH s AS (
        SELECT o_orderpriority, year(o_orderdate) AS o_year,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        FROM orders GROUP BY 1, 2),
      f AS (
        SELECT o_orderpriority, o_year,
               '$' || format('{:,}', cents // 100) || '.' ||
               lpad(CAST(cents % 100 AS VARCHAR), 2, '0') AS total
        FROM s)
      SELECT o_orderpriority,
             MAX(CASE WHEN o_year = 1995 THEN total END) AS "1995",
             MAX(CASE WHEN o_year = 1996 THEN total END) AS "1996"
      FROM f GROUP BY 1
    """,
    "anti_join_idle_customers": """
      SELECT c_mktsegment, COUNT(*) AS n_idle
      FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      GROUP BY 1
    """,
    "events_props_json": """
      SELECT CAST(CAST(json_extract_string(props, '$.k') AS INT) % 10 AS INT)
               AS k_bucket,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1
    """,
    "quantiles_by_type": """
      SELECT event_type,
             quantile_cont(value, 0.5) AS p50,
             quantile_cont(value, 0.95) AS p95
      FROM events GROUP BY 1
    """,
    "heavy_hitters_sources": """
      SELECT lang, source, COUNT(*) AS n_docs,
             row_number() OVER (PARTITION BY lang
                                ORDER BY COUNT(*) DESC, source) AS rank
      FROM documents GROUP BY lang, source
      QUALIFY rank <= 3
    """,
    "asof_last_error": """
      SELECT l.event_id, l.user_id, l.ts, r.value AS last_error_value
      FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') l
      ASOF LEFT JOIN
           (SELECT user_id, ts, value FROM events WHERE event_type = 'error') r
        ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    "range_join_error_window": """
      WITH e AS (
        SELECT event_id AS error_id, user_id, ts AS t0,
               ts + INTERVAL 5 MINUTE AS t1
        FROM events WHERE event_type = 'error'),
      c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
      SELECT error_id, COUNT(*) AS n_clicks
      FROM e JOIN c ON c.user_id = e.user_id AND c.ts >= e.t0 AND c.ts <= e.t1
      GROUP BY 1
    """,
    "embedding_components": f"""
      WITH RECURSIVE {_capped_edges_cte(0.35)}
      sym AS (
        SELECT id_a AS src, id_b AS dst FROM edges
        UNION SELECT id_b, id_a FROM edges),
      nodes AS (SELECT DISTINCT src AS id FROM sym),
      lbl(id, label) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT s.dst, l.label FROM sym s JOIN lbl l ON l.id = s.src)
      SELECT id AS vec_id, CAST(MIN(label) AS BIGINT) AS component
      FROM lbl GROUP BY 1
    """,
    "semantic_dedup_keep": f"""
      WITH RECURSIVE {_capped_edges_cte(0.35)}
      sym AS (
        SELECT id_a AS src, id_b AS dst FROM edges
        UNION SELECT id_b, id_a FROM edges),
      nodes AS (SELECT DISTINCT src AS id FROM sym),
      lbl(id, label) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT s.dst, l.label FROM sym s JOIN lbl l ON l.id = s.src),
      comp AS (SELECT id, MIN(label) AS component FROM lbl GROUP BY 1),
      dropped AS (SELECT id FROM comp WHERE id <> component)
      SELECT vec_id, CAST(label AS INT) AS label
      FROM embeddings WHERE vec_id NOT IN (SELECT id FROM dropped)
    """,
    "pipeline_clean_corpus": _pipeline_sql(),
    "pipeline_pretraining": _pipeline_pretraining_sql(),
    "pii_redaction": _pii_sql(),
    "paragraph_dedup": r"""
      WITH aug AS (
        SELECT doc_id,
               text || chr(10) || 'subscribe to our newsletter for updates'
                 AS text
        FROM documents),
      sp AS (SELECT doc_id, string_split_regex(text, '\n+') AS p FROM aug),
      paras AS (
        SELECT doc_id, i - 1 AS idx, p[i] AS para
        FROM (SELECT doc_id, p, unnest(generate_series(1, len(p))) AS i
              FROM sp)
        WHERE p[i] <> ''),
      ranked AS (
        SELECT doc_id, idx, para,
               ROW_NUMBER() OVER (PARTITION BY para
                                  ORDER BY doc_id, idx) AS rn
        FROM paras),
      sizes AS (SELECT doc_id, COUNT(*) AS n_paras FROM paras GROUP BY 1),
      kept AS (
        SELECT doc_id, COUNT(*) AS n_kept,
               string_agg(para, chr(10) ORDER BY idx) AS text
        FROM ranked WHERE rn = 1 GROUP BY doc_id)
      SELECT doc_id, n_paras, n_kept, text
      FROM sizes JOIN kept USING (doc_id)
    """,
    "decontaminate_overlap": f"""
      WITH toks AS (
        SELECT doc_id, string_split({_NORM_SQL}, ' ') AS t FROM documents),
      sh AS (
        SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
              FROM toks WHERE len(t) >= 3)),
      bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
      sz AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh
             WHERE doc_id % 97 <> 0 GROUP BY 1),
      hits AS (SELECT doc_id, COUNT(*) AS n_overlap
               FROM sh JOIN bench USING (shingle)
               WHERE doc_id % 97 <> 0 GROUP BY 1)
      SELECT sz.doc_id, n_shingles,
             COALESCE(n_overlap, 0) AS n_overlap,
             CAST(COALESCE(n_overlap, 0) AS DOUBLE) / n_shingles
               AS contamination_frac,
             CAST(CAST(COALESCE(n_overlap, 0) AS DOUBLE) / n_shingles >= 0.5
                  AS INT) AS contaminated
      FROM sz LEFT JOIN hits USING (doc_id)
    """,
    "sample_fraction_docs": f"""
      SELECT doc_id, lang, source FROM documents
      WHERE md5(CAST(doc_id AS VARCHAR)) < '{_hex_threshold(0.25)}'
    """,
    "sample_stratified_docs": """
      SELECT doc_id, lang FROM (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (
                 PARTITION BY lang
                 ORDER BY md5(CAST(doc_id AS VARCHAR))) AS r
        FROM documents) WHERE r <= 20
    """,
    "mixture_sample_docs": f"""
      SELECT doc_id, source FROM documents
      WHERE md5(CAST(doc_id AS VARCHAR)) <
        CASE source
          WHEN 'src0' THEN '{_hex_threshold(1.0)}'
          WHEN 'src1' THEN '{_hex_threshold(0.5)}'
          WHEN 'src2' THEN '{_hex_threshold(0.1)}'
          ELSE '{_hex_threshold(0.05)}'
        END
    """,
    "domain_cap": """
      SELECT doc_id, source FROM (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (
                 PARTITION BY source
                 ORDER BY md5('cap' || CAST(doc_id AS VARCHAR))) AS r
        FROM documents) WHERE r <= 15
    """,
    "quality_percentile_keep": """
      SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars FROM (
        SELECT doc_id, lang, n_chars,
               PERCENT_RANK() OVER (
                 PARTITION BY lang
                 ORDER BY n_chars DESC, doc_id) AS pr
        FROM documents) WHERE pr <= 0.6
    """,
    "chunk_documents": """
      WITH d AS (
        SELECT doc_id, text,
               CASE WHEN length(text) <= 200 THEN 1
                    ELSE CAST(CEIL((length(text) - 200) / 150.0) AS BIGINT) + 1
               END AS n_chunks
        FROM documents),
      u AS (
        SELECT doc_id, text,
               unnest(generate_series(0, n_chunks - 1)) AS chunk_id
        FROM d)
      SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
             substr(text, CAST(chunk_id * 150 + 1 AS INT), 200) AS chunk_text,
             CAST(length(substr(text, CAST(chunk_id * 150 + 1 AS INT), 200))
                  AS BIGINT) AS n_chunk_chars
      FROM u
    """,
    "token_vocab": r"""
      WITH tok AS (
        SELECT doc_id,
               unnest(string_split_regex(TRIM(text), '\s+')) AS token
        FROM documents)
      SELECT token, CAST(COUNT(*) AS BIGINT) AS n_total,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM tok WHERE token <> ''
      GROUP BY token ORDER BY n_total DESC, token LIMIT 20
    """,
    "split_assign": f"""
      SELECT doc_id,
             CASE WHEN md5('split' || CAST(doc_id AS VARCHAR))
                    < '{_hex_threshold(0.9)}' THEN 'train'
                  WHEN md5('split' || CAST(doc_id AS VARCHAR))
                    < '{_hex_threshold(0.95)}' THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    """,
    "shuffle_order": """
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (
               ORDER BY md5('shuffle' || CAST(doc_id AS VARCHAR)))
               AS BIGINT) AS position
      FROM documents
    """,
    "tfidf_keywords": r"""
      WITH tok AS (
        SELECT doc_id,
               unnest(string_split_regex(TRIM(text), '\s+')) AS token
        FROM documents),
      tok2 AS (SELECT * FROM tok WHERE token <> ''),
      tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok2 GROUP BY 1, 2),
      dfreq AS (SELECT token, COUNT(DISTINCT doc_id) AS df_t
                FROM tok2 GROUP BY 1),
      n AS (SELECT COUNT(DISTINCT doc_id) AS n_corpus FROM documents),
      scored AS (
        SELECT doc_id, token, tf,
               ROUND(tf * (ln((n_corpus + 1.0) / (df_t + 1.0)) + 1), 9)
                 AS tfidf
        FROM tf JOIN dfreq USING (token) CROSS JOIN n),
      r AS (
        SELECT doc_id, token, CAST(tf AS BIGINT) AS tf,
               CAST(tfidf AS DOUBLE) AS tfidf,
               CAST(ROW_NUMBER() OVER (
                 PARTITION BY doc_id ORDER BY tfidf DESC, token)
                 AS BIGINT) AS term_rank
        FROM scored)
      SELECT * FROM r WHERE term_rank <= 3
    """,
    "events_stream_dedup": """
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY event_type
    """,
    "key_skew_users": """
      WITH c AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1),
      t AS (SELECT SUM(n) AS total FROM c),
      r AS (SELECT user_id, n,
                   ROW_NUMBER() OVER (ORDER BY n DESC, user_id) AS rank
            FROM c)
      SELECT CAST(rank AS INT) AS rank, user_id,
             CAST(n AS BIGINT) AS n_rows,
             CAST(n AS DOUBLE) / total AS share
      FROM r, t WHERE rank <= 10
    """,
    "quantile_bins": """
      WITH ranked AS (
        SELECT l_returnflag, l_extendedprice AS v,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                  ORDER BY l_extendedprice) AS rn,
               COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        FROM lineitem),
      cuts AS (
        SELECT l_returnflag,
               MAX(CASE WHEN rn = GREATEST(CAST(CEIL(0.25 * n) AS BIGINT), 1)
                        THEN v END) AS c1,
               MAX(CASE WHEN rn = GREATEST(CAST(CEIL(0.5 * n) AS BIGINT), 1)
                        THEN v END) AS c2,
               MAX(CASE WHEN rn = GREATEST(CAST(CEIL(0.75 * n) AS BIGINT), 1)
                        THEN v END) AS c3
        FROM ranked GROUP BY l_returnflag)
      SELECT li.l_returnflag,
             CAST(CAST(li.l_extendedprice > c1 AS INT)
                  + CAST(li.l_extendedprice > c2 AS INT)
                  + CAST(li.l_extendedprice > c3 AS INT) AS INT) AS bin_id,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(MIN(li.l_extendedprice) AS DOUBLE) AS bin_min,
             CAST(MAX(li.l_extendedprice) AS DOUBLE) AS bin_max
      FROM lineitem li JOIN cuts USING (l_returnflag)
      GROUP BY 1, 2
    """,
    "winsorized_price_stats": """
      WITH ranked AS (
        SELECT l_returnflag, l_extendedprice AS v,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                  ORDER BY l_extendedprice) AS rn,
               COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        FROM lineitem),
      cuts AS (
        SELECT l_returnflag,
               MAX(CASE WHEN rn = GREATEST(CAST(CEIL(0.05 * n) AS BIGINT), 1)
                        THEN v END) AS lo_cut,
               MAX(CASE WHEN rn = GREATEST(CAST(CEIL(0.95 * n) AS BIGINT), 1)
                        THEN v END) AS hi_cut
        FROM ranked GROUP BY l_returnflag),
      clipped AS (
        SELECT li.l_returnflag, lo_cut, hi_cut,
               LEAST(GREATEST(li.l_extendedprice, lo_cut), hi_cut) AS cl,
               CAST(li.l_extendedprice < lo_cut AS INT) AS is_lo,
               CAST(li.l_extendedprice > hi_cut AS INT) AS is_hi
        FROM lineitem li JOIN cuts USING (l_returnflag))
      SELECT l_returnflag, lo_cut, hi_cut,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(is_lo) AS BIGINT) AS n_clipped_low,
             CAST(SUM(is_hi) AS BIGINT) AS n_clipped_high,
             CAST(SUM(CAST(cl AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
               AS winsorized_mean
      FROM clipped GROUP BY l_returnflag, lo_cut, hi_cut
    """,
    "grouping_sets_explicit": """
      SELECT l_returnflag AS flag, l_linestatus AS status,
             CAST(year(l_shipdate) AS INT) AS ship_year,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_qty,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(GROUPING(l_returnflag) * 4 + GROUPING(l_linestatus) * 2
                  + GROUPING(year(l_shipdate)) AS INT) AS grouping_id,
             CAST(GROUPING(l_returnflag) + GROUPING(l_linestatus)
                  + GROUPING(year(l_shipdate)) AS INT) AS grouping_level
      FROM lineitem
      GROUP BY GROUPING SETS (
        (l_returnflag, l_linestatus),
        (l_returnflag, year(l_shipdate)),
        ())
    """,
    "pack_sequences": r"""
      WITH d AS (
        SELECT doc_id,
               CAST(len(string_split_regex(TRIM(text), '\s+')) AS BIGINT)
                 AS n_tokens,
               CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 8 AS INT) AS shard
        FROM documents),
      c AS (
        SELECT doc_id, shard, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
                 - n_tokens AS "offset"
        FROM d)
      SELECT doc_id, shard, CAST("offset" // 512 AS BIGINT) AS seq,
             CAST("offset" AS BIGINT) AS "offset", n_tokens
      FROM c
    """,
    "events_hourly": """
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2
    """,
    "events_stream_cube": """
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2
    """,
    "merge_delta_incremental": """
      SELECT event_type,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
             COUNT(event_id) AS n_events
      FROM events GROUP BY 1
    """,
    "price_histogram": """
      WITH b AS (
        SELECT l_returnflag,
               CAST(LEAST(GREATEST(
                 FLOOR((l_extendedprice - 0.0) / 3000.0), 0), 19) AS INT)
                 AS bin_id
        FROM lineitem)
      SELECT l_returnflag, bin_id,
             CAST(0.0 + bin_id * 3000.0 AS DOUBLE) AS bin_lo,
             CAST(0.0 + (bin_id + 1) * 3000.0 AS DOUBLE) AS bin_hi,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM b GROUP BY 1, 2
    """,
    "funnel_conversion": """
      WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
                  WHERE event_type = 'view' GROUP BY 1),
      s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
             JOIN s1 USING (user_id)
             WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
      s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
             JOIN s2 USING (user_id)
             WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1),
      c AS (SELECT (SELECT COUNT(*) FROM s1) AS n1,
                   (SELECT COUNT(*) FROM s2) AS n2,
                   (SELECT COUNT(*) FROM s3) AS n3)
      SELECT CAST(1 AS INT) AS step_index, 'view' AS step,
             CAST(n1 AS BIGINT) AS n_users,
             CAST(n1 AS DOUBLE) / n1 AS conversion FROM c
      UNION ALL
      SELECT CAST(2 AS INT), 'click', CAST(n2 AS BIGINT),
             CAST(n2 AS DOUBLE) / n1 FROM c
      UNION ALL
      SELECT CAST(3 AS INT), 'purchase', CAST(n3 AS BIGINT),
             CAST(n3 AS DOUBLE) / n1 FROM c
    """,
    "cohort_retention": """
      WITH f AS (SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort_date
                 FROM events GROUP BY 1)
      SELECT CAST(cohort_date AS VARCHAR) AS cohort_date,
             CAST(date_diff('day', cohort_date, CAST(e.ts AS DATE)) AS INT)
               AS offset_days,
             CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
      FROM events e JOIN f USING (user_id)
      GROUP BY f.cohort_date, 2
    """,
    "remove_delta_retraction": """
      SELECT event_type,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
             COUNT(event_id) AS n_events
      FROM events WHERE event_id % 2 = 0 GROUP BY 1
    """,
    "interval_overlap_sessions": """
      WITH l AS (
        SELECT user_id, CAST(ts AS DATE) AS d, MIN(ts) AS ls, MAX(ts) AS le
        FROM events GROUP BY 1, 2),
      r AS (
        SELECT event_type, CAST(ts AS DATE) AS d, MIN(ts) AS rs, MAX(ts) AS re
        FROM events GROUP BY 1, 2)
      SELECT l.user_id, r.event_type, CAST(l.d AS VARCHAR) AS d
      FROM l JOIN r ON l.d = r.d AND l.ls <= r.re AND r.rs <= l.le
    """,
    "salted_join_agg": f"""
      SELECT o_orderpriority, CAST({SQL_REV} AS DOUBLE) AS revenue,
             COUNT(*) AS n_lines
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1
    """,
    "skew_aware_user_join": """
      SELECT c_mktsegment, COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM events JOIN customer ON user_id = c_custkey
      GROUP BY 1
    """,
    "bucketed_join_copartition": f"""
      SELECT o_orderpriority, CAST({SQL_REV} AS DOUBLE) AS revenue,
             COUNT(*) AS n_lines, COUNT(DISTINCT o_orderkey) AS n_orders
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1
    """,
    "window_moving_avg": """
      WITH monthly AS (
        SELECT year(o_orderdate) AS o_year, month(o_orderdate) AS o_month,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m
        FROM orders GROUP BY 1, 2)
      SELECT o_year, o_month, CAST(m AS DOUBLE) AS month_total,
             CAST(SUM(m) OVER w AS DOUBLE) / COUNT(*) OVER w AS moving_avg_3m
      FROM monthly
      WINDOW w AS (PARTITION BY o_year ORDER BY o_month
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    "cube_store_roundtrip": f"""
      SELECT r_name, {_MEASURE_SQL}
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY 1
    """,
    "events_sessionize": """
      WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL THEN 1
                    WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1
                    ELSE 0 END AS new_s
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      sess AS (
        SELECT user_id, ts,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged)
      SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
      FROM sess GROUP BY user_id, sid
    """,
    "embedding_near_pairs": """
      WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings),
      n AS (
        SELECT vec_id, vec,
               sqrt(list_sum(list_transform(vec, x -> x * x))) AS nrm
        FROM v)
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             CAST(list_dot_product(a.vec, b.vec) / (a.nrm * b.nrm) AS DOUBLE) AS cosine
      FROM n a JOIN n b ON a.vec_id < b.vec_id
      WHERE list_dot_product(a.vec, b.vec) / (a.nrm * b.nrm) >= 0.4
    """,
    "ann_cosine_topk": """
      WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings),
      n AS (
        SELECT vec_id, vec,
               sqrt(list_sum(list_transform(vec, x -> x * x))) AS nrm
        FROM v),
      scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS match_id,
               list_dot_product(q.vec, c.vec) / (q.nrm * c.nrm) AS cosine
        FROM n q JOIN n c ON q.vec_id < 10 AND q.vec_id <> c.vec_id)
      SELECT query_id, match_id, CAST(cosine AS DOUBLE) AS cosine,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, match_id) AS INT) AS rank
      FROM scored QUALIFY rank <= 5
    """,
    "hll_sketch_regrain": """
      SELECT event_type, COUNT(*) AS n_rows,
             COUNT(DISTINCT user_id) AS n_users_exact,
             TRUE AS union_within_1pct,
             TRUE AS approx_within_5pct
      FROM events GROUP BY 1
    """,
    "vocab_overlap_sources": r"""
      WITH tok AS (
        SELECT source,
               unnest(string_split_regex(TRIM(text), '\s+')) AS token
        FROM documents),
      counts AS (
        SELECT source, token, COUNT(*) AS n
        FROM tok WHERE token <> '' GROUP BY 1, 2),
      vocab AS (
        SELECT source, token FROM counts
        QUALIFY row_number() OVER (PARTITION BY source
                                   ORDER BY n DESC, token ASC) <= 10),
      sizes AS (SELECT source, COUNT(*) AS sz FROM vocab GROUP BY 1),
      inter AS (
        SELECT a.source AS g_a, b.source AS g_b, COUNT(*) AS n_shared
        FROM vocab a JOIN vocab b
          ON a.token = b.token AND a.source < b.source
        GROUP BY 1, 2)
      SELECT g_a, g_b, n_shared,
             CAST(n_shared AS DOUBLE)
               / CAST(sa.sz + sb.sz - n_shared AS DOUBLE) AS jaccard
      FROM inter
      JOIN sizes sa ON sa.source = g_a
      JOIN sizes sb ON sb.source = g_b
    """,
    "topk_sketch_regrain": """
      SELECT event_type, COUNT(*) AS n_rows, 3 AS k,
             TRUE AS counts_match, TRUE AS valid_topk
      FROM events GROUP BY 1
    """,
    "value_drift_psi": """
      WITH e AS (
        SELECT event_type, ts,
               CAST(LEAST(GREATEST(FLOOR((value - 0.0) / 10.0), 0), 59)
                    AS INT) AS bin
        FROM events),
      a AS (SELECT event_type, bin, COUNT(*) AS n FROM e
            WHERE ts < TIMESTAMP '2024-01-15' GROUP BY 1, 2),
      b AS (SELECT event_type, bin, COUNT(*) AS n FROM e
            WHERE ts >= TIMESTAMP '2024-01-15' GROUP BY 1, 2),
      grid AS (
        SELECT t.event_type, s.bin
        FROM (SELECT DISTINCT event_type FROM events) t,
             (SELECT unnest(range(60)) AS bin) s),
      j AS (
        SELECT grid.event_type, grid.bin,
               COALESCE(a.n, 0) AS na, COALESCE(b.n, 0) AS nb
        FROM grid
        LEFT JOIN a ON a.event_type = grid.event_type AND a.bin = grid.bin
        LEFT JOIN b ON b.event_type = grid.event_type AND b.bin = grid.bin),
      tot AS (
        SELECT event_type, SUM(na) AS ta, SUM(nb) AS tb
        FROM j GROUP BY 1)
      SELECT j.event_type,
             ROUND(SUM((GREATEST(na / ta, 1e-6) - GREATEST(nb / tb, 1e-6))
                       * ln(GREATEST(na / ta, 1e-6)
                            / GREATEST(nb / tb, 1e-6))), 6) AS psi
      FROM j JOIN tot ON tot.event_type = j.event_type
      GROUP BY 1
    """,
    "events_anomaly_zscore": """
      WITH daily0 AS (
        SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
        FROM events GROUP BY 1, 2),
      span AS (
        SELECT event_type, MIN(day) AS d0, MAX(day) AS d1
        FROM daily0 GROUP BY 1),
      cal AS (
        SELECT event_type,
               unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                      CAST(d1 AS TIMESTAMP),
                                      INTERVAL 1 DAY)) AS day
        FROM span),
      daily AS (
        SELECT c.event_type, c.day, COALESCE(d.n, 0) AS n_events
        FROM cal c
        LEFT JOIN daily0 d
          ON d.event_type = c.event_type AND CAST(d.day AS TIMESTAMP) = c.day),
      win AS (
        SELECT event_type, day, n_events,
               SUM(CAST(n_events AS DECIMAL(18,6))) OVER w AS s1,
               SUM(CAST(n_events AS DECIMAL(18,6))
                   * CAST(n_events AS DECIMAL(18,6))) OVER w AS s2,
               COUNT(*) OVER w AS n
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
      SELECT event_type, day, n_events,
             CASE WHEN n >= 3 THEN CAST(s1 AS DOUBLE) / n END AS trail_mean,
             CASE WHEN n >= 3 AND (CAST(s2 AS DOUBLE) / n
                   - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)) > 0
                  THEN sqrt(CAST(s2 AS DOUBLE) / n
                   - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
             END AS trail_std,
             CASE WHEN n >= 3 AND (CAST(s2 AS DOUBLE) / n
                   - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)) > 0
                  THEN (n_events - CAST(s1 AS DOUBLE) / n)
                       / sqrt(CAST(s2 AS DOUBLE) / n
                   - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
             END AS zscore
      FROM win
    """,
    "histogram_percentile_regrain": """
      WITH ranked AS (
        SELECT event_type, value AS v,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY value) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events)
      SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_rows,
             CAST(MAX(CASE WHEN rn = GREATEST(CAST(CEIL(0.5 * n) AS BIGINT),
                                              1) THEN v END) AS DOUBLE)
               AS p50_exact,
             CAST(MAX(CASE WHEN rn = GREATEST(CAST(CEIL(0.95 * n) AS BIGINT),
                                              1) THEN v END) AS DOUBLE)
               AS p95_exact,
             TRUE AS p50_within_bin,
             TRUE AS p95_within_bin
      FROM ranked GROUP BY event_type
    """,
    "contrastive_negatives": """
      WITH pool AS (
        SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS pos
        FROM documents),
      cnt AS (SELECT COUNT(*) AS n FROM documents),
      anchors AS (
        SELECT doc_id AS anchor_id, doc_id + 1 AS pos_id
        FROM documents WHERE doc_id % 10 = 0),
      slots AS (
        SELECT DISTINCT anchor_id, s.slot
        FROM anchors, (SELECT unnest(range(12)) AS slot) s),
      cand AS (
        SELECT anchor_id, slot,
               (('0x' || substr(md5('neg' || CAST(anchor_id AS VARCHAR)
                                    || '#' || CAST(slot AS VARCHAR)), 1, 8)
                )::UBIGINT % (SELECT n FROM cnt)) + 1 AS pos
        FROM slots),
      withdoc AS (
        SELECT c.anchor_id, c.slot, p.doc_id
        FROM cand c JOIN pool p ON p.pos = c.pos
        WHERE CAST(p.doc_id AS VARCHAR) <> CAST(c.anchor_id AS VARCHAR)
          AND NOT EXISTS (SELECT 1 FROM anchors a
                          WHERE a.anchor_id = c.anchor_id
                            AND a.pos_id = p.doc_id)),
      first AS (
        SELECT anchor_id, doc_id, MIN(slot) AS slot
        FROM withdoc GROUP BY 1, 2)
      SELECT anchor_id, neg_id, neg_rank FROM (
        SELECT anchor_id, doc_id AS neg_id,
               CAST(row_number() OVER (PARTITION BY anchor_id
                                       ORDER BY slot) AS INT) AS neg_rank
        FROM first)
      WHERE neg_rank <= 4
    """,
    "data_quality_report": """
      WITH counts AS (
        SELECT 'not_null(user_id)' AS rule,
               CAST(COALESCE(SUM(CASE WHEN user_id IS NULL THEN 1 END), 0)
                    AS BIGINT) AS n_violations
        FROM events
        UNION ALL
        SELECT 'in_range(value)',
               CAST(COALESCE(SUM(CASE WHEN value < 0.0 OR value > 100.0
                                      THEN 1 END), 0) AS BIGINT)
        FROM events
        UNION ALL
        SELECT 'predicate(value_nonneg)',
               CAST(COALESCE(SUM(CASE WHEN NOT COALESCE(value >= 0, FALSE)
                                      THEN 1 END), 0) AS BIGINT)
        FROM events
        UNION ALL
        SELECT 'unique(event_id)',
               (SELECT CAST(COALESCE(SUM(c - 1), 0) AS BIGINT)
                FROM (SELECT COUNT(*) AS c FROM events GROUP BY event_id))
        UNION ALL
        SELECT 'foreign_key(user_id)',
               (SELECT CAST(COUNT(*) AS BIGINT) FROM events e
                WHERE user_id IS NOT NULL
                  AND NOT EXISTS (SELECT 1 FROM customer
                                  WHERE c_custkey = e.user_id)))
      SELECT rule, n_violations, (n_violations = 0) AS passed FROM counts
    """,
    "revenue_share_of_region": f"""
      WITH agg AS (
        SELECT n_name, r_name, {SQL_REV} AS rev_dec
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY 1, 2)
      SELECT n_name, r_name, CAST(rev_dec AS DOUBLE) AS revenue,
             CAST(rev_dec AS DOUBLE)
               / CAST(SUM(rev_dec) OVER (PARTITION BY r_name) AS DOUBLE)
               AS share_of_region
      FROM agg
    """,
    "events_gap_fill": """
      WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s
        FROM events GROUP BY 1, 2),
      span AS (
        SELECT event_type, MIN(day) AS d0, MAX(day) AS d1
        FROM daily GROUP BY 1),
      cal AS (
        SELECT event_type,
               unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                      CAST(d1 AS TIMESTAMP),
                                      INTERVAL 1 DAY)) AS day
        FROM span)
      SELECT c.event_type, c.day,
             COALESCE(d.n, 0) AS n_events,
             COALESCE(d.s, 0.0) AS sum_value
      FROM cal c
      LEFT JOIN daily d
        ON d.event_type = c.event_type AND CAST(d.day AS TIMESTAMP) = c.day
    """,
    "scd2_segment_history": _SCD2_HISTORY_SQL,
    "scd2_merge_rebuild": _SCD2_HISTORY_SQL,
    "scd2_dim_stream": _SCD2_HISTORY_SQL,
    "stream_attribution_join": """
      SELECT v.user_id, v.event_id AS view_id, b.event_id AS buy_id,
             b.value
      FROM events v
      JOIN events b
        ON v.user_id = b.user_id
       AND b.ts >= v.ts
       AND b.ts <= v.ts + INTERVAL 30 MINUTE
      WHERE v.event_type = 'view' AND b.event_type = 'purchase'
    """,
    "scd2_temporal_revenue": f"""
      SELECT s.segment, COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_price
      FROM orders o
      JOIN ({_SCD2_DIM_SQL}) s
        ON o.o_custkey = s.c_custkey
       AND o.o_orderdate >= s.valid_from
       AND (s.valid_to IS NULL OR o.o_orderdate < s.valid_to)
      GROUP BY 1
    """,
    # r6 persisted-index trio: exact anti-join / exact Jaccard are
    # directly SQL-expressible; the LSH one reuses the truth-pair-flag
    # invariant form of incremental_minhash_recall
    "dedup_exact_indexed_ingest": f"""
      WITH fp AS (
        SELECT doc_id, md5({_NORM_SQL}) AS content_hash FROM documents)
      SELECT doc_id, content_hash
      FROM fp
      WHERE doc_id % 2 = 1
        AND content_hash NOT IN (
          SELECT content_hash FROM fp WHERE doc_id % 2 = 0)
    """,
    "incremental_prefix_pairs_indexed": _incremental_exact_sql(0.5),
    "incremental_minhash_pairs_indexed": _incremental_truth_sql(0.5),
    "incremental_embedding_pairs_indexed": """
      WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings),
      n AS (
        SELECT vec_id, vec,
               sqrt(list_sum(list_transform(vec, x -> x * x))) AS nrm
        FROM v)
      SELECT b.vec_id AS batch_id, c.vec_id AS corpus_id,
             CAST(list_dot_product(b.vec, c.vec) / (b.nrm * c.nrm)
                  AS DOUBLE) AS cosine,
             TRUE AS lsh_found
      FROM n b JOIN n c ON b.vec_id % 2 = 1 AND c.vec_id % 2 = 0
      WHERE list_dot_product(b.vec, c.vec) / (b.nrm * c.nrm) >= 0.45
    """,
    "embeddings_stream_ingest": """
      SELECT vec_id,
             CAST(sqrt(list_sum(list_transform(
                 embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
               AS DOUBLE) AS nrm,
             TRUE AS stream_eq_batch, TRUE AS target_vec_ok
      FROM embeddings WHERE vec_id % 2 = 1
    """,
    "ann_ivf_topk_indexed": """
      SELECT vec_id AS query_id, CAST(5 AS INT) AS n_exact,
             CAST(5 AS INT) AS n_matches, TRUE AS batch_recall_ok
      FROM embeddings WHERE vec_id < 10
    """,
    "ann_serving_stream": """
      SELECT vec_id AS query_id, CAST(5 AS INT) AS n_exact,
             CAST(5 AS INT) AS n_matches, TRUE AS batch_recall_ok,
             TRUE AS stream_eq_batch
      FROM embeddings WHERE vec_id < 10
    """,
}
