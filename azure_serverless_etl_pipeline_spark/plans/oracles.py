"""DuckDB oracle SQL twins for plans/queries.py.

Every aggregate/computed column is aliased to the same name as the Spark
side, and numeric conventions match exactly (see queries.py docstring):
decimal-exact sums cast to double, double division for means, sequential
double folds for cosine, integer-ratio doubles for Jaccard/text stats.

Queries with engine-specific hashing (minhash/simhash/fingerprint/LSH) or
model scoring have no oracle — the driver records a rows-only check and
pytest covers them against pure-Python references.
"""

from __future__ import annotations


# DuckDB's direct DECIMAL->DOUBLE cast is not correctly rounded (int128 *
# 10^-scale in float math, off by 1 ULP); routing through VARCHAR uses
# strtod, which is correctly rounded and bit-matches Spark's
# BigDecimal.doubleValue.
def _dec2dbl(expr: str) -> str:
    return f"CAST(CAST({expr} AS VARCHAR) AS DOUBLE)"


def _dsum(col: str, alias: str) -> str:
    return f"{_dec2dbl(f'SUM(CAST({col} AS DECIMAL(18,4)))')} AS {alias}"


def _davg(col: str, alias: str) -> str:
    return (
        f"{_dec2dbl(f'SUM(CAST({col} AS DECIMAL(18,4)))')} / COUNT({col}) AS {alias}"
    )


_REVENUE = _dec2dbl(
    "SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * "
    "(CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))"
)


def _cos(a: str, b: str) -> str:
    """Sequential double fold — bit-identical to functions.cosine."""

    def dot(x: str, y: str) -> str:
        return (
            f"list_reduce(list_transform(generate_series(1, len({x})), "
            f"i -> CAST({x}[i] AS DOUBLE) * CAST({y}[i] AS DOUBLE)), "
            f"(acc, v) -> acc + v)"
        )

    return f"({dot(a, b)} / (sqrt({dot(a, a)}) * sqrt({dot(b, b)})))"


_TOKENS = "list_filter(string_split_regex(trim({t}), '\\s+'), x -> x <> '')"

_STOPWORDS_SQL = "('the', 'a', 'of', 'and', 'or', 'in', 'on', 'to', 'is')"


ORACLES: dict[str, str] = {}


ORACLES["g01_scan_filter"] = """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
FROM lineitem
WHERE l_returnflag = 'R'
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
"""

ORACLES["g02_groupby_sum"] = f"""
SELECT l_returnflag, {_dsum('l_quantity', 'sum_qty')}
FROM lineitem GROUP BY l_returnflag
"""

ORACLES["g03_multikey_agg"] = f"""
SELECT l_returnflag, l_linestatus,
       {_dsum('l_quantity', 'sum_qty')},
       {_REVENUE} AS revenue,
       {_davg('l_discount', 'avg_disc')},
       COUNT(DISTINCT l_orderkey) AS n_orders,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""

ORACLES["g04_global_kpis"] = f"""
SELECT {_dsum('l_quantity', 'total_qty')},
       {_REVENUE} AS revenue,
       {_davg('l_extendedprice', 'avg_price')},
       COUNT(*) AS n_rows,
       COUNT(DISTINCT l_partkey) AS n_parts
FROM lineitem
"""

ORACLES["g05_topk"] = f"""
SELECT l_partkey, {_REVENUE} AS revenue
FROM lineitem GROUP BY l_partkey
ORDER BY revenue DESC, l_partkey ASC LIMIT 5
"""

ORACLES["g06_join_global_avg"] = f"""
WITH per_cust AS (
  SELECT o_custkey, o_orderpriority, {_dsum('o_totalprice', 'cust_total')}
  FROM orders GROUP BY o_custkey, o_orderpriority
), gavg AS (
  SELECT o_orderpriority, {_davg('o_totalprice', 'global_avg')}
  FROM orders GROUP BY o_orderpriority
)
SELECT p.o_custkey, p.o_orderpriority, p.cust_total, g.global_avg,
       p.cust_total > g.global_avg AS above_avg
FROM per_cust p JOIN gavg g USING (o_orderpriority)
"""

ORACLES["g07_date_spine"] = f"""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS date, {_dsum('value', 'total_value')}
  FROM events GROUP BY user_id, CAST(ts AS DATE)
), bounds AS (
  SELECT user_id, MIN(date) AS lo, MAX(date) AS hi FROM daily GROUP BY user_id
), spine AS (
  SELECT user_id,
         CAST(UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS date
  FROM bounds
)
SELECT s.user_id, CAST(s.date AS TIMESTAMP) AS date,
       COALESCE(d.total_value, 0.0) AS total_value
FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.date = d.date
"""

ORACLES["g08_rolling_features"] = f"""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS date, {_dsum('value', 'total_value')}
  FROM events GROUP BY user_id, CAST(ts AS DATE)
), bounds AS (
  SELECT user_id, MIN(date) AS lo, MAX(date) AS hi FROM daily GROUP BY user_id
), spine AS (
  SELECT user_id,
         CAST(UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS date
  FROM bounds
), dense AS (
  SELECT s.user_id, s.date, COALESCE(d.total_value, 0.0) AS total_value
  FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.date = d.date
)
SELECT user_id, CAST(date AS TIMESTAMP) AS date, total_value,
       ROUND(AVG(total_value) OVER (
         PARTITION BY user_id ORDER BY date
         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS rolling_7_mean,
       CAST(isodow(date) - 1 AS INTEGER) AS dow
FROM dense
"""

ORACLES["g09_grouping_sets"] = f"""
SELECT COALESCE(l_returnflag, 'ALL') AS rf,
       COALESCE(l_linestatus, 'ALL') AS ls,
       {_dsum('l_quantity', 'sum_qty')},
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""

ORACLES["g10_ingest_validation"] = """
SELECT COUNT(*) AS total_rows,
       COUNT(*) FILTER (
         WHERE value BETWEEN 0 AND 400
           AND CAST(json_extract_string(props, '$.k') AS INTEGER) IS NOT NULL
           AND event_type IS NOT NULL) AS valid_rows,
       COUNT(*) - COUNT(*) FILTER (
         WHERE value BETWEEN 0 AND 400
           AND CAST(json_extract_string(props, '$.k') AS INTEGER) IS NOT NULL
           AND event_type IS NOT NULL) AS skipped_rows
FROM events
"""

ORACLES["x01_dedup_exact"] = """
SELECT text, MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY text
"""

_SHINGLES = f"""
toks AS (
  SELECT doc_id, {_TOKENS.format(t='text')} AS t FROM documents
), idx AS (
  SELECT doc_id, t, UNNEST(generate_series(1, len(t) - 2)) AS i
  FROM toks WHERE len(t) >= 3
), sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
  FROM idx
)
"""

ORACLES["x02_dedup_ngram_jaccard"] = f"""
WITH {_SHINGLES},
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT i.id_a, i.id_b,
       ROUND(CAST(i.n_common AS DOUBLE) / (sa.sz + sb.sz - i.n_common), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.id_a
JOIN sizes sb ON sb.doc_id = i.id_b
WHERE CAST(i.n_common AS DOUBLE) / (sa.sz + sb.sz - i.n_common) >= 0.5
"""

ORACLES["x05_embedding_near_dup"] = f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label AS label,
       ROUND({_cos('a.embedding', 'b.embedding')}, 12) AS cos_sim
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {_cos('a.embedding', 'b.embedding')} >= 0.25
"""

ORACLES["x06_ann_cosine_topk"] = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
scored AS (
  SELECT q.query_id, c.neighbor_id, {_cos('q.qv', 'c.cv')} AS cos_sim
  FROM c, q WHERE c.neighbor_id <> q.query_id
), ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, ROUND(cos_sim, 12) AS cos_sim
FROM ranked WHERE rank <= 5
"""

ORACLES["x07_text_stats"] = f"""
WITH t AS (SELECT doc_id, text, {_TOKENS.format(t='text')} AS toks FROM documents)
SELECT doc_id,
       CAST(len(toks) AS INTEGER) AS n_tokens,
       CAST(length(text) AS INTEGER) AS n_chars_actual,
       ROUND(CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
             / len(toks), 6) AS avg_token_len,
       ROUND(CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
             / length(text), 6) AS alpha_ratio
FROM t
"""

ORACLES["x08_text_quality"] = f"""
WITH t AS (SELECT doc_id, text, {_TOKENS.format(t='text')} AS toks FROM documents),
s AS (
  SELECT doc_id,
         0.5 * (1.0 - CAST(len(list_filter(toks, x -> x IN {_STOPWORDS_SQL})) AS DOUBLE)
                       / len(toks))
         + 0.5 * least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) AS score
  FROM t
)
SELECT doc_id, ROUND(score, 6) AS quality, score >= 0.5 AS is_high_quality FROM s
"""

ORACLES["x09_lang_profile"] = """
SELECT lang, COUNT(*) AS n_docs,
       ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6) AS avg_chars,
       COUNT(DISTINCT source) AS n_sources
FROM documents GROUP BY lang
"""

ORACLES["x10_sessionize"] = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts, value,
         CAST(SUM(new_sess) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       {_dsum('value', 'total_value')}
FROM sess GROUP BY user_id, session_id
"""

ORACLES["x11_event_hourly"] = f"""
SELECT date_trunc('hour', ts) AS hour, event_type,
       COUNT(*) AS n_events,
       {_dsum('value', 'total_value')},
       COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY date_trunc('hour', ts), event_type
"""

ORACLES["x12_ann_ivf_topk"] = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS cell
           FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS neighbor_id, embedding AS cv, label AS cell FROM embeddings),
scored AS (
  SELECT q.query_id, c.neighbor_id, q.cell, {_cos('q.qv', 'c.cv')} AS cos_sim
  FROM c JOIN q USING (cell) WHERE c.neighbor_id <> q.query_id
), ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cell, rank, ROUND(cos_sim, 12) AS cos_sim
FROM ranked WHERE rank <= 5
"""

# x14_lang_id: argmax of marker hits, alphabetical tie-break (matches
# operators.text.lang_id).
_HITS = {
    "de": "('der', 'die', 'und', 'das', 'ist')",
    "en": "('the', 'and', 'of', 'to', 'is')",
    "es": "('el', 'la', 'de', 'que', 'y')",
    "fr": "('le', 'la', 'et', 'les', 'des')",
    "zh": "('的', '了', '是', '我', '在')",
}
_HIT_COLS = ",\n         ".join(
    f"CAST(len(list_filter(toks, x -> x IN {m})) AS INTEGER) AS hits_{lang}"
    for lang, m in sorted(_HITS.items())
)
_BEST = "greatest(" + ", ".join(f"hits_{lang}" for lang in sorted(_HITS)) + ")"
_PICK = "CASE " + " ".join(
    f"WHEN hits_{lang} = {_BEST} THEN '{lang}'" for lang in sorted(_HITS)
) + " END"

ORACLES["x14_lang_id"] = f"""
WITH t AS (SELECT doc_id, {_TOKENS.format(t='text')} AS toks FROM documents),
h AS (
  SELECT doc_id,
         {_HIT_COLS}
  FROM t
)
SELECT doc_id, {_PICK} AS predicted_lang, {_BEST} AS marker_hits FROM h
"""


ORACLES["x16_window_suite"] = """
SELECT o_custkey, o_orderkey,
       CAST(ROW_NUMBER() OVER w AS INTEGER) AS order_seq,
       lag(o_totalprice) OVER w AS prev_price,
       lead(o_totalprice) OVER w AS next_price,
       ROUND(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE), 4)
         AS running_total
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""

ORACLES["x17_pivot_status"] = """
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_pending
FROM orders GROUP BY o_orderpriority
"""

ORACLES["x18_set_ops"] = """
(SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
 INTERSECT
 SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
"""

ORACLES["x19_asof_join"] = """
SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
       (SELECT max(c.ts) FROM events c
        WHERE c.user_id = p.user_id AND c.event_type = 'click'
          AND c.ts <= p.ts) AS last_click_ts
FROM events p WHERE p.event_type = 'purchase'
"""

ORACLES["x20_topk_per_group"] = f"""
WITH agg AS (
  SELECT l_returnflag, l_partkey, {_REVENUE} AS revenue
  FROM lineitem GROUP BY l_returnflag, l_partkey
), ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (
    PARTITION BY l_returnflag ORDER BY revenue DESC, l_partkey ASC) AS INTEGER) AS rk
  FROM agg
)
SELECT l_returnflag, l_partkey, revenue, rk FROM ranked WHERE rk <= 3
"""

ORACLES["x21_price_histogram"] = f"""
SELECT CAST(CASE WHEN o_totalprice < 0.0 THEN 0
            WHEN o_totalprice >= 600000.0 THEN 13
            ELSE CAST(FLOOR(o_totalprice / 50000.0) + 1 AS INTEGER) END AS INTEGER)
         AS bucket,
       COUNT(*) AS n_orders,
       {_dsum('o_totalprice', 'bucket_total')}
FROM orders
GROUP BY 1
"""

ORACLES["x22_dedup_pipeline"] = f"""
WITH {_SHINGLES},
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), pairs AS (
  SELECT i.id_a, i.id_b
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.id_a
  JOIN sizes sb ON sb.doc_id = i.id_b
  WHERE CAST(i.n_common AS DOUBLE) / (sa.sz + sb.sz - i.n_common) >= 0.5
), kept AS (
  SELECT d.* FROM documents d
  WHERE d.doc_id NOT IN (SELECT id_b FROM pairs)
), t AS (
  SELECT doc_id, lang, source, n_chars, text,
         {_TOKENS.format(t='text')} AS toks
  FROM kept
), scored AS (
  SELECT doc_id, lang, source, n_chars,
         0.5 * (1.0 - CAST(len(list_filter(toks, x -> x IN {_STOPWORDS_SQL})) AS DOUBLE)
                       / len(toks))
         + 0.5 * least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) AS score
  FROM t
)
SELECT doc_id, lang, source, n_chars, ROUND(score, 6) AS quality
FROM scored WHERE score >= 0.5
"""

ORACLES["x23_corpus_stats"] = f"""
WITH t AS (
  SELECT doc_id, source, text, {_TOKENS.format(t='text')} AS toks FROM documents
), s AS (
  SELECT doc_id, source, CAST(len(toks) AS INTEGER) AS n_tokens,
         0.5 * (1.0 - CAST(len(list_filter(toks, x -> x IN {_STOPWORDS_SQL})) AS DOUBLE)
                       / len(toks))
         + 0.5 * least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) AS score
  FROM t
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       ROUND(CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*), 6) AS avg_tokens,
       COUNT(*) FILTER (WHERE score >= 0.5) AS n_high_quality
FROM s GROUP BY source
"""


ORACLES["x25_scalar_functions"] = """
WITH parts AS (
  SELECT p_partkey,
         upper(p_name) AS name_upper,
         substr(p_name, 1, 5) AS name_prefix,
         CAST(length(p_name) AS INTEGER) AS name_len,
         p_brand || '-' || p_type AS brand_type,
         regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_devowel,
         ROUND(abs(p_retailprice - 1000.0), 2) AS price_dist,
         CAST(ceil(p_retailprice / 100.0) AS BIGINT) AS price_bucket
  FROM part
), ym AS (
  SELECT COUNT(*) AS n_year_months FROM (
    SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo
    FROM orders GROUP BY 1, 2) t
)
SELECT parts.*, ym.n_year_months FROM parts, ym
"""

ORACLES["x26_json_extraction"] = f"""
SELECT CAST(CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS INTEGER)
         AS k_mod,
       COUNT(*) AS n_events,
       MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS k_min,
       MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS k_max,
       {_dsum('value', 'total_value')}
FROM events
GROUP BY 1
"""


_PD = (
    "CAST(l_extendedprice AS DECIMAL(18,4)) * "
    "(CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))"
)

ORACLES["x27_tpch_q1"] = f"""
SELECT l_returnflag, l_linestatus,
       {_dsum('l_quantity', 'sum_qty')},
       {_dsum('l_extendedprice', 'sum_base_price')},
       {_dec2dbl(f'SUM({_PD})')} AS sum_disc_price,
       {_dec2dbl(f'SUM({_PD} * (CAST(1 AS DECIMAL(18,4)) + CAST(l_tax AS DECIMAL(18,4))))')}
         AS sum_charge,
       {_davg('l_quantity', 'avg_qty')},
       {_davg('l_extendedprice', 'avg_price')},
       {_davg('l_discount', 'avg_disc')},
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

ORACLES["x28_tpch_q3"] = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       {_dec2dbl(f'SUM({_PD})')} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1996-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC LIMIT 10
"""

ORACLES["x29_tpch_q6"] = f"""
SELECT {_dec2dbl('SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4)))')}
         AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


ORACLES["x31_dup_clusters"] = f"""
WITH RECURSIVE {_SHINGLES.strip().lstrip()},
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), pairs AS (
  SELECT i.id_a, i.id_b
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.id_a
  JOIN sizes sb ON sb.doc_id = i.id_b
  WHERE CAST(i.n_common AS DOUBLE) / (sa.sz + sb.sz - i.n_common) >= 0.5
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
), reach(node, label) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node
)
SELECT node AS doc_id, MIN(label) AS cluster_id FROM reach GROUP BY node
"""


ORACLES["x32_session_window"] = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         -- >= (not >): Spark's session_window end is EXCLUSIVE — an event
         -- arriving exactly `gap` after the last one starts a NEW session.
         -- x10's lag/cumsum splits only on gap > 30min; the two operators
         -- deliberately differ on that boundary.
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts, value,
         SUM(new_sess) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events,
       {_dsum('value', 'total_value')}
FROM sess GROUP BY user_id, session_id
"""

ORACLES["x33_tpch_q5"] = f"""
SELECT n_name, {_dec2dbl(f'SUM({_PD})')} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC
"""

ORACLES["x34_tpch_q18"] = f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       {_dsum('l_quantity', 'sum_qty')}
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 300
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 100
"""

ORACLES["x35_attribution_join"] = f"""
SELECT a.event_id AS click_id, a.user_id, a.ts AS click_ts,
       COUNT(b.buy_ts) AS n_purchases,
       {_dsum('b.buy_value', 'attributed_value')}
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') a
LEFT JOIN (SELECT user_id, ts AS buy_ts, value AS buy_value
           FROM events WHERE event_type = 'purchase') b
  ON a.user_id = b.user_id
 AND b.buy_ts > a.ts
 AND b.buy_ts <= a.ts + INTERVAL 1 HOUR
GROUP BY a.event_id, a.user_id, a.ts
"""


def _hash_bucket(key: str) -> str:
    """DuckDB twin of operators/sampling.hash_bucket: fold the first 8 hex
    chars of md5 into a BIGINT, mod 100."""
    return (
        f"(list_reduce(list_transform("
        f"string_split(substr(md5(CAST({key} AS VARCHAR)), 1, 8), ''), "
        f"x -> CASE WHEN x BETWEEN '0' AND '9' THEN CAST(x AS BIGINT) "
        f"ELSE 10 + ascii(x) - ascii('a') END), (a, b) -> a * 16 + b) % 100)"
    )


ORACLES["x36_tfidf_top_terms"] = f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKENS.format(t='text')}) AS term FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
), dfreq AS (
  SELECT term, COUNT(*) AS doc_freq FROM tf GROUP BY term
), n AS (
  SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.doc_freq,
         ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / doc_freq), 6) AS tfidf
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, doc_freq, tfidf,
       CAST(row_number() OVER (
         PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS INTEGER) AS rank
FROM scored
QUALIFY rank <= 3
"""

ORACLES["x37_deterministic_split"] = f"""
WITH b AS (
  SELECT n_chars, {_hash_bucket('doc_id')} AS bucket,
         CASE WHEN {_hash_bucket('doc_id')} < 80 THEN 'train'
              WHEN {_hash_bucket('doc_id')} < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT split, COUNT(*) AS n_docs,
       MIN(bucket) AS min_bucket, MAX(bucket) AS max_bucket,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM b GROUP BY split
"""

ORACLES["x38_stratified_sample"] = f"""
WITH rates AS (
  SELECT * FROM (VALUES ('en', 0.25), ('de', 0.5), ('fr', 0.5),
                        ('es', 1.0), ('zh', 1.0)) AS t(lang, keep_rate)
)
SELECT d.lang, COUNT(*) AS n_kept, COUNT(DISTINCT d.source) AS n_sources
FROM documents d
JOIN rates r ON d.lang = r.lang
WHERE {_hash_bucket('d.doc_id')} < r.keep_rate * 100
GROUP BY d.lang
"""

ORACLES["x39_decile_stats"] = f"""
WITH ranked AS (
  SELECT o_orderpriority, o_totalprice,
         CAST(ntile(10) OVER (
           PARTITION BY o_orderpriority
           ORDER BY o_totalprice, o_orderkey) AS INTEGER) AS decile
  FROM orders
)
SELECT o_orderpriority, decile, COUNT(*) AS n_orders,
       MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
       {_dsum('o_totalprice', 'total_price')}
FROM ranked GROUP BY o_orderpriority, decile
"""


ORACLES["x40_bigram_counts"] = (
    "WITH t AS (SELECT "
    + _TOKENS.format(t="text")
    + """ AS toks FROM documents),
pl AS (
  SELECT list_transform(generate_series(1, len(toks) - 1),
                        i -> struct_pack(w1 := toks[i], w2 := toks[i + 1])) AS ps
  FROM t WHERE len(toks) >= 2
), pairs AS (SELECT unnest(ps) AS p FROM pl)
SELECT p.w1 AS w1, p.w2 AS w2, COUNT(*) AS n FROM pairs GROUP BY w1, w2
"""
)

# Same regexes as operators/text.redact_pii (Java regex and RE2 agree on
# this subset: char classes, \\b, \\d, {m,n} quantifiers).
_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE_RE = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

ORACLES["x41_redact_pii"] = """
WITH planted AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or call 555-'
              || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
  FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(text, '__EMAIL__')) AS n_emails,
       len(regexp_extract_all(text, '__PHONE__')) AS n_phones,
       regexp_replace(regexp_replace(text, '__EMAIL__', '[EMAIL]', 'g'),
                      '__PHONE__', '[PHONE]', 'g') AS text
FROM planted
""".replace("__EMAIL__", _EMAIL_RE).replace("__PHONE__", _PHONE_RE)

ORACLES["x42_dup_ngram_ratio"] = (
    "WITH t AS (SELECT doc_id, "
    + _TOKENS.format(t="text")
    + """ AS toks FROM documents),
g AS (
  SELECT doc_id,
         list_transform(generate_series(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i + 1]) AS grams
  FROM t
)
SELECT doc_id,
       len(grams) AS n_bigrams,
       len(list_distinct(grams)) AS n_distinct_bigrams,
       CASE WHEN len(grams) > 0
            THEN ROUND(1 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams), 6)
            ELSE 0.0 END AS dup_ratio
FROM g
"""
)


ORACLES["x43_tpch_q10"] = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       {_dec2dbl(f'SUM({_PD})')} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""

ORACLES["x44_tpch_q14"] = f"""
SELECT 100.0 * {_dec2dbl(f"SUM(CASE WHEN p_type = 'PROMO' THEN {_PD} END)")}
             / {_dec2dbl(f'SUM({_PD})')} AS promo_revenue_pct
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01'
  AND l_shipdate <  TIMESTAMP '1996-10-01'
"""


ORACLES["x45_incremental_dedup"] = """
WITH existing AS (
  SELECT md5(text) AS fp FROM documents WHERE doc_id < 250
), new_batch AS (
  SELECT doc_id, lang, md5(text) AS fp FROM documents WHERE doc_id >= 250
)
SELECT lang, COUNT(*) AS n_new_unique, MIN(doc_id) AS first_doc_id
FROM new_batch n
WHERE NOT EXISTS (SELECT 1 FROM existing e WHERE e.fp = n.fp)
GROUP BY lang
"""

# x83: dual-regime token counts. The BPE-ish pattern is the
# lookahead-free subset both Java regex (Spark) and RE2 (DuckDB) run
# with identical leftmost-first alternation; the SQL literal below must
# stay in sync with operators/text.BPE_SPLIT_RE ('' = escaped quote).
ORACLES["x83_token_counts"] = (
    "WITH t AS (SELECT doc_id, text, "
    + _TOKENS.format(t="text")
    + r""" AS toks,
  len(regexp_extract_all(text,
      '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9'']+'))
    AS n_bpe
  FROM documents)
SELECT doc_id, CAST(len(toks) AS INT) AS n_ws_tokens,
       CAST(n_bpe AS INT) AS n_bpe_tokens,
       ROUND(CASE WHEN n_bpe > 0
                  THEN CAST(len(text) AS DOUBLE) / n_bpe ELSE 0.0 END, 6)
         AS chars_per_bpe_token
FROM t ORDER BY doc_id
"""
)

# x82: PMI collocations. Sum-of-logs form matches text.bigram_pmi
# term-for-term (ln of BIGINT counts is correctly-rounded double in both
# engines, per the x36/x72 convention); (pmi desc, w1, w2) is a total
# order so the LIMIT cut is deterministic.
ORACLES["x82_bigram_pmi"] = (
    "WITH t AS (SELECT "
    + _TOKENS.format(t="text")
    + """ AS toks FROM documents),
uni AS (SELECT unnest(toks) AS w FROM t),
uc AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY w),
nu AS (SELECT CAST(SUM(c) AS BIGINT) AS n_uni FROM uc),
pl AS (
  SELECT list_transform(generate_series(1, len(toks) - 1),
                        i -> struct_pack(w1 := toks[i], w2 := toks[i + 1])) AS ps
  FROM t WHERE len(toks) >= 2
), pairs AS (SELECT unnest(ps) AS p FROM pl),
bc AS (SELECT p.w1 AS w1, p.w2 AS w2, COUNT(*) AS n FROM pairs GROUP BY w1, w2),
nb AS (SELECT CAST(SUM(n) AS BIGINT) AS n_bi FROM bc)
SELECT w1, w2, n AS n_ab,
       ROUND(ln(n) + 2 * ln(n_uni) - ln(n_bi) - ln(c1.c) - ln(c2.c), 6) AS pmi
FROM bc
JOIN uc c1 ON bc.w1 = c1.w
JOIN uc c2 ON bc.w2 = c2.w
CROSS JOIN nu CROSS JOIN nb
WHERE n >= 3
ORDER BY pmi DESC, w1, w2
LIMIT 50
"""
)

# x81: SCD2 merge over the customer dimension. Update batch: every 7th
# key gets +100.0 acctbal (every 14th re-sends identical attrs -> no-op),
# every 50th key re-appears shifted +1e6 as an unseen key. Open rows with
# changed attrs close at the update ts and re-open as a new version.
ORACLES["x81_scd2_merge"] = """
WITH cur AS (
  SELECT c_custkey, c_acctbal, c_mktsegment,
         TIMESTAMP '1990-01-01' AS valid_from,
         CAST(NULL AS TIMESTAMP) AS valid_to
  FROM customer
), upd AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 14 = 0 THEN c_acctbal
              ELSE c_acctbal + 100.0 END AS c_acctbal,
         c_mktsegment, TIMESTAMP '2024-01-01' AS ts
  FROM customer WHERE c_custkey % 7 = 0
  UNION ALL
  SELECT c_custkey + 1000000, c_acctbal, c_mktsegment,
         TIMESTAMP '2024-01-01'
  FROM customer WHERE c_custkey % 50 = 0
), changed AS (
  SELECT cur.c_custkey
  FROM cur JOIN upd USING (c_custkey)
  WHERE NOT (cur.c_acctbal IS NOT DISTINCT FROM upd.c_acctbal
         AND cur.c_mktsegment IS NOT DISTINCT FROM upd.c_mktsegment)
)
SELECT cur.c_custkey, cur.c_acctbal, cur.c_mktsegment, cur.valid_from,
       CASE WHEN ch.c_custkey IS NOT NULL
            THEN TIMESTAMP '2024-01-01' END AS valid_to
FROM cur LEFT JOIN changed ch ON cur.c_custkey = ch.c_custkey
UNION ALL
SELECT upd.c_custkey, upd.c_acctbal, upd.c_mktsegment,
       TIMESTAMP '2024-01-01' AS valid_from,
       CAST(NULL AS TIMESTAMP) AS valid_to
FROM upd JOIN changed USING (c_custkey)
UNION ALL
SELECT upd.c_custkey, upd.c_acctbal, upd.c_mktsegment,
       TIMESTAMP '2024-01-01' AS valid_from,
       CAST(NULL AS TIMESTAMP) AS valid_to
FROM upd WHERE upd.c_custkey NOT IN (SELECT c_custkey FROM cur)
ORDER BY c_custkey, valid_from
"""

# x80 routes the same anti-join through a Bloom prune + exact verify —
# the output is contractually identical (no false negatives, false
# positives removed by the verify join), so it shares x45's oracle.
ORACLES["x80_bloom_incremental_dedup"] = ORACLES["x45_incremental_dedup"]

ORACLES["x46_quality_filter"] = (
    "WITH t AS (SELECT doc_id, lang, text, "
    + _TOKENS.format(t="text")
    + """ AS toks FROM documents),
r AS (
  SELECT doc_id, lang,
         len(toks) BETWEEN 10 AND 1000 AS ok_length,
         CAST(len(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
           / len(text) >= 0.6 AS ok_alpha,
         len(list_filter(toks, x -> x IN """
    + _STOPWORDS_SQL
    + """)) >= 1 AS ok_stopwords,
         CASE WHEN len(toks) >= 2 THEN
           1 - CAST(len(list_distinct(list_transform(
                 generate_series(1, len(toks) - 1),
                 i -> toks[i] || ' ' || toks[i + 1]))) AS DOUBLE)
             / (len(toks) - 1)
         ELSE 0.0 END <= 0.5 AS ok_repetition
  FROM t
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(CAST(ok_length AS INT)) AS BIGINT) AS pass_length,
       CAST(SUM(CAST(ok_alpha AS INT)) AS BIGINT) AS pass_alpha,
       CAST(SUM(CAST(ok_stopwords AS INT)) AS BIGINT) AS pass_stopwords,
       CAST(SUM(CAST(ok_repetition AS INT)) AS BIGINT) AS pass_repetition,
       CAST(SUM(CAST((ok_length AND ok_alpha AND ok_stopwords
                      AND ok_repetition) AS INT)) AS BIGINT) AS pass_all
FROM r GROUP BY lang
"""
)


ORACLES["x47_heavy_hitters"] = (
    "WITH tok AS (SELECT doc_id, unnest("
    + _TOKENS.format(t="text")
    + """) AS token FROM documents)
SELECT token, COUNT(*) AS n_occurrences, COUNT(DISTINCT doc_id) AS n_docs
FROM tok GROUP BY token
ORDER BY n_occurrences DESC, token
LIMIT 20
"""
)

ORACLES["x48_cross_source_overlap"] = (
    "WITH toks AS (SELECT source, "
    + _TOKENS.format(t="text")
    + """ AS t FROM documents),
idx AS (
  SELECT source, t, UNNEST(generate_series(1, len(t) - 2)) AS i
  FROM toks WHERE len(t) >= 3
), sh AS (
  SELECT DISTINCT source, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
  FROM idx
)
SELECT a.source AS source_a, b.source AS source_b,
       COUNT(*) AS n_shared_shingles
FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
GROUP BY a.source, b.source
"""
)


ORACLES["x49_exact_percentiles"] = """
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.5) AS p50,
       quantile_cont(l_extendedprice, 0.9) AS p90,
       quantile_cont(l_extendedprice, 0.99) AS p99,
       COUNT(*) AS n
FROM lineitem GROUP BY l_returnflag
"""

ORACLES["x50_user_adoption"] = """
WITH first_seen AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day FROM events GROUP BY user_id
), daily_new AS (
  SELECT first_day, COUNT(*) AS new_users FROM first_seen GROUP BY first_day
)
SELECT CAST(first_day AS TIMESTAMP) AS day, new_users,
       CAST(SUM(new_users) OVER (ORDER BY first_day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cumulative_users
FROM daily_new
"""


ORACLES["x51_full_outer_reconcile"] = f"""
WITH clicks AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_clicks
  FROM events WHERE event_type = 'click' GROUP BY CAST(ts AS DATE)
), buys AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_purchases,
         {_dsum('value', 'purchase_value')}
  FROM events WHERE event_type = 'purchase' GROUP BY CAST(ts AS DATE)
)
SELECT CAST(COALESCE(c.day, b.day) AS TIMESTAMP) AS day,
       COALESCE(n_clicks, 0) AS n_clicks,
       COALESCE(n_purchases, 0) AS n_purchases,
       COALESCE(purchase_value, 0.0) AS purchase_value
FROM clicks c FULL OUTER JOIN buys b ON c.day = b.day
"""


# ---------------------------------------------------------------------------
# EXTRA_ORACLES: SQL for queries whose registry slot sits past the driver's
# 50-entry correctness window; pytest (tests/test_queries_oracle.py,
# sf0.001) asserts these instead of the driver. Which dict an oracle is
# registered into here is cosmetic — the final block below re-partitions
# ORACLES/EXTRA_ORACLES from queries.DRIVER_WINDOW, so the two files
# cannot drift when the window rotates.
# ---------------------------------------------------------------------------

EXTRA_ORACLES: dict[str, str] = {}
# bucketed-layout variant computes the same result as x34 (only the
# physical layout differs); pytest asserts it against the same SQL
EXTRA_ORACLES["x34_bucketed_q18"] = ORACLES["x34_tpch_q18"]


# ---------------------------------------------------------------------------
# x52.. — TPC-H suite completion (adapted to the trimmed schema; see the
# matching queries.py docstrings for each substitution). Registered past
# the driver window -> pytest parity at sf0.001.
# ---------------------------------------------------------------------------

EXTRA_ORACLES["x52_tpch_q4"] = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-07-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

EXTRA_ORACLES["x53_tpch_q7"] = f"""
SELECT supp_nation, cust_nation, l_year, {_dec2dbl("SUM(volume)")} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(year FROM l_shipdate) AS l_year, {_PD} AS volume
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""

EXTRA_ORACLES["x54_tpch_q8"] = f"""
SELECT EXTRACT(year FROM o_orderdate) AS o_year,
       {_dec2dbl("SUM(CASE WHEN n2.n_name = 'NATION_5' THEN " + _PD +
                 " ELSE CAST(0 AS DECIMAL(18,4)) END)")}
     / {_dec2dbl(f"SUM({_PD})")} AS mkt_share
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY o_year
ORDER BY o_year
"""

EXTRA_ORACLES["x55_tpch_q12"] = """
SELECT CASE WHEN datediff('day', CAST(o_orderdate AS DATE),
                          CAST(l_shipdate AS DATE)) <= 30 THEN 'FAST'
            WHEN datediff('day', CAST(o_orderdate AS DATE),
                          CAST(l_shipdate AS DATE)) <= 90 THEN 'NORMAL'
            ELSE 'SLOW' END AS delay_bucket,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY delay_bucket
ORDER BY delay_bucket
"""

EXTRA_ORACLES["x56_tpch_q13"] = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""

EXTRA_ORACLES["x57_tpch_q15"] = f"""
WITH revenue AS (
  SELECT l_suppkey,
         SUM({_PD}) AS rev_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, {_dec2dbl("rev_dec")} AS total_revenue
FROM supplier
JOIN revenue ON s_suppkey = l_suppkey
WHERE rev_dec = (SELECT MAX(rev_dec) FROM revenue)
ORDER BY s_suppkey
"""

EXTRA_ORACLES["x58_tpch_q17"] = f"""
WITH sel AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#23'
), withavg AS (
  SELECT l_quantity, l_extendedprice,
         {_dec2dbl("SUM(CAST(l_quantity AS DECIMAL(18,4))) OVER (PARTITION BY l_partkey)")}
           / COUNT(l_quantity) OVER (PARTITION BY l_partkey) AS avg_qty
  FROM sel
)
SELECT {_dec2dbl("SUM(CAST(l_extendedprice AS DECIMAL(18,4)))")} / 7.0 AS avg_yearly
FROM withavg
WHERE l_quantity < 0.2 * avg_qty
"""

EXTRA_ORACLES["x59_tpch_q19"] = f"""
SELECT {_dec2dbl(f'SUM({_PD})')} AS revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
"""

EXTRA_ORACLES["x60_tpch_q21"] = """
SELECT s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l1.l_orderkey = o_orderkey
WHERE o_orderstatus = 'F' AND n_name = 'NATION_3'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > l1.l_shipdate
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
"""

EXTRA_ORACLES["x61_tpch_q22"] = f"""
WITH sel AS (
  SELECT * FROM customer
  WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
), avg_bal AS (
  SELECT {_dec2dbl("SUM(CAST(c_acctbal AS DECIMAL(18,4)))")} / COUNT(c_acctbal)
           AS avg_bal
  FROM sel WHERE c_acctbal > 0
)
SELECT c_mktsegment, COUNT(*) AS numcust, {_dsum('c_acctbal', 'totacctbal')}
FROM sel, avg_bal
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '2000-01-01'
  )
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""

# supplier-part relation derived from lineitem (no partsupp in testdata);
# min observed unit price = the supply-cost stand-in (see queries.py)
_SUPPLIER_PART = """
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
"""

EXTRA_ORACLES["x62_tpch_q2"] = f"""
WITH sp AS ({_SUPPLIER_PART}),
eur AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
spe AS (
  SELECT sp.*, eur.s_name, eur.s_acctbal, eur.n_name,
         MIN(unit_cost) OVER (PARTITION BY l_partkey) AS min_cost
  FROM sp JOIN eur ON sp.l_suppkey = eur.s_suppkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
FROM spe
JOIN part ON l_partkey = p_partkey
WHERE unit_cost = min_cost
  AND p_type = 'STANDARD' AND p_size IN (15, 25, 35)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""

EXTRA_ORACLES["x63_tpch_q9"] = f"""
SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
       {_dec2dbl(f'SUM({_PD})')}
     - {_dec2dbl("SUM(CAST(p_retailprice AS DECIMAL(18,4))"
                 " * CAST(0.6 AS DECIMAL(2,1))"
                 " * CAST(l_quantity AS DECIMAL(4,0)))")} AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, o_year
ORDER BY nation, o_year DESC
"""

EXTRA_ORACLES["x64_tpch_q11"] = f"""
WITH per_part AS (
  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS val_dec
  FROM lineitem
  WHERE l_suppkey IN (
    SELECT s_suppkey FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3'
  )
  GROUP BY l_partkey
)
SELECT l_partkey, {_dec2dbl("val_dec")} AS part_value
FROM per_part
CROSS JOIN (
  SELECT {_dec2dbl("SUM(val_dec)")} AS tot, COUNT(*) AS n_parts FROM per_part
) t
WHERE {_dec2dbl("val_dec")} * n_parts > 2.0 * tot
ORDER BY part_value DESC, l_partkey
"""

EXTRA_ORACLES["x65_tpch_q16"] = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) sp
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000
  )
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""

EXTRA_ORACLES["x66_tpch_q20"] = """
WITH vol AS (
  SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sq
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%')
  GROUP BY l_partkey, l_suppkey
),
tot AS (SELECT l_partkey, SUM(sq) AS tq FROM vol GROUP BY l_partkey)
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_9'
  AND s_suppkey IN (
    SELECT v.l_suppkey FROM vol v JOIN tot t ON v.l_partkey = t.l_partkey
    WHERE v.sq * 2 > t.tq
  )
ORDER BY s_name
"""


# md5 bucket with a parameterized modulus (twin of sampling.hash_bucket)
def _hash_bucket_mod(key: str, buckets: int) -> str:
    return (
        f"(list_reduce(list_transform("
        f"string_split(substr(md5(CAST({key} AS VARCHAR)), 1, 8), ''), "
        f"x -> CASE WHEN x BETWEEN '0' AND '9' THEN CAST(x AS BIGINT) "
        f"ELSE 10 + ascii(x) - ascii('a') END), (a, b) -> a * 16 + b) % {buckets})"
    )


EXTRA_ORACLES["x67_chunk_documents"] = f"""
WITH toks AS (
  SELECT doc_id, {_TOKENS.format(t='text')} AS t FROM documents
), sized AS (
  SELECT doc_id, t, len(t) AS n_tokens FROM toks WHERE len(t) >= 1
), exploded AS (
  SELECT doc_id, n_tokens, t,
         UNNEST(generate_series(0, n_tokens - 1, 24)) AS chunk_start
  FROM sized
)
SELECT doc_id, n_tokens,
       CAST(chunk_start / 24 AS INTEGER) AS chunk_id,
       chunk_start,
       len(t[chunk_start + 1 : chunk_start + 32]) AS chunk_len,
       array_to_string(t[chunk_start + 1 : chunk_start + 32], ' ') AS chunk_text
FROM exploded
ORDER BY doc_id, chunk_id
"""

EXTRA_ORACLES["x68_pack_sequences"] = f"""
WITH sharded AS (
  SELECT doc_id,
         {_hash_bucket_mod('doc_id', 8)} AS shard,
         len({_TOKENS.format(t='text')}) AS n_tokens
  FROM documents
), offsets AS (
  SELECT doc_id, shard, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
           PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS start_offset
  FROM sharded
)
SELECT doc_id, shard, n_tokens, start_offset,
       CAST(FLOOR(CAST(start_offset AS DOUBLE) / 256) AS BIGINT) AS seq_id
FROM offsets
ORDER BY doc_id
"""

EXTRA_ORACLES["x69_mixture_sample"] = f"""
WITH targets (source, target_w) AS (
  VALUES ('src0', 0.5), ('src1', 0.3), ('src2', 0.2)
), counts AS (
  SELECT source, COUNT(*) AS n_source FROM documents GROUP BY source
), j AS (
  SELECT c.source, c.n_source, t.target_w
  FROM counts c JOIN targets t ON c.source = t.source
), scale AS (
  SELECT MIN(CAST(n_source AS DOUBLE) / target_w) AS scale FROM j
), rates AS (
  SELECT source, n_source, target_w * scale.scale / n_source AS keep_rate
  FROM j, scale
)
SELECT d.source, COUNT(*) AS n_kept,
       ANY_VALUE(r.n_source) AS n_source,
       ROUND(ANY_VALUE(r.keep_rate), 6) AS keep_rate
FROM documents d
JOIN rates r ON d.source = r.source
WHERE {_hash_bucket_mod('d.doc_id', 10000)} < r.keep_rate * 10000
GROUP BY d.source
ORDER BY d.source
"""


# single-scan Q21 variant computes the same result as x60 (only the
# physical plan differs); pytest asserts it against the same EXISTS SQL
EXTRA_ORACLES["x70_tpch_q21_onescan"] = EXTRA_ORACLES["x60_tpch_q21"]


def _profile_branch(col: str, kind: str) -> str:
    """One UNION branch of the x71 table-profile oracle. kind: num |
    str (length ranges) | ts (epoch-microsecond ranges)."""
    rng = {
        "num": (f"MIN({col})", f"MAX({col})"),
        "str": (f"MIN(length({col}))", f"MAX(length({col}))"),
        "ts": (f"MIN(epoch_us({col}))", f"MAX(epoch_us({col}))"),
    }[kind]
    return f"""
  SELECT '{col}' AS "column", COUNT(*) AS n_rows,
         CAST(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_nulls,
         COUNT(DISTINCT {col}) AS n_distinct,
         CAST({rng[0]} AS DOUBLE) AS min_val,
         CAST({rng[1]} AS DOUBLE) AS max_val
  FROM lineitem"""


_LINEITEM_KINDS = [
    ("l_orderkey", "num"), ("l_partkey", "num"), ("l_suppkey", "num"),
    ("l_linenumber", "num"), ("l_quantity", "num"),
    ("l_extendedprice", "num"), ("l_discount", "num"), ("l_tax", "num"),
    ("l_returnflag", "str"), ("l_linestatus", "str"), ("l_shipdate", "ts"),
]

EXTRA_ORACLES["x71_table_profile"] = (
    "\nUNION ALL\n".join(_profile_branch(c, k) for c, k in _LINEITEM_KINDS)
    + '\nORDER BY "column"'
)

EXTRA_ORACLES["x72_unigram_logprob"] = f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKENS.format(t='text')}) AS term FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
), freq AS (
  SELECT term, CAST(SUM(tf) AS BIGINT) AS c FROM tf GROUP BY term
), total AS (
  SELECT CAST(SUM(c) AS BIGINT) AS t_total FROM freq
), contrib AS (
  SELECT doc_id, tf.tf,
         CAST(ROUND(tf.tf * ln(CAST(t_total AS DOUBLE) / c), 8)
              AS DECIMAL(18,8)) AS w
  FROM tf JOIN freq USING (term) CROSS JOIN total
)
SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
       ROUND({_dec2dbl("SUM(w)")} / CAST(SUM(tf) AS BIGINT), 6)
         AS avg_neg_logprob
FROM contrib GROUP BY doc_id ORDER BY doc_id
"""

# x73: corpus-level span dedup. The chunk list is built identically on both
# sides (aligned non-overlapping 10-token spans, 1-based inclusive slices);
# DuckDB zips unnest(chunks) with generate_subscripts for the position.
EXTRA_ORACLES["x73_line_dedup"] = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
), cl AS (
  SELECT doc_id, list_transform(range(CAST(ceil(len(ts)/10.0) AS BIGINT)),
         i -> array_to_string(ts[i*10+1 : i*10+10], ' ')) AS chunks
  FROM toks
), ex AS (
  SELECT doc_id, unnest(chunks) AS line,
         generate_subscripts(chunks, 1) - 1 AS pos
  FROM cl
), dup AS (
  SELECT line FROM ex GROUP BY line HAVING COUNT(DISTINCT doc_id) >= 2
), kept AS (
  SELECT e.doc_id, e.line, e.pos FROM ex e ANTI JOIN dup d USING (line)
)
SELECT c.doc_id,
       COALESCE(string_agg(k.line, ' ' ORDER BY k.pos), '') AS text,
       CAST(len(c.chunks) AS BIGINT) AS n_lines,
       CAST(len(c.chunks) - COUNT(k.line) AS BIGINT) AS n_removed
FROM cl c LEFT JOIN kept k USING (doc_id)
GROUP BY c.doc_id, len(c.chunks)
"""

# x74: connected components over the exact embedding-cosine pair list
# (same recursive-CTE shape as x31, pairs from the x05 oracle SQL).
EXTRA_ORACLES["x74_embedding_dup_clusters"] = f"""
WITH RECURSIVE pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE {_cos('a.embedding', 'b.embedding')} >= 0.25
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
), reach(node, label) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node
)
SELECT node AS vec_id, MIN(label) AS cluster_id FROM reach GROUP BY node
"""

# x79b: the full SemDeDup downstream with a SQL-expressible coarse
# quantizer (4 sign-bit hyperplanes -> 16 cells): cells, within-cell
# cosine pairs, recursive-CTE components, min-id representative and the
# kept rule all reproduced here, so the driver hash pins what x79's
# rows-only check (engine-specific k-means cells) cannot.
EXTRA_ORACLES["x79b_semantic_dedup_hyperplane"] = f"""
WITH RECURSIVE cells AS (
  SELECT vec_id, embedding,
         (CASE WHEN embedding[1] >= 0 THEN 8 ELSE 0 END
        + CASE WHEN embedding[2] >= 0 THEN 4 ELSE 0 END
        + CASE WHEN embedding[3] >= 0 THEN 2 ELSE 0 END
        + CASE WHEN embedding[4] >= 0 THEN 1 ELSE 0 END) AS cell
  FROM embeddings
), pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE {_cos('a.embedding', 'b.embedding')} >= 0.25
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
), reach(node, label) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node
), clus AS (
  SELECT node AS vec_id, MIN(label) AS cluster_id FROM reach GROUP BY node
)
SELECT e.vec_id,
       COALESCE(c.cluster_id, e.vec_id) AS cluster_id,
       e.vec_id = COALESCE(c.cluster_id, e.vec_id) AS kept
FROM embeddings e LEFT JOIN clus c USING (vec_id)
ORDER BY e.vec_id
"""


# x84: benchmark decontamination — distinct 5-gram semi-join of the
# training slice (doc_id % 10 <> 0) against the eval slice's gram set.
EXTRA_ORACLES["x84_decontaminate"] = f"""
WITH toks AS (
  SELECT doc_id, {_TOKENS.format(t='text')} AS t FROM documents
), idx AS (
  SELECT doc_id, t, UNNEST(generate_series(1, len(t) - 4)) AS i
  FROM toks WHERE len(t) >= 5
), sh AS (
  SELECT DISTINCT doc_id,
         t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4] AS gram
  FROM idx
), ev AS (SELECT DISTINCT gram FROM sh WHERE doc_id % 10 = 0)
SELECT s.doc_id, COUNT(*) AS n_shared_grams
FROM sh s JOIN ev USING (gram)
WHERE s.doc_id % 10 <> 0
GROUP BY s.doc_id
"""

# x85: Gopher repetition suite. Relational twin of the map-only HOF
# computation: top bigram by (count DESC, gram ASC), positional fraction,
# and the duplicate-5-gram position fraction. Integer-ratio doubles.
EXTRA_ORACLES["x85_repetition_stats"] = f"""
WITH toks AS (
  SELECT doc_id, {_TOKENS.format(t='text')} AS t FROM documents
), g2 AS (
  SELECT doc_id, t[i] || ' ' || t[i+1] AS gram
  FROM (SELECT doc_id, t, UNNEST(generate_series(1, len(t) - 1)) AS i
        FROM toks WHERE len(t) >= 2)
), c2 AS (
  SELECT doc_id, gram, COUNT(*) AS c FROM g2 GROUP BY doc_id, gram
), top2 AS (
  SELECT doc_id, gram, c FROM (
    SELECT doc_id, gram, c, ROW_NUMBER() OVER (
      PARTITION BY doc_id ORDER BY c DESC, gram ASC) AS rn FROM c2
  ) WHERE rn = 1
), n2 AS (
  SELECT doc_id, COUNT(*) AS n_bigrams FROM g2 GROUP BY doc_id
), g5 AS (
  SELECT doc_id,
         t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4] AS gram
  FROM (SELECT doc_id, t, UNNEST(generate_series(1, len(t) - 4)) AS i
        FROM toks WHERE len(t) >= 5)
), d5 AS (
  SELECT doc_id, SUM(c) AS n5, SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS ndup
  FROM (SELECT doc_id, gram, COUNT(*) AS c FROM g5 GROUP BY doc_id, gram)
  GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(n2.n_bigrams, 0) AS n_bigrams,
       top2.gram AS top_bigram,
       COALESCE(top2.c, 0) AS top_bigram_count,
       COALESCE(ROUND(CAST(top2.c AS DOUBLE) / n2.n_bigrams, 6), 0.0) AS top_bigram_frac,
       COALESCE(ROUND(CAST(d5.ndup AS DOUBLE) / d5.n5, 6), 0.0) AS dup_5gram_frac
FROM documents d
LEFT JOIN n2 USING (doc_id)
LEFT JOIN top2 USING (doc_id)
LEFT JOIN d5 USING (doc_id)
"""

# x86: hashed linear classifier. The weight fold is a sequential
# left-to-right list_reduce from w1 (Spark folds from an exact 0.0 seed;
# 0.0 + w1 == w1 in IEEE, so the folds are bit-identical).
_W = (
    "list_transform({toks}, t -> "
    f"(CAST({_hash_bucket_mod('t', 2001)} AS DOUBLE) - 1000) / 1000.0)"
)
EXTRA_ORACLES["x86_hashed_classifier"] = f"""
WITH t AS (
  SELECT doc_id, {_TOKENS.format(t='text')} AS toks FROM documents
), s AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
         CASE WHEN len(toks) > 0 THEN
           list_reduce({_W.format(toks='toks')}, (a, b) -> a + b) / len(toks)
         ELSE 0.0 END AS z
  FROM t
)
-- floor(x*1e6+0.5)/1e6, not ROUND(z,6): tie-proof quantization, see
-- hashed_classifier_score docstring (text.py); label from the QUANTIZED
-- value so (logit, label) stays internally consistent
SELECT doc_id, n_tokens, floor(z * 1e6 + 0.5) / 1e6 AS logit,
       floor(z * 1e6 + 0.5) / 1e6 >= 0 AS label FROM s
"""


EXTRA_ORACLES["x87_dsir_importance"] = f"""
WITH tok AS (
  SELECT doc_id, lang, unnest({_TOKENS.format(t='text')}) AS tok FROM documents
), bt AS (
  SELECT doc_id, lang, {_hash_bucket_mod('tok', 1000)} AS bucket FROM tok
), tc AS (
  SELECT bucket, COUNT(*) AS c_t FROM bt WHERE lang = 'en' GROUP BY bucket
), rc AS (
  SELECT bucket, COUNT(*) AS c_r FROM bt GROUP BY bucket
), j AS (
  SELECT COALESCE(tc.bucket, rc.bucket) AS bucket,
         COALESCE(c_t, 0) AS c_t, COALESCE(c_r, 0) AS c_r
  FROM tc FULL OUTER JOIN rc ON tc.bucket = rc.bucket
), tot AS (
  SELECT SUM(c_t) AS tot_t, SUM(c_r) AS tot_r FROM j
), lr AS (
  SELECT bucket,
         ROUND(ln((c_t + 1) / CAST(tot_t + 1000 AS DOUBLE))
             - ln((c_r + 1) / CAST(tot_r + 1000 AS DOUBLE)), 9) AS log_ratio
  FROM j CROSS JOIN tot
), scored AS (
  SELECT b.doc_id, COUNT(*) AS n_tokens,
         CAST(CAST(SUM(CAST(log_ratio AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) AS importance
  FROM bt b JOIN lr USING (bucket) GROUP BY b.doc_id
)
SELECT d.doc_id, CAST(COALESCE(n_tokens, 0) AS BIGINT) AS n_tokens,
       COALESCE(importance, 0.0) AS importance
FROM documents d LEFT JOIN scored USING (doc_id)
"""


EXTRA_ORACLES["x88_session_concurrency"] = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), tagged AS (
  SELECT user_id, ts,
         CAST(SUM(new_sess) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM flagged
), sessions AS (
  SELECT user_id, session_id, COUNT(*) AS n_events,
         MIN(ts) AS session_start,
         epoch_us(MIN(ts)) AS start_us,
         epoch_us(MAX(ts)) + 1800000000 AS end_us
  FROM tagged GROUP BY user_id, session_id
), ovl AS (
  SELECT a.user_id, a.session_id, COUNT(*) AS cnt
  FROM sessions a JOIN sessions b
    ON a.start_us < b.end_us AND b.start_us < a.end_us
   AND (a.user_id <> b.user_id OR a.session_id <> b.session_id)
  GROUP BY a.user_id, a.session_id
)
SELECT s.user_id, s.session_id, s.n_events, s.session_start,
       CAST(COALESCE(o.cnt, 0) AS BIGINT) AS n_concurrent
FROM sessions s LEFT JOIN ovl o USING (user_id, session_id)
"""


EXTRA_ORACLES["x89_fuzzy_join"] = r"""
WITH keyed AS (
  SELECT doc_id AS id,
         substr(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), 1, 64) AS key
  FROM documents
)
SELECT a.id AS a, b.id AS b,
       CAST(levenshtein(a.key, b.key) AS INT) AS dist
FROM keyed a JOIN keyed b ON a.id < b.id
WHERE levenshtein(a.key, b.key) <= 3
"""


EXTRA_ORACLES["x90_source_drift"] = """
WITH binned AS (
  SELECT source AS slice, CAST(floor(n_chars / 50) AS BIGINT) AS bin FROM documents
), counts AS (
  SELECT slice, bin, COUNT(*) AS c FROM binned GROUP BY slice, bin
), st AS (
  SELECT slice, SUM(c) AS n_slice FROM counts GROUP BY slice
), gl AS (
  SELECT bin, SUM(c) AS g FROM counts GROUP BY bin
), nt AS (
  SELECT SUM(c) AS n_total FROM counts
), grid AS (
  SELECT st.slice, gl.bin, st.n_slice, gl.g, COALESCE(counts.c, 0) AS c
  FROM st CROSS JOIN gl
  LEFT JOIN counts ON counts.slice = st.slice AND counts.bin = gl.bin
)
SELECT slice AS source, CAST(MAX(n_slice) AS BIGINT) AS n_rows,
       CAST(CAST(SUM(CAST(ROUND(ABS(c / CAST(n_slice AS DOUBLE)
                              - g / CAST(n_total AS DOUBLE)), 12)
                     AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) / 2 AS tv_distance
FROM grid CROSS JOIN nt GROUP BY slice
"""


EXTRA_ORACLES["x91_bitext_margin"] = f"""
WITH src AS (
  SELECT e.vec_id AS src_id, e.embedding AS qv
  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
  WHERE d.lang = 'en'
), tgt AS (
  SELECT e.vec_id AS tgt_id, e.embedding AS cv
  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
  WHERE d.lang = 'es'
), scored AS (
  SELECT src_id, tgt_id, ROUND({_cos('qv', 'cv')}, 12) AS cos_sim
  FROM src CROSS JOIN tgt
), ranked AS (
  SELECT src_id, tgt_id, cos_sim,
         CAST(row_number() OVER (
           PARTITION BY src_id ORDER BY cos_sim DESC, tgt_id) AS INT) AS rank
  FROM scored
), topk AS (
  SELECT * FROM ranked WHERE rank <= 4
)
SELECT src_id,
       MAX(CASE WHEN rank = 1 THEN tgt_id END) AS tgt_id,
       MAX(CASE WHEN rank = 1 THEN cos_sim END) AS cos_sim,
       ROUND(MAX(CASE WHEN rank = 1 THEN cos_sim END)
             / (CAST(CAST(SUM(CAST(cos_sim AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE)
                / COUNT(*)), 9) AS margin
FROM topk GROUP BY src_id
"""


EXTRA_ORACLES["x92_containment_pairs"] = f"""
WITH {_SHINGLES},
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT i.id_a, i.id_b,
       ROUND(CAST(i.n_common AS DOUBLE) / LEAST(sa.sz, sb.sz), 6) AS containment
FROM inter i
JOIN sizes sa ON sa.doc_id = i.id_a
JOIN sizes sb ON sb.doc_id = i.id_b
WHERE CAST(i.n_common AS DOUBLE) / LEAST(sa.sz, sb.sz) >= 0.4
"""


EXTRA_ORACLES["x93_event_funnel"] = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id
), t AS (
  SELECT s1.user_id, t1, t2, t3
  FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
)
SELECT 1 AS step_idx, 'signup' AS step, COUNT(t1) AS n_users,
       CAST(NULL AS DOUBLE) AS avg_hours_from_prev FROM t
UNION ALL
SELECT 2, 'click', COUNT(t2),
       CAST(CAST(SUM(CAST(ROUND((epoch_us(t2) - epoch_us(t1)) / 3.6e9, 6)
                     AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) / COUNT(t2) FROM t
UNION ALL
SELECT 3, 'purchase', COUNT(t3),
       CAST(CAST(SUM(CAST(ROUND((epoch_us(t3) - epoch_us(t2)) / 3.6e9, 6)
                     AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) / COUNT(t3) FROM t
"""


EXTRA_ORACLES["x94_source_entropy"] = """
WITH cnt AS (
  SELECT source, lang, COUNT(*) AS c FROM documents GROUP BY source, lang
), tot AS (
  SELECT source, SUM(c) AS n_docs FROM cnt GROUP BY source
)
SELECT cnt.source, CAST(MAX(n_docs) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_langs,
       CAST(CAST(SUM(CAST(ROUND(-(c / CAST(n_docs AS DOUBLE))
                           * ln(c / CAST(n_docs AS DOUBLE)), 12)
                     AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) AS lang_entropy
FROM cnt JOIN tot ON cnt.source = tot.source
GROUP BY cnt.source
"""


def _pagerank_sql(damping_pct: int = 85, iterations: int = 10) -> str:
    """Generated twin of operators/graph.pagerank: SQL forbids aggregates
    in recursive CTE terms, so the fixed iteration count is UNROLLED as
    a pr0..prN CTE chain. Fixed-point BIGINT arithmetic (1e-12 units,
    floor division) — the first double-based formulation differed from
    Spark by exactly 1e-12 on ~1% of nodes because DuckDB ROUND scales
    the double by 10^12 (lossy) while Spark rounds the exact decimal
    expansion; integers have no boundary to disagree on."""
    scale = 10**12
    base = (100 - damping_pct) * scale // 100
    head = f"""
WITH pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE {_cos('a.embedding', 'b.embedding')} >= 0.25
), edges0 AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
), outdeg AS (
  SELECT src, COUNT(*) AS outdeg FROM edges0 GROUP BY src
), edges AS (
  SELECT e.src, e.dst, o.outdeg FROM edges0 e JOIN outdeg o ON e.src = o.src
), nodes AS (
  SELECT DISTINCT src AS node FROM edges0
), nn AS (
  SELECT COUNT(*) AS n FROM nodes
), pr0 AS (
  SELECT node, n, CAST({scale} AS BIGINT) // n AS r FROM nodes CROSS JOIN nn
)"""
    steps = []
    for i in range(1, iterations + 1):
        steps.append(f""", pr{i} AS (
  SELECT e.dst AS node, p.n,
         CAST(CAST({base} AS BIGINT) // p.n
              + ({damping_pct} * SUM(p.r // e.outdeg)) // 100 AS BIGINT) AS r
  FROM edges e JOIN pr{i-1} p ON e.src = p.node
  GROUP BY e.dst, p.n
)""")
    return head + "".join(steps) + f"""
SELECT node AS vec_id, CAST(r AS DOUBLE) / {scale}.0 AS pagerank FROM pr{iterations}
"""


EXTRA_ORACLES["x96_pagerank"] = _pagerank_sql()


EXTRA_ORACLES["x101_cohort_retention"] = """
WITH fs AS (
  SELECT user_id, MIN(date_trunc('week', ts)) AS cohort_week
  FROM events GROUP BY user_id
), j AS (
  SELECT e.user_id, fs.cohort_week,
         CAST(FLOOR((epoch_us(date_trunc('week', e.ts))
                     - epoch_us(fs.cohort_week))
                    / 604800000000.0) AS INT) AS weeks_since
  FROM events e JOIN fs USING (user_id)
), active AS (
  SELECT cohort_week, weeks_since, COUNT(DISTINCT user_id) AS n_active
  FROM j GROUP BY cohort_week, weeks_since
), cs AS (
  SELECT cohort_week, COUNT(*) AS cohort_size FROM fs GROUP BY cohort_week
)
SELECT CAST(a.cohort_week AS TIMESTAMP) AS cohort_week, a.weeks_since,
       a.n_active, cs.cohort_size,
       ROUND(a.n_active / CAST(cs.cohort_size AS DOUBLE), 12) AS retained_pct
FROM active a JOIN cs USING (cohort_week)
"""


EXTRA_ORACLES["x100_time_range_window"] = """
SELECT user_id, event_id, ts,
       COUNT(*) OVER w AS n_1h,
       ROUND(CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w
                       AS VARCHAR) AS DOUBLE), 4) AS sum_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


EXTRA_ORACLES["x98_mergeable_topk"] = """
WITH counts AS (
  SELECT CAST(ts AS DATE) AS day, user_id AS item, COUNT(*) AS cnt
  FROM events GROUP BY CAST(ts AS DATE), user_id
), ranked AS (
  SELECT day, item, cnt,
         CAST(row_number() OVER (
           PARTITION BY day ORDER BY cnt DESC, item) AS INT) AS rnk
  FROM counts
), kept AS (
  SELECT * FROM ranked WHERE rnk <= 20
), thr AS (
  SELECT day, CASE WHEN MAX(rnk) >= 20 THEN MIN(cnt) ELSE 0 END AS t_day
  FROM kept GROUP BY day
), daily AS (
  SELECT k.day, k.item, k.cnt, k.rnk, t.t_day FROM kept k JOIN thr t USING (day)
), per_item AS (
  SELECT date_trunc('week', CAST(day AS TIMESTAMP)) AS week, item,
         SUM(cnt) AS est, SUM(t_day) AS present_t
  FROM daily GROUP BY date_trunc('week', CAST(day AS TIMESTAMP)), item
), week_t AS (
  SELECT week, SUM(t_day) AS total_t FROM (
    SELECT DISTINCT date_trunc('week', CAST(day AS TIMESTAMP)) AS week,
           day, t_day
    FROM daily
  ) GROUP BY week
), j AS (
  SELECT p.week, p.item, p.est, p.est + w.total_t - p.present_t AS ub,
         w.total_t
  FROM per_item p JOIN week_t w USING (week)
), r AS (
  SELECT week, item, est, ub, total_t,
         CAST(row_number() OVER (
           PARTITION BY week ORDER BY est DESC, item) AS INT) AS rnk
  FROM j
)
SELECT CAST(week AS TIMESTAMP) AS week, item,
       CAST(est AS BIGINT) AS est, CAST(ub AS BIGINT) AS ub,
       rnk, est >= total_t AS guaranteed
FROM r WHERE rnk <= 10
"""


EXTRA_ORACLES["x97_contrastive_triplets"] = f"""
WITH pairs AS (
  SELECT a.vec_id AS anchor, b.vec_id AS positive, a.label AS cell,
         ROUND({_cos('a.embedding', 'b.embedding')}, 12) AS cos_pos
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE {_cos('a.embedding', 'b.embedding')} >= 0.25
), ranked AS (
  SELECT anchor, positive, cell, cos_pos,
         CAST(row_number() OVER (
           PARTITION BY cell ORDER BY anchor, positive) AS BIGINT) AS rn,
         COUNT(*) OVER (PARTITION BY cell) AS n_pairs
  FROM pairs
), base AS (
  SELECT *, (rn % n_pairs) + 1 AS idx1, ((rn + 1) % n_pairs) + 1 AS idx2
  FROM ranked
), picked AS (
  SELECT b.anchor, b.positive, b.cell, b.cos_pos,
         CASE WHEN j1.positive <> b.anchor AND j1.positive <> b.positive
                THEN j1.positive
              WHEN j2.positive <> b.anchor AND j2.positive <> b.positive
                THEN j2.positive
         END AS negative
  FROM base b
  JOIN ranked j1 ON j1.cell = b.cell AND j1.rn = b.idx1
  JOIN ranked j2 ON j2.cell = b.cell AND j2.rn = b.idx2
)
SELECT p.anchor, p.positive, p.negative, p.cell, p.cos_pos,
       ROUND({_cos('av.embedding', 'nv.embedding')}, 12) AS cos_neg
FROM picked p
JOIN embeddings av ON av.vec_id = p.anchor
JOIN embeddings nv ON nv.vec_id = p.negative
WHERE p.negative IS NOT NULL
"""


EXTRA_ORACLES["x95_event_transitions"] = """
WITH seq AS (
  SELECT lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
         event_type AS next_type
  FROM events
), pairs AS (
  SELECT prev_type, next_type FROM seq WHERE prev_type IS NOT NULL
), cnt AS (
  SELECT prev_type, next_type, COUNT(*) AS n FROM pairs
  GROUP BY prev_type, next_type
), tot AS (
  SELECT prev_type, SUM(n) AS n_from FROM cnt GROUP BY prev_type
)
SELECT cnt.prev_type, cnt.next_type, cnt.n,
       ROUND(cnt.n / CAST(n_from AS DOUBLE), 12) AS p
FROM cnt JOIN tot ON cnt.prev_type = tot.prev_type
"""


# shared CTE tail for the cluster-composed oracles (x104/x105): x31's
# Jaccard pairs -> recursive-CTE connected components
_CLUSTER_CTES = f"""
{_SHINGLES.strip()},
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), pairs AS (
  SELECT i.id_a, i.id_b
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.id_a
  JOIN sizes sb ON sb.doc_id = i.id_b
  WHERE CAST(i.n_common AS DOUBLE) / (sa.sz + sb.sz - i.n_common) >= 0.5
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
), reach(node, label) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node
), clu AS (
  SELECT node AS doc_id, MIN(label) AS cluster_id FROM reach GROUP BY node
)"""

EXTRA_ORACLES["x104_canonical_dedup"] = f"""
WITH RECURSIVE {_CLUSTER_CTES},
q AS (
  SELECT doc_id,
         ROUND(0.5 * (1.0 - CAST(len(list_filter({_TOKENS.format(t='text')},
                 x -> x IN {_STOPWORDS_SQL})) AS DOUBLE)
               / len({_TOKENS.format(t='text')}))
               + 0.5 * least(CAST(length(text) AS DOUBLE) / 500.0, 1.0),
               6) AS quality
  FROM documents
), member AS (
  SELECT c.doc_id, c.cluster_id, q.quality FROM clu c JOIN q USING (doc_id)
), canon AS (
  SELECT cluster_id, doc_id AS canonical_id FROM (
    SELECT cluster_id, doc_id,
           row_number() OVER (
             PARTITION BY cluster_id ORDER BY quality DESC, doc_id) AS rn
    FROM member) WHERE rn = 1
)
SELECT q.doc_id,
       COALESCE(c.cluster_id, q.doc_id) AS cluster_id,
       COALESCE(cn.canonical_id, q.doc_id) AS canonical_id,
       COALESCE(cn.canonical_id, q.doc_id) = q.doc_id AS is_canonical,
       q.quality
FROM q
LEFT JOIN clu c USING (doc_id)
LEFT JOIN canon cn ON c.cluster_id = cn.cluster_id
"""


EXTRA_ORACLES["x105_leakage_safe_split"] = f"""
WITH RECURSIVE {_CLUSTER_CTES},
wc AS (
  SELECT d.doc_id, d.n_chars,
         COALESCE(c.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN clu c USING (doc_id)
), b AS (
  SELECT *, {_hash_bucket('cluster_id')} AS bucket FROM wc
)
SELECT CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT cluster_id) AS n_clusters,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM b GROUP BY 1
"""


EXTRA_ORACLES["x121_type_cooccurrence"] = """
WITH flagged AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), st AS (
  SELECT DISTINCT user_id, event_type,
         SUM(new_sess) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
), ns AS (
  SELECT COUNT(*) AS n_s FROM (SELECT DISTINCT user_id, session_id FROM st)
), per_type AS (
  SELECT event_type, COUNT(*) AS n_t FROM st GROUP BY event_type
), pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_ab
  FROM st a
  JOIN st b ON a.user_id = b.user_id AND a.session_id = b.session_id
  WHERE a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type
)
SELECT type_a, type_b, n_ab, pa.n_t AS n_a, pb.n_t AS n_b,
       ROUND(n_ab / CAST(n_s AS DOUBLE), 12) AS support,
       ROUND((n_ab * n_s) / CAST(pa.n_t * pb.n_t AS DOUBLE), 12) AS lift
FROM pairs
JOIN per_type pa ON pa.event_type = type_a
JOIN per_type pb ON pb.event_type = type_b
CROSS JOIN ns
"""


EXTRA_ORACLES["x120_chi_square"] = """
WITH cells AS (
  SELECT source, lang, COUNT(*) AS o FROM documents GROUP BY source, lang
), srcs AS (
  SELECT source, CAST(SUM(o) AS BIGINT) AS rm FROM cells GROUP BY source
), lngs AS (
  SELECT lang, CAST(SUM(o) AS BIGINT) AS cm FROM cells GROUP BY lang
), tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
grid AS (
  SELECT source, lang, rm, cm, n FROM srcs CROSS JOIN lngs CROSS JOIN tot
), obs AS (
  SELECT g.source, g.lang, g.rm, g.cm, g.n, COALESCE(c.o, 0) AS o
  FROM grid g LEFT JOIN cells c USING (source, lang)
), terms AS (
  SELECT n,
         ROUND((o - (rm * cm) / CAST(n AS DOUBLE))
               * (o - (rm * cm) / CAST(n AS DOUBLE))
               / ((rm * cm) / CAST(n AS DOUBLE)), 12) AS term
  FROM obs
)
SELECT CAST(CAST(SUM(CAST(term AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE)
         AS chi2,
       (SELECT CAST((COUNT(*) - 1) AS BIGINT) FROM srcs)
         * (SELECT CAST((COUNT(*) - 1) AS BIGINT) FROM lngs) AS dof,
       CAST(MAX(n) AS BIGINT) AS n_docs,
       COUNT(*) AS n_cells
FROM terms
"""


EXTRA_ORACLES["x119_daily_trend"] = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS y
  FROM events GROUP BY event_type, CAST(ts AS DATE)
), pts AS (
  SELECT event_type,
         CAST(day - MIN(day) OVER (PARTITION BY event_type) AS BIGINT) AS x,
         y
  FROM daily
), agg AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x*y) AS BIGINT) AS sxy, CAST(SUM(x*x) AS BIGINT) AS sxx,
         CAST(SUM(y*y) AS BIGINT) AS syy
  FROM pts GROUP BY event_type
)
-- degenerate series (n=1 or zero variance) pinned to NULL explicitly,
-- matching the Spark plan's F.when guards (x119 docstring)
SELECT event_type, n AS n_days,
       CASE WHEN n > 1 AND (n*sxx - sx*sx) <> 0 THEN
         ROUND(CAST(n*sxy - sx*sy AS DOUBLE) / (n*sxx - sx*sx), 12)
       END AS slope_per_day,
       CASE WHEN n > 1 AND (n*sxx - sx*sx) <> 0 THEN
         ROUND(CAST(sy AS DOUBLE) / n
               - (CAST(n*sxy - sx*sy AS DOUBLE) / (n*sxx - sx*sx))
                 * (CAST(sx AS DOUBLE) / n), 12)
       END AS intercept,
       CASE WHEN n > 1 AND (n*sxx - sx*sx) <> 0 AND (n*syy - sy*sy) <> 0 THEN
         ROUND(CAST(n*sxy - sx*sy AS DOUBLE) * (n*sxy - sx*sy)
               / (CAST(n*sxx - sx*sx AS DOUBLE) * (n*syy - sy*sy)), 12)
       END AS r2
FROM agg
"""


EXTRA_ORACLES["x118_audience_overlap"] = """
WITH du AS (
  SELECT DISTINCT event_type, user_id FROM events
), sizes AS (
  SELECT event_type, COUNT(*) AS n FROM du GROUP BY event_type
), inter AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_both
  FROM du a JOIN du b ON a.user_id = b.user_id
  WHERE a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type
)
SELECT type_a, type_b, sa.n AS n_a, sb.n AS n_b, n_both,
       ROUND(n_both / CAST(sa.n + sb.n - n_both AS DOUBLE), 12)
         AS audience_jaccard
FROM inter
JOIN sizes sa ON sa.event_type = type_a
JOIN sizes sb ON sb.event_type = type_b
"""


# the incremental cluster path must reproduce the one-shot batch truth:
# same recursive-CTE oracle as x31 (see queries.x117 docstring)
EXTRA_ORACLES["x117_incremental_clusters"] = ORACLES["x31_dup_clusters"]

EXTRA_ORACLES["x116_rate_limit"] = """
WITH flagged AS (
  SELECT event_type,
         row_number() OVER (
           PARTITION BY user_id, event_type,
                        CAST(FLOOR(epoch_us(ts) / 600000000) AS BIGINT)
           ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       ROUND(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 12) AS suppressed_pct
FROM flagged GROUP BY event_type
"""


EXTRA_ORACLES["x114_weighted_median"] = f"""
WITH ranked AS (
  SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber,
         SUM(CAST(l_quantity AS DECIMAL(18,4))) OVER (
           PARTITION BY l_returnflag
           ORDER BY l_extendedprice, l_orderkey, l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_w,
         SUM(CAST(l_quantity AS DECIMAL(18,4))) OVER (
           PARTITION BY l_returnflag) AS tot_w
  FROM lineitem
), hit AS (
  SELECT *, row_number() OVER (
           PARTITION BY l_returnflag
           ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn
  FROM ranked WHERE 2 * cum_w >= tot_w
)
SELECT l_returnflag,
       l_extendedprice AS weighted_median_price,
       {_dec2dbl('tot_w')} AS total_weight
FROM hit WHERE rn = 1
"""


EXTRA_ORACLES["x115_gini_concentration"] = f"""
WITH cnt AS (
  SELECT event_type, user_id, COUNT(*) AS c
  FROM events GROUP BY event_type, user_id
), ranked AS (
  SELECT event_type, c,
         row_number() OVER (
           PARTITION BY event_type ORDER BY c, user_id) AS i
  FROM cnt
), agg AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(CAST(c AS DECIMAL(38,0))) AS s,
         SUM(CAST(i * c AS DECIMAL(38,0))) AS t
  FROM ranked GROUP BY event_type
)
SELECT event_type, n AS n_users,
       ROUND(2 * {_dec2dbl('t')} / (n * {_dec2dbl('s')})
             - (n + 1) / CAST(n AS DOUBLE), 12) AS gini
FROM agg
"""


EXTRA_ORACLES["x112_quota_sample"] = f"""
WITH h AS (
  SELECT doc_id, lang, n_chars,
         {_hash_bucket_mod('doc_id', 1_000_000)} AS hb
  FROM documents
), r AS (
  SELECT doc_id, lang, n_chars, hb,
         row_number() OVER (PARTITION BY lang ORDER BY hb, doc_id) AS rn
  FROM h
)
SELECT lang, COUNT(*) AS n_taken, MAX(hb) AS hash_frontier,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
FROM r WHERE rn <= 30 GROUP BY lang
"""


EXTRA_ORACLES["x113_seasonal_backtest"] = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS c
  FROM events GROUP BY date_trunc('hour', ts), event_type
), scored AS (
  SELECT a.hour, a.event_type, a.c, p.c AS c_pred, a.c - p.c AS err
  FROM hourly a
  JOIN hourly p ON a.event_type = p.event_type
               AND a.hour = p.hour + INTERVAL 7 DAY
)
SELECT event_type, COUNT(*) AS n_hours,
       ROUND(CAST(SUM(ABS(err)) AS DOUBLE) / COUNT(*), 12) AS mae,
       ROUND(CAST(SUM(err) AS DOUBLE) / COUNT(*), 12) AS bias,
       MAX(ABS(err)) AS worst_abs_err
FROM scored GROUP BY event_type
"""


EXTRA_ORACLES["x111_source_overlap_matrix"] = f"""
WITH {_SHINGLES.strip()},
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), pairs AS (
  SELECT i.id_a, i.id_b
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.id_a
  JOIN sizes sb ON sb.doc_id = i.id_b
  WHERE CAST(i.n_common AS DOUBLE) / (sa.sz + sb.sz - i.n_common) >= 0.5
)
SELECT LEAST(da.source, db.source) AS source_a,
       GREATEST(da.source, db.source) AS source_b,
       COUNT(*) AS n_dup_pairs
FROM pairs p
JOIN documents da ON p.id_a = da.doc_id
JOIN documents db ON p.id_b = db.doc_id
GROUP BY 1, 2
"""


EXTRA_ORACLES["x109_session_paths"] = """
WITH flagged AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, event_type, ts, event_id,
         SUM(new_sess) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
), paths AS (
  SELECT user_id, session_id,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM sess GROUP BY user_id, session_id
)
SELECT path, COUNT(*) AS n_sessions, COUNT(DISTINCT user_id) AS n_users
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path LIMIT 20
"""


# scaled-integer quantization (floor(x*1e12+0.5) as BIGINT) instead of a
# decimal cast: decimal tie-rounding is engine-specific, floor is IEEE —
# see the x110 docstring in queries.py
EXTRA_ORACLES["x110_label_centroids"] = """
WITH ex AS (
  SELECT label, generate_subscripts(embedding, 1) - 1 AS dim,
         unnest(embedding) AS val
  FROM embeddings
), agg AS (
  SELECT label, dim, COUNT(*) AS n,
         SUM(CAST(floor(CAST(val AS DOUBLE) * 1e12 + 0.5) AS BIGINT)) AS s1,
         SUM(CAST(floor((CAST(val AS DOUBLE) * CAST(val AS DOUBLE)) * 1e12
                        + 0.5) AS BIGINT)) AS s2
  FROM ex GROUP BY label, dim
)
SELECT label, CAST(dim AS INT) AS dim, n AS n_vecs,
       (CAST(s1 AS DOUBLE) / 1e12) / n AS centroid,
       (n * (CAST(s2 AS DOUBLE) / 1e12)
        - (CAST(s1 AS DOUBLE) / 1e12) * (CAST(s1 AS DOUBLE) / 1e12))
       / (n * (n - 1)) AS dim_var
FROM agg
"""


# λ and (1-λ) as the EXACT doubles Spark computes (1.0-0.7 is not the
# literal 0.3 in IEEE; repr pins both engines to identical constants)
_BLM_LAM = 0.7
EXTRA_ORACLES["x108_bigram_logprob"] = f"""
WITH toks AS (
  SELECT doc_id, {_TOKENS.format(t='text')} AS t FROM documents
), idx AS (
  SELECT doc_id, t, UNNEST(generate_series(1, len(t) - 1)) AS i
  FROM toks WHERE len(t) >= 2
), pos AS (
  SELECT doc_id, t[i] AS v, t[i+1] AS w FROM idx
), doc_bi AS (
  SELECT doc_id, v, w, COUNT(*) AS k FROM pos GROUP BY doc_id, v, w
), bi AS (
  SELECT v, w, CAST(SUM(k) AS BIGINT) AS cb FROM doc_bi GROUP BY v, w
), prev AS (
  SELECT v, CAST(SUM(cb) AS BIGINT) AS cp FROM bi GROUP BY v
), uni AS (
  SELECT w, COUNT(*) AS cu FROM (SELECT unnest(t) AS w FROM toks)
  GROUP BY w
), total AS (
  SELECT CAST(SUM(cu) AS BIGINT) AS t_total FROM uni
), contrib AS (
  SELECT doc_id, k,
         CAST(ROUND(k * -ln({_BLM_LAM!r} * (CAST(cb AS DOUBLE) / cp)
                            + {1.0 - _BLM_LAM!r} * (CAST(cu AS DOUBLE)
                                                    / t_total)), 8)
              AS DECIMAL(18,8)) AS c
  FROM doc_bi JOIN bi USING (v, w) JOIN prev USING (v) JOIN uni USING (w)
  CROSS JOIN total
)
SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n_bigrams,
       ROUND({_dec2dbl('SUM(c)')} / CAST(SUM(k) AS BIGINT), 6)
         AS avg_neg_logprob
FROM contrib GROUP BY doc_id
"""


EXTRA_ORACLES["x106_count_anomaly"] = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS c
  FROM events GROUP BY date_trunc('hour', ts), event_type
), stats AS (
  SELECT event_type, COUNT(*) AS n, SUM(c) AS s1, SUM(c*c) AS s2
  FROM hourly GROUP BY event_type
)
SELECT h.hour, h.event_type, h.c,
       ROUND(CAST(s1 AS DOUBLE) / n, 12) AS mean_c,
       ROUND((h.c - CAST(s1 AS DOUBLE) / n)
             / sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE) / (n * (n - 1))),
             12) AS z,
       abs((h.c - CAST(s1 AS DOUBLE) / n)
           / sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE) / (n * (n - 1)))) > 3.0
         AS is_anomaly
FROM hourly h JOIN stats USING (event_type)
"""


EXTRA_ORACLES["x107_seasonality_index"] = f"""
WITH per_dow AS (
  SELECT event_type, CAST(isodow(ts) - 1 AS INTEGER) AS dow,
         COUNT(*) AS n, SUM(CAST(value AS DECIMAL(18,4))) AS s
  FROM events GROUP BY event_type, CAST(isodow(ts) - 1 AS INTEGER)
), per_type AS (
  SELECT event_type, SUM(n) AS n_all, SUM(s) AS s_all
  FROM per_dow GROUP BY event_type
)
SELECT d.event_type, d.dow, d.n AS n_events,
       ROUND({_dec2dbl('d.s')} / d.n, 12) AS mean_dow,
       ROUND(({_dec2dbl('d.s')} / d.n)
             / ({_dec2dbl('t.s_all')} / t.n_all), 12) AS seasonality_index
FROM per_dow d JOIN per_type t USING (event_type)
"""


EXTRA_ORACLES["x102_temperature_mixture"] = """
WITH cnt AS (
  SELECT source, lang, COUNT(*) AS n_docs FROM documents GROUP BY source, lang
), tot AS (SELECT SUM(n_docs) AS n_total FROM cnt),
p AS (
  SELECT source, lang, n_docs,
         n_docs / CAST(n_total AS DOUBLE) AS p,
         ROUND(POWER(n_docs / CAST(n_total AS DOUBLE), 0.7), 12) AS p_alpha
  FROM cnt, tot
), z AS (SELECT SUM(CAST(p_alpha AS DECIMAL(38,12))) AS z FROM p)
SELECT source, lang, n_docs,
       ROUND(p, 12) AS p,
       ROUND(p_alpha / CAST(z AS DOUBLE), 12) AS q,
       ROUND(10000 * p_alpha / CAST(z AS DOUBLE), 6) AS target_n,
       ROUND(LEAST(1.0, 10000 * p_alpha / CAST(z AS DOUBLE) / n_docs),
             12) AS keep_rate
FROM p, z
"""


EXTRA_ORACLES["x103_quality_calibration"] = f"""
WITH t AS (
  SELECT doc_id, source, text, {_TOKENS.format(t='text')} AS toks
  FROM documents
), s AS (
  SELECT doc_id, source,
         ROUND(0.5 * (1.0 - CAST(len(list_filter(toks,
                 x -> x IN {_STOPWORDS_SQL})) AS DOUBLE) / len(toks))
               + 0.5 * least(CAST(length(text) AS DOUBLE) / 500.0, 1.0),
               6) AS quality
  FROM t
)
SELECT doc_id, source, quality,
       ROUND(percent_rank() OVER w, 12) AS calib_pct,
       LEAST(CAST(FLOOR(percent_rank() OVER w * 10) AS INT), 9)
         AS calib_bucket
FROM s WINDOW w AS (PARTITION BY source ORDER BY quality, doc_id)
"""


# x131: algebraic rollup maintenance — the oracle is the ONE-SHOT daily
# aggregate over all events; decimal sums are associative, so the
# split-aggregate-merge path must reproduce it bit for bit
EXTRA_ORACLES["x131_incremental_rollup"] = f"""
SELECT event_type, CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
       COUNT(*) AS n_events,
       {_dsum('value', 'sum_value')},
       {_davg('value', 'avg_value')},
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM events
GROUP BY event_type, CAST(ts AS DATE)
"""


# x130: mergeable fixed-grid histogram quantiles — integer bins/counts end
# to end; the only doubles are the final bin-edge*2 emissions
EXTRA_ORACLES["x130_histogram_quantiles"] = """
WITH daily AS (
  SELECT event_type, date_trunc('week', ts) AS week, CAST(ts AS DATE) AS day,
         LEAST(CAST(floor(value / 2) AS BIGINT), 249) AS bin,
         COUNT(*) AS c
  FROM events GROUP BY 1, 2, 3, 4
), weekly AS (
  SELECT event_type, week, bin, SUM(c) AS c
  FROM daily GROUP BY 1, 2, 3
), cum AS (
  SELECT event_type, week, bin, c,
         SUM(c) OVER (PARTITION BY event_type, week ORDER BY bin
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         SUM(c) OVER (PARTITION BY event_type, week) AS total
  FROM weekly
)
SELECT event_type, CAST(week AS TIMESTAMP) AS week,
       CAST(MAX(total) AS BIGINT) AS n_events,
       CAST(MIN(CASE WHEN cum >= CEIL(0.5 * total) THEN bin END) AS DOUBLE)
         * 2 AS p50,
       CAST(MIN(CASE WHEN cum >= CEIL(0.9 * total) THEN bin END) AS DOUBLE)
         * 2 AS p90,
       CAST(MIN(CASE WHEN cum >= CEIL(0.99 * total) THEN bin END) AS DOUBLE)
         * 2 AS p99
FROM cum GROUP BY event_type, week
"""


# x129: greedy token-budget selection — same ordering drives rank and
# running sum on both sides; integers end to end
EXTRA_ORACLES["x129_token_budget_select"] = f"""
WITH scored AS (
  SELECT doc_id, source, n_chars,
         CAST(len({_TOKENS.format(t='text')}) AS BIGINT) AS n_tokens
  FROM documents
), cum AS (
  SELECT doc_id, source, n_chars, n_tokens,
         CAST(SUM(n_tokens) OVER (
           PARTITION BY source ORDER BY n_chars DESC, doc_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_tokens
  FROM scored
)
SELECT doc_id, source, n_chars, n_tokens, cum_tokens
FROM cum WHERE cum_tokens <= 3000
"""


# x126: span-level substring dedup — positional tokens/grams via UNNEST
# WITH ORDINALITY, 1-based inclusive list slices for the grams, survivors
# reassembled with string_agg ORDER BY position (string-exact)
EXTRA_ORACLES["x126_substring_span_dedup"] = f"""
WITH base AS (
  SELECT doc_id, {_TOKENS.format(t='text')} AS t FROM documents
  WHERE len({_TOKENS.format(t='text')}) > 0
), tok AS (
  -- no WITH ORDINALITY in this DuckDB: index the list explicitly
  SELECT doc_id, t[g.s] AS token, g.s - 1 AS pos
  FROM base, UNNEST(generate_series(1, len(t))) AS g(s)
), ngr AS (
  SELECT doc_id, g.s AS start, array_to_string(t[g.s + 1 : g.s + 8], ' ') AS gram
  FROM base, UNNEST(generate_series(0, len(t) - 8)) AS g(s)
  WHERE len(t) >= 8
), hot AS (
  SELECT gram FROM ngr GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
), cov AS (
  SELECT DISTINCT n2.doc_id, q.p AS pos
  FROM ngr n2 JOIN hot USING (gram),
       UNNEST(generate_series(n2.start, n2.start + 7)) AS q(p)
), kept AS (
  SELECT t.doc_id, COUNT(*) AS n_kept,
         string_agg(t.token, ' ' ORDER BY t.pos) AS clean_text
  FROM tok t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.pos = c.pos
  WHERE c.doc_id IS NULL
  GROUP BY t.doc_id
)
SELECT b.doc_id, CAST(len(b.t) AS BIGINT) AS n_tokens,
       CAST(len(b.t) - COALESCE(k.n_kept, 0) AS BIGINT) AS n_removed,
       COALESCE(k.clean_text, '') AS clean_text
FROM base b LEFT JOIN kept k USING (doc_id)
"""


# x127: sequential-Poisson weighted sampling — same md5 hex fold as
# _hash_bucket_mod but the FULL 32-bit value, then (v+0.5)/2^32/weight
# (two exact IEEE divisions, so the ranking matches Spark bit for bit)
_HASH32 = (
    "list_reduce(list_transform("
    "string_split(substr(md5(CAST({key} AS VARCHAR)), 1, 8), ''), "
    "x -> CASE WHEN x BETWEEN '0' AND '9' THEN CAST(x AS BIGINT) "
    "ELSE 10 + ascii(x) - ascii('a') END), (a, b) -> a * 16 + b)"
)

EXTRA_ORACLES["x127_weighted_sample"] = f"""
WITH pri AS (
  SELECT doc_id, lang, n_chars,
         CASE WHEN n_chars > 0 THEN
           ((CAST({_HASH32.format(key='doc_id')} AS DOUBLE) + 0.5)
            / 4294967296.0) / CAST(n_chars AS DOUBLE)
         ELSE CAST('infinity' AS DOUBLE) END AS p
  FROM documents
), ranked AS (
  SELECT doc_id, lang, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY p ASC, doc_id ASC)
           AS rn
  FROM pri
)
SELECT doc_id, lang, n_chars FROM ranked WHERE rn <= 20
"""

# x128: exact covariance — same cell emission (generate_series pair grid),
# same DECIMAL(38,18) sums, same floor-grid quantization as the Spark plan
EXTRA_ORACLES["x128_embedding_covariance"] = f"""
WITH cells AS (
  SELECT i.g AS i, j.g AS j,
         CAST(e.embedding[i.g] AS DOUBLE) * CAST(e.embedding[j.g] AS DOUBLE)
           AS p,
         CAST(e.embedding[i.g] AS DOUBLE) AS xi,
         CAST(e.embedding[j.g] AS DOUBLE) AS xj
  FROM embeddings e,
       (SELECT UNNEST(generate_series(1, 64)) AS g) i,
       (SELECT UNNEST(generate_series(1, 64)) AS g) j
  WHERE i.g <= j.g
), agg AS (
  SELECT i, j, COUNT(*) AS n,
         {_dec2dbl('SUM(CAST(p AS DECIMAL(38,18)))')} AS sp,
         {_dec2dbl('SUM(CAST(xi AS DECIMAL(38,18)))')} AS sxi,
         {_dec2dbl('SUM(CAST(xj AS DECIMAL(38,18)))')} AS sxj
  FROM cells GROUP BY i, j
)
SELECT i, j, n,
       floor((sp / n - (sxi / n) * (sxj / n)) * 1e9 + 0.5) / 1e9 AS cov
FROM agg
"""

# x128c: the GEMM path's driver hash — identical math to x128's oracle
# but on the 1e-6 grid, coarse enough to absorb float partial-sum
# merge-order differences between Spark's per-partition numpy partials
# and DuckDB's sequential double sums (~1e-13 absolute on this corpus).
EXTRA_ORACLES["x128c_embedding_covariance_gemm_q6"] = f"""
WITH cells AS (
  SELECT i.g AS i, j.g AS j,
         CAST(e.embedding[i.g] AS DOUBLE) * CAST(e.embedding[j.g] AS DOUBLE)
           AS p,
         CAST(e.embedding[i.g] AS DOUBLE) AS xi,
         CAST(e.embedding[j.g] AS DOUBLE) AS xj
  FROM embeddings e,
       (SELECT UNNEST(generate_series(1, 64)) AS g) i,
       (SELECT UNNEST(generate_series(1, 64)) AS g) j
  WHERE i.g <= j.g
), agg AS (
  SELECT i, j, COUNT(*) AS n,
         SUM(p) AS sp, SUM(xi) AS sxi, SUM(xj) AS sxj
  FROM cells GROUP BY i, j
)
SELECT i, j, n,
       floor((sp / n - (sxi / n) * (sxj / n)) * 1e6 + 0.5) / 1e6 AS cov
FROM agg
"""

# x125 probes ALL cells of the persisted IVF index (nprobe == k), so the
# result is exactly brute-force top-k — x06's SQL is the truth
EXTRA_ORACLES["x125_ann_ivf_persisted"] = ORACLES["x06_ann_cosine_topk"]

# x142 appends 10% of the corpus into the 90%-built index, then probes
# ALL cells — exact, so build-90 + append-10 must equal brute force
# over the WHOLE corpus: x06's SQL unchanged.
EXTRA_ORACLES["x142_ann_index_append"] = ORACLES["x06_ann_cosine_topk"]

# x145 probes the LIVE two-tier index mid-fold (standing 70% + three
# overlapping unfolded append epochs) with nprobe == k — the deduped
# union is the whole corpus and the probe is exact, so x06's SQL is the
# truth; any duplicate surviving the reader's exactly-once dedup would
# take a rank slot and break the hash.
EXTRA_ORACLES["x145_live_index_probe"] = ORACLES["x06_ann_cosine_topk"]

# x146 composes both pins: nprobe == coarse k probes every cell of the
# IVFADC index AND shortlist == |corpus| lets every candidate reach the
# exact re-rank, so the two-level probe (coarse prune -> per-cell ADC
# cogroup -> refine) equals brute force bit for bit — x06's SQL.
EXTRA_ORACLES["x146_ivfpq_probe"] = ORACLES["x06_ann_cosine_topk"]

# x75b runs the PQ/ADC pipeline with shortlist == |corpus| + exact
# cosine re-rank: the refine step determines top-k regardless of
# quantization error, so the result is exactly brute force (the
# nprobe == k trick applied to PQ) — x06's SQL unchanged.
EXTRA_ORACLES["x75b_ann_pq_exact_rerank"] = ORACLES["x06_ann_cosine_topk"]

# x147 probes the index AFTER split_cells occupancy maintenance with
# nprobe == post-split k: the split only moves rows between cell
# directories, so the full probe must still equal brute force — x06's
# SQL; a row stranded in an unreachable child cell (or a centroid-table
# gap mislabeling cells) would vacate a rank slot and break the hash.
EXTRA_ORACLES["x147_ivf_split_probe"] = ORACLES["x06_ann_cosine_topk"]

# x149 probes the TWO-TIER (IVFADC) index after the same split
# maintenance: the split relocates the hot cells' PQ code rows into the
# child directories alongside the vectors, and the full probe
# (nprobe == k', shortlist == |corpus|) must still equal brute force —
# x06's SQL; a code row lost by the relocation (or a codes/cells
# disagreement) would vacate a rank slot and break the hash.
EXTRA_ORACLES["x149_ivfpq_split_probe"] = ORACLES["x06_ann_cosine_topk"]

# x150 probes the IVFADC index after append + CODES-ONLY REFIT: the
# re-rank uses full vectors, so nprobe == k + shortlist == |corpus|
# equals brute force under ANY subcodebooks — x06's SQL; a code row
# lost by the staged codes rewrite (or duplicated by a torn swap)
# would vacate or double-fill a rank slot and break the hash.
EXTRA_ORACLES["x150_ivfpq_refit_probe"] = ORACLES["x06_ann_cosine_topk"]

# x151 probes the RESIDUAL-encoded IVFADC index (build 80% + keyed
# append 20%): at full probe every candidate reaches the exact re-rank,
# so brute force is the truth — x06's SQL; a residual mis-encode that
# DROPPED a row, or an anchor-term bug that mis-merged per-cell
# shortlists below the corpus-wide shortlist bound, would break the
# hash through the candidate set.
EXTRA_ORACLES["x151_ivfpq_residual_probe"] = ORACLES["x06_ann_cosine_topk"]

# x152 probes the index after dirty-set-bounded COMPACTION + the
# error-WEIGHTED codes-only refit (round-13 maintenance pair): full
# probe == brute force — x06's SQL; a row lost or duplicated by the
# bounded compaction rewrite, or a code row lost by the weighted
# refit's staged swap, would vacate or double-fill a rank slot.
EXTRA_ORACLES["x152_ivfpq_compact_weighted_refit_probe"] = ORACLES[
    "x06_ann_cosine_topk"
]


def _power_iteration_sql(
    dim: int = 64, iters: int = 12, squarings: int = 6
) -> str:
    """x137b's unrolled-CTE twin (the x96 pagerank trick): fixed-count
    power iteration on the q6 GEMM covariance (x128c's hash-pinned
    table) in EXACT INTEGER arithmetic end to end, mirroring
    linalg.spectrum_power_iteration step for step. The covariance
    lifts onto the 10^6 integer grid (the same floor(x*1e6+0.5) that
    x128c pins, kept as the integer); a chain of integer MATRIX
    SQUARINGS (rescaled to the grid after each — the eigengap is too
    small for plain iteration) precedes the vector steps; every
    matvec/matmul is SUM of integer products (DuckDB widens integer
    SUM to HUGEINT — exact, order-independent, so no float
    summation-order noise exists to absorb); norms are MAX(ABS(.));
    rescales are the exact rational half-up floor((2*x*10^6 + m) /
    (2*m)), with floor division spelled out because ``//`` truncates
    toward zero on negatives. The eigenvalue reads off one final
    matvec with the ORIGINAL integer covariance; only the last SELECT
    divides back to doubles. MATERIALIZED throughout: each level is
    referenced twice, so an inlined chain would expand the base corpus
    scan exponentially — DuckDB runs out of file handles before
    planning finishes."""

    def floordiv(num: str, den: str) -> str:
        # the leading m = 0 arm makes the rescale TOTAL (rescale(., 0)
        # == 0, matching the Spark side's degenerate guard) and is
        # checked first so the modulo never divides by zero
        return (
            f"CASE WHEN m = 0 THEN 0 "
            f"WHEN ({num}) >= 0 OR ({num}) % ({den}) = 0 "
            f"THEN ({num}) // ({den}) "
            f"ELSE ({num}) // ({den}) - 1 END"
        )

    resc = floordiv("2 * c * 1000000 + m", "2 * m")
    parts = [
        f"""WITH cells AS MATERIALIZED (
  SELECT i.g AS i, j.g AS j,
         CAST(e.embedding[i.g] AS DOUBLE) * CAST(e.embedding[j.g] AS DOUBLE)
           AS p,
         CAST(e.embedding[i.g] AS DOUBLE) AS xi,
         CAST(e.embedding[j.g] AS DOUBLE) AS xj
  FROM embeddings e,
       (SELECT UNNEST(generate_series(1, {dim})) AS g) i,
       (SELECT UNNEST(generate_series(1, {dim})) AS g) j
  WHERE i.g <= j.g
), agg AS (
  SELECT i, j, COUNT(*) AS n, SUM(p) AS sp, SUM(xi) AS sxi, SUM(xj) AS sxj
  FROM cells GROUP BY i, j
), cov AS (
  SELECT i, j,
         CAST(CAST(floor((sp / n - (sxi / n) * (sxj / n)) * 1e6 + 0.5)
              AS BIGINT) AS HUGEINT) AS c
  FROM agg
), a0 AS MATERIALIZED (
  SELECT i, j, c FROM cov
  UNION ALL
  SELECT j AS i, i AS j, c FROM cov WHERE i < j
), am AS (
  SELECT MAX(ABS(c)) AS m FROM a0
), b0 AS MATERIALIZED (
  SELECT i, j, {resc} AS c FROM a0, am
)"""
    ]
    for t in range(1, squarings + 1):
        parts.append(
            f""", p{t} AS MATERIALIZED (
  SELECT a.i AS i, b.j AS j, SUM(a.c * b.c) AS c
  FROM b{t-1} a JOIN b{t-1} b ON a.j = b.i GROUP BY a.i, b.j
), pm{t} AS (
  SELECT MAX(ABS(c)) AS m FROM p{t}
), b{t} AS MATERIALIZED (
  SELECT i, j, {resc} AS c FROM p{t}, pm{t}
)"""
        )
    parts.append(
        f""", v0 AS (
  SELECT UNNEST(generate_series(1, {dim})) AS comp,
         CAST(125000 AS HUGEINT) AS v
)"""
    )
    vdiv = floordiv("2 * w * 1000000 + m", "2 * m")
    for t in range(1, iters + 1):
        parts.append(
            f""", w{t} AS MATERIALIZED (
  SELECT s.i AS comp, SUM(s.c * v{t-1}.v) AS w
  FROM b{squarings} s JOIN v{t-1} ON v{t-1}.comp = s.j GROUP BY s.i
), m{t} AS (
  SELECT MAX(ABS(w)) AS m FROM w{t}
), v{t} AS MATERIALIZED (
  SELECT comp, {vdiv} AS v FROM w{t}, m{t}
)"""
        )
    parts.append(
        f""", wf AS MATERIALIZED (
  SELECT s.i AS comp, SUM(s.c * v{iters}.v) AS w
  FROM a0 s JOIN v{iters} ON v{iters}.comp = s.j GROUP BY s.i
), mf AS (
  SELECT MAX(ABS(w)) AS m FROM wf
)
SELECT v{iters}.comp AS component,
       CAST(v{iters}.v AS DOUBLE) / 1e6 AS loading,
       CAST(mf.m AS DOUBLE) / 1e12 AS eigenvalue
FROM v{iters}, mf"""
    )
    return "".join(parts)


# x137b: the spectrum family's hash slot — the full eigvalsh diagnostic
# (x137) is genuinely rows-only, but the dominant eigenpair by
# fixed-count, grid-quantized, L-inf-normalized power iteration is
# SQL-expressible and bit-exact (see _power_iteration_sql).
EXTRA_ORACLES["x137b_spectrum_power_iteration"] = _power_iteration_sql()

# x148: the dedup stream's UPDATE path. Corpus-prime applies the same
# update rule the query folds through the redelivered/ quarantine —
# doc_id % 40 == 5 replaced by unique standalone text (edge
# RETRACTION: components must split), the other % 20 == 5 ids replaced
# by the text of doc_id - 4 (a forced MERGE) — then the one-shot
# recursive-CTE cluster map over corpus-prime is the truth the rebuilt
# map must hash-match (x31's components shape over docs2).
EXTRA_ORACLES["x148_dedup_stream_update"] = f"""
WITH RECURSIVE docs2 AS (
  SELECT d.doc_id,
         CASE WHEN d.doc_id % 40 = 5
                THEN 'uniq ' || CAST(d.doc_id AS VARCHAR)
                     || ' standalone replacement text'
              WHEN d.doc_id % 20 = 5 THEN COALESCE(m.text, d.text)
              ELSE d.text END AS text
  FROM documents d LEFT JOIN documents m ON m.doc_id = d.doc_id - 4
),
toks AS (
  SELECT doc_id, {_TOKENS.format(t='text')} AS t FROM docs2
), idx AS (
  SELECT doc_id, t, UNNEST(generate_series(1, len(t) - 2)) AS i
  FROM toks WHERE len(t) >= 3
), sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
  FROM idx
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), pairs AS (
  SELECT i.id_a, i.id_b
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.id_a
  JOIN sizes sb ON sb.doc_id = i.id_b
  WHERE CAST(i.n_common AS DOUBLE) / (sa.sz + sb.sz - i.n_common) >= 0.5
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
), reach(node, label) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node
)
SELECT node AS doc_id, MIN(label) AS cluster_id FROM reach GROUP BY node
"""

# x143 erases vec_id % 17 == 5 from the persisted index by rewriting
# only the affected cell partitions, then probes ALL cells — exact, so
# the truth is brute force over the SURVIVING corpus (x06's shape with
# the erase predicate on both the query and corpus sides).
EXTRA_ORACLES["x143_ann_index_delete"] = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
           WHERE vec_id < 10 AND vec_id % 17 <> 5),
c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings
      WHERE vec_id % 17 <> 5),
scored AS (
  SELECT q.query_id, c.neighbor_id, {_cos('q.qv', 'c.cv')} AS cos_sim
  FROM c, q WHERE c.neighbor_id <> q.query_id
), ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, ROUND(cos_sim, 12) AS cos_sim
FROM ranked WHERE rank <= 5
"""

# x124: the oracle is the UNSALTED join — salting must be semantically
# invisible (skew.salted_join docstring)
EXTRA_ORACLES["x124_skew_salted_join"] = f"""
WITH big AS (
  SELECT CASE WHEN event_id % 10 < 7 THEN 0
              ELSE event_id % 1000 END AS skew_key, value
  FROM events
), dim AS (
  SELECT range AS skew_key, range % 5 AS tier FROM range(1000)
)
SELECT tier, COUNT(*) AS n_rows, {_dsum('value', 'sum_value')}
FROM big JOIN dim USING (skew_key)
GROUP BY tier
"""


# x123: the seeded isolation-tree ensemble compiled to SQL CASE chains —
# the independent re-scoring of the pandas-UDF path (ml/isoforest.py);
# integer arithmetic end to end, so exact on any engine
def _isoforest_oracle() -> str:
    from ..ml.isoforest import CUTOFF, N_TREES, tree_sum_sql

    return f"""
WITH feats AS (
  SELECT user_id, CAST(ts AS DATE) AS d, COUNT(*) AS n_events,
         COUNT(DISTINCT event_type) AS n_types,
         CAST(MAX(EXTRACT(hour FROM ts)) AS BIGINT) AS max_hour
  FROM events GROUP BY user_id, CAST(ts AS DATE)
), f AS (
  SELECT user_id, d, n_events, n_types, max_hour,
         CAST(isodow(d) - 1 AS BIGINT) AS dow
  FROM feats
), scored AS (
  SELECT *, CAST({tree_sum_sql()} AS BIGINT) AS sum_depth FROM f
)
SELECT user_id, CAST(d AS TIMESTAMP) AS day, n_events, n_types, max_hour,
       dow, sum_depth,
       CAST(sum_depth AS DOUBLE) / {N_TREES} AS avg_path,
       sum_depth <= {CUTOFF} AS anomaly
FROM scored
"""


EXTRA_ORACLES["x123_isoforest_score"] = _isoforest_oracle()


# x117b reads materialized old-corpus state but must still reproduce the
# one-shot batch truth — same recursive-CTE components oracle as x117/x31
EXTRA_ORACLES["x117b_incremental_clusters_indexed"] = EXTRA_ORACLES[
    "x117_incremental_clusters"
]

# x122 (IVF-cell-blocked bitext margin, nprobe == n_cells) computes exactly
# x91's result through a shuffle-partitioned plan — same SQL truth
EXTRA_ORACLES["x122_bitext_margin_blocked"] = EXTRA_ORACLES["x91_bitext_margin"]

# x97b mines triplets from the MATERIALIZED pair frame; raw cos doubles
# roundtrip parquet bit-exactly, so the truth is x97's SQL unchanged
EXTRA_ORACLES["x97b_contrastive_triplets_materialized"] = EXTRA_ORACLES[
    "x97_contrastive_triplets"
]

# x104b/x105b read the MATERIALIZED Jaccard cluster map (doc_id,
# cluster_id — two longs, bit-exact through parquet); the truth is the
# recomputed chain's SQL unchanged
EXTRA_ORACLES["x104b_canonical_dedup_materialized"] = EXTRA_ORACLES[
    "x104_canonical_dedup"
]
EXTRA_ORACLES["x105b_leakage_safe_split_materialized"] = EXTRA_ORACLES[
    "x105_leakage_safe_split"
]

# x134: md5 hex strings order identically in both engines (ASCII);
# row_number is INTEGER on the Spark side, so cast DuckDB's too.
EXTRA_ORACLES["x134_epoch_shuffle"] = f"""
WITH k AS (
  SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || ':42') AS key FROM documents
), s AS (
  SELECT doc_id, key,
         CAST(list_reduce(list_transform(
                string_split(substr(key, 1, 8), ''),
                x -> CASE WHEN x BETWEEN '0' AND '9' THEN CAST(x AS BIGINT)
                     ELSE 10 + ascii(x) - ascii('a') END),
              (a, b) -> a * 16 + b) % 32 AS INTEGER) AS shard
  FROM k
)
SELECT doc_id, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY key, doc_id)
            AS INTEGER) AS pos
FROM s
"""

# x138: the oracle compares text directly (md5 equality == text
# equality up to collisions; the engine hashes only to shrink the
# shuffle, not to change semantics)
EXTRA_ORACLES["x138_snapshot_diff"] = """
WITH old_s AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 3
), new_s AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text
  FROM documents WHERE doc_id % 10 <> 7
)
SELECT CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            WHEN o.text IS NOT DISTINCT FROM n.text THEN 'unchanged'
            ELSE 'changed' END AS status,
       COUNT(*) AS n_docs
FROM old_s o FULL OUTER JOIN new_s n ON o.doc_id = n.doc_id
GROUP BY 1
"""

# x136: same 15-hex-char md5 fold (60 bits/row), summed as DECIMAL(38,0)
EXTRA_ORACLES["x136_content_checksum"] = """
WITH h AS (
  SELECT source,
         list_reduce(list_transform(
           string_split(substr(md5(CAST(doc_id AS VARCHAR) || ':' || text),
                               1, 15), ''),
           x -> CASE WHEN x BETWEEN '0' AND '9' THEN CAST(x AS BIGINT)
                ELSE 10 + ascii(x) - ascii('a') END),
           (a, b) -> a * 16 + b) AS fold
  FROM documents
)
SELECT source, COUNT(*) AS n_rows,
       CAST(CAST(SUM(CAST(fold AS DECIMAL(38,0))) AS DECIMAL(38,0))
            AS VARCHAR) AS checksum
FROM h GROUP BY source
"""

EXTRA_ORACLES["x135_length_batches"] = """
WITH staged AS (
  SELECT doc_id, n_chars,
         CAST(least(n_chars // 256, 15) AS INTEGER) AS length_bucket,
         md5(CAST(doc_id AS VARCHAR) || ':7') AS key
  FROM documents
), rn AS (
  SELECT *, row_number() OVER (
           PARTITION BY length_bucket ORDER BY key, doc_id) AS rn
  FROM staged
), b AS (
  SELECT *, CAST((rn - 1) // 32 AS INTEGER) AS batch_id FROM rn
)
SELECT length_bucket, batch_id,
       COUNT(*) AS n_docs,
       MAX(n_chars) AS batch_max_chars,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(COUNT(*) * MAX(n_chars) - SUM(n_chars) AS BIGINT) AS padding_waste
FROM b GROUP BY length_bucket, batch_id
"""


# x139: the identical Morton interleave (stepwise shift/mask spreads) —
# pure integer arithmetic, so every column is bit-exact across engines.
# floor(a/b) parity: both engines do correctly-rounded IEEE division of
# exactly-representable longs (< 2^53), so the quantized grid matches.
EXTRA_ORACLES["x139_zorder_layout"] = """
WITH base AS (
  SELECT CAST(o_custkey AS BIGINT) AS x_raw,
         CAST(datediff('day', DATE '1992-01-01', o_orderdate) AS BIGINT)
           AS y_raw
  FROM orders
), bounds AS (
  SELECT min(x_raw) AS x_min, max(x_raw) AS x_max,
         min(y_raw) AS y_min, max(y_raw) AS y_max
  FROM base
), q AS (
  SELECT x_raw, y_raw,
         CAST(floor((x_raw - x_min) * 65535
              / greatest(x_max - x_min, 1)) AS BIGINT) AS xq,
         CAST(floor((y_raw - y_min) * 65535
              / greatest(y_max - y_min, 1)) AS BIGINT) AS yq,
         CAST(floor(x_min + (x_max - x_min) * 2 / 5) AS BIGINT) AS x_lo,
         CAST(floor(x_min + (x_max - x_min) * 9 / 20) AS BIGINT) AS x_hi,
         CAST(floor(y_min + (y_max - y_min) * 2 / 5) AS BIGINT) AS y_lo,
         CAST(floor(y_min + (y_max - y_min) * 9 / 20) AS BIGINT) AS y_hi
  FROM base CROSS JOIN bounds
), s1 AS (
  SELECT *, (xq | (xq << 8)) & 16711935 AS sx1,
            (yq | (yq << 8)) & 16711935 AS sy1 FROM q
), s2 AS (
  SELECT *, (sx1 | (sx1 << 4)) & 252645135 AS sx2,
            (sy1 | (sy1 << 4)) & 252645135 AS sy2 FROM s1
), s3 AS (
  SELECT *, (sx2 | (sx2 << 2)) & 858993459 AS sx3,
            (sy2 | (sy2 << 2)) & 858993459 AS sy3 FROM s2
), s4 AS (
  SELECT *, (sx3 | (sx3 << 1)) & 1431655765 AS sx4,
            (sy3 | (sy3 << 1)) & 1431655765 AS sy4 FROM s3
), z AS (
  SELECT x_raw, y_raw, xq, x_lo, x_hi, y_lo, y_hi,
         (sx4 | (sy4 << 1)) AS zkey
  FROM s4
), zb AS (
  SELECT zkey >> 25 AS bucket,
         min(x_raw) AS bx_min, max(x_raw) AS bx_max,
         min(y_raw) AS by_min, max(y_raw) AS by_max,
         min(x_lo) AS x_lo, min(x_hi) AS x_hi,
         min(y_lo) AS y_lo, min(y_hi) AS y_hi
  FROM z GROUP BY 1
), lb AS (
  SELECT xq >> 9 AS bucket,
         min(x_raw) AS bx_min, max(x_raw) AS bx_max,
         min(y_raw) AS by_min, max(y_raw) AS by_max,
         min(x_lo) AS x_lo, min(x_hi) AS x_hi,
         min(y_lo) AS y_lo, min(y_hi) AS y_hi
  FROM z GROUP BY 1
), both_layouts AS (
  SELECT 'zorder' AS layout, COUNT(*) AS n_buckets,
         SUM(CASE WHEN bx_min <= x_hi AND bx_max >= x_lo
             THEN 1 ELSE 0 END) AS touched_x,
         SUM(CASE WHEN by_min <= y_hi AND by_max >= y_lo
             THEN 1 ELSE 0 END) AS touched_y
  FROM zb
  UNION ALL
  SELECT 'linear', COUNT(*),
         SUM(CASE WHEN bx_min <= x_hi AND bx_max >= x_lo
             THEN 1 ELSE 0 END),
         SUM(CASE WHEN by_min <= y_hi AND by_max >= y_lo
             THEN 1 ELSE 0 END)
  FROM lb
)
SELECT layout,
       CAST(n_buckets AS BIGINT) AS n_buckets,
       CAST(touched_x AS BIGINT) AS touched_x,
       CAST(touched_y AS BIGINT) AS touched_y,
       CAST(touched_x AS DOUBLE) / n_buckets AS frac_x,
       CAST(touched_y AS DOUBLE) / n_buckets AS frac_y
FROM both_layouts ORDER BY layout
"""

# x144: the three-way layout comparison. The Hilbert index is the same
# per-bit rotate-and-accumulate walk as the Spark fold, unrolled into 16
# generated CTE stages — all integer CASE/&/xor arithmetic, bit-exact.
def _hilbert_layout_oracle() -> str:
    base = """
WITH base AS (
  SELECT CAST(o_custkey AS BIGINT) AS x_raw,
         CAST(datediff('day', DATE '1992-01-01', o_orderdate) AS BIGINT)
           AS y_raw
  FROM orders
), bounds AS (
  SELECT min(x_raw) AS x_min, max(x_raw) AS x_max,
         min(y_raw) AS y_min, max(y_raw) AS y_max
  FROM base
), q AS (
  SELECT x_raw, y_raw,
         CAST(floor((x_raw - x_min) * 65535
              / greatest(x_max - x_min, 1)) AS BIGINT) AS xq,
         CAST(floor((y_raw - y_min) * 65535
              / greatest(y_max - y_min, 1)) AS BIGINT) AS yq,
         CAST(floor(x_min + (x_max - x_min) * 2 / 5) AS BIGINT) AS x_lo,
         CAST(floor(x_min + (x_max - x_min) * 9 / 20) AS BIGINT) AS x_hi,
         CAST(floor(y_min + (y_max - y_min) * 2 / 5) AS BIGINT) AS y_lo,
         CAST(floor(y_min + (y_max - y_min) * 9 / 20) AS BIGINT) AS y_hi
  FROM base CROSS JOIN bounds
), s1 AS (
  SELECT *, (xq | (xq << 8)) & 16711935 AS sx1,
            (yq | (yq << 8)) & 16711935 AS sy1 FROM q
), s2 AS (
  SELECT *, (sx1 | (sx1 << 4)) & 252645135 AS sx2,
            (sy1 | (sy1 << 4)) & 252645135 AS sy2 FROM s1
), s3 AS (
  SELECT *, (sx2 | (sx2 << 2)) & 858993459 AS sx3,
            (sy2 | (sy2 << 2)) & 858993459 AS sy3 FROM s2
), s4 AS (
  SELECT *, (sx3 | (sx3 << 1)) & 1431655765 AS sx4,
            (sy3 | (sy3 << 1)) & 1431655765 AS sy4 FROM s3
), h0 AS (
  SELECT x_raw, y_raw, xq, x_lo, x_hi, y_lo, y_hi,
         (sx4 | (sy4 << 1)) AS zkey,
         xq AS hx, yq AS hy, CAST(0 AS BIGINT) AS hkey
  FROM s4
)"""
    keep = "x_raw, y_raw, xq, x_lo, x_hi, y_lo, y_hi, zkey"
    stages, prev, s, k = [], "h0", 1 << 15, 0
    while s:
        k += 1
        rx = f"(CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END)"
        stages.append(
            f""", h{k} AS (
  SELECT {keep},
         hkey + CAST({s * s} AS BIGINT) * xor(3 * {rx}, {ry}) AS hkey,
         CASE WHEN {ry} = 0 THEN
              (CASE WHEN {rx} = 1 THEN {s - 1} - hy ELSE hy END)
         ELSE hx END AS hx,
         CASE WHEN {ry} = 0 THEN
              (CASE WHEN {rx} = 1 THEN {s - 1} - hx ELSE hx END)
         ELSE hy END AS hy
  FROM {prev})"""
        )
        prev = f"h{k}"
        s >>= 1
    buckets = f""", zb AS (
  SELECT zkey >> 25 AS bucket,
         min(x_raw) AS bx_min, max(x_raw) AS bx_max,
         min(y_raw) AS by_min, max(y_raw) AS by_max,
         min(x_lo) AS x_lo, min(x_hi) AS x_hi,
         min(y_lo) AS y_lo, min(y_hi) AS y_hi
  FROM {prev} GROUP BY 1
), lb AS (
  SELECT xq >> 9 AS bucket,
         min(x_raw) AS bx_min, max(x_raw) AS bx_max,
         min(y_raw) AS by_min, max(y_raw) AS by_max,
         min(x_lo) AS x_lo, min(x_hi) AS x_hi,
         min(y_lo) AS y_lo, min(y_hi) AS y_hi
  FROM {prev} GROUP BY 1
), hb AS (
  SELECT hkey >> 25 AS bucket,
         min(x_raw) AS bx_min, max(x_raw) AS bx_max,
         min(y_raw) AS by_min, max(y_raw) AS by_max,
         min(x_lo) AS x_lo, min(x_hi) AS x_hi,
         min(y_lo) AS y_lo, min(y_hi) AS y_hi
  FROM {prev} GROUP BY 1
), all_layouts AS (
  SELECT 'zorder' AS layout, COUNT(*) AS n_buckets,
         SUM(CASE WHEN bx_min <= x_hi AND bx_max >= x_lo
             THEN 1 ELSE 0 END) AS touched_x,
         SUM(CASE WHEN by_min <= y_hi AND by_max >= y_lo
             THEN 1 ELSE 0 END) AS touched_y
  FROM zb
  UNION ALL
  SELECT 'linear', COUNT(*),
         SUM(CASE WHEN bx_min <= x_hi AND bx_max >= x_lo
             THEN 1 ELSE 0 END),
         SUM(CASE WHEN by_min <= y_hi AND by_max >= y_lo
             THEN 1 ELSE 0 END)
  FROM lb
  UNION ALL
  SELECT 'hilbert', COUNT(*),
         SUM(CASE WHEN bx_min <= x_hi AND bx_max >= x_lo
             THEN 1 ELSE 0 END),
         SUM(CASE WHEN by_min <= y_hi AND by_max >= y_lo
             THEN 1 ELSE 0 END)
  FROM hb
)
SELECT layout,
       CAST(n_buckets AS BIGINT) AS n_buckets,
       CAST(touched_x AS BIGINT) AS touched_x,
       CAST(touched_y AS BIGINT) AS touched_y,
       CAST(touched_x AS DOUBLE) / n_buckets AS frac_x,
       CAST(touched_y AS DOUBLE) / n_buckets AS frac_y
FROM all_layouts ORDER BY layout"""
    return base + "".join(stages) + buckets


EXTRA_ORACLES["x144_hilbert_layout"] = _hilbert_layout_oracle()

# x140: same planted mirror overlay; md5 grouping == text equality.
# NULL-safe key mirrors the engine: NULL-text rows keep a per-id
# sentinel group (n_copies = 1) instead of vanishing at the NULL join.
EXTRA_ORACLES["x140_priority_dedup"] = """
WITH corpus AS (
  SELECT COALESCE(md5(text),
                  'null:' || CAST(doc_id AS VARCHAR)) AS content_hash,
         CASE WHEN source = 'mirror' THEN 0 ELSE 1 END AS prio,
         doc_id, source
  FROM (
    SELECT doc_id, text, source FROM documents
    UNION ALL
    SELECT doc_id + 10000000 AS doc_id, text, 'mirror' AS source
    FROM documents WHERE doc_id % 7 = 3
  )
), kept AS (
  SELECT content_hash, doc_id, source FROM (
    SELECT *, row_number() OVER (
             PARTITION BY content_hash ORDER BY prio, doc_id) AS rn
    FROM corpus) WHERE rn = 1
), stats AS (
  SELECT content_hash, COUNT(*) AS n_copies,
         COUNT(DISTINCT source) AS n_sources
  FROM corpus GROUP BY content_hash
)
SELECT k.doc_id, k.source,
       CAST(s.n_copies AS BIGINT) AS n_copies,
       CAST(s.n_sources AS BIGINT) AS n_sources
FROM kept k JOIN stats s USING (content_hash)
ORDER BY k.doc_id
"""

# x141: clusters + quality recomputed from the raw tables (the x104b
# pattern — the driver hash proves the materialized state matches this
# ground truth), then the same election before/after the erase list.
EXTRA_ORACLES["x141_delete_propagation"] = f"""
WITH RECURSIVE {_CLUSTER_CTES},
q AS (
  SELECT doc_id,
         ROUND(0.5 * (1.0 - CAST(len(list_filter({_TOKENS.format(t='text')},
                 x -> x IN {_STOPWORDS_SQL})) AS DOUBLE)
               / len({_TOKENS.format(t='text')}))
               + 0.5 * least(CAST(length(text) AS DOUBLE) / 500.0, 1.0),
               6) AS quality
  FROM documents
), member AS (
  -- membership from the cluster state ALONE; quality left-joined for
  -- the election ordering only (matches propagate_deletes' contract)
  SELECT c.doc_id, c.cluster_id, q.quality
  FROM clu c LEFT JOIN q USING (doc_id)
), del AS (
  SELECT doc_id FROM documents WHERE doc_id % 17 = 5
), aff AS (
  SELECT DISTINCT cluster_id FROM clu
  WHERE doc_id IN (SELECT doc_id FROM del)
), m AS (
  SELECT member.* FROM member JOIN aff USING (cluster_id)
), oldc AS (
  SELECT cluster_id, doc_id AS old_canonical FROM (
    SELECT cluster_id, doc_id,
           row_number() OVER (PARTITION BY cluster_id
                              ORDER BY quality DESC NULLS LAST, doc_id) AS rn
    FROM m) WHERE rn = 1
), nb AS (
  SELECT cluster_id, COUNT(*) AS n_before FROM m GROUP BY cluster_id
), surv AS (
  SELECT * FROM m WHERE doc_id NOT IN (SELECT doc_id FROM del)
), newc AS (
  SELECT cluster_id, doc_id AS new_canonical FROM (
    SELECT cluster_id, doc_id,
           row_number() OVER (PARTITION BY cluster_id
                              ORDER BY quality DESC NULLS LAST, doc_id) AS rn
    FROM surv) WHERE rn = 1
), na AS (
  SELECT cluster_id, COUNT(*) AS n_after FROM surv GROUP BY cluster_id
)
SELECT o.cluster_id, o.old_canonical, n.new_canonical,
       CAST(nb.n_before AS BIGINT) AS n_before,
       CAST(COALESCE(na.n_after, 0) AS BIGINT) AS n_after
FROM oldc o
JOIN nb USING (cluster_id)
LEFT JOIN newc n USING (cluster_id)
LEFT JOIN na USING (cluster_id)
ORDER BY o.cluster_id
"""


# x99: the composed five-stage corpus-prep chain (VERDICT r8 item 2 — the
# rows-only slot had "no structural reason": each stage is deterministic
# and individually oracle-verified, so the composed oracle is their
# CONCATENATION as one CTE chain). Stage twins: quality gate = x46's
# per-doc rules; exact dedup = x01's min-id representative; decontam =
# x84's 5-gram semi-join vs the doc_id%10=0 eval slice of the FULL corpus
# (prepare_training_corpus receives eval_df before gating); DSIR = x87's
# bucket log-ratio model with raw = the CLEAN slice and target = the
# full-corpus English slice, n_buckets=1000, then top-floor(n*0.5) by
# (importance DESC, doc_id) with k >= 1 (select_top_fraction's
# max(1, int(n*f))); chunking = x67's slice explode at chunk_tokens=64,
# stride=48.
EXTRA_ORACLES["x99_corpus_prep"] = f"""
WITH t0 AS (
  SELECT doc_id, text, {_TOKENS.format(t='text')} AS toks FROM documents
), gated AS (
  SELECT doc_id, text FROM t0
  WHERE len(toks) BETWEEN 10 AND 1000
    AND CAST(len(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
        / len(text) >= 0.6
    AND len(list_filter(toks, x -> x IN {_STOPWORDS_SQL})) >= 1
    AND (CASE WHEN len(toks) >= 2 THEN
           1 - CAST(len(list_distinct(list_transform(
                 generate_series(1, len(toks) - 1),
                 i -> toks[i] || ' ' || toks[i + 1]))) AS DOUBLE)
             / (len(toks) - 1)
         ELSE 0.0 END) <= 0.5
), reps AS (
  SELECT MIN(doc_id) AS doc_id, text FROM gated GROUP BY text
), evtoks AS (
  SELECT {_TOKENS.format(t='text')} AS t FROM documents WHERE doc_id % 10 = 0
), ev AS (
  SELECT DISTINCT t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
         || ' ' || t[i+4] AS gram
  FROM (SELECT t, UNNEST(generate_series(1, len(t) - 4)) AS i
        FROM evtoks WHERE len(t) >= 5)
), rgrams AS (
  SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
         || ' ' || t[i+4] AS gram
  FROM (SELECT doc_id, t, UNNEST(generate_series(1, len(t) - 4)) AS i
        FROM (SELECT doc_id, {_TOKENS.format(t='text')} AS t FROM reps)
        WHERE len(t) >= 5)
), clean AS (
  SELECT doc_id, text FROM reps
  WHERE doc_id NOT IN (SELECT DISTINCT doc_id FROM rgrams JOIN ev USING (gram))
), rb AS (
  SELECT doc_id, {_hash_bucket_mod('tok', 1000)} AS bucket
  FROM (SELECT doc_id, unnest({_TOKENS.format(t='text')}) AS tok FROM clean)
), tb AS (
  SELECT {_hash_bucket_mod('tok', 1000)} AS bucket
  FROM (SELECT unnest({_TOKENS.format(t='text')}) AS tok
        FROM documents WHERE lang = 'en')
), tc AS (
  SELECT bucket, COUNT(*) AS c_t FROM tb GROUP BY bucket
), rc AS (
  SELECT bucket, COUNT(*) AS c_r FROM rb GROUP BY bucket
), j AS (
  SELECT COALESCE(tc.bucket, rc.bucket) AS bucket,
         COALESCE(c_t, 0) AS c_t, COALESCE(c_r, 0) AS c_r
  FROM tc FULL OUTER JOIN rc ON tc.bucket = rc.bucket
), tot AS (
  SELECT SUM(c_t) AS tot_t, SUM(c_r) AS tot_r FROM j
), lr AS (
  SELECT bucket,
         ROUND(ln((c_t + 1) / CAST(tot_t + 1000 AS DOUBLE))
             - ln((c_r + 1) / CAST(tot_r + 1000 AS DOUBLE)), 9) AS log_ratio
  FROM j CROSS JOIN tot
), scored AS (
  SELECT rb.doc_id,
         CAST(CAST(SUM(CAST(log_ratio AS DECIMAL(38,12))) AS VARCHAR)
              AS DOUBLE) AS importance
  FROM rb JOIN lr USING (bucket) GROUP BY rb.doc_id
), allsc AS (
  SELECT c.doc_id, COALESCE(s.importance, 0.0) AS importance
  FROM clean c LEFT JOIN scored s USING (doc_id)
), kn AS (
  SELECT GREATEST(1, CAST(FLOOR(COUNT(*) * 0.5) AS BIGINT)) AS k FROM allsc
), ranked AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY importance DESC, doc_id) AS rnk
  FROM allsc
), sel AS (
  SELECT c.doc_id, c.text FROM clean c
  JOIN ranked USING (doc_id) CROSS JOIN kn WHERE ranked.rnk <= kn.k
), sized AS (
  SELECT doc_id, t, len(t) AS n_tokens
  FROM (SELECT doc_id, {_TOKENS.format(t='text')} AS t FROM sel)
  WHERE len(t) >= 1
), exploded AS (
  SELECT doc_id, n_tokens, t,
         UNNEST(generate_series(0, n_tokens - 1, 48)) AS chunk_start
  FROM sized
)
SELECT doc_id, n_tokens,
       CAST(chunk_start / 48 AS INTEGER) AS chunk_id,
       chunk_start,
       len(t[chunk_start + 1 : chunk_start + 64]) AS chunk_len,
       array_to_string(t[chunk_start + 1 : chunk_start + 64], ' ') AS chunk_text
FROM exploded
ORDER BY doc_id, chunk_id
"""


# x76b: the daily->weekly sketch rollup in EXACT mode (theta users at
# lg_k=16, KLL values at k=32767 — both sized over the per-week bounds
# at test scales), so the oracle is the plain weekly SQL over raw
# events: exact distinct users, exact inclusive-rank (percentile_disc)
# quantiles, exact counts. The x77b recipe applied to the rollup's
# MERGE path (verdict r12 item 2).
EXTRA_ORACLES["x76b_sketch_rollup_exact"] = """
SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS approx_users,
       quantile_disc(value, 0.5) AS p50_value,
       quantile_disc(value, 0.95) AS p95_value,
       COUNT(*) AS n_events
FROM events
GROUP BY 1
ORDER BY 1
"""


# x77b: theta-sketch overlap in EXACT mode (lg_k sized over the
# per-source distinct-shingle count at test scales), so the oracle is
# x48's exact distinct-shingle intersection — the sketch-algebra twin of
# the nprobe==k IVF pin.
EXTRA_ORACLES["x77b_theta_overlap_exact"] = (
    "WITH toks AS (SELECT source, "
    + _TOKENS.format(t="text")
    + """ AS t FROM documents),
idx AS (
  SELECT source, t, UNNEST(generate_series(1, len(t) - 2)) AS i
  FROM toks WHERE len(t) >= 3
), sh AS (
  SELECT DISTINCT source, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
  FROM idx
)
SELECT a.source AS source_a, b.source AS source_b,
       COUNT(*) AS approx_shared_shingles
FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
GROUP BY a.source, b.source
"""
)


# ---------------------------------------------------------------------------
# Final split: the ORACLES / EXTRA_ORACLES partition is DERIVED from
# queries.DRIVER_WINDOW, so rotating the window (as round 3 did, promoting
# x52..x74) automatically moves the matching SQL into the driver-visible
# set — the two files cannot drift. Every window entry whose semantics are
# SQL-expressible must have its SQL registered above (in either dict).
# ---------------------------------------------------------------------------
from .queries import DRIVER_WINDOW  # noqa: E402  (no cycle: queries has no oracle import)

_ALL_ORACLES: dict[str, str] = {**ORACLES, **EXTRA_ORACLES}
ORACLES = {n: _ALL_ORACLES[n] for n in DRIVER_WINDOW if n in _ALL_ORACLES}
EXTRA_ORACLES = {n: s for n, s in _ALL_ORACLES.items() if n not in ORACLES}


def all_oracles() -> dict[str, str]:
    """Driver-window oracles only (every key has a checked queries() slot)."""
    return dict(ORACLES)


def all_oracles_full() -> dict[str, str]:
    """Window + demoted oracles — the complete parity surface for pytest."""
    return {**ORACLES, **EXTRA_ORACLES}
