"""DuckDB oracle SQL for every oracle-checkable query in ``queries.py``.

These run against DuckDB views named after the parquet tables (region,
nation, ..., events, documents, embeddings). Column names and rounding are
aligned 1:1 with the Spark implementations.
"""

from __future__ import annotations

# Shared transcripts derivation (must mirror queries.transcripts exactly).
TRANSCRIPTS_CTE = """
WITH t0 AS (
  SELECT 'c' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT) AS turn_idx,
         CASE WHEN event_type IN ('click','view') THEN 'user'
              WHEN event_type = 'error' THEN 'tool'
              ELSE 'assistant' END AS role,
         props AS text,
         CASE WHEN event_type = 'error' THEN 'search'
              WHEN event_type = 'purchase' THEN 'code'
              ELSE NULL END AS tool,
         ts,
         CAST(value AS DOUBLE) AS value
  FROM events
), t AS (
  SELECT *,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS latency_us,
         CASE WHEN text IS NULL THEN NULL
              ELSE CAST(len(list_filter(string_split(text, ' '), x -> x != '')) AS BIGINT) END AS token_len
  FROM t0
)
"""

_ROLLUP_TMPL = TRANSCRIPTS_CTE + """
SELECT conv_id, role, date_trunc('{unit}', ts) AS bin_start,
       COUNT(*) AS n_turns,
       -- DuckDB SUM(BIGINT) -> HUGEINT (int128); cast back so the dtype
       -- (and thus the driver's value hash) aligns with Spark's bigint.
       CAST(SUM(token_len) AS BIGINT) AS token_len_sum,
       COUNT(latency_us) AS n_latency,
       list_sort(list(latency_us) FILTER (latency_us IS NOT NULL))
         [CAST(floor((COUNT(latency_us) - 1) * 0.5) AS INT) + 1] AS latency_p50,
       list_sort(list(latency_us) FILTER (latency_us IS NOT NULL))
         [CAST(floor((COUNT(latency_us) - 1) * 0.95) AS INT) + 1] AS latency_p95
FROM t
GROUP BY 1, 2, 3
"""

_QC_PREFIX = TRANSCRIPTS_CTE

ORACLES: dict[str, str] = {
    "standardize_transcripts": TRANSCRIPTS_CTE
    + "SELECT conv_id, turn_idx, role, text, tool, ts, latency_us, token_len FROM t",
    # CSV round trip must reproduce the parquet source exactly (the Spark
    # side reads a CSV rendering; the oracle reads the original table)
    "standardize_csv": "SELECT event_id, user_id, event_type, ts, CAST(value AS DOUBLE) AS value, props FROM events",
    "rollup_1m": _ROLLUP_TMPL.format(unit="minute"),
    "rollup_1h": _ROLLUP_TMPL.format(unit="hour"),
    "rollup_1d": _ROLLUP_TMPL.format(unit="day"),
    "tier_summary_1h": TRANSCRIPTS_CTE
    + """
SELECT role, date_trunc('hour', ts) AS bin_start,
       COUNT(*) AS n_turns,
       COUNT(DISTINCT conv_id) AS n_distinct_convs,
       CAST(SUM(token_len) AS BIGINT) AS token_len_sum
FROM t GROUP BY 1, 2
""",
    "qc_missing_text": _QC_PREFIX
    + """
SELECT conv_id, turn_idx,
       CAST(text IS NULL OR text = '' AS INT) AS qc_text
FROM t
""",
    # CheckMonotonic (auto direction): majority vote on consecutive diffs,
    # then fail vs the running max (increasing) / min (decreasing) of all
    # preceding values — check_monotonic.py:78-94 semantics.
    "qc_qc_monotonic_value_placeholder": "",  # replaced below
    "qc_delta_value": _QC_PREFIX
    + """
SELECT conv_id, turn_idx,
       CAST(COALESCE(
         abs(value - COALESCE(lag(value) OVER w, value)) > 30.0,
         FALSE) AS INT) AS qc_delta
FROM t
WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
""",
    "qc_range_value": _QC_PREFIX
    + """
SELECT conv_id, turn_idx,
       CAST(CASE WHEN value < 5.0 THEN 1 ELSE 0 END
          + CASE WHEN value > 95.0 THEN 2 ELSE 0 END AS INT) AS qc_value
FROM t
""",
    "qc_std_value": _QC_PREFIX
    + """
SELECT conv_id, turn_idx,
       CAST(COALESCE(
         value > avg(value) OVER w + stddev_samp(value) OVER w * 2.0,
         FALSE) AS INT) AS qc_std
FROM t
WINDOW w AS (PARTITION BY conv_id)
""",
    "gap_fill_1h": _QC_PREFIX
    + """
, agg AS (
  SELECT conv_id, date_trunc('hour', ts) AS bin_start, COUNT(*) AS n
  FROM t GROUP BY 1, 2
), span AS (
  SELECT conv_id, date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
  FROM t GROUP BY 1
), grid AS (
  SELECT conv_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bin_start
  FROM span
)
SELECT g.conv_id, g.bin_start,
       COALESCE(a.n, 0) AS n_turns,
       CASE WHEN a.n IS NULL THEN 1 ELSE 0 END AS is_gap
FROM grid g LEFT JOIN agg a USING (conv_id, bin_start)
""",
    "dedup_exact": """
SELECT md5(text) AS text_md5,
       MIN(doc_id) AS keeper_doc_id,
       COUNT(*) AS n_copies
FROM documents GROUP BY 1
""",
    "token_count": """
SELECT doc_id,
       CAST(len(list_filter(string_split(text, ' '), x -> x != '')) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(list_filter(string_split(text, ' '), x -> x != ''))) AS BIGINT) AS n_unique_tokens,
       CAST(length(text) AS INT) AS n_chars_computed
FROM documents
""",
    "text_quality": """
WITH d AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS toks
  FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       round(CAST(len(list_filter(toks, x -> x IN ('a', 'the'))) AS DOUBLE) / len(toks), 6) AS stopword_ratio,
       round(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks), 6) AS mean_token_len,
       round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6) AS unique_ratio
FROM d
""",
    "repetition_signals": """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS t
  FROM documents
), base AS (
  SELECT doc_id, len(t) AS n, len(list_distinct(t)) AS nd, t FROM toks
), grams AS (
  SELECT doc_id, t[i] || ' ' || t[i + 1] AS g
  FROM base, unnest(range(1, n)) AS r(i)
  WHERE n >= 2
), gc AS (
  SELECT doc_id, g, count(*) AS c FROM grams GROUP BY 1, 2
), top AS (
  SELECT doc_id, max(c) AS mc FROM gc GROUP BY 1
)
SELECT b.doc_id,
       CAST(b.n AS BIGINT) AS n_tokens,
       CASE WHEN b.n > 0 THEN round(1.0 - CAST(b.nd AS DOUBLE) / b.n, 6)
            ELSE 0.0 END AS dup_token_frac,
       CASE WHEN b.n >= 2 THEN round(CAST(coalesce(t2.mc, 0) AS DOUBLE) / (b.n - 1), 6)
            ELSE 0.0 END AS top_bigram_frac
FROM base b LEFT JOIN top t2 USING (doc_id)
""",
    "lang_id": """
WITH d AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS toks
  FROM documents
), s AS (
  SELECT doc_id,
         CAST(len(list_filter(toks, x -> x IN ('a', 'the', 'of', 'and'))) AS DOUBLE) / len(toks) AS ratio
  FROM d
)
SELECT doc_id,
       CASE WHEN ratio >= 0.02 THEN 'en' ELSE 'unknown' END AS lang_pred,
       round(ratio, 6) AS stopword_score
FROM s
""",
    "knn_cosine": """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), q AS (
  SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 20
), scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_dot_product(e.v, q.qv)
           / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS cos
  FROM e, q WHERE e.vec_id != q.query_id
), ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, round(cos, 6) AS cosine
FROM ranked WHERE rank <= 5
""",
}

# Engine-native t-digest 1m tier: counts/sums exact; the percentile bracket
# booleans are asserted Spark-side (see __spark_entry__._tier_1m_tdigest) and
# must come out TRUE — the oracle emits the literal. token_len_sum uses
# COALESCE(.., 0) because the engine's vectorized partial aggregation treats
# missing token counts as 0 (nan_to_num in tiers.phase1), whereas SQL SUM of
# an all-NULL group is NULL.
ORACLES["tier_1m_tdigest"] = TRANSCRIPTS_CTE + """
SELECT conv_id, role, date_trunc('minute', ts) AS bin_start,
       COUNT(*) AS n_turns,
       COALESCE(CAST(SUM(token_len) AS BIGINT), 0) AS token_len_sum,
       COUNT(latency_us) AS n_latency,
       TRUE AS p50_in_bracket,
       TRUE AS p95_in_bracket
FROM t GROUP BY 1, 2, 3
"""

ORACLES["qc_mask_threshold"] = _QC_PREFIX + """
SELECT conv_id, turn_idx,
       CAST(COALESCE(value >= 90.0, FALSE) AS INT) AS qc_mask
FROM t
"""

ORACLES["unit_convert"] = _QC_PREFIX + """
SELECT conv_id, turn_idx,
       round(value * (5.0/9.0) + (-32.0 * 5.0/9.0), 6) AS value_degc
FROM t
"""

ORACLES["sessionize"] = _QC_PREFIX + """
, g AS (
  SELECT conv_id, turn_idx, ts, token_len,
         epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap
  FROM t WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
), s AS (
  SELECT conv_id, ts, token_len,
         CAST(SUM(CASE WHEN gap IS NULL OR gap > 1800000000 THEN 1 ELSE 0 END)
           OVER (PARTITION BY conv_id ORDER BY turn_idx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS BIGINT) AS session_idx
  FROM g
)
SELECT conv_id, session_idx,
       COUNT(*) AS n_turns,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       CAST(SUM(token_len) AS BIGINT) AS token_len_sum
FROM s GROUP BY 1, 2
"""

# --- dedup-family oracles: shared deterministic integer hashing -----------

_HASH_CTE = """
WITH d AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS toks
  FROM documents
), sh AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3 THEN
           list_transform(generate_series(1, len(toks) - 2),
                          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         ELSE [array_to_string(toks, ' ')] END AS shingles,
         toks
  FROM d
), hs AS (
  SELECT doc_id,
         list_transform(shingles, s ->
           list_reduce(list_prepend(CAST(7 AS BIGINT),
                                    list_transform(string_split(s, ''), ch -> CAST(ord(ch) AS BIGINT))),
                       (acc, x) -> (acc * 31 + x) % 1000000007)) AS hv,
         toks
  FROM sh
)
"""

_MH_COLS = ",\n  ".join(
    f"list_min(list_transform(hv, h -> ({2 * i + 1} * h + {7919 * i + 13}) % 2147483647)) AS mh{i}"
    for i in range(16)
)

ORACLES["minhash_signatures"] = _HASH_CTE + f"SELECT doc_id,\n  {_MH_COLS}\nFROM hs"

_BAND_SELECTS = "\nUNION ALL\n".join(
    f"SELECT doc_id, {j} AS band, "
    + " || '_' || ".join(f"CAST(mh{j * 4 + r} AS VARCHAR)" for r in range(4))
    + " AS key FROM sig"
    for j in range(4)
)
ORACLES["lsh_pairs"] = (
    _HASH_CTE
    + f", sig AS (SELECT doc_id,\n  {_MH_COLS}\nFROM hs)\n"
    + f", banded AS (\n{_BAND_SELECTS}\n)\n"
    + """
SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
FROM banded l JOIN banded r ON l.band = r.band AND l.key = r.key
WHERE l.doc_id < r.doc_id
"""
)

ORACLES["token_count_bpe"] = """
SELECT doc_id,
       CAST(len(list_filter(string_split(text, ' '), x -> x != '')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS BIGINT) AS n_bpe_tokens,
       ROUND(CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS DOUBLE)
             / GREATEST(len(list_filter(string_split(text, ' '), x -> x != '')), 1), 6) AS bpe_per_word
FROM documents
"""

ORACLES["dedup_clusters"] = (
    _HASH_CTE.replace("WITH d AS", "WITH RECURSIVE d AS", 1)
    + f", sig AS (SELECT doc_id,\n  {_MH_COLS}\nFROM hs)\n"
    + f", banded AS (\n{_BAND_SELECTS}\n)\n"
    + """
, pairs AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM banded l JOIN banded r ON l.band = r.band AND l.key = r.key
  WHERE l.doc_id < r.doc_id
), edges AS (
  SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs
), reach AS (
  -- transitive closure by monotone label spread; UNION dedups -> terminates
  SELECT doc_id AS node, doc_id AS lbl FROM documents
  UNION
  SELECT e.a AS node, r.lbl FROM edges e JOIN reach r ON e.b = r.node
)
SELECT node AS doc_id,
       MIN(lbl) AS cluster_id,
       (node = MIN(lbl)) AS is_keeper
FROM reach
GROUP BY node
"""
)

_SIMHASH_BITS = "\n       + ".join(
    f"CASE WHEN list_sum(list_transform(ht, h -> CASE WHEN (h & {1 << j}) != 0 THEN 1 ELSE -1 END)) > 0 THEN {1 << j} ELSE 0 END"
    for j in range(16)
)
ORACLES["simhash16"] = _HASH_CTE + f""", ht AS (
  SELECT doc_id,
         list_transform(toks, t ->
           list_reduce(list_prepend(CAST(7 AS BIGINT),
                                    list_transform(string_split(t, ''), ch -> CAST(ord(ch) AS BIGINT))),
                       (acc, x) -> (acc * 31 + x) % 1000000007)) AS ht
  FROM d
)
SELECT doc_id,
       CAST({_SIMHASH_BITS} AS BIGINT) AS simhash
FROM ht
"""

# winnowing: window-of-4 minima over the same 3-gram hash array as minhash
ORACLES["fingerprint_winnow"] = _HASH_CTE + """
SELECT doc_id,
       unnest(list_distinct(list_transform(
         generate_series(1, greatest(len(hv) - 3, 1)),
         i -> list_min(hv[i:i+3])))) AS fingerprint
FROM hs
"""

ORACLES["contamination_overlap"] = _HASH_CTE + """, fp AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    generate_series(1, greatest(len(hv) - 3, 1)), i -> list_min(hv[i:i+3])))) AS fingerprint
  FROM hs
), fps AS (
  SELECT f.doc_id, dd.source, f.fingerprint
  FROM fp f JOIN documents dd USING (doc_id)
), rare AS (
  SELECT fingerprint FROM fps GROUP BY 1 HAVING count(DISTINCT doc_id) <= 50
), fpr AS (
  SELECT fps.* FROM fps JOIN rare USING (fingerprint)
)
SELECT l.doc_id AS doc_a, r.doc_id AS doc_b,
       l.source AS src_a, r.source AS src_b,
       count(*) AS n_shared
FROM fpr l JOIN fpr r ON l.fingerprint = r.fingerprint
  AND l.doc_id < r.doc_id AND l.source <> r.source
GROUP BY 1, 2, 3, 4
HAVING count(*) >= 3
"""

ORACLES["jaccard_pairs"] = """
WITH d AS (
  SELECT doc_id, source, list_filter(string_split(text, ' '), x -> x != '') AS toks
  FROM documents
), sh AS (
  SELECT doc_id, source,
         list_distinct(CASE WHEN len(toks) >= 3 THEN
           list_transform(generate_series(1, len(toks) - 2),
                          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         ELSE [array_to_string(toks, ' ')] END) AS sh
  FROM d
)
SELECT l.doc_id AS doc_a, r.doc_id AS doc_b,
       round(CAST(len(list_intersect(l.sh, r.sh)) AS DOUBLE)
             / len(list_distinct(l.sh || r.sh)), 6) AS jaccard
FROM sh l JOIN sh r ON l.source = r.source AND l.doc_id < r.doc_id
"""

def _ann_lsh_oracle() -> str:
    from .vector.ann import hyperplanes

    planes = hyperplanes(64, 8)
    bucket_terms = " + ".join(
        f"(CASE WHEN list_dot_product(v, [{', '.join(repr(float(w)) for w in plane)}]::DOUBLE[]) > 0 THEN {1 << j} ELSE 0 END)"
        for j, plane in enumerate(planes)
    )
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), b AS (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
         CAST({bucket_terms} AS BIGINT) AS bucket
  FROM e
)
SELECT l.vec_id AS id_a, r.vec_id AS id_b, l.bucket AS bucket,
       round(list_dot_product(l.v, r.v) / (l.nrm * r.nrm), 6) AS cosine
FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
"""


ORACLES["ann_lsh"] = _ann_lsh_oracle()


def _ann_lsh_multi_oracle(n_tables: int = 3) -> str:
    """OR-amplified LSH: candidate iff same bucket in ANY of n_tables
    independent plane tables (seeds LSH_SEED+t) — replays
    vector.ann.ann_lsh_pairs_multi exactly; the oracle's OR-join is
    quadratic but sf0.01-sized."""
    from .vector.ann import LSH_SEED, hyperplanes

    buckets = []
    for t in range(n_tables):
        planes = hyperplanes(64, 8, LSH_SEED + t)
        terms = " + ".join(
            f"(CASE WHEN list_dot_product(v, [{', '.join(repr(float(w)) for w in plane)}]::DOUBLE[]) > 0 THEN {1 << j} ELSE 0 END)"
            for j, plane in enumerate(planes)
        )
        buckets.append(f"CAST({terms} AS BIGINT) AS bucket{t}")
    bcols = ",\n         ".join(buckets)
    cond = " OR ".join(f"l.bucket{t} = r.bucket{t}" for t in range(n_tables))
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), b AS (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
         {bcols}
  FROM e
)
SELECT DISTINCT l.vec_id AS id_a, r.vec_id AS id_b,
       round(list_dot_product(l.v, r.v) / (l.nrm * r.nrm), 6) AS cosine
FROM b l JOIN b r ON l.vec_id < r.vec_id AND ({cond})
"""


ORACLES["ann_lsh_multi"] = _ann_lsh_multi_oracle()

ORACLES["embedding_top1"] = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), scored AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         list_dot_product(e.v, q.v)
           / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.v, q.v))) AS cos
  FROM e, e q WHERE e.vec_id != q.vec_id
), ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
  FROM scored
)
SELECT query_id, neighbor_id, round(cos, 6) AS cosine
FROM ranked WHERE rnk = 1
"""

# --- transform oracles: identical arithmetic, same operand order, both
# engines in IEEE float64, outputs rounded to 6 dp -------------------------

_G0_US = 1704067200000000  # epoch µs of 2024-01-01 (EVENTS_GRID_START)
_G1_US = 1709251200000000  # epoch µs of 2024-03-01 (EVENTS_GRID_STOP)

# M4 downsample: struct min/max arg-extremes — {'t':…,'v':…} orders by
# (t, v) lexicographically in DuckDB exactly as F.struct(t, v) does in
# Spark, so first/last/min/max tie-breaks are engine-identical.
ORACLES["m4_downsample"] = f"""
WITH pts AS (
  SELECT event_type,
         CAST(floor((epoch_us(ts) - {_G0_US}) * 64 / ({_G1_US} - {_G0_US})) AS INT) AS bin,
         epoch_us(ts) AS t,
         CAST(value AS DOUBLE) AS v
  FROM events
  WHERE value IS NOT NULL
    AND epoch_us(ts) >= {_G0_US} AND epoch_us(ts) < {_G1_US}
)
SELECT event_type, bin,
       (min({{'t': t, 'v': v}})).t AS t_first,
       round((min({{'t': t, 'v': v}})).v, 6) AS v_first,
       round((min({{'v': v, 't': t}})).v, 6) AS v_min,
       (min({{'v': v, 't': t}})).t AS t_min,
       round((max({{'v': v, 't': t}})).v, 6) AS v_max,
       (max({{'v': v, 't': t}})).t AS t_max,
       (max({{'t': t, 'v': v}})).t AS t_last,
       round((max({{'t': t, 'v': v}})).v, 6) AS v_last,
       count(*) AS n_points
FROM pts GROUP BY event_type, bin
"""

ORACLES["bin_average_30m"] = """
WITH src AS (
  SELECT event_type, CAST(epoch_us(ts) AS DOUBLE) AS t, CAST(value AS DOUBLE) AS v
  FROM events
), b AS (
  SELECT event_type, t, v,
         COALESCE(t - lag(t) OVER w, lead(t) OVER w - t, 1800000000.0) AS width
  FROM src WINDOW w AS (PARTITION BY event_type ORDER BY t)
), ib AS (
  SELECT event_type, v, t - width * 0.5 AS s, (t - width * 0.5) + width AS e FROM b
), grid AS (
  SELECT range AS j,
         {g0} + range * 1800000000.0 - 1800000000.0 AS bs,
         ({g0} + range * 1800000000.0 - 1800000000.0) + 1800000000.0 AS be
  FROM range(0, 2880)
), joined AS (
  SELECT ib.event_type, ib.v, grid.j,
         (least(ib.e, grid.be) - greatest(ib.s, grid.bs)) / (ib.e - ib.s) AS w
  FROM ib JOIN grid
    ON ib.s < grid.be AND ib.e > grid.bs AND ib.e > ib.s
  WHERE (least(ib.e, grid.be) - greatest(ib.s, grid.bs)) > 0
), agg AS (
  SELECT event_type, j,
         COUNT(*) AS n,
         SUM(CASE WHEN v IS NOT NULL THEN w END) AS sw,
         SUM(CASE WHEN v IS NOT NULL THEN w * v END) AS swx,
         SUM(CASE WHEN v IS NOT NULL THEN w * v * v END) AS swx2,
         SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS nbad,
         SUM(CASE WHEN v IS NOT NULL THEN w * 1.0 END) AS good
  FROM joined GROUP BY 1, 2
), frame AS (
  SELECT et.event_type, grid.j FROM (SELECT DISTINCT event_type FROM src) et, grid
)
SELECT f.event_type,
       make_timestamp(CAST({g0} + f.j * 1800000000.0 AS BIGINT)) AS bin_label,
       round(CASE WHEN sw > 0 THEN swx / sw END, 6) AS value_avg,
       round(CASE WHEN sw > 0 THEN sqrt(greatest(swx2 / sw - (swx / sw) * (swx / sw), 0.0)) END, 6) AS value_std,
       round(CASE WHEN sw > 0 THEN good / sw END, 6) AS value_goodfraction,
       CAST(CASE WHEN a.n IS NULL THEN 129 ELSE
         (CASE WHEN nbad > 0 AND nbad < n THEN 32 ELSE 0 END)
       + (CASE WHEN nbad = n THEN 257 ELSE 0 END)
       + (CASE WHEN 1.0 - CAST(nbad AS DOUBLE) / n < 0.05 THEN 2048 ELSE 0 END)
       + (CASE WHEN 1.0 - CAST(nbad AS DOUBLE) / n < 0.15 THEN 4096 ELSE 0 END)
       END AS INT) AS qc_value
FROM frame f LEFT JOIN agg a ON f.event_type = a.event_type AND f.j = a.j
""".format(g0=_G0_US)

ORACLES["nearest_1h"] = TRANSCRIPTS_CTE + """
, d AS (
  SELECT conv_id, CAST(epoch_us(ts) AS DOUBLE) AS pos, 0 AS is_grid,
         CAST(epoch_us(ts) AS DOUBLE) AS dts, value AS dv
  FROM t
), g AS (
  SELECT c.conv_id, {g0} + r.range * 3600000000.0 AS pos, 1 AS is_grid,
         CAST(NULL AS DOUBLE) AS dts, CAST(NULL AS DOUBLE) AS dv
  FROM (SELECT DISTINCT conv_id FROM t) c, range(0, 1440) r
), u AS (
  SELECT * FROM d UNION ALL SELECT * FROM g
), w AS (
  SELECT conv_id, pos, is_grid,
         last_value(dts IGNORE NULLS) OVER wp AS prev_ts,
         last_value(dv IGNORE NULLS) OVER wp AS prev_v,
         first_value(dts IGNORE NULLS) OVER wn AS next_ts,
         first_value(dv IGNORE NULLS) OVER wn AS next_v
  FROM u
  WINDOW wp AS (PARTITION BY conv_id ORDER BY pos, is_grid
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY conv_id ORDER BY pos, is_grid
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
), picked AS (
  SELECT conv_id, pos,
         CASE WHEN next_ts IS NOT NULL AND (prev_ts IS NULL OR (next_ts - pos) <= (pos - prev_ts))
              THEN next_v ELSE prev_v END AS chosen,
         CASE WHEN next_ts IS NOT NULL AND (prev_ts IS NULL OR (next_ts - pos) <= (pos - prev_ts))
              THEN next_ts - pos ELSE pos - prev_ts END AS dist
  FROM w WHERE is_grid = 1
)
SELECT conv_id,
       make_timestamp(CAST(pos AS BIGINT)) AS bin_label,
       round(CASE WHEN chosen IS NOT NULL AND dist <= 1800000000.0 THEN chosen END, 6) AS value_nn,
       CAST(CASE WHEN chosen IS NOT NULL AND dist <= 1800000000.0 THEN 0 ELSE 129 END AS INT) AS qc_value
FROM picked
""".format(g0=_G0_US)

ORACLES["interpolate_1h"] = TRANSCRIPTS_CTE + """
, b AS (
  SELECT conv_id, CAST(epoch_us(ts) AS DOUBLE) AS pos, value AS dv,
         COALESCE(CAST(epoch_us(ts) AS DOUBLE) - lag(CAST(epoch_us(ts) AS DOUBLE)) OVER w,
                  lead(CAST(epoch_us(ts) AS DOUBLE)) OVER w - CAST(epoch_us(ts) AS DOUBLE),
                  3600000000.0) AS width,
         row_number() OVER w AS rnk
  FROM t WINDOW w AS (PARTITION BY conv_id ORDER BY ts)
), d AS (
  SELECT conv_id, rnk, pos, dv,
         pos - width * 0.5 AS ins, (pos - width * 0.5) + width AS ine
  FROM b
), g AS (
  SELECT c.conv_id, {g0} + r.range * 3600000000.0 AS gpos
  FROM (SELECT DISTINCT conv_id FROM t) c, range(0, 1440) r
), u AS (
  SELECT conv_id, pos AS upos, 0 AS is_grid, CAST(NULL AS DOUBLE) AS gpos FROM d
  UNION ALL
  SELECT conv_id, gpos AS upos, 1 AS is_grid, gpos FROM g
), k AS (
  SELECT conv_id, upos, is_grid, gpos,
         SUM(1 - is_grid) OVER (PARTITION BY conv_id ORDER BY upos, is_grid
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS kk
  FROM u
), cand AS (
  SELECT conv_id, gpos, unnest([kk - 1, kk, kk + 1, kk + 2]) AS rnk
  FROM k WHERE is_grid = 1
), joined AS (
  SELECT c.conv_id, c.gpos,
         (d.ins + d.ine) * 0.5 AS mid, d.dv
  FROM cand c JOIN d ON c.conv_id = d.conv_id AND c.rnk = d.rnk
  WHERE d.ine > c.gpos - 3600000000.0 AND d.ins < c.gpos + 3600000000.0
), agg AS (
  SELECT conv_id, gpos,
         list_sort(list(struct_pack(adist := abs(mid - gpos), x := mid, v := dv)))[1:2] AS near
  FROM joined GROUP BY 1, 2
), completed AS (
  SELECT g.conv_id, g.gpos, a.near FROM g LEFT JOIN agg a USING (conv_id, gpos)
)
SELECT conv_id,
       make_timestamp(CAST(gpos AS BIGINT)) AS bin_label,
       round(CASE WHEN len(near) >= 2 THEN
         CASE WHEN near[1].x <= gpos AND gpos <= near[2].x
                THEN near[1].v + (near[2].v - near[1].v) / (near[2].x - near[1].x) * (gpos - near[1].x)
              WHEN gpos < near[1].x
                THEN near[1].v + (near[2].v - near[1].v) / (near[2].x - near[1].x) * (gpos - near[1].x)
              ELSE near[2].v + (near[2].v - near[1].v) / (near[2].x - near[1].x) * (gpos - near[2].x)
         END
       END, 6) AS value_li,
       CAST(CASE WHEN near IS NULL OR len(near) < 2 THEN 129
                 WHEN (near[1].x < gpos AND near[2].x < gpos)
                   OR (near[1].x > gpos AND near[2].x > gpos) THEN 8
                 ELSE 0 END AS INT) AS qc_value
FROM completed
""".format(g0=_G0_US)

ORACLES["qc_monotonic_value"] = _QC_PREFIX + """
, lagged AS (
  SELECT conv_id, turn_idx, value,
         max(value) OVER wprev AS run_max,
         min(value) OVER wprev AS run_min,
         lag(value) OVER wo AS prev_value
  FROM t
  WINDOW wo AS (PARTITION BY conv_id ORDER BY turn_idx),
         wprev AS (PARTITION BY conv_id ORDER BY turn_idx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
), d AS (
  SELECT *,
         SUM(CASE WHEN value > prev_value THEN 1 ELSE 0 END) OVER wc AS n_up,
         SUM(CASE WHEN value < prev_value THEN 1 ELSE 0 END) OVER wc AS n_down
  FROM lagged
  WINDOW wc AS (PARTITION BY conv_id)
)
SELECT conv_id, turn_idx,
       -- non-first NULL values fail, mirroring checkers.py check_monotonic's
       -- null_fail term (reference: NaN > prev is False -> flagged); turn_idx
       -- is the 0-based per-conv row number, so turn_idx > 0 == "has a
       -- preceding row".
       CAST(CASE
         WHEN n_up >= n_down
           THEN (value IS NULL AND turn_idx > 0) OR COALESCE(value <= run_max, FALSE)
         ELSE (value IS NULL AND turn_idx > 0) OR COALESCE(value >= run_min, FALSE)
       END AS INT) AS qc_monotonic
FROM d
"""
del ORACLES["qc_qc_monotonic_value_placeholder"]

# the contraction path must produce the identical cluster assignment
ORACLES["dedup_clusters_contraction"] = ORACLES["dedup_clusters"]

_CC = ORACLES["dedup_clusters"]
# wrap the full recursive query as a subselect and join the quality columns
ORACLES["clean_corpus"] = f"""
WITH clusters AS (
{_CC}
), scored AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '), x -> x != '')) AS BIGINT) AS n_tokens,
         ROUND(CAST(len(list_filter(string_split(text, ' '),
                    x -> x IN ('a','the','of','and'))) AS DOUBLE)
               / len(list_filter(string_split(text, ' '), x -> x != '')), 6) AS stopword_score
  FROM documents
)
SELECT s.doc_id, c.cluster_id, c.is_keeper, s.n_tokens, s.stopword_score,
       (c.is_keeper AND s.stopword_score >= 0.02 AND s.n_tokens >= 5) AS in_clean_corpus
FROM scored s JOIN clusters c ON s.doc_id = c.doc_id
"""


# --- round-3 additions: near-dup, IVF, sampling, tokens, HLL tier ---------

# Exact embedding-cosine near-dup pairs at τ=0.45 (queries.NEARDUP_TAU).
# The threshold filter runs on the UNROUNDED cosine on both sides; the
# emitted value is rounded to 6.
ORACLES["neardup_cosine"] = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_dot_product(a.v, b.v)
           / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos
  FROM e a, e b WHERE a.vec_id < b.vec_id
)
SELECT id_a, id_b, round(cos, 6) AS cosine
FROM p WHERE cos >= 0.45
"""

# IVF coarse quantization: centroids are the 16 lowest-id vectors
# (queries.IVF_N_CELLS); assignment = argmax cosine, ties -> lowest
# centroid id.
ORACLES["ivf_assign"] = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), c AS (
  SELECT vec_id AS centroid_id, v AS cv FROM e ORDER BY vec_id LIMIT 16
), s AS (
  SELECT e.vec_id, c.centroid_id,
         list_dot_product(e.v, c.cv)
           / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) AS cos
  FROM e, c
), r AS (
  SELECT vec_id, centroid_id, cos,
         row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, centroid_id) AS rn
  FROM s
)
SELECT vec_id, centroid_id, round(cos, 6) AS cos FROM r WHERE rn = 1
"""

# IVF top-5 search, production nprobe=4 path: the oracle replays the whole
# deterministic algorithm — assign every vector to its argmax-cosine cell,
# rank each query's 4 nearest cells, exact re-rank within probed cells.
# Ties everywhere -> lowest id, matching the Spark row_number orderings.
ORACLES["ivf_search"] = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), c AS (
  SELECT vec_id AS centroid_id, v AS cv FROM e ORDER BY vec_id LIMIT 16
), s AS (
  SELECT e.vec_id, c.centroid_id,
         list_dot_product(e.v, c.cv)
           / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) AS cos
  FROM e, c
), assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT vec_id, centroid_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, centroid_id) AS rn
    FROM s
  ) WHERE rn = 1
), q AS (
  SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 20
), qs AS (
  SELECT q.query_id, c.centroid_id,
         list_dot_product(q.qv, c.cv)
           / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.cv, c.cv))) AS cos
  FROM q, c
), probes AS (
  SELECT query_id, centroid_id FROM (
    SELECT query_id, centroid_id,
           row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, centroid_id) AS rn
    FROM qs
  ) WHERE rn <= 4
), cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id
  FROM probes p JOIN assign a ON a.centroid_id = p.centroid_id
  WHERE a.vec_id != p.query_id
), scored AS (
  SELECT cand.query_id, cand.neighbor_id,
         list_dot_product(ev.v, q.qv)
           / (sqrt(list_dot_product(ev.v, ev.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS cos
  FROM cand
  JOIN e ev ON ev.vec_id = cand.neighbor_id
  JOIN q ON q.query_id = cand.query_id
), ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, round(cos, 6) AS cosine
FROM ranked WHERE rank <= 5
"""

# Deterministic stratified sample: 50 smallest md5(doc_id) per language.
ORACLES["sample_stratified"] = """
WITH d AS (
  SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS sample_key
  FROM documents
), r AS (
  SELECT doc_id, lang, sample_key,
         CAST(row_number() OVER (PARTITION BY lang ORDER BY sample_key, doc_id) AS INT) AS sample_rank
  FROM d
)
SELECT doc_id, lang, sample_key, sample_rank FROM r WHERE sample_rank <= 50
"""

# Corpus heavy hitters: global top-20 whitespace tokens (ties -> token asc).
ORACLES["top_tokens"] = """
WITH toks AS (
  SELECT unnest(list_filter(string_split(text, ' '), x -> x != '')) AS token
  FROM documents WHERE text IS NOT NULL
), c AS (
  SELECT token, COUNT(*) AS n_occurrences FROM toks GROUP BY 1
), r AS (
  SELECT token, n_occurrences,
         CAST(row_number() OVER (ORDER BY n_occurrences DESC, token) AS INT) AS rank
  FROM c
)
SELECT rank, token, n_occurrences FROM r WHERE rank <= 20
"""

# Mergeable HLL distinct tier: exact per-(role, day) distinct conv counts
# compared exactly; the Spark side's hour-sketch-union estimate must land
# within ±5% (est_within_5pct TRUE) — same bracket-boolean idiom as
# tier_1m_tdigest, so an estimator regression flips the value hash.
ORACLES["distinct_tier_hll"] = TRANSCRIPTS_CTE + """
SELECT role, date_trunc('day', ts) AS day_start,
       COUNT(DISTINCT conv_id) AS n_distinct_convs,
       TRUE AS est_within_5pct
FROM t GROUP BY 1, 2
"""

# PII scrub: the same deterministic injection expression as the Spark side
# (doc_id % 4 selects the span class), then per-type counts on the
# pre-redaction text and a sequential redaction in declared order. The
# patterns live in the RE2 ∩ java.util.regex common subset (see
# text/pii.py) so both engines match identically.
_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_IPV4 = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
_PII_SSN = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
_PII_PHONE = "\\(\\d{3}\\) ?\\d{3}-\\d{4}"
ORACLES["pii_scrub"] = f"""
WITH inj AS (
  SELECT doc_id, text || CASE CAST(doc_id % 4 AS INT)
    WHEN 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
    WHEN 1 THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.17'
    WHEN 2 THEN ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
    ELSE ' call (555) 867-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
  END AS text
  FROM documents
)
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS BIGINT) AS n_email,
  CAST(len(regexp_extract_all(text, '{_PII_IPV4}')) AS BIGINT) AS n_ipv4,
  CAST(len(regexp_extract_all(text, '{_PII_SSN}')) AS BIGINT) AS n_ssn,
  CAST(len(regexp_extract_all(text, '{_PII_PHONE}')) AS BIGINT) AS n_phone,
  regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
    '{_PII_EMAIL}', '<EMAIL>', 'g'),
    '{_PII_IPV4}', '<IP>', 'g'),
    '{_PII_SSN}', '<SSN>', 'g'),
    '{_PII_PHONE}', '<PHONE>', 'g') AS text_redacted
FROM inj
"""

# Corpus-level line dedup over 3-token chunk "lines": first occurrence
# under (doc_id, line_idx) order survives, later duplicates drop; docs
# reassemble from surviving lines in order.
ORACLES["line_dedup"] = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS t
  FROM documents
), lines AS (
  SELECT doc_id, CAST(i AS BIGINT) AS line_idx,
         array_to_string(t[(i*3+1):(i*3+3)], ' ') AS line
  FROM toks, unnest(range(CAST(ceil(len(t) / 3.0) AS BIGINT))) AS r(i)
), marked AS (
  SELECT doc_id, line_idx, line,
         row_number() OVER (PARTITION BY line ORDER BY doc_id, line_idx) = 1 AS keep
  FROM lines
)
SELECT doc_id,
       COUNT(*) AS n_lines,
       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       COALESCE(string_agg(line, ' ' ORDER BY line_idx) FILTER (WHERE keep), '') AS text_clean
FROM marked GROUP BY doc_id
"""

# Sequence packing: global prefix sum over doc_id order — the oracle uses
# the single-reducer window formulation the engine exists to avoid; the
# Spark side's two-phase distributed scan must agree exactly.
ORACLES["pack_sequences"] = """
WITH c AS (
  SELECT doc_id,
         CAST(COALESCE(len(list_filter(string_split(text, ' '), x -> x != '')), 0) AS BIGINT) AS n_tokens
  FROM documents
), s AS (
  -- CAST: DuckDB's SUM(BIGINT) is HUGEINT, which pandas renders as
  -- float64 and the dtype-sensitive hash gate sees 3.0 vs Spark's 3.
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS start_offset
  FROM c
)
SELECT doc_id, n_tokens, start_offset,
       start_offset // 512 AS seq_id,
       start_offset % 512 AS pos_in_seq,
       (start_offset + greatest(n_tokens, 1) - 1) // 512 - start_offset // 512 + 1 AS n_spans
FROM s
"""

# CCNet-style LM perplexity: interpolated bigram model trained on the
# corpus itself; every compared column is integer-exact (per-token
# round(ln(p)*1e6) quantization BEFORE summation — see text/lm.py).
# CAST(0.9/0.1 AS DOUBLE) reproduces the Spark literals bit-exactly
# (DuckDB decimal literals would not); SUM over BIGINT is HUGEINT in
# DuckDB, so the aggregate is cast back.
ORACLES["lm_perplexity"] = """
WITH d AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x != '') AS ws
  FROM documents WHERE text IS NOT NULL
), tokpos AS (
  SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i FROM d
), tok AS (
  SELECT doc_id, ws[i] AS w,
         CASE WHEN i = 1 THEN NULL ELSE ws[i - 1] END AS w_prev
  FROM tokpos
), uni AS (
  SELECT w, COUNT(*) AS c1 FROM tok GROUP BY 1
), tv AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS t_total, COUNT(*) AS v_size FROM uni
), bi AS (
  SELECT w_prev AS w1, w AS w2, COUNT(*) AS c2 FROM tok
  WHERE w_prev IS NOT NULL GROUP BY 1, 2
), scored AS (
  SELECT tok.doc_id,
         CAST(ROUND(
           CASE WHEN tok.w_prev ISNULL OR up.c1 IS NULL THEN
             ln((u.c1 + 1) / CAST(tv.t_total + tv.v_size AS DOUBLE))
           ELSE
             ln(CAST(0.9 AS DOUBLE) * (COALESCE(b.c2, 0) / up.c1)
                + CAST(0.1 AS DOUBLE)
                  * ((u.c1 + 1) / CAST(tv.t_total + tv.v_size AS DOUBLE)))
           END * 1000000.0) AS BIGINT) AS lp_micro
  FROM tok
  CROSS JOIN tv
  LEFT JOIN uni u ON tok.w = u.w
  LEFT JOIN uni up ON tok.w_prev = up.w
  LEFT JOIN bi b ON tok.w_prev = b.w1 AND tok.w = b.w2
), agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(-SUM(lp_micro) AS BIGINT) AS nll_micro
  FROM scored GROUP BY 1
)
SELECT base.doc_id,
       COALESCE(a.n_tokens, 0) AS n_tokens,
       COALESCE(a.nll_micro, 0) AS nll_micro,
       CASE WHEN COALESCE(a.n_tokens, 0) = 0 THEN 0
            ELSE a.nll_micro // (a.n_tokens * 1000) END AS nll_per_token_milli
FROM (SELECT doc_id FROM documents WHERE text IS NOT NULL) base
LEFT JOIN agg a ON base.doc_id = a.doc_id
"""

# Substring-level dup-span detection (Lee et al. 2022): the oracle groups
# k-grams by STRING where the engine groups by xxhash64 (collision odds at
# sf scale ~1e-11); span merge and coverage arithmetic are identical.
# Every SUM is cast back from DuckDB HUGEINT to BIGINT.
ORACLES["substring_dedup"] = """
WITH toks AS (
  SELECT doc_id,
         CASE WHEN text IS NULL THEN []::VARCHAR[]
              ELSE list_filter(string_split(text, ' '), x -> x != '') END AS t
  FROM documents
), kg AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
         array_to_string(t[i:i+3], ' ') AS g
  FROM toks, LATERAL (
    SELECT unnest(range(1, greatest(len(t) - 4 + 1, 0) + 1)) AS i
  ) r
), dup AS (
  SELECT g FROM kg GROUP BY g HAVING count(*) >= 2
), dp AS (
  SELECT doc_id, pos FROM kg JOIN dup USING (g)
), flagged AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                   > 4 THEN 1 ELSE 0 END AS new_span
  FROM dp
), sp AS (
  SELECT doc_id, pos,
         SUM(new_span) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span
  FROM flagged
), per_span AS (
  SELECT doc_id, span, count(*) AS cnt,
         max(pos) - min(pos) + 4 AS covered
  FROM sp GROUP BY 1, 2
), per_doc AS (
  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_dup_kgrams,
         CAST(count(*) AS BIGINT) AS n_spans,
         CAST(SUM(covered) AS BIGINT) AS dup_tokens
  FROM per_span GROUP BY 1
)
SELECT toks.doc_id, CAST(len(toks.t) AS BIGINT) AS n_tokens,
       COALESCE(p.n_dup_kgrams, 0) AS n_dup_kgrams,
       COALESCE(p.n_spans, 0) AS n_spans,
       COALESCE(p.dup_tokens, 0) AS dup_tokens
FROM toks LEFT JOIN per_doc p ON toks.doc_id = p.doc_id
"""

# Bloom-prefiltered incremental dedup: the engine's bloom is a prefilter
# only (negatives bypass the join, positives are anti-join confirmed), so
# the exact anti-join below IS its contract. NULL-text keys never match
# (SQL null semantics on both sides) and therefore always count as new.
ORACLES["bloom_dedup"] = """
WITH keyed AS (
  SELECT doc_id, source, n_chars,
         array_to_string(
           list_filter(string_split(text, ' '), x -> x != '')[1:5], ' ') AS k
  FROM documents
)
SELECT d.doc_id, d.source, d.n_chars
FROM keyed d
WHERE d.doc_id % 2 = 1
  AND NOT EXISTS (
    SELECT 1 FROM keyed h WHERE h.doc_id % 2 = 0 AND h.k = d.k
  )
"""

# TF-IDF top-3 per doc: integer-exact via idf_q = round(ln((N+1)/(df+1))
# * 1e6) — the single libm call agrees across engines to ~1 ulp, nine
# orders below the quantization step; everything after is int64.
ORACLES["tfidf_top_terms"] = """
WITH words AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), x -> x != '')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM words GROUP BY 1, 2
), dfreq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df_docs FROM tf GROUP BY 1
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df_docs,
         tf.tf * CAST(round(
           ln(CAST((SELECT count(*) FROM documents) + 1 AS DOUBLE)
              / CAST(dfreq.df_docs + 1 AS DOUBLE)) * 1e6) AS BIGINT)
           AS score_q
  FROM tf JOIN dfreq USING (term)
), ranked AS (
  SELECT doc_id, term, tf, df_docs, score_q,
         CAST(row_number() OVER (
           PARTITION BY doc_id ORDER BY score_q DESC, term ASC
         ) AS INT) AS rank
  FROM scored
)
SELECT doc_id, term, tf, df_docs, score_q, rank
FROM ranked WHERE rank <= 3
"""

# Substring scrub: removal decision is "not the gram's first occurrence",
# which the oracle expresses as row_number() > 1 over (doc_id, pos) —
# equivalent to the engine's (count >= 2 AND struct != min(struct)).
ORACLES["substring_scrub"] = """
WITH toks AS (
  SELECT doc_id,
         CASE WHEN text IS NULL THEN []::VARCHAR[]
              ELSE list_filter(string_split(text, ' '), x -> x != '') END AS t
  FROM documents
), kg AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
         array_to_string(t[i:i+3], ' ') AS g
  FROM toks, LATERAL (
    SELECT unnest(range(1, greatest(len(t) - 4 + 1, 0) + 1)) AS i
  ) r
), marked AS (
  SELECT doc_id, pos,
         row_number() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn
  FROM kg
), removed AS (
  SELECT doc_id, pos FROM marked WHERE rn > 1
), flagged AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                   > 4 THEN 1 ELSE 0 END AS ns
  FROM removed
), sp AS (
  SELECT doc_id, pos,
         SUM(ns) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span
  FROM flagged
), iv AS (
  SELECT doc_id, span, min(pos) AS s, max(pos) + 3 AS e
  FROM sp GROUP BY 1, 2
), per_doc_removed AS (
  SELECT doc_id, CAST(SUM(e - s + 1) AS BIGINT) AS n_removed
  FROM iv GROUP BY 1
), tokpos AS (
  SELECT doc_id, CAST(j - 1 AS BIGINT) AS idx, t[j] AS tok
  FROM toks, LATERAL (SELECT unnest(range(1, len(t) + 1)) AS j) rr
), kept AS (
  SELECT tp.doc_id, tp.idx, tp.tok
  FROM tokpos tp
  WHERE NOT EXISTS (
    SELECT 1 FROM iv
    WHERE iv.doc_id = tp.doc_id AND tp.idx BETWEEN iv.s AND iv.e
  )
), kept_text AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY idx) AS text_clean
  FROM kept GROUP BY doc_id
)
SELECT toks.doc_id, CAST(len(toks.t) AS BIGINT) AS n_tokens,
       COALESCE(p.n_removed, 0) AS n_removed,
       COALESCE(kt.text_clean, '') AS text_clean
FROM toks
LEFT JOIN per_doc_removed p USING (doc_id)
LEFT JOIN kept_text kt USING (doc_id)
"""

# DSIR importance weights: per-word log-ratio quantized to 1e-6 BEFORE the
# per-doc summation, so both engines sum identical int64 values in any
# order. Formula association is pinned: each ln's argument is a single
# double/double division, and the two lns subtract before quantization.
ORACLES["dsir_weights"] = """
WITH toks AS (
  SELECT doc_id, lang,
         CASE WHEN text IS NULL THEN []::VARCHAR[]
              ELSE list_filter(string_split(text, ' '), x -> x != '') END AS t
  FROM documents
), words AS (
  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS tgt,
         unnest(t) AS term
  FROM toks
), vocab AS (
  SELECT term, CAST(count(*) AS BIGINT) AS c_r,
         CAST(SUM(tgt) AS BIGINT) AS c_t
  FROM words GROUP BY 1
), tot AS (
  SELECT CAST(SUM(c_r) AS BIGINT) AS t_r, CAST(SUM(c_t) AS BIGINT) AS t_t,
         CAST(count(*) AS BIGINT) AS v
  FROM vocab
), ratio AS (
  SELECT term,
         CAST(round((
           ln((c_t + 1) / CAST(t_t + v AS DOUBLE))
           - ln((c_r + 1) / CAST(t_r + v AS DOUBLE))
         ) * 1e6) AS BIGINT) AS rq
  FROM vocab, tot
), tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM words GROUP BY 1, 2
), sc AS (
  SELECT tf.doc_id,
         CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
         CAST(SUM(tf.tf * ratio.rq) AS BIGINT) AS logw_micro
  FROM tf JOIN ratio USING (term) GROUP BY 1
)
SELECT toks.doc_id,
       COALESCE(sc.n_tokens, 0) AS n_tokens,
       COALESCE(sc.logw_micro, 0) AS logw_micro,
       COALESCE(sc.logw_micro, 0) > 0 AS selected
FROM toks LEFT JOIN sc USING (doc_id)
"""

# BM25 top-3: every constant is CAST AS DOUBLE (DuckDB decimal literals
# would change the arithmetic); the expression tree mirrors the Spark
# column graph operation-for-operation — (N-df+0.5)/(df+0.5) inside one
# ln; (1-b) prefolded to 0.25; k1+1 computed as the same IEEE add Python
# folds into the lit; division before the idf multiplication. The single
# ln's sub-ulp cross-engine slack dies in the 1e6 quantization.
ORACLES["bm25_top_terms"] = """
WITH words AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), x -> x != '')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM words GROUP BY 1, 2
), dl AS (
  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY 1
), tot AS (
  SELECT CAST(SUM(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
  FROM dl
), dfreq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df_docs FROM tf GROUP BY 1
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df_docs, dl.dl,
         CAST(round(
           ln(CAST(1.0 AS DOUBLE)
              + (CAST((SELECT count(*) FROM documents) AS DOUBLE)
                 - CAST(df_docs AS DOUBLE) + CAST(0.5 AS DOUBLE))
                / (CAST(df_docs AS DOUBLE) + CAST(0.5 AS DOUBLE)))
           * ((CAST(tf AS DOUBLE)
               * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE)))
              / (CAST(tf AS DOUBLE)
                 + CAST(1.2 AS DOUBLE)
                   * (CAST(0.25 AS DOUBLE)
                      + CAST(0.75 AS DOUBLE)
                        * (CAST(dl AS DOUBLE) / tot.avgdl))))
           * CAST(1e6 AS DOUBLE)) AS BIGINT) AS score_q
  FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (term) CROSS JOIN tot
), ranked AS (
  SELECT doc_id, term, tf, df_docs, dl, score_q,
         CAST(row_number() OVER (
           PARTITION BY doc_id ORDER BY score_q DESC, term ASC
         ) AS INT) AS rank
  FROM scored
)
SELECT doc_id, term, tf, df_docs, dl, score_q, rank
FROM ranked WHERE rank <= 3
"""

# kNN classification eval: majority label among the top-5 cosine
# neighbors; the cosine RANKING reuses knn_cosine's proven cross-engine
# ordering (raw doubles, neighbor_id tie-break), and the vote stage is
# pure integers.
ORACLES["knn_classify"] = """
WITH e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
), q AS (
  SELECT vec_id AS query_id, label AS true_label, v AS qv
  FROM e WHERE vec_id < 20
), scored AS (
  SELECT q.query_id, q.true_label, e.vec_id AS neighbor_id,
         e.label AS neighbor_label,
         list_dot_product(e.v, q.qv)
           / (sqrt(list_dot_product(e.v, e.v))
              * sqrt(list_dot_product(q.qv, q.qv))) AS cos
  FROM e, q WHERE e.vec_id >= 20
), ranked AS (
  SELECT query_id, true_label, neighbor_label,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
), votes AS (
  SELECT query_id, true_label, neighbor_label,
         CAST(count(*) AS BIGINT) AS n_votes
  FROM ranked WHERE rank <= 5 GROUP BY 1, 2, 3
), win AS (
  SELECT query_id, true_label, neighbor_label, n_votes,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY n_votes DESC, neighbor_label ASC) AS vr
  FROM votes
)
SELECT query_id, CAST(true_label AS INT) AS true_label,
       CAST(neighbor_label AS INT) AS pred_label, n_votes,
       neighbor_label = true_label AS correct
FROM win WHERE vr = 1
"""

# C4-style normalization: plain ASCII character classes so Java and
# DuckDB regex engines agree; DuckDB needs the 'g' flag for global
# replace (Spark replaces all occurrences by default).
ORACLES["normalize_text"] = """
WITH n AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(COALESCE(text, '')),
              '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS text_norm
  FROM documents
)
SELECT doc_id, text_norm,
       CASE WHEN text_norm = '' THEN 0
            ELSE CAST(len(string_split(text_norm, ' ')) AS BIGINT)
       END AS n_tokens_norm,
       CAST(length(text_norm) AS BIGINT) AS n_chars_norm
FROM n
"""
