"""Driver-contract query implementations (Spark side).

Each function takes (spark, sf_dir) and returns a DataFrame whose result is
deterministic and column-name-aligned with the DuckDB oracle SQL in
``tsdat_spark.oracles`` — the correctness gate runs both and compares
row-count + schema + order-insensitive value hashes.

Determinism discipline:
- integer/count outputs are exact;
- float aggregate outputs are ``round(x, 6)`` on BOTH sides so FP sum-order
  ulp noise cannot flip the hash;
- percentiles in oracle-checked rollups use the *lower discrete* quantile
  (rank-window formulation, see ``_rollup``) which is integer-exact and
  scale-independent; the
  engine's scalable t-digest path is exercised by ``tier_1m_tdigest`` (a
  rows-only check) and by the pytest suite.

The transcripts table required by BASELINE.json's input_hint is derived
deterministically from the driver's ``events`` table (pure relational
derivation both engines can compute): conv = user, turn order = (ts,
event_id), role/tool from event_type, text = props.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .qc import QCContext, check_delta, check_max, check_min, check_missing, check_monotonic, check_std
from .transform import GridSpec, bin_average, interpolate_linear, nearest_neighbor
from .transform.bin_average import VarQC

EVENTS_GRID_START = "2024-01-01"
EVENTS_GRID_STOP = "2024-03-01"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The engine's time arithmetic (unix_micros / epoch binning) is defined
    # over UTC; the driver's session may not be. Pin it (runtime-settable)
    # and normalize parquet TIMESTAMP_NTZ to session timestamps.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.withColumn("ts", F.col("ts").cast("timestamp"))


def _spread(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Give CPU-heavy narrow maps enough partitions to use every core.

    A small single-row-group parquet file scans as ONE split, which pins
    per-row work (shingle hashing, minhash folds, vector math) to a single
    task no matter how many cores the cluster has. Repartition ONLY when
    the scan has fewer splits than the cluster's parallelism — at real
    scale the scan already has >= cores splits and no shuffle is added;
    at small scale the added shuffle is a few MB against seconds of
    otherwise-serial hashing (sf0.1 `jaccard_pairs` 28 s -> ~3 s).

    Round 7: the split count comes from the PHYSICAL plan's RDD partition
    count instead of ``df.rdd`` — the Python-facing RDD conversion wraps
    the query in a serialization step and cost ~0.9 s of driver time per
    fresh DataFrame (VERDICT r6 caveat; measured 4 ms via the plan)."""
    p = spark.sparkContext.defaultParallelism
    try:
        n = df._jdf.queryExecution().executedPlan().execute().getNumPartitions()
    except Exception:  # non-JVM sessions (connect) fall back to the RDD hop
        n = df.rdd.getNumPartitions()
    if n < p:
        df = df.repartition(p)
    return df


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _spread(spark, spark.read.parquet(f"{sf_dir}/documents.parquet"))


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _spread(spark, spark.read.parquet(f"{sf_dir}/embeddings.parquet"))


def transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic transcripts derivation from events (see module doc).

    Output: conv_id, turn_idx, role, text, tool, ts (+ value carried as a
    numeric measurement for QC demos, latency_us, token_len).
    """
    ev = _events(spark, sf_dir)
    # ONE window: conv_id is a bijection of user_id and turn_idx order IS
    # (ts, event_id) order, so the latency lag partitioned by the derived
    # conv_id / ordered by the derived turn_idx is identical to a lag over
    # this same (user_id; ts, event_id) window — expressing both window
    # functions on one spec halves the plan to a single exchange + sort
    # for every consumer that needs turn_idx AND latency_us (round 7,
    # guide §2.4: two operations keyed the same way share one exchange).
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    cur = F.unix_micros(F.col("ts"))
    t = ev.select(
        F.concat(F.lit("c"), F.col("user_id").cast("string")).alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.when(F.col("event_type").isin("click", "view"), "user")
        .when(F.col("event_type") == "error", "tool")
        .otherwise("assistant")
        .alias("role"),
        F.col("props").alias("text"),
        F.when(F.col("event_type") == "error", "search")
        .when(F.col("event_type") == "purchase", "code")
        .otherwise(F.lit(None).cast("string"))
        .alias("tool"),
        F.col("ts"),
        F.col("value").cast("double").alias("value"),
        (cur - F.lag(cur).over(w)).alias("latency_us"),
    )
    tokens = F.size(F.filter(F.split(F.col("text"), " "), lambda x: x != "")).cast("long")
    t = t.withColumn("token_len", F.when(F.col("text").isNull(), F.lit(None).cast("long")).otherwise(tokens))
    return t


def q_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return transcripts(spark, sf_dir).select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts", "latency_us", "token_len"
    )


def q_standardize_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV ingestion path (tsdat CSVReader + reader dispatch +
    StringToDatetime, csv_reader.py:10-27 / default_retriever.py:79-87 /
    string_to_datetime.py:49-88): the events table is rendered to CSV once
    per sf_dir (timestamps as '%Y-%m-%d %H:%M:%S.%f' strings), then read
    back through the engine's regex reader dispatch with a declared schema
    (no inference pass) and an explicit-format datetime parse. The oracle is
    the original parquet — so the round trip (quote/escape, microsecond
    parse, double repr) must be exact.

    Fixture generation lives in :mod:`tsdat_spark.fixtures` (a setup step,
    see scripts/setup_fixtures.py); ensure_events_csv here is an idempotent
    existence check only — the returned program is a pure read."""
    from .fixtures import ensure_events_csv
    from .io.converters import StringToDatetime
    from .io.readers import CSVReader, read_input

    cache = ensure_events_csv(spark, sf_dir)
    readers = [
        (
            r".*\.csv$",
            CSVReader(schema="event_id bigint, user_id bigint, event_type string, ts string, value double, props string"),
        )
    ]
    raw = read_input(spark, cache, readers)
    parse_ts = StringToDatetime(format="%Y-%m-%d %H:%M:%S.%f", timezone="UTC")
    return raw.select(
        "event_id", "user_id", "event_type",
        parse_ts(F.col("ts")).alias("ts"),
        F.col("value").cast("double").alias("value"),
        "props",
    )


def rank_value_at(rk, target_rank, col: str = "latency_us"):
    """Row-level flag for the rank-window discrete quantile: carries ``col``
    on exactly the row whose 1-based non-null rank equals ``target_rank``
    (row_number is unique, so at most one row per group carries it); a
    same-keyed ``max()`` aggregate then extracts it. The VALUE at a sorted
    rank is deterministic even under ties, so no tie-break order is needed."""
    return F.when((rk == target_rank) & F.col(col).isNotNull(), F.col(col))


def _rollup(spark, sf_dir, trunc: str) -> DataFrame:
    """Per-(conv, role, bin) rollup with *lower discrete* quantiles — the
    element at ⌊(n−1)·q⌋ of the sorted non-null latencies (integer-exact,
    order-insensitive, oracle-safe).

    Rank-window formulation: rank latencies within each group (nulls last),
    flag the row whose rank hits ⌊(n−1)·q⌋+1, and extract it with
    ``max(when(...))`` in a groupBy on the SAME keys — Catalyst reuses the
    window's hash partitioning so the whole rollup is ONE shuffle, and no
    per-group array is ever materialized (the previous
    ``sort_array(collect_list)`` shape put a mega-conversation's entire day
    of latencies into a single array at 1d grain — the scale-killer this
    replaces)."""
    t = transcripts(spark, sf_dir).withColumn("bin_start", F.date_trunc(trunc, "ts"))
    keys = ["conv_id", "role", "bin_start"]
    wk = W.partitionBy(*keys)
    rk = F.row_number().over(wk.orderBy(F.col("latency_us").asc_nulls_last()))
    n = F.count("latency_us").over(wk)
    flagged = t.select(
        *keys, "token_len", "latency_us",
        rank_value_at(rk, F.floor((n - 1) * F.lit(0.5)) + 1).alias("p50_val"),
        rank_value_at(rk, F.floor((n - 1) * F.lit(0.95)) + 1).alias("p95_val"),
    )
    return flagged.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum("token_len").alias("token_len_sum"),
        F.count("latency_us").alias("n_latency"),
        F.max("p50_val").alias("latency_p50"),
        F.max("p95_val").alias("latency_p95"),
    )


def q_rollup_1m(spark, sf_dir):
    return _rollup(spark, sf_dir, "minute")


def q_rollup_1h(spark, sf_dir):
    return _rollup(spark, sf_dir, "hour")


def q_rollup_1d(spark, sf_dir):
    return _rollup(spark, sf_dir, "day")


def q_tier_summary_1h(spark, sf_dir):
    t = transcripts(spark, sf_dir)
    return (
        t.groupBy("role", F.date_trunc("hour", "ts").alias("bin_start"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.countDistinct("conv_id").alias("n_distinct_convs"),
            F.sum("token_len").alias("token_len_sum"),
        )
    )


_CTX = QCContext(series_keys=("conv_id",), order_cols=("turn_idx",))


def q_qc_missing_text(spark, sf_dir):
    t = transcripts(spark, sf_dir)
    mask = check_missing(F.col("text"), kind="string")
    return t.select("conv_id", "turn_idx", mask.cast("int").alias("qc_text"))


def q_qc_monotonic_value(spark, sf_dir):
    t = transcripts(spark, sf_dir)
    mask = check_monotonic(_CTX, F.col("value"), direction="auto")
    return t.select("conv_id", "turn_idx", mask.cast("int").alias("qc_monotonic"))


def q_qc_delta_value(spark, sf_dir):
    t = transcripts(spark, sf_dir)
    mask = check_delta(_CTX, F.col("value"), threshold=30.0)
    return t.select("conv_id", "turn_idx", mask.cast("int").alias("qc_delta"))


def q_qc_range_value(spark, sf_dir):
    """Bit-packed range check: bit1 = below min 5, bit2 = above max 95
    (RecordQualityResults bit layout)."""
    t = transcripts(spark, sf_dir)
    qc = (
        F.when(check_min(F.col("value"), 5.0), 1).otherwise(0)
        + F.when(check_max(F.col("value"), 95.0), 2).otherwise(0)
    )
    return t.select("conv_id", "turn_idx", qc.cast("int").alias("qc_value"))


def q_qc_std_value(spark, sf_dir):
    t = transcripts(spark, sf_dir)
    mask = check_std(_CTX, F.col("value"), n_std=2.0)
    return t.select("conv_id", "turn_idx", mask.cast("int").alias("qc_std"))


def q_qc_mask_threshold(spark, sf_dir):
    """CheckArrayMaskThreshold with a configurable comparator
    (check_array_mask_threshold.py:18-78) — here `>= 90`."""
    from .qc import check_mask_threshold

    t = transcripts(spark, sf_dir)
    mask = check_mask_threshold(F.col("value"), 90.0, ">=")
    return t.select("conv_id", "turn_idx", mask.cast("int").alias("qc_mask"))


def q_gap_fill_1h(spark, sf_dir):
    """Per-conv hourly grid between first and last turn; gap hours appear
    with n_turns=0, is_gap=1 (tsdat CreateTimeGrid + missing-bin semantics,
    SURVEY §2.4).

    Round-7 shape (guide §2.4): the grid [trunc(min ts), trunc(max ts)] is
    exactly the union of each non-empty bin plus the empty bins strictly
    between consecutive non-empty bins, so ONE count aggregation + one
    small window over the per-bin rows (lag + sequence-explode of the gap
    hours) replaces the old second full scan (span min/max), the grid
    explode, and the 3-way-shuffled left join — plan drops from two scans +
    3 exchanges + join to one scan + 2 exchanges (the second over
    bin-grain rows, orders of magnitude smaller than turns)."""
    t = transcripts(spark, sf_dir)
    agg = t.groupBy("conv_id", F.date_trunc("hour", "ts").alias("bin_start")).agg(
        F.count(F.lit(1)).alias("n")
    ).where(F.col("bin_start").isNotNull())
    w = W.partitionBy("conv_id").orderBy("bin_start")
    agg = agg.withColumn("__prev", F.lag("bin_start").over(w))
    prev = F.col("__prev")
    hour = F.expr("INTERVAL 1 HOUR")
    gaps = F.when(
        prev.isNull() | (F.col("bin_start") <= prev + hour),
        F.array().cast("array<timestamp>"),
    ).otherwise(F.sequence(prev + hour, F.col("bin_start") - hour, hour))
    rows = F.concat(
        F.transform(
            gaps,
            lambda g: F.struct(
                g.alias("bin_start"), F.lit(0).cast("long").alias("n_turns"),
                F.lit(1).alias("is_gap"),
            ),
        ),
        F.array(F.struct(
            F.col("bin_start"), F.col("n").alias("n_turns"), F.lit(0).alias("is_gap"),
        )),
    )
    return agg.select("conv_id", F.explode(rows).alias("r")).select(
        "conv_id", F.col("r.bin_start").alias("bin_start"),
        F.col("r.n_turns").alias("n_turns"), F.col("r.is_gap").alias("is_gap"),
    )


def q_bin_average_30m(spark, sf_dir):
    """Overlap-weighted 30-min bin average of events.value per event_type
    (the engine's core transform on the driver's real table)."""
    ev = _events(spark, sf_dir)
    grid = GridSpec(EVENTS_GRID_START, EVENTS_GRID_STOP, interval_s=1800, alignment="right")
    out = bin_average(
        ev, grid, series_keys=["event_type"], ts_col="ts", value_cols=["value"],
        filter_bad_qc=False, add_metrics=True,
    )
    return out.select(
        "event_type",
        F.col("label").alias("bin_label"),
        F.round("value", 6).alias("value_avg"),
        F.round("value_std", 6).alias("value_std"),
        F.round("value_goodfraction", 6).alias("value_goodfraction"),
        "qc_value",
    )


def q_nearest_1h(spark, sf_dir):
    """Nearest-neighbor reindex of each conversation's value onto the hourly
    grid, tolerance 1800 s (tsdat NearestNeighbor, as-of-both-directions)."""
    t = transcripts(spark, sf_dir)
    grid = GridSpec(EVENTS_GRID_START, EVENTS_GRID_STOP, interval_s=3600)
    out = nearest_neighbor(t, grid, ["conv_id"], "ts", ["value"], tolerance_s=1800)
    return out.select("conv_id", F.col("label").alias("bin_label"),
                      F.round("value", 6).alias("value_nn"), "qc_value")


def q_interpolate_1h(spark, sf_dir):
    """Linear interpolation of each conversation's value onto the hourly
    grid, range 3600 s (tsdat LinearInterpolate semantics incl. QC bits)."""
    t = transcripts(spark, sf_dir)
    grid = GridSpec(EVENTS_GRID_START, EVENTS_GRID_STOP, interval_s=3600)
    out = interpolate_linear(t, grid, ["conv_id"], "ts", ["value"], range_s=3600)
    return out.select("conv_id", F.col("label").alias("bin_label"),
                      F.round("value", 6).alias("value_li"), "qc_value")


def q_unit_convert(spark, sf_dir):
    """tsdat UnitsConverter semantics (units_converter.py:30-114): the
    pint-derived scale/offset comes from the general unit table
    (tsdat_spark.units — arbitrary affine/linear pairs), computed on the
    driver and applied as pure Catalyst column math — here degF→degC."""
    from .units import conversion

    t = transcripts(spark, sf_dir)
    scale, offset = conversion("degF", "degC")
    assert (scale, offset) == (5.0 / 9.0, -32.0 * 5.0 / 9.0)  # oracle-pinned
    return t.select(
        "conv_id", "turn_idx",
        F.round(F.col("value") * scale + offset, 6).alias("value_degc"),
    )


def q_sessionize(spark, sf_dir):
    """Sessionization: a new session starts when the gap since the previous
    turn of the conversation exceeds 30 minutes (lag + running sum —
    the classic window pattern; per-conv session stats returned)."""
    t = transcripts(spark, sf_dir)
    w = W.partitionBy("conv_id").orderBy("turn_idx")
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    new_session = F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    sess = t.withColumn("session_idx",
                        F.sum(new_session).over(w.rowsBetween(W.unboundedPreceding, 0)) - 1)
    return sess.groupBy("conv_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.sum("token_len").alias("token_len_sum"),
    )


# --------------------------- documents: text ops ---------------------------


def q_dedup_exact(spark, sf_dir):
    """Exact dedup by content hash: keeper = min doc_id per md5(text)."""
    d = _documents(spark, sf_dir)
    return d.groupBy(F.md5("text").alias("text_md5")).agg(
        F.min("doc_id").alias("keeper_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


def q_token_count(spark, sf_dir):
    d = _documents(spark, sf_dir)
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique_tokens"),
        F.length("text").alias("n_chars_computed"),
    )


#: BPE-ish pre-tokenization pattern (GPT-2-style word/number/punct split,
#: simplified to the RE2 ∩ java.util.regex common subset so the Spark and
#: DuckDB sides count identically): letter runs, digit runs, single
#: non-alnum-non-space marks.
BPE_TOKEN_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def q_token_count_bpe(spark, sf_dir):
    """Tokenizer-aware counting: BPE-ish pre-tokenization (regexp matches)
    next to the whitespace count — the pair a training-data pipeline uses
    to estimate real token costs vs naive word counts."""
    d = _documents(spark, sf_dir)
    ws = F.size(F.filter(F.split(F.col("text"), " "), lambda x: x != ""))
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_TOKEN_PATTERN), F.lit(0)))
    return d.select(
        "doc_id",
        ws.cast("long").alias("n_ws_tokens"),
        bpe.cast("long").alias("n_bpe_tokens"),
        F.round(bpe.cast("double") / F.greatest(ws, F.lit(1)), 6).alias("bpe_per_word"),
    )


def q_text_quality(spark, sf_dir):
    """Length / stopword-ratio / mean-word-length quality signals."""
    d = _documents(spark, sf_dir)
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    n = F.size(toks)
    stop = F.size(F.filter(toks, lambda x: x.isin("a", "the")))
    mean_len = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x).cast("long")).cast("double") / n
    return d.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.round(stop.cast("double") / n, 6).alias("stopword_ratio"),
        F.round(mean_len, 6).alias("mean_token_len"),
        F.round(F.size(F.array_distinct(toks)).cast("double") / n, 6).alias("unique_ratio"),
    )


def q_repetition_signals(spark, sf_dir):
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1;
    RefinedWeb, Penedo et al. 2023): duplicate-token fraction and the
    fraction of bigrams taken by the single most frequent bigram. High
    values mark boilerplate/generated text a training-data pipeline drops.

    All JVM-side: the top-bigram count is a max-run-length fold over the
    SORTED bigram array (one higher-order aggregate, no explode/groupBy —
    per-doc work stays in one codegen'd map at any corpus size)."""
    d = _documents(spark, sf_dir)
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    d = d.select("doc_id", toks.alias("__t"))
    t = F.col("__t")
    n = F.size(t)
    dup_frac = F.when(
        n > 0, F.round(F.lit(1.0) - F.size(F.array_distinct(t)) / n, 6)
    ).otherwise(0.0)
    bigrams = F.array_sort(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(" ", F.element_at(t, i), F.element_at(t, i + 1)),
        )
    )
    run_state = F.aggregate(
        bigrams,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, g: F.struct(
            g.alias("prev"),
            F.when(g == acc.getField("prev"), acc.getField("run") + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc.getField("best"),
                F.when(g == acc.getField("prev"), acc.getField("run") + 1).otherwise(
                    F.lit(1)
                ),
            ).alias("best"),
        ),
        lambda acc: acc.getField("best"),
    )
    top_bigram_frac = F.when(
        n >= 2, F.round(run_state / (n - 1), 6)
    ).otherwise(0.0)
    return d.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        dup_frac.alias("dup_token_frac"),
        top_bigram_frac.alias("top_bigram_frac"),
    )


def q_pii_scrub(spark, sf_dir):
    """PII detect + redact. The synthetic corpus carries no PII, so the
    query injects one deterministic span per document (selected by
    ``doc_id % 4``) with the SAME expression on both engines — the regex
    detection/redaction machinery is what the oracle checks. Map-only."""
    from .text.pii import pii_scrub

    d = _documents(spark, sf_dir)
    did = F.col("doc_id")
    m = did % 4
    snippet = (
        F.when(m == 0, F.concat(F.lit(" contact user"), did.cast("string"), F.lit("@example.com")))
        .when(m == 1, F.concat(F.lit(" from 10.0."), (did % 256).cast("string"), F.lit(".17")))
        .when(m == 2, F.concat(F.lit(" ssn 123-45-"), F.lpad((did % 10000).cast("string"), 4, "0")))
        .otherwise(F.concat(F.lit(" call (555) 867-"), F.lpad((did % 10000).cast("string"), 4, "0")))
    )
    injected = d.select("doc_id", F.concat(F.col("text"), snippet).alias("text"))
    return pii_scrub(injected)


def q_line_dedup(spark, sf_dir):
    """C4/RefinedWeb corpus-level line dedup; lines are 3-token chunks of
    the single-line synthetic docs (real corpora split on newline)."""
    from .text.lines import chunk_tokens, line_dedup

    d = _documents(spark, sf_dir)
    return line_dedup(d, lines=chunk_tokens(F.col("text"), 3))


def q_pack_sequences(spark, sf_dir):
    """Distributed prefix-sum packing of docs into 512-token sequences."""
    from .text.packing import pack_sequences

    d = _documents(spark, sf_dir)
    return pack_sequences(d, seq_len=512)


def q_bpe_train(spark, sf_dir):
    """Distributed BPE merge learning on the documents vocabulary.

    Deterministic (count-desc then lexicographic tie-break) but genuinely
    iterative — the merge chosen in round r depends on rounds 1..r-1 — so
    there is intentionally NO oracle_sql entry (the driver records the
    weaker rows-only check); exact parity vs a pure-Python reference of
    the same spec is pinned in tests/test_bpe.py instead."""
    from .text.bpe import train_bpe

    d = _documents(spark, sf_dir)
    merges = train_bpe(d, n_merges=8)
    return spark.createDataFrame(
        [(i, a, b, a + b, n) for i, (a, b, n) in enumerate(merges)],
        "rank int, left string, right string, merged string, weighted_count long",
    )


def q_lang_id(spark, sf_dir):
    """Stopword-heuristic language id: 'en' iff ≥2% stopword tokens,
    else 'unknown' (deterministic n-gram-free heuristic)."""
    d = _documents(spark, sf_dir)
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    ratio = F.size(F.filter(toks, lambda x: x.isin("a", "the", "of", "and"))).cast("double") / F.size(toks)
    return d.select(
        "doc_id",
        F.when(ratio >= 0.02, "en").otherwise("unknown").alias("lang_pred"),
        F.round(ratio, 6).alias("stopword_score"),
    )


def q_minhash_signatures(spark, sf_dir):
    """16-function MinHash signature per document (Broder near-dup sketch;
    deterministic integer hashing shared with the oracle)."""
    from .text.dedup import minhash_signature

    d = _documents(spark, sf_dir)
    return minhash_signature(d.select("doc_id", "text"), "text", k=16).drop("text")


def q_lsh_pairs(spark, sf_dir):
    """LSH candidate near-dup pairs (4 bands × 4 rows over the MinHash
    signature) — O(docs·bands) shuffle, never all-pairs."""
    from .text.dedup import lsh_candidate_pairs, minhash_signature

    d = _documents(spark, sf_dir)
    sig = minhash_signature(d.select("doc_id", "text"), "text", k=16)
    return lsh_candidate_pairs(sig, "doc_id", k=16, bands=4)


def q_simhash16(spark, sf_dir):
    from .text.dedup import simhash

    d = _documents(spark, sf_dir)
    return simhash(d.select("doc_id", "text"), "text", bits=16).drop("text")


def q_fingerprint_winnow(spark, sf_dir):
    """Winnowing document fingerprints (rolling-hash k-gram minima; the
    shared-substring detection primitive for training-data contamination
    checks)."""
    from .text.dedup import winnow_fingerprints

    d = _documents(spark, sf_dir)
    return winnow_fingerprints(d.select("doc_id", "text"), n=3, window=4)


CONTAM_MAX_DF = 50      # fingerprints in more docs than this are stop-shingles
CONTAM_MIN_SHARED = 3   # pairs must share at least this many fingerprints


def q_contamination_overlap(spark, sf_dir):
    """Cross-source contamination check — the winnowing use case end to
    end (Schleimer et al. SIGMOD'03; the benchmark-decontamination step of
    training-data pipelines): document pairs from DIFFERENT sources sharing
    ≥ CONTAM_MIN_SHARED winnowed fingerprints, i.e. a guaranteed common
    token substring per shared fingerprint.

    Scale shape: fingerprint equi-join (never all-pairs) with ubiquitous
    fingerprints (doc frequency > CONTAM_MAX_DF) dropped first — the
    standard stop-shingle filter, which also bounds join fan-out/skew: no
    fingerprint bucket exceeds CONTAM_MAX_DF² pair candidates."""
    from .text.dedup import winnow_fingerprints

    d = _documents(spark, sf_dir)
    fp = winnow_fingerprints(d.select("doc_id", "text"), n=3, window=4).join(
        d.select("doc_id", "source"), "doc_id")
    # the fingerprint table feeds three consumers (df-count, both self-join
    # sides); checkpoint it once so the char-hash winnow map runs ONE pass
    # over the corpus instead of three (sf0.01 steady-state 6.2 s -> ~2 s)
    fp = fp.localCheckpoint(eager=False)
    rare = (
        fp.groupBy("fingerprint")
        # winnow fingerprints are per-doc distinct (explode of
        # array_distinct), so count(1) == countDistinct(doc_id) exactly —
        # and skips the distinct-expand double aggregation pass over the
        # fingerprint table (round 7; same invariant the pair aggregation
        # below already relies on)
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= CONTAM_MAX_DF)
        .select("fingerprint")
    )
    fpr = fp.join(rare, "fingerprint")
    l, r = fpr.alias("l"), fpr.alias("r")
    return (
        l.join(r, "fingerprint")
        .where((F.col("l.doc_id") < F.col("r.doc_id"))
               & (F.col("l.source") != F.col("r.source")))
        .groupBy(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.col("l.source").alias("src_a"),
            F.col("r.source").alias("src_b"),
        )
        # fingerprints are per-doc distinct (winnow output), so plain
        # count == distinct count without the extra aggregation pass
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= CONTAM_MIN_SHARED)
    )


def q_dedup_clusters(spark, sf_dir):
    """Near-dup CLUSTER assignment — the step after candidate pairs that a
    dedup pipeline actually acts on: LSH candidate pairs → connected
    components (min-label propagation, tsdat_spark.graph) → every document
    gets (cluster_id = smallest doc_id in its component, is_keeper).
    Isolated documents are their own cluster/keeper."""
    from .graph import connected_components
    from .text.dedup import lsh_candidate_pairs, minhash_signature

    d = _documents(spark, sf_dir)
    sig = minhash_signature(d.select("doc_id", "text"), "text", k=16)
    pairs = lsh_candidate_pairs(sig, "doc_id", k=16, bands=4)
    comp = connected_components(pairs, "doc_a", "doc_b", nodes=d.select("doc_id"))
    return comp.select(
        F.col("node").alias("doc_id"),
        "cluster_id",
        (F.col("node") == F.col("cluster_id")).alias("is_keeper"),
    )


def q_dedup_clusters_contraction(spark, sf_dir):
    """Same cluster assignment as q_dedup_clusters but forced through the
    large-star/small-star contraction path (graph.py) — hash-equal to the
    recursive-CTE oracle, proving the adversarial-diameter algorithm
    produces identical clusters on the real dedup graph."""
    from .graph import connected_components
    from .text.dedup import lsh_candidate_pairs, minhash_signature

    d = _documents(spark, sf_dir)
    sig = minhash_signature(d.select("doc_id", "text"), "text", k=16)
    pairs = lsh_candidate_pairs(sig, "doc_id", k=16, bands=4)
    comp = connected_components(pairs, "doc_a", "doc_b", nodes=d.select("doc_id"),
                                method="contraction")
    return comp.select(
        F.col("node").alias("doc_id"),
        "cluster_id",
        (F.col("node") == F.col("cluster_id")).alias("is_keeper"),
    )


def q_clean_corpus(spark, sf_dir):
    """The end-to-end training-data pipeline composition: keep a document
    iff it is (a) its near-dup cluster's keeper (LSH → connected
    components), (b) language-identified 'en', and (c) above the quality
    floor (≥5 tokens, stopword ratio ≥ 2%). Returns the clean-corpus
    membership with the per-doc evidence columns."""
    d = _documents(spark, sf_dir)
    clusters = q_dedup_clusters(spark, sf_dir)
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    n = F.size(toks)
    ratio = F.size(F.filter(toks, lambda x: x.isin("a", "the", "of", "and"))).cast("double") / n
    scored = d.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.round(ratio, 6).alias("stopword_score"),
    )
    out = scored.join(clusters, "doc_id")
    keep = (
        F.col("is_keeper")
        & (F.col("stopword_score") >= 0.02)
        & (F.col("n_tokens") >= 5)
    )
    return out.select(
        "doc_id", "cluster_id", "is_keeper", "n_tokens", "stopword_score",
        keep.alias("in_clean_corpus"),
    )


def q_m4_downsample(spark, sf_dir):
    """M4 visualization downsample (Jugel et al., VLDB 2014) of the events
    value series per event_type over the standard grid range, 64 pixel
    bins — the aggregation behind ``hook_plot_dataset`` reference plots
    (one algebraic groupBy; only ≤ 4·64·types points ever leave Spark)."""
    from .plot import m4_downsample

    ev = _events(spark, sf_dir)
    return m4_downsample(ev, "ts", "value", EVENTS_GRID_START, EVENTS_GRID_STOP,
                         width=64, series_keys=["event_type"])


def q_jaccard_pairs(spark, sf_dir):
    """Exact 3-gram Jaccard similarity for same-source document pairs."""
    from .text.dedup import jaccard_pairs

    d = _documents(spark, sf_dir)
    return jaccard_pairs(d, "doc_id", "text", block_col="source")


# --------------------------- embeddings: vector ops ------------------------


def _norm(c):
    """Euclidean norm of an array column (sequential fold — deterministic)."""
    return F.sqrt(F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


# Hard bound for the exact top-1 verification path: above this, the O(n²·d)
# brute force is the wrong tool and callers must use vector.ann.ann_lsh_pairs
# (bucketed LSH + exact re-rank — the O(n) scale path). 50k × 64 doubles is a
# ~25 MB broadcast and ~2.5G distance evaluations — the ceiling of sane.
TOP1_MAX_VECTORS = 50_000


def q_embedding_top1(spark, sf_dir):
    """EXACT nearest-neighbor (top-1 cosine) per vector — the embedding
    near-dup primitive (pairs above a cosine threshold are dup candidates).

    This is the bounded *verification/baseline* path: exact global top-1 is
    inherently all-pairs, so the query side is broadcast (no shuffle; each
    scan partition streams against the in-memory table) and the input is
    hard-capped at TOP1_MAX_VECTORS — beyond that the engine path is
    ``ann_lsh`` (see q_ann_lsh), exactly as ``jaccard_pairs`` is the bounded
    exact check for the LSH dedup path.
    """
    e = _embeddings(spark, sf_dir).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    ).withColumn("nrm", _norm(F.col("v")))  # norm per ROW, never per pair
    # The query side must reach the driver anyway (it is broadcast), so the
    # size guard is folded into that collection: pull at most cap+1 rows
    # once, raise if over, and build the broadcast relation from the
    # collected rows — no separate guard job.
    q_rows = e.limit(TOP1_MAX_VECTORS + 1).collect()
    if len(q_rows) > TOP1_MAX_VECTORS:
        raise ValueError(
            f"embedding_top1 is the exact verification path, bounded at "
            f"{TOP1_MAX_VECTORS} vectors; use vector.ann.ann_lsh_pairs for "
            f"larger inputs"
        )
    q = spark.createDataFrame(q_rows, e.schema).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qnrm")
    )
    pairs = e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    dot = F.aggregate(F.zip_with("v", "qv", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x)
    cos = dot / (F.col("nrm") * F.col("qnrm"))
    scored = pairs.select("query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos"))
    # algebraic top-1: struct-max gives highest cos, ties to lowest
    # neighbor_id (negated field) — map-side combined, so only one partial
    # row per (query, partition) ever shuffles, never the n² scored rows.
    best = scored.groupBy("query_id").agg(
        F.max(F.struct(F.col("cos"), (-F.col("neighbor_id")).alias("neg_id"))).alias("b")
    )
    return best.select(
        "query_id",
        (-F.col("b.neg_id")).alias("neighbor_id"),
        F.round("b.cos", 6).alias("cosine"),
    )


def q_ann_lsh(spark, sf_dir):
    """LSH-bucketed ANN candidate pairs (8 random hyperplanes) with exact
    cosine re-rank — the O(n) scale path vs the brute-force baseline."""
    from .vector.ann import ann_lsh_pairs

    e = _embeddings(spark, sf_dir).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    return ann_lsh_pairs(e, "vec_id", "v", n_planes=8)


def q_ann_lsh_multi(spark, sf_dir):
    """OR-amplified LSH candidate pairs (3 independent 8-plane tables,
    exact-cosine re-rank) — the tunable-recall ANN path; see
    vector.ann.ann_lsh_pairs_multi for the collision/cost model. dim=64
    is the embeddings table's schema contract (no probe job)."""
    from .vector.ann import ann_lsh_pairs_multi

    e = _embeddings(spark, sf_dir).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    return ann_lsh_pairs_multi(e, "vec_id", "v", n_planes=8, n_tables=3, dim=64)


def q_knn_cosine(spark, sf_dir):
    """Brute-force cosine top-5 neighbors for query vectors vec_id < 20.

    Baseline ANN path: broadcast the (tiny) query side, JVM-side fold for
    the dot product (F.aggregate — sequential, deterministic), window top-k."""
    e = _embeddings(spark, sf_dir).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    ).withColumn("nrm", _norm(F.col("v")))
    q = e.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qnrm")
    )
    pairs = e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    dot = F.aggregate(F.zip_with("v", "qv", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x)
    cos = dot / (F.col("nrm") * F.col("qnrm"))
    scored = pairs.select("query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos"))
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select("query_id", "rank", "neighbor_id", F.round("cos", 6).alias("cosine"))
    )


# ---------------- round-3 additions: near-dup, IVF, sampling, tokens -------

# Exact embedding near-dup threshold: pairs at/above this cosine are dup
# candidates. Tuned so the synthetic embeddings yield a non-trivial pair
# set at every SF (7 / 14 / 144 pairs at sf0.001/0.01/0.1).
NEARDUP_TAU = 0.45


def q_neardup_cosine(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs: all unordered pairs (a < b)
    with cosine ≥ NEARDUP_TAU — the embedding analog of ``jaccard_pairs``.

    This is the bounded EXACT verification path (broadcast one side, same
    TOP1_MAX_VECTORS cap-via-collect as q_embedding_top1: the guard is the
    broadcast collection itself, no extra job). The scale path for this
    semantic is ``ann_lsh`` (bucketed LSH candidates + exact re-rank +
    threshold filter) — LSH trades recall for O(n), so the exact pair set
    here is also the recall yardstick the ANN pytest measures against.
    """
    e = _embeddings(spark, sf_dir).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    ).withColumn("nrm", _norm(F.col("v")))
    q_rows = e.limit(TOP1_MAX_VECTORS + 1).collect()
    if len(q_rows) > TOP1_MAX_VECTORS:
        raise ValueError(
            f"neardup_cosine exact path bounded at {TOP1_MAX_VECTORS} vectors; "
            "use vector.ann.ann_lsh_pairs + threshold for larger inputs"
        )
    q = spark.createDataFrame(q_rows, e.schema).select(
        F.col("vec_id").alias("id_b"), F.col("v").alias("qv"), F.col("nrm").alias("qnrm")
    )
    pairs = e.join(F.broadcast(q), F.col("vec_id") < F.col("id_b"))
    dot = F.aggregate(F.zip_with("v", "qv", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x)
    cos = dot / (F.col("nrm") * F.col("qnrm"))
    return (
        pairs.select(F.col("vec_id").alias("id_a"), "id_b", cos.alias("cos"))
        .where(F.col("cos") >= NEARDUP_TAU)
        .select("id_a", "id_b", F.round("cos", 6).alias("cosine"))
    )


IVF_N_CELLS = 16


def q_ivf_assign(spark, sf_dir):
    """IVF coarse quantization over the embeddings table: every vector
    assigned to its nearest of IVF_N_CELLS centroids (the lowest-id
    vectors — deterministic, oracle-reproducible; see
    vector.ann.collect_centroids). Map-only plan: centroids ride as
    literal arrays inside the scan stage, zero shuffle."""
    from .vector.ann import collect_centroids, ivf_assign

    e = _embeddings(spark, sf_dir).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    cents = collect_centroids(e, IVF_N_CELLS)
    return ivf_assign(e, cents)


IVF_NPROBE = 4


def q_ivf_search(spark, sf_dir):
    """IVF top-5 cosine search, PRODUCTION path (nprobe=4 of 16 cells —
    not the degenerate full-probe form): queries are the vectors with
    vec_id < 20 (same query set as knn_cosine), candidates come only from
    each query's 4 nearest cells. The whole algorithm — cell assignment,
    probe ranking, cell-local re-rank — is deterministic, so the oracle
    replays it exactly in SQL and the hash check covers the real ANN
    dataflow, not just its brute-force limit.

    Scale shape (vector/ann.ivf_search): big-side assignment is a
    zero-shuffle map, probes are broadcast, candidates are a broadcast
    equi-join on centroid_id — the big side never shuffles."""
    from .vector.ann import collect_centroids, ivf_search

    e = _embeddings(spark, sf_dir).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    cents = collect_centroids(e, IVF_N_CELLS)
    q = e.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    return ivf_search(e, q, cents, k=5, nprobe=IVF_NPROBE)


def q_sample_stratified(spark, sf_dir):
    """Deterministic stratified downsampling to a fixed per-stratum budget:
    the 50 documents with the smallest md5(doc_id) per language. This is
    the training-data "balance the language mix" primitive — hash-rank
    sampling is reproducible across engines and runs (no RNG state), and
    adding data never evicts more than the budget.

    Plan note (two-phase top-n — the 100 TB shape): strata are few and huge,
    so a single rank window partitioned by lang would sort each whole
    stratum in one task chain. Instead phase 1 ranks within
    (stratum, input-partition) — the shuffle key carries
    ``spark_partition_id``, so every reducer group is bounded by one input
    split and no task ever holds a whole stratum — keeping ≤ 50 survivors
    per (stratum, split). Phase 2 ranks the ≤ 50·n_splits survivors per
    stratum exactly; its whole-stratum window runs over a budget-bounded
    input, not the corpus. Output is identical to the one-window form
    (hash-rank is deterministic; every global top-50 row is necessarily in
    its split's local top-50)."""
    d = _documents(spark, sf_dir)
    key = F.md5(F.col("doc_id").cast("string"))
    base = d.select("doc_id", "lang", key.alias("sample_key"))
    local_w = W.partitionBy("lang", "split_id").orderBy("sample_key", "doc_id")
    survivors = (
        base.withColumn("split_id", F.spark_partition_id())
        .withColumn("local_rank", F.row_number().over(local_w))
        .where(F.col("local_rank") <= 50)
        .drop("split_id", "local_rank")
    )
    w = W.partitionBy("lang").orderBy("sample_key", "doc_id")
    return (
        survivors.withColumn("sample_rank", F.row_number().over(w).cast("int"))
        .where(F.col("sample_rank") <= 50)
    )


def q_top_tokens(spark, sf_dir):
    """Corpus heavy hitters: global top-20 whitespace tokens by occurrence
    count (ties → lexicographically first token). Explode → partial-agg
    count (map-side combine collapses each partition to its distinct
    tokens) → TakeOrdered 20: the post-agg cardinality is vocabulary-sized,
    never corpus-sized, so the final ordered limit is cheap at any scale."""
    d = _documents(spark, sf_dir)
    toks = d.select(F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("token"))
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n_occurrences"))
    top = counts.orderBy(F.desc("n_occurrences"), "token").limit(20)
    w = W.orderBy(F.desc("n_occurrences"), "token")
    return top.withColumn("rank", F.row_number().over(w).cast("int")).select(
        "rank", "token", "n_occurrences"
    )


def q_distinct_tier_hll(spark, sf_dir):
    """Mergeable-sketch distinct tier: per-(role, hour) HLL sketches of
    conv_id, UNIONED up to (role, day) without touching raw data again —
    the 100 TB shape for "distinct users per day" (re-aggregate stored
    hour-tier sketches, never rescan turns; same two-phase pattern as the
    t-digest tier).

    Oracle contract (same bracket-boolean idiom as tier_1m_tdigest): the
    exact per-day distinct count is compared exactly (computed Spark-side
    with countDistinct, DuckDB-side with COUNT(DISTINCT)), and the HLL
    estimate from the merged sketches must land within ±5% of it —
    Spark emits the comparison as a boolean, the oracle emits literal
    TRUE, so an estimator regression flips the value hash. Default HLL++
    lgConfigK=12 gives ~1.6% standard error, comfortably inside 5% at
    every SF."""
    t = transcripts(spark, sf_dir)
    hourly = t.groupBy(
        "role", F.date_trunc("hour", "ts").alias("hour_start")
    ).agg(F.hll_sketch_agg("conv_id").alias("sk"))
    daily_est = hourly.groupBy(
        "role", F.date_trunc("day", "hour_start").alias("day_start")
    ).agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
    exact = t.groupBy("role", F.date_trunc("day", "ts").alias("day_start")).agg(
        F.countDistinct("conv_id").alias("n_distinct_convs")
    )
    return exact.join(daily_est, ["role", "day_start"]).select(
        "role", "day_start", "n_distinct_convs",
        (
            F.abs(F.col("est") - F.col("n_distinct_convs"))
            <= F.lit(0.05) * F.col("n_distinct_convs")
        ).alias("est_within_5pct"),
    )


def q_lm_perplexity(spark, sf_dir):
    """CCNet-style LM quality scoring (Wenzek et al. 2020): per-document
    negative log likelihood under an interpolated bigram model trained on
    the corpus (see :mod:`tsdat_spark.text.lm` for the model, the
    integer-exact score quantization that makes a float pipeline
    oracle-checkable, and the bounded-vocabulary broadcast path that makes
    scoring a zero-shuffle map at 100 TB)."""
    from .text.lm import _tokenized, score_perplexity, train_bigram_lm

    d = _documents(spark, sf_dir)
    # tokenize ONCE for all three corpus passes (train-unigram explode,
    # train-bigram explode, scoring explode): the lower+split map over the
    # full corpus was the repeated cost (guide §2.3; replica-sf1.0 median
    # 4.2 -> 3.1 s)
    dt = _tokenized(d.select("doc_id", "text")).select(
        "doc_id", "ws").localCheckpoint(eager=False)
    uni, bi, T, V = train_bigram_lm(d, tokenized=dt)
    return score_perplexity(d, uni, bi, T, V, tokenized=dt)


def q_substring_dedup(spark, sf_dir):
    """Duplicated exact-substring detection (Lee et al. 2022): per-doc
    counts of corpus-wide-repeated 4-gram positions merged into maximal
    spans (see :mod:`tsdat_spark.text.substring` for the suffix-array-free
    Spark shape: map-side k-gram hashing, one uniform-key count, one
    hash-equi join back, one per-doc window)."""
    from .text.substring import substring_dedup

    d = _documents(spark, sf_dir)
    return substring_dedup(d, k=4)


def q_bloom_dedup(spark, sf_dir):
    """Incremental batch-vs-history dedup with a Bloom prefilter: odd
    doc_ids are the "new crawl", even doc_ids the ingested history, the
    key a 5-token prefix fingerprint. EXACT result (bloom negatives skip
    the join; positives are anti-join confirmed) — equals the plain
    anti-join the oracle runs (see :mod:`tsdat_spark.text.bloom`)."""
    from .text.bloom import bloom_dedup

    d = _documents(spark, sf_dir)
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    key = F.array_join(F.slice(toks, 1, 5), " ")
    new = d.filter(F.col("doc_id") % 2 == 1)
    hist = d.filter(F.col("doc_id") % 2 == 0)
    return bloom_dedup(new, hist, key, n_bits=1 << 17).select(
        "doc_id", "source", "n_chars"
    )


def q_tfidf_top_terms(spark, sf_dir):
    """Per-document top-3 TF-IDF terms with integer-quantized scores
    (see :mod:`tsdat_spark.text.tfidf`: two partial-agg shuffles + one
    vocabulary join + a WindowGroupLimit top-k)."""
    from .text.tfidf import tfidf_top_terms

    d = _documents(spark, sf_dir)
    return tfidf_top_terms(d, top_k=3)


def q_substring_scrub(spark, sf_dir):
    """Duplicated exact-substring REMOVAL (Lee et al. 2022's transform):
    all-but-first occurrences of corpus-duplicated 4-gram spans are cut and
    each doc's surviving tokens re-joined (first occurrence wins under the
    stable (doc_id, pos) order — same contract as line_dedup)."""
    from .text.substring import substring_scrub

    d = _documents(spark, sf_dir)
    return substring_scrub(d, k=4)


def q_dsir_weights(spark, sf_dir):
    """DSIR importance weights (Xie et al. 2023): score every doc by the
    quantized log-likelihood ratio of an en-target unigram model over the
    raw-corpus model (see :mod:`tsdat_spark.text.dsir`; exact-unigram
    variant of the hashed-ngram recipe so the oracle can replicate it)."""
    from .text.dsir import dsir_weights

    d = _documents(spark, sf_dir)
    return dsir_weights(d, is_target=F.col("lang") == "en")


def q_bm25_top_terms(spark, sf_dir):
    """Per-document top-3 BM25 terms (Robertson k1=1.2, b=0.75) with the
    float expression tree pinned term-for-term against the oracle and the
    final score quantized to int64 (see :mod:`tsdat_spark.text.tfidf`)."""
    from .text.tfidf import bm25_top_terms

    d = _documents(spark, sf_dir)
    return bm25_top_terms(d, top_k=3)


def q_knn_classify(spark, sf_dir):
    """kNN label classification eval (the standard embedding-quality probe
    over a training-data corpus): vec_id < 20 is the eval set, the rest is
    the labeled train set; prediction = majority label among the top-5
    cosine neighbors, ties broken by smaller label. Same broadcast +
    JVM-fold + WindowGroupLimit shape as q_knn_cosine — the train side
    never shuffles; at scale the top-5 stage swaps to the IVF path."""
    e = _embeddings(spark, sf_dir).select(
        "vec_id", "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).withColumn("nrm", _norm(F.col("v")))
    q = e.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("true_label"),
        F.col("v").alias("qv"), F.col("nrm").alias("qnrm"),
    )
    train = e.where(F.col("vec_id") >= 20)
    pairs = train.join(F.broadcast(q), F.lit(True))
    dot = F.aggregate(F.zip_with("v", "qv", lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    cos = dot / (F.col("nrm") * F.col("qnrm"))
    scored = pairs.select(
        "query_id", "true_label",
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"), cos.alias("cos"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    top = scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= 5)
    votes = top.groupBy("query_id", "true_label", "neighbor_label").agg(
        F.count(F.lit(1)).alias("n_votes")
    )
    wv = W.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), F.col("neighbor_label").asc()
    )
    return (
        votes.withColumn("vr", F.row_number().over(wv))
        .where(F.col("vr") == 1)
        .select(
            "query_id",
            F.col("true_label").cast("int").alias("true_label"),
            F.col("neighbor_label").cast("int").alias("pred_label"),
            F.col("n_votes").cast("long").alias("n_votes"),
            (F.col("neighbor_label") == F.col("true_label")).alias("correct"),
        )
    )


def q_normalize_text(spark, sf_dir):
    """C4-style text normalization (Raffel et al. 2020 preprocessing):
    lowercase, strip non-alphanumerics, collapse whitespace — one
    codegen'd map, zero shuffle (NULL text normalizes to ''). The regexes
    are ASCII character classes chosen to mean the same thing in Java
    (Spark) and RE2-ish (DuckDB) engines."""
    d = _documents(spark, sf_dir)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.coalesce("text", F.lit(""))),
                             "[^a-z0-9 ]", ""),
            " +", " ",
        )
    )
    return d.select(
        "doc_id",
        norm.alias("text_norm"),
        F.when(norm == "", F.lit(0))
        .otherwise(F.size(F.split(norm, " ")))
        .cast("long")
        .alias("n_tokens_norm"),
        F.length(norm).cast("long").alias("n_chars_norm"),
    )
