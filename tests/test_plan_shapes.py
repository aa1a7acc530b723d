"""Plan-shape regression tests (round 7): the optimization round's wins
live in physical-plan properties that a refactor or Spark upgrade could
silently undo without failing any value-level test. Each assertion here
pins one such property on the INITIAL (pre-AQE) formatted plan, which is
deterministic for a fixed query + session config.

Only robust invariants are asserted (operator absence / bounded counts),
not full plan text — small-SF planning may legitimately flip join
strategies or AQE may coalesce, but it must never reintroduce the
specific regressions these guards cover.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def queries():
    import __spark_entry__ as entrymod

    return entrymod.queries()


def test_substring_scrub_has_no_sort_aggregate(spark, queries):
    """min(struct) would plan SortAggregate over the full exploded gram
    table; the round-7 min/min_by decomposition must keep every
    aggregation hash-based (no sorts of corpus-scale frames)."""
    plan = _plan(queries["substring_scrub"](spark, SF_DIR))
    assert "SortAggregate" not in plan


def test_line_dedup_has_no_sort_aggregate(spark, queries):
    plan = _plan(queries["line_dedup"](spark, SF_DIR))
    assert "SortAggregate" not in plan


def test_ann_lsh_multi_dedups_at_proxy_width(spark, queries):
    """The cross-table pair dedup must stay a hash aggregate over bare id
    pairs — first(array<float>) payloads in the distinct would bring back
    the double-sort + vector-wide exchange."""
    plan = _plan(queries["ann_lsh_multi"](spark, SF_DIR))
    assert "SortAggregate" not in plan
    assert "first(va" not in plan and "partial_first" not in plan


def test_jaccard_rounds_only_intersecting_pairs(spark, queries):
    """round() on double costs a BigDecimal per row; it must be applied
    to the intersecting-pair table only (one occurrence in the plan), not
    to the full all-pairs stream (round 7: 6 s of the final stage)."""
    plan = _plan(queries["jaccard_pairs"](spark, SF_DIR))
    assert plan.count("round(") == 1
    # the all-pairs stream finishes with coalesce against the literal 0.0
    assert "coalesce(__j" in plan


def test_pack_sequences_final_plan_is_exchange_free(spark, queries):
    """The documented zero-exchange final plan: prefix offsets come from a
    two-phase distributed scan over checkpointed partials, so the final
    query must not shuffle at all."""
    plan = _plan(queries["pack_sequences"](spark, SF_DIR))
    assert "Exchange" not in plan


def test_nearest_grid_rewrite_single_window_pass(spark, queries):
    """nearest_1h's round-7 shape: one window pass over the data alone
    (no union-with-grid second sort, no distinct over series, no
    cross-join grid completion)."""
    plan = _plan(queries["nearest_1h"](spark, SF_DIR))
    # "Window (n)" is the tree-node form; the detail section repeats the
    # operator as "(n) Window", so count tree nodes only
    assert plan.count("Window (") <= 1
    assert "CartesianProduct" not in plan and "Union" not in plan


def test_contamination_df_count_has_no_expand(spark, queries):
    """countDistinct would plan an Expand over the fingerprint table; the
    per-doc-distinct invariant lets plain count(1) stand in exactly."""
    plan = _plan(queries["contamination_overlap"](spark, SF_DIR))
    assert "Expand" not in plan
