"""Physical-plan assertions: the scale properties SURVEY.md §4 claims
(pushdown, pruning, broadcast dims, bounded shuffle counts, top-k
without a global sort) must hold in the compiled plans, not just in
docstrings. These tests fail if a refactor silently de-optimizes a
query shape."""

from __future__ import annotations

import re

from conftest import SF_ORACLE
from etl_sendas_spark.plans.inventory import (
    d1_keep_first,
    j_asof_events,
    j_broadcast_enrich,
    o_global_topk,
    p_filter_project,
    q1_pricing_summary,
)


def _plan(df) -> str:
    """Full formatted physical plan (toString() truncates long lines)."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _shuffles(plan: str) -> int:
    return len(re.findall(r"Arguments: (?:hash|range)partitioning", plan))


def test_q1_pushes_filter_and_prunes_columns(spark):
    plan = _plan(q1_pricing_summary(spark, SF_ORACLE))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    m = re.search(r"ReadSchema: struct<([^>\n]*)>", plan)
    assert m, plan
    cols = [c.split(":")[0] for c in m.group(1).split(",")]
    assert sorted(cols) == [
        "l_discount", "l_extendedprice", "l_linestatus",
        "l_quantity", "l_returnflag", "l_shipdate",
    ], cols


def test_filter_project_needs_no_shuffle(spark):
    plan = _plan(p_filter_project(spark, SF_ORACLE))
    assert _shuffles(plan) == 0, plan
    assert "StringContains(p_name,r)" in plan  # contains() reached the scan


def test_broadcast_enrich_never_shuffles_the_fact_for_joins(spark):
    plan = _plan(j_broadcast_enrich(spark, SF_ORACLE))
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)) == 3, plan
    assert "SortMergeJoin" not in plan
    # only the fact-widening round-robin + the final groupBy shuffle
    assert _shuffles(plan) == 1, plan


def test_global_topk_avoids_global_sort(spark):
    plan = _plan(o_global_topk(spark, SF_ORACLE))
    assert "TakeOrderedAndProject" in plan, plan
    assert _shuffles(plan) == 0, plan


def test_keep_first_is_single_shuffle(spark):
    plan = _plan(d1_keep_first(spark, SF_ORACLE))
    assert _shuffles(plan) == 1, plan


def test_range_join_is_hash_not_nested_loop(spark):
    """The bucketed range join must compile to a hash-equi join on the
    bucket — never the quadratic BroadcastNestedLoopJoin a raw
    inequality predicate produces."""
    from etl_sendas_spark.plans.inventory import j_range_bucketed

    plan = _plan(j_range_bucketed(spark, SF_ORACLE))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_asof_join_is_single_shuffle(spark):
    """The union+last-carry as-of join must cost exactly one hash
    shuffle (the per-key window) — no range-join explosion, no
    broadcast of an unbounded side."""
    plan = _plan(j_asof_events(spark, SF_ORACLE))
    assert _shuffles(plan) == 1, plan
