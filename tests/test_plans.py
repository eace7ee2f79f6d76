"""Physical-plan regression tests: the scale properties COVERAGE.md
claims (pushdown, column pruning, broadcast joins, scan/shuffle
budgets) asserted on the pre-execution plan, so a refactor that
silently de-optimizes a flagship query fails the suite, not just the
bench."""

from __future__ import annotations

import re

import pytest

from datalakerulegeneration_spark import queries as Q
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _impl(name):
    return Q.REGISTRY[name][0]


def test_q6_single_scan_pushdown(spark):
    p = _plan(_impl("q6_forecast_revenue")(spark, SF_DIR))
    assert p.count("FileScan parquet") == 1
    assert "PushedFilters:" in p and "l_shipdate" in p.split("PushedFilters:", 1)[1][:300]
    # projection pruned to exactly the needed columns
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"l_quantity", "l_extendedprice", "l_discount", "l_shipdate"}


def test_q3_broadcast_no_cartesian(spark):
    p = _plan(_impl("q3_top_orders")(spark, SF_DIR))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    # the segment filter reaches the customer scan
    assert "c_mktsegment" in p.split("PushedFilters:", 1)[1]


def test_violations_fused_single_scan_no_shuffle(spark):
    p = _plan(_impl("violations_events")(spark, SF_DIR))
    assert p.count("FileScan parquet") == 1
    assert "Exchange" not in p


def test_profiler_scalar_three_pruned_scans(spark):
    p = _plan(_impl("profile_lineitem")(spark, SF_DIR))
    assert p.count("FileScan parquet") == 3
    # string-branch scan reads ONLY the two string columns (FileScan
    # output lists; ReadSchema strings get truncated in big plans)
    scans = [ln for ln in p.splitlines() if "FileScan parquet" in ln]
    assert any(
        "l_returnflag" in ln and "l_orderkey" not in ln for ln in scans
    )


def test_sessionize_single_shuffle(spark):
    p = _plan(_impl("sessionize_events")(spark, SF_DIR))
    assert p.count("FileScan parquet") == 1
    assert p.count("Exchange") == 1


def test_asof_no_range_join(spark):
    p = _plan(_impl("asof_join_events_orders")(spark, SF_DIR))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert p.count("Window") == 1


def test_q19_disjunctive_predicate_pushed(spark):
    p = _plan(_impl("q19_disjunctive_revenue")(spark, SF_DIR))
    pushed = p.split("PushedFilters:", 1)[1]
    assert "Or(" in pushed


def test_value_and_token_passes_single_scan(spark):
    for name in ("value_stats_customer", "token_stats_documents"):
        p = _plan(_impl(name)(spark, SF_DIR))
        assert p.count("FileScan parquet") == 1, name


def test_fuzzy_decontamination_no_cartesian(spark):
    p = _plan(_impl("decontaminate_fuzzy_documents")(spark, SF_DIR))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
