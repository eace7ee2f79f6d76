"""Extended TPC-H family: DuckDB-oracle parity at sf0.001.

The driver's correctness gate re-runs these at sf0.01; this test is the
fast local twin so a regression is caught inside the suite. Value
comparison matches tools/check_correctness.py semantics (type-tagged,
sorted columns, sorted rows).
"""

from __future__ import annotations

import os
import sys

import pytest

from datalakerulegeneration_spark.tpch_ext import EXT_REGISTRY
from tests.conftest import SF_DIR

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
# the gate's own normalization — a copy here could drift from the
# driver-matching semantics the gate encodes
from check_correctness import norm as _norm  # noqa: E402


@pytest.mark.parametrize("name", sorted(EXT_REGISTRY))
def test_ext_query_matches_oracle(name, spark, duck):
    impl, sql = EXT_REGISTRY[name]
    df = impl(spark, SF_DIR)
    cols = sorted(df.columns)
    rows = sorted(tuple(_norm(r[c]) for c in cols) for r in df.collect())
    odf = duck.execute(sql).fetchdf()
    assert cols == sorted(odf.columns)
    orows = sorted(
        tuple(_norm(v) for v in r)
        for r in odf[cols].itertuples(index=False, name=None)
    )
    assert rows == orows
