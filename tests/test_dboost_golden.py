"""dBoost golden parity against the reference's OWN synthetic benchmark.

The pinned expectations below are the verbatim output of running the
reference pipeline (``profiling/dBoost/dboost/dboost-stdin.py``) on the
fizzbuzz dataset regenerated per its deterministic generator
(``profiling/dBoost/datasets/synthetic/fizzbuzz.py``; vendored
bit-exact at tests/fixtures/dboost/fizzbuzz.tsv) with the two canonical
invocations from ``profiling/dBoost/datasets/invocation.md:14-16``:

* ``--histogram 0.8 0.05 --discretestats 8 2`` → outlier cells
  {(25,0),(25,1),(28,1),(30,0),(30,1)} and 154 surviving hints;
* ``--partitionedhistogram 5 0.8 0.05 --discretestats 8 2`` → all six
  cells of rows 25/28/30.

(The reference writes (linum, column) pairs to
``<dataset>-dboost_output.csv`` — utils/printing.py:42-70 — and
DiscreteStats prints the kept-hint count — analyzers/discrete.py:55.)
"""

import os

import pytest

from datalakerulegeneration_spark.dboost.golden import (
    fizzbuzz_fixture_path,
    fizzbuzz_histogram_golden,
    fizzbuzz_histogram_oracle_sql,
    fizzbuzz_parthist_golden,
    fizzbuzz_parthist_oracle_sql,
    hint_pairs,
    load_fizzbuzz,
)

HIST_GOLDEN = [(25, 0), (25, 1), (28, 1), (30, 0), (30, 1)]
PART_GOLDEN = [(25, 0), (25, 1), (28, 0), (28, 1), (30, 0), (30, 1)]


def test_fixture_is_the_reference_generator_output():
    """1,001 rows, the three planted errors, the zero-padded s-format."""
    with open(fizzbuzz_fixture_path()) as fh:
        lines = fh.read().splitlines()
    assert len(lines) == 1001
    assert lines[0] == "0\tFizzBuzz"
    assert lines[1] == "1\ts00001"
    assert lines[25] == "25\tFizz"    # planted: should be Buzz
    assert lines[28] == "28\tWoof!"   # planted: should be s00028
    assert lines[30] == "30\tBuzz"    # planted: should be FizzBuzz
    assert lines[1000] == "1000\tBuzz"


def test_discretestats_hint_count_matches_reference(spark):
    """The reference run prints 154 surviving (num,msg) feature-pair
    histograms (analyzers/discrete.py:55 prints len(histograms))."""
    n = (
        hint_pairs(load_fizzbuzz(spark), max_buckets=8)
        .select("af", "ai", "bf", "bi")
        .distinct()
        .count()
    )
    assert n == 154


def test_histogram_golden_cells(spark):
    out = fizzbuzz_histogram_golden(spark, "").collect()
    assert [(r.row_id, r.column_id) for r in out] == HIST_GOLDEN
    # the flagged values ride along for human checkability
    assert [(r.num, r.msg) for r in out if r.row_id == 28] == [(28, "Woof!")]


def test_parthist_golden_cells(spark):
    out = fizzbuzz_parthist_golden(spark, "").collect()
    assert [(r.row_id, r.column_id) for r in out] == PART_GOLDEN


def test_oracle_twins_match_golden():
    import duckdb

    con = duckdb.connect()
    hist = con.execute(fizzbuzz_histogram_oracle_sql()).fetchall()
    assert [(r[0], r[1]) for r in hist] == HIST_GOLDEN
    part = con.execute(fizzbuzz_parthist_oracle_sql()).fetchall()
    assert [(r[0], r[1]) for r in part] == PART_GOLDEN


def test_histogram_is_sensitive_to_the_planted_errors(spark):
    """Discrimination control: repairing row 28's message removes its
    flag (the model must be reacting to the data, not the row ids)."""
    from pyspark.sql import functions as F

    from datalakerulegeneration_spark.dboost.golden import histogram_outlier_cells

    repaired = load_fizzbuzz(spark).withColumn(
        "msg", F.when(F.col("num") == 28, F.lit("s00028")).otherwise(F.col("msg"))
    )
    cells = {
        (r.row_id, r.column_id)
        for r in histogram_outlier_cells(repaired).collect()
    }
    assert (28, 1) not in cells
    assert {(25, 0), (25, 1), (30, 0), (30, 1)} <= cells
