"""Smoke the driver contract at sf0.001: every query runs and returns a
stable schema.  (Exact value checks run in tools/check_correctness.py at
sf0.01 — this keeps the pytest loop fast.)"""

import pytest

import __spark_entry__ as entry


def test_entry_smoke(spark):
    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_oracle_keys_subset_of_queries():
    qs, os_ = entry.queries(), entry.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 30


@pytest.mark.parametrize("name", sorted(entry.queries()))
def test_each_query_runs(spark, sf_dir, name):
    df = entry.queries()[name](spark, sf_dir)
    assert df.columns  # schema resolves
    df.limit(5).collect()  # executes end-to-end
