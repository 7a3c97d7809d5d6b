"""Smoke tests of the driver contract surface."""

from __future__ import annotations

import importlib
import sys


def _entry_mod():
    sys.path.insert(0, "/root/repo")
    return importlib.import_module("__spark_entry__")


def test_entry_runs_and_counts(spark):
    mod = _entry_mod()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) == 1
    r = rows[0]
    # The derived pair guarantees discrepancies exist in every direction.
    assert r.n_missing_in_a > 0
    assert r.n_missing_in_b > 0
    assert r.n_differing > 0


def test_queries_and_oracles_aligned():
    mod = _entry_mod()
    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert qs, "queries() must not be empty"
    # every oracle key must have a query
    assert set(oracles) <= set(qs)


def test_all_queries_return_dataframes(spark, sf_dir):
    mod = _entry_mod()
    for name, fn in mod.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, name
