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


def test_registry_rotation_invariants():
    """The driver hash-checks the FIRST 50 registry entries, so the
    rotation machinery must hold exactly: 50 window specs, disjoint
    from the unit surface, and the only window spec without a DuckDB
    oracle is the by-design SequenceMatcher parity path."""
    from validation_database_spark import suite

    window = suite.all_specs()
    unit = suite.unit_specs()
    assert len(window) == 50, len(window)
    overlap = set(window) & set(unit)
    assert not overlap, overlap
    no_oracle = [n for n, s in window.items() if s.oracle is None]
    assert no_oracle == ["diff_string_fuzzy_approx"], no_oracle
    # every unit spec keeps an oracle: the pytest parity gate is the
    # only check they get between driver rotations
    unit_no_oracle = [n for n, s in unit.items() if s.oracle is None]
    assert not unit_no_oracle, unit_no_oracle
