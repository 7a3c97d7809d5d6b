"""Differential test: every suite query with an oracle must match
DuckDB on the same fixtures (the driver's correctness gate, locally)."""

from __future__ import annotations

import pytest

from validation_database_spark.suite import all_specs, unit_specs

from .oracle_utils import assert_matches_oracle

_SPECS = [s for s in all_specs().values() if s.oracle is not None]
_UNIT = [s for s in unit_specs().values() if s.oracle is not None]


@pytest.mark.parametrize("spec", _SPECS, ids=[s.name for s in _SPECS])
def test_query_matches_duckdb_oracle(spark, sf_dir, spec):
    assert_matches_oracle(spark, spec, sf_dir)


@pytest.mark.parametrize("spec", _UNIT, ids=[s.name for s in _UNIT])
def test_unit_operator_matches_duckdb_oracle(spark, sf_dir, spec):
    assert_matches_oracle(spark, spec, sf_dir)
