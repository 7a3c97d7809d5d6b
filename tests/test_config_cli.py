"""Config loader / validation-run surface (reference config.yaml
shape, incl. the exactly-two-sources invariant and manual-query
mode)."""

from __future__ import annotations

import glob
import os

import pytest

from validation_database_spark.config import load_config, run_validation
from validation_database_spark.sources import register_views


def _base_config(sf_dir, tmp_path):
    return {
        "databases": ["dbA", "dbB"],
        "data_type": "string",
        "check_column": "o_orderpriority",
        "unique_key": ["o_orderkey"],
        "threshold": 1,
        "dbA_table_name": "orders",
        "dbB_table_name": "orders",
        "dbA_source": {"format": "parquet", "path": sf_dir},
        "dbB_source": {"format": "parquet", "path": sf_dir},
        "output": str(tmp_path / "report.csv"),
    }


def test_identical_sources_reconcile_clean(spark, sf_dir, tmp_path):
    run = run_validation(spark, _base_config(sf_dir, tmp_path))
    assert run.result.missing_in_first.count() == 0
    assert run.result.missing_in_second.count() == 0
    assert run.result.differing.count() == 0
    # summary written (empty but with header), detail suppressed when empty
    assert glob.glob(os.path.join(str(tmp_path / "report.csv"), "*.csv"))
    assert not os.path.exists(str(tmp_path / "report.csv") + "_differing_values.csv")


def test_exactly_two_sources_enforced(spark, sf_dir, tmp_path):
    cfg = _base_config(sf_dir, tmp_path)
    cfg["databases"] = ["a", "b", "c"]
    with pytest.raises(ValueError, match="exactly two"):
        run_validation(spark, cfg)


def test_date_range_filter_applied(spark, sf_dir, tmp_path):
    cfg = _base_config(sf_dir, tmp_path)
    cfg.update(
        {
            "dbA_database_date_column": "o_orderdate",
            # dbB unfiltered → rows outside the range are "missing in A"
            "start_date": "1995-01-01",
            "end_date": "1996-01-01",
            "output": None,
        }
    )
    run = run_validation(spark, cfg)
    assert run.result.missing_in_first.count() > 0
    assert run.result.missing_in_second.count() == 0


def test_manual_query_mode(spark, sf_dir, tmp_path):
    register_views(spark, sf_dir)
    cfg = {
        "databases": ["left", "right"],
        "data_type": "integer",
        "check_column": "check_col",
        "is_using_manual_queries": True,
        "queries": {
            "first_query": (
                "SELECT CAST(o_orderkey AS STRING) AS id, "
                "CAST(o_totalprice AS STRING) AS check_col FROM orders"
            ),
            "second_query": (
                "SELECT CAST(o_orderkey AS STRING) AS id, "
                "CAST(o_totalprice + CASE WHEN o_orderkey % 100 = 0 THEN 1 ELSE 0 END "
                "AS STRING) AS check_col FROM orders WHERE o_orderkey % 97 <> 0"
            ),
        },
    }
    run = run_validation(spark, cfg)
    assert run.result.missing_in_first.count() == 0
    assert run.result.missing_in_second.count() > 0  # %97 rows dropped on the right
    assert run.result.differing.count() > 0          # %100 rows perturbed


def test_manual_query_mode_validates_config(spark):
    base = {
        "databases": ["left", "right"],
        "is_using_manual_queries": True,
        "check_column": "check_col",
        "queries": {"first_query": "SELECT 1", "second_query": "SELECT 1"},
    }
    for missing, patch in [
        ("queries.second_query", {"queries": {"first_query": "SELECT 1"}}),
        ("queries.first_query", {"queries": {"second_query": "SELECT 1"}}),
        ("check_column", {"check_column": None}),
        ("queries.first_query", {"queries": None}),
    ]:
        cfg = {**base, **patch}
        with pytest.raises(ValueError, match="manual-queries mode requires"):
            run_validation(spark, cfg)


def test_fuzzy_threshold_end_to_end(spark, sf_dir, tmp_path):
    register_views(spark, sf_dir)
    cfg = {
        "databases": ["x", "y"],
        "data_type": "string",
        "check_column": "check_col",
        "threshold": 0.9,
        "is_using_manual_queries": True,
        "queries": {
            "first_query": (
                "SELECT CAST(o_orderkey AS STRING) AS id, o_orderpriority AS check_col "
                "FROM orders"
            ),
            "second_query": (
                # %101 rows get one appended char → ratio just under 1,
                # above 0.9 → NOT reported at threshold 0.9
                "SELECT CAST(o_orderkey AS STRING) AS id, "
                "CASE WHEN o_orderkey % 101 = 0 THEN concat(o_orderpriority, 'X') "
                "WHEN o_orderkey % 103 = 0 THEN 'utterly-different' "
                "ELSE o_orderpriority END AS check_col FROM orders"
            ),
        },
    }
    run = run_validation(spark, cfg)
    reported = {r.id for r in run.result.differing.collect()}
    # the near-misses (one char appended to 6+-char strings) survive 0.9
    assert all(int(i) % 103 == 0 for i in reported)
    assert reported, "the utterly-different rows must be reported"


def test_credentials_dir_merges_into_sources(tmp_path):
    import json

    from validation_database_spark.config import (
        load_all_credentials,
        merge_credentials,
    )

    creds_dir = tmp_path / "creds"
    creds_dir.mkdir()
    (creds_dir / "pg.json").write_text(
        json.dumps({"format": "jdbc", "url": "jdbc:postgresql://h/db", "user": "u", "password": "p"})
    )
    (creds_dir / "ora.json").write_text(
        json.dumps({"format": "jdbc", "url": "jdbc:oracle:thin:@h", "user": "o"})
    )
    creds = load_all_credentials(str(creds_dir))
    assert set(creds) == {"pg", "ora"}

    cfg = {
        "databases": ["pg", "ora"],
        # config-level override wins over the cred file
        "pg_source": {"user": "override"},
    }
    merged = merge_credentials(cfg, creds)
    assert merged["pg_source"]["user"] == "override"
    assert merged["pg_source"]["url"] == "jdbc:postgresql://h/db"
    assert merged["ora_source"]["user"] == "o"


def test_missing_creds_dir_is_fine(tmp_path):
    from validation_database_spark.config import load_all_credentials

    assert load_all_credentials(str(tmp_path / "nope")) == {}


def test_reference_config_yaml_parses(tmp_path):
    """UX parity: the reference's own shipped config.yaml loads and
    validates with this engine's loader (its key names, including
    composite_id_columns, are first-class)."""
    import os

    import pytest as _pytest

    from validation_database_spark.config import _validate, load_config

    ref = "/root/reference/config.yaml"
    if not os.path.exists(ref):
        _pytest.skip("reference snapshot not present")
    cfg = load_config(ref)
    assert cfg["databases"] == ["oracle", "postgres"]
    assert cfg["check_column"] == "MODEL"
    assert cfg["composite_id_columns"] == ["ID"]
    assert cfg["data_type"] == "string"
    assert cfg["threshold"] == 1
    _validate(cfg)  # must not raise


def test_composite_id_columns_alias(spark, sf_dir):
    from validation_database_spark.config import run_validation

    cfg = {
        "databases": ["a", "b"],
        "data_type": "string",
        "check_column": "o_orderpriority",
        "composite_id_columns": ["o_orderkey", "o_custkey"],
        "a_table_name": "orders",
        "b_table_name": "orders",
        "a_source": {"format": "parquet", "path": sf_dir},
        "b_source": {"format": "parquet", "path": sf_dir},
    }
    run = run_validation(spark, cfg)
    assert run.result.differing.count() == 0
    # composite id actually used: ids contain the '_' separator
    sample = run.result.missing_in_first.unionByName(
        run.result.missing_in_second
    ).count()
    assert sample == 0


def test_run_log_narrates_stages_and_redacts_secrets(spark, sf_dir, tmp_path):
    cfg = {
        "databases": ["a", "b"],
        "data_type": "string",
        "check_column": "o_orderpriority",
        "composite_id_columns": ["o_orderkey"],
        "a_table_name": "orders",
        "b_table_name": "orders",
        "a_source": {"format": "parquet", "path": sf_dir, "password": "hunter2"},
        "b_source": {"format": "parquet", "path": sf_dir},
        "log_directory": str(tmp_path / "logs"),
        "log_counts": True,
    }
    run = run_validation(spark, cfg)
    assert run.log_path and os.path.exists(run.log_path)
    assert os.path.basename(run.log_path).startswith("data_validation_")
    text = open(run.log_path).read()
    # reference stage narration (running_validation.py INFO lines)
    for line in (
        "Starting Validate Data",
        "Processing Validate Missing Ids Done.",
        "Processing Validate Data Done",
        "IDs Missing in a: 0",
        "Differing values: 0",
    ):
        assert line in text
    # format: "<asctime> - INFO - <msg>"
    assert " - INFO - Starting Validate Data" in text
    # deliberate divergence: secrets never reach the log
    assert "hunter2" not in text
    assert "password: ***" in text


def test_athena_and_odps_source_specs(spark):
    from validation_database_spark.config import athena_odps_source

    cfg = {
        "databases": ["ali", "aws"],
        "batch_size": 5000,
        "aws_table_name": "orders",
        "ali_table_name": "orders",
        "aws_source": {
            "format": "athena",
            "region_name": "ap-southeast-1",
            "database": "lake",
            "output_location": "s3://bucket/athena-results/",
            "aws_access_key_id": "AKIA123",
            "aws_secret_access_key": "s3cr3t",
        },
        "ali_source": {
            "format": "odps",
            "endpoint": "http://service.odps.aliyun.com/api",
            "project_name": "proj",
            "access_id": "id1",
            "access_key": "k1",
        },
    }
    athena = athena_odps_source(cfg, "aws").reader_options()
    assert athena["url"] == "jdbc:awsathena://athena.ap-southeast-1.amazonaws.com:443"
    assert athena["driver"] == "com.simba.athena.jdbc.Driver"
    assert athena["S3OutputLocation"] == "s3://bucket/athena-results/"
    assert athena["Schema"] == "lake"
    assert athena["dbtable"] == "orders"
    assert athena["fetchsize"] == "5000"

    odps = athena_odps_source(cfg, "ali").reader_options()
    assert odps["url"] == "jdbc:odps:http://service.odps.aliyun.com/api?project=proj"
    assert odps["driver"] == "com.aliyun.odps.jdbc.OdpsDriver"
    assert odps["user"] == "id1"
