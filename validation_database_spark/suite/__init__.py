"""Query suite: every implemented operator as a named (spark_fn,
oracle_sql) pair — the driver's correctness surface.

Each :class:`QuerySpec` carries a builder ``(spark, sf_dir) ->
DataFrame`` and, when the semantics are ANSI-SQL-expressible, an
equivalent DuckDB SQL string over the same parquet tables. Column
names are aliased identically on both sides (the driver's compare
sorts columns by name before hashing).

Since round 7 the driver window is the explicit ordered name list
``WINDOW`` below — the module-level ``SPECS`` / ``UNIT_SPECS`` split
(rounds 1–6's rotation mechanism, preserved in the modules as
history) no longer decides window membership; the union of both
lists is the full spec surface (``len(_collect_all())``; don't
hard-code the count — it grows) and ``WINDOW`` picks the 50 rows
the driver hash-checks this round. Rotating the window is now a
one-list edit here instead of a 10-file QuerySpec shuffle.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, None → rows-only check
    doc: str = ""
    headline: bool = False  # include in bench.py's timed suite


# The 50 rows the driver hash-checks this round (round 11).
#
# STEADY-STATE ROTATION POLICY (from round 8 on, VERDICT r7 ask #3):
#   1. The 9-entry parity core is pinned — never rotated (it is the
#      reference's own workload, tests/test_entry.py).
#   2. Any spec whose semantics were REWRITTEN this round keeps (or
#      takes) a seat so the driver independently checks the new
#      semantics, not just pytest (the r7 unit_minhash_estimate rule).
#   3. Never-driver-checked specs fill seats next, oldest spec first.
#   4. Remaining seats cycle driver-green specs OLDEST-CHECKED-FIRST:
#      for each spec, last-checked = the latest CORRECTNESS_r*.json
#      whose row was fully green (hash_match, or err == "no_oracle"
#      for the by-design rows-only path); sort ascending by that
#      round, ties broken by name. At ~40 rotating seats over a
#      ~190-spec green surface every spec is re-driver-checked every
#      ~4–5 rounds, so a rewrite that silently changes semantics
#      (like the r7 estimator rewrite) is caught within that horizon.
#
# Round-11 application: seats = 9 core + 1 rule-2 seat (`ann_topk`
# — its float IVF arm's scored fan-out was RESHAPED this round,
# VERDICT r10 ask #1: salted, explicitly-partitioned layout so the
# partial-WindowGroupLimit sort slabs stay bounded at scale; results
# are value-neutral and the oracle is unchanged, but the driver
# re-checks the reshaped plan independently) + 40 rule-4
# oldest-checked greens: the r6 cohort remainder (28) and the first
# 12 of the r7 cohort by name. No new names this round, so rule 3
# seats none. Derived by
# `python scripts/next_window.py --rewritten ann_topk`; provenance
# note in COVERAGE.md. (next_window.py now folds the r10 rename
# lineage — see its RENAMES — so promotion renames no longer reset
# a spec's oldest-checked age.)
# The reference's own workload — rotation rule 1 pins these in every
# window. scripts/next_window.py derives each round's WINDOW from
# this constant + the CORRECTNESS_r*.json history (rules 2–4).
PARITY_CORE = [
    "keys_projection",
    "filter_date_range",
    "missing_ids",
    "join_pairs",
    "diff_typed",
    "diff_string_fuzzy",
    "diff_string_fuzzy_approx",
    "report_summary",
    "validation_counts",
]

WINDOW = [
    "keys_projection",
    "filter_date_range",
    "missing_ids",
    "join_pairs",
    "diff_typed",
    "diff_string_fuzzy",
    "diff_string_fuzzy_approx",
    "report_summary",
    "validation_counts",
    "ann_topk",
    "unit_did_readout",
    "unit_dq_freshness",
    "unit_feature_lags",
    "unit_frame_checksums",
    "unit_fuzzy_key_join",
    "unit_group_split_audit",
    "unit_hard_negatives",
    "unit_hll_join_overlap",
    "unit_hll_sliding_wau",
    "unit_incr_join_view",
    "unit_jl_projection",
    "unit_khop_reach",
    "unit_kmeans_clusters",
    "unit_mad_anomalies",
    "unit_mannwhitney_u",
    "unit_media_dedup",
    "unit_pq_quantize",
    "unit_quantile_monitor",
    "unit_record_linkage",
    "unit_scd2_temporal_join",
    "unit_score_lift",
    "unit_session_week_overlap",
    "unit_simhash60_wide",
    "unit_target_encode",
    "unit_tfidf_top_terms",
    "unit_trimmed_mean",
    "unit_watermark_audit",
    "unit_zipf_fit",
    "unit_ab_srm",
    "unit_backfill_plan",
    "unit_basket_size_dist",
    "unit_bpe_encode",
    "unit_bpe_merges",
    "unit_cms_counts",
    "unit_compaction_plan",
    "unit_corpus_outlier_docs",
    "unit_corr_matrix",
    "unit_datetime_functions",
    "unit_discount_effect",
    "unit_error_rate_hourly",
]


def _collect_all() -> dict[str, QuerySpec]:
    """The full named surface: union of every module's SPECS and
    UNIT_SPECS, duplicate-checked."""
    from . import advanced, analytics, dedup, events, functions, multimodal, parity, pipeline, quality, similarity, streaming_queries, text

    specs: dict[str, QuerySpec] = {}
    for mod in (parity, analytics, text, dedup, similarity, events, multimodal, advanced, functions, streaming_queries, pipeline, quality):
        for spec in list(mod.SPECS) + list(getattr(mod, "UNIT_SPECS", [])):
            if spec.name in specs:
                raise ValueError(f"duplicate query name {spec.name!r}")
            specs[spec.name] = spec
    return specs


def all_specs() -> dict[str, QuerySpec]:
    """The driver window, in WINDOW order (the driver hash-checks the
    first 50 registry rows, so order is part of the contract)."""
    named = _collect_all()
    missing = [n for n in WINDOW if n not in named]
    if missing:
        raise ValueError(f"WINDOW names not in the spec surface: {missing}")
    return {n: named[n] for n in WINDOW}


def unit_specs() -> dict[str, QuerySpec]:
    """Standalone unit-operator specs — the documented per-operator
    surface outside this round's driver window. Not part of
    ``queries()``/``oracle_sql()``; tests/test_oracle_parity.py keeps
    them oracle-true at sf0.001 and sf0.01 every round."""
    named = _collect_all()
    in_window = set(WINDOW)
    return {n: s for n, s in named.items() if n not in in_window}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark_fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }
