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


# The 50 rows the driver hash-checks this round (round 12).
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
# Round-12 application: seats = 9 core + 2 rule-2 seats (`ann_topk`
# — its float IVF arm's fan-out layout is now PLAN-TIME DERIVED from
# corpus stats, VERDICT r11 ask #2 — and `rag_retrieval_float_
# baseline` — its scored join gained the dropped-broadcast-hint
# regime switch, ask #5; both value-neutral with unchanged oracles,
# but the driver re-checks the reshaped builders independently) +
# 1 rule-3 seat (`dedup_minhash_lsh_tuned`, the new corpus-size-
# aware-geometry spec, ask #1) + 38 rule-4 oldest-checked greens:
# the r7 cohort remainder and the first of the r8 cohort by name.
# Derived by `python scripts/next_window.py --rewritten
# ann_topk,rag_retrieval_float_baseline`; provenance note in
# COVERAGE.md.
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
    "rag_retrieval_float_baseline",
    "dedup_minhash_lsh_tuned",
    "unit_events_json_props",
    "unit_events_top_paths",
    "unit_join_audit",
    "unit_key_skew_stats",
    "unit_langid_confusion",
    "unit_map_event_counts",
    "unit_math_funcs",
    "unit_minhash_estimate",
    "unit_mix_rebalance",
    "unit_negative_sampling",
    "unit_new_vs_returning",
    "unit_order_cycle_time",
    "unit_phrase_search",
    "unit_price_iqr_fences",
    "unit_priority_ontime_matrix",
    "unit_quality_funnel",
    "unit_return_rate_trend",
    "unit_sample_reservoir_weighted",
    "unit_shard_rendezvous",
    "unit_source_reputation",
    "unit_string_funcs",
    "unit_supplier_hhi",
    "unit_top_movers",
    "unit_url_dedup",
    "unit_vocab_coverage",
    "unit_weighted_delivery_quantiles",
    "unit_window_functions",
    "unit_zone_map_prune",
    "unit_zorder_layout",
    "array_stats",
    "asof_view_before_purchase",
    "big_spender_months",
    "distinct_parts_per_order",
    "doc_sampling",
    "events_anomalies",
    "events_resample_ffill",
    "events_user_stats",
    "events_window_agg",
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
