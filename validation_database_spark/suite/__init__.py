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


# The 50 rows the driver hash-checks this round (round 10).
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
# Round-10 application: seats = 9 core + 1 rule-2 seat
# (`rag_retrieval` — REWRITTEN this round: the headline key now runs
# the e6-integer-dot quantized serving form, result schema `cos_sim`
# → `sim_e12`; the promotion VERDICT r9 ask #1 / SCALE.md round 9
# deferred to r10) + 1 rule-3 seat (`rag_retrieval_float_baseline`,
# the re-registered float fold — a NEW name, hence never
# driver-checked) + 1 more rule-3 seat (`unit_ann_ivf_quant`, the
# round-10 e6-integer ANN serving twin — new, never driver-checked)
# + 38 rule-4 oldest-checked greens: the r5 cohort remainder (27)
# and the first 11 of the r6 cohort by name. Derived by
# `python scripts/next_window.py --rewritten rag_retrieval`;
# provenance note in COVERAGE.md. (`unit_rag_retrieval_quant`, green
# r9, was RENAMED to the rag_retrieval headline in this promotion —
# its fn+oracle are unchanged under the new name.)
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
    "rag_retrieval",
    "rag_retrieval_float_baseline",
    "unit_ann_ivf_quant",
    "scd_upsert",
    "skew_salted_revenue",
    "streaming_incremental_dedup",
    "streaming_user_totals_final",
    "unit_active_time",
    "unit_boilerplate_blocks",
    "unit_chi2_independence",
    "unit_cohort_retention",
    "unit_cube_sales",
    "unit_dau_wau",
    "unit_funnel_strict",
    "unit_gini_concentration",
    "unit_hits_scores",
    "unit_hll_distinct",
    "unit_kcore",
    "unit_km_survival",
    "unit_label_propagation",
    "unit_lm_perplexity_filter",
    "unit_markov_transitions",
    "unit_peak_concurrency",
    "unit_poisson_bootstrap",
    "unit_quality_classifier",
    "unit_rfm_segments",
    "unit_seasonal_naive_backtest",
    "unit_semantic_dedup",
    "unit_span_corruption",
    "unit_triangle_counts",
    "doc_profile",
    "streaming_session_totals",
    "unit_ab_ztest",
    "unit_ann_ivfpq",
    "unit_assoc_rules",
    "unit_attribution_last_touch",
    "unit_cdc_merge",
    "unit_churn_auc",
    "unit_churn_labels",
    "unit_cuped_adjustment",
    "unit_decontaminate",
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
