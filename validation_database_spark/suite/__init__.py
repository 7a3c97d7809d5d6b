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


# The 50 rows the driver hash-checks this round (round 9).
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
#      round, ties broken by name. At 41 rotating seats over a
#      ~190-spec green surface every spec is re-driver-checked every
#      ~4–5 rounds, so a rewrite that silently changes semantics
#      (like the r7 estimator rewrite) is caught within that horizon.
#
# Round-9 application: seats = 9 core + 1 rule-3 seat (the round's
# NEW spec, `unit_rag_retrieval_quant` — the e6-integer-dot serving
# twin, never driver-checked by definition) + 40 oldest-checked
# greens under rule 4 — the r3 leftovers (6), the full r4 cohort
# (24), and the first 10 of the r5 cohort by name. Derived by
# `python scripts/next_window.py`; provenance note in COVERAGE.md.
# (Round-8 seated the final 10 never-checked standalones + all 20
# category (a)/(b)/(c) audit specs, emptying the queue.)
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
    # parity core — pinned every round (rule 1)
    "keys_projection",
    "filter_date_range",
    "missing_ids",
    "join_pairs",
    "diff_typed",
    "diff_string_fuzzy",
    "diff_string_fuzzy_approx",
    "report_summary",
    "validation_counts",
    # rule 3: the round-9 quantized serving twin is new, hence
    # never-driver-checked — takes the first rotating seat
    "unit_rag_retrieval_quant",
    # rule 4: oldest-checked greens (derived by scripts/next_window.py;
    # provenance in COVERAGE.md)
    "range_join_price_bands",
    "regression_spend_trend",
    "revenue_by_nation",
    "scalar_funcs",
    "set_ops_membership",
    "window_calendar_funcs",
    "dedup_embedding",
    "dedup_exact",
    "diff_multi_column",
    "doc_redact",
    "events_sessionize",
    "multi_source_consensus",
    "multimodal_meta",
    "profile_orders",
    "snapshot_diff",
    "streaming_window_counts",
    "text_chunks",
    "unit_ann_lsh",
    "unit_bloom_prune",
    "unit_bm25_topk",
    "unit_dedup_incremental",
    "unit_ewma_user_value",
    "unit_exact_substr_spans",
    "unit_incr_agg",
    "unit_k_anonymize",
    "unit_line_dedup_rewrite",
    "unit_pack_sequences",
    "unit_psi_drift",
    "unit_scd2_as_of",
    "unit_scd2_history",
    "agg_pricing_summary",
    "ann_topk",
    "dedup_clusters",
    "dedup_containment_capped",
    "dedup_minhash_lsh",
    "dedup_ngram_df_capped",
    "dedup_ngram_jaccard",
    "dq_benford",
    "dq_orders",
    "multimodal_features",
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
