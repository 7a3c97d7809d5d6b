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


# The 50 rows the driver hash-checks this round (round 8).
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
# Round-8 application: seats = 9 core + the 10 final never-driver-
# checked standalones (the 9 deferred from r7 + the late-r7
# unit_semantic_dedup_hier) + all 20 category (a)/(b)/(c) specs from
# COVERAGE.md's audit (consolidated components, labeled exactness
# baselines, the renamed narrow simhash) so even specs whose
# semantics are hash-checked via a host row get one DIRECT driver
# check + 11 oldest-checked greens (all last green in round 3; first
# 11 by name of the 17 tied). After this round the never-driver-
# checked count is 0 and rule 4 alone picks future windows.
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
    # parity core — pinned every round
    *PARITY_CORE,
    # final never-driver-checked standalones (queue emptied this round)
    "unit_dedup_simhash",
    "unit_simhash_pairs",
    "unit_dedup_eval",
    "unit_dedup_keep_best",
    "unit_text_bigram_logprob",
    "unit_text_entropy",
    "unit_label_centroid_sim",
    "unit_embed_quantize",
    "unit_ngram_novelty",
    "unit_semantic_dedup_hier",
    # category (a): components of consolidated driver rows — first
    # direct seat each (semantics previously hash-checked via host)
    "unit_composite_id",
    "unit_project_check",
    "unit_text_tokens",
    "unit_text_quality",
    "unit_lang_id",
    "unit_doc_fingerprint",
    "unit_text_unigram_logprob",
    "unit_text_repetition",
    "unit_text_hash_embeddings",
    "unit_rollup_pricing",
    "unit_running_order_total",
    "unit_sample_hash",
    "unit_train_split",
    "unit_sample_weighted",
    "unit_sample_stratified",
    "unit_orders_above_cust_avg",
    # category (b): labeled exactness baselines (scale twin already green)
    "unit_dedup_containment_exact_baseline",
    "unit_rag_retrieval",
    "unit_minhash_estimate_exact_baseline",
    # category (c): renamed after green
    "unit_simhash60_narrow_baseline",
    # rule 4: oldest-checked greens (all last green r3; ties by name)
    "array_stats",
    "asof_view_before_purchase",
    "big_spender_months",
    "distinct_parts_per_order",
    "doc_sampling",
    "events_anomalies",
    "events_resample_ffill",
    "events_user_stats",
    "events_window_agg",
    "order_status_profile",
    "price_histogram",
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
