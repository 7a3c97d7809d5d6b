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
lists is the full 196-spec surface and ``WINDOW`` picks the 50 rows
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


# The 50 rows the driver hash-checks this round (CORRECTNESS_r07).
#
# Round-7 rotation: the 9-entry parity core is pinned (never rotated —
# it is the reference's own workload, tests/test_entry.py);
# unit_minhash_estimate KEEPS its seat because round 7 rewrites its
# default to the hash-sampled audit (verdict r6 ask #4) and the new
# semantics deserve the driver's independent check, not just pytest's.
# The other 40 round-6 window rows (all driver-green in
# CORRECTNESS_r06) rotate to the unit surface, and 40 never-driver-
# checked standalone specs take their seats — chosen from COVERAGE.md's
# audited queue, skipping the 9 whose semantics are closest to an
# already-green family host (unit_dedup_simhash / unit_simhash_pairs /
# unit_dedup_eval next to the green simhash60+minhash rows,
# unit_text_bigram_logprob / unit_text_entropy next to doc_profile's
# hash-checked logprob/entropy discipline, unit_label_centroid_sim /
# unit_embed_quantize next to the green kmeans/pq rows,
# unit_ngram_novelty next to the green n-gram dedup family,
# unit_dedup_keep_best next to the green dedup_clusters) — those 9
# rotate in round 8.
WINDOW = [
    # parity core — pinned every round
    "keys_projection",
    "filter_date_range",
    "missing_ids",
    "join_pairs",
    "diff_typed",
    "diff_string_fuzzy",
    "diff_string_fuzzy_approx",
    "report_summary",
    "validation_counts",
    # rewritten this round (sampled default, r6 ask #4) — keeps its seat
    "unit_minhash_estimate",
    # round-7 first-timers: BI / rollup family
    "unit_top_movers",
    "unit_supplier_hhi",
    "unit_price_iqr_fences",
    "unit_return_rate_trend",
    "unit_discount_effect",
    "unit_priority_ontime_matrix",
    "unit_order_cycle_time",
    "unit_new_vs_returning",
    "unit_basket_size_dist",
    "unit_weighted_delivery_quantiles",
    # A/B-stats tail
    "unit_ab_srm",
    "unit_corr_matrix",
    # text / tokenizer tail
    "unit_bpe_merges",
    "unit_bpe_encode",
    "unit_cms_counts",
    "unit_vocab_coverage",
    "unit_phrase_search",
    "unit_langid_confusion",
    "unit_corpus_outlier_docs",
    "unit_url_dedup",
    # events tail
    "unit_error_rate_hourly",
    "unit_events_json_props",
    "unit_events_top_paths",
    "unit_map_event_counts",
    "unit_key_skew_stats",
    "unit_join_audit",
    "unit_quality_funnel",
    "unit_source_reputation",
    "unit_mix_rebalance",
    # sampling / layout primitives
    "unit_negative_sampling",
    "unit_sample_reservoir_weighted",
    "unit_shard_rendezvous",
    "unit_zorder_layout",
    "unit_zone_map_prune",
    "unit_compaction_plan",
    "unit_backfill_plan",
    # function showcases
    "unit_math_funcs",
    "unit_string_funcs",
    "unit_datetime_functions",
    "unit_window_functions",
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
