#!/usr/bin/env python
"""Benchmark harness: prints ONE JSON line.

The headline ``value`` is the BASELINE-comparable number: wall
seconds for one full reference-shaped validation run — a tiny source
reconciled against the complete orders table (the reference's golden
run was 2 rows vs 1.94M, see BASELINE.md), including both CSV report
writes. The reference's 8.94 s golden number is a WARM run, so
``value`` is the steady (second) run and ``value_cold`` the first
(cold-plan) run. Since round 6 the composites
(``value``/``baseline_match``) are measured BEFORE the timed suite,
on the freshly warmed session — the isolation study (SCALE.md
"Parity-family isolation") showed measuring them after 28 suite
queries mixes in session load, which is what the r5 "regression" was;
in rounds 1–5 ``value`` was a single run taken after the whole suite,
i.e. effectively warm, so the warm definition is also the continuous
one. The ``queries`` dict additionally times every headline suite
query end-to-end (noop writes — full plan execution, no driver
collect), plus ``__suite_total``.

Runs at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``.

Outlier protection (round 8): each spec's warm reading is checked
against the prior round's BENCH record (same SF, box-normalized by
the calibration ratio); a >2x reading triggers two extra steady runs
and the reported warm is the median of the three post-cold runs, with
the full detail in ``outlier_reruns``. See GHOST_WARM_RATIO below for
the BENCH_r07 ann_topk ghost that motivated this. Since round 11 the
same rule covers the composites (``value``/``baseline_match`` —
priored on the prior round's own composite readings), which were the
only single-reading numbers in the record and exactly the ones the
contended BENCH_r10 session corrupted; the payload also carries
``calibration_ratio`` (parallel / single-thread control) so a
parallel-slot-theft session is visible without hand-deriving it.

Isolation mode: ``--only name[,name...]`` (or ``$SPARK_GRAFT_ONLY``)
times just the named queries — same warm-up, same cold+warm protocol,
none of the other suite queries sharing the session. Use it to
separate a real per-query regression from suite contention (the r3
``diff_string_fuzzy`` 0.50→1.00 s question was exactly this). The
reference-shaped e2e and baseline-match runs are skipped in this mode
(the JSON ``value`` is null) so the isolated numbers are the only
load in the session.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

HEADLINE = [
    "validation_counts",
    "missing_ids",
    "join_pairs",
    "diff_typed",
    "diff_string_fuzzy",
    "report_summary",
]


def reference_shaped_e2e(spark, sf_dir: str) -> float:
    """The reference's workload shape: a near-empty source vs the full
    orders table, string mode, composite id, both CSV reports written
    (reference logs: 8.94 s warm for 2 vs 1.94M rows)."""
    from pyspark.sql import functions as F

    from validation_database_spark.operators.keys import composite_id
    from validation_database_spark.operators.reconcile import reconcile
    from validation_database_spark.operators.report import write_reports
    from validation_database_spark.sources import load_table

    out = tempfile.mkdtemp(prefix="bench_reports_")
    t0 = time.perf_counter()
    orders = load_table(spark, "orders", sf_dir)
    project = lambda df: df.select(  # noqa: E731
        composite_id(["o_orderkey"]).alias("id"),
        F.col("o_orderpriority").alias("MODEL"),
    )
    small = project(orders.filter(F.col("o_orderkey") <= 10))
    big = project(orders)
    res = reconcile(
        small, big, check_column="MODEL", mode="string", db1="a", db2="b"
    )
    write_reports(res, os.path.join(out, "result.csv"), single_file=False)
    dt = time.perf_counter() - t0
    shutil.rmtree(out, ignore_errors=True)
    return dt


def baseline_match_point(
    spark,
    sf_dir: str,
    prior: dict | None = None,
    calibration: float | None = None,
    outlier_reruns: dict[str, dict] | None = None,
) -> dict | None:
    """Run the reference-shaped e2e at the BASELINE's row count
    (~1.5M orders ≈ the reference's 1.94M golden run) so the
    'within 2×' comparison happens at matched scale, not sf0.1.

    Builds (once, cached in /tmp) a 10× key-offset replica of the
    sf0.1 orders table — same recipe as scripts/make_scale_data.py —
    and reuses it across bench runs. Skipped silently when the sf0.1
    fixtures are absent (e.g. bench run at another SF for iteration).
    """
    src = "/root/testdata/sf0.1/orders.parquet"
    if not os.path.exists(src):
        return None
    from pyspark.sql import functions as F

    from validation_database_spark.sources import load_table

    cache = "/tmp/spark_graft_bench_orders_x10"
    marker = os.path.join(cache, "orders.parquet", "_SUCCESS")
    if not os.path.exists(marker):
        from functools import reduce

        orders = load_table(spark, "orders", "/root/testdata/sf0.1")
        parts = [
            orders.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * 10_000_000))
            for i in range(10)
        ]
        reduce(lambda a, b: a.unionAll(b), parts).repartition(32).write.mode(
            "overwrite"
        ).parquet(os.path.join(cache, "orders.parquet"))
    rows = spark.read.parquet(os.path.join(cache, "orders.parquet")).count()
    # the baseline's 8.94 s is a warm run (BASELINE.md), so e2e_sec —
    # the number compared against baseline_sec — is the matched-state
    # second run; the first (cold-plan) run is reported alongside
    sec_cold = round(reference_shaped_e2e(spark, cache), 4)
    sec = round(reference_shaped_e2e(spark, cache), 4)
    if outlier_reruns is not None:
        # Composite outlier protection (VERDICT r10 ask #2), priored
        # on the last round's matched-scale warm reading.
        sec = median_protected_warm(
            "baseline_match",
            lambda: round(reference_shaped_e2e(spark, cache), 4),
            sec_cold,
            sec,
            ((prior or {}).get("baseline_match") or {}).get("e2e_sec"),
            (prior or {}).get("calibration_sec"),
            calibration,
            outlier_reruns,
        )
    return {
        "rows": rows,
        "e2e_sec": sec,
        "e2e_cold_sec": sec_cold,
        "baseline_rows": 1_940_000,
        "baseline_sec": 8.94,
    }


def calibration_point(spark) -> float:
    """Fixed, data-independent control workload: md5-derived integer
    sum over a 20M-row range, all 32-way parallel JVM codegen. Its
    wall time measures the BOX, not the engine — identical code has
    shown 3× swings across sessions on this host (SCALE.md "Box-speed
    control"), so every bench JSON carries this number to let a reader
    normalize cross-session comparisons before reading any per-query
    delta as a regression."""
    df = spark.range(0, 20_000_000, 1, 32).selectExpr(
        "sum(cast(conv(substr(md5(cast(id as string)), 1, 8), 16, 10)"
        " as bigint)) as s"
    )
    t0 = time.perf_counter()
    df.collect()
    return round(time.perf_counter() - t0, 4)


def calibration_point_1t(spark) -> float:
    """Single-thread twin of :func:`calibration_point` (600k rows, ONE
    partition): measures single-core speed, which can move
    independently of 32-way throughput (turbo, noisy neighbor pinned
    to a core). The round-7 window_calendar_funcs adjudication showed
    why one parallel point is not enough: the query read 1.5× slower
    isolated while the parallel control read FASTER — the delta was
    codegen-JIT state, invisible to a throughput-only control."""
    df = spark.range(0, 600_000, 1, 1).selectExpr(
        "sum(cast(conv(substr(md5(cast(id as string)), 1, 8), 16, 10)"
        " as bigint)) as s"
    )
    t0 = time.perf_counter()
    df.collect()
    return round(time.perf_counter() - t0, 4)


def unwrap_record(rec: dict) -> dict | None:
    """Normalize a BENCH record to the bench payload shape.

    The repo's permanent BENCH_r*.json files are DRIVER WRAPPERS
    ``{n, rc, cpus, sf, tail, parsed}`` with the bench payload nested
    under ``parsed`` (VERDICT r8: reading ``queries_warm`` off the top
    level made the prior-round ghost branch dead code — ``prior_warm``
    was always null). This unwraps the wrapper, reconstructs
    ``queries_warm`` from the compact ``warm_vals`` form (round 9+
    stdout lines carry warm timings as an array ordered like
    ``queries`` to stay under the driver's 2000-char tail capture),
    and returns None for unusable records (e.g. a truncated tail gave
    ``parsed: null``, as in BENCH_r08)."""
    if not isinstance(rec, dict):
        return None
    inner = rec.get("parsed") if isinstance(rec.get("parsed"), dict) else rec
    if "cpus" not in inner and isinstance(rec.get("cpus"), int):
        # the session width lives on the driver WRAPPER; the
        # contention gate needs it to core-normalize the prior ratio
        inner = dict(inner, cpus=rec["cpus"])
    if "queries_warm" not in inner and "warm_vals" in inner:
        names = list(inner.get("queries", {}))
        vals = inner["warm_vals"]
        if len(names) == len(vals):
            inner = dict(inner)
            inner["queries_warm"] = dict(zip(names, vals))
    if "queries_warm" not in inner:
        return None
    return inner


def prior_round_record(sf: str, root: str | None = None) -> dict | None:
    """The latest USABLE BENCH_r*.json in the repo root at the SAME
    sf — the prior round's permanent record, used by the outlier rule
    below. Driver wrappers are unwrapped via :func:`unwrap_record`;
    records without recoverable warm timings (truncated tails) are
    skipped so the rule falls back to the newest round that parsed.
    None when absent or cross-SF (iteration runs at sf0.01 must not
    compare against the driver's sf0.1 record)."""
    import glob
    import re

    best = None
    for path in glob.glob(os.path.join(root or REPO_ROOT, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            rec = json.load(open(path))
        except Exception:
            continue
        inner = unwrap_record(rec)
        if inner is None:
            continue
        rec_sf = inner.get("sf", rec.get("sf"))
        if str(rec_sf) != sf:
            continue
        if best is None or int(m.group(1)) > best[0]:
            best = (int(m.group(1)), inner)
    return best[1] if best else None


def compact_payload(payload: dict) -> dict:
    """The stdout form of the bench payload, sized for the driver's
    2000-char tail capture (BENCH_r08 was the first round recorded
    with ``parsed: null`` because the full-precision line outgrew it).
    Three reductions, all lossless given BENCH_DETAIL.json:

    - floats rounded to 2 decimals (suite timings are seconds; the
      jitter band is larger than 10 ms anyway);
    - ``queries_warm`` replaced by ``warm_vals``, an array ordered
      like ``queries`` — the query names are the bulk of the line and
      were emitted twice (readers reconstruct via
      :func:`unwrap_record`);
    - constant baseline fields dropped from ``baseline_match``
      (``baseline_rows``/``baseline_sec`` are documented in
      BASELINE.md) and ``outlier_reruns`` reduced to the flagged
      names (full detail goes to BENCH_DETAIL.json + stderr).

    tests/test_scale_machinery.py pins the worst-case line length
    under 1800 chars."""

    def rnd(o):
        if isinstance(o, float):
            return round(o, 2)
        if isinstance(o, dict):
            return {k: rnd(v) for k, v in o.items()}
        if isinstance(o, list):
            return [rnd(v) for v in o]
        return o

    out = {k: v for k, v in payload.items() if k != "queries_warm"}
    warm = payload.get("queries_warm", {})
    out["warm_vals"] = [warm.get(n) for n in payload.get("queries", {})]
    if isinstance(out.get("baseline_match"), dict):
        out["baseline_match"] = {
            k: v
            for k, v in out["baseline_match"].items()
            if k not in ("baseline_rows", "baseline_sec")
        }
    if isinstance(out.get("outlier_reruns"), dict):
        out["outlier_reruns"] = sorted(out["outlier_reruns"])
    # Round only the timing payload: sf must survive exactly (the
    # prior-round loader matches records by SAME SF — rounding 0.001
    # to 0.0 would orphan sub-0.005 scale factors), and the
    # calibration numbers feed the ghost ratio at full precision
    # (ADVICE r9).
    exempt = {
        "sf",
        "calibration_sec",
        "calibration_1t_sec",
        "calibration_ratio",
        # the retry detail's ratios feed the contention rule at full
        # precision (r12); present only on flagged sessions
        "calibration_retries",
    }
    return {k: (v if k in exempt else rnd(v)) for k, v in out.items()}


# Outlier rule thresholds (VERDICT r7 ask #2). The BENCH_r07 ghost:
# ann_topk recorded 10.49 cold / 5.82 warm in the driver's session
# while the identical suite on the same box (calibration 0.658 vs
# 0.651) read 1.60/1.28 — a query-local stall (GC/JIT) that the
# session-global calibration cannot catch. Rule: a warm reading more
# than GHOST_WARM_RATIO x the prior round's warm (box-normalized by
# the calibration ratio, plus an absolute slack for sub-second
# jitter) triggers two extra steady runs, and the reported warm is
# the MEDIAN of the three post-cold runs — one stalled execution can
# no longer write the round's number. Cold stays the true first run
# (it cannot be re-measured in-session), but the flag and all runs
# are recorded in ``outlier_reruns`` so a cold-side ghost is visible
# in the round's record instead of masquerading as a regression.
GHOST_WARM_RATIO = 2.0
GHOST_WARM_SLACK_SEC = 0.5
GHOST_COLD_OVER_WARM = 3.0

# Session-global contention rule (VERDICT r11 ask #3). The ghost rule
# above box-NORMALIZES by the calibration ratio, so a contention
# event that inflates calibration and query together — exactly
# BENCH_r10's failure (both ~1.6×) — passes under its 2× threshold.
# `calibration_ratio` (parallel / single-thread control) is the field
# that catches that case: parallel-slot theft moves the 32-way
# control without moving the 1-thread one (r10 read 3.32 where the
# quiet rounds r9/r11 read 1.92). Since round 12 bench.py ACTS on it:
# a ratio above CONTENDED_RATIO_ABS, or above CONTENDED_RATIO_REL ×
# the prior round's ratio, triggers one cooldown re-measure of the
# calibration pair (the theft may be transient); if the re-measured
# ratio still trips, the payload is stamped ``contended_record: true``
# so a reader never has to hand-derive the r10 forensic again. The
# absolute arm is the backstop when the PRIOR round was itself
# contended (a big prior ratio would let anything pass the relative
# arm).
CONTENDED_RATIO_ABS = 2.5
CONTENDED_RATIO_REL = 1.5
CONTENTION_COOLDOWN_SEC = 10.0
REFERENCE_CPUS = 32  # the driver's session width the thresholds were set at


def normalized_ratio(ratio: float | None, cpus: int | None) -> float | None:
    """Core-count-normalize a parallel/1t calibration ratio to the
    32-core reference. The raw ratio scales ~1/cores (the parallel
    control is a fixed 33× the 1t workload split across the
    session's cores), so a local[8] iteration run IDEALLY reads ~4×
    — the rule's first live firing mis-flagged exactly that. At the
    reference width the normalization is the identity, so every
    historical BENCH record reads unchanged."""
    if ratio is None:
        return None
    return round(ratio * (cpus or REFERENCE_CPUS) / REFERENCE_CPUS, 4)


def contention_suspicious(
    ratio: float | None, prior_ratio: float | None
) -> bool:
    """True when the (core-normalized) calibration ratio signals
    session-global contention. Pure so tests/test_scale_machinery.py
    can pin the rule against the r9/r10/r11 recorded ratios (all at
    the 32-core reference, where normalization is the identity)."""
    if ratio is None:
        return False
    if ratio > CONTENDED_RATIO_ABS:
        return True
    return prior_ratio is not None and ratio > CONTENDED_RATIO_REL * prior_ratio


def prior_calibration_ratio(prior: dict | None) -> float | None:
    """The prior round's CORE-NORMALIZED parallel/1t control ratio:
    the recorded field (r11+) or derived from the two controls when
    both are present (pre-r11 records), normalized by the record's
    session width (the driver wrapper's ``cpus``, hoisted by
    unwrap_record; absent → the 32-core reference, true of every
    driver record)."""
    if not prior:
        return None
    ratio = prior.get("calibration_ratio")
    if ratio is None:
        cal, cal1t = prior.get("calibration_sec"), prior.get("calibration_1t_sec")
        if cal and cal1t:
            ratio = cal / cal1t
    return normalized_ratio(ratio, prior.get("cpus"))


def ghost_suspicious(
    warm_t: float,
    cold_t: float,
    prior_warm: float | None,
    prior_cal: float | None,
    calibration: float | None,
) -> bool:
    """True when a warm reading should trigger the median re-runs.
    Pure so tests/test_scale_machinery.py can pin the rule against
    the r7 ghost's actual numbers."""
    if prior_warm is not None and prior_cal and calibration:
        norm = calibration / prior_cal
        return warm_t > (
            GHOST_WARM_RATIO * prior_warm * norm + GHOST_WARM_SLACK_SEC
        )
    # no comparable prior: a slow cold far above its own warm is the
    # only in-session signal (warm floor excludes sub-second codegen
    # ratios that are normal for compile-heavy plans)
    return cold_t > GHOST_COLD_OVER_WARM * warm_t and warm_t > 1.0


def detail_filename(only: list[str] | None) -> str:
    """Where the full-precision payload goes: isolation (``--only``)
    runs write a SEPARATE file so they can never clobber the round's
    permanent full-suite record with a partial payload (ADVICE r9;
    factored out and tested by return value instead of source-string
    pinning — ADVICE r10)."""
    return "BENCH_DETAIL_only.json" if only else "BENCH_DETAIL.json"


def median_protected_warm(
    name: str,
    run_once,
    cold_t: float,
    warm_t: float,
    prior_warm: float | None,
    prior_cal: float | None,
    calibration: float | None,
    outlier_reruns: dict[str, dict],
) -> float:
    """The in-session outlier rule applied to one warm reading: when
    :func:`ghost_suspicious` flags it, take two extra steady runs and
    report the MEDIAN of the three post-cold runs, recording the full
    detail under ``outlier_reruns[name]``. Shared by the per-query
    loop and — since round 11 (VERDICT r10 ask #2) — the composites
    (``value``/``baseline_match``), which until then were the only
    single-reading numbers in the record and exactly the ones the
    contended BENCH_r10 session corrupted (e2e recorded 6.48 s vs
    2.53 s isolated-quiet)."""
    if not ghost_suspicious(warm_t, cold_t, prior_warm, prior_cal, calibration):
        return warm_t
    extra_runs = [run_once(), run_once()]
    outlier_reruns[name] = {
        "cold": cold_t,
        "warm_first": warm_t,
        "extra": extra_runs,
        "prior_warm": prior_warm,
        "prior_calibration": prior_cal,
    }
    return sorted([warm_t] + extra_runs)[1]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    only: list[str] = []
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1].split(",")
    elif os.environ.get("SPARK_GRAFT_ONLY"):
        only = os.environ["SPARK_GRAFT_ONLY"].split(",")

    from validation_database_spark.session import get_spark
    from validation_database_spark.suite import all_specs, unit_specs

    spark = get_spark(app_name="bench")
    specs = all_specs()
    # headline-flagged unit operators are timed too (they are not part
    # of the driver's 50-entry correctness window, but their perf is
    # part of the engine's story).
    specs.update({n: s for n, s in unit_specs().items() if s.headline})
    if only:
        # isolation mode may target ANY spec, not just the timed suite
        specs.update(
            {n: s for n, s in unit_specs().items() if n not in specs}
        )

    # Warm the JVM + parquet footers (every table, not just orders) so
    # first-run timings measure the engine, not session startup or
    # first-touch file listing.
    specs["validation_counts"].spark_fn(spark, sf_dir).collect()
    from validation_database_spark.sources import load_table
    from validation_database_spark.sources.registry import TABLES

    for t in TABLES:
        if os.path.exists(os.path.join(sf_dir, f"{t}.parquet")):
            load_table(spark, t, sf_dir).limit(1).collect()
    # Warm the Python worker fleet + Arrow lanes (round 12): the first
    # Python-eval stage of the session pays one worker fork + pandas/
    # pyarrow import per core (~4 s at local[32], measured on
    # rag_retrieval's cold run) — session startup, not engine work,
    # exactly like the JVM/parquet-footer warm-up above. One
    # trivial row per core through mapInPandas spawns and primes every
    # reusable worker so the timed cold runs measure the operators.
    spark.range(0, 64, 1, 64).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    # Each query is timed twice: ``queries`` is the first (cold-plan)
    # run — Catalyst analysis + codegen compile + execution — and
    # ``queries_warm`` the second, steady-state run (the reference's
    # 8.94 s golden number is itself a warm run, see BASELINE.md).
    timings: dict[str, float] = {}
    warm: dict[str, float] = {}

    # Box-speed control: first run pays codegen, second is the steady
    # reading. Reported even in --only mode — isolated numbers need
    # the control most.
    calibration_point(spark)
    calibration = calibration_point(spark)
    calibration_point_1t(spark)
    calibration_1t = calibration_point_1t(spark)

    # Prior round's record for the outlier rule (same-SF only).
    prior = prior_round_record(sf)
    outlier_reruns: dict[str, dict] = {}

    # Session-global contention gate (VERDICT r11 ask #3, rationale
    # at CONTENDED_RATIO_ABS): a tripped ratio gets ONE cooldown
    # re-measure of the control pair — the better (lower-ratio) pair
    # is reported, and if the re-measure still trips, the payload is
    # stamped contended_record below.
    cpus = spark.sparkContext.defaultParallelism
    prior_ratio = prior_calibration_ratio(prior)
    ratio = round(calibration / calibration_1t, 4) if calibration_1t else None
    calibration_retries: list[dict] = []
    if contention_suspicious(normalized_ratio(ratio, cpus), prior_ratio):
        calibration_retries.append(
            {"calibration_sec": calibration, "calibration_1t_sec": calibration_1t,
             "ratio": ratio}
        )
        time.sleep(CONTENTION_COOLDOWN_SEC)
        re_cal = calibration_point(spark)
        re_1t = calibration_point_1t(spark)
        re_ratio = round(re_cal / re_1t, 4) if re_1t else None
        if re_ratio is not None and (ratio is None or re_ratio < ratio):
            calibration, calibration_1t, ratio = re_cal, re_1t, re_ratio
    contended = contention_suspicious(normalized_ratio(ratio, cpus), prior_ratio)

    # The BASELINE-comparable composites run FIRST, before the timed
    # suite: the round-6 isolation study (SCALE.md "Parity-family
    # isolation") showed the after-28-queries session inflates them by
    # up to ~60% vs their isolated numbers (r5's apparent e2e
    # regression was exactly this). Measuring them on the freshly
    # warmed session makes the headline a property of the engine, not
    # of the suite's length that round. ``value`` is the warm run —
    # the baseline's 8.94 s is warm (see docstring).
    e2e_cold = None if only else round(reference_shaped_e2e(spark, sf_dir), 4)
    e2e = None if only else round(reference_shaped_e2e(spark, sf_dir), 4)
    if e2e is not None:
        # Composite outlier protection (VERDICT r10 ask #2): same
        # ghost rule as the per-query loop, priored on the last
        # round's ``value`` (itself a warm reading). Exception-guarded
        # (ADVICE r11): a transient failure in one of the two extra
        # median runs must fall back to the first warm reading, not
        # abort the whole bench.
        try:
            e2e = median_protected_warm(
                "e2e",
                lambda: round(reference_shaped_e2e(spark, sf_dir), 4),
                e2e_cold,
                e2e,
                (prior or {}).get("value"),
                (prior or {}).get("calibration_sec"),
                calibration,
                outlier_reruns,
            )
        except Exception:
            pass
    try:
        bm = (
            None
            if only
            else baseline_match_point(
                spark, sf_dir, prior=prior, calibration=calibration,
                outlier_reruns=outlier_reruns,
            )
        )
    except Exception:
        bm = None
    extra = [n for n in specs if n not in HEADLINE and specs[n].headline]
    timed = only if only else HEADLINE + extra
    # Isolation protocol (VERDICT r5 ask #2): ``--only`` also accepts
    # the pseudo-entries ``e2e`` and ``baseline_match`` so the
    # reference-shaped composites get the same fresh-process isolated
    # cold/warm numbers as the per-query entries.
    for name in timed:
        if name == "e2e":
            timings[name] = round(reference_shaped_e2e(spark, sf_dir), 4)
            warm[name] = round(reference_shaped_e2e(spark, sf_dir), 4)
            continue
        if name == "baseline_match":
            bm_c = baseline_match_point(spark, sf_dir)
            bm_w = baseline_match_point(spark, sf_dir)
            if bm_c and bm_w:
                timings[name] = bm_c["e2e_sec"]
                warm[name] = bm_w["e2e_sec"]
            continue
        if name not in specs:
            continue
        fn = specs[name].spark_fn

        def run_once() -> float:
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            return round(time.perf_counter() - t0, 4)

        cold_t = run_once()
        warm_t = run_once()
        # In-session outlier rule (VERDICT r7 ask #2, thresholds and
        # rationale at GHOST_WARM_RATIO above): compare warm against
        # the prior round's box-normalized warm when available, else
        # fall back to the cold/warm ratio heuristic.
        warm_t = median_protected_warm(
            name,
            run_once,
            cold_t,
            warm_t,
            (prior or {}).get("queries_warm", {}).get(name),
            (prior or {}).get("calibration_sec"),
            calibration,
            outlier_reruns,
        )
        timings[name] = cold_t
        warm[name] = warm_t
        # drop the determinism/reuse pins this spec accumulated
        # (ADVICE r6: they are corpus-sized and CacheManager never
        # GCs); released AFTER both runs so warm-run cache semantics
        # are unchanged vs prior rounds.
        from validation_database_spark.util import release_pins

        release_pins()

    timings["__suite_total"] = round(sum(timings.values()), 4)
    warm["__suite_total"] = round(sum(warm.values()), 4)

    payload = {
        "metric": "validation_e2e_seconds",
        "value": e2e,
        "unit": "sec",
        "queries": timings,
        "queries_warm": warm,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "calibration_sec": calibration,
        "calibration_1t_sec": calibration_1t,
        # Contention telemetry (VERDICT r10 ask #2): parallel-vs-1t
        # calibration ratio. Parallel-slot theft (the r10 signature:
        # 32-way control 1.6x slower while the 1-thread control got
        # FASTER) moves this ratio without moving calibration_1t_sec
        # — r10 read 3.32 vs r9's 1.92 on the same box. Acted on
        # since r12 (the cooldown gate in main, VERDICT r11 ask #3);
        # the gate compares the ratio CORE-NORMALIZED to the 32-core
        # reference (`cpus` below is the session width it used).
        "calibration_ratio": ratio,
        "cpus": cpus,
    }
    if contended:
        # The cooldown re-measure still tripped the rule: every
        # number in this record was taken on a contended box. Stamped
        # so a reader never re-derives the r10 forensic by hand.
        payload["contended_record"] = True
    if calibration_retries:
        payload["calibration_retries"] = calibration_retries
    if e2e_cold is not None:
        payload["value_cold"] = e2e_cold
    if bm is not None:
        payload["baseline_match"] = bm
    if outlier_reruns:
        payload["outlier_reruns"] = outlier_reruns
    # Full-precision record (incl. outlier detail) to a side file and,
    # for flagged entries, stderr; stdout gets the compact line that
    # fits the driver's 2000-char tail capture (see compact_payload).
    # Isolation runs write a SEPARATE file (ADVICE r9: `--only`
    # adjudication runs used to clobber the round's permanent
    # full-suite record with a partial payload).
    detail_name = detail_filename(only)
    try:
        with open(os.path.join(REPO_ROOT, detail_name), "w") as f:
            json.dump(payload, f, indent=1)
    except OSError:
        pass
    if outlier_reruns:
        print("outlier_reruns: " + json.dumps(outlier_reruns), file=sys.stderr)
    print(json.dumps(compact_payload(payload)))
    spark.stop()


if __name__ == "__main__":
    main()
