"""Structural invariants for the late-round-5 operators — properties
the DuckDB oracle equality cannot express (it would share any
systematic bug in a mirrored formula). Each test pins a mathematical
fact of the operator itself."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_km_survival_invariants(spark, sf_dir):
    """Kaplan-Meier: n_risk strictly decreases in t, the log-survival
    curve is non-increasing, and the risk-set accounting conserves the
    subject count (Σ(d+c) = N = max n_risk)."""
    from validation_database_spark.suite.analytics import q_km_reorder_survival

    rows = q_km_reorder_survival(spark, sf_dir).orderBy("t").collect()
    assert rows, "empty KM table"
    n0 = rows[0]["n_risk"]
    total = sum(r["d_events"] + r["c_censored"] for r in rows)
    assert total == n0, "risk-set accounting must conserve subjects"
    prev_risk, prev_ls = None, None
    for r in rows:
        if prev_risk is not None:
            assert r["n_risk"] < prev_risk, "n_risk must strictly decrease"
        prev_risk = r["n_risk"]
        if r["log_surv"] is not None:
            if prev_ls is not None:
                assert r["log_surv"] <= prev_ls + 1e-12, "survival must not rise"
            prev_ls = r["log_surv"]


def test_mannwhitney_u_bounds(spark, sf_dir):
    """U is bounded by [0, n1*n2] (doubled: [0, 2*n1*n2]) and the tie
    term is non-negative."""
    from validation_database_spark.suite.analytics import q_mannwhitney_u

    row = q_mannwhitney_u(spark, sf_dir).collect()[0]
    assert 0 <= row["u_doubled"] <= 2 * row["n_a"] * row["n_b"]
    assert row["tie_term"] >= 0


def test_target_encode_is_leakage_safe(spark, sf_dir):
    """The out-of-fold identity against an INDEPENDENT recomputation:
    for each category, Σ_f (N−n_f)·oof_f = (K−1)·S/100, with S
    recomputed straight from orders — every fold's encoding really is
    the complement mean, not the (leaky) full-category mean."""
    from validation_database_spark.sources import load_table
    from validation_database_spark.suite.pipeline import TE_FOLDS, q_target_encode

    rows = q_target_encode(spark, sf_dir).collect()
    truth = {
        r["category"]: (r["s"], r["n"])
        for r in load_table(spark, "orders", sf_dir)
        .groupBy(F.col("o_orderpriority").alias("category"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias("s"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    by_cat: dict[str, list] = {}
    for r in rows:
        by_cat.setdefault(r["category"], []).append(r)
    for cat, cells in by_cat.items():
        s_cents, n_cat = truth[cat]
        assert sum(c["n_fold"] for c in cells) == n_cat
        lhs = sum((n_cat - c["n_fold"]) * c["oof_mean"] for c in cells)
        rhs = (TE_FOLDS - 1) * s_cents / 100.0
        # oof_mean is rounded to 6 dp; tolerance scales with N
        assert abs(lhs - rhs) < 1e-6 * n_cat * TE_FOLDS + 1e-6, cat
        naive = s_cents / 100.0 / n_cat
        leaky = [c for c in cells if abs(c["oof_mean"] - naive) < 1e-9]
        assert len(leaky) < len(cells), f"{cat}: all folds equal the naive mean"


def test_hll_sliding_wau_accuracy(spark, sf_dir):
    """The merged-sketch estimate stays within the m=64 error envelope
    of the exact trailing distinct (|rel err| < 0.5 is ~4σ), asserted
    only in the regime where the raw estimator is valid (the
    register-merge arithmetic itself is value-checked against the
    DuckDB oracle by test_oracle_parity)."""
    from validation_database_spark.suite.events import q_hll_sliding_wau

    rows = q_hll_sliding_wau(spark, sf_dir).collect()
    assert rows
    checked = 0
    for r in rows:
        # raw HLL is biased below ~2.5m distinct (the linear-counting
        # regime, deliberately not taken — see unit_hll_distinct);
        # assert the envelope only where the raw estimator is valid.
        if r["wau_exact"] < 300:
            continue
        checked += 1
        rel = abs(r["wau_est"] - r["wau_exact"]) / r["wau_exact"]
        assert rel < 0.5, f"{r['day']}: rel err {rel:.2f}"
    if rows and max(r["wau_exact"] for r in rows) >= 300:
        assert checked > 0


def test_khop_reach_structure(spark, sf_dir):
    """Hop labels are MINIMAL shortest distances, not just disjoint
    labels: every vertex gets exactly one label in [0, KHOP_ROUNDS],
    hop-0 is exactly the seed set, and — the minimality pin — no
    vertex labelled hop ≥ 2 is adjacent to any seed (an adjacency a
    broken round-1 frontier would leave mislabelled)."""
    from pyspark.sql import functions as SF

    from validation_database_spark.sources import load_table
    from validation_database_spark.suite.advanced import (
        KHOP_ROUNDS,
        KHOP_SEED_MOD,
        q_khop_reach,
    )

    df = q_khop_reach(spark, sf_dir)
    rows = df.collect()
    assert rows
    seen: dict[int, int] = {}
    for r in rows:
        assert 0 <= r["hop"] <= KHOP_ROUNDS
        assert r["partkey"] not in seen, "a vertex must get exactly one label"
        seen[r["partkey"]] = r["hop"]
        if r["hop"] == 0:
            assert r["partkey"] % KHOP_SEED_MOD == 0

    # independent edge rebuild for the minimality check
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_partkey")
    edges = (
        li.alias("x")
        .join(li.alias("y"), "l_orderkey")
        .select(
            SF.col("x.l_partkey").alias("a"), SF.col("y.l_partkey").alias("b")
        )
        .filter(SF.col("a") != SF.col("b"))
        .distinct()
        .collect()
    )
    seeds = {v for v, h in seen.items() if h == 0}
    seed_adjacent = {e["b"] for e in edges if e["a"] in seeds}
    for v, h in seen.items():
        if h >= 2:
            assert v not in seed_adjacent, (
                f"vertex {v} labelled hop {h} but adjacent to a seed"
            )
    # and every hop-1 vertex really is seed-adjacent
    for v, h in seen.items():
        if h == 1:
            assert v in seed_adjacent, f"hop-1 vertex {v} not seed-adjacent"


def test_scd2_temporal_join_covers_every_order(spark, sf_dir):
    """Every order matches exactly one dimension version, and that
    version's validity started on or before the order date."""
    from validation_database_spark.sources import load_table
    from validation_database_spark.suite.pipeline import q_scd2_temporal_join

    out = q_scd2_temporal_join(spark, sf_dir)
    n_orders = load_table(spark, "orders", sf_dir).count()
    assert out.count() == n_orders
    bad = out.filter(F.col("valid_from") > F.col("order_date")).count()
    assert bad == 0


def test_hll_join_overlap_inclusion_exclusion(spark, sf_dir):
    """Union register max can only shrink the sketch sum, so
    est_union ≥ max(est_a, est_b); and the published est_inter is
    exactly est_a + est_b − est_union (to output rounding)."""
    from validation_database_spark.suite.quality import q_hll_join_overlap

    r = q_hll_join_overlap(spark, sf_dir).collect()[0]
    assert r["est_union"] >= max(r["est_a"], r["est_b"]) - 1e-9
    assert abs(r["est_inter"] - round(r["est_a"] + r["est_b"] - r["est_union"], 2)) < 1e-9


def test_lm_perplexity_filter_smoothing_penalty(spark, sf_dir):
    """Docs exist on both sides of the keep floor at fixture scale
    (the threshold genuinely trips), and every score is negative (log
    probabilities)."""
    from validation_database_spark.suite.text import q_lm_perplexity_filter

    rows = q_lm_perplexity_filter(spark, sf_dir).collect()
    assert rows
    assert all(r["avg_logprob"] < 0 for r in rows)
    kinds = {r["keep"] for r in rows}
    assert kinds == {True, False}, "keep floor must split the corpus"


def test_exact_substr_chunked_spans_match_naive(spark):
    """The chunked two-level explode in q_exact_substr_spans must
    produce the identical (doc_id, p, h) span table as the naive
    position-first explode — including for documents long enough to
    straddle several chunk boundaries, where the stride arithmetic
    (every window lives in exactly one chunk) is actually exercised.
    Pins the round-6 quadratic-carry fix (SCALE.md "Nested-HOF cliff
    round 2"). The chunked side is the PRODUCTION expression
    (chunked_span_table, the exact stage q_exact_substr_spans runs),
    not a re-implementation — a regression in text.py's chunking on
    boundary-straddling docs fails here (ADVICE r6)."""
    from validation_database_spark.suite.text import (
        ESS_CHUNK,
        ESS_L,
        chunked_span_table,
    )

    # 3 docs: shorter than L (no spans), exactly one chunk, and one
    # straddling four chunk boundaries (with enough repetition that
    # window content repeats across chunks).
    lens = {1: ESS_L - 1, 2: ESS_CHUNK, 3: 4 * ESS_CHUNK + 37}
    rows = spark.createDataFrame(
        [(d, n) for d, n in lens.items()], "doc_id int, n int"
    )
    base = rows.select(
        "doc_id",
        F.expr("transform(sequence(1, n), i -> concat('w', i % 97))").alias("toks"),
        F.col("n").alias("n_tok"),
    )

    naive = (
        base.filter(F.col("n_tok") >= ESS_L)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(1), F.col("n_tok") - ESS_L + 1)
            ).alias("p"),
            "toks",
        )
        .select(
            "doc_id",
            "p",
            F.md5(F.array_join(F.slice("toks", F.col("p"), ESS_L), " ")).alias("h"),
        )
    )

    chunked = chunked_span_table(base)

    a = sorted(naive.collect())
    b = sorted(chunked.collect())
    assert a == b
    # every in-range position exactly once, none from the short doc
    assert len(a) == sum(max(n - ESS_L + 1, 0) for n in lens.values())
    assert {r.doc_id for r in a} == {2, 3}
