"""Corpus-size-aware LSH band geometry (VERDICT r11 ask #1):
`operators.dedup.lsh_geometry`'s sizing rule, the env-knob bake, and
the tuned spec's candidate/recall gates against the default
geometry."""

from __future__ import annotations

from pyspark.sql import functions as F

from validation_database_spark.operators import dedup as D


def test_lsh_geometry_anchors():
    # fixture corpora keep the oracle-parity default exactly
    assert D.lsh_geometry(500) == (16, 4, 4)
    assert D.lsh_geometry(50_000) == (16, 4, 4)
    # the sf30/sf100 replica decade — the round-12 census geometry
    assert D.lsh_geometry(1_500_000) == (48, 8, 6)
    assert D.lsh_geometry(5_000_000) == (48, 8, 6)
    # two more decades out
    assert D.lsh_geometry(500_000_000) == (128, 16, 8)


def test_lsh_geometry_preserves_midpoint_and_monotone():
    """The rule holds the S-curve midpoint (1/b)^(1/r) ≈ t while r
    (curve steepness) grows monotonically with corpus size — the
    whole point is cutting sub-threshold candidates WITHOUT moving
    the similarity the banding targets."""
    t = 2 ** -0.5
    prev_r = 0
    for n in (1_000, 100_000, 10_000_000, 1_000_000_000):
        k, b, r = D.lsh_geometry(n)
        assert k == b * r
        assert abs((1 / b) ** (1 / r) - t) < 0.02, (n, b, r)
        assert r >= prev_r
        prev_r = r


def test_lsh_module_constants_are_consistent():
    assert D.NUM_HASHES == D.NUM_BANDS * D.ROWS_PER_BAND


def test_lsh_env_knobs_bake_into_both_engines():
    """SPARK_GRAFT_LSH_BANDS / _ROWS must flow into the operator
    constants AND the import-time-baked DuckDB oracle together (the
    IVF `_geo` discipline) — a knob that moved only one engine would
    silently break the value check."""
    import json
    import os
    import subprocess
    import sys

    code = (
        "import json\n"
        "from validation_database_spark.operators import dedup as D\n"
        "from validation_database_spark.suite.dedup import _oracle_minhash\n"
        "o = _oracle_minhash()\n"
        "print(json.dumps({'k': D.NUM_HASHES, 'b': D.NUM_BANDS,"
        " 'r': D.ROWS_PER_BAND,"
        " 'oracle_last_sig': 's%d' % (D.NUM_HASHES - 1) in o,"
        " 'oracle_bands': o.count('AS band,')}))\n"
    )
    env = dict(os.environ)
    env.update(SPARK_GRAFT_LSH_BANDS="8", SPARK_GRAFT_LSH_ROWS="6")
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True
    )
    assert out.returncode == 0, out.stderr[-2000:]
    got = json.loads(out.stdout.strip().splitlines()[-1])
    assert got == {
        "k": 48, "b": 8, "r": 6, "oracle_last_sig": True, "oracle_bands": 8
    }, got


def test_tuned_geometry_candidate_and_recall_gates(spark, sf_dir):
    """The tuned (8×6, k=48) geometry must never produce MORE
    candidates than the default 4×4 (same midpoint, sharper S-curve
    → per-pair collision probability is pointwise ≤ above s≈0 noise
    and the sub-threshold mass shrinks by (s/t)² per pair), and must
    retain every design-point pair the default found (the fixture's
    near-dups are all ≥ 0.7 — at and above the midpoint the sharper
    curve's catch probability is ≥ the default's).

    The statistically meaningful measurement is the 5M-doc census in
    SCALE.md round 12; this gate pins the MECHANISM at fixture
    scale."""
    from validation_database_spark.suite.dedup import (
        q_dedup_minhash_lsh,
        q_dedup_minhash_lsh_tuned,
    )
    from validation_database_spark.util import release_pins

    default = {
        (r.id_a, r.id_b): r.jaccard
        for r in q_dedup_minhash_lsh(spark, sf_dir).collect()
    }
    tuned = {
        (r.id_a, r.id_b): r.jaccard
        for r in q_dedup_minhash_lsh_tuned(spark, sf_dir).collect()
    }
    release_pins()
    assert default, "fixture must contain near-dup candidates"
    assert len(tuned) <= len(default)
    strong = {p for p, j in default.items() if j >= 0.7}
    assert strong <= set(tuned), strong - set(tuned)
    # exact-verify values are geometry-independent facts of the pair
    for p in set(tuned) & set(default):
        assert tuned[p] == default[p]
