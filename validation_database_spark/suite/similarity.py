"""Similarity search over ``embeddings`` (north-star extension):
brute-force cosine top-k as the exactness baseline, and an IVF
(inverted-file) variant as the scale path — assign vectors to coarse
centroid cells, probe only the nearest cells at query time.

Query/centroid sets are deterministic modular selections of the
vector ids so both engines derive identical inputs. Cosines are
rounded to 6 decimals *before* ranking/thresholding, with vec_id as
the final tiebreak — identical row selection on both engines.

Scale posture: the centroid set is tiny and broadcast; the per-vector
assignment is a broadcast nested-loop over |centroids| (a narrow map
at any scale), and query probing touches only nprobe cells — the
brute-force O(n·q) path exists solely as the verification baseline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.vectors import (
    dot,
    dot_expr,
    dot_sql,
    l2_norm,
    l2_norm_expr,
    unit_sql,
)
from ..sources import load_table
from ..util import pin, spread
from . import QuerySpec

def _geo(name: str, default: int) -> int:
    """IVF/RAG geometry knob (verdict r5 ask #5): the DEFAULT is the
    fixture-determinism value every oracle replays; a deployment sizes
    it to the corpus (nlist ∝ √n, the Faiss guideline) via
    ``SPARK_GRAFT_<NAME>``. Read once at import so the Spark builders
    and the f-string DuckDB oracles bake the SAME geometry — the
    cross-engine value check stays exact at any setting (SCALE.md's
    "IVF geometry sweep" has the measured nlist 64-vs-256 slope)."""
    import os

    return int(os.environ.get(f"SPARK_GRAFT_{name}", default))


TOP_K = 10
N_PROBE = _geo("IVF_NPROBE", 2)
QUERY_MOD = 100   # vec_id % 100 == 0 → query set
CENTROID_MOD = 50
CENTROID_OFF = 7  # vec_id % 50 == 7 → centroid set
# IVF nlist is a FIXED index parameter, not a function of corpus size:
# without a cap the modular selection yields n/50 centroids, making
# the assignment pass O(n²/50) — measured 86.8 s warm at the 100×
# replica (100k vectors × 2000 centroids). The cap keeps the fixture
# SFs unchanged (sf0.1 has 40 modular centroids < 64) and bounds the
# index at scale, where you would train nlist centroids, not sample
# n/50. Overridable: SPARK_GRAFT_IVF_NLIST (see _geo).
CENTROID_CAP = _geo("IVF_NLIST", 64)  # vec_id DIV 50 < cap
# K for the k-means OP (and SemDeDup's spherical variant) gets the
# same treatment (round 7 — the r5 100× note flagged exactly this:
# "the modular centroid selection grows K with the corpus, so
# assignment cost is n·K; a production run pins K"). 256 keeps every
# fixture SF bit-identical (sf0.01 seeds 20, sf0.1 seeds 200 — both
# below the cap) and bounds the 100× replica at K=256 instead of
# n/50=2000, where Lloyd assignment alone measured 317 s cold. K=256
# also balances SemDeDup's two cost terms at that scale (assign n·K
# vs within-cluster pairs Σc² ≈ n²/K — see SCALE.md round 7).
# Overridable: SPARK_GRAFT_KMEANS_K.
KMEANS_K_CAP = _geo("KMEANS_K", 256)


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread: the scoring joins' probe side must not sit on one scan
    # partition (single-file fixture); see util.spread.
    return spread(load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding"))


def _unit_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, u): unit-normalized vectors. cosine(a, b) ==
    dot(unit(a), unit(b)), so normalizing once per ROW makes every
    candidate-pair cosine ONE sequential dot instead of three
    (dot + both norms) — at n·q pairs that is the dominant cost.

    The norm is computed in a projection BEFORE the spread()
    repartition: the exchange is a projection-collapse barrier, so
    the O(d) norm fold runs once per row instead of being inlined
    into the element-wise division lambda (d times per row).

    Built from Spark-SQL strings (round 12): the Column-API lambda
    chain costs one py4j round trip per node on EVERY timed build;
    the strings are the literal rendering of the same tree
    (sameSemantics-pinned in tests/test_plans.py)."""
    emb = load_table(spark, "embeddings", sf_dir).selectExpr(
        "vec_id", "embedding", f"{l2_norm_expr('embedding')} AS __nrm"
    )
    return spread(emb).selectExpr(
        "vec_id",
        "transform(embedding, x -> cast(x as double) / __nrm) AS u",
    )


_UNITS_CTE = (
    f"units AS (SELECT vec_id, {unit_sql('embedding')} AS u FROM embeddings)"
)


# --- brute-force top-k -------------------------------------------------

def q_ann_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 cosine neighbors for each query vector. The query
    side is tiny → broadcast; ranking is a per-query window (fully
    parallel across queries). Vectors are unit-normalized once, so
    each of the n·q scored pairs is a single sequential dot."""
    emb = _unit_emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("u").alias("q_u")
    )
    scored = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(dot(F.col("q_u"), F.col("u")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= TOP_K)
    )


_COS_QV = dot_sql("q.u", "v.u")

ORACLE_ANN_TOPK = f"""
WITH {_UNITS_CTE}
SELECT query_id, vec_id, cos_sim, rk FROM (
  SELECT q.vec_id AS query_id, v.vec_id AS vec_id,
         ROUND({_COS_QV}, 6) AS cos_sim,
         row_number() OVER (PARTITION BY q.vec_id
                            ORDER BY ROUND({_COS_QV}, 6) DESC, v.vec_id) AS rk
  FROM units q JOIN units v ON v.vec_id <> q.vec_id
  WHERE q.vec_id % {QUERY_MOD} = 0
) WHERE rk <= {TOP_K}
"""


# --- IVF (cell-probed) -------------------------------------------------


def _geo_opt(name: str) -> int | None:
    """Like :func:`_geo` but with NO fixed default: None means
    "derive at plan time from corpus stats" (VERDICT r11 ask #2 —
    the 2M-vector point was hand-sized from docstring prose; the
    env override is retained for deployments that know better)."""
    import os

    v = os.environ.get(f"SPARK_GRAFT_{name}")
    return int(v) if v is not None else None


# Fan-out layout knobs for the float IVF arm (VERDICT r10 ask #1 —
# see q_ann_ivf_cosine's docstring). Since round 12 the default is
# PLAN-TIME DERIVED from corpus stats (ann_float_layout below);
# setting SPARK_GRAFT_ANN_FLOAT_SALT / _PARTS pins either knob.
ANN_FLOAT_SALT = _geo_opt("ANN_FLOAT_SALT")
ANN_FLOAT_PARTS = _geo_opt("ANN_FLOAT_PARTS")
# Target fan-out pairs per task for the derived layout (~5 s of the
# measured 0.58 µs/pair float scoring per slab).
ANN_FLOAT_SLAB = _geo("ANN_FLOAT_SLAB", 8_000_000)
# Probes visit POPULOUS cells preferentially (a cell's probe mass
# correlates with its member mass), so the uniform estimate
# queries·nprobe·(n/nlist) undercounts: the round-11 2M census
# measured 3.21B actual vs 1.25B uniform — ratio 2.6. 2.5 is the
# skew allowance baked into the estimate (an OVER-estimate only
# costs smaller slabs; an under-estimate costs stragglers).
ANN_FANOUT_SKEW = 2.5


def ann_float_layout(n_vectors: int | None) -> tuple[int, int]:
    """Derive the float arm's (salt, parts) from the corpus size —
    the docstring sizing prose of round 11 as code (VERDICT r11 ask
    #2). Estimated fan-out = (n/QUERY_MOD)·nprobe·(n/nlist)·skew,
    then operators.fanout.fanout_layout targets ANN_FLOAT_SLAB pairs
    per task with the r10 fixture floors (4, 32) — small corpora keep
    the proven fixture layout exactly; the 2M-vector replica derives
    (8, 391), the decade the hand-sized salt 8 / parts 256 run
    measured at 1,993 s cold (SCALE.md round 11). Pinned at both
    anchors by tests/test_fanout.py. None (footer stats unreadable)
    falls back to the floors."""
    from ..operators.fanout import fanout_layout

    if n_vectors is None:
        return fanout_layout(1, CENTROID_CAP, ANN_FLOAT_SLAB)
    nlist = min(CENTROID_CAP, max(n_vectors // CENTROID_MOD, 1))
    est = (
        (n_vectors / QUERY_MOD)
        * N_PROBE
        * (n_vectors / max(nlist, 1))
        * ANN_FANOUT_SKEW
    )
    return fanout_layout(est, nlist, ANN_FLOAT_SLAB)


def q_ann_ivf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search: every vector is assigned to its nearest centroid
    cell; each query probes its nprobe=2 nearest cells and ranks only
    the vectors inside them. Results can differ from exact top-k —
    that is the approximation; the oracle runs the identical IVF.

    Scale shape (round 11, VERDICT r10 ask #1): the scored fan-out is
    |probing queries| x |cell| pairs, and its final per-query rank
    window already gets a map-side partial WindowGroupLimit (top-K
    per query leaves each task, so the exchange is small) — but the
    partial's own SORT runs in whatever layout the join inherits,
    and the join's INPUTS are small, so AQE coalesced them to 22
    partitions at the 2M-vector replica and the 3.21B-pair fan-out
    sorted as 22 single-threaded ~146M-row spilling slabs (the
    round-10 DNF: terminated at 7,063 s with the last straggler
    >=26 min). Fix: vectors carry a crc32 salt, probes replicate to
    every salt (each candidate pair still matches exactly once — the
    quant twin's cogroup rule), and the assigned side is
    repartitioned by (cent_id, __salt) with an EXPLICIT partition
    count, which AQE never coalesces (REPARTITION_BY_NUM). The
    fan-out + sort now run ANN_FLOAT_PARTS wide with slabs bounded
    at ~pairs/(nlist x salt) even under cell skew. Value-neutral:
    same pairs, same scores, same tie-breaks (pinned by
    tests/test_ann_recall.py::test_ann_float_salt_is_value_neutral);
    SCALE.md round 11 has the re-measured 2M point. Layout sizing
    (round 12, VERDICT r11 ask #2): derived at plan time from the
    corpus row count by ann_float_layout — fixture corpora keep the
    proven (4, 32) floors, the 2M replica derives (8, 391) — with
    SPARK_GRAFT_ANN_FLOAT_SALT / _PARTS retained as pin-overrides
    and SPARK_GRAFT_ANN_FLOAT_SLAB setting the per-task pair
    target."""
    emb = _unit_emb(spark, sf_dir)
    cents = emb.filter(
        (F.col("vec_id") % CENTROID_MOD == CENTROID_OFF)
        & (F.col("vec_id") < CENTROID_MOD * CENTROID_CAP)
    ).select(F.col("vec_id").alias("cent_id"), F.col("u").alias("c_u"))

    # vector → nearest centroid, ROW-LOCALLY (round 12). History of
    # this stage: a row_number window shuffled all |vectors|·|cents|
    # scored rows (Java-heap OOM at the 100× replica); the r4 fix was
    # a max(struct) aggregation with map-side combine — but that
    # still materialized the |vectors|·|cents| crossJoin rows (each
    # carrying the 64-double unit vector) and burned the suite's
    # hottest CPU in ObjectHash/Sort aggregation buffers (round-12
    # stage profile: ~10 s CPU per run on the RAG float twin's copy).
    # Now the ≤nlist centroid table is folded to ONE array row
    # (sort_array(collect_list(struct)) — deterministic order) and
    # broadcast; each vector computes its argmax inside a single
    # projection: max over transform(cents, c -> struct(a_cos,
    # -cent_id)) — the IDENTICAL comparator the max(struct) agg used
    # (array_max and max share the struct ordering; cent_id is
    # unique, so ties never pass the second field). No crossJoin
    # row materialization, no aggregation, no exchange: a narrow map
    # at any scale, strictly stronger than the r4 shape (pinned in
    # tests/test_plans.py::test_ivf_assignment_is_rowlocal_narrow_map).
    # Empty-cents edge (ADVICE r12): cents.agg(collect_list) always
    # emits ONE row (empty array), so with zero centroids every vector
    # gets cent_id NULL here — the old crossJoin+groupBy shape emitted
    # an empty frame instead. Final results are identical (downstream
    # inner joins on cent_id drop NULLs); only the INTERMEDIATE
    # frame's contract differs — guard with a non-empty check if this
    # frame is ever consumed directly.
    carr = F.broadcast(
        cents.agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("cent_id"), F.col("c_u")))
            ).alias("cs")
        )
    )
    best = F.array_max(
        F.transform(
            F.col("cs"),
            lambda c: F.struct(
                F.round(dot(F.col("u"), c["c_u"]), 6).alias("a_cos"),
                (-c["cent_id"]).alias("neg_cent"),
            ),
        )
    )
    assigned = emb.crossJoin(carr).select(
        "vec_id", "u", (-best["neg_cent"]).alias("cent_id")
    )

    # query → nprobe nearest centroids, same row-local form: struct
    # sort DESC orders (p_cos DESC, neg_cent DESC ≡ cent_id ASC) —
    # exactly the old window's ORDER BY — and slice keeps the top
    # nprobe, so the probed set is identical.
    queries = emb.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("u").alias("q_u")
    )
    probed_arr = F.slice(
        F.sort_array(
            F.transform(
                F.col("cs"),
                lambda c: F.struct(
                    F.round(dot(F.col("q_u"), c["c_u"]), 6).alias("p_cos"),
                    (-c["cent_id"]).alias("neg_cent"),
                ),
            ),
            asc=False,
        ),
        1,
        N_PROBE,
    )
    probes = (
        queries.crossJoin(carr)
        .select(
            "query_id",
            "q_u",
            F.explode(
                F.transform(probed_arr, lambda s: -s["neg_cent"])
            ).alias("cent_id"),
        )
    )

    # search only the probed cells. Salt + explicit-count repartition
    # bound the fan-out stage's sort slabs and parallelism (docstring
    # above); every pair matches on exactly one salt value. The
    # layout is plan-time derived from the corpus row count unless
    # the env knobs pin it (ann_float_layout above).
    from ..operators.fanout import parquet_rows, salted_fanout

    salt_n, parts_n = ANN_FLOAT_SALT, ANN_FLOAT_PARTS
    if salt_n is None or parts_n is None:
        d_salt, d_parts = ann_float_layout(parquet_rows(sf_dir, "embeddings"))
        salt_n = d_salt if salt_n is None else salt_n
        parts_n = d_parts if parts_n is None else parts_n
    a_s, p_s = salted_fanout(
        assigned,
        probes,
        F.col("vec_id").cast("string"),
        salt_n,
        parts=parts_n,
        partition_keys=("cent_id",),
    )
    scored = (
        p_s.join(a_s, ["cent_id", "__salt"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(dot(F.col("q_u"), F.col("u")), 6).alias("cos_sim"),
        )
    )
    s_w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(s_w).cast("bigint"))
        .filter(F.col("rk") <= TOP_K)
    )


_COS_VC = dot_sql("v.u", "c.c_u")
_COS_QC = dot_sql("q.u", "c.c_u")

ORACLE_ANN_IVF = f"""
WITH {_UNITS_CTE},
cents AS (
  SELECT vec_id AS cent_id, u AS c_u FROM units
  WHERE vec_id % {CENTROID_MOD} = {CENTROID_OFF}
    AND vec_id < {CENTROID_MOD * CENTROID_CAP}
),
assigned AS (
  SELECT vec_id, u, cent_id FROM (
    SELECT v.vec_id, v.u, c.cent_id,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY ROUND({_COS_VC}, 6) DESC, c.cent_id) AS arn
    FROM units v CROSS JOIN cents c
  ) WHERE arn = 1
),
probes AS (
  SELECT query_id, q_u, cent_id FROM (
    SELECT q.vec_id AS query_id, q.u AS q_u, c.cent_id,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY ROUND({_COS_QC}, 6) DESC, c.cent_id) AS prn
    FROM units q CROSS JOIN cents c
    WHERE q.vec_id % {QUERY_MOD} = 0
  ) WHERE prn <= {N_PROBE}
)
SELECT query_id, vec_id, cos_sim, rk FROM (
  SELECT p.query_id, a.vec_id,
         ROUND({dot_sql('p.q_u', 'a.u')}, 6) AS cos_sim,
         row_number() OVER (PARTITION BY p.query_id
                            ORDER BY ROUND({dot_sql('p.q_u', 'a.u')}, 6) DESC, a.vec_id) AS rk
  FROM probes p JOIN assigned a ON p.cent_id = a.cent_id
  WHERE a.vec_id <> p.query_id
) WHERE rk <= {TOP_K}
"""


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both float ANN paths in one driver-checked result, tagged by
    method: ``brute`` (the exactness baseline) and ``ivf`` (the
    float-cosine IVF arm, fan-out salted + explicitly partitioned so
    its sort slabs stay bounded at scale — see q_ann_ivf_cosine).
    The SERVING-scale arm is `unit_ann_ivf_quant`, the e6-integer
    cogroup twin: SCALE.md round 10 measured the pre-fix float shape
    terminated unfinished at 7,063 s on the 2M-vector / 3.21B-pair
    replica where the quant twin finished in 371 s, and round 11
    re-measures the fixed float arm on the same decade — it now
    finishes, but the quant kernel stays materially faster, so
    "scale path" names the QUANT form. Each method's full
    (query_id, vec_id, cos_sim, rk) ranking is value-verified;
    tests/test_ann_recall.py additionally pins the IVF recall floor
    against the brute-force truth."""
    brute = q_ann_topk_cosine(spark, sf_dir).select(
        F.lit("brute").alias("method"), "query_id", "vec_id", "cos_sim", "rk"
    )
    ivf = q_ann_ivf_cosine(spark, sf_dir).select(
        F.lit("ivf").alias("method"), "query_id", "vec_id", "cos_sim", "rk"
    )
    return brute.unionByName(ivf)


ORACLE_ANN_TOPK_TAGGED = f"""
SELECT 'brute' AS method, * FROM ({ORACLE_ANN_TOPK})
UNION ALL
SELECT 'ivf' AS method, * FROM ({ORACLE_ANN_IVF})
"""


# --- exact fixed-point k-means ------------------------------------------

KMEANS_ITERS = 2


def _to_e6(col):
    """Elementwise round-half-away e6 integerization of a double/float
    array — the fixed-point domain where both engines' k-means
    arithmetic is bit-identical."""
    return F.transform(
        col,
        lambda v: (
            F.signum(v.cast("double"))
            * F.floor(F.abs(v.cast("double")) * 1_000_000 + F.lit(0.5))
        ).cast("bigint"),
    )


def _to_e6_expr(col: str) -> str:
    """Spark-SQL string rendering of :func:`_to_e6` — same tree, one
    py4j call (sameSemantics-pinned in tests/test_plans.py)."""
    return (
        f"transform({col}, v -> cast(signum(cast(v as double)) * "
        f"floor(abs(cast(v as double)) * 1000000 + 0.5D) as bigint))"
    )


def _kmeans_assignments(
    spark: SparkSession,
    sf_dir: str,
    vecs: DataFrame | None = None,
    k_cap: int | None = None,
) -> DataFrame:
    """Final (vec_id, cid, dist) assignment of the exact fixed-point
    Lloyd run — shared by the k-means query and the SemDeDup pruner.

    ``vecs`` (vec_id, x: array<bigint>) overrides the default
    e6-integerized raw embeddings — SemDeDup passes e6-integerized
    UNIT vectors so that clustering is spherical (magnitude-blind,
    like its cosine dedup criterion).

    Bit-exact across engines: vectors are scaled to e6 integers
    (round half-away — ±0.53 × 64 dims keeps every squared distance
    far inside bigint), distances and centroid means stay in integer
    arithmetic (means rounded half-away via the 2S+n trick), so after
    a FIXED number of iterations both engines hold identical
    centroids and identical assignments — the same exactness pattern
    as the PageRank op.

    Scale shape per iteration: assignment is a broadcast of K
    centroids against the vector table (narrow, no shuffle of the big
    side) + a map-side-combining ``min(struct(dist, cid))`` argmin —
    the same no-rank-window shape as the IVF assignment (the r4 100×
    OOM fix): partial aggregation collapses the K-expanded rows per
    vector BEFORE the exchange, where the previous per-vector
    row_number window shuffled all |vecs|·K rows. The update is one
    posexplode groupBy (map-side combining, K·dims result rows).
    Initial centroids are the deterministic modular selection."""
    if vecs is None:
        emb = _emb(spark, sf_dir)
        vecs = emb.select("vec_id", _to_e6(F.col("embedding")).alias("x"))
    seed = F.col("vec_id") % CENTROID_MOD == CENTROID_OFF
    if k_cap is not None:
        # pinned-K mode (the k-means OP): K is a model hyperparameter,
        # not a function of corpus size — without the cap the modular
        # selection yields n/50 seeds and the assignment pass is
        # O(n²/50): measured 317 s cold at the 100× replica, 9.0 s
        # with K=256 (SCALE.md round 7). SemDeDup's exact baseline
        # passes k_cap=None (its Σ cluster² accounting is defined on
        # the corpus-growing K) — its scale twin is the two-level
        # q_semantic_dedup_hier below.
        seed = seed & (F.col("vec_id") < CENTROID_MOD * k_cap)
    cents = vecs.filter(seed).select(
        F.col("vec_id").alias("cid"), F.col("x").alias("c")
    )

    def assign(cs: DataFrame) -> DataFrame:
        # The row-local argmax move that won on the IVF float arms
        # (nlist ≤ 64) was MEASURED A NET LOSS here and reverted
        # (round 12): at this op's K (200 at sf0.1, cap 256) the
        # argmin runs as one giant interpreted higher-order-function
        # chain per vector, while this crossJoin form keeps the
        # K-expanded rows inside whole-stage codegen — quiet-box A/B:
        # agg form 3.0–3.5 s cold / 1.17–1.24 s warm vs row-local
        # 4.3–5.0 / 1.19–1.34 on unit_semantic_dedup.
        #
        # Rendered as Spark-SQL strings since round 13 (the r12 py4j
        # pattern extended per VERDICT ask #7): the Lloyd builders
        # cost ~1.3 s of py4j round trips per timed BUILD in the
        # Column-API form; the strings are the literal rendering of
        # the same trees (sameSemantics-pinned in tests/test_plans.py).
        d = vecs.crossJoin(F.broadcast(cs)).selectExpr(
            "*",
            "aggregate(zip_with(x, c, (a, b) -> (a - b) * (a - b)), "
            "cast(0 as bigint), (acc, v) -> acc + v) AS dist",
        )
        # lexicographic min(struct) ≡ (min dist, tie → min cid), the
        # window's ORDER BY dist, cid — but with map-side combine; x
        # is constant per vec_id, so first(x) is deterministic.
        return (
            d.groupBy("vec_id")
            .agg(
                F.expr("min(struct(dist, cid)) AS b"),
                F.expr("first(x) AS x"),
            )
            .selectExpr("vec_id", "b.cid AS cid", "b.dist AS dist", "x")
        )

    a = assign(cents)
    for _ in range(KMEANS_ITERS - 1):
        ex = a.selectExpr("cid", "posexplode(x) AS (pos, val)")
        comp = (
            ex.groupBy("cid", "pos")
            .agg(F.expr("sum(val) AS s"), F.expr("count(*) AS n"))
            .withColumn(
                "m",
                F.expr(
                    "(CASE WHEN s < 0 THEN -1 ELSE 1 END)"
                    " * ((2 * abs(s) + n) DIV (2 * n))"
                ),
            )
        )
        cents = comp.groupBy("cid").agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, m))), "
                "st -> st.m) AS c"
            )
        )
        a = assign(cents)
    return a.select("vec_id", "cid", "dist")


def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact fixed-point Lloyd k-means assignment after
    ``KMEANS_ITERS`` iterations (see ``_kmeans_assignments``)."""
    return _kmeans_assignments(spark, sf_dir, k_cap=KMEANS_K_CAP).select(
        "vec_id", F.col("cid").alias("cluster"), "dist"
    )


#: e6 integerization of an arbitrary double-list SQL expression —
#: DuckDB twin of ``_to_e6``.
def _to_e6_sql(expr: str) -> str:
    return (
        f"list_transform({expr}, e -> "
        "CAST(sign(CAST(e AS DOUBLE)) "
        "* floor(abs(CAST(e AS DOUBLE)) * 1000000 + 0.5) AS BIGINT))"
    )


def _lloyd_ctes(k_cap: int | None = None) -> str:
    """The Lloyd iteration CTE chain; expects a prior CTE
    ``v(vec_id, x: BIGINT[])`` supplying the fixed-point vectors.
    ``k_cap`` mirrors _kmeans_assignments' pinned-K mode."""
    cap_pred = (
        f"\n         AND vec_id < {CENTROID_MOD * k_cap}" if k_cap else ""
    )
    return f"""c0 AS (SELECT vec_id AS cid, x AS c
       FROM v WHERE vec_id % {CENTROID_MOD} = {CENTROID_OFF}{cap_pred}),
d1 AS (
  SELECT v.vec_id, c0.cid, v.x,
         CAST(list_sum(list_transform(generate_series(1, len(v.x)),
              i -> (v.x[i] - c0.c[i]) * (v.x[i] - c0.c[i]))) AS BIGINT) AS dist
  FROM v CROSS JOIN c0
),
a1 AS (SELECT * FROM (
  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk FROM d1
) WHERE rk = 1),
ex AS (SELECT cid, unnest(x) AS val, unnest(generate_series(1, len(x))) AS pos FROM a1),
comp AS (SELECT cid, pos, sum(val) AS s, count(*) AS n FROM ex GROUP BY cid, pos),
c1 AS (
  SELECT cid,
         list(CAST((CASE WHEN s < 0 THEN -1 ELSE 1 END)
              * ((2 * abs(s) + n) // (2 * n)) AS BIGINT) ORDER BY pos) AS c
  FROM comp GROUP BY cid
),
d2 AS (
  SELECT v.vec_id, c1.cid,
         CAST(list_sum(list_transform(generate_series(1, len(v.x)),
              i -> (v.x[i] - c1.c[i]) * (v.x[i] - c1.c[i]))) AS BIGINT) AS dist
  FROM v CROSS JOIN c1
),
a2 AS (SELECT * FROM (
  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk FROM d2
) WHERE rk = 1)"""

ORACLE_KMEANS = f"""
WITH v AS (
  SELECT vec_id, {_to_e6_sql('embedding')} AS x FROM embeddings
),
{_lloyd_ctes(KMEANS_K_CAP)}
SELECT vec_id, cid AS cluster, dist FROM a2
"""


# --- int8 scalar quantization ------------------------------------------

def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization of the embedding column —
    the 4× storage/bandwidth reduction step before writing a vector
    corpus out for serving. Per vector: scale = max|x| / 127,
    q_i = sign(x_i) · floor(|x_i| / scale + 0.5) (explicit
    half-away-from-zero — spelled out so neither engine's ``round``
    dialect is in play). Narrow map, no shuffle.

    Driver surface: the int8 vector serialized with ``,`` plus the
    reconstruction scale and a max-abs-error check column; the
    array-typed form is what a sink would write."""
    emb = _emb(spark, sf_dir)
    x = F.col("embedding")
    # floor on the all-zero vector's 0/0 would be NaN (engine-divergent
    # under ANSI casts) — the epsilon floor maps it to qi = 0 instead.
    scale = F.greatest(
        F.aggregate(
            x, F.lit(0.0), lambda acc, v: F.greatest(acc, F.abs(v.cast("double")))
        )
        / F.lit(127.0),
        F.lit(1e-30),
    )
    q = F.transform(
        x,
        lambda v: (
            F.signum(v.cast("double"))
            * F.floor(F.abs(v.cast("double")) / F.col("q_scale") + F.lit(0.5))
        ).cast("bigint"),
    )
    max_err = F.array_max(
        F.zip_with(
            x,
            F.col("q_int8"),
            lambda v, qi: F.abs(v.cast("double") - qi * F.col("q_scale")),
        )
    )
    # max_err must see the UNROUNDED scale: a same-select-list
    # `round(...).alias("q_scale")` would shadow the input column via
    # lateral column alias resolution, skewing the error by ~1e-8.
    return (
        emb.withColumn("q_scale", scale)
        .withColumn("q_int8", q)
        .withColumn("max_abs_err", F.round(max_err, 9))
        .select(
            "vec_id",
            F.round("q_scale", 9).alias("q_scale"),
            F.concat_ws(",", F.col("q_int8").cast("array<string>")).alias("q_str"),
            "max_abs_err",
        )
    )


ORACLE_EMBED_QUANTIZE = """
WITH e AS (
  SELECT vec_id,
         list_transform(embedding, v -> CAST(v AS DOUBLE)) AS x,
         greatest(list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) / 127.0,
                  1e-30) AS q_scale
  FROM embeddings
),
q AS (
  SELECT vec_id, x, q_scale,
         list_transform(x, v -> CAST(sign(v) * floor(abs(v) / q_scale + 0.5) AS BIGINT)) AS qi
  FROM e
)
SELECT vec_id,
       ROUND(q_scale, 9) AS q_scale,
       array_to_string(qi, ',') AS q_str,
       ROUND(list_max(list_transform(list_zip(x, qi),
                                     p -> abs(p[1] - p[2] * q_scale))), 9) AS max_abs_err
FROM q
"""


# --- random-hyperplane (SRP) LSH ANN ------------------------------------

# 256 buckets; with radius-1 multi-probe the scan fraction is
# (LSH_BITS+1)/2^LSH_BITS ≈ 3.5% of the corpus. Chosen from a measured
# (bits × probe-radius) sweep on the sf0.01 fixture + planted near-dups:
#
#   bits=4 r=1: strong 1.00  bg-recall@10 0.50  fan-out 31%
#   bits=6 r=1: strong 1.00  bg-recall@10 0.34  fan-out 12%
#   bits=8 r=1: strong 1.00  bg-recall@10 0.20  fan-out  4%   <- knee
#   bits=8 r=2: strong 1.00  bg-recall@10 0.42  fan-out 15%
#
# "strong" = recall over neighbors with cos ≥ 0.9 (the planted twins —
# the near-dup regime an LSH index serves); "bg" = recall@10 over the
# near-uniform background, which for EVERY config ≈ its scan fraction:
# sublinear probing cannot beat random coverage when the "neighbors"
# are barely above background similarity (SRP bit-agreement p =
# 1 - θ/π ≈ 0.63 at cos 0.4). That regime belongs to the brute/IVF
# paths; this index exists to catch high-cos duplicates cheaply.
# At corpus scale, grow bits ≈ log2(n / target_bucket_size).
LSH_BITS = 8
LSH_STRONG_COS = 0.9  # twins above this must be retrieved (pinned test)


def _srp_hyperplanes(bits: int = LSH_BITS, dims: int = 64) -> list[list[int]]:
    """Deterministic integer hyperplanes for signed-random-projection
    LSH (Charikar 2002): component (i, j) is the first 4 hex chars of
    md5("rp|i|j") minus 32768 — a fixed pseudo-random integer in
    [-32768, 32767]. Computed ONCE in Python and embedded as literals
    in both engines (the runtime does integer dot products only, no
    per-row hashing); with e6-integerized unit vectors every sign is
    an exact integer comparison, so bucket codes are engine-exact."""
    import hashlib

    return [
        [
            int(hashlib.md5(f"rp|{i}|{j}".encode()).hexdigest()[:4], 16) - 32768
            for j in range(dims)
        ]
        for i in range(bits)
    ]


def q_ann_lsh_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe SRP-LSH search over the planted near-dup corpus:
    every vector gets a ``LSH_BITS``-bit bucket code (sign of its dot
    with each fixed hyperplane); each query ranks the vectors in its
    own bucket AND the ``LSH_BITS`` Hamming-1 neighbors (one
    hyperplane voting the other way — the standard multi-probe trade:
    ×(bits+1) probes instead of ×(bits+1) hash tables). cos(q, v)
    high ⇒ few separating hyperplanes ⇒ candidate with high
    probability — the hash-join alternative to IVF's centroid probing
    (no training pass, pure narrow map + one equi-join on the code).

    The corpus is the embeddings fixture plus the deterministic
    planted duplicates shared with ``suite.dedup`` (×2-scaled copies
    at +1M — cos exactly 1, IDENTICAL bucket code since scaling
    preserves every sign — and one-dim perturbations at +2M, cos ≈
    0.998, ≤ 1 expected bit flip → covered by the Hamming-1 probes).
    Every query's strong neighbors (cos ≥ ``LSH_STRONG_COS``) are
    retrieved at a ~3.5% scan fraction — the measured sweep behind the
    (bits, radius) choice is tabled above ``LSH_BITS``;
    tests/test_ann_recall.py pins the strong-recall floor.

    Results are approximate by design; the oracle runs the identical
    LSH, so the check is still hash-exact."""
    from .dedup import _vecs_with_planted_dups

    planes = _srp_hyperplanes()
    vecs = _vecs_with_planted_dups(spark, sf_dir).select(
        "vec_id", "embedding", l2_norm(F.col("embedding")).alias("__nrm")
    )
    u = spread(vecs).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double") / F.col("__nrm")).alias("u"),
    )
    xu = u.select("vec_id", "u", _to_e6(F.col("u")).alias("x"))

    def bucket(xcol) -> F.Column:
        code = F.lit(0)
        for i, plane in enumerate(planes):
            dot_i = F.aggregate(
                F.zip_with(xcol, F.array(*[F.lit(c) for c in plane]), lambda a, b: a * b),
                F.lit(0).cast("bigint"),
                lambda acc, v: acc + v,
            )
            code = code + F.when(dot_i >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        return code

    coded = xu.select("vec_id", "u", bucket(F.col("x")).alias("bucket"))
    probes = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(LSH_BITS)],
    )
    queries = (
        coded.filter(
            (F.col("vec_id") % QUERY_MOD == 0) & (F.col("vec_id") < 1_000_000)
        )
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("u").alias("q_u"),
            F.explode(probes).alias("bucket"),
        )
    )
    scored = (
        queries.join(coded, "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(dot(F.col("q_u"), F.col("u")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "vec_id")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= TOP_K)
    )


def _oracle_ann_lsh() -> str:
    from .dedup import ALL_VECS_CTE

    planes = _srp_hyperplanes()
    bucket_terms = " + ".join(
        "(CASE WHEN CAST(list_sum(list_transform(generate_series(1, len(x)), "
        f"j -> x[j] * ([{', '.join(str(c) for c in plane)}])[j])) AS BIGINT) >= 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i, plane in enumerate(planes)
    )
    cos_qv = dot_sql("q.q_u", "v.u")
    probe_list = ", ".join(
        ["bucket"] + [f"xor(bucket, {1 << i})" for i in range(LSH_BITS)]
    )
    return f"""
WITH {ALL_VECS_CTE},
units AS (SELECT vec_id, {unit_sql('embedding')} AS u FROM all_vecs),
xu AS (SELECT vec_id, u, {_to_e6_sql('u')} AS x FROM units),
coded AS (SELECT vec_id, u, {bucket_terms} AS bucket FROM xu),
probes AS (
  SELECT vec_id AS query_id, u AS q_u,
         unnest([{probe_list}]) AS bucket
  FROM coded WHERE vec_id % {QUERY_MOD} = 0 AND vec_id < 1000000
)
SELECT query_id, vec_id, cos_sim, rk FROM (
  SELECT q.query_id, v.vec_id,
         ROUND({cos_qv}, 6) AS cos_sim,
         row_number() OVER (PARTITION BY q.query_id
                            ORDER BY ROUND({cos_qv}, 6) DESC, v.vec_id) AS rk
  FROM probes q JOIN coded v ON q.bucket = v.bucket AND v.vec_id <> q.query_id
) WHERE rk <= {TOP_K}
"""


# --- contrastive pair mining (positives + hard negatives) ---------------

def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive training-pair mining over the labeled embeddings:
    for each anchor (the deterministic query subset), the most similar
    SAME-label vector (positive) and the most similar OTHER-label
    vector (hard negative) — the standard triplet construction for
    embedding-model training; hard negatives are exactly the
    highest-cosine wrong-label neighbors.

    Plan: one broadcast of the tiny anchor set against the corpus
    (same shape as the ANN baseline), then ONE map-side-combining
    aggregation per anchor: the best same-label and best other-label
    neighbors are two conditional ``max(struct(cos, −id, id))``
    aggregates (lexicographic max ≡ highest cosine, tie → smallest
    id), so the scored rows collapse BEFORE the exchange and no rank
    window or pos⋈neg self-join exists — the r4 no-rank-window
    argmax shape. At corpus scale the anchor side stays broadcast and
    the scored side is the candidate set of any ANN index (IVF cell
    or LSH bucket) instead of the full corpus — the mining step
    itself is unchanged."""
    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", "embedding", "label", l2_norm(F.col("embedding")).alias("__nrm")
    )
    u = spread(emb).select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double") / F.col("__nrm")).alias("u"),
    )
    anchors = u.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("a_label"),
        F.col("u").alias("a_u"),
    )
    scored = (
        u.crossJoin(F.broadcast(anchors))
        .filter(F.col("vec_id") != F.col("anchor_id"))
        .select(
            "anchor_id",
            "a_label",
            "vec_id",
            (F.col("label") == F.col("a_label")).alias("same"),
            F.round(dot(F.col("a_u"), F.col("u")), 6).alias("cos_sim"),
        )
    )
    pick = F.struct(
        F.col("cos_sim").alias("c"),
        (-F.col("vec_id")).alias("m"),
        F.col("vec_id").alias("i"),
    )
    best = scored.groupBy("anchor_id").agg(
        F.max(F.when(F.col("same"), pick)).alias("p"),
        F.max(F.when(~F.col("same"), pick)).alias("n"),
    )
    # the window+join form inner-joined pos and neg, dropping anchors
    # missing either slot — mirror that with the two not-null filters
    return best.filter(
        F.col("p").isNotNull() & F.col("n").isNotNull()
    ).select(
        "anchor_id",
        F.col("p.i").alias("positive_id"),
        F.col("p.c").alias("positive_cos"),
        F.col("n.i").alias("hard_negative_id"),
        F.col("n.c").alias("hard_negative_cos"),
    )


def _oracle_hard_negatives() -> str:
    cos_av = dot_sql("a.u", "v.u")
    return f"""
WITH units AS (
  SELECT vec_id, label, {unit_sql('embedding')} AS u FROM embeddings
),
scored AS (
  SELECT a.vec_id AS anchor_id, v.vec_id,
         (v.label = a.label) AS same,
         ROUND({cos_av}, 6) AS cos_sim
  FROM units a JOIN units v ON v.vec_id <> a.vec_id
  WHERE a.vec_id % {QUERY_MOD} = 0
),
best AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY anchor_id, same
                                 ORDER BY cos_sim DESC, vec_id) AS rk
    FROM scored
  ) WHERE rk = 1
)
SELECT p.anchor_id,
       p.vec_id AS positive_id, p.cos_sim AS positive_cos,
       n.vec_id AS hard_negative_id, n.cos_sim AS hard_negative_cos
FROM best p JOIN best n ON p.anchor_id = n.anchor_id
WHERE p.same AND NOT n.same
"""


# --- SemDeDup: semantic dedup via cluster-then-prune --------------------

SEMDEDUP_TAU = 0.98  # rounded-cosine dup threshold, as dedup_embedding


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    embedding space, then search for near-duplicate pairs ONLY within
    each cluster and keep one representative per duplicate group —
    the scale path for semantic dedup, because the pair space is
    Σ cluster² instead of corpus². Pipeline: unit-normalize →
    e6-integerize → exact fixed-point Lloyd (spherical k-means:
    clustering unit vectors makes cluster membership magnitude-blind,
    matching the cosine dup criterion — a scaled copy lands in
    exactly its source's cluster) → within-cluster cosine ≥ τ →
    keep = the smallest vec_id of each dup neighborhood (the paper
    keeps one arbitrary exemplar; smallest-id is the deterministic
    choice both engines agree on).

    Corpus: the planted-dup set from dedup.py (scaled copies cos=1,
    one-dim perturbations cos≈1) — raw fixture embeddings have no
    natural near-dups (max within-cluster cos ≈ 0.49).

    Scale: the Lloyd phase is the k-means plan (broadcast centroids,
    narrow assignment); the prune join is per-cluster with fan-out
    bounded by cluster sizes — no global pair space, no LSH needed
    when a clustering already exists (it usually does in a curation
    pipeline, for mixing/balancing)."""
    from .dedup import _vecs_with_planted_dups

    vecs = _vecs_with_planted_dups(spark, sf_dir)
    # Same IEEE normalization pipeline as _unit_emb (norm behind the
    # spread exchange so the fold isn't inlined per element). SQL
    # strings since round 13 (same py4j-cut + sameSemantics-pin
    # pattern as _unit_emb).
    withn = vecs.selectExpr(
        "vec_id", "embedding", f"{l2_norm_expr('embedding')} AS __nrm"
    )
    u = spread(withn).selectExpr(
        "vec_id", "transform(embedding, x -> cast(x as double) / __nrm) AS u"
    )
    xu = u.selectExpr("vec_id", f"{_to_e6_expr('u')} AS x")
    a = _kmeans_assignments(spark, sf_dir, vecs=xu)
    # pin: `au` (and through it the whole Lloyd DAG) feeds BOTH sides
    # of the within-cluster self-join AND the final result join —
    # unpinned, the 2-iteration fixed point replicated three times in
    # one 1,600-line plan (round-7 plan audit). One assignment pass,
    # read three times.
    au = pin(a.join(u, "vec_id").select("vec_id", "cid", "u"))
    return _semdedup_from_assignments(au)


def _semdedup_from_assignments(au: DataFrame) -> DataFrame:
    """The SemDeDup pair/keep tail, shared by the exact Lloyd form and
    the two-level hierarchical scale path: within-cluster cosine ≥ τ
    pairs → per-id neighbor stats → keep = no smaller-id neighbor.
    ``au`` = (vec_id, cid, u) with u unit-normalized."""
    left = au.selectExpr("vec_id AS id_a", "cid", "u AS ua")
    right = au.selectExpr("vec_id AS id_b", "cid", "u AS ub")
    # Each UNORDERED pair's dot is computed once (id_a < id_b halves
    # the join output and the 64-dim folds vs the old id_a != id_b
    # form), then exploded into both directions for the per-id
    # neighbor stats — value-identical because cos is exactly
    # symmetric here: zip_with preserves element order and per-element
    # multiplication commutes, so the fold is bitwise the same.
    # (SQL strings since round 13 — same py4j-cut pattern as the
    # Lloyd builders; sameSemantics-pinned in tests/test_plans.py.)
    upairs = (
        left.join(right, "cid")
        .filter(F.col("id_a") < F.col("id_b"))
        .selectExpr(
            "id_a", "id_b", f"round({dot_expr('ua', 'ub')}, 6) AS cos"
        )
        .filter(F.col("cos") >= SEMDEDUP_TAU)
    )
    pairs = upairs.selectExpr(
        "explode(array(struct(id_a AS p, id_b AS q), "
        "struct(id_b AS p, id_a AS q))) AS e"
    ).selectExpr("e.p AS id_a", "e.q AS id_b")
    agg = pairs.groupBy("id_a").agg(
        F.expr("count(*) AS n_dups"),
        F.expr("max(cast(id_b < id_a as int)) AS has_smaller"),
    )
    return (
        au.join(agg, au.vec_id == agg.id_a, "left")
        .selectExpr(
            "vec_id",
            "cid AS cluster",
            "cast(coalesce(n_dups, 0) as bigint) AS n_dups",
            "(coalesce(has_smaller, 0) = 0) AS keep",
        )
    )


def _semdedup_tail_sql() -> str:
    """SQL twin of _semdedup_from_assignments — expects a prior CTE
    ``au(vec_id, cid, u)``; shared by the exact and hierarchical
    oracles so the keep-rule text cannot diverge."""
    cos_ab = dot_sql("a.u", "b.u")
    return f"""pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, ROUND({cos_ab}, 6) AS cos
  FROM au a JOIN au b ON a.cid = b.cid AND a.vec_id <> b.vec_id
  WHERE ROUND({cos_ab}, 6) >= {SEMDEDUP_TAU}
),
agg AS (
  SELECT id_a, count(*) AS n_dups,
         max(CASE WHEN id_b < id_a THEN 1 ELSE 0 END) AS has_smaller
  FROM pairs GROUP BY id_a
)
SELECT au.vec_id, au.cid AS cluster,
       COALESCE(agg.n_dups, 0) AS n_dups,
       COALESCE(agg.has_smaller, 0) = 0 AS keep
FROM au LEFT JOIN agg ON au.vec_id = agg.id_a"""


def _oracle_semantic_dedup() -> str:
    from .dedup import ALL_VECS_CTE

    return f"""
WITH {ALL_VECS_CTE},
units AS (SELECT vec_id, {unit_sql('embedding')} AS u FROM all_vecs),
v AS (SELECT vec_id, {_to_e6_sql('u')} AS x FROM units),
{_lloyd_ctes()},
au AS (SELECT a2.vec_id, a2.cid, units.u FROM a2 JOIN units USING (vec_id)),
{_semdedup_tail_sql()}
"""


# Coarse-cell count for the hierarchical SemDeDup router. 256 coarse
# cells bound the vector-routing pass at n x 256 regardless of corpus
# size; the fine seed set keeps GROWING with the corpus (~n/50 — the
# SemDeDup regime: cluster sizes stay ~50, so the within-cluster pair
# space stays LINEAR in n), and each vector does its exact fine argmin
# only against the ~K/256 fine seeds routed to its coarse cell.
SEMDEDUP_COARSE_CAP = _geo("SEMDEDUP_COARSE", 256)

# Fine seeds are a 1-in-50 md5-HASH row sample (substr(md5(id),1,4) <
# '051f' == 1311/65536 ≈ 1/50.0), NOT the id-mod rule the capped IVF
# index uses (CENTROID_MOD above). The difference matters only for
# the UNCAPPED seed set: the round-8 slope study caught the id-mod
# rule going quadratic on the replica fixture because its key offset
# (10,000,000) is divisible by 50, so every replica of an original
# aliases into the SAME residue class — the "1-in-50" sample yielded
# 50 near-identical copies of 1-in-2500 distinct directions, one copy
# won the argmin for its whole neighborhood, and the within-cell pair
# space blew up to Σc² = 126M at the 100× replica (41.7 s warm, vs
# 1.2 s at 10×). Hashing the id breaks ANY id structure correlated
# with the data, and row-sampling is self-normalizing under
# duplication: a dup-dense region holds proportionally more rows, so
# it gets proportionally more seeds and its cells stay ~50. Same
# hex-prefix idiom as the MinHash estimator sample (dedup.py) —
# md5-of-string is bit-identical in Spark and DuckDB, so the oracle
# stays full-strength. The capped IVF rules keep id-mod: with a FIXED
# nlist, seed skew moves recall (gated by tests/test_ann_recall.py),
# not the cost class.
SEMDEDUP_SEED_HEX = "051f"


def q_semantic_dedup_hier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical SemDeDup — the SCALE PATH twin of
    unit_semantic_dedup (which stays the exact-Lloyd certification
    baseline). The exact form's two cost terms cannot both stay
    sub-quadratic with a FLAT assignment: corpus-growing K makes
    Lloyd assignment n·K = O(n²/50) (measured 317 s cold at the 100×
    replica), while pinning K makes the within-cluster pair space
    Σc² = O(n²/K) (measured 137M pairs / 112 s of pair-dots at K→40
    effective). The two-level router bounds both, the same
    coarse-quantizer idea as IVF (Jégou et al. 2011) applied to
    centroid search (Sivic & Zisserman's vocabulary-tree lineage):

    1. fine seeds  = 1-in-50 md5-hash row sample (UNCAPPED — K ∝ n,
       clusters ~50; hash-not-mod so no id structure can collapse the
       seed directions, see SEMDEDUP_SEED_HEX)
    2. coarse seeds = the 256 md5-smallest fine seeds (the IVF cap
       rule; a 256-row TakeOrdered over the seed table, not a sort)
    3. each fine seed routes to its nearest coarse seed (K×256, tiny)
    4. each vector routes to its nearest coarse seed (n×256 broadcast,
       map-side min(struct) argmin), then takes its exact argmin over
       ONLY the ~K/256 fine seeds in that coarse cell
    5. pair/keep tail identical to the exact form (shared helper)

    COST MODEL (stated honestly after the round-8 slope study): with
    C coarse cells and K ≈ n/50 fine seeds, routing work is
    n·C (step 4a) + n·K/C (step 4b) + K·C (step 3) and the pair tail
    is Σc² ≈ 50n. At FIXED C the 4b term is n²/(50C) — formally
    quadratic, but its constant keeps it below the linear n·C term
    until K = C² (n = 50·C², ≈3.3M vectors at the default C=256), so
    the operator is linear-class throughout the geometry it is sized
    for, and the balance rule for a bigger corpus is the standard IVF
    sizing C ≈ √K (set SPARK_GRAFT_SEMDEDUP_COARSE; per-vector
    routing work then grows as 2√(n/50) — sub-linear per vector,
    O(n^1.5) total, the same asymptotic every flat-centroid-scan IVF
    accepts). The measured 3-point slope (sf0.1/sf1/sf10) is in
    SCALE.md §Round-8.

    One-shot Voronoi on the seed vectors (no Lloyd iterations): every
    step is a pure function of the data, so DuckDB replays the whole
    routing bit-exactly — the oracle is full-strength, not rows-only.
    The price vs exact is boundary misses: a dup pair can straddle
    two fine cells (inherent to SemDeDup itself) or, additionally, two
    coarse cells; planted scaled copies are IMMUNE (identical unit
    vectors route identically — pinned by test_ann_recall), and the
    measured recall vs the exact baseline is the acceptance gate."""
    from .dedup import _vecs_with_planted_dups

    return semantic_dedup_hier_frame(_vecs_with_planted_dups(spark, sf_dir))


#: kernel memo for _nearest_seed_arrow (VERDICT r8 ask #5) — keyed by
#: seed fingerprint, capped to the last 8 geometries
_NEAREST_KERNEL_MEMO: dict = {}


def _stack_int64(vecs: list) -> tuple[np.ndarray, np.ndarray]:
    """(idx, M): positions of the fully-non-null vectors in ``vecs``
    and their stacked int64 matrix — the vectorized null-routing
    guard shared by the Arrow vector kernels (ADVICE r8). A null
    vector arrives as a None row; a null ELEMENT (a zero-norm
    embedding normalizes to null) promotes the whole Arrow chunk to
    float64 with NaN, so the isnan scan only runs on float chunks and
    a clean batch stacks zero-copy to int64 (e6 coords ≤1.4e6
    roundtrip float64 exactly)."""
    notnull = np.array([v is not None for v in vecs], dtype=bool)
    sub = [v for v in vecs if v is not None]
    M = np.asarray(sub) if sub else np.empty((0, 1), dtype=np.int64)
    good = (
        ~np.isnan(M).any(axis=1)
        if M.dtype.kind == "f"
        else np.ones(len(sub), dtype=bool)
    )
    return np.flatnonzero(notnull)[good], M[good].astype(np.int64, copy=False)


def _nearest_seed_arrow(
    seeds: DataFrame, id_col: str, vec_col: str, _chunk: int | None = None
):
    """Exact nearest-seed assignment as a vectorized Arrow kernel:
    returns a pandas_udf mapping an e6-int64 vector column to the id
    of its nearest seed (squared L2, ties to the smallest id — the
    bit-exact contract min(struct(d, id)) / the oracle's
    row_number(ORDER BY d, id) both share).

    ``seeds`` must be a CAPPED seed table (index metadata, ≤ a few
    thousand rows — the coarse quantizer, never a corpus-sized
    frame); it is collected to the driver exactly like MLlib collects
    k-means centroids, and shipped to executors inside the UDF
    closure. All arithmetic is int64: |coord| ≤ ~1.4e6, per-dim
    product ≤ ~2e12, 64-dim dot ≤ ~1.3e14, and the expanded form
    x·x + c·c − 2x·c ≤ ~5e14 — far inside int64, so numpy reproduces
    the SQL engines' integer sqdist bit-for-bit. argmin's
    first-occurrence rule lands on the smallest id because the seed
    matrix is sorted by id."""
    rows = sorted(seeds.collect(), key=lambda r: r[id_col])
    if not rows:
        # Empty seed table (possible on small corpora: the md5 1-in-50
        # sample can select nothing). Mirror the SQL argmin-over-empty
        # semantics the pre-Arrow form had: every vector routes to
        # NULL, so the downstream equi-join drops it and the operator
        # degrades to an empty result instead of crashing on a 0-row
        # numpy reduction (ADVICE r8).
        @F.pandas_udf("bigint")
        def no_seed(xs: pd.Series) -> pd.Series:
            return pd.Series([None] * len(xs), dtype="object")

        return no_seed
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    C = np.array([list(r[vec_col]) for r in rows], dtype=np.int64)
    # Memoize the built kernel on the SEED-TABLE FINGERPRINT (VERDICT
    # r8 ask #5): a pandas UDF embeds the Python function's identity
    # in the plan, so two builds over identical seeds used to produce
    # plans CacheManager could not unify — scale100's warm pass
    # re-executed the whole routing instead of hitting the pinned
    # `au`. Returning the SAME function object for the same
    # (ids, vectors, chunk) makes the rebuilt plan canonicalize equal
    # to the cached one. Bounded: the memo holds the last few
    # geometries only (seed tables are capped index metadata).
    memo_key = (ids.tobytes(), C.tobytes(), _chunk)
    hit = _NEAREST_KERNEL_MEMO.pop(memo_key, None)
    if hit is not None:
        # re-insert so a HIT refreshes recency (dict order = LRU order
        # for the eviction below)
        _NEAREST_KERNEL_MEMO[memo_key] = hit
        return hit
    c2 = (C * C).sum(axis=1)

    # Per-chunk rows so the b×|seeds| distance matrix stays ~32 MB
    # regardless of the SEMDEDUP_COARSE override (a 65536-cell
    # geometry would otherwise build a multi-GB intermediate per
    # Arrow batch). Chunking changes memory only — every row's argmin
    # is computed over the full seed matrix either way (``_chunk``
    # exists so tests can force the chunked path with few seeds).
    chunk = _chunk or max(1, (1 << 22) // max(len(ids), 1))

    def _argmin_ids(X: np.ndarray) -> np.ndarray:
        out = np.empty(len(X), dtype=np.int64)
        for i in range(0, len(X), chunk):
            Xi = X[i : i + chunk]
            d2 = (Xi * Xi).sum(axis=1)[:, None] + c2[None, :] - 2 * (Xi @ C.T)
            out[i : i + chunk] = ids[d2.argmin(axis=1)]
        return out

    @F.pandas_udf("bigint")
    def nearest(xs: pd.Series) -> pd.Series:
        if len(xs) == 0:
            return pd.Series([], dtype="int64")
        vecs = xs.tolist()
        # Null-routing (ADVICE r8): the pre-Arrow SQL argmin
        # propagated NULL to the join, which dropped the row —
        # reproduce that via the shared vectorized guard.
        idx, M = _stack_int64(vecs)
        if len(idx) == len(vecs):
            return pd.Series(_argmin_ids(M))
        out = pd.array([None] * len(vecs), dtype="Int64")
        if len(idx):
            out[idx] = _argmin_ids(M)
        return pd.Series(out, dtype="Int64")

    # LRU eviction (ADVICE r9): drop only the OLDEST geometry — a
    # wholesale clear() made a workload alternating >8 geometries
    # thrash and silently lose the plan-cache unification the memo
    # exists for. Python dicts iterate in insertion order, so the
    # first key is the least recently built.
    while len(_NEAREST_KERNEL_MEMO) >= 8:
        _NEAREST_KERNEL_MEMO.pop(next(iter(_NEAREST_KERNEL_MEMO)))
    _NEAREST_KERNEL_MEMO[memo_key] = nearest
    return nearest


def semantic_dedup_hier_frame(vecs: DataFrame) -> DataFrame:
    """The hierarchical SemDeDup routing over ANY (vec_id, embedding)
    frame — the reusable corpus-scale operator behind the
    q_semantic_dedup_hier spec (which runs it on the planted-dup
    fixture corpus). The curation pipeline's ``semantic_dedup`` stage
    calls this on the raw embeddings table. Returns one row per
    vector: (vec_id, cluster, n_dups, keep)."""
    withn = vecs.select(
        "vec_id", "embedding", l2_norm(F.col("embedding")).alias("__nrm")
    )
    # pin: the normalized corpus feeds three consumers (the quantized
    # routing side twice — seed filter + vector scoring — and the
    # final au join); unpinned, the union+spread+normalize prep
    # (measured 4.1 s of sf10's cold) re-runs per consumer.
    # Normalize-once is also the documented 100 TB shape (the RAG
    # chunk index materializes its unit vectors the same way).
    u = pin(
        spread(withn).select(
            "vec_id",
            F.transform(
                "embedding", lambda x: x.cast("double") / F.col("__nrm")
            ).alias("u"),
        )
    )
    xu = u.select("vec_id", _to_e6(F.col("u")).alias("x"))
    mk = F.md5(F.col("vec_id").cast("string"))
    # pin: fine feeds f2c plus both TakeOrdered coarse consumers —
    # seed-table-sized (~n/50), so the pin is cheap and saves two
    # recomputes of the full-corpus normalize+quantize scan.
    fine = pin(
        xu.filter(F.substring(mk, 1, 4) < F.lit(SEMDEDUP_SEED_HEX)).select(
            F.col("vec_id").alias("fcid"), F.col("x").alias("fx"), mk.alias("mk")
        )
    )
    coarse = (
        fine.orderBy("mk", "fcid")
        .limit(SEMDEDUP_COARSE_CAP)
        .select(F.col("fcid").alias("ccid"), F.col("fx").alias("cx"))
    )

    def _sqdist(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        )

    def _argmin(cells, x, id_field, vec_field):
        """id of the cell nearest to x: array_min over struct(d, id)
        ≡ min(struct(d, id)) — smallest distance, ties to smallest
        id. Evaluated INSIDE one projection per row, so the n-vector
        routing passes below are plain narrow maps: no per-candidate
        row fan-out, no hash-agg, no shuffle (round-8 rewrite — the
        fan-out form spent 37.5 s of sf10's cold on 26M intermediate
        rows; this form re-reads as a single codegen'd projection)."""
        return F.array_min(
            F.transform(
                cells,
                lambda c: F.struct(
                    _sqdist(c[vec_field], x).alias("d"), c[id_field].alias("id")
                ),
            )
        )["id"]

    # Coarse scoring (the n×C pass) runs as an exact-int64 Arrow
    # kernel, not a SQL higher-order function: transform/aggregate
    # lambdas execute INTERPRETED (outside whole-stage codegen) at a
    # measured ~2M element-ops/core/s — 9.7 s for sf10's 1.7B ops —
    # while one numpy int64 matmul per Arrow batch does the same
    # exact arithmetic in ~1/10th the time. The coarse table is
    # CAPPED index metadata (≤SEMDEDUP_COARSE_CAP rows): collecting
    # it to the driver is the MLlib-k-means-centroid pattern, the
    # documented exception to the no-collect rule — the n-row corpus
    # side never leaves executors. Everything stays exact: e6 int64
    # coords, int64 products (≤~5e14, no overflow), and argmin's
    # first-min tie-break over id-sorted seeds ≡ min(struct(d, id)),
    # so the DuckDB oracle is untouched.
    nearest_coarse = _nearest_seed_arrow(coarse, "ccid", "cx")
    # fine seed -> coarse cell (K seeds × C, trivially small)
    f2c = fine.select("fcid", nearest_coarse(F.col("fx")).alias("ccid"), "fx")
    # vector -> coarse cell (n×C dots, one Arrow-batched projection)
    v2c = xu.select("vec_id", nearest_coarse(F.col("x")).alias("ccid"), "x")
    # exact fine argmin WITHIN the coarse cell: per-cell seed lists
    # (the IVF posting list of centroids — ~K/256 entries each, ~√K
    # under the documented C≈√K sizing) broadcast-joined on ccid, so
    # the n-row pass again stays narrow: n × ~K/256 dots, zero fan-out
    cell_seeds = f2c.groupBy("ccid").agg(
        F.sort_array(F.collect_list(F.struct("fcid", "fx"))).alias("seeds")
    )
    a = v2c.join(F.broadcast(cell_seeds), "ccid").select(
        "vec_id", _argmin(F.col("seeds"), F.col("x"), "fcid", "fx").alias("cid")
    )
    au = pin(a.join(u, "vec_id").select("vec_id", "cid", "u"))
    return _semdedup_from_assignments(au)


def _oracle_semantic_dedup_hier() -> str:
    from .dedup import ALL_VECS_CTE

    sqd = (
        "CAST(list_sum(list_transform(generate_series(1, len({a})), "
        "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))) AS BIGINT)"
    )
    return f"""
WITH {ALL_VECS_CTE},
units AS (SELECT vec_id, {unit_sql('embedding')} AS u FROM all_vecs),
v AS (SELECT vec_id, {_to_e6_sql('u')} AS x FROM units),
fine AS (SELECT vec_id AS fcid, x AS fx, md5(CAST(vec_id AS VARCHAR)) AS mk
         FROM v
         WHERE substr(md5(CAST(vec_id AS VARCHAR)), 1, 4) < '{SEMDEDUP_SEED_HEX}'),
coarse AS (SELECT fcid AS ccid, fx AS cx FROM fine
           ORDER BY mk, fcid LIMIT {SEMDEDUP_COARSE_CAP}),
f2c AS (SELECT fcid, ccid, fx FROM (
  SELECT fine.fcid, coarse.ccid, fine.fx,
         row_number() OVER (PARTITION BY fine.fcid
            ORDER BY {sqd.format(a='fine.fx', b='coarse.cx')}, coarse.ccid) AS rk
  FROM fine CROSS JOIN coarse) WHERE rk = 1),
v2c AS (SELECT vec_id, ccid, x FROM (
  SELECT v.vec_id, coarse.ccid, v.x,
         row_number() OVER (PARTITION BY v.vec_id
            ORDER BY {sqd.format(a='v.x', b='coarse.cx')}, coarse.ccid) AS rk
  FROM v CROSS JOIN coarse) WHERE rk = 1),
a2 AS (SELECT vec_id, cid FROM (
  SELECT v2c.vec_id, f2c.fcid AS cid,
         row_number() OVER (PARTITION BY v2c.vec_id
            ORDER BY {sqd.format(a='v2c.x', b='f2c.fx')}, f2c.fcid) AS rk
  FROM v2c JOIN f2c USING (ccid)) WHERE rk = 1),
au AS (SELECT a2.vec_id, a2.cid, units.u FROM a2 JOIN units USING (vec_id)),
{_semdedup_tail_sql()}
"""


# --- RAG-shaped chunk retrieval --------------------------------------------

RAG_QUERY_MOD = 50
RAG_TOP_K = 3
# IVF serving layer over the chunk index: centroid cells are the
# whole-document vectors of every 20th document (capped — nlist is a
# fixed index parameter, not a function of corpus size; cf.
# CENTROID_CAP above), each chunk is assigned to its nearest cell
# once at index-build time, and a query probes only its nprobe
# nearest cells. 25 cells at sf0.01, 64 from sf0.1 up.
RAG_CENT_MOD = 20
RAG_CENT_OFF = 3
RAG_CENT_CAP = _geo("RAG_NLIST", 64)
# nprobe sweep at sf0.001 (25 cells, recall vs the brute truth):
#   nprobe  scan%  mean recall@3  strong recall (cos>=0.9)
#     2       8%      0.533            0.857
#     3      12%      0.633            0.929   <- chosen
#     4      16%      0.733            0.929
# Background recall tracks scan fraction on the near-uniform fixture
# vectors (same regime as SRP-LSH — see LSH_BITS note); the served
# high-cos regime is what the floor pins (tests/test_ann_recall.py).
RAG_N_PROBE = _geo("RAG_NPROBE", 3)
# Redundant assignment: each chunk is indexed in its top-RAG_ASSIGN
# cells (the standard IVF boundary-straddle fix — a 0.9-cos neighbor
# sitting just across a Voronoi edge from the query's probed cells is
# otherwise unreachable at ANY nprobe; measured at sf0.01, one of the
# four strong pairs was exactly this case). Index size ×RAG_ASSIGN,
# recall contract restored; the serving scan is unchanged.
RAG_ASSIGN = _geo("RAG_ASSIGN", 2)
# Cogroup salt for the quantized serving twin: bounds the per-group
# Arrow batch (chunk rows of a cell split ~evenly into SALT buckets;
# probes replicate into all buckets). Value-neutral — any setting
# scores every pair exactly once — so the oracle ignores it.
RAG_COGROUP_SALT = _geo("RAG_COGROUP_SALT", 8)
# Probe-broadcast bound for the float fold (VERDICT r11 ask #5):
# above this many estimated probe rows (|queries|·nprobe, each
# carrying a d=64-double qvec — ~200k rows ≈ 100 MB of broadcast
# payload, the sensible driver/executor-memory ceiling well past the
# 10 MB auto threshold a HINT ignores), the broadcast hint is
# DROPPED and the scored join runs in the salted REPARTITION_BY_NUM
# layout instead — previously a prose recipe in this module, now the
# code path q_rag_retrieval_ivf switches to (the round-10 DNF trap
# this disarms: AQE sizes the fan-out stage by its small join
# inputs). Env: SPARK_GRAFT_RAG_BCAST_ROWS.
RAG_BCAST_PROBE_ROWS = _geo("RAG_BCAST_ROWS", 200_000)
# Chunk-count estimate for the dropped-hint layout sizing: sliding
# 64-token windows at stride 32 over the fixture corpus measure
# ~2-3 chunks/doc; 4 is the deliberate over-estimate (an over-sized
# estimate only shrinks slabs, an under-sized one costs stragglers).
RAG_CHUNKS_PER_DOC_EST = 4


def _rag_frames(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(chunks, queries, cents) — the shared corpus for both RAG
    paths: sliding 64-token chunks with hashed-BoW vectors, every
    50th document embedded whole as a query, every 20th (capped) as
    an IVF centroid cell.

    All three frames carry UNIT-NORMALIZED vectors (the `_unit_emb`
    move applied to the chunk index): cosine(a, b) == dot(unit(a),
    unit(b)), so normalizing once at index-build time makes every
    scored PAIR one sequential dot instead of three folds
    (dot + both norms) — at sf10's 375M scored pairs that is the
    dominant serving cost. The chunk table's norms are materialized
    behind a repartition barrier so the O(d) norm fold runs once per
    chunk, not once per element of the division lambda; the
    query/centroid frames are tiny and normalize inline. Norms are
    floored at 1e-12 on BOTH engines: an all-OOV (empty-vector) chunk
    otherwise yields NaN cosines, which both engines sort above every
    real score in the descending top-k.

    Built from Spark-SQL strings (round 12): the Column-API lambda
    chains (tokenize, hash histogram ×3 frames, norm folds, unit
    division) cost ~0.6 s of py4j round trips per timed BUILD; the
    strings are the literal rendering of the same trees
    (sameSemantics-pinned in tests/test_plans.py)."""
    from .text import CHUNK_SIZE, _STRIDE, hash_bucket_counts_expr

    toks_expr = "filter(split(lower(text), ' '), x -> x != '')"
    docs = spread(load_table(spark, "documents", sf_dir)).selectExpr(
        "doc_id", f"{toks_expr} AS toks"
    )
    starts = f"sequence(1, greatest(size(toks), 1), {_STRIDE})"
    chunks_raw = (
        docs.selectExpr(
            "doc_id", f"posexplode({starts}) AS (chunk_idx, st)", "toks"
        )
        .selectExpr(
            "doc_id",
            "cast(chunk_idx as bigint) AS chunk_idx",
            f"slice(toks, st, {CHUNK_SIZE}) AS ctoks",
        )
        .selectExpr(
            "doc_id", "chunk_idx", f"{hash_bucket_counts_expr('ctoks')} AS cv"
        )
        .selectExpr(
            "*", f"greatest({l2_norm_expr('cv')}, 1E-12D) AS __n"
        )
    )
    chunks = spread(chunks_raw).selectExpr(
        "doc_id", "chunk_idx", "transform(cv, x -> x / __n) AS cvec"
    )
    def _unit_docvecs(df, id_alias: str, out: str):
        raw = df.selectExpr(
            f"doc_id AS {id_alias}",
            f"{hash_bucket_counts_expr('toks')} AS v",
        ).selectExpr("*", f"greatest({l2_norm_expr('v')}, 1E-12D) AS __n")
        return spread(raw).selectExpr(
            id_alias, f"transform(v, x -> x / __n) AS {out}"
        )

    queries = _unit_docvecs(
        docs.filter(F.col("doc_id") % RAG_QUERY_MOD == 0), "query_doc_id", "qvec"
    )
    cents = _unit_docvecs(
        docs.filter(
            (F.col("doc_id") % RAG_CENT_MOD == RAG_CENT_OFF)
            & (F.col("doc_id") < RAG_CENT_MOD * RAG_CENT_CAP)
        ),
        "cent_id",
        "c_v",
    )
    return chunks, queries, cents


def q_rag_retrieval_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-served RAG retrieval, float fold — the labeled
    exactness/serving-compat BASELINE (registered as
    `rag_retrieval_float_baseline`); the SERVING-scale path is the
    quantized cogroup form `q_rag_retrieval_ivf_quant`, the
    `rag_retrieval` headline since round 10 (8.4x at the sf10
    replica, and the float fold's final scored-frame window is the
    shape whose ANN twin DNF'd the 2M-vector decade — SCALE.md
    rounds 9-10). In this fold chunks are assigned once to their
    nearest centroid cell (broadcast nested-loop + max-struct argmax,
    map-side combine — the same no-window shape as `q_ann_ivf_cosine`,
    which OOM'd as a row_number window at the 100× replica), and each
    query scores only the chunks inside its nprobe nearest cells.
    Generalizes the reference's similarity compare
    (running_validation.py:306-316) from row-pair checking to serving
    corpus retrieval.

    Scale: the centroid table is O(nlist) and broadcast both times;
    per-chunk assignment is a narrow map over nlist candidates with
    the per-chunk argmax collapsed BEFORE the shuffle; query scoring
    touches |probed cells| / nlist of the chunk index instead of all
    of it — cost tracks cells probed, not corpus size (SCALE.md has
    the measured 10× row). Recall vs the brute truth is pinned in
    tests/test_ann_recall.py.

    Determinism: identical hashed-BoW vectors, sequential-fold
    cosine rounded 6, (cent_id) and (doc_id, chunk_idx) tie-breaks —
    the oracle runs the identical IVF in SQL, so the approximation
    itself is value-checked, exactly as for `ann_topk`'s ivf arm."""
    chunks, queries, cents = _rag_frames(spark, sf_dir)
    # top-RAG_ASSIGN cells per chunk, ROW-LOCALLY (round 12; history
    # as in q_ann_ivf_cosine — a rank window OOM'd the 100× replica,
    # the r4–r11 collect_list aggregation still materialized the
    # |chunks|·nlist crossJoin rows each carrying the 64-double cvec
    # and burned ~10 s CPU per sf0.1 run in ObjectHashAggregate): the
    # ≤nlist centroid table folds to ONE broadcast array row, and
    # each chunk computes slice(sort_array(transform(...)), 1, k)
    # inside a projection — the IDENTICAL (a_cos DESC, cent_id ASC)
    # comparator the aggregated sort used. No aggregation, no
    # exchange: a narrow map at any scale.
    # Empty-cents edge (ADVICE r12): this agg always emits ONE row
    # (empty array), so with zero centroids each chunk/query gets an
    # empty cells/probed list — rows survive with NULL cent_id from
    # the posexplode being empty... i.e. no exploded rows at all, so
    # the final result is empty exactly like the old crossJoin shape;
    # only the pre-explode intermediate differs (1 row vs 0).
    carr = F.broadcast(
        cents.agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("cent_id"), F.col("c_v")))
            ).alias("cs")
        )
    )

    def _top_cells(vec: str, k: int, score_alias: str) -> F.Column:
        return F.transform(
            F.slice(
                F.sort_array(
                    F.transform(
                        F.col("cs"),
                        lambda c: F.struct(
                            F.round(dot(F.col(vec), c["c_v"]), 6).alias(
                                score_alias
                            ),
                            (-c["cent_id"]).alias("neg_cent"),
                        ),
                    ),
                    asc=False,
                ),
                1,
                k,
            ),
            lambda s: -s["neg_cent"],
        )

    assigned = (
        chunks.crossJoin(carr)
        .select(
            "doc_id",
            "chunk_idx",
            "cvec",
            _top_cells("cvec", RAG_ASSIGN, "a_cos").alias("cells"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            "cvec",
            "cells",
            F.posexplode("cells").alias("arn", "cent_id"),
        )
    )
    # query → nprobe cells + the full probed set in the SAME pass:
    # the probed array IS the row-local top-nprobe list, so the old
    # collect_list re-aggregation + broadcast self-join disappear.
    probes = (
        queries.crossJoin(carr)
        .select(
            "query_doc_id",
            "qvec",
            _top_cells("qvec", RAG_N_PROBE, "p_cos").alias("probed"),
        )
        .select(
            "query_doc_id",
            "qvec",
            "probed",
            F.explode("probed").alias("cent_id"),
        )
    )
    # Two serving regimes (VERDICT r11 ask #5 — the round-11 prose
    # recipe, now code):
    # - BROADCAST (small probe side): |queries|·nprobe rows, each
    #   carrying a d-double qvec, ship to every executor and the
    #   chunk index joins in place without shuffling.
    # - DROPPED-HINT (past RAG_BCAST_PROBE_ROWS): the probe side is
    #   too big to ship whole. The chunk index moves ONCE through a
    #   cent_id-keyed exchange — and because the scored join is a
    #   many-to-many fan-out whose output dwarfs its inputs, the
    #   exchange must be the salted REPARTITION_BY_NUM layout
    #   (operators.fanout.salted_fanout, sized by fanout_layout),
    #   NOT whatever AQE coalesces from the small inputs — round 11
    #   measured exactly that coalesced-fan-out trap DNF the ANN
    #   twin's 2M-vector decade. Value-neutral: same pairs, same
    #   scores, same tie-breaks under either regime (pinned by
    #   tests/test_ann_recall.py::test_rag_float_dropped_hint_regime
    #   _is_value_neutral); plan pinned in tests/test_plans.py.
    # A pair reachable through SEVERAL of a chunk's assigned cells
    # would rank once per reachable cell. Dedup BEFORE scoring, with a
    # map-side rule instead of a second wide shuffle (a distinct over
    # the scored pairs doubled the shuffled volume and OOM'd the 100×
    # replica): each probe row carries the query's full probed-cell
    # set, each assigned row the chunk's rank-ordered cell list, and a
    # row survives only when NO lower-rank cell of the chunk is among
    # this query's probes — the pair is kept exactly once, through the
    # best reachable cell, for ANY RAG_ASSIGN. Pure expressions, no
    # extra exchange. (Since round 12 the probed set rides out of the
    # row-local probe projection directly — no re-aggregation join.)
    from ..operators.fanout import fanout_layout, parquet_rows, salted_fanout

    n_docs = parquet_rows(sf_dir, "documents")
    est_probes = (n_docs // RAG_QUERY_MOD) * RAG_N_PROBE if n_docs else 0
    if est_probes > RAG_BCAST_PROBE_ROWS:
        # dropped-hint regime (block comment above)
        est_pairs = (
            est_probes
            * (n_docs * RAG_CHUNKS_PER_DOC_EST * RAG_ASSIGN)
            / max(min(RAG_CENT_CAP, n_docs // RAG_CENT_MOD or 1), 1)
        )
        n_salt, parts = fanout_layout(est_pairs, RAG_CENT_CAP, ANN_FLOAT_SLAB)
        a_s, p_s = salted_fanout(
            assigned,
            probes,
            F.concat_ws("_", "doc_id", "chunk_idx"),
            n_salt,
            parts=parts,
            partition_keys=("cent_id",),
        )
        joined = p_s.join(a_s, ["cent_id", "__salt"])
    else:
        joined = F.broadcast(probes).join(assigned, "cent_id")
    scored = (
        joined
        .filter(F.col("doc_id") != F.col("query_doc_id"))
        .filter(
            ~F.arrays_overlap(
                F.slice(F.col("cells"), F.lit(1), F.col("arn")),
                F.col("probed"),
            )
        )
        .select(
            "query_doc_id",
            "doc_id",
            "chunk_idx",
            F.round(dot(F.col("qvec"), F.col("cvec")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_doc_id").orderBy(
        F.col("cos_sim").desc(), "doc_id", "chunk_idx"
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= RAG_TOP_K)
    )


def q_rag_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end RAG retrieval over the corpus, composed from the
    suite's own primitives: documents → sliding 64-token chunks
    (`text_chunks`' windowing) → hashed-BoW chunk embeddings
    (`unit_text_hash_embeddings`' feature space) → cosine top-3 chunks
    per query document (the brute scoring baseline; the IVF/LSH twins
    are this op's serving path at scale, exactly as for `ann_topk`).
    Queries are every 50th document embedded whole; own-document
    chunks are excluded, so the result is "the best passages
    elsewhere in the corpus" — the retrieval-index shape behind
    RAG and dedup-by-retrieval alike.

    Determinism: integer bucket counts, the established sequential-
    fold dot/norm (identical IEEE order both engines), cosine rounded
    6 with (doc, chunk) tie-breaks. This brute pair scoring is the
    EXACTNESS BASELINE: `q_rag_retrieval_ivf` is the served scale
    path, and tests/test_ann_recall.py pins its recall against this
    truth."""
    chunks, queries, _ = _rag_frames(spark, sf_dir)

    scored = (
        chunks.crossJoin(F.broadcast(queries))
        .filter(F.col("doc_id") != F.col("query_doc_id"))
        .select(
            "query_doc_id",
            "doc_id",
            "chunk_idx",
            F.round(dot(F.col("qvec"), F.col("cvec")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_doc_id").orderBy(
        F.col("cos_sim").desc(), "doc_id", "chunk_idx"
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= RAG_TOP_K)
    )


def _rag_oracle_ctes() -> str:
    """Shared DuckDB CTE prefix for both RAG oracles: tokenized docs,
    sliding chunks, hashed-BoW chunk/query/centroid vectors —
    mirroring `_rag_frames` expression for expression."""
    from .text import CHUNK_SIZE, _STRIDE, _tokens_sql

    bucket = (
        "((strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 16"
        " + (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1)) % 64"
    )
    counts = (
        f"list_transform(generate_series(0, 63), b -> "
        f"CAST(len(list_filter({{src}}, tok -> {bucket} = b)) AS DOUBLE))"
    )
    from ..operators.vectors import dot_sql as _ds

    # unit normalization mirroring _rag_frames (pair scoring is then
    # one sequential dot on both engines)
    unit = (
        "list_transform({src}, x -> x / greatest(sqrt("
        + _ds("{src}", "{src}")
        + "), 1e-12))"
    )
    return f"""t AS (SELECT doc_id, {_tokens_sql('text')} AS toks FROM documents),
chunks AS (
  SELECT doc_id, CAST(pos - 1 AS BIGINT) AS chunk_idx,
         toks[s:s + {CHUNK_SIZE - 1}] AS ctoks
  FROM (
    SELECT doc_id, toks, u.s, u.pos
    FROM t, LATERAL (
      SELECT unnest(range(1, greatest(len(toks), 1) + 1, {_STRIDE})) AS s,
             generate_subscripts(range(1, greatest(len(toks), 1) + 1, {_STRIDE}), 1) AS pos
    ) u
  )
),
cv0 AS (
  SELECT doc_id, chunk_idx, {counts.format(src='ctoks')} AS v FROM chunks
),
cvecs AS (
  SELECT doc_id, chunk_idx, {unit.format(src='v')} AS v FROM cv0
),
qv0 AS (
  SELECT doc_id AS query_doc_id, {counts.format(src='toks')} AS v
  FROM t WHERE doc_id % {RAG_QUERY_MOD} = 0
),
qvecs AS (
  SELECT query_doc_id, {unit.format(src='v')} AS v FROM qv0
),
cent0 AS (
  SELECT doc_id AS cent_id, {counts.format(src='toks')} AS c_v
  FROM t WHERE doc_id % {RAG_CENT_MOD} = {RAG_CENT_OFF}
    AND doc_id < {RAG_CENT_MOD * RAG_CENT_CAP}
),
cents AS (
  SELECT cent_id, {unit.format(src='c_v')} AS c_v FROM cent0
)"""


def _oracle_rag_retrieval() -> str:
    from ..operators.vectors import dot_sql

    return f"""
WITH {_rag_oracle_ctes()},
scored AS (
  SELECT q.query_doc_id, c.doc_id, c.chunk_idx,
         ROUND({dot_sql('q.v', 'c.v')}, 6) AS cos_sim
  FROM cvecs c JOIN qvecs q ON c.doc_id <> q.query_doc_id
)
SELECT query_doc_id, doc_id, chunk_idx, cos_sim, rk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_doc_id
                               ORDER BY cos_sim DESC, doc_id, chunk_idx) AS rk
  FROM scored
) WHERE rk <= {RAG_TOP_K}
"""


def _oracle_rag_ivf() -> str:
    from ..operators.vectors import dot_sql

    return f"""
WITH {_rag_oracle_ctes()},
assigned AS (
  SELECT doc_id, chunk_idx, v, cent_id, arn FROM (
    SELECT c.doc_id, c.chunk_idx, c.v, ct.cent_id,
           row_number() OVER (PARTITION BY c.doc_id, c.chunk_idx
                              ORDER BY ROUND({dot_sql('c.v', 'ct.c_v')}, 6) DESC,
                                       ct.cent_id) AS arn
    FROM cvecs c CROSS JOIN cents ct
  ) WHERE arn <= {RAG_ASSIGN}
),
probes AS (
  SELECT query_doc_id, v, cent_id FROM (
    SELECT q.query_doc_id, q.v, ct.cent_id,
           row_number() OVER (PARTITION BY q.query_doc_id
                              ORDER BY ROUND({dot_sql('q.v', 'ct.c_v')}, 6) DESC,
                                       ct.cent_id) AS prn
    FROM qvecs q CROSS JOIN cents ct
  ) WHERE prn <= {RAG_N_PROBE}
),
scored AS (
  SELECT p.query_doc_id, a.doc_id, a.chunk_idx,
         ROUND({dot_sql('p.v', 'a.v')}, 6) AS cos_sim
  FROM probes p
  JOIN assigned a ON p.cent_id = a.cent_id
  WHERE a.doc_id <> p.query_doc_id
    AND NOT EXISTS (
      SELECT 1 FROM assigned a2 JOIN probes p2
        ON p2.cent_id = a2.cent_id
       AND p2.query_doc_id = p.query_doc_id
      WHERE a2.doc_id = a.doc_id AND a2.chunk_idx = a.chunk_idx
        AND a2.arn < a.arn)
)
SELECT query_doc_id, doc_id, chunk_idx, cos_sim, rk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_doc_id
                               ORDER BY cos_sim DESC, doc_id, chunk_idx) AS rk
  FROM scored
) WHERE rk <= {RAG_TOP_K}
"""


# --- e6-integer-dot RAG serving twin (round 9, VERDICT r8 ask #4) -----------
#
# The float IVF serving path (q_rag_retrieval_ivf) deliberately keeps
# its cosine scoring in interpreted JVM higher-order functions: numpy
# pairwise summation vs the engines' sequential fold differ in the
# last float64 ulp, which ROUND(cos, 6) can surface, so an Arrow
# kernel would break the bit-exact oracle (SCALE.md round-7/8). The
# hier-SemDeDup kernel proved the escape: quantize ONCE to the e6
# int64 domain — where every dot is order-independent integer
# arithmetic — and numpy reproduces SQL bit-for-bit. This twin moves
# ALL THREE pairwise-scoring stages of the IVF pipeline into that
# domain:
#   1. chunk→cell assignment: the n×nlist crossJoin + collect_list
#      top-RAG_ASSIGN becomes ONE narrow Arrow map against the
#      closure-held centroid matrix (no fan-out, no hash-agg, no
#      shuffle — the hier routing pattern),
#   2. query→cell probing: same kernel at k=RAG_N_PROBE,
#   3. pair scoring: cogrouped by (cell, salt) — each cell's chunks
#      and probing queries meet once in Python, score as one int64
#      matmul, and only each slice's per-query local top-K returns
#      (the measured path: a per-pair Arrow dot ships ~1 KB of
#      vectors per pair and read SLOWER than the float fold; the
#      unpruned cogroup then spent more on the 1.2B-row rank window
#      than on scoring — both in SCALE.md round-9's four-form study;
#      shipped form is 8.4× the float serving wall at sf10).
# Ranking ties break identically on both engines (dot DESC, id ASC ≡
# stable argsort over id-sorted columns), so the DuckDB oracle
# replays the whole pipeline bit-exactly; recall vs the float brute
# truth is pinned in tests/test_ann_recall.py. |e6 coord| ≤ 1e6
# (unit vectors), per-dim product ≤ 1e12, 64-dim dot ≤ 6.4e13 —
# far inside int64.


def _topk_cells_explode(
    df: DataFrame,
    df_vec_col: str,
    cents_q: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    keep_cells: bool,
) -> DataFrame:
    """Append-and-explode the rank-ordered top-k nearest cells by
    INTEGER dot (dot DESC, id ASC) in ONE mapInPandas pass: for every
    input row, emit one row per assigned cell with ``cent_id`` (and,
    when ``keep_cells``, the full rank-ordered ``cells`` array +
    0-based ``arn`` the redundant-assignment dedup rule needs).

    One Arrow pass replaces the float twin's crossJoin fan-out +
    collect_list hash-agg (a full n×nlist pair shuffle) with a NARROW
    map — no Generate node either, which matters twice: Catalyst
    cannot evaluate a Python UDF embedded in a generator/filter
    (INTERNAL_ERROR Cannot evaluate expression), and the explode
    happens batch-vectorized via np.repeat instead of per-row.

    ``cents_q`` must be a CAPPED centroid table (≤ nlist rows — index
    metadata, the MLlib-centroid collect pattern, same bound as
    :func:`_nearest_seed_arrow`). Ties: stable argsort over columns
    pre-sorted by id ≡ row_number(ORDER BY dot DESC, id). Rows whose
    vector is null (or holds a null element) emit nothing — the SQL
    twin's cross-join drops them the same way."""
    rows = (
        sorted(cents_q.collect(), key=lambda r: r[id_col])
        if isinstance(cents_q, DataFrame)
        else list(cents_q)
    )
    passthrough = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
    extra = (
        "cells array<bigint>, arn int, cent_id bigint"
        if keep_cells
        else "cent_id bigint"
    )
    schema = f"{passthrough}, {extra}"
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    C = (
        np.array([list(r[vec_col]) for r in rows], dtype=np.int64)
        if rows
        else np.empty((0, 1), dtype=np.int64)
    )
    kk = min(k, len(ids))
    cols = list(df.columns)

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0 or kk == 0:
                continue
            idx, M = _stack_int64(pdf[df_vec_col].tolist())
            if not len(idx):
                continue
            S = M @ C.T  # exact int64
            order = np.argsort(-S, axis=1, kind="stable")[:, :kk]
            cellmat = ids[order]
            rep = pdf.iloc[idx].reset_index(drop=True)
            out = rep.loc[np.repeat(np.arange(len(rep)), kk)].reset_index(
                drop=True
            )
            if keep_cells:
                lists = [row.tolist() for row in cellmat]
                out["cells"] = [
                    lists[i] for i in np.repeat(np.arange(len(lists)), kk)
                ]
                out["arn"] = np.tile(np.arange(kk, dtype=np.int32), len(rep))
            out["cent_id"] = cellmat.ravel()
            yield out

    return df.mapInPandas(gen, schema)


def _score_cell_cogroup(chunk_pdf: pd.DataFrame, probe_pdf: pd.DataFrame):
    """Per-cell pair scoring for the quantized serving twin: one
    exact-int64 matmul of the cell's chunk matrix against the cell's
    probing-query matrix, with the own-document exclusion and the
    best-reachable-cell dedup rule applied as boolean masks BEFORE
    any pair row materializes. Only the surviving
    (query, doc, chunk, sim) id-quadruples leave Python — the 64-dim
    vectors never ship per pair (the per-pair ArrowEvalPython form
    measured SLOWER than the interpreted float fold at sf1: ~1 KB of
    vector transfer per pair dwarfed the arithmetic win; SCALE.md
    round 9). Row-sliced so the score matrix stays ~32 MB however
    large the cell."""
    empty = {
        "query_doc_id": np.empty(0, dtype=np.int64),
        "doc_id": np.empty(0, dtype=np.int64),
        "chunk_idx": np.empty(0, dtype=np.int64),
        "sim_e12": np.empty(0, dtype=np.int64),
    }
    if len(chunk_pdf) == 0 or len(probe_pdf) == 0:
        return pd.DataFrame(empty)
    X = np.array(chunk_pdf["x"].tolist(), dtype=np.int64)
    Q = np.array(probe_pdf["qx"].tolist(), dtype=np.int64)
    dids = chunk_pdf["doc_id"].to_numpy()
    cidx = chunk_pdf["chunk_idx"].to_numpy()
    arn = chunk_pdf["arn"].to_numpy()
    cells = chunk_pdf["cells"].tolist()
    qids = probe_pdf["query_doc_id"].to_numpy()
    probed = probe_pdf["probed"].tolist()
    P = np.full((len(probed), max(len(p) for p in probed)), -1, dtype=np.int64)
    for j, p in enumerate(probed):
        P[j, : len(p)] = p
    nq = len(qids)
    step = max(1, (1 << 22) // max(nq, 1))
    outs = []
    for lo in range(0, len(X), step):
        hi = min(lo + step, len(X))
        S = X[lo:hi] @ Q.T  # exact int64
        keep = dids[lo:hi, None] != qids[None, :]
        # drop a pair when a LOWER-rank assigned cell of the chunk is
        # among this query's probes — the pair is then already served
        # through that better cell (same rule as the float twin's
        # arrays_overlap(slice(cells, 1, arn), probed))
        for r in range(1, int(arn[lo:hi].max(initial=0)) + 1):
            rows = np.flatnonzero(arn[lo:hi] >= r)
            if not len(rows):
                continue
            prev = np.array(
                [cells[lo + i][r - 1] for i in rows], dtype=np.int64
            )
            hit = (prev[:, None, None] == P[None, :, :]).any(-1)
            keep[rows] &= ~hit
        ci, qi = np.nonzero(keep)
        if not len(ci):
            continue
        q_out = qids[qi]
        d_out = dids[lo:hi][ci]
        c_out = cidx[lo:hi][ci]
        s_out = S[ci, qi]
        # Emit only each query's LOCAL top-RAG_TOP_K from this slice:
        # the global top-k per query must come from some group's local
        # top-k (every pair lives in exactly one group/slice), so
        # pre-pruning here is value-neutral — and it is the scale
        # lever: at the sf10 replica the scored frame is 1.22B pairs,
        # and feeding them all to the JVM rank window cost more than
        # the scoring itself (82 s scoring vs 233 s total; SCALE.md
        # round 9). Exact same order as the final window: sim DESC,
        # doc, chunk.
        order = np.lexsort((c_out, d_out, -s_out, q_out))
        qs = q_out[order]
        pos = np.arange(len(qs))
        first = np.r_[True, qs[1:] != qs[:-1]]
        start = np.maximum.accumulate(np.where(first, pos, 0))
        top = order[(pos - start) < RAG_TOP_K]
        outs.append(
            pd.DataFrame(
                {
                    "query_doc_id": q_out[top],
                    "doc_id": d_out[top],
                    "chunk_idx": c_out[top],
                    "sim_e12": s_out[top],
                }
            )
        )
    return pd.concat(outs, ignore_index=True) if outs else pd.DataFrame(empty)


def _rag_cent_rows_onestage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quant serving path's (cent_id, cx) centroid table as a
    SINGLE-STAGE plan: scan → filter → chained projections, no spread
    exchanges. Expression-identical to
    ``_rag_frames()[2].selectExpr(cent_id, _to_e6_expr(c_v))`` — same
    tokenize, same md5 histogram fold, same norm/divide/e6 ops in the
    same order — so the collected rows are bit-equal (pinned by
    tests/test_plans.py::test_onestage_cent_rows_identical). The
    spread barriers exist to keep corpus-sized folds off one core and
    un-inlined; a ≤nlist-row index-metadata frame needs neither, and
    dropping them cuts the per-build driver collect from a 3-stage
    AQE job (~0.66 s) to one task (~0.15 s). The norm fold DOES
    inline into the division lambda here (O(d²) per row — trivial at
    d=64); the expensive md5 fold stays un-inlined because it is
    referenced more than once."""
    from .text import hash_bucket_counts_expr

    toks_expr = "filter(split(lower(text), ' '), x -> x != '')"
    return (
        load_table(spark, "documents", sf_dir)
        .select("doc_id", "text")
        .filter(
            (F.col("doc_id") % RAG_CENT_MOD == RAG_CENT_OFF)
            & (F.col("doc_id") < RAG_CENT_MOD * RAG_CENT_CAP)
        )
        .selectExpr("doc_id AS cent_id", f"{toks_expr} AS toks")
        .selectExpr("cent_id", f"{hash_bucket_counts_expr('toks')} AS v")
        .selectExpr(
            "cent_id", "v", f"greatest({l2_norm_expr('v')}, 1E-12D) AS __n"
        )
        .selectExpr("cent_id", "transform(v, x -> x / __n) AS c_v")
        .selectExpr("cent_id", f"{_to_e6_expr('c_v')} AS cx")
    )


def _rag_quant_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quantized twin's scored pair frame, already pruned to each
    group-slice's per-query local top-RAG_TOP_K (value-neutral — see
    the in-kernel comment; the SCALE.md round-9 pair counts were
    measured with the pruning disabled). Factored out so the scale
    study can instrument scoring without the final rank window."""
    chunks, queries, _ = _rag_frames(spark, sf_dir)
    cq = chunks.selectExpr(
        "doc_id", "chunk_idx", f"{_to_e6_expr('cvec')} AS x"
    )
    qq = queries.selectExpr("query_doc_id", f"{_to_e6_expr('qvec')} AS qx")
    # ONE collect of the capped centroid table serves both kernel
    # builds — via the SINGLE-STAGE subtree (round 13): the composed
    # _rag_frames cents path runs a 3-stage AQE job per collect (two
    # spread exchanges protecting folds that matter only at corpus
    # row counts, ~0.66 s/run); for the ≤nlist-row centroid frame a
    # scan→project plan collects the identical rows in ~0.15 s
    # (Catalyst keeps the md5 histogram fold `v` un-inlined — it is
    # referenced more than once, so only the cheap norm fold inlines
    # into the division lambda). Value identity pinned by
    # tests/test_plans.py::test_onestage_cent_rows_identical.
    cent_rows = sorted(
        _rag_cent_rows_onestage(spark, sf_dir).collect(),
        key=lambda r: r["cent_id"],
    )
    # 1+2: assignment and probing as narrow Arrow map-explodes (no
    # crossJoin, no hash-agg, no Generate)
    assigned = _topk_cells_explode(
        cq, "x", cent_rows, "cent_id", "cx", RAG_ASSIGN, keep_cells=True
    )
    probes = _topk_cells_explode(
        qq, "qx", cent_rows, "cent_id", "cx", RAG_N_PROBE, keep_cells=True
    ).select(
        "query_doc_id", "qx", F.col("cells").alias("probed"), "cent_id"
    )
    # 3: pair scoring — cogrouped by (cell, salt): each cell's chunks
    # and probing queries meet ONCE in Python (each vector crosses
    # Arrow once per assignment, never once per pair) and are scored
    # as one exact-int64 matmul, dedup + own-doc masks applied before
    # any pair row materializes. The cent_id shuffle moves the chunk
    # index once — the same narrow n-row exchange the float twin's
    # documented past-broadcast-limit fallback uses. The SALT splits
    # each cell's chunk rows into bounded buckets (probes replicate
    # to every bucket — query-sized, cheap): the cogrouped Arrow
    # runner ships each group as ONE record batch, and an unsalted
    # skewed cell (hashed-BoW cells are Zipfian) hit a single 2 GB
    # batch allocation = OutOfDirectMemory at the sf10 replica
    # (SCALE.md round 9). Each chunk lands in exactly one bucket, so
    # every pair is still scored exactly once.
    from ..operators.fanout import cogroup_parts, salted_fanout

    # parts: pin the cogroup's exchange at the configured shuffle
    # width (REPARTITION_BY_NUM — AQE cannot coalesce it). The group
    # count (nlist × salt) times per-group Python latency is the
    # stage's real cost and is invisible to AQE's byte-based sizing:
    # unpinned at sf0.1 the ~2 MB shuffle coalesced to 2 partitions
    # and the 512 Python groups ran serialized on 2 cores (2.15 s of
    # the 4.6 s warm wall — round-12 stage profile). Value-neutral:
    # partitioning never changes cogroup membership.
    ak, pk = salted_fanout(
        assigned,
        probes,
        F.concat_ws("_", "doc_id", "chunk_idx"),
        RAG_COGROUP_SALT,
        parts=cogroup_parts(spark),
        partition_keys=("cent_id",),
    )
    scored = (
        ak.groupby("cent_id", "__salt")
        .cogroup(pk.groupby("cent_id", "__salt"))
        .applyInPandas(
            _score_cell_cogroup,
            "query_doc_id bigint, doc_id bigint, chunk_idx bigint,"
            " sim_e12 bigint",
        )
    )
    return scored


def q_rag_retrieval_ivf_quant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-served RAG retrieval scored in the e6-integer-dot domain —
    the Arrow-kernel serving twin of `q_rag_retrieval_ivf` (module
    comment above has the full design rationale). Same corpus, same
    IVF geometry, same redundant-assignment dedup rule; the score
    column is the raw e12-scale integer dot (`sim_e12` — cosine
    ×1e12 up to quantization), whose ranking the recall gate checks
    against the float truth. Generalizes the reference's similarity
    compare (running_validation.py:306-316) the same way the float
    twin does."""
    scored = _rag_quant_scored(spark, sf_dir)
    w = Window.partitionBy("query_doc_id").orderBy(
        F.col("sim_e12").desc(), "doc_id", "chunk_idx"
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= RAG_TOP_K)
    )


def _idot_sql(a: str, b: str) -> str:
    """Exact integer dot of two BIGINT[] expressions — DuckDB twin of
    the row-wise Arrow kernel (order-independent, so any evaluation
    order matches)."""
    return (
        f"CAST(list_sum(list_transform(generate_series(1, len({a})), "
        f"i -> {a}[i] * {b}[i])) AS BIGINT)"
    )


def _oracle_rag_ivf_quant() -> str:
    idot = _idot_sql
    return f"""
WITH {_rag_oracle_ctes()},
cq AS (SELECT doc_id, chunk_idx, {_to_e6_sql('v')} AS x FROM cvecs
       WHERE v IS NOT NULL AND len(list_filter(v, e -> e IS NULL)) = 0),
qq AS (SELECT query_doc_id, {_to_e6_sql('v')} AS x FROM qvecs
       WHERE v IS NOT NULL AND len(list_filter(v, e -> e IS NULL)) = 0),
ctq AS (SELECT cent_id, {_to_e6_sql('c_v')} AS x FROM cents),
assigned AS (
  SELECT doc_id, chunk_idx, x, cent_id, arn FROM (
    SELECT c.doc_id, c.chunk_idx, c.x, ct.cent_id,
           row_number() OVER (PARTITION BY c.doc_id, c.chunk_idx
                              ORDER BY {idot('c.x', 'ct.x')} DESC,
                                       ct.cent_id) AS arn
    FROM cq c CROSS JOIN ctq ct
  ) WHERE arn <= {RAG_ASSIGN}
),
probes AS (
  SELECT query_doc_id, x, cent_id FROM (
    SELECT q.query_doc_id, q.x, ct.cent_id,
           row_number() OVER (PARTITION BY q.query_doc_id
                              ORDER BY {idot('q.x', 'ct.x')} DESC,
                                       ct.cent_id) AS prn
    FROM qq q CROSS JOIN ctq ct
  ) WHERE prn <= {RAG_N_PROBE}
),
scored AS (
  SELECT p.query_doc_id, a.doc_id, a.chunk_idx,
         {idot('p.x', 'a.x')} AS sim_e12
  FROM probes p
  JOIN assigned a ON p.cent_id = a.cent_id
  WHERE a.doc_id <> p.query_doc_id
    AND NOT EXISTS (
      SELECT 1 FROM assigned a2 JOIN probes p2
        ON p2.cent_id = a2.cent_id
       AND p2.query_doc_id = p.query_doc_id
      WHERE a2.doc_id = a.doc_id AND a2.chunk_idx = a.chunk_idx
        AND a2.arn < a.arn)
)
SELECT query_doc_id, doc_id, chunk_idx, sim_e12, rk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_doc_id
                               ORDER BY sim_e12 DESC, doc_id, chunk_idx) AS rk
  FROM scored
) WHERE rk <= {RAG_TOP_K}
"""


# --- e6-integer-dot ANN serving twin (round 10, VERDICT r9 ask #2) ----------
#
# The round-9 RAG study's lesson (quantize once to the e6 int64
# domain, meet per cell in ONE cogrouped Arrow matmul, emit only each
# slice's per-query local top-k) applied to the embeddings-table IVF
# arm, SHIPPED because the measured crossover is real (SCALE.md
# round 10): at the 100x replica (100k vectors, 1000 queries, 4.97M
# scored pairs) the float arm reads 8.93 s warm and this twin 2.84 s
# (3.1x) with top-10 set agreement 1.0; at 10k vectors 4.04 vs 1.73
# (2.3x, agreement 0.999); at the 2k-vector fixture the two are at
# parity (fixed Python-stage costs, the same pre-adjudicated overhead
# regime as the RAG twin). Unlike RAG, the win here is split between
# scoring AND assignment: the float arm's n x nlist crossJoin
# fan-out + max(struct) hash-agg carries the 64-dim vector through
# an exchange, while `_topk_cells_explode` is one narrow Arrow map.
# Assignment is k=1 (each vector lives in exactly ONE cell), so the
# RAG twin's redundant-assignment dedup rule is unnecessary here.

ANN_COGROUP_SALT = _geo("ANN_COGROUP_SALT", 4)


def _ann_quant_score_cogroup(vec_pdf: pd.DataFrame, probe_pdf: pd.DataFrame):
    """Per-(cell, salt) pair scoring: one exact-int64 matmul of the
    slice's vectors against the cell's probing queries, own-vector
    mask applied before any pair row materializes, and only the
    slice's per-query local top-TOP_K id-triples leave Python (the
    global top-k per query must come from some slice's local top-k —
    every pair lives in exactly one (cell, salt, row-slice) group).
    Row-sliced like :func:`_score_cell_cogroup` so the score matrix
    stays ~32 MB however large the cell."""
    empty = {
        "query_id": np.empty(0, dtype=np.int64),
        "vec_id": np.empty(0, dtype=np.int64),
        "s_e12": np.empty(0, dtype=np.int64),
    }
    if len(vec_pdf) == 0 or len(probe_pdf) == 0:
        return pd.DataFrame(empty)
    X = np.array(vec_pdf["x"].tolist(), dtype=np.int64)
    Q = np.array(probe_pdf["qx"].tolist(), dtype=np.int64)
    vids = vec_pdf["vec_id"].to_numpy()
    qids = probe_pdf["query_id"].to_numpy()
    nq = len(qids)
    step = max(1, (1 << 22) // max(nq, 1))
    outs = []
    for lo in range(0, len(X), step):
        hi = min(lo + step, len(X))
        S = X[lo:hi] @ Q.T  # exact int64
        vi, qi = np.nonzero(vids[lo:hi, None] != qids[None, :])
        if not len(vi):
            continue
        q_out = qids[qi]
        v_out = vids[lo:hi][vi]
        s_out = S[vi, qi]
        # local top-TOP_K per query, exact same order as the final
        # window: s DESC, vec_id ASC
        order = np.lexsort((v_out, -s_out, q_out))
        qs = q_out[order]
        pos = np.arange(len(qs))
        first = np.r_[True, qs[1:] != qs[:-1]]
        start = np.maximum.accumulate(np.where(first, pos, 0))
        top = order[(pos - start) < TOP_K]
        outs.append(
            pd.DataFrame(
                {
                    "query_id": q_out[top],
                    "vec_id": v_out[top],
                    "s_e12": s_out[top],
                }
            )
        )
    return pd.concat(outs, ignore_index=True) if outs else pd.DataFrame(empty)


def _ann_cent_frame_onestage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_ann_ivf_quant's (cent_id, cx) centroid table as a
    single-stage scan→filter→project plan — expression-identical to
    filtering the composed ``_unit_emb → _to_e6`` pipeline (same norm
    fold, same division, same e6 ops in the same order), so the
    collected rows are bit-equal; see _rag_cent_rows_onestage for the
    rationale and tests/test_plans.py::
    test_onestage_cent_rows_identical for the pin."""
    return (
        load_table(spark, "embeddings", sf_dir)
        .select("vec_id", "embedding")
        .filter(
            (F.col("vec_id") % CENTROID_MOD == CENTROID_OFF)
            & (F.col("vec_id") < CENTROID_MOD * CENTROID_CAP)
        )
        .selectExpr(
            "vec_id", "embedding", f"{l2_norm_expr('embedding')} AS __nrm"
        )
        .selectExpr(
            "vec_id",
            "transform(embedding, x -> cast(x as double) / __nrm) AS u",
        )
        .selectExpr("vec_id AS cent_id", f"{_to_e6_expr('u')} AS cx")
        .filter(
            F.col("cx").isNotNull() & ~F.exists("cx", lambda e: e.isNull())
        )
    )


def q_ann_ivf_quant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN search scored in the e6-integer-dot domain — the
    Arrow-kernel serving twin of `q_ann_ivf_cosine` (block comment
    above has the measured crossover; the float arm stays the
    cosine-scale form inside `ann_topk`'s tagged union). Same
    geometry (nlist=CENTROID_CAP, nprobe=N_PROBE, modular centroid
    selection), same tie-breaks; the score column is the raw
    e12-scale integer dot (`s_e12` — cosine x1e12 up to
    quantization), and the DuckDB oracle replays the whole pipeline
    bit-exactly (order-independent integer arithmetic, the
    `unit_rag_retrieval_quant`-established pattern).
    tests/test_ann_recall.py pins top-k agreement with the float arm.

    Plan: two narrow MapInPandas passes (assignment k=1, probing
    k=nprobe) against the collected <=nlist centroid table (the
    MLlib-centroid pattern — no crossJoin, no hash-agg), then one
    salted FlatMapCoGroupsInPandas matmul; the only corpus exchange
    is the cogroup's cent_id shuffle. The salt splits a cell's
    vectors into bounded buckets (probes replicate per bucket —
    query-sized, cheap) so a skewed cell can never hit the
    single-2GB-Arrow-batch hazard the RAG study measured; embeddings
    cells are near-uniform, but a production corpus's need not be.

    Generalizes the reference's similarity compare
    (running_validation.py:306-316) to indexed corpus search, like
    the float twin it shadows."""
    emb = _unit_emb(spark, sf_dir).selectExpr(
        "vec_id", f"{_to_e6_expr('u')} AS x"
    )
    # The null filter mirrors the oracle's null-filtered uq CTE
    # (ADVICE r10): a zero-norm embedding at a centroid id is
    # normalized to a null vector (or one with null elements) by
    # _unit_emb, which the oracle silently drops from cents — without
    # the filter the collected row would crash _topk_cells_explode's
    # np.array build instead. (_stack_int64 already drops null ROWS
    # symmetrically on the assignment/query sides.)
    #
    # Collected via the SINGLE-STAGE subtree (round 13, same move as
    # _rag_cent_rows_onestage): scan → filter → projections, no spread
    # exchange — expression-identical ops in the same order, so the
    # rows are bit-equal (pinned by tests/test_plans.py::
    # test_onestage_cent_rows_identical).
    # ONE collect of the capped (<=nlist) centroid table serves both
    # kernel builds
    cent_rows = sorted(
        _ann_cent_frame_onestage(spark, sf_dir).collect(),
        key=lambda r: r["cent_id"],
    )
    assigned = _topk_cells_explode(
        emb, "x", cent_rows, "cent_id", "cx", 1, keep_cells=False
    )
    queries = emb.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("x").alias("qx")
    )
    probes = _topk_cells_explode(
        queries, "qx", cent_rows, "cent_id", "cx", N_PROBE, keep_cells=False
    )
    from ..operators.fanout import cogroup_parts, salted_fanout

    # parts: same pinned-width cogroup layout as _rag_quant_scored —
    # AQE coalesces this ~MB-scale exchange by bytes and serializes
    # the per-cell Python groups onto a couple of cores (round-12
    # stage profile); see cogroup_parts for the sizing rationale.
    ak, pk = salted_fanout(
        assigned,
        probes,
        F.col("vec_id").cast("string"),
        ANN_COGROUP_SALT,
        parts=cogroup_parts(spark),
        partition_keys=("cent_id",),
    )
    scored = (
        ak.groupby("cent_id", "__salt")
        .cogroup(pk.groupby("cent_id", "__salt"))
        .applyInPandas(
            _ann_quant_score_cogroup,
            "query_id bigint, vec_id bigint, s_e12 bigint",
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("s_e12").desc(), "vec_id")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= TOP_K)
    )


def _oracle_ann_ivf_quant() -> str:
    idot = _idot_sql
    return f"""
WITH {_UNITS_CTE},
uq AS (SELECT vec_id, {_to_e6_sql('u')} AS x FROM units
       WHERE u IS NOT NULL AND len(list_filter(u, e -> e IS NULL)) = 0),
cents AS (
  SELECT vec_id AS cent_id, x AS cx FROM uq
  WHERE vec_id % {CENTROID_MOD} = {CENTROID_OFF}
    AND vec_id < {CENTROID_MOD * CENTROID_CAP}
),
assigned AS (
  SELECT vec_id, x, cent_id FROM (
    SELECT v.vec_id, v.x, c.cent_id,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {idot('v.x', 'c.cx')} DESC,
                                       c.cent_id) AS arn
    FROM uq v CROSS JOIN cents c
  ) WHERE arn = 1
),
probes AS (
  SELECT query_id, x, cent_id FROM (
    SELECT q.vec_id AS query_id, q.x, c.cent_id,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY {idot('q.x', 'c.cx')} DESC,
                                       c.cent_id) AS prn
    FROM uq q CROSS JOIN cents c
    WHERE q.vec_id % {QUERY_MOD} = 0
  ) WHERE prn <= {N_PROBE}
),
scored AS (
  SELECT p.query_id, a.vec_id, {idot('p.x', 'a.x')} AS s_e12
  FROM probes p JOIN assigned a ON p.cent_id = a.cent_id
  WHERE a.vec_id <> p.query_id
)
SELECT query_id, vec_id, s_e12, rk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY s_e12 DESC, vec_id) AS rk
  FROM scored
) WHERE rk <= {TOP_K}
"""


# --- product quantization (PQ) codebook assignment --------------------------

PQ_M = 8       # subspaces
PQ_DSUB = 8    # dims per subspace (8 × 8 = the 64-dim fixture vectors)
PQ_K = 16      # codes per subspace codebook
PQ_CENT_MOD = 31
PQ_CENT_OFF = 5  # vec_id % 31 == 5, first PQ_K by id → codebook vectors


def q_pq_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding (Jégou, Douze & Schmid 2011,
    "Product Quantization for Nearest Neighbor Search"): split each
    64-dim vector into M=8 subvectors of 8 dims, assign every
    subvector to its nearest codeword in that subspace's K=16-entry
    codebook, and emit the 8-byte PQ code plus the exact
    reconstruction error — the memory-bound serving format that stores
    a vector in M·log2(K) = 64 bits instead of 64 floats (the
    compression stage IVF-PQ indexes pair with the suite's IVF cells).
    Codebooks here are a deterministic modular selection of corpus
    vectors (code k = vec_id DIV 31 over vec_id % 31 == 5), standing
    in for the k-means-trained codebooks of a production index — the
    assignment/encoding plan is identical either way.

    Spark plan: ONE posexplode to (vec_id, m, subvector) rows, the
    codebook (M·K = 128 rows) broadcast into the per-subspace distance
    join, and the per-(vec_id, m) argmin as a min(struct) aggregation
    with map-side combine — no rank window, the same no-shuffle-argmax
    shape as the IVF assignment. Reassembly is one (vec_id) groupBy.
    Everything is input-linear; the codebook is O(M·K) at any corpus
    size.

    Determinism: subspace L2² is the sequential zip_with fold rounded
    6, integerized ×1e6 so the cross-subspace sum is exact bigint
    arithmetic in both engines; argmin ties break on lower code."""
    emb = _emb(spark, sf_dir)
    subs = emb.selectExpr(
        "vec_id",
        f"posexplode(transform(sequence(0, {PQ_M - 1}), "
        f"m -> slice(embedding, m * {PQ_DSUB} + 1, {PQ_DSUB}))) AS (m, sub)",
    )
    cents = subs.filter(
        (F.col("vec_id") % PQ_CENT_MOD == PQ_CENT_OFF)
        & (F.col("vec_id") < PQ_CENT_MOD * PQ_K)
    ).selectExpr(f"vec_id DIV {PQ_CENT_MOD} AS code", "m", "sub AS csub")
    scored = subs.join(F.broadcast(cents), "m").selectExpr(
        "vec_id",
        "m",
        "code",
        "round(aggregate(zip_with(sub, csub, (a, b) -> "
        "(cast(a as double) - cast(b as double)) * "
        "(cast(a as double) - cast(b as double))), 0.0D, (acc, x) -> acc + x), 6)"
        " AS d2",
    )
    best = (
        scored.groupBy("vec_id", "m")
        .agg(F.min(F.struct(F.col("d2"), F.col("code"))).alias("best"))
        .selectExpr(
            "vec_id",
            "m",
            "best.code AS code",
            "cast(round(best.d2 * 1000000) as bigint) AS d2_e6",
        )
    )
    return (
        best.groupBy("vec_id")
        .agg(
            F.sort_array(F.collect_list(F.struct("m", "code", "d2_e6"))).alias("arr")
        )
        .selectExpr(
            "vec_id",
            "concat_ws(',', transform(arr, s -> cast(s.code as string))) AS pq_code",
            "round(sqrt(cast(aggregate(arr, 0L, (acc, s) -> acc + s.d2_e6) "
            "as double) / 1000000), 6) AS recon_err",
        )
    )


ORACLE_PQ_QUANTIZE = f"""
WITH subs AS (
  SELECT vec_id, u.m, embedding[u.m * {PQ_DSUB} + 1 : u.m * {PQ_DSUB} + {PQ_DSUB}] AS sub
  FROM embeddings, LATERAL (SELECT unnest(range(0, {PQ_M})) AS m) u
),
cents AS (
  SELECT vec_id // {PQ_CENT_MOD} AS code, m, sub AS csub FROM subs
  WHERE vec_id % {PQ_CENT_MOD} = {PQ_CENT_OFF} AND vec_id < {PQ_CENT_MOD * PQ_K}
),
d AS (
  SELECT s.vec_id, s.m, c.code,
         ROUND(list_aggregate(list_transform(generate_series(1, {PQ_DSUB}),
           k -> (s.sub[k]::DOUBLE - c.csub[k]::DOUBLE)
              * (s.sub[k]::DOUBLE - c.csub[k]::DOUBLE)), 'sum'), 6) AS d2
  FROM subs s JOIN cents c ON s.m = c.m
),
best AS (
  SELECT vec_id, m, code, CAST(round(d2 * 1000000) AS BIGINT) AS d2_e6 FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, code) AS rn
    FROM d
  ) WHERE rn = 1
)
SELECT vec_id,
       string_agg(code::VARCHAR, ',' ORDER BY m) AS pq_code,
       ROUND(sqrt(CAST(CAST(sum(d2_e6) AS BIGINT) AS DOUBLE) / 1000000), 6)
         AS recon_err
FROM best GROUP BY vec_id
"""


# --- IVF-PQ: cell-probed ANN with asymmetric-distance scoring ---------------

def q_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ search (Jégou et al. 2011 §IV): the full production ANN
    serving structure — IVF cells bound WHICH vectors are scored,
    PQ codes bound HOW MUCH it costs to score each one. Unit-normalize
    → assign vectors to IVF cells → PQ-encode each unit vector as
    M=8 4-bit-ish codes → per query, build the 8×16 asymmetric
    look-up table (query-subvector · codeword, the ADC trick: exact
    query side, quantized corpus side) → candidate score is 8 LUT
    adds instead of a 64-dim dot. Top-10 per query by approximate
    cosine, (vec_id) tie-break. Approximation quality = PQ
    reconstruction error; the oracle replays the IDENTICAL structure
    so the approximation itself is value-checked (the ann_topk brute
    arm remains the corpus-wide exactness baseline).

    Scale: the LUT is queries × M·K = tiny and broadcast; candidate
    scoring touches nprobe/nlist of the corpus and costs M integer
    adds per candidate — the shape that serves billion-vector corpora
    from RAM. LUT entries are e6-integerized so the per-candidate
    M-term sum is exact bigint arithmetic in both engines.

    Composes `q_ann_ivf_cosine`'s cell assignment with
    `q_pq_quantize`'s codebooks (both re-derived over UNIT vectors
    here — ADC approximates cosine only if the encoded vectors are
    unit-normalized)."""
    emb = _unit_emb(spark, sf_dir)

    # IVF cells over unit vectors (same selection as q_ann_ivf_cosine)
    cents = emb.filter(
        (F.col("vec_id") % CENTROID_MOD == CENTROID_OFF)
        & (F.col("vec_id") < CENTROID_MOD * CENTROID_CAP)
    ).select(F.col("vec_id").alias("cent_id"), F.col("u").alias("c_u"))
    assigned = (
        emb.crossJoin(F.broadcast(cents))
        .select(
            "vec_id", "u", "cent_id",
            F.round(dot(F.col("u"), F.col("c_u")), 6).alias("a_cos"),
        )
        .groupBy("vec_id")
        .agg(F.max(F.struct(
            F.col("a_cos"), (-F.col("cent_id")).alias("neg"), F.col("u").alias("u"),
        )).alias("b"))
        .select("vec_id", F.col("b.u").alias("u"), (-F.col("b.neg")).alias("cent_id"))
    )

    # PQ codebook over unit subvectors (same selection as q_pq_quantize)
    subs = assigned.selectExpr(
        "vec_id", "cent_id",
        f"posexplode(transform(sequence(0, {PQ_M - 1}), "
        f"m -> slice(u, m * {PQ_DSUB} + 1, {PQ_DSUB}))) AS (m, sub)",
    )
    book = subs.filter(
        (F.col("vec_id") % PQ_CENT_MOD == PQ_CENT_OFF)
        & (F.col("vec_id") < PQ_CENT_MOD * PQ_K)
    ).selectExpr(f"vec_id DIV {PQ_CENT_MOD} AS code", "m", "sub AS csub")
    codes = (
        subs.join(F.broadcast(book), "m")
        .selectExpr(
            "vec_id", "cent_id", "m", "code",
            "round(aggregate(zip_with(sub, csub, (a, b) -> "
            "(a - b) * (a - b)), 0.0D, (acc, x) -> acc + x), 6) AS d2",
        )
        .groupBy("vec_id", "cent_id", "m")
        .agg(F.min(F.struct(F.col("d2"), F.col("code"))).alias("b"))
        .select("vec_id", "cent_id", "m", F.col("b.code").alias("code"))
    )

    # queries: probe cells + ADC look-up table (query-sub · codeword)
    queries = emb.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("u").alias("q_u")
    )
    p_w = Window.partitionBy("query_id").orderBy(F.col("p_cos").desc(), "cent_id")
    probes = (
        queries.crossJoin(F.broadcast(cents))
        .select("query_id", "q_u", "cent_id",
                F.round(dot(F.col("q_u"), F.col("c_u")), 6).alias("p_cos"))
        .withColumn("prn", F.row_number().over(p_w))
        .filter(F.col("prn") <= N_PROBE)
        .select("query_id", "q_u", "cent_id")
    )
    qsubs = queries.selectExpr(
        "query_id",
        f"posexplode(transform(sequence(0, {PQ_M - 1}), "
        f"m -> slice(q_u, m * {PQ_DSUB} + 1, {PQ_DSUB}))) AS (m, qsub)",
    )
    lut = qsubs.join(F.broadcast(book), "m").selectExpr(
        "query_id", "m", "code",
        "cast(round(round(aggregate(zip_with(qsub, csub, (a, b) -> a * b), "
        "0.0D, (acc, x) -> acc + x), 6) * 1000000) as bigint) AS w_e6",
    )

    cands = (
        F.broadcast(probes.select("query_id", "cent_id"))
        .join(assigned.select("vec_id", "cent_id"), "cent_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", "cent_id")
    )
    scored = (
        cands.join(codes, ["vec_id", "cent_id"])
        .join(F.broadcast(lut), ["query_id", "m", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("w_e6").alias("s_e6"))
        .select(
            "query_id", "vec_id",
            (F.col("s_e6").cast("double") / F.lit(1e6)).alias("approx_cos"),
        )
    )
    s_w = Window.partitionBy("query_id").orderBy(
        F.col("approx_cos").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(s_w).cast("bigint"))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "vec_id", F.round("approx_cos", 6).alias("approx_cos"), "rk")
    )


def _oracle_ann_ivfpq() -> str:
    return f"""
WITH {_UNITS_CTE},
cents AS (
  SELECT vec_id AS cent_id, u AS c_u FROM units
  WHERE vec_id % {CENTROID_MOD} = {CENTROID_OFF}
    AND vec_id < {CENTROID_MOD * CENTROID_CAP}
),
assigned AS (
  SELECT vec_id, u, cent_id FROM (
    SELECT v.vec_id, v.u, c.cent_id,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY ROUND({dot_sql('v.u', 'c.c_u')}, 6) DESC,
                                       c.cent_id) AS arn
    FROM units v CROSS JOIN cents c
  ) WHERE arn = 1
),
subs AS (
  SELECT vec_id, cent_id, g.m,
         u[g.m * {PQ_DSUB} + 1 : g.m * {PQ_DSUB} + {PQ_DSUB}] AS sub
  FROM assigned, LATERAL (SELECT unnest(range(0, {PQ_M})) AS m) g
),
book AS (
  SELECT vec_id // {PQ_CENT_MOD} AS code, m, sub AS csub FROM subs
  WHERE vec_id % {PQ_CENT_MOD} = {PQ_CENT_OFF} AND vec_id < {PQ_CENT_MOD * PQ_K}
),
codes AS (
  SELECT vec_id, cent_id, m, code FROM (
    SELECT s.vec_id, s.cent_id, s.m, b.code,
           row_number() OVER (PARTITION BY s.vec_id, s.m
             ORDER BY ROUND(list_aggregate(list_transform(generate_series(1, {PQ_DSUB}),
               k -> (s.sub[k] - b.csub[k]) * (s.sub[k] - b.csub[k])), 'sum'), 6),
               b.code) AS rn
    FROM subs s JOIN book b ON s.m = b.m
  ) WHERE rn = 1
),
queries AS (
  SELECT vec_id AS query_id, u AS q_u FROM units WHERE vec_id % {QUERY_MOD} = 0
),
probes AS (
  SELECT query_id, cent_id FROM (
    SELECT q.query_id, c.cent_id,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY ROUND({dot_sql('q.q_u', 'c.c_u')}, 6) DESC,
                                       c.cent_id) AS prn
    FROM queries q CROSS JOIN cents c
  ) WHERE prn <= {N_PROBE}
),
qsubs AS (
  SELECT query_id, g.m, q_u[g.m * {PQ_DSUB} + 1 : g.m * {PQ_DSUB} + {PQ_DSUB}] AS qsub
  FROM queries, LATERAL (SELECT unnest(range(0, {PQ_M})) AS m) g
),
lut AS (
  SELECT q.query_id, q.m, b.code,
         CAST(round(ROUND(list_aggregate(list_transform(generate_series(1, {PQ_DSUB}),
           k -> q.qsub[k] * b.csub[k]), 'sum'), 6) * 1000000) AS BIGINT) AS w_e6
  FROM qsubs q JOIN book b ON q.m = b.m
),
cands AS (
  SELECT p.query_id, a.vec_id, a.cent_id
  FROM probes p JOIN assigned a ON p.cent_id = a.cent_id
  WHERE a.vec_id <> p.query_id
),
scored AS (
  SELECT c.query_id, c.vec_id,
         CAST(CAST(sum(l.w_e6) AS BIGINT) AS DOUBLE) / 1000000 AS approx_cos
  FROM cands c
  JOIN codes k ON c.vec_id = k.vec_id AND c.cent_id = k.cent_id
  JOIN lut l ON l.query_id = c.query_id AND l.m = k.m AND l.code = k.code
  GROUP BY c.query_id, c.vec_id
)
SELECT query_id, vec_id, ROUND(approx_cos, 6) AS approx_cos, rk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY approx_cos DESC, vec_id) AS rk
  FROM scored
) WHERE rk <= {TOP_K}
"""


# --- Johnson–Lindenstrauss sign projection ----------------------------------

JL_OUT_DIM = 16
JL_IN_DIM = 64


def _jl_signs() -> list[list[float]]:
    """Deterministic ±1 projection matrix: sign(j,k) from the parity
    of the first hex digit of md5("j|k") — the Achlioptas (2003)
    database-friendly JL construction with a hash in place of the coin
    flips, so both engines derive the identical matrix."""
    import hashlib

    return [
        [
            1.0 if int(hashlib.md5(f"{j}|{k}".encode()).hexdigest()[0], 16) % 2 == 0
            else -1.0
            for k in range(JL_IN_DIM)
        ]
        for j in range(JL_OUT_DIM)
    ]


def q_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss dimensionality reduction as an operator:
    project every 64-dim embedding to 16 dims with a deterministic
    ±1/√16 sign matrix (Achlioptas 2003 — database-friendly JL:
    random signs suffice, no Gaussians), emitting the projected vector
    and the norm-preservation ratio ‖y‖/‖x‖ the JL lemma bounds. This
    is the cheap front-end of every large-scale similarity pipeline —
    4× fewer dimensions before LSH/IVF/PQ indexing cuts every
    downstream dot product 4× (composes with `unit_pq_quantize` and
    the IVF cells).

    Plan: the 16×64 matrix is a LITERAL in the expression tree
    (module-derived, identical in the SQL oracle) — no join, no
    broadcast, a pure narrow map over the corpus; each output dim is
    one sequential zip_with fold. Determinism: per-dim projection
    rounded 6; the norm ratio divides two sequential-fold norms and
    rounds 6 (ratio guarded for the zero vector)."""
    signs = _jl_signs()
    mat = (
        "array("
        + ", ".join(
            "array(" + ", ".join(f"{s:.1f}D" for s in row) + ")" for row in signs
        )
        + ")"
    )
    scale = f"sqrt(cast({JL_OUT_DIM} as double))"
    emb = _emb(spark, sf_dir)
    return emb.selectExpr(
        "vec_id",
        "embedding",
        # NB: Spark's arr[j] is 0-based (the oracle's DuckDB [j] is
        # 1-based — its sequence runs 1..16)
        f"transform(sequence(0, {JL_OUT_DIM - 1}), j -> "
        f"round(aggregate(zip_with(embedding, {mat}[j], "
        "(a, b) -> cast(a as double) * b), 0.0D, (acc, x) -> acc + x) "
        f"/ {scale}, 6)) AS y",
    ).selectExpr(
        "vec_id",
        "concat_ws(',', transform(y, v -> format_string('%.6f', v))) AS y_csv",
        "round(sqrt(aggregate(y, 0.0D, (acc, v) -> acc + v * v)) / "
        "greatest(sqrt(aggregate(embedding, 0.0D, "
        "(acc, v) -> acc + cast(v as double) * cast(v as double))), 1E-12D), 6)"
        " AS norm_ratio",
    )


def _oracle_jl_projection() -> str:
    signs = _jl_signs()
    mat = (
        "["
        + ", ".join(
            "[" + ", ".join(f"{s:.1f}" for s in row) + "]" for row in signs
        )
        + "]"
    )
    return f"""
WITH proj AS (
  SELECT vec_id, embedding,
         list_transform(generate_series(1, {JL_OUT_DIM}), j ->
           ROUND(list_aggregate(list_transform(generate_series(1, {JL_IN_DIM}),
             k -> embedding[k]::DOUBLE * ({mat})[j][k]), 'sum')
           / sqrt(CAST({JL_OUT_DIM} AS DOUBLE)), 6)) AS y
  FROM embeddings
)
SELECT vec_id,
       list_aggregate(list_transform(y, v -> format('{{:.6f}}', v)), 'string_agg', ',')
         AS y_csv,
       ROUND(sqrt(list_aggregate(list_transform(y, v -> v * v), 'sum'))
         / greatest(sqrt(list_aggregate(list_transform(embedding, v -> v::DOUBLE * v::DOUBLE), 'sum')), 1E-12), 6)
         AS norm_ratio
FROM proj
"""


# --- per-label centroid similarity matrix ----------------------------------

def q_label_centroid_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space class analytics: the per-label centroid table
    and the pairwise centroid cosine matrix — the first diagnostic of
    label quality in an embedding space (two labels whose centroids
    cosine ≈ 1 are indistinguishable to a linear probe; a label whose
    centroid hugs the origin has no signal). Complements the search
    ops (ANN) and the clustering ops (k-means/SemDeDup) with the
    LABEL-conditioned view.

    Exactness: components e6-integerized per row (the k-means fixed
    point), per-label sums exact bigints, centroid components ONE
    shared-shape division each; the pairwise dot/norm reductions run
    over the 64-dim LONG form with per-term rounding + DECIMAL sums
    (no order-dependent float accumulation), and the final cosine is
    the shared dot/(‖a‖‖b‖) chain rounded 6.

    Scale: one posexplode (narrow), one (label, dim) groupBy with
    map-side combine → 10×64 rows; the pair join is over the tiny
    centroid table — input size touches only the first aggregation."""
    emb = load_table(spark, "embeddings", sf_dir)
    long = emb.select(
        "label", F.posexplode(_to_e6(F.col("embedding"))).alias("dim", "x")
    )
    cent = long.groupBy("label", "dim").agg(
        F.sum("x").alias("s"), F.count("*").alias("n")
    ).select(
        "label",
        "dim",
        "n",
        (F.col("s").cast("double") / F.col("n")).alias("c"),
    )
    a = cent.select(
        F.col("label").alias("label_a"), "dim",
        F.col("c").alias("ca"), F.col("n").alias("n_a"),
    )
    b = cent.select(
        F.col("label").alias("label_b"), "dim",
        F.col("c").alias("cb"), F.col("n").alias("n_b"),
    )
    pairs = (
        a.join(b, "dim")
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(
            F.max("n_a").cast("bigint").alias("n_a"),
            F.max("n_b").cast("bigint").alias("n_b"),
            F.sum(F.round(F.col("ca") * F.col("cb"), 6).cast("decimal(28,6)"))
            .cast("double")
            .alias("dot"),
            F.sum(F.round(F.col("ca") * F.col("ca"), 6).cast("decimal(28,6)"))
            .cast("double")
            .alias("naa"),
            F.sum(F.round(F.col("cb") * F.col("cb"), 6).cast("decimal(28,6)"))
            .cast("double")
            .alias("nbb"),
        )
    )
    return pairs.select(
        "label_a",
        "label_b",
        "n_a",
        "n_b",
        F.round(
            F.col("dot") / (F.sqrt(F.col("naa")) * F.sqrt(F.col("nbb"))), 6
        ).alias("centroid_cos"),
    )


ORACLE_LABEL_CENTROID_SIM = """
WITH long AS (
  SELECT label, u.dim - 1 AS dim,
         CAST(sign(CAST(u.x AS DOUBLE))
              * floor(abs(CAST(u.x AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS x
  FROM embeddings,
       LATERAL (SELECT unnest(embedding) AS x,
                       generate_subscripts(embedding, 1) AS dim) u
),
cent AS (
  SELECT label, dim, count(*) AS n,
         CAST(CAST(sum(x) AS BIGINT) AS DOUBLE) / count(*) AS c
  FROM long GROUP BY label, dim
),
pairs AS (
  SELECT a.label AS label_a, b.label AS label_b,
         CAST(max(a.n) AS BIGINT) AS n_a, CAST(max(b.n) AS BIGINT) AS n_b,
         CAST(sum(CAST(ROUND(a.c * b.c, 6) AS DECIMAL(28,6))) AS DOUBLE) AS dot,
         CAST(sum(CAST(ROUND(a.c * a.c, 6) AS DECIMAL(28,6))) AS DOUBLE) AS naa,
         CAST(sum(CAST(ROUND(b.c * b.c, 6) AS DECIMAL(28,6))) AS DOUBLE) AS nbb
  FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
  GROUP BY a.label, b.label
)
SELECT label_a, label_b, n_a, n_b,
       ROUND(dot / (sqrt(naa) * sqrt(nbb)), 6) AS centroid_cos
FROM pairs
"""


SPECS = [
    # round 10 (VERDICT r9 ask #1): the headline key now serves the
    # e6-integer-dot QUANTIZED form — the measured 100 TB serving
    # shape (8.4x the float fold's wall at the sf10 replica, 36x at
    # the nlist~sqrt(n) production geometry; SCALE.md round 9, which
    # deferred this promotion until the twin's first driver row
    # seated green — recorded in CORRECTNESS_r09). Result schema is
    # the integer `sim_e12` score (a rotation-rule-2 rewrite of this
    # key); the float fold stays registered below as
    # rag_retrieval_float_baseline, mirroring the other `_baseline`
    # exactness labels.
    QuerySpec("rag_retrieval", q_rag_retrieval_ivf_quant,
              _oracle_rag_ivf_quant(),
              "IVF-served RAG chunk retrieval, e6-integer-dot serving form:"
              " Arrow assignment/probing + salted cogroup matmul, local top-k",
              headline=True),
    # round 6 rotations: the never-driver-checked quantization /
    # projection trio takes the slots of ann_topk + semantic_dedup
    # (driver-green r2–r5 / r4–r5; bench still times the headliners).
    QuerySpec("unit_pq_quantize", q_pq_quantize, ORACLE_PQ_QUANTIZE,
              "product-quantization 8x8 codebook encode + exact recon error"),
    QuerySpec("unit_jl_projection", q_jl_projection, _oracle_jl_projection(),
              "Johnson-Lindenstrauss 64->16 sign projection + norm audit"),
    QuerySpec("unit_ann_ivfpq", q_ann_ivfpq, _oracle_ann_ivfpq(),
              "IVF-PQ: cell-probed ANN with e6-exact ADC LUT scoring"),
    # second round-6 rotation (never driver-checked before):
    QuerySpec("unit_kmeans_clusters", q_kmeans_clusters, ORACLE_KMEANS,
              "exact fixed-point Lloyd k-means (2 iterations, e6 integers)"),
    QuerySpec("unit_hard_negatives", q_hard_negatives, _oracle_hard_negatives(),
              "contrastive pair mining: nearest positive + hard negative"),
]

UNIT_SPECS = [
    QuerySpec("unit_ann_lsh", q_ann_lsh_cosine, _oracle_ann_lsh(),
              "SRP-LSH bucketed cosine top-K (train-free hash-join ANN)"),
    QuerySpec("unit_rag_retrieval", q_rag_retrieval, _oracle_rag_retrieval(),
              "RAG brute chunk retrieval — exactness/recall baseline for rag_retrieval"),
    # round 10: the float fold — the rag_retrieval headline key until
    # its quantized twin's promotion (see SPECS above) — re-registered
    # under a `_baseline` label with its oracle and recall gates
    # intact. Stays headline-flagged so every bench round keeps the
    # float-vs-quant serving walls side by side (the quant form's
    # sf0.1 overhead regime is pre-adjudicated in SCALE.md round 9).
    QuerySpec("rag_retrieval_float_baseline", q_rag_retrieval_ivf,
              _oracle_rag_ivf(),
              "float-fold IVF RAG serving — cosine-scale exactness and"
              " serving-compat baseline for the quantized headline",
              headline=True),
    QuerySpec("unit_label_centroid_sim", q_label_centroid_sim,
              ORACLE_LABEL_CENTROID_SIM,
              "per-label centroid cosine matrix, e6-exact reductions"),
    QuerySpec("unit_embed_quantize", q_embed_quantize, ORACLE_EMBED_QUANTIZE,
              "symmetric int8 vector quantization with error audit"),
    # rotated out in round 6 (driver-green r2–r5 / r4–r5):
    QuerySpec("ann_topk", q_ann_topk, ORACLE_ANN_TOPK_TAGGED,
              "brute-force baseline + IVF scale-path cosine top-10",
              headline=True),
    # round 10 (VERDICT r9 ask #2): the measured crossover was real
    # (3.1x at the 100x replica, agreement 1.0), so the cogroup
    # lesson ships for the embeddings IVF arm too.
    QuerySpec("unit_ann_ivf_quant", q_ann_ivf_quant, _oracle_ann_ivf_quant(),
              "e6-integer-dot IVF ANN serving twin: Arrow assignment/probing"
              " + salted cogroup matmul (round-10 crossover study)",
              headline=True),
    QuerySpec("unit_semantic_dedup", q_semantic_dedup, _oracle_semantic_dedup(),
              "SemDeDup: spherical-kmeans cluster-then-prune near-dup removal",
              headline=True),
    # round 7: the linear-at-scale twin — two-level coarse→fine
    # routing so neither the assignment nor the pair space goes
    # quadratic (SCALE.md round 7); the exact-Lloyd form above stays
    # the certification baseline, same pattern as capped containment.
    QuerySpec("unit_semantic_dedup_hier", q_semantic_dedup_hier,
              _oracle_semantic_dedup_hier(),
              "hierarchical SemDeDup: coarse-routed fine Voronoi + prune"),
]
