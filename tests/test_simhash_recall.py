"""Recall contract of the 60-bit SimHash pair detector.

SimHash signature stability grows with feature count (each bit's vote
is a ±1 sum over |features| shingles, so a one-token edit shifts votes
by ±1 against a typical magnitude of √|features|) — it is the
LONG-document near-dup tool (Manku et al. 2007 ran it on web pages
with 10²-10⁴ features; short docs belong to MinHash-LSH, which this
suite also ships). The pins below encode exactly that:

measured at sf0.01 on the planted one-token-perturbed pairs:
recall 0.30 for <30-token docs → 0.57 at 60-89 → 1.0 at 90+.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from validation_database_spark.sources import load_table
from validation_database_spark.suite.dedup import q_simhash60_pairs

LONG_DOC_TOKENS = 60


def test_simhash60_planted_recall_scales_with_doc_length(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("n_tok")
    )
    planted = docs.filter(F.col("doc_id") % 10 == 0)
    hits = (
        q_simhash60_pairs(spark, sf_dir)
        .filter(F.col("id_b") == F.col("id_a") + 2_000_000)
        .select(F.col("id_a").alias("doc_id"))
        .withColumn("hit", F.lit(1))
    )
    j = planted.join(hits, "doc_id", "left").fillna(0, ["hit"]).collect()
    long_docs = [r for r in j if r.n_tok >= LONG_DOC_TOKENS]
    short_docs = [r for r in j if r.n_tok < LONG_DOC_TOKENS]
    assert long_docs and short_docs

    recall_long = sum(r.hit for r in long_docs) / len(long_docs)
    recall_all = sum(r.hit for r in j) / len(j)
    assert recall_long >= 0.5, recall_long  # the regime the tool is for
    assert recall_all >= 0.25, recall_all
    # the statistical contract itself: more features → more stable sig
    recall_short = sum(r.hit for r in short_docs) / len(short_docs)
    assert recall_long >= recall_short, (recall_long, recall_short)


def test_simhash60_no_quadratic_candidate_blowup(spark, sf_dir):
    # 15-bit bands: unrelated docs almost never share a band value, so
    # the emitted pair set stays near the planted/duplicate structure,
    # nothing like the n² of a coarse-banded signature.
    n_docs = load_table(spark, "documents", sf_dir).count()
    n_pairs = q_simhash60_pairs(spark, sf_dir).count()
    assert n_pairs <= n_docs, (n_pairs, n_docs)


def test_simhash60_wide_recall_and_subset(spark, sf_dir):
    """The wide (corpus-scale) config: its Hamming ≤ 2 pair set is a
    SUBSET of the narrow form's Hamming ≤ 3 set, and long-doc planted
    recall keeps a floor — the trade is radius, not correctness.

    The subset property holds exactly while the hot-bucket cap is
    INERT (with the cap biting, the two geometries cap DIFFERENT
    buckets and either set can lose pairs the other keeps), so the
    cap-inert precondition is asserted explicitly first — if a future
    fixture trips it, this fails as precondition-violated rather than
    as a misleading subset failure."""
    from validation_database_spark.suite.dedup import (
        SIMHASH60_BAND_BITS,
        SIMHASH60_BANDS,
        SIMHASH60_BUCKET_CAP,
        SIMHASH60W_BAND_BITS,
        SIMHASH60W_BANDS,
        q_simhash60_wide_pairs,
        simhash60_max_bucket,
    )

    for n_bands, bits in (
        (SIMHASH60_BANDS, SIMHASH60_BAND_BITS),
        (SIMHASH60W_BANDS, SIMHASH60W_BAND_BITS),
    ):
        mx = simhash60_max_bucket(spark, sf_dir, n_bands, bits)
        assert mx <= SIMHASH60_BUCKET_CAP, (
            f"precondition: cap must be inert at fixture scale "
            f"({n_bands}x{bits}-bit max bucket = {mx})"
        )

    narrow = {
        (r.id_a, r.id_b)
        for r in q_simhash60_pairs(spark, sf_dir).collect()
    }
    wide_rows = q_simhash60_wide_pairs(spark, sf_dir).collect()
    wide = {(r.id_a, r.id_b) for r in wide_rows}
    assert wide <= narrow, wide - narrow

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("n_tok")
    )
    planted_long = [
        r.doc_id
        for r in docs.filter(
            (F.col("doc_id") % 10 == 0) & (F.col("n_tok") >= LONG_DOC_TOKENS)
        ).collect()
    ]
    assert planted_long
    hit = sum(1 for d in planted_long if (d, d + 2_000_000) in wide)
    assert hit / len(planted_long) >= 0.4, hit / len(planted_long)
