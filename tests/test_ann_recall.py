"""Approximate-index quality: IVF recall@10 against the exact
brute-force baseline. The approximation is allowed to miss neighbors
(that is the trade), but a broken cell assignment would crater recall
— this pins a floor."""

from __future__ import annotations

from validation_database_spark.suite.similarity import (
    TOP_K,
    q_ann_ivf_cosine,
    q_ann_topk_cosine,
)


def test_ivf_recall_floor(spark, sf_dir):
    exact = {}
    for r in q_ann_topk_cosine(spark, sf_dir).collect():
        exact.setdefault(r.query_id, set()).add(r.vec_id)
    approx = {}
    for r in q_ann_ivf_cosine(spark, sf_dir).collect():
        approx.setdefault(r.query_id, set()).add(r.vec_id)

    assert set(approx) == set(exact), "every query must return results"
    recalls = []
    for q, truth in exact.items():
        got = approx.get(q, set())
        recalls.append(len(got & truth) / len(truth))
    mean_recall = sum(recalls) / len(recalls)
    # nprobe=2 of ~10 cells on near-uniform synthetic vectors: recall
    # well above random cell coverage (~20%); floor set loosely so the
    # test pins breakage, not the exact number
    assert mean_recall >= 0.2, f"mean recall@{TOP_K} = {mean_recall:.3f}"
    assert max(recalls) > 0.3, recalls


def test_lsh_recall_floor(spark, sf_dir):
    """Multi-probe SRP-LSH recall@10 vs brute force: probing 5 of 16
    buckets on near-uniform synthetic vectors lands well above the
    ~31% random bucket coverage; floor set loosely to pin breakage
    (a wrong sign/bucket computation craters this)."""
    from validation_database_spark.suite.similarity import q_ann_lsh_cosine

    exact = {}
    for r in q_ann_topk_cosine(spark, sf_dir).collect():
        exact.setdefault(r.query_id, set()).add(r.vec_id)
    approx = {}
    for r in q_ann_lsh_cosine(spark, sf_dir).collect():
        approx.setdefault(r.query_id, set()).add(r.vec_id)

    assert set(approx) == set(exact), "every query must return results"
    recalls = [
        len(approx.get(q, set()) & truth) / len(truth) for q, truth in exact.items()
    ]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.35, f"mean recall@{TOP_K} = {mean_recall:.3f}"
