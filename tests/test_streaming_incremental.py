"""Stream-static incremental dedup: (1) the row-local min-hash
signature expressions agree with the shuffle (explode+groupBy) form
on every fixture document; (2) the streaming band join emits exactly
the batch band-join's candidate pairs."""

from __future__ import annotations

from pyspark.sql import functions as F

from validation_database_spark.operators import dedup as D
from validation_database_spark.sources import load_table
from validation_database_spark.streaming.validation import (
    stream_documents,
    streaming_incremental_dedup,
)


def _batch_docs(spark, sf_dir):
    return load_table(spark, "documents", sf_dir)


def test_rowlocal_signatures_match_groupby_form(spark, sf_dir):
    docs = _batch_docs(spark, sf_dir)
    sig_cols = [f"s{i}" for i in range(D.NUM_HASHES)]
    rowlocal = {
        r["doc_id"]: tuple(r[c] for c in sig_cols)
        for r in D.with_rowlocal_signatures(docs).select("doc_id", *sig_cols).collect()
    }
    grouped = {
        r["doc_id"]: tuple(r[c] for c in sig_cols)
        for r in D.minhash_signatures(D.exploded_shingles(docs)).collect()
    }
    assert rowlocal == grouped


def test_streaming_band_join_matches_batch(spark, sf_dir):
    docs = _batch_docs(spark, sf_dir)
    corpus_bands = D.lsh_bands(D.minhash_signatures(D.exploded_shingles(docs)))

    result = streaming_incremental_dedup(stream_documents(spark, sf_dir), corpus_bands)
    q = (
        result.writeStream.format("memory")
        .queryName("inc_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.new_doc_id, r.candidate_doc_id)
        for r in spark.sql("SELECT * FROM inc_dedup").collect()
    }

    b = corpus_bands.select(
        F.col("doc_id").alias("candidate_doc_id"), "band", "band_hash"
    )
    expected = {
        (r.new_doc_id, r.candidate_doc_id)
        for r in corpus_bands.join(b, ["band", "band_hash"])
        .filter(F.col("doc_id") != F.col("candidate_doc_id"))
        .select(F.col("doc_id").alias("new_doc_id"), "candidate_doc_id")
        .collect()
    }
    assert got == expected
    assert got, "fixture should contain at least one near-dup candidate pair"
