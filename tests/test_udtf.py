"""Python UDTF surface: the lateral chunker must agree with the
JVM-expression chunking query."""

from __future__ import annotations

from validation_database_spark.operators.udtfs import register_udtfs
from validation_database_spark.sources import register_views
from validation_database_spark.suite.text import q_text_chunks


def test_udtf_chunker_matches_expression_pipeline(spark, sf_dir):
    register_views(spark, sf_dir)
    register_udtfs(spark)
    via_udtf = spark.sql(
        """
        SELECT c.doc_id, c.chunk_idx, c.chunk_text, c.chunk_tokens
        FROM documents, LATERAL chunk_text(doc_id, text) c
        """
    )
    got = {(r.doc_id, r.chunk_idx): (r.chunk_text, r.chunk_tokens) for r in via_udtf.collect()}
    want = {
        (r.doc_id, r.chunk_idx): (r.chunk_text, r.chunk_tokens)
        for r in q_text_chunks(spark, sf_dir).collect()
    }
    assert got == want
    assert len(got) > 500  # multiple chunks per doc
