"""Streaming twin of the quality funnel: the same four cumulative
filter predicates as a streaming aggregation over the documents file
stream (complete output mode) must converge to exactly the batch
funnel's per-stage counts once the bounded stream drains."""

from __future__ import annotations

from pyspark.sql import functions as F

from validation_database_spark.streaming.validation import stream_documents
from validation_database_spark.suite.quality import (
    FUNNEL_LANGS,
    FUNNEL_MIN_CHARS,
    FUNNEL_MIN_TOKENS,
    q_quality_funnel,
)
from validation_database_spark.suite.text import _tokens


def test_streaming_funnel_counts_match_batch(spark, sf_dir):
    docs = stream_documents(spark, sf_dir)
    toks = _tokens(F.col("text"))
    n_tok = F.size(toks)
    s1 = F.col("n_chars") >= FUNNEL_MIN_CHARS
    s2 = s1 & F.col("lang").isin(*FUNNEL_LANGS)
    s3 = s2 & (n_tok >= FUNNEL_MIN_TOKENS)
    s4 = s3 & (F.size(F.array_distinct(toks)) * 10 >= n_tok * 3)

    agg = docs.agg(
        F.count("*").alias("n"),
        *[
            F.sum(c.cast("bigint")).alias(f"c{i}")
            for i, c in enumerate([s1, s2, s3, s4], start=1)
        ],
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("funnel_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    row = spark.sql("SELECT * FROM funnel_stream").collect()[0]

    batch = {r.stage: (r.n_in, r.n_dropped, r.n_out) for r in q_quality_funnel(spark, sf_dir).collect()}
    stages = ["min_chars", "lang_keep", "min_tokens", "uniq_ratio"]
    counts = [row.n, row.c1, row.c2, row.c3, row.c4]
    for i, stage in enumerate(stages):
        assert batch[stage] == (counts[i], counts[i] - counts[i + 1], counts[i + 1])
