"""Checkpoint recovery: a restarted writeStream resumes from its
checkpoint and delivers each input file exactly once into the file
sink — no reprocessing of already-committed micro-batches, no loss
of files that arrived while the query was down.

Deterministic by construction: run 1 sees only half the source files
(availableNow → drains and stops), the second half lands while no
query is running, run 2 restarts from the same checkpoint. No sleeps,
no timing sensitivity."""

from __future__ import annotations

from pyspark.sql import functions as F

from validation_database_spark.sources import load_table


def _run_to_completion(spark, schema, src, out, ckpt):
    q = (
        spark.readStream.schema(schema)
        .parquet(src)
        .filter(F.col("value").isNotNull())
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive


def test_file_sink_exactly_once_across_restart(spark, sf_dir, tmp_path):
    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 != 0)
    first.coalesce(2).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    _run_to_completion(spark, schema, src, out, ckpt)
    expected_first = first.filter(F.col("value").isNotNull()).count()
    assert spark.read.parquet(out).count() == expected_first

    # late files arrive while the query is down; restart from checkpoint
    second.coalesce(2).write.mode("append").parquet(src)
    _run_to_completion(spark, schema, src, out, ckpt)

    got = spark.read.parquet(out)
    expected_total = ev.filter(F.col("value").isNotNull()).count()
    assert got.count() == expected_total
    # exactly-once: no event_id delivered twice, none missing
    dupes = got.groupBy("event_id").count().filter(F.col("count") > 1).count()
    assert dupes == 0
