"""Structured Streaming operators driven to completion over the
bounded events fixture, cross-checked against their batch twins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from validation_database_spark.sources import load_table
from validation_database_spark.streaming import (
    run_to_completion,
    stream_events,
    streaming_missing_ids,
    streaming_sessionize,
    streaming_window_counts,
)


def test_streaming_window_counts_match_batch(spark, sf_dir):
    stream = stream_events(spark, sf_dir)
    out = run_to_completion(
        streaming_window_counts(stream), "win_counts", output_mode="complete"
    )
    got = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in out.collect()
    }

    ev = load_table(spark, "events", sf_dir)
    batch = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("s"),
        )
    )
    want = {(r.h, r.event_type): (r.n, r.s) for r in batch.collect()}
    assert got == want


def test_streaming_sessionize_counts_match_batch(spark, sf_dir):
    stream = stream_events(spark, sf_dir)
    out = run_to_completion(
        streaming_sessionize(stream), "sessions", output_mode="complete"
    )
    # Session totals must cover every event exactly once.
    total = out.agg(F.sum("n_events")).collect()[0][0]
    n_events = load_table(spark, "events", sf_dir).count()
    assert total == n_events
    # Session boundaries: no two sessions of one user overlap.
    by_user: dict[int, list[tuple]] = {}
    for r in out.collect():
        by_user.setdefault(r.user_id, []).append((r.session_start, r.session_end))
    for user, sessions in by_user.items():
        sessions.sort()
        for (s1, e1), (s2, _e2) in zip(sessions, sessions[1:]):
            assert s2 >= e1, f"user {user}: overlapping sessions {e1} > {s2}"


def test_streaming_missing_ids_vs_batch_anti_join(spark, sf_dir):
    ev = stream_events(spark, sf_dir)
    left = ev.filter(F.col("event_id") % 97 != 0)   # source A
    right = ev.filter(F.col("event_id") % 89 != 0)  # source B
    out = run_to_completion(
        streaming_missing_ids(left, right), "missing_stream"
    )
    emitted = {r.event_id for r in out.collect()}

    batch_ev = load_table(spark, "events", sf_dir)
    batch_left = batch_ev.filter(F.col("event_id") % 97 != 0)
    batch_right = batch_ev.filter(F.col("event_id") % 89 != 0)
    expected_df = batch_left.join(
        batch_right.select("event_id"), "event_id", "left_anti"
    ).select("event_id", "ts")
    expected = {r.event_id for r in expected_df.collect()}

    # No false positives ever.
    assert emitted <= expected
    # Everything older than the final watermark horizon must have
    # been emitted (watermark 1h + tolerance 1h + 1h slack).
    max_ts = batch_ev.agg(F.max("ts")).collect()[0][0]
    horizon = {
        r.event_id
        for r in expected_df.collect()
        if (max_ts - r.ts).total_seconds() > 3 * 3600
    }
    assert horizon, "fixture should have events past the horizon"
    assert horizon <= emitted


def test_streaming_stateful_user_totals(spark, sf_dir):
    from validation_database_spark.streaming import streaming_user_totals

    stream = stream_events(spark, sf_dir)
    out = run_to_completion(
        streaming_user_totals(stream), "user_totals", output_mode="update"
    )
    # update mode re-emits per batch; the max n_events row per user is
    # the final state.
    latest = {}
    for r in out.collect():
        if r.user_id not in latest or r.n_events > latest[r.user_id][0]:
            latest[r.user_id] = (r.n_events, r.total_value)

    ev = load_table(spark, "events", sf_dir)
    # exact-cents contract: the stateful operator's final state equals
    # the batch aggregation EXACTLY, not within a tolerance
    batch = ev.groupBy("user_id").agg(
        F.count("*").alias("n"),
        (F.coalesce(F.sum(F.round(F.col("value") * 100).cast("bigint")), F.lit(0))
         .cast("double") / 100).alias("t"),
    )
    want = {r.user_id: (r.n, r.t) for r in batch.collect()}
    assert latest == want


def test_streaming_user_totals_updates_strictly_increase(spark, sf_dir, tmp_path):
    """Pins the invariant q_streaming_user_totals_final's max(struct)
    rests on (ADVICE r6): update-mode emissions carry STRICTLY
    INCREASING n_events per user, because applyInPandasWithState with
    NoTimeout invokes a group only when the micro-batch contains new
    rows for it — so two emissions can never tie on n_events and the
    struct tie-break on total_value is unreachable. Driven over a
    3-file source with maxFilesPerTrigger=1 so users genuinely re-emit
    across micro-batches (the single-file fixture yields one batch and
    would leave the invariant unexercised)."""
    from validation_database_spark.streaming import streaming_user_totals

    ev = load_table(spark, "events", sf_dir)
    src = str(tmp_path / "ev_parts")
    ev.repartition(3).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = run_to_completion(
        streaming_user_totals(stream), "totals_multibatch", output_mode="update"
    )
    emissions: dict[int, list[int]] = {}
    for r in out.collect():
        emissions.setdefault(r.user_id, []).append(r.n_events)
    assert emissions
    # non-vacuous: multi-batch source must actually re-emit some user
    assert any(len(v) > 1 for v in emissions.values())
    batch_counts = {
        r.user_id: r.n
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    for uid, ns in emissions.items():
        assert len(ns) == len(set(ns)), f"user {uid}: tied n_events {ns}"
        assert max(ns) == batch_counts[uid], uid


def test_streaming_dedup_within_watermark(spark, sf_dir):
    """Exactly-once-style dedup on a stream: duplicate the source
    stream, dropDuplicatesWithinWatermark must collapse it back."""
    ev = stream_events(spark, sf_dir).select("event_id", "ts")
    doubled = ev.unionAll(ev)
    deduped = doubled.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    out = run_to_completion(deduped, "stream_dedup")
    n = out.count()
    n_src = load_table(spark, sf_dir=sf_dir, name="events").count()
    assert n == n_src, (n, n_src)


def test_tws_v2_operator_gates_cleanly(spark, sf_dir):
    """transformWithStateInPandas (arbitrary state v2) needs protobuf
    for its worker protocol; absent here, the operator must raise a
    descriptive error at construction — and when the dependency IS
    present, build the same-schema plan as the v1 operator."""
    import pytest as _pytest

    from validation_database_spark.streaming import stream_events
    from validation_database_spark.streaming.tws import (
        streaming_user_totals_tws,
        tws_available,
    )

    stream = stream_events(spark, sf_dir)
    if not tws_available():
        with _pytest.raises(RuntimeError, match="protobuf"):
            streaming_user_totals_tws(stream)
        _pytest.skip("protobuf absent: v2 execution not possible in this image")
    out = streaming_user_totals_tws(stream)
    assert out.schema.simpleString() == (
        "struct<user_id:bigint,n_events:bigint,total_value:double>"
    )


def test_kafka_source_gates_cleanly(spark):
    """Kafka connector jar absent here: the probe must say so and the
    builders must raise the setup hint (when present, they return the
    engine's standard events schema)."""
    import pytest as _pytest

    from validation_database_spark.streaming.kafka import (
        KafkaUnavailable,
        kafka_available,
        stream_kafka_events,
    )

    if not kafka_available(spark):
        with _pytest.raises(KafkaUnavailable, match="spark-sql-kafka"):
            stream_kafka_events(spark, "localhost:9092", "events")
        _pytest.skip("kafka connector absent: live stream not possible here")
    out = stream_kafka_events(spark, "localhost:9092", "events")
    assert [f.name for f in out.schema.fields] == [
        "event_id", "ts", "user_id", "event_type", "value", "props",
    ]


def test_streaming_ewma_final_state_matches_batch(spark, sf_dir):
    """The streaming EWMA's final per-user state must be BITWISE the
    batch recurrence's last value — the recurrence is Markov, so
    carrying one double of state across micro-batches loses nothing."""
    from pyspark.sql import Window

    from validation_database_spark.operators.timeseries import ewma
    from validation_database_spark.streaming import streaming_ewma

    stream = stream_events(spark, sf_dir)
    out = run_to_completion(
        streaming_ewma(stream), "ewma_stream", output_mode="update"
    )
    # update-mode emits one row per (user, batch); last batch wins
    got = {r.user_id: r.ewma for r in out.collect()}

    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "event_id", "ts", "value"
    )
    full = ewma(ev, ["user_id"], ["ts", "event_id"], "value", 0.25)
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    last = (
        full.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "ewma")
    )
    expected = {r.user_id: r.ewma for r in last.collect()}

    assert set(got) == set(expected)
    mismatches = {u: (got[u], expected[u]) for u in expected if got[u] != expected[u]}
    assert not mismatches, f"{len(mismatches)} users drifted: {list(mismatches.items())[:3]}"


def test_streaming_ewma_multibatch_state_carry(spark, sf_dir, tmp_path):
    """Multi-batch twin of the EWMA final-state test: three
    time-contiguous files replayed in order (mtimes forced ascending,
    maxFilesPerTrigger=1) so each user's recurrence genuinely CARRIES
    STATE across micro-batches — the single-file fixture never enters
    the state.exists branch, which is how the GroupState.get
    property-vs-method crash stayed latent (found by the totals twin
    of this test, ADVICE r6)."""
    import os
    import shutil

    from pyspark.sql import Window

    from validation_database_spark.operators.timeseries import ewma
    from validation_database_spark.streaming import streaming_ewma

    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "event_id", "ts", "value"
    )
    n = ev.count()
    ranked = ev.withColumn(
        "rn",
        F.row_number().over(
            Window.orderBy("ts", "event_id", "user_id")
        ),
    )
    src = tmp_path / "ev_time_parts"
    src.mkdir()
    for i in range(3):
        lo, hi = i * n // 3, (i + 1) * n // 3
        part_dir = tmp_path / f"slice_{i}"
        (
            ranked.filter((F.col("rn") > lo) & (F.col("rn") <= hi))
            .drop("rn")
            .coalesce(1)
            .write.parquet(str(part_dir))
        )
        part = next(
            p for p in os.listdir(part_dir) if p.endswith(".parquet")
        )
        dest = src / f"{i}.parquet"
        shutil.move(str(part_dir / part), str(dest))
        os.utime(dest, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))

    schema = spark.read.parquet(str(src)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = run_to_completion(
        streaming_ewma(stream), "ewma_multibatch", output_mode="update"
    )
    # update mode emits once per (user, batch); the final state is the
    # emission with the most events behind it — take the LAST per user
    # by n-th emission == max count ordering via collect order is not
    # guaranteed, so recompute: the batch EWMA over the full fixture.
    emitted = {}
    for r in out.collect():
        emitted.setdefault(r.user_id, []).append(r.ewma)

    full = ewma(ev, ["user_id"], ["ts", "event_id"], "value", 0.25)
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    last = (
        full.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "ewma")
    )
    expected = {r.user_id: r.ewma for r in last.collect()}
    assert set(emitted) == set(expected)
    assert any(len(v) > 1 for v in emitted.values()), "no user re-emitted"
    drifted = {
        u: (emitted[u], expected[u])
        for u in expected
        if expected[u] not in emitted[u]
    }
    assert not drifted, f"{len(drifted)} users: {list(drifted.items())[:3]}"
