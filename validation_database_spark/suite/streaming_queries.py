"""Streaming operators exposed as driver-checkable queries: each runs
a bounded Structured Streaming pipeline to completion (memory sink,
``processAllAvailable``) and returns the materialized result.

``streaming_window_counts`` is deterministic (complete mode ≡ the
batch aggregation) and carries a full DuckDB oracle — the streaming
engine's output is hash-compared against SQL. The stateful-operator
query is rows-only (its per-batch update history depends on batch
splitting; tests check final-state equivalence instead)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming import (
    run_to_completion,
    stream_events,
    streaming_user_totals,
    streaming_window_counts,
)
from ..sources import load_table
from ..streaming.validation import (
    stream_documents,
    streaming_incremental_dedup,
    streaming_session_totals,
)
from . import QuerySpec


def q_streaming_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = stream_events(spark, sf_dir)
    out = run_to_completion(
        streaming_window_counts(stream), "suite_stream_win", output_mode="complete"
    )
    # memory-sink table is unordered; output is the full final state.
    return out


ORACLE_STREAMING_WINDOW_COUNTS = """
WITH ev AS (SELECT make_timestamp(epoch_ns(ts) // 1000) AS ts, event_type, value
            FROM events)
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM ev GROUP BY 1, 2
"""


def q_streaming_user_totals_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final state of the custom stateful operator: max-n row per
    user across the update stream. Fully value-checked: the operator
    accumulates exact integer cents (2-decimal values), so the final
    state is identical under any micro-batch splitting and a plain
    SQL aggregation reproduces it bit-for-bit — only the per-batch
    UPDATE HISTORY is batch-dependent, and this query projects the
    final state."""
    stream = stream_events(spark, sf_dir)
    out = run_to_completion(
        streaming_user_totals(stream), "suite_stream_totals", output_mode="update"
    )
    # final state per user = the update with the highest n_events
    # (strictly increasing across a user's updates — the operator is
    # only invoked for groups with new rows in the batch, so ties are
    # impossible and the struct's total_value tie-break is
    # unreachable; pinned by tests/test_streaming.py::
    # test_streaming_user_totals_updates_strictly_increase) — a
    # map-side-combining max(struct), no rank window over the update
    # history
    return (
        out.groupBy("user_id")
        .agg(F.max(F.struct("n_events", "total_value")).alias("b"))
        .select(
            "user_id",
            F.col("b.n_events").alias("n_events"),
            F.col("b.total_value").alias("total_value"),
        )
    )


ORACLE_STREAMING_USER_TOTALS_FINAL = """
SELECT user_id,
       count(*) AS n_events,
       CAST(COALESCE(SUM(CAST(round(value * 100) AS BIGINT)), 0) AS DOUBLE) / 100
         AS total_value
FROM events
GROUP BY user_id
"""


def q_streaming_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static incremental dedup, driver-checkable: the existing
    corpus (md5-split: prefix < 'c') is indexed as a static LSH band
    table; the incoming crawl batch (prefix ≥ 'c') arrives as an
    UNBOUNDED document stream whose row-local min-hash signatures are
    stateless narrow maps (``operators.dedup.with_rowlocal_signatures``
    — no streaming groupBy, no watermark, no state store); each
    micro-batch hash-joins its bands against the static index and
    appends (new_doc_id, candidate_doc_id) pairs.

    Every hash is md5-derived, so the ENTIRE streaming pipeline —
    signatures, banding, bucket join, incoming/existing split — is
    replayed exactly in the DuckDB oracle; the post-materialization
    ``distinct`` collapses multi-band hits (a pair that collides in
    k bands is emitted k times in append mode, once per band row).
    Exactly-once recovery of the same operator is pinned separately by
    tests/test_streaming_recovery.py."""
    from ..operators import dedup as D
    from .dedup import _is_incoming

    docs = load_table(spark, "documents", sf_dir)
    corpus_bands = D.lsh_bands(
        D.minhash_signatures(D.exploded_shingles(docs.filter(~_is_incoming())))
    )
    new_docs = stream_documents(spark, sf_dir).filter(_is_incoming())
    out = run_to_completion(
        streaming_incremental_dedup(new_docs, corpus_bands),
        "suite_stream_inc_dedup",
    )
    return out.distinct()


def _oracle_streaming_incremental_dedup() -> str:
    from ..operators import dedup as D
    from .dedup import _SH_CTE, INCOMING_HEX

    sig_cols = ", ".join(
        "min(substr(md5('{seed}|' || sh), {start}, 8)) AS s{i}".format(
            seed=i // D.SLICES_PER_MD5, start=1 + 8 * (i % D.SLICES_PER_MD5), i=i
        )
        for i in range(D.NUM_HASHES)
    )
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5(concat_ws('|', {cols})) AS band_hash FROM sigs".format(
            b=b,
            cols=", ".join(
                f"s{b * D.ROWS_PER_BAND + r}" for r in range(D.ROWS_PER_BAND)
            ),
        )
        for b in range(D.NUM_BANDS)
    )
    return f"""
WITH {_SH_CTE},
sigs AS (SELECT doc_id, {sig_cols} FROM sh GROUP BY doc_id),
bands AS ({band_selects}),
flagged AS (
  SELECT *, substr(md5(CAST(doc_id AS STRING)), 1, 1) >= '{INCOMING_HEX}' AS incoming
  FROM bands
)
SELECT DISTINCT a.doc_id AS new_doc_id, b.doc_id AS candidate_doc_id
FROM flagged a JOIN flagged b
  ON a.band = b.band AND a.band_hash = b.band_hash
 AND a.incoming AND NOT b.incoming
"""


def q_streaming_session_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native stateful sessionization (``F.session_window`` + 1-hour
    watermark, append mode) run to completion on the bounded event
    stream — the streaming twin of `events_sessionize`. Append mode
    emits a session exactly once, when the watermark passes its
    close; on a bounded source the final watermark rests at
    max(event time) − 1 hour, so the emitted set is precisely the
    batch sessions whose ``session_end`` (last event + 30-minute gap)
    is ≤ that cutoff — sessions still open at end-of-stream stay in
    state, unemitted. The oracle replays exactly that restriction in
    SQL (lag+cumsum sessions — equivalent to session_window's gap
    semantics because the fixture has no exact-boundary gaps, a
    precondition pinned by tests/test_session_window.py); totals are
    exact integer cents so rows hash-compare. Emit-once/emit-all
    completeness is additionally pinned by
    tests/test_streaming_session.py."""
    stream = stream_events(spark, sf_dir)
    out = run_to_completion(
        streaming_session_totals(
            stream,
            gap=f"{_SESS_GAP_MIN} minutes",
            watermark=_SESS_WATERMARK,
        ),
        "suite_stream_sess",
        output_mode="append",
    )
    return out


# Single source of truth for the session parameters: the Spark query above
# passes these SAME constants into streaming_session_totals, so retuning the
# gap/watermark cannot drift the oracle out of sync with the engine path.
_SESS_GAP_MIN = 30
_SESS_WATERMARK = "1 hour"

ORACLE_STREAMING_SESSION_TOTALS = f"""
WITH ev AS (SELECT event_id, make_timestamp(epoch_ns(ts) // 1000) AS ts,
                   user_id, value FROM events),
lagged AS (
  SELECT user_id, event_id, ts, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM ev
),
sessioned AS (
  SELECT *, SUM(CASE WHEN prev_ts IS NULL
                       OR ts > prev_ts + INTERVAL {_SESS_GAP_MIN} MINUTE
                     THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM lagged
),
sess AS (
  SELECT user_id,
         min(ts) AS session_start,
         max(ts) + INTERVAL {_SESS_GAP_MIN} MINUTE AS session_end,
         count(*) AS n_events,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
  FROM sessioned GROUP BY user_id, session_idx
)
SELECT user_id, session_start, session_end, n_events, sum_cents
FROM sess
WHERE session_end <= (SELECT max(ts) FROM ev) - INTERVAL {_SESS_WATERMARK}
"""


SPECS = [
    QuerySpec("streaming_session_totals", q_streaming_session_totals,
              ORACLE_STREAMING_SESSION_TOTALS,
              "append-mode session_window ≡ SQL watermark-closed set"),
]


UNIT_SPECS = [
    # rotated out in the second round-5 rotation (driver-green r1-r4);
    # the streaming family keeps the session-window driver row.
    QuerySpec("streaming_window_counts", q_streaming_window_counts,
              ORACLE_STREAMING_WINDOW_COUNTS,
              "Structured Streaming tumbling windows ≡ SQL oracle"),
    # rotated out in round 6 (user totals driver-green r2–r5,
    # incremental dedup r4–r5); exactly-once + recovery stay pinned by
    # tests/test_streaming_recovery.py.
    QuerySpec("streaming_user_totals_final", q_streaming_user_totals_final,
              ORACLE_STREAMING_USER_TOTALS_FINAL,
              "applyInPandasWithState final state ≡ SQL (exact cents)"),
    QuerySpec("streaming_incremental_dedup", q_streaming_incremental_dedup,
              _oracle_streaming_incremental_dedup(),
              "stream-static LSH dedup of an unbounded crawl batch ≡ SQL"),
]
