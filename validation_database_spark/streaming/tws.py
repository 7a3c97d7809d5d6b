"""transformWithStateInPandas: Spark 4's arbitrary-state API v2.

The successor to ``applyInPandasWithState`` (which
streaming/validation.py uses for the running per-user totals):
explicit named state variables on a ``StatefulProcessorHandle``,
timers, TTL, and composite state types instead of one opaque tuple.
This module carries the engine's v2 twin of ``streaming_user_totals``.

Environment gate: the v2 operator's Python worker protocol needs
``protobuf``, which this image does not ship (and installs are
off-limits), so construction is probed and raises a clear
RuntimeError when unavailable — same honest-gating pattern as
sources/lakehouse.py. The class body itself is real and complete; on
a protobuf-equipped cluster ``streaming_user_totals_tws`` is a
drop-in replacement for the v1 operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def tws_available() -> bool:
    """True when the transformWithState worker protocol can run
    (protobuf importable)."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def _make_processor():
    """Build the StatefulProcessor class lazily (the import works
    without protobuf; only execution needs it)."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
    )

    class UserTotalsProcessor(StatefulProcessor):
        """Per-user running (n_events, total_value) in a named
        ValueState — v2 shape of streaming/validation.py's
        applyInPandasWithState kernel. State keeps the UNROUNDED
        total; rounding happens only in emitted rows (same
        batch-split-independence contract as the v1 operator)."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals",
                StructType(
                    [
                        StructField("n", LongType()),
                        StructField("cents", LongType()),
                    ]
                ),
            )

        def handleInputRows(self, key, rows, timerValues):
            n, cents = (0, 0)
            if self._state.exists():
                n, cents = self._state.get()
            for pdf in rows:
                n += len(pdf)
                # exact integer cents — same batch-split-independent
                # contract as the v1 operator
                cents += int((pdf["value"] * 100).round().sum())
            self._state.update((n, cents))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [cents / 100.0],
                }
            )

        def close(self) -> None:
            pass

    return UserTotalsProcessor()


def streaming_user_totals_tws(events: DataFrame) -> DataFrame:
    """v2 stateful per-user totals over a stream of events
    (user_id, value) — semantically identical to
    streaming/validation.py::streaming_user_totals.

    Raises RuntimeError when the worker protocol's protobuf
    dependency is missing (this image).
    """
    if not tws_available():
        raise RuntimeError(
            "transformWithStateInPandas needs protobuf for its Python "
            "worker protocol; not available in this environment — use "
            "streaming_user_totals (applyInPandasWithState) instead"
        )
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_make_processor(),
            outputStructType="user_id long, n_events long, total_value double",
            outputMode="Update",
            timeMode="None",
        )
    )
