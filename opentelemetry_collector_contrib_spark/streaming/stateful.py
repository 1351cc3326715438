"""Custom stateful streaming operator: groupbytrace wait-window sessions.

Reference: processor/groupbytraceprocessor buffers spans by TraceID for
``wait_duration`` from first arrival (processor.go:150-158 AfterFunc,
config.go:35-37), then releases the whole trace downstream; state is capped
and evicted (processor.go:130-143).

Spark design: ``applyInPandasWithState`` — groups stream rows by trace key,
accumulates per-key state (span count / min / max event id), and emits one
session row when the processing-time timeout (= wait_duration) fires with
no new data for the key. Spark's state store gives the bounded-state +
spill behavior the reference hand-rolls with its ring buffer.

NOTE: ProcessingTimeTimeout only fires while the query keeps running —
use a ``processingTime`` trigger (as tests/test_streaming.py does). With
``availableNow`` the query stops after draining the input and pending
timeouts never fire, so buffered sessions would stay unreleased.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = "trace_key string, span_count long, first_id long, last_id long"
STATE_SCHEMA = "span_count long, first_id long, last_id long"


def _session_fn(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    wait_duration_ms: int = 1000,
) -> Iterable[pd.DataFrame]:
    if state.hasTimedOut:
        (count, first, last) = state.get
        state.remove()
        yield pd.DataFrame(
            {"trace_key": [key[0]], "span_count": [count],
             "first_id": [first], "last_id": [last]}
        )
        return
    count, first, last = state.get if state.exists else (0, None, None)
    for pdf in pdfs:
        count += len(pdf)
        lo, hi = int(pdf["id"].min()), int(pdf["id"].max())
        first = lo if first is None else min(first, lo)
        last = hi if last is None else max(last, hi)
    state.update((count, first, last))
    # wait_duration from the most recent arrival (config.go:35-37)
    state.setTimeoutDuration(wait_duration_ms)
    yield pd.DataFrame(
        {"trace_key": [], "span_count": [], "first_id": [], "last_id": []}
    )


def group_by_trace_stream(
    events: DataFrame,
    trace_col: str,
    id_col: str,
    wait_duration_ms: int = 1000,
) -> DataFrame:
    """events stream -> per-trace session rows released after the wait window.

    ``events`` must be a streaming DataFrame; output one row per trace_key.
    ``wait_duration_ms`` is the groupbytrace ``wait_duration``
    (config.go:35-37): the session flushes after that long with no new
    spans for the key. Requires a processingTime trigger (see module note).
    """
    keyed = events.selectExpr(
        f"CAST({trace_col} AS STRING) AS trace_key", f"CAST({id_col} AS LONG) AS id"
    )

    def fn(key, pdfs, state):
        yield from _session_fn(key, pdfs, state, wait_duration_ms)

    return keyed.groupBy("trace_key").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
