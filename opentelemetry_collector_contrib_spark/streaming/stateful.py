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


CAPPED_SESSION_SCHEMA = (
    "trace_key string, span_count long, first_id long, last_id long, "
    "released boolean"
)
CAPPED_STATE_SCHEMA = (
    "trace_keys array<string>, span_counts array<long>, "
    "first_ids array<long>, last_ids array<long>, last_ms array<long>"
)


def _capped_fn(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    wait_duration_ms: int,
    cap: int,
) -> Iterable[pd.DataFrame]:
    """Per-worker ring buffer (processor.go:130-143): the state key is a
    WORKER (hash bucket of trace ids, like the reference's event-machine
    worker pool), its state the ordered list of live traces.  A new trace
    arriving at a full buffer evicts the OLDEST trace.  The reference
    drops evicted traces and counts mTracesEvicted; here they surface as
    rows with ``released = false`` so the pipeline metrics can count them
    — callers filter on ``released`` for the downstream stream."""
    import time as _time

    now_ms = int(_time.time() * 1000)
    if state.hasTimedOut:
        (tks, scs, fis, las, lms) = state.get
        done = [i for i in range(len(tks)) if now_ms - lms[i] >= wait_duration_ms]
        keep = [i for i in range(len(tks)) if i not in set(done)]
        if keep:
            state.update((
                [tks[i] for i in keep], [scs[i] for i in keep],
                [fis[i] for i in keep], [las[i] for i in keep],
                [lms[i] for i in keep],
            ))
            state.setTimeoutDuration(wait_duration_ms)
        else:
            state.remove()
        yield pd.DataFrame({
            "trace_key": [tks[i] for i in done],
            "span_count": [scs[i] for i in done],
            "first_id": [fis[i] for i in done],
            "last_id": [las[i] for i in done],
            "released": [True] * len(done),
        })
        return

    tks, scs, fis, las, lms = (
        [list(x) for x in state.get] if state.exists else ([], [], [], [], [])
    )
    idx = {t: i for i, t in enumerate(tks)}
    ev_rows: list[tuple] = []
    for pdf in pdfs:
        for t, grp in pdf.groupby("trace_key", sort=False):
            n, lo, hi = len(grp), int(grp["id"].min()), int(grp["id"].max())
            if t in idx:
                i = idx[t]
                scs[i] += n
                fis[i] = min(fis[i], lo)
                las[i] = max(las[i], hi)
                lms[i] = now_ms
            else:
                tks.append(t)
                scs.append(n)
                fis.append(lo)
                las.append(hi)
                lms.append(now_ms)
                idx[t] = len(tks) - 1
                if len(tks) > cap:
                    # ring full: evict the oldest trace (buffer.put parity)
                    ev_rows.append((tks[0], scs[0], fis[0], las[0]))
                    for arr in (tks, scs, fis, las, lms):
                        arr.pop(0)
                    idx = {t2: i2 for i2, t2 in enumerate(tks)}
    if tks:
        state.update((tks, scs, fis, las, lms))
        state.setTimeoutDuration(wait_duration_ms)
    elif state.exists:
        state.remove()
    yield pd.DataFrame({
        "trace_key": [r[0] for r in ev_rows],
        "span_count": [r[1] for r in ev_rows],
        "first_id": [r[2] for r in ev_rows],
        "last_id": [r[3] for r in ev_rows],
        "released": [False] * len(ev_rows),
    })


def group_by_trace_stream_capped(
    events: DataFrame,
    trace_col: str,
    id_col: str,
    wait_duration_ms: int = 1000,
    num_traces: int = 1_000_000,
    n_workers: int = 4,
) -> DataFrame:
    """:func:`group_by_trace_stream` with the reference's ``num_traces``
    memory bound (config.go:30-34 + processor.go:130-143): traces hash to
    ``n_workers`` ring buffers of ``num_traces / n_workers`` each; a new
    trace arriving at a full ring evicts that worker's oldest trace.
    Output rows carry ``released`` — true for wait-window releases, false
    for evictions (the reference's mTracesEvicted counter, surfaced as
    data so Observation metrics can ride the same stream)."""
    cap = max(1, num_traces // n_workers)
    keyed = events.selectExpr(
        f"CAST(pmod(xxhash64(CAST({trace_col} AS STRING)), {n_workers}) AS STRING)"
        " AS worker",
        f"CAST({trace_col} AS STRING) AS trace_key",
        f"CAST({id_col} AS LONG) AS id",
    )

    def fn(key, pdfs, state):
        yield from _capped_fn(key, pdfs, state, wait_duration_ms, cap)

    return keyed.groupBy("worker").applyInPandasWithState(
        fn,
        outputStructType=CAPPED_SESSION_SCHEMA,
        stateStructType=CAPPED_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
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
