"""groupbytrace processor analogue.

Reference: processor/groupbytraceprocessor — buffers spans by TraceID for
wait_duration (config.go:35-37), sharding traces across workers by
maphash(traceID) %% numWorkers (event.go:224-245), then releases the whole
trace downstream.

Spark design: the worker shard IS the hash shuffle; the wait window in batch
is simply "the whole input". ``groupBy(trace_id)`` with sorted collect gives
deterministic whole-trace records; in streaming the same op is a session
window (streaming/stream.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_by_trace(
    spans: DataFrame,
    trace_col: str,
    span_struct_cols: list[str],
    sort_col: str,
) -> DataFrame:
    """One row per trace: span_count, first/last timestamps, and the spans
    as a deterministically-sorted array of structs."""
    struct = F.struct(*[F.col(c) for c in [sort_col] + span_struct_cols])
    return spans.groupBy(trace_col).agg(
        F.count(F.lit(1)).alias("span_count"),
        F.min(sort_col).alias("first_ts"),
        F.max(sort_col).alias("last_ts"),
        F.sort_array(F.collect_list(struct)).alias("spans"),
    )
