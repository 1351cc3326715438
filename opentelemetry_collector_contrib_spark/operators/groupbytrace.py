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
    max_spans: int | None = None,
) -> DataFrame:
    """One row per trace: span_count, first/last timestamps, and the spans
    as a deterministically-sorted array of structs.

    ``max_spans`` bounds the per-trace array (the memory analogue of the
    reference's bounded per-trace buffer): the collected array keeps only
    the first ``max_spans`` spans in sort order, ``n_dropped`` counts the
    overflow. span_count/first/last still reflect the FULL trace (they are
    plain aggregates, not array-derived)."""
    struct = F.struct(*[F.col(c) for c in [sort_col] + span_struct_cols])
    spans_arr = F.sort_array(F.collect_list(struct))
    if max_spans is not None:
        spans_arr = F.slice(spans_arr, 1, max_spans)
    out = spans.groupBy(trace_col).agg(
        F.count(F.lit(1)).alias("span_count"),
        F.min(sort_col).alias("first_ts"),
        F.max(sort_col).alias("last_ts"),
        spans_arr.alias("spans"),
    )
    if max_spans is not None:
        out = out.withColumn(
            "n_dropped",
            F.greatest(F.lit(0), F.col("span_count") - F.size("spans")).cast("long"),
        )
    return out


def evict_to_capacity(
    spans: DataFrame,
    trace_col: str,
    order_col: str,
    num_traces: int,
) -> DataFrame:
    """Bounded trace state: keep only the ``num_traces`` most recently
    STARTED traces; older traces are evicted whole.

    This is the batch analogue of the reference's capacity semantics —
    groupbytraceprocessor's ring buffer evicts the oldest trace when full
    (processor.go:130-143) and tailsamplingprocessor's ``num_traces`` cap
    drops via deleteChan (processor.go:292-299). "Started" = min(order)
    per trace; ties break on the trace id (deterministic). The keep set is
    a two-column aggregate ordered+limited (shuffle is |traces|, not
    |spans|), then a left_semi join releases surviving spans.
    """
    firsts = spans.groupBy(trace_col).agg(F.min(order_col).alias("__first"))
    keep = (
        firsts.orderBy(F.col("__first").desc(), F.col(trace_col).desc())
        .limit(num_traces)
        .select(trace_col)
    )
    return spans.join(keep, on=trace_col, how="left_semi")
