"""tailsampling processor analogue — the two-pass batch formulation.

Reference: processor/tailsamplingprocessor/processor.go — spans buffer per
TraceID for decision_wait seconds (config.go:90-92), then the policy list is
OR-evaluated per trace (makeDecision, :191-237) and sampled traces are
released whole (:162-173).

Spark design (SURVEY.md section 2.7): in batch the decision window collapses
to a two-pass plan —
  pass 1: ``groupBy(trace_id).agg(max(policy_cond) ...)`` — one partial-agg
          shuffle keyed by trace id, emitting the sampled-id set;
  pass 2: ``left_semi`` join of the span stream against the sampled ids —
          AQE converts it to broadcast when the id set is small, else it's a
          co-partitioned shuffle join.
Policies (sampling/*.go): always_sample -> lit(True); string_attribute ->
isin/rlike; numeric_attribute -> between; rate_limiting -> row_number cap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sampled_ids(spans: DataFrame, trace_col: str, policies: list[Column]) -> DataFrame:
    """Pass 1: one row per trace id that any policy sampled (OR semantics,
    makeDecision processor.go:191-237)."""
    cond = F.lit(False)
    for p in policies:
        cond = cond | p
    return (
        spans.groupBy(trace_col)
        .agg(F.max(cond.cast("int")).alias("__sampled"))
        .filter(F.col("__sampled") == 1)
        .select(trace_col)
    )


def tail_sample(
    spans: DataFrame,
    trace_col: str,
    policies: list[Column],
    num_traces: int | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """Pass 2: release whole sampled traces (processor.go:162-173).

    ``num_traces`` (with ``order_col``) applies the reference's bounded
    trace-state capacity BEFORE the decision: only the num_traces most
    recently started traces are considered, older ones are evicted whole
    (deleteChan eviction, processor.go:292-299)."""
    if num_traces is not None:
        from .groupbytrace import evict_to_capacity

        assert order_col is not None, "num_traces needs order_col"
        spans = evict_to_capacity(spans, trace_col, order_col, num_traces)
    ids = sampled_ids(spans, trace_col, policies)
    return spans.join(ids, on=trace_col, how="left_semi")


def decision_metrics(
    spans: DataFrame, trace_col: str, policies: list[Column]
) -> DataFrame:
    """Sampling-decision observability (processor.go:176-188 +
    obsreport): one row with sampled / not-sampled trace counts and the
    span counts they carry. One partial-agg shuffle keyed by trace, then a
    single-row global aggregate."""
    cond = F.lit(False)
    for p in policies:
        cond = cond | p
    per_trace = spans.groupBy(trace_col).agg(
        F.max(cond.cast("int")).alias("__sampled"),
        F.count(F.lit(1)).alias("__n_spans"),
    )
    s = F.col("__sampled") == 1
    return per_trace.agg(
        F.sum(F.when(s, 1).otherwise(0)).cast("long").alias("num_traces_sampled"),
        F.sum(F.when(~s, 1).otherwise(0)).cast("long").alias("num_traces_not_sampled"),
        F.sum(F.when(s, F.col("__n_spans")).otherwise(0)).cast("long").alias(
            "num_spans_sampled"
        ),
        F.sum(F.when(~s, F.col("__n_spans")).otherwise(0)).cast("long").alias(
            "num_spans_dropped"
        ),
    )


def rate_limit(
    df: DataFrame, key_cols: list[str], order_col: str, n: int
) -> DataFrame:
    """rate_limiting policy (sampling/rate_limiting.go): at most n rows pass
    per key (batch analogue of spans-per-second)."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(order_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )
