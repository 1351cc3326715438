"""spanmetrics processor analogue: RED metrics + explicit-bounds histogram.

Reference: processor/spanmetricsprocessor/processor.go —
  - per-key call counter callSum (updateCallMetrics, :320-323)
  - latency histogram per key: count, sum, bucket counts against explicit
    bounds (updateLatencyMetrics, :325-333)
  - bucket index = sort.SearchFloat64s(bounds, latency) (:308-309), i.e.
    the number of bounds strictly less than latency — bucket i holds
    bounds[i-1] <= v... precisely: index = count(b < v), so bucket i covers
    (bounds[i-1], bounds[i]] EXCEPT that a value exactly equal to a bound
    lands in that bound's bucket (upper-inclusive); values above every bound
    land in the implicit catch-all bucket index == len(bounds).
  - dimension defaulting: missing span attr -> configured default
    (processor.go:342-349) -> coalesce.

Spark design: one ``groupBy(dims)`` with map-side partial aggregation
(sum/count are partial-aggregatable, so the shuffle carries one row per
dim-combo per map partition — at 100 TB the shuffle is tiny). Bucket counts
are ``sum(CASE WHEN ...)`` per bucket, all inside whole-stage codegen; no
Python, no UDFs. Skewed group keys (one hot domain) are irrelevant here
because partial aggregation collapses them map-side; for the rare
genuinely-high-cardinality + skewed case use ``salted_group_agg``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schema import DEFAULT_LATENCY_BOUNDS_MS


def bucket_index(latency: Column, bounds: list[float]) -> Column:
    """sort.SearchFloat64s(bounds, v) == count of bounds strictly < v."""
    idx: Column = F.lit(0)
    for b in bounds:
        idx = idx + F.when(F.lit(float(b)) < latency, 1).otherwise(0)
    return idx


def bucket_conditions(latency: Column, bounds: list[float]) -> list[Column]:
    """One boolean per bucket (len(bounds)+1 incl. catch-all), matching the
    SearchFloat64s semantics above."""
    conds = []
    lo: float | None = None
    for b in bounds:
        c = latency <= F.lit(float(b))
        if lo is not None:
            c = c & (latency > F.lit(float(lo)))
        conds.append(c)
        lo = b
    conds.append(latency > F.lit(float(bounds[-1])))  # catch-all
    return conds


def span_metrics(
    df: DataFrame,
    dims: list[str],
    latency_col: str = "latency_ms",
    bounds: list[float] | None = None,
    dim_defaults: dict[str, str] | None = None,
) -> DataFrame:
    """spans/records -> one row per dimension combo with calls_total,
    latency_count / latency_sum / bucket_0..bucket_N (catch-all last)."""
    bounds = bounds or DEFAULT_LATENCY_BOUNDS_MS
    lat = F.col(latency_col)
    for d, default in (dim_defaults or {}).items():
        df = df.withColumn(d, F.coalesce(F.col(d), F.lit(default)))
    aggs = [
        F.count(F.lit(1)).alias("calls_total"),
        F.count(lat).alias("latency_count"),
        F.sum(lat).alias("latency_sum"),
    ]
    for i, cond in enumerate(bucket_conditions(lat, bounds)):
        aggs.append(F.sum(F.when(cond, 1).otherwise(0)).alias(f"bucket_{i}"))
    return df.groupBy(*dims).agg(*aggs)


def span_metrics_oracle_sql(
    relation: str,
    dims: list[str],
    latency_col: str = "latency_ms",
    bounds: list[float] | None = None,
) -> str:
    """ANSI-SQL equivalent (DuckDB-runnable) of :func:`span_metrics`."""
    bounds = bounds or DEFAULT_LATENCY_BOUNDS_MS
    parts = [
        "COUNT(*) AS calls_total",
        f"COUNT({latency_col}) AS latency_count",
        f"SUM({latency_col}) AS latency_sum",
    ]
    lo: float | None = None
    for i, b in enumerate(bounds):
        cond = f"{latency_col} <= {float(b)}"
        if lo is not None:
            cond += f" AND {latency_col} > {float(lo)}"
        parts.append(f"SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS bucket_{i}")
        lo = b
    parts.append(
        f"SUM(CASE WHEN {latency_col} > {float(bounds[-1])} THEN 1 ELSE 0 END)"
        f" AS bucket_{len(bounds)}"
    )
    dims_sql = ", ".join(dims)
    return (
        f"SELECT {dims_sql}, {', '.join(parts)} FROM {relation} GROUP BY {dims_sql}"
    )


def salted_group_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str, str]],
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-phase salted aggregation for skewed keys (north_rule: "skew from
    hot domains handled with salted repartitioning").

    Phase 1 groups by (keys + salt) — the hot key's rows spread over
    ``salt_buckets`` reducers; phase 2 re-merges per key. Only worthwhile
    for aggregates that are NOT map-side combinable (e.g. exact distinct);
    plain sum/count already collapse map-side.

    aggs: out_col -> (source_col, phase1_fn, phase2_fn), fns in
          {sum,count,min,max,avg}. e.g. a global count: ("x","count","sum").
    The salt is deterministic (hash of a high-cardinality column), so reruns
    produce identical results regardless of partitioning.
    """
    salt_src = "url" if "url" in df.columns else df.columns[0]
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(F.col(salt_src)), F.lit(salt_buckets)))
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[getattr(F, fn1)(src).alias(out) for out, (src, fn1, _) in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[getattr(F, fn2)(out).alias(out) for out, (_, _, fn2) in aggs.items()]
    )
