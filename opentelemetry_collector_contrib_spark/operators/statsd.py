"""statsd receiver analogue: line parse + interval-windowed aggregation.

Reference: receiver/statsdreceiver/protocol/statsd_parser.go —
  - line grammar ``name:value|type|@rate|#tag:v,...`` (parseMessageToMetric,
    :224-279)
  - counters: running sum (:158-166); gauges: last-write-wins or += delta
    (:143-156); timers: observations -> summary (:168-218)
  - state resets every aggregation_interval tick
    (receiver.go:90-133, GetMetrics :106-131)

Spark design: the "flush every interval" state machine becomes a tumbling
window group-by — ``groupBy(window(ts, interval), name, tags)`` — which at
100 TB is a single partial-aggregatable shuffle. Gauge last-write-wins uses
``max_by(value, ts)`` (JVM built-in), timers use exact ``percentile`` so the
DuckDB oracle can reproduce values bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

STATSD_LINE_RE = r"^([^:]+):([-+]?[0-9.]+)\|(c|g|ms|h)(?:\|@([0-9.]+))?(?:\|#(.*))?$"


def parse_statsd_lines(df: DataFrame, line_col: str = "line") -> DataFrame:
    """statsd_parser.go:224-279 as JVM regexp_extract columns (codegen'd)."""
    c = F.col(line_col)
    return df.select(
        *df.columns,
        F.regexp_extract(c, STATSD_LINE_RE, 1).alias("metric_name"),
        F.regexp_extract(c, STATSD_LINE_RE, 2).try_cast("double").alias("metric_value"),
        F.regexp_extract(c, STATSD_LINE_RE, 3).alias("metric_type"),
        F.regexp_extract(c, STATSD_LINE_RE, 4).try_cast("double").alias("sample_rate"),
        F.nullif(F.regexp_extract(c, STATSD_LINE_RE, 5), F.lit("")).alias("tags"),
    )


def tumbling_window(ts: Column, interval: str = "1 hour") -> Column:
    """Aggregation-interval flush tick (receiver.go:90-133) as a tumbling
    window start column."""
    return F.window(ts, interval).getField("start")


def statsd_aggregate(
    df: DataFrame,
    ts_col: str,
    name_col: str,
    value_col: str,
    interval: str = "1 hour",
    extra_keys: list[str] | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """Per (window, name[, tags]) flush-style aggregate:
    counter sum, gauge last-write-wins, timer count/min/max/exact median.

    ``order_col`` breaks last-write ties deterministically (the reference's
    last-write-wins is arrival-order; batch needs a total order).
    """
    order = F.col(order_col) if order_col else F.col(ts_col)
    keys = [tumbling_window(F.col(ts_col), interval).alias("window_start"),
            F.col(name_col)] + [F.col(k) for k in (extra_keys or [])]
    v = F.col(value_col)
    return df.groupBy(*keys).agg(
        F.sum(v).alias("counter_sum"),
        F.max_by(v, order).alias("gauge_last"),
        F.count(v).alias("timer_count"),
        F.min(v).alias("timer_min"),
        F.max(v).alias("timer_max"),
        F.expr(f"percentile({value_col}, 0.5)").alias("timer_p50"),
    )


def timer_summary(
    df: DataFrame,
    ts_col: str,
    name_col: str,
    value_col: str,
    interval: str = "1 hour",
    percentiles: tuple[float, ...] = (0.0, 0.1, 0.5, 0.9, 0.95, 0.99, 1.0),
    method: str = "exact",
) -> DataFrame:
    """Timer -> summary percentiles per flush window, the statsd timer
    summary path (statsd_parser.go:168-218: observations -> percentile
    summary). Exact `percentile` (linear interpolation) so the DuckDB
    oracle (percentile_cont) reproduces values bit-for-bit; at true scale
    pass ``method="sketch"`` to route through the mergeable DDSketch-family
    quantile (:func:`timer_summary_sketch`) instead of a per-key global
    sort."""
    if method == "sketch":
        return timer_summary_sketch(
            df, ts_col, name_col, value_col, interval=interval,
            percentiles=tuple(p for p in percentiles if 0 < p <= 1))
    keys = [tumbling_window(F.col(ts_col), interval).alias("window_start"), F.col(name_col)]
    aggs = [F.count(F.col(value_col)).alias("n_obs")] + [
        F.expr(f"percentile({value_col}, {p})").alias(f"p{int(p * 100)}")
        for p in percentiles
    ]
    return df.groupBy(*keys).agg(*aggs)


def timer_summary_sketch(
    df: DataFrame,
    ts_col: str,
    name_col: str,
    value_col: str,
    interval: str = "1 hour",
    percentiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    scale: int = 100,
    merge_from: str | None = None,
) -> DataFrame:
    """The 10^12-row timer summary: quantiles read from the mergeable
    log-bucket sketch (operators/qsketch.py) instead of an exact per-key
    sort. Column names carry an ``_est`` suffix — these are sketch
    estimates (relative error bounded by the bucket width), not the exact
    percentiles, and callers should not hash-compare them against the
    exact path.

    With ``merge_from`` (a finer interval, e.g. '1 hour' under a '1 day'
    flush), sketches are built per (flush-window, sub-window) first and
    then merged up with ``sketch_merge`` — the rollup shape a fleet of
    collectors produces (each flushes its own interval sketch; the
    backend merges). Merge-equivalence — merged fine-grain sketches ≡ the
    sketch built directly at the coarse grain — holds exactly because
    bucket counts are integers; the driver oracle pins it by building the
    coarse sketch directly in DuckDB against this function's merged path.

    All percentiles are read in ONE pass over the sketch: a single
    cumulative-window + groupBy, not one join per percentile.
    """
    from opentelemetry_collector_contrib_spark.operators import qsketch

    win = tumbling_window(F.col(ts_col), interval).alias("window_start")
    if merge_from:
        # merge_from must evenly divide interval (nested tumbling windows):
        # the flush window is derived from the sub-window START, after the
        # fine-grain sketch exists — Spark allows only one window() per
        # projection, and merging at the sketch level is the realistic
        # shape anyway (collectors flush fine sketches; the backend rolls
        # them up without ever seeing raw observations again).
        fine = df.select(
            tumbling_window(F.col(ts_col), merge_from).alias("sub_window"),
            F.col(name_col), F.col(value_col),
        )
        sk = qsketch.sketch_build(
            fine, ["sub_window", name_col], value_col, scale)
        sk = sk.withColumn(
            "window_start", tumbling_window(F.col("sub_window"), interval))
        sk = qsketch.sketch_merge(sk, ["window_start", name_col])
    else:
        sk = qsketch.sketch_build(
            df.select(win, F.col(name_col), F.col(value_col)),
            ["window_start", name_col], value_col, scale)

    w_cum = (Window.partitionBy("window_start", name_col).orderBy("bucket")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_all = Window.partitionBy("window_start", name_col)
    ranked = (sk.withColumn("cum", F.sum("bucket_count").over(w_cum))
                .withColumn("total", F.sum("bucket_count").over(w_all)))

    aggs = [F.max("total").alias("n_obs")]
    for p in percentiles:
        rank = F.greatest(
            F.ceil(F.lit(p) * F.col("total")).cast("long"), F.lit(1))
        hit_bucket = F.min(F.when(F.col("cum") >= rank, F.col("bucket")))
        est = F.when(hit_bucket < 0, F.lit(0.0)).otherwise(
            F.lit(3.0) * F.pow(F.lit(2.0), hit_bucket - 1) / F.lit(scale))
        aggs.append(est.alias(f"p{int(p * 100)}_est"))
    return ranked.groupBy("window_start", name_col).agg(*aggs)


def timer_summary_oracle_sql(
    relation: str,
    ts_col: str,
    name_col: str,
    value_col: str,
    percentiles: tuple[float, ...] = (0.0, 0.1, 0.5, 0.9, 0.95, 0.99, 1.0),
) -> str:
    """DuckDB equivalent of :func:`timer_summary` (1-hour window)."""
    ps = ", ".join(
        f"percentile_cont({p}) WITHIN GROUP (ORDER BY {value_col}) AS p{int(p * 100)}"
        for p in percentiles
    )
    return f"""
SELECT date_trunc('hour', {ts_col}) AS window_start, {name_col},
  COUNT({value_col}) AS n_obs, {ps}
FROM {relation}
GROUP BY 1, 2
"""


def statsd_aggregate_oracle_sql(
    relation: str,
    ts_col: str,
    name_col: str,
    value_col: str,
    extra_keys: list[str] | None = None,
    order_col: str | None = None,
) -> str:
    """DuckDB equivalent of :func:`statsd_aggregate` (1-hour window)."""
    order = order_col or ts_col
    keys = [f"date_trunc('hour', {ts_col}) AS window_start", name_col] + (extra_keys or [])
    group = ", ".join(["date_trunc('hour', " + ts_col + ")", name_col] + (extra_keys or []))
    return f"""
SELECT {', '.join(keys)},
  SUM({value_col}) AS counter_sum,
  arg_max({value_col}, {order}) AS gauge_last,
  COUNT({value_col}) AS timer_count,
  MIN({value_col}) AS timer_min,
  MAX({value_col}) AS timer_max,
  percentile_cont(0.5) WITHIN GROUP (ORDER BY {value_col}) AS timer_p50
FROM {relation}
GROUP BY {group}
"""
