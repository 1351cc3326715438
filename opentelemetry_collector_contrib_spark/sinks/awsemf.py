"""CloudWatch Embedded-Metric-Format (EMF) log-event sink.

Reference: exporter/awsemfexporter/metric_translator.go — a grouped metric
(one label set + N metric values) becomes one structured-log JSON document:
the labels and metric values are top-level fields, and an ``_aws`` section
(:372-377, created only when there are measurements) carries
``CloudWatchMetrics`` = [{Namespace, Dimensions, Metrics:[{Name,Unit?}]}]
plus the millisecond ``Timestamp``. Dimension rollup
(util.go:117-150, ZeroAndSingleDimensionRollup): the full dimension set is
followed by the zero (empty) set and one single-label set per label —
sorted within each set; Go's map iteration makes the *order of the single
sets* nondeterministic, so this engine orders them by label name
(a deterministic refinement of the same contract).

Spark-first shape: the whole document is one ``to_json(struct(...))``
projection — JVM-side, codegen'd, no shuffle beyond whatever grouping
produced the input rows. ``ignoreNullFields`` (Spark's to_json default)
drops absent Units exactly like Go's omit-empty.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def to_emf_log_events(
    df: DataFrame,
    namespace: str,
    dimension_cols: list[str],
    metric_cols: list[str],
    ts_ms_col: str,
    units: dict[str, str] | None = None,
    rollup: str = "NoDimensionRollup",
) -> DataFrame:
    """One EMF log event per input row.

    df rows are grouped datapoints: ``dimension_cols`` (string labels),
    ``metric_cols`` (numeric values), ``ts_ms_col`` (int64 epoch millis).
    Returns (ts_ms, message) — message is the EMF JSON document
    (the PutLogEvents payload string, metric_translator.go:382-391).
    """
    units = units or {}
    dim_sets = [sorted(dimension_cols)]
    if rollup == "ZeroAndSingleDimensionRollup" and dimension_cols:
        dim_sets.append([])
    if rollup in ("ZeroAndSingleDimensionRollup", "SingleDimensionRollupOnly"):
        dim_sets.extend([d] for d in sorted(dimension_cols))

    dimensions = F.array(
        *[F.array(*[F.lit(d) for d in ds]) for ds in dim_sets]
    )
    metrics = F.array(
        *[
            F.struct(
                F.lit(m).alias("Name"),
                F.lit(units.get(m)).cast("string").alias("Unit"),
            )
            for m in metric_cols
        ]
    )
    aws = F.struct(
        F.array(
            F.struct(
                F.lit(namespace).alias("Namespace"),
                dimensions.alias("Dimensions"),
                metrics.alias("Metrics"),
            )
        ).alias("CloudWatchMetrics"),
        F.col(ts_ms_col).cast("long").alias("Timestamp"),
    )
    doc = F.struct(
        *[F.col(c).cast("string").alias(c) for c in dimension_cols],
        *[F.col(m).alias(m) for m in metric_cols],
        aws.alias("_aws"),
    )
    return df.select(
        F.col(ts_ms_col).cast("long").alias("ts_ms"),
        F.to_json(doc).alias("message"),
    )
