"""metricstransform processor analogue.

Reference: processor/metricstransformprocessor —
  - rename metric / labels / label values (metrics_transform_processor.go:215+)
  - aggregate_labels: collapse label dimensions, merging datapoints grouped
    by {remaining labels x timestamp} with sum/mean/min/max
    (datapoint_aggregation.go:34-130, config.go:204-240)
  - aggregate_label_values: merge specific label values into one
  - combine: union multiple matched metrics into one, regex submatches
    becoming labels (metrics_transform_processor.go:279-421)

Spark design: metrics are rows ``(name, labels..., ts, value)``; every
transform is a select / groupBy / unionByName — all partial-aggregatable,
shuffle carries only the collapsed label space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_AGG = {"sum": F.sum, "mean": F.avg, "min": F.min, "max": F.max}


def rename_metric(df: DataFrame, old: str, new: str, name_col: str = "metric_name") -> DataFrame:
    return df.withColumn(
        name_col, F.when(F.col(name_col) == old, F.lit(new)).otherwise(F.col(name_col))
    )


def rename_labels(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    out = df
    for old, new in mapping.items():
        out = out.withColumnRenamed(old, new)
    return out


def aggregate_labels(
    df: DataFrame,
    keep_labels: list[str],
    value_col: str,
    agg: str,
    ts_col: str | None = None,
) -> DataFrame:
    """config.go:226-240 + datapoint_aggregation.go:34-99: group by
    {kept labels x timestamp}, merge values with sum/mean/min/max."""
    keys = keep_labels + ([ts_col] if ts_col else [])
    return df.groupBy(*keys).agg(_AGG[agg](F.col(value_col)).alias(value_col))


def aggregate_label_values(
    df: DataFrame,
    label: str,
    merged_values: list[str],
    new_value: str,
    other_labels: list[str],
    value_col: str,
    agg: str,
    ts_col: str | None = None,
) -> DataFrame:
    """Merge listed values of one label into a single value, re-aggregating
    collided datapoints (datapoint_aggregation.go:103-130)."""
    relabeled = df.withColumn(
        label,
        F.when(F.col(label).isin(merged_values), F.lit(new_value)).otherwise(F.col(label)),
    )
    return aggregate_labels(relabeled, other_labels + [label], value_col, agg, ts_col)


def add_label(
    df: DataFrame, key: str, value: str, name_pred=None
) -> DataFrame:
    """AddLabel (operation_add_label.go:19-31): attach a constant label to
    every datapoint of the matched metrics; unmatched rows keep NULL (the
    flat-schema analogue of 'label absent')."""
    v = F.lit(value)
    if name_pred is not None:
        v = F.when(name_pred, v)
    return df.withColumn(key, v)


def update_label(
    df: DataFrame,
    label: str,
    new_label: str | None = None,
    value_mapping: dict[str, str] | None = None,
) -> DataFrame:
    """UpdateLabel (operation_update_label.go:22-43): optionally rename the
    label (column) and apply ValueActions renames to its values; values
    outside the mapping pass through unchanged."""
    col = F.col(label)
    if value_mapping:
        expr = None
        for old, new in value_mapping.items():
            expr = (
                F.when(col == old, F.lit(new))
                if expr is None
                else expr.when(col == old, F.lit(new))
            )
        col = expr.otherwise(col)
    out = df.withColumn(label, col)
    if new_label:
        out = out.withColumnRenamed(label, new_label)
    return out


def delete_label_value(df: DataFrame, label: str, value: str) -> DataFrame:
    """DeleteLabelValue (operation_delete_label_value.go:22-46): drop every
    datapoint whose label carries the value (NULL-labeled rows are kept —
    the reference only matches timeseries that HAVE the label value)."""
    return df.filter(~F.col(label).eqNullSafe(value))


def toggle_scalar_data_type(df: DataFrame, value_col: str = "value") -> DataFrame:
    """ToggleScalarDataType (metrics_transform_processor.go:439-440):
    int64 ↔ double. Go's double→int64 conversion truncates toward zero —
    so does Spark's double→long cast."""
    dtype = dict(df.dtypes)[value_col]
    target = "double" if dtype in ("bigint", "int", "long") else "long"
    return df.withColumn(value_col, F.col(value_col).cast(target))


def insert_copy(
    df: DataFrame, old: str, new: str, name_col: str = "metric_name"
) -> DataFrame:
    """ConfigAction Insert (config.go:164-166): keep the original metric
    and append a copy under the new name (operations then apply to the
    copy — here the caller chains transforms on the returned union)."""
    copy = df.filter(F.col(name_col) == old).withColumn(name_col, F.lit(new))
    return df.unionByName(copy)


def combine(dfs: list[DataFrame], new_name: str, name_col: str = "metric_name") -> DataFrame:
    """Combine matched metrics into one (metrics_transform_processor.go:279-421):
    union by name, overwrite the metric name."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out.withColumn(name_col, F.lit(new_name))


def _subexp_names(pattern: str) -> list[str]:
    """Names of the pattern's capturing groups, '' for unnamed — the
    regexp.Regexp.SubexpNames() semantics the combine transform relies on
    (metrics_transform_processor.go:352-362).  Hand-scanned because Java
    named-group syntax ``(?<name>...)`` differs from Python's."""
    import re as _re

    names: list[str] = []
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == "\\":
            i += 2
            continue
        if c == "[":  # character class: '(' inside is literal
            i += 1
            while i < len(pattern) and pattern[i] != "]":
                i += 2 if pattern[i] == "\\" else 1
            i += 1
            continue
        if c == "(":
            if pattern[i : i + 2] == "(?":
                m = _re.match(r"\(\?<([A-Za-z][A-Za-z0-9]*)>", pattern[i:])
                if m:  # named capture; (?: (?= (?! etc. don't capture
                    names.append(m.group(1))
            else:
                names.append("")
        i += 1
    return names


def combine_matched(
    df: DataFrame,
    include_pattern: str,
    new_name: str,
    name_col: str = "metric_name",
    submatch_case: str | None = None,
) -> DataFrame:
    """COMBINE with a regexp include filter (config.go:100-112 +
    metrics_transform_processor.go:342-388): rows whose metric name
    matches ``include_pattern`` (full-match, like the strict MatchString
    over ^...$ patterns) are renamed to ``new_name``, and every capturing
    group of the pattern becomes a NEW LABEL column whose value is the
    submatch of the original metric name — named groups use their name,
    unnamed use ``$i`` (SubexpNames parity).  ``submatch_case`` 'lower' /
    'upper' applies replaceCaseOfSubmatch (:388-397).

    One codegen'd map stage (rlike + regexp_extract) — no shuffle; the
    caller composes :func:`aggregate_labels` after if datapoints with the
    now-identical label sets must merge (AggregationType).
    """
    matched = df.filter(F.col(name_col).rlike(include_pattern))
    out = matched
    for idx, nm in enumerate(_subexp_names(include_pattern), start=1):
        col = F.regexp_extract(F.col(name_col), include_pattern, idx)
        if submatch_case == "lower":
            col = F.lower(col)
        elif submatch_case == "upper":
            col = F.upper(col)
        out = out.withColumn(nm or f"${idx}", col)
    return out.withColumn(name_col, F.lit(new_name))


def metrics_generation(
    df: DataFrame,
    name1: str,
    name2: str,
    op: str,
    new_name: str,
    label_cols: list[str],
    value_col: str = "value",
    name_col: str = "metric_name",
) -> DataFrame:
    """metricsgeneration processor (README.md:7-63): derive
    metric = metric1 (op) metric2 via a self-join on the label set."""
    a = df.filter(F.col(name_col) == name1).select(
        *label_cols, F.col(value_col).alias("__v1")
    )
    b = df.filter(F.col(name_col) == name2).select(
        *label_cols, F.col(value_col).alias("__v2")
    )
    joined = a.join(b, label_cols, "inner")
    ops = {
        "add": F.col("__v1") + F.col("__v2"),
        "subtract": F.col("__v1") - F.col("__v2"),
        "multiply": F.col("__v1") * F.col("__v2"),
        "divide": F.col("__v1") / F.col("__v2"),
        "percent": F.col("__v1") / F.col("__v2") * 100.0,
    }
    return joined.select(
        *label_cols,
        F.lit(new_name).alias(name_col),
        ops[op].alias(value_col),
    )
