"""Filter-family operators (SURVEY.md section 2.2).

These reproduce the contrib predicates as plain Column expressions so
Catalyst pushes them into the parquet/Iceberg scan (PushedFilters):

- strict / regexp metric include-filter
  (processor/metricstransformprocessor/config.go:107-117,254-275)
- tail-sampling string_attribute filter (values or regex list,
  sampling/string_tag_filter.go:44-151)
- tail-sampling numeric_attribute range filter
  (sampling/numeric_tag_filter.go:44-75)
- loki label filter with dropped-count (exporter/lokiexporter/exporter.go:123-136)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def strict_match(col: Column, value: str) -> Column:
    return col == F.lit(value)


def regexp_match(col: Column, patterns: list[str]) -> Column:
    """OR of regex matches — string_tag_filter.go:124-151 (the reference
    LRU-caches match results; Spark's vectorized rlike makes that moot)."""
    out = F.lit(False)
    for p in patterns:
        out = out | col.rlike(p)
    return out


def value_set_match(col: Column, values: list[str]) -> Column:
    return col.isin(values)


def numeric_range(col: Column, min_v: float, max_v: float) -> Column:
    """numeric_tag_filter.go:62-71: min <= v <= max (inclusive both ends)."""
    return col.between(min_v, max_v)


def filter_with_drop_count(
    df: DataFrame, keep: Column, drop_label: str = "dropped"
) -> tuple[DataFrame, DataFrame]:
    """Loki-exporter drop semantics: rows failing the predicate are counted,
    not silently discarded. Returns (kept, dropped) from one tagged plan."""
    tagged = df.withColumn("__keep", keep)
    return (
        tagged.filter(F.col("__keep")).drop("__keep"),
        tagged.filter(~F.col("__keep")).drop("__keep"),
    )
