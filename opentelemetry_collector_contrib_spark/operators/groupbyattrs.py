"""groupbyattrs processor analogue.

Reference: processor/groupbyattrsprocessor/processor.go:31-108 — for each
record, extract the configured keys from record attributes, promote them to
the resource level, and regroup records under the (base resource + promoted
attrs) identity; emits num_grouped_logs / num_non_grouped_logs / log_groups
metrics (metrics.go:24-29).

Spark design (SURVEY.md section 2.3): in a flat one-row-per-record schema,
"promotion to resource level" is just making the key a real column — free.
The regroup is ``repartition(keys)`` when downstream needs co-location, or
nothing at all when the next op is an aggregation (Spark shuffles on the
group keys anyway). What remains observable — and tested — is the metrics
contract: rows that carry ALL keys are "grouped", the rest are
"non-grouped", and log_groups = countDistinct(keys).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def promote_from_map(df: DataFrame, attr_col: str, keys: list[str]) -> DataFrame:
    """Promote map entries to top-level columns and delete them from the map
    (processor.go:110-133: extraction deletes the attr record-level)."""
    out = df
    for k in keys:
        out = out.withColumn(k, F.element_at(F.col(attr_col), k))
    return out.withColumn(attr_col, F.map_filter(F.col(attr_col), _not_in_keys(keys)))


def _not_in_keys(keys: list[str]):
    def f(k: Column, v: Column) -> Column:
        cond = F.lit(True)
        for key in keys:
            cond = cond & (k != F.lit(key))
        return cond

    return f


def group_by_attrs(
    df: DataFrame, keys: list[str], repartition: bool = False
) -> tuple[DataFrame, DataFrame]:
    """Returns (regrouped_df, metrics_df).

    metrics_df has one row: num_grouped, num_non_grouped, num_groups —
    matching groupbyattrsprocessor/metrics.go:24-29 ("grouped" = record had
    every key non-null, mirrors processor.go:83-99 where extraction only
    happens for present attrs).
    """
    has_all = F.lit(True)
    for k in keys:
        has_all = has_all & F.col(k).isNotNull()
    tagged = df.withColumn("__grouped", has_all)
    metrics = tagged.agg(
        F.sum(F.when(F.col("__grouped"), 1).otherwise(0)).alias("num_grouped"),
        F.sum(F.when(~F.col("__grouped"), 1).otherwise(0)).alias("num_non_grouped"),
        F.countDistinct(*[F.col(k) for k in keys]).alias("num_groups"),
    )
    out = tagged.drop("__grouped")
    if repartition:
        out = out.repartition(*[F.col(k) for k in keys])
    return out, metrics
