"""loki exporter analogue: attribute->label mapping + stream grouping.

Reference: exporter/lokiexporter/exporter.go:123-187 — for each record, map
configured attributes to Loki labels; records with NO mappable labels are
dropped and counted (numDroppedLogs, :123-136); surviving lines group into
one stream per unique label set.

Spark design: label mapping is a projection; "no mappable labels" is a
null-check filter; stream grouping is a groupBy on the label fingerprint.
One scan, one map-side-combinable shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def label_fingerprint(label_map: dict[str, str]) -> Column:
    """Sorted k=v label-set string (the stream identity), skipping nulls —
    matches the exporter's labels.String() stream key."""
    pairs = [
        F.when(
            F.col(attr).isNotNull(), F.concat(F.lit(f"{label}="), F.col(attr).cast("string"))
        )
        for attr, label in sorted(label_map.items(), key=lambda kv: kv[1])
    ]
    return F.array_join(F.array_compact(F.array(*pairs)), ",")


def to_loki_streams(
    df: DataFrame, label_map: dict[str, str], body_col: str
) -> DataFrame:
    """Rows -> one row per stream: (labels, n_lines, total_bytes), plus a
    labels='' row counting dropped records (no mappable label present)."""
    fp = label_fingerprint(label_map)
    return (
        df.select(fp.alias("labels"), F.col(body_col).alias("line"))
        .groupBy("labels")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.length("line")).alias("total_bytes"),
        )
    )


def to_loki_streams_oracle_sql(
    relation: str, label_map: dict[str, str], body_col: str
) -> str:
    """DuckDB equivalent of :func:`to_loki_streams`."""
    pairs = ", ".join(
        f"CASE WHEN {attr} IS NOT NULL THEN '{label}=' || CAST({attr} AS VARCHAR) END"
        for attr, label in sorted(label_map.items(), key=lambda kv: kv[1])
    )
    return f"""
SELECT array_to_string(list_filter([{pairs}], x -> x IS NOT NULL), ',') AS labels,
  COUNT(*) AS n_lines, SUM(strlen({body_col})) AS total_bytes
FROM {relation} GROUP BY 1
"""
