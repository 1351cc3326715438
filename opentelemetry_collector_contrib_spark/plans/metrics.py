"""Collector-style pipeline metrics (obsreport analogue).

Reference contract (SURVEY.md section 2.9):
  - receiver obsreport accepted/refused counts
    (receiver/splunkhecreceiver/receiver.go:206,285)
  - processor metrics: num_grouped_logs / num_non_grouped_logs
    (processor/groupbyattrsprocessor/metrics.go:24-29)
  - exporter dropped counts (exporter/lokiexporter/exporter.go:123-136)

Spark design: counts are computed FROM THE SAME TAGGED PLAN that routes the
rows (one scan, codegen'd conditional sums), not from separate ``count()``
actions — at 100 TB a second scan per counter would double I/O. The result
is a one-row metrics DataFrame per stage plus a conservation check:
``accepted == refused + dropped + sum(routed per sink)``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class PipelineMetrics:
    """Accumulated per-run metrics; one row per (stage, name)."""

    rows: dict[tuple[str, str], int] = field(default_factory=dict)

    def add(self, stage: str, name: str, value: int) -> None:
        self.rows[(stage, name)] = self.rows.get((stage, name), 0) + int(value)

    def get(self, stage: str, name: str) -> int:
        return self.rows.get((stage, name), 0)

    def to_df(self, spark: SparkSession) -> DataFrame:
        data = [(s, n, v) for (s, n), v in sorted(self.rows.items())]
        return spark.createDataFrame(data, "stage string, name string, value long")

    def conservation_ok(self) -> bool:
        """accepted == refused + dropped + sum(per-sink routed)."""
        accepted = self.get("receiver", "accepted")
        refused = self.get("receiver", "refused")
        dropped = self.get("exporter", "dropped")
        routed = sum(
            v for (s, n), v in self.rows.items() if s == "exporter" and n.startswith("routed_")
        )
        return accepted == refused + dropped + routed


def routed_counts(tagged: DataFrame, route_col: str = "route") -> DataFrame:
    """Per-sink routed row counts from the tagged plan (single pass)."""
    return tagged.groupBy(route_col).agg(F.count(F.lit(1)).alias("rows"))
