"""Routing processor analogue — the fan-out-to-sinks primitive.

Reference: processor/routingprocessor/routing.go:133-147 + config.go:22-52.
A routing table maps values of one ``from_attribute`` to exporter lists;
rows whose value is missing/unmatched go to ``default_exporters``. The
processor is terminal: each record goes to exactly the sinks its route
names.

Spark design (SURVEY.md section 2.5): derive one ``route`` tag column with a
``when`` ladder (codegen'd, no shuffle), then either
  (a) one pass: ``df.write.partitionBy(route)`` when sinks share a format —
      a single job, no cache, the scale-preferred plan; or
  (b) per-sink filtered writes from one cached DataFrame when sinks differ.

batchperresourceattr (pkg/batchperresourceattr/batchperresourceattr.go:42-75)
— "split one batch per distinct resource-attribute value" — is the same
primitive and is covered by (a).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class RoutingConfig:
    """Mirrors routingprocessor config.go:22-52."""

    from_attribute: str
    table: dict[str, str]  # attribute value -> sink name
    default_sink: str = "sink_default"
    # extra predicate routes evaluated BEFORE the table (quarantine lanes);
    # name -> boolean Column
    predicate_routes: list[tuple[str, Column]] = field(default_factory=list)


def route_tag(cfg: RoutingConfig) -> Column:
    """The route-selection expression (routing.go:133-147): predicate lanes
    first, then exact value match, else default."""
    out: Column | None = None
    for name, cond in cfg.predicate_routes:
        out = F.when(cond, F.lit(name)) if out is None else out.when(cond, F.lit(name))
    attr = F.col(cfg.from_attribute)
    for value, sink in cfg.table.items():
        cond = attr == F.lit(value)
        out = F.when(cond, F.lit(sink)) if out is None else out.when(cond, F.lit(sink))
    assert out is not None
    return out.otherwise(F.lit(cfg.default_sink))


def with_route(df: DataFrame, cfg: RoutingConfig) -> DataFrame:
    return df.withColumn("route", route_tag(cfg))


def all_sinks(cfg: RoutingConfig) -> list[str]:
    names = [n for n, _ in cfg.predicate_routes]
    names += list(dict.fromkeys(cfg.table.values()))
    if cfg.default_sink not in names:
        names.append(cfg.default_sink)
    return names


def fan_out(df: DataFrame, cfg: RoutingConfig) -> dict[str, DataFrame]:
    """Per-sink DataFrames from ONE tagged plan. The caller should either
    write them from a cached parent or prefer ``write.partitionBy('route')``
    (sinks/writer.py) so the input is scanned once at 100 TB.
    """
    tagged = with_route(df, cfg)
    return {s: tagged.filter(F.col("route") == s) for s in all_sinks(cfg)}
