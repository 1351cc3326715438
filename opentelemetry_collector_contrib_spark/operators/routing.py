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
    """Mirrors routingprocessor config.go:22-52.

    ``table`` values may be a single sink name or a LIST of sink names —
    the reference's ``RoutingTableItem.Exporters []string`` (config.go:
    43-52) sends one record to every exporter the route names, so a list
    entry duplicates the record into each sink by design.  Likewise
    ``default_sink`` may be a list (``DefaultExporters``).
    """

    from_attribute: str
    table: dict[str, str | list[str]]  # attribute value -> sink name(s)
    default_sink: str | list[str] = "sink_default"
    # extra predicate routes evaluated BEFORE the table (quarantine lanes);
    # name -> boolean Column
    predicate_routes: list[tuple[str, Column]] = field(default_factory=list)


def _as_list(v: str | list[str]) -> list[str]:
    return [v] if isinstance(v, str) else list(v)


def routes_tag(cfg: RoutingConfig) -> Column:
    """ARRAY<STRING> of every sink a record goes to (routing.go:133-147
    + pushDataToExporters over the matched exporter LIST): predicate lanes
    first (single sink each), then exact value match, else the default
    exporter list."""
    out: Column | None = None
    for name, cond in cfg.predicate_routes:
        arm = F.array(F.lit(name))
        out = F.when(cond, arm) if out is None else out.when(cond, arm)
    attr = F.col(cfg.from_attribute)
    for value, sinks in cfg.table.items():
        arm = F.array(*[F.lit(s) for s in _as_list(sinks)])
        cond = attr == F.lit(value)
        out = F.when(cond, arm) if out is None else out.when(cond, arm)
    default = F.array(*[F.lit(s) for s in _as_list(cfg.default_sink)])
    assert out is not None
    return out.otherwise(default)


def route_tag(cfg: RoutingConfig) -> Column:
    """Single-route expression (the record's FIRST sink) — the common case
    where every table entry names exactly one exporter.  For list entries
    use :func:`routes_tag` + :func:`explode_routes`; Catalyst constant-
    folds ``element_at(array('x'), 1)`` back to the literal for scalar
    configs, so existing single-sink plans are unchanged."""
    return F.element_at(routes_tag(cfg), 1)


def with_route(df: DataFrame, cfg: RoutingConfig) -> DataFrame:
    return df.withColumn("route", route_tag(cfg))


def with_routes(df: DataFrame, cfg: RoutingConfig) -> DataFrame:
    return df.withColumn("routes", routes_tag(cfg))


def explode_routes(df: DataFrame) -> DataFrame:
    """One row per (record, sink) — feed this straight into the clustered
    fan-out write (sinks/writer.py): still ONE scan of the input; the only
    data growth is the duplicated-by-design multi-sink records."""
    return df.withColumn("route", F.explode("routes")).drop("routes")


def all_sinks(cfg: RoutingConfig) -> list[str]:
    names = [n for n, _ in cfg.predicate_routes]
    for sinks in cfg.table.values():
        names.extend(_as_list(sinks))
    names.extend(_as_list(cfg.default_sink))
    return list(dict.fromkeys(names))


def fan_out(df: DataFrame, cfg: RoutingConfig) -> dict[str, DataFrame]:
    """Per-sink DataFrames from ONE tagged plan. The caller should either
    write them from a cached parent or prefer ``write.partitionBy('route')``
    (sinks/writer.py) so the input is scanned once at 100 TB.
    """
    tagged = with_routes(df, cfg)
    return {
        s: tagged.filter(F.array_contains(F.col("routes"), s)).drop("routes")
        for s in all_sinks(cfg)
    }
