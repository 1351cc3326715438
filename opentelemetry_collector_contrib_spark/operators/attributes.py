"""Attribute/resource mutation + enrichment operators.

Reference semantics reproduced here:

- insert-if-absent vs upsert merge, resourcedetectionprocessor's
  ``override`` flag (internal/resourcedetection.go:178-196) and
  k8sprocessor's insert-only attribute add (processor.go:108-115).
- lookup enrichment = broadcast hash join (SURVEY.md section 2.6): the
  collector has no relational join; all its "joins" are stream x small
  in-memory dimension lookups (k8sprocessor kube/client.go:190-258), which
  is exactly Spark's broadcast join. At 100 TB the fact side never
  shuffles — the dimension ships to every executor.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def upsert_attrs(df: DataFrame, attrs: dict[str, Column], override: bool) -> DataFrame:
    """resourcedetection merge (internal/resourcedetection.go:178-196):
    override=False -> insert-if-absent (existing non-null values win);
    override=True  -> upsert (detected values win).
    Missing columns are always created.
    """
    out = df
    for name, val in attrs.items():
        if name not in out.columns:
            out = out.withColumn(name, val)
        elif override:
            out = out.withColumn(name, val)
        else:
            # backticks: otel attr names carry dots (host.name) which plain
            # F.col would resolve as a struct-field path
            safe = name.replace("`", "``")
            out = out.withColumn(name, F.coalesce(F.col(f"`{safe}`"), val))
    return out


def delete_attrs(df: DataFrame, names: list[str]) -> DataFrame:
    """attributes-processor delete / groupbyattrs record-level deletion
    (groupbyattrsprocessor/processor.go:110-133)."""
    return df.drop(*[n for n in names if n in df.columns])


def map_upsert(attr_map: Column, key: str, value: Column, override: bool) -> Column:
    """Same insert/upsert semantics on a MapType attributes column."""
    existing = F.element_at(attr_map, key)
    new_val = value if override else F.coalesce(existing, value)
    return F.map_concat(
        F.map_filter(attr_map, lambda k, _: k != F.lit(key)),
        F.map_from_arrays(F.array(F.lit(key)), F.array(new_val)),
    )


def enrich_lookup_ttl(
    facts: DataFrame,
    dim: DataFrame,
    on: str,
    attrs: list[str],
    fact_ts_col: str,
    dim_ts_col: str,
    ttl: str,
    prefix: str = "",
) -> DataFrame:
    """ttlmap-bounded enrichment (k8sprocessor kube/client.go ttlmap /
    internal/k8sconfig cache expiry): a dimension entry inserted at
    ``dim_ts_col`` is valid for ``ttl`` (an INTERVAL literal body, e.g.
    ``'1300' DAY``); a fact joins it only while
    dim_ts <= fact_ts < dim_ts + ttl — stale cache entries behave as
    lookup misses (attributes stay NULL), exactly like an expired ttlmap
    slot. Broadcast hash join with the validity window as a residual
    condition; the fact side never shuffles."""
    sel = [F.col(on).alias(f"__dim_{on}"), F.col(dim_ts_col).alias("__dim_ts")] + [
        F.col(a).alias(f"__dim_{a}") for a in attrs
    ]
    valid = (F.col(fact_ts_col) >= F.col("__dim_ts")) & (
        F.col(fact_ts_col) < F.expr(f"__dim_ts + INTERVAL {ttl}")
    )
    joined = facts.join(
        F.broadcast(dim.select(*sel)),
        (facts[on] == F.col(f"__dim_{on}")) & valid,
        "left",
    ).drop(f"__dim_{on}", "__dim_ts")
    out = joined
    for a in attrs:
        out = out.withColumn(f"{prefix}{a}", F.col(f"__dim_{a}"))
    return out.drop(*[f"__dim_{a}" for a in attrs])


def enrich_lookup(
    facts: DataFrame,
    dim: DataFrame,
    on: str,
    attrs: list[str],
    override: bool = False,
    prefix: str = "",
) -> DataFrame:
    """k8sprocessor-style enrichment (processor/k8sprocessor/processor.go:72-124):
    broadcast-join the dimension, then merge each attribute with
    insert-if-absent (the reference only sets attributes that aren't
    already present) or override semantics.
    """
    sel = [F.col(on).alias(f"__dim_{on}")] + [F.col(a).alias(f"__dim_{a}") for a in attrs]
    joined = facts.join(
        F.broadcast(dim.select(*sel)),
        facts[on] == F.col(f"__dim_{on}"),
        "left",
    ).drop(f"__dim_{on}")
    merged = upsert_attrs(
        joined,
        {f"{prefix}{a}": F.col(f"__dim_{a}") for a in attrs},
        override=override,
    )
    return merged.drop(*[f"__dim_{a}" for a in attrs])
