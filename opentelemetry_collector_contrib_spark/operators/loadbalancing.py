"""loadbalancing exporter analogue: deterministic hash routing to backends.

Reference: exporter/loadbalancingexporter/consistent_hashing.go:24-60 — a
Karger-style ring of crc32 hash points routes whole traces by TraceID to
backend endpoints; log_exporter.go:97-103 routes logs the same way.

Spark design: Spark's hash shuffle IS this operator
(SURVEY.md section 2.5). We expose two flavors:
  - ``hash_bucket`` — crc32-mod routing, matching the reference's hash
    family, for partitionBy-style fan-out;
  - ``md5_bucket`` — md5-prefix-mod routing, used when a DuckDB oracle must
    reproduce the exact assignment (both engines share md5).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash_bucket(key: Column, num_backends: int) -> Column:
    """crc32(key) % n — consistent_hashing.go hash family (crc32)."""
    return F.pmod(F.crc32(key.cast("string").cast("binary")), F.lit(num_backends))


def md5_bucket(key: Column, num_backends: int) -> Column:
    """Cross-engine deterministic bucket: first 15 md5 hex chars -> bigint %% n.
    DuckDB equivalent: ('0x' || substr(md5(x),1,15))::BIGINT %% n."""
    return F.pmod(
        F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast("long"),
        F.lit(num_backends),
    )


def md5_bucket_sql(key_sql: str, num_backends: int) -> str:
    """DuckDB expression matching :func:`md5_bucket`."""
    return (
        f"(('0x' || substr(md5(CAST({key_sql} AS VARCHAR)), 1, 15))::BIGINT"
        f" % {num_backends})"
    )


# ---------------------------------------------------------------------------
# Full consistent-hash ring (virtual nodes + lower-bound lookup)
# ---------------------------------------------------------------------------

RING_SPACE = 1 << 32


def ring_positions(endpoints: list[str], points_per_endpoint: int = 100) -> list[tuple[int, str]]:
    """Build the ring at config time, like newHashRing
    (consistent_hashing.go:24-49): ``points_per_endpoint`` virtual positions
    per backend (reference default 100), sorted by position. The reference
    hashes with crc32; we use an md5-derived 32-bit point so the per-row
    lookup below is reproducible in the DuckDB oracle (md5 exists in both
    engines; crc32 does not)."""
    import hashlib

    pos = []
    for ep in endpoints:
        for i in range(points_per_endpoint):
            h = int(hashlib.md5(f"{ep}:{i}".encode()).hexdigest()[:15], 16) % RING_SPACE
            pos.append((h, ep))
    pos.sort()
    return pos


def _key_hash_sql(key_sql: str, dialect: str) -> str:
    if dialect == "spark":
        return (
            f"pmod(CAST(conv(substring(md5(CAST({key_sql} AS STRING)), 1, 15), 16, 10)"
            f" AS BIGINT), {RING_SPACE})"
        )
    return f"(('0x' || substr(md5(CAST({key_sql} AS VARCHAR)), 1, 15))::BIGINT % {RING_SPACE})"


def ring_assign(key_sql: str, endpoints: list[str], points_per_endpoint: int = 100) -> Column:
    """Per-row endpoint via lower-bound ring lookup — the exact semantics of
    consistent_hashing.go:71-105 (binary search for the first point >= hash,
    wrapping to the first point). The ring is a literal array (built at
    config time, broadcast with the plan); the lookup is a JVM array filter,
    no shuffle, no Python."""
    ring = ring_positions(endpoints, points_per_endpoint)
    arr = "array(" + ",".join(
        f"struct({p}L AS pos, '{ep}' AS endpoint)" for p, ep in ring
    ) + ")"
    h = _key_hash_sql(key_sql, "spark")
    # try_element_at: ANSI mode (Spark 4 default) makes element_at throw on
    # an empty filter result (key hashes past the last ring point -> wrap)
    return F.expr(
        f"coalesce(try_element_at(filter({arr}, r -> r.pos >= {h}), 1).endpoint,"
        f" try_element_at({arr}, 1).endpoint)"
    )


def ring_assign_oracle_sql(
    relation: str,
    key_sql: str,
    out_cols: str,
    endpoints: list[str],
    points_per_endpoint: int = 100,
) -> str:
    """DuckDB query matching :func:`ring_assign` over ``relation``."""
    ring = ring_positions(endpoints, points_per_endpoint)
    values = ", ".join(f"({p}, '{ep}')" for p, ep in ring)
    h = _key_hash_sql(key_sql, "duckdb")
    first = min(ring)[1]
    return f"""
WITH ring(pos, endpoint) AS (VALUES {values})
SELECT {out_cols},
  COALESCE(
    (SELECT endpoint FROM ring WHERE pos >= {h} ORDER BY pos LIMIT 1),
    '{first}') AS backend
FROM {relation}
"""
