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
