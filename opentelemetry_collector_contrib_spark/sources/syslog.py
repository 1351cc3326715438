"""syslog receiver analogue: RFC3164 / RFC5424 line parsing.

Reference: receiver/syslogreceiver/syslog.go:69-88 wires TCP/UDP input into
the stanza syslog_parser; the parser grammar is the standard RFC3164
(``<PRI>MMM dd HH:MM:SS host tag: msg``) and RFC5424
(``<PRI>1 RFC3339TS host app procid msgid [SD] msg``) forms. PRI encodes
facility*8+severity.

Spark design: both grammars are fixed regexes -> JVM ``regexp_extract``
columns, fully inside whole-stage codegen (no Python). The protocol picker
is a stanza-router-style predicate (functions/parse.router).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RFC5424_RE = (
    r"^<(\d{1,3})>1 (\S+) (\S+) (\S+) (\S+) (\S+) (\[.*?\]|-) ?(.*)$"
)
RFC3164_RE = (
    r"^<(\d{1,3})>([A-Z][a-z]{2} [ \d]\d \d{2}:\d{2}:\d{2}) (\S+) ([^:\[ ]+)(?:\[(\d+)\])?: ?(.*)$"
)


def parse_rfc5424(df: DataFrame, line_col: str = "line") -> DataFrame:
    """RFC5424 parse -> typed columns + facility/severity from PRI."""
    c = F.col(line_col)
    pri = F.regexp_extract(c, RFC5424_RE, 1).try_cast("int")
    return df.select(
        *df.columns,
        pri.alias("pri"),
        F.floor(pri / 8).cast("int").alias("facility"),
        (pri % 8).alias("severity"),
        F.regexp_extract(c, RFC5424_RE, 2).alias("syslog_ts"),
        F.regexp_extract(c, RFC5424_RE, 3).alias("hostname"),
        F.regexp_extract(c, RFC5424_RE, 4).alias("appname"),
        F.regexp_extract(c, RFC5424_RE, 5).alias("procid"),
        F.regexp_extract(c, RFC5424_RE, 6).alias("msgid"),
        F.nullif(F.regexp_extract(c, RFC5424_RE, 7), F.lit("-")).alias("structured_data"),
        F.regexp_extract(c, RFC5424_RE, 8).alias("message"),
        (F.regexp_extract(c, RFC5424_RE, 1) != "").alias("parse_ok"),
    )


def parse_rfc3164(df: DataFrame, line_col: str = "line") -> DataFrame:
    """RFC3164 (BSD) parse -> typed columns."""
    c = F.col(line_col)
    pri = F.regexp_extract(c, RFC3164_RE, 1).try_cast("int")
    return df.select(
        *df.columns,
        pri.alias("pri"),
        F.floor(pri / 8).cast("int").alias("facility"),
        (pri % 8).alias("severity"),
        F.regexp_extract(c, RFC3164_RE, 2).alias("syslog_ts"),
        F.regexp_extract(c, RFC3164_RE, 3).alias("hostname"),
        F.regexp_extract(c, RFC3164_RE, 4).alias("appname"),
        F.regexp_extract(c, RFC3164_RE, 5).try_cast("int").alias("procid"),
        F.regexp_extract(c, RFC3164_RE, 6).alias("message"),
        (F.regexp_extract(c, RFC3164_RE, 1) != "").alias("parse_ok"),
    )


def parse_rfc5424_oracle_sql(relation: str, line_col: str = "line") -> str:
    """DuckDB equivalent of :func:`parse_rfc5424`. DuckDB's regexp_extract
    takes a group index just like Spark's."""
    r = RFC5424_RE.replace("'", "''")
    g = lambda i: f"regexp_extract({line_col}, '{r}', {i})"  # noqa: E731
    return f"""
SELECT *, TRY_CAST({g(1)} AS INTEGER) AS pri,
  CAST(TRY_CAST({g(1)} AS INTEGER) // 8 AS INTEGER) AS facility,
  TRY_CAST({g(1)} AS INTEGER) % 8 AS severity,
  {g(2)} AS syslog_ts, {g(3)} AS hostname, {g(4)} AS appname,
  {g(5)} AS procid, {g(6)} AS msgid,
  nullif({g(7)}, '-') AS structured_data, {g(8)} AS message,
  {g(1)} != '' AS parse_ok
FROM {relation}
"""
