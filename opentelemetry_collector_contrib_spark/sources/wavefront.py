"""Wavefront wire-format line parser.

Reference: receiver/wavefrontreceiver/wavefront_parser.go:55-139 (line
shape) and :171-230 (tag tokenizer).

Line shape: ``<metricName> <metricValue> [<timestamp>] source=<source>
[pointTags]`` where
  - the name may be double-quoted (unDoubleQuote, :254-259) and must be
    non-empty;
  - the value parses int64-first then float64 (``is_int`` mirrors
    GAUGE_INT64 vs GAUGE_DOUBLE, :75-86);
  - the timestamp is integer unix seconds and MAY be omitted — if the
    third token doesn't parse as an integer it must contain '=' (i.e. be a
    tag) or the line is invalid (:94-106). The reference stamps omitted
    timestamps with time.Now(); a batch engine has no "now", so omitted
    timestamps surface as NULL ``ts`` and the caller fills them
    (e.g. ``coalesce(ts, current_timestamp())``) — documented deviation;
  - tags are space-separated ``key=value`` pairs; values are optionally
    double-quoted, and inside quotes only ``\\"`` and ``\\n`` are escaped
    (the Wavefront SDK formatter's contract, :199-210); the tag region
    must be fully consumed by valid pairs (buildLabels errors on leftover
    junk, :176-178).

All parsing is JVM-side regex/higher-order functions: one map stage, no
shuffle, codegen-friendly — the same scale posture as sources/carbon.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.functions.maputil import (
    map_from_arrays_last_wins,
)

# |seconds| representable in Spark's int64-microsecond timestamps; the
# reference accepts any int64 stamp (wavefront_parser.go:94-98) — out-of-
# range values surface as NULL ts here, the line stays valid
_TS_SEC_MAX = 9_223_372_036_854

# one tag token: key (no space/'='), '=', then quoted-with-escapes or bare
_TAG_TOKEN = r'[^\s=]+=(?:"(?:[^"\\]|\\.)*"|[^ ]*)'
# the whole tag region must be tag tokens separated by spaces
_TAGS_FULL = rf"^(?:{_TAG_TOKEN})(?:\s+(?:{_TAG_TOKEN}))*$"


def parse_wavefront_lines(df: DataFrame, line_col: str = "line") -> DataFrame:
    """Parse Wavefront lines into (metric_name, value DOUBLE, is_int,
    ts TIMESTAMP nullable, tags MAP<STRING,STRING>, valid)."""
    line = F.col(line_col)
    parts = F.split(line, " ", 3)  # SplitN(line, " ", 3), :62
    raw_name = F.get(parts, 0)
    value_str = F.get(parts, 1)
    rest = F.get(parts, 2)

    # unDoubleQuote: strip one pair of surrounding double quotes
    name = F.when(
        raw_name.rlike('^".*"$') & (F.length(raw_name) >= 2),
        F.substring(raw_name, 2, F.length(raw_name) - 2),
    ).otherwise(raw_name)

    int_val = value_str.try_cast("long")
    dbl_val = value_str.try_cast("double")

    first_rest = F.substring_index(rest, " ", 1)
    ts_sec = first_rest.try_cast("long")
    has_ts = ts_sec.isNotNull()
    # ParseInt failed: only valid if the token is actually a tag (:99-101)
    ts_ok = has_ts | (F.instr(first_rest, "=") > 0)
    # drop the consumed timestamp token (plus following spaces) from rest
    tags_str = F.when(
        has_ts, F.regexp_replace(rest, r"^\S+\s*", "")
    ).otherwise(rest)

    tag_tokens = F.regexp_extract_all(F.coalesce(tags_str, F.lit("")), F.lit(f"({_TAG_TOKEN})"), 1)
    tags_ok = (F.coalesce(tags_str, F.lit("")) == "") | F.coalesce(
        tags_str, F.lit("")
    ).rlike(_TAGS_FULL)

    def _tag_value(t):
        raw = F.regexp_replace(t, "^[^=]*=", "")
        unq = F.substring(raw, 2, F.length(raw) - 2)
        # only \" and \n are escaped inside quotes (formatter.go contract)
        unesc = F.regexp_replace(
            F.regexp_replace(unq, r'\\"', '"'), r"\\n", "\n"
        )
        return F.when(raw.rlike('^".*"$'), unesc).otherwise(raw)

    # last-wins on duplicate tag keys (a Go map built in token order),
    # never throws under mapKeyDedupPolicy=EXCEPTION
    tags = map_from_arrays_last_wins(
        F.transform(tag_tokens, lambda t: F.substring_index(t, "=", 1)),
        F.transform(tag_tokens, _tag_value),
    )

    valid = F.coalesce(
        (F.size(parts) == 3)
        & (name != "")
        & dbl_val.isNotNull()
        & ts_ok
        & tags_ok,
        F.lit(False),
    )
    return df.select(
        name.alias("metric_name"),
        dbl_val.alias("value"),
        int_val.isNotNull().alias("is_int"),
        F.when(
            has_ts & ts_sec.between(-_TS_SEC_MAX, _TS_SEC_MAX),
            F.timestamp_seconds(ts_sec),
        ).alias("ts"),
        tags.alias("tags"),
        valid.alias("valid"),
    )
