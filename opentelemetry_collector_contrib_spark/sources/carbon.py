"""Carbon (Graphite plaintext) line protocol — receiver and exporter
directions.

Reference semantics:
  - receiver/carbonreceiver/protocol/path_parser_helper.go:101-135 — a line
    is exactly ``<metric_path> <metric_value> <metric_timestamp>`` (SplitN
    on single spaces must yield 3 parts); value parses as int64 first, then
    float64; timestamp is integer unix seconds (ParseInt — a fractional
    timestamp invalidates the line).
  - receiver/carbonreceiver/protocol/plaintext_parser.go:51-90 — the path
    is ``<metric_name>[;tag0;...;tagN]``; the name terminates at the first
    ';' and must be non-empty; each tag is ``key=val`` where the '=' must
    appear at index >= 1 (empty key is invalid), key excludes ``;!^=`` and
    val excludes ``;~`` (val may be empty).
  - exporter/carbonexporter/metricdata_to_plaintext.go:289-326 — the
    exporter builds the same shape back: name, then ``;key=value`` per
    label, then space, value text, space, unix-seconds text.

Invalid lines are kept with ``valid = false`` (the receiver counts and
drops them — obsreport refused counts; the caller filters), mirroring the
per-line error returns.

Everything is JVM-side (split / regexp / map_from_arrays / try_cast) — no
Python in the path, so the parse rides whole-stage codegen and scales as a
pure map stage: no shuffle, predicate pushdown unaffected.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.functions.maputil import (
    map_from_arrays_last_wins,
)

# plaintext_parser.go:64-88 — the code only requires '=' at index >= 1
# (IndexByte; empty key is the sole rejection).  The doc comment's charset
# (key excludes ";!^=", val excludes ";~") is NOT enforced by the parser,
# so we match the code, not the comment: at least one non-'=' char, then
# '=', then anything (tokens already contain no ';' — they came from the
# split).  The value may itself contain '=' (tag[idx+1:]).
_TAG_RE = "^[^=]+="

# |seconds| bound representable in Spark's int64-microsecond timestamps
# (Long.MAX / 1_000_000).  The reference's strconv.ParseInt accepts any
# int64 timestamp and the line stays valid (path_parser_helper.go:118-124);
# out-of-range-for-Spark stamps surface as NULL ts, valid stays true.
_TS_SEC_MAX = 9_223_372_036_854


def parse_carbon_lines(df: DataFrame, line_col: str = "line") -> DataFrame:
    """Parse Carbon plaintext lines into
    (metric_name, tags MAP<STRING,STRING>, value DOUBLE, is_int, ts, valid).

    ``is_int`` mirrors the receiver's int64-first parse (gauge_int64 vs
    gauge_double metric type, path_parser_helper.go:126-147).
    """
    line = F.col(line_col)
    parts = F.split(line, " ")
    # F.get (not getItem): NULL on out-of-range even under ANSI mode, so a
    # short line flags valid=false instead of raising INVALID_ARRAY_INDEX
    path = F.get(parts, 0)
    value_str = F.get(parts, 1)
    ts_str = F.get(parts, 2)

    name = F.substring_index(path, ";", 1)
    has_tags = F.instr(path, ";") > 0
    # everything after the first ';' (may be empty: "name;" has no tags,
    # plaintext_parser.go:63-66)
    tags_str = F.when(has_tags, F.regexp_replace(path, "^[^;]*;", "")).otherwise(
        F.lit("")
    )
    tag_tokens = F.when(
        tags_str == "", F.array().cast("array<string>")
    ).otherwise(F.split(tags_str, ";"))
    tags_ok = F.forall(tag_tokens, lambda t: t.rlike(_TAG_RE))
    # key = text before the first '='; value = text after it (may be empty).
    # Duplicate keys are legal (the reference appends both to its label
    # list); a MAP model keeps the last occurrence — never throws under
    # mapKeyDedupPolicy=EXCEPTION.
    tags = map_from_arrays_last_wins(
        F.transform(tag_tokens, lambda t: F.substring_index(t, "=", 1)),
        F.transform(tag_tokens, lambda t: F.regexp_replace(t, "^[^=]*=", "")),
    )

    int_val = value_str.try_cast("long")
    dbl_val = value_str.try_cast("double")
    ts_sec = ts_str.try_cast("long")

    valid = F.coalesce(
        (F.size(parts) == 3)
        & (name != "")
        & tags_ok
        & dbl_val.isNotNull()
        & ts_sec.isNotNull(),
        F.lit(False),
    )
    return df.select(
        name.alias("metric_name"),
        tags.alias("tags"),
        dbl_val.alias("value"),
        int_val.isNotNull().alias("is_int"),
        F.when(
            ts_sec.between(-_TS_SEC_MAX, _TS_SEC_MAX),
            F.timestamp_seconds(ts_sec),
        ).alias("ts"),
        valid.alias("valid"),
    )


def to_carbon_lines(
    df: DataFrame,
    name_col: str,
    tag_cols: list[str],
    value_col: str,
    ts_col: str,
) -> DataFrame:
    """Exporter direction (metricdata_to_plaintext.go:289-326): one line
    per row, ``name[;k=v...] value unix_seconds``. Tag order is the given
    ``tag_cols`` order, matching the exporter's label-key order."""
    pieces: list[Column] = [F.col(name_col).cast("string")]
    for t in tag_cols:
        pieces.append(F.concat(F.lit(f";{t}="), F.col(t).cast("string")))
    path = F.concat(*pieces) if len(pieces) > 1 else pieces[0]
    line = F.concat_ws(
        " ",
        path,
        F.col(value_col).cast("string"),
        F.unix_timestamp(F.col(ts_col)).cast("string"),
    )
    return df.select(line.alias("line"))
