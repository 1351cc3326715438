"""InfluxDB line protocol decoder.

Reference: receiver/influxdbreceiver (which delegates wire parsing to the
upstream influxdata line-protocol library; the format contract is
https://docs.influxdata.com/influxdb/v2/reference/syntax/line-protocol/):

    measurement[,tag_key=tag_value...] field_key=field_value[,...] [ts_ns]

Semantics reproduced:
  - identifier escaping: ``\\,`` ``\\ `` ``\\=`` inside measurement, tag
    keys/values and field keys; string field values are double-quoted with
    ``\\"`` and ``\\\\`` escapes;
  - field value typing: ``123i`` → int, ``"…"`` → string, ``true/false``
    (any case per the lib: t/T/true/True/TRUE …) → bool, else float;
  - timestamp is optional integer **nanoseconds**; when omitted the line
    is stamped server-side — here it surfaces as NULL ``ts`` for the
    caller to fill (same batch-engine deviation as sources/wavefront.py);
  - a line with no valid field section is invalid (the lib rejects it).

Output is one row per field (the receiver likewise fans a line's fields
into separate metrics): (measurement, tags MAP, field_key, value DOUBLE
for numeric/bool, value_str for strings, field_type, ts, valid).

Pure JVM regex/higher-order functions — a single map stage, no shuffle,
no Python; the same scale posture as the other wire-format decoders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.functions.maputil import (
    map_from_arrays_last_wins,
)

# one measurement/tag token: escaped char or anything but comma/backslash
_ID_TOKEN = r"(?:[^,\\]|\\.)+"
# fields section token: quoted string (with escapes) or escaped/plain chars
_FIELD_TOKEN = r'(?:[^,"\\]|\\.|"(?:[^"\\]|\\.)*")+'
# whole line: section1 (no unescaped space), fields (quotes absorb spaces),
# optional integer ns timestamp
_LINE_RE = (
    r'^((?:[^ \\]|\\.)+) ((?:[^ "\\]|\\.|"(?:[^"\\]|\\.)*")+)( -?\d+)?$'
)

_TRUE_RE = "^(t|T|true|True|TRUE)$"
_FALSE_RE = "^(f|F|false|False|FALSE)$"


def _unescape(col):
    """Remove identifier escapes: ``\\x`` → ``x``."""
    return F.regexp_replace(col, r"\\(.)", "$1")


def parse_influx_lines(df: DataFrame, line_col: str = "line") -> DataFrame:
    line = F.col(line_col)
    sec1 = F.regexp_extract(line, _LINE_RE, 1)
    sec2 = F.regexp_extract(line, _LINE_RE, 2)
    ts_str = F.trim(F.regexp_extract(line, _LINE_RE, 3))
    line_ok = sec1 != ""

    id_tokens = F.regexp_extract_all(sec1, F.lit(f"({_ID_TOKEN})"), 1)
    measurement = _unescape(F.get(id_tokens, 0))
    tag_tokens = F.slice(id_tokens, 2, F.size(id_tokens))
    # each tag must be key=value with an unescaped '='
    tag_re = r"^(?:[^=\\]|\\.)+=(?:[^=\\]|\\.)*$"
    tags_ok = F.forall(tag_tokens, lambda t: t.rlike(tag_re))
    # last-wins on duplicate tag keys; never throws under
    # mapKeyDedupPolicy=EXCEPTION (a dup key is a per-line matter)
    tags = map_from_arrays_last_wins(
        F.transform(
            tag_tokens,
            lambda t: _unescape(F.regexp_extract(t, r"^((?:[^=\\]|\\.)+)=", 1)),
        ),
        F.transform(
            tag_tokens,
            lambda t: _unescape(F.regexp_replace(t, r"^(?:[^=\\]|\\.)+=", "")),
        ),
    )

    field_tokens = F.regexp_extract_all(sec2, F.lit(f"({_FIELD_TOKEN})"), 1)
    field_re = r'^(?:[^=\\"]|\\.)+=(?:"(?:[^"\\]|\\.)*"|[^="]+)$'
    fields_ok = (F.size(field_tokens) > 0) & F.forall(
        field_tokens, lambda t: t.rlike(field_re)
    )

    ts_ns = ts_str.try_cast("long")
    ts_ok = (ts_str == "") | ts_ns.isNotNull()

    valid = F.coalesce(
        line_ok & (measurement != "") & tags_ok & fields_ok & ts_ok,
        F.lit(False),
    )

    exploded = (
        df.select(
            measurement.alias("measurement"),
            tags.alias("tags"),
            # integer ns -> µs (exact int64 `div`, truncating toward zero
            # like Go) — double division would lose ~hundreds of ns at
            # current epoch values in a nanosecond-precision protocol
            F.when(ts_str != "", ts_ns).alias("__ts_ns"),
            valid.alias("valid"),
            F.when(valid, field_tokens)
            .otherwise(F.array(F.lit("")))
            .alias("__fields"),
        )
        .select("*", F.explode("__fields").alias("__f"))
        .drop("__fields")
    )
    raw_val = F.regexp_replace(F.col("__f"), r'^(?:[^=\\"]|\\.)+=', "")
    is_str = raw_val.rlike('^".*"$')
    is_int = raw_val.rlike("^-?\\d+i$")
    is_bool = raw_val.rlike(_TRUE_RE) | raw_val.rlike(_FALSE_RE)
    num = F.when(is_int, F.regexp_replace(raw_val, "i$", "").try_cast("double")) \
        .when(is_bool, F.when(raw_val.rlike(_TRUE_RE), 1.0).otherwise(0.0)) \
        .when(~is_str, raw_val.try_cast("double"))
    str_val = F.when(
        is_str,
        F.regexp_replace(
            F.regexp_replace(
                F.substring(raw_val, 2, F.length(raw_val) - 2), r'\\"', '"'
            ),
            r"\\\\",
            r"\\",
        ),
    )
    ftype = (
        F.when(is_str, "string")
        .when(is_int, "int")
        .when(is_bool, "bool")
        .when(num.isNotNull(), "float")
        .otherwise("invalid")
    )
    # a numeric-typed token that fails the cast invalidates the whole line
    # in the reference lib; flag it per-row here
    row_valid = F.col("valid") & (is_str | num.isNotNull())
    return exploded.select(
        "measurement",
        "tags",
        _unescape(
            F.regexp_extract(F.col("__f"), r'^((?:[^=\\"]|\\.)+)=', 1)
        ).alias("field_key"),
        num.alias("value"),
        str_val.alias("value_str"),
        ftype.alias("field_type"),
        F.expr("timestamp_micros(__ts_ns div 1000)").alias("ts"),
        row_valid.alias("valid"),
    )


# ---------------------------------------------------------------------------
# exporter direction (exporter/influxdbexporter — rows -> line protocol)
# ---------------------------------------------------------------------------

def _escape_id(col):
    """Identifier escaping for tag keys/values and field keys: backslash
    before ',', ' ', '=' and '\\' itself (one pass — each special gains
    its own backslash; the char class includes backslash so pre-existing
    ones double, matching the lib's writeEscaped)."""
    return F.regexp_replace(col, r"([\\, =])", r"\\$1")


def _escape_measurement(col):
    """Measurement escapes only ',' and ' ' (an unescaped '=' is legal
    there per the line-protocol spec — the v2 encoder leaves it alone)."""
    return F.regexp_replace(col, r"([\\, ])", r"\\$1")


def _escape_str_val(col):
    """String field values: double-quoted with '\\' and '\"' escapes."""
    return F.concat(
        F.lit('"'), F.regexp_replace(col, r'([\\"])', r"\\$1"), F.lit('"')
    )


def to_influx_lines(
    df: DataFrame,
    measurement_col: str = "measurement",
    tags_col: str | None = "tags",
    float_fields_col: str | None = None,
    int_fields_col: str | None = None,
    str_fields_col: str | None = None,
    bool_fields_col: str | None = None,
    ts_col: str | None = "ts",
) -> DataFrame:
    """Rows → InfluxDB line-protocol lines (exporter/influxdbexporter:
    writer.go:70-76 configures the upstream lineprotocol.Encoder strict
    at nanosecond precision; the wire contract is the same spec the
    decoder above parses).

    Encoder semantics reproduced:
      - tags sorted lexicographically by key (the strict encoder REQUIRES
        sorted tags — unsorted input is an encode error in lax=false);
      - identifier escaping on measurement/keys/values, quoted-string
        escaping on string field values;
      - typed field rendering: int → ``123i``, bool → ``true``/``false``,
        string → quoted, float → shortest-form via Spark's double
        rendering (callers needing byte parity with Go's strconv should
        round-trip through :func:`parse_influx_lines`, which types by
        shape, not by byte);
      - optional trailing integer nanosecond timestamp.

    Field maps are rendered float → int → string → bool, each key-sorted:
    a deterministic canonical order (the Go encoder writes insertion
    order, which a MAP cannot preserve — documented deviation, lossless
    on decode).  Rows with no field in any map render NULL ``line`` (a
    fieldless line is invalid on the wire — the encoder refuses it).
    """
    def _map_entries(col_name, render_val):
        if col_name is None:
            return F.array().cast("array<string>")
        entries = F.map_entries(F.col(col_name))
        return F.transform(
            F.array_sort(entries),
            lambda e: F.concat(
                _escape_id(e["key"]), F.lit("="), render_val(e["value"])
            ),
        )

    parts = F.concat(
        _map_entries(float_fields_col, lambda v: v.cast("string")),
        _map_entries(int_fields_col, lambda v: F.concat(
            v.cast("long").cast("string"), F.lit("i"))),
        _map_entries(str_fields_col, _escape_str_val),
        _map_entries(bool_fields_col, lambda v: F.when(
            v, F.lit("true")).otherwise(F.lit("false"))),
    )
    fields_str = F.array_join(parts, ",")

    tag_section = F.lit("")
    if tags_col is not None:
        tag_entries = F.transform(
            F.array_sort(F.map_entries(F.col(tags_col))),
            lambda e: F.concat(
                _escape_id(e["key"]), F.lit("="), _escape_id(e["value"])
            ),
        )
        tag_section = F.when(
            F.size(tag_entries) > 0,
            F.concat(F.lit(","), F.array_join(tag_entries, ",")),
        ).otherwise(F.lit(""))

    line = F.concat(
        _escape_measurement(F.col(measurement_col)),
        tag_section,
        F.lit(" "),
        fields_str,
    )
    if ts_col is not None:
        line = F.concat(
            line, F.lit(" "), F.col(ts_col).cast("long").cast("string")
        )
    return df.select(
        F.when(fields_str != "", line).alias("line")
    )
