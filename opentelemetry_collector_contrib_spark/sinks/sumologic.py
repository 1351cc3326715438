"""Sumo Logic exporter metric line formats: Carbon2 and Graphite.

Reference: exporter/sumologicexporter/carbon_formatter.go and
graphite_formatter.go.

Carbon2 (carbon_formatter.go:29-84): one line per datapoint of shape
``<tags>  <value> <ts_sec>`` — note the TWO spaces between the tag string
and the value (:70, :80). Tags are space-separated ``k=v`` pairs from the
attributes, each key/value sanitized by replacing space->_, '='->':',
newline->_ (sanitizeCarbonString, :63-65); attribute keys literally named
``name``/``unit`` are prefixed with ``_`` (:46-48) because the formatter
appends its own ``metric=<metric name>`` and (when a unit exists)
``unit=<unit>`` pairs (:52-57). Go iterates attributes in map order; this
engine emits them in the caller-supplied column order (deterministic
refinement).

Graphite (graphite_formatter.go:53-99): the metric path is the template's
fields joined after escaping '.' and ' ' to '_' (escapeGraphiteString,
:47,:53-55; missing attributes render as empty strings :66-74), and the
line is ``<path> <value> <ts_sec>``.

Value rendering deviation: Go prints doubles with %g (:80, :92); Java's
%g pads to 6 significant digits, so instead of faking Go's formatter the
engine renders numerics with Spark's native cast-to-string (shortest
round-trip repr for doubles, plain digits for ints — identical to Go for
the int64 path, documented difference for the float path).

Both formatters are single JVM-side projections: no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sanitize_carbon(c: Column) -> Column:
    # strings.NewReplacer(" ", "_", "=", ":", "\n", "_")
    return F.translate(c, " =\n", "_:_")


def _escape_graphite(c: Column) -> Column:
    # strings.NewReplacer(`.`, `_`, ` `, `_`)
    return F.translate(c, ". ", "__")


def to_carbon2_lines(
    df: DataFrame,
    attr_cols: list[str],
    metric_name_col: str,
    value_col: str,
    ts_sec_col: str,
    unit_col: str | None = None,
) -> DataFrame:
    parts: list[Column] = []
    for k in attr_cols:
        key = f"_{k}" if k in ("name", "unit") else k
        parts.append(
            F.concat(
                _sanitize_carbon(F.lit(key)),
                F.lit("="),
                _sanitize_carbon(F.col(k).cast("string")),
            )
        )
    parts.append(
        F.concat(
            F.lit("metric="), _sanitize_carbon(F.col(metric_name_col).cast("string"))
        )
    )
    if unit_col is not None:
        parts.append(
            F.concat(
                F.lit("unit="), _sanitize_carbon(F.col(unit_col).cast("string"))
            )
        )
    tags = F.concat_ws(" ", *parts)
    return df.select(
        F.concat(
            tags,
            F.lit("  "),
            F.col(value_col).cast("string"),
            F.lit(" "),
            F.col(ts_sec_col).cast("long").cast("string"),
        ).alias("line")
    )


def to_graphite_lines(
    df: DataFrame,
    template_cols: list[str],
    value_col: str,
    ts_sec_col: str,
) -> DataFrame:
    path = F.concat_ws(
        ".",
        *[
            _escape_graphite(F.coalesce(F.col(c).cast("string"), F.lit("")))
            for c in template_cols
        ],
    )
    return df.select(
        F.concat(
            path,
            F.lit(" "),
            F.col(value_col).cast("string"),
            F.lit(" "),
            F.col(ts_sec_col).cast("long").cast("string"),
        ).alias("line")
    )
