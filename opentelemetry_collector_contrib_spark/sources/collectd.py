"""collectd JSON receiver — write_http JSON records → metric datapoints.

Reference: receiver/collectdreceiver/collectd.go.

Record shape (collectd.go:34-48): dsnames/dstypes/values parallel arrays
plus time (fractional unix seconds), interval, host, plugin,
plugin_instance, type, type_instance, and (for events) message/severity.

Semantics reproduced:
  - event detection: time+severity+message all present → event, no
    datapoints (isEvent, :50-52);
  - per-index datapoint guard ``i < len(dstypes) && i < len(values) &&
    values[i] != nil`` (:77);
  - metric name = type [. type_instance-name] [. dsname if there is more
    than one dsname] (getReasonableMetricName, :158-185);
  - bracket dimensions ``name[k=v,f=x]-rest`` extracted from
    type_instance / plugin_instance / host (LabelsFromName, :210-250);
    a malformed piece (no '=' or a second '=') voids the whole bracket
    and keeps the original string;
  - label precedence (appendToMetrics :71-95 + parseNameForLabels
    :262-277): type_instance bracket dims first, then plugin
    (unconditional), plugin_instance dims (if absent), plugin_instance
    name (unconditional), host dims (if absent), host name
    (unconditional), dsname (only when not already part of the name);
  - value parses int64-first (``is_double`` false) else float64
    (newPoint, :139-156); dstype counter/derive → cumulative, gauge/
    absolute/other → gauge (metricType, :120-137).

Everything is JVM-side (from_json + higher-order functions): a pure map
stage — no shuffle, no Python — matching the engine's scale posture. The
label fold is O(labels²) per row over ≤ ~10 entries, negligible next to
the JSON decode itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEMA = (
    "dsnames array<string>, dstypes array<string>, values array<string>, "
    "time double, interval double, host string, plugin string, "
    "plugin_instance string, type string, type_instance string, "
    "message string, severity string"
)

# LabelsFromName piece validity: exactly one '=' per comma-piece
_PIECE_OK = "^[^=]*=[^=]*$"


def _lfn(c: str) -> tuple[str, str, str]:
    """SQL snippets (valid, cleaned_name, dims_entries) implementing
    LabelsFromName(collectd.go:210-250) over column ``c``.

    dims_entries is array<struct<k:string,v:string>> (empty when no valid
    bracket); cleaned_name strips the bracket only when valid.
    """
    after = f"substring({c}, instr({c}, '[') + 1)"
    dims = f"substring({after}, 1, instr({after}, ']') - 1)"
    rest = f"substring({after}, instr({after}, ']') + 1)"
    left = f"substring({c}, 1, instr({c}, '[') - 1)"
    valid = (
        f"({c} IS NOT NULL AND instr({c}, '[') > 0 AND instr({after}, ']') > 0 "
        f"AND forall(split({dims}, ','), p -> p rlike '{_PIECE_OK}'))"
    )
    name = f"(CASE WHEN {valid} THEN concat({left}, {rest}) ELSE {c} END)"
    entries = (
        f"(CASE WHEN {valid} THEN transform(split({dims}, ','), "
        f"p -> struct(substring_index(p, '=', 1) AS k, "
        f"substring(p, instr(p, '=') + 1) AS v)) "
        f"ELSE cast(array() AS array<struct<k:string,v:string>>) END)"
    )
    return valid, name, entries


def _entry(k: str, v: str, absent_only: bool) -> str:
    """One labeled fold entry; mode 'a' = insert-if-absent, 'o' = overwrite."""
    return f"struct({k} AS k, {v} AS v, '{'a' if absent_only else 'o'}' AS m)"


def parse_collectd_records(df: DataFrame, json_col: str = "json") -> DataFrame:
    """Decode one collectd JSON record per row into datapoint rows
    (metric_name, value, is_double, is_cumulative, ts, interval, labels,
    is_event, message, severity).

    Event records yield exactly one row with ``is_event = true`` and null
    metric fields (the receiver routes them to the events channel and
    emits no datapoints).
    """
    rec = df.select(F.from_json(F.col(json_col), _SCHEMA).alias("r")).select("r.*")

    is_event = (
        F.col("time").isNotNull()
        & F.col("severity").isNotNull()
        & F.col("message").isNotNull()
    )
    rec = rec.withColumn("is_event", is_event)

    events = rec.filter("is_event").select(
        F.lit(None).cast("string").alias("metric_name"),
        F.lit(None).cast("double").alias("value"),
        F.lit(None).cast("boolean").alias("is_double"),
        F.lit(None).cast("boolean").alias("is_cumulative"),
        F.timestamp_seconds(F.col("time")).alias("ts"),
        F.col("interval"),
        F.lit(None).cast("map<string,string>").alias("labels"),
        F.col("is_event"),
        F.col("message"),
        F.col("severity"),
    )

    _, ti_name, ti_entries = _lfn("type_instance")
    _, pi_name, pi_entries = _lfn("plugin_instance")
    _, host_name, host_entries = _lfn("host")

    pts = (
        rec.filter(~F.col("is_event"))
        .select(
            "*",
            # posexplode of a NULL/empty array emits no rows — matching the
            # reference's loop over a possibly-nil dsnames slice
            F.posexplode("dsnames").alias("i", "dsname"),
        )
        .withColumn("dstype", F.get("dstypes", F.col("i")))
        .withColumn("value_str", F.get("values", F.col("i")))
        # collectd.go:77 — the guard that skips ragged/null entries
        .filter(
            (F.col("i") < F.size("dstypes"))
            & (F.col("i") < F.size("values"))
            & F.col("value_str").isNotNull()
        )
    )

    # getReasonableMetricName: type . cleaned-type_instance . dsname(>1)
    used_dsname = (
        F.col("dsname").isNotNull() & (F.col("dsname") != "") & (F.size("dsnames") > 1)
    )
    name = F.concat_ws(
        ".",
        F.when(F.col("type").isNotNull() & (F.col("type") != ""), F.col("type")),
        F.when(F.expr(ti_name) != "", F.expr(ti_name)),
        F.when(used_dsname, F.col("dsname")),
    )

    # entry list in the reference's execution order; the fold applies
    # insert-if-absent ('a') vs overwrite ('o') per entry
    plugin_e = _entry("'plugin'", "plugin", False)
    pi_e = _entry("'plugin_instance'", pi_name, False)
    host_e = _entry("'host'", host_name, False)
    entries = F.expr(
        "concat("
        + ", ".join(
            [
                # bracket dims from type_instance (added during name build,
                # insert-if-absent into the fresh map ⇒ first wins)
                f"transform({ti_entries}, e -> struct(e.k AS k, e.v AS v, 'a' AS m))",
                f"array({plugin_e})",
                f"transform({pi_entries}, e -> struct(e.k AS k, e.v AS v, 'a' AS m))",
                f"array({pi_e})",
                f"transform({host_entries}, e -> struct(e.k AS k, e.v AS v, 'a' AS m))",
                f"array({host_e})",
            ]
        )
        + ")"
    )
    labels = F.expr(
        # addIfNotNullOrEmpty: skip null/empty values; mode 'a' skips
        # existing keys, 'o' replaces
        "aggregate("
        "  filter(__entries, e -> e.v IS NOT NULL AND e.v != ''),"
        "  cast(map() AS map<string,string>),"
        "  (acc, e) -> CASE"
        "    WHEN e.m = 'a' AND map_contains_key(acc, e.k) THEN acc"
        "    ELSE map_concat(map_filter(acc, (k, v) -> k != e.k), map(e.k, e.v))"
        "  END)"
    )
    # dsname label only when it wasn't folded into the metric name
    dsname_label = F.when(
        ~used_dsname & F.col("dsname").isNotNull() & (F.col("dsname") != ""),
        F.col("dsname"),
    )

    points = (
        pts.withColumn("__entries", entries)
        .withColumn("__labels", labels)
        .select(
            name.alias("metric_name"),
            F.col("value_str").try_cast("double").alias("value"),
            F.col("value_str").try_cast("long").isNull().alias("is_double"),
            F.col("dstype").isin("counter", "derive").alias("is_cumulative"),
            F.timestamp_seconds(F.col("time")).alias("ts"),
            F.col("interval"),
            F.when(
                dsname_label.isNotNull(),
                F.map_concat(
                    F.map_filter(F.col("__labels"), lambda k, _: k != "dsname"),
                    F.create_map(F.lit("dsname"), dsname_label),
                ),
            )
            .otherwise(F.col("__labels"))
            .alias("labels"),
            F.col("is_event"),
            F.col("message"),
            F.col("severity"),
        )
    )
    return points.unionByName(events)
