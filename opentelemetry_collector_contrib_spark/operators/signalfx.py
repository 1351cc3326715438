"""signalfx exporter metric-translation analogue.

Reference: exporter/signalfxexporter/translation/translator.go —
the rule-driven datapoint rewriter applied before export. Actions
(translator.go:33-137) and their exact per-datapoint semantics
(TranslateDataPoints, translator.go:406-545):

  - rename_dimension_keys (:413-421)  — rename dim keys via mapping,
    optionally scoped to metric_names
  - rename_metrics (:422-445)         — rename via mapping; on rename,
    copy_dimensions duplicates existing dim values under new keys and
    add_dimensions appends constants
  - multiply_int / divide_int / multiply_float (:446-472) — scale values
    per metric (Go int64 division truncates toward zero)
  - copy_metrics (:473-481, copyMetric :874-891) — append a renamed copy,
    optionally only when dims[dimension_key] ∈ dimension_values
  - split_metric (:482-487, splitMetric :780-809) — for one metric, move
    dims[dimension_key] through mapping into the metric name and drop the
    dim; datapoints with an unmapped/absent value pass through unchanged
  - convert_values (:488-492, convertMetricValue :811-833) — double→int
    truncates toward zero; int→double; wrong-typed points pass through
  - calculate_new_metric (:494-501, calcNewMetricInputPairs :550-570,
    calculateNewMetric :595-644) — pair operand metrics on exact dim
    equality, emit operand1/operand2 as a new double metric, skipping
    zero denominators
  - aggregate_metric (:503-526, aggregateDatapoints :668-735) — group the
    named metric's datapoints by dims minus without_dimensions; count
    (int value, GAUGE type), sum (int and double sums kept separately),
    avg (ints+doubles pooled into one double mean)
  - drop_metrics (:528-538) — drop by exact metric name
  - delta_metric (delta_translator.go:38-105) — per (metric, dims) series
    append a GAUGE delta point vs the previous observation; negative delta
    = counter reset → emit the current value; first observation emits
    nothing; only same-typed consecutive points produce a delta
  - drop_dimensions (:540-544, filterDimensionsByValues :869-891) — drop
    dim keys, all values or only listed ones, optionally metric-scoped

Spark design: one datapoint = one row
``(metric string, dims map<string,string>, value_int long, value_double
double, metric_type string, ts long)`` and every action is a closed-form
Column expression over that row — rename/scale/convert/split/drop chain
into a single projection (zero shuffles, whole-stage codegen); only
copy_metrics (union), aggregate_metric (one partial-agg shuffle on the
collapsed dim set), calculate_new_metric (an equi-join on the canonical
dim fingerprint — broadcastable when one operand is a small rollup), and
delta_metric (a window keyed by series, i.e. the Spark analogue of the
reference's TTL'd prev-point map) touch the shuffle service.  At 10^12
datapoints the series/dim-group keys are exactly the keys a SignalFx
backend shards on, so the shuffles are the minimal ones; the map-typed
dims column keeps arbitrary cardinality without schema explosion.

Group/join keys over a MapType column use ``array_sort(map_entries(m))``
— the same canonical "sorted key:value list" the reference builds with
stringifyDimensions (translator.go:738-752) — because Spark cannot
compare raw maps.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_COLS = ["metric", "dims", "value_int", "value_double", "metric_type", "ts"]


def _str_map_lit(mapping: dict[str, str]) -> Column:
    pairs: list[Column] = []
    for k, v in mapping.items():
        pairs += [F.lit(k), F.lit(v)]
    return F.create_map(*pairs)


def _dim_key(dims: Column) -> Column:
    """Canonical groupable/joinable fingerprint of a dims map
    (stringifyDimensions, translator.go:738-752)."""
    return F.array_sort(F.map_entries(dims))


def _scoped(df: DataFrame, metric_names, col: Column, fallback: Column) -> Column:
    if metric_names:
        return F.when(F.col("metric").isin(list(metric_names)), col).otherwise(fallback)
    return col


def rename_dimension_keys(df: DataFrame, mapping: dict[str, str],
                          metric_names: list[str] | None = None) -> DataFrame:
    m = _str_map_lit(mapping)
    renamed = F.transform_keys(F.col("dims"), lambda k, _v: F.coalesce(m[k], k))
    return df.withColumn("dims", _scoped(df, metric_names, renamed, F.col("dims")))


def rename_metrics(df: DataFrame, mapping: dict[str, str],
                   copy_dimensions: dict[str, str] | None = None,
                   add_dimensions: dict[str, str] | None = None) -> DataFrame:
    m = _str_map_lit(mapping)
    new_name = m[F.col("metric")]
    renamed = new_name.isNotNull()
    dims = F.col("dims")
    if copy_dimensions:
        # entries (dst, dims[src]) for every src present in the map
        copied = F.map_from_entries(F.filter(
            F.array(*[F.struct(F.lit(dst).alias("key"),
                               F.element_at(dims, src).alias("value"))
                      for src, dst in copy_dimensions.items()]),
            lambda e: e["value"].isNotNull(),
        ))
        dims = _map_merge(dims, copied)
    if add_dimensions:
        dims = _map_merge(dims, _str_map_lit(add_dimensions))
    out = df.withColumn("dims", F.when(renamed, dims).otherwise(F.col("dims")))
    return out.withColumn("metric", F.coalesce(new_name, F.col("metric")))


def _map_merge(base: Column, extra: Column) -> Column:
    """map_concat with last-wins keys, independent of mapKeyDedupPolicy."""
    keys = F.map_keys(extra)
    kept = F.map_filter(base, lambda k, _v: ~F.array_contains(keys, k))
    return F.map_from_entries(
        F.concat(F.map_entries(kept), F.map_entries(extra))
    )


def scale_values(df: DataFrame, action: str, factors: dict[str, float]) -> DataFrame:
    if action == "multiply_int":
        m = F.create_map(*[c for k, v in factors.items()
                           for c in (F.lit(k), F.lit(int(v)))])
        return df.withColumn(
            "value_int", F.col("value_int") * F.coalesce(m[F.col("metric")], F.lit(1)))
    if action == "divide_int":
        m = F.create_map(*[c for k, v in factors.items()
                           for c in (F.lit(k), F.lit(int(v)))])
        # SQL `div` is integral division truncating toward zero, like Go int64 /
        return (df
                .withColumn("__f", F.coalesce(m[F.col("metric")], F.lit(1)))
                .withColumn("value_int", F.expr("value_int div __f"))
                .drop("__f"))
    if action == "multiply_float":
        m = F.create_map(*[c for k, v in factors.items()
                           for c in (F.lit(k), F.lit(float(v)))])
        return df.withColumn(
            "value_double",
            F.col("value_double") * F.coalesce(m[F.col("metric")], F.lit(1.0)))
    raise ValueError(action)


def convert_values(df: DataFrame, types_mapping: dict[str, str]) -> DataFrame:
    m = _str_map_lit(types_mapping)
    want = m[F.col("metric")]
    to_int = (want == "int") & F.col("value_double").isNotNull()
    to_dbl = (want == "double") & F.col("value_int").isNotNull()
    return (df
            .withColumn("__vi", F.when(to_int, F.col("value_double").cast("long"))
                                 .otherwise(F.when(to_dbl, F.lit(None).cast("long"))
                                             .otherwise(F.col("value_int"))))
            .withColumn("value_double",
                        F.when(to_dbl, F.col("value_int").cast("double"))
                         .otherwise(F.when(to_int, F.lit(None).cast("double"))
                                     .otherwise(F.col("value_double"))))
            .withColumn("value_int", F.col("__vi")).drop("__vi"))


def copy_metrics(df: DataFrame, mapping: dict[str, str],
                 dimension_key: str | None = None,
                 dimension_values: list[str] | None = None) -> DataFrame:
    m = _str_map_lit(mapping)
    cond = m[F.col("metric")].isNotNull()
    if dimension_key:
        cond = cond & F.element_at(F.col("dims"), dimension_key).isin(
            list(dimension_values or []))
    copies = df.filter(cond).withColumn("metric", m[F.col("metric")])
    return df.unionByName(copies)


def split_metric(df: DataFrame, metric_name: str, dimension_key: str,
                 mapping: dict[str, str]) -> DataFrame:
    m = _str_map_lit(mapping)
    new_name = m[F.element_at(F.col("dims"), dimension_key)]
    return (df
            # materialize the mapped name BEFORE rewriting dims: the rename
            # reads the dim the dims-rewrite removes
            .withColumn("__nn", F.when(F.col("metric") == metric_name, new_name))
            .withColumn("dims", F.when(
                F.col("__nn").isNotNull(),
                F.map_filter(F.col("dims"), lambda k, _v: k != F.lit(dimension_key)),
            ).otherwise(F.col("dims")))
            .withColumn("metric", F.coalesce(F.col("__nn"), F.col("metric")))
            .drop("__nn"))


def aggregate_metric(df: DataFrame, metric_name: str, aggregation_method: str,
                     without_dimensions: list[str]) -> DataFrame:
    others = df.filter(F.col("metric") != metric_name)
    tgt = df.filter(F.col("metric") == metric_name)
    drop = F.array(*[F.lit(d) for d in without_dimensions])
    tgt = tgt.withColumn(
        "dims", F.map_filter(F.col("dims"), lambda k, _v: ~F.array_contains(drop, k)))
    keys = [_dim_key(F.col("dims")).alias("__k"), "metric", "ts"]
    if aggregation_method == "count":
        agg = tgt.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("value_int"),
            F.first("dims").alias("dims"),
        ).withColumn("value_double", F.lit(None).cast("double")) \
         .withColumn("metric_type", F.lit("GAUGE"))
    elif aggregation_method == "sum":
        agg = tgt.groupBy(*keys).agg(
            F.sum("value_int").alias("value_int"),
            F.sum("value_double").alias("value_double"),
            F.first("dims").alias("dims"),
            F.first("metric_type").alias("metric_type"),
        )
    elif aggregation_method == "avg":
        agg = tgt.groupBy(*keys).agg(
            (F.sum(F.coalesce(F.col("value_int").cast("double"), F.lit(0.0))
                   + F.coalesce(F.col("value_double"), F.lit(0.0)))
             / F.count(F.lit(1))).alias("value_double"),
            F.first("dims").alias("dims"),
            F.first("metric_type").alias("metric_type"),
        ).withColumn("value_int", F.lit(None).cast("long"))
    else:
        raise ValueError(aggregation_method)
    return others.unionByName(agg.select(*_COLS))


def calculate_new_metric(df: DataFrame, metric_name: str, operand1_metric: str,
                         operand2_metric: str, operator: str = "division") -> DataFrame:
    if operator != "division":
        raise ValueError(operator)
    as_f = F.coalesce(F.col("value_double"), F.col("value_int").cast("double"))
    o1 = (df.filter(F.col("metric") == operand1_metric)
            .select(_dim_key(F.col("dims")).alias("__k"), "dims", "metric_type", "ts",
                    as_f.alias("__v1")))
    o2 = (df.filter(F.col("metric") == operand2_metric)
            .select(_dim_key(F.col("dims")).alias("__k"), as_f.alias("__v2")))
    new = (o1.join(o2, "__k")
             .filter(F.col("__v1").isNotNull() & F.col("__v2").isNotNull()
                     & (F.col("__v2") != 0))
             .select(F.lit(metric_name).alias("metric"), "dims",
                     F.lit(None).cast("long").alias("value_int"),
                     (F.col("__v1") / F.col("__v2")).alias("value_double"),
                     "metric_type", "ts"))
    return df.unionByName(new.select(*_COLS))


def drop_metrics(df: DataFrame, metric_names: list[str]) -> DataFrame:
    return df.filter(~F.col("metric").isin(list(metric_names)))


def delta_metric(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    m = _str_map_lit(mapping)
    w = Window.partitionBy("metric", _dim_key(F.col("dims"))).orderBy("ts")
    src = df.filter(m[F.col("metric")].isNotNull())
    prev_i, prev_d = F.lag("value_int").over(w), F.lag("value_double").over(w)
    has_prev = F.lag(F.lit(1)).over(w).isNotNull()
    d_int = F.when(F.col("value_int") - prev_i < 0, F.col("value_int")) \
             .otherwise(F.col("value_int") - prev_i)
    d_dbl = F.when(F.col("value_double") - prev_d < 0, F.col("value_double")) \
             .otherwise(F.col("value_double") - prev_d)
    deltas = (src
              .withColumn("__hp", has_prev)
              .withColumn("__di", d_int).withColumn("__dd", d_dbl)
              .filter(F.col("__hp") & (F.col("__di").isNotNull()
                                       | F.col("__dd").isNotNull()))
              .select(m[F.col("metric")].alias("metric"), "dims",
                      F.col("__di").alias("value_int"),
                      F.col("__dd").alias("value_double"),
                      F.lit("GAUGE").alias("metric_type"), "ts"))
    return df.unionByName(deltas.select(*_COLS))


def drop_dimensions(df: DataFrame, dimension_pairs: dict[str, list[str]],
                    metric_names: list[str] | None = None) -> DataFrame:
    def keep(k: Column, v: Column) -> Column:
        cond = F.lit(True)
        for key, vals in dimension_pairs.items():
            if vals:
                cond = cond & ~((k == key) & v.isin(list(vals)))
            else:
                cond = cond & (k != key)
        return cond

    dropped = F.map_filter(F.col("dims"), keep)
    return df.withColumn("dims", _scoped(df, metric_names, dropped, F.col("dims")))


_ACTIONS = {
    "rename_dimension_keys": lambda df, r: rename_dimension_keys(
        df, r["mapping"], r.get("metric_names")),
    "rename_metrics": lambda df, r: rename_metrics(
        df, r["mapping"], r.get("copy_dimensions"), r.get("add_dimensions")),
    "multiply_int": lambda df, r: scale_values(df, "multiply_int", r["scale_factors_int"]),
    "divide_int": lambda df, r: scale_values(df, "divide_int", r["scale_factors_int"]),
    "multiply_float": lambda df, r: scale_values(
        df, "multiply_float", r["scale_factors_float"]),
    "convert_values": lambda df, r: convert_values(df, r["types_mapping"]),
    "copy_metrics": lambda df, r: copy_metrics(
        df, r["mapping"], r.get("dimension_key"), r.get("dimension_values")),
    "split_metric": lambda df, r: split_metric(
        df, r["metric_name"], r["dimension_key"], r["mapping"]),
    "aggregate_metric": lambda df, r: aggregate_metric(
        df, r["metric_name"], r["aggregation_method"], r["without_dimensions"]),
    "calculate_new_metric": lambda df, r: calculate_new_metric(
        df, r["metric_name"], r["operand1_metric"], r["operand2_metric"],
        r.get("operator", "division")),
    "drop_metrics": lambda df, r: drop_metrics(df, r["metric_names"]),
    "delta_metric": lambda df, r: delta_metric(df, r["mapping"]),
    "drop_dimensions": lambda df, r: drop_dimensions(
        df, r["dimension_pairs"], r.get("metric_names")),
}


def translate_datapoints(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Apply translation rules in order (TranslateDataPoints,
    translator.go:406-545). Unknown actions raise, mirroring
    validateTranslationRules (translator.go:257-361)."""
    out = df
    for rule in rules:
        try:
            fn = _ACTIONS[rule["action"]]
        except KeyError as exc:
            raise ValueError(f"unknown action {rule.get('action')!r}") from exc
        out = fn(out, rule)
    return out


def datapoints_to_metrics(df: DataFrame) -> DataFrame:
    """SignalFx v2 datapoints → OTel-style metric rows — the RECEIVER
    side (receiver/signalfxreceiver/signalfxv2_to_metricdata.go:42-199),
    the inverse of this module's exporter-direction output model.

    Per signalFxV2ToMetrics/fillInType:
      - GAUGE             → double_gauge / int_gauge (no temporality)
      - COUNTER           → double_sum / int_sum, DELTA, monotonic
      - CUMULATIVE_COUNTER→ double_sum / int_sum, CUMULATIVE, monotonic
      - the DOUBLE datum wins when both are set (fillInType checks
        DoubleValue first); a datapoint with neither datum, or an
        unknown metric type, is DROPPED (see :func:`decode_dropped`)
      - timestamps convert millis → nanos (dpTimestamp)

    One codegen'd projection + filter — no UDF, no shuffle."""
    has_double = F.col("value_double").isNotNull()
    has_int = F.col("value_int").isNotNull()
    width = F.when(has_double, "double").when(has_int, "int")
    family = (
        F.when(F.col("metric_type") == "GAUGE", "gauge")
        .when(F.col("metric_type").isin("COUNTER", "CUMULATIVE_COUNTER"), "sum")
    )
    return (
        df.filter((has_double | has_int) & family.isNotNull())
        .select(
            F.col("metric").alias("name"),
            F.concat(width, F.lit("_"), family).alias("data_type"),
            F.when(F.col("metric_type") == "COUNTER", "DELTA")
            .when(F.col("metric_type") == "CUMULATIVE_COUNTER", "CUMULATIVE")
            .alias("temporality"),
            F.when(family == "sum", F.lit(True)).alias("is_monotonic"),
            (F.col("ts") * F.lit(1_000_000)).alias("ts_ns"),
            F.when(~has_double, F.col("value_int")).alias("value_int"),
            F.when(has_double, F.col("value_double")).alias("value_double"),
            F.col("dims").alias("labels"),
        )
    )


def decode_dropped(df: DataFrame) -> DataFrame:
    """Companion diagnostic: datapoints signalFxV2ToMetrics would drop,
    keyed by reason (nil datum vs unknown metric type) — the receiver
    logs these and reports numDroppedDataPoints."""
    has_datum = F.col("value_double").isNotNull() | F.col("value_int").isNotNull()
    known = F.col("metric_type").isin("GAUGE", "COUNTER", "CUMULATIVE_COUNTER")
    reason = F.when(~has_datum, "nil_datum").when(~known, "unknown_type")
    return (
        df.withColumn("reason", reason)
        .filter(F.col("reason").isNotNull())
        .groupBy("reason")
        .agg(F.count(F.lit(1)).alias("n_dropped"))
    )


def dims_fingerprint(df: DataFrame, out_col: str = "dims_str") -> DataFrame:
    """Sorted ``k:v//k:v`` rendering of the dims map — byte-identical to
    stringifyDimensions (translator.go:738-752); used by oracles."""
    rendered = F.array_join(
        F.transform(_dim_key(F.col("dims")),
                    lambda e: F.concat(e["key"], F.lit(":"), e["value"])),
        "//")
    return df.withColumn(out_col, rendered)
