"""Unit tests for the operator family — table-driven, mirroring the
reference's per-processor unit style (SURVEY.md section 5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators import (
    attributes,
    filters,
    groupbyattrs,
    groupbytrace,
    loadbalancing,
    metricstransform,
    spanmetrics,
    statsd,
    tailsampling,
)


def test_upsert_attrs_insert_vs_override(spark):
    # resourcedetection.go:178-196 semantics
    df = spark.createDataFrame([("a", None), ("b", "keep")], ["k", "org"])
    ins = attributes.upsert_attrs(df, {"org": F.lit("det")}, override=False)
    got = {r["k"]: r["org"] for r in ins.collect()}
    assert got == {"a": "det", "b": "keep"}
    ov = attributes.upsert_attrs(df, {"org": F.lit("det")}, override=True)
    got = {r["k"]: r["org"] for r in ov.collect()}
    assert got == {"a": "det", "b": "det"}
    # creates missing columns
    new = attributes.upsert_attrs(df, {"env": F.lit("prod")}, override=False)
    assert all(r["env"] == "prod" for r in new.collect())


def test_enrich_lookup_insert_if_absent(spark):
    facts = spark.createDataFrame(
        [("d1", None), ("d1", "pre"), ("d2", None), ("dX", None)], ["domain", "org"]
    )
    dim = spark.createDataFrame([("d1", "o1"), ("d2", "o2")], ["domain", "org"])
    out = attributes.enrich_lookup(facts, dim, on="domain", attrs=["org"])
    got = sorted((r["domain"], r["org"]) for r in out.collect())
    # k8sprocessor processor.go:108-115: existing attr wins; missing dim -> null
    assert got == [("d1", "o1"), ("d1", "pre"), ("d2", "o2"), ("dX", None)]


def test_map_upsert(spark):
    df = spark.createDataFrame([({"a": "1"},), ({"b": "2"},)], ["m"])
    out = df.select(
        attributes.map_upsert(F.col("m"), "a", F.lit("9"), override=False).alias("m")
    ).collect()
    ms = sorted([dict(r["m"]) for r in out], key=str)
    assert {"a": "1"} in ms and {"a": "9", "b": "2"} in ms


def test_filters(spark):
    df = spark.createDataFrame(
        [("error", 5.0), ("click", 50.0), ("view", 500.0)], ["t", "v"]
    )
    assert df.filter(filters.strict_match(F.col("t"), "error")).count() == 1
    assert df.filter(filters.regexp_match(F.col("t"), ["^e", "^v"])).count() == 2
    assert df.filter(filters.value_set_match(F.col("t"), ["click", "view"])).count() == 2
    assert df.filter(filters.numeric_range(F.col("v"), 5.0, 50.0)).count() == 2
    kept, dropped = filters.filter_with_drop_count(df, F.col("v") < 100)
    assert kept.count() == 2 and dropped.count() == 1


def test_groupbyattrs_metrics(spark):
    df = spark.createDataFrame(
        [("h1", "a"), ("h1", "b"), (None, "c"), ("h2", "d")], ["host", "x"]
    )
    out, m = groupbyattrs.group_by_attrs(df, ["host"])
    row = m.collect()[0]
    # metrics.go:24-29: grouped=3 (host present), non_grouped=1, groups=2
    assert (row["num_grouped"], row["num_non_grouped"], row["num_groups"]) == (3, 1, 2)
    assert out.count() == 4


def test_promote_from_map(spark):
    df = spark.createDataFrame([({"host": "h1", "x": "1"},)], ["attrs"])
    out = groupbyattrs.promote_from_map(df, "attrs", ["host"]).collect()[0]
    assert out["host"] == "h1"
    assert dict(out["attrs"]) == {"x": "1"}


def test_spanmetrics_bucket_semantics(spark):
    # sort.SearchFloat64s lower-bound semantics: value == bound -> that bucket
    bounds = [2.0, 4.0, 6.0]
    df = spark.createDataFrame(
        [(0.0,), (2.0,), (2.5,), (4.0,), (5.9,), (6.0,), (7.0,)], ["v"]
    )
    idx = spanmetrics.bucket_index(F.col("v"), bounds)
    got = [r["i"] for r in df.select(idx.alias("i")).collect()]
    assert got == [0, 0, 1, 1, 2, 2, 3]  # catch-all == len(bounds)
    m = spanmetrics.span_metrics(
        df.withColumn("g", F.lit("k")), dims=["g"], latency_col="v", bounds=bounds
    ).collect()[0]
    assert m["calls_total"] == 7
    assert [m[f"bucket_{i}"] for i in range(4)] == [2, 2, 2, 1]
    assert m["latency_sum"] == sum([0.0, 2.0, 2.5, 4.0, 5.9, 6.0, 7.0])


def test_statsd_parse_and_aggregate(spark):
    lines = [
        ("gorets:1|c", 0), ("gorets:3|c", 1), ("gauge1:10|g", 2),
        ("gauge1:7|g", 3), ("glork:320|ms|@0.1|#k:v", 4), ("bad line", 5),
    ]
    df = spark.createDataFrame(lines, ["line", "seq"]).withColumn(
        "ts", F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    )
    p = statsd.parse_statsd_lines(df)
    rows = {r["seq"]: r for r in p.collect()}
    assert rows[0]["metric_name"] == "gorets" and rows[0]["metric_value"] == 1.0
    assert rows[4]["metric_type"] == "ms" and rows[4]["sample_rate"] == 0.1
    assert rows[4]["tags"] == "k:v"
    assert rows[5]["metric_name"] == ""  # unparseable
    agg = statsd.statsd_aggregate(
        p.filter(F.col("metric_name") != ""),
        ts_col="ts", name_col="metric_name", value_col="metric_value",
        order_col="seq",
    )
    got = {r["metric_name"]: r for r in agg.collect()}
    assert got["gorets"]["counter_sum"] == 4.0  # statsd_parser.go:158-166
    assert got["gauge1"]["gauge_last"] == 7.0   # last-write-wins :143-156
    assert got["glork"]["timer_p50"] == 320.0


def test_metricstransform(spark):
    df = spark.createDataFrame(
        [("m1", "a", "x", 1.0), ("m1", "a", "y", 2.0), ("m1", "b", "x", 3.0)],
        ["metric_name", "l1", "l2", "value"],
    )
    r = metricstransform.rename_metric(df, "m1", "m2")
    assert r.filter("metric_name = 'm2'").count() == 3
    ag = metricstransform.aggregate_labels(df, ["l1"], "value", "sum")
    got = {r["l1"]: r["value"] for r in ag.collect()}
    assert got == {"a": 3.0, "b": 3.0}
    av = metricstransform.aggregate_label_values(
        df, "l2", ["x", "y"], "xy", ["l1"], "value", "max"
    )
    got = {(r["l1"], r["l2"]): r["value"] for r in av.collect()}
    assert got == {("a", "xy"): 2.0, ("b", "xy"): 3.0}
    c = metricstransform.combine([df, df], "all")
    assert c.count() == 6 and c.filter("metric_name='all'").count() == 6
    g = spark.createDataFrame(
        [("calls", "a", 10.0), ("errs", "a", 2.0), ("calls", "b", 5.0), ("errs", "b", 1.0)],
        ["metric_name", "svc", "value"],
    )
    gen = metricstransform.metrics_generation(
        g, "errs", "calls", "percent", "error_rate", ["svc"]
    )
    got = {r["svc"]: r["value"] for r in gen.collect()}
    assert got == {"a": 20.0, "b": 20.0}


def test_metricstransform_label_ops(spark):
    df = spark.createDataFrame(
        [("m1", "0", 1.9), ("m1", "1", -2.9), ("m2", "3", 4.0)],
        ["metric_name", "shard", "value"],
    )
    # AddLabel: predicate-gated constant; unmatched rows stay NULL
    al = metricstransform.add_label(df, "env", "prod", F.col("metric_name") == "m1")
    got = {(r["metric_name"], r["shard"]): r["env"] for r in al.collect()}
    assert got[("m1", "0")] == "prod" and got[("m2", "3")] is None
    # UpdateLabel: rename + ValueActions; unmapped values pass through
    ul = metricstransform.update_label(
        df, "shard", new_label="lane", value_mapping={"0": "zero"}
    )
    assert "shard" not in ul.columns
    got = sorted(r["lane"] for r in ul.collect())
    assert got == ["1", "3", "zero"]
    # DeleteLabelValue: drops matching rows, keeps NULL-labeled ones
    nul = spark.createDataFrame(
        [("m3", None, 0.0)], "metric_name string, shard string, value double"
    )
    dl = metricstransform.delete_label_value(df.unionByName(nul), "shard", "3")
    got = sorted(r["metric_name"] for r in dl.collect())
    assert got == ["m1", "m1", "m3"]
    # ToggleScalarDataType: double -> long truncates toward zero, and back
    tg = metricstransform.toggle_scalar_data_type(df)
    assert dict(tg.dtypes)["value"] == "bigint"
    got = {r["shard"]: r["value"] for r in tg.collect()}
    assert got == {"0": 1, "1": -2, "3": 4}
    assert dict(metricstransform.toggle_scalar_data_type(tg).dtypes)["value"] == "double"
    # Insert action: original kept, copy appended under new name
    ic = metricstransform.insert_copy(df, "m1", "m1_copy")
    assert ic.count() == 5
    assert ic.filter("metric_name = 'm1_copy'").count() == 2


def test_tailsampling_two_pass(spark):
    df = spark.createDataFrame(
        [("t1", "error", 1.0), ("t1", "view", 2.0),
         ("t2", "view", 3.0), ("t3", "view", 999.0)],
        ["trace_id", "kind", "v"],
    )
    out = tailsampling.tail_sample(
        df, "trace_id",
        policies=[F.col("kind") == "error", F.col("v") > 100],  # OR semantics
    )
    got = sorted(r["trace_id"] for r in out.collect())
    assert got == ["t1", "t1", "t3"]  # whole traces released


def test_rate_limit(spark):
    df = spark.createDataFrame([("k", i) for i in range(10)], ["k", "seq"])
    out = tailsampling.rate_limit(df, ["k"], "seq", 3)
    assert sorted(r["seq"] for r in out.collect()) == [0, 1, 2]


def test_groupbytrace(spark):
    df = spark.createDataFrame(
        [("t1", 2, "b"), ("t1", 1, "a"), ("t2", 5, "c")], ["trace_id", "ts", "name"]
    )
    out = groupbytrace.group_by_trace(df, "trace_id", ["name"], "ts")
    got = {r["trace_id"]: r for r in out.collect()}
    assert got["t1"]["span_count"] == 2
    assert got["t1"]["first_ts"] == 1 and got["t1"]["last_ts"] == 2
    assert [s["name"] for s in got["t1"]["spans"]] == ["a", "b"]  # sorted


def test_loadbalancing_buckets(spark, duck):
    df = spark.createDataFrame([(f"trace-{i}",) for i in range(50)], ["tid"])
    out = df.select("tid", loadbalancing.md5_bucket(F.col("tid"), 4).alias("b"))
    got = {r["tid"]: r["b"] for r in out.collect()}
    for tid, b in duck.execute(
        "SELECT tid, " + loadbalancing.md5_bucket_sql("tid", 4) + " FROM ("
        "SELECT 'trace-' || CAST(i AS VARCHAR) AS tid FROM generate_series(0, 49) t(i))"
    ).fetchall():
        assert got[tid] == b
    # buckets actually spread
    assert len(set(got.values())) == 4


def test_salted_group_agg(spark):
    df = spark.createDataFrame(
        [("hot", f"u{i}", 1.0) for i in range(100)] + [("cold", "u0", 2.0)],
        ["domain", "url", "v"],
    )
    out = spanmetrics.salted_group_agg(
        df, ["domain"],
        {"total": ("v", "sum", "sum"), "n": ("v", "count", "sum")},
        salt_buckets=8,
    )
    got = {r["domain"]: (r["total"], r["n"]) for r in out.collect()}
    assert got == {"hot": (100.0, 100), "cold": (2.0, 1)}


def test_map_upsert_null_and_absent_semantics(spark):
    """resourcedetection.go:178-196 merge under nulls: a NULL detected
    value must never clobber an existing entry (override or not), and
    inserting NULL into a map missing the key yields a null-valued entry
    the caller can map_filter away (documented behavior)."""
    df = spark.createDataFrame(
        [(1, {"a": "1"}), (2, {})],
        "id INT, m MAP<STRING,STRING>",
    )
    null_v = F.lit(None).cast("string")
    ins = df.select(
        "id", attributes.map_upsert(F.col("m"), "a", null_v, False).alias("m")
    ).collect()
    got = {r["id"]: dict(r["m"]) for r in ins}
    # insert-if-absent with NULL: existing value survives
    assert got[1] == {"a": "1"}
    # absent key + NULL value -> null-valued entry (filterable)
    assert got[2] == {"a": None}
    ovr = df.select(
        "id", attributes.map_upsert(F.col("m"), "a", F.lit("9"), True).alias("m")
    ).collect()
    got = {r["id"]: dict(r["m"]) for r in ovr}
    assert got[1] == {"a": "9"} and got[2] == {"a": "9"}


def test_promote_from_map_absent_key(spark):
    df = spark.createDataFrame(
        [(1, {"route": "en", "x": "1"}), (2, {"x": "2"})],
        "id INT, m MAP<STRING,STRING>",
    )
    out = groupbyattrs.promote_from_map(df, "m", ["route"]).collect()
    got = {r["id"]: (r["route"], dict(r["m"])) for r in out}
    assert got[1] == ("en", {"x": "1"})
    # absent key promotes to NULL and the map is untouched
    assert got[2] == (None, {"x": "2"})


def test_routing_to_exporter_lists_conservation(spark):
    """config.go:43-52: a table value may name SEVERAL exporters; the
    record goes to each (duplicated by design). Conservation: exploded
    rows == sum over records of |routes|; every sink's fan_out slice
    matches the exploded subset."""
    from opentelemetry_collector_contrib_spark.operators import routing

    df = spark.createDataFrame(
        [("a", "en", 200), ("b", "de", 200), ("c", "en", 500),
         ("d", "fr", 200), ("e", "en", 200)],
        "id STRING, lang STRING, status INT",
    )
    cfg = routing.RoutingConfig(
        from_attribute="lang",
        table={"en": ["sink_en", "sink_archive"], "de": "sink_de"},
        default_sink=["sink_other", "sink_audit"],
        predicate_routes=[("sink_quarantine", F.col("status") >= 400)],
    )
    tagged = routing.with_routes(df, cfg)
    rows = {
        (r["id"], r["route"])
        for r in routing.explode_routes(tagged).collect()
    }
    assert rows == {
        ("a", "sink_en"), ("a", "sink_archive"),
        ("b", "sink_de"),
        ("c", "sink_quarantine"),
        ("d", "sink_other"), ("d", "sink_audit"),
        ("e", "sink_en"), ("e", "sink_archive"),
    }
    # conservation: accepted == sum(routed) - duplicated-by-design
    accepted = df.count()
    routed = len(rows)
    dup = tagged.select(
        F.sum(F.size("routes") - 1).alias("d")
    ).collect()[0]["d"]
    assert accepted == routed - dup
    # fan_out slices agree with the exploded view, one scan semantics
    slices = routing.fan_out(df, cfg)
    assert set(slices) == {
        "sink_quarantine", "sink_en", "sink_archive", "sink_de",
        "sink_other", "sink_audit",
    }
    for sink, sdf in slices.items():
        assert {r["id"] for r in sdf.collect()} == {
            i for i, s in rows if s == sink
        }
    # scalar-table legacy path unchanged: route == first element
    single = routing.with_route(df, cfg).select("id", "route").collect()
    assert {(r["id"], r["route"]) for r in single} == {
        ("a", "sink_en"), ("b", "sink_de"), ("c", "sink_quarantine"),
        ("d", "sink_other"), ("e", "sink_en"),
    }


def test_combine_matched_submatch_labels(spark):
    """config.go:100-112: capture groups of the combine include filter
    become labels valued by submatches of the metric name; named groups
    use their name, unnamed use $i; submatch_case maps case."""
    from opentelemetry_collector_contrib_spark.operators import metricstransform

    df = spark.createDataFrame(
        [("http_GET_count", 3.0), ("http_PUT_count", 2.0), ("other", 9.0)],
        "metric_name STRING, value DOUBLE",
    )
    out = metricstransform.combine_matched(
        df, r"^http_(?<verb>[A-Z]+)_(count)$", "http_requests",
        submatch_case="lower",
    )
    rows = {(r["verb"], r["$2"], r["value"]) for r in out.collect()}
    assert rows == {("get", "count", 3.0), ("put", "count", 2.0)}
    assert {r["metric_name"] for r in out.collect()} == {"http_requests"}
    # non-matching rows are untouched (removeMatchedMetrics keeps them in
    # the stream; combine_matched returns only the combined metric)
    assert out.count() == 2


def test_resourcedetection_env_detector_chain(spark):
    """env.go:55-110 + resourcedetection.go:126-133: strict env parse
    (trim, url-unescape, stray text errors), deprecated-var fallback,
    first-detector-wins chain merge, insert-if-absent application."""
    import pytest as _pytest

    from opentelemetry_collector_contrib_spark.operators import (
        resourcedetection as rd,
    )

    assert rd.parse_env_resource("k=v") == {"k": "v"}
    assert rd.parse_env_resource(" a = 1 , b = x%20y,c=p+q ") == {
        "a": "1", "b": "x y", "c": "p q"
    }
    # values may contain spaces and '=' (the lazy value class is any
    # ascii): "k=v extra=" is ONE pair with value "v extra="
    assert rd.parse_env_resource("k=v extra=") == {"k": "v extra="}
    for bad in ("junk", "k=v,,x", "k=v,junk"):
        with _pytest.raises(ValueError):
            rd.parse_env_resource(bad)

    assert rd.env_detector({}) == {}
    assert rd.env_detector({"OTEL_RESOURCE": "legacy=1"}) == {"legacy": "1"}
    assert rd.env_detector(
        {"OTEL_RESOURCE_ATTRIBUTES": "a=2", "OTEL_RESOURCE": "a=legacy"}
    ) == {"a": "2"}

    # chain: first detector wins per key (MergeResource overrideTo=false)
    res = rd.detect_resource([
        lambda: {"cloud.region": "us-1", "host.name": "h1"},
        {"host.name": "h2", "deployment.env": "prod"},
    ])
    assert res == {
        "cloud.region": "us-1", "host.name": "h1", "deployment.env": "prod"
    }

    # application: existing record values win under override=false
    df = spark.createDataFrame(
        [("r1", None), ("r2", "keep")], "id STRING, `host.name` STRING"
    )
    got = {
        r["id"]: (r["host.name"], r["deployment.env"])
        for r in rd.apply_resource(df, res).collect()
    }
    assert got == {"r1": ("h1", "prod"), "r2": ("keep", "prod")}
