"""signalfx translator rules vs the reference's per-datapoint semantics
(exporter/signalfxexporter/translation/translator.go + delta_translator.go,
translator_test.go scenarios re-derived by hand)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType, MapType, StringType, StructField, StructType, DoubleType,
)

from opentelemetry_collector_contrib_spark.operators import signalfx as sx

SCHEMA = StructType([
    StructField("metric", StringType()),
    StructField("dims", MapType(StringType(), StringType())),
    StructField("value_int", LongType()),
    StructField("value_double", DoubleType()),
    StructField("metric_type", StringType()),
    StructField("ts", LongType()),
])


def _dp(metric, dims, vi=None, vd=None, mt="COUNTER", ts=0):
    return (metric, dims, vi, vd, mt, ts)


def _rows(df):
    return sorted(
        (r.metric, tuple(sorted((r.dims or {}).items())), r.value_int,
         r.value_double, r.metric_type, r.ts)
        for r in df.collect()
    )


def test_rename_dimension_keys_scoped(spark):
    df = spark.createDataFrame([
        _dp("cpu", {"host": "a", "core": "0"}),
        _dp("mem", {"host": "b"}),
    ], SCHEMA)
    out = sx.rename_dimension_keys(df, {"host": "host_name"}, metric_names=["cpu"])
    got = {r.metric: dict(r.dims) for r in out.collect()}
    assert got["cpu"] == {"host_name": "a", "core": "0"}
    assert got["mem"] == {"host": "b"}  # out of scope -> untouched


def test_rename_metrics_copy_and_add_dimensions(spark):
    # translator.go:422-445: dims only touched when the metric is renamed
    df = spark.createDataFrame([
        _dp("k8s.pod.network.io", {"pod": "p1", "iface": "eth0"}, vi=5),
        _dp("other", {"pod": "p9"}, vi=1),
    ], SCHEMA)
    out = sx.rename_metrics(
        df, {"k8s.pod.network.io": "pod_network_io_total"},
        copy_dimensions={"pod": "kubernetes_pod"},
        add_dimensions={"system": "kubernetes"})
    got = {r.metric: dict(r.dims) for r in out.collect()}
    assert got["pod_network_io_total"] == {
        "pod": "p1", "iface": "eth0",
        "kubernetes_pod": "p1", "system": "kubernetes"}
    assert got["other"] == {"pod": "p9"}


def test_scale_and_convert_values(spark):
    df = spark.createDataFrame([
        _dp("disk.ops", {}, vi=-7),
        _dp("cpu.util", {}, vd=99.9),
        _dp("mem.used", {}, vi=3),
    ], SCHEMA)
    out = sx.scale_values(df, "divide_int", {"disk.ops": 2})       # Go: -7/2 == -3
    out = sx.scale_values(out, "multiply_float", {"cpu.util": 0.5})
    out = sx.convert_values(out, {"cpu.util": "int", "mem.used": "double"})
    got = {r.metric: (r.value_int, r.value_double) for r in out.collect()}
    assert got["disk.ops"] == (-3, None)
    assert got["cpu.util"] == (49, None)   # 49.95 truncated toward zero
    assert got["mem.used"] == (None, 3.0)


def test_copy_metrics_dimension_filter(spark):
    # copyMetric (translator.go:874-891): copy only when the dim matches
    df = spark.createDataFrame([
        _dp("df.complex.used", {"plugin": "dm-0"}, vi=1),
        _dp("df.complex.used", {"plugin": "sda"}, vi=2),
    ], SCHEMA)
    out = sx.copy_metrics(df, {"df.complex.used": "df.used"},
                          dimension_key="plugin", dimension_values=["sda"])
    names = sorted(r.metric for r in out.collect())
    assert names == ["df.complex.used", "df.complex.used", "df.used"]
    copy = [r for r in out.collect() if r.metric == "df.used"][0]
    assert copy.value_int == 2


def test_split_metric_unmapped_passthrough(spark):
    # splitMetric (translator.go:780-809)
    df = spark.createDataFrame([
        _dp("cpu.usage", {"state": "user", "core": "0"}, vi=1),
        _dp("cpu.usage", {"state": "weird", "core": "1"}, vi=2),
        _dp("cpu.usage", {"core": "2"}, vi=3),
    ], SCHEMA)
    out = sx.split_metric(df, "cpu.usage", "state", {"user": "cpu.user"})
    got = _rows(out)
    assert ("cpu.user", (("core", "0"),), 1, None, "COUNTER", 0) in got
    # unmapped value and absent key keep metric AND the dim
    assert ("cpu.usage", (("core", "1"), ("state", "weird")), 2, None, "COUNTER", 0) in got
    assert ("cpu.usage", (("core", "2"),), 3, None, "COUNTER", 0) in got


def test_aggregate_metric_count_sum_avg(spark):
    df = spark.createDataFrame([
        _dp("reqs", {"host": "a", "core": "0"}, vi=10),
        _dp("reqs", {"host": "a", "core": "1"}, vi=20),
        _dp("reqs", {"host": "b", "core": "0"}, vd=5.0),
        _dp("bystander", {"host": "z"}, vi=1),
    ], SCHEMA)
    cnt = sx.aggregate_metric(df, "reqs", "count", ["core"])
    got = {(r.metric, tuple(sorted(r.dims.items()))): (r.value_int, r.metric_type)
           for r in cnt.collect()}
    assert got[("reqs", (("host", "a"),))] == (2, "GAUGE")
    assert got[("reqs", (("host", "b"),))] == (1, "GAUGE")
    assert got[("bystander", (("host", "z"),))] == (1, "COUNTER")

    avg = sx.aggregate_metric(df, "reqs", "avg", ["core", "host"])
    row = [r for r in avg.collect() if r.metric == "reqs"][0]
    assert row.value_double == (10 + 20 + 5.0) / 3
    assert row.value_int is None


def test_calculate_new_metric_division(spark):
    df = spark.createDataFrame([
        _dp("memory.used", {"host": "a"}, vi=50),
        _dp("memory.total", {"host": "a"}, vi=200),
        _dp("memory.used", {"host": "b"}, vi=1),
        _dp("memory.total", {"host": "b"}, vi=0),   # zero denominator -> skipped
    ], SCHEMA)
    out = sx.calculate_new_metric(df, "memory.utilization",
                                  "memory.used", "memory.total")
    new = [r for r in out.collect() if r.metric == "memory.utilization"]
    assert len(new) == 1
    assert new[0].dims == {"host": "a"} and new[0].value_double == 0.25


def test_delta_metric_reset_and_first_point(spark):
    # delta_translator.go:77-97: first point no delta; negative -> curr value
    df = spark.createDataFrame([
        _dp("c", {"h": "x"}, vi=10, ts=1),
        _dp("c", {"h": "x"}, vi=25, ts=2),
        _dp("c", {"h": "x"}, vi=5, ts=3),    # reset
        _dp("c", {"h": "y"}, vd=1.5, ts=1),
        _dp("c", {"h": "y"}, vd=4.0, ts=2),
    ], SCHEMA)
    out = sx.delta_metric(df, {"c": "c.delta"})
    deltas = sorted((tuple(r.dims.items()), r.ts, r.value_int, r.value_double,
                     r.metric_type)
                    for r in out.collect() if r.metric == "c.delta")
    assert deltas == [
        ((("h", "x"),), 2, 15, None, "GAUGE"),
        ((("h", "x"),), 3, 5, None, "GAUGE"),
        ((("h", "y"),), 2, None, 2.5, "GAUGE"),
    ]


def test_drop_dimensions_value_scoped(spark):
    df = spark.createDataFrame([
        _dp("m", {"env": "dev", "host": "a"}, vi=1),
        _dp("m", {"env": "prod", "host": "b"}, vi=2),
        _dp("n", {"env": "dev"}, vi=3),
    ], SCHEMA)
    out = sx.drop_dimensions(df, {"env": ["dev"], "host": []}, metric_names=["m"])
    got = {r.value_int: dict(r.dims) for r in out.collect()}
    assert got[1] == {}                      # env:dev dropped + host always dropped
    assert got[2] == {"env": "prod"}         # env kept (value not listed)
    assert got[3] == {"env": "dev"}          # metric out of scope


def test_translate_chain_and_unknown_action(spark):
    df = spark.createDataFrame([_dp("a", {}, vi=4)], SCHEMA)
    out = sx.translate_datapoints(df, [
        {"action": "multiply_int", "scale_factors_int": {"a": 3}},
        {"action": "rename_metrics", "mapping": {"a": "b"}},
        {"action": "drop_metrics", "metric_names": ["zzz"]},
    ])
    assert _rows(out) == [("b", (), 12, None, "COUNTER", 0)]
    try:
        sx.translate_datapoints(df, [{"action": "nope"}])
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


# ---------------------------------------------------------------------------
# receiver decode (signalfxv2_to_metricdata.go:42-199)
# ---------------------------------------------------------------------------


def test_decode_all_six_type_branches(spark):
    # fillInType's 3 metric types x 2 datum widths; double always wins
    df = spark.createDataFrame([
        _dp("g_i", {"h": "a"}, vi=7, mt="GAUGE", ts=1),
        _dp("g_d", {}, vd=1.5, mt="GAUGE", ts=2),
        _dp("c_i", {}, vi=3, mt="COUNTER", ts=3),
        _dp("c_d", {}, vd=2.5, mt="COUNTER", ts=4),
        _dp("cc_i", {}, vi=9, mt="CUMULATIVE_COUNTER", ts=5),
        _dp("cc_d", {}, vd=4.5, mt="CUMULATIVE_COUNTER", ts=6),
        _dp("both", {}, vi=1, vd=9.5, mt="GAUGE", ts=7),  # DoubleValue checked first
    ], SCHEMA)
    got = {r.name: r for r in sx.datapoints_to_metrics(df).collect()}
    assert got["g_i"].data_type == "int_gauge"
    assert got["g_i"].temporality is None and got["g_i"].is_monotonic is None
    assert got["g_i"].value_int == 7 and got["g_i"].value_double is None
    assert got["g_i"].ts_ns == 1_000_000           # dpTimestamp: millis -> nanos
    assert dict(got["g_i"].labels) == {"h": "a"}
    assert got["g_d"].data_type == "double_gauge"
    assert (got["c_i"].data_type, got["c_i"].temporality,
            got["c_i"].is_monotonic) == ("int_sum", "DELTA", True)
    assert got["c_d"].data_type == "double_sum"
    assert (got["cc_i"].data_type, got["cc_i"].temporality) == (
        "int_sum", "CUMULATIVE")
    assert got["cc_d"].data_type == "double_sum"
    assert got["both"].data_type == "double_gauge"   # double datum wins
    assert got["both"].value_double == 9.5 and got["both"].value_int is None


def test_decode_drops_nil_datum_and_unknown_type(spark):
    df = spark.createDataFrame([
        _dp("ok", {}, vi=1, mt="GAUGE"),
        _dp("nil1", {}, mt="GAUGE"),                 # errSFxNilDatum
        _dp("nil2", {}, mt="COUNTER"),
        _dp("enum", {}, vi=2, mt="ENUM"),            # unknown data-point type
    ], SCHEMA)
    assert [r.name for r in sx.datapoints_to_metrics(df).collect()] == ["ok"]
    dropped = {r.reason: r.n_dropped for r in sx.decode_dropped(df).collect()}
    assert dropped == {"nil_datum": 2, "unknown_type": 1}
