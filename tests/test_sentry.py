"""sentry exporter vs exporter/sentryexporter/sentry_exporter.go semantics:
the op/description semconv ladder, Go-map tag write order, the status
ladder, and the root/orphan transaction grouping fixpoint."""

from __future__ import annotations

from pyspark.sql.types import (
    LongType, MapType, StringType, StructField, StructType,
)

from opentelemetry_collector_contrib_spark.sinks import sentry

SCHEMA = StructType([
    StructField("trace_id", StringType()),
    StructField("span_id", StringType()),
    StructField("parent_span_id", StringType()),
    StructField("name", StringType()),
    StructField("kind", StringType()),
    StructField("status_code", LongType()),
    StructField("status_message", StringType()),
    StructField("attrs", MapType(StringType(), StringType())),
    StructField("resource", MapType(StringType(), StringType())),
    StructField("lib_name", StringType()),
    StructField("lib_version", StringType()),
    StructField("start_ns", LongType()),
    StructField("end_ns", LongType()),
])


def _span(sid, parent="", name="op-name", kind="SPAN_KIND_UNSPECIFIED",
          code=1, msg="", attrs=None, resource=None, trace="t1",
          lib="mylib", libv="1.0", start=100, end=200):
    return (trace, sid, parent, name, kind, code, msg, attrs or {},
            resource or {}, lib, libv, start, end)


def _one(spark, row):
    return sentry.to_sentry_spans(
        spark.createDataFrame([row], SCHEMA)).collect()[0]


# -- generateSpanDescriptors ladder (sentry_exporter.go:191-258) ------------


def test_http_op_kind_suffix_and_description(spark):
    r = _one(spark, _span("a", attrs={"http.method": "GET"},
                          kind="SPAN_KIND_SERVER", name="/api/users"))
    assert (r.op, r.description) == ("http.server", "GET /api/users")
    r = _one(spark, _span("a", attrs={"http.method": "POST"},
                          kind="SPAN_KIND_CLIENT"))
    assert r.op == "http.client"
    r = _one(spark, _span("a", attrs={"http.method": "PUT"},
                          kind="SPAN_KIND_INTERNAL"))
    assert r.op == "http"   # no suffix for non-client/server kinds


def test_ladder_priority_and_remaining_branches(spark):
    # http wins over db when both present
    r = _one(spark, _span("a", attrs={"http.method": "GET",
                                      "db.system": "mysql"}))
    assert r.op == "http"
    r = _one(spark, _span("a", attrs={"db.system": "mysql",
                                      "db.statement": "SELECT 1"}))
    assert (r.op, r.description) == ("db", "SELECT 1")
    r = _one(spark, _span("a", attrs={"db.system": "mysql"}, name="q"))
    assert (r.op, r.description) == ("db", "q")   # no statement → name
    assert _one(spark, _span("a", attrs={"rpc.service": "s"})).op == "rpc"
    assert _one(spark, _span(
        "a", attrs={"messaging.system": "kafka"})).op == "message"
    r = _one(spark, _span("a", attrs={"faas.trigger": "pubsub"}))
    assert r.op == "pubsub"   # op IS the trigger value
    r = _one(spark, _span("a", name="plain"))
    assert (r.op, r.description) == ("", "plain")


# -- tags: Go map write order (:157-181) ------------------------------------


def test_tag_precedence_resource_and_computed_win(spark):
    r = _one(spark, _span(
        "a", kind="SPAN_KIND_SERVER", code=2, msg="boom",
        attrs={"color": "red", "env": "span-says",
               "span_kind": "attr-spoof", "library_name": "attr-spoof"},
        resource={"env": "prod"}, lib="otel-py", libv="0.9"))
    t = dict(r.tags)
    assert t["color"] == "red"
    assert t["env"] == "prod"               # resource overwrites span attr
    assert t["span_kind"] == "server"       # computed overwrites spoof
    assert t["library_name"] == "otel-py"
    assert t["library_version"] == "0.9"
    assert t["status_message"] == "boom"


def test_tag_omissions(spark):
    r = _one(spark, _span("a", kind="SPAN_KIND_UNSPECIFIED", code=1, msg=""))
    t = dict(r.tags)
    assert "span_kind" not in t             # unspecified kind → no tag
    assert "status_message" not in t        # empty message → no tag
    assert t["library_name"] == "mylib"     # library tags always present


# -- status ladder (:289-297) ------------------------------------------------


def test_status_ladder(spark):
    assert _one(spark, _span("a", code=0)).status == "undefined"
    assert _one(spark, _span("a", code=1)).status == "ok"
    assert _one(spark, _span("a", code=2)).status == "unknown"
    r = _one(spark, _span("a", code=7, msg="ignored"))
    assert r.status == "unknown"
    assert dict(r.tags)["status_message"] == "error code 7"


# -- root/orphan resolution (pushTraceData + classifyAsOrphanSpans) ----------


def _resolve(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    out = sentry.resolve_roots(df.select("trace_id", "span_id",
                                         "parent_span_id"), **kw)
    return {r.span_id: (r.kind, r.root_id) for r in out.collect()}


def test_deep_chain_groups_to_root(spark):
    # r <- a <- b <- c <- d: depth 4, resolves in ceil(log2)+1 rounds
    rows = [_span("r"), _span("a", "r"), _span("b", "a"),
            _span("c", "b"), _span("d", "c")]
    got = _resolve(spark, rows)
    assert got["r"] == ("root", "r")
    for s in "abcd":
        assert got[s] == ("grouped", "r")


def test_orphan_chain_and_descendants(spark):
    # x's parent is absent from the batch; y hangs off x — the Go
    # fixpoint leaves BOTH unattached, each its own transaction
    rows = [_span("r"), _span("x", "missing"), _span("y", "x")]
    got = _resolve(spark, rows)
    assert got["x"] == ("orphan", None)
    assert got["y"] == ("orphan", None)
    assert got["r"] == ("root", "r")


def test_parent_cycle_becomes_orphans(spark):
    rows = [_span("p", "q"), _span("q", "p")]
    got = _resolve(spark, rows, max_rounds=5)
    assert got["p"] == ("orphan", None)
    assert got["q"] == ("orphan", None)


def test_trace_scoping(spark):
    # same span ids in two traces resolve independently
    rows = [_span("r", trace="t1"), _span("a", "r", trace="t1"),
            _span("a", "r", trace="t2")]   # t2 has no 'r' → orphan
    got = {(r.trace_id, r.span_id): r.kind for r in sentry.resolve_roots(
        spark.createDataFrame(rows, SCHEMA)
             .select("trace_id", "span_id", "parent_span_id")).collect()}
    assert got[("t1", "a")] == "grouped"
    assert got[("t2", "a")] == "orphan"


# -- transactions (transactionFromSpan :305-327) ------------------------------


def test_transactions_shape_and_span_attachment(spark):
    rows = [
        _span("r", name="root-op", attrs={"http.method": "GET"},
              kind="SPAN_KIND_SERVER", start=10, end=90),
        _span("a", "r", name="child1"),
        _span("b", "a", name="child2"),
        _span("o", "missing", name="lonely", start=5, end=6),
    ]
    out = sentry.sentry_transactions(spark.createDataFrame(rows, SCHEMA))
    got = {r.span_id: r for r in out.collect()}
    assert set(got) == {"r", "o"}
    t = got["r"]
    assert t.type == "transaction"
    assert (t.sdk_name, t.sdk_version) == (sentry.SDK_NAME, sentry.SDK_VERSION)
    assert t.transaction == "GET root-op"
    assert (t.start_ns, t.timestamp_ns) == (10, 90)
    assert [s.span_id for s in t.spans] == ["a", "b"]
    assert t.anchor_kind == "root"
    o = got["o"]
    assert o.anchor_kind == "orphan" and o.spans == []
    assert o.transaction == "lonely"


# -- cache discipline (VERDICT r4 item 1) -------------------------------------


def test_resolve_roots_cache_rotation(spark):
    """Each round must materialize the new state BEFORE the previous
    round's persisted blocks are released (materialize-then-release, the
    connected_components discipline) — and at most ONE invocation's state
    stays pinned under the cacheutil key afterwards."""
    from opentelemetry_collector_contrib_spark import cacheutil

    cacheutil.release("sentry_state")
    rows = [_span("r")] + [
        _span(f"s{i}", f"s{i-1}" if i else "r") for i in range(6)
    ]
    df = spark.createDataFrame(rows, SCHEMA).select(
        "trace_id", "span_id", "parent_span_id")
    out1 = sentry.resolve_roots(df, max_rounds=10)
    assert all(r.kind in ("root", "grouped") for r in out1.collect())
    tracked = cacheutil._TRACKED.get("sentry_state", [])
    assert len(tracked) == 1, "exactly one round's state may stay pinned"
    assert tracked[0].storageLevel.useMemory
    # a second invocation evicts the first invocation's state
    sentry.resolve_roots(df, max_rounds=10).collect()
    assert len(cacheutil._TRACKED.get("sentry_state", [])) == 1
    cacheutil.release("sentry_state")
