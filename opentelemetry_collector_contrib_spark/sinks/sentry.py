"""sentry exporter analogue — spans grouped into Sentry *transactions*.

Reference: exporter/sentryexporter/sentry_exporter.go. Unlike the 1:1
span translators (honeycomb, newrelic, …) this exporter RESHAPES the
stream: every root span (empty parent id, sentry_exporter.go:300-303)
starts a transaction, every other span is attached to the transaction
of its *root ancestor* — resolved transitively through the in-batch
idMap (pushTraceData :51-111 + the classifyAsOrphanSpans fixpoint
:130-148) — and a span whose ancestor chain never reaches an in-batch
root becomes one single-span transaction of its own
(generateTransactions :113-128; note an orphan's descendants are
orphans too — the idMap never learns an orphan's span id).

Per-span conversion (convertToSentrySpan :150-189):
  - op/description semconv ladder (generateSpanDescriptors :191-258),
    first match wins: http.method → op "http[.client|.server]",
    desc "METHOD name"; db.system → op "db", desc db.statement|name;
    rpc.service → "rpc"; messaging.system → "message"; faas.trigger →
    op = the trigger value; else op "" and desc = span name.
  - tags = span attrs, then resource attrs overwriting on collision
    (:179-181 Go map write order), then status_message (only when
    non-empty), span_kind (only when not UNSPECIFIED, lowercase per
    pdata's SpanKind String()), library_name/library_version always.
  - status ladder (statusFromSpanStatus :289-297): canonicalCodes maps
    0→undefined 1→ok 2→unknown; any other code → unknown with message
    "error code %d". (sentry-go's wire rendering of SpanStatus is not
    claimed byte-faithful — rows carry these descriptive enums.)

Spark design. The per-span conversion is one codegen'd projection.
Root-ancestor resolution is the interesting part at scale: the Go code
walks an in-memory idMap; at 10^12 spans the equivalent is iterative
POINTER DOUBLING over (trace_id, span_id, ptr). Each round self-joins
the evolving state on ptr→span_id, so a pending span either resolves
(its current ancestor candidate is a root / already-grouped / orphan /
absent from the batch) or jumps to that ancestor's own current
candidate — the distance to the terminal HALVES per round, giving
O(log depth) shuffle rounds keyed by trace_id. The Go idMap is global
(span ids assumed unique); we scope joins by trace_id, semantically
identical for well-formed traces and aligned with every other
trace-keyed operator here. A max_rounds guard turns malformed
parent-pointer cycles (impossible in the Go map walk, possible in
adversarial input) into orphans instead of an infinite loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from opentelemetry_collector_contrib_spark import cacheutil
from opentelemetry_collector_contrib_spark.functions.maputil import (
    map_from_entries_last_wins,
)

SDK_NAME = "sentry.opentelemetry"   # sentry_exporter.go:32-33
SDK_VERSION = "0.0.2"

_CHILD_SPAN_T = (
    "array<struct<span_id:string,parent_span_id:string,op:string,"
    "description:string,status:string,start_ns:bigint,end_ns:bigint>>"
)


def to_sentry_spans(spans: DataFrame) -> DataFrame:
    """convertToSentrySpan (:150-189) as one codegen'd projection.

    Input columns: trace_id, span_id, parent_span_id (null/'' = root),
    name, kind ('SPAN_KIND_*'), status_code int, status_message,
    attrs map<string,string> (tag values pre-rendered — the Go typed
    bool/int/double rendering is the decoder's concern upstream),
    resource map<string,string>, lib_name, lib_version,
    start_ns long, end_ns long.
    """
    attrs, kind, code = F.col("attrs"), F.col("kind"), F.col("status_code")
    get = lambda k: F.element_at(attrs, k)  # noqa: E731

    http = get("http.method")
    kind_suffix = (
        F.when(kind == "SPAN_KIND_CLIENT", ".client")
        .when(kind == "SPAN_KIND_SERVER", ".server")
        .otherwise("")
    )
    op = (
        F.when(http.isNotNull(), F.concat(F.lit("http"), kind_suffix))
        .when(get("db.system").isNotNull(), F.lit("db"))
        .when(get("rpc.service").isNotNull(), F.lit("rpc"))
        .when(get("messaging.system").isNotNull(), F.lit("message"))
        .when(get("faas.trigger").isNotNull(), get("faas.trigger"))
        .otherwise("")
    )
    description = (
        F.when(http.isNotNull(), F.concat(http, F.lit(" "), F.col("name")))
        .when(get("db.system").isNotNull(),
              F.coalesce(get("db.statement"), F.col("name")))
        .otherwise(F.col("name"))
    )

    in_range = (code >= 0) & (code <= 2)
    status = F.when(
        in_range,
        F.when(code == 0, "undefined").when(code == 1, "ok").otherwise("unknown"),
    ).otherwise("unknown")
    message = (
        F.when(in_range, F.coalesce(F.col("status_message"), F.lit("")))
        .otherwise(F.concat(F.lit("error code "), code.cast("string")))
    )

    def _entry(k, v):
        return F.struct(F.lit(k).alias("key"), v.alias("value"))

    computed = F.filter(
        F.array(
            F.when(message != "", _entry("status_message", message)),
            F.when(
                kind != "SPAN_KIND_UNSPECIFIED",
                _entry("span_kind",
                       F.lower(F.regexp_replace(kind, "^SPAN_KIND_", ""))),
            ),
            _entry("library_name", F.coalesce(F.col("lib_name"), F.lit(""))),
            _entry("library_version", F.coalesce(F.col("lib_version"), F.lit(""))),
        ),
        lambda e: e.isNotNull(),
    )
    entries = F.concat(
        F.coalesce(F.map_entries(attrs), F.array().cast(
            "array<struct<key:string,value:string>>")),
        F.coalesce(F.map_entries(F.col("resource")), F.array().cast(
            "array<struct<key:string,value:string>>")),
        computed,
    )

    return spans.select(
        "trace_id", "span_id",
        F.coalesce(F.col("parent_span_id"), F.lit("")).alias("parent_span_id"),
        op.alias("op"),
        description.alias("description"),
        map_from_entries_last_wins(entries).alias("tags"),
        status.alias("status"),
        "start_ns", "end_ns",
    )


def resolve_roots(spans: DataFrame, max_rounds: int = 20) -> DataFrame:
    """Transitive root-ancestor resolution by pointer doubling.

    Input: trace_id, span_id, parent_span_id ('' or null = root).
    Output one row per span: trace_id, span_id, root_id (null for
    orphans), kind ∈ 'root' | 'grouped' | 'orphan' — the distributed
    equivalent of pushTraceData's idMap + classifyAsOrphanSpans
    fixpoint. Depth-d chains resolve in ceil(log2 d)+1 rounds; each
    round is one equi-join on (trace_id, ptr→span_id). The per-round
    pending count is a scalar driver collect, same bounded pattern as
    dedup.connected_components.

    Cache discipline (materialize-then-release, the same order
    dedup.connected_components follows): each round's pending count runs
    against the NEW state while the previous round's blocks are still
    pinned — the count scans every partition, so the new state is fully
    cached BEFORE ``cacheutil.register`` evicts its predecessor.  The
    old order (evict first, materialize later via a take-1 probe) forced
    every round to recompute the whole prior lineage from the round-0
    plan — O(rounds²) work.
    """
    state = spans.select(
        "trace_id", "span_id",
        F.coalesce(F.col("parent_span_id"), F.lit("")).alias("ptr"),
    ).withColumn(
        "kind", F.when(F.col("ptr") == "", "root").otherwise("pending")
    ).withColumn(
        "root_id", F.when(F.col("kind") == "root", F.col("span_id"))
    ).persist()
    cacheutil.register(state, key="sentry_state")

    # n_pending is unknown (-1) until round 1's count; running one join
    # round unconditionally is cheaper than a dedicated pre-count job —
    # an all-roots batch joins zero pending rows and exits after it.
    n_pending = -1
    for _ in range(max_rounds):
        if n_pending == 0:
            break
        pending = state.filter(F.col("kind") == "pending")
        jumped = pending.alias("c").join(
            state.alias("a"),
            (F.col("c.trace_id") == F.col("a.trace_id"))
            & (F.col("c.ptr") == F.col("a.span_id")),
            "left",
        ).select(
            F.col("c.trace_id").alias("trace_id"),
            F.col("c.span_id").alias("span_id"),
            # doubling: adopt the ancestor's own current candidate
            F.coalesce(F.col("a.ptr"), F.lit("")).alias("ptr"),
            F.when(F.col("a.span_id").isNull(), "orphan")          # chain exits batch
            .when(F.col("a.kind") == "root", "grouped")
            .when(F.col("a.kind") == "grouped", "grouped")
            .when(F.col("a.kind") == "orphan", "orphan")
            .otherwise("pending").alias("kind"),
            F.when(F.col("a.kind") == "root", F.col("a.span_id"))
            .when(F.col("a.kind") == "grouped", F.col("a.root_id"))
            .alias("root_id"),
        )
        # the union of (cached non-pending, 32ish parts) + (join output,
        # shuffle_partitions parts) would otherwise GROW the state's
        # partition count every round — by round 4 each tiny count/join
        # schedules hundreds of near-empty tasks.  coalesce is narrow (no
        # shuffle) and pins the per-round task count to the session's
        # parallelism.
        nparts = spans.sparkSession.sparkContext.defaultParallelism
        new_state = (
            state.filter(F.col("kind") != "pending").unionByName(jumped)
        ).coalesce(nparts).persist()
        # full-scan count materializes new_state while the old state's
        # blocks (which its lineage reads) are still pinned; only then
        # does register() release the predecessor.
        n_pending = new_state.filter(F.col("kind") == "pending").count()
        cacheutil.register(new_state, key="sentry_state")
        state = new_state

    # cycle guard: anything never resolving is treated as orphan
    return state.select(
        "trace_id", "span_id", "root_id",
        F.when(F.col("kind") == "pending", "orphan")
         .otherwise(F.col("kind")).alias("kind"),
    )


def sentry_transactions(spans: DataFrame, max_rounds: int = 20) -> DataFrame:
    """Full exporter: convert → resolve → group into transaction events.

    One output row per transaction (root span or orphan span), shaped
    after transactionFromSpan (:305-327): trace context, tags, start /
    timestamp and the transaction name come from the anchoring span;
    the attached child-span array is sorted by span_id (the Go slice
    order is arrival order, which a distributed engine cannot and
    should not promise).
    """
    # pin the converted spans: the anchors join, the children join AND the
    # resolver's state all read ss — unpersisted, the (window + self-join +
    # tags-projection) input lineage would run three times.  The resolver's
    # first pending count materializes ss into cache as a side effect.
    ss = cacheutil.track(to_sentry_spans(spans), key="sentry_spans")
    roots = resolve_roots(ss, max_rounds=max_rounds)

    anchors = ss.join(
        roots.filter(F.col("kind").isin("root", "orphan"))
             .select("trace_id", "span_id", "kind"),
        ["trace_id", "span_id"],
    )
    children = ss.join(
        roots.filter(F.col("kind") == "grouped")
             .select("trace_id", "span_id", "root_id"),
        ["trace_id", "span_id"],
    ).groupBy("trace_id", F.col("root_id").alias("anchor_id")).agg(
        F.sort_array(F.collect_list(F.struct(
            "span_id", "parent_span_id", "op", "description", "status",
            "start_ns", "end_ns",
        ))).alias("spans"),
    )

    a, c = anchors.alias("a"), children.alias("c")
    return a.join(
        c,
        (F.col("a.trace_id") == F.col("c.trace_id"))
        & (F.col("a.span_id") == F.col("c.anchor_id")),
        "left",
    ).select(
        F.col("a.trace_id").alias("trace_id"),
        F.col("a.span_id").alias("span_id"),
        F.col("a.op").alias("op"),
        F.col("a.status").alias("status"),
        F.lit("transaction").alias("type"),
        F.lit(SDK_NAME).alias("sdk_name"),
        F.lit(SDK_VERSION).alias("sdk_version"),
        F.col("a.start_ns").alias("start_ns"),
        F.col("a.end_ns").alias("timestamp_ns"),
        F.col("a.description").alias("transaction"),
        F.col("a.tags").alias("tags"),
        F.coalesce(F.col("c.spans"), F.array().cast(_CHILD_SPAN_T)).alias("spans"),
        F.col("a.kind").alias("anchor_kind"),
    )
