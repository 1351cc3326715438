"""Map-building helpers shared by the wire-format decoders.

Spark's ``map_from_arrays`` / ``map_from_entries`` obey
``spark.sql.mapKeyDedupPolicy`` which defaults to EXCEPTION — a single
input line carrying a duplicated tag/label key (legal on several wire
protocols, e.g. Carbon accepts ``m;k=1;k=2 5 100`` and appends both keys
to its label list, plaintext_parser.go:69-88) would abort the whole job
instead of being handled per line.  The helper here dedups explicitly
with **last-occurrence-wins** semantics — what a Go ``map[string]string``
built by iterating the tokens in order would produce — independent of the
session's dedup policy.

Pure higher-order-function expressions (zip_with / filter / exists /
slice): JVM-side, codegen-friendly, no Python, no shuffle.  The quadratic
scan is over the per-line tag count (a handful of elements), not the row
count.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def map_from_arrays_last_wins(keys: Column, values: Column) -> Column:
    """``map_from_arrays`` that tolerates duplicate keys: the value of the
    LAST occurrence of a key wins, regardless of
    ``spark.sql.mapKeyDedupPolicy``.  NULL-safe on empty arrays."""
    entries = F.zip_with(
        keys, values, lambda k, v: F.struct(k.alias("key"), v.alias("value"))
    )
    # keep entry i only if its key never reappears later (1-based slice:
    # elements strictly after 0-based index i start at position i + 2)
    deduped = F.filter(
        entries,
        lambda e, i: ~F.exists(
            F.slice(entries, i + F.lit(2), F.size(entries)),
            lambda later: later["key"] == e["key"],
        ),
    )
    # short-circuit: duplicate keys are a rare per-line affair on every
    # wire protocol this serves — one O(n) array_distinct probe routes the
    # overwhelmingly common no-dup line around the quadratic scan.
    # CaseWhen only evaluates the taken branch, so map_from_arrays can
    # never see a duplicated key (and thus never throws under the default
    # mapKeyDedupPolicy=EXCEPTION).  NULL keys arrays fall through to the
    # taken branch as NULL on both sides, matching the pre-guard result.
    return F.when(
        F.size(F.array_distinct(keys)) == F.size(keys),
        F.map_from_arrays(keys, values),
    ).otherwise(F.map_from_entries(deduped))


def map_from_entries_last_wins(entries: Column) -> Column:
    """``map_from_entries`` with LAST-occurrence-wins key dedupe — the Go
    ``m[k] = v`` overwrite order — independent of the session's
    ``mapKeyDedupPolicy``.  Same short-circuit as
    :func:`map_from_arrays_last_wins`: one O(n) ``array_distinct`` probe
    over the keys routes the overwhelmingly common no-duplicate row around
    the quadratic later-occurrence scan; CaseWhen only evaluates the taken
    branch, so ``map_from_entries`` never sees a duplicated key."""
    keys = F.transform(entries, lambda e: e["key"])
    deduped = F.filter(
        entries,
        lambda e, i: ~F.exists(
            F.slice(entries, i + F.lit(2), F.size(entries)),
            lambda later: later["key"] == e["key"],
        ),
    )
    return F.when(
        F.size(F.array_distinct(keys)) == F.size(keys),
        F.map_from_entries(entries),
    ).otherwise(F.map_from_entries(deduped))
