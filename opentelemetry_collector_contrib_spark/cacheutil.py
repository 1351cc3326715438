"""Session-lifetime cache hygiene for operators that persist intermediates.

Some scale-path operators (near-dup anchor assignment, connected-components
labels) persist a DataFrame that the RESULT's lineage still references when
the function returns — they cannot unpersist before the caller materializes.
Left alone, repeated invocations in one long session (driver contract runs,
bench loops over sizes) accumulate pinned storage blocks.

The contract here: each tracked persist EVICTS the previous invocation's
tracked blocks under the same key first, so at most one invocation's worth
of pinned storage is ever live per operator family (keys are per-operator so
a pipeline layering two operators doesn't thrash its own caches).
Unpersisting a DataFrame another in-flight query still references is safe —
Spark recomputes the lineage (slower, never wrong).  Callers that want
deterministic cleanup after materializing call :func:`release_all`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: dict[str, list[DataFrame]] = {}


def track(df: DataFrame, key: str) -> DataFrame:
    """Persist ``df`` and register it under ``key``, evicting the previous
    invocation's blocks for the same key."""
    release(key)
    df.persist()
    _TRACKED.setdefault(key, []).append(df)
    return df


def track_append(df: DataFrame, key: str) -> DataFrame:
    """Persist ``df`` and APPEND it under ``key`` WITHOUT evicting the
    earlier entries for the same key — for operators whose result reads a
    CHAIN of pinned intermediates (e.g. one persisted level per nesting
    depth in an iterative explode).  Callers invoke :func:`release` once
    at the start of each invocation so only the previous invocation's
    chain is evicted, never the chain being built."""
    df.persist()
    _TRACKED.setdefault(key, []).append(df)
    return df


def register(df: DataFrame, key: str) -> DataFrame:
    """Register an ALREADY-persisted ``df`` under ``key``, evicting the
    previous invocation's blocks for the same key."""
    release(key)
    _TRACKED.setdefault(key, []).append(df)
    return df


def release(key: str) -> None:
    """Unpersist every DataFrame tracked under ``key`` (idempotent)."""
    for df in _TRACKED.pop(key, []):
        try:
            df.unpersist()
        except Exception:  # session already stopped — nothing to release
            pass


def release_all() -> None:
    """Unpersist every tracked DataFrame (idempotent, exception-safe)."""
    for key in list(_TRACKED):
        release(key)
