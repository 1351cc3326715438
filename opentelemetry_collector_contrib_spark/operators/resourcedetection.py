"""resourcedetection processor analogue: detector chain + env detector.

Reference: processor/resourcedetectionprocessor —
  - internal/resourcedetection.go:100-140: detectors run in CONFIG ORDER
    and merge with ``MergeResource(res, detected, overrideTo=false)`` —
    insert-if-absent, so the FIRST detector to set a key wins;
  - internal/env/env.go:55-110: the ``env`` detector reads
    ``OTEL_RESOURCE_ATTRIBUTES`` (deprecated fallback ``OTEL_RESOURCE``),
    parses comma-separated ``key=value`` pairs with trimmed keys/values
    and URL-unescaped values via a strict regex — ANY stray text between
    or after matches is an error and the attributes are cleared;
  - the cloud-metadata detectors (gcp/aws/azure probe network endpoints)
    are unreproducible in a sandbox; the env detector is the honest
    minimal analogue and the chain machinery is detector-agnostic.

Spark design: detection is DRIVER-side config (env vars live on the
driver), producing a tiny constant map; application to the data is
``attributes.upsert_attrs`` — literal columns, no shuffle, exactly the
resourcedetection-merge semantics already proven by the map_pipeline
oracle.
"""

from __future__ import annotations

import os
import re
import urllib.parse
from collections.abc import Callable, Mapping

from pyspark.sql import DataFrame

from opentelemetry_collector_contrib_spark.operators import attributes

ENV_VAR = "OTEL_RESOURCE_ATTRIBUTES"
DEPRECATED_ENV_VAR = "OTEL_RESOURCE"

# env.go:76-78 labelRegex — [[:ascii:]] becomes an explicit byte class
_LABEL_RE = re.compile(
    r"\s*([\x00-\x7f]{1,256}?)\s*=\s*([\x00-\x7f]{0,256}?)\s*(?:,|$)"
)


def parse_env_resource(labels: str) -> dict[str, str]:
    """env.go:79-110 initializeAttributeMap: strict parse; stray text
    anywhere raises ValueError (the reference clears the attributes and
    errors)."""
    matches = list(_LABEL_RE.finditer(labels))
    if not matches:
        raise ValueError(f"invalid resource format: {labels!r}")
    out: dict[str, str] = {}
    prev = 0
    for m in matches:
        if m.start() != prev:
            raise ValueError(
                f"invalid resource format, invalid text: {labels[prev:m.start()]!r}"
            )
        key, value = m.group(1), m.group(2)
        try:
            value = urllib.parse.unquote_plus(value, errors="strict")
        except UnicodeDecodeError as e:  # pragma: no cover - exotic escapes
            raise ValueError(f"invalid resource format in attribute: {e}")
        # InsertString: first occurrence of a key wins
        out.setdefault(key, value)
        prev = m.end()
    if matches[-1].end() != len(labels):
        raise ValueError(
            f"invalid resource format, invalid text: {labels[matches[-1].end():]!r}"
        )
    return out


def env_detector(env: Mapping[str, str] | None = None) -> dict[str, str]:
    """env.go:55-72 Detect: primary var, deprecated fallback, empty ->
    empty resource."""
    env = os.environ if env is None else env
    labels = env.get(ENV_VAR, "").strip()
    if not labels:
        labels = env.get(DEPRECATED_ENV_VAR, "").strip()
        if not labels:
            return {}
    return parse_env_resource(labels)


def detect_resource(
    detectors: list[Callable[[], dict[str, str]] | dict[str, str]],
) -> dict[str, str]:
    """resourcedetection.go:126-133: run detectors in order, merge
    insert-if-absent (first detector wins).  A detector may be a callable
    returning a map or a constant map (config-driven detector)."""
    res: dict[str, str] = {}
    for det in detectors:
        detected = det() if callable(det) else det
        for k, v in detected.items():
            res.setdefault(k, v)
    return res


def apply_resource(
    df: DataFrame, resource: dict[str, str], override: bool = False
) -> DataFrame:
    """Attach the detected resource to every record — MergeResource
    against the record's existing columns (insert-if-absent by default,
    the processor's ``override: false``)."""
    from pyspark.sql import functions as F

    return attributes.upsert_attrs(
        df, {k: F.lit(v) for k, v in resource.items()}, override=override
    )
