"""splunk_hec receiver analogue: HEC JSON event batches -> log rows.

Reference: receiver/splunkhecreceiver/receiver.go:200-290 — decode loop over
newline-delimited JSON events (:240-262), each ``{"time": epoch, "host": …,
"source": …, "sourcetype": …, "index": …, "event": any, "fields": {…}}``,
with obsreport accepted/refused counts (:206,285). The export direction
(exporter/splunkhecexporter/logdata_to_splunk.go:41-95) is the inverse
column mapping.

Spark design: ``from_json`` with a fixed envelope schema (JVM-side); refused
= rows whose JSON fails to decode (null struct), mirroring the receiver's
error path. ``fields`` stays a MapType for open-ended attributes (SURVEY.md
section 1.2 dynamic-schema mapping).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HEC_SCHEMA = (
    "time DOUBLE, host STRING, source STRING, sourcetype STRING, "
    "index STRING, event STRING, fields MAP<STRING, STRING>"
)


def parse_hec_events(df: DataFrame, json_col: str = "raw") -> DataFrame:
    """NDJSON HEC events -> typed rows + parse_ok (accepted/refused)."""
    e = F.from_json(F.col(json_col), HEC_SCHEMA)
    return df.select(
        *df.columns,
        F.timestamp_seconds(e.getField("time")).alias("event_ts"),
        e.getField("host").alias("host"),
        e.getField("source").alias("source"),
        e.getField("sourcetype").alias("sourcetype"),
        e.getField("index").alias("splunk_index"),
        e.getField("event").alias("event"),
        e.getField("fields").alias("fields"),
        # from_json is PERMISSIVE (all-null struct on bad input); validity
        # comes from get_json_object on the root path instead
        F.get_json_object(F.col(json_col), "$").isNotNull().alias("parse_ok"),
    )


def to_hec_events(df: DataFrame, host_col: str, source_col: str, event_col: str,
                  ts_col: str) -> DataFrame:
    """Exporter direction (logdata_to_splunk.go:41-95): rows -> HEC JSON."""
    return df.select(
        F.to_json(
            F.struct(
                F.unix_timestamp(F.col(ts_col)).cast("double").alias("time"),
                F.col(host_col).alias("host"),
                F.col(source_col).alias("source"),
                F.col(event_col).alias("event"),
            )
        ).alias("raw")
    )
