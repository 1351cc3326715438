"""opentelemetry_collector_contrib_spark — a PySpark-native re-creation of the
OpenTelemetry Collector contrib pipeline engine (reference:
BinaryHexer/opentelemetry-collector-contrib @ v0.27.x, Go).

The reference is a push-based streaming dataflow engine: receivers (sources)
-> processors (operators) -> exporters (sinks), wired by YAML config
(reference cmd/otelcontribcol/main.go:30-45). This package re-expresses the
same semantics as a declarative Spark DataFrame DAG over Common-Crawl-style
web-page tables: parse -> enrich -> route -> aggregate, with collector-style
pipeline metrics, checkpoint/resume, and skew-aware shuffles.

Architecture is Spark-first, not a port: pdata batches map to DataFrame
partitions, processors map to DataFrame transforms, exporters map to
partitioned sink writes, and the goroutine/channel machinery is superseded
by Catalyst planning + partition parallelism (SURVEY.md section 3).
"""

__version__ = "0.1.0"
