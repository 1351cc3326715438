"""Deterministic synthesis of the input table.

BASELINE.json input_hint mandates the input shape: an Iceberg/parquet table
of Common-Crawl-style web pages ``(url string, warc_ts timestamp,
html binary, text string, lang string)``. No such table ships in
/root/testdata, so we synthesize it deterministically — every derived value
is a pure function of the driver-provided ``documents`` table's columns
(doc_id, text, lang, source), never of row order or RNG state. This mirrors
the reference testbed's deterministic load generator
(testbed/datasenders/stanza.go:80-137: one text line
``YYYY-MM-DD SEV msg`` per item) and its three k8s container log formats
(examples/kubernetes/otel-collector-config.yml:11-45).

Two dialects of the same derivation are generated from one template:
``spark`` (used to build the actual pages DataFrame) and ``duckdb`` (embedded
as a CTE in oracle SQL so the driver's DuckDB side reconstructs the exact
same pages). A pytest golden test asserts the two dialects agree
byte-for-byte.

Embedded body-line formats (FIXTURES.md F2):
  A  testbed text:   ``YYYY-MM-DD SEV <text>``
  B  CRI:            ``<rfc3339>Z stdout F <text>``
  C  docker JSON:    ``{"log": "<text>", "stream": "stderr", "time": "<rfc3339>Z"}``
  corrupt (doc_id %% 23 == 0): ``!!corrupt!! <text>`` — matches no router
  predicate, so the parse stage refuses it (obsreport refused-count analogue,
  receiver/splunkhecreceiver/receiver.go:206-285).

Skew is built in: 50%% of pages land on one hot domain
(``popular.example.com``) to exercise salted aggregation / AQE skew handling
(north_rule requirement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HOT_DOMAIN = "popular.example.com"

# ---------------------------------------------------------------------------
# Cross-dialect SQL template. {S(x)} = cast to string; {TS} = warc_ts expr.
# ---------------------------------------------------------------------------


def _s(dialect: str, x: str) -> str:
    return f"CAST({x} AS STRING)" if dialect == "spark" else f"CAST({x} AS VARCHAR)"


def _warc_ts(dialect: str) -> str:
    day = "(doc_id % 7)"
    secs = "((doc_id * 257) % 86400)"
    if dialect == "spark":
        return f"TIMESTAMP '2024-01-01 00:00:00' + make_interval(0, 0, 0, {day}, 0, 0, {secs})"
    return f"TIMESTAMP '2024-01-01 00:00:00' + {day} * INTERVAL '1 day' + {secs} * INTERVAL '1 second'"


def page_derivation_sql(dialect: str, documents: str = "documents") -> str:
    """SELECT reconstructing the pages table + per-row expected parse results
    from the ``documents`` table. Valid Spark SQL or DuckDB SQL per dialect.
    """
    S = lambda x: _s(dialect, x)  # noqa: E731
    ts = _warc_ts(dialect)
    sev = ("CASE doc_id % 5 WHEN 0 THEN 'DEBUG' WHEN 1 THEN 'INFO' WHEN 2 THEN 'WARN'"
           " WHEN 3 THEN 'ERROR' ELSE 'FATAL' END")
    status = ("CASE WHEN doc_id % 17 = 0 THEN 404 WHEN doc_id % 13 = 0 THEN 500"
              " ELSE 200 END")
    domain = (f"CASE WHEN doc_id % 2 = 0 THEN '{HOT_DOMAIN}'"
              " ELSE source || '.example.com' END")
    return f"""
SELECT
  doc_id,
  text,
  lang,
  source,
  n_chars,
  (doc_id % 23 = 0) AS corrupt,
  (doc_id % 3) AS fmt_id,
  {sev} AS sev_in,
  {status} AS status,
  {domain} AS domain,
  'https://' || {domain} || '/' || lang || '/s' || {S('doc_id % 10')}
      || '/page-' || {S('doc_id')} AS url,
  {ts} AS warc_ts,
  {S(ts)} AS ts_str,
  CAST(((doc_id * 97) % 160000) AS DOUBLE) / 10.0 AS latency_ms
FROM {documents}
"""


def body_and_html_sql(dialect: str) -> str:
    """Second derivation layer: body line (per format) + html string.
    Input: the SELECT from :func:`page_derivation_sql` as relation ``p``.
    """
    S = lambda x: _s(dialect, x)  # noqa: E731
    rfc = "replace(ts_str, ' ', 'T') || 'Z'"
    body = f"""CASE
    WHEN corrupt THEN '!!corrupt!! ' || text
    WHEN fmt_id = 0 THEN substr(ts_str, 1, 10) || ' ' || sev_in || ' ' || text
    WHEN fmt_id = 1 THEN {rfc} || ' stdout F ' || text
    ELSE '{{"log": "' || text || '", "stream": "stderr", "time": "' || {rfc} || '"}}'
  END"""
    title = f"'Doc ' || {S('doc_id')} || ' - ' || domain"
    return f"""
SELECT
  p.*,
  {title} AS title,
  {body} AS body_line,
  '<html><head><title>' || {title} || '</title>'
    || '<meta http-equiv="status" content="' || {S('status')} || '"></head>'
    || '<body><pre>' || {body} || '</pre></body></html>' AS html_str
FROM p
"""


def pages_oracle_cte(dialect: str = "duckdb", documents: str = "documents") -> str:
    """Composable WITH-clause body: ``WITH {pages_oracle_cte()} SELECT ...``
    exposes relation ``pages`` with all derived + expected columns.
    """
    return (
        f"p AS ({page_derivation_sql(dialect, documents)}),\n"
        f"pages AS ({body_and_html_sql(dialect)})"
    )


def expected_parse_sql(dialect: str = "duckdb") -> str:
    """Expected parse-stage output, reconstructed *by construction* (not by
    parsing) — the oracle for byte-identical extraction. Reads ``pages``.
    """
    rfc = "replace(ts_str, ' ', 'T') || 'Z'"
    return f"""
SELECT
  doc_id,
  url,
  warc_ts,
  lang,
  domain,
  latency_ms,
  title,
  CASE WHEN corrupt THEN NULL WHEN fmt_id = 0 THEN 'A'
       WHEN fmt_id = 1 THEN 'B' ELSE 'C' END AS fmt,
  CASE WHEN corrupt THEN NULL WHEN fmt_id = 0 THEN substr(ts_str, 1, 10)
       ELSE {rfc} END AS event_time,
  CASE WHEN corrupt THEN NULL WHEN fmt_id = 0 THEN sev_in ELSE NULL END AS severity_text,
  CASE WHEN corrupt THEN NULL WHEN fmt_id = 0 THEN NULL
       WHEN fmt_id = 1 THEN 'stdout' ELSE 'stderr' END AS stream,
  CASE WHEN corrupt THEN NULL ELSE text END AS message,
  status,
  NOT corrupt AS parse_ok
FROM pages
"""


# ---------------------------------------------------------------------------
# Spark-side builders
# ---------------------------------------------------------------------------


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def pages_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pages + all golden derivation columns (for tests/oracles)."""
    docs = load_documents(spark, sf_dir)
    docs.createOrReplaceTempView("__synth_documents")
    df = spark.sql(
        f"WITH {pages_oracle_cte('spark', '__synth_documents')} SELECT * FROM pages"
    )
    return df.withColumn("html", F.encode(F.col("html_str"), "UTF-8"))


def pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The input_hint-shaped table, exactly (url, warc_ts, html, text, lang).

    ``text`` is the golden extraction target: the byte-identical text the
    parse UDF must recover from ``html`` (north_star per-row invariant).
    """
    return pages_full(spark, sf_dir).select("url", "warc_ts", "html", "text", "lang")


def synth_documents(spark: SparkSession, n_rows: int, parts: int | None = None) -> DataFrame:
    """Standalone documents-shaped generator for arbitrary-scale benchmarks.

    Pure JVM-side expressions over ``spark.range`` — no driver loop, no
    Python UDF, deterministic per id (seeded by id arithmetic, never row
    order), so the same id yields the same row at any scale/parallelism.
    """
    vocab = [
        "key", "agg", "row", "scan", "slow", "fast", "table", "value", "part",
        "hash", "merge", "batch", "spark", "line", "sort", "window", "group",
        "filter", "stream", "vector", "query", "data", "column", "join",
        "small", "big", "order", "customer", "the", "a", "pipeline", "route",
        "sink", "parse", "enrich", "shuffle", "broadcast", "skew", "page", "log",
    ]
    arr = "array(" + ",".join(f"'{w}'" for w in vocab) + ")"
    df = spark.range(0, n_rows, 1, parts or spark.sparkContext.defaultParallelism)
    return df.select(
        F.col("id").alias("doc_id"),
        F.expr(
            f"concat_ws(' ', transform(sequence(1, 30 + CAST(id % 120 AS INT)),"
            f" i -> element_at({arr}, CAST((id * 31 + i * 7) % 40 AS INT) + 1)))"
        ).alias("text"),
        F.expr(
            "CASE WHEN id % 20 < 8 THEN 'en' WHEN id % 20 < 12 THEN 'de'"
            " WHEN id % 20 < 15 THEN 'fr' WHEN id % 20 < 18 THEN 'zh' ELSE 'es' END"
        ).alias("lang"),
        F.expr("'src' || CAST(id % 20 AS STRING)").alias("source"),
        F.expr("length(concat_ws(' ', transform(sequence(1, 30 + CAST(id % 120 AS INT)),"
               f" i -> element_at({arr}, CAST((id * 31 + i * 7) % 40 AS INT) + 1))))"
               ).alias("n_chars"),
    )


def synth_pages(spark: SparkSession, n_rows: int, parts: int | None = None) -> DataFrame:
    """Arbitrary-scale pages table for throughput/scaling benchmarks."""
    docs = synth_documents(spark, n_rows, parts)
    docs.createOrReplaceTempView("__synth_documents")
    df = spark.sql(
        f"WITH {pages_oracle_cte('spark', '__synth_documents')} SELECT * FROM pages"
    )
    return df.withColumn("html", F.encode(F.col("html_str"), "UTF-8")).select(
        "url", "warc_ts", "html", "text", "lang"
    )


def domain_info(spark: SparkSession) -> DataFrame:
    """Enrichment dimension table (FIXTURES.md F3) — k8s pod-metadata
    analogue (processor/k8sprocessor/kube/client.go:190-258). Small by
    design: the enrich stage broadcast-joins it.

    Built deterministically for the 21 possible domains (src0..src19 + hot).
    """
    rows = ",".join(
        f"('src{i}.example.com', 'org{i % 7}', 'cat{i % 3}', "
        f"CASE WHEN {i} % 4 = 0 THEN 'gold' WHEN {i} % 4 = 1 THEN 'silver' ELSE 'bronze' END, "
        f"TIMESTAMP '2020-01-01 00:00:00' + make_interval(0, 0, 0, {i * 13}, 0, 0, 0))"
        for i in range(20)
    )
    rows += f",('{HOT_DOMAIN}', 'org-hot', 'cat-hot', 'gold', TIMESTAMP '2019-06-01 00:00:00')"
    return spark.sql(
        f"SELECT * FROM VALUES {rows} AS t(domain, org, category, tier, registered_ts)"
    )


def domain_info_oracle_cte() -> str:
    """DuckDB CTE reconstructing the same domain_info table."""
    return (
        "domain_info AS ("
        "SELECT 'src' || CAST(i AS VARCHAR) || '.example.com' AS domain,"
        " 'org' || CAST(i % 7 AS VARCHAR) AS org,"
        " 'cat' || CAST(i % 3 AS VARCHAR) AS category,"
        " CASE WHEN i % 4 = 0 THEN 'gold' WHEN i % 4 = 1 THEN 'silver' ELSE 'bronze' END AS tier,"
        " TIMESTAMP '2020-01-01 00:00:00' + i * 13 * INTERVAL '1 day' AS registered_ts"
        " FROM generate_series(0, 19) t(i)"
        " UNION ALL SELECT 'popular.example.com', 'org-hot', 'cat-hot', 'gold',"
        " TIMESTAMP '2019-06-01 00:00:00')"
    )
