"""Mergeable log-bucket quantile sketch (DDSketch-family).

The reference pipeline needs percentiles in two places — statsd timer
summaries (receiver/statsdreceiver/protocol/metric_translator.go) and
spanmetrics latency histograms (processor/spanmetricsprocessor) — and both
reference implementations hold per-key reservoirs or fixed bucket arrays in
memory. Neither shape survives 10^12 rows: exact percentiles need a global
sort per key, and fixed bounds need the data range known up front.

This module is the scale path: the log-bucketed quantile sketch of
Masson/Rim/Lee, "DDSketch: A Fast and Fully-Mergeable Quantile Sketch with
Relative-Error Guarantees" (VLDB 2019) — bucket i holds values in
[gamma^i, gamma^(i+1)), counts are exact, the quantile is read off the
cumulative bucket walk, and two sketches merge by adding bucket counts.

Spark design, chosen for *engine-stable determinism*: gamma = 2 and the
bucket index computed WITHOUT floating log — values are fixed-point scaled
to integers (``round(value * scale)``) and the bucket is the integer's
bit length minus one (``length(bin(v)) - 1``), i.e. floor(log2(v)) exactly.
That keeps every arithmetic step integer-exact, so the same sketch built by
Spark, DuckDB, or a downstream consumer is bit-identical — no libm log()
ulp drift at bucket boundaries. Resolution comes from ``scale``, not gamma:
the guaranteed relative error of the quantile estimate is ≤ 1/3 (midpoint
of a [2^b, 2^(b+1)) bucket) for the value magnitude, while rank selection
is exact to bucket granularity.

Everything is built-in-function JVM work: one partial-aggregatable
groupBy(keys, bucket) shuffle whose width is |keys| x ~64 buckets — at
10^12 rows the shuffle carries only thousands of rows per key, and
map-side combine collapses each partition to its local bucket counts
first. Merging day-level sketches into month-level ones is the same
``sketch_merge`` groupBy, which is what makes this the rollup-friendly
alternative to exact ``percentile`` (statsd.timer_summary's documented
trade-off).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _bucket(value: Column, scale: int) -> Column:
    """floor(log2(round(value * scale))) via bit length — integer exact.
    Non-positive scaled values collapse into bucket -1 (DDSketch stores
    them in a separate zero-bucket; one index is enough at gamma=2)."""
    v = F.round(value * F.lit(scale)).cast("long")
    return F.when(v <= 0, F.lit(-1)) \
            .otherwise(F.length(F.bin(v)) - 1).cast("int")


def sketch_build(df: DataFrame, keys: list[str], value_col: str,
                 scale: int = 100) -> DataFrame:
    """Build per-key sketches: one row per (keys..., bucket) with an exact
    count. The output IS the mergeable sketch."""
    return (df
            .withColumn("bucket", _bucket(F.col(value_col), scale))
            .groupBy(*keys, "bucket")
            .agg(F.count(F.lit(1)).alias("bucket_count")))


def sketch_merge(sketches: DataFrame, keys: list[str]) -> DataFrame:
    """Merge sketches (possibly built at different grains) by summing
    bucket counts — the DDSketch merge operation."""
    return (sketches.groupBy(*keys, "bucket")
            .agg(F.sum("bucket_count").alias("bucket_count")))


def sketch_quantile(sketches: DataFrame, keys: list[str], q: float,
                    scale: int = 100) -> DataFrame:
    """Read quantile q from each key's sketch: the first bucket whose
    cumulative count reaches ceil(q * total). The estimate is the bucket
    midpoint 1.5 * 2^b / scale (exact double: powers of two)."""
    w_cum = (Window.partitionBy(*keys).orderBy("bucket")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_all = Window.partitionBy(*keys)
    ranked = (sketches
              .withColumn("cum", F.sum("bucket_count").over(w_cum))
              .withColumn("total", F.sum("bucket_count").over(w_all))
              .withColumn("rank", F.ceil(F.lit(q) * F.col("total")).cast("long")))
    hit = ranked.filter(F.col("cum") >= F.greatest(F.col("rank"), F.lit(1)))
    est = (F.lit(3.0) * F.pow(F.lit(2.0), F.col("bucket") - 1) / F.lit(scale))
    return (hit.groupBy(*keys)
            .agg(F.min("bucket").alias("bucket"),
                 F.max("total").alias("n"))
            .withColumn("quantile_est",
                        F.when(F.col("bucket") < 0, F.lit(0.0)).otherwise(est))
            .select(*keys, "n", "bucket", "quantile_est"))


def sketch_build_oracle_sql(table: str, keys: list[str], value_col: str,
                            scale: int = 100) -> str:
    """DuckDB SQL producing the identical sketch rows (bin() drops leading
    zeros in both engines, so the bit-length bucket matches exactly)."""
    ks = ", ".join(keys)
    return f"""
SELECT {ks},
       CASE WHEN CAST(ROUND({value_col} * {scale}) AS BIGINT) <= 0 THEN -1
            ELSE LENGTH(BIN(CAST(ROUND({value_col} * {scale}) AS BIGINT))) - 1
       END AS bucket,
       COUNT(*) AS bucket_count
FROM {table} GROUP BY {ks}, bucket
"""


def sketch_quantile_oracle_sql(sketch_sql: str, keys: list[str], q: float,
                               scale: int = 100) -> str:
    """DuckDB SQL reading the same quantile off the sketch CTE."""
    ks = ", ".join(keys)
    return f"""
WITH sk AS ({sketch_sql}),
ranked AS (
  SELECT *,
         SUM(bucket_count) OVER (PARTITION BY {ks} ORDER BY bucket) AS cum,
         SUM(bucket_count) OVER (PARTITION BY {ks}) AS total
  FROM sk
), hit AS (
  SELECT {ks}, bucket, total
  FROM ranked
  WHERE cum >= GREATEST(CAST(CEIL({q} * total) AS BIGINT), 1)
)
SELECT {ks}, CAST(MAX(total) AS BIGINT) AS n, MIN(bucket) AS bucket,
       CASE WHEN MIN(bucket) < 0 THEN 0.0
            ELSE 3.0 * POWER(2.0, MIN(bucket) - 1) / {scale} END AS quantile_est
FROM hit GROUP BY {ks}
"""
