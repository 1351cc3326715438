"""Mergeable log-bucket quantile sketch: merge identity, rank correctness,
and the DDSketch relative-error bound vs exact percentiles."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators import qsketch


def _values(spark):
    # deterministic skewed values: 1.28^k style spread plus ties and zeros
    rows = [(("a" if i % 3 else "b"), i % 7, ((i * i) % 997) / 4.0)
            for i in range(1, 2000)]
    rows += [("a", 0, 0.0), ("a", 0, -3.5)]      # zero-bucket cases
    return spark.createDataFrame(rows, ["k", "day", "v"])


def test_merge_identity(spark):
    """Sketch(day grain) merged == sketch(full grain): the DDSketch merge
    law, which is what makes day->month rollups exact."""
    df = _values(spark)
    full = qsketch.sketch_build(df, ["k"], "v")
    daily = qsketch.sketch_build(df, ["k", "day"], "v")
    merged = qsketch.sketch_merge(daily.drop("day"), ["k"])
    a = sorted(map(tuple, full.collect()))
    b = sorted(map(tuple, merged.collect()))
    assert a == b


def test_quantile_relative_error_bound(spark):
    """Estimate is the midpoint of a [2^b, 2^(b+1)) bucket, so it is within
    a factor of [0.75, 1.5] of the true quantile value (gamma=2)."""
    df = _values(spark).filter(F.col("v") > 0)
    for q in (0.5, 0.95, 0.99):
        est = {r.k: r.quantile_est
               for r in qsketch.sketch_quantile(
                   qsketch.sketch_build(df, ["k"], "v"), ["k"], q).collect()}
        exact = {r.k: r.p for r in df.groupBy("k")
                 .agg(F.expr(f"percentile(v, {q})").alias("p")).collect()}
        for k, p in exact.items():
            assert 0.66 * p <= est[k] <= 1.51 * p, (q, k, p, est[k])


def test_zero_bucket_and_low_quantile(spark):
    df = _values(spark)
    out = {r.k: (r.bucket, r.quantile_est)
           for r in qsketch.sketch_quantile(
               qsketch.sketch_build(df, ["k"], "v"), ["k"], 0.0).collect()}
    # q=0 resolves to the lowest bucket; key 'a' holds the <=0 values
    assert out["a"] == (-1, 0.0)


# -- statsd timer summary via sketch (the 10^12-row percentile path) ---------


def _timed(spark):
    rows = [(f"2024-03-{1 + (i % 3):02d} {i % 24:02d}:{i % 60:02d}:00",
             ("lat" if i % 2 else "size"), ((i * 37) % 499) / 2.0 + 1)
            for i in range(1, 1200)]
    df = spark.createDataFrame(rows, ["ts_s", "name", "v"])
    return df.select(F.col("ts_s").cast("timestamp").alias("ts"), "name", "v")


def test_timer_summary_sketch_merge_equivalence(spark):
    """Built hour-grain then merged to day == built day-grain directly —
    the rollup law timer_summary's exact percentile cannot offer."""
    from opentelemetry_collector_contrib_spark.operators import statsd

    df = _timed(spark)
    merged = statsd.timer_summary_sketch(
        df, "ts", "name", "v", interval="1 day",
        percentiles=(0.5, 0.9), merge_from="1 hour")
    direct = statsd.timer_summary_sketch(
        df, "ts", "name", "v", interval="1 day", percentiles=(0.5, 0.9))
    a = sorted(map(tuple, merged.collect()))
    b = sorted(map(tuple, direct.collect()))
    assert a == b and len(a) == 6      # 3 days x 2 names


def test_timer_summary_method_switch_and_error_bound(spark):
    from opentelemetry_collector_contrib_spark.operators import statsd

    df = _timed(spark)
    sk = statsd.timer_summary(df, "ts", "name", "v", "1 day",
                              percentiles=(0.5,), method="sketch")
    assert "p50_est" in sk.columns      # routed through the sketch path
    exact = statsd.timer_summary(df, "ts", "name", "v", "1 day",
                                 percentiles=(0.5,))
    e = {(r.window_start, r.name): r.p50 for r in exact.collect()}
    s = {(r.window_start, r.name): r.p50_est for r in sk.collect()}
    assert set(e) == set(s)
    for k, p in e.items():
        assert 0.66 * p <= s[k] <= 1.51 * p, (k, p, s[k])
