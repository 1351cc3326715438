"""Golden tests: the Spark and DuckDB dialects of the page derivation must
agree byte-for-byte (this is what makes every downstream oracle valid)."""

from __future__ import annotations

from opentelemetry_collector_contrib_spark import synth


def test_pages_dialects_agree(spark, duck, sf_dir):
    sdf = synth.pages_full(spark, sf_dir).select(
        "doc_id", "url", "ts_str", "domain", "title", "body_line", "html_str",
        "sev_in", "status", "latency_ms", "corrupt", "fmt_id",
    )
    spark_rows = {r["doc_id"]: r.asDict() for r in sdf.collect()}
    duck_rows = duck.execute(
        f"WITH {synth.pages_oracle_cte('duckdb')} "
        "SELECT doc_id, url, ts_str, domain, title, body_line, html_str,"
        " sev_in, status, latency_ms, corrupt, fmt_id FROM pages"
    ).fetchall()
    cols = ["doc_id", "url", "ts_str", "domain", "title", "body_line",
            "html_str", "sev_in", "status", "latency_ms", "corrupt", "fmt_id"]
    assert len(duck_rows) == len(spark_rows) > 0
    for row in duck_rows:
        d = dict(zip(cols, row))
        s = spark_rows[d["doc_id"]]
        for c in cols:
            assert s[c] == d[c], f"doc_id={d['doc_id']} col={c}: {s[c]!r} != {d[c]!r}"


def test_pages_shape(spark, sf_dir):
    pages = synth.pages_from_documents(spark, sf_dir)
    assert [f.name for f in pages.schema.fields] == ["url", "warc_ts", "html", "text", "lang"]
    assert dict(pages.dtypes)["html"] == "binary"
    n = pages.count()
    assert n > 0
    # html is valid utf-8 and embeds the golden text
    row = pages.limit(1).collect()[0]
    assert row["text"] in bytes(row["html"]).decode("utf-8")


def test_synth_pages_deterministic(spark):
    a = synth.synth_pages(spark, 500, parts=2).orderBy("url").collect()
    b = synth.synth_pages(spark, 500, parts=7).orderBy("url").collect()
    assert a == b  # independent of partitioning/row order


def test_domain_info_dialects_agree(spark, duck):
    sdf = {r["domain"]: r.asDict() for r in synth.domain_info(spark).collect()}
    rows = duck.execute(
        f"WITH {synth.domain_info_oracle_cte()} SELECT * FROM domain_info"
    ).fetchall()
    assert len(rows) == len(sdf) == 21
    for domain, org, cat, tier, ts in rows:
        s = sdf[domain]
        assert (s["org"], s["category"], s["tier"], s["registered_ts"]) == (org, cat, tier, ts)
