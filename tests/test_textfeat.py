"""Unit tests for Gopher-style repetition signals (hand-computed values)."""

from __future__ import annotations

import duckdb

from opentelemetry_collector_contrib_spark.functions import text as textfn


def test_repetition_features_hand_computed(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b a", "x\ny\nx"),
            (2, "q w e r t", "p\nq"),  # no repeated grams, no dup lines
            (3, "zz", "zz"),  # fewer tokens than any n: empty gram arrays
        ],
        "doc_id long, text string, ltext string",
    )
    out = {
        r["doc_id"]: r
        for r in textfn.repetition_features(
            df, "doc_id", "text", line_col="ltext", top_n=2, dup_n=3
        ).collect()
    }
    r1 = out[1]
    # lines [x, y, x]: 1 of 3 duplicated, 1 of 3 chars duplicated
    assert r1["dup_line_frac"] == round(1 / 3, 6)
    assert r1["dup_line_char_frac"] == round(1 / 3, 6)
    # 2-grams: 'a b'x2, 'b a'x2 -> top covers 2*3 of 9 chars
    assert r1["top_ngram_char_frac"] == round(6 / 9, 6)
    # 3-grams: 'a b a'x2 (overlapping) -> 2*5 of 9 chars, ratio > 1 allowed
    assert r1["dup_ngram_char_frac"] == round(10 / 9, 6)
    r2 = out[2]
    assert r2["dup_line_frac"] == 0.0
    assert r2["dup_line_char_frac"] == 0.0
    # every 2-gram unique: top still covers one gram's chars (1*3 of 9)
    assert r2["top_ngram_char_frac"] == round(3 / 9, 6)
    assert r2["dup_ngram_char_frac"] == 0.0
    r3 = out[3]
    assert r3["top_ngram_char_frac"] == 0.0 and r3["dup_ngram_char_frac"] == 0.0


def test_repetition_features_matches_duckdb_oracle(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    from pyspark.sql import functions as F

    with_lines = docs.withColumn(
        "ltext",
        F.concat_ws(
            "\n",
            F.col("text"),
            F.substring("text", 1, 40),
            F.substring("text", 1, 40),
        ),
    )
    got = {
        r["doc_id"]: tuple(r)[1:]
        for r in textfn.repetition_features(
            with_lines, "doc_id", "text", line_col="ltext"
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    sql = textfn.repetition_features_sql(
        "documents",
        "doc_id",
        "text",
        line_expr=(
            "text || chr(10) || substr(text, 1, 40) || chr(10) || "
            "substr(text, 1, 40)"
        ),
    )
    want = {r[0]: tuple(r)[1:] for r in con.execute(sql).fetchall()}
    assert set(got) == set(want)
    mism = [k for k in got if got[k] != want[k]]
    assert not mism, (mism[:3], got[mism[0]], want[mism[0]]) if mism else None


def test_pii_scrub_and_c4_filter_semantics(spark):
    from pyspark.sql import functions as F

    from opentelemetry_collector_contrib_spark.functions import text as tf

    df = spark.createDataFrame(
        [(1, "write a@b.co or c.d+x@e.org, call 555-123-4567, host 10.0.0.1"),
         (2, "nothing here")],
        "doc_id LONG, text STRING",
    )
    out = {r["doc_id"]: r for r in tf.pii_scrub(df).collect()}
    r1 = out[1]
    assert r1["n_emails"] == 2 and r1["n_phones"] == 1 and r1["n_ips"] == 1
    assert r1["text_scrubbed"] == (
        "write <EMAIL> or <EMAIL>, call <PHONE>, host <IP>"
    )
    r2 = out[2]
    assert (r2["n_emails"], r2["n_phones"], r2["n_ips"]) == (0, 0, 0)
    assert r2["text_scrubbed"] == "nothing here"


def test_pii_scrub_counts_equal_redactions(spark):
    """An IPv4 inside an email host is redacted once (as the email) and
    must NOT inflate n_ips: every count runs on the text the matching
    replacement pass sees, so count == placeholders written per kind."""
    from opentelemetry_collector_contrib_spark.functions import text as tf

    df = spark.createDataFrame(
        [(1, "mail root@10.0.0.1.example.com plus bare 192.168.0.1")],
        "doc_id LONG, text STRING",
    )
    r = tf.pii_scrub(df).collect()[0]
    assert r["n_emails"] == 1
    assert r["n_ips"] == 1  # only the bare IP; the in-email one is gone
    assert r["text_scrubbed"] == "mail <EMAIL> plus bare <IP>"
    assert r["text_scrubbed"].count("<IP>") == r["n_ips"]
    assert r["text_scrubbed"].count("<EMAIL>") == r["n_emails"]

    c4 = spark.createDataFrame(
        [(1, "good sentence with enough words here.\nshort one.\n"
             "no terminal punctuation on this line\n"
             "this page needs JavaScript enabled to work.\n"
             "another quite acceptable long sentence right here!\n"
             'a quoted ending counts as terminal too"')],
        "doc_id LONG, text STRING",
    )
    row = tf.c4_line_filter(c4, min_kept_lines=3).collect()[0]
    assert row["n_lines"] == 6
    # kept: 1st, 5th, 6th (quote-terminal); dropped: short, no-punct, js
    assert row["n_lines_kept"] == 3 and row["keep_doc"]
    assert row["clean_text"].splitlines()[1].endswith("here!")
