"""Exact-substring duplicate spans (Lee et al. 2021 ExactSubstr,
k-gram fingerprint formulation) — span boundaries, merging, removal.

Oracle: dedup.duplicate_substring_spans_sql is hash-compared against
the Spark side by the driver contract (query `substring_dedup`); these
tests pin the semantics on constructed corpora where the right answer
is known by hand.
"""

from __future__ import annotations

from opentelemetry_collector_contrib_spark.operators import dedup

# 8 shared tokens embedded at different positions in two docs; the
# surrounding tokens are all unique so no other k-gram repeats
SHARED = "alpha beta gamma delta epsilon zeta eta theta"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cross_doc_span_boundaries(spark):
    d0 = "u0 u1 " + SHARED + " u2 u3"        # span at tokens 2..9
    d1 = "v0 " + SHARED + " v1 v2 v3 v4"     # span at tokens 1..8
    out = dedup.duplicate_substring_spans(
        _docs(spark, [(0, d0), (1, d1)]), k=3, min_len=6
    ).collect()
    spans = {r["doc_id"]: (r["span_start"], r["span_end"], r["n_tokens"])
             for r in out}
    assert spans == {0: (2, 9, 8), 1: (1, 8, 8)}


def test_within_doc_repetition_counts(spark):
    # the shared run occurs twice in ONE doc — still duplicated text
    d0 = SHARED + " filler " + SHARED
    out = dedup.duplicate_substring_spans(
        _docs(spark, [(0, d0)]), k=3, min_len=6
    ).collect()
    assert len(out) == 2
    assert sorted((r["span_start"], r["span_end"]) for r in out) == [
        (0, 7), (9, 16)
    ]


def test_overlapping_grams_merge_to_one_maximal_span(spark):
    # every 3-gram of the 8-token run repeats, so 6 dup gram starts per
    # doc must merge into ONE island, not six spans
    d0 = SHARED + " x0"
    d1 = "y0 " + SHARED
    out = dedup.duplicate_substring_spans(
        _docs(spark, [(0, d0), (1, d1)]), k=3, min_len=6
    ).collect()
    assert len(out) == 2


def test_min_len_and_short_docs(spark):
    # shared run of 4 tokens < min_len 6 → no span; 2-token doc < k → no
    # gram, no crash
    out = dedup.duplicate_substring_spans(
        _docs(spark, [(0, "alpha beta gamma delta p q"),
                      (1, "r alpha beta gamma delta s"),
                      (2, "t u")]),
        k=3, min_len=6,
    ).collect()
    assert out == []


def test_remove_duplicate_spans(spark):
    d0 = "u0 u1 " + SHARED + " u2 u3"
    d1 = "v0 " + SHARED + " v1 v2 v3 v4"
    d2 = "w0 w1 w2"     # untouched passthrough
    docs = _docs(spark, [(0, d0), (1, d1), (2, d2)])
    spans = dedup.duplicate_substring_spans(docs, k=3, min_len=6)
    cleaned = {
        r["doc_id"]: r["text"]
        for r in dedup.remove_duplicate_spans(docs, spans).collect()
    }
    assert cleaned[0] == "u0 u1 u2 u3"
    assert cleaned[1] == "v0 v1 v2 v3 v4"
    assert cleaned[2] == "w0 w1 w2"
