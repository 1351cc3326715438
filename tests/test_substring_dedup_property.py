"""Property test: duplicate_substring_spans vs an independent pure-Python
model on hypothesis-generated corpora.

A 5-token vocabulary with k=3 makes duplicated grams COMMON, so the
generated corpora stress every branch: empty docs, docs shorter than k,
fully-duplicated corpora (every doc one long span), chained island
merges, and within-doc repeats. The Python model recomputes the
semantics from the definition (gram multiset -> dup positions -> island
merge -> min_len gate) with no shared code.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from opentelemetry_collector_contrib_spark.operators import dedup

K = 3
MIN_LEN = 5
VOCAB = ["a", "b", "c", "d", "e"]

corpus_st = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=0, max_size=30),
    min_size=1, max_size=6,
)


def _model(docs: list[list[str]]) -> set[tuple[int, int, int, int]]:
    grams = Counter()
    per_doc = []
    for toks in docs:
        g = [tuple(toks[i:i + K]) for i in range(len(toks) - K + 1)]
        per_doc.append(g)
        grams.update(g)
    out = set()
    for did, g in enumerate(per_doc):
        dup_starts = [i for i, gr in enumerate(g) if grams[gr] >= 2]
        islands: list[tuple[int, int]] = []
        start = prev = None
        for p in dup_starts:
            if start is None:
                start = prev = p
            elif p - prev > K:
                islands.append((start, prev))
                start = prev = p
            else:
                prev = p
        if start is not None:
            islands.append((start, prev))
        for s, e in islands:
            span_end = e + K - 1
            n = span_end - s + 1
            if n >= MIN_LEN:
                out.add((did, s, span_end, n))
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(corpus_st)
def test_spans_match_python_model(spark, corpus):
    docs = [(i, " ".join(toks)) for i, toks in enumerate(corpus)]
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_tokens"])
        for r in dedup.duplicate_substring_spans(
            spark.createDataFrame(docs, "doc_id long, text string"),
            k=K, min_len=MIN_LEN,
        ).collect()
    }
    assert got == _model(corpus)
