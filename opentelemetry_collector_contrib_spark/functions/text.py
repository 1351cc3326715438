"""Text analysis for training-data pipelines: language ID, quality scoring,
token counting, document fingerprinting.

All JVM-side (split / higher-order lambdas / regexp) — no Python UDFs —
with DuckDB oracle builders mirroring each computation exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import md5_int_sql, word_ngrams_expr

# tiny per-language "stopword" marker lists (n-gram-heuristic stand-in;
# deterministic and identical across engines — the operator shape is what
# matters, real lists drop in unchanged)
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "value", "table", "row"],
    "de": ["data", "group", "window", "batch"],
    "fr": ["query", "column", "merge", "sort"],
    "es": ["scan", "filter", "join", "fast"],
    "zh": ["hash", "key", "part", "slow"],
}
LANG_ORDER = ["en", "de", "fr", "es", "zh"]  # strict argmax precedence


def _hits_expr(text_col: str, words: list[str]) -> str:
    arr = "array(" + ",".join(f"'{w}'" for w in words) + ")"
    return f"size(filter(split({text_col}, ' '), t -> array_contains({arr}, t)))"


def _hits_sql(text_col: str, words: list[str]) -> str:
    arr = "[" + ",".join(f"'{w}'" for w in words) + "]"
    return f"len(list_filter(string_split({text_col}, ' '), t -> list_contains({arr}, t)))"


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Predict language = argmax stopword hits (first-listed wins ties)."""
    hit_cols = [
        F.expr(_hits_expr(text_col, STOPWORDS[lg])).alias(f"hits_{lg}")
        for lg in LANG_ORDER
    ]
    df = docs.select("*", *hit_cols)
    pred: Column | None = None
    # strict > comparison in precedence order == deterministic argmax
    best = F.greatest(*[F.col(f"hits_{lg}") for lg in LANG_ORDER])
    for lg in LANG_ORDER:
        c = F.col(f"hits_{lg}") == best
        pred = F.when(c, lg) if pred is None else pred.when(c, lg)
    assert pred is not None
    return df.withColumn("pred_lang", pred)


def lang_id_case_sql(text_col: str = "text") -> tuple[str, str]:
    """(hit-columns SQL fragment, argmax CASE SQL) for the DuckDB oracle."""
    hits = ", ".join(
        f"{_hits_sql(text_col, STOPWORDS[lg])} AS hits_{lg}" for lg in LANG_ORDER
    )
    best = "greatest(" + ", ".join(f"hits_{lg}" for lg in LANG_ORDER) + ")"
    case = "CASE " + " ".join(
        f"WHEN hits_{lg} = {best} THEN '{lg}'" for lg in LANG_ORDER
    ) + " END"
    return hits, case


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality score: token count, distinct-token ratio, mean
    token length, combined score. Ratio features are emitted as
    floor-parts-per-million BIGINTs: floor() of a bit-identical IEEE double
    is engine-stable, while round() half-way behavior differs between Spark
    (HALF_UP on decimal string) and DuckDB (nearest double)."""
    toks = f"split({text_col}, ' ')"
    dr = f"CAST(size(array_distinct({toks})) AS DOUBLE) / size({toks})"
    ml = f"CAST(aggregate({toks}, 0L, (a, t) -> a + length(t)) AS DOUBLE) / size({toks})"
    score = f"0.5 * least(size({toks}) / 100.0, 1.0) + 0.5 * ({dr})"
    return docs.select(
        "*",
        F.expr(f"size({toks})").alias("n_tokens"),
        F.expr(f"CAST(floor(({dr}) * 1000000) AS BIGINT)").alias("distinct_ratio_ppm"),
        F.expr(f"CAST(floor(({ml}) * 1000000) AS BIGINT)").alias("mean_tok_len_ppm"),
        F.expr(f"CAST(floor(({score}) * 1000000) AS BIGINT)").alias("quality_score_ppm"),
    )


def quality_features_sql(relation: str, id_col: str, text_col: str = "text") -> str:
    toks = f"string_split({text_col}, ' ')"
    dr = f"CAST(len(list_distinct({toks})) AS DOUBLE) / len({toks})"
    ml = f"CAST(list_sum(list_transform({toks}, t -> length(t))) AS DOUBLE) / len({toks})"
    score = f"0.5 * least(len({toks}) / 100.0, 1.0) + 0.5 * ({dr})"
    return f"""
SELECT {id_col},
  CAST(len({toks}) AS INTEGER) AS n_tokens,
  CAST(floor(({dr}) * 1000000) AS BIGINT) AS distinct_ratio_ppm,
  CAST(floor(({ml}) * 1000000) AS BIGINT) AS mean_tok_len_ppm,
  CAST(floor(({score}) * 1000000) AS BIGINT) AS quality_score_ppm
FROM {relation}
"""


BPE_ISH_PATTERN = "[a-z]{1,4}"


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish sub-token count (greedy <=4-char
    chunks — a deterministic stand-in for a real BPE vocab)."""
    return docs.select(
        "*",
        F.expr(f"size(split({text_col}, ' '))").alias("ws_tokens"),
        F.regexp_count(F.col(text_col), F.lit(BPE_ISH_PATTERN)).alias("subword_tokens"),
    )


def doc_fingerprint(docs: DataFrame, id_col: str, text_col: str = "text", n: int = 5) -> DataFrame:
    """Winnowing-style fingerprint: min hash over word n-gram shingles."""
    grams = word_ngrams_expr(text_col, n)
    return docs.select(
        F.col(id_col),
        F.expr(
            f"array_min(transform({grams}, g ->"
            f" CAST(conv(substring(md5(CAST(g AS BINARY)), 1, 15), 16, 10) AS BIGINT)))"
        ).alias("fingerprint"),
    )


def doc_fingerprint_sql(relation: str, id_col: str, text_col: str = "text", n: int = 5) -> str:
    idx = " || ' ' || ".join(f"toks[i+{j}]" for j in range(n))
    return f"""
SELECT {id_col},
  list_min(list_transform(
    list_distinct(list_transform(range(1, greatest(len(toks) - {n - 2}, 1)), i -> {idx})),
    g -> {md5_int_sql('g')})) AS fingerprint
FROM (SELECT {id_col}, string_split({text_col}, ' ') AS toks FROM {relation})
"""
