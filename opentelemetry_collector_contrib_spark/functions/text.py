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


# ---------------------------------------------------------------------------
# Gopher-style repetition signals (Rae et al. 2021, "Scaling Language
# Models", appendix A1.1 quality filters; same definitions as the public
# RedPajama / NeMo-Curator reimplementations)
# ---------------------------------------------------------------------------


def _all_ngrams_expr(text_col: str, n: int) -> str:
    """ALL word n-grams (non-distinct, array<string>) — repetition counting
    needs multiplicity, unlike dedup's word_ngrams_expr."""
    toks = f"split({text_col}, ' ')"
    return (
        f"CASE WHEN size({toks}) >= {n} THEN "
        f"transform(sequence(1, size({toks}) - {n - 1}),"
        f" i -> concat_ws(' ', slice({toks}, i, {n})))"
        f" ELSE CAST(array() AS ARRAY<STRING>) END"
    )


# len(gram) < 100k always (docs are split into words); pack (count, len)
# into one BIGINT so "most-frequent gram, longest on ties" is a plain MAX
# that both engines order identically.
_PACK = 100_000


def repetition_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_col: str | None = None,
    top_n: int = 2,
    dup_n: int = 3,
) -> DataFrame:
    """Per-document repetition signals:

      dup_line_frac       (lines - distinct lines) / lines
      dup_line_char_frac  chars of line occurrences after the first / line chars
      top_ngram_char_frac chars covered by the most frequent word top_n-gram
                          (count * gram length / doc chars; ties -> longest)
      dup_ngram_char_frac chars of ALL occurrences of repeated dup_n-grams
                          / doc chars (overlapping occurrences each count,
                          so the ratio can exceed 1 — same convention as the
                          public reimplementations)

    Scale shape: line features are row-local higher-order functions (no
    shuffle). N-gram features explode both gram sizes in ONE pass tagged by
    kind, partial-aggregate on (doc, kind, gram) — map-side combine eats
    the repetition that is being measured — then re-aggregate per doc and
    join back to the (narrow) per-doc frame on the id. Two shuffles total,
    both keyed on hashes that distribute evenly; nothing is quadratic.
    """
    line_col = line_col or text_col
    lines = f"split({line_col}, '\\n')"
    dlines = f"array_distinct({lines})"
    chars_of = "(a, x) -> a + length(x)"
    base = docs.select(
        F.col(id_col).alias("doc"),
        F.length(text_col).cast("double").alias("chars"),
        F.expr(
            f"(size({lines}) - size({dlines})) / CAST(size({lines}) AS DOUBLE)"
        ).alias("dup_line_frac"),
        F.expr(
            f"(aggregate({lines}, 0L, {chars_of}) -"
            f" aggregate({dlines}, 0L, {chars_of})) /"
            f" CAST(nullif(aggregate({lines}, 0L, {chars_of}), 0) AS DOUBLE)"
        ).alias("dup_line_char_frac"),
        F.expr(_all_ngrams_expr(text_col, top_n)).alias("__top_grams"),
        F.expr(_all_ngrams_expr(text_col, dup_n)).alias("__dup_grams"),
    )
    tagged = base.select(
        "doc",
        F.explode(
            F.concat(
                F.transform(
                    "__top_grams", lambda g: F.struct(F.lit("top").alias("kind"), g.alias("gram"))
                ),
                F.transform(
                    "__dup_grams", lambda g: F.struct(F.lit("dup").alias("kind"), g.alias("gram"))
                ),
            )
        ).alias("kg"),
    ).select("doc", F.col("kg.kind").alias("kind"), F.col("kg.gram").alias("gram"))
    counts = tagged.groupBy("doc", "kind", "gram").agg(
        F.count(F.lit(1)).alias("c"), F.max(F.length("gram")).alias("l")
    )
    per_doc = counts.groupBy("doc").agg(
        F.max(
            F.when(F.col("kind") == "top", F.col("c") * _PACK + F.col("l"))
        ).alias("top_key"),
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("kind") == "dup") & (F.col("c") >= 2),
                    F.col("c") * F.col("l"),
                )
            ),
            F.lit(0),
        ).alias("dup_chars"),
    )
    out = base.drop("__top_grams", "__dup_grams").join(per_doc, on="doc", how="left")
    top_chars = (
        (F.col("top_key") / _PACK).cast("long") * (F.col("top_key") % _PACK)
    ).cast("double")
    return out.select(
        F.col("doc").alias(id_col),
        F.round("dup_line_frac", 6).alias("dup_line_frac"),
        F.round("dup_line_char_frac", 6).alias("dup_line_char_frac"),
        F.round(F.coalesce(top_chars / F.col("chars"), F.lit(0.0)), 6).alias(
            "top_ngram_char_frac"
        ),
        F.round(
            F.coalesce(F.col("dup_chars") / F.col("chars"), F.lit(0.0)), 6
        ).alias("dup_ngram_char_frac"),
    )


def repetition_features_sql(
    relation: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_expr: str | None = None,
    top_n: int = 2,
    dup_n: int = 3,
) -> str:
    """DuckDB mirror of repetition_features (same packing, same rounding)."""
    line_expr = line_expr or text_col

    def grams(n: int) -> str:
        return (
            f"CASE WHEN len(toks) >= {n} THEN "
            f"list_transform(generate_series(1, len(toks) - {n - 1}),"
            f" i -> array_to_string(list_slice(toks, i, i + {n - 1}), ' '))"
            f" ELSE [] END"
        )

    return f"""
WITH base AS (
  SELECT {id_col} AS doc,
         CAST(len({text_col}) AS DOUBLE) AS chars,
         string_split({line_expr}, chr(10)) AS lines,
         string_split({text_col}, ' ') AS toks
  FROM {relation}
),
linefeat AS (
  SELECT doc, chars,
    (len(lines) - len(list_distinct(lines))) / CAST(len(lines) AS DOUBLE)
      AS dup_line_frac,
    (list_aggregate(list_transform(lines, x -> len(x)), 'sum')
     - list_aggregate(list_transform(list_distinct(lines), x -> len(x)), 'sum'))
    / CAST(nullif(list_aggregate(list_transform(lines, x -> len(x)), 'sum'), 0)
           AS DOUBLE) AS dup_line_char_frac,
    {grams(top_n)} AS top_grams,
    {grams(dup_n)} AS dup_grams
  FROM base
),
g AS (
  SELECT doc, 'top' AS kind, unnest(top_grams) AS gram FROM linefeat
  UNION ALL
  SELECT doc, 'dup' AS kind, unnest(dup_grams) AS gram FROM linefeat
),
counts AS (
  SELECT doc, kind, gram, COUNT(*) AS c, MAX(len(gram)) AS l
  FROM g GROUP BY 1, 2, 3
),
per_doc AS (
  SELECT doc,
    MAX(CASE WHEN kind = 'top' THEN c * {_PACK} + l END) AS top_key,
    COALESCE(SUM(CASE WHEN kind = 'dup' AND c >= 2 THEN c * l END), 0)
      AS dup_chars
  FROM counts GROUP BY 1
)
SELECT f.doc AS {id_col},
  ROUND(f.dup_line_frac, 6) AS dup_line_frac,
  ROUND(f.dup_line_char_frac, 6) AS dup_line_char_frac,
  ROUND(COALESCE(CAST((p.top_key // {_PACK}) * (p.top_key % {_PACK}) AS DOUBLE)
                 / f.chars, 0.0), 6) AS top_ngram_char_frac,
  ROUND(COALESCE(p.dup_chars / f.chars, 0.0), 6) AS dup_ngram_char_frac
FROM linefeat f LEFT JOIN per_doc p USING (doc)
"""


# ---------------------------------------------------------------------------
# PII scrubbing + C4-style line filtering (training-data cleaning ops)
# ---------------------------------------------------------------------------

# RE2/Java-compatible patterns (no backrefs/lookaround) so the Spark plan
# and the DuckDB oracle run the SAME expressions
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PII_PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails / IPv4s / NANP-style phone numbers with typed
    placeholders and count the redactions.  Email replacement runs first
    so the IP pattern cannot re-match the dotted host part.  Each count is
    taken on the SAME text its replacement pass sees (raw for emails,
    email-scrubbed for phones, email+phone-scrubbed for IPs), so
    ``n_<kind>`` equals the number of ``<KIND>`` placeholders written — a
    privacy audit can reconcile counts against redactions exactly (an
    IPv4 inside an email host is redacted as part of the email, counted
    once, as an email).  Pure JVM regexp_replace / regexp_extract_all —
    one codegen'd map stage, the standard pre-training privacy scrub."""
    col = F.col(text_col)

    def n(src, pat: str):
        return F.size(F.regexp_extract_all(src, F.lit(f"({pat})"), 1))

    after_email = F.regexp_replace(col, PII_EMAIL_RE, "<EMAIL>")
    after_phone = F.regexp_replace(after_email, PII_PHONE_RE, "<PHONE>")
    scrubbed = F.regexp_replace(after_phone, PII_IP_RE, "<IP>")
    return docs.withColumns(
        {
            "text_scrubbed": scrubbed,
            "n_emails": n(col, PII_EMAIL_RE),
            "n_phones": n(after_email, PII_PHONE_RE),
            "n_ips": n(after_phone, PII_IP_RE),
        }
    )


def c4_line_filter(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 5,
    min_kept_lines: int = 3,
) -> DataFrame:
    """C4-style cleaning (Raffel et al., "Exploring the Limits of Transfer
    Learning...", JMLR'20 §2.2 — public rules): keep only lines that end
    in terminal punctuation, have >= ``min_words`` words, and don't
    mention javascript; flag documents carrying "lorem ipsum" or a curly
    brace, and require >= ``min_kept_lines`` surviving lines.  All
    higher-order array functions over one split — no UDF, no shuffle."""
    col = F.col(text_col)
    lines = F.split(col, "\n")
    kept = F.filter(
        lines,
        lambda l: l.rlike("[.!?\"']$")
        & (F.size(F.split(F.trim(l), r"\s+")) >= min_words)
        & ~F.lower(l).contains("javascript"),
    )
    has_lorem = F.lower(col).contains("lorem ipsum")
    has_brace = col.contains("{")
    n_kept = F.size(kept)
    return docs.withColumns(
        {
            "clean_text": F.array_join(kept, "\n"),
            "n_lines": F.size(lines),
            "n_lines_kept": n_kept,
            "has_lorem": has_lorem,
            "has_brace": has_brace,
            "keep_doc": ~has_lorem
            & ~has_brace
            & (n_kept >= F.lit(min_kept_lines)),
        }
    )
