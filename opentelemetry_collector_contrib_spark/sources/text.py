"""filelog receiver analogues: line input + multiline assembly.

Reference: receiver/filelogreceiver/README.md:42-60 documents the multiline
config (``line_start_pattern`` / ``line_end_pattern``) — the tailer merges
continuation lines into one entry before the stanza pipeline parses it.

Spark design: multiline assembly is a distributed prefix-scan, not a Python
loop. Each line gets ``is_start = line RLIKE start_pattern``; a running sum
of ``is_start`` over (file, offset) assigns every continuation line the
block id of its most recent start; ``group by (file, block)`` concatenates.
Both passes are JVM window/agg operators that partition by file — at 100 TB
each file's lines stay in one task group, and files spread across the
cluster (the same parallelism model as the reference's one-goroutine-per-
tailed-file, receiver/filelogreceiver/README.md:13-29).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_lines(spark: SparkSession, glob: str) -> DataFrame:
    """filelog input: one row per line with (file, offset) lineage — the
    fingerprint/offset identity the reference checkpoints
    (internal/stanza/storage.go:27-72).

    ``offset`` is the line's REAL byte offset within its file (running sum
    of prior line lengths + newlines over a per-file window), resumable
    exactly like stanza's offset store. Each file is read whole
    (``wholetext``) so line order is the file's byte order by construction
    — a plain ``spark.read.text`` over a multi-split file pairs
    ``monotonically_increasing_id`` with Spark's size-ordered split
    scheduling and is NOT order-safe. Parallelism is per-file, the same
    model as the reference's one-goroutine-per-tailed-file; a single
    100 GB file would need a custom splitter, but log tailing is
    many-files-small-files by nature."""
    lines = (
        spark.read.text(glob, wholetext=True)
        .select(
            F.input_file_name().alias("file"),
            F.split(F.col("value"), "\n").alias("l"),
        )
        .select(
            "file",
            # drop the empty element a trailing newline produces, matching
            # line-mode read semantics
            F.expr(
                "CASE WHEN try_element_at(l, size(l)) = '' "
                "THEN slice(l, 1, size(l) - 1) ELSE l END"
            ).alias("l"),
        )
        .select(
            "file",
            F.posexplode(F.col("l")).alias("line_no", "line"),
        )
    )
    w = (
        Window.partitionBy("file")
        .orderBy("line_no")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return lines.select(
        "file",
        F.coalesce(
            F.sum(F.octet_length("line") + F.lit(1)).over(w), F.lit(0)
        ).alias("offset"),
        "line",
    )


def read_lines_encoded(
    spark: SparkSession,
    glob: str,
    encoding: str = "UTF-8",
    exclude_pattern: str | None = None,
) -> DataFrame:
    """filelog input with the receiver's config surface
    (receiver/filelogreceiver/README.md:13-29): ``include`` is the glob,
    ``exclude`` a path regex, ``encoding`` the file charset.

    Reads each file as one binary blob (``binaryFile`` source), decodes
    JVM-side with the configured charset, then splits to (file, offset,
    line) like :func:`read_lines`. Non-UTF-8 logs (latin-1, UTF-16 ...)
    work because the decode happens AFTER the raw bytes are read — the
    plain text source assumes UTF-8. Offsets here are line ordinals, not
    byte offsets (byte positions in the source encoding are not
    recoverable after decode; use read_lines for UTF-8 byte lineage).
    """
    files = spark.read.format("binaryFile").load(glob)
    if exclude_pattern:
        files = files.filter(~F.col("path").rlike(exclude_pattern))
    return (
        files.select(
            F.col("path").alias("file"),
            F.split(F.decode(F.col("content"), encoding), "\n").alias("l"),
        )
        .select(
            "file",
            F.expr(
                "CASE WHEN try_element_at(l, size(l)) = '' "
                "THEN slice(l, 1, size(l) - 1) ELSE l END"
            ).alias("l"),
        )
        .select("file", F.posexplode(F.col("l")).alias("offset", "line"))
    )


def file_fingerprints(spark: SparkSession, glob: str, size: int = 1000) -> DataFrame:
    """stanza file fingerprinting (operator/builtin/input/file/fingerprint):
    identity = hash of the first ``size`` bytes, stable across renames and
    rotations — what the offset store keys on
    (internal/stanza/storage.go:27-72). One row per file:
    (file, fingerprint, file_bytes, mod_time)."""
    return (
        spark.read.format("binaryFile")
        .load(glob)
        .select(
            F.col("path").alias("file"),
            F.md5(F.expr(f"substring(content, 1, {size})")).alias("fingerprint"),
            F.col("length").alias("file_bytes"),
            F.col("modificationTime").alias("mod_time"),
        )
    )


def assemble_multiline(
    df: DataFrame,
    start_pattern: str,
    file_col: str = "file",
    offset_col: str = "offset",
    line_col: str = "line",
    joiner: str = "\n",
) -> DataFrame:
    """Merge continuation lines into entries (line_start_pattern semantics).

    Returns (file, block, entry, n_lines) — ``entry`` is the start line plus
    all following non-start lines joined by ``joiner``. Lines before the
    first start form block 0 (emitted as-is, matching the tailer's behavior
    of flushing un-matched prefixes).
    """
    w = Window.partitionBy(file_col).orderBy(offset_col)
    blocks = df.withColumn(
        "block",
        F.sum(F.col(line_col).rlike(start_pattern).cast("int")).over(w),
    )
    return (
        blocks.groupBy(file_col, "block")
        .agg(
            # sort_array on (offset, line) structs restores file order —
            # collect_list alone is shuffle-order-dependent
            F.expr(
                f"concat_ws('{joiner}', transform("
                f"sort_array(collect_list(struct({offset_col}, {line_col}))),"
                f" s -> s.{line_col}))"
            ).alias("entry"),
            F.count(F.lit(1)).alias("n_lines"),
            F.min(offset_col).alias("first_offset"),
        )
    )


def assemble_multiline_oracle_sql(
    relation: str,
    start_pattern: str,
    file_col: str = "file",
    offset_col: str = "offset",
    line_col: str = "line",
    joiner: str = "\n",
) -> str:
    """DuckDB equivalent of :func:`assemble_multiline`. ``relation`` may be a
    parenthesized subquery; it is aggregated as a CTE here."""
    p = start_pattern.replace("'", "''")
    j = joiner.replace("'", "''")
    # Portability notes (driver's DuckDB version is unknown):
    #  - the window SUM is cast to BIGINT — uncast integer SUM yields
    #    HUGEINT (int128), which some fetch paths stringify differently;
    #  - in-group ordering goes through list_sort over (offset, line)
    #    structs instead of `string_agg(... ORDER BY ...)`, which not every
    #    version honors deterministically under parallel scans.
    return f"""
b AS (
  SELECT {file_col}, {offset_col}, {line_col},
    CAST(SUM(CASE WHEN regexp_matches({line_col}, '{p}') THEN 1 ELSE 0 END)
      OVER (PARTITION BY {file_col} ORDER BY {offset_col}) AS BIGINT) AS block
  FROM {relation}
),
multiline AS (
  SELECT {file_col}, block,
    array_to_string(list_transform(
      list_sort(list({{'o': {offset_col}, 'l': {line_col}}})), x -> x.l),
      '{j}') AS entry,
    CAST(COUNT(*) AS BIGINT) AS n_lines, MIN({offset_col}) AS first_offset
  FROM b GROUP BY 1, 2
)"""
