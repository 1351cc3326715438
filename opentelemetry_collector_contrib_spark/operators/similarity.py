"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the correctness baseline; the scale path
partitions the corpus with a coarse quantizer (IVF — here the provided
``label`` column stands in for the centroid assignment) so each query only
scans its cell. Both variants are pure DataFrame ops: the dot product is a
JVM higher-order ``aggregate(zip_with(...))`` fold in double precision —
no Python in the hot path.

At 10^12 scale: brute force is O(Q x N) — only sane broadcast-side-down
(small query set broadcast against the corpus, which is what the plan below
produces: queries are the broadcast side of the join). IVF cuts N to N/cells
per query; both sides stay shuffle-free apart from the final top-k
aggregation, which is partial (per-partition top-k would be the next
refinement via mapInPandas if k x queries grows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Double-precision sequential fold — same element order as DuckDB's
    list_cosine_similarity, so rounded values agree cross-engine."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


COSINE_SQL = "list_cosine_similarity({a}::DOUBLE[], {b}::DOUBLE[])"


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """For each query vector: top-k nearest corpus vectors by cosine
    (excluding self), rank ties broken by neighbor id."""
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn("cos", cosine(F.col("q_vec"), F.col("n_vec")))
    )
    # two-level top-k: with few queries, a single window on q_id funnels
    # all Q x N scored rows through Q reducers (massive skew at corpus
    # scale). Level 1 ranks within (q_id, hash-bucket of neighbor) — the
    # shuffle spreads over Q x 64 reducers and each keeps <= k rows — then
    # the global window ranks only the Q x 64 x k survivors.
    local_w = Window.partitionBy(
        "q_id", F.pmod(F.xxhash64("n_id"), F.lit(64))
    ).orderBy(F.col("cos").desc(), F.col("n_id"))
    pruned = (
        scored.withColumn("__lr", F.row_number().over(local_w))
        .filter(F.col("__lr") <= k)
        .drop("__lr")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "n_id", F.round("cos", 5).alias("cos"))
    )


def brute_force_topk_sql(
    relation: str,
    query_pred: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    cell_join: str = "",
) -> str:
    cos = COSINE_SQL.format(a=f"q.{vec_col}", b=f"c.{vec_col}")
    return f"""
WITH scored AS (
  SELECT q.{id_col} AS q_id, c.{id_col} AS n_id, {cos} AS cos
  FROM {relation} q JOIN {relation} c
    ON q.{id_col} != c.{id_col} {cell_join}
  WHERE {query_pred.replace(id_col, 'q.' + id_col)}
),
ranked AS (
  SELECT q_id, n_id, cos,
    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
  FROM scored
)
SELECT q_id, CAST(rank AS INTEGER) AS rank, n_id, ROUND(cos, 5) AS cos
FROM ranked WHERE rank <= {k}
"""


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    k: int = 5,
) -> DataFrame:
    """IVF-style ANN: search only the query's coarse cell (equi-join on the
    centroid assignment instead of a cross join)."""
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.col(cell_col).alias("cell"),
    )
    c = corpus.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        F.col(cell_col).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn("cos", cosine(F.col("q_vec"), F.col("n_vec")))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "n_id", F.round("cos", 5).alias("cos"))
    )


def _cos_to_centroids(vec: Column, centroids: list[list[float]]) -> Column:
    """Array column of cosine(vec, centroid_i) for each trained centroid."""
    return F.array(
        *[cosine(vec, F.array(*[F.lit(float(x)) for x in c])) for c in centroids]
    )


def assign_cell(vec: Column, centroids: list[list[float]]) -> Column:
    """0-based index of the nearest (max-cosine) centroid — pure JVM
    expression over literal centroids, no join and no Python in the path."""
    arr = _cos_to_centroids(vec, centroids)
    return (F.array_position(arr, F.array_max(arr)) - 1).cast("int")


def train_ivf_centroids(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 8,
    iters: int = 3,
    sample_mod: int = 1,
) -> list[list[float]]:
    """Train an IVF coarse quantizer: spherical k-means (Lloyd) entirely as
    DataFrame ops, deterministic init (the ``n_cells`` lowest ids).

    Each iteration assigns every vector to its max-cosine centroid (literal
    array expression — no shuffle) and recomputes centroids as the
    element-wise mean via ``posexplode`` + groupBy(cell, pos): one partial
    aggregation whose shuffle is n_cells x dim rows regardless of corpus
    size. Only the centroids (n_cells x dim floats) ever reach the driver —
    the standard FAISS-style split where the coarse quantizer is tiny
    driver/broadcast state and the corpus never leaves the executors.

    At 10^12 rows train on a deterministic sample (``sample_mod=m`` keeps
    ids with xxhash64(id) % m == 0) — quantizer quality needs only a few
    million points, not the corpus.
    """
    v = embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    if sample_mod > 1:
        v = v.filter(F.pmod(F.xxhash64(F.col("id")), F.lit(sample_mod)) == 0)
    centroids = [
        [float(x) for x in r["vec"]]
        for r in v.orderBy("id").limit(n_cells).collect()
    ]
    for _ in range(iters):
        assigned = v.select(assign_cell(F.col("vec"), centroids).alias("cell"), "vec")
        means = (
            assigned.select("cell", F.posexplode("vec").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(int(r["cell"]), {})[int(r["pos"])] = float(r["m"])
        centroids = [
            [cell[p] for p in sorted(cell)] if (cell := by_cell.get(i)) else centroids[i]
            for i in range(n_cells)
        ]
    return centroids


def ivf_topk_trained(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """IVF search with a trained quantizer and multi-probe: each corpus
    vector lives in exactly one cell; each query probes its ``nprobe``
    closest cells (explode -> equi-join on cell), so the scan cost per query
    is ~nprobe/n_cells of the corpus instead of all of it. With
    ``nprobe == len(centroids)`` every cell is probed and the result is
    provably identical to :func:`brute_force_topk` (the contract oracle).

    Plan shape at scale: corpus-side cell assignment is a literal
    expression (no shuffle); queries (small) broadcast; the only shuffle is
    the final per-query top-k, pre-pruned by the same two-level trick as
    brute force.
    """
    c = corpus.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        assign_cell(F.col(vec_col), centroids).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    ).select(
        "q_id",
        "q_vec",
        F.slice(
            F.transform(
                F.array_sort(
                    F.zip_with(
                        _cos_to_centroids(F.col("q_vec"), centroids),
                        F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
                        lambda cos, i: F.struct((-cos).alias("neg"), i.alias("i")),
                    )
                ),
                lambda s: s["i"],
            ),
            1,
            nprobe,
        ).alias("probes"),
    ).select("q_id", "q_vec", F.explode("probes").alias("cell"))
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn("cos", cosine(F.col("q_vec"), F.col("n_vec")))
    )
    local_w = Window.partitionBy(
        "q_id", F.pmod(F.xxhash64("n_id"), F.lit(64))
    ).orderBy(F.col("cos").desc(), F.col("n_id"))
    pruned = (
        scored.withColumn("__lr", F.row_number().over(local_w))
        .filter(F.col("__lr") <= k)
        .drop("__lr")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "n_id", F.round("cos", 5).alias("cos"))
    )


def neardup_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (doc-level near-dup by vector).
    Exact all-pairs at test scale; the scale path pre-buckets by LSH
    hyperplane signs (same banding machinery as dedup.minhash_lsh_pairs).
    """
    a = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    b = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine(F.col("v_a"), F.col("v_b")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 5).alias("cos"))
    )


def neardup_pairs_banded(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
    n_anchors: int = 8,
) -> DataFrame:
    """Scale path for :func:`neardup_pairs` — identical result set.

    Anchor-cell pruning (metric pivot pruning on the unit sphere — the
    exact-filtering family of Bayardo et al., "Scaling Up All Pairs
    Similarity Search", WWW'07, applied with angular pivots): every vector
    is assigned to its nearest of ``n_anchors`` anchor vectors (the lowest
    ids, deterministic); a cell pair (i, j) can contain a qualifying pair
    only if  angle(anchor_i, anchor_j) - radius_i - radius_j <= theta_t
    (spherical triangle inequality), so candidate generation is an
    equi-join through the surviving cell-pair table instead of a cross
    join, then candidates verify with the exact cosine. Unlike hyperplane
    LSH banding this prunes with NO false negatives, so the result is
    provably identical to the all-pairs join and shares its oracle.

    At 10^12 rows: anchors/radii are tiny driver-side state (like a
    broadcast dim table); the join replicates each vector once per
    surviving partner cell; hot cells are the skew knob (raise
    ``n_anchors`` / salt the per-cell-pair block join).
    """
    import math

    v = embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    anchors = [
        (int(r["id"]), [float(x) for x in r["vec"]])
        for r in v.orderBy("id").limit(n_anchors).collect()
    ]
    theta_t = math.acos(max(-1.0, min(1.0, threshold)))

    cos_to_anchor = [
        cosine(F.col("vec"), F.array(*[F.lit(x) for x in avec])).alias(f"c_{i}")
        for i, (_aid, avec) in enumerate(anchors)
    ]
    scored = v.select("id", "vec", *cos_to_anchor)
    cos_arr = F.array(*[F.col(f"c_{i}") for i in range(len(anchors))])
    assigned = scored.select(
        "id",
        "vec",
        (F.array_position(cos_arr, F.array_max(cos_arr)) - 1).cast("int").alias("cell"),
        F.acos(F.greatest(F.lit(-1.0), F.least(F.lit(1.0), F.array_max(cos_arr)))).alias(
            "alpha"
        ),
    )
    radii = {
        int(r["cell"]): float(r["r"])
        for r in assigned.groupBy("cell").agg(F.max("alpha").alias("r")).collect()
    }

    def _angle(a: list[float], b: list[float]) -> float:
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return math.acos(max(-1.0, min(1.0, d / (na * nb))))

    # ordered cell pairs (both directions for i != j so id_a < id_b below
    # emits each unordered vector pair exactly once); 1e-9 slack only ever
    # ADMITS extra candidates — prune stays exact
    allowed = [
        (i, j)
        for i in radii
        for j in radii
        if _angle(anchors[i][1], anchors[j][1]) - radii[i] - radii[j]
        <= theta_t + 1e-9
    ]
    spark = embeddings.sparkSession
    pair_df = spark.createDataFrame(allowed, "cell_a INT, cell_b INT")

    a = assigned.select(
        F.col("id").alias("id_a"), F.col("vec").alias("v_a"), F.col("cell").alias("cell_a")
    )
    b = assigned.select(
        F.col("id").alias("id_b"), F.col("vec").alias("v_b"), F.col("cell").alias("cell_b")
    )
    return (
        a.join(F.broadcast(pair_df), "cell_a")
        .join(b, "cell_b")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine(F.col("v_a"), F.col("v_b")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 5).alias("cos"))
    )


def neardup_pairs_sql(
    relation: str, id_col: str = "vec_id", vec_col: str = "embedding",
    threshold: float = 0.45,
) -> str:
    cos = COSINE_SQL.format(a=f"a.{vec_col}", b=f"b.{vec_col}")
    return f"""
SELECT a.{id_col} AS id_a, b.{id_col} AS id_b, ROUND({cos}, 5) AS cos
FROM {relation} a JOIN {relation} b ON a.{id_col} < b.{id_col}
WHERE {cos} >= {threshold}
"""
