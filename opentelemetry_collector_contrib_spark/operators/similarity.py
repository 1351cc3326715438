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

from opentelemetry_collector_contrib_spark import cacheutil


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
    # a small parquet reads as one partition, which would serialize every
    # Lloyd iteration on one core; spread the (small) training set once
    par = embeddings.sparkSession.sparkContext.defaultParallelism
    if v.rdd.getNumPartitions() < par:
        v = v.repartition(par)
    centroids = [
        [float(x) for x in r["vec"]]
        for r in v.orderBy("id").limit(n_cells).collect()
    ]
    for _ in range(iters):
        # Arrow GEMM assignment (see _assign_cells_arrow): the literal-
        # expression variant builds an n_cells x dim lambda tree whose
        # per-stage codegen alone costs tens of seconds at 64 cells
        assigned = _assign_cells_arrow(v, centroids).select("cell", "vec")
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


#: Prune diagnostics of the most recent _anchor_cells() call — the bench
#: harness reads and reports these (the prune-rate evidence the plan needs;
#: a silent no-op prune would otherwise look like coverage).  Rebound
#: atomically (never mutated in place), so a reader always sees one
#: invocation's complete stats; _anchor_cells also RETURNS the dict so
#: interleaved callers can hold their own copy race-free.
LAST_PRUNE_STATS: dict = {}


def auto_n_anchors(n_rows: int) -> int:
    """Default anchor count for the near-dup scale paths: N/4096 cells
    (constant ~4k-row cells), clamped to [8, 4096].

    Why constant CELL SIZE and not the IVF sqrt(N) convention: in the
    all-pairs GEMM verify the total FLOPs  (~frac x N^2 x dim)  are
    ANCHOR-INDEPENDENT — anchors only set (a) how far the admitted
    fraction `frac` can fall (it floors at the natural-cluster overlap
    once cells are finer than the data's clusters) and (b) the shuffle
    replication, which is partners-per-cell x N ≈ frac x A x N rows and
    grows LINEARLY in A past that floor.  Measured on a 64-cluster
    202k-vector corpus: A=64 → 84 s, A=449 (sqrt N) → 433 s — same GEMM
    work, 5x the replication and 28x the tasks.  ~4k-row cells keep each
    admitted cell pair a ~1 GFLOP BLAS task (fraction-of-a-second, dense
    enough to amortize scheduling) while A grows with N so no single task
    ever owns the corpus.  Above the 4096-anchor cap (N > ~16M) cells
    grow past 4k rows; memory stays bounded (the pair space is tiled
    ``row_block`` rows at a time) but tasks lengthen — at that scale pass
    an explicit data-informed ``n_anchors`` (~ the corpus's cluster
    count).  The prune is exact at ANY anchor count, so this knob never
    changes the result set."""
    return max(8, min(4096, n_rows // 4096))

_LOG = __import__("logging").getLogger("ocs.similarity")


def _assign_cells_arrow(
    v: DataFrame, centroids: list[list[float]]
) -> DataFrame:
    """(id, vec) -> (id, vec, cell, alpha): nearest-centroid assignment as
    one numpy GEMM per Arrow batch (``mapInArrow``).

    Dense batch x centroids similarity is exactly the case where an
    Arrow-vectorized kernel beats the JVM fold: the literal-expression
    assignment evaluates n_cells x dim interpreted lambda steps per row
    (~4096 for 64 cells x 64 dims), the GEMM does the same math at BLAS
    speed. Same argmax-first tie-breaking as F.array_position. One map
    stage, no shuffle — identical plan shape to the expression version.
    """
    import numpy as np
    import pyarrow as pa

    cents = np.asarray(centroids, dtype=np.float64)
    cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)

    def assign(batches):
        for batch in batches:
            if batch.num_rows == 0:
                continue
            vec_arr = batch.column("vec")
            flat = vec_arr.flatten().to_numpy(zero_copy_only=False)
            mat = flat.astype(np.float64).reshape(batch.num_rows, -1)
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            cos = mat @ cents.T
            cell = cos.argmax(axis=1).astype(np.int32)
            alpha = np.arccos(np.clip(cos.max(axis=1), -1.0, 1.0))
            yield pa.record_batch(
                [
                    batch.column("id"),
                    vec_arr,
                    pa.array(cell, type=pa.int32()),
                    pa.array(alpha, type=pa.float64()),
                ],
                names=["id", "vec", "cell", "alpha"],
            )

    schema = (
        "id LONG, vec ARRAY<FLOAT>, cell INT, alpha DOUBLE"
    )
    return v.mapInArrow(assign, schema)


def _anchor_cells(
    embeddings: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    n_anchors: int | None,
    iters: int,
    train_sample_mod: int = 1,
):
    """Shared machinery for the exact anchor-pruned near-dup paths.

    Trains ``n_anchors`` spherical-k-means centroids (deterministic,
    :func:`train_ivf_centroids`), assigns every vector to its nearest
    centroid with its angle ``alpha`` to it, and prunes cell pairs with
    the spherical triangle inequality:  a cell pair (i, j) can contain a
    qualifying pair only if  angle(c_i, c_j) - radius_i - radius_j <=
    theta_t.  NO false negatives — the admitted-pair set provably covers
    every pair with cosine >= threshold, so callers share the all-pairs
    oracle.

    Pruning power is data-dependent: on clustered corpora (the realistic
    near-dup case — that's why duplicates exist) radii shrink to the
    cluster radius and most cross-cell pairs die; on adversarially
    uniform high-dim data radii approach 90 deg and NO exact method can
    prune (every cell pair is admitted — logged, never hidden).

    ``n_anchors=None`` derives the anchor count from the corpus size
    (:func:`auto_n_anchors`) so the prune keeps biting as N grows without
    a caller-side knob.

    Returns (assigned_df(id, vec, cell, alpha) [persisted via
    cacheutil.track — previous invocations' blocks are evicted first],
    allowed list of (cell_a, cell_b, angle), theta_t, stats dict).  Also
    rebinds LAST_PRUNE_STATS to the same stats dict.
    """
    import math

    if n_anchors is None:
        n_anchors = auto_n_anchors(embeddings.count())

    centroids = train_ivf_centroids(
        embeddings, id_col, vec_col, n_cells=n_anchors, iters=iters,
        sample_mod=train_sample_mod,
    )
    theta_t = math.acos(max(-1.0, min(1.0, threshold)))

    v = embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    # a small parquet reads as one partition — spread it so assignment and
    # the candidate verify parallelize (no-op when the scan already has
    # enough splits, i.e. at real scale)
    par = embeddings.sparkSession.sparkContext.defaultParallelism
    if v.rdd.getNumPartitions() < par:
        v = v.repartition(par)
    # persisted: re-read by the radii pass and both sides of the candidate
    # join (at 10^12 rows use DISK_ONLY or recompute — the assignment is
    # one Arrow map stage over the scan, no shuffle either way).  Tracked
    # so repeated invocations in one session don't accumulate pinned
    # blocks (cacheutil evicts the previous call's cache first).
    assigned = cacheutil.track(
        _assign_cells_arrow(v, centroids), key="neardup_assigned"
    )

    cell_stats = assigned.groupBy("cell").agg(
        F.max("alpha").alias("r"), F.count(F.lit(1)).alias("n")
    ).collect()
    radii = {int(r["cell"]): float(r["r"]) for r in cell_stats}
    counts = {int(r["cell"]): int(r["n"]) for r in cell_stats}

    # ordered cell pairs (both directions for i != j so id_a < id_b in the
    # callers emits each unordered vector pair exactly once); 1e-9 slack
    # only ever ADMITS extra candidates — the prune stays exact.  The
    # all-pairs centroid angle matrix is one float64 numpy GEMM: at the
    # 4096-anchor cap that's 4096^2 x dim ~ 1 GFLOP driver-side, where the
    # former pure-Python loop was already minutes at ~700 anchors.
    import numpy as np

    live = sorted(radii)
    c = np.asarray([centroids[i] for i in live], dtype=np.float64)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    ang_m = np.arccos(np.clip(c @ c.T, -1.0, 1.0))
    r = np.asarray([radii[i] for i in live])
    ok = ang_m - r[:, None] - r[None, :] <= theta_t + 1e-9
    ii, jj = np.nonzero(ok)
    allowed = [
        (live[a], live[b], float(ang_m[a, b])) for a, b in zip(ii, jj)
    ]
    n_live = len(radii)
    n_rows = sum(counts.values())
    est_cand = sum(counts[i] * counts[j] for i, j, _ in allowed)
    stats = dict(
        n_anchors=n_anchors,
        n_cells=n_live,
        allowed_cell_pairs=len(allowed),
        total_cell_pairs=n_live * n_live,
        est_candidate_ordered_pairs=est_cand,
        corpus_ordered_pairs=n_rows * n_rows,
    )
    global LAST_PRUNE_STATS
    LAST_PRUNE_STATS = stats  # atomic rebind — readers never see torn state
    _LOG.info(
        "neardup anchor prune: %d/%d cell pairs admitted (%.1f%%), "
        "est candidate ordered pairs %d of %d (%.2f%%)",
        len(allowed), n_live * n_live,
        100.0 * len(allowed) / max(1, n_live * n_live),
        est_cand, n_rows * n_rows,
        100.0 * est_cand / max(1, n_rows * n_rows),
    )
    return assigned, allowed, theta_t, stats


def neardup_pairs_banded(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
    n_anchors: int | None = None,
    iters: int = 2,
    salt: int = 8,
    train_sample_mod: int = 1,
) -> DataFrame:
    """Scale path for :func:`neardup_pairs` — identical result set.

    Anchor-cell pruning (metric pivot pruning on the unit sphere — the
    exact-filtering family of Bayardo et al., "Scaling Up All Pairs
    Similarity Search", WWW'07, with angular pivots): see
    :func:`_anchor_cells` for the prune.  Candidate generation is an
    equi-join through the surviving cell-pair table, then a per-row
    spherical-triangle prefilter  angle(c_i, c_j) - alpha_a - alpha_b <=
    theta_t  (scalar compare — skips the 64-dim fold for most candidates
    on clustered data), then the exact cosine (same sequential fold as the
    all-pairs path, so rounded values agree with the shared oracle).

    The candidate join is salted: the b side is replicated ``salt`` times
    and the join key is (cell, replica), so verify parallelism is
    n_cells x salt tasks instead of one task per (possibly huge) cell —
    without salting a handful of live cells serializes the whole verify
    (measured 31.6 s -> ~3 s at sf0.1; the skew knob the round-2 plan
    audit asked for).
    """
    assigned, allowed, theta_t, _ = _anchor_cells(
        embeddings, id_col, vec_col, threshold, n_anchors, iters,
        train_sample_mod,
    )
    spark = embeddings.sparkSession
    pair_df = spark.createDataFrame(
        [(i, j, float(ang)) for i, j, ang in allowed],
        "cell_a INT, cell_b INT, ang DOUBLE",
    )

    a = assigned.select(
        F.col("id").alias("id_a"),
        F.col("vec").alias("v_a"),
        F.col("cell").alias("cell_a"),
        F.col("alpha").alias("alpha_a"),
        F.pmod(F.xxhash64("id"), F.lit(salt)).cast("int").alias("rep"),
    )
    b = assigned.select(
        F.col("id").alias("id_b"),
        F.col("vec").alias("v_b"),
        F.col("cell").alias("cell_b"),
        F.col("alpha").alias("alpha_b"),
    ).withColumn(
        "rep", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<int>"))
    )
    return (
        a.join(F.broadcast(pair_df), "cell_a")
        .join(b, ["cell_b", "rep"])
        .filter(F.col("id_a") < F.col("id_b"))
        # exact per-row lower bound on angle(v_a, v_b); only ever rejects
        # pairs that cannot qualify
        .filter(
            F.col("ang") - F.col("alpha_a") - F.col("alpha_b")
            <= F.lit(theta_t + 1e-9)
        )
        .withColumn("cos", cosine(F.col("v_a"), F.col("v_b")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 5).alias("cos"))
    )


def neardup_pairs_blocked(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
    n_anchors: int | None = None,
    iters: int = 2,
    row_block: int = 4096,
    train_sample_mod: int = 1,
) -> DataFrame:
    """Block-matrix scale path: same exact anchor prune as
    :func:`neardup_pairs_banded`, but the verify is one float64 GEMM per
    admitted cell pair (cogrouped ``applyInPandas``) instead of a per-pair
    fold.

    Why this is the 100 TB shape: the Arrow transfer moves each cell's
    VECTORS (O(n_i + n_j) rows per admitted pair), never the candidate
    PAIRS (O(n_i * n_j)) — the pair space only ever exists as numpy
    blocks inside the UDF, ``row_block`` rows at a time (bounded memory:
    row_block x |cell| doubles).  Dense-similarity verify is exactly what
    BLAS is for; the JVM fold in the banded sibling pays ~100 ns per
    element, a GEMM pays ~0.1 ns.  Skew knob: a cell too large for one
    task splits into row-blocks via the salted banded path, or raise
    ``n_anchors``.

    Float64 GEMM and the sequential fold agree to ~1e-15, so rounded
    (5 dp) cosines match the shared all-pairs oracle exactly unless a
    pair sits within 1e-10 of the threshold or a rounding boundary —
    asserted against :func:`neardup_pairs` in tests.
    """
    import numpy as np
    import pandas as pd

    assigned, allowed, theta_t, _ = _anchor_cells(
        embeddings, id_col, vec_col, threshold, n_anchors, iters,
        train_sample_mod,
    )
    spark = embeddings.sparkSession
    pair_df = spark.createDataFrame(
        [(i, j, float(ang)) for i, j, ang in allowed],
        "cell_a INT, cell_b INT, ang DOUBLE",
    )
    # one grouped applyInPandas over a side-tagged union (a cogroup of two
    # branches of the same lineage trips Spark's ambiguous-self-join
    # analyzer; the union is equivalent and moves each cell's vectors once
    # per admitted partner cell)
    sides = assigned.select("id", "vec", "cell", "alpha")
    left = (
        sides.join(F.broadcast(pair_df), sides["cell"] == pair_df["cell_a"])
        .select("cell_a", "cell_b", "ang", "id", "vec", "alpha",
                F.lit(0).alias("side"))
    )
    right = (
        sides.join(F.broadcast(pair_df), sides["cell"] == pair_df["cell_b"])
        .select("cell_a", "cell_b", "ang", "id", "vec", "alpha",
                F.lit(1).alias("side"))
    )
    tagged = left.unionByName(right)

    thr = float(threshold)
    blk = int(row_block)
    tt = float(theta_t) + 1e-9

    def gemm_verify(pdf: pd.DataFrame) -> pd.DataFrame:
        l = pdf[pdf["side"] == 0]
        r = pdf[pdf["side"] == 1]
        if len(l) == 0 or len(r) == 0:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos": []})
        # per-record spherical-triangle prune (Bayardo-style record-level
        # filtering): a row can only pair into this cell pair if
        # alpha_row + max(alpha_partner) >= angle(c_i, c_j) - theta_t.
        # Exact — discards only rows that cannot form ANY qualifying pair
        # here; bites even when the cell-level max-radius prune admits the
        # pair (wide cells, tight threshold).
        ang = float(pdf["ang"].iloc[0])
        need = ang - tt
        if need > 0:
            amax_l = float(l["alpha"].max())
            amax_r = float(r["alpha"].max())
            l = l[l["alpha"] >= need - amax_r]
            r = r[r["alpha"] >= need - amax_l]
            if len(l) == 0 or len(r) == 0:
                return pd.DataFrame({"id_a": [], "id_b": [], "cos": []})
        ids_a = l["id"].to_numpy()
        ids_b = r["id"].to_numpy()
        va = np.stack(l["vec"].to_numpy()).astype(np.float64)
        vb = np.stack(r["vec"].to_numpy()).astype(np.float64)
        va /= np.linalg.norm(va, axis=1, keepdims=True)
        vb /= np.linalg.norm(vb, axis=1, keepdims=True)
        out_a, out_b, out_c = [], [], []
        for s in range(0, len(va), blk):
            c = va[s : s + blk] @ vb.T
            ii, jj = np.nonzero(c >= thr)
            keep = ids_a[s + ii] < ids_b[jj]
            out_a.append(ids_a[s + ii][keep])
            out_b.append(ids_b[jj][keep])
            out_c.append(c[ii[keep], jj[keep]])
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "cos": np.concatenate(out_c),
            }
        )

    out = tagged.groupBy("cell_a", "cell_b").applyInPandas(
        gemm_verify, "id_a LONG, id_b LONG, cos DOUBLE"
    )
    return out.select("id_a", "id_b", F.round("cos", 5).alias("cos"))


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
