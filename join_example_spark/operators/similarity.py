"""Similarity search over embedding columns (array<float>).

Brute-force blocked cosine top-k as the exact baseline, and a
BucketedRandomProjectionLSH path as the approximate 100 TB route. Vectors in
the fixture corpus are unit-normalized (FIXTURES.md), so dot product ==
cosine similarity; `dot()` below is the general inner product either way.

Everything in the exact path is JVM higher-order functions (ZIP_WITH /
AGGREGATE) — no Python UDFs; the LSH path uses Spark MLlib (JVM) via
`array_to_vector`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Sequential left-fold dot product in DOUBLE — deterministic evaluation
#: order, identical expression shape on the oracle side.
DOT_SQL = (
    "AGGREGATE(ZIP_WITH({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
    " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)


def cosine_topk(
    emb: DataFrame,
    k: int = 3,
    block_col: str = "label",
    probe_pred: str | None = "vec_id % 100 = 0",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Exact blocked top-k cosine neighbors per probe vector.

    - ``probe_pred`` restricts the probe side (all-pairs is O(n²); a probe
      subset is the honest exact-baseline shape).
    - Blocking on ``block_col`` bounds candidates per probe; at 100 TB the
      block key shuffles both sides co-located, and the per-probe top-k is a
      rank-filter (no global sort).
    - Similarity is rounded before ranking, with the candidate id as a
      total-order tiebreak, so ranking is reproducible across engines.
    """
    probes = emb
    if probe_pred:
        # Filter BEFORE renaming: rewriting the predicate by substring
        # replacement would corrupt identifiers containing id_col.
        probes = probes.where(F.expr(probe_pred))
    probes = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(block_col).alias("blk"),
        F.col(vec_col).alias("vec_p"),
    )
    cands = emb.select(
        F.col(id_col).alias("cand_id"),
        F.col(block_col).alias("blk"),
        F.col(vec_col).alias("vec_c"),
    )
    dot = F.expr(DOT_SQL.format(a="vec_p", b="vec_c"))
    pairs = (
        probes.join(cands, "blk")
        .where(F.col("probe_id") != F.col("cand_id"))
        .withColumn("sim", F.round(dot, round_digits))
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("sim").desc(), F.col("cand_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .where(F.col("rn") <= k)
        .select("probe_id", "cand_id", "sim", "rn")
    )


def cosine_near_pairs(
    emb: DataFrame,
    threshold: float = 0.8,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (sim >= threshold) within blocks."""
    a = emb.select(
        F.col(id_col).alias("id_a"), F.col(block_col).alias("blk"), F.col(vec_col).alias("vec_a")
    )
    b = emb.select(
        F.col(id_col).alias("id_b"), F.col(block_col).alias("blk"), F.col(vec_col).alias("vec_b")
    )
    dot = F.expr(DOT_SQL.format(a="vec_a", b="vec_b"))
    return (
        a.join(b, "blk")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", F.round(dot, round_digits))
        .where(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


def ivf_cells(
    emb: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
    nprobe: int = 1,
) -> DataFrame:
    """Deterministic IVF coarse quantization: ``(id, vec, cell)``.

    The ``n_centroids`` lowest-id vectors serve as centroids (no k-means
    randomness); assignment is argmax rounded-dot with centroid-id
    tiebreak. With ``nprobe > 1`` every vector is multi-assigned to its
    top-``nprobe`` cells (rows multiply accordingly) — the multi-probe /
    multi-assignment generalization; consumers joining two multi-assigned
    sides must de-duplicate pairs. At 100 TB: centroids broadcast,
    assignment is map-side — the shared front half of every IVF-bucketed
    operator (top-k search, cell-local dedup candidate generation).
    """
    cents = (
        emb.orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cvec"))
    )
    cdot = F.expr(DOT_SQL.format(a=vec_col, b="cvec"))
    w_assign = Window.partitionBy(id_col).orderBy(F.col("csim").desc(), F.col("cent_id"))
    return (
        emb.crossJoin(F.broadcast(cents))
        .withColumn("csim", F.round(cdot, round_digits))
        .withColumn("arn", F.row_number().over(w_assign))
        .where(F.col("arn") <= nprobe)
        .select(F.col(id_col), F.col(vec_col), F.col("cent_id").alias("cell"))
    )


def ivf_candidate_pairs(
    emb: DataFrame,
    n_centroids: int,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Multi-probe IVF candidate pairs: ``(id_a, id_b, vec_a, vec_b)`` for
    every a < b sharing at least one of their top-``nprobe`` cells.

    The sub-quadratic candidate generator for similarity/dedup: expected
    pair work is ~n²·p²/(2C) — with C = ceil(sqrt(n)) centroids that is
    n^1.5·p², versus n² for any fixed blocking. ``nprobe`` is the
    recall-vs-cost dial (measured curve in SCALE.md §3.3); pairs are
    de-duplicated because both sides are multi-assigned.
    """
    cells = ivf_cells(emb, n_centroids, id_col, vec_col, round_digits, nprobe=nprobe)
    a = cells.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"), "cell"
    )
    b = cells.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"), "cell"
    )
    pairs = a.join(b, "cell").where(F.col("id_a") < F.col("id_b"))
    if nprobe > 1:
        # A pair can meet in up to nprobe shared cells — set semantics.
        pairs = pairs.dropDuplicates(["id_a", "id_b"])
    return pairs.select("id_a", "id_b", "vec_a", "vec_b")


def ivf_topk(
    emb: DataFrame,
    n_centroids: int = 16,
    k: int = 3,
    probe_pred: str = "vec_id % 100 = 0",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
    nprobe: int = 1,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: coarse-quantize every vector to
    its nearest centroid cell, then search the probe's top-``nprobe`` cells
    (candidates always live in their single home cell, so each
    (probe, candidate) pair is generated at most once — no dedup needed).

    The coarse quantizer is deterministic — the ``n_centroids`` lowest-id
    vectors serve as centroids (no k-means randomness), assignment ties break
    by centroid id; probe cells are ranked the same way. At 100 TB: centroids
    broadcast (tiny), assignment is a map-side broadcast join + per-vector
    argmax, and the search join shuffles both sides once on the cell key —
    the classic IVF cost shape (n·C map work + nprobe/C of the candidate
    scan, never all-pairs). ``nprobe`` is the recall dial measured by
    ``q_llm_ann_recall`` / ``q_llm_ann_recall_nprobe``.
    """
    cands = ivf_cells(emb, n_centroids, id_col, vec_col, round_digits).select(
        F.col(id_col).alias("cand_id"), F.col("cell"), F.col(vec_col).alias("vec_c")
    )
    probes = (
        ivf_cells(emb, n_centroids, id_col, vec_col, round_digits, nprobe=nprobe)
        .where(F.expr(probe_pred))
        .select(F.col(id_col).alias("probe_id"), F.col("cell"), F.col(vec_col).alias("vec_p"))
    )
    dot = F.expr(DOT_SQL.format(a="vec_p", b="vec_c"))
    pairs = (
        probes.join(cands, "cell")
        .where(F.col("probe_id") != F.col("cand_id"))
        .withColumn("sim", F.round(dot, round_digits))
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("sim").desc(), F.col("cand_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .where(F.col("rn") <= k)
        .select("probe_id", F.col("cell").cast("bigint").alias("cell"), "cand_id", "sim", "rn")
    )


def lsh_ann_pairs(
    emb: DataFrame,
    threshold_distance: float = 0.6,
    bucket_length: float = 0.5,
    num_hash_tables: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate near-neighbor pairs via BucketedRandomProjectionLSH.

    The 100 TB scale path: random-projection bucketing turns the O(n²)
    self-join into bucket-local joins. Euclidean distance on unit vectors
    maps monotonically to cosine (d² = 2 - 2·cos).
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    vecs = emb.select(
        F.col(id_col).alias("vid"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(vecs)
    joined = model.approxSimilarityJoin(vecs, vecs, threshold_distance, distCol="dist")
    return (
        joined.where(F.col("datasetA.vid") < F.col("datasetB.vid"))
        .select(
            F.col("datasetA.vid").alias("id_a"),
            F.col("datasetB.vid").alias("id_b"),
            F.round("dist", 4).alias("euclidean_dist"),
        )
    )


def kmeans_lloyd_stats(
    emb: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """One deterministic Lloyd (k-means) iteration: assign → update → audit.

    Seeds are the ``n_centroids`` lowest-id vectors (no RNG); assignment is
    argmax cosine with centroid-id tiebreak (same quantizer as
    :func:`ivf_topk`). The centroid update is made order-independent by the
    decimal-sum bridge: components are ROUNDed, accumulated as
    DECIMAL(25,6), and divided by the member count — bit-identical under
    any partition order, so a SQL oracle can replay it exactly. Returns one
    audit row per cell: member count, mean member-to-centroid similarity,
    and the centroid shift |new - old| (the Lloyd convergence signal).

    At 100 TB: centroids broadcast; assignment is map-side; the component
    explode shuffles only after map-side partial aggregation, i.e. what
    moves is O(cells × dims) partial sums, not member vectors.
    """
    cents = (
        emb.orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cvec"))
    )
    cdot = F.expr(DOT_SQL.format(a=vec_col, b="cvec"))
    w_assign = Window.partitionBy(id_col).orderBy(F.col("csim").desc(), F.col("cent_id"))
    cells = (
        emb.crossJoin(F.broadcast(cents))
        .withColumn("csim", F.round(cdot, round_digits))
        .withColumn("arn", F.row_number().over(w_assign))
        .where(F.col("arn") == 1)
        .select(F.col(id_col), F.col(vec_col), F.col("cent_id").alias("cell"), "csim")
    )
    comp = cells.select("cell", F.posexplode(vec_col).alias("pos", "val"))
    newc = comp.groupBy("cell", "pos").agg(
        F.expr(
            "CAST(SUM(CAST(ROUND(CAST(val AS DOUBLE), 4) AS DECIMAL(25,6))) AS DOUBLE)"
            " / COUNT(*)"
        ).alias("nc")
    )
    oldc = cents.select(
        F.col("cent_id").alias("cell"), F.posexplode("cvec").alias("pos", "oval")
    ).select("cell", "pos", F.round(F.col("oval").cast("double"), 4).alias("oc"))
    shift = (
        newc.join(F.broadcast(oldc), ["cell", "pos"])
        .withColumn("d2", (F.col("nc") - F.col("oc")) * (F.col("nc") - F.col("oc")))
        .groupBy("cell")
        .agg(
            F.expr(
                "ROUND(SQRT(CAST(SUM(CAST(d2 AS DECIMAL(38,20))) AS DOUBLE)), 4)"
            ).alias("centroid_shift")
        )
    )
    stats = cells.groupBy("cell").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.expr("CAST(SUM(CAST(csim AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*)").alias("avg_sim"),
    )
    return stats.join(shift, "cell").select(
        F.col("cell").cast("bigint").alias("cell"),
        "n_members",
        "avg_sim",
        "centroid_shift",
    )
