"""Round-6 operator tests: the lossless metric-pruned cosine all-pairs
join (operators/cosine_pairs.py).

The oracle mirror already proves losslessness per row on the fixture
corpus (q_llm_dedup_cosine_lossless vs the naive quadratic DuckDB join,
plus every rerouted cosine_near_pairs consumer). These tests cover what
the fixture cannot: clustered geometry where the triangle-inequality
pruning actually bites, duplicate saturation exercising the identity
contraction + expansion + self-sim paths, and degenerate shapes.
"""

from __future__ import annotations

import math

import numpy as np
import pyspark.sql.functions as F
import pytest

from join_example_spark.operators.cosine_pairs import (
    _cells_and_admissible,
    cosine_lossless_pairs,
)
from join_example_spark.operators.similarity import cosine_near_pairs_naive


def _mk_emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def _clustered_rows(seed=7, K=8, n=200, d=32, noise=0.03):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(K, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(n):
        v = centers[i % K] + noise * rng.normal(size=d)
        v /= np.linalg.norm(v)
        rows.append((i, [float(x) for x in v.astype(np.float32)], i % 3))
    return rows


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_cosine_lossless_clustered_exact_and_pruning(spark):
    """On clustered geometry the output equals the naive quadratic join
    AND the triangle bound prunes most cell pairs — the property that
    makes the operator sub-quadratic on real (clustered) embedding
    spaces. Measured at this geometry: admissible fraction 0.129."""
    emb = _mk_emb(spark, _clustered_rows())
    tau = 0.9
    got = _canon(cosine_lossless_pairs(emb, threshold=tau, block_col=None))
    # the naive reference has no block_col=None form — neutralize blocking
    # with a constant label.
    want = _canon(
        cosine_near_pairs_naive(
            emb.withColumn("label", F.lit(0)), threshold=tau, block_col="label"
        )
    )
    assert got == want
    assert len(got) > 1000  # non-trivial answer

    reps = emb.select(
        F.lit(0).alias("_blk"),
        F.col("vec_id").alias("_id"),
        F.col("embedding").alias("_vec"),
    )
    thr_d = math.sqrt(max(0.0, 2.0 - 2.0 * (tau - 1e-4))) + 1e-6
    _asg, adm = _cells_and_admissible(reps, thr_d)
    C = math.ceil(math.sqrt(emb.count()))
    frac = adm.count() / (C * C)
    assert frac < 0.3, f"pruning should drop >70% of cell pairs, admitted {frac:.3f}"


def test_cosine_lossless_blocked_matches_naive(spark):
    """Blocked (label) semantics match the naive join on clustered data."""
    emb = _mk_emb(spark, _clustered_rows(seed=11))
    for tau in (0.85, 0.95):
        got = _canon(cosine_lossless_pairs(emb, threshold=tau, block_col="label"))
        want = _canon(cosine_near_pairs_naive(emb, threshold=tau, block_col="label"))
        assert got == want


def test_cosine_lossless_duplicate_saturation(spark):
    """4x duplicate saturation: identical arrays under distinct ids must
    reproduce the naive join exactly — exercises identity contraction,
    cross-group expansion (inherited rep sim) and intra-group self-sim."""
    base = _clustered_rows(seed=3, K=4, n=30, d=16, noise=0.05)
    rows = []
    for copy in range(4):
        for (i, v, lab) in base:
            rows.append((i + 1000 * copy, v, lab))
    emb = _mk_emb(spark, rows)
    got = _canon(cosine_lossless_pairs(emb, threshold=0.8, block_col="label"))
    want = _canon(cosine_near_pairs_naive(emb, threshold=0.8, block_col="label"))
    assert got == want
    # duplicates of the same base vector share a label => every duplicate
    # pair must surface with its self-sim (round(dot(v,v),4) ~ 1.0).
    sims = {(a, b): s for a, b, s in got}
    assert sims[(0, 1000)] >= 0.999


def test_cosine_lossless_isotropic_fuzz(spark):
    """Randomized soundness sweep on isotropic data (the hard regime:
    pruning admits ~everything; output must STILL match naive exactly)."""
    for seed, tau in ((1, 0.3), (2, 0.5), (3, 0.15)):
        rng = np.random.default_rng(seed)
        rows = []
        for i in range(60):
            v = rng.normal(size=8)
            v /= np.linalg.norm(v)
            rows.append((i, [float(x) for x in v.astype(np.float32)], i % 2))
        emb = _mk_emb(spark, rows)
        got = _canon(cosine_lossless_pairs(emb, threshold=tau, block_col="label"))
        want = _canon(cosine_near_pairs_naive(emb, threshold=tau, block_col="label"))
        assert got == want, f"seed={seed} tau={tau}"


def test_cosine_lossless_degenerate_shapes(spark):
    """Single-member blocks, n=1, and an unsatisfiable threshold."""
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.0, 1.0], 1),  # alone in its block
        (3, [1.0, 0.0], 0),  # exact duplicate of 1
    ]
    emb = _mk_emb(spark, rows)
    got = _canon(cosine_lossless_pairs(emb, threshold=0.5, block_col="label"))
    assert got == [(1, 3, 1.0)]
    # n=1 input
    one = _mk_emb(spark, rows[:1])
    assert cosine_lossless_pairs(one, threshold=0.5, block_col="label").count() == 0
    # threshold above any achievable sim
    assert cosine_lossless_pairs(emb, threshold=1.5, block_col="label").count() == 0


def test_lsh_knn_scale_surfaces_planted_neighbors(spark):
    """Semantic quality assertion for the rows-only LSH path
    (q_llm_sim_knn_scale / lsh_ann_pairs): at the shipped dials
    (bucketLength=0.5, numHashTables=3, seed=42, threshold 1.2) every
    planted near-neighbor pair MUST surface, and recall over all true
    pairs stays above a measured floor (0.925 at this geometry/seed;
    asserted >= 0.85 for headroom). Completes the quality coverage the
    MinHash/SimHash operators already have via brute-force-complete
    tests."""
    from join_example_spark.operators.similarity import lsh_ann_pairs

    rng = np.random.default_rng(5)
    n, d = 150, 64
    rows, vecs = [], []
    for i in range(n):
        v = rng.normal(size=d)
        v /= np.linalg.norm(v)
        vecs.append(v)
        rows.append((i, [float(x) for x in v.astype(np.float32)], 0))
    planted = []
    for i in range(25):
        t = vecs[i] + 0.1 * rng.normal(size=d)
        t /= np.linalg.norm(t)
        planted.append((i, 1000 + i))
        rows.append((1000 + i, [float(x) for x in t.astype(np.float32)], 0))
    emb = _mk_emb(spark, rows)
    got = {
        (r.id_a, r.id_b)
        for r in lsh_ann_pairs(emb, threshold_distance=1.2).collect()
    }
    missed = [p for p in planted if p not in got]
    assert not missed, f"LSH missed planted neighbors: {missed}"

    arr = np.array([r[1] for r in rows], dtype=np.float64)
    ids = [r[0] for r in rows]
    true = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if np.linalg.norm(arr[i] - arr[j]) <= 1.2:
                true.add(tuple(sorted((ids[i], ids[j]))))
    recall = len(got & true) / len(true)
    assert recall >= 0.85, f"recall {recall:.3f} below documented floor"
