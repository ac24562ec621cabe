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
    got = _canon(cosine_lossless_pairs(emb, threshold=tau, block_col=None, index_min_reps=0))
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
        got = _canon(cosine_lossless_pairs(emb, threshold=tau, block_col="label", index_min_reps=0))
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
    got = _canon(cosine_lossless_pairs(emb, threshold=0.8, block_col="label", index_min_reps=0))
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
        got = _canon(cosine_lossless_pairs(emb, threshold=tau, block_col="label", index_min_reps=0))
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
    got = _canon(cosine_lossless_pairs(emb, threshold=0.5, block_col="label", index_min_reps=0))
    assert got == [(1, 3, 1.0)]
    # n=1 input
    one = _mk_emb(spark, rows[:1])
    assert cosine_lossless_pairs(one, threshold=0.5, block_col="label", index_min_reps=0).count() == 0
    # threshold above any achievable sim
    assert cosine_lossless_pairs(emb, threshold=1.5, block_col="label", index_min_reps=0).count() == 0


def test_lsh_knn_scale_surfaces_planted_neighbors(spark):
    """Semantic quality assertion for the LSH library path (lsh_ann_pairs,
    certified in aggregate by q_llm_sim_knn_scale's oracle-asserted recall
    audit since round 8): at the shipped dials
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


# ---------------------------------------------------------------------------
# Round-6 wave 2: edit-distance banding, exact AUC, bloom semi-join, seasonal
# ---------------------------------------------------------------------------


def _py_levenshtein(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_editdist_band_pairs_vs_bruteforce(spark):
    """Band blocking + thresholded levenshtein == naive quadratic DP,
    including pairs whose lengths straddle a band boundary (the case a
    buggy non-exploded blocking silently drops)."""
    from join_example_spark.operators.dedup import editdist_band_pairs

    rng = np.random.default_rng(11)
    alpha = "abcdef"
    docs = []
    base_strings = []
    for i in range(40):
        s = "".join(rng.choice(list(alpha), size=int(rng.integers(30, 120))))
        base_strings.append(s)
        docs.append((i, s, "en" if i % 2 == 0 else "de"))
    # mutated near-dups, some with length changes crossing band boundaries
    for k in range(12):
        src = base_strings[k]
        ins = "".join(rng.choice(list(alpha), size=int(rng.integers(0, 8))))
        mut = src[: len(src) // 2] + ins + src[len(src) // 2 :]
        docs.append((100 + k, mut, "en" if k % 2 == 0 else "de"))
    # a pair exactly at the boundary: lengths 19 and 21 (bands 0 and 1)
    docs.append((200, "x" * 19, "en"))
    docs.append((201, "x" * 21, "en"))
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    D = 20
    got = sorted(
        (r.id_a, r.id_b, r.dist)
        for r in editdist_band_pairs(df, threshold=D).collect()
    )
    by_id = {i: (s.lower().strip(), lg) for i, s, lg in docs}
    want = []
    ids = sorted(by_id)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            ia, ib = ids[x], ids[y]
            (sa, la), (sb, lb) = by_id[ia], by_id[ib]
            if la != lb:
                continue
            d = _py_levenshtein(sa, sb)
            if d <= D:
                want.append((ia, ib, d))
    assert got == sorted(want)
    assert any(p[:2] == (200, 201) for p in got), "boundary pair missing"


def test_quality_auc_matches_quadratic_definition(spark):
    """q_llm_quality_auc's rank-sum AUC == the quadratic definition
    (#[s_pos > s_neg] + 0.5 #ties) / (n1 n0), exactly, on data with
    heavy score ties."""
    from pyspark.sql import Window

    rng = np.random.default_rng(3)
    scores = rng.integers(0, 15, size=300)
    labels = rng.integers(0, 2, size=300)
    if labels.sum() in (0, 300):
        labels[0] = 1 - labels[0]
    sc = spark.createDataFrame(
        [(int(s), int(p)) for s, p in zip(scores, labels)], "score long, pos int"
    )
    per = sc.groupBy("score").agg(
        F.sum("pos").cast("bigint").alias("np"),
        F.sum(F.lit(1) - F.col("pos")).cast("bigint").alias("nn"),
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    cum = per.select(
        "np", "nn",
        F.coalesce(F.sum("nn").over(w), F.lit(0)).cast("bigint").alias("cneg"),
    )
    row = cum.agg(
        F.sum("np").cast("bigint").alias("n_pos"),
        F.sum("nn").cast("bigint").alias("n_neg"),
        F.sum(F.col("np") * (F.lit(2) * F.col("cneg") + F.col("nn")))
        .cast("bigint")
        .alias("u2"),
    ).collect()[0]
    wins = ties = 0
    for sp, lp in zip(scores, labels):
        if lp != 1:
            continue
        for sn, ln in zip(scores, labels):
            if ln != 0:
                continue
            if sp > sn:
                wins += 1
            elif sp == sn:
                ties += 1
    assert row.n_pos == int(labels.sum())
    assert row.n_neg == int((1 - labels).sum())
    assert row.u2 == 2 * wins + ties


def test_bloom_semi_join_equals_plain_semi(spark):
    """bloom pre-filter + exact verify == plain left_semi, including
    negative keys (double-mod path) and an empty build side; false
    positives exist at this tiny geometry and are provably removed."""
    from join_example_spark.operators.bloom import (
        bloom_bits,
        bloom_prefilter,
        bloom_semi_join,
    )

    rng = np.random.default_rng(9)
    probe_keys = [int(k) for k in rng.integers(-500, 500, size=400)]
    build_keys = sorted({int(k) for k in rng.choice(probe_keys, size=25)} | {-444})
    probe = spark.createDataFrame([(k, k * 2) for k in probe_keys], "k long, v long")
    build = spark.createDataFrame([(k,) for k in build_keys], "bk long")
    got = sorted(
        (r.k, r.v)
        for r in bloom_semi_join(probe, build, "k", "bk", n_buckets=4).collect()
    )
    want = sorted((k, k * 2) for k in probe_keys if k in set(build_keys))
    assert got == want
    # the pre-filter alone passes a superset (false positives possible,
    # false negatives impossible)
    bits = bloom_bits(build, "bk", n_buckets=4)
    passed = {r.k for r in bloom_prefilter(probe, bits, "k", n_buckets=4).collect()}
    assert set(k for k, _ in want) <= passed
    # empty build side -> empty result
    empty = build.where(F.lit(False))
    assert bloom_semi_join(probe, empty, "k", "bk", n_buckets=4).count() == 0


def test_ts_seasonal_internal_consistency(spark):
    """Per-type invariants of q_ts_seasonal on the fixture: hours cover
    the full day, counts roll up to the type totals, load_share averages
    to exactly 1 (x24 normalization), and the count-weighted seasonal
    deviation is ~0 (the defining property of a seasonal component)."""
    from join_example_spark.registry import load_all

    df = load_all()["q_ts_seasonal"].fn(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    assert by_type
    for t, rs in by_type.items():
        assert sorted(r.hour for r in rs) == list(range(24)), t
        tot = sum(r.n_events for r in rs)
        assert math.isclose(
            sum(r.load_share * tot / 24.0 for r in rs), tot, rel_tol=1e-9
        )
        wdev = sum(r.seasonal_dev * r.n_events for r in rs)
        wavg = sum(r.hour_avg * r.n_events for r in rs) / tot
        assert abs(wdev) / max(abs(wavg) * tot, 1.0) < 1e-9, t


def test_cosine_lossless_gate_default_path_matches_index_path(spark):
    """The adaptive small-corpus gate (index_min_reps default) routes tiny
    inputs through the broadcast quadratic verify; its output must equal
    both the forced-index path and the naive reference."""
    emb = _mk_emb(spark, _clustered_rows(seed=21, K=4, n=120, d=16))
    tau = 0.6
    via_gate = _canon(cosine_lossless_pairs(emb, threshold=tau, block_col="label"))
    via_index = _canon(
        cosine_lossless_pairs(
            emb, threshold=tau, block_col="label", index_min_reps=0
        )
    )
    want = _canon(cosine_near_pairs_naive(emb, threshold=tau, block_col="label"))
    assert via_gate == want
    assert via_index == want


def test_containment_prefix_pairs_vs_bruteforce(spark):
    """Per-row losslessness of the one-sided prefix filter on a corpus
    with planted subset/quote structure (the case symmetric Jaccard
    misses), exact duplicates (contraction + intra expansion, both
    directions), and unrelated noise docs. Brute force is the Python
    quadratic over ordered pairs."""
    from join_example_spark.operators.dedup_prefix import (
        containment_prefix_pairs,
    )

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(120)]
    docs = []
    # 6 big "pages" of 40 tokens
    pages = []
    for i in range(6):
        toks = list(rng.choice(vocab, size=40, replace=False))
        pages.append(toks)
        docs.append((i, toks))
    # quotes: strict subsets of pages (containment 1.0 one way)
    for j in range(6):
        src = pages[j % 6]
        docs.append((100 + j, list(src[: 8 + j])))
    # near-quotes: 10 tokens, 8 from a page (containment 0.8 exactly)
    for j in range(4):
        src = pages[j]
        toks = list(src[:8]) + [f"x{j}a", f"x{j}b"]
        docs.append((200 + j, toks))
    # exact duplicates of one quote (identity contraction path)
    docs.append((300, list(pages[0][:8])))
    docs.append((301, list(pages[0][:8])))
    # unrelated noise
    for j in range(8):
        docs.append((400 + j, [f"n{j}_{k}" for k in range(12)]))

    sets = {i: set(t) for i, t in docs}
    want = sorted(
        (a, b, len(sets[a] & sets[b]) / len(sets[a]))
        for a in sets
        for b in sets
        if a != b and 5 * len(sets[a] & sets[b]) >= 4 * len(sets[a])
    )
    df = spark.createDataFrame(
        [(i, sorted(set(t))) for i, t in docs], "doc_id long, toks array<string>"
    )
    got = sorted(
        tuple(r)
        for r in containment_prefix_pairs(df, id_col="doc_id", toks_col="toks")
        .collect()
    )
    assert got == want
    # sanity on the planted structure: every quote is contained in its page
    got_pairs = {(a, b) for a, b, _ in got}
    for j in range(6):
        assert (100 + j, j % 6) in got_pairs
    # exact-duplicate quotes: both directions, containment 1.0
    assert (300, 301) in got_pairs and (301, 300) in got_pairs


# ---- wave 3: DSIR selection, shard plan, BPE pair counting ----------------
#
# Each has a DuckDB oracle (mirror-certified); these are INDEPENDENT
# pure-Python witnesses over the sf0.001 fixture, so a bug shared by both
# SQL engines' plans (or by the shared SQL text) cannot hide.

_SF_SMOKE = "/root/testdata/sf0.001"
_HASH_P = 1_000_003


def _py_str_hash(s: str, p: int = _HASH_P) -> int:
    acc = 0
    for c in s:
        acc = (acc * 31 + ord(c)) % p
    return ((acc * acc) % p * 31 + acc) % p


def _py_id_hash(x: int, p: int = _HASH_P) -> int:
    a_mod = 2_654_435_761 % p
    return (((x % p) + p) % p * a_mod + 17) % p


def _smoke_docs():
    import duckdb

    return duckdb.sql(
        f"SELECT doc_id, lang, n_chars, text"
        f" FROM read_parquet('{_SF_SMOKE}/documents.parquet')"
    ).fetchall()


def test_select_dsir_matches_python_witness(spark):
    from join_example_spark.queries.llm_training import q_llm_select_dsir

    rows = _smoke_docs()
    ct: dict[int, int] = {}
    cr: dict[int, int] = {}
    doc_feats = {}
    for doc_id, lang, _nc, text in rows:
        fs = [_py_str_hash(t) % 8192 for t in text.strip().lower().split(" ")]
        doc_feats[doc_id] = fs
        for f in fs:
            cr[f] = cr.get(f, 0) + 1
            if lang == "en":
                ct[f] = ct.get(f, 0) + 1
    nt = sum(ct.get(f, 0) + 1 for f in cr)
    nr = sum(c + 1 for c in cr.values())
    want = []
    for doc_id, fs in doc_feats.items():
        st = sum(ct.get(f, 0) + 1 for f in fs)
        sr = sum(cr[f] + 1 for f in fs)
        want.append((doc_id, len(fs), st, sr, (st * nr) / (sr * nt)))
    want.sort(key=lambda r: (-r[4], r[0]))
    want = want[:100]
    got = [tuple(r) for r in q_llm_select_dsir(spark, _SF_SMOKE).collect()]
    assert got == want


def test_shard_plan_matches_python_witness(spark):
    from join_example_spark.queries.llm_training import q_llm_shard_plan

    rows = _smoke_docs()
    shards: dict[int, list] = {}
    for doc_id, _lang, n_chars, text in rows:
        s = _py_id_hash(doc_id) % 16
        shards.setdefault(s, []).append(
            (doc_id, len(text.strip().lower().split(" ")), n_chars)
        )
    total = len(rows)
    want = []
    for s in sorted(shards):
        g = shards[s]
        want.append(
            (
                s,
                len(g),
                sum(t for _, t, _ in g),
                sum(c for _, _, c in g),
                min(d for d, _, _ in g),
                max(d for d, _, _ in g),
                (len(g) * 16) / total,
            )
        )
    got = [tuple(r) for r in q_llm_shard_plan(spark, _SF_SMOKE).collect()]
    assert got == want
    # every shard must be populated at 500 docs (hash-uniformity smoke)
    assert len(got) == 16


def test_bpe_pairs_matches_python_witness(spark):
    from collections import Counter

    from join_example_spark.queries.llm_text import q_llm_bpe_pairs

    rows = _smoke_docs()
    cnt: Counter = Counter()
    for _doc_id, _lang, _nc, text in rows:
        for w in text.strip().lower().split(" "):
            for i in range(len(w) - 1):
                cnt[w[i : i + 2]] += 1
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [tuple(r) for r in q_llm_bpe_pairs(spark, _SF_SMOKE).collect()]
    assert got == want


def test_events_attribution_matches_python_witness(spark):
    """Independent witness: replay last-touch attribution with a plain
    per-user sorted scan over the sf0.001 events fixture (read via the
    same normalized reader the query uses, so the witness tests the
    attribution logic, not the ts-encoding recipe)."""
    import datetime

    from join_example_spark.queries.analytics_ext import q_events_attribution
    from join_example_spark.sources.readers import read_table

    ev = read_table(spark, "/root/testdata/sf0.001", "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    rows = [(r.user_id, r.ts, r.event_id, r.event_type) for r in ev.collect()]
    by_user: dict[int, list] = {}
    for u, ts, eid, et in rows:
        by_user.setdefault(u, []).append((ts, eid, et))
    counts: dict[str, int] = {}
    lookback = datetime.timedelta(minutes=30)
    for u, evs in by_user.items():
        evs.sort(key=lambda x: (x[0], x[1]))
        last_touch = None  # (ts, type)
        for ts, _eid, et in evs:
            if et == "purchase":
                if last_touch is not None and last_touch[0] >= ts - lookback:
                    k = last_touch[1]
                else:
                    k = "(none)"
                counts[k] = counts.get(k, 0) + 1
            if et in ("click", "view"):
                last_touch = (ts, et)
    total = sum(counts.values())
    want = sorted((k, n, n / total) for k, n in counts.items())
    got = sorted(tuple(r) for r in q_events_attribution(spark, "/root/testdata/sf0.001").collect())
    assert got == want


def test_ts_changepoint_matches_python_witness(spark):
    """Witness: per-type daily counts via the normalized reader, then the
    integer CUSUM argmax replayed in plain Python."""
    from join_example_spark.queries.analytics_ext import q_ts_changepoint
    from join_example_spark.sources.readers import read_events

    ev = read_events(spark, "/root/testdata/sf0.001").select("event_type", "ts")
    rows = [(r.event_type, r.ts.date()) for r in ev.collect()]
    daily: dict[tuple, int] = {}
    for et, d in rows:
        daily[(et, d)] = daily.get((et, d), 0) + 1
    by_type: dict[str, list] = {}
    for (et, d), c in daily.items():
        by_type.setdefault(et, []).append((d, c))
    want = []
    for et, series in by_type.items():
        series.sort()
        m = len(series)
        total = sum(c for _, c in series)
        cum = 0
        best = None  # (s_abs, day) with max s_abs, min day
        for i, (d, c) in enumerate(series, start=1):
            cum += c
            s_abs = abs(m * cum - i * total)
            if best is None or s_abs > best[0] or (s_abs == best[0] and d < best[1]):
                best = (s_abs, d)
        want.append((et, best[1], m, total, best[0], best[0] / (m * total)))
    want.sort()
    got = sorted(
        tuple(r) for r in q_ts_changepoint(spark, "/root/testdata/sf0.001").collect()
    )
    assert got == want


def test_orders_rfm_matches_python_witness(spark):
    """Witness: replay recency/frequency/monetary and the three quintile
    cuts (NTILE semantics: first n % 5 tiles get the extra row) in plain
    Python over the sf0.001 orders fixture."""
    import duckdb

    from join_example_spark.queries.analytics_ext import q_orders_rfm

    rows = duckdb.sql(
        "SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,"
        " CAST(CAST(o_totalprice AS DECIMAL(25,6)) * 1000000 AS BIGINT) AS mi"
        " FROM read_parquet('/root/testdata/sf0.001/orders.parquet')"
    ).fetchall()
    per: dict[int, list] = {}
    for ck, d, mi in rows:
        per.setdefault(ck, []).append((d, mi))
    gmax = max(d for _, d, _ in rows)
    profile = {
        ck: (
            (gmax - max(d for d, _ in v)).days,
            len(v),
            sum(mi for _, mi in v),
        )
        for ck, v in per.items()
    }

    def ntile5(keys):  # keys pre-sorted; NTILE(5) bucket per position
        n = len(keys)
        base, extra = divmod(n, 5)
        out, pos = {}, 0
        for tile in range(1, 6):
            size = base + (1 if tile <= extra else 0)
            for k in keys[pos : pos + size]:
                out[k] = tile
            pos += size
        return out

    custs = list(profile)
    r = ntile5(sorted(custs, key=lambda c: (profile[c][0], c)))
    f = ntile5(sorted(custs, key=lambda c: (-profile[c][1], c)))
    m = ntile5(sorted(custs, key=lambda c: (-profile[c][2], c)))
    seg: dict[tuple, list] = {}
    for c in custs:
        seg.setdefault((r[c], f[c], m[c]), []).append(profile[c][2])
    want = sorted(
        (rs, fs, ms, len(v), sum(v) / (1_000_000 * len(v)))
        for (rs, fs, ms), v in seg.items()
    )
    got = sorted(
        tuple(x) for x in q_orders_rfm(spark, "/root/testdata/sf0.001").collect()
    )
    assert got == want


def test_mix_epochs_matches_python_witness(spark):
    """Witness: integer water-filling under the 4-epoch cap replayed in
    plain Python; also asserts the allocation exhausts the budget exactly
    and never exceeds any source's cap."""
    from join_example_spark.queries.llm_training import q_llm_mix_epochs

    rows = _smoke_docs()
    avail: dict[str, int] = {}
    import duckdb

    for src, n in duckdb.sql(
        f"SELECT source, SUM(len(str_split(LOWER(TRIM(text)), ' ')))"
        f" FROM read_parquet('{_SF_SMOKE}/documents.parquet') GROUP BY source"
    ).fetchall():
        avail[src] = int(n)
    budget = 2 * sum(avail.values())
    order = sorted(avail, key=lambda s: (4 * avail[s], s))
    n = len(order)
    alloc, p = {}, 0
    k = 0
    for i, s in enumerate(order, start=1):
        cap = 4 * avail[s]
        if cap * (n - i + 1) <= budget - p:
            alloc[s] = cap
            p += cap
            k = i
        else:
            break
    leftover, n_free = budget - p, n - k
    base, rem = divmod(leftover, n_free)
    for j, s in enumerate(order[k:], start=1):
        alloc[s] = base + (1 if j <= rem else 0)
    assert sum(alloc.values()) == budget
    assert all(alloc[s] <= 4 * avail[s] for s in avail)
    want = sorted(
        (
            s,
            avail[s],
            4 * avail[s],
            1 if alloc[s] == 4 * avail[s] and s in dict.fromkeys(order[:k]) else 0,
            alloc[s],
            alloc[s] / avail[s],
        )
        for s in avail
    )
    got = sorted(tuple(r) for r in q_llm_mix_epochs(spark, _SF_SMOKE).collect())
    assert got == want


def test_supplier_pareto_matches_python_witness(spark):
    """Witness: replay the micro-unit revenue ranking and the integer
    cross-multiplied ABC class boundaries in plain Python."""
    import duckdb

    from join_example_spark.queries.analytics_ext import q_supplier_pareto

    rows = duckdb.sql(
        "SELECT l_suppkey,"
        " CAST(CAST(l_extendedprice AS DECIMAL(25,6)) * 1000000 AS BIGINT)"
        " FROM read_parquet('/root/testdata/sf0.001/lineitem.parquet')"
    ).fetchall()
    rev: dict[int, int] = {}
    for sk, mi in rows:
        rev[sk] = rev.get(sk, 0) + mi
    order = sorted(rev, key=lambda s: (-rev[s], s))
    total = sum(rev.values())
    cum = 0
    classes: dict[str, list] = {}
    for rnk, s in enumerate(order, start=1):
        before = cum
        cum += rev[s]
        if 5 * before < 4 * total:
            c = "A"
        elif 20 * before < 19 * total:
            c = "B"
        else:
            c = "C"
        classes.setdefault(c, []).append((rnk, rev[s]))
    want = sorted(
        (
            c,
            len(v),
            min(r for r, _ in v),
            max(r for r, _ in v),
            sum(m for _, m in v),
            sum(m for _, m in v) / total,
        )
        for c, v in classes.items()
    )
    got = sorted(
        tuple(r) for r in q_supplier_pareto(spark, "/root/testdata/sf0.001").collect()
    )
    assert got == want


def test_orders_basket_matches_python_witness(spark):
    """Witness: brute-force brand co-occurrence counts and lift over the
    sf0.001 fixture, including the (support, brand_a, brand_b) top-20
    tiebreak."""
    import itertools

    import duckdb

    from join_example_spark.queries.analytics_ext import q_orders_basket

    rows = duckdb.sql(
        "SELECT DISTINCT l.l_orderkey, p.p_brand"
        " FROM read_parquet('/root/testdata/sf0.001/lineitem.parquet') l"
        " JOIN read_parquet('/root/testdata/sf0.001/part.parquet') p"
        "   ON p.p_partkey = l.l_partkey"
    ).fetchall()
    baskets: dict[int, set] = {}
    for ok, b in rows:
        baskets.setdefault(ok, set()).add(b)
    n_orders = len(baskets)
    brand_n: dict[str, int] = {}
    pair_n: dict[tuple, int] = {}
    for bs in baskets.values():
        for b in bs:
            brand_n[b] = brand_n.get(b, 0) + 1
        for a, b in itertools.combinations(sorted(bs), 2):
            pair_n[(a, b)] = pair_n.get((a, b), 0) + 1
    ranked = sorted(pair_n.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    want = sorted(
        (
            a,
            b,
            n,
            brand_n[a],
            brand_n[b],
            (n * n_orders) / (brand_n[a] * brand_n[b]),
        )
        for (a, b), n in ranked
    )
    got = sorted(
        tuple(r) for r in q_orders_basket(spark, "/root/testdata/sf0.001").collect()
    )
    assert got == want


def test_funnel_latency_matches_python_witness(spark):
    """Witness: replay the stage semantics and the DISCRETE p50/p90
    (quantile_disc convention: element at ceil(p*n)-1 of the sorted
    delays) in plain Python."""
    from join_example_spark.queries.streaming_equiv import q_funnel_latency
    from join_example_spark.sources.readers import read_events

    ev = read_events(spark, "/root/testdata/sf0.001").select(
        "user_id", "ts", "event_type"
    )
    rows = [(r.user_id, r.ts, r.event_type) for r in ev.collect()]
    import datetime
    import math

    day = datetime.timedelta(hours=24)
    v: dict[int, object] = {}
    for u, ts, et in rows:
        if et == "view" and (u not in v or ts < v[u]):
            v[u] = ts
    c: dict[int, object] = {}
    for u, ts, et in rows:
        if et == "click" and u in v and v[u] < ts <= v[u] + day:
            if u not in c or ts < c[u]:
                c[u] = ts
    p: dict[int, object] = {}
    for u, ts, et in rows:
        if et == "purchase" and u in c and c[u] < ts <= c[u] + day:
            if u not in p or ts < p[u]:
                p[u] = ts

    def micros(td):
        return td.days * 86_400_000_000 + td.seconds * 1_000_000 + td.microseconds

    def summarize(stage, delays):
        ds = sorted(delays)
        n = len(ds)

        def qdisc(q):
            return ds[max(math.ceil(q * n), 1) - 1]

        s = sum(ds)
        return (stage, n, qdisc(0.5), qdisc(0.9), s, s / n)

    d1 = [micros(c[u] - v[u]) // 1_000_000 for u in c]
    d2 = [micros(p[u] - c[u]) // 1_000_000 for u in p]
    want = sorted([summarize("view_to_click", d1), summarize("click_to_purchase", d2)])
    got = sorted(
        tuple(r) for r in q_funnel_latency(spark, "/root/testdata/sf0.001").collect()
    )
    assert got == want
