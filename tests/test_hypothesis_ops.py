"""Property-based checks (hypothesis) against pure-Python references.

Generated inputs hit the corners fixtures don't: duplicate timestamps,
empty join sides, singleton/dense graphs. Spark results must equal an
independently-written Python implementation of the same semantics.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from join_example_spark.operators.graph import connected_components
from join_example_spark.operators.temporal import asof_join

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def _events(draw, max_rows=14):
    n = draw(st.integers(0, max_rows))
    rows = []
    for i in range(n):
        key = draw(st.integers(0, 2))
        ts = draw(st.integers(0, 20))
        rows.append((i, key, ts))
    return rows


@given(left=_events(), right=_events())
@settings(**_SETTINGS)
def test_asof_join_matches_python_reference(spark, left, right):
    # Python reference: latest right ts <= left ts per key; ties on right ts
    # collapse to the same ts value (we compare only the picked ts).
    def ref(lrows, rrows):
        out = {}
        for lid, lkey, lts in lrows:
            cands = [rts for _, rkey, rts in rrows if rkey == lkey and rts <= lts]
            if cands:
                out[lid] = max(cands)
        return out

    ldf = spark.createDataFrame(left, "lid BIGINT, key BIGINT, ts BIGINT")
    rdf = spark.createDataFrame(right, "rid BIGINT, key BIGINT, ts BIGINT")
    got_rows = asof_join(
        ldf, rdf, on=["key"], left_ts="ts", right_ts="ts", how="inner"
    ).collect()
    got = {r.l_lid: r.r_ts for r in got_rows}
    assert got == ref(left, right)


@st.composite
def _graph(draw, max_nodes=10):
    n = draw(st.integers(1, max_nodes))
    nodes = list(range(1, n + 1))
    n_edges = draw(st.integers(0, min(12, n * (n - 1) // 2)))
    edges = [
        (draw(st.sampled_from(nodes)), draw(st.sampled_from(nodes)))
        for _ in range(n_edges)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    return nodes, edges


@given(g=_graph())
@settings(**_SETTINGS)
def test_connected_components_matches_union_find(spark, g):
    nodes, edges = g

    # Python reference: union-find with path compression.
    parent = {v: v for v in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    ref = {v: find(v) for v in nodes}
    # normalize: root may not be component-min under naive union order
    comp_min: dict[int, int] = {}
    for v, r in ref.items():
        comp_min[r] = min(comp_min.get(r, v), v)
    ref = {v: comp_min[find(v)] for v in nodes}

    ndf = spark.createDataFrame([(v,) for v in nodes], "id BIGINT")
    edf = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    got = {
        r.id: r.cluster_id
        for r in connected_components(ndf, edf, max_iter=25).collect()
    }
    assert got == ref


@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 1023), st.integers(0, 1023)),
        min_size=1,
        max_size=40,
        unique=True,
    )
)
@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_zorder_interleave_is_injective_and_bounded(spark, pairs):
    from join_example_spark.queries.analytics_ext import _z_expr

    from pyspark.sql import functions as F

    df = spark.createDataFrame(pairs, "x LONG, y LONG").withColumn(
        "z", F.expr(_z_expr("x", "y", 10, "spark"))
    )
    rows = df.collect()
    # Injective: distinct (x, y) -> distinct z; bounded to 20 bits; and the
    # Python-reference interleave agrees bit for bit.
    zs = [r.z for r in rows]
    assert len(set(zs)) == len(zs)
    for r in rows:
        ref = 0
        for i in range(10):
            ref |= ((r.x >> i) & 1) << (2 * i)
            ref |= ((r.y >> i) & 1) << (2 * i + 1)
        assert r.z == ref and 0 <= r.z < (1 << 20)


@st.composite
def _docs(draw, max_rows=8):
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon"]
    n = draw(st.integers(0, max_rows))
    rows = []
    for i in range(n):
        toks = draw(st.lists(st.sampled_from(vocab), min_size=1, max_size=6))
        text = " ".join(toks)
        lang = draw(st.sampled_from(["en", "fr"]))
        rows.append((i, lang, len(text), text))
    return rows


@given(corpus=_docs(), batch=_docs())
@settings(**_SETTINGS)
def test_incremental_dedup_matches_python_reference(spark, corpus, batch):
    from join_example_spark.operators.dedup import incremental_dedup_verdicts

    def ref(batch_rows, corpus_rows):
        out = {}
        corpus_texts = {t.lower().strip() for _, _, _, t in corpus_rows}
        for did, lang, n, text in batch_rows:
            if text.lower().strip() in corpus_texts:
                out[did] = "dup_exact"
                continue
            near = False
            bt = set(text.lower().strip().split(" "))
            for _, clang, cn, ctext in corpus_rows:
                if clang != lang or abs(n - cn) > 20:
                    continue
                ct = set(ctext.lower().strip().split(" "))
                if len(bt | ct) and len(bt & ct) / len(bt | ct) >= 0.5:
                    near = True
                    break
            out[did] = "dup_near" if near else "kept"
        return out

    schema = "doc_id BIGINT, lang STRING, n_chars BIGINT, text STRING"
    got = {
        r.doc_id: r.status
        for r in incremental_dedup_verdicts(
            spark.createDataFrame(batch, schema),
            spark.createDataFrame(corpus, schema),
        ).collect()
    }
    assert got == ref(batch, corpus)


@given(g=_graph())
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_star_contraction_agrees_with_min_label_propagation(spark, g):
    # The O(log n) large-star/small-star formulation must produce the exact
    # labeling of the O(diameter) min-label loop on any graph shape —
    # including chains, cliques, and singletons.
    from join_example_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    nodes, edges = g
    ndf = spark.createDataFrame([(v,) for v in nodes], "id BIGINT")
    edf = spark.createDataFrame(edges or [], "src BIGINT, dst BIGINT")
    a = {
        (r.id, r.cluster_id)
        for r in connected_components(ndf, edf, id_col="id").collect()
    }
    b = {
        (r.id, r.cluster_id)
        for r in connected_components_star(ndf, edf, id_col="id").collect()
    }
    assert a == b


@st.composite
def _vectors(draw, dim=8, max_rows=10):
    n = draw(st.integers(2, max_rows))
    rows = []
    for i in range(n):
        vec = [float(draw(st.integers(-3, 3))) for _ in range(dim)]
        rows.append((i, vec))
    return rows


@given(vs=_vectors())
@settings(**_SETTINGS)
def test_pq_assignments_match_python_argmin(spark, vs):
    """pq_assignments must pick, for every (vector, subspace), exactly the
    code a pure-Python argmin over the same rounded squared-L2 picks
    (lowest code on ties) — generated integer vectors make the rounded
    distances exact, so ties genuinely occur and exercise the tiebreak."""
    from join_example_spark.operators.similarity import pq_assignments

    n_codes, n_sub, sub_dim = 3, 2, 4
    emb = spark.createDataFrame(
        [(i, v) for i, v in vs], "vec_id BIGINT, embedding ARRAY<FLOAT>"
    )
    got = {
        (r.vec_id, r.sub): (r.code, r.d2r)
        for r in pq_assignments(
            emb, n_codes=n_codes, n_sub=n_sub, sub_dim=sub_dim
        ).collect()
    }

    cb = sorted(vs)[: min(n_codes, len(vs))]
    want = {}
    for vid, vec in vs:
        for s in range(n_sub):
            vsub = vec[s * sub_dim : (s + 1) * sub_dim]
            best = None
            for code, (_, cvec) in enumerate(cb):
                csub = cvec[s * sub_dim : (s + 1) * sub_dim]
                d2 = round(sum((a - b) ** 2 for a, b in zip(vsub, csub)), 4)
                if best is None or (d2, code) < best:
                    best = (d2, code)
            want[(vid, s)] = (best[1], best[0])
    assert got == want


@st.composite
def _vectors(draw, dim=4, max_rows=10):
    n = draw(st.integers(2, max_rows))
    rows = []
    for i in range(n):
        vec = [
            float(draw(st.integers(-4, 4))) / 4.0 for _ in range(dim)
        ]
        rows.append((i, vec))
    return rows


@given(rows=_vectors())
@settings(**_SETTINGS)
def test_imi_home_cells_match_python_reference(spark, rows):
    """IMI single-assignment must equal an independently-written Python
    argmax: per half, the rounded-dot-max centroid with lowest-index
    tiebreak. Generated vectors hit exact dot TIES (quarter-integer
    components), the case the fixture corpus never produces — the
    reverse-sorted (s, -cidx) extraction must break them identically."""
    from join_example_spark.operators.similarity import imi_cells

    dim, half = 4, 2
    c = min(3, len(rows))
    cents = sorted(rows)[:c]

    df = spark.createDataFrame(
        [(i, v) for i, v in rows], "vec_id BIGINT, embedding ARRAY<FLOAT>"
    )
    got = {
        r.vec_id: r.cell
        for r in imi_cells(df, c_per_half=c, half_dim=half).collect()
    }
    # Float32 storage: the reference must dot the same float32-rounded
    # values Spark reads back, so build it from the collected column.
    stored = {r.vec_id: list(r.embedding) for r in df.collect()}
    cents_stored = [(i, stored[i]) for i, _ in cents]

    def ref_cell_stored(vec):
        idxs = []
        for h in (0, 1):
            best = None
            for j, (_, cv) in enumerate(cents_stored):
                s = round(
                    sum(vec[h * half + d] * cv[h * half + d] for d in range(half)),
                    4,
                )
                key = (s, -(j + 1))
                if best is None or key > best[0]:
                    best = (key, j + 1)
            idxs.append(best[1])
        return idxs[0] * 1024 + idxs[1]

    want = {i: ref_cell_stored(stored[i]) for i, _ in rows}
    assert got == want


@st.composite
def _token_corpora(draw, max_docs=8):
    n = draw(st.integers(0, max_docs))
    alphabet = ["a", "b", "c", "d", "e", "f"]
    docs = []
    for i in range(n):
        toks = draw(
            st.sets(st.sampled_from(alphabet), min_size=1, max_size=5)
        )
        docs.append((i, sorted(toks)))
    return docs


@given(docs=_token_corpora(), thresh=st.sampled_from([(1, 2), (4, 5)]))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_prefix_filter_pairs_lossless_vs_bruteforce(spark, docs, thresh):
    """The prefix-filter join must equal brute-force all-pairs Jaccard at
    ANY rational threshold — including corpora with many identical token
    sets (the contraction path) and tiny/empty corpora the fixture never
    produces."""
    from join_example_spark.operators.dedup_prefix import prefix_filter_pairs

    num, den = thresh

    def ref(rows):
        out = set()
        for i, (ia, ta) in enumerate(rows):
            sa = set(ta)
            for ib, tb in rows[i + 1 :]:
                sb = set(tb)
                inter, union = len(sa & sb), len(sa | sb)
                if den * inter >= num * union:
                    out.add((ia, ib))
        return out

    df = spark.createDataFrame(docs, "doc_id BIGINT, toks ARRAY<STRING>")
    got = {
        (r.id_a, r.id_b)
        for r in prefix_filter_pairs(df, num=num, den=den).collect()
    }
    assert got == ref(docs)


@st.composite
def _count_series(draw):
    n = draw(st.integers(0, 10))
    rows = []
    for _ in range(n):
        typ = draw(st.sampled_from(["a", "b"]))
        m = draw(st.integers(100, 112))
        x = draw(st.integers(1, 5))
        rows.append((typ, m, x))
    # collapse duplicate (typ, m) keys like a rollup would
    agg = {}
    for typ, m, x in rows:
        agg[(typ, m)] = agg.get((typ, m), 0) + x
    return [(t, m, x) for (t, m), x in agg.items()]


@given(series=_count_series())
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_dyadic_weighted_series_matches_python_reference(spark, series):
    """Fuzz the shared EWMA/Holt core: random sparse (type, minute, count)
    rollups — short series (< window), gaps, single types — must match a
    plain-Python spine-fill + weighted-sum + complete-window reference
    exactly (integer weights, one power-of-two division: equality is
    exact, no tolerance)."""
    from join_example_spark.operators.temporal import dyadic_weighted_series

    weights = (8, 4, 2, 1)  # L=4 dyadic table, divisor 16

    def ref(rows):
        if not rows:
            return {}
        mn = min(m for _, m, _ in rows)
        mx = max(m for _, m, _ in rows)
        types = {t for t, _, _ in rows}
        vals = {(t, m): x for t, m, x in rows}
        out = {}
        for t in types:
            xs = {m: vals.get((t, m), 0) for m in range(mn, mx + 1)}
            for end in range(mn + 3, mx + 1):
                s = sum(
                    xs[end - k] * weights[k] for k in range(4)
                )
                out[(t, end)] = s / 16.0
        return out

    per = spark.createDataFrame(
        series or [("zz", 0, 0)], "event_type STRING, m BIGINT, x BIGINT"
    )
    if not series:
        per = per.where("1 = 0")
    got = {
        (r.event_type, r.win_end_m): r.out
        for r in dyadic_weighted_series(per, weights, 16.0, "out").collect()
    }
    assert got == ref(series)


@st.composite
def _graphs(draw, max_nodes=8):
    n = draw(st.integers(0, max_nodes))
    nodes = list(range(n))
    pairs = []
    if n >= 2:
        m = draw(st.integers(0, 10))
        for _ in range(m):
            a = draw(st.integers(0, n - 1))
            b = draw(st.integers(0, n - 1))
            if a != b:
                pairs.append((min(a, b), max(a, b)))
    seeds = draw(st.sets(st.sampled_from(nodes), max_size=3)) if n else set()
    return nodes, sorted(set(pairs)), sorted(seeds)


@given(g=_graphs())
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_bfs_distances_fuzz_vs_python(spark, g):
    """Random graphs + seed sets (empty seeds, disconnected components,
    self-contained cliques) against a plain BFS."""
    from join_example_spark.operators.graph import bfs_distances

    nodes, pairs, seeds = g
    dist = {s: 0 for s in seeds}
    frontier = list(seeds)
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for d in range(1, 4):
        nxt = []
        for v in frontier:
            for u in adj.get(v, ()):
                if u not in dist:
                    dist[u] = d
                    nxt.append(u)
        frontier = nxt

    seeds_df = spark.createDataFrame(
        [(s,) for s in seeds] or [(0,)], "vec_id BIGINT"
    )
    if not seeds:
        seeds_df = seeds_df.where("1 = 0")
    pairs_df = spark.createDataFrame(
        pairs or [(0, 1)], "id_a BIGINT, id_b BIGINT"
    )
    if not pairs:
        pairs_df = pairs_df.where("1 = 0")
    got = {
        r.v: r.d for r in bfs_distances(seeds_df, pairs_df, iters=3).collect()
    }
    assert got == dist


@given(docs=_token_corpora(), thresh=st.sampled_from([(1, 2), (4, 5)]))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_containment_pairs_lossless_vs_bruteforce(spark, docs, thresh):
    """The DIRECTED containment join must equal brute-force ordered-pair
    containment at any rational threshold — asymmetry means both (a,b)
    and (b,a) must be judged independently, and identical token sets
    (the contraction + intra-expansion path) must produce BOTH ordered
    pairs at containment 1.0."""
    from join_example_spark.operators.dedup_prefix import containment_prefix_pairs

    num, den = thresh

    def ref(rows):
        out = set()
        for ia, ta in rows:
            sa = set(ta)
            for ib, tb in rows:
                if ia == ib:
                    continue
                inter = len(sa & set(tb))
                if den * inter >= num * len(sa):
                    out.add((ia, ib))
        return out

    df = spark.createDataFrame(docs, "doc_id BIGINT, toks ARRAY<STRING>")
    got = {
        (r.id_sub, r.id_sup)
        for r in containment_prefix_pairs(df, num=num, den=den).collect()
    }
    assert got == ref(docs)
