"""Graph-based ANN (NSW-style) — the library-tier breadth item closing the
one ANN-family gap the IVF/IMI/PQ stack leaves (VERDICT r12 task 6): a
navigable-small-world-style neighbor graph plus iterative greedy beam
search. Library tier: exercised by brute-force-complete unit tests and a
two-tier recall audit (tests/test_round13_ops.py), not by the driver.

Why NOT the declared default: graph-ANN (HNSW and friends) is the
single-node recall/latency king because greedy walks exploit a local,
mutable, pointer-chasing index — exactly the shape a distributed
shared-nothing engine is worst at. The honest Spark rendition below is
BSP: each search round is one join against the (static) edge table plus
one per-probe rank-filter, so a walk of R hops costs R shuffle rounds of
the BEAM frontier (tiny rows), never of the corpus. That is the correct
100 TB posture for *batch* graph search — amortize rounds across millions
of probes per wave — while point-lookup latency stays the province of a
serving-side HNSW. The IVF/IMI family remains the engine's scale default.

Determinism: every choice is total-ordered — centroid-free kNN-graph
construction reuses the IVF multi-probe candidate generator (deterministic
lowest-id centroids), neighbor lists rank by (sim DESC, id ASC), entry
points are the ``beam`` lowest-id vectors (the deterministic stand-in for
HNSW's top layer), and each round's beam keeps (sim DESC, id ASC). Two
searches of the same corpus return identical rows under any partitioning
(pinned by the unit tests).

Measured top-3 recall vs the exact flat scan (fixture corpora, round 13;
deterministic, so these are exact values, not samples):

====================================  ========  ========
(degree, nprobe, beam, rounds)        n=500     n=2000
====================================  ========  ========
(16, 3, 32, 8)  — the defaults        1.0000    0.9667
(16, 3, 16, 6)                        1.0000    0.8667
(12, 2, 16, 6)                        —         0.6333
(8,  2,  8, 6)                        0.6667    0.3000
====================================  ========  ========

The recall cliff below degree~16 is the classic NSW connectivity knee:
sparse kNN graphs on clustered corpora fragment into label islands the
low-id entry points can't escape, and no beam width fixes an absent path.

Fixed dials decay with corpus growth exactly like fixed-nprobe IVF
(SCALE §3.7b); measured at the rotation-enlarged 16k DISTINCT tier
(50 probes, top-3 vs flat truth; regenerate with
``tools/nsw_dial_sweep.py`` — recalls are deterministic exact values,
build/search seconds are box-load-sensitive and quoted from an idle
round-13 session):

====================================  ========  =========  =========
(degree, nprobe, beam, rounds)        recall    build (s)  search (s)
====================================  ========  =========  =========
(16, 3, 32, 8)  — the n=2k defaults   0.7333    21.0       10.6
(16, 3, 64, 12)                       0.8267    18.5       12.6
(24, 4, 64, 12)                       0.9400    27.8       11.3
====================================  ========  =========  =========

Degree (graph connectivity) is the binding dial, beam/rounds secondary —
callers growing a corpus should scale ``degree`` ~log(n) first, the
graph-ANN analogue of the adaptive IVF nprobe schedule.
:func:`adaptive_nsw_dials` (round 14) ships that schedule: identical to
the defaults at every fixture SF, landing exactly on the measured
(24, 4, 64, 12) point at 16k — re-measured through the committed sweep
tool: recall 0.9667 at n=2k, 0.9400 at n=16k under the adaptive dial
(tests/test_round14_ops.py pins both tiers).

Round-15 octave (64x tier, n=128k DISTINCT, 50 probes, via
``tools/nsw_dial_sweep.py``; recalls exact, timings from a
heavily-loaded session):

====================================  ========  =========  =========
(degree, nprobe, beam, rounds)        recall    build (s)  search (s)
====================================  ========  =========  =========
(24, 4, 64, 12) — frozen 16k dial     0.7600    744        70
(30, 5, 128, 16) — frozen 64k dial    0.9933    868        75
(32, 5, 128, 16) — adaptive landing   0.9667    1034       37
====================================  ========  =========  =========

The adaptive schedule holds >= 0.95 at its fourth measured octave while
the frozen 16k dial keeps decaying (0.94 -> 0.86 -> 0.76). Degree 32 vs
30 is NOT recall-monotone here (0.9667 vs 0.9933) — the documented
beam-eviction caveat observed live: denser neighbor lists can evict a
true neighbor from a fixed-width beam. Both land well above the 0.90
calibration target; the schedule stays as-is (calibrated through 128k,
extrapolating unmeasured beyond).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from join_example_spark.operators.similarity import DOT_SQL, _by_cell, ivf_cells

#: Measured calibration anchors for :func:`adaptive_nsw_dials` — exact
#: values of the deterministic pipeline, regenerable with
#: ``tools/nsw_dial_sweep.py`` (50-probe protocol at the enlarged tiers):
#: at N0 the defaults (16, 3, 32, 8) measure top-3 recall 0.9667; at N1
#: (24, 4, 64, 12) measures 0.9400 while the fixed defaults decay to
#: 0.7333. Degree is the binding dial (the connectivity knee), so the
#: schedule grows it linearly in log n — +8 per 8x (the measured
#: 16 → 24 hop) — with the secondary beam/rounds dials stepped once per
#: STARTED 8x hop alongside it (ceiling semantics: the first step fires
#: immediately past the anchor — recall-safe, cost front-loaded; see the
#: function docstring). The schedule's EXTRAPOLATION is measured TWO
#: octaves further: round 14 (32x tier, n=64k) — adaptive landing
#: (30, 5, 128, 16) holds 0.96 while the frozen 16k dial decays to 0.86;
#: round 15 (64x tier, n=128k) — adaptive landing (32, 5, 128, 16) holds
#: 0.9667 while the frozen 16k dial decays to 0.76 (full table in the
#: module docstring; degree is NOT strictly recall-monotone there — the
#: beam-eviction caveat — but every adaptive landing clears the 0.90
#: target). Calibrated through 128k; beyond that it extrapolates
#: unmeasured.
NSW_CALIB_N0 = 2_000
NSW_CALIB_N1 = 16_000


def adaptive_nsw_dials(
    n: int, target_recall: float | None = None
) -> tuple[int, int, int, int]:
    """Derive the NSW dials ``(degree, nprobe, beam, rounds)`` from the
    corpus size — the graph-family twin of ``adaptive_nprobe`` /
    ``adaptive_imi_dials`` (operators/similarity.py), closing the round-13
    finding that the fixed defaults decay 0.9667 → 0.7333 from the 2k to
    the 16k tier while (24, 4, 64, 12) restores 0.94.

    Schedule: at ``n <= 2000`` (every fixture SF) the audited defaults are
    returned unchanged — identical plans and recall pins. Beyond the
    anchor, ``degree`` grows linearly in log n (+8/3 per doubling, landing
    exactly on the measured (24, …) point at 16k), and the secondary dials
    (nprobe, beam, rounds) step once per STARTED 8x hop — ceiling
    semantics, deliberate: the first step fires IMMEDIATELY past the
    anchor (n=2001 already pays the full 16k-tier (4, 64, 12)
    beam/rounds cost), not at 16k, so the entire 2k–16k interval runs at
    the next tier's secondary dials. That front-loads cost but keeps
    every mid-interval corpus at-or-above both measured anchors'
    settings (the dials are recall-monotone, so rounding UP is the
    recall-safe direction; callers sizing mid-interval corpora who care
    about the beam/rounds cost should sweep their own tier). Each later
    started 8x hop continues the same arithmetic/geometric steps.
    Both anchor recalls are MEASURED (see ``NSW_CALIB_N0/N1``); degrees at
    intermediate n interpolate the log-slope monotonically — recall there
    is UNMEASURED (extra ``rounds`` are provably recall-monotone, extra
    degree/beam are empirically so at every measured point, but a fixed
    beam admits eviction effects in principle, so the anchors bound the
    dial schedule, not the recall curve between them);
    the extrapolation past 16k is MEASURED at the next TWO octaves — at
    n=64k the schedule's (30, 5, 128, 16) landing holds recall at 0.96
    while the frozen 16k dial decays to 0.86, and at n=128k the
    (32, 5, 128, 16) landing holds 0.9667 while the frozen 16k dial
    decays to 0.76 — and unmeasured beyond 128k: run
    ``tools/nsw_dial_sweep.py`` at the target tier before relying on it
    further out (the IVF family's 128k tier took its own sweep for the
    same reason).

    ``target_recall``: only 0.90 is calibrated (both measured anchors land
    above it: 0.9667 / 0.9400); ``None`` means the same schedule. Other
    targets raise until swept — the honest refusal idiom shared with
    ``adaptive_imi_dials``.
    """
    import math

    if target_recall is not None and abs(target_recall - 0.90) > 1e-9:
        raise ValueError(
            "only target_recall=0.90 is calibrated for the NSW schedule "
            "(measured 0.9667 / 0.9400 at the 2k / 16k anchors); sweep "
            "other targets with tools/nsw_dial_sweep.py before shipping"
        )
    if n <= NSW_CALIB_N0:
        return 16, 3, 32, 8
    doublings = math.log2(n / NSW_CALIB_N0)
    degree = 16 + int(math.ceil(8.0 * doublings / 3.0))
    steps = int(math.ceil(doublings / 3.0))  # one step per measured 8x hop
    return degree, 3 + steps, 32 * (2**steps), 8 + 4 * steps


def knn_graph(
    emb: DataFrame,
    degree: int = 16,
    n_centroids: int | None = None,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Deterministic approximate kNN graph: ``(src, dst, sim)``.

    Candidates per node are its IVF multi-probe co-cell mates (the same
    admissibility machinery the lossless pair generator builds on — never
    all-pairs); each node keeps its top-``degree`` by (sim DESC, id ASC),
    and the graph is then SYMMETRIZED (reverse edges unioned in, exact
    duplicates dropped) — the standard kNN+reverse base-layer construction
    (Malkov & Yashunin's NSW base layer without the insertion-order
    heuristics, which a batch build doesn't need). Out-degree is therefore
    bounded by 2·degree.

    At 100 TB: cell assignment is map-side against broadcast centroids;
    the candidate join is cell-co-located with explicitly pinned
    exchanges inside ``ivf_cells`` consumers; the per-src top-``degree``
    is a rank-filter, no global sort. Edge volume is O(n·degree).
    """
    import math

    if n_centroids is None:
        # Derived from a driver-side count only when the caller didn't
        # size it; callers with footer metadata should pass it explicitly.
        n_centroids = int(math.ceil(math.sqrt(emb.count())))
    cells = ivf_cells(
        emb,
        n_centroids,
        id_col=id_col,
        vec_col=vec_col,
        round_digits=round_digits,
        nprobe=nprobe,
    )
    # Pin the pair-generating exchange on BOTH sides: AQE coalescing sizes
    # by input bytes and is blind to join fan-out (SCALE §3.4).
    a = _by_cell(
        cells.select(F.col(id_col).alias("src"), F.col(vec_col).alias("vec_a"), "cell")
    )
    b = _by_cell(
        cells.select(F.col(id_col).alias("dst"), F.col(vec_col).alias("vec_b"), "cell")
    )
    dot = F.expr(DOT_SQL.format(a="vec_a", b="vec_b"))
    cand = (
        a.join(b, "cell")
        .where(F.col("src") != F.col("dst"))
        # Score BEFORE deduping: multi-probe assigns a pair to every
        # shared cell, but the duplicate rows carry identical sims, so
        # deduping the narrow (src, dst, sim) tuples (~24 B) instead of
        # rows holding both vectors (~512 B) keeps the dedup exchange
        # narrow — the same narrow-shuffle rationale as the ivf_cells
        # rewrite — at the cost of an extra dot fold per duplicate cell.
        .select("src", "dst", F.round(dot, round_digits).alias("sim"))
        .dropDuplicates(["src", "dst"])
    )
    w = Window.partitionBy("src").orderBy(F.col("sim").desc(), F.col("dst"))
    knn = cand.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= degree
    ).select("src", "dst", "sim")
    rev = knn.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), "sim"
    )
    return knn.unionByName(rev).dropDuplicates(["src", "dst"])


def nsw_search(
    emb: DataFrame,
    edges: DataFrame,
    k: int = 3,
    beam: int = 32,
    rounds: int = 8,
    probe_pred: str | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Greedy beam search over a ``knn_graph``: per-probe exact-sim top-k.

    ``(probe_id, cand_id, sim, rn)`` — the ``cosine_topk`` output contract,
    so recall audits diff the two directly. Probes never match themselves.
    ``probe_pred=None`` follows the ANN-FAMILY convention (see
    ``cosine_topk``'s docstring): it templates the default
    ``{id_col} % 100 = 0`` probe split — pass ``"true"`` explicitly to
    search every row as a probe.

    BSP rendition of the greedy walk with FRONTIER-ONLY expansion: each
    round expands only the nodes newly admitted to a probe's beam (one
    join against the static edge table), anti-joins away candidates
    already scored for that probe, exact-scores only the genuinely fresh
    ones (one id-join into the corpus), and keeps the per-probe
    top-``beam`` under the (sim DESC, id ASC) total order. Expanding only
    the frontier is outcome-identical to re-expanding the whole beam
    (a node's expansion always yields the same scored set — re-expansion
    adds nothing after the dedupe) while cutting per-round scoring from
    beam·degree to |new admits|·degree; a converged beam has an empty
    frontier and later rounds are no-ops. ``rounds`` is the hop budget:
    beam membership is monotone non-worsening, so extra rounds only
    improve recall. Lineage is truncated per round with
    ``localCheckpoint`` exactly like the CC loops in operators/graph.py
    (executor-side, nothing driver-collected; a real cluster would use a
    reliable checkpoint dir).

    Per-round cost at scale: |frontier|·degree candidate rows — tiny
    fixed-width tuples — through key-partitioned joins; the corpus vector
    table is only probed by id (bucketable). No stage depends on corpus
    cardinality beyond those id lookups.
    """
    if probe_pred is None:
        probe_pred = f"{id_col} % 100 = 0"
    # The edge table is consumed once per round: materialize it ONCE
    # (executor-side, nothing driver-collected) or every per-round
    # checkpoint action re-executes the whole graph build — the
    # multi-consumer re-execution trap (SCALE §3.4). Results unchanged
    # (re-pinned), wall time drops with the rounds budget.
    edges = edges.localCheckpoint(eager=True)
    probes = emb.where(F.expr(probe_pred)).select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("vec_p")
    )
    vecs = emb.select(F.col(id_col).alias("node"), F.col(vec_col).alias("vec_c"))

    entries = (
        emb.orderBy(id_col)
        .limit(beam)
        .select(F.col(id_col).alias("node"), F.col(vec_col).alias("vec_c"))
    )
    dot = F.expr(DOT_SQL.format(a="vec_p", b="vec_c"))
    beam_df = (
        probes.crossJoin(F.broadcast(entries))
        .withColumn("sim", F.round(dot, round_digits))
        .select("probe_id", "node", "sim")
        .localCheckpoint(eager=True)
    )
    w_beam = Window.partitionBy("probe_id").orderBy(
        F.col("sim").desc(), F.col("node")
    )
    # frontier: beam members not yet expanded; scored: every (probe, node)
    # whose exact sim was ever computed (beam-evicted nodes stay in it so
    # they are never re-scored). Both are tiny fixed-width id-pair tables.
    frontier = beam_df
    scored = beam_df.select("probe_id", "node")
    for _ in range(rounds):
        fresh = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select("probe_id", F.col("dst").alias("node"))
            .dropDuplicates(["probe_id", "node"])
            .join(scored, ["probe_id", "node"], "left_anti")
            .join(vecs, "node")
            .join(probes, "probe_id")
            .withColumn("sim", F.round(dot, round_digits))
            .select("probe_id", "node", "sim")
            .localCheckpoint(eager=True)
        )
        # convergence early-exit: an empty frontier expansion means every
        # beam is a fixpoint — remaining rounds would be no-op jobs
        # (isEmpty on the just-checkpointed tiny table is one cheap action)
        if fresh.isEmpty():
            break
        scored = scored.unionByName(
            fresh.select("probe_id", "node")
        ).localCheckpoint(eager=True)
        new_beam = (
            beam_df.unionByName(fresh)
            .withColumn("rn", F.row_number().over(w_beam))
            .where(F.col("rn") <= beam)
            .select("probe_id", "node", "sim")
            .localCheckpoint(eager=True)
        )
        # newly admitted = in the new beam but never expanded; the old
        # frontier is expanded now, and everything in the old beam beyond
        # it was expanded in an earlier round.
        frontier = new_beam.join(
            beam_df.select("probe_id", "node"), ["probe_id", "node"], "left_anti"
        ).localCheckpoint(eager=True)
        beam_df = new_beam
    return (
        beam_df.where(F.col("probe_id") != F.col("node"))
        .withColumn("rn", F.row_number().over(w_beam).cast("bigint"))
        .where(F.col("rn") <= k)
        .select("probe_id", F.col("node").alias("cand_id"), "sim", "rn")
    )
