"""Temporal join operators Spark SQL lacks natively: as-of and range joins.

These are the operations the reference (a Kafka Streams windowed-join demo)
exists to demonstrate: "every pair within the window" (range join) and
"latest value at or before t" (as-of join — the thing the Kafka Streams DSL
*cannot* cleanly express, and the motivation for this engine).

Both are pure DataFrame compositions — no custom Catalyst rules, no Python
UDFs — so Catalyst/AQE keep full control of the physical strategy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    lower: str = "INTERVAL 0 SECOND",
    upper: str = "INTERVAL 1 HOUR",
    how: str = "inner",
) -> DataFrame:
    """KStreams ``JoinWindows``-style interval join.

    Matches every (l, r) pair with equal ``on`` keys and
    ``l.left_ts + lower <= r.right_ts <= l.left_ts + upper``.

    Scale note: because there is an equality component (``on``), Catalyst
    plans this as a shuffled equi-join with the interval bound as a residual
    filter — the right plan at 100 TB (no nested-loop explosion). Keys are
    hash-partitioned; AQE splits skewed keys. For the key-less variant use
    :func:`range_join_bucketed`.
    """
    l = left.select([F.col(c).alias(f"l_{c}") for c in left.columns])
    r = right.select([F.col(c).alias(f"r_{c}") for c in right.columns])
    cond = None
    for k in on:
        c = F.col(f"l_{k}") == F.col(f"r_{k}")
        cond = c if cond is None else (cond & c)
    lo = F.expr(f"l_{left_ts} + {lower}")
    hi = F.expr(f"l_{left_ts} + {upper}")
    bounds = (F.col(f"r_{right_ts}") >= lo) & (F.col(f"r_{right_ts}") <= hi)
    cond = bounds if cond is None else (cond & bounds)
    return l.join(r, cond, how)


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    window_seconds: int,
    on: list[str] | None = None,
) -> DataFrame:
    """Key-less (or low-selectivity-key) range join via time bucketing.

    Without an equality key, Spark plans an inequality join as a broadcast
    nested loop / cartesian — quadratic and fatal at scale. This restores an
    equi-join: bucket the time axis at ``window_seconds`` granularity; a
    right row at bucket b can only match left rows in buckets {b-1, b}, so
    we explode the right side into its two candidate buckets and equi-join
    on (keys..., bucket), then apply the exact interval as a residual filter.
    Matches r.ts in [l.ts, l.ts + window_seconds].
    """
    on = on or []
    bucket_us = f"CAST({window_seconds} AS BIGINT) * CAST(1000000 AS BIGINT)"
    l = left.select([F.col(c).alias(f"l_{c}") for c in left.columns]).withColumn(
        "_bucket", F.expr(f"unix_micros(l_{left_ts}) DIV ({bucket_us})")
    )
    r = (
        right.select([F.col(c).alias(f"r_{c}") for c in right.columns])
        .withColumn(
            "_rb", F.expr(f"unix_micros(r_{right_ts}) DIV ({bucket_us})")
        )
        .withColumn("_bucket", F.explode(F.array(F.col("_rb") - 1, F.col("_rb"))))
        .drop("_rb")
    )
    joined = l.join(
        r,
        [l["_bucket"] == r["_bucket"]]
        + [F.col(f"l_{k}") == F.col(f"r_{k}") for k in on],
        "inner",
    )
    exact = (F.col(f"r_{right_ts}") >= F.col(f"l_{left_ts}")) & (
        F.col(f"r_{right_ts}")
        <= F.expr(f"l_{left_ts} + INTERVAL {window_seconds} SECOND")
    )
    return joined.where(exact).drop("_bucket")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    how: str = "inner",
    tolerance: str | None = None,
) -> DataFrame:
    """As-of join: for each left row, the single latest right row with
    ``right_ts <= left_ts`` (optionally within ``tolerance``) per key.

    Semantics match DuckDB ``ASOF JOIN`` (boundary ``<=``): the right row
    with the greatest timestamp wins. Exact-timestamp ties are broken
    deterministically by ordering on every remaining right column (DuckDB's
    own tie-pick among equal timestamps is unspecified, so oracle-compared
    callers should still project only tie-invariant columns).

    Plan shape — the **linear merge formulation** (not join + rank): both
    sides are unioned into one frame tagged by side, hash-partitioned on
    the keys, sorted once by (ts, side, tie), and each left row picks up
    ``last(right_payload, ignoreNulls)`` over the running window. One
    shuffle per side, one sort, and — crucially — **no per-key pair
    inflation**: the old join-then-rank shape joined every left row to ALL
    earlier right rows of its key before ranking, which is quadratic in
    key frequency and explodes on hot keys at 100 TB. Here the
    intermediate is |left| + |right| rows regardless of key skew.
    Right rows sort before left rows at equal timestamps, so the ``<=``
    boundary is inclusive. Null-key / null-ts right rows can never match
    and are dropped before the union (equi-join null semantics).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"asof_join supports how='inner'|'left', got {how!r}")
    lcols, rcols = left.columns, right.columns
    tie_cols = [c for c in rcols if c != right_ts]
    payload_t = right.schema
    tie_t = StructType([f for f in right.schema.fields if f.name != right_ts])
    lnulls = {f.name: f.dataType for f in left.schema.fields}

    keys = [F.col(k).alias(f"_asof_k{i}") for i, k in enumerate(on)]
    lhs = left.select(
        *keys,
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias("_asof_side"),
        *[F.col(c).alias(f"l_{c}") for c in lcols],
        F.lit(None).cast(payload_t).alias("_asof_payload"),
        F.lit(None).cast(tie_t).alias("_asof_tie"),
    )
    rhs_filter = F.col(right_ts).isNotNull()
    for k in on:
        rhs_filter = rhs_filter & F.col(k).isNotNull()
    rhs = right.where(rhs_filter).select(
        *keys,
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias("_asof_side"),
        *[F.lit(None).cast(lnulls[c]).alias(f"l_{c}") for c in lcols],
        F.struct(*[F.col(c) for c in rcols]).alias("_asof_payload"),
        F.struct(*[F.col(c) for c in tie_cols]).alias("_asof_tie"),
    )
    merged = lhs.unionByName(rhs)
    # Total order within a key: time, then side (right first => inclusive
    # boundary), then the right tie-struct ascending so last() == the max
    # remaining-columns row among equal timestamps (same pick as DuckDB-safe
    # callers got from the previous desc-rank formulation).
    w = (
        Window.partitionBy(*[f"_asof_k{i}" for i in range(len(on))])
        .orderBy(
            F.col("_asof_ts").asc(),
            F.col("_asof_side").asc(),
            F.col("_asof_tie").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.withColumn(
        "_asof_fill", F.last("_asof_payload", ignorenulls=True).over(w)
    ).where(F.col("_asof_side") == 1)
    if tolerance is not None:
        # The carried row is the latest <= left_ts; if even it precedes the
        # tolerance window, no right row qualifies.
        filled = filled.withColumn(
            "_asof_fill",
            F.when(
                F.col("_asof_fill").getField(right_ts)
                >= F.expr(f"_asof_ts - {tolerance}"),
                F.col("_asof_fill"),
            ),
        )
    if how == "inner":
        filled = filled.where(F.col("_asof_fill").isNotNull())
    return filled.select(
        *[F.col(f"l_{c}") for c in lcols],
        *[F.col("_asof_fill").getField(c).alias(f"r_{c}") for c in rcols],
    )


def latest_per_key(
    df: DataFrame, keys: list[str], ts: str, tiebreak: str
) -> DataFrame:
    """KTable materialization: latest row per key (deterministic tiebreak).

    ``builder.table(topic)`` / ``reduce((a,b) -> b)`` in Kafka Streams. At
    scale this is one hash shuffle on ``keys``; no global sort.
    """
    w = Window.partitionBy(*keys).orderBy(F.col(ts).desc(), F.col(tiebreak).desc())
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


def ts_subseq_topk(
    per: DataFrame,
    window_len: int = 8,
    query_type: str = "click",
    k: int = 10,
) -> DataFrame:
    """Subsequence similarity search over a per-(type, minute) count
    rollup ``per(event_type, m, cnt)`` — the back half of
    ``q_ts_sim_search``, shared with the streaming series-maintenance
    demo so the batch query and the search over the incrementally
    maintained store are one code path.

    Gap-fills each type's minute spine, forms every ``window_len``-minute
    sliding window (frame-ordered collect_list), scores against the query
    pattern (the ``query_type`` series' first full window) by
    sum-of-squared differences in EXACT BIGINT arithmetic, and returns
    the top-``k`` under the unique (sse, type, start) total order via
    TakeOrderedAndProject.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    # `per` feeds both the per-type bounds and the spine join —
    # materialize the tiny rollup once (SCALE.md §3.4 rule).
    per = per.localCheckpoint(eager=True)
    bounds = per.groupBy("event_type").agg(
        F.min("m").alias("mn"), F.max("m").alias("mx")
    )
    spine = bounds.select(
        "event_type", F.explode(F.expr("sequence(mn, mx)")).alias("m")
    )
    series = spine.join(per, ["event_type", "m"], "left").select(
        "event_type", "m", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")
    )
    w_frame = (
        Window.partitionBy("event_type").orderBy("m").rowsBetween(0, window_len - 1)
    )
    wins = series.select(
        "event_type", "m", F.collect_list("cnt").over(w_frame).alias("w")
    ).where(F.size("w") == window_len)
    q = (
        wins.where(F.col("event_type") == query_type)
        .orderBy("m")
        .limit(1)
        .select(F.col("w").alias("qw"))
    )
    sse = F.expr(
        "CAST(aggregate(zip_with(w, qw, (x, y) -> (x - y) * (x - y)),"
        " CAST(0 AS BIGINT), (acc, v) -> acc + v) AS BIGINT)"
    )
    scored = wins.crossJoin(F.broadcast(q)).select(
        "event_type", F.col("m").cast("bigint").alias("win_start_m"), sse.alias("sse")
    )
    top = scored.orderBy("sse", "event_type", "win_start_m").limit(k)
    w_rn = Window.orderBy("sse", "event_type", "win_start_m")
    return top.withColumn("rn", F.row_number().over(w_rn).cast("bigint")).select(
        "event_type", "win_start_m", "sse", "rn"
    )


def dyadic_weighted_series(
    per: DataFrame,
    weights_by_offset: tuple[int, ...],
    divisor: float,
    out_col: str,
) -> DataFrame:
    """Exact integer-weighted trailing-window transform of a per-(type,
    minute) count series — the shared core of q_ts_ewma (geometric dyadic
    weights) and q_ts_holt_forecast (Holt l+3b dyadic coefficients), and
    of their stream-maintained twin.

    ``per``: (event_type, m, x) minute rollup (BIGINT counts — associative
    partials, so a stream-maintained store reconstructs it exactly).
    ``weights_by_offset[k]``: integer weight of the reading k minutes
    BEFORE the window end. ``divisor``: the exact power-of-two scale the
    BIGINT weighted sum is divided by (one lossless float op).

    Gap-filled spine from the series' own bounds; complete windows only
    (COUNT(*) == L). Shape: one broadcast bounds row, an L× map-side
    contribution explode of narrow rows, one grouped BIGINT sum — no
    window operator, bit-exact under any partitioning.
    """
    L = len(weights_by_offset)
    arr = "ARRAY(" + ", ".join(f"{w}L" for w in weights_by_offset) + ")"
    # `per` feeds bounds, types, AND the spine join — materialize the tiny
    # (type, minute) rollup once or its corpus upstream executes three
    # times (SCALE.md §3.4 rule).
    per = per.localCheckpoint(eager=True)
    bounds = per.agg(F.min("m").alias("mn"), F.max("m").alias("mx"))
    types = per.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(bounds)).select(
        "event_type", F.explode(F.expr("sequence(mn, mx)")).alias("m")
    )
    series = spine.join(per, ["event_type", "m"], "left").select(
        "event_type", "m", F.coalesce("x", F.lit(0).cast("bigint")).alias("x")
    )
    contrib = series.select(
        "event_type",
        "m",
        "x",
        F.explode(F.expr(f"sequence(0, {L - 1})")).alias("k"),
    ).select(
        "event_type",
        (F.col("m") + F.col("k")).alias("t"),
        F.expr(f"x * element_at({arr}, CAST(k AS INT) + 1)").alias("c"),
    )
    return (
        contrib.groupBy("event_type", "t")
        .agg(F.sum("c").alias("s"), F.count(F.lit(1)).alias("n"))
        .where(F.col("n") == L)
        .select(
            "event_type",
            F.col("t").cast("bigint").alias("win_end_m"),
            (F.col("s").cast("double") / F.lit(divisor)).alias(out_col),
        )
    )
