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

    Plan shape: equi-join on keys (shuffle or broadcast, Catalyst's choice)
    + residual ``<=`` filter + per-left-row ``row_number() = 1``. At 100 TB
    the join keys partition the work; the window is per-left-row so the
    row_number shuffle reuses the join partitioning. Requires a unique left
    row id column named ``_asof_lid`` to exist or be constructible from
    ``left`` (we build one with monotonically_increasing_id when absent —
    callers that need oracle-grade determinism should pre-project a unique
    key and pass deterministic columns only).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"asof_join supports how='inner'|'left', got {how!r}")
    l = left.select([F.col(c).alias(f"l_{c}") for c in left.columns]).withColumn(
        "_asof_lid", F.monotonically_increasing_id()
    )
    r = right.select([F.col(c).alias(f"r_{c}") for c in right.columns])
    cond = None
    for k in on:
        c = F.col(f"l_{k}") == F.col(f"r_{k}")
        cond = c if cond is None else (cond & c)
    ts_cond = F.col(f"r_{right_ts}") <= F.col(f"l_{left_ts}")
    if tolerance is not None:
        ts_cond = ts_cond & (
            F.col(f"r_{right_ts}") >= F.expr(f"l_{left_ts} - {tolerance}")
        )
    cond = ts_cond if cond is None else (cond & ts_cond)
    joined = l.join(r, cond, how)
    # Deterministic tie-pick: after the timestamp, every remaining right
    # column (stable order) breaks exact-ts ties the same way on every run
    # and partitioning.
    tie_cols = [
        F.col(f"r_{c}").desc()
        for c in right.columns
        if c != right_ts
    ]
    w = Window.partitionBy("_asof_lid").orderBy(
        F.col(f"r_{right_ts}").desc(), *tie_cols
    )
    picked = (
        joined.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_asof_lid")
    )
    return picked


def latest_per_key(
    df: DataFrame, keys: list[str], ts: str, tiebreak: str
) -> DataFrame:
    """KTable materialization: latest row per key (deterministic tiebreak).

    ``builder.table(topic)`` / ``reduce((a,b) -> b)`` in Kafka Streams. At
    scale this is one hash shuffle on ``keys``; no global sort.
    """
    w = Window.partitionBy(*keys).orderBy(F.col(ts).desc(), F.col(tiebreak).desc())
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")
