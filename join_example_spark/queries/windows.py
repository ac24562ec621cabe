"""§2.5 — analytic window functions (batch).

Ranking/frame determinism: every ORDER BY inside a window carries a unique
tiebreak column; running SUMs over doubles go through the decimal bridge so
frame evaluation order can't perturb them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from join_example_spark.registry import register
from join_example_spark.sources.readers import read_table


@register(
    "q_win_rank",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
       CAST(RANK()       OVER w AS BIGINT) AS rnk,
       CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
""",
    tags=("window",),
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
    )


@register(
    "q_win_topk_per_group",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
    FROM orders
)
WHERE rn <= 3
""",
    note="top-3 orders per customer — rank-filter pattern (no global sort)",
    tags=("window",),
)
def q_win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "q_win_running",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_total,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
         / (CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE))
         AS moving_avg3,
       CAST(COUNT(*) OVER (PARTITION BY o_custkey
                           ORDER BY CAST(datediff('day', DATE '1995-01-01',
                                                  CAST(o_orderdate AS DATE)) AS BIGINT)
                           RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS BIGINT)
         AS n_orders_30d
FROM orders
""",
    note="rows frames (running/moving) + numeric range frame (30-day count)",
    tags=("window",),
)
def q_win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders").withColumn(
        "_days", F.expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1995-01-01') AS BIGINT)")
    )
    w_rows = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_run = w_rows.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_mov = w_rows.rowsBetween(-2, Window.currentRow)
    w_range = Window.partitionBy("o_custkey").orderBy("_days").rangeBetween(-30, 0)
    dec_price = F.expr("CAST(o_totalprice AS DECIMAL(25,6))")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(dec_price).over(w_run).cast("double").alias("running_total"),
        (
            F.sum(dec_price).over(w_mov).cast("double")
            / F.count(F.lit(1)).over(w_mov).cast("double")
        ).alias("moving_avg3"),
        F.count(F.lit(1)).over(w_range).cast("bigint").alias("n_orders_30d"),
    )


@register(
    "q_win_lead_lag",
    oracle="""
SELECT user_id, event_id, ts,
       epoch_us(ts) - epoch_us(LAG(ts) OVER w) AS gap_us,
       LEAD(event_type) OVER w AS next_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    note="inter-event gap per user (LAG) + next event type (LEAD)",
    tags=("window", "temporal"),
)
def q_win_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "user_id",
        "event_id",
        "ts",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@register(
    "q_win_ntile_percent",
    oracle="""
SELECT c_custkey, c_acctbal,
       CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
       PERCENT_RANK() OVER w AS pr,
       CUME_DIST() OVER w AS cd
FROM customer
WINDOW w AS (ORDER BY c_acctbal, c_custkey)
""",
    tags=("window",),
)
def q_win_ntile_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_table(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return customer.select(
        "c_custkey",
        "c_acctbal",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


@register(
    "q_win_first_last",
    oracle="""
SELECT event_id, user_id,
       first_value(event_type) OVER w AS first_type,
       last_value(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type,
       nth_value(event_type, 2) OVER w AS second_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    note="first_value/last_value/nth_value; last_value needs the explicit "
    "unbounded-following frame (the default frame stops at CURRENT ROW -- "
    "classic silent-wrong-answer trap, identical in both engines)",
    tags=("window",),
)
def q_win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "event_id",
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w_full).alias("last_type"),
        F.nth_value("event_type", 2).over(w).alias("second_type"),
    )


@register(
    "q_win_time_range",
    oracle="""
SELECT event_id, user_id, ts,
       COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
           AS n_last_hour,
       CAST(SUM(CAST(value AS DECIMAL(25,6)))
            OVER (PARTITION BY user_id ORDER BY ts
                  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS sum_last_hour
FROM events
""",
    note="time-interval RANGE frame (trailing 1-hour per-user stats) — the "
    "sliding-aggregate idiom for sensor/event data, no self-join needed",
    tags=("window", "temporal"),
)
def q_win_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    from join_example_spark.sources.readers import register_temp_views

    register_temp_views(spark, sf_dir, ("events",))
    return spark.sql(
        """
        SELECT event_id, user_id, ts,
               COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                              RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                                        AND CURRENT ROW) AS n_last_hour,
               CAST(SUM(CAST(value AS DECIMAL(25,6)))
                    OVER (PARTITION BY user_id ORDER BY ts
                          RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                                    AND CURRENT ROW) AS DOUBLE) AS sum_last_hour
        FROM events
        """
    )


@register(
    "q_scd2_intervals",
    oracle="""
SELECT user_id, event_id,
       ts AS valid_from,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
       (LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL)
           AS is_current,
       value
FROM events
WHERE event_type = 'purchase'
""",
    note="SCD-2 validity intervals: each per-user state version is valid "
    "[ts, next ts); the open (current) version has NULL valid_to — the "
    "standard warehouse dimension-history build, one window pass",
    tags=("window", "temporal", "scd"),
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        "event_id",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
        "value",
    )


@register(
    "q_win_sliding_distinct",
    oracle="""
SELECT event_id, event_type,
       CAST(COUNT(DISTINCT user_id) OVER (
           PARTITION BY event_type ORDER BY ts
           RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS n_users_1h
FROM events
""",
    note="EXPLICITLY-LABELED EXACT BASELINE (tagged in round 5; the "
    "family DEFAULT is q_win_sliding_distinct_hll): sliding DISTINCT "
    "count -- distinct users per event type over the trailing hour, "
    "evaluated AT every event (the live-audience metric). Spark has no "
    "DISTINCT window aggregate; the rewrite is "
    "size(array_distinct(collect_list(user_id))) over a RANGE frame on "
    "unix_micros (microsecond-exact, matching DuckDB's INTERVAL frame "
    "inclusively). Exact integers -- no float bridge needed. WHY it is "
    "a baseline, not the default: PARTITION BY a low-cardinality "
    "event_type serializes each type into one task and the collect_list "
    "frame buffers the trailing hour of raw user_ids -- per-row frame "
    "work grows with stream density (measured 7.5x on the 8x probe, "
    "SCALE.md §3.3 -- densify-and-die). Kept as the exact semantics the "
    "HLL route is audited against; do not ship this shape at scale",
    tags=("window", "temporal", "baseline"),
)
def q_win_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "event_type",
        F.size(F.array_distinct(F.collect_list("user_id").over(w)))
        .cast("bigint")
        .alias("n_users_1h"),
    )


@register(
    "q_win_sliding_distinct_hll",
    oracle="""
WITH tmu AS (
    SELECT DISTINCT event_type,
           epoch_us(ts) // 60000000 AS minute,
           user_id
    FROM events
)
SELECT DISTINCT event_type,
       CAST(minute AS BIGINT) AS minute,
       CAST(COUNT(DISTINCT user_id) OVER (
           PARTITION BY event_type ORDER BY minute
           RANGE BETWEEN 59 PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS n_users_1h,
       TRUE AS hll_within_tol
FROM tmu
""",
    note="the sliding-distinct family DEFAULT (since round 5) -- the "
    "100 TB rewrite of the q_win_sliding_distinct exact baseline: "
    "per-(type, minute) HLL partials (DataSketches "
    "hll_sketch_agg, lgK=12) merged over a trailing-60-minute window with "
    "hll_union_agg -- the window frame carries BOUNDED sketches instead "
    "of raw user arrays, so frame memory is O(minutes x 4KB) regardless "
    "of traffic, and the pre-aggregation shrinks the window input from "
    "events to (type, minute) rows. Certified by the exact-anchor + "
    "tolerance pattern: the exact trailing-hour distinct count (via "
    "per-minute user sets, flattened and deduped) anchors the oracle, "
    "and |hll - exact|/exact <= 0.05 is the audit boolean asserted "
    "literally (lgK=12 rsd ~1.6%). Evaluated per active minute rather "
    "than per event -- the dashboard granularity that makes the "
    "pre-aggregation legal",
    tags=("window", "temporal", "approx"),
)
def q_win_sliding_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    per_min = (
        ev.select(
            "event_type",
            (F.unix_micros("ts") / F.lit(60_000_000)).cast("bigint").alias("minute"),
            "user_id",
        )
        .groupBy("event_type", "minute")
        .agg(
            F.expr("hll_sketch_agg(user_id, 12)").alias("sk"),
            F.collect_set("user_id").alias("us"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("minute")
        .rangeBetween(-59, 0)
    )
    return per_min.select(
        "event_type",
        "minute",
        F.expr(
            "CAST(size(array_distinct(flatten(collect_list(us) OVER ("
            "PARTITION BY event_type ORDER BY minute"
            " RANGE BETWEEN 59 PRECEDING AND CURRENT ROW)))) AS BIGINT)"
        ).alias("n_users_1h"),
        (
            F.abs(
                F.expr(
                    "hll_sketch_estimate(hll_union_agg(sk, true) OVER ("
                    "PARTITION BY event_type ORDER BY minute"
                    " RANGE BETWEEN 59 PRECEDING AND CURRENT ROW))"
                )
                - F.expr(
                    "size(array_distinct(flatten(collect_list(us) OVER ("
                    "PARTITION BY event_type ORDER BY minute"
                    " RANGE BETWEEN 59 PRECEDING AND CURRENT ROW))))"
                )
            )
            / F.greatest(
                F.expr(
                    "size(array_distinct(flatten(collect_list(us) OVER ("
                    "PARTITION BY event_type ORDER BY minute"
                    " RANGE BETWEEN 59 PRECEDING AND CURRENT ROW))))"
                ),
                F.lit(1),
            ).cast("double")
            <= F.lit(0.05)
        ).alias("hll_within_tol"),
    )
