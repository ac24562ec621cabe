"""§2.4 — aggregations.

KStreams analogs: ``groupByKey().aggregate`` / ``count`` / ``reduce``; the
latest-per-key query is the KTable materialization (``builder.table``).

Determinism: every SUM/AVG over doubles goes through the decimal-sum bridge
(exact, order-independent — see ``join_example_spark.functions``), so the
2-phase partial/final hash aggregation Spark picks can't perturb results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from join_example_spark.operators.temporal import latest_per_key
from join_example_spark.registry import register
from join_example_spark.sources.readers import (
    fanout_repartition,
    read_table,
    register_temp_views,
)


@register(
    "q_agg_global",
    oracle="""
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST((l_quantity) AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST((l_extendedprice) AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS avg_price,
       MIN(l_extendedprice) AS min_price,
       MAX(l_extendedprice) AS max_price,
       MIN(l_shipdate) AS first_ship,
       MAX(l_shipdate) AS last_ship
FROM lineitem
""",
    tags=("agg",),
)
def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("CAST(SUM(CAST((l_quantity) AS DECIMAL(25,6))) AS DOUBLE)").alias("sum_qty"),
        F.expr(
            "CAST(SUM(CAST((l_extendedprice) AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*)"
        ).alias("avg_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


@register(
    "q_agg_group",
    oracle="""
SELECT l_returnflag,
       l_linestatus,
       CAST(SUM(CAST((l_quantity) AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST((l_extendedprice) AS DECIMAL(25,6))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST((l_extendedprice * (1.0 - l_discount)) AS DECIMAL(25,6))) AS DOUBLE)
         AS sum_disc_price,
       CAST(SUM(CAST((l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)) AS DECIMAL(25,6))) AS DOUBLE)
         AS sum_charge,
       CAST(SUM(CAST((l_quantity) AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST((l_extendedprice) AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST((l_discount) AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    note="TPC-H Q1-shaped pricing summary (8 aggregates, 2-phase hash agg)",
    tags=("agg",),
)
def q_agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = fanout_repartition(read_table(spark, sf_dir, "lineitem")).where(
        F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp")
    )
    dec = "CAST(SUM(CAST(({e}) AS DECIMAL(25,6))) AS DOUBLE)"
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.expr(dec.format(e="l_quantity")).alias("sum_qty"),
        F.expr(dec.format(e="l_extendedprice")).alias("sum_base_price"),
        F.expr(dec.format(e="l_extendedprice * (1.0 - l_discount)")).alias("sum_disc_price"),
        F.expr(dec.format(e="l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")).alias(
            "sum_charge"
        ),
        F.expr(dec.format(e="l_quantity") + " / COUNT(*)").alias("avg_qty"),
        F.expr(dec.format(e="l_extendedprice") + " / COUNT(*)").alias("avg_price"),
        F.expr(dec.format(e="l_discount") + " / COUNT(*)").alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "q_agg_distinct",
    oracle="""
SELECT COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps,
       CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_distinct_qty
FROM lineitem
""",
    tags=("agg",),
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.expr("CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE)").alias(
            "sum_distinct_qty"
        ),
    )


@register(
    "q_agg_approx_distinct",
    oracle="""
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       TRUE AS hll_within_tol
FROM events
GROUP BY event_type
""",
    note="HLL distinct counting, certified by exact-anchor + tolerance "
    "audit (round-3 verdict item 4): HLL values themselves are engine-"
    "specific (Spark's HLL++ vs anything DuckDB runs), so the certified "
    "outputs are the EXACT distinct counts, and the sketch is pinned by "
    "hll_within_tol = |approx - exact| / exact <= 0.05, which the oracle "
    "asserts literally. At rsd=0.01 the measured error is <= 0.7% at every "
    "fixture SF (5% tolerance is a >7-sigma margin), so a red driver row "
    "here means the HLL estimate genuinely broke, loudly. At 100 TB the "
    "exact anchor drops out and approx_count_distinct stands alone — "
    "mergeable, one pass, bounded memory. Plan shape (round 11): "
    "TWO-LEVEL aggregate (dedup on (type, user) with per-user counts, "
    "then count/sum/HLL over deduped rows) instead of "
    "countDistinct-beside-regular-aggs — the expand-based plan was "
    "~2x slower at sf0.1 (family envelope 1.5-3.0 s vs 1.8-2.5 s; "
    "medians, not cool draws) for bit-identical output (HLL depends "
    "only on the value SET; outer count(user_id) drops the NULL-user "
    "group exactly like COUNT(DISTINCT)), and halves shuffle volume "
    "at scale",
    tags=("agg", "approx"),
)
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    per_user = events.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("_n")
    )
    return (
        per_user.groupBy("event_type")
        .agg(
            # count(user_id), not count(1): a NULL user_id forms its own
            # per-user group, and COUNT(DISTINCT user_id) / HLL both ignore
            # NULLs — count(col) drops that group so the equivalence is
            # unconditional, not contingent on fixture non-nullability
            # (ADVICE r11).
            F.count(F.col("user_id")).cast("bigint").alias("n_users"),
            F.sum("_n").cast("bigint").alias("n_events"),
            F.approx_count_distinct("user_id", rsd=0.01).alias("_hll"),
        )
        .select(
            "event_type",
            "n_users",
            "n_events",
            (
                F.abs(F.col("_hll") - F.col("n_users"))
                / F.greatest(F.col("n_users"), F.lit(1)).cast("double")
                <= F.lit(0.05)
            ).alias("hll_within_tol"),
        )
    )


@register(
    "q_agg_rollup",
    oracle="""
SELECT r_name, n_name,
       COUNT(*) AS n_cust,
       CAST(SUM(CAST((c_acctbal) AS DECIMAL(25,6))) AS DOUBLE) AS sum_bal,
       CAST(GROUPING(r_name) AS BIGINT) AS grp_r,
       CAST(GROUPING(n_name) AS BIGINT) AS grp_n
FROM region
JOIN nation   ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
GROUP BY ROLLUP (r_name, n_name)
""",
    tags=("agg",),
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = read_table(spark, sf_dir, "region")
    nation = read_table(spark, sf_dir, "nation")
    customer = read_table(spark, sf_dir, "customer")
    base = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return base.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.expr("CAST(SUM(CAST((c_acctbal) AS DECIMAL(25,6))) AS DOUBLE)").alias("sum_bal"),
        F.grouping("r_name").cast("bigint").alias("grp_r"),
        F.grouping("n_name").cast("bigint").alias("grp_n"),
    )


@register(
    "q_agg_cube",
    oracle="""
SELECT event_type, user_id,
       COUNT(*) AS n,
       CAST(SUM(CAST((value) AS DECIMAL(25,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY CUBE (event_type, user_id)
""",
    tags=("agg",),
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    return events.cube("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("CAST(SUM(CAST((value) AS DECIMAL(25,6))) AS DOUBLE)").alias("total_value"),
    )


@register(
    "q_agg_groupingsets",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n,
       CAST(SUM(CAST((o_totalprice) AS DECIMAL(25,6))) AS DOUBLE) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
""",
    note="explicit grouping sets via the SQL path (ANTLR parse -> same planner)",
    tags=("agg", "sql"),
)
def q_agg_groupingsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_temp_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n,
               CAST(SUM(CAST((o_totalprice) AS DECIMAL(25,6))) AS DOUBLE) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        """
    )


@register(
    "q_agg_having",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
HAVING COUNT(*) > 100
""",
    tags=("agg",),
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .where(F.col("n_orders") > 100)
    )


@register(
    "q_agg_latest_per_key",
    oracle="""
SELECT user_id, event_id, ts, event_type, value
FROM (
    SELECT user_id, event_id, ts, event_type, value,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
)
WHERE rn = 1
""",
    note="KTable materialization: builder.table(topic) — latest value per key",
    tags=("agg", "temporal"),
)
def q_agg_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    latest = latest_per_key(events, keys=["user_id"], ts="ts", tiebreak="event_id")
    return latest.select("user_id", "event_id", "ts", "event_type", "value")


@register(
    "q_agg_filter_clause",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n_total,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_final,
       COUNT(*) FILTER (WHERE o_totalprice > 250000.0) AS n_big,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6)))
            FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS total_final
FROM orders
GROUP BY o_orderpriority
""",
    note="SQL-standard FILTER clause (conditional aggregation without CASE "
    "scaffolding); one pass, one shuffle, N conditions",
    tags=("agg", "filter"),
)
def q_agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_temp_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_total,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_final,
               COUNT(*) FILTER (WHERE o_totalprice > 250000.0) AS n_big,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6)))
                    FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS total_final
        FROM orders
        GROUP BY o_orderpriority
        """
    )


@register(
    "q_agg_any_all",
    oracle="""
SELECT l_returnflag,
       bool_and(l_quantity > 1.0) AS all_multi,
       bool_or(l_discount > 0.09) AS any_deep_discount,
       bool_and(l_shipdate >= TIMESTAMP '1995-01-01') AS all_after_95
FROM lineitem
GROUP BY l_returnflag
""",
    note="boolean aggregates (every/any): order-insensitive by algebra",
    tags=("agg", "bool"),
)
def q_agg_any_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("bool_and(l_quantity > 1.0)").alias("all_multi"),
        F.expr("bool_or(l_discount > 0.09)").alias("any_deep_discount"),
        F.expr("bool_and(l_shipdate >= TIMESTAMP '1995-01-01')").alias("all_after_95"),
    )
