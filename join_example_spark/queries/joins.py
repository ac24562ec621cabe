"""§2.3 — the join surface (the heart of the reference).

KStreams analogs are noted per query: KStream⋈KTable lookup joins,
KStream⋈GlobalKTable broadcast joins, KStream⋈KStream windowed (range)
joins, and the as-of join the Kafka Streams DSL cannot express.

Scale posture: dimension joins broadcast (region/nation/supplier/part and
customer are all far below the broadcast threshold even at 100× — and at
true 100 TB, AQE demotes to shuffled joins automatically); fact-fact joins
shuffle on their equi-keys with AQE skew splitting; the range join keeps an
equality component so it never degrades to a nested loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from join_example_spark.operators.temporal import asof_join, range_join
from join_example_spark.registry import register
from join_example_spark.sources.readers import read_table


@register(
    "q_join_inner",
    oracle="""
SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
FROM orders JOIN customer ON o_custkey = c_custkey
""",
    note="KStream.join(KTable): keyed enrichment lookup",
    tags=("join",),
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    return orders.join(
        customer, orders.o_custkey == customer.c_custkey, "inner"
    ).select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")


@register(
    "q_join_left",
    oracle="""
SELECT o_orderkey, o_totalprice, l_linenumber, l_quantity
FROM orders
LEFT JOIN (SELECT * FROM lineitem WHERE l_quantity > 45.0) l
  ON o_orderkey = l_orderkey
""",
    note="KStreams leftJoin: unmatched left rows survive with NULLs",
    tags=("join",),
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 45.0)
    return orders.join(li, orders.o_orderkey == li.l_orderkey, "left").select(
        "o_orderkey", "o_totalprice", "l_linenumber", "l_quantity"
    )


@register(
    "q_join_right",
    oracle="""
SELECT o_orderkey, o_totalprice, l_linenumber, l_quantity
FROM (SELECT * FROM lineitem WHERE l_quantity > 45.0) l
RIGHT JOIN orders ON l_orderkey = o_orderkey
""",
    tags=("join",),
)
def q_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 45.0)
    return li.join(orders, li.l_orderkey == orders.o_orderkey, "right").select(
        "o_orderkey", "o_totalprice", "l_linenumber", "l_quantity"
    )


@register(
    "q_join_full",
    oracle="""
SELECT COALESCE(c.c_nationkey, s.s_nationkey) AS nationkey,
       c.n_cust, s.n_supp
FROM (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey) c
FULL JOIN (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey) s
  ON c.c_nationkey = s.s_nationkey
""",
    note="KStream.outerJoin(KStream): both sides' unmatched rows survive",
    tags=("join",),
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        read_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    supp = (
        read_table(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return cust.join(supp, cust.c_nationkey == supp.s_nationkey, "full").select(
        F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
        "n_cust",
        "n_supp",
    )


@register(
    "q_join_semi",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
""",
    tags=("join",),
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


@register(
    "q_join_anti",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
""",
    tags=("join",),
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


@register(
    "q_join_broadcast",
    oracle="""
SELECT p_brand,
       COUNT(*) AS n_items,
       CAST(SUM(CAST((l_extendedprice) AS DECIMAL(25,6))) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
""",
    note="KStream.join(GlobalKTable): replicated small dim -> explicit broadcast",
    tags=("join", "agg"),
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.expr("CAST(SUM(CAST((l_extendedprice) AS DECIMAL(25,6))) AS DOUBLE)").alias(
                "revenue"
            ),
        )
    )


@register(
    "q_join_multiway",
    oracle="""
SELECT r_name, n_name,
       COUNT(*) AS n_items,
       CAST(SUM(CAST((l_extendedprice * (1.0 - l_discount)) AS DECIMAL(25,6))) AS DOUBLE)
         AS net_revenue
FROM region
JOIN nation   ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders   ON o_custkey   = c_custkey
JOIN lineitem ON l_orderkey  = o_orderkey
GROUP BY r_name, n_name
""",
    note="5-way star join; Catalyst/AQE order & broadcast the dims",
    tags=("join", "agg"),
)
def q_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = read_table(spark, sf_dir, "region")
    nation = read_table(spark, sf_dir, "nation")
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.groupBy("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.expr(
            "CAST(SUM(CAST((l_extendedprice * (1.0 - l_discount)) AS DECIMAL(25,6))) AS DOUBLE)"
        ).alias("net_revenue"),
    )


@register(
    "q_join_theta_range",
    oracle="""
SELECT a.event_id AS view_id,
       b.event_id AS purchase_id,
       a.ts AS view_ts,
       b.ts AS purchase_ts
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND a.event_type = 'view'
 AND b.event_type = 'purchase'
 AND b.ts >= a.ts
 AND b.ts <= a.ts + INTERVAL 1 HOUR
""",
    note="KStream.join(KStream, JoinWindows.of(1h)): every pair in the window",
    tags=("join", "temporal"),
)
def q_join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    views = events.where(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("view_ts")
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    # Equality on user_id keeps this a (shuffled/broadcast) hash join with a
    # residual interval filter — never a nested loop.
    joined = views.join(
        purchases,
        (views.user_id == purchases.p_user_id)
        & (purchases.purchase_ts >= views.view_ts)
        & (purchases.purchase_ts <= F.expr("view_ts + INTERVAL 1 HOUR")),
        "inner",
    )
    return joined.select("view_id", "purchase_id", "view_ts", "purchase_ts")


@register(
    "q_join_asof",
    oracle="""
SELECT p.event_id AS purchase_id,
       p.ts AS purchase_ts,
       v.ts AS last_view_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND v.ts <= p.ts
""",
    note="the join Kafka Streams DSL can't express; DuckDB native ASOF as oracle",
    tags=("join", "temporal"),
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase, the latest prior-or-equal view by the same user.

    Only the matched *timestamp* is projected (not the right-side row id),
    so exact-timestamp ties on the right are output-invariant — required
    because DuckDB's ASOF tie-pick among equal timestamps is unspecified.
    """
    events = read_table(spark, sf_dir, "events")
    purchases = events.where(F.col("event_type") == "purchase")
    views = events.where(F.col("event_type") == "view")
    out = asof_join(
        purchases, views, on=["user_id"], left_ts="ts", right_ts="ts", how="inner"
    )
    return out.select(
        F.col("l_event_id").alias("purchase_id"),
        F.col("l_ts").alias("purchase_ts"),
        F.col("r_ts").alias("last_view_ts"),
    )


@register(
    "q_join_cross",
    oracle="SELECT r_name, n_name FROM region CROSS JOIN nation",
    tags=("join",),
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = read_table(spark, sf_dir, "region")
    nation = read_table(spark, sf_dir, "nation")
    return region.crossJoin(nation).select("r_name", "n_name")


@register(
    "q_join_salted",
    oracle="""
SELECT s.s_nationkey,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY s.s_nationkey
""",
    note="deterministically-salted fact-side join (operators/skew.py): the "
    "salt spreads hot keys over n_salt tasks; the oracle is the PLAIN join "
    "-- salting must be result-invariant, which is the whole point",
    tags=("join", "skew"),
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from join_example_spark.operators.skew import salted_join

    l = read_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_quantity", "l_orderkey", "l_linenumber"
    ).withColumnRenamed("l_suppkey", "s_suppkey")
    s = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    joined = salted_join(l, s, on="s_suppkey", salt_src="l_orderkey", n_salt=8)
    return joined.groupBy("s_nationkey").agg(
        F.expr("CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE)").alias("sum_qty"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q_scalar_subquery",
    oracle="""
SELECT o_orderkey, ROUND(o_totalprice, 4) AS totalprice
FROM orders
WHERE o_totalprice > 1.9 * (SELECT AVG(o_totalprice) FROM orders)
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 50
""",
    note="scalar subquery in a predicate (uncorrelated -> computed once and "
    "broadcast as a literal by Catalyst's subquery execution)",
    tags=("join", "subquery"),
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from join_example_spark.sources.readers import register_temp_views

    register_temp_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderkey, ROUND(o_totalprice, 4) AS totalprice
        FROM orders
        WHERE o_totalprice > 1.9 * (SELECT AVG(o_totalprice) FROM orders)
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 50
        """
    )


@register(
    "q_join_ktable",
    oracle="""
WITH v AS (
    SELECT user_id, ts, value FROM (
        SELECT user_id, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE event_type = 'view'
    ) WHERE rn = 1
), p AS (
    SELECT user_id, ts, value FROM (
        SELECT user_id, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE event_type = 'purchase'
    ) WHERE rn = 1
)
SELECT COALESCE(v.user_id, p.user_id) AS user_id,
       v.ts AS last_view_ts,
       p.ts AS last_purchase_ts,
       ROUND(COALESCE(v.value, 0.0) + COALESCE(p.value, 0.0), 4) AS combined
FROM v FULL OUTER JOIN p ON v.user_id = p.user_id
""",
    note="KTable-KTable join — the 4th Kafka Streams join flavor, closing "
    "the DSL join matrix (KStream-KStream=q_join_theta_range, KStream-"
    "KTable=stream-static demo, KStream-GlobalKTable=q_join_broadcast): "
    "both sides materialized latest-per-key, then changelog-style full outer",
    tags=("join", "streaming"),
)
def q_join_ktable(spark: SparkSession, sf_dir: str) -> DataFrame:
    from join_example_spark.operators.temporal import latest_per_key

    ev = read_table(spark, sf_dir, "events")

    def ktable(etype: str, prefix: str) -> DataFrame:
        latest = latest_per_key(
            ev.where(F.col("event_type") == etype),
            keys=["user_id"],
            ts="ts",
            tiebreak="event_id",
        )
        return latest.select(
            F.col("user_id").alias(f"{prefix}_user"),
            F.col("ts").alias(f"{prefix}_ts"),
            F.col("value").alias(f"{prefix}_value"),
        )

    v = ktable("view", "v")
    p = ktable("purchase", "p")
    joined = v.join(p, v.v_user == p.p_user, "full")
    return joined.select(
        F.coalesce("v_user", "p_user").alias("user_id"),
        F.col("v_ts").alias("last_view_ts"),
        F.col("p_ts").alias("last_purchase_ts"),
        F.round(
            F.coalesce("v_value", F.lit(0.0)) + F.coalesce("p_value", F.lit(0.0)), 4
        ).alias("combined"),
    )


@register(
    "q_join_exists_correlated",
    oracle="""
SELECT c.c_custkey, c.c_name, ROUND(c.c_acctbal, 4) AS acctbal
FROM customer c
WHERE EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_totalprice > 450000.0
      AND o.o_orderpriority = '1-URGENT'
)
""",
    note="correlated EXISTS with non-key predicates; Catalyst's "
    "RewritePredicateSubquery turns it into a left-semi hash join",
    tags=("join", "subquery"),
)
def q_join_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    from join_example_spark.sources.readers import register_temp_views

    register_temp_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name, ROUND(c.c_acctbal, 4) AS acctbal
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_totalprice > 450000.0
              AND o.o_orderpriority = '1-URGENT'
        )
        """
    )


@register(
    "q_join_asof_left",
    oracle="""
SELECT p.event_id AS purchase_id,
       p.ts AS purchase_ts,
       v.ts AS last_view_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND v.ts <= p.ts
""",
    note="as-of LEFT join: purchases with no prior view survive null-"
    "extended (the changelog-enrichment shape where missing history is "
    "data, not an error); DuckDB native ASOF LEFT JOIN as oracle",
    tags=("join", "temporal"),
)
def q_join_asof_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    purchases = events.where(F.col("event_type") == "purchase")
    views = events.where(F.col("event_type") == "view")
    out = asof_join(
        purchases, views, on=["user_id"], left_ts="ts", right_ts="ts", how="left"
    )
    return out.select(
        F.col("l_event_id").alias("purchase_id"),
        F.col("l_ts").alias("purchase_ts"),
        F.col("r_ts").alias("last_view_ts"),
    )


@register(
    "q_join_range_bucketed",
    oracle="""
SELECT a.event_id AS l_event_id,
       b.event_id AS r_event_id,
       a.ts AS l_ts,
       b.ts AS r_ts
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND b.ts >= a.ts
 AND b.ts <= a.ts + INTERVAL 1 HOUR
 AND a.event_id <> b.event_id
""",
    note="the bucketed range-join rewrite (time axis -> equi-bucket key + "
    "2-bucket explode + exact residual) declared against the PLAIN interval-"
    "join oracle: the rewrite must be result-invariant, same proof pattern "
    "as the salted join. This is the key-less-range scale plan of "
    "operators/temporal.py:range_join_bucketed",
    tags=("join", "temporal"),
)
def q_join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from join_example_spark.operators.temporal import range_join_bucketed

    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    out = range_join_bucketed(ev, ev, "ts", "ts", window_seconds=3600, on=["user_id"])
    return out.where(F.col("l_event_id") != F.col("r_event_id")).select(
        "l_event_id", "r_event_id", "l_ts", "r_ts"
    )


@register(
    "q_join_asof_tolerance",
    oracle="""
SELECT p.event_id AS purchase_id,
       p.ts AS purchase_ts,
       MAX(v.ts) AS last_view_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id
 AND v.ts <= p.ts
 AND v.ts >= p.ts - INTERVAL 30 MINUTE
GROUP BY p.event_id, p.ts
""",
    note="as-of join with a MATCH TOLERANCE (pandas merge_asof(tolerance=)/"
    "kdb wj): the latest prior view counts only if it is within 30 minutes "
    "of the purchase — the attribution-window semantics ad/retail "
    "pipelines actually need. Oracle: window-bounded join + MAX, which is "
    "equivalent because if the latest prior view is stale then every "
    "prior view is (DuckDB 1.0.0's ASOF binder rejects a second "
    "inequality, so native ASOF can't state the window). Spark side keeps "
    "the linear-merge plan of q_join_asof (|L|+|R| intermediate, skew-"
    "immune); the tolerance is a post-fill filter, not a join-condition "
    "explosion",
    tags=("join", "temporal"),
)
def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from join_example_spark.operators.temporal import asof_join

    events = read_table(spark, sf_dir, "events")
    purchases = events.where(F.col("event_type") == "purchase")
    views = events.where(F.col("event_type") == "view")
    out = asof_join(
        purchases,
        views,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        how="inner",
        tolerance="INTERVAL 30 MINUTE",
    )
    return out.select(
        F.col("l_event_id").alias("purchase_id"),
        F.col("l_ts").alias("purchase_ts"),
        F.col("r_ts").alias("last_view_ts"),
    )


def _bloom_oracle() -> str:
    from join_example_spark.operators.bloom import WORD_BITS, _pos_exprs

    n_buckets = 16
    n_bits = n_buckets * WORD_BITS
    bp1, bp2 = _pos_exprs("k", n_bits)
    pp1, pp2 = _pos_exprs("l_suppkey", n_bits)
    w = WORD_BITS
    return f"""
WITH build AS (
    SELECT DISTINCT s_suppkey AS k FROM supplier WHERE s_nationkey < 3
), pos AS (
    SELECT unnest([{bp1}, {bp2}]) AS p FROM build
), bits AS (
    SELECT p // {w} AS bucket,
           bit_or(CAST(1 AS BIGINT) << CAST(p % {w} AS INT)) AS bits
    FROM pos GROUP BY 1
), probe AS (
    SELECT l_suppkey, l_quantity, {pp1} AS bp1, {pp2} AS bp2 FROM lineitem
), passed AS (
    SELECT pr.l_suppkey, pr.l_quantity
    FROM probe pr
    JOIN bits b1 ON pr.bp1 // {w} = b1.bucket
      AND (b1.bits & (CAST(1 AS BIGINT) << CAST(pr.bp1 % {w} AS INT))) <> 0
    JOIN bits b2 ON pr.bp2 // {w} = b2.bucket
      AND (b2.bits & (CAST(1 AS BIGINT) << CAST(pr.bp2 % {w} AS INT))) <> 0
), trueset AS (
    SELECT l_suppkey, l_quantity FROM passed
    WHERE l_suppkey IN (SELECT k FROM build)
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM build) AS n_build_keys,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_probe,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM passed) AS n_bloom_pass,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM trueset) AS n_true,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM passed)
         - (SELECT CAST(COUNT(*) AS BIGINT) FROM trueset) AS n_false_pos,
       (SELECT CAST(COALESCE(SUM(CAST(l_quantity AS DECIMAL(25,6))),
                             CAST(0 AS DECIMAL(25,6))) AS DOUBLE)
        FROM trueset) AS sum_qty_true
"""


@register(
    "q_join_bloom",
    oracle=_bloom_oracle(),
    note="Bloom-filter pre-filtered semi-join, CERTIFIED lossless: the "
    "runtime-filter pattern Spark injects automatically (spark.sql."
    "optimizer.runtime.bloomFilter.*) rebuilt from portable integer "
    "arithmetic (multiply-mod positions, 62-bit words, bit_or — "
    "operators/bloom.py) so the DuckDB twin replays the filter "
    "bit-for-bit. The oracle checks BOTH the intermediate (n_bloom_pass "
    "— the filter words are cross-engine identical) and the final "
    "semi-join equality (n_true/sum — no false negatives by "
    "construction, false positives removed by the exact verify). Scale "
    "shape: the words table is n_buckets rows broadcast map-side, so "
    "probe rows that cannot match are dropped BEFORE any join shuffle — "
    "the value is at fact-fact scale where the build side exceeds the "
    "broadcast threshold but its filter does not. Sum is "
    "decimal-bridged; all counts BIGINT",
    tags=("join", "approx"),
)
def q_join_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    from join_example_spark.operators.bloom import bloom_bits, bloom_prefilter

    li = read_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_quantity")
    build = (
        read_table(spark, sf_dir, "supplier")
        .where(F.col("s_nationkey") < 3)
        .select("s_suppkey")
        .distinct()
    )
    bits = bloom_bits(build, "s_suppkey", n_buckets=16)
    passed = bloom_prefilter(li, bits, "l_suppkey", n_buckets=16)
    true_rows = passed.join(
        F.broadcast(build), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi"
    )
    a_build = build.agg(F.count(F.lit(1)).cast("bigint").alias("n_build_keys"))
    a_probe = li.agg(F.count(F.lit(1)).cast("bigint").alias("n_probe"))
    a_pass = passed.agg(F.count(F.lit(1)).cast("bigint").alias("n_bloom_pass"))
    a_true = true_rows.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_true"),
        F.expr(
            "CAST(COALESCE(SUM(CAST(l_quantity AS DECIMAL(25,6))),"
            " CAST(0 AS DECIMAL(25,6))) AS DOUBLE)"
        ).alias("sum_qty_true"),
    )
    return (
        a_build.crossJoin(a_probe)
        .crossJoin(a_pass)
        .crossJoin(a_true)
        .select(
            "n_build_keys",
            "n_probe",
            "n_bloom_pass",
            "n_true",
            (F.col("n_bloom_pass") - F.col("n_true")).alias("n_false_pos"),
            "sum_qty_true",
        )
    )
