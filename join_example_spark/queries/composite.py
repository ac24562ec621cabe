"""Composite analytical workloads — TPC-H classics adapted to the fixture
star schema (doubles instead of decimals, simplified column sets; see
FIXTURES.md).

These are the end-to-end evidence that the relational operators compose:
multi-join + filter + aggregate + top-k in one plan, with every scale rule
applied (broadcast dims, pushed filters, deterministic top-k tiebreaks,
ROUND on double aggregates for oracle bit-parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from join_example_spark.registry import register
from join_example_spark.sources.readers import read_table


@register(
    "q_tpch_q3",
    oracle="""
SELECT l.l_orderkey,
       ROUND(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,6))) AS DOUBLE), 4) AS revenue,
       o.o_orderdate,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15'
  AND l.l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
""",
    note="TPC-H Q3 shipping priority (adapted): 3-way join + agg + "
    "deterministic top-10 (revenue DESC, orderkey tiebreak)",
    tags=("composite", "join", "agg"),
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = read_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    l = read_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.expr(
                    "CAST(SUM(CAST(l_extendedprice * (1 - l_discount)"
                    " AS DECIMAL(25,6))) AS DOUBLE)"
                ),
                4,
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@register(
    "q_tpch_q5",
    oracle="""
SELECT n.n_name,
       ROUND(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,6))) AS DOUBLE), 4) AS revenue
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n.n_name
""",
    note="TPC-H Q5 local supplier volume (adapted): 6-way star join with the "
    "local-supplier (s_nationkey = c_nationkey) constraint, dims broadcast",
    tags=("composite", "join", "agg"),
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = read_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = read_table(spark, sf_dir, "nation")
    c = read_table(spark, sf_dir, "customer")
    s = read_table(spark, sf_dir, "supplier")
    o = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = read_table(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (s.s_suppkey == l.l_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.expr(
                    "CAST(SUM(CAST(l_extendedprice * (1 - l_discount)"
                    " AS DECIMAL(25,6))) AS DOUBLE)"
                ),
                4,
            ).alias("revenue")
        )
        .select("n_name", "revenue")
    )


@register(
    "q_tpch_q10",
    oracle="""
SELECT c.c_custkey,
       c.c_name,
       ROUND(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,6))) AS DOUBLE), 4) AS revenue,
       ROUND(c.c_acctbal, 4) AS acctbal,
       n.n_name
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-04-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
    note="TPC-H Q10 returned-item reporting (adapted): fact-fact join then "
    "broadcast dims, deterministic top-20",
    tags=("composite", "join", "agg"),
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    o = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    l = read_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.expr(
                    "CAST(SUM(CAST(l_extendedprice * (1 - l_discount)"
                    " AS DECIMAL(25,6))) AS DOUBLE)"
                ),
                4,
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 4).alias("acctbal"),
            "n_name",
        )
    )


@register(
    "q_tpch_q18",
    oracle="""
WITH big AS (
    SELECT l_orderkey
    FROM lineitem
    GROUP BY l_orderkey
    HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) > 150
)
SELECT c.c_custkey,
       o.o_orderkey,
       o.o_orderdate,
       ROUND(o.o_totalprice, 4) AS totalprice,
       ROUND(CAST(SUM(CAST(l.l_quantity AS DECIMAL(25,6))) AS DOUBLE), 4) AS sum_qty
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY totalprice DESC, o.o_orderkey
LIMIT 100
""",
    note="TPC-H Q18 large-volume customer (adapted): agg-derived semi-join "
    "filter (IN subquery -> left_semi) then re-aggregate",
    tags=("composite", "join", "agg", "subquery"),
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(
            F.expr("CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE)").alias("q")
        )
        .where(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        l.join(big.withColumnRenamed("l_orderkey", "b_orderkey"),
               F.col("l_orderkey") == F.col("b_orderkey"), "left_semi")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(
            F.round(
                F.expr("CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE)"), 4
            ).alias("sum_qty")
        )
        .select(
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 4).alias("totalprice"),
            "sum_qty",
        )
        # Order by the ROUNDED price exactly like the oracle: if rounding
        # collapses two near-equal doubles, both sides must fall back to the
        # orderkey tiebreak identically at the LIMIT boundary.
        .orderBy(F.col("totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@register(
    "q_tpch_q4",
    oracle="""
SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-07-01'
  AND EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  )
GROUP BY o.o_orderpriority
""",
    note="TPC-H Q4 order-priority checking (adapted: late-shipment EXISTS "
    "over shipdate vs orderdate+90d, no commitdate in fixture): correlated "
    "EXISTS -> left-semi join, then a tiny per-priority count",
    tags=("composite", "join", "agg", "subquery"),
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    from join_example_spark.sources.readers import register_temp_views

    register_temp_views(spark, sf_dir, ("orders", "lineitem"))
    return spark.sql(
        """
        SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
          AND o.o_orderdate < TIMESTAMP '1997-07-01'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
          )
        GROUP BY o.o_orderpriority
        """
    )


@register(
    "q_tpch_q14",
    oracle="""
SELECT ROUND(
         100.0 * CAST(SUM(CAST(CASE WHEN p.p_type = 'PROMO'
                                    THEN l.l_extendedprice * (1 - l.l_discount)
                                    ELSE 0.0 END AS DECIMAL(25,6))) AS DOUBLE)
               / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(25,6))) AS DOUBLE),
         4) AS promo_revenue_pct
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
  AND l.l_shipdate < TIMESTAMP '1997-04-01'
""",
    note="TPC-H Q14 promotion effect: one month of lineitem joined to a "
    "broadcast part dim, conditional-vs-total revenue ratio. Both sums go "
    "through the exact-decimal bridge; the single IEEE division and the "
    "100.0 scaling run on identical operands both sides",
    tags=("composite", "join", "agg"),
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = read_table(spark, sf_dir, "part")
    l = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    return (
        l.join(F.broadcast(p), p.p_partkey == l.l_partkey)
        .agg(
            F.expr(
                "CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'"
                " THEN l_extendedprice * (1 - l_discount)"
                " ELSE 0.0 END AS DECIMAL(25,6))) AS DOUBLE)"
            ).alias("promo"),
            F.expr(
                "CAST(SUM(CAST(l_extendedprice * (1 - l_discount)"
                " AS DECIMAL(25,6))) AS DOUBLE)"
            ).alias("total"),
        )
        .select(
            F.round(F.lit(100.0) * F.col("promo") / F.col("total"), 4).alias(
                "promo_revenue_pct"
            )
        )
    )


@register(
    "q_tpch_q19",
    oracle="""
SELECT ROUND(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,6))) AS DOUBLE), 4) AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 15)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25 AND l.l_quantity BETWEEN 10 AND 25)
   OR (p.p_brand = 'Brand#3'  AND p.p_size BETWEEN 1 AND 35 AND l.l_quantity BETWEEN 20 AND 35)
""",
    note="TPC-H Q19 discounted revenue (adapted: brand/size/quantity "
    "branches, no container/shipmode in fixture): disjunction of "
    "conjunctive predicates spanning both join sides — the equi-join on "
    "partkey still extracts cleanly (hash join, not nested-loop) and the "
    "OR-of-ANDs runs as a post-join filter; part is broadcast",
    tags=("composite", "join", "agg"),
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = read_table(spark, sf_dir, "part")
    l = read_table(spark, sf_dir, "lineitem")
    j = l.join(F.broadcast(p), p.p_partkey == l.l_partkey)
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 15)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 25)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 35)
        )
    )
    return j.where(branch).agg(
        F.round(
            F.expr(
                "CAST(SUM(CAST(l_extendedprice * (1 - l_discount)"
                " AS DECIMAL(25,6))) AS DOUBLE)"
            ),
            4,
        ).alias("revenue")
    )


@register(
    "q_tpch_q22",
    oracle="""
SELECT CAST(c.c_custkey % 10 AS BIGINT) AS code_digit,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       ROUND(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(25,6))) AS DOUBLE), 4) AS totacctbal
FROM customer c
WHERE c.c_custkey % 10 IN (1, 3, 5, 7, 9)
  AND c.c_acctbal > (
      SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(25,6))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE)
      FROM customer c2
      WHERE c2.c_acctbal > 0.0 AND c2.c_custkey % 10 IN (1, 3, 5, 7, 9)
  )
  AND NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000.0
  )
GROUP BY c.c_custkey % 10
""",
    note="TPC-H Q22 global sales opportunity (adapted: custkey digit for "
    "phone prefix, 'no 450k+ order' for 'no order' since every fixture "
    "customer has orders): scalar AVG subquery (computed once, broadcast "
    "as literal) + NOT EXISTS anti-join + small grouped agg. AVG is the "
    "decimal-exact sum over an exact count — one IEEE division both sides",
    tags=("composite", "join", "agg", "subquery"),
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    from join_example_spark.sources.readers import register_temp_views

    register_temp_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        """
        SELECT CAST(c.c_custkey % 10 AS BIGINT) AS code_digit,
               CAST(COUNT(*) AS BIGINT) AS numcust,
               ROUND(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(25,6))) AS DOUBLE), 4) AS totacctbal
        FROM customer c
        WHERE c.c_custkey % 10 IN (1, 3, 5, 7, 9)
          AND c.c_acctbal > (
              SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(25,6))) AS DOUBLE)
                     / CAST(COUNT(*) AS DOUBLE)
              FROM customer c2
              WHERE c2.c_acctbal > 0.0 AND c2.c_custkey % 10 IN (1, 3, 5, 7, 9)
          )
          AND NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000.0
          )
        GROUP BY c.c_custkey % 10
        """
    )
