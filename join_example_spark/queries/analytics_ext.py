"""Extended analytics surface: pivot, exact percentiles, statistical
aggregates, ordered string aggregation, positional explode.

Determinism notes mirror §5.3 of SURVEY.md: collect_list order is
partition-dependent, so every list aggregate is sorted before use; Spark's
0-based posexplode is aligned to DuckDB's 1-based generate_subscripts
explicitly; statistical moments are rounded after exact-enough accumulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from join_example_spark.registry import register
from join_example_spark.sources.readers import read_table


@register(
    "q_pivot",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_linestatus = 'F'
                THEN CAST(l_quantity AS DECIMAL(25,6)) END) AS DOUBLE) AS qty_f,
       CAST(SUM(CASE WHEN l_linestatus = 'O'
                THEN CAST(l_quantity AS DECIMAL(25,6)) END) AS DOUBLE) AS qty_o,
       CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
       CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o
FROM lineitem
GROUP BY l_returnflag
""",
    note="pivot on an explicit value list (implicit pivot would scan twice "
    "for distinct values); decimal accumulation for order-independence",
    tags=("agg", "pivot"),
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    # Explicit pivot values: no extra distinct-scan, stable column order.
    piv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            F.expr("CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE)").alias("qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return piv.select(
        "l_returnflag",
        F.col("F_qty").alias("qty_f"),
        F.col("O_qty").alias("qty_o"),
        F.coalesce("F_n", F.lit(0)).cast("bigint").alias("n_f"),
        F.coalesce("O_n", F.lit(0)).cast("bigint").alias("n_o"),
    )


@register(
    "q_agg_percentile",
    oracle="""
SELECT l_returnflag,
       ROUND(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
       ROUND(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
       ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99_price
FROM lineitem
GROUP BY l_returnflag
""",
    note="exact linear-interpolation percentiles (Spark percentile() == "
    "DuckDB quantile_cont); the scale path is approx_percentile — a "
    "mergeable sketch — declared separately as rows-only",
    tags=("agg", "percentile"),
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("p50_qty"),
        F.round(F.expr("percentile(l_quantity, 0.9)"), 4).alias("p90_qty"),
        F.round(F.expr("percentile(l_extendedprice, 0.99)"), 4).alias("p99_price"),
    )


@register(
    "q_agg_approx_percentile",
    oracle="""
SELECT l_returnflag,
       quantile_disc(l_extendedprice, 0.5) AS p50_price,
       quantile_disc(l_extendedprice, 0.9) AS p90_price,
       quantile_disc(l_extendedprice, 0.99) AS p99_price
FROM lineitem
GROUP BY l_returnflag
""",
    note="approx_percentile: the mergeable-sketch percentile path that "
    "replaces exact percentile() at 100 TB (single pass, bounded memory). "
    "Certified via the q_agg_approx_topk pattern — run the sketch in the "
    "regime where it is provably EXACT: the GK guarantee bounds rank error "
    "by N/accuracy, so accuracy=10^7 >> any per-group N at oracle SFs makes "
    "the error < 1 rank and the sketch returns the true discrete quantile "
    "(== DuckDB quantile_disc, verified element-identical on all groups). "
    "GK memory is O(min(N, accuracy log N)) so the exact regime is safe "
    "locally; at 100 TB the same expression with production accuracy "
    "(10^4) degrades gracefully to the documented epsilon guarantee. "
    "Output cells are raw data elements both sides — bit-identical, no "
    "rounding bridge needed. The sketch array is unpacked with element_at "
    "(driver canonicalizer needs flat scalars)",
    tags=("agg", "percentile", "approx"),
)
def q_agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    sketched = li.groupBy("l_returnflag").agg(
        F.expr(
            "approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99), 10000000)"
        ).alias("price_quantiles")
    )
    # Scalar projection: rows-only checks still canonicalize the output, and
    # pandas sort_values chokes on list cells — emit scalars, never arrays.
    return sketched.select(
        "l_returnflag",
        F.element_at("price_quantiles", 1).alias("p50_price"),
        F.element_at("price_quantiles", 2).alias("p90_price"),
        F.element_at("price_quantiles", 3).alias("p99_price"),
    )


@register(
    "q_agg_stats",
    oracle="""
SELECT o_orderpriority,
       ROUND(stddev_samp(o_totalprice), 2) AS sd_price,
       ROUND(var_samp(o_totalprice), 1) AS var_price,
       ROUND(corr(o_totalprice, o_custkey), 4) AS corr_price_cust,
       ROUND(covar_samp(o_totalprice, o_custkey), 1) AS covar_price_cust
FROM orders
GROUP BY o_orderpriority
""",
    note="statistical moments (stddev/var/corr/covar); both engines use "
    "numerically-stable one-pass accumulators, rounded to absorb the "
    "last-ulp merge-order difference",
    tags=("agg", "stats"),
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.stddev_samp("o_totalprice"), 2).alias("sd_price"),
        F.round(F.var_samp("o_totalprice"), 1).alias("var_price"),
        F.round(F.corr("o_totalprice", "o_custkey"), 4).alias("corr_price_cust"),
        F.round(F.covar_samp("o_totalprice", "o_custkey"), 1).alias("covar_price_cust"),
    )


@register(
    "q_agg_string_agg",
    oracle="""
SELECT n.n_regionkey,
       string_agg(n.n_name, '|' ORDER BY n.n_name) AS nations
FROM nation n
GROUP BY n.n_regionkey
""",
    note="ordered string aggregation: collect_list is partition-order-"
    "dependent, so it is array_sort'ed before joining — the only "
    "deterministic form of string_agg on a distributed engine",
    tags=("agg", "string"),
)
def q_agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = read_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), "|").alias("nations")
    )


@register(
    "q_explode_pos",
    oracle="""
WITH toks AS (
    SELECT p_partkey, str_split(p_name, ' ') AS t
    FROM part
    WHERE p_partkey <= 100
)
SELECT p_partkey,
       CAST(generate_subscripts(t, 1) - 1 AS INTEGER) AS pos,
       unnest(t) AS tok
FROM toks
""",
    note="posexplode / lateral flatten with positions; DuckDB's 1-based "
    "subscripts shifted to Spark's 0-based pos",
    tags=("fn", "explode"),
)
def q_explode_pos(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = read_table(spark, sf_dir, "part").where(F.col("p_partkey") <= 100)
    return p.select(
        "p_partkey", F.posexplode(F.split("p_name", " ")).alias("pos", "tok")
    )


@register(
    "q_unpivot",
    oracle="""
SELECT l_orderkey, l_linenumber, metric, ROUND(value, 4) AS value
FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
      FROM lineitem WHERE l_orderkey <= 100)
UNPIVOT (value FOR metric IN (l_quantity, l_extendedprice, l_discount))
""",
    note="unpivot/melt — wide metric columns to long (metric, value) rows; "
    "the inverse of q_pivot, a pure row-local transform (no shuffle). "
    "NULL values filtered explicitly: Spark unpivot KEEPS them while SQL "
    "UNPIVOT drops them — aligned by the IS NOT NULL",
    tags=("reshape",),
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        read_table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") <= 100)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")
    )
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="metric",
        valueColumnName="v",
    ).where(F.col("v").isNotNull()).select(
        "l_orderkey", "l_linenumber", "metric", F.round("v", 4).alias("value")
    )


@register(
    "q_histogram",
    oracle="""
SELECT CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT) AS bin,
       COUNT(*) AS n,
       ROUND(MIN(o_totalprice), 4) AS lo,
       ROUND(MAX(o_totalprice), 4) AS hi
FROM orders
GROUP BY 1
""",
    note="fixed-width numeric histogram via floor-binning (portable — no "
    "width_bucket in DuckDB 1.0); one hash-agg shuffle regardless of "
    "bin count",
    tags=("agg", "histogram"),
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.expr("CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT)").alias("bin")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 4).alias("lo"),
            F.round(F.max("o_totalprice"), 4).alias("hi"),
        )
    )


@register(
    "q_lateral_topk",
    oracle="""
SELECT c.c_custkey, o.o_orderkey, ROUND(o.o_totalprice, 4) AS totalprice
FROM customer c, LATERAL (
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_custkey = c.c_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 2
) o
WHERE c.c_custkey <= 200
""",
    note="correlated LATERAL subquery with per-row ORDER BY/LIMIT — the "
    "SQL-standard spelling of top-k-per-group (same result as the window "
    "formulation, different plan: Catalyst decorrelates to a ranked join)",
    tags=("join", "subquery", "lateral"),
)
def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from join_example_spark.sources.readers import register_temp_views

    register_temp_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, ROUND(o.o_totalprice, 4) AS totalprice
        FROM customer c, LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM orders
            WHERE o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 2
        ) o
        WHERE c.c_custkey <= 200
        """
    )


@register(
    "q_gaps_islands",
    oracle="""
WITH e AS (
    SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
), m AS (
    SELECT user_id, event_id, ts_us,
           CASE WHEN LAG(ts_us) OVER w IS NULL
                  OR ts_us - LAG(ts_us) OVER w > 3600000000
                THEN 1 ELSE 0 END AS is_new
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
), i AS (
    SELECT user_id, ts_us,
           SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS island_id
    FROM m
)
SELECT user_id, CAST(island_id AS BIGINT) AS island_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(ts_us) AS start_us, MAX(ts_us) AS end_us
FROM i GROUP BY user_id, island_id
""",
    note="gaps-and-islands sessionization (1 h inactivity gap): lag-marker + "
    "running-sum island ids, then per-island rollup. One shuffle on user_id "
    "feeds both windows; the final groupBy aggregates already-collapsed "
    "islands (map-side combine), so it moves island counts, not events. "
    "Epoch-microsecond arithmetic keeps both engines in exact integer math.",
    tags=("window", "sessionize"),
)
def q_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    marked = ev.withColumn(
        "is_new",
        F.when(
            F.lag("ts_us").over(w).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(w) > 3_600_000_000),
            1,
        ).otherwise(0),
    )
    islands = marked.withColumn(
        "island_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return islands.groupBy("user_id", F.col("island_id").cast("bigint").alias("island_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
    )


@register(
    "q_profile_columns",
    oracle="""
SELECT 'event_type' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT(event_type) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_distinct
FROM events
UNION ALL
SELECT 'props', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) - COUNT(props) AS BIGINT),
       CAST(COUNT(DISTINCT props) AS BIGINT)
FROM events
UNION ALL
SELECT 'user_id', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) - COUNT(user_id) AS BIGINT),
       CAST(COUNT(DISTINCT user_id) AS BIGINT)
FROM events
UNION ALL
SELECT 'value', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) - COUNT(value) AS BIGINT),
       CAST(COUNT(DISTINCT value) AS BIGINT)
FROM events
""",
    note="one-pass column profiling (null count + exact distinct per column, "
    "melted to long form): the Spark side computes every column's stats in "
    "a SINGLE aggregate — Catalyst's Expand handles the multi-distinct — "
    "so the table is scanned once, where the oracle's naive UNION ALL "
    "formulation scans once per column. Same result, different plan: "
    "that asymmetry is the point at 100 TB",
    tags=("agg", "profile"),
)
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    cols = ["event_type", "props", "user_id", "value"]
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
    for c in cols:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("bigint").alias(f"nn_{c}")
        )
        aggs.append(F.countDistinct(c).cast("bigint").alias(f"nd_{c}"))
    wide = ev.agg(*aggs)
    stack = ", ".join(f"'{c}', nn_{c}, nd_{c}" for c in cols)
    return wide.select(
        F.expr(f"stack({len(cols)}, {stack}) AS (col_name, n_nulls, n_distinct)"),
        "n_rows",
    ).select("col_name", "n_rows", "n_nulls", "n_distinct")


@register(
    "q_agg_mode",
    oracle="""
SELECT o_orderpriority, o_orderstatus AS modal_status,
       CAST(cnt AS BIGINT) AS modal_count
FROM (
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS cnt,
           ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                              ORDER BY COUNT(*) DESC, o_orderstatus) AS rn
    FROM orders
    GROUP BY o_orderpriority, o_orderstatus
)
WHERE rn = 1
""",
    note="deterministic MODE per group: count-then-rank with an explicit "
    "value tiebreak instead of the engine's mode() (whose tie behavior is "
    "unspecified and engine-dependent). Two shuffles on tiny grouped data "
    "(hash-agg partial combines map-side first)",
    tags=("agg", "window"),
)
def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = read_table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("cnt").desc(), F.col("o_orderstatus")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "o_orderpriority",
            F.col("o_orderstatus").alias("modal_status"),
            F.col("cnt").cast("bigint").alias("modal_count"),
        )
    )


@register(
    "q_time_rollup",
    oracle="""
SELECT day, hr,
       COUNT(*) AS n_events,
       CAST(SUM(CAST((value) AS DECIMAL(25,6))) AS DOUBLE) AS total_value,
       CAST(GROUPING(day) AS BIGINT) AS grp_day,
       CAST(GROUPING(hr) AS BIGINT) AS grp_hr
FROM (
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
           value
    FROM events
)
GROUP BY ROLLUP (day, hr)
""",
    note="hypertable-style time-hierarchy rollup: hourly, daily, and grand "
    "totals of the event stream in ONE pass (Expand + hash-agg with "
    "map-side partials), instead of three scans at three grains — the "
    "continuous-aggregate idiom for time-series stores",
    tags=("agg", "timeseries"),
)
def q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").alias("day"),
        F.date_trunc("hour", "ts").alias("hr"),
        "value",
    )
    return ev.rollup("day", "hr").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr("CAST(SUM(CAST((value) AS DECIMAL(25,6))) AS DOUBLE)").alias(
            "total_value"
        ),
        F.grouping("day").cast("bigint").alias("grp_day"),
        F.grouping("hr").cast("bigint").alias("grp_hr"),
    )


@register(
    "q_win_share",
    oracle="""
WITH g AS (
    SELECT l_returnflag, l_linestatus,
           SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS rev
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag, l_linestatus,
       ROUND(CAST(rev AS DOUBLE), 4) AS revenue,
       ROUND(CAST(rev AS DOUBLE) / CAST(SUM(rev) OVER () AS DOUBLE), 6) AS share
FROM g
""",
    note="ratio-to-total: aggregate once, then a whole-frame window SUM "
    "over the (tiny) grouped result — the denominator never rescans the "
    "fact table. Division is one IEEE op on decimal-exact operands, so the "
    "share is bit-stable under any partitioning",
    tags=("agg", "window"),
)
def q_win_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    l = read_table(spark, sf_dir, "lineitem")
    g = l.groupBy("l_returnflag", "l_linestatus").agg(
        F.expr("SUM(CAST(l_extendedprice AS DECIMAL(25,6)))").alias("rev")
    )
    w = Window.partitionBy()
    return g.select(
        "l_returnflag",
        "l_linestatus",
        F.round(F.col("rev").cast("double"), 4).alias("revenue"),
        F.round(
            F.col("rev").cast("double") / F.sum("rev").over(w).cast("double"), 6
        ).alias("share"),
    )


@register(
    "q_profile_skew",
    oracle="""
WITH per_key AS (
    SELECT user_id, COUNT(*) AS n
    FROM events
    GROUP BY user_id
), tot AS (
    SELECT CAST(SUM(n) AS DOUBLE) AS total FROM per_key
)
SELECT user_id, CAST(n AS BIGINT) AS n_events,
       ROUND(CAST(n AS DOUBLE) / total, 6) AS share
FROM per_key, tot
ORDER BY n DESC, user_id
LIMIT 10
""",
    note="shuffle-key skew profiler: per-key cardinality + share of total "
    "for the 10 heaviest keys — the diagnostic you run BEFORE picking a "
    "salting factor or enabling AQE skew-join on a 100 TB shuffle. One "
    "hash-agg (map-side partials) materialized once (the key histogram "
    "feeds both the total and the top-10 — localCheckpoint stops the "
    "corpus pass executing twice), total via a broadcast single-row "
    "cross join, deterministic top-10 under a (count, key) total order",
    tags=("agg", "profile"),
)
def q_profile_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    # Materialize the compact key histogram once (the llm_cleaning gcounts
    # pattern): `per_key` feeds both the total and the top-10, and without
    # the checkpoint the corpus scan+shuffle would execute twice
    # (SCALE.md §3.4 rule).
    per_key = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    tot = per_key.agg(F.sum("n").cast("double").alias("total"))
    return (
        per_key.crossJoin(F.broadcast(tot))
        .select(
            "user_id",
            F.col("n").cast("bigint").alias("n_events"),
            F.round(F.col("n").cast("double") / F.col("total"), 6).alias("share"),
        )
        .orderBy(F.col("n_events").desc(), F.col("user_id"))
        .limit(10)
    )


@register(
    "q_agg_bitwise",
    oracle="""
SELECT event_type,
       CAST(bit_and(k) AS BIGINT) AS k_and,
       CAST(bit_or(k) AS BIGINT) AS k_or,
       CAST(bit_xor(k) AS BIGINT) AS k_xor
FROM (
    SELECT event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
)
GROUP BY event_type
""",
    note="bitwise aggregates (AND/OR/XOR) over a JSON-extracted flag field "
    "— commutative/associative, so they combine map-side like any partial "
    "agg; the flag-mask union/intersection idiom for feature flags",
    tags=("agg", "bitwise"),
)
def q_agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )
    return ev.groupBy("event_type").agg(
        F.expr("CAST(bit_and(k) AS BIGINT)").alias("k_and"),
        F.expr("CAST(bit_or(k) AS BIGINT)").alias("k_or"),
        F.expr("CAST(bit_xor(k) AS BIGINT)").alias("k_xor"),
    )


@register(
    "q_scalar_correlated",
    oracle="""
SELECT o.o_orderkey, o.o_custkey, ROUND(o.o_totalprice, 4) AS totalprice
FROM orders o
WHERE o.o_totalprice > 1.5 * (
    SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE)
    FROM orders o2
    WHERE o2.o_custkey = o.o_custkey
)
""",
    note="CORRELATED scalar subquery (vs q_scalar_subquery's uncorrelated "
    "one): each order against its own customer's average. Catalyst "
    "decorrelates to one per-customer aggregate + an equi-join — one "
    "shuffle on custkey, never a per-row re-scan. AVG decimal-bridged",
    tags=("join", "subquery"),
)
def q_scalar_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    from join_example_spark.sources.readers import register_temp_views

    register_temp_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey, ROUND(o.o_totalprice, 4) AS totalprice
        FROM orders o
        WHERE o.o_totalprice > 1.5 * (
            SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE)
            FROM orders o2
            WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


@register(
    "q_event_transitions",
    oracle="""
WITH seq AS (
    SELECT user_id, event_type,
           LEAD(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS next_type
    FROM events
)
SELECT event_type AS from_type, next_type AS to_type,
       CAST(COUNT(*) AS BIGINT) AS n
FROM seq
WHERE next_type IS NOT NULL
GROUP BY event_type, next_type
""",
    note="behavioral transition matrix (Markov bigram counts of the event "
    "stream): one window shuffle on user_id for the LEAD, then a tiny "
    "hash-agg over (from, to) — the path-analysis primitive behind "
    "funnels/next-action models. event_id breaks timestamp ties",
    tags=("window", "agg", "behavioral"),
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).where(F.col("next_type").isNotNull())
    return seq.groupBy(
        F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))


#: Shared text of the recursive order-chain query; only the day-difference
#: expression differs per engine ({datediff}).
_CHAIN_SQL = """
WITH RECURSIVE lnk AS (
    SELECT o_custkey, o_orderkey, o_orderdate,
           LEAD(o_orderkey) OVER w AS nxt_key,
           LEAD(o_orderdate) OVER w AS nxt_dt
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
), edges AS (
    SELECT o_orderkey AS src, nxt_key AS dst
    FROM lnk
    WHERE nxt_key IS NOT NULL AND {datediff} <= 30
), starts AS (
    SELECT l.o_orderkey AS start_key
    FROM lnk l
    LEFT JOIN edges e ON e.dst = l.o_orderkey
    WHERE e.dst IS NULL
), chain(start_key, cur_key, depth) AS (
    SELECT start_key, start_key, 1 FROM starts
    UNION ALL
    SELECT c.start_key, e.dst, c.depth + 1
    FROM chain c JOIN edges e ON e.src = c.cur_key
), per_start AS (
    SELECT start_key, MAX(depth) AS chain_len FROM chain GROUP BY start_key
)
SELECT CAST(chain_len AS BIGINT) AS chain_len, CAST(COUNT(*) AS BIGINT) AS n_chains
FROM per_start GROUP BY chain_len
"""


@register(
    "q_recursive_chain",
    oracle=_CHAIN_SQL.format(datediff="date_diff('day', o_orderdate, nxt_dt)"),
    note="RECURSIVE CTE (Spark 4 WITH RECURSIVE): per-customer reorder "
    "chains — successive orders <=30 days apart linked into paths, "
    "recursion walks each path from its start (out-degree <=1, so UNION "
    "ALL recursion is duplicate-free and terminates; Spark doesn't yet "
    "support UNION-distinct recursion, which cyclic graphs would need — "
    "connected components stays on the operators/graph.py loop for that "
    "reason). Depth reaches 5 at sf0.01; identical recursive SQL runs on "
    "DuckDB as the oracle",
    tags=("composite", "recursive", "window"),
)
def q_recursive_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    # Round 16 (guide §2.2 — don't recompute what a loop re-reads): the
    # one-shot _CHAIN_SQL form re-executed the `edges` CTE (orders scan +
    # LEAD window) INSIDE every UnionLoop iteration — depth+1 full window
    # passes (41 jobs / 99 stages at sf0.1, 3.5 s warm). The edge list is
    # loop-invariant, so it is built once as a DataFrame, checkpointed
    # (executor-side, the graph.py pattern; a cluster deployment would
    # persist to reliable storage), and only the recursion itself stays
    # SQL — same WITH RECURSIVE UNION ALL walk, same aliases, same oracle.
    # `starts` needs only the order keys (Catalyst pruned the window off
    # the anchor already), expressed directly as an anti-join: edge dst
    # values are unique (one LEAD predecessor per order), so LEFT JOIN ...
    # IS NULL and anti-join are row-identical.
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    lnk = orders.select(
        "o_orderkey",
        "o_orderdate",
        F.lead("o_orderkey").over(w).alias("nxt_key"),
        F.lead("o_orderdate").over(w).alias("nxt_dt"),
    )
    edges = (
        lnk.where(
            F.col("nxt_key").isNotNull()
            & (F.expr("datediff(nxt_dt, o_orderdate)") <= 30)
        )
        .select(F.col("o_orderkey").alias("src"), F.col("nxt_key").alias("dst"))
        .localCheckpoint(eager=True)
    )
    starts = orders.select(F.col("o_orderkey").alias("start_key")).join(
        edges.select(F.col("dst").alias("start_key")), "start_key", "left_anti"
    )
    return spark.sql(
        """
WITH RECURSIVE chain(start_key, cur_key, depth) AS (
    SELECT start_key, start_key, 1 FROM {starts}
    UNION ALL
    SELECT c.start_key, e.dst, c.depth + 1
    FROM chain c JOIN {edges} e ON e.src = c.cur_key
), per_start AS (
    SELECT start_key, MAX(depth) AS chain_len FROM chain GROUP BY start_key
)
SELECT CAST(chain_len AS BIGINT) AS chain_len, CAST(COUNT(*) AS BIGINT) AS n_chains
FROM per_start GROUP BY chain_len
""",
        starts=starts,
        edges=edges,
    )


def _z_expr(x: str, y: str, bits: int, dialect: str) -> str:
    """Bit-interleaved Morton (Z-order) value of two ``bits``-wide ints.

    Identical arithmetic on both engines; only the shift syntax differs
    (Spark: shiftleft/shiftright functions, DuckDB: << / >> operators).
    """
    parts = []
    for i in range(bits):
        if dialect == "spark":
            parts.append(f"shiftleft(shiftright({x}, {i}) & 1, {2 * i})")
            parts.append(f"shiftleft(shiftright({y}, {i}) & 1, {2 * i + 1})")
        else:
            parts.append(f"((({x} >> {i}) & 1) << {2 * i})")
            parts.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(parts) + ")"


def _zorder_sql(dialect: str) -> str:
    # Double-mod keeps both coordinates in [0, 1024) even if a key is
    # negative or a date precedes the epoch — a negative operand would
    # sign-extend through the shifts and scramble the interleave (caught by
    # tests/test_round2_ops.py::test_zorder_buckets_bound_both_spans).
    x = "CAST(((o_custkey % 1024) + 1024) % 1024 AS BIGINT)"
    if dialect == "spark":
        d = "datediff(o_orderdate, DATE '1994-01-01')"
    else:
        d = "date_diff('day', DATE '1994-01-01', o_orderdate)"
    y = f"CAST((({d} % 1024) + 1024) % 1024 AS BIGINT)"
    z = _z_expr("xv", "yv", 10, dialect)
    return f"""
WITH keyed AS (
    SELECT {x} AS xv, {y} AS yv FROM orders
), zed AS (
    SELECT xv, yv, {z} AS zval FROM keyed
)
SELECT CAST(zval >> 14 AS BIGINT) AS zbucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MAX(xv) - MIN(xv) AS BIGINT) AS x_span,
       CAST(MAX(yv) - MIN(yv) AS BIGINT) AS y_span
FROM zed
GROUP BY zval >> 14
"""


@register(
    "q_zorder_layout",
    oracle=_zorder_sql("duck"),
    note="Z-order (Morton) layout keys: bit-interleave (custkey mod 1024, "
    "order-day mod 1024) and audit the 64 coarse z-buckets — each bucket's "
    "x/y spans stay bounded (<=1024/2^3), which is exactly why writing "
    "files sorted by zval gives parquet min/max pruning on BOTH dimensions "
    "at once. The sort-key computation is pure JVM bit arithmetic on the "
    "scan; at 100 TB you'd repartitionByRange(zval) before the write",
    tags=("layout", "agg"),
)
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from join_example_spark.sources.readers import register_temp_views

    register_temp_views(spark, sf_dir, ("orders",))
    return spark.sql(_zorder_sql("spark"))


#: Snapshot-diff shared SQL: the "new" snapshot is a deterministic transform
#: of customer (acctbal bump for custkey%7==0, rows dropped for %13==0), so
#: the diff operator itself is what's under test and both engines see the
#: same input. Real pipelines compare a row-hash over all columns; the
#: single-column inequality here keeps the certified surface minimal.
_SNAPSHOT_DIFF_SQL = """
WITH newsnap AS (
    SELECT c_custkey,
           CASE WHEN c_custkey % 7 = 0
                THEN ROUND(c_acctbal + 100.0, 2)
                ELSE c_acctbal END AS c_acctbal
    FROM customer
    WHERE c_custkey % 13 <> 0
), j AS (
    SELECT o.c_custkey,
           CASE WHEN n.c_custkey IS NULL THEN 'deleted'
                WHEN o.c_acctbal <> n.c_acctbal THEN 'modified'
                ELSE 'unchanged' END AS change_type
    FROM customer o
    LEFT JOIN newsnap n ON o.c_custkey = n.c_custkey
)
SELECT change_type, CAST(COUNT(*) AS BIGINT) AS n
FROM j GROUP BY change_type
"""


@register(
    "q_snapshot_diff",
    oracle=_SNAPSHOT_DIFF_SQL,
    note="snapshot reconciliation: old-vs-new table diff classifying every "
    "key as unchanged/modified/deleted via one co-partitioned left join "
    "(add 'inserted' with a full outer). The 100 TB shape: both snapshots "
    "shuffle on the key once — or zero times if both are bucketed on it; "
    "compare a row-hash instead of single columns for wide tables",
    tags=("join", "agg", "quality"),
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from join_example_spark.sources.readers import register_temp_views

    register_temp_views(spark, sf_dir, ("customer",))
    return spark.sql(_SNAPSHOT_DIFF_SQL)


@register(
    "q_outlier_iqr",
    oracle="""
WITH b AS (
    SELECT source,
           quantile_cont(n_chars, 0.25) AS q1,
           quantile_cont(n_chars, 0.75) AS q3
    FROM documents GROUP BY source
)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN d.n_chars < b.q1 - 1.5 * (b.q3 - b.q1)
                       OR d.n_chars > b.q3 + 1.5 * (b.q3 - b.q1)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       ROUND(b.q1, 4) AS q1, ROUND(b.q3, 4) AS q3
FROM documents d
JOIN b ON b.source = d.source
GROUP BY d.source, b.q1, b.q3
""",
    note="IQR outlier screen per stratum: exact percentiles once per "
    "source (tiny grouped result, broadcast back to the fact scan), fence "
    "check as a JVM map — the length-outlier pre-filter of a corpus "
    "quality pipeline. Spark percentile() == DuckDB quantile_cont "
    "(parity proven by q_agg_percentile)",
    tags=("agg", "quality", "percentile"),
)
def q_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    b = docs.groupBy("source").agg(
        F.expr("percentile(n_chars, 0.25)").alias("q1"),
        F.expr("percentile(n_chars, 0.75)").alias("q3"),
    )
    j = docs.join(F.broadcast(b), "source")
    iqr = F.col("q3") - F.col("q1")
    is_out = (F.col("n_chars") < F.col("q1") - 1.5 * iqr) | (
        F.col("n_chars") > F.col("q3") + 1.5 * iqr
    )
    return j.groupBy("source", "q1", "q3").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(is_out, 1).otherwise(0)).cast("bigint").alias("n_outliers"),
    ).select(
        "source",
        "n_docs",
        "n_outliers",
        F.round("q1", 4).alias("q1"),
        F.round("q3", 4).alias("q3"),
    )


@register(
    "q_agg_approx_topk",
    oracle="""
WITH toks AS (
    SELECT unnest(string_split(LOWER(TRIM(text)), ' ')) AS tok
    FROM documents
    WHERE text IS NOT NULL AND LEN(TRIM(text)) > 0
),
counts AS (
    SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok
),
ranked AS (
    SELECT tok, CAST(n AS BIGINT) AS n,
           CAST(ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS BIGINT) AS rn
    FROM counts
)
SELECT tok, n, rn FROM ranked WHERE rn <= 10
""",
    note="frequent-items SKETCH path (Spark 4 DataSketches approx_top_k), "
    "certified exact in the regime where the sketch IS exact: exactness "
    "requires vocabulary <= maxItemsTracked (passed EXPLICITLY as 10000 — "
    "not k; the fixture vocabulary is 31 at every SF and a fixture-drift "
    "test pins vocabulary < maxItemsTracked so degradation is loud, per "
    "round-3 ADVICE). Every item is then tracked with its true count and "
    "the DuckDB exact-count oracle hash-matches. "
    "The deterministic (count DESC, token) re-rank happens "
    "OUTSIDE the sketch — approx_top_k's own boundary tie-pick is "
    "unspecified. At 100 TB the same expression is the mergeable "
    "frequent-items sketch (map-side partial, bounded memory), and "
    "exactness degrades gracefully to the documented sketch guarantees "
    "once cardinality exceeds the tracked slots",
    tags=("agg", "approx", "llm"),
)
def q_agg_approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = (
        read_table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull() & (F.length(F.trim("text")) > 0))
        .select(F.explode(F.expr("split(LOWER(TRIM(text)), ' ')")).alias("tok"))
    )
    sketch = toks.agg(F.expr("approx_top_k(tok, 100, 10000)").alias("tk"))
    items = sketch.select(F.explode("tk").alias("e")).select(
        F.col("e.item").alias("tok"), F.col("e.count").cast("bigint").alias("n")
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n").desc(), F.col("tok"))
    return (
        items.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .where(F.col("rn") <= 10)
        .select("tok", "n", "rn")
    )


@register(
    "q_dq_constraints",
    oracle="""
WITH checks AS (
    SELECT 'orders_pk_unique' AS rule,
           (SELECT COUNT(*) FROM (
               SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1
           )) AS n_violations
    UNION ALL
    SELECT 'lineitem_pk_unique',
           (SELECT COUNT(*) FROM (
               SELECT l_orderkey, l_linenumber FROM lineitem
               GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1
           ))
    UNION ALL
    SELECT 'lineitem_fk_orders',
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'orders_fk_customer',
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'discount_in_range',
           (SELECT COUNT(*) FROM lineitem
            WHERE l_discount < 0.0 OR l_discount > 1.0)
    UNION ALL
    SELECT 'quantity_positive',
           (SELECT COUNT(*) FROM lineitem WHERE l_quantity <= 0.0)
    UNION ALL
    SELECT 'orderdate_not_null',
           (SELECT COUNT(*) FROM orders WHERE o_orderdate IS NULL)
)
SELECT rule, CAST(n_violations AS BIGINT) AS n_violations,
       n_violations = 0 AS passed
FROM checks
""",
    note="declarative data-quality constraint audit (the Deequ/"
    "expectations pattern as ONE query): primary-key uniqueness, "
    "referential integrity, domain ranges, and non-null rules each "
    "reduce to a violation COUNT -- exact integers, no float bridge. "
    "Plans: uniqueness is a partial-agg groupBy HAVING; FK checks are "
    "anti-joins (never correlated per-row subqueries); every rule is one "
    "scan + one shuffle and the rules run as a unioned single job. At "
    "100 TB this is the pre-publication gate of a pipeline: violations "
    "routed to quarantine, the boolean gate blocking the promote step. "
    "Finding, agreed by both engines: this synthetic fixture genuinely "
    "VIOLATES lineitem (l_orderkey, l_linenumber) uniqueness (11785 dup "
    "key groups at sf0.01) -- the failing row is real audit output, not "
    "an engine bug, and proves the check bites",
    tags=("quality", "agg"),
)
def q_dq_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    customer = read_table(spark, sf_dir, "customer")

    def one(rule: str, cnt_df: DataFrame) -> DataFrame:
        return cnt_df.select(
            F.lit(rule).alias("rule"),
            F.col("n").cast("bigint").alias("n_violations"),
            (F.col("n") == 0).alias("passed"),
        )

    dup_orders = (
        orders.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") > 1)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    dup_li = (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") > 1)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    fk_li = li.join(
        orders.select("o_orderkey"),
        li.l_orderkey == F.col("o_orderkey"),
        "left_anti",
    ).agg(F.count(F.lit(1)).alias("n"))
    fk_orders = orders.join(
        customer.select("c_custkey"),
        orders.o_custkey == F.col("c_custkey"),
        "left_anti",
    ).agg(F.count(F.lit(1)).alias("n"))
    disc = li.where(
        (F.col("l_discount") < 0.0) | (F.col("l_discount") > 1.0)
    ).agg(F.count(F.lit(1)).alias("n"))
    qty = li.where(F.col("l_quantity") <= 0.0).agg(F.count(F.lit(1)).alias("n"))
    odate = orders.where(F.col("o_orderdate").isNull()).agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        one("orders_pk_unique", dup_orders)
        .union(one("lineitem_pk_unique", dup_li))
        .union(one("lineitem_fk_orders", fk_li))
        .union(one("orders_fk_customer", fk_orders))
        .union(one("discount_in_range", disc))
        .union(one("quantity_positive", qty))
        .union(one("orderdate_not_null", odate))
    )


@register(
    "q_dq_volume_anomaly",
    oracle="""
WITH daily AS (
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY 1
), trailed AS (
    SELECT day, n_events,
           AVG(CAST(n_events AS DOUBLE)) OVER (
               ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING
           ) AS trail_avg,
           COUNT(*) OVER (
               ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING
           ) AS trail_n
    FROM daily
)
SELECT day, n_events,
       ROUND(trail_avg, 4) AS trail_avg,
       CAST(n_events AS DOUBLE) < 0.5 * trail_avg
           OR CAST(n_events AS DOUBLE) > 2.0 * trail_avg AS is_anomaly
FROM trailed
WHERE trail_n = 7
""",
    note="ingest-volume anomaly monitor (the freshness/ops half of data "
    "quality, next to q_dq_constraints' correctness half): daily event "
    "counts judged against their own trailing-7-day mean, flagged outside "
    "the [0.5x, 2x] band -- the pager rule for a dead upstream or a "
    "duplicating producer. Warm-up days (fewer than 7 trailing points) "
    "are excluded rather than judged against a noisy mean. Determinism: "
    "the trailing mean is AVG over EXACT integer counts in a fixed ROWS "
    "frame -- identical operand sequence both engines -- rounded for "
    "display; the band comparison uses the unrounded value. Plan: one "
    "partial-agg to ~days rows, then a window over that tiny frame -- at "
    "100 TB the daily rollup is the only corpus-sized work",
    tags=("quality", "window", "temporal"),
)
def q_dq_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from join_example_spark.sources.readers import read_events

    ev = read_events(spark, sf_dir)
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events")
    )
    w = Window.orderBy("day").rowsBetween(-7, -1)
    trailed = daily.select(
        "day",
        "n_events",
        F.avg(F.col("n_events").cast("double")).over(w).alias("trail_avg"),
        F.count(F.lit(1)).over(w).alias("trail_n"),
    )
    return trailed.where(F.col("trail_n") == 7).select(
        "day",
        "n_events",
        F.round("trail_avg", 4).alias("trail_avg"),
        (
            (F.col("n_events").cast("double") < 0.5 * F.col("trail_avg"))
            | (F.col("n_events").cast("double") > 2.0 * F.col("trail_avg"))
        ).alias("is_anomaly"),
    )


@register(
    "q_audience_overlap_hll",
    oracle="""
WITH d AS (
    SELECT DISTINCT event_type, user_id FROM events
), per AS (
    SELECT event_type, COUNT(*) AS n_users FROM d GROUP BY event_type
), inter AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           COUNT(*) AS n_inter
    FROM d a
    JOIN d b ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY 1, 2
)
SELECT i.type_a, i.type_b,
       CAST(pa.n_users AS BIGINT) AS n_users_a,
       CAST(pb.n_users AS BIGINT) AS n_users_b,
       CAST(i.n_inter AS BIGINT) AS n_inter,
       CAST(pa.n_users + pb.n_users - i.n_inter AS BIGINT) AS n_union,
       CAST(i.n_inter AS DOUBLE)
           / CAST(pa.n_users + pb.n_users - i.n_inter AS DOUBLE) AS jaccard,
       TRUE AS ie_within_tol
FROM inter i
JOIN per pa ON pa.event_type = i.type_a
JOIN per pb ON pb.event_type = i.type_b
""",
    note="pairwise audience overlap (the 'users who did BOTH' question) "
    "with the sketch path certified by the repo's exact-anchor pattern: "
    "exact per-type/intersection/union distinct counts and their raw-"
    "division Jaccard (identical ints -> identical IEEE quotient, no "
    "ROUND boundary) are the certified outputs, and ie_within_tol pins "
    "the DataSketches-HLL inclusion-exclusion estimate |(est_a + est_b "
    "- est_union) - n_inter| <= 5% of n_union, which the oracle asserts "
    "literally (measured error 0.0000 at every fixture SF - the "
    "sketches sit in their sparse exact regime; the union-scale "
    "denominator is the honest one, since IE error compounds on the "
    "union even when the intersection is tiny). At 100 TB the exact "
    "anchors drop out and the sketch stands alone: per-type HLLs are "
    "mergeable partials (one scan, bounded memory), pairwise IE is "
    "arithmetic over a #types-sized table - intersection cardinality "
    "without ever joining user sets. The tiny broadcast self-join over "
    "the per-type aggregate is the sanctioned small-dimension cross "
    "(#event types, never users)",
    tags=("analytics", "agg", "approx"),
)
def q_audience_overlap_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    d = ev.select("event_type", "user_id").distinct()
    sk = d.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
    )
    a = sk.select(
        F.col("event_type").alias("type_a"),
        F.col("sk").alias("sk_a"),
        F.col("n_users").alias("n_users_a"),
    )
    b = sk.select(
        F.col("event_type").alias("type_b"),
        F.col("sk").alias("sk_b"),
        F.col("n_users").alias("n_users_b"),
    )
    est = (
        a.crossJoin(F.broadcast(b))
        .where(F.col("type_a") < F.col("type_b"))
        .select(
            "type_a",
            "type_b",
            "n_users_a",
            "n_users_b",
            F.hll_sketch_estimate("sk_a").alias("_ea"),
            F.hll_sketch_estimate("sk_b").alias("_eb"),
            F.hll_sketch_estimate(F.hll_union("sk_a", "sk_b")).alias("_eu"),
        )
    )
    inter = (
        d.alias("x")
        .join(d.alias("y"), "user_id")
        .where(F.col("x.event_type") < F.col("y.event_type"))
        .groupBy(
            F.col("x.event_type").alias("type_a"),
            F.col("y.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_inter"))
    )
    n_union = (F.col("n_users_a") + F.col("n_users_b") - F.col("n_inter")).cast(
        "bigint"
    )
    ie = F.col("_ea") + F.col("_eb") - F.col("_eu")
    return (
        est.join(inter, ["type_a", "type_b"])
        .select(
            "type_a",
            "type_b",
            "n_users_a",
            "n_users_b",
            "n_inter",
            n_union.alias("n_union"),
            (
                F.col("n_inter").cast("double") / n_union.cast("double")
            ).alias("jaccard"),
            (
                F.abs(ie - F.col("n_inter").cast("double"))
                / F.greatest(n_union, F.lit(1)).cast("double")
                <= F.lit(0.05)
            ).alias("ie_within_tol"),
        )
    )


@register(
    "q_ts_sim_search",
    oracle="""
WITH per AS (
    SELECT event_type, epoch_us(ts) // 60000000 AS m, COUNT(*) AS cnt
    FROM events GROUP BY 1, 2
), bounds AS (
    SELECT event_type, MIN(m) AS mn, MAX(m) AS mx FROM per GROUP BY 1
), spine AS (
    SELECT event_type, unnest(range(mn, mx + 1)) AS m FROM bounds
), series AS (
    SELECT s.event_type, s.m, COALESCE(p.cnt, 0) AS cnt
    FROM spine s
    LEFT JOIN per p ON p.event_type = s.event_type AND p.m = s.m
), wins AS (
    SELECT event_type, m,
           list(cnt) OVER (PARTITION BY event_type ORDER BY m
                           ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS w
    FROM series
), full_w AS (
    SELECT * FROM wins WHERE len(w) = 8
), q AS (
    SELECT w AS qw FROM full_w WHERE event_type = 'click' ORDER BY m LIMIT 1
), scored AS (
    SELECT f.event_type, f.m,
           CAST(list_aggregate(list_transform(list_zip(f.w, q.qw),
               p -> (CAST(p[1] AS BIGINT) - CAST(p[2] AS BIGINT))
                    * (CAST(p[1] AS BIGINT) - CAST(p[2] AS BIGINT))), 'sum')
               AS BIGINT) AS sse
    FROM full_w f CROSS JOIN q
)
SELECT event_type, win_start_m, sse, rn FROM (
    SELECT event_type, CAST(m AS BIGINT) AS win_start_m, sse,
           CAST(ROW_NUMBER() OVER (ORDER BY sse, event_type, m) AS BIGINT) AS rn
    FROM scored
) WHERE rn <= 10
""",
    note="time-series subsequence similarity search (the EDBT'19 "
    "streaming-similarity class, UCR-suite shape): the event stream "
    "rolls up to gap-filled per-(type, minute) count series; every "
    "8-minute sliding window is scored against a deterministic query "
    "pattern (the click series' first full window) by sum-of-squared "
    "differences computed ENTIRELY in BIGINT — counts are integers, so "
    "there is no float/rounding surface at all, the strongest "
    "determinism class in the repo. Top-10 via TakeOrderedAndProject "
    "(never a global-order window over all windows), unique (sse, type, "
    "start) total order. The self-match (sse=0) ranks first by "
    "construction — kept as the sanity anchor. Cost shape: one rollup "
    "shuffle, a per-type minute spine (sequence — ascending since "
    "mx >= mn), one ROWS-frame window, broadcast 1-row query pattern; "
    "at 100 TB the spine/window partitions by type and the scan never "
    "materializes pairwise window combinations",
    tags=("temporal", "similarity", "analytics"),
)
def q_ts_sim_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from join_example_spark.operators.temporal import ts_subseq_topk
    from join_example_spark.sources.readers import read_events

    ev = read_events(spark, sf_dir)
    per = ev.groupBy(
        "event_type",
        F.expr("unix_micros(ts) DIV 60000000").alias("m"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    return ts_subseq_topk(per)


@register(
    "q_ts_rolling_corr",
    oracle="""
WITH per AS (
    SELECT epoch_us(ts) // 60000000 AS m,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS y
    FROM events GROUP BY 1
), bounds AS (SELECT MIN(m) AS mn, MAX(m) AS mx FROM per),
spine AS (SELECT unnest(range(mn, mx + 1)) AS m FROM bounds),
series AS (
    SELECT s.m, COALESCE(p.x, 0) AS x, COALESCE(p.y, 0) AS y
    FROM spine s LEFT JOIN per p ON p.m = s.m
), sums AS (
    SELECT m,
           COUNT(*) OVER w AS n,
           SUM(x) OVER w AS sx, SUM(y) OVER w AS sy,
           SUM(x * y) OVER w AS sxy,
           SUM(x * x) OVER w AS sxx, SUM(y * y) OVER w AS syy
    FROM series
    WINDOW w AS (ORDER BY m ROWS BETWEEN 59 PRECEDING AND CURRENT ROW)
)
SELECT CAST(m AS BIGINT) AS win_end_m,
       CAST(n * sxy - sx * sy AS DOUBLE)
           / NULLIF(sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 0.0)
           AS click_error_corr
FROM sums WHERE n = 60
""",
    note="rolling 60-minute Pearson correlation between the click and "
    "error count series — temporal co-movement monitoring (does error "
    "volume track traffic?) with ZERO float accumulation: all five "
    "moments (Σx, Σy, Σxy, Σx², Σy²) are BIGINT window sums over "
    "integer counts (exact and order-independent — integer addition "
    "commutes, unlike float), and the correlation is one final IEEE "
    "expression (mul/div/sqrt are correctly rounded) of identical "
    "integer operands on both engines. NULL where the window variance "
    "is zero. Gap-filled minute spine; full 60-minute windows only. "
    "One rollup + one tiny ordered window over ~minutes rows",
    tags=("temporal", "analytics", "window"),
)
def q_ts_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from join_example_spark.sources.readers import read_events

    ev = read_events(spark, sf_dir)
    per = ev.groupBy(F.expr("unix_micros(ts) DIV 60000000").alias("m")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("bigint")
        .alias("y"),
    )
    # `per` feeds bounds AND the spine join — materialize the tiny minute
    # rollup once (SCALE.md §3.4 rule).
    per = per.localCheckpoint(eager=True)
    bounds = per.agg(F.min("m").alias("mn"), F.max("m").alias("mx"))
    spine = bounds.select(F.explode(F.expr("sequence(mn, mx)")).alias("m"))
    series = spine.join(per, "m", "left").select(
        "m",
        F.coalesce(F.col("x"), F.lit(0)).alias("x"),
        F.coalesce(F.col("y"), F.lit(0)).alias("y"),
    )
    w = Window.orderBy("m").rowsBetween(-59, 0)
    sums = series.select(
        "m",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("syy"),
    ).where(F.col("n") == 60)
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.nullif(
        F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
        * F.sqrt((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")),
        F.lit(0.0),
    )
    return sums.select(
        F.col("m").cast("bigint").alias("win_end_m"),
        (num / den).alias("click_error_corr"),
    )


@register(
    "q_dq_stats_drift",
    oracle="""
WITH daily AS (
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           SUM(CAST(value AS DECIMAL(25,6))) AS sum_dec
    FROM events GROUP BY 1
), trailed AS (
    SELECT day, n_events, n_users, sum_dec,
           COUNT(*) OVER w AS trail_n,
           SUM(n_events) OVER w AS t_events,
           SUM(n_users) OVER w AS t_users,
           SUM(sum_dec) OVER w AS t_sum
    FROM daily
    WINDOW w AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT day, n_events, n_users,
       CAST(sum_dec AS DOUBLE) / CAST(n_events AS DOUBLE) AS avg_value,
       CAST(n_events AS DOUBLE) * 7.0 / CAST(t_events AS DOUBLE) AS vol_ratio,
       CAST(n_users AS DOUBLE) * 7.0 / CAST(t_users AS DOUBLE) AS user_ratio,
       (CAST(sum_dec AS DOUBLE) / CAST(n_events AS DOUBLE))
           / (CAST(t_sum AS DOUBLE) / CAST(t_events AS DOUBLE)) AS avg_ratio,
       (CAST(n_events AS DOUBLE) * 7.0 / CAST(t_events AS DOUBLE) < 0.5
        OR CAST(n_events AS DOUBLE) * 7.0 / CAST(t_events AS DOUBLE) > 2.0)
           AS vol_anomaly,
       (CAST(n_users AS DOUBLE) * 7.0 / CAST(t_users AS DOUBLE) < 0.5
        OR CAST(n_users AS DOUBLE) * 7.0 / CAST(t_users AS DOUBLE) > 2.0)
           AS user_anomaly,
       ((CAST(sum_dec AS DOUBLE) / CAST(n_events AS DOUBLE))
           / (CAST(t_sum AS DOUBLE) / CAST(t_events AS DOUBLE)) < 0.8
        OR (CAST(sum_dec AS DOUBLE) / CAST(n_events AS DOUBLE))
           / (CAST(t_sum AS DOUBLE) / CAST(t_events AS DOUBLE)) > 1.25)
           AS avg_anomaly
FROM trailed WHERE trail_n = 7
""",
    note="multi-metric ingest drift monitor — the statistical half of the "
    "data-quality family (q_dq_constraints audits rules, "
    "q_dq_volume_anomaly audits row counts; this audits the DISTRIBUTION): "
    "per-day volume, distinct-user, and mean-value profiles, each "
    "compared to its trailing-7-day aggregate. Determinism: value sums "
    "ride the standard DECIMAL(25,6) bridge and the trailing mean is "
    "trailing-decimal-SUM / trailing-COUNT (never an avg-of-avgs of raw "
    "doubles — float window sums are merge-order-dependent); every ratio "
    "is a raw IEEE quotient of identical operands both engines, "
    "thresholds compare those quotients directly. Warm-up days excluded "
    "(trail_n = 7). One corpus-sized rollup, then a window over ~days "
    "rows — the bounded-by-time frame class",
    tags=("quality", "window", "temporal"),
)
def q_dq_stats_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from join_example_spark.sources.readers import read_events

    ev = read_events(spark, sf_dir)
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.expr("SUM(CAST(value AS DECIMAL(25,6)))").alias("sum_dec"),
    )
    w = Window.orderBy("day").rowsBetween(-7, -1)
    trailed = daily.select(
        "day",
        "n_events",
        "n_users",
        "sum_dec",
        F.count(F.lit(1)).over(w).alias("trail_n"),
        F.sum("n_events").over(w).alias("t_events"),
        F.sum("n_users").over(w).alias("t_users"),
        F.sum("sum_dec").over(w).alias("t_sum"),
    ).where(F.col("trail_n") == 7)
    avg_value = F.col("sum_dec").cast("double") / F.col("n_events").cast("double")
    vol_ratio = F.col("n_events").cast("double") * 7.0 / F.col("t_events").cast("double")
    user_ratio = F.col("n_users").cast("double") * 7.0 / F.col("t_users").cast("double")
    trail_avg = F.col("t_sum").cast("double") / F.col("t_events").cast("double")
    avg_ratio = avg_value / trail_avg
    return trailed.select(
        "day",
        "n_events",
        "n_users",
        avg_value.alias("avg_value"),
        vol_ratio.alias("vol_ratio"),
        user_ratio.alias("user_ratio"),
        avg_ratio.alias("avg_ratio"),
        ((vol_ratio < 0.5) | (vol_ratio > 2.0)).alias("vol_anomaly"),
        ((user_ratio < 0.5) | (user_ratio > 2.0)).alias("user_anomaly"),
        ((avg_ratio < 0.8) | (avg_ratio > 1.25)).alias("avg_anomaly"),
    )


@register(
    "q_ts_ewma",
    oracle="""
WITH per AS (
    SELECT event_type, epoch_us(ts) // 60000000 AS m,
           CAST(COUNT(*) AS BIGINT) AS x
    FROM events GROUP BY 1, 2
), bounds AS (SELECT MIN(m) AS mn, MAX(m) AS mx FROM per),
types AS (SELECT DISTINCT event_type FROM events),
spine AS (
    SELECT t.event_type, unnest(range(b.mn, b.mx + 1)) AS m
    FROM types t CROSS JOIN bounds b
), series AS (
    SELECT s.event_type, s.m, COALESCE(p.x, CAST(0 AS BIGINT)) AS x
    FROM spine s
    LEFT JOIN per p ON p.event_type = s.event_type AND p.m = s.m
), contrib AS (
    SELECT s.event_type, s.m + u.k AS t, s.x << (19 - u.k) AS c
    FROM series s CROSS JOIN (SELECT unnest(range(0, 20)) AS k) u
)
SELECT event_type,
       CAST(t AS BIGINT) AS win_end_m,
       CAST(SUM(c) AS DOUBLE) / 1048576.0 AS ewma
FROM contrib
GROUP BY event_type, t
HAVING COUNT(*) = 20
""",
    note="EXACT truncated EWMA (alpha = 1/2, 20-minute horizon) of each "
    "event type's per-minute count series: the smoothed-rate monitor "
    "behind alerting/trend lines. The dyadic-weight trick makes it "
    "bit-exact with NO rounding anywhere: weight (1/2)^(k+1) becomes an "
    "integer shiftleft(x, 19-k), the weighted sum is a BIGINT SUM "
    "(order-independent), and the single closing division by 2^20 is an "
    "exact binary scaling — the entire query is integer arithmetic plus "
    "one lossless float op. Gap-filled minute spine per type; complete "
    "20-minute windows only (COUNT(*) = 20). Scale shape: one rollup "
    "shuffle, a broadcast bounds row, a 20x narrow contribution explode "
    "(map-side), one (type, minute) grouped sum — no window over the "
    "raw stream, no range join, streaming-maintainable as a keyed "
    "running state",
    tags=("temporal", "analytics", "window"),
)
def q_ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    from join_example_spark.operators.temporal import dyadic_weighted_series
    from join_example_spark.sources.readers import read_events

    ev = read_events(spark, sf_dir)
    per = ev.groupBy(
        "event_type", F.expr("unix_micros(ts) DIV 60000000").alias("m")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    # weight of the reading k minutes before the window end: 2^(19-k)
    # (the alpha = 1/2 geometric series scaled by 2^20).
    weights = tuple(1 << (19 - k) for k in range(20))
    return dyadic_weighted_series(per, weights, 1048576.0, "ewma")


@register(
    "q_ts_twap",
    oracle="""
WITH seq AS (
    SELECT event_type, value, event_id, epoch_us(ts) AS t,
           LEAD(epoch_us(ts)) OVER (
               PARTITION BY event_type ORDER BY ts, event_id) AS nxt
    FROM events
), iv AS (
    SELECT event_type,
           CAST(CAST(value AS DECIMAL(12,3)) * 1000 AS BIGINT) AS v_milli,
           nxt - t AS dur
    FROM seq WHERE nxt IS NOT NULL
)
SELECT event_type,
       CAST(SUM(v_milli * dur) AS DOUBLE) / CAST(SUM(dur) AS DOUBLE) / 1000.0
           AS twap,
       CAST(SUM(dur) AS BIGINT) AS total_dur_us,
       CAST(COUNT(*) AS BIGINT) AS n_intervals
FROM iv GROUP BY event_type
""",
    note="time-weighted average value (TWAP) per event type: each "
    "reading holds until the next event of the same type, so its weight "
    "is the integer microsecond duration from LEAD — the metric that "
    "prices irregularly-sampled gauges correctly where a plain AVG "
    "over-weights bursts. Determinism: value carries <= 3 fixture "
    "decimals so CAST to DECIMAL(12,3) * 1000 -> BIGINT is a lossless "
    "integerization; the weighted sum then accumulates in PURE BIGINT "
    "(order-independent, and int64 -> double conversion is correctly "
    "rounded on both engines — unlike wide-DECIMAL -> double, where "
    "DuckDB's int128-then-divide double conversion rounds twice and "
    "diverged from Spark's exact parse by 1 ulp at 18 significant "
    "digits; caught by the mirror on first run), and the closing "
    "division chain is IEEE ops on identical operands. LEAD sits "
    "under a (ts, event_id) total order. Scale: one keyed window scan + "
    "one rollup — and because the weight of a reading is determined by "
    "the NEXT event only, the operator is streaming-maintainable with "
    "one pending row of state per key",
    tags=("temporal", "analytics", "agg"),
)
def q_ts_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from join_example_spark.sources.readers import read_events

    ev = read_events(spark, sf_dir).select(
        "event_type", "value", "event_id", F.expr("unix_micros(ts)").alias("t"), "ts"
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    iv = (
        ev.withColumn("nxt", F.lead("t").over(w))
        .where(F.col("nxt").isNotNull())
        .select(
            "event_type",
            F.expr("CAST(CAST(value AS DECIMAL(12,3)) * 1000 AS BIGINT)").alias(
                "v_milli"
            ),
            (F.col("nxt") - F.col("t")).alias("dur"),
        )
    )
    return iv.groupBy("event_type").agg(
        (
            F.sum(F.col("v_milli") * F.col("dur")).cast("double")
            / F.sum("dur").cast("double")
            / F.lit(1000.0)
        ).alias("twap"),
        F.sum("dur").cast("bigint").alias("total_dur_us"),
        F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
    )


@register(
    "q_dq_robust_mad",
    oracle="""
WITH med AS (
    SELECT event_type, quantile_disc(value, 0.5) AS med
    FROM events GROUP BY event_type
), dev AS (
    SELECT e.event_type, m.med, ABS(e.value - m.med) AS adev
    FROM events e JOIN med m USING (event_type)
), stats AS (
    SELECT event_type, med, quantile_disc(adev, 0.5) AS mad
    FROM dev GROUP BY event_type, med
)
SELECT s.event_type, s.med, s.mad,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN d.adev > 4.4478 * s.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM dev d JOIN stats s USING (event_type)
GROUP BY s.event_type, s.med, s.mad
""",
    note="robust outlier monitor: per event type, median and MAD (median "
    "absolute deviation) of value, and the count of readings beyond the "
    "3-sigma-equivalent robust fence |x - med| > 4.4478 * MAD (4.4478 = "
    "3 x 1.4826, written as ONE parsed literal on both sides — composing "
    "it as 3*1.4826 would be a different double). Unlike the mean/stddev "
    "screen (q_dq_stats_drift), median/MAD don't move when the outliers "
    "themselves get worse — the estimator a DQ fence actually wants. "
    "Bit-determinism: both medians are TRUE discrete quantiles "
    "(approx_percentile at accuracy 1e7 >> group sizes == DuckDB "
    "quantile_disc, the round-4-certified pattern), so med/mad are "
    "actual data doubles; |x - med| is one exact-rounded IEEE sub; the "
    "fence compare is identical doubles on both engines. Scale: two "
    "sketch-mergeable percentile passes + one counting pass, all "
    "map-side combined; the deviation pass re-reads the base scan "
    "twice rather than caching a corpus-sized intermediate",
    tags=("dq", "analytics", "agg"),
)
def q_dq_robust_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    from join_example_spark.sources.readers import read_events

    ev = read_events(spark, sf_dir)
    med = ev.groupBy("event_type").agg(
        F.expr("approx_percentile(value, 0.5, 10000000)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "med", F.abs(F.col("value") - F.col("med")).alias("adev")
    )
    stats = dev.groupBy("event_type", "med").agg(
        F.expr("approx_percentile(adev, 0.5, 10000000)").alias("mad")
    )
    return (
        dev.join(F.broadcast(stats.select("event_type", "mad")), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(
                F.when(F.col("adev") > F.lit(4.4478) * F.col("mad"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


@register(
    "q_ts_concurrency",
    oracle="""
WITH ev AS (
    SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
), mk AS (
    SELECT user_id, event_id, ts_us,
           CASE WHEN LAG(ts_us) OVER w IS NULL
                     OR ts_us - LAG(ts_us) OVER w > 1800000000
                THEN 1 ELSE 0 END AS is_new
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
), isl AS (
    SELECT user_id, ts_us,
           SUM(is_new) OVER (
               PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
    FROM mk
), sess AS (
    SELECT user_id, island, MIN(ts_us) AS s, MAX(ts_us) AS e
    FROM isl GROUP BY user_id, island
), pieces AS (
    SELECT unnest(range(s // 86400000000, e // 86400000000 + 1)) AS day, s, e
    FROM sess
), clipped AS (
    SELECT day,
           GREATEST(s, day * 86400000000) AS ps,
           LEAST(e, (day + 1) * 86400000000 - 1) AS pe
    FROM pieces
), deltas AS (
    SELECT day, ps AS t, 1 AS d FROM clipped
    UNION ALL
    SELECT day, pe + 1 AS t, -1 AS d FROM clipped
), perts AS (
    SELECT day, t, SUM(d) AS d FROM deltas GROUP BY day, t
), run AS (
    SELECT day,
           SUM(d) OVER (PARTITION BY day ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cur
    FROM perts
), npd AS (
    SELECT day, COUNT(*) AS n_sessions FROM clipped GROUP BY day
)
SELECT CAST(r.day AS BIGINT) AS day,
       CAST(n.n_sessions AS BIGINT) AS n_sessions,
       CAST(MAX(r.cur) AS BIGINT) AS max_concurrent
FROM run r JOIN npd n USING (day)
GROUP BY r.day, n.n_sessions
""",
    note="sweep-line interval concurrency: 30-minute-gap sessions per "
    "user (gaps-and-islands), clipped to UTC epoch-day pieces, then the "
    "classic +1/-1 boundary sweep with a per-day running sum — max "
    "concurrent active sessions per day plus the day's session count, "
    "the capacity-planning number a plain per-hour COUNT can't give "
    "(overlap, not volume). All-integer microsecond arithmetic, "
    "bit-deterministic: boundary deltas are pre-aggregated per (day, "
    "timestamp) so the running sum is over a unique total order. Scale "
    "shape: keyed session windows, a <=days-spanned explode, and the "
    "sweep partitions by DAY (bounded rows per partition — never one "
    "global unpartitioned running sum over all boundaries; day "
    "clipping is exactly what makes the sweep parallel at 100 TB)",
    tags=("temporal", "analytics", "window"),
)
def q_ts_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    day_us = 86_400_000_000
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    marked = ev.withColumn(
        "is_new",
        F.when(
            F.lag("ts_us").over(w).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(w) > 1_800_000_000),
            1,
        ).otherwise(0),
    )
    wrun = Window.partitionBy("user_id").orderBy("ts_us", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    isl = marked.withColumn("island", F.sum("is_new").over(wrun))
    sess = isl.groupBy("user_id", "island").agg(
        F.min("ts_us").alias("s"), F.max("ts_us").alias("e")
    )
    clipped = sess.select(
        F.explode(
            F.expr(f"sequence(s DIV {day_us}, e DIV {day_us})")
        ).alias("day"),
        "s",
        "e",
    ).select(
        "day",
        F.expr(f"GREATEST(s, day * {day_us})").alias("ps"),
        F.expr(f"LEAST(e, (day + 1) * {day_us} - 1)").alias("pe"),
    )
    deltas = clipped.select("day", F.col("ps").alias("t"), F.lit(1).alias("d")).unionByName(
        clipped.select("day", (F.col("pe") + 1).alias("t"), F.lit(-1).alias("d"))
    )
    perts = deltas.groupBy("day", "t").agg(F.sum("d").alias("d"))
    wday = Window.partitionBy("day").orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    run = perts.withColumn("cur", F.sum("d").over(wday))
    npd = clipped.groupBy("day").agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions"))
    return (
        run.groupBy("day")
        .agg(F.max("cur").cast("bigint").alias("max_concurrent"))
        .join(npd, "day")
        .select(
            F.col("day").cast("bigint").alias("day"),
            "n_sessions",
            "max_concurrent",
        )
    )


@register(
    "q_ts_trend",
    oracle="""
WITH per AS (
    SELECT event_type, epoch_us(ts) // 60000000 AS m,
           CAST(COUNT(*) AS BIGINT) AS y
    FROM events GROUP BY 1, 2
), bounds AS (SELECT MIN(m) AS mn, MAX(m) AS mx FROM per),
types AS (SELECT DISTINCT event_type FROM events),
spine AS (
    SELECT t.event_type, unnest(range(b.mn, b.mx + 1)) AS m, b.mn
    FROM types t CROSS JOIN bounds b
), series AS (
    SELECT s.event_type, s.m - s.mn AS x, COALESCE(p.y, CAST(0 AS BIGINT)) AS y
    FROM spine s
    LEFT JOIN per p ON p.event_type = s.event_type AND p.m = s.m
), moments AS (
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS sx,
           CAST(SUM(y) AS BIGINT) AS sy,
           CAST(SUM(x * y) AS BIGINT) AS sxy,
           CAST(SUM(x * x) AS BIGINT) AS sxx,
           CAST(SUM(y * y) AS BIGINT) AS syy
    FROM series GROUP BY event_type
)
SELECT event_type, n,
       CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
       (CAST(sy AS DOUBLE)
        - (CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
           / CAST(n AS DOUBLE) AS intercept,
       (CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE))
           / (CAST(n * sxx - sx * sx AS DOUBLE)
              * CAST(n * syy - sy * sy AS DOUBLE)) AS r2
FROM moments
""",
    note="per-type linear trend (OLS slope/intercept/r2) of the gap-filled "
    "per-minute count series — the volume-trend detector behind 'is "
    "traffic growing/decaying and how fast'. ZERO float accumulation: "
    "all five moments are BIGINT sums over integer (minute-index, count) "
    "pairs (x re-based to m - mn so n*sxx stays ~1e18 max, inside "
    "int64), and slope/intercept/r2 are closing IEEE expressions of "
    "identical integer operands with identical trees on both engines "
    "(the numerator square is computed in DOUBLE — num^2 would overflow "
    "int64). Same exact-moment discipline as q_ts_rolling_corr, global "
    "fit instead of rolling. One rollup + a broadcast spine join + one "
    "5-row aggregate",
    tags=("temporal", "analytics", "agg"),
)
def q_ts_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from join_example_spark.sources.readers import read_events

    ev = read_events(spark, sf_dir)
    # `per` feeds bounds, types, and the spine join — materialize the
    # tiny minute rollup once; the type set equals per's (any type with
    # an event has a minute cell), so the raw stream is read ONCE
    # (SCALE.md §3.4 rule).
    per = (
        ev.groupBy(
            "event_type", F.expr("unix_micros(ts) DIV 60000000").alias("m")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
        .localCheckpoint(eager=True)
    )
    bounds = per.agg(F.min("m").alias("mn"), F.max("m").alias("mx"))
    types = per.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(bounds)).select(
        "event_type", F.explode(F.expr("sequence(mn, mx)")).alias("m"), "mn"
    )
    series = spine.join(per, ["event_type", "m"], "left").select(
        "event_type",
        (F.col("m") - F.col("mn")).alias("x"),
        F.coalesce("y", F.lit(0).cast("bigint")).alias("y"),
    )
    mom = series.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    deny = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    slope = num / den
    return mom.select(
        "event_type",
        "n",
        slope.alias("slope"),
        (
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / F.col("n").cast("double")
        ).alias("intercept"),
        ((num * num) / (den * deny)).alias("r2"),
    )


@register(
    "q_resample_locf",
    oracle="""
WITH ev AS (
    SELECT event_type, event_id, value, epoch_us(ts) // 60000000 AS m,
           epoch_us(ts) AS t
    FROM events
), lastin AS (
    SELECT event_type, m, value FROM (
        SELECT event_type, m, value,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type, m
                   ORDER BY t DESC, event_id DESC) AS rn
        FROM ev
    ) WHERE rn = 1
), bounds AS (SELECT MIN(m) AS mn, MAX(m) AS mx FROM ev),
types AS (SELECT DISTINCT event_type FROM events),
spine AS (
    SELECT t.event_type, unnest(range(b.mn, b.mx + 1)) AS m
    FROM types t CROSS JOIN bounds b
), series AS (
    SELECT s.event_type, s.m, l.value AS v
    FROM spine s
    LEFT JOIN lastin l ON l.event_type = s.event_type AND l.m = s.m
)
SELECT event_type, CAST(m AS BIGINT) AS m,
       last_value(v IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY m
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled,
       v IS NULL AS is_gap
FROM series
""",
    note="LOCF (last observation carried forward) resampling onto the "
    "gap-filled minute spine: per (type, minute) the LAST reading of the "
    "minute (full (ts, event_id) total order), empty minutes forward-"
    "filled with last_value IGNORE NULLS — the step-function "
    "materialization that turns an irregular gauge stream into a "
    "regular series downstream models can consume; is_gap marks "
    "carried vs observed. Values pass through VERBATIM (no arithmetic "
    "at all), so determinism reduces to the two total orders. Leading "
    "minutes before a type's first reading stay NULL by design. Window "
    "partitions by type (bounded by time span, never one global "
    "order); at 100 TB the per-minute pick is a keyed aggregate and "
    "the fill runs per type-partition",
    tags=("temporal", "analytics", "window"),
)
def q_resample_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from join_example_spark.sources.readers import read_events

    ev = read_events(spark, sf_dir).select(
        "event_type",
        "event_id",
        "value",
        F.expr("unix_micros(ts) DIV 60000000").alias("m"),
        F.unix_micros("ts").alias("t"),
    )
    wpick = Window.partitionBy("event_type", "m").orderBy(
        F.col("t").desc(), F.col("event_id").desc()
    )
    # The last-in-minute table feeds bounds, types, AND the spine join;
    # its minute/type span equals the raw stream's (every event's minute
    # has a winner), so materializing it once makes the raw stream read
    # ONCE instead of three times (SCALE.md §3.4 rule).
    lastin = (
        ev.withColumn("rn", F.row_number().over(wpick))
        .where(F.col("rn") == 1)
        .select("event_type", "m", F.col("value").alias("v"))
        .localCheckpoint(eager=True)
    )
    bounds = lastin.agg(F.min("m").alias("mn"), F.max("m").alias("mx"))
    types = lastin.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(bounds)).select(
        "event_type", F.explode(F.expr("sequence(mn, mx)")).alias("m")
    )
    series = spine.join(lastin, ["event_type", "m"], "left")
    wfill = Window.partitionBy("event_type").orderBy("m").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return series.select(
        "event_type",
        F.col("m").cast("bigint").alias("m"),
        F.last("v", ignorenulls=True).over(wfill).alias("value_filled"),
        F.col("v").isNull().alias("is_gap"),
    )


#: Exact dyadic Holt (alpha = beta = 1/2, zero-init, 8-minute window)
#: coefficients of x_1..x_8 (x_8 = current) in the 3-step-ahead forecast
#: l + 3b, scaled by 2^16. Derived symbolically with exact Fractions
#: (tools-free: the recurrence halves at each step, so every coefficient
#: is a dyadic rational with denominator dividing 2^16); asserted integer
#: at generation time.
_HOLT_WF = (-5983, -11180, -15984, -17600, -12032, 5120, 36864, 81920)
_HOLT_ARR_DUCK = "[" + ", ".join(f"CAST({w} AS BIGINT)" for w in _HOLT_WF) + "]"


@register(
    "q_ts_holt_forecast",
    oracle=f"""
WITH per AS (
    SELECT event_type, epoch_us(ts) // 60000000 AS m,
           CAST(COUNT(*) AS BIGINT) AS x
    FROM events GROUP BY 1, 2
), bounds AS (SELECT MIN(m) AS mn, MAX(m) AS mx FROM per),
types AS (SELECT DISTINCT event_type FROM events),
spine AS (
    SELECT t.event_type, unnest(range(b.mn, b.mx + 1)) AS m
    FROM types t CROSS JOIN bounds b
), series AS (
    SELECT s.event_type, s.m, COALESCE(p.x, CAST(0 AS BIGINT)) AS x
    FROM spine s
    LEFT JOIN per p ON p.event_type = s.event_type AND p.m = s.m
), contrib AS (
    SELECT s.event_type, s.m + u.k AS t,
           s.x * ({_HOLT_ARR_DUCK}[8 - u.k]) AS c
    FROM series s CROSS JOIN (SELECT unnest(range(0, 8)) AS k) u
)
SELECT event_type,
       CAST(t AS BIGINT) AS win_end_m,
       CAST(SUM(c) AS DOUBLE) / 65536.0 AS forecast_3m
FROM contrib
GROUP BY event_type, t
HAVING COUNT(*) = 8
""",
    note="Holt's linear-trend 3-minute-ahead forecast (alpha = beta = "
    "1/2, zero-init, truncated 8-minute window) of each type's "
    "per-minute count series — the level+trend upgrade of q_ts_ewma "
    "that extrapolates instead of just smoothing. The halving "
    "recurrence makes every coefficient of l + 3b a dyadic rational "
    "with denominator dividing 2^16, so the forecast is a BIGINT "
    "weighted sum (integer coefficient table, derived symbolically "
    "with exact Fractions and embedded as literals on BOTH sides) "
    "followed by one exact power-of-two division: bit-exact, zero "
    "rounding, zero float accumulation — the same dyadic-weight trick "
    "as q_ts_ewma extended to a two-state recurrence. Complete windows "
    "only; one rollup + an 8x map-side contribution explode + one "
    "grouped sum, no window operator at all",
    tags=("temporal", "analytics", "window"),
)
def q_ts_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    from join_example_spark.operators.temporal import dyadic_weighted_series
    from join_example_spark.sources.readers import read_events

    ev = read_events(spark, sf_dir)
    per = ev.groupBy(
        "event_type", F.expr("unix_micros(ts) DIV 60000000").alias("m")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    # _HOLT_WF is indexed by step (x_1..x_8, x_8 = window end); the shared
    # operator wants weight-by-offset-before-end, i.e. the reverse.
    return dyadic_weighted_series(
        per, tuple(reversed(_HOLT_WF)), 65536.0, "forecast_3m"
    )


@register(
    "q_ts_seasonal",
    oracle="""
WITH per AS (
    SELECT event_type,
           CAST(EXTRACT(HOUR FROM ts) AS BIGINT) AS hour,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           SUM(CAST(value AS DECIMAL(25,6))) AS sum_dec
    FROM events GROUP BY 1, 2
), tot AS (
    SELECT event_type,
           CAST(SUM(n_events) AS BIGINT) AS tot_n,
           CAST(SUM(sum_dec) AS DECIMAL(38,6)) AS tot_dec
    FROM per GROUP BY 1
)
SELECT p.event_type, p.hour, p.n_events,
       CAST(p.sum_dec AS DOUBLE) / CAST(p.n_events AS DOUBLE) AS hour_avg,
       CAST(p.sum_dec AS DOUBLE) / CAST(p.n_events AS DOUBLE)
         - CAST(t.tot_dec AS DOUBLE) / CAST(t.tot_n AS DOUBLE) AS seasonal_dev,
       CAST(p.n_events * 24 AS DOUBLE) / CAST(t.tot_n AS DOUBLE) AS load_share
FROM per p JOIN tot t ON p.event_type = t.event_type
""",
    note="hour-of-day SEASONAL PROFILE per event type (classical "
    "decomposition's seasonal component over the diurnal period): "
    "per-(type, hour) event count, mean value, deviation from the "
    "type's global mean, and the hour's share of daily load (x24 so "
    "flat = 1.0). Determinism: per-cell decimal-bridged sums (exact, "
    "order-free), every output a single int/decimal->double cast and "
    "one IEEE division/subtraction of identically-derived operands — "
    "sums stay ~1e13 micro-units at sf0.1, far under the wide-decimal "
    "double-rounding bound. Scale shape: ONE rollup shuffle to "
    "(type, hour) — 24 x |types| cells — with per-type totals as "
    "windows over that tiny cell table (one subplan reference; the "
    "groupBy+join form re-executed the corpus rollup); no window over "
    "the raw stream, trivially streaming-maintainable as keyed running "
    "sums",
    tags=("temporal", "analytics"),
)
def q_ts_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from join_example_spark.sources.readers import read_events

    ev = read_events(spark, sf_dir)
    per = ev.groupBy(
        "event_type", F.hour("ts").cast("bigint").alias("hour")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.expr("SUM(CAST(value AS DECIMAL(25,6)))").alias("sum_dec"),
    )
    # Per-type totals as windows over the tiny 24x|types| cell table — a
    # groupBy+join here would reference `per` twice and re-execute the
    # corpus rollup (SCALE.md §3.4 rule).
    from pyspark.sql import Window

    w_type = Window.partitionBy("event_type")
    tot = per.select(
        "event_type",
        "hour",
        "n_events",
        "sum_dec",
        F.sum("n_events").over(w_type).cast("bigint").alias("tot_n"),
        F.sum("sum_dec").over(w_type).cast("decimal(38,6)").alias("tot_dec"),
    )
    hour_avg = F.col("sum_dec").cast("double") / F.col("n_events").cast("double")
    glob_avg = F.col("tot_dec").cast("double") / F.col("tot_n").cast("double")
    return tot.select(
        "event_type",
        "hour",
        "n_events",
        hour_avg.alias("hour_avg"),
        (hour_avg - glob_avg).alias("seasonal_dev"),
        (
            (F.col("n_events") * F.lit(24)).cast("double")
            / F.col("tot_n").cast("double")
        ).alias("load_share"),
    )


@register(
    "q_events_attribution",
    oracle="""
WITH marked AS (
    SELECT user_id, ts, event_id, event_type,
           CASE WHEN event_type IN ('click', 'view') THEN event_type END AS touch,
           CASE WHEN event_type IN ('click', 'view') THEN ts END AS touch_ts
    FROM events
), lasts AS (
    SELECT event_type, ts,
           LAST_VALUE(touch IGNORE NULLS) OVER w AS last_touch,
           LAST_VALUE(touch_ts IGNORE NULLS) OVER w AS last_touch_ts
    FROM marked
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
), attributed AS (
    SELECT CASE WHEN last_touch_ts IS NOT NULL
                 AND last_touch_ts >= ts - INTERVAL 30 MINUTE
                THEN last_touch ELSE '(none)' END AS touch_type
    FROM lasts
    WHERE event_type = 'purchase'
), per AS (
    SELECT touch_type, CAST(COUNT(*) AS BIGINT) AS n_purchases
    FROM attributed GROUP BY touch_type
), total AS (
    SELECT CAST(SUM(n_purchases) AS BIGINT) AS n_total FROM per
)
SELECT touch_type, n_purchases,
       CAST(n_purchases AS DOUBLE) / CAST(n_total AS DOUBLE) AS share
FROM per, total
""",
    note="LAST-TOUCH attribution: each purchase is credited to the same "
    "user's most recent preceding click/view, but only when that touch "
    "happened within the 30-minute lookback — otherwise '(none)'. The "
    "windowed-join-free formulation: one IGNORE-NULLS last_value window "
    "per user over a (ts, event_id) total order carries the latest touch "
    "type AND its timestamp forward, the lookback is a row-local "
    "interval comparison, and the rollup is a 3-row hash-agg whose total "
    "is a window over it — one subplan reference, no re-execution "
    "(share = one exact int64/int64 IEEE division). Scale shape: "
    "exactly one shuffle (the user_id window); no self-join of the "
    "events table against itself, which is how attribution is usually "
    "(quadratically) written",
    tags=("window", "behavioral"),
)
def q_events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    is_touch = F.col("event_type").isin("click", "view")
    marked = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(is_touch, F.col("event_type")).alias("touch"),
        F.when(is_touch, F.col("ts")).alias("touch_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lasts = marked.select(
        "event_type",
        "ts",
        F.last("touch", ignorenulls=True).over(w).alias("last_touch"),
        F.last("touch_ts", ignorenulls=True).over(w).alias("last_touch_ts"),
    )
    attributed = lasts.where(F.col("event_type") == "purchase").select(
        F.when(
            F.col("last_touch_ts").isNotNull()
            & (F.col("last_touch_ts") >= F.col("ts") - F.expr("INTERVAL 30 MINUTE")),
            F.col("last_touch"),
        )
        .otherwise(F.lit("(none)"))
        .alias("touch_type")
    )
    per = attributed.groupBy("touch_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_purchases")
    )
    # Total as an unpartitioned window over the ALREADY-AGGREGATED 3-row
    # relation — an agg+crossJoin here would reference `per` twice and
    # re-execute the whole events window pipeline (SCALE.md §3.4 rule).
    n_total = F.sum("n_purchases").over(Window.partitionBy()).cast("bigint")
    return per.select(
        "touch_type",
        "n_purchases",
        (F.col("n_purchases").cast("double") / n_total.cast("double")).alias(
            "share"
        ),
    )


@register(
    "q_ts_changepoint",
    oracle="""
WITH daily AS (
    SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM events
    GROUP BY 1, 2
), spine AS (
    SELECT event_type, day, c,
           CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS m,
           CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS total,
           CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
                AS BIGINT) AS i,
           CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum
    FROM daily
), stat AS (
    SELECT event_type, day, m, total,
           ABS(m * cum - i * total) AS s_abs,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY ABS(m * cum - i * total) DESC, day)
               AS rn
    FROM spine
)
SELECT event_type, day AS cp_day, m AS n_days, total AS total_events,
       CAST(s_abs AS BIGINT) AS s_abs,
       CAST(s_abs AS DOUBLE) / CAST(m * total AS DOUBLE) AS stat
FROM stat WHERE rn = 1
""",
    note="CUSUM changepoint detection (Page 1954) on the per-type daily "
    "event-count series, kept INTEGER-EXACT: the classic statistic "
    "max_i |cum_i - i*mean| needs the rational mean total/m, so both "
    "sides are scaled by m — S_i = m*cum_i - i*total is a pure int64 "
    "(|S| <= m*total, safe to ~3e15 at 10 years x 1e12 events) and the "
    "argmax is a (|S| DESC, day) row_number with a total-order tiebreak; "
    "the normalized statistic in [0, 1) is one closing int64/int64 IEEE "
    "division. Flags the day the level of a series most likely shifted "
    "— the monitoring primitive behind 'did the producer change on the "
    "14th?'. Scale shape: the daily rollup is the only corpus-sized "
    "work; every window runs over the tiny (type x day) spine",
    tags=("temporal", "window", "quality"),
)
def q_ts_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from join_example_spark.sources.readers import read_events

    ev = read_events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    wt = Window.partitionBy("event_type")
    wo = Window.partitionBy("event_type").orderBy("day")
    spine = daily.select(
        "event_type",
        "day",
        F.count(F.lit(1)).over(wt).cast("bigint").alias("m"),
        F.sum("c").over(wt).cast("bigint").alias("total"),
        F.row_number().over(wo).cast("bigint").alias("i"),
        F.sum("c")
        .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint")
        .alias("cum"),
    )
    s_abs = F.abs(F.col("m") * F.col("cum") - F.col("i") * F.col("total"))
    stat = spine.select(
        "event_type",
        "day",
        "m",
        "total",
        s_abs.alias("s_abs"),
        F.row_number()
        .over(
            Window.partitionBy("event_type").orderBy(
                s_abs.desc(), F.col("day")
            )
        )
        .alias("rn"),
    )
    return stat.where(F.col("rn") == 1).select(
        "event_type",
        F.col("day").alias("cp_day"),
        F.col("m").alias("n_days"),
        F.col("total").alias("total_events"),
        F.col("s_abs").cast("bigint").alias("s_abs"),
        (
            F.col("s_abs").cast("double")
            / (F.col("m") * F.col("total")).cast("double")
        ).alias("stat"),
    )


@register(
    "q_orders_rfm",
    oracle="""
WITH per_cust AS (
    SELECT o_custkey,
           CAST(date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                (SELECT CAST(MAX(o_orderdate) AS DATE) FROM orders))
               AS BIGINT) AS recency_days,
           CAST(COUNT(*) AS BIGINT) AS frequency,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(25,6)) * 1000000
                         AS BIGINT)) AS BIGINT) AS monetary_micros
    FROM orders
    GROUP BY o_custkey
), scored AS (
    SELECT o_custkey, recency_days, frequency, monetary_micros,
           NTILE(5) OVER (ORDER BY recency_days ASC, o_custkey) AS r_score,
           NTILE(5) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
           NTILE(5) OVER (ORDER BY monetary_micros DESC, o_custkey) AS m_score
    FROM per_cust
)
SELECT CAST(r_score AS BIGINT) AS r_score,
       CAST(f_score AS BIGINT) AS f_score,
       CAST(m_score AS BIGINT) AS m_score,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(monetary_micros) AS DOUBLE)
           / CAST(1000000 * COUNT(*) AS DOUBLE) AS avg_monetary
FROM scored
GROUP BY 1, 2, 3
""",
    note="RFM customer segmentation (the classic CRM cube): per customer "
    "recency in whole days vs the corpus max order date, order count, "
    "and monetary integerized LOSSLESSLY to micro-units (pure-BIGINT "
    "accumulation — the wide-DECIMAL→DOUBLE bridge is 1-ulp unstable "
    "across engines; at cluster scale drop to cents for 4 more orders "
    "of headroom); each dimension is cut into "
    "quintiles with NTILE(5) under a TOTAL order (metric, custkey — "
    "NTILE ties are partition-order-dependent without one), then the "
    "125-cell segment rollup with one exact int64/int64 closing "
    "division. Scale shape: "
    "one custkey shuffle for the profile, three window sorts over the "
    "CUSTOMER dimension (1e9 rows at 100 TB — sortable; the scale rung "
    "is approx_percentile cut points broadcast as a 4-value map-side "
    "bucketizer, same output contract), 125-row final agg",
    tags=("window", "agg", "behavioral"),
)
def q_orders_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = read_table(spark, sf_dir, "orders")
    micros = F.expr(
        "CAST(CAST(o_totalprice AS DECIMAL(25,6)) * 1000000 AS BIGINT)"
    )
    # The corpus max order date is MAX over the per-customer maxes — an
    # unpartitioned window over the CUSTOMER spine, so `orders` is read
    # once (a separate agg+crossJoin would scan it twice, SCALE.md §3.4).
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.max(F.col("o_orderdate").cast("date")).alias("last_day"),
            F.count(F.lit(1)).cast("bigint").alias("frequency"),
            F.sum(micros).cast("bigint").alias("monetary_micros"),
        )
        .select(
            "o_custkey",
            F.datediff(
                F.max("last_day").over(Window.partitionBy()), F.col("last_day")
            )
            .cast("bigint")
            .alias("recency_days"),
            "frequency",
            "monetary_micros",
        )
    )
    scored = per_cust.select(
        "monetary_micros",
        F.ntile(5)
        .over(Window.orderBy(F.col("recency_days").asc(), F.col("o_custkey")))
        .cast("bigint")
        .alias("r_score"),
        F.ntile(5)
        .over(Window.orderBy(F.col("frequency").desc(), F.col("o_custkey")))
        .cast("bigint")
        .alias("f_score"),
        F.ntile(5)
        .over(
            Window.orderBy(F.col("monetary_micros").desc(), F.col("o_custkey"))
        )
        .cast("bigint")
        .alias("m_score"),
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        (
            F.sum("monetary_micros").cast("double")
            / (F.lit(1000000).cast("bigint") * F.count(F.lit(1))).cast("double")
        ).alias("avg_monetary"),
    )


@register(
    "q_orders_basket",
    oracle="""
WITH baskets AS (
    SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS brand
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
), n AS (
    SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_orders FROM baskets
), brand_n AS (
    SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_brand FROM baskets GROUP BY brand
), pairs AS (
    SELECT a.brand AS brand_a, b.brand AS brand_b,
           CAST(COUNT(*) AS BIGINT) AS n_both
    FROM baskets a JOIN baskets b ON a.ok = b.ok AND a.brand < b.brand
    GROUP BY 1, 2
)
SELECT p.brand_a, p.brand_b, p.n_both, na.n_brand AS n_a, nb.n_brand AS n_b,
       CAST(p.n_both * n.n_orders AS DOUBLE)
           / CAST(na.n_brand * nb.n_brand AS DOUBLE) AS lift
FROM pairs p
JOIN brand_n na ON na.brand = p.brand_a
JOIN brand_n nb ON nb.brand = p.brand_b
CROSS JOIN n
ORDER BY p.n_both DESC, p.brand_a, p.brand_b
LIMIT 20
""",
    note="market-basket association mining (the support/lift half of "
    "Apriori): top-20 co-purchased BRAND pairs across orders, with lift "
    "= (n_both*N)/(n_a*n_b) — numerator and denominator are exact int64 "
    "products (int64→double conversion is correctly rounded on both "
    "engines even past 2^53, so the one closing division is "
    "bit-stable), total-order (support, brand_a, brand_b) tiebreak. "
    "Scale shape: the basket self-join fans out by ITEMSET SIZE, not "
    "corpus size (TPC-H orders hold ≤ 13 distinct brands → ≤ 78 pairs "
    "per order — the boundedness that makes market-basket joins safe "
    "where document all-pairs joins are not); brand stats and the "
    "order count broadcast; top-20 is TakeOrderedAndProject. The part "
    "dimension join is a broadcast-hash join (25-brand dim)",
    tags=("join", "agg", "behavioral"),
)
def q_orders_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # `baskets` is referenced four times (order count, brand counts, both
    # self-join sides) — eager localCheckpoint executes the scan+distinct
    # once instead of four times (the sanctioned SCALE.md §3.4 pattern,
    # executor-side, no driver data).
    baskets = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = baskets.agg(F.countDistinct("ok").cast("bigint").alias("n_orders"))
    brand_n = baskets.groupBy("brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_brand")
    )
    a = baskets.select(F.col("ok"), F.col("brand").alias("brand_a"))
    b = baskets.select(F.col("ok"), F.col("brand").alias("brand_b"))
    pairs = (
        a.join(b, "ok")
        .where(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
    )
    na = brand_n.select(
        F.col("brand").alias("brand_a"), F.col("n_brand").alias("n_a")
    )
    nb = brand_n.select(
        F.col("brand").alias("brand_b"), F.col("n_brand").alias("n_b")
    )
    out = (
        pairs.join(F.broadcast(na), "brand_a")
        .join(F.broadcast(nb), "brand_b")
        .crossJoin(F.broadcast(n))
        .select(
            "brand_a",
            "brand_b",
            "n_both",
            "n_a",
            "n_b",
            (
                (F.col("n_both") * F.col("n_orders")).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double")
            ).alias("lift"),
        )
    )
    return out.orderBy(
        F.col("n_both").desc(), "brand_a", "brand_b"
    ).limit(20)


@register(
    "q_supplier_pareto",
    oracle="""
WITH rev AS (
    SELECT l_suppkey AS suppkey,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(25,6)) * 1000000
                         AS BIGINT)) AS BIGINT) AS rev_micros
    FROM lineitem
    GROUP BY l_suppkey
), ranked AS (
    SELECT suppkey, rev_micros,
           CAST(ROW_NUMBER() OVER (ORDER BY rev_micros DESC, suppkey)
                AS BIGINT) AS rnk,
           CAST(SUM(rev_micros) OVER (ORDER BY rev_micros DESC, suppkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_micros,
           CAST(SUM(rev_micros) OVER () AS BIGINT) AS total_micros,
           CAST(COUNT(*) OVER () AS BIGINT) AS n_suppliers
    FROM rev
), classed AS (
    SELECT *,
           CASE WHEN 5 * (cum_micros - rev_micros) < 4 * total_micros
                THEN 'A'
                WHEN 20 * (cum_micros - rev_micros) < 19 * total_micros
                THEN 'B' ELSE 'C' END AS abc_class
    FROM ranked
)
SELECT abc_class,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(MIN(rnk) AS BIGINT) AS first_rank,
       CAST(MAX(rnk) AS BIGINT) AS last_rank,
       CAST(SUM(rev_micros) AS BIGINT) AS class_rev_micros,
       CAST(SUM(rev_micros) AS DOUBLE) / CAST(MAX(total_micros) AS DOUBLE)
           AS rev_share
FROM classed
GROUP BY abc_class
""",
    note="Pareto / ABC supplier analysis (the 80/20 cut): suppliers "
    "ranked by revenue (integerized losslessly to micro-units — "
    "pure-BIGINT cumulative sums, no decimal-bridge divergence), class "
    "A = every supplier whose PRECEDING cumulative share is < 80% "
    "(integer cross-multiply 5*(cum-rev) < 4*total, no division in the "
    "classifier), B to 95%, C the tail; output is the 3-row class "
    "summary with exact revenue shares. The inventory-policy primitive "
    "behind 'which 20% of suppliers carry 80% of spend'. Scale shape: "
    "one suppkey rollup is the corpus-sized work; the ranking windows "
    "run over the SUPPLIER dimension (broadcastable; same "
    "approx-percentile rung as RFM if the dimension sort is unwanted)",
    tags=("window", "agg", "behavioral"),
)
def q_supplier_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = read_table(spark, sf_dir, "lineitem")
    micros = F.expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(25,6)) * 1000000 AS BIGINT)"
    )
    rev = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.sum(micros).cast("bigint").alias("rev_micros")
    )
    w_ord = Window.orderBy(F.col("rev_micros").desc(), F.col("suppkey"))
    w_all = Window.partitionBy()
    ranked = rev.select(
        "suppkey",
        "rev_micros",
        F.row_number().over(w_ord).cast("bigint").alias("rnk"),
        F.sum("rev_micros")
        .over(w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint")
        .alias("cum_micros"),
        F.sum("rev_micros").over(w_all).cast("bigint").alias("total_micros"),
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("n_suppliers"),
    )
    before = F.col("cum_micros") - F.col("rev_micros")
    classed = ranked.withColumn(
        "abc_class",
        F.when(5 * before < 4 * F.col("total_micros"), F.lit("A"))
        .when(20 * before < 19 * F.col("total_micros"), F.lit("B"))
        .otherwise(F.lit("C")),
    )
    return classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
        F.min("rnk").cast("bigint").alias("first_rank"),
        F.max("rnk").cast("bigint").alias("last_rank"),
        F.sum("rev_micros").cast("bigint").alias("class_rev_micros"),
        (
            F.sum("rev_micros").cast("double")
            / F.max("total_micros").cast("double")
        ).alias("rev_share"),
    )


@register(
    "q_ts_autocorr",
    oracle="""
WITH daily AS (
    SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM events
    GROUP BY 1, 2
), spine AS (
    SELECT event_type, day, c,
           CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS m,
           CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS t
    FROM daily
), dev AS (
    SELECT event_type, day, m,
           m * c - t AS d,
           LAG(m * c - t, 1) OVER (PARTITION BY event_type ORDER BY day) AS d1,
           LAG(m * c - t, 7) OVER (PARTITION BY event_type ORDER BY day) AS d7
    FROM spine
)
SELECT event_type,
       CAST(MAX(m) AS BIGINT) AS n_days,
       CAST(SUM(d * d) AS BIGINT) AS den,
       CAST(SUM(CASE WHEN d1 IS NOT NULL THEN d * d1 ELSE 0 END) AS BIGINT)
           AS num_lag1,
       CAST(SUM(CASE WHEN d7 IS NOT NULL THEN d * d7 ELSE 0 END) AS BIGINT)
           AS num_lag7,
       CAST(SUM(CASE WHEN d1 IS NOT NULL THEN d * d1 ELSE 0 END) AS DOUBLE)
           / CAST(SUM(d * d) AS DOUBLE) AS acf1,
       CAST(SUM(CASE WHEN d7 IS NOT NULL THEN d * d7 ELSE 0 END) AS DOUBLE)
           / CAST(SUM(d * d) AS DOUBLE) AS acf7
FROM dev
GROUP BY event_type
""",
    note="INTEGER-EXACT sample autocorrelation (lag 1 and lag 7) of the "
    "per-type daily count series — the seasonality detector next to "
    "q_ts_seasonal's profile and q_ts_changepoint's level shift. The "
    "mean is rational (T/m), so deviations are scaled by m: d_i = "
    "m*c_i - T is pure int64, the lag products and the variance sum "
    "stay int64 (|d| <= m*max_c — at day-spine sizes these are ~1e8; "
    "the 100 TB rung is the same sums in DECIMAL(38,0), exact in both "
    "engines), and each ACF value is one closing int64/int64 IEEE "
    "division of bit-identical operands. LAG over the (type, day) "
    "total order is engine-identical. Scale shape: the daily rollup is "
    "the only corpus-sized work; windows run on the tiny day spine",
    tags=("temporal", "window"),
)
def q_ts_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from join_example_spark.sources.readers import read_events

    ev = read_events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    wt = Window.partitionBy("event_type")
    wo = Window.partitionBy("event_type").orderBy("day")
    spine = daily.select(
        "event_type",
        "day",
        "c",
        F.count(F.lit(1)).over(wt).cast("bigint").alias("m"),
        F.sum("c").over(wt).cast("bigint").alias("t"),
    )
    d = F.col("m") * F.col("c") - F.col("t")
    dev = spine.select(
        "event_type",
        "m",
        d.alias("d"),
        F.lag(d, 1).over(wo).alias("d1"),
        F.lag(d, 7).over(wo).alias("d7"),
    )
    num1 = F.sum(
        F.when(F.col("d1").isNotNull(), F.col("d") * F.col("d1")).otherwise(0)
    ).cast("bigint")
    num7 = F.sum(
        F.when(F.col("d7").isNotNull(), F.col("d") * F.col("d7")).otherwise(0)
    ).cast("bigint")
    den = F.sum(F.col("d") * F.col("d")).cast("bigint")
    return dev.groupBy("event_type").agg(
        F.max("m").cast("bigint").alias("n_days"),
        den.alias("den"),
        num1.alias("num_lag1"),
        num7.alias("num_lag7"),
        (num1.cast("double") / den.cast("double")).alias("acf1"),
        (num7.cast("double") / den.cast("double")).alias("acf7"),
    )
