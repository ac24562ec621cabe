"""§2.9 — streaming surface, declared as batch-equivalents.

Structured Streaming's correctness model *is* "the answer the batch query
would give on the prefix" (SIGMOD'18), so each streaming operator is
declared here as the batch query over the bounded ``events`` table; the
live micro-batch demos (file source → foreachBatch, watermarks, stateful
ops) live in ``join_example_spark.streaming`` and are unit-tested for
equivalence against these.

The flagship ``entry()`` query is also here: the reference-in-spirit
stream-enrichment join (events ⋈ customer) + event-time tumbling window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from join_example_spark.registry import register
from join_example_spark.sources.readers import read_events, read_table


@register(
    "q_flagship_daily_enrich",
    oracle="""
SELECT CAST(date_trunc('day', e.ts) AS DATE) AS day,
       c.c_mktsegment AS mktsegment,
       COUNT(*) AS n_events,
       CAST(SUM(CAST((e.value) AS DECIMAL(25,6))) AS DOUBLE) AS total_value
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
""",
    note="flagship: stream-enrichment join + event-time daily window "
    "(the Kafka Streams example's essence, idiomatic Spark)",
    tags=("flagship", "join", "streaming"),
)
def q_flagship_daily_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    customer = read_table(spark, sf_dir, "customer")
    return (
        events.join(F.broadcast(customer), events.user_id == customer.c_custkey)
        .groupBy(
            F.date_trunc("day", "ts").cast("date").alias("day"),
            F.col("c_mktsegment").alias("mktsegment"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr("CAST(SUM(CAST((value) AS DECIMAL(25,6))) AS DOUBLE)").alias(
                "total_value"
            ),
        )
    )


@register(
    "q_stream_tumbling",
    oracle="""
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST((value) AS DECIMAL(25,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""",
    note="windowedBy(TimeWindows.of(1d)): tumbling event-time window",
    tags=("streaming", "agg"),
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("CAST(SUM(CAST((value) AS DECIMAL(25,6))) AS DOUBLE)").alias(
                "total_value"
            ),
        )
        .select(
            F.col("w.start").cast("date").alias("day"),
            "event_type",
            "n",
            "total_value",
        )
    )


@register(
    "q_stream_sliding",
    oracle="""
SELECT make_timestamp((epoch_us(ts) // 21600000000 - i) * 21600000000) AS win_start,
       event_type,
       COUNT(*) AS n
FROM events
CROSS JOIN (SELECT unnest(range(4)) AS i) offsets
GROUP BY 1, 2
""",
    note="hopping window: 1-day windows sliding 6h (each event in 4 windows); "
    "oracle derives the 4 epoch-aligned window starts arithmetically",
    tags=("streaming", "agg"),
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 day", "6 hours").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n")
    )


@register(
    "q_stream_session",
    oracle="""
WITH g AS (
    SELECT user_id, ts, event_id, value,
           CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     > INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS brk
    FROM events
), s AS (
    SELECT user_id, ts, value,
           SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
    FROM g
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) AS last_event_ts,
       COUNT(*) AS n_events,
       CAST(SUM(CAST((value) AS DECIMAL(25,6))) AS DOUBLE) AS session_value
FROM s
GROUP BY user_id, sid
""",
    note="SessionWindows.with(30m): session_window op vs gaps-and-islands oracle. "
    "Boundary pinned by unit test: a gap of exactly 30:00 MERGES (Spark "
    "session_window semantics); a new session needs gap > 30min strictly",
    tags=("streaming", "agg", "temporal"),
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("last_event_ts"),
            F.count(F.lit(1)).alias("n_events"),
            F.expr("CAST(SUM(CAST((value) AS DECIMAL(25,6))) AS DOUBLE)").alias(
                "session_value"
            ),
        )
        .select("user_id", "session_start", "last_event_ts", "n_events", "session_value")
    )


@register(
    "q_stream_dedup",
    oracle="""
SELECT user_id, event_type, event_id, ts
FROM (
    SELECT user_id, event_type, event_id, ts,
           ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                              ORDER BY ts, event_id) AS rn
    FROM events
)
WHERE rn = 1
""",
    note="dropDuplicates semantics made deterministic: first event per "
    "(user_id, event_type) under (ts, event_id) order",
    tags=("streaming", "dedup"),
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        events.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts")
    )


@register(
    "q_resample_gapfill",
    oracle="""
WITH bounds AS (
    SELECT date_trunc('day', MIN(ts)) AS d0, date_trunc('day', MAX(ts)) AS d1
    FROM events
), days AS (
    SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day FROM bounds
), daily AS (
    SELECT date_trunc('day', ts) AS day,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total
    FROM events
    WHERE event_type = 'purchase' AND value > 300.0
    GROUP BY 1
)
SELECT CAST(days.day AS DATE) AS day,
       COALESCE(daily.n, 0) AS n,
       ROUND(COALESCE(daily.total, 0.0), 4) AS total
FROM days LEFT JOIN daily ON days.day = daily.day
""",
    note="time-series resample with gap-fill: generate the complete day "
    "spine (sequence/generate_series), left-join sparse aggregates, fill "
    "zeros — the hypertable-rollup idiom; days with no purchases appear "
    "explicitly. The spine is generated from bounds, not hardcoded",
    tags=("temporal", "agg", "streaming"),
)
def q_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events(spark, sf_dir)
    bounds = ev.agg(
        F.expr("date_trunc('day', MIN(ts))").alias("d0"),
        F.expr("date_trunc('day', MAX(ts))").alias("d1"),
    )
    # The spine is tiny (one row per day) — broadcast to the daily aggs.
    days = bounds.select(
        F.explode(F.expr("sequence(d0, d1, INTERVAL 1 DAY)")).alias("day")
    )
    daily = (
        ev.where((F.col("event_type") == "purchase") & (F.col("value") > 300.0))
        .groupBy(F.expr("date_trunc('day', ts)").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE)").alias("total"),
        )
    )
    return days.join(daily, "day", "left").select(
        F.col("day").cast("date").alias("day"),
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
        F.round(F.coalesce("total", F.lit(0.0)), 4).alias("total"),
    )


@register(
    "q_funnel_stages",
    oracle="""
WITH v AS (
    SELECT user_id, MIN(ts) AS t_view
    FROM events WHERE event_type = 'view' GROUP BY user_id
), c AS (
    SELECT e.user_id, MIN(e.ts) AS t_click
    FROM events e JOIN v ON e.user_id = v.user_id
    WHERE e.event_type = 'click'
      AND e.ts > v.t_view AND e.ts <= v.t_view + INTERVAL 24 HOUR
    GROUP BY e.user_id
), p AS (
    SELECT e.user_id, MIN(e.ts) AS t_purchase
    FROM events e JOIN c ON e.user_id = c.user_id
    WHERE e.event_type = 'purchase'
      AND e.ts > c.t_click AND e.ts <= c.t_click + INTERVAL 24 HOUR
    GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM v) AS n_view,
       (SELECT COUNT(*) FROM c) AS n_view_click,
       (SELECT COUNT(*) FROM p) AS n_view_click_purchase
""",
    note="event funnel with conversion windows: first view -> click within "
    "24h -> purchase within 24h of that click; each stage is one keyed "
    "aggregate joined to the previous stage's first-event time",
    tags=("temporal", "agg", "funnel"),
)
def q_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events(spark, sf_dir)
    # Each stage table feeds BOTH the next stage's join and its own count
    # — eager localCheckpoint of the tiny per-user tables keeps each
    # stage's corpus pass from executing twice (SCALE.md §3.4 rule; plan
    # went from 6 events scans to the 3-filtered-scan floor).
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
        .localCheckpoint(eager=True)
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(
            (F.col("ts") > F.col("t_view"))
            & (F.col("ts") <= F.expr("t_view + INTERVAL 24 HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
        .localCheckpoint(eager=True)
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(
            (F.col("ts") > F.col("t_click"))
            & (F.col("ts") <= F.expr("t_click + INTERVAL 24 HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_view_click")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_view_click_purchase")))
    )


@register(
    "q_cohort_retention",
    oracle="""
WITH firsts AS (
    SELECT user_id, CAST(date_trunc('day', MIN(ts)) AS DATE) AS cohort_day
    FROM events GROUP BY user_id
), activity AS (
    SELECT DISTINCT e.user_id,
           f.cohort_day,
           datediff('day', f.cohort_day, CAST(date_trunc('day', e.ts) AS DATE))
               AS day_offset
    FROM events e JOIN firsts f ON e.user_id = f.user_id
)
SELECT cohort_day, day_offset, COUNT(*) AS n_users
FROM activity
WHERE day_offset <= 7
GROUP BY cohort_day, day_offset
""",
    note="cohort retention: users bucketed by first-seen day, counted on "
    "each later activity day (offset <= 7); the cohort dim joins back "
    "broadcast at scale",
    tags=("temporal", "agg", "cohort"),
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events(spark, sf_dir)
    firsts = ev.groupBy("user_id").agg(
        F.expr("CAST(date_trunc('day', MIN(ts)) AS DATE)").alias("cohort_day")
    )
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.expr("CAST(date_trunc('day', ts) AS DATE)"), F.col("cohort_day")).alias(
                "day_offset"
            ),
        )
        .where(F.col("day_offset") <= 7)
        .distinct()
    )
    return activity.groupBy("cohort_day", "day_offset").agg(
        F.count(F.lit(1)).alias("n_users")
    )


@register(
    "q_incremental_agg",
    oracle="""
SELECT user_id, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY user_id, event_type
""",
    note="materialized-view maintenance (KTable aggregation) equivalence: "
    "the Spark side aggregates a frozen base (ts < Feb 1) and a later "
    "delta batch SEPARATELY, then merges the partials — count-sum and "
    "exact-decimal-sum partials compose associatively, so merge(base, "
    "delta) must equal the oracle's one-shot full aggregation. This is "
    "the algebraic fact that makes streaming upsert views and partial "
    "(map-side) aggregation correct; decimal accumulation keeps the "
    "merge bit-exact in any order",
    tags=("streaming-equiv", "agg", "incremental"),
)
def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events(spark, sf_dir)
    cutoff = F.lit("2024-02-01").cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id", "event_type").agg(
            F.count(F.lit(1)).alias("pn"),
            F.expr("SUM(CAST(value AS DECIMAL(25,6)))").alias("psum"),
        )

    base = partial(ev.where(F.col("ts") < cutoff))     # frozen matview
    delta = partial(ev.where(F.col("ts") >= cutoff))   # incoming batch
    return (
        base.unionByName(delta)
        .groupBy("user_id", "event_type")
        .agg(F.sum("pn").alias("n"), F.sum("psum").alias("s"))
        .select(
            "user_id",
            "event_type",
            F.col("n").cast("bigint").alias("n_events"),
            F.col("s").cast("double").alias("total_value"),
        )
    )


@register(
    "q_stream_distinct_users",
    oracle="""
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       TRUE AS hll_within_tol
FROM events
GROUP BY 1, 2
""",
    note="windowed distinct-cardinality -- the per-window audience count. "
    "Exact COUNT(DISTINCT) is structurally IMPOSSIBLE in a streaming "
    "aggregation (unbounded per-window state, not mergeable); the stream "
    "path is the HLL sketch, whose register-max merge is commutative so "
    "micro-batch order cannot change the estimate. Certified via the "
    "q_agg_approx_distinct pattern: exact anchors + an "
    "|approx-exact|/exact <= 0.05 tolerance boolean the oracle asserts "
    "literally (rsd=0.01, measured error <= 0.7% at every SF). The live "
    "twin stream_windowed_distinct runs the SAME HLL expression under a "
    "watermark and its equivalence test exploits HLL's commutativity: "
    "streaming estimates EQUAL the batch estimates exactly. Plan shape "
    "(round 11): TWO-LEVEL aggregate -- dedup on (window, type, user) "
    "with a per-user event count, then count/sum/HLL over the deduped "
    "rows -- instead of countDistinct-beside-regular-aggs, whose "
    "expand-based plan measured 3.9-4.7 s vs 1.2 s at sf0.1 for "
    "bit-identical output (HLL registers depend only on the SET of "
    "values, so the estimate is unchanged by pre-dedup; outer "
    "count(user_id) drops the NULL-user group exactly like "
    "COUNT(DISTINCT), so the equivalence needs no non-null fixture "
    "assumption). Also the "
    "100 TB-correct shape: the expand plan doubles shuffle volume",
    tags=("streaming", "agg", "approx"),
)
def q_stream_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    per_user = events.groupBy(
        F.window("ts", "1 day").alias("w"), "event_type", "user_id"
    ).agg(F.count(F.lit(1)).alias("_n"))
    return (
        per_user.groupBy("w", "event_type")
        .agg(
            # count(user_id), not count(1): drops a would-be NULL-user
            # group so n_users matches COUNT(DISTINCT user_id) and the
            # NULL-ignoring HLL unconditionally (ADVICE r11).
            F.count(F.col("user_id")).cast("bigint").alias("n_users"),
            F.sum("_n").cast("bigint").alias("n_events"),
            F.approx_count_distinct("user_id", rsd=0.01).alias("_hll"),
        )
        .select(
            F.col("w.start").cast("date").alias("day"),
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
    "q_funnel_latency",
    oracle="""
WITH v AS (
    SELECT user_id, MIN(ts) AS t_view
    FROM events WHERE event_type = 'view' GROUP BY user_id
), c AS (
    SELECT e.user_id, MIN(e.ts) AS t_click, MAX(v.t_view) AS t_view
    FROM events e JOIN v ON e.user_id = v.user_id
    WHERE e.event_type = 'click'
      AND e.ts > v.t_view AND e.ts <= v.t_view + INTERVAL 24 HOUR
    GROUP BY e.user_id
), p AS (
    SELECT e.user_id, MIN(e.ts) AS t_purchase, MAX(c.t_click) AS t_click
    FROM events e JOIN c ON e.user_id = c.user_id
    WHERE e.event_type = 'purchase'
      AND e.ts > c.t_click AND e.ts <= c.t_click + INTERVAL 24 HOUR
    GROUP BY e.user_id
), delays AS (
    SELECT 'view_to_click' AS stage,
           (epoch_us(t_click) - epoch_us(t_view)) // 1000000 AS delay_s
    FROM c
    UNION ALL
    SELECT 'click_to_purchase' AS stage,
           (epoch_us(t_purchase) - epoch_us(t_click)) // 1000000 AS delay_s
    FROM p
)
SELECT stage,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(quantile_disc(delay_s, 0.5) AS BIGINT) AS p50_s,
       CAST(quantile_disc(delay_s, 0.9) AS BIGINT) AS p90_s,
       CAST(SUM(delay_s) AS BIGINT) AS sum_s,
       CAST(SUM(delay_s) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_s
FROM delays
GROUP BY stage
""",
    note="funnel stage-latency distribution: whole-second delays between "
    "each user's first view -> first qualifying click -> first "
    "qualifying purchase (same stage semantics as q_funnel_stages), "
    "summarized per stage as exact count, DISCRETE p50/p90 (the "
    "certified exact-regime approx_percentile: accuracy 1e7 >> N makes "
    "the GK sketch return the true discrete quantile == DuckDB "
    "quantile_disc — q_agg_approx_percentile's certification reused), "
    "exact BIGINT delay sum, and a mean that is one int64/int64 IEEE "
    "division. The latency half of funnel analytics ('how long does "
    "conversion take') next to the count half ('how many convert'). "
    "Scale shape: two keyed stage aggregates + a 2-row rollup; the "
    "sketch degrades gracefully to its epsilon guarantee at production "
    "accuracy",
    tags=("temporal", "agg", "funnel", "percentile"),
)
def q_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events(spark, sf_dir)
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    # `c` feeds both the purchase stage and the view->click delay — eager
    # localCheckpoint executes the click stage once (SCALE.md §3.4 rule;
    # the per-user stage table is tiny).
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(
            (F.col("ts") > F.col("t_view"))
            & (F.col("ts") <= F.expr("t_view + INTERVAL 24 HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"), F.max("t_view").alias("t_view"))
        .localCheckpoint(eager=True)
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c.select("user_id", "t_click"), "user_id")
        .where(
            (F.col("ts") > F.col("t_click"))
            & (F.col("ts") <= F.expr("t_click + INTERVAL 24 HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"), F.max("t_click").alias("t_click"))
    )
    d1 = c.select(
        F.lit("view_to_click").alias("stage"),
        F.expr("(unix_micros(t_click) - unix_micros(t_view)) DIV 1000000").alias(
            "delay_s"
        ),
    )
    d2 = p.select(
        F.lit("click_to_purchase").alias("stage"),
        F.expr(
            "(unix_micros(t_purchase) - unix_micros(t_click)) DIV 1000000"
        ).alias("delay_s"),
    )
    delays = d1.unionByName(d2)
    sketched = delays.groupBy("stage").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.expr("approx_percentile(delay_s, array(0.5, 0.9), 10000000)").alias(
            "qs"
        ),
        F.sum("delay_s").cast("bigint").alias("sum_s"),
    )
    return sketched.select(
        "stage",
        "n_users",
        F.element_at("qs", 1).cast("bigint").alias("p50_s"),
        F.element_at("qs", 2).cast("bigint").alias("p90_s"),
        "sum_s",
        (F.col("sum_s").cast("double") / F.col("n_users").cast("double")).alias(
            "mean_s"
        ),
    )
