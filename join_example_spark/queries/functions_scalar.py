"""§2.8 — scalar function surface (string/date/math/conditional/array/json/map).

Dialect notes are inline wherever Spark SQL and DuckDB disagree on a
function's name, return width, or origin (e.g. ``dayofweek``). Integral
outputs are BIGINT on both sides; libm-dependent outputs (ln/exp) are
rounded to 6 decimals (≤1 ulp divergence vs a 1e-6 bucket → negligible
boundary risk); IEEE-exact ops (sqrt, mul) are emitted raw.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from join_example_spark.registry import register
from join_example_spark.sources.readers import read_table


@register(
    "q_fn_string",
    oracle="""
SELECT p_partkey,
       UPPER(p_name) AS up_name,
       LOWER(p_brand) AS lo_brand,
       SUBSTRING(p_name, 1, 8) AS name8,
       CAST(LENGTH(p_name) AS BIGINT) AS name_len,
       TRIM(p_type) AS type_trim,
       CONCAT_WS('-', p_brand, p_type) AS brand_type,
       REPLACE(p_type, 'ECONOMY', 'ECO') AS type_eco,
       CAST(LEN(string_split(p_name, ' ')) AS BIGINT) AS n_words,
       regexp_extract(p_brand, '#(\\d+)', 1) AS brand_num,
       (p_type LIKE '%PROMO%') AS is_promo
FROM part
""",
    tags=("fn", "string"),
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("up_name"),
        F.lower("p_brand").alias("lo_brand"),
        F.substring("p_name", 1, 8).alias("name8"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.trim("p_type").alias("type_trim"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit("ECONOMY"), F.lit("ECO")).alias("type_eco"),
        F.size(F.split("p_name", " ")).cast("bigint").alias("n_words"),
        F.regexp_extract("p_brand", r"#(\d+)", 1).alias("brand_num"),
        F.col("p_type").like("%PROMO%").alias("is_promo"),
    )


@register(
    "q_fn_date",
    oracle="""
SELECT o_orderkey,
       CAST(o_orderdate AS DATE) AS od,
       CAST(YEAR(o_orderdate)  AS BIGINT) AS y,
       CAST(MONTH(o_orderdate) AS BIGINT) AS m,
       CAST(DAY(o_orderdate)   AS BIGINT) AS d,
       CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
       CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
         AS days_since,
       CAST(o_orderdate AS DATE) + 30 AS plus30,
       LAST_DAY(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS BIGINT) AS dow
FROM orders
""",
    note="dayofweek origin differs: Spark 1=Sunday, DuckDB 0=Sunday -> +1 in oracle",
    tags=("fn", "date"),
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("od"),
        F.year("o_orderdate").cast("bigint").alias("y"),
        F.month("o_orderdate").cast("bigint").alias("m"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("d"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("plus30"),
        F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
        F.dayofweek(F.col("o_orderdate").cast("date")).cast("bigint").alias("dow"),
    )


@register(
    "q_fn_math",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ROUND(l_extendedprice, 1) AS price_r1,
       CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
       CAST(CEIL(l_extendedprice)  AS BIGINT) AS price_ceil,
       ABS(l_extendedprice - 30000.0) AS dist_30k,
       SQRT(l_quantity) AS qty_sqrt,
       ROUND(LN(l_extendedprice), 6) AS price_ln,
       ROUND(EXP(l_discount), 6) AS disc_exp,
       l_quantity * l_quantity AS qty_sq,
       CAST(MOD(l_orderkey, 7) AS BIGINT) AS key_mod7,
       CAST(SIGN(l_discount - 0.05) AS BIGINT) AS disc_sign
FROM lineitem
""",
    tags=("fn", "math"),
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.floor("l_extendedprice").cast("bigint").alias("price_floor"),
        F.ceil("l_extendedprice").cast("bigint").alias("price_ceil"),
        F.abs(F.col("l_extendedprice") - 30000.0).alias("dist_30k"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        (F.col("l_orderkey") % 7).cast("bigint").alias("key_mod7"),
        F.signum(F.col("l_discount") - 0.05).cast("bigint").alias("disc_sign"),
    )


@register(
    "q_fn_cond",
    oracle="""
SELECT c_custkey,
       CASE WHEN c_acctbal < 0.0 THEN 'neg'
            WHEN c_acctbal < 5000.0 THEN 'mid'
            ELSE 'high' END AS bal_band,
       COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg2,
       GREATEST(c_acctbal, 0.0) AS pos_bal,
       LEAST(c_acctbal, 1000.0) AS capped_bal
FROM customer
""",
    tags=("fn", "cond"),
)
def q_fn_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_table(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0.0, "neg")
        .when(F.col("c_acctbal") < 5000.0, "mid")
        .otherwise("high")
        .alias("bal_band"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg2"
        ),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("pos_bal"),
        F.least(F.col("c_acctbal"), F.lit(1000.0)).alias("capped_bal"),
    )


@register(
    "q_fn_array",
    oracle="""
SELECT vec_id,
       CAST(LEN(embedding) AS BIGINT) AS dim,
       CAST(embedding[1] AS DOUBLE) AS first_val,
       CAST(list_aggregate(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS DOUBLE) AS norm_sq,
       CAST(LEN(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
       CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS max_val
FROM embeddings
""",
    note="higher-order array functions over the embedding column",
    tags=("fn", "array"),
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        F.expr(
            "AGGREGATE(TRANSFORM(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
            " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        ).alias("norm_sq"),
        F.expr("CAST(SIZE(FILTER(embedding, x -> x > 0)) AS BIGINT)").alias("n_pos"),
        F.array_max("embedding").cast("double").alias("max_val"),
    )


@register(
    "q_fn_json",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
       (props LIKE '%"k"%') AS has_k,
       CAST(LENGTH(props) AS BIGINT) AS props_len
FROM events
""",
    tags=("fn", "json"),
)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    parsed = F.from_json("props", "k BIGINT")
    return events.select(
        "event_id",
        parsed.getField("k").alias("k"),
        F.col("props").like('%"k"%').alias("has_k"),
        F.length("props").cast("bigint").alias("props_len"),
    )


@register(
    "q_fn_map",
    oracle="""
SELECT user_id, event_type, COUNT(*) AS n
FROM events
GROUP BY user_id, event_type
""",
    note="map build + explode round-trip; oracle sees the flat equivalent",
    tags=("fn", "map"),
)
def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build map(event_type -> count) per user, then explode back to rows.

    The map construction/explosion is a Spark-side exercise
    (map_from_entries/collect_list/explode); the observable result is the
    flat (user_id, event_type, n) relation the oracle computes directly.
    """
    events = read_table(spark, sf_dir, "events")
    counts = events.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    maps = counts.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("event_type", "n"))).alias("type_counts")
    )
    exploded = maps.select("user_id", F.explode("type_counts").alias("event_type", "n"))
    return exploded


@register(
    "q_fn_regex",
    oracle="""
SELECT doc_id,
       COALESCE(array_to_string(regexp_extract_all(text, '[a-z]+ing'), '|'), '') AS ing_words,
       CAST(len(regexp_extract_all(text, '[a-z]+ing')) AS BIGINT) AS n_ing,
       regexp_replace(text, '\\s+', '_', 'g') AS squashed,
       CASE WHEN regexp_matches(text, '(data|model|train)') THEN 1 ELSE 0 END AS mentions_ml
FROM documents
WHERE doc_id <= 200
""",
    note="regexp_extract_all / global regexp_replace / rlike; DuckDB needs "
    "the 'g' flag where Spark's regexp_replace is global by default; the "
    "match list is pipe-joined to a scalar because the driver's pandas "
    "canonicalizer cannot sort array cells",
    tags=("fn", "regex"),
)
def q_fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").where(F.col("doc_id") <= 200)
    return docs.select(
        "doc_id",
        F.array_join(F.expr("regexp_extract_all(text, '[a-z]+ing')"), "|").alias("ing_words"),
        F.expr("size(regexp_extract_all(text, '[a-z]+ing'))").cast("bigint").alias("n_ing"),
        F.regexp_replace("text", r"\s+", "_").alias("squashed"),
        F.when(F.col("text").rlike("(data|model|train)"), 1).otherwise(0).alias("mentions_ml"),
    )


@register(
    "q_fn_bitwise",
    oracle="""
SELECT l_returnflag,
       bit_and(l_orderkey & 255) AS and_low,
       bit_or(l_orderkey & 255) AS or_low,
       bit_xor(l_orderkey) AS xor_all,
       CAST(SUM(CASE WHEN (l_orderkey >> 3) & 1 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS bit3_set
FROM lineitem
GROUP BY l_returnflag
""",
    note="bitwise scalar ops (&, |, >>) and bit_and/bit_or/bit_xor "
    "aggregates — order-insensitive by algebra, so no rounding needed",
    tags=("fn", "agg", "bitwise"),
)
def q_fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("bit_and(l_orderkey & 255)").alias("and_low"),
        F.expr("bit_or(l_orderkey & 255)").alias("or_low"),
        F.expr("bit_xor(l_orderkey)").alias("xor_all"),
        F.expr("SUM(CASE WHEN (l_orderkey >> 3) & 1 = 1 THEN 1 ELSE 0 END)").alias("bit3_set"),
    )


@register(
    "q_fn_struct",
    oracle="""
WITH packed AS (
    SELECT o_orderkey,
           {'custkey': o_custkey, 'status': o_orderstatus,
            'price': ROUND(o_totalprice, 4)} AS order_info
    FROM orders
    WHERE o_orderkey <= 500
)
SELECT o_orderkey,
       order_info.custkey AS custkey,
       order_info.status AS status,
       order_info.price AS price
FROM packed
""",
    note="nested struct construction + field access (named_struct vs DuckDB "
    "struct literal); round-trips the nested type through the engine",
    tags=("fn", "struct"),
)
def q_fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 500)
    packed = o.select(
        "o_orderkey",
        F.struct(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderstatus").alias("status"),
            F.round("o_totalprice", 4).alias("price"),
        ).alias("order_info"),
    )
    return packed.select(
        "o_orderkey",
        F.col("order_info.custkey").alias("custkey"),
        F.col("order_info.status").alias("status"),
        F.col("order_info.price").alias("price"),
    )


@register(
    "q_fn_nulls",
    oracle="""
SELECT o_orderkey,
       NULLIF(o_orderstatus, 'O') AS status_or_null,
       COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_filled,
       (NULLIF(o_orderstatus, 'O') IS NOT DISTINCT FROM NULL) AS is_open,
       (o_orderstatus IS DISTINCT FROM 'F') AS not_final
FROM orders
WHERE o_orderkey <= 500
""",
    note="three-valued logic surface: NULLIF/COALESCE and null-safe "
    "(IS [NOT] DISTINCT FROM) comparisons — identical semantics both "
    "engines, unlike bare = which yields NULL",
    tags=("fn", "nulls"),
)
def q_fn_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 500)
    return o.select(
        "o_orderkey",
        F.expr("NULLIF(o_orderstatus, 'O')").alias("status_or_null"),
        F.expr("COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN')").alias("status_filled"),
        F.expr("NULLIF(o_orderstatus, 'O') IS NOT DISTINCT FROM NULL").alias("is_open"),
        F.expr("o_orderstatus IS DISTINCT FROM 'F'").alias("not_final"),
    )


@register(
    "q_fn_codec",
    oracle="""
SELECT p_partkey,
       to_base64(encode(p_name)) AS name_b64,
       lower(hex(encode(p_brand))) AS brand_hex,
       md5(p_name) AS name_md5,
       sha256(p_name) AS name_sha256
FROM part
WHERE p_partkey <= 300
""",
    note="binary codecs + cryptographic digests (base64/hex/md5/sha256): "
    "byte-identical across engines on UTF-8 input; hex lower()ed both "
    "sides (case convention differs)",
    tags=("fn", "codec"),
)
def q_fn_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = read_table(spark, sf_dir, "part").where(F.col("p_partkey") <= 300)
    return p.select(
        "p_partkey",
        F.expr("base64(encode(p_name, 'UTF-8'))").alias("name_b64"),
        F.expr("lower(hex(encode(p_brand, 'UTF-8')))").alias("brand_hex"),
        F.md5(F.expr("encode(p_name, 'UTF-8')")).alias("name_md5"),
        F.sha2(F.expr("encode(p_name, 'UTF-8')"), 256).alias("name_sha256"),
    )
