"""§2.10 — text analysis over the ``documents`` corpus.

Token stats, language/quality filtering, language-ID heuristic, BPE-ish
token counting, quality features, and the rolling-hash fingerprint — all
Y-oracle (the fingerprint's DuckDB twin replays the same fold via
``list_reduce``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from join_example_spark.operators.sampling import str_hash_sql as _str_hash_sql
from join_example_spark.operators.text import (
    BPE_PATTERN,
    langid_expr,
    quality_features,
    rolling_fingerprint,
)
from join_example_spark.registry import register
from join_example_spark.sources.readers import fanout_repartition, read_table


@register(
    "q_llm_text_stats",
    oracle="""
WITH t AS (
    SELECT lang, unnest(string_split(text, ' ')) AS tok
    FROM documents
), tok_stats AS (
    SELECT lang,
           COUNT(*) AS total_tokens,
           COUNT(DISTINCT tok) AS vocab_size
    FROM t GROUP BY lang
), doc_stats AS (
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST((n_chars) AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS avg_chars
    FROM documents GROUP BY lang
)
SELECT d.lang, d.n_docs, d.avg_chars, s.total_tokens, s.vocab_size
FROM doc_stats d JOIN tok_stats s ON d.lang = s.lang
""",
    note="per-language corpus stats: doc counts, avg length, token & vocab counts",
    tags=("llm", "text"),
)
def q_llm_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select("lang", F.explode(F.split("text", " ")).alias("tok"))
    tok_stats = toks.groupBy("lang").agg(
        F.count(F.lit(1)).alias("total_tokens"),
        F.countDistinct("tok").alias("vocab_size"),
    )
    doc_stats = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr("CAST(SUM(CAST((n_chars) AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*)").alias(
            "avg_chars"
        ),
    )
    return doc_stats.join(tok_stats, "lang").select(
        "lang", "n_docs", "avg_chars", "total_tokens", "vocab_size"
    )


@register(
    "q_llm_lang_filter",
    oracle="""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE lang IN ('en', 'de')
  AND n_chars BETWEEN 200 AND 2000
  AND source <> 'src0'
""",
    note="language/source/quality-bounds corpus filter",
    tags=("llm", "text", "filter"),
)
def q_llm_lang_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return docs.where(
        F.col("lang").isin("en", "de")
        & F.col("n_chars").between(200, 2000)
        & (F.col("source") != "src0")
    ).select("doc_id", "lang", "source", "n_chars")


@register(
    "q_llm_langid",
    oracle=f"""
SELECT doc_id,
       lang,
       {langid_expr("text")} AS predicted_lang
FROM documents
""",
    note="n-gram/marker language-ID heuristic (same CASE expression both sides)",
    tags=("llm", "text"),
)
def q_llm_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "lang", F.expr(langid_expr("text")).alias("predicted_lang")
    )


@register(
    "q_llm_tokens",
    oracle=f"""
SELECT doc_id,
       CAST(LEN(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
       CAST(LEN(regexp_extract_all(text, '{BPE_PATTERN}')) AS BIGINT) AS bpe_tokens
FROM documents
""",
    note="whitespace + BPE-ish regex token counting (portable regex class)",
    tags=("llm", "text"),
)
def q_llm_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("ws_tokens"),
        F.expr(f"CAST(SIZE(regexp_extract_all(text, '{BPE_PATTERN}', 0)) AS BIGINT)").alias(
            "bpe_tokens"
        ),
    )


@register(
    "q_llm_quality",
    oracle="""
WITH q AS (
    SELECT doc_id,
           CAST(LEN(string_split(TRIM(text), ' ')) AS BIGINT) AS n_tokens,
           CAST(LEN(list_distinct(string_split(TRIM(text), ' '))) AS DOUBLE)
             / LEN(string_split(TRIM(text), ' ')) AS distinct_ratio,
           CAST(LENGTH(TRIM(text)) - (LEN(string_split(TRIM(text), ' ')) - 1) AS DOUBLE)
             / LEN(string_split(TRIM(text), ' ')) AS avg_token_len
    FROM documents
)
SELECT doc_id, n_tokens, distinct_ratio, avg_token_len,
       (n_tokens >= 5 AND avg_token_len >= 2.0 AND avg_token_len <= 12.0
        AND distinct_ratio >= 0.3) AS quality_ok
FROM q
""",
    note="document quality scoring: token count, diversity, avg token length",
    tags=("llm", "text"),
)
def q_llm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return quality_features(docs).select(
        "doc_id", "n_tokens", "distinct_ratio", "avg_token_len", "quality_ok"
    )


@register(
    "q_llm_fingerprint",
    # Order-sensitive fold has an exact DuckDB twin: list_reduce with the
    # init value prepended (list_reduce seeds from the first element).
    # Bit-parity of the per-token term (len*131 + ascii) and the
    # (acc*31 + x) % 1e9+7 fold verified empirically both sides.
    oracle="""
SELECT doc_id,
       list_reduce(
           list_prepend(CAST(0 AS BIGINT),
               list_transform(str_split(trim(text), ' '),
                   t -> CAST(length(t) AS BIGINT) * 131 + ascii(t))),
           (acc, x) -> (acc * 31 + x) % 1000000007) AS fingerprint
FROM documents
""",
    note="polynomial rolling-hash document fingerprint (mod 1e9+7)",
    tags=("llm", "text"),
)
def q_llm_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return rolling_fingerprint(docs).select("doc_id", "fingerprint")


@register(
    "q_llm_pipeline",
    oracle="""
WITH quality AS (
    SELECT doc_id, text, lang,
           len(str_split(trim(text), ' ')) AS n_tokens
    FROM documents
    WHERE n_chars BETWEEN 40 AND 5000
), dedup AS (
    SELECT lang, n_tokens, text,
           ROW_NUMBER() OVER (PARTITION BY md5(LOWER(TRIM(text)))
                              ORDER BY doc_id) AS rn
    FROM quality
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CAST(n_tokens AS DECIMAL(25,6))) AS DOUBLE) AS total_tokens,
       ROUND(CAST(SUM(CAST(n_tokens AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*), 4)
           AS avg_tokens
FROM dedup
WHERE rn = 1
GROUP BY lang
""",
    note="the full training-data pipeline as ONE Catalyst plan: quality "
    "filter -> exact dedup (keep-lowest-id) -> per-lang token stats. One "
    "scan, one dedup shuffle, one agg shuffle — the composability argument "
    "for declarative pipelines at 100 TB",
    tags=("llm", "text", "dedup", "composite"),
)
def q_llm_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").where(
        F.col("n_chars").between(40, 5000)
    )
    toks = docs.select(
        "doc_id",
        "lang",
        F.size(F.split(F.trim("text"), " ")).cast("bigint").alias("n_tokens"),
        F.md5(F.lower(F.trim("text"))).alias("h"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("h").orderBy("doc_id")
    kept = toks.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr("CAST(SUM(CAST(n_tokens AS DECIMAL(25,6))) AS DOUBLE)").alias(
            "total_tokens"
        ),
        F.round(
            F.expr("CAST(SUM(CAST(n_tokens AS DECIMAL(25,6))) AS DOUBLE)")
            / F.count(F.lit(1)),
            4,
        ).alias("avg_tokens"),
    )


@register(
    "q_llm_tfidf",
    oracle="""
WITH docs AS (
    SELECT doc_id, list_distinct(str_split(LOWER(TRIM(text)), ' ')) AS toks,
           str_split(LOWER(TRIM(text)), ' ') AS all_toks
    FROM documents WHERE doc_id < 100
), n_docs AS (
    SELECT COUNT(*) AS n FROM docs
), tf AS (
    SELECT doc_id, unnest(all_toks) AS term
    FROM docs
), tf_counts AS (
    SELECT doc_id, term, COUNT(*) AS tf
    FROM tf GROUP BY doc_id, term
), df AS (
    SELECT term, COUNT(DISTINCT doc_id) AS df
    FROM tf GROUP BY term
), scored AS (
    SELECT t.doc_id, t.term,
           ROUND(t.tf * ln(CAST(n.n AS DOUBLE) / d.df), 4) AS tfidf
    FROM tf_counts t, n_docs n
    JOIN df d ON t.term = d.term
)
SELECT doc_id, term, tfidf, rnk
FROM (
    SELECT doc_id, term, tfidf,
           CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, term) AS BIGINT) AS rnk
    FROM scored
)
WHERE rnk <= 3
""",
    note="TF-IDF top-3 terms per document: term frequency x ln(N/df), "
    "rounded before ranking with the term as total-order tiebreak. "
    "Two shuffles (per-doc tf, global df broadcast back)",
    tags=("llm", "text"),
)
def q_llm_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    terms = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.trim("text")), " ")).alias("term")
    )
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("n"))
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = terms.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    # N arrives via a broadcast single-row crossJoin — one lazy plan, no
    # eager count() job at query-construction time.
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(F.col("tf") * F.log(F.col("n") / F.col("df")), 4).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= 3)
        .select("doc_id", "term", "tfidf", "rnk")
    )


@register(
    "q_llm_zipf",
    oracle="""
WITH counts AS (
    SELECT unnest(str_split(LOWER(TRIM(text)), ' ')) AS term
    FROM documents
), freq AS (
    SELECT term, COUNT(*) AS n
    FROM counts GROUP BY term
)
SELECT term, n,
       CAST(ROW_NUMBER() OVER (ORDER BY n DESC, term) AS BIGINT) AS rank
FROM freq
ORDER BY rank
LIMIT 50
""",
    note="global term-frequency ranking (Zipf curve head): corpus heavy "
    "hitters with deterministic count-then-term ordering. The global "
    "window is bounded to the top-50 head, not the full vocabulary",
    tags=("llm", "text", "agg"),
)
def q_llm_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(F.split(F.lower(F.trim("text")), " ")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("term"))
        .limit(50)
    )
    w = Window.orderBy(F.col("n").desc(), F.col("term"))
    return freq.withColumn("rank", F.row_number().over(w).cast("bigint"))


_BM25_TERMS = ("vector", "hash", "window")
_BM25_IN = "('vector', 'hash', 'window')"


@register(
    "q_llm_bm25_search",
    oracle=f"""
WITH docs AS (
    SELECT doc_id, str_split(LOWER(TRIM(text)), ' ') AS t
    FROM documents WHERE text IS NOT NULL
), sized AS (
    SELECT doc_id, LEN(t) AS dl FROM docs
), stats AS (
    SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM sized
), terms AS (
    SELECT doc_id, unnest(t) AS term FROM docs
), tf AS (
    SELECT doc_id, term, COUNT(*) AS tf FROM terms
    WHERE term IN {_BM25_IN} GROUP BY doc_id, term
), df AS (
    SELECT term, COUNT(DISTINCT doc_id) AS df FROM terms
    WHERE term IN {_BM25_IN} GROUP BY term
), scored AS (
    SELECT tf.doc_id,
           CAST(ROUND(
               ln(1.0 + (CAST(s.n_docs AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5)
                        / (CAST(df.df AS DOUBLE) + 0.5))
               * (CAST(tf.tf AS DOUBLE) * 2.2)
               / (CAST(tf.tf AS DOUBLE)
                  + (0.3 + 0.9 * (CAST(z.dl AS DOUBLE)
                                  / (CAST(s.sum_dl AS DOUBLE)
                                     / CAST(s.n_docs AS DOUBLE))))),
               6) AS DECIMAL(18,6)) AS s6
    FROM tf
    JOIN sized z USING (doc_id)
    JOIN df USING (term)
    CROSS JOIN stats s
), summed AS (
    SELECT doc_id, CAST(SUM(s6) AS DOUBLE) AS bm25
    FROM scored GROUP BY doc_id
), ranked AS (
    SELECT doc_id, bm25,
           CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS rnk
    FROM summed
)
SELECT doc_id, bm25, rnk FROM ranked WHERE rnk <= 10 ORDER BY rnk
""",
    note="BM25 top-10 retrieval for a fixed 3-term query (Lucene idf "
    "variant ln(1 + (N-df+0.5)/(df+0.5)) — always positive on a "
    "common-term vocabulary; k1=1.2, b=0.75). Determinism: every integer "
    "is CAST to DOUBLE before float arithmetic with an IDENTICAL "
    "expression tree on both engines (each IEEE +,*,/ is then "
    "bit-identical; ln carries the same accepted 1-ulp-then-ROUND risk "
    "as q_llm_tfidf, driver-green since r2); per-term scores round to 6 "
    "decimals into DECIMAL(18,6), the per-doc SUM runs in exact decimal "
    "space (order-independent), and one final cast emits the double. "
    "Scale shape: tf and df are map-side-combined aggregates over "
    "narrow (doc, term) rows filtered to the query terms BEFORE any "
    "shuffle; stats and df broadcast; top-10 is TakeOrderedAndProject, "
    "never a global-order window over the corpus",
    tags=("llm", "text", "search"),
)
def q_llm_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = (
        read_table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select("doc_id", F.split(F.lower(F.trim("text")), " ").alias("t"))
    )
    sized = docs.select("doc_id", F.size("t").alias("dl"))
    stats = sized.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    terms = docs.select("doc_id", F.explode("t").alias("term")).where(
        F.col("term").isin(*_BM25_TERMS)
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = terms.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))

    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs").cast("double") - F.col("df").cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    )
    denom = F.col("tf").cast("double") + (
        F.lit(0.3) + F.lit(0.9) * (F.col("dl").cast("double") / avgdl)
    )
    s6 = F.round(idf * (F.col("tf").cast("double") * F.lit(2.2)) / denom, 6).cast(
        "decimal(18,6)"
    )
    scored = (
        tf.join(sized, "doc_id")
        .join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", s6.alias("s6"))
    )
    summed = scored.groupBy("doc_id").agg(
        F.sum("s6").cast("double").alias("bm25")
    )
    top = summed.orderBy(F.col("bm25").desc(), F.col("doc_id")).limit(10)
    w = Window.orderBy(F.col("bm25").desc(), F.col("doc_id"))
    return top.withColumn("rnk", F.row_number().over(w).cast("bigint")).select(
        "doc_id", "bm25", "rnk"
    )


@register(
    "q_llm_search_hybrid",
    oracle=f"""
WITH docs AS (
    SELECT doc_id, str_split(LOWER(TRIM(text)), ' ') AS t
    FROM documents WHERE text IS NOT NULL
), sized AS (
    SELECT doc_id, LEN(t) AS dl FROM docs
), stats AS (
    SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM sized
), terms AS (
    SELECT doc_id, unnest(t) AS term FROM docs
), tf AS (
    SELECT doc_id, term, COUNT(*) AS tf FROM terms
    WHERE term IN {_BM25_IN} GROUP BY doc_id, term
), dfx AS (
    SELECT term, COUNT(DISTINCT doc_id) AS df FROM terms
    WHERE term IN {_BM25_IN} GROUP BY term
), scored AS (
    SELECT tf.doc_id,
           CAST(ROUND(
               ln(1.0 + (CAST(s.n_docs AS DOUBLE) - CAST(dfx.df AS DOUBLE) + 0.5)
                        / (CAST(dfx.df AS DOUBLE) + 0.5))
               * (CAST(tf.tf AS DOUBLE) * 2.2)
               / (CAST(tf.tf AS DOUBLE)
                  + (0.3 + 0.9 * (CAST(z.dl AS DOUBLE)
                                  / (CAST(s.sum_dl AS DOUBLE)
                                     / CAST(s.n_docs AS DOUBLE))))),
               6) AS DECIMAL(18,6)) AS s6
    FROM tf
    JOIN sized z USING (doc_id)
    JOIN dfx USING (term)
    CROSS JOIN stats s
), summed AS (
    SELECT doc_id, CAST(SUM(s6) AS DOUBLE) AS bm25
    FROM scored GROUP BY doc_id
), lex AS (
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS lex_rnk
    FROM summed
    QUALIFY lex_rnk <= 20
), probe AS (
    SELECT embedding AS pv FROM embeddings WHERE vec_id = 0
), dsim AS (
    SELECT e.vec_id AS doc_id,
           ROUND({{dot}}, 4) AS sim
    FROM embeddings e CROSS JOIN probe p
    WHERE e.vec_id <> 0
), dense AS (
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY sim DESC, doc_id) AS BIGINT) AS dense_rnk
    FROM dsim
    QUALIFY dense_rnk <= 20
), fused AS (
    SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
           COALESCE(l.lex_rnk, 0) AS lex_rnk,
           COALESCE(d.dense_rnk, 0) AS dense_rnk,
           CAST(COALESCE(CAST(ROUND(1.0 / (60.0 + CAST(l.lex_rnk AS DOUBLE)), 9)
                              AS DECIMAL(18,9)), CAST(0 AS DECIMAL(18,9)))
                + COALESCE(CAST(ROUND(1.0 / (60.0 + CAST(d.dense_rnk AS DOUBLE)), 9)
                                AS DECIMAL(18,9)), CAST(0 AS DECIMAL(18,9)))
                AS DOUBLE) AS rrf
    FROM lex l FULL OUTER JOIN dense d ON l.doc_id = d.doc_id
)
SELECT doc_id, lex_rnk, dense_rnk, rrf,
       CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT) AS rnk
FROM fused
QUALIFY rnk <= 10
ORDER BY rnk
""".format(dot="list_aggregate(list_transform(list_zip(e.embedding, p.pv),"
           " q -> CAST(q[1] AS DOUBLE) * CAST(q[2] AS DOUBLE)), 'sum')"),
    note="HYBRID retrieval capstone: reciprocal-rank fusion (Cormack et "
    "al., k=60) of the BM25 top-20 lexical list and an embedding dense "
    "top-20 list (probe = vec 0's embedding, rounded sequential-fold "
    "dot, unique-id tiebreaks). Each present rank contributes "
    "ROUND(1/(60+rank), 9) in DECIMAL(18,9) — boundary-checked (closest "
    "9-digit half-ulp distance over rank<=200 is 4.5e-3, so ROUND is "
    "engine-stable) and summed exactly before ONE cast to double; "
    "absent ranks surface as 0 (never NULL: the driver canonicalizer "
    "has no dtype harmonization). Scale: both lists are top-k "
    "TakeOrderedAndProject heads, the fusion join is 20x20 rows, and "
    "the dense side slots the IVF/IMI front ends in at scale exactly "
    "as the dedup family does",
    tags=("llm", "text", "search", "similarity"),
)
def q_llm_search_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = (
        read_table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select("doc_id", F.split(F.lower(F.trim("text")), " ").alias("t"))
    )
    sized = docs.select("doc_id", F.size("t").alias("dl"))
    stats = sized.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    terms = docs.select("doc_id", F.explode("t").alias("term")).where(
        F.col("term").isin(*_BM25_TERMS)
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = terms.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs").cast("double") - F.col("df").cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    )
    denom = F.col("tf").cast("double") + (
        F.lit(0.3) + F.lit(0.9) * (F.col("dl").cast("double") / avgdl)
    )
    s6 = F.round(idf * (F.col("tf").cast("double") * F.lit(2.2)) / denom, 6).cast(
        "decimal(18,6)"
    )
    summed = (
        tf.join(sized, "doc_id")
        .join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", s6.alias("s6"))
        .groupBy("doc_id")
        .agg(F.sum("s6").cast("double").alias("bm25"))
    )
    lw = Window.orderBy(F.col("bm25").desc(), F.col("doc_id"))
    lex = (
        summed.orderBy(F.col("bm25").desc(), F.col("doc_id"))
        .limit(20)
        .withColumn("lex_rnk", F.row_number().over(lw).cast("bigint"))
        .select("doc_id", "lex_rnk")
    )

    emb = read_table(spark, sf_dir, "embeddings")
    probe = emb.where(F.col("vec_id") == 0).select(F.col("embedding").alias("pv"))
    from join_example_spark.operators.similarity import DOT_SQL

    sim = F.round(F.expr(DOT_SQL.format(a="embedding", b="pv")), 4)
    dw = Window.orderBy(F.col("sim").desc(), F.col("doc_id"))
    dense = (
        emb.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(probe))
        .select(F.col("vec_id").alias("doc_id"), sim.alias("sim"))
        .orderBy(F.col("sim").desc(), F.col("doc_id"))
        .limit(20)
        .withColumn("dense_rnk", F.row_number().over(dw).cast("bigint"))
        .select("doc_id", "dense_rnk")
    )

    def contrib(rank_col: str):
        return F.round(
            F.lit(1.0) / (F.lit(60.0) + F.col(rank_col).cast("double")), 9
        ).cast("decimal(18,9)")

    fused = (
        lex.join(dense, "doc_id", "full")
        .select(
            "doc_id",
            F.coalesce(F.col("lex_rnk"), F.lit(0).cast("bigint")).alias("lex_rnk"),
            F.coalesce(F.col("dense_rnk"), F.lit(0).cast("bigint")).alias(
                "dense_rnk"
            ),
            (
                F.coalesce(contrib("lex_rnk"), F.lit(0).cast("decimal(18,9)"))
                + F.coalesce(contrib("dense_rnk"), F.lit(0).cast("decimal(18,9)"))
            )
            .cast("double")
            .alias("rrf"),
        )
    )
    fw = Window.orderBy(F.col("rrf").desc(), F.col("doc_id"))
    return (
        fused.orderBy(F.col("rrf").desc(), F.col("doc_id"))
        .limit(10)
        .withColumn("rnk", F.row_number().over(fw).cast("bigint"))
        .select("doc_id", "lex_rnk", "dense_rnk", "rrf", "rnk")
    )


@register(
    "q_llm_quality_auc",
    oracle="""
WITH toks AS (
    SELECT lang, str_split(LOWER(TRIM(text)), ' ') AS t
    FROM documents WHERE text IS NOT NULL
), sc AS (
    SELECT CAST((1000 * LEN(list_distinct(t))) // LEN(t) AS BIGINT) AS score,
           CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
    FROM toks WHERE LEN(t) > 0
), per AS (
    SELECT score,
           CAST(SUM(pos) AS BIGINT) AS np,
           CAST(SUM(1 - pos) AS BIGINT) AS nn
    FROM sc GROUP BY score
), cum AS (
    SELECT score, np, nn,
           CAST(COALESCE(SUM(nn) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS cneg
    FROM per
)
SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
       CAST(SUM(nn) AS BIGINT) AS n_neg,
       CAST(SUM(np * (2 * cneg + nn)) AS BIGINT) AS u2,
       CAST(CAST(SUM(np * (2 * cneg + nn)) AS BIGINT) AS DOUBLE)
         / CAST(2 * CAST(SUM(np) AS BIGINT) * CAST(SUM(nn) AS BIGINT)
                AS DOUBLE) AS auc
FROM cum
""",
    note="EXACT rank-based AUC (Mann-Whitney U) of an integer quality "
    "score — type-token ratio in integer millis, (1000*distinct) DIV "
    "total — discriminating lang='en' documents. The quadratic "
    "definition AUC = (#[s_pos > s_neg] + 0.5*#ties) / (n1*n0) is "
    "computed in LINEAR+sort work as doubled rank sums: group by score, "
    "one running-negative-count window over the distinct-score spine, "
    "u2 = sum(np*(2*cneg_below + nn_at)) — every term BIGINT-exact, one "
    "closing int64/int64 double division (correctly rounded both "
    "engines). The classifier-eval primitive a curation pipeline runs "
    "on every quality-filter candidate: distributed as one groupBy plus "
    "a window over ~1000 distinct scores, never a pos x neg join",
    tags=("llm", "text", "quality", "ml"),
)
def q_llm_quality_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    toks = F.split(F.lower(F.trim(F.col("text"))), " ")
    sc = docs.select(
        F.expr(
            "CAST((1000 * size(array_distinct(split(lower(trim(text)), ' '))))"
            " DIV size(split(lower(trim(text)), ' ')) AS BIGINT)"
        ).alias("score"),
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0)).alias("pos"),
    ).where(F.size(toks) > 0)
    per = sc.groupBy("score").agg(
        F.sum("pos").cast("bigint").alias("np"),
        F.sum(F.lit(1) - F.col("pos")).cast("bigint").alias("nn"),
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    cum = per.select(
        "np",
        "nn",
        F.coalesce(F.sum("nn").over(w), F.lit(0)).cast("bigint").alias("cneg"),
    )
    u2 = F.sum(F.col("np") * (F.lit(2) * F.col("cneg") + F.col("nn"))).cast(
        "bigint"
    )
    n_pos = F.sum("np").cast("bigint")
    n_neg = F.sum("nn").cast("bigint")
    return cum.agg(
        n_pos.alias("n_pos"),
        n_neg.alias("n_neg"),
        u2.alias("u2"),
        (
            u2.cast("double")
            / (F.lit(2).cast("bigint") * n_pos * n_neg).cast("double")
        ).alias("auc"),
    )


@register(
    "q_llm_bpe_pairs",
    oracle="""
WITH words AS (
    SELECT unnest(str_split(LOWER(TRIM(text)), ' ')) AS w
    FROM documents
), pairs AS (
    SELECT unnest(list_transform(range(1, length(w)),
                  i -> substring(w, CAST(i AS INT), 2))) AS pair
    FROM words
    WHERE length(w) >= 2
)
SELECT pair, CAST(COUNT(*) AS BIGINT) AS cnt
FROM pairs
GROUP BY pair
ORDER BY cnt DESC, pair
LIMIT 20
""",
    note="the first round of BPE tokenizer training (Sennrich et al. "
    "2016): count every ADJACENT character pair inside every word "
    "occurrence corpus-wide and surface the top-20 merge candidates — "
    "the argmax of this table IS the first BPE merge, and iterating "
    "(re-pair, re-count) is the whole algorithm. Tokenizer training is "
    "the one corpus-scale job a training pipeline runs besides the "
    "model itself, so the counting step belongs in the engine. Scale "
    "shape: pair explode is map-side (len(w)-1 narrow rows per word "
    "instance), the count is one shuffle over a vocabulary-bounded key "
    "space (pairs of codepoints, not corpus-sized), top-20 is "
    "TakeOrderedAndProject with a total-order (cnt, pair) tiebreak — "
    "Spark sequence() is guarded by the length>=2 filter (it DESCENDS "
    "when start > stop)",
    tags=("llm", "text"),
)
def q_llm_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fanout_repartition(read_table(spark, sf_dir, "documents"))
    words = docs.select(
        F.explode(F.expr("split(LOWER(TRIM(text)), ' ')")).alias("w")
    ).where(F.length("w") >= 2)
    pairs = words.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(w) - 1),"
                " i -> substring(w, CAST(i AS INT), 2))"
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "pair")
        .limit(20)
    )


@register(
    "q_llm_quality_calibration",
    oracle="""
WITH toks AS (
    SELECT lang, str_split(LOWER(TRIM(text)), ' ') AS t
    FROM documents WHERE text IS NOT NULL
), sc AS (
    SELECT CAST((1000 * LEN(list_distinct(t))) // LEN(t) AS BIGINT) AS score,
           CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
    FROM toks WHERE LEN(t) > 0
), binned AS (
    SELECT LEAST(score // 100, 9) AS bin, pos FROM sc
), per AS (
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(pos) AS BIGINT) AS n_pos
    FROM binned GROUP BY bin
), total AS (
    SELECT CAST(SUM(n_docs) AS BIGINT) AS nd, CAST(SUM(n_pos) AS BIGINT) AS np
    FROM per
)
SELECT bin, n_docs, n_pos,
       CAST(n_pos AS DOUBLE) / CAST(n_docs AS DOUBLE) AS pos_rate,
       CAST(np AS DOUBLE) / CAST(nd AS DOUBLE) AS base_rate
FROM per, total
ORDER BY bin
""",
    note="calibration / reliability table for the same integer quality "
    "score q_llm_quality_auc ranks (type-token ratio in millis, "
    "outcome = lang='en'): ten fixed-width score bins, per-bin document "
    "count, positives, exact positive rate, and the global base rate "
    "for lift — AUC says the score RANKS well, this says whether a "
    "given score band can be trusted as a probability (the other half "
    "of classifier eval a curation gate needs before picking a "
    "threshold). All counts BIGINT; both rates are single int64/int64 "
    "IEEE divisions. Scale shape: map-side score + bin, one hash-agg "
    "to <= 10 rows, totals as windows over that bin table (no second "
    "subplan reference) — corpus-sized work is the token "
    "split only",
    tags=("llm", "text", "quality", "ml"),
)
def q_llm_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    toks = F.split(F.lower(F.trim(F.col("text"))), " ")
    sc = docs.select(
        F.expr(
            "CAST((1000 * size(array_distinct(split(lower(trim(text)), ' '))))"
            " DIV size(split(lower(trim(text)), ' ')) AS BIGINT)"
        ).alias("score"),
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0)).alias("pos"),
    ).where(F.size(toks) > 0)
    per = (
        sc.select(
            F.least(F.expr("score DIV 100"), F.lit(9)).cast("bigint").alias("bin"),
            "pos",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("pos").cast("bigint").alias("n_pos"),
        )
    )
    from pyspark.sql import Window

    # Base-rate totals via unpartitioned windows over the <=10-row bin
    # table — an agg+crossJoin would reference `per` twice and re-run the
    # corpus score projection (SCALE.md §3.4 rule).
    w_all = Window.partitionBy()
    nd = F.sum("n_docs").over(w_all).cast("bigint")
    np_ = F.sum("n_pos").over(w_all).cast("bigint")
    return (
        per.select(
            "bin",
            "n_docs",
            "n_pos",
            (F.col("n_pos").cast("double") / F.col("n_docs").cast("double")).alias(
                "pos_rate"
            ),
            (np_.cast("double") / nd.cast("double")).alias("base_rate"),
        )
        .orderBy("bin")
    )


# Model-based quality scoring (round 14, VERDICT r13 task 5; bigram
# features round 15, VERDICT r14 task 4): the one curation modality the
# heuristic signals (TTR, entropy, surprisal) don't cover — a LINEAR
# CLASSIFIER over hashed token features, the fastText shape
# RefinedWeb/FineWeb-style pipelines run as their "quality classifier"
# gate. fastText's actual feature space is unigrams PLUS token bigrams
# (wordNgrams=2), so the model scores both: unigrams hash into buckets
# [0, 8192), bigrams into [8192, 16384) — one weight table over the
# doubled space, same affine pseudo-weight formula (a deterministic
# stand-in for a trained model — the engine's job is the scoring plan,
# not the training); a real deployment swaps the generated table for its
# learned int8-quantized weight table and nothing else changes.
_QM_BUCKETS = 8192
_QM_FEATS = 2 * _QM_BUCKETS  # unigram ids ∪ (8192 + bigram ids)
_QM_A = 2_654_435_761  # Knuth multiplicative constant (same as id_hash)
_QM_B = 17
_QM_P = 1_000_003


def _qm_oracle() -> str:
    from join_example_spark.operators.sampling import str_hash_sql

    # Feature strings, not feature ids, come out of the per-doc array:
    # hashing happens ONCE per exploded feature in a flat projection
    # (subexpression-eliminable — the str_hash mix references its fold 3x,
    # and a lambda-side hash re-evaluates the whole fold each time;
    # measured ~7x slower). Bigram features self-tag: a unigram can never
    # contain ' ' (it came out of a space split), a bigram always does.
    return f"""
WITH weights AS (
    SELECT CAST(f AS BIGINT) AS f,
           CAST(((f * {_QM_A} + {_QM_B}) % {_QM_P}) % 128 - 64 AS BIGINT) AS w
    FROM range({_QM_FEATS}) t(f)
), base AS (
    SELECT doc_id, str_split(LOWER(TRIM(text)), ' ') AS t
    FROM documents WHERE text IS NOT NULL
), featd AS (
    SELECT doc_id,
           CAST(LEN(t) AS BIGINT) AS n_toks,
           CAST(GREATEST(LEN(t) - 1, 0) AS BIGINT) AS n_bigrams,
           unnest(list_concat(t,
               list_transform(range(1, LEN(t)), i -> t[i] || ' ' || t[i + 1])
           )) AS tok
    FROM base
), hashed AS (
    SELECT doc_id, n_toks, n_bigrams,
           (CASE WHEN contains(tok, ' ') THEN {_QM_BUCKETS} ELSE 0 END)
               + {str_hash_sql("tok")} % {_QM_BUCKETS} AS f
    FROM featd
), scored AS (
    SELECT h.doc_id, h.n_toks, h.n_bigrams,
           CAST(SUM(w.w) AS BIGINT) AS score_raw
    FROM hashed h JOIN weights w USING (f)
    GROUP BY h.doc_id, h.n_toks, h.n_bigrams
)
SELECT doc_id, n_toks, n_bigrams, score_raw,
       CAST(score_raw AS DOUBLE) / CAST(n_toks + n_bigrams AS DOUBLE) AS margin,
       CAST(score_raw AS DOUBLE) / CAST(n_toks + n_bigrams AS DOUBLE) >= 0.0
           AS keep
FROM scored
"""


@register(
    "q_llm_quality_model",
    oracle=_qm_oracle(),
    note="model-based quality classifier (fastText shape, wordNgrams=2): "
    "unigrams hash into buckets [0, 8192) and ADJACENT-token bigrams "
    "into [8192, 16384) with the portable char fold, a generated frozen "
    "integer weight table over the doubled feature space (affine of the "
    "feature id, range [-64, 63] — the int8-quantized stand-in for "
    "trained weights) is BROADCAST-joined to the feature stream, and "
    "each document's score is the exact int64 SUM of its feature "
    "weights; margin = score_raw/(n_toks + n_bigrams) is one IEEE "
    "division of exactly-converted int64s (bit-stable both engines, "
    "round-6 pattern), keep = margin >= 0.0 (literal threshold both "
    "sides). No sigmoid — exp() is not cross-engine-portable and the "
    "keep decision is monotone in the margin anyway. Both feature "
    "families come out of ONE projection over ONE scan (per-doc feature "
    "STRING array: tokens ++ bigram strings, then one explode; the hash "
    "runs once per exploded feature in a flat projection — hashing "
    "inside the transform lambda re-evaluates the fold per mix "
    "reference, measured ~7x slower — and bigram features self-tag by "
    "their embedded space, which a space-split unigram can never "
    "contain) — no branch split, the text column is read once (SCALE "
    "§3.4 rule). Scale shape: feature hash is map-side, the weight join "
    "is a broadcast of a model-sized (not corpus-sized) table, the doc "
    "rollup is one doc_id shuffle — at 100 TB the weight table is the "
    "learned model (~2M buckets x int8, a few MB) and the plan is "
    "unchanged. Spark sequence() guard: bigram index list only built "
    "when size(t) >= 2 (sequence DESCENDS when start > stop)",
    tags=("llm", "text", "quality", "ml", "model"),
)
def q_llm_quality_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    from join_example_spark.operators.sampling import str_hash

    docs = fanout_repartition(read_table(spark, sf_dir, "documents")).where(
        F.col("text").isNotNull()
    )
    weights = spark.range(_QM_FEATS).select(
        F.col("id").alias("f"),
        F.expr(f"CAST(((id * {_QM_A} + {_QM_B}) % {_QM_P}) % 128 - 64 AS BIGINT)").alias(
            "w"
        ),
    )
    base = docs.select(
        "doc_id", F.expr("split(LOWER(TRIM(text)), ' ')").alias("t")
    )
    feats = (
        "concat(t, CASE WHEN size(t) >= 2 THEN"
        " transform(sequence(1, size(t) - 1),"
        " i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"
        " ELSE CAST(array() AS ARRAY<STRING>) END)"
    )
    featd = base.select(
        "doc_id",
        F.expr("CAST(size(t) AS BIGINT)").alias("n_toks"),
        F.expr("CAST(GREATEST(size(t) - 1, 0) AS BIGINT)").alias("n_bigrams"),
        F.explode(F.expr(feats)).alias("tok"),
    )
    # f is the broadcast-join key: Catalyst infers isnotnull(f) and pushes
    # it below this projection by substitution, re-evaluating the whole
    # char-fold mix in the Filter (2x the hash work — round-15 plan audit).
    # f is NULL only if tok is NULL, which explode of an array of non-null
    # concat/split elements never yields; the non-nullable coalesce (the -1
    # sentinel is outside the weight table's [0, 16384) id range anyway)
    # stops the inference so the hash runs exactly once per feature.
    hashed = featd.select(
        "doc_id",
        "n_toks",
        "n_bigrams",
        F.coalesce(
            F.expr(
                f"CASE WHEN contains(tok, ' ') THEN {_QM_BUCKETS} ELSE 0 END"
            )
            + str_hash("tok") % _QM_BUCKETS,
            F.lit(-1).cast("bigint"),
        ).alias("f"),
    )
    scored = (
        hashed.join(F.broadcast(weights), "f")
        .groupBy("doc_id", "n_toks", "n_bigrams")
        .agg(F.sum("w").cast("bigint").alias("score_raw"))
    )
    margin = F.col("score_raw").cast("double") / (
        F.col("n_toks") + F.col("n_bigrams")
    ).cast("double")
    return scored.select(
        "doc_id",
        "n_toks",
        "n_bigrams",
        "score_raw",
        margin.alias("margin"),
        (margin >= 0.0).alias("keep"),
    )
