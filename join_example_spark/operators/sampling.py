"""Deterministic sampling / splitting / sharding for training-data pipelines.

Everything here is driven by PORTABLE hashes (plain modular arithmetic and
the polynomial char-fold also used by the portable MinHash variant), not
Spark's ``rand()`` or ``xxhash64``:

- reproducible across runs, partitionings, and engines — the property a
  training pipeline needs so "the 10% sample" and "the validation split"
  are stable artifacts, not per-run accidents;
- expressible identically in DuckDB, so every operator has an exact oracle.

At 100 TB the scale path swaps the char-fold for ``xxhash64`` (same plan
shape, one JVM intrinsic instead of a fold) — the declared queries keep the
portable hash precisely so the whole pipeline stays oracle-certified, the
same trade documented for MinHash (queries/llm_dedup.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Modulus for all portable hashes: small enough that every intermediate
#: product stays far inside int64 under ANSI overflow checking on both
#: engines ((P-1) * (A % P) + B < 1e12).
HASH_P = 1_000_003
_HASH_A = 2_654_435_761  # Knuth's multiplicative constant
_HASH_B = 17


def id_hash(col: str, p: int = HASH_P) -> Column:
    """Portable integer hash of an id column, in [0, p).

    Reduce-then-multiply keeps the product below p**2 (~1e12) so it can
    never overflow int64 no matter how large the raw id grows. The double
    mod makes the result non-negative even for negative ids (both engines'
    ``%`` keeps the dividend's sign — a bare mod would make a
    ``hash % 100 < pct`` sample predicate always-true for negatives).
    """
    a_mod = _HASH_A % p
    return F.expr(f"((({col} % {p}) + {p}) % {p} * {a_mod} + {_HASH_B}) % {p}")


def id_hash_sql(col: str, p: int = HASH_P) -> str:
    """DuckDB twin of :func:`id_hash` (identical arithmetic)."""
    a_mod = _HASH_A % p
    return f"(((({col} % {p}) + {p}) % {p} * {a_mod} + {_HASH_B}) % {p})"


def str_hash_expr(operand: str, p: int = HASH_P) -> str:
    """Spark-SQL TEXT of :func:`str_hash` for an arbitrary operand
    expression — usable inside higher-order-function lambdas (e.g.
    ``transform(t, x -> {str_hash_expr('x')} % m)``), where a ``Column``
    can't reach. Same fold + mix as :func:`str_hash` (which delegates
    here), twin of :func:`str_hash_sql`."""
    fold = (
        f"aggregate(split({operand}, ''), CAST(0 AS BIGINT),"
        f" (acc, c) -> (acc * 31 + CAST(ASCII(c) AS BIGINT)) % {p})"
    )
    h = f"({fold})"
    return f"(({h} * {h}) % {p} * 31 + {h}) % {p}"


def str_hash(col: str, p: int = HASH_P) -> Column:
    """Portable polynomial char-fold hash of a string column, in [0, p).

    The fold is finalized with a square-and-add mix: near-identical keys
    ("src0".."src19") produce near-consecutive folds, and any AFFINE
    finalizer maps an arithmetic progression to an arithmetic progression
    mod 100 — clumping every key into the same split bucket. Squaring
    breaks the progression. Intermediates stay < 31*p + p (~3e7), far
    inside int64 under ANSI checking.
    """
    return F.expr(str_hash_expr(col, p))


def str_hash_sql(col: str, p: int = HASH_P) -> str:
    """DuckDB twin of :func:`str_hash` (identical fold + mix)."""
    fold = (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
        f" list_transform(str_split({col}, ''), c -> CAST(unicode(c) AS BIGINT))),"
        f" (acc, b) -> (acc * 31 + b) % {p})"
    )
    h = f"({fold})"
    return f"((({h} * {h}) % {p} * 31 + {h}) % {p})"


def hash_sample(df: DataFrame, id_col: str, percent: int) -> DataFrame:
    """Keep rows whose id-hash bucket (mod 100) falls below ``percent``.

    Map-side only — no shuffle, no state: the sample predicate rides the
    scan like any other filter and selects the SAME rows on every run and
    every cluster size. This is how a pipeline takes "the 10% dev corpus"
    reproducibly out of 100 TB.
    """
    return df.where(id_hash(id_col) % 100 < percent)


def split_assign(
    df: DataFrame,
    group_col: str,
    train_pct: int = 80,
    val_pct: int = 10,
    split_name: str = "split",
) -> DataFrame:
    """Group-stable train/val/test assignment by hashing ``group_col``.

    Hashing the GROUP key (source site, author, domain) rather than the row
    id guarantees every row of a group lands in the same split — the
    standard defense against near-duplicate leakage across the train/eval
    boundary. Map-side only; no shuffle.
    """
    bucket = str_hash(group_col) % 100
    return df.withColumn(
        split_name,
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def pack_chunks(
    df: DataFrame,
    part_col: str,
    order_col: str,
    size_col: str,
    budget: int,
    shard_name: str = "shard_id",
) -> DataFrame:
    """Sequential token-budget sharding: shard = floor(running_size / budget).

    The standard "pack the corpus into ~budget-token shards" operator for
    training-data serialization. One hash shuffle on ``part_col`` + one
    sort per partition (a window with a running frame); rows stay in
    deterministic ``order_col`` order so shard contents are reproducible.
    A document larger than the budget gets its own shard (no splitting —
    this packs whole documents, it does not truncate them).
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(size_col).over(w), F.lit(0))
    return df.withColumn(shard_name, F.floor(cum_before / budget))
