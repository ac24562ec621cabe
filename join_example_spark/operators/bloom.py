"""Portable Bloom-filter semi-join pre-filter (the runtime-filter pattern).

Spark injects bloom runtime filters into shuffled joins on its own
(``spark.sql.optimizer.runtime.bloomFilter.enabled``), but those use an
engine-internal hash and cannot be oracle-certified. This module builds the
same device out of PORTABLE integer arithmetic — multiply-mod position
derivation, 62-bit words (DuckDB raises on ``1::BIGINT << 63``), ``bit_or``
word aggregation — so a DuckDB twin can replay the filter bit-for-bit and
the final semi-join equality becomes a per-row LOSSLESSNESS proof: a Bloom
filter has no false negatives by construction (every build key sets exactly
the bits its probes test), so pre-filter + exact verify == plain semi join.

Scale shape: the bits table is ``n_buckets`` rows (a few KiB) broadcast to
every executor — the probe side is filtered map-side BEFORE the join
shuffle, which is the entire point at 100 TB: rows that cannot match never
leave their input partition. False positives only add verify work, never
wrong rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Bits per word: 62 keeps ``1 << bit`` strictly positive in BIGINT on both
#: engines (DuckDB overflows on shifting into the sign bit).
WORD_BITS = 62

# Multiply-mod position derivation. The leading key mods bound the products
# away from int64 overflow (prime * multiplier < 2^63); they also make the
# scheme total for negative keys via the double-mod idiom. Hash quality only
# affects the false-positive rate, never correctness.
_P1, _M1 = 1_000_003, 2_654_435_761
_P2, _M2, _C2 = 999_983, 40_503, 2_654_435_769


def _pos_exprs(key_sql: str, n_bits: int) -> tuple[str, str]:
    """SQL for the two bit positions of ``key_sql`` (portable, all BIGINT)."""
    k1 = f"(((CAST({key_sql} AS BIGINT) % {_P1}) + {_P1}) % {_P1})"
    k2 = f"(((CAST({key_sql} AS BIGINT) % {_P2}) + {_P2}) % {_P2})"
    return (
        f"(({k1} * {_M1}) % {n_bits})",
        f"((({k2} * {_M2}) + {_C2}) % {n_bits})",
    )


def bloom_bits(build: DataFrame, key_col: str, n_buckets: int = 16) -> DataFrame:
    """Aggregate the build side's keys into ``(bucket, bits)`` words.

    One narrow projection + a ``bit_or`` groupBy over at most ``n_buckets``
    rows of output — map-side combinable, no sort. The result is the
    broadcastable filter payload.
    """
    n_bits = n_buckets * WORD_BITS
    p1, p2 = _pos_exprs(key_col, n_bits)
    return (
        build.select(F.explode(F.expr(f"ARRAY({p1}, {p2})")).alias("p"))
        .select(
            F.expr(f"p DIV {WORD_BITS}").alias("bucket"),
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(p % {WORD_BITS} AS INT))").alias("w"),
        )
        .groupBy("bucket")
        .agg(F.expr("bit_or(w)").alias("bits"))
    )


def bloom_prefilter(
    probe: DataFrame, bits: DataFrame, key_col: str, n_buckets: int = 16
) -> DataFrame:
    """Keep probe rows whose key passes the Bloom filter (both bits set).

    Two broadcast lookups against the tiny words table; a missing bucket
    means no build key ever touched that word, so the row fails. Guaranteed
    to RETAIN every row whose key is in the build set (no false negatives);
    the caller's exact verify join removes the false positives.
    """
    n_bits = n_buckets * WORD_BITS
    p1, p2 = _pos_exprs(key_col, n_bits)
    probed = probe.withColumn("_bp1", F.expr(p1)).withColumn("_bp2", F.expr(p2))
    b1 = bits.select(F.col("bucket").alias("_bk1"), F.col("bits").alias("_bw1"))
    b2 = bits.select(F.col("bucket").alias("_bk2"), F.col("bits").alias("_bw2"))
    hit1 = F.expr(f"(_bw1 & shiftleft(CAST(1 AS BIGINT), CAST(_bp1 % {WORD_BITS} AS INT))) <> 0")
    hit2 = F.expr(f"(_bw2 & shiftleft(CAST(1 AS BIGINT), CAST(_bp2 % {WORD_BITS} AS INT))) <> 0")
    return (
        probed.join(
            F.broadcast(b1), F.expr(f"_bp1 DIV {WORD_BITS}") == F.col("_bk1"), "left"
        )
        .join(F.broadcast(b2), F.expr(f"_bp2 DIV {WORD_BITS}") == F.col("_bk2"), "left")
        .where(F.col("_bw1").isNotNull() & F.col("_bw2").isNotNull() & hit1 & hit2)
        .drop("_bp1", "_bp2", "_bk1", "_bw1", "_bk2", "_bw2")
    )


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    n_buckets: int = 16,
) -> DataFrame:
    """Bloom pre-filter + exact broadcast semi-join == plain semi join.

    Returns the probe rows whose key is in the build set — identical output
    to ``probe.join(build, key, "left_semi")``, with the probe side pruned
    map-side first. Lossless for any key distribution and any bucket count.
    """
    bits = bloom_bits(build, build_key, n_buckets)
    passed = bloom_prefilter(probe, bits, probe_key, n_buckets)
    keys = build.select(F.col(build_key).alias("_vk")).distinct()
    return passed.join(
        F.broadcast(keys), F.col(probe_key) == F.col("_vk"), "left_semi"
    )
