"""Skew mitigation for fact-fact equi-joins: deterministic key salting.

AQE's skew-join split handles most skew automatically (enabled in
conf.SESSION_CONFS), but it only splits *sort-merge* partitions after the
shuffle files exist. Salting attacks the skew one stage earlier — the hot
key never concentrates on one task at all:

- the large (skewed) side gets a salt column derived *deterministically*
  from a unique row id: ``pmod(hash(row_id), n_salt)`` — never rand(), which
  would break retry/speculative-execution idempotence;
- the smaller side is replicated ``n_salt`` times via explode;
- the join key becomes (key, salt) — the hot key's rows now spread over
  ``n_salt`` tasks.

The result is bit-identical to the unsalted join (each left row still meets
each matching right row exactly once), which is exactly what the oracle
check asserts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    salt_src: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``large ⋈ small on large[on] == small[on]`` with the hot
    keys of ``large`` spread over ``n_salt`` sub-keys.

    ``salt_src`` must be a column of ``large`` that is (nearly) unique per
    row — the salt is ``pmod(hash(salt_src), n_salt)``, deterministic under
    retries. ``small`` is replicated ``n_salt``× (bounded, explicit cost:
    use for moderately-sized right sides that are too big to broadcast but
    far smaller than the skewed fact table).
    """
    if how not in ("inner", "left", "left_semi", "left_anti"):
        # Right/full outer would emit every unmatched right row n_salt
        # times (one per replica) — not result-invariant.
        raise ValueError(f"salted_join supports inner/left/semi/anti, got {how!r}")
    l = large.withColumn("_salt", F.pmod(F.hash(F.col(salt_src)), F.lit(n_salt)))
    r = small.withColumn(
        "_salt", F.explode(F.array([F.lit(i) for i in range(n_salt)]))
    )
    out = l.join(r, on=[on, "_salt"], how=how)
    return out.drop("_salt")
